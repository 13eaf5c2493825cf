"""Model conversion CLI: `.april` rewriting and torch-checkpoint import.

Usage:
    april-export <in.april> <out.april> [--form onnx|native] [--name ...]
    april-export --from-torch ckpt.pt --tokens tokens.txt <out.april> [...]

`.april` inputs may be reference-exported files (ONNX graphs) or native-form
files; weights go through the verified native extraction (models/extract.py).

`--from-torch` ingests an icefall `lstm_transducer_stateless2` checkpoint
(epoch-N.pt / pretrained.pt — the one asset a user migrating from the
reference ecosystem holds; the reference's own converter is
extra/export-april.py) together with icefall's tokens.txt, folds the Scaled*
parameterization, and writes a `.april` in either form — no icefall, no
onnx, no GPU needed.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help=".april model, or a torch checkpoint with --from-torch")
    ap.add_argument("output")
    ap.add_argument("--form", choices=["onnx", "native"], default="native")
    ap.add_argument("--name", default=None)
    ap.add_argument("--description", default=None)
    ap.add_argument(
        "--from-torch", action="store_true",
        help="input is an icefall lstm_transducer_stateless2 torch checkpoint",
    )
    ap.add_argument(
        "--tokens", default=None,
        help="icefall tokens.txt (required with --from-torch)",
    )
    ap.add_argument("--language", default="en-us")
    args = ap.parse_args(argv)

    from ..models.export import save_april

    if args.from_torch:
        if not args.tokens:
            print("error: --from-torch requires --tokens tokens.txt", file=sys.stderr)
            return 1
        from ..models.export import make_model_parameters
        from ..models.torch_import import (
            import_icefall_lstm,
            load_state_dict,
            parse_tokens_txt,
        )

        sd = load_state_dict(args.input)
        dims, params = import_icefall_lstm(sd)
        tokens, blank_id = parse_tokens_txt(args.tokens)
        if len(tokens) != dims.vocab:
            print(
                f"error: tokens.txt has {len(tokens)} entries but the "
                f"checkpoint vocab is {dims.vocab}",
                file=sys.stderr,
            )
            return 1
        mp = make_model_parameters(dims, tokens, blank_id=blank_id)
        save_april(
            args.output, dims, params, mp,
            name=args.name or "Imported icefall model",
            description=args.description or "Imported from a torch checkpoint",
            language=args.language,
            form=args.form,
        )
        print(
            f"wrote {args.output} ({args.form} form, {dims.layers} layers, "
            f"vocab {dims.vocab}, blank {blank_id})"
        )
        return 0

    from ..models import load_model

    rt = load_model(args.input)
    if rt.kind != "native":
        print(
            "error: input model did not match the native architecture; "
            "cannot re-export interpreter-only models",
            file=sys.stderr,
        )
        return 1
    save_april(
        args.output,
        rt.dims,
        {k: v for k, v in rt.weights.items()},
        rt.params,
        name=args.name or rt.name,
        description=args.description or rt.description,
        language=rt.language,
        form=args.form,
    )
    print(f"wrote {args.output} ({args.form} form)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
