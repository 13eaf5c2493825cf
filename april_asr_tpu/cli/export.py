"""Model conversion CLI: read any `.april`, rewrite in onnx or native form.

Usage:
    april-export <in.april> <out.april> [--form onnx|native] [--name ...]

The input may be a reference-exported file (ONNX graphs) or a native-form
file; weights go through the verified native extraction (models/extract.py).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--form", choices=["onnx", "native"], default="native")
    ap.add_argument("--name", default=None)
    ap.add_argument("--description", default=None)
    args = ap.parse_args(argv)

    from ..models import load_model
    from ..models.export import save_april

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
