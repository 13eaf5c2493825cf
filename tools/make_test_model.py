#!/usr/bin/env python
"""Generate random-weight .april test models.

    python tools/make_test_model.py /tmp/tiny.april              # small torch-traced fixture
    python tools/make_test_model.py /tmp/flagship.april --flagship  # full-size, native export
    python tools/make_test_model.py /tmp/f.april --flagship --form native

The small fixture uses torch tracing (same pipeline as real reference
exports); the flagship uses the framework's own exporter (no torch needed)
at the canonical reference dimensions (12 layers, 512/1024, vocab 500 —
reference src/april_model.h:35-41).
"""

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("output")
    ap.add_argument("--flagship", action="store_true", help="full-size model via native exporter")
    ap.add_argument(
        "--arch", choices=["lstm", "conformer"], default="lstm",
        help="model family (conformer implies --form native)",
    )
    ap.add_argument("--form", choices=["onnx", "native"], default="onnx")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.arch == "conformer":
        import jax

        from april_asr_tpu.models.conformer import ConformerDims, init_conformer_params
        from april_asr_tpu.models.export import make_model_parameters, save_april
        from april_asr_tpu.testing import default_tokens

        dims = (
            ConformerDims()
            if args.flagship
            else ConformerDims(
                d_model=64, heads=2, ffn=128, conv_kernel=4, att_context=16,
                joiner_dim=64, vocab=64, layers=2, decoder_groups=16,
                conv_channels=(4, 8, 8),
            )
        )
        params = init_conformer_params(jax.random.PRNGKey(args.seed), dims)
        mp = make_model_parameters(dims, default_tokens(dims.vocab))
        save_april(
            args.output, dims, params, mp,
            name="Conformer Random",
            description=f"Random streaming conformer (seed={args.seed})",
            form="native",
        )
    elif args.flagship:
        import jax

        from april_asr_tpu.models import TransducerDims, init_transducer_params
        from april_asr_tpu.models.export import make_model_parameters, save_april
        from april_asr_tpu.testing import default_tokens

        dims = TransducerDims()  # canonical flagship dims
        params = init_transducer_params(jax.random.PRNGKey(args.seed), dims)
        mp = make_model_parameters(dims, default_tokens(dims.vocab))
        save_april(
            args.output, dims, params, mp,
            name="Flagship Random", description=f"Random flagship (seed={args.seed})",
            form=args.form,
        )
    else:
        from april_asr_tpu.testing import FixtureConfig, write_test_april

        write_test_april(args.output, FixtureConfig(seed=args.seed))
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
