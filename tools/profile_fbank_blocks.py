"""Sweep block_s for the fused logmel-from-buffer kernel at serving scale."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import build_runtime  # noqa: E402

from april_asr_tpu.frontend.fbank import FbankLayout  # noqa: E402
from april_asr_tpu.ops.fbank_pallas import logmel_rows_from_buf  # noqa: E402


def force(x):
    np.asarray(jnp.ravel(x)[0])


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rt = build_runtime()
    layout = FbankLayout.build(rt.fbank_opts, 16000)
    L = layout.leftover_cap + layout.chunk
    print(f"# S={S} L={L} frames={layout.max_frames}", flush=True)
    buf = jax.jit(lambda k: jax.random.normal(k, (S, L), jnp.float32) * 0.1)(
        jax.random.PRNGKey(0)
    )
    force(buf)
    sizes = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else (8, 32, 128))]
    for bs in sizes:
        if S % bs:
            continue
        try:
            f = jax.jit(
                lambda b, bs=bs: logmel_rows_from_buf(layout, b, block_s=bs)
            )
            t_c = time.perf_counter()
            force(f(buf))
            print(f"# bs={bs} compiled+first in {time.perf_counter() - t_c:.1f}s", flush=True)
            t0 = time.perf_counter()
            for _ in range(19):
                f(buf)
            force(f(buf))
            print(f"block_s={bs}: {(time.perf_counter() - t0) / 20 * 1000:.2f} ms", flush=True)
        except Exception as e:
            print(f"block_s={bs}: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
