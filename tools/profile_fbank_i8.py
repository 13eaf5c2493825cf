"""A/B the fused logmel-from-buffer kernels: bf16x3-per-view vs int8 concat-K.

Usage: python tools/profile_fbank_i8.py [S] [block_sizes]
Chained timing with a data dependency between iterations (CSE-proof).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import build_runtime  # noqa: E402

from april_asr_tpu.frontend.fbank import FbankLayout  # noqa: E402
from april_asr_tpu.ops.fbank_pallas import (  # noqa: E402
    logmel_rows_from_buf,
    logmel_rows_from_buf_i8,
)


def force(x):
    np.asarray(jnp.ravel(x)[0])


def timeit(f, buf, label, k=6):
    def chain(kk):
        @jax.jit
        def run(b):
            out = None
            for _ in range(kk):
                out = f(b)
                b = b + out[0, 0, 0] * 1e-30
            return out

        return run

    try:
        r1, rk = chain(1), chain(k)
        force(r1(buf)); force(rk(buf))
        t1s, tks = [], []
        for _ in range(5):
            t0 = time.perf_counter(); force(r1(buf)); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); force(rk(buf)); tks.append(time.perf_counter() - t0)
        ms = (np.median(tks) - np.median(t1s)) / (k - 1) * 1000
        print(f"{label}: {ms:7.2f} ms", flush=True)
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    sizes = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else (8, 16, 32))]
    rt = build_runtime()
    layout = FbankLayout.build(rt.fbank_opts, 16000)
    L = layout.leftover_cap + layout.chunk
    print(f"# S={S} L={L} frames={layout.max_frames}")
    pcm = np.random.default_rng(0).integers(-20000, 20000, (S, L)).astype(np.float32) / 32768.0
    buf = jnp.asarray(pcm)
    force(buf)
    for bs in sizes:
        if S % bs:
            continue
        timeit(lambda b, bs=bs: logmel_rows_from_buf(layout, b, block_s=bs), buf, f"bf16x3-views bs={bs:3d}")
        timeit(lambda b, bs=bs: logmel_rows_from_buf_i8(layout, b, block_s=bs), buf, f"int8-concat  bs={bs:3d}")


if __name__ == "__main__":
    main()
