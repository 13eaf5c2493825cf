"""A/B: layer-major rec_stream2+ffn stack vs wavefront slab kernel on TPU.

Usage: python tools/profile_wavefront.py [S] [P]
Chained-dispatch timing (difference K=1 vs K=3 readbacks to cancel tunnel
RTT), same method as tools/profile_chunk_split.py.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from april_asr_tpu.models import lstm_transducer as M
from april_asr_tpu.ops.lstm_wavefront_pallas import stack_wavefront_i8

S = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
P = int(sys.argv[2]) if len(sys.argv) > 2 else 25
d, H, F, L = 512, 1024, 2048, 12


def build():
    params = M.init_transducer_params(jax.random.PRNGKey(0), M.TransducerDims())
    params = M.quantize_weights(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (P, S, d), jnp.float32) * 0.1
    h = jnp.zeros((L, S, d), jnp.float32)
    c = jnp.zeros((L, S, H), jnp.float32)
    n_pulls = jnp.full((S,), P, jnp.int32)
    return params, x, h, c, n_pulls


def stack_shipped(params, x, h, c, n_pulls):
    gate = (jnp.arange(P)[:, None] < n_pulls[None, :]).astype(jnp.float32)
    return M._lstm_stack_chunk_pallas(params, x, h, c, gate, 256)


def chain(fn, k, **kw):
    @jax.jit
    def run(params, x, h, c, n_pulls):
        y = x
        for _ in range(k):
            y, h2, c2 = fn(params, y, h, c, n_pulls, **kw)
        return y[0, :2, :2], h2[0, :2, :2]

    return run


def timeit(fn, args, label, **kw):
    try:
        r1 = chain(fn, 1, **kw)
        r3 = chain(fn, 3, **kw)
        t0 = time.perf_counter()
        np.asarray(r1(*args)[0])
        c1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(r3(*args)[0])
        c3 = time.perf_counter() - t0
        ts1, ts3 = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(r1(*args)[0])
            ts1.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(r3(*args)[0])
            ts3.append(time.perf_counter() - t0)
        t1 = np.median(ts1)
        t3 = np.median(ts3)
        ms = (t3 - t1) / 2 * 1000
        print(f"{label}: {ms:7.2f} ms/stack  (compile {c1:.0f}s/{c3:.0f}s, "
              f"k1 {t1*1000:.1f} ms, k3 {t3*1000:.1f} ms)")
        return ms
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None


def main():
    args = build()
    print(f"S={S} P={P} dims {d}/{H}/{F} L={L}")
    timeit(stack_shipped, args, "layer-major (shipped)")
    for slab in (6, 4, 12):
        for bs in (256, 128):
            if S % bs:
                continue
            timeit(
                stack_wavefront_i8, args, f"wavefront slab={slab:2d} bs={bs}",
                slab=slab, block_s=bs,
            )


if __name__ == "__main__":
    main()
