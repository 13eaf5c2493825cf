"""Attribute fbank_accept_batch time: assemble / frame-DSP / commit phases.

Usage: python tools/profile_accept.py [S] [chunk]
Chained-dispatch timing (K=1 vs K=5 difference cancels tunnel RTT).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import build_runtime  # noqa: E402

from april_asr_tpu.frontend import fbank as FB  # noqa: E402

S = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 16000


def force(x):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])


def timeit(f, args, label, k=5):
    """Chained with a tiny data dependency between iterations so XLA cannot
    CSE the k calls into one (identical pure calls get deduplicated)."""

    def chain(kk):
        @jax.jit
        def run(*a):
            a = list(a)
            out = None
            for i in range(kk):
                out = f(*a)
                lead = jax.tree_util.tree_leaves(out)[0]
                bump = (lead.reshape(-1)[0] * 1e-30).astype(a[0].dtype if hasattr(a[0], "dtype") else jnp.float32)
                a[0] = jax.tree_util.tree_map(lambda x: x + bump.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, a[0])
            return lead

        return run

    r1, rk = chain(1), chain(k)
    force(r1(*args)); force(rk(*args))
    t1s, tks = [], []
    for _ in range(5):
        t0 = time.perf_counter(); force(r1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); force(rk(*args)); tks.append(time.perf_counter() - t0)
    ms = (np.median(tks) - np.median(t1s)) / (k - 1) * 1000
    print(f"{label}: {ms:7.2f} ms", flush=True)
    return ms


def main():
    rt = build_runtime()
    layout = FB.FbankLayout.build(rt.fbank_opts, CHUNK)
    print(f"# S={S} chunk={CHUNK} L(buf)={layout.leftover_cap + layout.chunk} "
          f"max_frames={layout.max_frames} fifo_rows={layout.fifo_rows}")
    state = jax.vmap(lambda _: FB.fbank_init(layout))(jnp.arange(S))
    # steady-state leftover: run two real accepts first
    wave = jax.random.normal(jax.random.PRNGKey(0), (S, CHUNK), jnp.float32) * 0.1
    n = jnp.full((S,), CHUNK, jnp.int32)
    acc = jax.jit(lambda s, w, m: FB.fbank_accept_batch(layout, s, w, m))
    state = acc(state, wave, n)
    adv = jax.jit(lambda s, k: jax.vmap(lambda ss, kk: FB.fbank_advance_n(layout, ss, kk))(s, k))
    o = layout.opts
    npull = jnp.minimum(
        (state["fifo_len"] - o.pull_segment_count) // o.pull_segment_step + 1,
        layout.max_pulls_per_step,
    )
    state = adv(state, npull)
    state = acc(state, wave, n)
    state = adv(state, npull)
    force(state)
    print(f"# leftover_len uniform: {np.unique(np.asarray(state['leftover_len']))}, "
          f"fifo_off {np.unique(np.asarray(state['fifo_off']))[:4]}, "
          f"fifo_len {np.unique(np.asarray(state['fifo_len']))[:4]}")

    shift = layout.opts.window_shift
    wave_m = jnp.where(jnp.arange(CHUNK)[None, :] < n[:, None], wave, 0.0)
    wave_p = FB._pad_to_rows(layout, wave_m)

    def assemble(st, wp, m):
        return jax.vmap(lambda s, w, mm: FB._accept_assemble(layout, s, w, mm))(st, wp, m)

    buf, total = jax.jit(assemble)(state, wave_p, n)
    force(buf)

    from april_asr_tpu.ops.fbank_pallas import logmel_rows_from_buf

    rows = jax.jit(lambda b: logmel_rows_from_buf(layout, b))(buf)
    force(rows)

    def commit(st, b, r, t):
        return jax.vmap(lambda s, bb, rr, tt: FB._accept_commit(layout, s, bb, rr, tt))(st, b, r, t)

    timeit(lambda s, w, m: FB.fbank_accept_batch(layout, s, w, m), (state, wave, n), "accept full    ")
    timeit(assemble, (state, wave_p, n), "assemble       ")
    timeit(lambda b: logmel_rows_from_buf(layout, b), (buf,), "frame DSP      ")
    timeit(commit, (state, buf, rows, total), "commit         ")
    timeit(lambda w, m: FB._pad_to_rows(layout, jnp.where(jnp.arange(CHUNK)[None, :] < m[:, None], w, 0.0)), (wave, n), "mask+pad       ")


if __name__ == "__main__":
    main()
