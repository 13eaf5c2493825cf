"""Slope profile of fbank sub-stages at bench scale (S=2048, 1 s chunks)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import build_runtime  # noqa: E402

from april_asr_tpu.config import EngineConfig  # noqa: E402
from april_asr_tpu.frontend import fbank as FB  # noqa: E402


def _force(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


def timeit(fn, n=8, warmup=2):
    for _ in range(warmup):
        r = fn()
    _force(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        _force(r)
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50)) * 1000


def slope(make_fn, k1, k2):
    t1, t2 = timeit(make_fn(k1)), timeit(make_fn(k2))
    return (t2 - t1) / (k2 - k1)


def main():
    rt = build_runtime()
    S = 2048
    layout = FB.FbankLayout.build(rt.fbank_opts, 16000)
    key = jax.random.PRNGKey(0)
    fb0 = jax.vmap(lambda _: FB.fbank_init(layout))(jnp.arange(S))
    audio = jax.random.normal(key, (S, 16000), jnp.float32) * 0.1
    n = jnp.full(S, 16000, jnp.int32)
    P = layout.max_pulls_per_step
    seg = layout.opts.pull_segment_count
    step_rows = layout.opts.pull_segment_step
    W = (P - 1) * step_rows + seg
    F = layout.max_frames
    padded = layout.opts.padded_window_size
    print(f"layout: F={F} R={layout.fifo_rows} P={P} W={W}")

    def chain(body):
        def mk(k):
            @jax.jit
            def f(fb):
                def sb(fb, _):
                    fb2 = body(fb)
                    return fb2, jax.tree_util.tree_leaves(fb2)[0].ravel()[0]
                fb, ys = jax.lax.scan(sb, fb, None, length=k)
                return ys
            return lambda: f(fb0)
        return mk

    # full accept
    def acc(fb):
        fb = jax.vmap(lambda s, w_, m: FB.fbank_accept(layout, s, w_, m))(fb, audio, n)
        return FB.fbank_advance_n(layout, fb, jnp.full(S, P, jnp.int32))

    print(f"accept+advance: {slope(chain(acc), 1, 5):.2f} ms")

    # frame_dsp only, same volume
    frames = jax.random.normal(key, (S, F, padded), jnp.float32)

    def mk_dsp(k):
        @jax.jit
        def f(frames):
            def sb(carry, _):
                rows = jax.vmap(lambda fr: FB._frame_dsp(layout, fr))(frames + carry)
                return rows[0, 0, 0], rows[0, 0, :2]
            c, ys = jax.lax.scan(sb, jnp.float32(0), None, length=k)
            return ys
        return lambda: f(frames)

    print(f"frame_dsp only: {slope(mk_dsp, 1, 5):.2f} ms")

    # front only
    def mk_front(k):
        @jax.jit
        def f(fb):
            def sb(carry, _):
                fr = jax.vmap(lambda s: FB.fbank_front(layout, s, W))(fb)
                return carry + fr[0, 0, 0], None
            c, _ = jax.lax.scan(sb, jnp.float32(0), None, length=k)
            return c
        return lambda: f(fb0)

    print(f"front only:     {slope(mk_front, 1, 5):.2f} ms")

    # buf assembly + frame extraction, no dsp: replicate accept's slicing
    def assemble(fb):
        cap = layout.leftover_cap
        lo_len = fb["leftover_len"]
        buf = jnp.zeros((S, cap + layout.chunk), jnp.float32)
        buf = jax.vmap(lambda b, l: jax.lax.dynamic_update_slice(b, l, (0,)))(
            buf, fb["leftover"])
        buf = jax.vmap(lambda b, w_, o: jax.lax.dynamic_update_slice(b, w_, (o,)))(
            buf, audio, lo_len)
        n_views = -(-padded // layout.opts.window_shift)
        shift = layout.opts.window_shift
        buf_pad = jnp.concatenate(
            [buf, jnp.zeros((S, n_views * shift), jnp.float32)], axis=1)
        views = [
            buf_pad[:, v * shift : v * shift + F * shift].reshape(S, F, shift)
            for v in range(n_views)
        ]
        frames = jnp.concatenate(views, axis=2)[:, :, :padded]
        consumed = jnp.full(S, F * shift, jnp.int32)
        newlo = jax.vmap(
            lambda b, c: jax.lax.dynamic_slice(
                jnp.concatenate([b, jnp.zeros(cap, jnp.float32)]), (c,), (cap,))
        )(buf, consumed)
        fb2 = dict(fb)
        fb2["leftover"] = newlo
        fb2["leftover_len"] = lo_len
        # cheap reduce of frames so they're consumed
        fb2["fifo"] = fb["fifo"] + jnp.mean(frames, axis=(1, 2))[:, None, None]
        return fb2

    print(f"buf+slice only: {slope(chain(assemble), 1, 5):.2f} ms")


if __name__ == "__main__":
    main()
