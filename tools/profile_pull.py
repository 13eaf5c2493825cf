"""Slope profile of the engine pull loop's pieces at bench scale.

Isolates: recurrent-only scan, recurrent+inner-decode scan (the real pull
body), fbank accept+front, and event pack — to attribute the full step's
residual beyond the LSTM floor.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import build_runtime  # noqa: E402

from april_asr_tpu.config import DecodeConfig, EngineConfig  # noqa: E402
from april_asr_tpu.decode.greedy import (  # noqa: E402
    decode_step,
    init_decode_state,
    vocab_tables_device,
)
from april_asr_tpu.engine.step import INNER_STEPS_EMIT, pack_events  # noqa: E402
from april_asr_tpu.frontend.fbank import (  # noqa: E402
    FbankLayout,
    fbank_accept,
    fbank_advance_n,
    fbank_front,
    fbank_init,
)


def _force(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


def timeit(fn, n=6, warmup=2):
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
    w = rt.weights
    dims = rt.dims
    dcfg = DecodeConfig()
    vt = vocab_tables_device(rt.vocab)
    blank = rt.blank_id
    S = 2048
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)

    y0 = jax.random.normal(ks[0], (S, dims.d_model), jnp.float32)
    h = jax.random.normal(ks[1], (dims.layers, S, dims.d_model), jnp.float32)
    c = jax.random.normal(ks[2], (dims.layers, S, dims.hidden), jnp.float32)

    dstate0 = init_decode_state(S, dims.context, dims.joiner_dim, blank, dcfg)

    @jax.jit
    def prime(w, ds):
        ds = dict(ds)
        ds["dout"] = rt.decoder_step(w, ds["context"])
        return ds

    dstate0 = prime(w, dstate0)

    def inner_decode(weights, eout, can, dstate):
        done = ~can
        evts = []
        for ee in INNER_STEPS_EMIT:
            logits = rt.joiner(weights, eout, dstate["dout"])
            dstate, evt, is_blank, need_dec = decode_step(
                dstate, logits, ~done, ee, blank, vt, dcfg
            )
            new_dout = rt.decoder_step(weights, dstate["context"])
            dstate["dout"] = jnp.where(need_dec[:, None], new_dout, dstate["dout"])
            done = done | is_blank
            evts.append(evt)
        events = {k: jnp.stack([e[k] for e in evts], axis=1) for k in evts[0]}
        return dstate, events

    # 1: recurrent-only pull scan
    def mk_rec(k):
        @jax.jit
        def f(w, h, c):
            def body(carry, _):
                h, c = carry
                eout, h, c = rt.encoder_recurrent(w, y0, h, c)
                return (h, c), eout[:, 0]
            (h, c), ys = jax.lax.scan(body, (h, c), None, length=k)
            return ys
        return lambda: f(w, h, c)

    print(f"recurrent only:        {slope(mk_rec, 1, 9):.2f} ms/pull")

    # 2: full pull body (recurrent + inner decode + event stack)
    can = jnp.ones(S, bool)

    def mk_full(k):
        @jax.jit
        def f(w, h, c, ds):
            ds = dict(ds)
            ds["time_ms"] = ds["time_ms"] + 40

            def body(carry, _):
                h, c, ds = carry
                eout, h, c = rt.encoder_recurrent(w, y0, h, c)
                ds, events = inner_decode(w, eout, can, ds)
                return (h, c, ds), events
            (h, c, ds), events = jax.lax.scan(body, (h, c, ds), None, length=k)
            ev = {kk: jnp.swapaxes(v, 0, 1) for kk, v in events.items()}
            return pack_events(ev, ev["time_ms"][:, 0, 0] * 0, 40).dense
        return lambda: f(w, h, c, dstate0)

    print(f"recurrent + decode x3: {slope(mk_full, 1, 9):.2f} ms/pull")

    # 3: decode-only scan (fixed eout)
    eout = jax.random.normal(ks[3], (S, dims.joiner_dim), jnp.float32)

    def mk_dec(k):
        @jax.jit
        def f(w, ds):
            def body(ds, _):
                ds, events = inner_decode(w, eout, can, ds)
                return ds, events
            ds, events = jax.lax.scan(body, ds, None, length=k)
            ev = {kk: jnp.swapaxes(v, 0, 1) for kk, v in events.items()}
            return pack_events(ev, ev["time_ms"][:, 0, 0] * 0, 40).dense
        return lambda: f(w, dstate0)

    print(f"inner decode x3 only:  {slope(mk_dec, 1, 9):.2f} ms/pull")

    # 4: fbank accept + front + advance for a 1 s chunk
    cfg = EngineConfig(chunk_samples=16000)
    layout = FbankLayout.build(rt.fbank_opts, cfg.chunk_samples)
    fb0 = jax.vmap(lambda _: fbank_init(layout))(jnp.arange(S))
    audio = jax.random.normal(ks[4], (S, 16000), jnp.float32) * 0.1
    n = jnp.full(S, 16000, jnp.int32)
    P = layout.max_pulls_per_step
    seg = layout.opts.pull_segment_count
    step_rows = layout.opts.pull_segment_step
    W = (P - 1) * step_rows + seg

    def mk_fb(k):
        @jax.jit
        def f(fb, audio, n):
            def body(fb, _):
                fb = jax.vmap(lambda s, w_, m: fbank_accept(layout, s, w_, m))(
                    fb, audio, n)
                front = jax.vmap(lambda s: fbank_front(layout, s, W))(fb)
                npull = jnp.clip((fb["fifo_len"] - seg) // step_rows + 1, 0, P)
                fb = jax.vmap(lambda s, kk: fbank_advance_n(layout, s, kk))(fb, npull)
                return fb, front[:, 0, 0]
            fb, ys = jax.lax.scan(body, fb, None, length=k)
            return ys
        return lambda: f(fb0, audio, n)

    print(f"fbank chunk pipeline:  {slope(mk_fb, 1, 5):.2f} ms/chunk")


if __name__ == "__main__":
    main()
