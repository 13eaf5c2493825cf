"""Slope-based component profile (immune to the ~40 ms tunnel RTT).

Each component is compiled as ONE program that chains the body K times with
real data dependencies; per-iteration device cost = (T(K2) - T(K1))/(K2 - K1).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import build_runtime  # noqa: E402
from april_asr_tpu.models import lstm_transducer as M  # noqa: E402


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


def slope(make_fn, k1=1, k2=9):
    f1, f2 = make_fn(k1), make_fn(k2)
    t1, t2 = timeit(f1), timeit(f2)
    return (t2 - t1) / (k2 - k1), t1


def main():
    rt = build_runtime()
    w = rt.weights
    dims = rt.dims
    key = jax.random.PRNGKey(1)
    print("device:", jax.devices()[0])

    S = 2048
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (S, dims.d_model), jnp.float32)
    h = jax.random.normal(ks[1], (dims.layers, S, dims.d_model), jnp.float32)
    c = jax.random.normal(ks[2], (dims.layers, S, dims.hidden), jnp.float32)

    # recurrent encoder step
    def mk_enc(k):
        @jax.jit
        def f(w, x, h, c):
            def body(carry, _):
                h, c = carry
                y, h, c = M._lstm_stack_step(w, x, h, c)
                return (h, c), None
            (h, c), _ = jax.lax.scan(body, (h, c), None, length=k)
            return h[0, 0, 0]
        return lambda: f(w, x, h, c)

    gflop = 2 * S * 12 * (512 * 4096 * 2 + 1024 * 512 + 512 * 2048 * 2) / 1e9
    ms, base = slope(mk_enc)
    print(f"recurrent step: {ms:.2f} ms/iter ({gflop / ms:.0f} TFLOP/s)  [rtt~{base:.0f}ms]")

    # conv embed for one chunk's windows (P=25)
    P = 25
    win = jax.random.normal(ks[4], (P * S, dims.segment_size, dims.mel), jnp.float32)

    def mk_embed(k):
        @jax.jit
        def f(w, win):
            def body(carry, _):
                y = M.encoder_embed(w, win + carry)
                return y[0, 0], None
            carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return carry
        return lambda: f(w, win)

    ms, _ = slope(mk_embed)
    print(f"conv embed {P * S} windows: {ms:.2f} ms/chunk-equivalent")

    # joiner + decoder (one inner-loop iteration's model work)
    eout = jax.random.normal(ks[5], (S, dims.joiner_dim), jnp.float32)
    ctx0 = jax.random.randint(ks[6], (S, dims.context), 0, dims.vocab)

    def mk_jd(k):
        @jax.jit
        def f(w, eout, ctx):
            def body(ctx, _):
                dout = rt.decoder_step(w, ctx)
                logits = rt.joiner(w, eout, dout)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                ctx = jnp.concatenate([ctx[:, 1:], tok[:, None]], axis=1)
                return ctx, None
            ctx, _ = jax.lax.scan(body, ctx, None, length=k)
            return ctx[0, 0]
        return lambda: f(w, eout, ctx0)

    ms, _ = slope(mk_jd, 1, 16)
    print(f"joiner+decoder: {ms:.3f} ms/iter (x75 per 1s chunk = {75 * ms:.1f} ms)")

    # full engine step
    from april_asr_tpu.config import EngineConfig
    from april_asr_tpu.engine import build_engine, init_engine_state

    chunk = 16000
    prog = build_engine(rt, batch=S, cfg=EngineConfig(chunk_samples=chunk))
    audio = jnp.asarray(
        (np.random.default_rng(0).normal(0, 0.2, (S, chunk)) * 20000).astype(np.int16))
    n = jnp.full(S, chunk, jnp.int32)

    st = {"s": init_engine_state(prog)}

    def step():
        st["s"], ev = prog.step(rt.weights, st["s"], audio, n)
        return ev

    # chained steps: per-step cost via 12 dispatches, single final readback
    for _ in range(3):
        step()
    _force(step())
    t0 = time.perf_counter()
    for _ in range(11):
        step()
    _force(step())
    t = (time.perf_counter() - t0) / 12 * 1000
    print(f"full step S={S} chunk=1.0s: {t:.1f} ms ({S / (t / 1000):,.0f} audio-s/s)")


if __name__ == "__main__":
    main()
