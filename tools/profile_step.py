"""Component-level timing of the engine step on the current backend.

Separates: dispatch RTT, host->device audio transfer, event readback,
encoder-only compute, joiner+decoder compute, and the full fused step —
to locate the bottleneck at each batch size.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import build_runtime  # noqa: E402

from april_asr_tpu.engine import build_engine, init_engine_state  # noqa: E402


def timeit(fn, n=10, warmup=3):
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50)) * 1000


def main():
    rt = build_runtime()
    dev = jax.devices()[0]
    print("device:", dev)

    # dispatch RTT
    tiny = jnp.zeros(8)
    f = jax.jit(lambda x: x + 1)
    print(f"null dispatch: {timeit(lambda: f(tiny)):.2f} ms")

    # transfers
    for S in (256, 1024):
        audio_np = np.zeros((S, 3200), np.int16)
        print(f"h2d {S}x3200 i16 ({S*3200*2/1e6:.1f} MB): "
              f"{timeit(lambda: jax.device_put(audio_np, dev)):.2f} ms")
    ev = jnp.zeros((1024, 5, 3, 6), jnp.int32)
    print(f"d2h events (368KB): {timeit(lambda: np.asarray(ev)):.2f} ms")

    for S in (32, 256, 1024):
        prog = build_engine(rt, batch=S)
        state = init_engine_state(prog)
        audio = jnp.zeros((S, 3200), np.int16)
        n = jnp.full(S, 3200, jnp.int32)

        # full step (no donation reuse issues: rebind state each call)
        st = {"s": state}

        def step():
            st["s"], ev = prog.step(rt.weights, st["s"], audio, n)
            return ev

        print(f"S={S}: full step {timeit(step):.2f} ms")

        # encoder-only x5 (the LSTM cost floor)
        h = jnp.zeros((rt.dims.layers, S, rt.dims.d_model), jnp.float32)
        c = jnp.zeros((rt.dims.layers, S, rt.dims.hidden), jnp.float32)
        x = jnp.zeros((S, rt.dims.segment_size, rt.dims.mel), jnp.float32)

        @jax.jit
        def enc5(w, x, h, c):
            def body(carry, _):
                h, c = carry
                eout, h, c = rt.encoder_step(w, x, h, c)
                return (h, c), eout
            (h, c), eouts = jax.lax.scan(body, (h, c), None, length=5)
            return eouts

        print(f"S={S}: encoder x5 {timeit(lambda: enc5(rt.weights, x, h, c)):.2f} ms")

        # joiner+decoder x15
        eout = jnp.zeros((S, rt.dims.joiner_dim), jnp.float32)
        ctx = jnp.zeros((S, rt.dims.context), jnp.int32)

        @jax.jit
        def joindec(w, eout, ctx):
            def body(carry, _):
                dout = rt.decoder_step(w, ctx)
                logits = rt.joiner(w, eout, dout)
                return carry, logits.max()
            _, r = jax.lax.scan(body, 0, None, length=15)
            return r

        print(f"S={S}: joiner+decoder x15 {timeit(lambda: joindec(rt.weights, eout, ctx)):.2f} ms")


if __name__ == "__main__":
    main()
