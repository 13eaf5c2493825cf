"""End-to-end attribution: time the REAL engine step with stages knocked out.

Chained-dispatch timing (12 steps, one readback) of:
  full        — the shipped step
  no-decode   — inner decode replaced by zero events (fbank + embed + LSTM)
  no-lstm     — encoder_recurrent replaced by a single cheap matmul
  no-fbank    — fbank accept/front replaced by reusing a constant window set
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import build_runtime  # noqa: E402

from april_asr_tpu.config import DecodeConfig, EngineConfig  # noqa: E402
from april_asr_tpu.decode import events as evmod  # noqa: E402
from april_asr_tpu.decode.greedy import decode_step, vocab_tables_device  # noqa: E402
from april_asr_tpu.engine import build_engine, init_engine_state  # noqa: E402
from april_asr_tpu.engine.step import INNER_STEPS_EMIT, pack_events  # noqa: E402
from april_asr_tpu.frontend.fbank import (  # noqa: E402
    FbankLayout,
    fbank_accept_batch,
    fbank_advance_n,
    fbank_front,
)


def _force(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


def bench_step(step, state0, weights, audio, n, iters=12):
    st = {"s": state0}

    def one():
        st["s"], ev = step(weights, st["s"], audio, n)
        return ev

    for _ in range(3):
        one()
    _force(one())
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        one()
    _force(one())
    return (time.perf_counter() - t0) / iters * 1000


def make_variant(rt, batch, chunk, *, decode=True, lstm=True, fbank=True,
                 accept=None, front=None):
    do_accept = fbank if accept is None else accept
    do_front = fbank if front is None else front
    cfg = EngineConfig(chunk_samples=chunk)
    dcfg = DecodeConfig()
    layout = FbankLayout.build(rt.fbank_opts, cfg.chunk_samples)
    vt = vocab_tables_device(rt.vocab)
    blank = rt.blank_id
    stride = layout.opts.segment_stride_ms
    seg = layout.opts.pull_segment_count
    P = layout.max_pulls_per_step
    step_rows = layout.opts.pull_segment_step
    W = (P - 1) * step_rows + seg
    dims = rt.dims

    v_accept = lambda s, w, m: fbank_accept_batch(layout, s, w, m)

    def inner_decode(weights, eout, can, dstate):
        if not decode:
            S = can.shape[0]
            z = jnp.zeros((S, 3), jnp.int32)
            ev = {"ops": z, "tok": z, "logprob": jnp.zeros((S, 3), jnp.float32),
                  "flags": z, "time_ms": z, "final_k": z}
            # keep a data dependency on eout so nothing is DCE'd
            ev["logprob"] = ev["logprob"] + eout[:, :1]
            return dstate, ev
        done = ~can
        evts = []
        for ee in INNER_STEPS_EMIT:
            logits = rt.joiner(weights, eout, dstate["dout"])
            dstate, evt, is_blank, need_dec = decode_step(
                dstate, logits, ~done, ee, blank, vt, dcfg)
            new_dout = rt.decoder_step(weights, dstate["context"])
            dstate["dout"] = jnp.where(need_dec[:, None], new_dout, dstate["dout"])
            done = done | is_blank
            evts.append(evt)
        return dstate, {k: jnp.stack([e[k] for e in evts], axis=1) for k in evts[0]}

    def recurrent(weights, y0_i, h, c, gate):
        if not lstm:
            eout = jnp.dot(y0_i, weights["enc_proj_t"].astype(jnp.float32),
                           preferred_element_type=jnp.float32)
            return eout, h + y0_i[None, :, :] * 1e-9, c
        return rt.encoder_recurrent(weights, y0_i, h, c, gate)

    def step(weights, state, audio_i16, n):
        audio = audio_i16.astype(jnp.float32) / 32768.0
        S = n.shape[0]
        if do_accept:
            fb = v_accept(state["fbank"], audio, n)
        else:
            fb = dict(state["fbank"])
            fb["fifo"] = fb["fifo"] + audio[:, :1, None] * 1e-9
            fb["fifo_len"] = jnp.full(S, P * step_rows + seg, jnp.int32)
        if do_front:
            fr = jax.vmap(lambda s: fbank_front(layout, s, W))(fb)
        else:
            fr = audio[:, : W * dims.mel].reshape(S, W, dims.mel) + fb["fifo"][:, :1, :1]
        can = fb["fifo_len"][None, :] >= (
            seg + step_rows * jnp.arange(P, dtype=jnp.int32)[:, None])
        n_pulled = jnp.clip((fb["fifo_len"] - seg) // step_rows + 1, 0, P)
        fb = jax.vmap(lambda s, k: fbank_advance_n(layout, s, k))(fb, n_pulled)
        front = fr
        windows = jnp.stack(
            [front[:, i * step_rows : i * step_rows + seg] for i in range(P)])
        y0 = rt.encoder_embed(
            weights, windows.reshape(P * S, seg, windows.shape[-1])
        ).reshape(P, S, -1)

        h, c, dstate = state["h"], state["c"], state["decode"]

        if lstm and rt.encoder_chunk is not None:
            # mirror the engine's whole-chunk fast path (engine/step.py)
            eouts, h, c = rt.encoder_chunk(weights, y0, h, c, can)

            def scan_body(dstate, xs):
                eout_i, can_i = xs
                dstate = dict(dstate)
                dstate["time_ms"] = dstate["time_ms"] + stride * can_i.astype(
                    jnp.int32
                )
                dstate, events = inner_decode(weights, eout_i, can_i, dstate)
                return dstate, events

            dstate, events = jax.lax.scan(scan_body, dstate, (eouts, can))
        else:
            def scan_body(carry, xs):
                h, c, dstate = carry
                y0_i, can_i = xs
                dstate = dict(dstate)
                dstate["time_ms"] = dstate["time_ms"] + stride * can_i.astype(jnp.int32)
                eout, h, c = recurrent(weights, y0_i, h, c, can_i)
                dstate, events = inner_decode(weights, eout, can_i, dstate)
                return (h, c, dstate), events

            (h, c, dstate), events = jax.lax.scan(
                scan_body, (h, c, dstate), (y0, can)
            )
        events = {k: jnp.transpose(v, (1, 0, 2)) for k, v in events.items()}
        state = {"fbank": fb, "h": h, "c": c, "decode": dstate}
        return state, pack_events(events, dstate["time_ms"] * 0, 40).dense

    return jax.jit(step, donate_argnums=(1,))


def main():
    rt = build_runtime()
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    prog = build_engine(rt, batch=S, cfg=EngineConfig(chunk_samples=chunk))
    audio = jnp.asarray((np.random.default_rng(0).normal(0, 0.2, (S, chunk)) * 20000
                         ).astype(np.int16))
    n = jnp.full(S, chunk, jnp.int32)

    for name, kw in [
        ("full      ", dict()),
        ("no-accept ", dict(accept=False)),
        ("no-front  ", dict(front=False)),
        ("no-fbank  ", dict(fbank=False)),
        ("no-decode ", dict(decode=False)),
        ("no-lstm   ", dict(lstm=False)),
    ]:
        step = make_variant(rt, S, chunk, **kw)
        st0 = init_engine_state(prog)
        t = bench_step(step, st0, rt.weights, audio, n)
        print(f"{name}: {t:7.1f} ms/step  ({S / (t / 1000):8,.0f} audio-s/s)")


if __name__ == "__main__":
    main()
