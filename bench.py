#!/usr/bin/env python
"""Throughput benchmark: concurrent streaming sessions on one chip.

Measures steady-state audio-seconds processed per wall-clock second for the
flagship model (reference dims: 12-layer LSTM 512/1024, vocab 500 —
src/april_model.h:35-41) across a batch of concurrent realtime sessions,
including the host event transfer + callback replay.

Baseline: the reference's design point is ~1x realtime per CPU thread
(april-docs/src/concepts.md:73-83; BASELINE.md), i.e. 1.0 audio-second/s —
vs_baseline is the speedup over that. North star: >=10,000 concurrent
realtime 16 kHz sessions per v5e host.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def build_runtime(bias_blank: float = 4.0):
    """Flagship random-weight runtime with a realistic emission rate (blank
    logit biased up so emissions are sparse like real speech)."""
    import jax

    from april_asr_tpu.io.params import build_vocab_tables
    from april_asr_tpu.models import TransducerDims, init_transducer_params
    from april_asr_tpu.models.export import make_model_parameters
    from april_asr_tpu.models.loader import (
        ModelRuntime,
        _fbank_opts_from_params,
        _native_runtime_fns,
    )
    from april_asr_tpu.testing import default_tokens

    import jax.numpy as jnp

    from april_asr_tpu.models.lstm_transducer import (
        cast_weights,
        precompute_decoder_tables,
    )

    dims = TransducerDims()
    params = init_transducer_params(jax.random.PRNGKey(0), dims)
    params["join_b"] = params["join_b"].at[0].add(bias_blank)
    params = precompute_decoder_tables(params, dims)
    if os.environ.get("APRIL_BENCH_PRECISION", "bf16") == "bf16":
        params = cast_weights(params, jnp.bfloat16)
    mp = make_model_parameters(dims, default_tokens(dims.vocab))
    enc, dec, joi = _native_runtime_fns(dims)
    return ModelRuntime(
        name="flagship-bench", description="", language="en-us",
        params=mp, fbank_opts=_fbank_opts_from_params(mp),
        vocab=build_vocab_tables(mp), dims=dims, kind="native",
        weights=params, encoder_step=enc, decoder_step=dec, joiner=joi,
        state_shapes=((dims.layers, dims.d_model), (dims.layers, dims.hidden)),
    )


def bench_batch(rt, S: int, steps: int = 20, warmup: int = 3):
    """Returns (audio_seconds_per_second, p50_step_ms, events_per_step)."""
    import jax
    import jax.numpy as jnp

    from april_asr_tpu.engine import build_engine, init_engine_state
    from april_asr_tpu.engine.replay import EventReplayer
    from april_asr_tpu.engine.step import unpack_events_np

    prog = build_engine(rt, batch=S)
    state = init_engine_state(prog)
    chunk = prog.cfg.chunk_samples
    audio_s_per_step = S * chunk / rt.sample_rate

    rng = np.random.default_rng(0)
    t = np.arange(chunk) / rt.sample_rate
    base = 0.3 * np.sin(2 * np.pi * 220 * t)
    audio_np = (
        (base[None, :] + rng.normal(0, 0.05, size=(S, chunk))) * 20000
    ).astype(np.int16)
    audio = jnp.asarray(audio_np)
    n = jnp.full(S, chunk, jnp.int32)

    sink = []
    replayers = [EventReplayer(rt.params, lambda r, toks: sink.append(r)) for _ in range(S)]

    def replay(packed):
        ev = unpack_events_np(np.asarray(packed))
        ops = ev["ops"]
        total = 0
        for s_idx in np.nonzero(ops.reshape(S, -1).any(axis=1))[0]:
            for p in range(ops.shape[1]):
                if not ops[s_idx, p].any():
                    continue
                for j in range(ops.shape[2]):
                    o = int(ops[s_idx, p, j])
                    if o:
                        replayers[s_idx].apply(
                            o, int(ev["tok"][s_idx, p, j]),
                            float(ev["logprob"][s_idx, p, j]),
                            int(ev["flags"][s_idx, p, j]),
                            int(ev["time_ms"][s_idx, p, j]),
                            int(ev["final_k"][s_idx, p, j]),
                        )
                        total += 1
        return total

    for _ in range(warmup):
        state, events = prog.step(rt.weights, state, audio, n)
    jax.block_until_ready(events)

    times = []
    n_events = 0
    for _ in range(steps):
        t0 = time.perf_counter()
        state, events = prog.step(rt.weights, state, audio, n)
        n_events += replay(events)  # np.asarray blocks on the step
        times.append(time.perf_counter() - t0)

    p50 = float(np.percentile(times, 50))
    return audio_s_per_step / p50, p50 * 1000.0, n_events / steps


def main():
    batches = [int(x) for x in os.environ.get("APRIL_BENCH_BATCHES", "256,1024").split(",")]
    steps = int(os.environ.get("APRIL_BENCH_STEPS", "20"))
    rt = build_runtime()

    best = (0.0, 0, 0.0)
    for S in batches:
        try:
            thr, p50_ms, evps = bench_batch(rt, S, steps=steps)
        except Exception as e:
            print(f"# batch {S} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        print(
            f"# batch={S}: {thr:,.0f} audio-s/s, p50 step {p50_ms:.1f} ms, "
            f"{evps:.0f} events/step",
            file=sys.stderr,
        )
        if thr > best[0]:
            best = (thr, S, p50_ms)

    thr, S, p50_ms = best
    print(
        json.dumps(
            {
                "metric": f"audio_seconds_per_second_per_chip (flagship LSTM transducer, {S} concurrent streaming sessions, incl. host event replay; p50 step {p50_ms:.1f} ms per 200 ms chunk)",
                "value": round(thr, 1),
                "unit": "audio-s/s",
                "vs_baseline": round(thr / 1.0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
