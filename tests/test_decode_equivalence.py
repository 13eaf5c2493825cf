"""Batched device decode vs scalar oracle: identical callback streams.

Synthetic deterministic logits (lookup-table function of frame, inner step,
and decoder context) drive both implementations through thousands of steps so
every heuristic branch fires: early-emit, repeat guard, punctuation boost,
digit-dot exception, confident-blank provisional emits with dedup, long
silence resets, token-window finalization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from april_asr_tpu.config import DecodeConfig
from april_asr_tpu.decode import (
    RESULT_FINAL,
    RESULT_PARTIAL,
    RESULT_SILENCE,
    ScalarDecoder,
    decode_step,
    init_decode_state,
    vocab_tables_device,
)
from april_asr_tpu.engine.replay import EventReplayer
from april_asr_tpu.io.params import ModelParameters, build_vocab_tables
from april_asr_tpu.testing import default_tokens

VOCAB = 64
BLANK = 0
STRIDE_MS = 40


def make_params():
    return ModelParameters(
        batch_size=1, segment_size=9, segment_step=4, mel_features=80,
        sample_rate=16000, frame_shift_ms=10, frame_length_ms=25,
        round_pow2=True, mel_low=20, mel_high=0, snip_edges=False,
        blank_id=BLANK, tokens=default_tokens(VOCAB, BLANK),
    )


def make_logits_table(seed, spread, blank_boost):
    """Deterministic logits: row chosen by a hash of (frame, inner, context).

    `spread` controls how often non-blank wins; `blank_boost` biases blank.
    """
    rng = np.random.default_rng(seed)
    K = 97
    table = (rng.normal(size=(K, VOCAB)) * spread).astype(np.float32)
    table[:, BLANK] += blank_boost
    return table


def logits_index(frame, inner, ctx):
    return (frame * 31 + inner * 7 + int(ctx[0]) * 3 + int(ctx[1])) % 97


def run_scalar(table, n_frames, cfg, params, vt, seed_sessions=1):
    calls = []

    def handler(result, tokens):
        calls.append(
            (
                result,
                tuple((t.token_id, round(t.logprob, 4), t.flags, t.time_ms) for t in tokens),
            )
        )

    dec = ScalarDecoder(params, vt, cfg, handler, run_decoder=lambda ctx: None)
    # prime context like aas_infer's first call (april_session.c:432-438)
    for _ in range(dec.context_size):
        dec.update_context(dec.blank)
    dec.dout_init = True

    for frame in range(n_frames):
        dec.time_ms += STRIDE_MS
        for inner, ee in enumerate([1.0, 0.0, 0.0]):
            logits = table[logits_index(frame, inner, dec.context)]
            if dec.process_logits(logits, ee):
                break
    return calls


def run_batched(table, n_frames, cfg, params, vt, S=4):
    vt_dev = vocab_tables_device(vt)
    state = init_decode_state(S, 2, 8, BLANK, cfg)
    table_j = jnp.asarray(table)

    step = jax.jit(
        lambda state, logits, active, ee: decode_step(
            state, logits, active, ee, BLANK, vt_dev, cfg
        ),
        static_argnums=(3,),
    )

    all_calls = [[] for _ in range(S)]
    replayers = [
        EventReplayer(
            params,
            lambda r, toks, i=i: all_calls[i].append(
                (r, tuple((t.token_id, round(t.logprob, 4), t.flags, t.time_ms) for t in toks))
            ),
        )
        for i in range(S)
    ]

    for frame in range(n_frames):
        state["time_ms"] = state["time_ms"] + STRIDE_MS
        done = jnp.zeros(S, bool)
        for inner, ee in enumerate([1.0, 0.0, 0.0]):
            # synthetic logits from each session's context
            idx = jnp.asarray(
                [
                    logits_index(frame, inner, np.asarray(state["context"][s]))
                    for s in range(S)
                ]
            )
            logits = table_j[idx]
            state, evt, is_blank, _ = step(state, logits, ~done, ee)
            evt_np = {k: np.asarray(v) for k, v in evt.items()}
            for s in range(S):
                replayers[s].apply(
                    int(evt_np["ops"][s]), int(evt_np["tok"][s]),
                    float(evt_np["logprob"][s]), int(evt_np["flags"][s]),
                    int(evt_np["time_ms"][s]), int(evt_np["final_k"][s]),
                )
            done = done | is_blank
    return all_calls


@pytest.mark.parametrize(
    "seed,spread,blank_boost,frames",
    [
        (0, 3.0, 1.0, 120),   # mixed emissions
        (1, 2.0, 4.0, 200),   # blank-dominated: silence resets, confident emits
        (2, 5.0, -1.0, 150),  # emission-heavy: token window finalization
        (3, 1.0, 2.0, 300),   # borderline: punctuation boosts, dedups
    ],
)
def test_batched_matches_scalar(seed, spread, blank_boost, frames):
    cfg = DecodeConfig()
    params = make_params()
    vt = build_vocab_tables(params)
    table = make_logits_table(seed, spread, blank_boost)

    scalar_calls = run_scalar(table, frames, cfg, params, vt)
    batched_calls = run_batched(table, frames, cfg, params, vt, S=3)

    for s in range(3):
        assert batched_calls[s] == scalar_calls, f"session {s} diverged"
    assert len(scalar_calls) > 5  # the scenario actually produced output


def test_token_window_overflow_finalizes():
    """Emission-heavy stream long enough to overflow the 72-token window
    (forces finalize_previous_words paths)."""
    cfg = DecodeConfig()
    params = make_params()
    vt = build_vocab_tables(params)
    table = make_logits_table(7, 6.0, -3.0)

    scalar_calls = run_scalar(table, 400, cfg, params, vt)
    batched_calls = run_batched(table, 400, cfg, params, vt, S=2)
    finals = [c for c in scalar_calls if c[0] == RESULT_FINAL]
    assert finals, "scenario must trigger FINAL"
    for s in range(2):
        assert batched_calls[s] == scalar_calls
