"""Decode heuristics vs the reference's own compiled C implementation.

The fixtures in tests/golden/decode_*.npz are callback streams recorded from
the reference's `aas_process_logits` + helpers compiled as-is (stubbed ORT;
tools/gen_golden_decode.py), driven by deterministic table-logits keyed on
(frame, inner step, decoder context). These tests assert that:

1. `ScalarDecoder` (the hand-written oracle, decode/scalar.py) reproduces the
   compiled reference call-for-call — including the flush epilogue
   (finalize + clear_context + SILENCE, april_session.c:561-563).
2. The batched device decode (`decode_step`) reproduces the same stream
   through the packed-event replay path.

Together with test_decode_equivalence.py this closes the correctness chain:
compiled reference C -> scalar oracle -> batched TPU decode.
"""

import os

import numpy as np
import pytest

from april_asr_tpu.config import DecodeConfig
from april_asr_tpu.decode import ScalarDecoder
from april_asr_tpu.io.params import build_vocab_tables

from test_decode_equivalence import (
    BLANK,
    STRIDE_MS,
    VOCAB,
    logits_index,
    make_params,
    run_batched,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

MARKER = 0xFFFF  # separates streaming calls from the finalize tail

CONFIGS = ["mixed", "blanky", "emissive", "borderline", "overflow"]


def load_golden(name):
    path = os.path.join(GOLDEN_DIR, f"decode_{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {path} missing (reference tree absent?)")
    z = np.load(path)
    calls = []
    ti = 0
    for rt, cnt in zip(z["call_types"], z["call_counts"]):
        toks = tuple(
            (
                int(z["tok"][ti + j]),
                float(z["logprob"][ti + j]),
                int(z["flags"][ti + j]),
                int(z["time_ms"][ti + j]),
            )
            for j in range(int(cnt))
        )
        ti += int(cnt)
        calls.append((int(rt), toks))
    return z["table"], int(z["n_frames"]), calls


def split_tail(calls):
    """(streaming_calls, finalize_tail_calls) split at the 0xFFFF marker."""
    for i, (rt, _) in enumerate(calls):
        if rt == MARKER:
            return calls[:i], calls[i + 1 :]
    return calls, []


def canon(calls):
    """Strip logprobs: compared separately with tolerance (assert_calls_equal)
    because run_batched's replayer pre-rounds to 4 decimals and exact
    re-rounding would double-round at decimal boundaries."""
    return [
        (rt, tuple((t, fl, tm) for t, lp, fl, tm in toks)) for rt, toks in calls
    ]


def assert_calls_equal(a, b, atol=2e-4):
    assert canon(a) == canon(b)
    lps_a = [lp for _, toks in a for _, lp, _, _ in toks]
    lps_b = [lp for _, toks in b for _, lp, _, _ in toks]
    np.testing.assert_allclose(lps_a, lps_b, atol=atol, rtol=0)


def run_scalar_with_tail(table, n_frames, cfg, params, vt):
    calls = []

    def handler(result, tokens):
        calls.append(
            (
                result,
                tuple(
                    (t.token_id, float(t.logprob), t.flags, t.time_ms)
                    for t in tokens
                ),
            )
        )

    dec = ScalarDecoder(params, vt, cfg, handler, run_decoder=lambda ctx: None)
    for _ in range(dec.context_size):
        dec.update_context(dec.blank)
    dec.dout_init = True

    for frame in range(n_frames):
        dec.time_ms += STRIDE_MS
        for inner, ee in enumerate([1.0, 0.0, 0.0]):
            logits = table[logits_index(frame, inner, dec.context)]
            if dec.process_logits(logits, ee):
                break
    n_stream = len(calls)
    # _aas_flush epilogue (april_session.c:561-563)
    dec.finalize_tokens()
    dec.clear_context()
    dec.emit_silence()
    return calls[:n_stream], calls[n_stream:]


@pytest.mark.parametrize("name", CONFIGS)
def test_scalar_matches_compiled_reference(name):
    table, n_frames, golden = load_golden(name)
    g_stream, g_tail = split_tail(golden)

    cfg = DecodeConfig()
    params = make_params()
    vt = build_vocab_tables(params)
    s_stream, s_tail = run_scalar_with_tail(table, n_frames, cfg, params, vt)

    assert_calls_equal(s_stream, g_stream)
    assert_calls_equal(s_tail, g_tail)
    assert len(g_stream) > 5  # scenario actually produced output


@pytest.mark.parametrize("name", ["mixed", "overflow"])
def test_batched_matches_compiled_reference(name):
    table, n_frames, golden = load_golden(name)
    g_stream, _ = split_tail(golden)

    cfg = DecodeConfig()
    params = make_params()
    vt = build_vocab_tables(params)
    batched = run_batched(table, n_frames, cfg, params, vt, S=2)
    for s in range(2):
        assert_calls_equal(batched[s], g_stream)
