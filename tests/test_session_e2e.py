"""End-to-end session tests: the fused batched engine vs the scalar session
oracle (same device primitives, scalar decode), through the public API."""

import numpy as np
import pytest

from april_asr_tpu.api import Model, Result, Session
from april_asr_tpu.decode.scalar import RESULT_FINAL, RESULT_PARTIAL, RESULT_SILENCE
from april_asr_tpu.testing import FixtureConfig, ScalarSession, write_test_april

torch = pytest.importorskip("torch")

CFG = FixtureConfig()


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "fixture.april"
    write_test_april(path, CFG)
    return Model(path)


def make_audio(seconds=2.0, seed=0, rate=16000):
    rng = np.random.default_rng(seed)
    n = int(seconds * rate)
    t = np.arange(n) / rate
    x = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 1375 * t) * (np.sin(2 * np.pi * 3 * t) > 0)
        + rng.normal(0, 0.08, n)
    )
    return (np.clip(x, -1, 1) * 20000).astype(np.int16)


def cb_record(calls):
    def cb(result, tokens):
        calls.append(
            (
                int(result),
                tuple(
                    (t.token if hasattr(t, "token") else t.token_id,
                     round(float(t.logprob), 3),
                     getattr(t, "flags", 0),
                     getattr(t, "time_ms", 0))
                    for t in tokens
                ),
            )
        )

    return cb


def scalar_calls_to_api_form(model, calls):
    """Convert ScalarSession (token_id-based) callbacks to the api Token text
    form for comparison."""
    p = model.runtime.params
    out = []
    for result, toks in calls:
        out.append(
            (
                int(result),
                tuple(
                    (p.token_str(t.token_id), round(float(t.logprob), 3), t.flags, t.time_ms)
                    for t in toks
                ),
            )
        )
    return out


def test_sync_session_matches_scalar_oracle(model):
    audio = make_audio(2.5, seed=1)

    oracle_calls = []
    oracle = ScalarSession(model.runtime, lambda r, toks: oracle_calls.append((r, list(toks))))
    # feed in ragged pieces like a live client would
    for off in range(0, len(audio), 5000):
        oracle.feed_pcm16(audio[off : off + 5000])
    oracle.flush()
    oracle_form = scalar_calls_to_api_form(
        model, [(r, toks) for r, toks in oracle_calls]
    )

    api_calls = []
    sess = Session(model, cb_record(api_calls))
    for off in range(0, len(audio), 5000):
        sess.feed_pcm16(audio[off : off + 5000].tobytes())
    sess.flush()
    sess.close()

    assert len(oracle_form) > 0, "oracle produced no callbacks; bad scenario"
    assert api_calls == oracle_form


def test_batched_sessions_identical_streams(model):
    """4 slots fed identical audio through one batched engine must produce 4
    identical callback streams (no cross-session leakage)."""
    from april_asr_tpu.engine.batch import BatchEngine

    audio = make_audio(1.5, seed=2)
    eng = BatchEngine(model.runtime, batch=4)
    all_calls = [[] for _ in range(4)]
    for i in range(4):
        eng.alloc(
            lambda r, toks, i=i: all_calls[i].append(
                (r, tuple((t.token_id, t.flags, t.time_ms) for t in toks))
            )
        )
    for off in range(0, len(audio), 3200):
        for i in range(4):
            eng.feed(i, audio[off : off + 3200])
        while eng.tick():
            pass
    eng.flush(np.ones(4, bool))

    assert all_calls[0], "no output produced"
    for i in range(1, 4):
        assert all_calls[i] == all_calls[0], f"slot {i} diverged"


def test_slot_reuse_resets_state(model):
    from april_asr_tpu.engine.batch import BatchEngine

    audio = make_audio(1.0, seed=3)
    eng = BatchEngine(model.runtime, batch=2)

    def run_once():
        calls = []
        slot = eng.alloc(lambda r, toks: calls.append((r, tuple(t.token_id for t in toks))))
        eng.feed(slot, audio)
        while eng.tick():
            pass
        mask = np.zeros(2, bool)
        mask[slot] = True
        eng.flush(mask)
        eng.free(slot)
        return calls

    first = run_once()
    second = run_once()
    assert first == second


def test_session_requires_callback(model):
    with pytest.raises(ValueError):
        Session(model, None)  # reference: april_session.c:81-85


def test_async_session_delivers_results(model):
    import time

    audio = make_audio(1.5, seed=4)
    calls = []
    done_types = set()

    def cb(result, tokens):
        calls.append((result, tokens))
        done_types.add(int(result))

    sess = Session(model, cb, asynchronous=True, no_rt=True)
    for off in range(0, len(audio), 1600):
        sess.feed_pcm16(audio[off : off + 1600].tobytes())
    sess.flush()
    sess.close()
    assert calls, "async session produced no callbacks"


def test_speaker_state_roundtrip(model, tmp_path, monkeypatch):
    """speaker_name persists LSTM/decoder state across sessions (the
    reference reserves AprilSpeakerID but never implements it —
    april_api.h:78-84; here it works)."""
    import os

    monkeypatch.setenv("APRIL_SPEAKER_CACHE", str(tmp_path))
    audio = make_audio(seconds=1.0, seed=3)

    calls1 = []
    s1 = Session(model, cb_record(calls1), speaker_name="alice")
    s1.feed_pcm16(audio.tobytes())
    s1.close()
    files = os.listdir(tmp_path)
    assert files, "no speaker snapshot written"

    # a named session restores state; decode continues from carried state,
    # so its output on the same audio differs from a fresh session's
    calls_restored = []
    s2 = Session(model, cb_record(calls_restored), speaker_name="alice")
    s2.feed_pcm16(audio.tobytes())
    s2.close()

    calls_fresh = []
    s3 = Session(model, cb_record(calls_fresh))
    s3.feed_pcm16(audio.tobytes())
    s3.close()

    assert calls_restored != calls_fresh


def test_cant_keep_up_on_overflow(model):
    """Overflowing the bounded staging buffer drops the block and reports
    ERROR_CANT_KEEP_UP (reference audio_provider.c:59-64)."""
    calls = []
    sess = Session(model, lambda r, toks: calls.append(int(r)))
    # shrink the bound so a single feed overflows
    sess._engine.max_staged = 1600
    big = np.zeros(16000, np.int16)
    sess._engine.feed(sess._slot, big)
    assert calls and calls[-1] == int(Result.ERROR_CANT_KEEP_UP)


@pytest.mark.parametrize("chunk", [3200, 16000])
def test_flush_matches_oracle_for_any_chunk(model, chunk):
    """Flush must inject the reference's two FIXED 3200-sample zero blocks
    (april_session.c:555-556) and derive its scan bounds from the layout —
    NOT scale with the engine chunk. At chunk=16000 the old behavior padded
    2 s of silence and under-drained the FIFO; the stream must be identical
    to the scalar oracle (which runs at the reference's 3200 cadence)."""
    from april_asr_tpu.config import EngineConfig
    from april_asr_tpu.engine.batch import BatchEngine
    from april_asr_tpu.testing import ScalarSession

    audio = make_audio(1.7, seed=5)

    oracle_calls = []
    oracle = ScalarSession(
        model.runtime,
        lambda r, toks: oracle_calls.append(
            (r, tuple((t.token_id, t.flags, t.time_ms) for t in toks))
        ),
    )
    oracle.feed_pcm16(audio)
    oracle.flush()

    eng = BatchEngine(
        model.runtime, batch=2, cfg=EngineConfig(chunk_samples=chunk)
    )
    calls = []
    slot = eng.alloc(
        lambda r, toks: calls.append(
            (r, tuple((t.token_id, t.flags, t.time_ms) for t in toks))
        )
    )
    eng.feed(slot, audio)
    while eng.tick():
        pass
    mask = np.zeros(2, bool)
    mask[slot] = True
    eng.flush(mask)

    assert len(oracle_calls) > 0
    assert calls == oracle_calls
