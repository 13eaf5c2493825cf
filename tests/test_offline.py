"""Bulk offline transcription (api/offline.py): transcripts must be
IDENTICAL to running each utterance through its own Session, and the file
wrapper must round-trip wav IO."""

import numpy as np
import pytest

from april_asr_tpu.api import (
    Model,
    Result,
    Session,
    transcribe_files,
    transcribe_pcm_batch,
)
from april_asr_tpu.testing import FixtureConfig, write_test_april

torch = pytest.importorskip("torch")

CFG = FixtureConfig()


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "fixture.april"
    write_test_april(path, CFG)
    return Model(path)


def make_audio(seconds, seed, rate=16000):
    rng = np.random.default_rng(seed)
    n = int(seconds * rate)
    t = np.arange(n) / rate
    x = (
        0.3 * np.sin(2 * np.pi * (200 + 40 * seed) * t)
        + 0.2 * np.sin(2 * np.pi * 1300 * t) * (np.sin(2 * np.pi * 3 * t) > 0)
        + rng.normal(0, 0.08, n)
    )
    return (np.clip(x, -1, 1) * 20000).astype(np.int16)


def session_transcript(model, wave):
    parts = []

    def cb(result, tokens):
        if result == Result.FINAL_RECOGNITION:
            parts.append("".join(t.token for t in tokens))

    s = Session(model, cb)
    for off in range(0, len(wave), 3200):
        s.feed_pcm16(wave[off : off + 3200].tobytes())
    s.flush()
    s.close()
    return "".join(parts).strip()


def test_batch_matches_sessions(model):
    # uneven lengths force masked idling; batch < n forces two groups
    waves = [make_audio(s, i) for i, s in enumerate((1.3, 0.8, 2.0))]
    got = transcribe_pcm_batch(model, waves, batch=2)
    want = [session_transcript(model, w) for w in waves]
    assert got == want
    assert any(t for t in want)  # fixture must actually emit something


def test_transcribe_files_roundtrip(model, tmp_path):
    import wave as wavmod

    waves = [make_audio(1.0, 7), make_audio(0.6, 8)]
    paths = []
    for i, w in enumerate(waves):
        p = str(tmp_path / f"u{i}.wav")
        with wavmod.open(p, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(w.tobytes())
        paths.append(p)
    got = transcribe_files(model, paths, batch=4)
    want = transcribe_pcm_batch(model, waves, batch=4)
    assert got == want
