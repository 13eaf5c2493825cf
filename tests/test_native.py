"""Native host runtime: SPSC audio ring + time-stretcher.

Covers the TPU framework's equivalents of the reference's audio_provider
(SPSC ring, audio_provider.c:31-98) and sonic time-stretch (fbank.c:164-186),
including the cross-thread producer/consumer contract and the ASYNC_RT
session wiring.
"""

import threading

import numpy as np
import pytest

from april_asr_tpu.native import AudioRing, TimeStretcher, native_available


def test_ring_push_pull_roundtrip():
    r = AudioRing(1000)
    a = np.arange(600, dtype=np.int16)
    assert r.push(a)
    out = r.pull(256)
    assert np.array_equal(out, a[:256])
    assert r.available == 344
    # wraps around the end of the buffer
    assert r.push(a)
    out2 = r.pull(2000)
    assert np.array_equal(out2, np.concatenate([a[256:], a]))
    assert r.available == 0


def test_ring_overflow_is_all_or_nothing():
    """ap_push_audio semantics (audio_provider.c:59-64): a block that does
    not fit is rejected whole and counted."""
    r = AudioRing(100)
    assert r.push(np.zeros(80, np.int16))
    assert not r.push(np.ones(30, np.int16))
    assert r.dropped == 30
    # the accepted data is intact
    assert np.array_equal(r.pull(100), np.zeros(80, np.int16))


def test_ring_spsc_threads():
    """Producer and consumer on different threads see every sample in order."""
    r = AudioRing(4096)
    total = 200_000
    src = (np.arange(total) % 32003).astype(np.int16)
    got = []

    def produce():
        pos = 0
        while pos < total:
            n = min(1000, total - pos)
            if r.push(src[pos : pos + n]):
                pos += n

    t = threading.Thread(target=produce)
    t.start()
    while sum(len(g) for g in got) < total:
        out = r.pull(1500)
        if len(out):
            got.append(out)
    t.join()
    assert np.array_equal(np.concatenate(got), src)


@pytest.mark.parametrize("speed", [1.25, 1.5, 2.0, 3.0])
def test_stretch_ratio(speed):
    s = TimeStretcher(16000)
    s.set_speed(speed)
    t = np.arange(32000) / 16000.0
    x = (np.sin(2 * np.pi * 110 * t) * 10000).astype(np.int16)
    y = s.process(x, flush=True)
    ratio = len(x) / len(y)
    assert abs(ratio - speed) < speed * 0.2


def test_stretch_passthrough_identity():
    s = TimeStretcher(16000)
    x = (np.random.default_rng(0).normal(0, 3000, 16000)).astype(np.int16)
    y = s.process(x, flush=True)
    assert np.array_equal(y, x)


def test_stretch_streaming_chunks_match_total_rate():
    s = TimeStretcher(16000)
    s.set_speed(1.5)
    rng = np.random.default_rng(1)
    x = (rng.normal(0, 2000, 48000)).astype(np.int16)
    outs = [s.process(x[i : i + 3200]) for i in range(0, len(x), 3200)]
    outs.append(s.process(np.zeros(0, np.int16), flush=True))
    n_out = sum(len(o) for o in outs)
    assert abs(len(x) / n_out - 1.5) < 0.3


def test_stretch_preserves_energy_roughly():
    """Stretched speech-band audio should keep comparable RMS (pitch-
    synchronous OLA, not decimation)."""
    s = TimeStretcher(16000)
    s.set_speed(2.0)
    t = np.arange(32000) / 16000.0
    x = (np.sin(2 * np.pi * 160 * t) * 10000).astype(np.int16)
    y = s.process(x, flush=True).astype(np.float64)
    rms_in = np.sqrt(np.mean(x.astype(np.float64) ** 2))
    rms_out = np.sqrt(np.mean(y**2))
    assert 0.5 < rms_out / rms_in < 1.5


def test_async_rt_session_with_stretcher(tmp_path):
    """ASYNC_RT end-to-end: feed faster than realtime, confirm results still
    arrive and the session survives (CANT_KEEP_UP allowed but not required)."""
    pytest.importorskip("torch")
    from april_asr_tpu.api import Model, Session
    from april_asr_tpu.testing import FixtureConfig, write_test_april

    path = tmp_path / "fixture.april"
    write_test_april(path, FixtureConfig())
    model = Model(path)
    events = []
    sess = Session(model, lambda r, toks: events.append(r), asynchronous=True)
    rng = np.random.default_rng(0)
    pcm = (rng.normal(0, 0.2, 16000).clip(-1, 1) * 32767).astype(np.int16)
    for i in range(0, len(pcm), 3200):
        sess.feed_pcm16(pcm[i : i + 3200])
    sess.flush()
    sess.close()
    assert len(events) > 0


def test_native_builds_here():
    """The C++ library must actually build and load in this environment (the
    NumPy fallback exists for exotic deploy targets, not for CI)."""
    assert native_available()
