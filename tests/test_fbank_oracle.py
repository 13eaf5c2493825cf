"""Oracle fbank vs golden vectors captured from the reference C implementation
(fbank.c + pocketfft compiled into a standalone harness; fixtures in
tests/golden/fbank_*.npz hold the input waveform and every pulled segment)."""

import numpy as np
import pytest

from april_asr_tpu.config import FbankOptions
from april_asr_tpu.frontend import OracleFbank

OPTS = FbankOptions(
    sample_freq=16000,
    frame_shift_ms=10,
    frame_length_ms=25,
    num_bins=80,
    round_pow2=True,
    mel_low=20,
    mel_high=0,
    snip_edges=True,
    pull_segment_count=9,
    pull_segment_step=4,
    remove_dc_offset=True,
    preemph_coeff=0.97,
)


def run_stream(wave: np.ndarray, chunk: int, do_flush: bool) -> np.ndarray:
    fb = OracleFbank(OPTS)
    segs = []
    for off in range(0, len(wave), chunk):
        fb.accept_waveform(wave[off : off + chunk])
        while (s := fb.pull_segments()) is not None:
            segs.append(s)
    if do_flush:
        rounds = 0
        while fb.flush():
            while (s := fb.pull_segments()) is not None:
                segs.append(s)
            rounds += 1
            assert rounds < 1000
    return np.stack(segs) if segs else np.zeros((0, 9, 80), np.float32)


@pytest.mark.parametrize(
    "name,chunk,do_flush",
    [("sine", 3200, False), ("noise", 1000, False), ("mixed", 777, True)],
)
def test_oracle_matches_reference_golden(name, chunk, do_flush):
    data = np.load(f"tests/golden/fbank_{name}.npz")
    wave, golden = data["wave"], data["segs"]
    segs = run_stream(wave, chunk, do_flush)
    assert segs.shape == golden.shape
    # float64 FFT both sides; mel accumulation order differs (see oracle
    # docstring) so allow tiny absolute slack on the log-mel values.
    np.testing.assert_allclose(segs, golden, atol=5e-5, rtol=0)


def test_oracle_window_properties():
    fb = OracleFbank(OPTS)
    assert fb.padded == 512
    assert fb.window_shift == 160
    assert fb.window_size == 400
    assert fb.num_fft_bins == 256
    assert fb.window.shape == (512,)
    # Povey window over the padded size: nonzero at the far end (this is the
    # reference's quirk — Kaldi proper would zero-pad beyond sample 400).
    assert fb.window[450] > 0.1


def test_oracle_flush_debt_bounded():
    fb = OracleFbank(OPTS)
    fb.accept_waveform(np.zeros(3200, np.float32))
    rounds = 0
    while fb.flush():
        while fb.pull_segments() is not None:
            pass
        rounds += 1
        assert rounds < 100
    # avail_f floor is -3*segment_size = -27 (fbank.c:309-310)
    assert fb.avail_f < -(9 * 3)
