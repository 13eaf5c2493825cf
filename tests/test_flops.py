"""Model-FLOPs accounting (utils/flops.py) — the MFU denominators the bench
reports must stay pinned to the architecture dims, not drift with refactors.
"""

import pytest

from april_asr_tpu.models import TransducerDims
from april_asr_tpu.models.conformer import ConformerDims
from april_asr_tpu.utils.flops import (
    chip_peak_tflops,
    model_gflops_per_audio_second,
)


def test_flagship_lstm_gflops_matches_hand_count():
    """Reference dims (src/april_model.h:35-41): per layer per 40 ms pull,
    ih [512,4096] + hh [512,4096] + proj [1024,512] + FFN [512,2048]x2 =
    6.816 MMAC; x12 layers x2 FLOP/MAC x25 pulls/s ~= 4.09 GFLOP/audio-s,
    plus conv embed (~0.12) and 3 decode rounds (~0.04)."""
    g = model_gflops_per_audio_second(TransducerDims(), "lstm")
    enc = 12 * (512 * 4096 + 512 * 4096 + 1024 * 512 + 2 * 512 * 2048)
    assert abs(g - 2 * enc * 25 / 1e9) < 0.2  # embed+decode are the slack
    assert 4.0 < g < 4.5


def test_conformer_gflops_scale():
    g = model_gflops_per_audio_second(ConformerDims(), "conformer")
    assert 0.5 < g < 2.0  # d=256 model: ~1 GFLOP/audio-s


def test_beam_multiplies_decode_only():
    g1 = model_gflops_per_audio_second(TransducerDims(), "lstm", beam=1)
    g4 = model_gflops_per_audio_second(TransducerDims(), "lstm", beam=4)
    # encoder unchanged; only the 3 decode rounds scale by K
    extra = g4 - g1
    assert 0 < extra < 0.3
    j = TransducerDims().joiner_dim
    per_round = 2 * (j * j + j * TransducerDims().vocab) * 25 / 1e9
    assert abs(extra - 3 * 3 * per_round) < 1e-6  # (K-1)=3 extra per round


def test_chip_peak_env_override(monkeypatch):
    monkeypatch.setenv("APRIL_CHIP_PEAK_TFLOPS", "123.5")
    assert chip_peak_tflops("int8") == 123.5


def test_chip_peak_known_precisions():
    monkeypatch_free = chip_peak_tflops  # no env: falls back to device table
    assert monkeypatch_free("int8") >= monkeypatch_free("bf16") > 0
