"""Minimal RIFF/WAVE reader/writer for PCM16 (no external audio deps).

Capability parity with the reference CLI's wav handling (reference:
example.cpp:57-116 reads the data chunk of a PCM16 wav and feeds it raw).
Adds: proper chunk walking, multi-channel downmix, and optional linear
resampling to the model rate for convenience.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


class WavError(ValueError):
    pass


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Returns (mono int16 samples, sample_rate)."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 44 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)
    if fmt is None or pcm is None:
        raise WavError(f"{path}: missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format not in (1, 0xFFFE):  # PCM (or extensible assumed PCM)
        raise WavError(f"{path}: unsupported wav format {audio_format}")
    if bits == 16:
        samples = np.frombuffer(pcm, dtype="<i2")
    elif bits == 8:
        samples = ((np.frombuffer(pcm, dtype=np.uint8).astype(np.int16) - 128) << 8)
    elif bits == 32:
        samples = (np.frombuffer(pcm, dtype="<i4") >> 16).astype(np.int16)
    else:
        raise WavError(f"{path}: unsupported bit depth {bits}")
    if channels > 1:
        n = len(samples) // channels
        samples = (
            samples[: n * channels]
            .reshape(n, channels)
            .mean(axis=1)
            .astype(np.int16)
        )
    return samples, rate


def resample_linear(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Linear-interpolation resample (host-side convenience; the serving path
    expects correctly-rated input like the reference, april_api.h:180-183)."""
    if src_rate == dst_rate:
        return samples
    n_out = int(round(len(samples) * dst_rate / src_rate))
    x_out = np.arange(n_out) * (src_rate / dst_rate)
    return np.interp(x_out, np.arange(len(samples)), samples.astype(np.float64)).astype(
        np.int16
    )


def write_wav(path: str, samples: np.ndarray, rate: int) -> None:
    samples = np.asarray(samples, np.int16)
    body = samples.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(body)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(body)))
        f.write(body)
