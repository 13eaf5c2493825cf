#!/usr/bin/env python3
"""Regenerate tests/golden/fbank_*.npz from the reference C implementation.

The golden fixtures are produced by compiling the reference's fbank
(/root/reference/src/fbank.c + fft/pocketfft.c, see SURVEY.md §2.1 #6) into a
tiny standalone harness and streaming deterministic waveforms through it. The
reference tree is used strictly as a black-box oracle at fixture-generation
time; nothing from it is vendored into this repository (fixtures are
gitignored and rebuilt on demand — tests/conftest.py calls ensure_goldens()).

Harness protocol (stdin/stdout, little-endian):
  stdin : u32 wave_count, f32 wave[wave_count], u32 do_flush
  stdout: repeated segments of 9*80 f32, then EOF
"""

from __future__ import annotations

import os
import struct
import subprocess
import sys
import tempfile

import numpy as np

REF = os.environ.get("APRIL_REFERENCE_DIR", "/root/reference")
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

HARNESS_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include <string.h>
#include "fbank.h"
#include "log.h"

LogLevel g_loglevel = LEVEL_ERROR;

int main(void) {
    FBankOptions opts;
    memset(&opts, 0, sizeof(opts));
    opts.sample_freq = 16000;
    opts.frame_shift_ms = 10;
    opts.frame_length_ms = 25;
    opts.num_bins = 80;
    opts.round_pow2 = true;
    opts.mel_low = 20;
    opts.mel_high = 0;
    opts.snip_edges = true;
    opts.pull_segment_count = 9;
    opts.pull_segment_step = 4;
    opts.use_sonic = false;
    opts.remove_dc_offset = true;
    opts.preemph_coeff = 0.97f;

    uint32_t n = 0, do_flush = 0;
    if (fread(&n, 4, 1, stdin) != 1) return 1;
    float *wave = (float *)malloc((size_t)n * 4);
    if (fread(wave, 4, n, stdin) != n) return 1;
    if (fread(&do_flush, 4, 1, stdin) != 1) return 1;

    OnlineFBank fb = make_fbank(opts);
    float seg[9 * 80];

    /* Stream in 1600-sample chunks; pull eagerly (chunking is
       output-invariant, the ring drains fully on every pull loop). */
    for (uint32_t off = 0; off < n; off += 1600) {
        uint32_t cnt = (n - off) < 1600 ? (n - off) : 1600;
        fbank_accept_waveform(fb, wave + off, cnt);
        while (fbank_pull_segments(fb, seg, sizeof(seg)))
            fwrite(seg, 4, 9 * 80, stdout);
    }
    if (do_flush) {
        int rounds = 0;
        while (fbank_flush(fb) && rounds++ < 1000)
            while (fbank_pull_segments(fb, seg, sizeof(seg)))
                fwrite(seg, 4, 9 * 80, stdout);
    }
    free_fbank(fb);
    free(wave);
    return 0;
}
"""


def build_harness(tmp: str) -> str:
    src = os.path.join(tmp, "harness.c")
    exe = os.path.join(tmp, "harness")
    with open(src, "w") as f:
        f.write(HARNESS_C)
    cmd = [
        "gcc", "-O2", "-o", exe, src,
        os.path.join(REF, "src", "fbank.c"),
        os.path.join(REF, "src", "fft", "pocketfft.c"),
        os.path.join(REF, "src", "sonic", "sonic.c"),
        "-I", os.path.join(REF, "src"),
        "-lm",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return exe


def make_waves() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(april_seed := 0x0417)
    t = np.arange(16000 * 2, dtype=np.float64) / 16000.0
    sine = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    noise = (0.1 * rng.standard_normal(16000)).astype(np.float32)
    mixed = (
        0.3 * np.sin(2 * np.pi * 220.0 * t[:24000])
        + 0.05 * rng.standard_normal(24000)
    ).astype(np.float32)
    del april_seed
    return {"sine": sine, "noise": noise, "mixed": mixed}


def run_harness(exe: str, wave: np.ndarray, do_flush: bool) -> np.ndarray:
    payload = (
        struct.pack("<I", len(wave))
        + wave.astype("<f4").tobytes()
        + struct.pack("<I", int(do_flush))
    )
    out = subprocess.run([exe], input=payload, capture_output=True, check=True)
    segs = np.frombuffer(out.stdout, dtype="<f4")
    assert segs.size % (9 * 80) == 0, segs.size
    return segs.reshape(-1, 9, 80).copy()


def ensure_goldens(force: bool = False) -> None:
    names = {"sine": False, "noise": False, "mixed": True}
    paths = {n: os.path.join(GOLDEN_DIR, f"fbank_{n}.npz") for n in names}
    if not force and all(os.path.exists(p) for p in paths.values()):
        return
    if not os.path.isdir(os.path.join(REF, "src")):
        raise FileNotFoundError(f"reference tree not found at {REF}")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    waves = make_waves()
    with tempfile.TemporaryDirectory() as tmp:
        exe = build_harness(tmp)
        for name, do_flush in names.items():
            segs = run_harness(exe, waves[name], do_flush)
            np.savez(paths[name], wave=waves[name], segs=segs)
            print(f"wrote {paths[name]}: {segs.shape[0]} segments")


if __name__ == "__main__":
    ensure_goldens(force="--force" in sys.argv)
