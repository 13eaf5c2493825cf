"""Training data pipeline: manifest -> log-mel features -> padded batches.

Manifest format: one example per line, `wav_path<TAB>transcript` (paths
relative to the manifest's directory are resolved against it). Features are
the exact serving frontend DSP (frontend/oracle.py — the NumPy oracle of the
reference fbank.c), computed host-side per utterance and cached, so a model
trained here sees the same features the streaming engine produces.

Batches are fixed-shape (mel padded to the bucket length, labels padded with
blank) so every step hits the same compiled executable; `frame_lens` counts
encoder windows (the fbank 9/4 pull schedule) and masks padding in the loss.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..config import FbankOptions
from ..frontend.oracle import logmel_frames
from ..io.wav import read_wav
from .tokenizer import PieceTokenizer


@dataclasses.dataclass
class Example:
    path: str
    text: str
    mel: Optional[np.ndarray] = None  # [T, mel] float32
    labels: Optional[np.ndarray] = None  # [U] int32


def read_manifest(path: str | os.PathLike) -> List[Example]:
    base = os.path.dirname(os.fspath(path))
    out: List[Example] = []
    with open(path, "r", encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) != 2:
                raise ValueError(f"{path}:{ln}: expected `wav<TAB>text`")
            wav, text = parts
            if not os.path.isabs(wav):
                wav = os.path.join(base, wav)
            out.append(Example(path=wav, text=text))
    return out


def featurize(
    examples: Sequence[Example], opts: FbankOptions, tok: PieceTokenizer
) -> List[Example]:
    """Fill mel/labels in place; drops utterances too short for one window
    or with empty transcripts."""
    kept: List[Example] = []
    for ex in examples:
        if ex.mel is None:
            wave, rate = read_wav(ex.path)
            if rate != opts.sample_freq:
                raise ValueError(
                    f"{ex.path}: sample rate {rate} != model {opts.sample_freq}"
                )
            ex.mel = logmel_frames(
                opts, wave.astype(np.float32) / 32768.0
            ).astype(np.float32)
        if ex.labels is None:
            ex.labels = np.asarray(tok.encode(ex.text), np.int32)
        if (
            ex.mel.shape[0] >= opts.pull_segment_count
            and ex.labels.size > 0
        ):
            kept.append(ex)
    return kept


def num_windows(frames: int, seg: int, step: int) -> int:
    return max(0, (frames - seg) // step + 1)


def make_batches(
    examples: Sequence[Example],
    batch_size: int,
    seg: int,
    step: int,
    blank_id: int,
    seed: int = 0,
    drop_last: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """One epoch of shuffled fixed-shape batches. Short batches at the end
    are padded with repeats of the first element (their loss still counts —
    deterministic shapes beat a <1% duplication bias at this scale)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(examples))
    # length-sorted within shuffled macro-chunks: keeps padding waste low
    # while still varying batch composition across epochs
    chunk = batch_size * 16
    buckets: List[np.ndarray] = []
    for i in range(0, len(order), chunk):
        part = order[i : i + chunk]
        buckets.append(part[np.argsort([examples[j].mel.shape[0] for j in part])])
    order = np.concatenate(buckets) if buckets else order

    for i in range(0, len(order), batch_size):
        idx = order[i : i + batch_size]
        if len(idx) < batch_size:
            if drop_last:
                return
            idx = np.concatenate([idx, np.repeat(idx[:1], batch_size - len(idx))])
        batch = [examples[j] for j in idx]
        T = max(ex.mel.shape[0] for ex in batch)
        # pad to a full window multiple so every frame_len is representable
        T = seg + ((max(T - seg, 0) + step - 1) // step) * step
        U = max(ex.labels.size for ex in batch)
        mel = np.zeros((batch_size, T, batch[0].mel.shape[1]), np.float32)
        labels = np.full((batch_size, U), blank_id, np.int32)
        frame_lens = np.zeros(batch_size, np.int32)
        label_lens = np.zeros(batch_size, np.int32)
        for k, ex in enumerate(batch):
            t, u = ex.mel.shape[0], ex.labels.size
            mel[k, :t] = ex.mel
            labels[k, :u] = ex.labels
            frame_lens[k] = num_windows(t, seg, step)
            label_lens[k] = u
        yield {
            "mel": mel,
            "labels": labels,
            "frame_lens": frame_lens,
            "label_lens": label_lens,
        }
