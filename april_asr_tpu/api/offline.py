"""Bulk offline transcription: many utterances decoded concurrently.

The reference processes one stream per session on one CPU thread; batch
evaluation of a corpus (the LibraryTest.java:35-86 end-to-end pattern, N
files) is therefore N sequential decodes. Here bulk work is where the
batched engine shines: `transcribe_pcm_batch` drives a BatchEngine with one
slot per utterance, interleaving chunk feeds across all slots so every
engine step advances the whole group — transcripts are identical to running
each utterance through its own `Session` (the engine IS the session
machinery; parity-tested in tests/test_offline.py).

Used by `april-transcribe --list manifest` and tools/wer_harness.py
`--engine-batch`.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..config import DecodeConfig, EngineConfig
from .types import Result


def transcribe_pcm_batch(
    model,
    waves: Sequence[np.ndarray],
    batch: int = 32,
    chunk_samples: int = 3200,
) -> List[str]:
    """Decode PCM16 utterances (1-D int16 arrays at the model rate) in
    concurrent groups of `batch`. Returns one transcript per utterance (all
    FINAL texts joined, like the reference example's stdout accumulation,
    example.cpp:61-76)."""
    from ..engine.batch import BatchEngine

    B = max(1, min(batch, len(waves)))
    engine = BatchEngine(
        model.runtime, batch=B, cfg=EngineConfig(chunk_samples=chunk_samples)
    )
    texts = [""] * len(waves)
    params = model.runtime.params

    for start in range(0, len(waves), B):
        group = list(range(start, min(start + B, len(waves))))
        slots = {}
        for idx in group:
            def mk(i):
                def on_result(result_type, tokens):
                    if result_type == int(Result.FINAL_RECOGNITION):
                        texts[i] += "".join(
                            params.token_str(t.token_id) for t in tokens
                        )
                return on_result

            slots[idx] = engine.alloc(mk(idx))

        # interleave: one chunk per live utterance per tick, so the staging
        # buffers stay bounded and every step carries the full group
        offs = {i: 0 for i in group}
        live = set(group)
        while live:
            for i in list(live):
                w = waves[i]
                off = offs[i]
                if off >= len(w):
                    live.discard(i)
                    continue
                engine.feed(slots[i], w[off : off + chunk_samples])
                offs[i] = off + chunk_samples
            while engine.tick():
                pass

        mask = np.zeros(B, bool)
        for i in group:
            mask[slots[i]] = True
        engine.flush(mask)
        for i in group:
            engine.free(slots[i])

    return [t.strip() for t in texts]


def transcribe_files(
    model,
    paths: Sequence[str],
    batch: int = 32,
    chunk_samples: int = 3200,
) -> List[str]:
    """Read + resample wav files, then `transcribe_pcm_batch` them."""
    from ..io.wav import read_wav, resample_linear

    rate = model.get_sample_rate()
    waves = []
    for p in paths:
        samples, wav_rate = read_wav(p)
        if wav_rate != rate:
            samples = resample_linear(samples, wav_rate, rate)
        waves.append(samples)
    return transcribe_pcm_batch(model, waves, batch=batch, chunk_samples=chunk_samples)
