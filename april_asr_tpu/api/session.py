"""Session API mirroring the reference binding's Session
(reference: bindings/python/april_asr/_april.py:110-179; C API
april_api.h:176-196).

Modes:
  * sync (default): feed_pcm16 blocks, callbacks fire on the caller's thread
    before it returns (reference april_session.c:479-480 sync path).
  * asynchronous: feed_pcm16 stages and returns; a background worker ticks the
    engine and fires callbacks from its thread (reference proc_thread.c).
    Bounded staging drops audio + ERROR_CANT_KEEP_UP on overflow
    (audio_provider.c:59-64).
  * asynchronous + not no_rt (ASYNC_RT): additionally tracks the realtime
    speedup estimate the reference maintains (april_session.c:456-473),
    exposed via get_rt_speedup(); audio time-stretching to catch up is applied
    through the frontend's speed factor.

speaker_name: the reference reserves per-speaker state save/restore but never
implemented it (april_api.h:78-81 "Currently not implemented"). Here it works:
on close, the session's LSTM/decoder state is snapshotted under the speaker
key; a new session with the same key resumes from it.
"""

from __future__ import annotations

import hashlib
import os
import queue
import threading
import time
from typing import Callable, List, Optional

import numpy as np

from ..decode.scalar import (
    RESULT_CANT_KEEP_UP,
    RESULT_FINAL,
    RESULT_PARTIAL,
    RESULT_SILENCE,
)
from ..engine.batch import BatchEngine
from ..native import AudioRing, TimeStretcher
from ..utils import logging as log
from .model import Model
from .types import Result, Token, tokens_from_scalar

SessionCallback = Callable[[Result, List[Token]], None]


def _speaker_dir() -> str:
    from ..engine.speaker import speaker_dir

    return speaker_dir()


class Session:
    """A speech recognition session bound to a Model."""

    def __init__(
        self,
        model: Model,
        callback: SessionCallback,
        asynchronous: bool = False,
        no_rt: bool = False,
        speaker_name: str = "",
        beam: int = 0,
    ):
        """`beam=K` (K >= 2) switches the session to streaming beam search
        (framework extension — the reference is greedy-only): PARTIAL
        callbacks report the best of K hypotheses, FINAL fires at flush.
        Greedy-mode heuristics (silence events, confident-blank emits) do
        not apply in beam mode."""
        if callback is None:
            # reference: april_session.c:81-85
            raise ValueError("a handler is required, please provide a handler")
        self.model = model
        self.callback = callback
        self.asynchronous = asynchronous
        self.force_realtime = asynchronous and not no_rt
        self.speaker_name = speaker_name
        self.beam = int(beam)

        rt = model.runtime
        self._params = rt.params
        # Each session gets its own batch-1 engine (reference isolation
        # semantics); the compiled program is shared via the Model cache.
        if self.beam >= 2:
            from ..engine.beam_engine import BeamEngine

            self._engine = BeamEngine(
                rt, batch=1, prog=model._get_beam_program(batch=1, beam=self.beam)
            )
        else:
            self._engine = BatchEngine(
                rt, batch=1, prog=model._get_program(batch=1)
            )
        self._slot = self._engine.alloc(self._on_result)
        self._closed = False
        self._speed_needed = 1.0
        self._last_tick_audio_ms = 0.0

        if speaker_name and self.beam < 2:
            # speaker snapshots capture greedy decode state; beam-mode
            # hypothesis state is reset per utterance and not snapshotted
            self._try_restore_speaker()

        self._queue: "queue.Queue[tuple]" = queue.Queue()
        self._worker: Optional[threading.Thread] = None
        self._ring: Optional[AudioRing] = None
        self._stretcher: Optional[TimeStretcher] = None
        self._last_speed_update = time.monotonic()
        if asynchronous:
            # native SPSC ring between the caller and worker threads,
            # 3 s of audio like the reference (audio_provider.c:31-40)
            self._ring = AudioRing(3 * model.get_sample_rate())
            if self.force_realtime:
                self._stretcher = TimeStretcher(model.get_sample_rate())
            self._worker = threading.Thread(
                target=self._worker_loop, name="april-session", daemon=True
            )
            self._worker.start()

    # -- result plumbing ---------------------------------------------------

    def _on_result(self, result_type: int, scalar_tokens) -> None:
        self.callback(Result(result_type), tokens_from_scalar(self._params, scalar_tokens))

    # -- public API --------------------------------------------------------

    def feed_pcm16(self, data) -> None:
        """Feed PCM16 mono samples (bytes or int16 array) at the model's
        sample rate (aas_feed_pcm16, april_api.h:180-183)."""
        if self._closed:
            raise ValueError("session is closed")
        pcm = np.frombuffer(data, dtype="<i2") if isinstance(data, (bytes, bytearray)) else np.asarray(data, np.int16)
        debug_path = os.environ.get("APRIL_DEBUG_SAVE_AUDIO")
        if debug_path:
            # golden-input capture hook: append the float waveform exactly as
            # the frontend sees it (reference APRIL_DEBUG_SAVE_AUDIO,
            # CMakeLists.txt:98-100, april_session.c:496-537 — there a
            # compile-time flag; here env-gated at runtime)
            with open(debug_path, "ab") as f:
                (pcm.astype(np.float32) / 32768.0).tofile(f)
        if self.asynchronous:
            # lock-free SPSC handoff to the worker; on overflow the whole
            # block is dropped and the handler fires on the caller thread
            # (reference aas_feed_pcm16 async path, april_session.c:480-493)
            if not self._ring.push(pcm):
                self.callback(Result(RESULT_CANT_KEEP_UP), [])
                return
            self._queue.put(("audio",))
        else:
            self._engine.feed(self._slot, pcm)
            self._drain_sync()

    def flush(self) -> None:
        """Process remaining samples and force a final result (aas_flush)."""
        if self._closed:
            raise ValueError("session is closed")
        if self.asynchronous:
            done = threading.Event()
            self._queue.put(("flush", done))
            done.wait(timeout=60.0)
        else:
            mask = np.zeros(self._engine.batch, bool)
            mask[self._slot] = True
            self._engine.flush(mask)

    def get_rt_speedup(self) -> float:
        """Realtime speedup estimate (aas_realtime_get_speedup,
        april_api.h:188-192); 1.0 unless ASYNC_RT and falling behind.

        Deviation from the reference: the reference times each session's own
        inference loop (april_session.c:456-462). Under batching there is no
        per-session loop — the estimate here is the engine-wide tick EMA
        scaled by this session's staged backlog (engine/batch.py
        rt_speedup), which tracks the same "how much faster than realtime
        must this stream be consumed" quantity per slot."""
        return float(self._speed_needed) if self.force_realtime else 1.0

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        if self._worker is not None:
            self._queue.put(("stop",))
            self._worker.join(timeout=10.0)
        if self.speaker_name and self.beam < 2:
            self._save_speaker()
        self._engine.free(self._slot)
        if self._ring is not None:
            self._ring.close()
        if self._stretcher is not None:
            self._stretcher.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- internals ---------------------------------------------------------

    def _drain_sync(self) -> None:
        while self._engine.pending(self._slot) > 0:
            t0 = time.monotonic()
            if not self._engine.tick():
                break
            self._update_speed(time.monotonic() - t0)

    def _update_speed(self, elapsed_s: float) -> None:
        """EMA of processing speed vs realtime (april_session.c:456-462)."""
        chunk_ms = self._engine.cfg.chunk_samples / self.model.get_sample_rate() * 1000.0
        needed = (elapsed_s * 1000.0 * 1.1) / max(chunk_ms, 1e-6)
        self._speed_needed = (self._speed_needed * 9.0 + needed) / 10.0

    def _worker_loop(self) -> None:
        while True:
            try:
                msg = self._queue.get(timeout=0.05)
            except queue.Empty:
                if self._ring.available or self._engine.pending(self._slot) > 0:
                    self._tick_async()
                continue
            if msg[0] == "stop":
                return
            if msg[0] == "audio":
                self._tick_async()
            elif msg[0] == "flush":
                self._drain_ring(flush=True)
                mask = np.zeros(self._engine.batch, bool)
                mask[self._slot] = True
                try:
                    self._engine.flush(mask)
                finally:
                    msg[1].set()

    def _drain_ring(self, flush: bool = False) -> None:
        """Move ring audio into the engine, time-stretching in RT mode when
        behind realtime (reference fbank_set_speed cadence,
        april_session.c:464-473: speed re-evaluated every 2 s)."""
        pcm = self._ring.pull(self._ring.capacity)
        if self._stretcher is not None:
            now = time.monotonic()
            if now - self._last_speed_update > 2.0:
                self._last_speed_update = now
                self._stretcher.set_speed(max(1.0, self._speed_needed))
            pcm = self._stretcher.process(pcm, flush=flush)
        if len(pcm):
            self._engine.feed(self._slot, pcm)

    def _tick_async(self) -> None:
        self._drain_ring()
        t0 = time.monotonic()
        if self._engine.tick():
            self._update_speed(time.monotonic() - t0)

    # -- speaker state (reference api reserved but unimplemented;
    #    april_api.h:78-84,194-196 — implemented here for real, shared with
    #    the wire-protocol server via engine/speaker.py) -------------------

    def _save_speaker(self) -> None:
        from ..engine.speaker import save_speaker_state

        save_speaker_state(
            self._engine, self._slot, self.model.get_name(), self.speaker_name
        )

    def _try_restore_speaker(self) -> None:
        from ..engine.speaker import restore_speaker_state

        restore_speaker_state(
            self._engine, self._slot, self.model.get_name(), self.speaker_name
        )
