"""Scalar (single-session, host Python) reference of the greedy decode logic.

A direct transliteration of the reference's session decode functions
(src/april_session.c:199-429) operating on numpy logits, used as the oracle
for the batched device implementation (greedy.py) — the two are compared
callback-for-callback in tests. The token window is modeled as a fixed slot
array with a head counter, exactly like the C struct
(april_session.h:53-55), because the reference's dedup check reads a stale
slot one past head (april_session.c:272-274) and memmove leaves stale slots
behind — list-based modeling would diverge. Float comparisons are done in
float32 to match device arithmetic exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np

from ..config import DecodeConfig
from ..io.params import ModelParameters, VocabTables
from . import events as ev

RESULT_PARTIAL = 1
RESULT_FINAL = 2
RESULT_CANT_KEEP_UP = 3
RESULT_SILENCE = 4
# Framework extension (no reference analog — the reference aborts the whole
# process on any backend error, ort_util.h:29-38): delivered to a session's
# handler when its device state was lost to a contained engine failure and
# reset; the session keeps running from fresh state.
RESULT_SESSION_ERROR = 5


@dataclasses.dataclass
class ScalarToken:
    token_id: int
    logprob: float
    flags: int
    time_ms: int

    def copy(self) -> "ScalarToken":
        return ScalarToken(self.token_id, self.logprob, self.flags, self.time_ms)


class ScalarDecoder:
    """Single-session decode state machine (aas_process_logits and helpers)."""

    def __init__(
        self,
        params: ModelParameters,
        vt: VocabTables,
        cfg: DecodeConfig,
        handler: Callable[[int, List[ScalarToken]], None],
        run_decoder: Callable[[np.ndarray], None],
        context_size: int = 2,
    ):
        """`run_decoder(context)` must update the session's dout externally
        (mirrors aas_run_decoder being triggered by aas_update_context)."""
        self.params = params
        self.vt = vt
        self.cfg = cfg
        self.handler = handler
        self.run_decoder = run_decoder

        self.blank = params.blank_id
        self.context_size = context_size
        self.context = np.full(context_size, self.blank, np.int64)

        T = cfg.max_active_tokens
        self.slots: List[Optional[ScalarToken]] = [None] * T
        self.head = 0
        self.last_call_head = 0
        self.emitted_silence = True  # april_session.c:64
        self.time_ms = 0
        self.last_emit_ms = 0
        self.dout_init = False

    # -- helpers mirroring april_session.c ---------------------------------

    def _live_tokens(self, n: Optional[int] = None) -> List[ScalarToken]:
        n = self.head if n is None else n
        return [t.copy() for t in self.slots[:n]]  # type: ignore[union-attr]

    def update_context(self, tok: int):
        """aas_update_context (:181-196)."""
        self.context[:-1] = self.context[1:]
        self.context[-1] = tok
        self.run_decoder(self.context)

    def finalize_tokens(self):
        """aas_finalize_tokens (:199-211)."""
        if self.head == 0:
            return
        self.handler(RESULT_FINAL, self._live_tokens())
        self.last_call_head = self.head
        self.head = 0

    def finalize_previous_words(self, new_flags: int):
        """aas_finalize_previous_words (:213-255)."""
        if self.head == 0:
            return
        if new_flags & ev.FLAG_WORD_BOUNDARY:
            return self.finalize_tokens()
        start_of_word = None
        for i in range(self.head - 1, 2, -1):  # i > 2 (:225)
            if self.slots[i].flags & ev.FLAG_WORD_BOUNDARY:  # type: ignore[union-attr]
                start_of_word = i
                break
        if start_of_word is None:
            return self.finalize_tokens()
        self.handler(RESULT_FINAL, self._live_tokens(start_of_word))
        # memmove of the live word; stale slots beyond remain (:245-250);
        # last_call_head intentionally not updated (:237-253)
        n_live = self.head - start_of_word
        for i in range(n_live):
            self.slots[i] = self.slots[start_of_word + i]
        self.head = n_live

    def emit_silence(self):
        """aas_emit_silence (:257-268)."""
        if not self.emitted_silence:
            self.emitted_silence = True
            self.handler(RESULT_SILENCE, [])

    def emit_token(self, token: Optional[ScalarToken], force: bool) -> bool:
        """aas_emit_token (:270-294)."""
        if token is not None:
            stale = self.slots[self.head]
            if (
                not force
                and self.last_call_head == self.head + 1
                and stale is not None
                and stale.token_id == token.token_id
            ):
                return False
            self.slots[self.head] = token
            self.head += 1
        else:
            if not force and self.last_call_head == self.head:
                return False
        self.handler(RESULT_PARTIAL, self._live_tokens())
        self.last_call_head = self.head
        return True

    def clear_context(self):
        """aas_clear_context (:296-301)."""
        if self.context[0] == self.blank:
            return
        for _ in range(self.context_size):
            self.update_context(self.blank)

    # -- the main per-step logic -------------------------------------------

    def process_logits(self, logits: np.ndarray, early_emit: float) -> bool:
        """aas_process_logits (:306-429). Returns is_blank (loop-break)."""
        cfg = self.cfg
        logits = np.asarray(logits, np.float32)
        blank = self.blank

        masked = logits.copy()
        masked[blank] = -np.inf
        max_idx = int(np.argmax(masked))
        max_val = np.float32(masked[max_idx])
        blank_val = np.float32(logits[blank])

        was_context_cleared = self.context[-1] == blank
        is_equal_prev = self.context[-1] == max_idx
        ee = np.float32(0.0) if is_equal_prev else np.float32(early_emit)
        is_blank = bool((blank_val - ee) > max_val)

        flags = 0
        if self.vt.word_boundary[max_idx]:
            flags |= ev.FLAG_WORD_BOUNDARY
        eos = bool(self.vt.end_sentence[max_idx])
        punct = bool(self.vt.punctuation[max_idx])

        if punct and self.head > 0:
            last = self.slots[self.head - 1]
            if last is not None and self.vt.starts_digit[last.token_id] and self.vt.is_dot[max_idx]:
                eos = False
                punct = False
        if eos:
            flags |= ev.FLAG_SENTENCE_END

        if (
            (not was_context_cleared)
            and punct
            and (not is_equal_prev)
            and (max_val > blank_val - np.float32(cfg.punctuation_margin))
        ):
            is_blank = False

        token = ScalarToken(max_idx, float(max_val), flags, self.time_ms)

        if not is_blank:
            self.last_emit_ms = self.time_ms
            self.update_context(max_idx)

            is_final = self.head >= cfg.max_active_tokens - 1

            if self.head > 0 and (flags & ev.FLAG_WORD_BOUNDARY):
                last = self.slots[self.head - 1]
                last_eos_char = bool(self.vt.end_sentence[last.token_id])
                if last_eos_char and not (last.flags & ev.FLAG_SENTENCE_END):
                    last.flags |= ev.FLAG_SENTENCE_END
                if last_eos_char:
                    is_final = True

            if is_final:
                self.finalize_previous_words(flags)

            if self.head >= cfg.max_active_tokens - 1:
                self.head = 0  # "No room left" (:392-396), no callback

            self.emit_token(token, True)
            self.emitted_silence = False
        else:
            t_since = self.time_ms - self.last_emit_ms
            decayed = np.float32(
                max_val - np.float32(t_since) / np.float32(cfg.silence_decay_ms)
            )
            confident = (not is_equal_prev) and bool(
                decayed > blank_val - np.float32(cfg.confident_margin)
            )
            long_sil = t_since >= cfg.long_silence_ms

            if long_sil:
                self.finalize_tokens()
                self.clear_context()
                self.emit_silence()
            elif confident:
                token.logprob -= cfg.confident_logprob_penalty
                if self.emit_token(token, False):
                    assert self.head > 0
                    self.head -= 1  # pop; slot persists for dedup (:419-421)
            else:
                self.emit_token(None, False)

        return is_blank
