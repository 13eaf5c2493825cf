"""Host-side replay of device decode events into user callbacks.

The device decode step (decode/greedy.py) emits compact event records; this
module maintains the host mirror of each session's token window and fires the
PARTIAL/FINAL/SILENCE callbacks in the reference's order (the op-bit
application order documented in decode/events.py). The mirror holds the full
token data (strings resolved from the vocabulary) so callbacks carry the same
payload as the reference handler (april_api.h:118-142).
"""

from __future__ import annotations

from typing import Callable, List

from ..decode import events as ev
from ..decode.scalar import (
    RESULT_FINAL,
    RESULT_PARTIAL,
    RESULT_SILENCE,
    ScalarToken,
)
from ..io.params import ModelParameters


class EventReplayer:
    """Mirror token window + callback dispatch for one session."""

    def __init__(
        self,
        params: ModelParameters,
        on_result: Callable[[int, List[ScalarToken]], None],
    ):
        self.params = params
        self.on_result = on_result
        self.tokens: List[ScalarToken] = []

    def apply(self, ops: int, tok: int, logprob: float, flags: int, time_ms: int, final_k: int):
        if ops == 0:
            return
        if ops & ev.OP_FIX_PREV_EOS and self.tokens:
            self.tokens[-1].flags |= ev.FLAG_SENTENCE_END
        if ops & ev.OP_FINAL:
            self.on_result(RESULT_FINAL, [t.copy() for t in self.tokens[:final_k]])
            self.tokens = self.tokens[final_k:]
        if ops & ev.OP_RESET_TOKENS:
            self.tokens = []
        if ops & ev.OP_APPEND:
            self.tokens.append(ScalarToken(int(tok), float(logprob), int(flags), int(time_ms)))
        if ops & ev.OP_PARTIAL:
            self.on_result(RESULT_PARTIAL, [t.copy() for t in self.tokens])
        if ops & ev.OP_POP:
            self.tokens.pop()
        if ops & ev.OP_SILENCE:
            self.on_result(RESULT_SILENCE, [])
