from . import events
from .greedy import (
    decode_step,
    decode_step_pre,
    greedy_prologue,
    init_decode_state,
    vocab_tables_device,
)
from .scalar import (
    RESULT_CANT_KEEP_UP,
    RESULT_FINAL,
    RESULT_PARTIAL,
    RESULT_SILENCE,
    ScalarDecoder,
    ScalarToken,
)

__all__ = [
    "events",
    "decode_step",
    "decode_step_pre",
    "greedy_prologue",
    "init_decode_state",
    "vocab_tables_device",
    "ScalarDecoder",
    "ScalarToken",
    "RESULT_PARTIAL",
    "RESULT_FINAL",
    "RESULT_SILENCE",
    "RESULT_CANT_KEEP_UP",
]
