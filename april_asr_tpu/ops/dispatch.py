"""Shared dispatch switch for Pallas-vs-pure-XLA compute paths.

"auto" (default) uses the fused Pallas kernels whenever tracing for TPU;
APRIL_PALLAS=0 forces pure XLA everywhere, =1 forces the kernels (interpreted
off-TPU — used by the parity tests). GSPMD-partitioned call sites (plain jit
with sharded operands, e.g. the tensor-parallel train step) must wrap model
calls in `pallas_disabled()`: XLA cannot partition a pallas_call.

The flag is read at trace time; set it before building/jitting programs.
"""

from __future__ import annotations

import contextlib
import os

import jax

_PALLAS_OFF = 0


@contextlib.contextmanager
def pallas_disabled():
    global _PALLAS_OFF
    _PALLAS_OFF += 1
    try:
        yield
    finally:
        _PALLAS_OFF -= 1


def pallas_wanted() -> bool:
    if _PALLAS_OFF:
        return False
    mode = os.environ.get("APRIL_PALLAS", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return jax.default_backend() == "tpu"
