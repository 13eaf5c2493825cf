"""Shared activation forms for the transducer compute paths.

One definition imported by the XLA forward paths (models/lstm_transducer.py,
models/conformer.py) AND the Pallas kernels (ops/lstm_pallas.py,
ops/lstm_tp_pallas.py), so every implementation of a family computes
bit-identical nonlinearities and the cross-implementation agreement tests
stay meaningful.

`sigmoid` is the tanh form `0.5*tanh(0.5x) + 0.5` (mathematically logistic).
Mosaic lowers `jax.nn.sigmoid` (lax.logistic) to an exp + divide chain on the
VPU, while `tanh` is a single fast native approximation — measured on v5e at
the serving shapes, the swap cuts the fused int8 LSTM recurrent kernel from
2.29 to 1.90 ms/layer (S=2048, P=25; three gate sigmoids per step) with the
DoubleSwish sites in the FFN kernels gaining similarly. Absolute error vs
lax.logistic is ~1 ulp, but the tails differ qualitatively: for |x| beyond
~17 the tanh form saturates to exactly 0/1 while logistic keeps returning
denormal-adjacent values down to ~1e-38. That flush is benign for the gate
and GLU uses here (a gate at exact 0 vs 1e-38 is the same gate), but code
that needs strictly-positive logistic tails should not use this form.
"""

from __future__ import annotations

import jax.numpy as jnp


def sigmoid(x):
    """logistic(x) as 0.5*tanh(0.5x)+0.5 (fast on the TPU VPU; see module
    docstring)."""
    return 0.5 * jnp.tanh(0.5 * x) + 0.5


def double_swish(x):
    """icefall DoubleSwish: x * sigmoid(x - 1), with the tanh-form sigmoid."""
    return x * sigmoid(x - 1.0)
