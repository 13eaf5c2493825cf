"""Fused Pallas TPU kernel: joiner matmul + greedy argmax prologue.

The greedy decode inner loop runs the joiner up to 3x per pull for every
session (reference: aas_run_joiner + the argmax over logits,
src/april_session.c:166-179 and :311-320) — at 25 pulls per 1 s chunk that
is 75 sequential iterations, each materializing a [S, vocab] logits tensor
in HBM that the decode step immediately reduces to three scalars per
session. This kernel fuses tanh(eout + dout) @ W + b with the blank-excluded
argmax so only [S, 1] results ever leave VMEM:

    max_idx  — argmax over non-blank logits (ties: lowest index, like XLA)
    max_val  — the max non-blank logit
    blank_val — logits[:, blank]

Numerics match decode/greedy.py's XLA prologue: same -1e30 mask constant,
f32 accumulation, blank excluded before the max.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # plain float: the kernel must not capture traced constants


def _kernel(blank, V, e_ref, d_ref, w_ref, b_ref, mi_ref, mv_ref, bv_ref):
    t = jnp.tanh(e_ref[:] + d_ref[:])
    logits = (
        jnp.dot(t.astype(w_ref.dtype), w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:].astype(jnp.float32)
    )
    bv_ref[:] = logits[:, blank : blank + 1]
    iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    masked = jnp.where((iota == blank) | (iota >= V), jnp.float32(NEG_INF), logits)
    mv_ref[:] = jnp.max(masked, axis=1, keepdims=True)
    mi_ref[:] = jnp.argmax(masked, axis=1).astype(jnp.int32)[:, None]


@functools.partial(
    jax.jit, static_argnames=("blank_id", "block_s", "interpret")
)
def joiner_argmax_fused(
    eout,
    dout,
    w_t,
    b,
    *,
    blank_id: int,
    block_s: int = 512,
    interpret: bool = False,
):
    """eout/dout [S, J], w_t [J, V], b [V] -> (max_idx [S] i32, max_val [S],
    blank_val [S]). V is padded to a lane multiple in here; padding columns
    get -1e30 bias so they can never win the argmax."""
    S, J = eout.shape
    V = w_t.shape[1]
    Vp = -(-V // 128) * 128
    if Vp != V:
        w_t = jnp.pad(w_t, ((0, 0), (0, Vp - V)))
        b = jnp.pad(b, (0, Vp - V), constant_values=-1e30)
    grid = (S // block_s,)

    def row(i):
        return (i, 0)

    def const(i):
        return (0, 0)

    mi, mv, bv = pl.pallas_call(
        functools.partial(_kernel, blank_id, V),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_s, J), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, J), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((J, Vp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, 1), jnp.int32),
            jax.ShapeDtypeStruct((S, 1), jnp.float32),
            jax.ShapeDtypeStruct((S, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * J * Vp,
            bytes_accessed=J * Vp * w_t.dtype.itemsize + S * (2 * J + 3) * 4,
            transcendentals=S * J,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(eout, dout, w_t, b.reshape(1, -1))
    return mi[:, 0], mv[:, 0], bv[:, 0]


def supported(S: int, J: int, block_s: int = 512) -> bool:
    return S % block_s == 0 and J % 128 == 0
