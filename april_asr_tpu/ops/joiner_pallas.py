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


def _dj_kernel(
    blank,
    V,
    ctx_ref,
    nd_ref,
    dout_ref,
    e_ref,
    t0_ref,
    t1_ref,
    dp_ref,
    dpb_ref,
    w_ref,
    b_ref,
    mi_ref,
    mv_ref,
    bv_ref,
    dout_out_ref,
):
    """Fused decoder-step + joiner + greedy argmax for one inner-decode
    iteration: refresh dout where the previous iteration changed the
    context (`need_dec`), then joiner matmul + blank-excluded argmax — all
    in VMEM. The dec_table row gathers become one-hot contractions (MXU),
    the standard SIMD-ification of per-session gathers in this codebase.

    Replaces, per iteration: one joiner pallas call + the XLA dec_table
    gather fusions + the [S, d] x [d, J] decoder matmul + the dout select —
    the greedy inner loop runs 3x per pull per session
    (src/april_session.c:166-196, :311-320), so at 25 pulls/s this removes
    ~150 separate op launches per engine step."""
    d = t0_ref.shape[1]
    wd = dp_ref.dtype
    c0 = ctx_ref[:, 0:1]
    c1 = ctx_ref[:, 1:2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (c0.shape[0], t0_ref.shape[0]), 1)
    # One-hot contraction stays f32: the dec_table rows are f32 even under
    # bf16/int8 serving (derived tables are never cast), and the eager
    # decoder_step gathers those f32 rows exactly — casting to a bf16
    # weight dtype here would make the fused and fallback paths diverge by
    # bf16 rounding (advisor r2). A one-hot f32 matmul selects rows
    # exactly, so `pre` matches the gather bit-for-bit.
    oh0 = jnp.where(iota == c0, 1.0, 0.0)
    oh1 = jnp.where(iota == c1, 1.0, 0.0)
    pre = jnp.dot(oh0, t0_ref[:], preferred_element_type=jnp.float32) + jnp.dot(
        oh1, t1_ref[:], preferred_element_type=jnp.float32
    )
    y = jnp.maximum(pre, 0.0)
    new_dout = (
        jnp.dot(y.astype(wd), dp_ref[:], preferred_element_type=jnp.float32)
        + dpb_ref[:].astype(jnp.float32)
    )
    nd = nd_ref[:]
    dout = nd * new_dout + (1.0 - nd) * dout_ref[:]
    dout_out_ref[:] = dout

    t = jnp.tanh(e_ref[:] + dout)
    logits = (
        jnp.dot(t.astype(w_ref.dtype), w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:].astype(jnp.float32)
    )
    bv_ref[:] = logits[:, blank : blank + 1]
    viota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    masked = jnp.where((viota == blank) | (viota >= V), jnp.float32(NEG_INF), logits)
    mv_ref[:] = jnp.max(masked, axis=1, keepdims=True)
    mi_ref[:] = jnp.argmax(masked, axis=1).astype(jnp.int32)[:, None]


@functools.partial(
    jax.jit, static_argnames=("blank_id", "block_s", "interpret")
)
def decoder_joiner_argmax_fused(
    ctx,
    need_dec,
    dout,
    eout,
    dec_table,
    dec_proj_t,
    dec_proj_b,
    w_t,
    b,
    *,
    blank_id: int,
    block_s: int = 512,
    interpret: bool = False,
):
    """ctx [S, 2] i32, need_dec [S] bool, dout/eout [S, J],
    dec_table [2, V, d], dec_proj_t [d, J] -> (max_idx [S] i32,
    max_val [S], blank_val [S], dout' [S, J]).

    Lazy-dout contract: `dout` is refreshed HERE for sessions whose
    previous inner step flagged `need_dec` — equivalent to the eager
    refresh at the end of the previous step (same context, same inputs),
    but fused with the joiner it feeds."""
    S, J = eout.shape
    V = w_t.shape[1]
    d = dec_table.shape[2]
    Vp = -(-V // 128) * 128
    if Vp != V:
        w_t = jnp.pad(w_t, ((0, 0), (0, Vp - V)))
        b = jnp.pad(b, (0, Vp - V), constant_values=-1e30)
        dec_table = jnp.pad(dec_table, ((0, 0), (0, Vp - V), (0, 0)))
    grid = (S // block_s,)

    def row(i):
        return (i, 0)

    def const(i):
        return (0, 0)

    mi, mv, bv, dout2 = pl.pallas_call(
        functools.partial(_dj_kernel, blank_id, V),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_s, 2), row, memory_space=pltpu.VMEM),  # ctx
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),  # need_dec
            pl.BlockSpec((block_s, J), row, memory_space=pltpu.VMEM),  # dout
            pl.BlockSpec((block_s, J), row, memory_space=pltpu.VMEM),  # eout
            pl.BlockSpec((Vp, d), const, memory_space=pltpu.VMEM),  # table0
            pl.BlockSpec((Vp, d), const, memory_space=pltpu.VMEM),  # table1
            pl.BlockSpec((d, J), const, memory_space=pltpu.VMEM),  # dec_proj
            pl.BlockSpec((1, J), const, memory_space=pltpu.VMEM),  # dec_proj_b
            pl.BlockSpec((J, Vp), const, memory_space=pltpu.VMEM),  # join
            pl.BlockSpec((1, Vp), const, memory_space=pltpu.VMEM),  # join_b
        ],
        out_specs=(
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, J), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, 1), jnp.int32),
            jax.ShapeDtypeStruct((S, 1), jnp.float32),
            jax.ShapeDtypeStruct((S, 1), jnp.float32),
            jax.ShapeDtypeStruct((S, J), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * (2 * Vp * d + d * J + J * Vp),
            bytes_accessed=(
                (2 * Vp * d + d * J) * dec_proj_t.dtype.itemsize
                + J * Vp * w_t.dtype.itemsize
                + S * (4 * J + 8) * 4
            ),
            transcendentals=S * J,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        ctx.astype(jnp.int32),
        need_dec.astype(jnp.float32).reshape(S, 1),
        dout,
        eout,
        dec_table[0],
        dec_table[1],
        dec_proj_t,
        dec_proj_b.reshape(1, -1),
        w_t,
        b.reshape(1, -1),
    )
    return mi[:, 0], mv[:, 0], bv[:, 0], dout2


def dj_supported(
    S: int,
    J: int,
    d: int,
    context: int,
    block_s: int = 512,
    vocab: int = 0,
    w_itemsize: int = 4,
) -> bool:
    """Tiling constraints for the fused decoder+joiner kernel (2-token
    context only — the reference decoder's fixed geometry), plus a VMEM
    budget bound on the vocab-sized resident operands: the kernel pins two
    padded [Vp, d] f32 dec_table blocks, the [J, Vp] joiner, and the
    activation tiles under the 64 MB vmem_limit. At the reference's maximum
    token-id range (~16384, src/params.c validation) with d=512 the tables
    alone are ~67 MB — such models must take the XLA fallback in
    decoder_joiner_argmax rather than fail at Mosaic compile time."""
    if not (context == 2 and S % block_s == 0 and J % 128 == 0 and d % 128 == 0):
        return False
    if vocab:
        Vp = -(-vocab // 128) * 128
        resident = (
            2 * Vp * d * 4  # dec_table halves (f32)
            + J * Vp * w_itemsize  # joiner weights
            + d * J * w_itemsize  # dec_proj
            + block_s * (4 * J + 16) * 4  # activation tiles (x2 buffering slack)
        )
        if resident > 56 * 1024 * 1024:  # headroom under the 64 MB limit
            return False
    return True
