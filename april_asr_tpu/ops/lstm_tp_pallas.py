"""Pallas TPU kernels for the tensor-parallel LSTM encoder layer.

Under tensor parallelism the fused whole-layer kernel (ops/lstm_pallas.py)
cannot be used as-is: the recurrent projection and the FFN produce PARTIAL
[S, d] sums that must cross the `model` axis (psum over ICI) before the
residual add and the BasicNorm — and a pallas_call cannot contain an XLA
collective. So the layer splits into two local kernels with the psums
between them, run inside a `shard_map` body (engine/step.py TP branch):

    piece A (here)        gates = x @ w_ih_local + h @ w_hh_local + b_local
                          cell update (local H/m slice of the hidden state)
                          h_partial = hc @ w_hr_local            [S, d]
    psum(h_partial)  ->   h_new replicated
    piece B (here)        y = x + h_new
                          ff_partial = DoubleSwish(y @ ff1_local) @ ff2_local
    psum(ff_partial) ->   + ff2_b, BasicNorm (plain XLA, replicated)

The local weight layout is the GATE-SHUFFLED sharding (parallel/tp.py): the
4H gate axis is permuted so each model shard's contiguous slice holds the
(i, f, g, o) gate blocks of its H/m hidden units — making every local shard
a standard smaller LSTMP layer and keeping the cell state shardable as a
contiguous [.., H/m] slice.

int8 serving stays available under TP with SINGLE-CHIP-MATCHING activation
quantization: the gates+cell and ff1 pieces run in kernels (their x/h/y row
quants cover replicated rows, so local amax == full-row amax exactly), and
the model-sharded hc/mid contractions quantize against a pmax-global row
scale (rowq8_global) with the int8 dot left to XLA (also MXU-issued) —
keeping TP int8 decode identical to single-chip int8 up to f32 partial-sum
ordering.

Reference basis: same 12-layer LSTMP encoder the reference runs through
ONNXRuntime (src/april_session.c:131-148); TP itself has no reference
analog (SURVEY.md §2.4 — the reference is strictly single-threaded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .activations import sigmoid as _sig

from .lstm_pallas import _rowq8


def _gcp_kernel(
    gated,
    x_ref,
    h_ref,
    c_ref,
    gate_ref,
    wih_ref,
    whh_ref,
    b_ref,
    whr_ref,
    hp_ref,
    c2_ref,
):
    """Gates + cell + recurrent-projection partial for one local shard."""
    wd = wih_ref.dtype
    x = x_ref[:]
    H = c_ref.shape[1]
    gates = (
        jnp.dot(x.astype(wd), wih_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h_ref[:].astype(wd), whh_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:].astype(jnp.float32)
    )
    i = gates[:, :H]
    f = gates[:, H : 2 * H]
    g = gates[:, 2 * H : 3 * H]
    o = gates[:, 3 * H :]
    # cell state stays f32 (streaming error must not compound)
    c_new = _sig(f) * c_ref[:] + _sig(i) * jnp.tanh(g)
    hc = _sig(o) * jnp.tanh(c_new)
    hp_ref[:] = jnp.dot(hc.astype(wd), whr_ref[:], preferred_element_type=jnp.float32)
    if gated:
        gt = gate_ref[:]
        c2_ref[:] = gt * c_new + (1.0 - gt) * c_ref[:]
    else:
        c2_ref[:] = c_new


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def lstm_gate_cell_proj(
    x,
    h,
    c,
    w_ih_t,
    w_hh_t,
    bias,
    w_hr_t,
    gate=None,
    *,
    block_s: int = 256,
    interpret: bool = False,
):
    """x/h [S, d] (replicated), c [S, Hs] (local shard); local weights
    w_ih_t/w_hh_t [d, 4*Hs], bias [4*Hs], w_hr_t [Hs, d]. Returns
    (h_partial [S, d] f32 — ungated, caller psums then gates; c_new [S, Hs]
    — gated in here when `gate` is given)."""
    S, d = x.shape
    Hs = c.shape[1]
    grid = (S // block_s,)

    def row(i):
        return (i, 0)

    def const(i):
        return (0, 0)

    gated = gate is not None
    gate_col = (
        gate.astype(jnp.float32).reshape(S, 1)
        if gated
        else jnp.ones((S, 1), jnp.float32)
    )
    hp, c2 = pl.pallas_call(
        functools.partial(_gcp_kernel, gated),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),  # h
            pl.BlockSpec((block_s, Hs), row, memory_space=pltpu.VMEM),  # c
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),  # gate
            pl.BlockSpec((d, 4 * Hs), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 4 * Hs), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * Hs), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hs, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, Hs), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, d), jnp.float32),
            jax.ShapeDtypeStruct((S, Hs), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * (d * 4 * Hs * 2 + Hs * d),
            bytes_accessed=(2 * d * 4 * Hs + Hs * d) * w_ih_t.dtype.itemsize
            + S * (3 * d + 2 * Hs) * 4,
            transcendentals=S * 5 * Hs,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, h, c, gate_col, w_ih_t, w_hh_t, bias.reshape(1, -1), w_hr_t)
    return hp, c2


def _gc_kernel_i8(
    gated,
    x_ref,
    h_ref,
    c_ref,
    gate_ref,
    wih_ref,
    wih_s_ref,
    whh_ref,
    whh_s_ref,
    b_ref,
    hc_ref,
    c2_ref,
):
    """int8 gates + cell for one local shard, WITHOUT the recurrent
    projection: hc must leave the kernel so its quantization scale can be
    pmax'd across the model axis (matching the single-chip full-row scale;
    a collective cannot run inside a pallas_call). The x/h row quants are
    exact matches of the single-chip path — those rows are replicated, so
    the local amax IS the full-row amax."""
    x = x_ref[:].astype(jnp.float32)
    H = c_ref.shape[1]
    xq, xs = _rowq8(x)
    hq, hs = _rowq8(h_ref[:])
    gates = (
        jnp.dot(xq, wih_ref[:], preferred_element_type=jnp.int32).astype(jnp.float32)
        * (xs * wih_s_ref[:])
        + jnp.dot(hq, whh_ref[:], preferred_element_type=jnp.int32).astype(jnp.float32)
        * (hs * whh_s_ref[:])
        + b_ref[:].astype(jnp.float32)
    )
    i = gates[:, :H]
    f = gates[:, H : 2 * H]
    g = gates[:, 2 * H : 3 * H]
    o = gates[:, 3 * H :]
    c_new = _sig(f) * c_ref[:] + _sig(i) * jnp.tanh(g)
    hc_ref[:] = _sig(o) * jnp.tanh(c_new)
    if gated:
        gt = gate_ref[:]
        c2_ref[:] = gt * c_new + (1.0 - gt) * c_ref[:]
    else:
        c2_ref[:] = c_new


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def lstm_gates_cell_i8(
    x,
    h,
    c,
    w_ih_q,
    w_ih_s,
    w_hh_q,
    w_hh_s,
    bias,
    gate=None,
    *,
    block_s: int = 256,
    interpret: bool = False,
):
    """int8 gates+cell piece of the TP layer: returns (hc [S, Hs] f32,
    c_new [S, Hs] — gated in here). The caller quantizes hc with a
    pmax-global row scale and runs the w_hr int8 contraction as a plain XLA
    int8 dot (still MXU-issued) before the psum."""
    S, d = x.shape
    Hs = c.shape[1]
    grid = (S // block_s,)

    def row(i):
        return (i, 0)

    def const(i):
        return (0, 0)

    gated = gate is not None
    gate_col = (
        gate.astype(jnp.float32).reshape(S, 1)
        if gated
        else jnp.ones((S, 1), jnp.float32)
    )
    hc, c2 = pl.pallas_call(
        functools.partial(_gc_kernel_i8, gated),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, Hs), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 4 * Hs), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * Hs), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 4 * Hs), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * Hs), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * Hs), const, memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=(
            pl.BlockSpec((block_s, Hs), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, Hs), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, Hs), jnp.float32),
            jax.ShapeDtypeStruct((S, Hs), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * d * 4 * Hs * 2,
            bytes_accessed=2 * d * 4 * Hs + S * (2 * d + 3 * Hs) * 4,
            transcendentals=S * 5 * Hs,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        x,
        h,
        c,
        gate_col,
        w_ih_q,
        w_ih_s.reshape(1, -1),
        w_hh_q,
        w_hh_s.reshape(1, -1),
        bias.reshape(1, -1),
    )
    return hc, c2


def _ffn_kernel(y_ref, ff1_ref, f1b_ref, ff2_ref, out_ref):
    wd = ff1_ref.dtype
    y = y_ref[:]
    mid = (
        jnp.dot(y.astype(wd), ff1_ref[:], preferred_element_type=jnp.float32)
        + f1b_ref[:].astype(jnp.float32)
    )
    mid = mid * _sig(mid - 1.0)  # DoubleSwish
    out_ref[:] = jnp.dot(mid.astype(wd), ff2_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def ffn_partial(
    y, ff1_t, ff1_b, ff2_t, *, block_s: int = 256, interpret: bool = False
):
    """y [S, d] -> partial FFN sum [S, d] over the LOCAL ffn slice
    (ff1_t [d, Fs], ff1_b [Fs], ff2_t [Fs, d]); the second bias and the
    BasicNorm are applied by the caller after psum."""
    S, d = y.shape
    Fs = ff1_t.shape[1]
    grid = (S // block_s,)

    def row(i):
        return (i, 0)

    def const(i):
        return (0, 0)

    out = pl.pallas_call(
        _ffn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, Fs), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fs), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Fs, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * d * Fs * 2,
            bytes_accessed=2 * d * Fs * ff1_t.dtype.itemsize + S * 2 * d * 4,
            transcendentals=S * Fs,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(y, ff1_t, ff1_b.reshape(1, -1), ff2_t)
    return out


def _ffn_mid_kernel_i8(y_ref, ff1_ref, ff1_s_ref, f1b_ref, mid_ref):
    """int8 ff1 + DoubleSwish for one local ffn slice: mid must leave the
    kernel so its quantization scale for the ff2 contraction can be pmax'd
    across the model axis (same reasoning as _gc_kernel_i8). The y row
    quant is exact — y is replicated, local amax == full-row amax."""
    y = y_ref[:].astype(jnp.float32)
    yq, ys = _rowq8(y)
    mid = jnp.dot(yq, ff1_ref[:], preferred_element_type=jnp.int32).astype(
        jnp.float32
    ) * (ys * ff1_s_ref[:]) + f1b_ref[:].astype(jnp.float32)
    mid_ref[:] = mid * _sig(mid - 1.0)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def ffn_mid_i8(
    y,
    ff1_q,
    ff1_s,
    ff1_b,
    *,
    block_s: int = 256,
    interpret: bool = False,
):
    """int8 first-half FFN: y [S, d] -> DoubleSwish(y @ ff1_local + b_local)
    [S, Fs]. The caller quantizes mid with a pmax-global row scale and runs
    the ff2 int8 contraction as an XLA int8 dot before the psum."""
    S, d = y.shape
    Fs = ff1_q.shape[1]
    grid = (S // block_s,)

    def row(i):
        return (i, 0)

    def const(i):
        return (0, 0)

    out = pl.pallas_call(
        _ffn_mid_kernel_i8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, Fs), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fs), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fs), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_s, Fs), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, Fs), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * d * Fs,
            bytes_accessed=d * Fs + S * (d + Fs) * 4,
            transcendentals=S * Fs,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(y, ff1_q, ff1_s.reshape(1, -1), ff1_b.reshape(1, -1))
    return out


def rowq8_global(x, axis):
    """Per-row symmetric int8 quantization with the row amax taken across
    the model axis (lax.pmax): the quantized values match the single-chip
    full-row quantization exactly, so TP int8 serving decodes like
    single-chip int8 up to f32 partial-sum order. Returns (q int8, s [S,1])."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    amax = jax.lax.pmax(amax, axis)
    s = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    q = jnp.round(x * (1.0 / s)).astype(jnp.int8)
    return q, s
