"""Fused Pallas TPU kernel for one residual-LSTM encoder layer step.

The pure-JAX layer body (models/lstm_transducer.py `_lstm_stack_step`) is
HBM-bandwidth bound at serving batch sizes: the [S, 4H] gate activations, the
[S, F] FFN hidden, and every elementwise intermediate round-trip HBM between
XLA fusions (~160 MB of traffic per layer at S=2048 vs ~26 MB of weights),
capping the encoder at roughly half the MXU rate. This kernel runs the whole
layer — both gate matmuls, the LSTM cell, the recurrent projection, the
DoubleSwish FFN, and the BasicNorm — in one pallas_call so every intermediate
lives in VMEM; HBM traffic drops to weights + x/h/c/y state, which is the
floor for a streaming (batch-major, single-timestep) LSTM.

Grid: 1-D over session tiles. Weight blocks use constant index maps so Mosaic
keeps them resident in VMEM across grid steps (fetched once per layer call).

Numerics: matches the pure path to f32 ulps per matmul (verified in
tests/test_lstm_pallas.py). Bitwise parity with XLA is not achievable —
Mosaic and XLA tile the contraction dimension differently, so f32
accumulation order differs by ~1 ulp, and the bf16 inter-layer casts can
amplify that to one bf16 ulp of activation noise. Measured end to end on
TPU, greedy decode under this kernel agrees with an f32-highest-precision
golden decode exactly as well as the pure XLA bf16/default-precision path
does (0.66 vs 0.67 token agreement on a worst-case random-weight chaotic
workload; real trained models have decision margins far above one ulp), so
the kernel adds no degradation beyond the framework's established bf16
precision policy (models/lstm_transducer.py cast_weights).

Reference semantics being accelerated: the 12-layer LSTM encoder network the
reference runs through ONNXRuntime per 40 ms frame (src/april_session.c:131-148,
icefall lstm_transducer_stateless2 exported by extra/export-april.py:183-224).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .activations import sigmoid as _sig


def _layer_kernel(
    gated,
    x_ref,
    h_ref,
    c_ref,
    gate_ref,
    wih_ref,
    whh_ref,
    b_ref,
    whr_ref,
    ff1_ref,
    f1b_ref,
    ff2_ref,
    f2b_ref,
    eps_ref,
    y_ref,
    h2_ref,
    c2_ref,
):
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
    h_new = jnp.dot(hc.astype(wd), whr_ref[:], preferred_element_type=jnp.float32)

    y = x.astype(jnp.float32) + h_new  # residual LSTM
    mid = (
        jnp.dot(y.astype(wd), ff1_ref[:], preferred_element_type=jnp.float32)
        + f1b_ref[:].astype(jnp.float32)
    )
    mid = mid * _sig(mid - 1.0)  # DoubleSwish
    ff = (
        jnp.dot(mid.astype(wd), ff2_ref[:], preferred_element_type=jnp.float32)
        + f2b_ref[:].astype(jnp.float32)
    )
    yn = y + ff
    # BasicNorm (inference form)
    y_ref[:] = yn * jax.lax.rsqrt(
        jnp.mean(yn * yn, axis=-1, keepdims=True) + eps_ref[0]
    )
    if gated:
        # Per-session streaming gate: sessions whose pull is masked keep
        # their carried state. Folding the select here (old state already
        # VMEM-resident) saves the caller a full [L, S, d+hidden] x3 HBM
        # where-pass per pull (~450 MB/pull at S=2048 — measured 80 vs
        # 58 ms per step before/after on the engine's pull loop).
        gt = gate_ref[:]
        h2_ref[:] = gt * h_new + (1.0 - gt) * h_ref[:]
        c2_ref[:] = gt * c_new + (1.0 - gt) * c_ref[:]
    else:
        h2_ref[:] = h_new
        c2_ref[:] = c_new


def _chunk_kernel(
    P,
    gated,
    x_ref,
    h_ref,
    c_ref,
    n_ref,
    wih_ref,
    whh_ref,
    b_ref,
    whr_ref,
    ff1_ref,
    f1b_ref,
    ff2_ref,
    f2b_ref,
    eps_ref,
    y_ref,
    h2_ref,
    c2_ref,
):
    """Whole-chunk layer: P timesteps over one session tile, weights and the
    running h/c resident in VMEM for the whole chunk. The output refs double
    as the loop carry (reading back an output ref is a VMEM read)."""
    wd = wih_ref.dtype
    H = c_ref.shape[1]
    h2_ref[:] = h_ref[:]
    c2_ref[:] = c_ref[:]

    def body(t, _):
        x = x_ref[t]
        h_t = h2_ref[:]
        c_t = c2_ref[:]
        gates = (
            jnp.dot(x.astype(wd), wih_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(h_t.astype(wd), whh_ref[:], preferred_element_type=jnp.float32)
            + b_ref[:].astype(jnp.float32)
        )
        i = gates[:, :H]
        f = gates[:, H : 2 * H]
        g = gates[:, 2 * H : 3 * H]
        o = gates[:, 3 * H :]
        # cell state stays f32 (streaming error must not compound)
        c_new = _sig(f) * c_t + _sig(i) * jnp.tanh(g)
        hc = _sig(o) * jnp.tanh(c_new)
        h_new = jnp.dot(hc.astype(wd), whr_ref[:], preferred_element_type=jnp.float32)

        y = x.astype(jnp.float32) + h_new  # residual LSTM
        mid = (
            jnp.dot(y.astype(wd), ff1_ref[:], preferred_element_type=jnp.float32)
            + f1b_ref[:].astype(jnp.float32)
        )
        mid = mid * _sig(mid - 1.0)  # DoubleSwish
        ff = (
            jnp.dot(mid.astype(wd), ff2_ref[:], preferred_element_type=jnp.float32)
            + f2b_ref[:].astype(jnp.float32)
        )
        yn = y + ff
        y_ref[t] = yn * jax.lax.rsqrt(
            jnp.mean(yn * yn, axis=-1, keepdims=True) + eps_ref[0]
        )
        if gated:
            # prefix participation: step t live iff t < n_pulls[session]
            live = t < n_ref[:]  # [bs, 1] bool
            h2_ref[:] = jnp.where(live, h_new, h_t)
            c2_ref[:] = jnp.where(live, c_new, c_t)
        else:
            h2_ref[:] = h_new
            c2_ref[:] = c_new
        return 0

    jax.lax.fori_loop(0, P, body, 0)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def lstm_layer_chunk_fused(
    x,
    h,
    c,
    w_ih_t,
    w_hh_t,
    bias,
    w_hr_t,
    ff1_t,
    ff1_b,
    ff2_t,
    ff2_b,
    eps,
    n_pulls=None,
    *,
    block_s: int = 256,
    interpret: bool = False,
):
    """Whole-chunk fused layer: x [P, S, d] -> (y [P, S, d], h', c').

    The layer-step kernel (`lstm_layer_fused`) re-fetches the ~12 MB of layer
    weights from HBM on every pull; at P pulls per engine step that traffic
    plus per-call overheads dominate. Here the time loop runs INSIDE the
    kernel: weights and the carried h/c stay VMEM-resident across all P
    timesteps and every intermediate lives in VMEM, so HBM traffic is
    weights once + x/y once + h/c once — the floor for a chunked streaming
    LSTM. `n_pulls` ([S] int32, optional) is the per-session live-step count
    (prefix gating, matching _lstm_stack_chunk's `can` mask).
    """
    P, S, d = x.shape
    hidden = c.shape[1]
    ffn = ff1_t.shape[1]
    grid = (S // block_s,)

    def xrow(i):
        return (0, i, 0)

    def row(i):
        return (i, 0)

    def const(i):
        return (0, 0)

    eps_arr = jnp.reshape(eps.astype(jnp.float32), (1,))
    gated = n_pulls is not None
    n_col = (
        n_pulls.astype(jnp.int32).reshape(S, 1)
        if gated
        else jnp.full((S, 1), P, jnp.int32)
    )

    flops = 2 * S * P * (d * 4 * hidden * 2 + hidden * d + d * ffn * 2)
    y, h2, c2 = pl.pallas_call(
        functools.partial(_chunk_kernel, P, gated),
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, block_s, d), xrow, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),  # h
            pl.BlockSpec((block_s, hidden), row, memory_space=pltpu.VMEM),  # c
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),  # n_pulls
            pl.BlockSpec((d, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ffn), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ffn), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((ffn, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eps (1,)
        ],
        out_specs=(
            pl.BlockSpec((P, block_s, d), xrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, hidden), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P, S, d), jnp.float32),
            jax.ShapeDtypeStruct((S, d), jnp.float32),
            jax.ShapeDtypeStruct((S, hidden), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                (2 * d * 4 * hidden + hidden * d + 2 * d * ffn)
                * w_ih_t.dtype.itemsize
                + S * (P * 2 * d + 2 * d + 2 * hidden) * 4
            ),
            transcendentals=S * P * (5 * hidden + ffn),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        x,
        h,
        c,
        n_col,
        w_ih_t,
        w_hh_t,
        bias.reshape(1, -1),
        w_hr_t,
        ff1_t,
        ff1_b.reshape(1, -1),
        ff2_t,
        ff2_b.reshape(1, -1),
        eps_arr,
    )
    return y, h2, c2


def _rowq8(x):
    """Dynamic per-row symmetric int8 quantization (VPU): f32 [m, k] ->
    (int8 values, f32 per-row scale [m, 1]). The scale is amax/127 so the
    int8 range is fully used; rows of zeros get a harmless tiny scale."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    q = jnp.round(x * (1.0 / s)).astype(jnp.int8)
    return q, s


def _layer_kernel_i8(
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
    whr_ref,
    whr_s_ref,
    ff1_ref,
    ff1_s_ref,
    f1b_ref,
    ff2_ref,
    ff2_s_ref,
    f2b_ref,
    eps_ref,
    y_ref,
    h2_ref,
    c2_ref,
):
    """int8 variant of `_layer_kernel` (single-timestep layer step): the
    per-pull / flush path's kernel when the weights are quantized. Same
    quantization scheme as `_chunk_kernel_i8`."""
    x = x_ref[:].astype(jnp.float32)
    H = c_ref.shape[1]

    xq, xs = _rowq8(x)
    hq, hs = _rowq8(h_ref[:])
    gates = (
        jnp.dot(xq, wih_ref[:], preferred_element_type=jnp.int32).astype(jnp.float32)
        * (xs * wih_s_ref[:])
        + jnp.dot(hq, whh_ref[:], preferred_element_type=jnp.int32).astype(
            jnp.float32
        )
        * (hs * whh_s_ref[:])
        + b_ref[:].astype(jnp.float32)
    )
    i = gates[:, :H]
    f = gates[:, H : 2 * H]
    g = gates[:, 2 * H : 3 * H]
    o = gates[:, 3 * H :]
    # cell state stays f32 (streaming error must not compound)
    c_new = _sig(f) * c_ref[:] + _sig(i) * jnp.tanh(g)
    hc = _sig(o) * jnp.tanh(c_new)
    hcq, hcs = _rowq8(hc)
    h_new = jnp.dot(hcq, whr_ref[:], preferred_element_type=jnp.int32).astype(
        jnp.float32
    ) * (hcs * whr_s_ref[:])

    y = x + h_new  # residual LSTM
    yq, ys = _rowq8(y)
    mid = jnp.dot(yq, ff1_ref[:], preferred_element_type=jnp.int32).astype(
        jnp.float32
    ) * (ys * ff1_s_ref[:]) + f1b_ref[:].astype(jnp.float32)
    mid = mid * _sig(mid - 1.0)  # DoubleSwish
    mq, ms = _rowq8(mid)
    ff = jnp.dot(mq, ff2_ref[:], preferred_element_type=jnp.int32).astype(
        jnp.float32
    ) * (ms * ff2_s_ref[:]) + f2b_ref[:].astype(jnp.float32)
    yn = y + ff
    y_ref[:] = yn * jax.lax.rsqrt(
        jnp.mean(yn * yn, axis=-1, keepdims=True) + eps_ref[0]
    )
    if gated:
        gt = gate_ref[:]
        h2_ref[:] = gt * h_new + (1.0 - gt) * h_ref[:]
        c2_ref[:] = gt * c_new + (1.0 - gt) * c_ref[:]
    else:
        h2_ref[:] = h_new
        c2_ref[:] = c_new


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def lstm_layer_fused_i8(
    x,
    h,
    c,
    w_ih_q,
    w_ih_s,
    w_hh_q,
    w_hh_s,
    bias,
    w_hr_q,
    w_hr_s,
    ff1_q,
    ff1_s,
    ff1_b,
    ff2_q,
    ff2_s,
    ff2_b,
    eps,
    gate=None,
    *,
    block_s: int = 256,
    interpret: bool = False,
):
    """One fused int8 layer step (contract of `lstm_layer_fused`, quantized
    weights as in `lstm_layer_chunk_fused_i8`)."""
    S, d = x.shape
    hidden = c.shape[1]
    ffn = ff1_q.shape[1]
    grid = (S // block_s,)

    def row(i):
        return (i, 0)

    def const(i):
        return (0, 0)

    eps_arr = jnp.reshape(eps.astype(jnp.float32), (1,))
    gated = gate is not None
    gate_col = (
        gate.astype(jnp.float32).reshape(S, 1)
        if gated
        else jnp.ones((S, 1), jnp.float32)
    )

    flops_tile = 2 * block_s * (d * 4 * hidden * 2 + hidden * d + d * ffn * 2)
    y, h2, c2 = pl.pallas_call(
        functools.partial(_layer_kernel_i8, gated),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),  # h
            pl.BlockSpec((block_s, hidden), row, memory_space=pltpu.VMEM),  # c
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),  # gate
            pl.BlockSpec((d, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec((hidden, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ffn), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ffn), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ffn), const, memory_space=pltpu.VMEM),  # ff1_b
            pl.BlockSpec((ffn, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),  # ff2_b
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eps (1,)
        ],
        out_specs=(
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, hidden), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, d), jnp.float32),
            jax.ShapeDtypeStruct((S, d), jnp.float32),
            jax.ShapeDtypeStruct((S, hidden), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * grid[0],
            bytes_accessed=(
                (2 * d * 4 * hidden + hidden * d + 2 * d * ffn)
                + S * (3 * d + 2 * hidden) * 4
            ),
            transcendentals=S * (5 * hidden + ffn),
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
        w_hr_q,
        w_hr_s.reshape(1, -1),
        ff1_q,
        ff1_s.reshape(1, -1),
        ff1_b.reshape(1, -1),
        ff2_q,
        ff2_s.reshape(1, -1),
        ff2_b.reshape(1, -1),
        eps_arr,
    )
    return y, h2, c2


def _chunk_kernel_i8(
    P,
    gated,
    x_ref,
    h_ref,
    c_ref,
    n_ref,
    wih_ref,
    wih_s_ref,
    whh_ref,
    whh_s_ref,
    b_ref,
    whr_ref,
    whr_s_ref,
    ff1_ref,
    ff1_s_ref,
    f1b_ref,
    ff2_ref,
    ff2_s_ref,
    f2b_ref,
    eps_ref,
    y_ref,
    h2_ref,
    c2_ref,
):
    """int8 variant of `_chunk_kernel`: weights are pre-quantized int8 with
    per-output-column scales; activations are quantized per-row on the fly.
    Every matmul issues as int8 x int8 -> int32 — the v5e MXU's int8 mode
    runs at ~2x its bf16 rate, and the encoder is ~98% of the engine step's
    FLOPs, so this is the serving path's biggest single lever. All
    accumulation is exact (int32); the only approximation is the int8
    rounding of weights (calibrated per column) and activations (per row),
    dequantized in f32 before the nonlinearities. The cell state and every
    inter-op intermediate stay f32 exactly as in the bf16 kernel."""
    H = c_ref.shape[1]
    h2_ref[:] = h_ref[:]
    c2_ref[:] = c_ref[:]

    def body(t, _):
        x = x_ref[t].astype(jnp.float32)
        h_t = h2_ref[:]
        c_t = c2_ref[:]
        xq, xs = _rowq8(x)
        hq, hs = _rowq8(h_t)
        gates = (
            jnp.dot(xq, wih_ref[:], preferred_element_type=jnp.int32).astype(
                jnp.float32
            )
            * (xs * wih_s_ref[:])
            + jnp.dot(hq, whh_ref[:], preferred_element_type=jnp.int32).astype(
                jnp.float32
            )
            * (hs * whh_s_ref[:])
            + b_ref[:].astype(jnp.float32)
        )
        i = gates[:, :H]
        f = gates[:, H : 2 * H]
        g = gates[:, 2 * H : 3 * H]
        o = gates[:, 3 * H :]
        # cell state stays f32 (streaming error must not compound)
        c_new = _sig(f) * c_t + _sig(i) * jnp.tanh(g)
        hc = _sig(o) * jnp.tanh(c_new)
        hcq, hcs = _rowq8(hc)
        h_new = jnp.dot(
            hcq, whr_ref[:], preferred_element_type=jnp.int32
        ).astype(jnp.float32) * (hcs * whr_s_ref[:])

        y = x + h_new  # residual LSTM
        yq, ys = _rowq8(y)
        mid = jnp.dot(yq, ff1_ref[:], preferred_element_type=jnp.int32).astype(
            jnp.float32
        ) * (ys * ff1_s_ref[:]) + f1b_ref[:].astype(jnp.float32)
        mid = mid * _sig(mid - 1.0)  # DoubleSwish
        mq, ms = _rowq8(mid)
        ff = jnp.dot(mq, ff2_ref[:], preferred_element_type=jnp.int32).astype(
            jnp.float32
        ) * (ms * ff2_s_ref[:]) + f2b_ref[:].astype(jnp.float32)
        yn = y + ff
        y_ref[t] = yn * jax.lax.rsqrt(
            jnp.mean(yn * yn, axis=-1, keepdims=True) + eps_ref[0]
        )
        if gated:
            live = t < n_ref[:]  # [bs, 1] bool
            h2_ref[:] = jnp.where(live, h_new, h_t)
            c2_ref[:] = jnp.where(live, c_new, c_t)
        else:
            h2_ref[:] = h_new
            c2_ref[:] = c_new
        return 0

    jax.lax.fori_loop(0, P, body, 0)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def lstm_layer_chunk_fused_i8(
    x,
    h,
    c,
    w_ih_q,
    w_ih_s,
    w_hh_q,
    w_hh_s,
    bias,
    w_hr_q,
    w_hr_s,
    ff1_q,
    ff1_s,
    ff1_b,
    ff2_q,
    ff2_s,
    ff2_b,
    eps,
    n_pulls=None,
    *,
    block_s: int = 256,
    interpret: bool = False,
):
    """Whole-chunk fused layer on int8-quantized weights: x [P, S, d] ->
    (y [P, S, d], h', c'). Same contract as `lstm_layer_chunk_fused`; the
    `*_q` operands are int8 [in, out] and `*_s` their per-output-column f32
    scales [1, out] (see models/lstm_transducer.quantize_weights)."""
    P, S, d = x.shape
    hidden = c.shape[1]
    ffn = ff1_q.shape[1]
    grid = (S // block_s,)

    def xrow(i):
        return (0, i, 0)

    def row(i):
        return (i, 0)

    def const(i):
        return (0, 0)

    eps_arr = jnp.reshape(eps.astype(jnp.float32), (1,))
    gated = n_pulls is not None
    n_col = (
        n_pulls.astype(jnp.int32).reshape(S, 1)
        if gated
        else jnp.full((S, 1), P, jnp.int32)
    )

    flops = 2 * S * P * (d * 4 * hidden * 2 + hidden * d + d * ffn * 2)
    y, h2, c2 = pl.pallas_call(
        functools.partial(_chunk_kernel_i8, P, gated),
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, block_s, d), xrow, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),  # h
            pl.BlockSpec((block_s, hidden), row, memory_space=pltpu.VMEM),  # c
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),  # n_pulls
            pl.BlockSpec((d, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec((hidden, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ffn), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ffn), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ffn), const, memory_space=pltpu.VMEM),  # ff1_b
            pl.BlockSpec((ffn, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),  # ff2_b
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eps (1,)
        ],
        out_specs=(
            pl.BlockSpec((P, block_s, d), xrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, hidden), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P, S, d), jnp.float32),
            jax.ShapeDtypeStruct((S, d), jnp.float32),
            jax.ShapeDtypeStruct((S, hidden), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                (2 * d * 4 * hidden + hidden * d + 2 * d * ffn)
                + S * (P * 2 * d + 2 * d + 2 * hidden) * 4
            ),
            transcendentals=S * P * (5 * hidden + ffn),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        x,
        h,
        c,
        n_col,
        w_ih_q,
        w_ih_s.reshape(1, -1),
        w_hh_q,
        w_hh_s.reshape(1, -1),
        bias.reshape(1, -1),
        w_hr_q,
        w_hr_s.reshape(1, -1),
        ff1_q,
        ff1_s.reshape(1, -1),
        ff1_b.reshape(1, -1),
        ff2_q,
        ff2_s.reshape(1, -1),
        ff2_b.reshape(1, -1),
        eps_arr,
    )
    return y, h2, c2


def _rec_kernel_i8(
    P,
    gated,
    x_ref,
    h_ref,
    c_ref,
    n_ref,
    wih_ref,
    wih_s_ref,
    whh_ref,
    whh_s_ref,
    b_ref,
    whr_ref,
    whr_s_ref,
    hseq_ref,
    h2_ref,
    c2_ref,
):
    """Recurrent CORE of the int8 chunk layer: gates + cell + projection
    per timestep — the FFN/norm half is hoisted OUT of the serial loop (see
    lstm_layer_chunk_rec_i8). The loop body carries a strict t->t+1
    dependency, so every op inside it serializes against the MXU pipeline;
    the FFN (45% of layer FLOPs) has no recurrence and runs ~10x more
    efficiently as one batched matmul over all P timesteps outside."""
    H = c_ref.shape[1]
    h2_ref[:] = h_ref[:]
    c2_ref[:] = c_ref[:]

    def body(t, _):
        x = x_ref[t].astype(jnp.float32)
        h_t = h2_ref[:]
        c_t = c2_ref[:]
        xq, xs = _rowq8(x)
        hq, hs = _rowq8(h_t)
        gates = (
            jnp.dot(xq, wih_ref[:], preferred_element_type=jnp.int32).astype(
                jnp.float32
            )
            * (xs * wih_s_ref[:])
            + jnp.dot(hq, whh_ref[:], preferred_element_type=jnp.int32).astype(
                jnp.float32
            )
            * (hs * whh_s_ref[:])
            + b_ref[:].astype(jnp.float32)
        )
        i = gates[:, :H]
        f = gates[:, H : 2 * H]
        g = gates[:, 2 * H : 3 * H]
        o = gates[:, 3 * H :]
        # cell state stays f32 (streaming error must not compound)
        c_new = _sig(f) * c_t + _sig(i) * jnp.tanh(g)
        hc = _sig(o) * jnp.tanh(c_new)
        hcq, hcs = _rowq8(hc)
        h_new = jnp.dot(
            hcq, whr_ref[:], preferred_element_type=jnp.int32
        ).astype(jnp.float32) * (hcs * whr_s_ref[:])
        hseq_ref[t] = h_new
        if gated:
            live = t < n_ref[:]  # [bs, 1] bool
            h2_ref[:] = jnp.where(live, h_new, h_t)
            c2_ref[:] = jnp.where(live, c_new, c_t)
        else:
            h2_ref[:] = h_new
            c2_ref[:] = c_new
        return 0

    jax.lax.fori_loop(0, P, body, 0)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def lstm_layer_chunk_rec_i8(
    x,
    h,
    c,
    w_ih_q,
    w_ih_s,
    w_hh_q,
    w_hh_s,
    bias,
    w_hr_q,
    w_hr_s,
    n_pulls=None,
    *,
    block_s: int = 256,
    interpret: bool = False,
):
    """Recurrent core of the int8 chunk layer: x [P, S, d] ->
    (h_seq [P, S, d] f32 — every timestep's projected hidden state,
    UNGATED; h', c'). The caller computes the residual + FFN + BasicNorm
    batched over all P timesteps (models/lstm_transducer._chunk_ffn_q8) —
    identical math, hoisted off the serial recurrence."""
    P, S, d = x.shape
    hidden = c.shape[1]
    grid = (S // block_s,)

    def xrow(i):
        return (0, i, 0)

    def row(i):
        return (i, 0)

    def const(i):
        return (0, 0)

    gated = n_pulls is not None
    n_col = (
        n_pulls.astype(jnp.int32).reshape(S, 1)
        if gated
        else jnp.full((S, 1), P, jnp.int32)
    )

    flops = 2 * S * P * (d * 4 * hidden * 2 + hidden * d)
    hseq, h2, c2 = pl.pallas_call(
        functools.partial(_rec_kernel_i8, P, gated),
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, block_s, d), xrow, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),  # h
            pl.BlockSpec((block_s, hidden), row, memory_space=pltpu.VMEM),  # c
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),  # n_pulls
            pl.BlockSpec((d, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec((hidden, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((P, block_s, d), xrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, hidden), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P, S, d), jnp.float32),
            jax.ShapeDtypeStruct((S, d), jnp.float32),
            jax.ShapeDtypeStruct((S, hidden), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                (2 * d * 4 * hidden + hidden * d)
                + S * (P * 2 * d + 2 * d + 2 * hidden) * 4
            ),
            transcendentals=S * P * 5 * hidden,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        x,
        h,
        c,
        n_col,
        w_ih_q,
        w_ih_s.reshape(1, -1),
        w_hh_q,
        w_hh_s.reshape(1, -1),
        bias.reshape(1, -1),
        w_hr_q,
        w_hr_s.reshape(1, -1),
    )
    return hseq, h2, c2


def _rec_stream_kernel_i8(
    gated,
    x_ref,
    h_ref,
    c_ref,
    n_ref,
    wih_ref,
    wih_s_ref,
    whh_ref,
    whh_s_ref,
    b_ref,
    whr_ref,
    whr_s_ref,
    hseq_ref,
    h2_ref,
    c2_ref,
):
    """Time-streamed recurrent core: grid = (session_tiles, P) with the
    timestep as the FASTEST grid dim. Each grid step consumes ONE [bs, d]
    x block (Mosaic streams the DMA) and emits one hseq block; the carried
    h/c live in the OUTPUT refs, whose index map ignores t — the classic
    accumulator pattern, so the buffer persists across the t iterations
    and flushes once per session tile. This frees the VMEM that the
    P-deep x/y tiles of the fori_loop form pinned (~28 MB at bs=512),
    letting the session tile grow to 1024+ rows: 27x fewer, MXU-sized
    serial ops instead of 8 small tiles x 27 steps of pipeline-draining
    ones."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h2_ref[:] = h_ref[:]
        c2_ref[:] = c_ref[:]

    H = c_ref.shape[1]
    x = x_ref[0].astype(jnp.float32)
    h_t = h2_ref[:]
    c_t = c2_ref[:]
    xq, xs = _rowq8(x)
    hq, hs = _rowq8(h_t)
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
    # cell state stays f32 (streaming error must not compound)
    c_new = _sig(f) * c_t + _sig(i) * jnp.tanh(g)
    hc = _sig(o) * jnp.tanh(c_new)
    hcq, hcs = _rowq8(hc)
    h_new = jnp.dot(hcq, whr_ref[:], preferred_element_type=jnp.int32).astype(
        jnp.float32
    ) * (hcs * whr_s_ref[:])
    hseq_ref[0] = h_new
    if gated:
        live = t < n_ref[:]  # [bs, 1] bool
        h2_ref[:] = jnp.where(live, h_new, h_t)
        c2_ref[:] = jnp.where(live, c_new, c_t)
    else:
        h2_ref[:] = h_new
        c2_ref[:] = c_new


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def lstm_layer_chunk_rec_stream_i8(
    x,
    h,
    c,
    w_ih_q,
    w_ih_s,
    w_hh_q,
    w_hh_s,
    bias,
    w_hr_q,
    w_hr_s,
    n_pulls=None,
    *,
    block_s: int = 1024,
    interpret: bool = False,
):
    """Contract of lstm_layer_chunk_rec_i8 with the time-streamed grid."""
    P, S, d = x.shape
    hidden = c.shape[1]
    grid = (S // block_s, P)

    def xmap(i, t):
        return (t, i, 0)

    def row(i, t):
        return (i, 0)

    def const(i, t):
        return (0, 0)

    gated = n_pulls is not None
    n_col = (
        n_pulls.astype(jnp.int32).reshape(S, 1)
        if gated
        else jnp.full((S, 1), P, jnp.int32)
    )

    flops = 2 * S * P * (d * 4 * hidden * 2 + hidden * d)
    hseq, h2, c2 = pl.pallas_call(
        functools.partial(_rec_stream_kernel_i8, gated),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_s, d), xmap, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),  # h
            pl.BlockSpec((block_s, hidden), row, memory_space=pltpu.VMEM),  # c
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),  # n_pulls
            pl.BlockSpec((d, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec((hidden, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_s, d), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, hidden), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P, S, d), jnp.float32),
            jax.ShapeDtypeStruct((S, d), jnp.float32),
            jax.ShapeDtypeStruct((S, hidden), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                (2 * d * 4 * hidden + hidden * d)
                + S * (P * 2 * d + 2 * d + 2 * hidden) * 4
            ),
            transcendentals=S * P * 5 * hidden,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        x,
        h,
        c,
        n_col,
        w_ih_q,
        w_ih_s.reshape(1, -1),
        w_hh_q,
        w_hh_s.reshape(1, -1),
        bias.reshape(1, -1),
        w_hr_q,
        w_hr_s.reshape(1, -1),
    )
    return hseq, h2, c2


def _rec_stream2_kernel_i8(
    P,
    gated,
    x0_ref,
    xn_ref,
    h_ref,
    c_ref,
    n_ref,
    wih_ref,
    wih_s_ref,
    whh_ref,
    whh_s_ref,
    b_ref,
    whr_ref,
    whr_s_ref,
    hseq_ref,
    h2_ref,
    c2_ref,
    gx_ref,
):
    """_rec_stream_kernel_i8 with the x-side gate matmul SOFTWARE-PIPELINED:
    step t computes x_{t+1}'s input-gate contribution into VMEM scratch —
    that matmul depends only on the streamed x block, not on the recurrence
    chain, so Mosaic can overlap it with the cell/quant VPU tail instead of
    serializing two MXU ops behind the VPU every step."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h2_ref[:] = h_ref[:]
        c2_ref[:] = c_ref[:]
        x0 = x0_ref[0].astype(jnp.float32)
        xq0, xs0 = _rowq8(x0)
        gx_ref[:] = jnp.dot(
            xq0, wih_ref[:], preferred_element_type=jnp.int32
        ).astype(jnp.float32) * (xs0 * wih_s_ref[:])

    H = c_ref.shape[1]
    h_t = h2_ref[:]
    c_t = c2_ref[:]
    hq, hs = _rowq8(h_t)
    gates = (
        gx_ref[:]
        + jnp.dot(hq, whh_ref[:], preferred_element_type=jnp.int32).astype(jnp.float32)
        * (hs * whh_s_ref[:])
        + b_ref[:].astype(jnp.float32)
    )
    # prefetch x_{t+1}'s gate contribution (independent of this step's chain)
    xn = xn_ref[0].astype(jnp.float32)
    xnq, xns = _rowq8(xn)
    gx_next = jnp.dot(
        xnq, wih_ref[:], preferred_element_type=jnp.int32
    ).astype(jnp.float32) * (xns * wih_s_ref[:])

    i = gates[:, :H]
    f = gates[:, H : 2 * H]
    g = gates[:, 2 * H : 3 * H]
    o = gates[:, 3 * H :]
    # cell state stays f32 (streaming error must not compound)
    c_new = _sig(f) * c_t + _sig(i) * jnp.tanh(g)
    hc = _sig(o) * jnp.tanh(c_new)
    hcq, hcs = _rowq8(hc)
    h_new = jnp.dot(hcq, whr_ref[:], preferred_element_type=jnp.int32).astype(
        jnp.float32
    ) * (hcs * whr_s_ref[:])
    hseq_ref[0] = h_new
    gx_ref[:] = gx_next
    if gated:
        live = t < n_ref[:]  # [bs, 1] bool
        h2_ref[:] = jnp.where(live, h_new, h_t)
        c2_ref[:] = jnp.where(live, c_new, c_t)
    else:
        h2_ref[:] = h_new
        c2_ref[:] = c_new


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def lstm_layer_chunk_rec_stream2_i8(
    x,
    h,
    c,
    w_ih_q,
    w_ih_s,
    w_hh_q,
    w_hh_s,
    bias,
    w_hr_q,
    w_hr_s,
    n_pulls=None,
    *,
    block_s: int = 512,
    interpret: bool = False,
):
    """Contract of lstm_layer_chunk_rec_i8, time-streamed + x-gate
    software pipelining (see _rec_stream2_kernel_i8)."""
    P, S, d = x.shape
    hidden = c.shape[1]
    grid = (S // block_s, P)

    def x0map(i, t):
        return (0, i, 0)

    def xmap(i, t):
        return (t, i, 0)

    def xnmap(i, t):
        return (jnp.minimum(t + 1, P - 1), i, 0)

    def row(i, t):
        return (i, 0)

    def const(i, t):
        return (0, 0)

    gated = n_pulls is not None
    n_col = (
        n_pulls.astype(jnp.int32).reshape(S, 1)
        if gated
        else jnp.full((S, 1), P, jnp.int32)
    )

    flops = 2 * S * P * (d * 4 * hidden * 2 + hidden * d)
    hseq, h2, c2 = pl.pallas_call(
        functools.partial(_rec_stream2_kernel_i8, P, gated),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_s, d), x0map, memory_space=pltpu.VMEM),  # x[0]
            pl.BlockSpec((1, block_s, d), xnmap, memory_space=pltpu.VMEM),  # x[t+1]
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),  # h
            pl.BlockSpec((block_s, hidden), row, memory_space=pltpu.VMEM),  # c
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),  # n_pulls
            pl.BlockSpec((d, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec((hidden, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_s, d), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, hidden), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P, S, d), jnp.float32),
            jax.ShapeDtypeStruct((S, d), jnp.float32),
            jax.ShapeDtypeStruct((S, hidden), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((block_s, 4 * hidden), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                (2 * d * 4 * hidden + hidden * d)
                + S * (P * 3 * d + 2 * d + 2 * hidden) * 4
            ),
            transcendentals=S * P * 5 * hidden,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        x,
        x,
        h,
        c,
        n_col,
        w_ih_q,
        w_ih_s.reshape(1, -1),
        w_hh_q,
        w_hh_s.reshape(1, -1),
        bias.reshape(1, -1),
        w_hr_q,
        w_hr_s.reshape(1, -1),
    )
    return hseq, h2, c2


def _ffn_norm_kernel_i8(
    x_ref,
    hs_ref,
    ff1_ref,
    ff1_s_ref,
    f1b_ref,
    ff2_ref,
    ff2_s_ref,
    f2b_ref,
    eps_ref,
    y_ref,
):
    """Batched residual + int8 FFN + BasicNorm over row tiles: the
    non-recurrent half of the chunk layer, fully parallel over (P*S) rows —
    the [rows, F] mid intermediate never leaves VMEM (doing this half in
    XLA materializes ~450 MB of f32 mid per layer at serving shapes)."""
    y = x_ref[:].astype(jnp.float32) + hs_ref[:]
    yq, ys = _rowq8(y)
    mid = jnp.dot(yq, ff1_ref[:], preferred_element_type=jnp.int32).astype(
        jnp.float32
    ) * (ys * ff1_s_ref[:]) + f1b_ref[:].astype(jnp.float32)
    mid = mid * _sig(mid - 1.0)  # DoubleSwish
    mq, ms = _rowq8(mid)
    ff = jnp.dot(mq, ff2_ref[:], preferred_element_type=jnp.int32).astype(
        jnp.float32
    ) * (ms * ff2_s_ref[:]) + f2b_ref[:].astype(jnp.float32)
    yn = y + ff
    y_ref[:] = yn * jax.lax.rsqrt(
        jnp.mean(yn * yn, axis=-1, keepdims=True) + eps_ref[0]
    )


@functools.partial(jax.jit, static_argnames=("block_r", "interpret"))
def ffn_norm_i8(
    x,
    hseq,
    ff1_q,
    ff1_s,
    ff1_b,
    ff2_q,
    ff2_s,
    ff2_b,
    eps,
    *,
    block_r: int = 512,
    interpret: bool = False,
):
    """x/hseq [R, d] -> BasicNorm((x + hseq) + FFN(x + hseq)) [R, d].

    Companion of lstm_layer_chunk_rec_i8: R = P*S flattened rows, grid over
    row tiles — no time serialization, so the MXU pipeline stays full."""
    R, d = x.shape
    ffn = ff1_q.shape[1]
    grid = (R // block_r,)

    def row(i):
        return (i, 0)

    def const(i):
        return (0, 0)

    eps_arr = jnp.reshape(eps.astype(jnp.float32), (1,))
    y = pl.pallas_call(
        _ffn_norm_kernel_i8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ffn), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ffn), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ffn), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((ffn, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eps (1,)
        ],
        out_specs=pl.BlockSpec((block_r, d), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * d * ffn * 2,
            bytes_accessed=2 * d * ffn + R * 3 * d * 4,
            transcendentals=R * ffn,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        x,
        hseq,
        ff1_q,
        ff1_s.reshape(1, -1),
        ff1_b.reshape(1, -1),
        ff2_q,
        ff2_s.reshape(1, -1),
        ff2_b.reshape(1, -1),
        eps_arr,
    )
    return y


# VMEM budget bound for the chunk kernel: x+y tiles are P*block_s*d f32 each
# (P=56 at block_s=128, d=512 is ~14.7 MB per tile — fits the 100 MB budget
# with weights and double-buffering).
CHUNK_MAX_PULLS = 56
# Below this many pulls the kernel's fixed costs (12 unrolled launches,
# weight residency setup) beat its VMEM wins and plain XLA layer-major is
# faster (measured on v5e at S=2048: P=5 XLA 44 ms vs kernel 60 ms per step;
# P=25 kernel 84 ms vs XLA 109 ms).
CHUNK_MIN_PULLS = 12


def supported_dims(S: int, d: int, hidden: int, ffn: int, block_s: int) -> bool:
    """Tiling constraints: lanes are 128-wide; the session tile must divide S."""
    return (
        S % block_s == 0
        and d % 128 == 0
        and hidden % 128 == 0
        and ffn % 128 == 0
    )


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def lstm_layer_fused(
    x,
    h,
    c,
    w_ih_t,
    w_hh_t,
    bias,
    w_hr_t,
    ff1_t,
    ff1_b,
    ff2_t,
    ff2_b,
    eps,
    gate=None,
    *,
    block_s: int = 256,
    interpret: bool = False,
):
    """One fused layer step.

    x, h: [S, d] (h is the previous step's projected hidden state — icefall's
    LSTMP layer has state dim == d_model); c: [S, hidden];
    w_ih_t/w_hh_t: [d, 4*hidden]; w_hr_t: [hidden, d]; ff1_t: [d, ffn];
    ff2_t: [ffn, d]; eps: scalar; gate: optional [S] bool/float — sessions
    with gate 0 keep their carried h/c (y is still computed; callers mask
    downstream). Returns (y, h_new, c_new) in float32.
    """
    S, d = x.shape
    hidden = c.shape[1]
    ffn = ff1_t.shape[1]
    grid = (S // block_s,)

    def row(i):
        return (i, 0)

    def const(i):
        return (0, 0)

    eps_arr = jnp.reshape(eps.astype(jnp.float32), (1,))
    gated = gate is not None
    gate_col = (
        gate.astype(jnp.float32).reshape(S, 1)
        if gated
        else jnp.ones((S, 1), jnp.float32)
    )

    flops_tile = 2 * block_s * (d * 4 * hidden * 2 + hidden * d + d * ffn * 2)
    y, h2, c2 = pl.pallas_call(
        functools.partial(_layer_kernel, gated),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),  # h
            pl.BlockSpec((block_s, hidden), row, memory_space=pltpu.VMEM),  # c
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),  # gate
            pl.BlockSpec((d, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ffn), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ffn), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((ffn, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eps (1,)
        ],
        out_specs=(
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, hidden), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, d), jnp.float32),
            jax.ShapeDtypeStruct((S, d), jnp.float32),
            jax.ShapeDtypeStruct((S, hidden), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * grid[0],
            bytes_accessed=(
                (2 * d * 4 * hidden + hidden * d + 2 * d * ffn)
                * w_ih_t.dtype.itemsize
                + S * (3 * d + 2 * hidden) * 4
            ),
            transcendentals=S * (5 * hidden + ffn),
        ),
        # weights stay VMEM-resident across session tiles; default 16 MB
        # scoped vmem is too small for f32 flagship weights (26 MB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        x,
        h,
        c,
        gate_col,
        w_ih_t,
        w_hh_t,
        bias.reshape(1, -1),
        w_hr_t,
        ff1_t,
        ff1_b.reshape(1, -1),
        ff2_t,
        ff2_b.reshape(1, -1),
        eps_arr,
    )
    return y, h2, c2
