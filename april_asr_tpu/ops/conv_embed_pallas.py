"""Fused conv-embed over a step's whole window set, straight from the front
buffer.

The engine's fast path embeds every pull's 9-frame window in one batched
launch (engine/step.py). As plain XLA convs that chain costs ~11 ms/step at
S=4096 — an input relayout copy alone is 5.4 ms (xplane: %copy.251) — for
roughly 1 ms of FLOPs, because the [P*S, 1, 9, 80] batch forces pathological
conv layouts, and the stacked window tensor (P overlapping slices of the
front buffer) is materialized in HBM just to be re-read once.

This kernel takes the un-stacked front buffer [S, W, mel] and produces every
window's embedding [P, S, d] in one pallas_call with all intermediates in
VMEM:

- conv1 (3x3, pad 1, stride 1) runs ONCE over the full W-row buffer (the
  windows overlap 9/4, so this alone removes ~2.2x redundant work). The
  reference semantics are per-window zero padding (each 9-frame segment is
  embedded independently — icefall Conv2dSubsampling inside the encoder ONNX,
  reference april_model.h:35-41 segment geometry), which differs from the
  full-buffer result only at each window's first/last row: those rows see a
  zero pad instead of the neighbouring buffer row. The kernel subtracts the
  leaked neighbour-row tap from the two edge rows of every window before the
  activation (exact, not approximate: conv1 is linear pre-DoubleSwish).
- conv2/conv3 (3x3, stride 2, valid) are per-window im2col matmuls (K=72 and
  K=288) over the shared conv1 activations plus the corrected edge rows.
- the final 608->512 projection is one matmul over all P*S windows.

Numerics match the XLA path's bf16 conv inputs: activations are rounded to
bf16 before each product, accumulation in f32 (same products as the MXU
bf16xbf16->f32 convs, different summation order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .activations import double_swish


def _bf(x):
    """Round to bf16, compute in f32 (match the conv paths' operand dtype)."""
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def _kernel(
    P: int,
    step: int,
    seg: int,
    w1_ref,  # [c1, 1, 3, 3] f32
    b1_ref,  # [c1]
    w2k_ref,  # [9*c1, c2]  (dt, df, cin) rows
    b2_ref,  # [c2]
    w3k_ref,  # [9*c2, c3]
    b3_ref,  # [c3]
    wo_ref,  # [c3*f3, d]
    bo_ref,  # [d]
    x_ref,  # [bn, W, mel] f32
    out_ref,  # [P, bn, d] f32
):
    bn, W, mel = x_ref.shape
    c1 = w1_ref.shape[0]
    c2 = w2k_ref.shape[1]
    c3 = w3k_ref.shape[1]
    f2 = (mel - 3) // 2 + 1  # conv2 freq out
    t2 = (seg - 3) // 2 + 1  # conv2 time out per window
    f3 = (f2 - 3) // 2 + 1

    xb = _bf(x_ref[:])
    xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1)))  # zero pad both axes
    w1 = w1_ref[:].astype(jnp.float32)

    # --- conv1 pre-activation over the FULL buffer (shared across windows)
    acc = jnp.zeros((bn, W, mel, c1), jnp.float32)
    for dt in range(3):
        for df in range(3):
            tap = _bf(w1[:, 0, dt, df])  # [c1]
            acc = acc + xp[:, dt : dt + W, df : df + mel][..., None] * tap
    acc = acc + b1_ref[:].astype(jnp.float32)

    # --- per-window edge corrections (remove the neighbour-row leak)
    # top edge of window j is buffer row step*j: full conv saw x[step*j - 1]
    # through the dt=0 tap; per-window padding wants zero there. xp row
    # indexing already folds the global zero pad (xp[t] == x[t-1]).
    top_rows = jnp.stack([xp[:, step * j] for j in range(P)], 1)  # [bn,P,mel+2]
    bot_rows = jnp.stack(
        [xp[:, step * j + seg + 1] for j in range(P)], 1
    )
    ctop = jnp.zeros((bn, P, mel, c1), jnp.float32)
    cbot = jnp.zeros((bn, P, mel, c1), jnp.float32)
    for df in range(3):
        ctop = ctop + top_rows[:, :, df : df + mel][..., None] * _bf(w1[:, 0, 0, df])
        cbot = cbot + bot_rows[:, :, df : df + mel][..., None] * _bf(w1[:, 0, 2, df])
    a_top = jnp.stack([acc[:, step * j] for j in range(P)], 1) - ctop
    a_bot = jnp.stack([acc[:, step * j + seg - 1] for j in range(P)], 1) - cbot

    d_full = double_swish(acc)  # interior rows (shared)
    e_top = double_swish(a_top)  # [bn, P, mel, c1]
    e_bot = double_swish(a_bot)

    def halve(x, axis):
        """x[..., 0:2k:2, ...] without strided slicing: even elements."""
        sh = list(x.shape)
        k = sh[axis] // 2
        sh[axis : axis + 1] = [k, 2]
        idx = [slice(None)] * len(sh)
        idx[axis + 1] = 0
        return x.reshape(sh)[tuple(idx)]

    w2k = w2k_ref[:]
    w3k = w3k_ref[:]
    y3_all = []
    for j in range(P):
        # window rows: corrected top, shared interior, corrected bottom
        rj = jnp.concatenate(
            [
                e_top[:, j][:, None],
                d_full[:, step * j + 1 : step * j + seg - 1],
                e_bot[:, j][:, None],
            ],
            axis=1,
        )  # [bn, seg, mel, c1]
        rjb = rj.astype(jnp.bfloat16)
        # one zero row/col of slack so the even-index slices below stay in
        # bounds at dt=2 / df=2 (the padded positions land on discarded odd
        # indices, never in a patch)
        rjb = jnp.pad(rjb, ((0, 0), (0, 1), (0, 1), (0, 0)))
        # conv2 im2col: K rows ordered (dt, df, cin) to match w2k
        pats = []
        for dt in range(3):
            rows = halve(rjb[:, dt : dt + 2 * t2], 1)  # [bn, t2, mel+1, c1]
            for df in range(3):
                pats.append(halve(rows[:, :, df : df + 2 * f2], 2))
        p2 = jnp.concatenate(
            [p.reshape(bn * t2 * f2, c1) for p in pats], axis=-1
        )  # [bn*t2*f2, 9*c1]
        y2 = jnp.dot(p2, w2k, preferred_element_type=jnp.float32)
        y2 = double_swish(
            y2.reshape(bn, t2, f2, c2) + b2_ref[:].astype(jnp.float32)
        ).astype(jnp.bfloat16)
        # conv3 im2col (single time output consumes rows 0..2)
        y2 = jnp.pad(y2, ((0, 0), (0, 0), (0, 1), (0, 0)))  # freq slack col
        pats3 = []
        for dt in range(3):
            row = y2[:, dt]  # [bn, f2+1, c2]
            for df in range(3):
                pats3.append(halve(row[:, df : df + 2 * f3], 1))
        p3 = jnp.concatenate(
            [p.reshape(bn * f3, c2) for p in pats3], axis=-1
        )  # [bn*f3, 9*c2]
        y3 = jnp.dot(p3, w3k, preferred_element_type=jnp.float32)
        y3 = double_swish(y3.reshape(bn, f3, c3) + b3_ref[:].astype(jnp.float32))
        y3_all.append(y3.astype(jnp.bfloat16))

    # output projection WITHOUT flattening (freq, ch) into one axis (Mosaic
    # cannot lower that shape cast): accumulate one [bn*P, c3] x [c3, d]
    # matmul per conv3 frequency — the caller splits the projection weight
    # into per-frequency [c3, d] slabs to match
    stacked = jnp.stack(y3_all, 1)  # [bn, P, f3, c3]
    d_model = wo_ref.shape[1]
    out = jnp.broadcast_to(
        bo_ref[:].astype(jnp.float32), (bn * P, d_model)
    )
    wo = wo_ref[:]  # [f3*c3, d], (freq, ch)-ordered rows
    for f in range(f3):
        out = out + jnp.dot(
            stacked[:, :, f, :].reshape(bn * P, c3),
            wo[f * c3 : (f + 1) * c3],
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = jnp.transpose(out.reshape(bn, P, d_model), (1, 0, 2))


def front_embed_supported(seg: int, mel: int, P: int, step: int, W: int,
                          S: int, block_s: int = 8) -> bool:
    """Geometry gate: the kernel assumes the reference 3x3 conv stack
    (pad-1 stride-1, then two valid stride-2) collapsing the window's time
    axis to one output row, and whole session blocks."""
    if seg < 3 or (seg - 3) % 2 or mel < 5:
        return False
    t2 = (seg - 3) // 2 + 1
    if t2 < 3 or (t2 - 3) // 2 + 1 != 1:
        return False
    return W == (P - 1) * step + seg and S % block_s == 0 and P >= 1


def _win_kernel(
    step: int,
    seg: int,
    w1_ref,
    b1_ref,
    w2k_ref,
    b2_ref,
    w3k_ref,
    b3_ref,
    wo_ref,
    bo_ref,
    x_ref,  # [bn, W, mel]
    out_ref,  # [1, bn, d]
):
    """One pull window per grid step (grid = session tiles x P windows).

    The whole-front `_kernel` unrolls all P windows in one body; at serving
    chunks (P=27) that ~1500-op body hangs the Mosaic compiler (observed:
    >10 min at S=4096 where this variant compiles in seconds). Processing
    one window per grid step keeps the body small and makes the per-window
    zero-pad semantics direct — conv1 is computed on the isolated window
    exactly like the XLA per-window path, no edge corrections needed. conv1
    work on the overlapping rows is recomputed per window (seg/step = 2.25x
    the shared-front conv1 FLOPs) but conv1 is <10% of the embed FLOPs."""
    p = pl.program_id(1)
    bn, W, mel = x_ref.shape
    c1 = w1_ref.shape[0]
    c2 = w2k_ref.shape[1]
    c3 = w3k_ref.shape[1]
    f2 = (mel - 3) // 2 + 1
    t2 = (seg - 3) // 2 + 1
    f3 = (f2 - 3) // 2 + 1

    win = x_ref[:, pl.ds(p * step, seg), :]  # [bn, seg, mel]
    xb = _bf(win)
    xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1)))  # per-window zero pad
    w1 = w1_ref[:].astype(jnp.float32)
    acc = jnp.zeros((bn, seg, mel, c1), jnp.float32)
    for dt in range(3):
        for df in range(3):
            tap = _bf(w1[:, 0, dt, df])  # [c1]
            acc = acc + xp[:, dt : dt + seg, df : df + mel][..., None] * tap
    acc = acc + b1_ref[:].astype(jnp.float32)
    rj = double_swish(acc)  # [bn, seg, mel, c1]

    def halve(x, axis):
        sh = list(x.shape)
        k = sh[axis] // 2
        sh[axis : axis + 1] = [k, 2]
        idx = [slice(None)] * len(sh)
        idx[axis + 1] = 0
        return x.reshape(sh)[tuple(idx)]

    rjb = rj.astype(jnp.bfloat16)
    # one zero row/col of slack so the even-index slices stay in bounds at
    # dt=2 / df=2 (padded positions land on discarded odd indices)
    rjb = jnp.pad(rjb, ((0, 0), (0, 1), (0, 1), (0, 0)))
    pats = []
    for dt in range(3):
        rows = halve(rjb[:, dt : dt + 2 * t2], 1)  # [bn, t2, mel+1, c1]
        for df in range(3):
            pats.append(halve(rows[:, :, df : df + 2 * f2], 2))
    p2 = jnp.concatenate(
        [q.reshape(bn * t2 * f2, c1) for q in pats], axis=-1
    )  # [bn*t2*f2, 9*c1]
    y2 = jnp.dot(p2, w2k_ref[:], preferred_element_type=jnp.float32)
    y2 = double_swish(
        y2.reshape(bn, t2, f2, c2) + b2_ref[:].astype(jnp.float32)
    ).astype(jnp.bfloat16)
    y2 = jnp.pad(y2, ((0, 0), (0, 0), (0, 1), (0, 0)))
    pats3 = []
    for dt in range(3):
        row = y2[:, dt]  # [bn, f2+1, c2]
        for df in range(3):
            pats3.append(halve(row[:, df : df + 2 * f3], 1))
    p3 = jnp.concatenate(
        [q.reshape(bn * f3, c2) for q in pats3], axis=-1
    )  # [bn*f3, 9*c2]
    y3 = jnp.dot(p3, w3k_ref[:], preferred_element_type=jnp.float32)
    y3 = double_swish(y3.reshape(bn, f3, c3) + b3_ref[:].astype(jnp.float32))
    y3 = y3.astype(jnp.bfloat16)

    d_model = wo_ref.shape[1]
    out = jnp.broadcast_to(bo_ref[:].astype(jnp.float32), (bn, d_model))
    wo = wo_ref[:]
    for f in range(f3):
        out = out + jnp.dot(
            y3[:, f, :], wo[f * c3 : (f + 1) * c3],
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = out


@functools.partial(
    jax.jit, static_argnames=("P", "step", "seg", "block_s", "interpret")
)
def conv_embed_windows(
    params,
    front: jnp.ndarray,
    *,
    P: int,
    step: int,
    seg: int,
    block_s: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """[S, W, mel] front buffer -> [P, S, d_model]; one window per grid
    step (see `_win_kernel`). Same contract and numerics as
    `conv_embed_from_front`, compile-safe at serving P."""
    S, W, mel = front.shape
    if W != (P - 1) * step + seg:
        raise ValueError(f"front width {W} != (P-1)*step+seg for {P=} {step=} {seg=}")
    c1 = params["conv1_w"].shape[0]
    c2 = params["conv2_w"].shape[0]
    c3 = params["conv3_w"].shape[0]
    d = params["embed_out_w"].shape[1]
    f2 = (mel - 3) // 2 + 1
    f3 = (f2 - 3) // 2 + 1
    t2 = (seg - 3) // 2 + 1

    w2k = (
        jnp.transpose(params["conv2_w"], (2, 3, 1, 0))
        .reshape(9 * c1, c2)
        .astype(jnp.bfloat16)
    )
    w3k = (
        jnp.transpose(params["conv3_w"], (2, 3, 1, 0))
        .reshape(9 * c2, c3)
        .astype(jnp.bfloat16)
    )
    wo = (
        params["embed_out_w"]
        .reshape(c3, f3, d)
        .transpose(1, 0, 2)
        .reshape(f3 * c3, d)
        .astype(jnp.bfloat16)
    )

    kern = functools.partial(_win_kernel, step, seg)
    const = lambda i, p: (0,) * 1

    grid = (S // block_s, P)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((c1, 1, 3, 3), lambda i, p: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c1,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c1, c2), lambda i, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c2,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c2, c3), lambda i, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c3,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c3 * f3, d), lambda i, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_s, W, mel), lambda i, p: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_s, d), lambda i, p: (p, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((P, S, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * P * (t2 * f2 * 9 * c1 * c2 + f3 * 9 * c2 * c3 + c3 * f3 * d)
            + 2 * S * P * seg * mel * 9 * c1,
            bytes_accessed=S * (W * mel + P * d) * 4,
            transcendentals=S * P * seg * mel * c1,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        params["conv1_w"].astype(jnp.float32),
        params["conv1_b"].astype(jnp.float32),
        w2k,
        params["conv2_b"].astype(jnp.float32),
        w3k,
        params["conv3_b"].astype(jnp.float32),
        wo,
        params["embed_out_b"].astype(jnp.float32),
        front,
    )


@functools.partial(
    jax.jit, static_argnames=("P", "step", "seg", "block_s", "interpret")
)
def conv_embed_from_front(
    params,
    front: jnp.ndarray,
    *,
    P: int,
    step: int,
    seg: int,
    block_s: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """[S, W, mel] front buffer -> [P, S, d_model] per-window embeddings.

    Exact per-window semantics (each window zero-padded independently, as the
    per-window XLA path computes them) — see module docstring.

    KNOWN ISSUE: the body unrolls all P windows; past P~10 the Mosaic
    compile time blows up (observed: hung >10 min at P=27, S=4096). The
    product path uses `conv_embed_windows` (one window per grid step)
    instead; this whole-front variant is kept for its shared-conv1
    formulation and small-P tests.
    """
    S, W, mel = front.shape
    if W != (P - 1) * step + seg:
        raise ValueError(f"front width {W} != (P-1)*step+seg for {P=} {step=} {seg=}")
    c1 = params["conv1_w"].shape[0]
    c2 = params["conv2_w"].shape[0]
    c3 = params["conv3_w"].shape[0]
    d = params["embed_out_w"].shape[1]
    f2 = (mel - 3) // 2 + 1
    f3 = (f2 - 3) // 2 + 1
    t2 = (seg - 3) // 2 + 1

    # im2col weight forms, K rows ordered (dt, df, cin)
    w2k = (
        jnp.transpose(params["conv2_w"], (2, 3, 1, 0))
        .reshape(9 * c1, c2)
        .astype(jnp.bfloat16)
    )
    w3k = (
        jnp.transpose(params["conv3_w"], (2, 3, 1, 0))
        .reshape(9 * c2, c3)
        .astype(jnp.bfloat16)
    )
    # the kernel flattens conv3 output as (freq, ch); the shipped weight's
    # rows are (ch, freq)-ordered (lstm_transducer:257-259) — permute rows
    # here so the products match exactly
    wo = (
        params["embed_out_w"]
        .reshape(c3, f3, d)
        .transpose(1, 0, 2)
        .reshape(f3 * c3, d)
        .astype(jnp.bfloat16)
    )

    kern = functools.partial(_kernel, P, step, seg)
    const = lambda i: (0,) * 1

    grid = (S // block_s,)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((c1, 1, 3, 3), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c1,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c1, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c2,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c2, c3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c3,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c3 * f3, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_s, W, mel), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (P, block_s, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((P, S, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * P * (t2 * f2 * 9 * c1 * c2 + f3 * 9 * c2 * c3 + c3 * f3 * d)
            + 2 * S * W * mel * 9 * c1,
            bytes_accessed=S * (W * mel + P * d) * 4,
            transcendentals=S * W * mel * c1,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        params["conv1_w"].astype(jnp.float32),
        params["conv1_b"].astype(jnp.float32),
        w2k,
        params["conv2_b"].astype(jnp.float32),
        w3k,
        params["conv3_b"].astype(jnp.float32),
        wo,
        params["embed_out_b"].astype(jnp.float32),
        front,
    )
