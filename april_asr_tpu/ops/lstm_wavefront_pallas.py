"""Wavefront (diagonal) Pallas TPU kernel for a slab of residual-LSTM layers.

The layer-major chunk schedule (ops/lstm_pallas.py: one `pallas_call` per
layer, 25 serial timesteps each, then a batched FFN pass) leaves two costs on
the table at serving shapes:

  1. **Serialization**: the h->gates matmul of layer l at timestep t only
     depends on (l, t-1) and (l-1, t), yet the layer-major schedule makes
     layer l+1 wait for ALL P timesteps of layer l. The MXU idles behind the
     VPU cell tail every step (measured ~74% of the serialization-constrained
     roofline, docs/architecture.md "Efficiency accounting").
  2. **HBM traffic**: each layer round-trips its [P, S, d] f32 input and
     hseq through HBM between the recurrent kernel and the FFN kernel —
     ~12 GB/step at S=4096 (~15 ms at v5e bandwidth).

This kernel runs a SLAB of `Lk` layers (FFN + BasicNorm folded in) on the
anti-diagonal schedule: grid = (session tiles, P + Lk - 1 diagonals); at
diagonal step D every layer l with 0 <= D - l < P processes its timestep
t = D - l. All (l, t) items on one diagonal are independent, so the 12
recurrence chains overlap: while layer l's VPU tail (sigmoid/tanh cell,
per-row quant) runs, layer l+1's gate matmuls feed the MXU. Inter-layer
activations live in a VMEM ring (`ring_scr`) and never touch HBM; only the
slab input stream x[t] and the slab output y[t] do.

The stack is split into slabs (default 6+6 for the reference 12-layer
encoder) because all of a slab's weights must be VMEM-resident across the
whole wavefront: 6 int8 layers = ~39 MB of weights, comfortably inside the
100 MB budget with scratch + stream buffers; 12 would not fit at useful
session tiles. Slabs compose sequentially through one [P, S, d] handoff.

Numerics: identical op order and per-row quantization as the shipped
layer-major path (`_rec_stream2_kernel_i8` + `_ffn_norm_kernel_i8`), so
parity holds to f32 accumulation ulps (tests/test_lstm_wavefront.py).

Reference semantics accelerated: the 12-layer LSTM encoder the reference
runs through ONNXRuntime per 40 ms frame (src/april_session.c:131-148,
icefall lstm_transducer_stateless2 exported by extra/export-april.py:183-224).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .activations import sigmoid as _sig
from .lstm_pallas import _rowq8


def _wavefront_kernel_i8(
    P,
    Lk,
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
    hs_scr,
    cs_scr,
    ring_scr,
):
    D = pl.program_id(1)
    H = cs_scr.shape[2]

    @pl.when(D == 0)
    def _init():
        hs_scr[:] = h_ref[:]
        cs_scr[:] = c_ref[:]

    # Descending layer order: layer l consumes ring_scr[l-1] (written by
    # layer l-1 on the PREVIOUS diagonal) before layer l-1 overwrites it
    # later in this same body.
    for l in reversed(range(Lk)):
        t = D - l

        @pl.when(jnp.logical_and(t >= 0, t < P))
        def _layer(l=l, t=t):
            x = x_ref[0] if l == 0 else ring_scr[l - 1]
            h_t = hs_scr[l]
            c_t = cs_scr[l]
            hq, hs = _rowq8(h_t)
            xq, xs = _rowq8(x)
            gates = (
                jnp.dot(xq, wih_ref[l], preferred_element_type=jnp.int32).astype(
                    jnp.float32
                )
                * (xs * wih_s_ref[l])
                + jnp.dot(hq, whh_ref[l], preferred_element_type=jnp.int32).astype(
                    jnp.float32
                )
                * (hs * whh_s_ref[l])
                + b_ref[l].astype(jnp.float32)
            )
            i = gates[:, :H]
            f = gates[:, H : 2 * H]
            g = gates[:, 2 * H : 3 * H]
            o = gates[:, 3 * H :]
            # cell state stays f32 (streaming error must not compound)
            c_new = _sig(f) * c_t + _sig(i) * jnp.tanh(g)
            hc = _sig(o) * jnp.tanh(c_new)
            hcq, hcs = _rowq8(hc)
            h_new = jnp.dot(hcq, whr_ref[l], preferred_element_type=jnp.int32).astype(
                jnp.float32
            ) * (hcs * whr_s_ref[l])

            if gated:
                live = t < n_ref[:]  # [bs, 1] bool
                hs_scr[l] = jnp.where(live, h_new, h_t)
                cs_scr[l] = jnp.where(live, c_new, c_t)
            else:
                hs_scr[l] = h_new
                cs_scr[l] = c_new

            # residual + FFN + BasicNorm (the non-recurrent half), same op
            # order as _ffn_norm_kernel_i8
            y = x.astype(jnp.float32) + h_new
            yq, ys = _rowq8(y)
            mid = jnp.dot(yq, ff1_ref[l], preferred_element_type=jnp.int32).astype(
                jnp.float32
            ) * (ys * ff1_s_ref[l]) + f1b_ref[l].astype(jnp.float32)
            mid = mid * _sig(mid - 1.0)  # DoubleSwish
            mq, ms = _rowq8(mid)
            ff = jnp.dot(mq, ff2_ref[l], preferred_element_type=jnp.int32).astype(
                jnp.float32
            ) * (ms * ff2_s_ref[l]) + f2b_ref[l].astype(jnp.float32)
            yn = y + ff
            yn = yn * jax.lax.rsqrt(
                jnp.mean(yn * yn, axis=-1, keepdims=True) + eps_ref[l]
            )
            if l == Lk - 1:
                y_ref[0] = yn
            else:
                ring_scr[l] = yn

    @pl.when(D == P + Lk - 2)
    def _fin():
        h2_ref[:] = hs_scr[:]
        c2_ref[:] = cs_scr[:]


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def lstm_slab_wavefront_i8(
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
    norm_eps,
    n_pulls=None,
    *,
    block_s: int = 256,
    interpret: bool = False,
):
    """Run `Lk` stacked residual-LSTM layers (FFN+norm included) over a
    [P, S, d] chunk on the wavefront schedule.

    x: [P, S, d] f32 slab input; h: [Lk, S, d]; c: [Lk, S, H].
    Weight args are the stacked per-layer arrays (leading dim Lk) in the
    same transposed/quantized form as `quantize_weights` produces.
    Returns (y [P, S, d], h2 [Lk, S, d], c2 [Lk, S, H]).
    """
    P, S, d = x.shape
    Lk = h.shape[0]
    hidden = c.shape[2]
    ffn = ff1_q.shape[2]
    ndiag = P + Lk - 1
    grid = (S // block_s, ndiag)

    def xmap(i, D):
        return (jnp.minimum(D, P - 1), i, 0)

    def ymap(i, D):
        return (jnp.clip(D - (Lk - 1), 0, P - 1), i, 0)

    def state(i, D):
        return (0, i, 0)

    def row(i, D):
        return (i, 0)

    def const(i, D):
        return (0, 0, 0)

    gated = n_pulls is not None
    n_col = (
        n_pulls.astype(jnp.int32).reshape(S, 1)
        if gated
        else jnp.full((S, 1), P, jnp.int32)
    )

    flops = 2 * S * P * Lk * (d * 4 * hidden * 2 + hidden * d + 2 * d * ffn)
    y, h2, c2 = pl.pallas_call(
        functools.partial(_wavefront_kernel_i8, P, Lk, gated),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_s, d), xmap, memory_space=pltpu.VMEM),  # x[t]
            pl.BlockSpec((Lk, block_s, d), state, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, block_s, hidden), state, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, 1), row, memory_space=pltpu.VMEM),  # n_pulls
            pl.BlockSpec((Lk, d, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, 1, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, d, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, 1, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, 1, 4 * hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, hidden, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, 1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, d, ffn), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, 1, ffn), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, 1, ffn), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, ffn, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, 1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, 1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # norm_eps (Lk,)
        ],
        out_specs=(
            pl.BlockSpec((1, block_s, d), ymap, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, block_s, d), state, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lk, block_s, hidden), state, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P, S, d), jnp.float32),
            jax.ShapeDtypeStruct((Lk, S, d), jnp.float32),
            jax.ShapeDtypeStruct((Lk, S, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Lk, block_s, d), jnp.float32),
            pltpu.VMEM((Lk, block_s, hidden), jnp.float32),
            pltpu.VMEM((Lk, block_s, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                Lk * (2 * d * 4 * hidden + hidden * d + 2 * d * ffn)
                + S * (P * 2 * d + Lk * 2 * (d + hidden)) * 4
            ),
            transcendentals=S * P * Lk * (5 * hidden + ffn),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        x,
        h,
        c,
        n_col,
        w_ih_q,
        w_ih_s.reshape(Lk, 1, -1),
        w_hh_q,
        w_hh_s.reshape(Lk, 1, -1),
        bias.reshape(Lk, 1, -1),
        w_hr_q,
        w_hr_s.reshape(Lk, 1, -1),
        ff1_q,
        ff1_s.reshape(Lk, 1, -1),
        ff1_b.reshape(Lk, 1, -1),
        ff2_q,
        ff2_s.reshape(Lk, 1, -1),
        ff2_b.reshape(Lk, 1, -1),
        norm_eps.astype(jnp.float32).reshape(Lk),
    )
    return y, h2, c2


def stack_wavefront_i8(
    params,
    x,
    h,
    c,
    n_pulls=None,
    *,
    slab: int = 6,
    block_s: int = 256,
    interpret: bool = False,
):
    """Full L-layer stack as sequential wavefront slabs (default 6+6).

    `params` is the quantized transducer params dict (models/lstm_transducer
    `quantize_weights` layout). Slabs hand off through one [P, S, d] array;
    each slab keeps its own weights VMEM-resident for its whole wavefront.
    """
    L = params["w_ih_t_q8"].shape[0]
    y = x
    hs, cs = [], []
    for l0 in range(0, L, slab):
        l1 = min(l0 + slab, L)
        y, h2, c2 = lstm_slab_wavefront_i8(
            y,
            h[l0:l1],
            c[l0:l1],
            params["w_ih_t_q8"][l0:l1],
            params["w_ih_t_q8s"][l0:l1],
            params["w_hh_t_q8"][l0:l1],
            params["w_hh_t_q8s"][l0:l1],
            params["bias"][l0:l1],
            params["w_hr_t_q8"][l0:l1],
            params["w_hr_t_q8s"][l0:l1],
            params["ff1_t_q8"][l0:l1],
            params["ff1_t_q8s"][l0:l1],
            params["ff1_b"][l0:l1],
            params["ff2_t_q8"][l0:l1],
            params["ff2_t_q8s"][l0:l1],
            params["ff2_b"][l0:l1],
            params["norm_eps"][l0:l1],
            n_pulls,
            block_s=block_s,
            interpret=interpret,
        )
        y, h2, c2 = jax.lax.optimization_barrier((y, h2, c2))
        hs.append(h2)
        cs.append(c2)
    return y, jnp.concatenate(hs, axis=0), jnp.concatenate(cs, axis=0)
