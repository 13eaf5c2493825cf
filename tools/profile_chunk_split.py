"""A/B: fused whole-layer chunk kernel vs recurrent-core kernel + batched
XLA FFN (the FFN half has no time recurrence, so it can leave the serial
per-timestep loop and run as one big MXU-efficient matmul per layer).

Timing method per memory/axon notes: chain K outer iterations inside one
jit, force a host readback of a small slice, and difference K=1 vs K=3 to
cancel the tunnel RTT.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from april_asr_tpu.models import lstm_transducer as M

P, S, d, H, F, L = 27, 2048, 512, 1024, 2048, 12
BLOCK = 256


def build():
    dims = M.TransducerDims()
    params = M.init_transducer_params(jax.random.PRNGKey(0), dims)
    params = M.quantize_weights(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (P, S, d), jnp.float32) * 0.1
    h = jnp.zeros((L, S, d), jnp.float32)
    c = jnp.zeros((L, S, H), jnp.float32)
    n_pulls = jnp.full((S,), P, jnp.int32)
    return params, x, h, c, n_pulls


def stack_fused(params, x, h, c, n_pulls):
    from april_asr_tpu.ops.lstm_pallas import lstm_layer_chunk_fused_i8

    y = x
    hs, cs = [], []
    for l in range(L):
        y, h2, c2 = lstm_layer_chunk_fused_i8(
            y, h[l], c[l],
            params["w_ih_t_q8"][l], params["w_ih_t_q8s"][l],
            params["w_hh_t_q8"][l], params["w_hh_t_q8s"][l],
            params["bias"][l],
            params["w_hr_t_q8"][l], params["w_hr_t_q8s"][l],
            params["ff1_t_q8"][l], params["ff1_t_q8s"][l], params["ff1_b"][l],
            params["ff2_t_q8"][l], params["ff2_t_q8s"][l], params["ff2_b"][l],
            params["norm_eps"][l], n_pulls, block_s=BLOCK,
        )
        y, h2, c2 = jax.lax.optimization_barrier((y, h2, c2))
        hs.append(h2)
        cs.append(c2)
    return y, jnp.stack(hs), jnp.stack(cs)


def stack_split(params, x, h, c, n_pulls):
    from april_asr_tpu.ops.lstm_pallas import lstm_layer_chunk_rec_i8

    rec = lstm_layer_chunk_rec_i8

    y = x
    hs, cs = [], []
    for l in range(L):
        hseq, h2, c2 = rec(
            y, h[l], c[l],
            params["w_ih_t_q8"][l], params["w_ih_t_q8s"][l],
            params["w_hh_t_q8"][l], params["w_hh_t_q8s"][l],
            params["bias"][l],
            params["w_hr_t_q8"][l], params["w_hr_t_q8s"][l],
            n_pulls, block_s=BLOCK,
        )
        hseq, h2, c2 = jax.lax.optimization_barrier((hseq, h2, c2))
        yr = y + hseq
        mid = M._double_swish(
            M._q8_mm(
                yr.reshape(P * S, d), params["ff1_t_q8"][l], params["ff1_t_q8s"][l]
            ).reshape(P, S, F)
            + params["ff1_b"][l].astype(jnp.float32)
        )
        ff = M._q8_mm(
            mid.reshape(P * S, F), params["ff2_t_q8"][l], params["ff2_t_q8s"][l]
        ).reshape(P, S, d) + params["ff2_b"][l].astype(jnp.float32)
        y = M._basic_norm(yr + ff, params["norm_eps"][l].astype(jnp.float32))
        hs.append(h2)
        cs.append(c2)
    return y, jnp.stack(hs), jnp.stack(cs)


def stack_split_pallas(params, x, h, c, n_pulls, rec_block=BLOCK, stream=False):
    from april_asr_tpu.ops.lstm_pallas import (
        ffn_norm_i8,
        lstm_layer_chunk_rec_i8,
        lstm_layer_chunk_rec_stream_i8,
    )

    rec = lstm_layer_chunk_rec_stream_i8 if stream else lstm_layer_chunk_rec_i8

    y = x
    hs, cs = [], []
    for l in range(L):
        hseq, h2, c2 = rec(
            y, h[l], c[l],
            params["w_ih_t_q8"][l], params["w_ih_t_q8s"][l],
            params["w_hh_t_q8"][l], params["w_hh_t_q8s"][l],
            params["bias"][l],
            params["w_hr_t_q8"][l], params["w_hr_t_q8s"][l],
            n_pulls, block_s=rec_block,
        )
        hseq, h2, c2 = jax.lax.optimization_barrier((hseq, h2, c2))
        y = ffn_norm_i8(
            y.reshape(P * S, d), hseq.reshape(P * S, d),
            params["ff1_t_q8"][l], params["ff1_t_q8s"][l], params["ff1_b"][l],
            params["ff2_t_q8"][l], params["ff2_t_q8s"][l], params["ff2_b"][l],
            params["norm_eps"][l], block_r=512,
        ).reshape(P, S, d)
        y = jax.lax.optimization_barrier(y)
        hs.append(h2)
        cs.append(c2)
    return y, jnp.stack(hs), jnp.stack(cs)


def chain(fn, k):
    @jax.jit
    def run(params, x, h, c, n_pulls):
        y = x
        for _ in range(k):
            y, h2, c2 = fn(params, y, h, c, n_pulls)
        return y[0, :2, :2], h2[0, :2, :2]

    return run


def timeit(run, args, n=6):
    r = run(*args)
    np.asarray(r[0])  # compile + settle
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = run(*args)
        np.asarray(r[0])  # host readback forces real completion
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000


def main():
    params, x, h, c, n_pulls = build()
    import functools as _ft
    variants = [
        ("fused", stack_fused),
        ("split-pallas-256", stack_split_pallas),
        ("stream-512", _ft.partial(stack_split_pallas, rec_block=512, stream=True)),
        ("stream-1024", _ft.partial(stack_split_pallas, rec_block=1024, stream=True)),
        ("stream-2048", _ft.partial(stack_split_pallas, rec_block=2048, stream=True)),
    ]
    for name, fn in variants:
        t1 = timeit(chain(fn, 1), (params, x, h, c, n_pulls))
        t3 = timeit(chain(fn, 3), (params, x, h, c, n_pulls))
        per = (t3 - t1) / 2.0
        print(f"{name:10s}: k1={t1:7.1f} ms  k3={t3:7.1f} ms  -> per-stack {per:6.1f} ms")

    # numerics: split must match fused to f32 ulps
    ya, ha, ca = jax.jit(stack_fused)(params, x, h, c, n_pulls)
    yb, hb, cb = jax.jit(stack_split)(params, x, h, c, n_pulls)
    yc, hc2, cc = jax.jit(stack_split_pallas)(params, x, h, c, n_pulls)
    import functools as _ft2
    yd, hd, cd = jax.jit(_ft2.partial(stack_split_pallas, rec_block=1024, stream=True))(params, x, h, c, n_pulls)
    print("pallas-split y maxdiff:", float(jnp.max(jnp.abs(ya - yc))))
    print("stream y maxdiff:", float(jnp.max(jnp.abs(ya - yd))))
    print("stream h maxdiff:", float(jnp.max(jnp.abs(ha - hd))))
    print("stream c maxdiff:", float(jnp.max(jnp.abs(ca - cd))))


if __name__ == "__main__":
    main()


# --- prototype: tile-interleaved rec kernel (t slow, tiles fast) ----------
import jax.experimental.pallas as pl
import jax.experimental.pallas.tpu as pltpu
from april_asr_tpu.ops.lstm_pallas import _rowq8


def _rec_inter_kernel(P, block_s, x_ref, h_ref, c_ref, n_ref,
                      wih_ref, wih_s_ref, whh_ref, whh_s_ref, b_ref,
                      whr_ref, whr_s_ref,
                      hseq_ref, h2_ref, c2_ref, sh_ref, sc_ref):
    t = pl.program_id(0)
    i = pl.program_id(1)
    H = sc_ref.shape[1]
    sl = pl.ds(i * block_s, block_s)

    @pl.when(t == 0)
    def _init():
        sh_ref[sl, :] = h_ref[sl, :]
        sc_ref[sl, :] = c_ref[sl, :]

    x = x_ref[0].astype(jnp.float32)
    h_t = sh_ref[sl, :]
    c_t = sc_ref[sl, :]
    xq, xs = _rowq8(x)
    hq, hs = _rowq8(h_t)
    gates = (
        jnp.dot(xq, wih_ref[:], preferred_element_type=jnp.int32).astype(jnp.float32)
        * (xs * wih_s_ref[:])
        + jnp.dot(hq, whh_ref[:], preferred_element_type=jnp.int32).astype(jnp.float32)
        * (hs * whh_s_ref[:])
        + b_ref[:].astype(jnp.float32)
    )
    ii = gates[:, :H]
    f = gates[:, H:2*H]
    g = gates[:, 2*H:3*H]
    o = gates[:, 3*H:]
    c_new = jax.nn.sigmoid(f) * c_t + jax.nn.sigmoid(ii) * jnp.tanh(g)
    hc = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    hcq, hcs = _rowq8(hc)
    h_new = jnp.dot(hcq, whr_ref[:], preferred_element_type=jnp.int32).astype(
        jnp.float32) * (hcs * whr_s_ref[:])
    hseq_ref[0] = h_new
    live = t < n_ref[sl, :]
    h_keep = jnp.where(live, h_new, h_t)
    c_keep = jnp.where(live, c_new, c_t)
    sh_ref[sl, :] = h_keep
    sc_ref[sl, :] = c_keep

    @pl.when(t == P - 1)
    def _fin():
        h2_ref[sl, :] = h_keep
        c2_ref[sl, :] = c_keep


@functools.partial(jax.jit, static_argnames=("block_s",))
def rec_interleave_i8(x, h, c, wih_q, wih_s, whh_q, whh_s, bias, whr_q, whr_s,
                      n_pulls, *, block_s=512):
    P_, S_, d_ = x.shape
    hid = c.shape[1]
    grid = (P_, S_ // block_s)
    n_col = n_pulls.astype(jnp.int32).reshape(S_, 1)

    def xmap(t, i):
        return (t, i, 0)

    def full(t, i):
        return (0, 0)

    hseq, h2, c2 = pl.pallas_call(
        functools.partial(_rec_inter_kernel, P_, block_s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_s, d_), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_, d_), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_, hid), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_, 1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_, 4 * hid), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hid), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_, 4 * hid), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hid), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hid), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, d_), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_s, d_), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_, d_), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((S_, hid), full, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P_, S_, d_), jnp.float32),
            jax.ShapeDtypeStruct((S_, d_), jnp.float32),
            jax.ShapeDtypeStruct((S_, hid), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((S_, d_), jnp.float32),
            pltpu.VMEM((S_, hid), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, h, c, n_col, wih_q, wih_s.reshape(1, -1), whh_q, whh_s.reshape(1, -1),
      bias.reshape(1, -1), whr_q, whr_s.reshape(1, -1))
    return hseq, h2, c2


def stack_interleave(params, x, h, c, n_pulls, rec_block=512):
    from april_asr_tpu.ops.lstm_pallas import ffn_norm_i8

    y = x
    hs, cs = [], []
    for l in range(L):
        hseq, h2, c2 = rec_interleave_i8(
            y, h[l], c[l],
            params["w_ih_t_q8"][l], params["w_ih_t_q8s"][l],
            params["w_hh_t_q8"][l], params["w_hh_t_q8s"][l],
            params["bias"][l],
            params["w_hr_t_q8"][l], params["w_hr_t_q8s"][l],
            n_pulls, block_s=rec_block,
        )
        hseq, h2, c2 = jax.lax.optimization_barrier((hseq, h2, c2))
        y = ffn_norm_i8(
            y.reshape(P * S, d), hseq.reshape(P * S, d),
            params["ff1_t_q8"][l], params["ff1_t_q8s"][l], params["ff1_b"][l],
            params["ff2_t_q8"][l], params["ff2_t_q8s"][l], params["ff2_b"][l],
            params["norm_eps"][l], block_r=512,
        ).reshape(P, S, d)
        y = jax.lax.optimization_barrier(y)
        hs.append(h2)
        cs.append(c2)
    return y, jnp.stack(hs), jnp.stack(cs)


def main2():
    import functools as _ft
    params, x, h, c, n_pulls = build()
    variants = [
        ("stream-512", _ft.partial(stack_split_pallas, rec_block=512, stream=True)),
        ("interleave-512", stack_interleave),
        ("interleave-256", _ft.partial(stack_interleave, rec_block=256)),
    ]
    for name, fn in variants:
        t1 = timeit(chain(fn, 1), (params, x, h, c, n_pulls))
        t3 = timeit(chain(fn, 3), (params, x, h, c, n_pulls))
        per = (t3 - t1) / 2.0
        print(f"{name:15s}: k1={t1:7.1f} ms  k3={t3:7.1f} ms  -> per-stack {per:6.1f} ms")
    ya, ha, ca = jax.jit(stack_fused)(params, x, h, c, n_pulls)
    yd, hd, cd = jax.jit(stack_interleave)(params, x, h, c, n_pulls)
    print("interleave y maxdiff:", float(jnp.max(jnp.abs(ya - yd))))
    print("interleave h maxdiff:", float(jnp.max(jnp.abs(ha - hd))))


def stack_stream2(params, x, h, c, n_pulls, rec_block=512):
    from april_asr_tpu.ops.lstm_pallas import ffn_norm_i8, lstm_layer_chunk_rec_stream2_i8

    y = x
    hs, cs = [], []
    for l in range(L):
        hseq, h2, c2 = lstm_layer_chunk_rec_stream2_i8(
            y, h[l], c[l],
            params["w_ih_t_q8"][l], params["w_ih_t_q8s"][l],
            params["w_hh_t_q8"][l], params["w_hh_t_q8s"][l],
            params["bias"][l],
            params["w_hr_t_q8"][l], params["w_hr_t_q8s"][l],
            n_pulls, block_s=rec_block,
        )
        hseq, h2, c2 = jax.lax.optimization_barrier((hseq, h2, c2))
        y = ffn_norm_i8(
            y.reshape(P * S, d), hseq.reshape(P * S, d),
            params["ff1_t_q8"][l], params["ff1_t_q8s"][l], params["ff1_b"][l],
            params["ff2_t_q8"][l], params["ff2_t_q8s"][l], params["ff2_b"][l],
            params["norm_eps"][l], block_r=512,
        ).reshape(P, S, d)
        y = jax.lax.optimization_barrier(y)
        hs.append(h2)
        cs.append(c2)
    return y, jnp.stack(hs), jnp.stack(cs)


def main3():
    import functools as _ft
    params, x, h, c, n_pulls = build()
    variants = [
        ("stream-512", _ft.partial(stack_split_pallas, rec_block=512, stream=True)),
        ("stream2-512", stack_stream2),
        ("stream2-256", _ft.partial(stack_stream2, rec_block=256)),
    ]
    for name, fn in variants:
        t1 = timeit(chain(fn, 1), (params, x, h, c, n_pulls))
        t3 = timeit(chain(fn, 3), (params, x, h, c, n_pulls))
        per = (t3 - t1) / 2.0
        print(f"{name:15s}: k1={t1:7.1f} ms  k3={t3:7.1f} ms  -> per-stack {per:6.1f} ms")
    ya, ha, ca = jax.jit(stack_fused)(params, x, h, c, n_pulls)
    yd, hd, cd = jax.jit(stack_stream2)(params, x, h, c, n_pulls)
    print("stream2 y maxdiff:", float(jnp.max(jnp.abs(ya - yd))))
    print("stream2 h maxdiff:", float(jnp.max(jnp.abs(ha - hd))))
