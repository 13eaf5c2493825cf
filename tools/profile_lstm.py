"""Microbench LSTM-stack structural variants to pick the fastest layout.

Variants (all 5 timesteps x 12 layers, flagship dims):
  A. time-major scan over pulls, layer scan inside (current engine shape)
  B. same but layers unrolled (no lax.scan over stacked weights)
  C. layer-major: per layer, input-side matmuls batched over all timesteps,
     small scan over time for the recurrent part only
  D. variant C with bfloat16 weights/activations (f32 accumulate)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import build_runtime  # noqa: E402

from april_asr_tpu.models.lstm_transducer import _basic_norm, _double_swish  # noqa: E402


def timeit(fn, n=10, warmup=3):
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50)) * 1000


def lstm_cell(x, h, c, w_ih_t, w_hh_t, bias, w_hr_t):
    gates = (
        jnp.dot(x, w_ih_t, preferred_element_type=jnp.float32)
        + jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32)
        + bias
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    hc = jax.nn.sigmoid(o) * jnp.tanh(c2)
    h2 = jnp.dot(hc, w_hr_t, preferred_element_type=jnp.float32)
    return h2, c2


def main():
    rt = build_runtime()
    w = rt.weights
    dims = rt.dims
    L, T = dims.layers, 5

    for S in (256, 1024):
        x5 = jnp.zeros((T, S, dims.d_model), jnp.float32)
        h0 = jnp.zeros((L, S, dims.d_model), jnp.float32)
        c0 = jnp.zeros((L, S, dims.hidden), jnp.float32)

        # A: current shape (time scan outer, layer scan inner)
        @jax.jit
        def variant_a(w, x5, h, c):
            def tstep(carry, x):
                h, c = carry

                def layer(x, p):
                    wi, wh, b, wr, f1t, f1b, f2t, f2b, eps, hl, cl = p
                    h2, c2 = lstm_cell(x, hl, cl, wi, wh, b, wr)
                    y = x + h2
                    ff = jnp.dot(
                        _double_swish(jnp.dot(y, f1t, preferred_element_type=jnp.float32) + f1b),
                        f2t, preferred_element_type=jnp.float32) + f2b
                    return _basic_norm(y + ff, eps), (h2, c2)

                y, (h2, c2) = jax.lax.scan(
                    layer, x,
                    (w["w_ih_t"], w["w_hh_t"], w["bias"], w["w_hr_t"],
                     w["ff1_t"], w["ff1_b"], w["ff2_t"], w["ff2_b"],
                     w["norm_eps"], h, c),
                )
                return (h2, c2), y

            (h, c), ys = jax.lax.scan(tstep, (h, c), x5)
            return ys

        print(f"S={S} A(time-major, layer scan): {timeit(lambda: variant_a(w, x5, h0, c0)):.2f} ms")

        # B: layers unrolled in python
        @jax.jit
        def variant_b(w, x5, h, c):
            def tstep(carry, x):
                hs, cs = carry
                new_h, new_c = [], []
                y = x
                for l in range(L):
                    h2, c2 = lstm_cell(
                        y, hs[l], cs[l], w["w_ih_t"][l], w["w_hh_t"][l],
                        w["bias"][l], w["w_hr_t"][l])
                    y2 = y + h2
                    ff = jnp.dot(
                        _double_swish(jnp.dot(y2, w["ff1_t"][l], preferred_element_type=jnp.float32) + w["ff1_b"][l]),
                        w["ff2_t"][l], preferred_element_type=jnp.float32) + w["ff2_b"][l]
                    y = _basic_norm(y2 + ff, w["norm_eps"][l])
                    new_h.append(h2)
                    new_c.append(c2)
                return (jnp.stack(new_h), jnp.stack(new_c)), y

            (h, c), ys = jax.lax.scan(tstep, (h, c), x5)
            return ys

        print(f"S={S} B(time-major, unrolled): {timeit(lambda: variant_b(w, x5, h0, c0)):.2f} ms")

        # C: layer-major — batch input matmuls over T, scan time for recurrence
        @jax.jit
        def variant_c(w, x5, h, c):
            y = x5  # [T, S, d]
            hs, cs = [], []
            for l in range(L):
                xin = jnp.dot(
                    y.reshape(T * S, -1), w["w_ih_t"][l],
                    preferred_element_type=jnp.float32,
                ).reshape(T, S, -1) + w["bias"][l]

                def trec(carry, xg, wh=w["w_hh_t"][l], wr=w["w_hr_t"][l]):
                    hl, cl = carry
                    gates = xg + jnp.dot(hl, wh, preferred_element_type=jnp.float32)
                    i, f, g, o = jnp.split(gates, 4, axis=-1)
                    c2 = jax.nn.sigmoid(f) * cl + jax.nn.sigmoid(i) * jnp.tanh(g)
                    hc = jax.nn.sigmoid(o) * jnp.tanh(c2)
                    h2 = jnp.dot(hc, wr, preferred_element_type=jnp.float32)
                    return (h2, c2), h2

                (hl, cl), h_seq = jax.lax.scan(trec, (h[l], c[l]), xin)
                y2 = y + h_seq  # [T, S, d]
                flat = y2.reshape(T * S, -1)
                ff = jnp.dot(
                    _double_swish(jnp.dot(flat, w["ff1_t"][l], preferred_element_type=jnp.float32) + w["ff1_b"][l]),
                    w["ff2_t"][l], preferred_element_type=jnp.float32) + w["ff2_b"][l]
                y = _basic_norm(flat + ff, w["norm_eps"][l]).reshape(T, S, -1)
                hs.append(hl)
                cs.append(cl)
            return y

        print(f"S={S} C(layer-major): {timeit(lambda: variant_c(w, x5, h0, c0)):.2f} ms")

        # D: layer-major bf16
        wb = {k: (v.astype(jnp.bfloat16) if v.ndim >= 2 else v) for k, v in w.items()}

        @jax.jit
        def variant_d(w, x5, h, c):
            y = x5.astype(jnp.bfloat16)
            h = h.astype(jnp.bfloat16)
            for l in range(L):
                xin = jnp.dot(
                    y.reshape(T * S, -1), w["w_ih_t"][l],
                    preferred_element_type=jnp.float32,
                ).reshape(T, S, -1) + w["bias"][l].astype(jnp.float32)

                def trec(carry, xg, wh=w["w_hh_t"][l], wr=w["w_hr_t"][l]):
                    hl, cl = carry
                    gates = xg + jnp.dot(hl, wh, preferred_element_type=jnp.float32)
                    i, f, g, o = jnp.split(gates, 4, axis=-1)
                    c2 = jax.nn.sigmoid(f) * cl + jax.nn.sigmoid(i) * jnp.tanh(g)
                    hc = jax.nn.sigmoid(o) * jnp.tanh(c2)
                    h2 = jnp.dot(hc.astype(jnp.bfloat16), wr, preferred_element_type=jnp.float32)
                    return (h2.astype(jnp.bfloat16), c2), h2

                (hl, cl), h_seq = jax.lax.scan(trec, (h[l], c[l].astype(jnp.float32)), xin)
                y2 = y.astype(jnp.float32) + h_seq
                flat = y2.reshape(T * S, -1).astype(jnp.bfloat16)
                ff = jnp.dot(
                    _double_swish(jnp.dot(flat, w["ff1_t"][l], preferred_element_type=jnp.float32) + w["ff1_b"][l].astype(jnp.float32)).astype(jnp.bfloat16),
                    w["ff2_t"][l], preferred_element_type=jnp.float32) + w["ff2_b"][l].astype(jnp.float32)
                y = _basic_norm(y2.reshape(T * S, -1) + ff, w["norm_eps"][l].astype(jnp.float32)).reshape(T, S, -1).astype(jnp.bfloat16)
            return y

        print(f"S={S} D(layer-major bf16): {timeit(lambda: variant_d(wb, x5, h0, c0)):.2f} ms")


if __name__ == "__main__":
    main()
