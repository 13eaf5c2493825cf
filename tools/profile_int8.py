"""Microbenchmark: int8 vs bf16 matmul throughput at encoder shapes.

Validates the premise of the int8 quantized serving path: the v5e MXU runs
int8 x int8 -> int32 at ~2x the bf16 rate, and Mosaic lowers int8 dots in
Pallas. Shapes mirror the LSTM chunk kernel's gate matmul
([block_s, d] x [d, 4H]) and the batched FFN.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=30, warmup=5):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def mm_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    )


def mm_kernel_i8(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.int32
    )


def mm_kernel_i8_dynq(x_ref, w_ref, s_ref, o_ref):
    """bf16 activations quantized per-row in-kernel, int8 matmul, dequant."""
    x = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = amax / 127.0
    xq = jnp.round(x / jnp.maximum(sx, 1e-30)).astype(jnp.int8)
    acc = jnp.dot(xq, w_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * sx * s_ref[:]


def run(M, K, N, iters=40):
    kx = jax.random.PRNGKey(0)
    xf = jax.random.normal(kx, (M, K), jnp.float32)
    x16 = xf.astype(jnp.bfloat16)
    w16 = jax.random.normal(kx, (K, N), jnp.float32).astype(jnp.bfloat16)
    xi = jax.random.randint(kx, (M, K), -127, 127, jnp.int8)
    wi = jax.random.randint(kx, (K, N), -127, 127, jnp.int8)
    ws = jnp.ones((1, N), jnp.float32)

    flops = 2.0 * M * K * N

    def call(kernel, outdt, *ins):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), outdt),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(*ins)

    f_bf = jax.jit(lambda a, b: call(mm_kernel, jnp.float32, a, b))
    f_i8 = jax.jit(lambda a, b: call(mm_kernel_i8, jnp.int32, a, b))
    f_dq = jax.jit(lambda a, b, s: call(mm_kernel_i8_dynq, jnp.float32, a, b, s))

    t_bf = timeit(f_bf, x16, w16, n=iters)
    t_i8 = timeit(f_i8, xi, wi, n=iters)
    t_dq = timeit(f_dq, x16, wi, ws, n=iters)
    print(
        f"[{M}x{K}x{N}] bf16 {t_bf*1e6:8.1f} us ({flops/t_bf/1e12:6.1f} TF/s)"
        f" | int8 {t_i8*1e6:8.1f} us ({flops/t_i8/1e12:6.1f} TOP/s)"
        f" | int8+dynq {t_dq*1e6:8.1f} us ({flops/t_dq/1e12:6.1f} TOP/s)"
    )


def main():
    print("device:", jax.devices()[0])
    # gate matmul shape per session tile / full batch
    for M in (256, 2048):
        run(M, 512, 4096)
    # FFN shapes
    run(2048, 512, 2048)
    run(2048, 2048, 512)
    # joiner
    run(2048, 512, 512)


if __name__ == "__main__":
    sys.exit(main())
