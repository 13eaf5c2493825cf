"""Variant timing for the conv-embed stack at serving scale.

The xplane trace shows the shipped NCHW lax.conv embed costs ~11 ms/step at
S=4096 (input relayout copy 5.4 ms + conv fusions) for ~1 ms of FLOPs. This
times layout-preserving reformulations of the same math.

Usage: python tools/profile_embed.py [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import build_runtime  # noqa: E402

from april_asr_tpu.models.lstm_transducer import (  # noqa: E402
    _double_swish,
    _mm,
    conv_subsample,
)


def conv_nhwc(params, x):
    """Same math, NHWC/HWIO dimension numbers (TPU-native layout)."""
    h = x[..., None]  # [N, T, F, 1]

    def conv(h, wname, bname, stride, pad):
        w = params[wname]  # OIHW
        whwio = jnp.transpose(w, (2, 3, 1, 0))
        y = jax.lax.conv_general_dilated(
            h.astype(w.dtype), whwio, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return _double_swish(y + params[bname].astype(jnp.float32))

    h = conv(h, "conv1_w", "conv1_b", 1, 1)
    h = conv(h, "conv2_w", "conv2_b", 2, 0)
    h = conv(h, "conv3_w", "conv3_b", 2, 0)
    n, t, f, ch = h.shape
    h = h.reshape(n, t, ch * f) if False else h.reshape(n, t * f * ch)
    # NHWC flatten order is (t, f, ch); shipped order is (t, ch, f) — for
    # TIMING ONLY the permutation is irrelevant (same matmul shape)
    return _mm(h.reshape(n, 1, -1), params["embed_out_w"]) + params[
        "embed_out_b"
    ].astype(jnp.float32)


def conv1_shift_nhwc(params, x):
    """conv1 as 9 shifted FMAs in NHWC (no relayout), conv2/3 NHWC convs."""
    w1 = params["conv1_w"].astype(jnp.float32)  # [8, 1, 3, 3]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))  # [N, T+2, F+2]
    T, F = x.shape[1], x.shape[2]
    y1 = params["conv1_b"].astype(jnp.float32)[None, None, None, :]
    for dt in range(3):
        for df in range(3):
            y1 = y1 + xp[:, dt : dt + T, df : df + F, None] * w1[None, None, None, :, 0, dt, df].reshape(1, 1, 1, 8)
    h = _double_swish(y1)

    def conv(h, wname, bname, stride):
        w = params[wname]
        whwio = jnp.transpose(w, (2, 3, 1, 0))
        y = jax.lax.conv_general_dilated(
            h.astype(w.dtype), whwio, (stride, stride), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return _double_swish(y + params[bname].astype(jnp.float32))

    h = conv(h, "conv2_w", "conv2_b", 2)
    h = conv(h, "conv3_w", "conv3_b", 2)
    n = h.shape[0]
    return _mm(h.reshape(n, 1, -1), params["embed_out_w"]) + params[
        "embed_out_b"
    ].astype(jnp.float32)


def _force(x):
    """jax.block_until_ready is not a completion barrier on this remote
    backend; a scalar readback is the only reliable sync."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jnp.ravel(leaf)[0])


def timeit(f, *args, iters=20):
    _force(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        f(*args)
    _force(f(*args))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 110592
    rt = build_runtime()
    dims = rt.dims
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (N, dims.segment_size, dims.mel)),
        jnp.float32,
    )
    w = rt.weights
    for name, fn in [
        ("nchw-shipped", lambda w, x: conv_subsample(w, x)),
        ("nhwc        ", conv_nhwc),
        ("c1shift+nhwc", conv1_shift_nhwc),
    ]:
        f = jax.jit(fn)
        ms = timeit(f, w, x)
        print(f"{name}: {ms:7.2f} ms  (N={N})")


if __name__ == "__main__":
    main()
