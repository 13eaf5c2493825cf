"""Fused Pallas fbank DSP kernel vs the XLA `_frame_dsp` path.

Runs interpreted on CPU (conftest forces JAX_PLATFORMS=cpu); on TPU the same
kernel compiles via Mosaic and its fidelity vs the float64 oracle is within
the frontend's 2e-3 budget (measured 1e-4; see ops/fbank_pallas.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from april_asr_tpu.config import FbankOptions
from april_asr_tpu.frontend.fbank import (
    FbankLayout,
    fbank_accept,
    fbank_accept_batch,
    fbank_init,
)

OPTS = FbankOptions()


def _streams(S, total, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(0, 0.2, (S, total)).astype(np.float32)).clip(-1, 1)


@pytest.mark.parametrize("chunk", [3200, 1600])
def test_fused_accept_matches_scalar(chunk, monkeypatch):
    """Batched accept with the fused kernel == per-session XLA accept."""
    S = 8
    layout = FbankLayout.build(OPTS, chunk)
    waves = _streams(S, chunk * 3)

    # reference: per-session XLA path
    monkeypatch.setenv("APRIL_PALLAS", "0")
    ref = jax.vmap(lambda _: fbank_init(layout))(jnp.arange(S))
    accept_ref = jax.jit(lambda s, w, n: fbank_accept_batch(layout, s, w, n))
    # fused path
    monkeypatch.setenv("APRIL_PALLAS", "1")
    got = jax.vmap(lambda _: fbank_init(layout))(jnp.arange(S))
    accept_fused = jax.jit(lambda s, w, n: fbank_accept_batch(layout, s, w, n))

    n = jnp.full(S, chunk, jnp.int32)
    for k in range(3):
        w = jnp.asarray(waves[:, k * chunk : (k + 1) * chunk])
        ref = accept_ref(ref, w, n)
        got = accept_fused(got, w, n)

    np.testing.assert_array_equal(np.asarray(got["fifo_len"]), np.asarray(ref["fifo_len"]))
    np.testing.assert_array_equal(
        np.asarray(got["leftover_len"]), np.asarray(ref["leftover_len"])
    )
    np.testing.assert_allclose(
        np.asarray(got["leftover"]), np.asarray(ref["leftover"]), atol=1e-6
    )
    # compare only live fifo rows (rows beyond fifo_len are unwritten garbage
    # in both paths but may differ bitwise)
    R = layout.fifo_rows
    for s in range(S):
        off, ln = int(ref["fifo_off"][s]), int(ref["fifo_len"][s])
        idx = [(off + i) % R for i in range(ln)]
        np.testing.assert_allclose(
            np.asarray(got["fifo"])[s, idx],
            np.asarray(ref["fifo"])[s, idx],
            atol=2e-5,
            rtol=1e-4,
        )


def test_fused_accept_partial_feed(monkeypatch):
    """Hop-unaligned partial feeds exercise the phase roll + leftover carry."""
    S = 8
    chunk = 3200
    layout = FbankLayout.build(OPTS, chunk)
    waves = _streams(S, 7000, seed=3)
    sizes = [777, 3200, 1501, 1522]

    monkeypatch.setenv("APRIL_PALLAS", "0")
    ref = jax.vmap(lambda _: fbank_init(layout))(jnp.arange(S))
    a_ref = jax.jit(lambda s, w, n: fbank_accept_batch(layout, s, w, n))
    monkeypatch.setenv("APRIL_PALLAS", "1")
    got = jax.vmap(lambda _: fbank_init(layout))(jnp.arange(S))
    a_fused = jax.jit(lambda s, w, n: fbank_accept_batch(layout, s, w, n))

    o = 0
    for sz in sizes:
        w = np.zeros((S, chunk), np.float32)
        w[:, :sz] = waves[:, o : o + sz]
        o += sz
        n = jnp.full(S, sz, jnp.int32)
        ref = a_ref(ref, jnp.asarray(w), n)
        got = a_fused(got, jnp.asarray(w), n)

    np.testing.assert_array_equal(np.asarray(got["fifo_len"]), np.asarray(ref["fifo_len"]))
    np.testing.assert_allclose(
        np.asarray(got["leftover"]), np.asarray(ref["leftover"]), atol=1e-6
    )
    R = layout.fifo_rows
    for s in range(S):
        off, ln = int(ref["fifo_off"][s]), int(ref["fifo_len"][s])
        idx = [(off + i) % R for i in range(ln)]
        np.testing.assert_allclose(
            np.asarray(got["fifo"])[s, idx],
            np.asarray(ref["fifo"])[s, idx],
            atol=2e-5,
            rtol=1e-4,
        )


def test_i8_dft_kernel_within_budget():
    """int8-DFT variant (`logmel_rows_from_buf_i8`): exact two-plane int8
    sample split, two-level int8 matrix quantization. Error vs the f64-grade
    XLA path must stay inside the frontend's 2e-3 budget (the engine only
    enables it for int8-serving models, where the encoder's bf16 activation
    cast ~4e-3 dominates it anyway). Reference DSP: src/fbank.c:241-295."""
    from april_asr_tpu.frontend.fbank import _frame_dsp, _frames_from_buf
    from april_asr_tpu.ops.fbank_pallas import logmel_rows_from_buf_i8

    layout = FbankLayout.build(OPTS, 3200)
    S = 4
    L = layout.leftover_cap + layout.chunk
    rng = np.random.default_rng(7)
    # integer PCM16 samples scaled to f32: the engine's real input form
    pcm = rng.integers(-32768, 32768, (S, L)).astype(np.float32) / 32768.0
    buf = jnp.asarray(pcm)
    got = logmel_rows_from_buf_i8(layout, buf, block_s=4, interpret=True)
    frames = jax.vmap(lambda b: _frames_from_buf(layout, b))(buf)
    ref = jax.vmap(lambda f: _frame_dsp(layout, f))(frames)
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 2e-3, err


def test_i8_dft_accept_batch_flag():
    """`fbank_accept_batch(dft_i8=True)` produces rows matching the exact
    path within the budget and identical bookkeeping state."""
    layout = FbankLayout.build(OPTS, 3200)
    S = 8
    waves = _streams(S, 3200)
    pcm = np.round(waves * 32767).astype(np.float32) / 32768.0
    st0 = jax.vmap(lambda _: fbank_init(layout))(jnp.arange(S))
    n = jnp.full(S, 3200, jnp.int32)
    a = fbank_accept_batch(layout, st0, jnp.asarray(pcm), n)
    b = fbank_accept_batch(layout, st0, jnp.asarray(pcm), n, dft_i8=True)
    np.testing.assert_array_equal(np.asarray(a["fifo_len"]), np.asarray(b["fifo_len"]))
    np.testing.assert_array_equal(np.asarray(a["fifo_off"]), np.asarray(b["fifo_off"]))
    np.testing.assert_allclose(
        np.asarray(a["leftover"]), np.asarray(b["leftover"]), atol=1e-6
    )
    ln = int(np.asarray(a["fifo_len"])[0])
    np.testing.assert_allclose(
        np.asarray(a["fifo"])[:, :ln],
        np.asarray(b["fifo"])[:, :ln],
        atol=2e-3,
    )


def test_front_batch_matches_per_session():
    """`fbank_front_batch` fast path (uniform fifo_off -> one shared roll)
    and slow path (mixed offsets -> per-session one-hot read) must both
    reproduce the per-session `fbank_front` exactly."""
    from april_asr_tpu.frontend.fbank import fbank_front, fbank_front_batch

    layout = FbankLayout.build(OPTS, 3200)
    S, R, b = 6, layout.fifo_rows, OPTS.num_bins
    rng = np.random.default_rng(3)
    W = R + 1  # wider than the ring: the tail row must read as zeros
    for offs in ([5] * S, rng.integers(0, R, S).tolist()):
        st = {
            "fifo": jnp.asarray(rng.normal(0, 1, (S, R, b)).astype(np.float32)),
            "fifo_off": jnp.asarray(np.array(offs, np.int32)),
            "fifo_len": jnp.full((S,), R, jnp.int32),
        }
        got = jax.jit(lambda s: fbank_front_batch(layout, s, W))(st)
        ref = jax.vmap(
            lambda f, o: fbank_front(
                layout, {"fifo": f, "fifo_off": o}, W
            )
        )(st["fifo"], st["fifo_off"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)
