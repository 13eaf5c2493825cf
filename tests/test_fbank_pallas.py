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
