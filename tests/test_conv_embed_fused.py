"""Fused whole-front conv-embed kernel vs the stacked-window XLA path.

Runs interpreted on CPU (conftest forces JAX_PLATFORMS=cpu); on TPU the same
kernel compiles via Mosaic. The kernel's full-buffer conv1 + per-window edge
corrections must reproduce the per-window zero-pad semantics of
`conv_subsample` exactly (ops/conv_embed_pallas.py module docstring;
reference geometry: april_model.h:35-41 9-frame segments).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from april_asr_tpu.models import TransducerDims, init_transducer_params
from april_asr_tpu.models.lstm_transducer import (
    conv_subsample,
    encoder_embed_front,
)
from april_asr_tpu.ops.conv_embed_pallas import (
    conv_embed_from_front,
    front_embed_supported,
)

DIMS = TransducerDims()
PARAMS = init_transducer_params(jax.random.PRNGKey(0), DIMS)


def _ref_embed(front, P, step, seg):
    windows = jnp.stack(
        [front[:, j * step : j * step + seg] for j in range(P)]
    )
    S = front.shape[0]
    return conv_subsample(
        PARAMS, windows.reshape(P * S, seg, front.shape[2])
    )[:, 0, :].reshape(P, S, -1)


@pytest.mark.parametrize("S,P", [(8, 27), (4, 5), (8, 1)])
def test_front_embed_matches_stacked_windows(S, P):
    seg, mel, step = DIMS.segment_size, DIMS.mel, 4
    W = (P - 1) * step + seg
    assert front_embed_supported(seg, mel, P, step, W, S, block_s=4)
    front = jax.random.normal(jax.random.PRNGKey(1), (S, W, mel), jnp.float32)
    ref = _ref_embed(front, P, step, seg)
    got = conv_embed_from_front(
        PARAMS, front, P=P, step=step, seg=seg, block_s=4, interpret=True
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-2, rtol=0
    )


def test_edge_correction_is_what_distinguishes_windows():
    """The per-window zero pad genuinely differs from a naive full-buffer
    conv — guard that the test above can't pass vacuously."""
    S, P, step, seg, mel = 4, 5, 4, DIMS.segment_size, DIMS.mel
    W = (P - 1) * step + seg
    front = jax.random.normal(jax.random.PRNGKey(2), (S, W, mel), jnp.float32)
    ref = _ref_embed(front, P, step, seg)
    # a wrong "embed" that ignores per-window padding: embed the middle
    # window rows without the zero-pad edges by shifting the window by one
    shifted = jnp.stack(
        [front[:, j * step + 1 : j * step + 1 + seg] for j in range(P - 1)]
    )
    wrong = conv_subsample(
        PARAMS, shifted.reshape((P - 1) * S, seg, mel)
    )[:, 0, :].reshape(P - 1, S, -1)
    assert float(jnp.max(jnp.abs(ref[: P - 1] - wrong))) > 1e-3


def test_runtime_hook_gates_on_geometry(monkeypatch):
    monkeypatch.setenv("APRIL_PALLAS", "1")
    # the conv-embed kernels are opt-in while the Mosaic compile hang is
    # unresolved (models/lstm_transducer.encoder_embed_front); this test
    # covers the hook's geometry gating, so enable them explicitly
    monkeypatch.setenv("APRIL_CONV_EMBED_KERNEL", "1")
    S, P, step = 4, 5, 4
    seg, mel = DIMS.segment_size, DIMS.mel
    W = (P - 1) * step + seg
    front = jax.random.normal(jax.random.PRNGKey(3), (S, W, mel), jnp.float32)
    got = encoder_embed_front(PARAMS, front, P, step)
    assert got is not None and got.shape == (P, S, DIMS.d_model)
    ref = _ref_embed(front, P, step, seg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)
    # unsupported geometry (implied seg = W-1-(P-1)*step is even) -> None
    frontbad = front[:, :-1]
    assert encoder_embed_front(PARAMS, frontbad, P, step) is None
    # pallas disabled -> None
    monkeypatch.setenv("APRIL_PALLAS", "0")
    assert encoder_embed_front(PARAMS, front, P, step) is None

@pytest.mark.parametrize("S,P", [(8, 27), (4, 5), (8, 1)])
def test_windowed_kernel_matches_stacked_windows(S, P):
    """`conv_embed_windows` (the product path: one window per grid step —
    compile-safe at serving P, unlike the whole-front body) must match the
    stacked-window XLA reference to the same tolerance."""
    from april_asr_tpu.ops.conv_embed_pallas import conv_embed_windows

    seg, mel, step = DIMS.segment_size, DIMS.mel, 4
    W = (P - 1) * step + seg
    front = jax.random.normal(jax.random.PRNGKey(4), (S, W, mel), jnp.float32)
    ref = _ref_embed(front, P, step, seg)
    got = conv_embed_windows(
        PARAMS, front, P=P, step=step, seg=seg, block_s=4, interpret=True
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-2, rtol=0
    )


def test_windowed_matches_whole_front_exactly():
    """Both kernels implement identical per-window math (same bf16 rounding
    points), so they agree bit-for-bit where both compile."""
    from april_asr_tpu.ops.conv_embed_pallas import conv_embed_windows

    S, P, step, seg, mel = 8, 5, 4, DIMS.segment_size, DIMS.mel
    W = (P - 1) * step + seg
    front = jax.random.normal(jax.random.PRNGKey(5), (S, W, mel), jnp.float32)
    a = conv_embed_from_front(
        PARAMS, front, P=P, step=step, seg=seg, block_s=4, interpret=True
    )
    b = conv_embed_windows(
        PARAMS, front, P=P, step=step, seg=seg, block_s=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=0)
