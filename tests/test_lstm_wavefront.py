"""Parity: wavefront slab kernel vs the shipped layer-major int8 path.

The wavefront kernel (ops/lstm_wavefront_pallas.py) reorders the (layer,
timestep) schedule but keeps the exact op order and per-row quantization of
`_rec_stream2_kernel_i8` + `_ffn_norm_kernel_i8`, so outputs must agree to
f32 accumulation tolerance (the schedules contract identical dot products;
only instruction interleaving differs).

Reference semantics under test: the 12-layer LSTM encoder chunk step
(src/april_session.c:131-148 run per 40 ms frame in the reference).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from april_asr_tpu.models import lstm_transducer as M
from april_asr_tpu.ops.lstm_wavefront_pallas import stack_wavefront_i8

P, S, d, H, F, L = 7, 16, 16, 32, 24, 4


def _setup(seed=0):
    dims = M.TransducerDims(
        layers=L, d_model=d, hidden=H, ffn=F, mel=8, vocab=32,
    )
    params = M.init_transducer_params(jax.random.PRNGKey(seed), dims)
    params = M.quantize_weights(params)
    k = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
    x = jax.random.normal(k[0], (P, S, d), jnp.float32) * 0.5
    h = jax.random.normal(k[1], (L, S, d), jnp.float32) * 0.1
    c = jax.random.normal(k[2], (L, S, H), jnp.float32) * 0.1
    return params, x, h, c


def _ref_stack(params, x, h, c, n_pulls):
    """Layer-major oracle with the same quant/op order (XLA q8 path)."""
    gate = None
    if n_pulls is not None:
        gate = (jnp.arange(P)[:, None] < n_pulls[None, :]).astype(jnp.float32)
    return M._lstm_stack_chunk_q8(params, x, h, c, gate)


@pytest.mark.parametrize("slab", [2, 4])
@pytest.mark.parametrize("gated", [False, True])
def test_wavefront_matches_layer_major(slab, gated):
    params, x, h, c = _setup()
    n_pulls = None
    if gated:
        n_pulls = jnp.asarray(np.random.default_rng(0).integers(0, P + 1, S),
                              jnp.int32)
    y0, h0, c0 = _ref_stack(params, x, h, c, n_pulls)
    y1, h1, c1 = stack_wavefront_i8(
        params, x, h, c, n_pulls, slab=slab, block_s=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=2e-4, rtol=2e-4)


def test_wavefront_gating_freezes_state():
    """Rows with n_pulls=k must carry exactly the state after k steps: a
    session masked at n=k matches an unmasked run over a k-pull chunk."""
    params, x, h, c = _setup(seed=3)
    k = 3
    n_pulls = jnp.full((S,), k, jnp.int32)
    _, h1, c1 = stack_wavefront_i8(
        params, x, h, c, n_pulls, slab=2, block_s=8, interpret=True
    )
    _, h2, c2 = stack_wavefront_i8(
        params, x[:k], h, c, None, slab=2, block_s=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)
