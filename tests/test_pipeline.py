"""Pipeline-parallel encoder: staged execution over the CPU mesh must match
the sequential layer stack exactly (same inputs, same order — only the
schedule changes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from april_asr_tpu.models import TransducerDims, init_transducer_params
from april_asr_tpu.models.lstm_transducer import _lstm_stack_step, pallas_disabled
from april_asr_tpu.parallel.pipeline import pipeline_encoder_seq

DIMS = TransducerDims(
    mel=80, segment_size=9, segment_step=4, d_model=32, hidden=64, ffn=64,
    joiner_dim=32, vocab=64, layers=4, context=2, decoder_groups=8,
    conv_channels=(4, 8, 8),
)


@pytest.mark.parametrize("ns", [2, 4])
def test_pipeline_matches_sequential(ns):
    params = init_transducer_params(jax.random.PRNGKey(0), DIMS)
    S, Pn, L = 4, 6, DIMS.layers
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.normal(0, 0.3, (Pn, S, DIMS.d_model)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(0, 0.1, (L, S, DIMS.d_model)).astype(np.float32))
    c0 = jnp.asarray(rng.normal(0, 0.1, (L, S, DIMS.hidden)).astype(np.float32))

    # sequential reference: pull-by-pull through the full stack
    def seq(params, y0, h, c):
        ys = []
        with pallas_disabled():
            for t in range(Pn):
                y, h, c = _lstm_stack_step(params, y0[t], h, c)
                ys.append(y)
        return jnp.stack(ys), h, c

    ref_ys, ref_h, ref_c = jax.jit(seq, static_argnums=())(params, y0, h0, c0)

    mesh = Mesh(np.array(jax.devices()[:ns]), ("stage",))
    got_ys, got_h, got_c = jax.jit(
        lambda p, y, h, c: pipeline_encoder_seq(p, y, h, c, mesh)
    )(params, y0, h0, c0)

    np.testing.assert_allclose(np.asarray(got_ys), np.asarray(ref_ys), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c), atol=1e-5)
