"""Sequence-parallel (Ulysses) Conformer encoder == unsharded encoder.

Head-sharded all-to-all attention + ppermute conv halo over a `seq` mesh
axis (SURVEY.md §2.4 sequence/context parallelism for the attention
family)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from april_asr_tpu.models.conformer import (
    ConformerDims,
    conformer_encoder_seq,
    init_conformer_params,
)
from april_asr_tpu.parallel.ulysses import conformer_encoder_seq_sp

DIMS = ConformerDims(
    d_model=32, heads=4, ffn=64, conv_kernel=4, att_context=8,
    joiner_dim=32, vocab=64, layers=2, decoder_groups=8,
    conv_channels=(4, 8, 8),
)


@pytest.mark.parametrize("seq_shards", [2, 4])
def test_sp_encoder_matches_unsharded(seq_shards):
    devs = np.array(jax.devices()[: seq_shards * 2]).reshape(2, seq_shards)
    mesh = Mesh(devs, ("data", "seq"))

    params = init_conformer_params(jax.random.PRNGKey(0), DIMS)
    rng = np.random.default_rng(0)
    S = 2
    T = DIMS.segment_size + DIMS.segment_step * (4 * seq_shards - 1)
    mel = jnp.asarray(rng.normal(size=(S, T, DIMS.mel)).astype(np.float32))

    ref = jax.jit(lambda p, m: conformer_encoder_seq(p, m, DIMS))(params, mel)
    got = jax.jit(
        lambda p, m: conformer_encoder_seq_sp(p, m, DIMS, mesh, "seq")
    )(params, mel)
    W = ref.shape[1]
    np.testing.assert_allclose(
        np.asarray(got[:, :W]), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


def test_sp_encoder_pads_ragged_windows():
    """W not divisible by the shard count: padded windows don't disturb the
    real rows."""
    devs = np.array(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("data", "seq"))
    params = init_conformer_params(jax.random.PRNGKey(1), DIMS)
    rng = np.random.default_rng(1)
    S = 1
    T = DIMS.segment_size + DIMS.segment_step * 5  # W = 6, pads to 8
    mel = jnp.asarray(rng.normal(size=(S, T, DIMS.mel)).astype(np.float32))
    ref = conformer_encoder_seq(params, mel, DIMS)
    got = conformer_encoder_seq_sp(params, mel, DIMS, mesh, "seq")
    np.testing.assert_allclose(
        np.asarray(got[:, : ref.shape[1]]), np.asarray(ref), atol=2e-4, rtol=2e-4
    )
