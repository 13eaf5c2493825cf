"""Data-parallel train step: explicit shard_map with ONE collective.

Pins the fix for the XLA:CPU rendezvous abort (see make_train_step
docstring): on a data-only mesh the step must (a) match the GSPMD-inferred
step numerically and (b) compile to exactly one all-reduce, so the CPU thunk
executor can never split shards across two concurrent rendezvous.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from april_asr_tpu.models import TransducerDims, init_transducer_params
from april_asr_tpu.parallel import make_mesh, shard_batch, shard_params
from april_asr_tpu.train import make_train_step

DIMS = TransducerDims(
    mel=16, segment_size=9, segment_step=4, d_model=16, hidden=32, ffn=32,
    joiner_dim=16, vocab=24, layers=2, context=2, decoder_groups=4,
    conv_channels=(2, 4, 4),
)


def _batch(rng, B=8, T=21, U=3):
    return {
        "mel": rng.normal(size=(B, T, DIMS.mel)).astype(np.float32),
        "labels": rng.integers(1, DIMS.vocab, size=(B, U)).astype(np.int32),
        "frame_lens": np.full(B, 4, np.int32),
        "label_lens": np.full(B, U, np.int32),
    }


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh(model_parallel=1, devices=jax.devices()[:8])
    params = init_transducer_params(jax.random.PRNGKey(0), DIMS)
    params = shard_params(params, mesh)
    batch = {
        k: shard_batch(v, mesh)
        for k, v in _batch(np.random.default_rng(0)).items()
    }
    return mesh, params, batch


def test_matches_gspmd_step(setup):
    mesh, params, batch = setup
    init_g, step_g = make_train_step(DIMS, blank_id=0)  # GSPMD reference
    init_s, step_s = make_train_step(DIMS, blank_id=0, mesh=mesh)

    sg, lg = jax.jit(step_g)(init_g(params), batch)
    ss, ls = jax.jit(step_s)(init_s(params), batch)

    np.testing.assert_allclose(float(lg), float(ls), rtol=1e-5)
    for k in sg.params:
        np.testing.assert_allclose(
            np.asarray(sg.params[k]), np.asarray(ss.params[k]),
            rtol=2e-4, atol=2e-6, err_msg=k,
        )


def test_exactly_one_collective(setup):
    mesh, params, batch = setup
    init_s, step_s = make_train_step(DIMS, blank_id=0, mesh=mesh)
    state = init_s(params)
    compiled = jax.jit(step_s).lower(state, batch).compile()
    hlo = compiled.as_text()
    n_collectives = len(
        re.findall(r"\b(all-reduce|all-gather|reduce-scatter|all-to-all)\b", hlo)
    )
    # one psum of the flat [grads; loss] vector; XLA may emit the op plus a
    # start/done pair — count distinct op names conservatively via starts
    starts = len(re.findall(r" all-reduce(?:-start)?\(", hlo))
    assert starts <= 1, f"expected <=1 all-reduce, found {starts}"
    assert n_collectives >= 1, "expected the psum to survive compilation"
