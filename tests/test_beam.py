"""Batched RNN-T beam search tests (framework extension; SURVEY.md §7 step 7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from april_asr_tpu.decode.beam import BeamConfig, beam_search, greedy_offline
from april_asr_tpu.models import (
    TransducerDims,
    encoder_seq,
    init_streaming_state,
    init_transducer_params,
)
from april_asr_tpu.models.lstm_transducer import (
    decoder_step as dec_step,
    joiner_logits,
)

DIMS = TransducerDims(
    mel=80, segment_size=9, segment_step=4, d_model=32, hidden=48, ffn=64,
    joiner_dim=32, vocab=40, layers=2, context=2, decoder_groups=8,
    conv_channels=(4, 8, 8),
)
BLANK = 0


@pytest.fixture(scope="module")
def setup():
    params = init_transducer_params(jax.random.PRNGKey(7), DIMS)
    # make emissions non-trivial but sparse-ish
    params["join_b"] = params["join_b"].at[BLANK].add(1.5)
    S, T = 3, 9 + 4 * 11  # 12 windows
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(S, T, DIMS.mel)).astype(np.float32))
    h, c = init_streaming_state(DIMS, S)
    eouts, _, _ = encoder_seq(params, mel, h, c, DIMS)
    W = eouts.shape[1]
    mask = jnp.ones((S, W), bool)

    def dec(w, ctx):
        return dec_step(w, ctx, DIMS)

    return params, eouts, mask, dec


def test_beam1_matches_greedy(setup):
    params, eouts, mask, dec = setup
    gt, gl = jax.jit(
        lambda w, e, m: greedy_offline(w, e, m, dec, joiner_logits, DIMS.context, BLANK)
    )(params, eouts, mask)
    bt, bl, bs = jax.jit(
        lambda w, e, m: beam_search(
            w, e, m, dec, joiner_logits, DIMS.context, BLANK, BeamConfig(beam=1)
        )
    )(params, eouts, mask)
    np.testing.assert_array_equal(np.asarray(gl), np.asarray(bl))
    for s in range(gl.shape[0]):
        n = int(gl[s])
        np.testing.assert_array_equal(np.asarray(gt[s, :n]), np.asarray(bt[s, :n]))


def test_wider_beam_never_worse(setup):
    params, eouts, mask, dec = setup
    scores = []
    for K in (1, 2, 4):
        _, _, s = jax.jit(
            lambda w, e, m, K=K: beam_search(
                w, e, m, dec, joiner_logits, DIMS.context, BLANK, BeamConfig(beam=K)
            )
        )(params, eouts, mask)
        scores.append(np.asarray(s))
    assert (scores[1] >= scores[0] - 1e-4).all(), (scores[0], scores[1])
    assert (scores[2] >= scores[1] - 1e-4).all(), (scores[1], scores[2])


def test_frame_mask_stops_decode(setup):
    params, eouts, mask, dec = setup
    half = mask.at[:, eouts.shape[1] // 2 :].set(False)
    t_full, l_full, _ = beam_search(
        params, eouts, mask, dec, joiner_logits, DIMS.context, BLANK, BeamConfig(beam=2)
    )
    t_half, l_half, _ = beam_search(
        params, eouts, half, dec, joiner_logits, DIMS.context, BLANK, BeamConfig(beam=2)
    )
    assert (np.asarray(l_half) <= np.asarray(l_full)).all()


def test_jit_and_shapes(setup):
    params, eouts, mask, dec = setup
    f = jax.jit(
        lambda w, e, m: beam_search(
            w, e, m, dec, joiner_logits, DIMS.context, BLANK, BeamConfig(beam=4)
        )
    )
    t, l, s = f(params, eouts, mask)
    assert t.shape == (eouts.shape[0], BeamConfig().max_tokens)
    assert l.shape == (eouts.shape[0],)
    assert np.isfinite(np.asarray(s)).all()
