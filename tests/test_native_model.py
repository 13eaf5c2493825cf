"""Native model unit tests: shapes, streaming-vs-offline equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from april_asr_tpu.models import (
    TransducerDims,
    encoder_seq,
    encoder_step,
    init_streaming_state,
    init_transducer_params,
)

DIMS = TransducerDims(
    mel=80, segment_size=9, segment_step=4, d_model=32, hidden=48, ffn=64,
    joiner_dim=32, vocab=40, layers=3, context=2, decoder_groups=8,
    conv_channels=(4, 8, 8),
)


def test_shapes_and_subsample_t():
    assert DIMS.subsampled_t == 1
    assert DIMS.conv_freq_out == 19


def test_streaming_equals_offline():
    """encoder_seq over a [S, T, mel] utterance must equal repeated
    encoder_step over sliding 9-frame windows with step 4 (the windowing the
    fbank FIFO produces, fbank.c:327-349)."""
    rng = jax.random.PRNGKey(0)
    params = init_transducer_params(rng, DIMS)
    S, T = 2, 9 + 4 * 5  # 6 windows
    mel = jax.random.normal(jax.random.PRNGKey(1), (S, T, DIMS.mel))
    h0, c0 = init_streaming_state(DIMS, S)

    eouts_seq, h_seq, c_seq = encoder_seq(params, mel, h0, c0, DIMS)
    assert eouts_seq.shape == (S, 6, DIMS.joiner_dim)

    h, c = h0, c0
    outs = []
    for w in range(6):
        x = mel[:, w * 4 : w * 4 + 9, :]
        eout, h, c = encoder_step(params, x, h, c)
        outs.append(eout)
    eouts_step = jnp.stack(outs, axis=1)

    np.testing.assert_allclose(
        np.asarray(eouts_seq), np.asarray(eouts_step), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(h_seq), np.asarray(h), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c_seq), np.asarray(c), atol=1e-5, rtol=1e-5)


def test_jit_and_vmap_compose():
    params = init_transducer_params(jax.random.PRNGKey(0), DIMS)
    S = 4
    x = jax.random.normal(jax.random.PRNGKey(2), (S, 9, DIMS.mel))
    h, c = init_streaming_state(DIMS, S)
    eout, h2, c2 = jax.jit(encoder_step)(params, x, h, c)
    assert eout.shape == (S, DIMS.joiner_dim)
    assert h2.shape == (DIMS.layers, S, DIMS.d_model)
    assert c2.shape == (DIMS.layers, S, DIMS.hidden)
    assert not np.any(np.isnan(np.asarray(eout)))


def test_decoder_table_path_matches_grouped_conv():
    """precompute_decoder_tables is an exact linear decomposition of the
    grouped context conv — same dout for every context, not an approximation."""
    from april_asr_tpu.models.lstm_transducer import (
        decoder_step,
        precompute_decoder_tables,
    )

    params = init_transducer_params(jax.random.PRNGKey(3), DIMS)
    rng = np.random.default_rng(0)
    ctx = rng.integers(0, DIMS.vocab, size=(64, DIMS.context)).astype(np.int32)
    ref = decoder_step(params, jnp.asarray(ctx), DIMS)
    fast = decoder_step(precompute_decoder_tables(params, DIMS), jnp.asarray(ctx), DIMS)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_chunk_matches_per_pull_recurrent():
    """encoder_chunk (layer-major whole-chunk) must match scanning
    encoder_recurrent pull-by-pull, including prefix participation masks:
    masked (pull, session) cells keep carried h/c."""
    from april_asr_tpu.models import encoder_chunk
    from april_asr_tpu.models.lstm_transducer import encoder_recurrent

    params = init_transducer_params(jax.random.PRNGKey(3), DIMS)
    S, P = 3, 5
    y = jax.random.normal(jax.random.PRNGKey(4), (P, S, DIMS.d_model))
    h0, c0 = init_streaming_state(DIMS, S)
    # per-session prefix masks: session 0 pulls all 5, session 1 pulls 2,
    # session 2 pulls none
    n_pulls = jnp.array([5, 2, 0])
    can = jnp.arange(P)[:, None] < n_pulls[None, :]  # [P, S]

    eouts_c, h_c, c_c = jax.jit(encoder_chunk)(params, y, h0, c0, can)
    assert eouts_c.shape == (P, S, DIMS.joiner_dim)

    h, c = h0, c0
    outs = []
    for i in range(P):
        eout, h, c = encoder_recurrent(params, y[i], h, c, can[i])
        outs.append(eout)
    eouts_r = jnp.stack(outs, axis=0)

    live = np.asarray(can)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(eouts_c) * live, np.asarray(eouts_r) * live,
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(h_c), np.asarray(h), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c_c), np.asarray(c), atol=1e-5, rtol=1e-5)


def test_chunk_ungated_matches_gated_all_true():
    from april_asr_tpu.models import encoder_chunk

    params = init_transducer_params(jax.random.PRNGKey(5), DIMS)
    S, P = 2, 4
    y = jax.random.normal(jax.random.PRNGKey(6), (P, S, DIMS.d_model))
    h0, c0 = init_streaming_state(DIMS, S)
    a = jax.jit(encoder_chunk)(params, y, h0, c0, jnp.ones((P, S), bool))
    b = jax.jit(lambda p, y, h, c: encoder_chunk(p, y, h, c))(params, y, h0, c0)
    for x, z in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(z), atol=1e-6)
