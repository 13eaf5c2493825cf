"""Conformer model family: streaming-vs-sequence parity, engine contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from april_asr_tpu.models.conformer import (
    ConformerDims,
    conformer_encoder_seq,
    conformer_encoder_step,
    init_conformer_params,
)

DIMS = ConformerDims(
    mel=80, segment_size=9, segment_step=4, d_model=32, heads=2, ffn=64,
    conv_kernel=4, att_context=5, joiner_dim=32, vocab=64, layers=2,
    context=2, decoder_groups=8, conv_channels=(4, 8, 8),
)


@pytest.fixture(scope="module")
def params():
    return init_conformer_params(jax.random.PRNGKey(0), DIMS)


def test_streaming_matches_sequence(params):
    """Step-by-step streaming (ring KV cache + conv state) must equal the
    full-sequence causal computation — including after the ring wraps
    (W > att_context)."""
    S, W = 3, 12  # W > att_context=5: exercises ring wraparound
    T = DIMS.segment_size + DIMS.segment_step * (W - 1)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(0, 0.5, (S, T, DIMS.mel)).astype(np.float32))

    ref = jax.jit(lambda p, m: conformer_encoder_seq(p, m, DIMS))(params, mel)

    (L, hw), (_, cw) = DIMS.state_shapes
    h = jnp.zeros((L, S, hw), jnp.float32)
    c = jnp.zeros((L, S, cw), jnp.float32)
    step = jax.jit(lambda p, x, h, c: conformer_encoder_step(p, x, h, c, DIMS))
    outs = []
    for t in range(W):
        win = mel[:, t * DIMS.segment_step : t * DIMS.segment_step + DIMS.segment_size]
        eout, h, c = step(params, win, h, c)
        outs.append(eout)
    got = jnp.stack(outs, axis=1)  # [S, W, J]

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_zero_state_is_fresh_session(params):
    """Engine slot reset = zero h/c; position counter and cache validity
    must restart cleanly (first frame attends only to itself)."""
    S = 2
    rng = np.random.default_rng(1)
    win = jnp.asarray(
        rng.normal(0, 0.5, (S, DIMS.segment_size, DIMS.mel)).astype(np.float32)
    )
    (L, hw), (_, cw) = DIMS.state_shapes
    h0 = jnp.zeros((L, S, hw), jnp.float32)
    c0 = jnp.zeros((L, S, cw), jnp.float32)
    step = jax.jit(lambda p, x, h, c: conformer_encoder_step(p, x, h, c, DIMS))
    e1, h1, c1 = step(params, win, h0, c0)
    # feeding garbage then resetting reproduces the fresh output exactly
    e_junk, h_j, c_j = step(params, win * 3.0, h0, c0)
    e2, _, _ = step(params, win, h0, c0)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    # position advanced
    assert float(c1[0, 0, -1]) == 1.0


def test_gated_recurrent_matches_step(params):
    """The engine fast path (batched embed + gated recurrent) must equal the
    plain step path where gate=True and keep state bit-identical where
    gate=False."""
    from april_asr_tpu.models.conformer import (
        conformer_encoder_embed,
        conformer_encoder_recurrent,
    )

    S = 6
    rng = np.random.default_rng(4)
    win = jnp.asarray(
        rng.normal(0, 0.5, (S, DIMS.segment_size, DIMS.mel)).astype(np.float32)
    )
    (L, hw), (_, cw) = DIMS.state_shapes
    h = jnp.asarray(rng.normal(0, 0.1, (L, S, hw)).astype(np.float32))
    c = jnp.abs(jnp.asarray(rng.normal(0, 0.1, (L, S, cw)).astype(np.float32)))
    gate = jnp.asarray([True, False, True, True, False, True])

    ref_e, ref_h, ref_c = conformer_encoder_step(params, win, h, c, DIMS)
    y = conformer_encoder_embed(params, win)
    got_e, got_h, got_c = conformer_encoder_recurrent(params, y, h, c, DIMS, gate)

    g = np.asarray(gate)
    np.testing.assert_array_equal(np.asarray(got_e)[g], np.asarray(ref_e)[g])
    np.testing.assert_array_equal(np.asarray(got_h)[:, g], np.asarray(ref_h)[:, g])
    np.testing.assert_array_equal(np.asarray(got_c)[:, g], np.asarray(ref_c)[:, g])
    # masked sessions: carried state untouched
    np.testing.assert_array_equal(np.asarray(got_h)[:, ~g], np.asarray(h)[:, ~g])
    np.testing.assert_array_equal(np.asarray(got_c)[:, ~g], np.asarray(c)[:, ~g])


def test_chunk_matches_per_frame(params):
    """The whole-chunk encoder (one ring pass per layer per chunk) must match
    the per-frame path on valid pulls and carry identical state — across
    ragged prefix masks, idle sessions, and ring wraparound."""
    from april_asr_tpu.models.conformer import (
        conformer_encoder_chunk,
        conformer_encoder_recurrent,
    )

    S, P = 4, 3  # P <= att_context=5
    rng = np.random.default_rng(7)
    (L, hw), (_, cw) = DIMS.state_shapes
    h_a = h_b = jnp.zeros((L, S, hw), jnp.float32)
    c_a = c_b = jnp.zeros((L, S, cw), jnp.float32)
    chunk = jax.jit(
        lambda p, y, h, c, can: conformer_encoder_chunk(p, y, h, c, DIMS, can)
    )
    frame = jax.jit(
        lambda p, y, h, c, g: conformer_encoder_recurrent(p, y, h, c, DIMS, g)
    )
    # per-(chunk, session) valid-pull counts; totals cross C=5 (wraparound)
    counts = np.array([[3, 2, 0, 3], [3, 3, 1, 2], [3, 0, 3, 3], [2, 3, 3, 1]])
    for r in range(4):
        y = jnp.asarray(rng.normal(0, 0.5, (P, S, DIMS.d_model)).astype(np.float32))
        can = jnp.asarray(np.arange(P)[:, None] < counts[r][None, :])
        e_chunk, h_a, c_a = chunk(params, y, h_a, c_a, can)
        es = []
        for j in range(P):
            e_j, h_b, c_b = frame(params, y[j], h_b, c_b, can[j])
            es.append(e_j)
        e_frame = jnp.stack(es)
        m = np.asarray(can)
        np.testing.assert_allclose(
            np.asarray(e_chunk)[m], np.asarray(e_frame)[m], atol=2e-4
        )
        np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b), atol=2e-4)
        np.testing.assert_allclose(np.asarray(c_a), np.asarray(c_b), atol=2e-4)


def test_conformer_runtime_in_engine(params):
    """The Conformer plugs into the batched engine via the standard
    3-function runtime contract; a full feed/tick/flush cycle runs and
    emits events."""
    from april_asr_tpu.engine import BatchEngine
    from april_asr_tpu.io.params import build_vocab_tables
    from april_asr_tpu.models.export import make_model_parameters
    from april_asr_tpu.models.loader import ModelRuntime, _fbank_opts_from_params
    from april_asr_tpu.models.lstm_transducer import (
        decoder_step,
        joiner_logits,
        precompute_decoder_tables,
    )
    from april_asr_tpu.testing import default_tokens

    weights = precompute_decoder_tables(dict(params), DIMS)
    mp = make_model_parameters(DIMS, default_tokens(DIMS.vocab))
    rt = ModelRuntime(
        name="conformer-test", description="", language="en",
        params=mp, fbank_opts=_fbank_opts_from_params(mp),
        vocab=build_vocab_tables(mp), dims=DIMS, kind="native",
        weights=weights,
        encoder_step=lambda w, x, h, c: conformer_encoder_step(w, x, h, c, DIMS),
        decoder_step=lambda w, ctx: decoder_step(w, ctx, DIMS),
        joiner=joiner_logits,
        state_shapes=DIMS.state_shapes,
    )
    S = 4
    eng = BatchEngine(rt, batch=S)
    streams = [[] for _ in range(S)]
    slots = [
        eng.alloc(lambda r, toks, i=i: streams[i].append((r, len(toks))))
        for i in range(S)
    ]
    rng = np.random.default_rng(2)
    audio = (rng.normal(0, 0.2, (S, 16000)) * 20000).astype(np.int16)
    for i, sl in enumerate(slots):
        eng.feed(sl, audio[i])
    while eng.tick():
        pass
    eng.flush(np.ones(S, bool))
    assert all(len(s) > 0 for s in streams)


def test_conformer_container_roundtrip(params, tmp_path):
    """save_april(native, arch=conformer) -> load_model -> engine runtime."""
    from april_asr_tpu.api import Model, Session
    from april_asr_tpu.models.export import make_model_parameters, save_april
    from april_asr_tpu.testing import default_tokens

    path = tmp_path / "conf.april"
    mp = make_model_parameters(DIMS, default_tokens(DIMS.vocab))
    save_april(str(path), DIMS, {k: np.asarray(v) for k, v in params.items()},
               mp, name="conf", form="native")
    m = Model(str(path))
    assert m.runtime.dims.att_context == DIMS.att_context
    assert m.runtime.state_shapes == DIMS.state_shapes
    calls = []
    s = Session(m, lambda r, t: calls.append(r))
    rng = np.random.default_rng(0)
    s.feed_pcm16((rng.normal(0, 0.2, 8000) * 20000).astype(np.int16).tobytes())
    s.flush()
    assert calls


def test_conformer_onnx_export_rejected(params):
    from april_asr_tpu.models.export import make_model_parameters, save_april
    from april_asr_tpu.testing import default_tokens

    mp = make_model_parameters(DIMS, default_tokens(DIMS.vocab))
    with pytest.raises(ValueError, match="conformer"):
        save_april("/tmp/x.april", DIMS, dict(params), mp, form="onnx")


def test_conformer_tp_sharding_matches_single_device(params):
    """Tensor-parallel conformer step over the data x model mesh must match
    single-device execution."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from april_asr_tpu.parallel import make_mesh, param_specs

    mesh = make_mesh(model_parallel=2)
    specs = param_specs(params)
    sharded = {
        k: jax.device_put(v, NamedSharding(mesh, specs[k])) for k, v in params.items()
    }
    S = 8
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        rng.normal(0, 0.5, (S, DIMS.segment_size, DIMS.mel)).astype(np.float32)
    )
    (L, hw), (_, cw) = DIMS.state_shapes
    h = jnp.asarray(rng.normal(0, 0.1, (L, S, hw)).astype(np.float32))
    c = jnp.zeros((L, S, cw), jnp.float32)
    step = jax.jit(lambda p, x, h, c: conformer_encoder_step(p, x, h, c, DIMS))

    ref_e, ref_h, ref_c = step(params, x, h, c)
    x_s = jax.device_put(x, NamedSharding(mesh, P("data")))
    got_e, got_h, got_c = step(sharded, x_s, h, c)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(ref_e), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h), atol=1e-4, rtol=1e-4)


def test_conformer_int8_chunk_matches_recurrent():
    """int8-quantized Conformer: the whole-chunk path and the per-pull
    recurrent path stay consistent under quantization (same per-row
    activation quant + exact int32 accumulation in both)."""
    import numpy as np

    from april_asr_tpu.models.conformer import (
        conformer_encoder_chunk,
        conformer_encoder_recurrent,
        init_conformer_params,
    )
    from april_asr_tpu.models.lstm_transducer import quantize_weights

    dims = DIMS
    params = quantize_weights(init_conformer_params(jax.random.PRNGKey(3), dims))
    assert "att_q_q8" in params
    P, S = 3, 4
    y = jax.random.normal(jax.random.PRNGKey(1), (P, S, dims.d_model), jnp.float32)
    h = jnp.zeros((dims.layers, S, dims.state_shapes[0][1]), jnp.float32)
    c = jnp.zeros((dims.layers, S, dims.state_shapes[1][1]), jnp.float32)
    can = jnp.ones((P, S), bool)

    eout_c, h_c, c_c = conformer_encoder_chunk(params, y, h, c, dims, can)

    h_r, c_r = h, c
    outs = []
    for p in range(P):
        e, h_r, c_r = conformer_encoder_recurrent(params, y[p], h_r, c_r, dims)
        outs.append(e)
    eout_r = jnp.stack(outs)
    np.testing.assert_allclose(
        np.asarray(eout_c), np.asarray(eout_r), rtol=5e-3, atol=5e-3
    )
    np.testing.assert_allclose(np.asarray(h_c), np.asarray(h_r), rtol=5e-3, atol=5e-3)


def test_conformer_int8_error_bounded():
    """Quantized vs f32 conformer chunk output: bounded relative error on
    realistic-scale weights."""
    import numpy as np

    from april_asr_tpu.models.conformer import (
        conformer_encoder_chunk,
        init_conformer_params,
    )
    from april_asr_tpu.models.lstm_transducer import quantize_weights

    dims = DIMS
    base = init_conformer_params(jax.random.PRNGKey(5), dims)
    qp = quantize_weights(base)
    P, S = 3, 4
    y = jax.random.normal(jax.random.PRNGKey(2), (P, S, dims.d_model), jnp.float32)
    h = jnp.zeros((dims.layers, S, dims.state_shapes[0][1]), jnp.float32)
    c = jnp.zeros((dims.layers, S, dims.state_shapes[1][1]), jnp.float32)
    can = jnp.ones((P, S), bool)
    e_q, _, _ = conformer_encoder_chunk(qp, y, h, c, dims, can)
    e_f, _, _ = conformer_encoder_chunk(base, y, h, c, dims, can)
    rel = float(
        np.abs(np.asarray(e_q) - np.asarray(e_f)).mean()
        / (np.abs(np.asarray(e_f)).mean() + 1e-9)
    )
    assert rel < 0.05, f"conformer int8 diverged: mean rel err {rel:.4f}"
