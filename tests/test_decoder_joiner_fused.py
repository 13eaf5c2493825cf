"""Fused decoder+joiner+argmax kernel (lazy-dout inner decode).

The engine's inner-decode iteration owes a dout refresh whenever the
previous iteration changed the decoder context; the fused path
(models/lstm_transducer.decoder_joiner_argmax, ops/joiner_pallas._dj_kernel)
performs that refresh inside the same kernel as the joiner matmul + greedy
argmax. Deferral must be value-equivalent to the reference's eager order
(aas_update_context runs the decoder immediately, src/april_session.c:181-196)
— these tests drive the full engine both ways and require IDENTICAL packed
event streams."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from april_asr_tpu.config import EngineConfig
from april_asr_tpu.engine import build_engine, init_engine_state
from april_asr_tpu.io.params import build_vocab_tables
from april_asr_tpu.models import lstm_transducer as M
from april_asr_tpu.models.export import make_model_parameters
from april_asr_tpu.models.loader import (
    ModelRuntime,
    _fbank_opts_from_params,
    _native_decoder_joiner,
    _native_joiner_argmax,
    _native_runtime_fns,
    _native_split_fns,
)
from april_asr_tpu.testing import default_tokens

# kernel-eligible dims (128-multiples) so the interpret-mode Pallas path runs
DIMS = M.TransducerDims(
    mel=80, segment_size=9, segment_step=4, d_model=128, hidden=128, ffn=128,
    joiner_dim=128, vocab=128, layers=2, context=2, decoder_groups=32,
    conv_channels=(4, 8, 8),
)
S = 128


def _runtime(fused: bool) -> ModelRuntime:
    params = M.init_transducer_params(jax.random.PRNGKey(0), DIMS)
    params["join_b"] = params["join_b"].at[0].add(1.5)  # sparse emissions
    params = M.precompute_decoder_tables(params, DIMS)
    mp = make_model_parameters(DIMS, default_tokens(DIMS.vocab))
    enc, dec, joi = _native_runtime_fns(DIMS)
    embed, recur, chunk = _native_split_fns()
    return ModelRuntime(
        name="dj", description="", language="en",
        params=mp, fbank_opts=_fbank_opts_from_params(mp),
        vocab=build_vocab_tables(mp), dims=DIMS, kind="native",
        weights=params, encoder_step=enc, decoder_step=dec, joiner=joi,
        state_shapes=((DIMS.layers, DIMS.d_model), (DIMS.layers, DIMS.hidden)),
        encoder_embed=embed, encoder_recurrent=recur, encoder_chunk=chunk,
        joiner_argmax=_native_joiner_argmax(mp.blank_id),
        decoder_joiner_argmax=(
            _native_decoder_joiner(mp.blank_id, DIMS) if fused else None
        ),
    )


def _drive(rt, steps=4, flush=True):
    prog = build_engine(rt, batch=S, cfg=EngineConfig(chunk_samples=3200))
    state = init_engine_state(prog)
    rng = np.random.default_rng(5)
    evs = []
    for i in range(steps):
        audio = jnp.asarray(
            (rng.normal(0, 0.2, size=(S, 3200)) * 20000).astype(np.int16)
        )
        n = jnp.full(S, 3200, jnp.int32)
        state, events = prog.step(rt.weights, state, audio, n)
        evs.append(np.asarray(events.dense))
    if flush:
        state, events = prog.flush(rt.weights, state, jnp.ones(S, bool))
        evs.append(np.asarray(events.dense))
    return evs


def test_lazy_dout_engine_equivalence(monkeypatch):
    """Same audio through the eager path (joiner_argmax + eager decoder
    refresh) and the lazy fused path: packed event streams must match
    element-for-element, including through flush."""
    monkeypatch.setenv("APRIL_PALLAS", "0")  # XLA both sides: exact compare
    ev_eager = _drive(_runtime(fused=False))
    ev_lazy = _drive(_runtime(fused=True))
    assert len(ev_eager) == len(ev_lazy)
    for a, b in zip(ev_eager, ev_lazy):
        np.testing.assert_array_equal(a, b)


def test_fused_kernel_matches_xla_fallback():
    """decoder_joiner_argmax: interpret-mode Pallas kernel vs the XLA
    fallback — identical argmax decisions and refreshed dout on f32
    weights (one-hot row selection is exact)."""
    params = M.precompute_decoder_tables(
        M.init_transducer_params(jax.random.PRNGKey(2), DIMS), DIMS
    )
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.integers(0, DIMS.vocab, size=(S, 2)), jnp.int32)
    nd = jnp.asarray(rng.random(S) < 0.5)
    dout = jnp.asarray(rng.normal(size=(S, DIMS.joiner_dim)), jnp.float32)
    eout = jnp.asarray(rng.normal(size=(S, DIMS.joiner_dim)), jnp.float32)

    import os

    os.environ["APRIL_PALLAS"] = "1"
    try:
        k = M.decoder_joiner_argmax(params, ctx, nd, dout, eout, 0, DIMS)
    finally:
        os.environ.pop("APRIL_PALLAS", None)
    with M.pallas_disabled():
        x = M.decoder_joiner_argmax(params, ctx, nd, dout, eout, 0, DIMS)
    np.testing.assert_array_equal(np.asarray(k[0]), np.asarray(x[0]))  # idx
    np.testing.assert_allclose(k[1], x[1], rtol=1e-5, atol=1e-5)  # max val
    np.testing.assert_allclose(k[2], x[2], rtol=1e-5, atol=1e-5)  # blank val
    np.testing.assert_allclose(k[3], x[3], rtol=1e-5, atol=1e-5)  # dout'


def test_fused_kernel_matches_xla_fallback_bf16():
    """Same parity under bf16 serving weights (advisor r2): the dec_table
    one-hot contraction must stay f32 (exact row selection, matching the
    fallback's f32 gather) even when dec_proj/join are bf16; the bf16
    matmuls themselves agree within a bf16 ulp of activation noise."""
    params = M.precompute_decoder_tables(
        M.init_transducer_params(jax.random.PRNGKey(2), DIMS), DIMS
    )
    params = M.cast_weights(params, jnp.bfloat16)
    rng = np.random.default_rng(1)
    ctx = jnp.asarray(rng.integers(0, DIMS.vocab, size=(S, 2)), jnp.int32)
    nd = jnp.asarray(rng.random(S) < 0.5)
    dout = jnp.asarray(rng.normal(size=(S, DIMS.joiner_dim)), jnp.float32)
    eout = jnp.asarray(rng.normal(size=(S, DIMS.joiner_dim)), jnp.float32)

    import os

    os.environ["APRIL_PALLAS"] = "1"
    try:
        k = M.decoder_joiner_argmax(params, ctx, nd, dout, eout, 0, DIMS)
    finally:
        os.environ.pop("APRIL_PALLAS", None)
    with M.pallas_disabled():
        x = M.decoder_joiner_argmax(params, ctx, nd, dout, eout, 0, DIMS)
    # dout': the decoder refresh feeds bf16 matmuls — tolerance one bf16 ulp
    np.testing.assert_allclose(k[3], x[3], rtol=1e-2, atol=1e-2)
    # argmax decisions: allow disagreement only where the two top logits are
    # within bf16 noise of each other; values must still be close
    np.testing.assert_allclose(k[1], x[1], rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(k[2], x[2], rtol=1e-2, atol=1e-2)
    agree = np.mean(np.asarray(k[0]) == np.asarray(x[0]))
    assert agree > 0.95, f"argmax agreement {agree}"


def test_fused_kernel_dispatches(monkeypatch):
    import april_asr_tpu.ops.joiner_pallas as JP

    called = {}
    orig = JP.decoder_joiner_argmax_fused

    def spy(*a, **kw):
        called["dj"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(JP, "decoder_joiner_argmax_fused", spy)
    monkeypatch.setenv("APRIL_PALLAS", "1")
    params = M.precompute_decoder_tables(
        M.init_transducer_params(jax.random.PRNGKey(2), DIMS), DIMS
    )
    ctx = jnp.zeros((S, 2), jnp.int32)
    nd = jnp.zeros(S, bool)
    dout = jnp.zeros((S, DIMS.joiner_dim), jnp.float32)
    eout = jnp.zeros((S, DIMS.joiner_dim), jnp.float32)
    M.decoder_joiner_argmax(params, ctx, nd, dout, eout, 0, DIMS)
    assert called.get("dj")
