"""Streaming beam search: engine wiring, offline equivalence, recombination.

VERDICT task: wire decode/beam.py into the batched engine as an alternative
decode mode (per-session K-hypothesis state in HBM, PARTIAL = best
hypothesis prefix) and recombine identical histories in the beam."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from april_asr_tpu.decode.beam import (
    NEG_INF,
    BeamConfig,
    recombine_identical,
)
from april_asr_tpu.decode.scalar import RESULT_FINAL, RESULT_PARTIAL
from april_asr_tpu.engine.beam_engine import BeamEngine
from april_asr_tpu.io.params import build_vocab_tables
from april_asr_tpu.models import TransducerDims, init_transducer_params
from april_asr_tpu.models.export import make_model_parameters
from april_asr_tpu.models.loader import (
    ModelRuntime,
    _fbank_opts_from_params,
    _native_runtime_fns,
)
from april_asr_tpu.testing import default_tokens

DIMS = TransducerDims(
    mel=80, segment_size=9, segment_step=4, d_model=32, hidden=64, ffn=64,
    joiner_dim=32, vocab=64, layers=2, context=2, decoder_groups=8,
    conv_channels=(4, 8, 8),
)


@pytest.fixture(scope="module")
def rt():
    params = init_transducer_params(jax.random.PRNGKey(0), DIMS)
    mp = make_model_parameters(DIMS, default_tokens(DIMS.vocab))
    enc, dec, joi = _native_runtime_fns(DIMS)
    return ModelRuntime(
        name="beam", description="", language="en", params=mp,
        fbank_opts=_fbank_opts_from_params(mp), vocab=build_vocab_tables(mp),
        dims=DIMS, kind="native", weights=params, encoder_step=enc,
        decoder_step=dec, joiner=joi,
        state_shapes=((DIMS.layers, DIMS.d_model), (DIMS.layers, DIMS.hidden)),
    )


def _audio(seed, n=16000):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    x = 0.3 * np.sin(2 * np.pi * 300 * t) + rng.normal(0, 0.1, n)
    return (np.clip(x, -1, 1) * 20000).astype(np.int16)


def test_recombine_identical_merges_mass():
    # hyps 0 and 2 share the history [5, 7]; hyp 1 differs; hyp 3 is dead
    tokens = jnp.asarray(
        [[[5, 7, 0, 0], [5, 9, 0, 0], [5, 7, 0, 0], [0, 0, 0, 0]]],
        jnp.int32,
    )
    lengths = jnp.asarray([[2, 2, 2, 0]], jnp.int32)
    scores = jnp.asarray([[-1.0, -2.0, -1.5, float(NEG_INF)]], jnp.float32)
    state = {
        "tokens": tokens, "lengths": lengths, "scores": scores,
        "context": jnp.zeros((1, 4, 2), jnp.int32),
        "dout": jnp.zeros((1, 4, 8)),
    }
    out = recombine_identical(state)
    s = np.asarray(out["scores"][0])
    # representative 0 absorbed hyp 2: logaddexp(-1.0, -1.5)
    np.testing.assert_allclose(s[0], np.logaddexp(-1.0, -1.5), rtol=1e-6)
    np.testing.assert_allclose(s[1], -2.0, rtol=1e-6)  # distinct: untouched
    assert s[2] <= float(NEG_INF)  # merged member freed
    # histories/context unchanged
    np.testing.assert_array_equal(np.asarray(out["tokens"]), np.asarray(tokens))


def test_session_beam_api(rt, tmp_path):
    """Session(..., beam=4) produces PARTIAL/FINAL callbacks end-to-end
    through the public API."""
    from april_asr_tpu.api import Model, Result, Session
    from april_asr_tpu.testing import FixtureConfig, write_test_april

    pytest.importorskip("torch")
    path = tmp_path / "beam_fixture.april"
    write_test_april(path, FixtureConfig())
    model = Model(path)

    calls = []
    sess = Session(
        model, lambda r, toks: calls.append((r, "".join(t.token for t in toks))),
        beam=4,
    )
    audio = _audio(9)
    for off in range(0, len(audio), 3200):
        sess.feed_pcm16(audio[off : off + 3200].tobytes())
    sess.flush()
    sess.close()

    kinds = [r for r, _ in calls]
    assert Result.PARTIAL_RECOGNITION in kinds
    assert Result.FINAL_RECOGNITION in kinds
    final_text = [t for r, t in calls if r == Result.FINAL_RECOGNITION][-1]
    assert isinstance(final_text, str)


def test_streaming_beam_sessions_isolated(rt):
    """Two slots fed different audio produce independent streams; identical
    audio produces identical streams."""
    eng = BeamEngine(rt, batch=3, bcfg=BeamConfig(beam=3))
    streams = [[] for _ in range(3)]
    for i in range(3):
        eng.alloc(
            lambda r, toks, i=i: streams[i].append(
                (r, tuple(t.token_id for t in toks))
            )
        )
    a0, a1 = _audio(1), _audio(2)
    eng.feed(0, a0)
    eng.feed(1, a0)
    eng.feed(2, a1)
    while eng.tick():
        pass
    eng.flush(np.ones(3, bool))
    assert streams[0] == streams[1]
    assert streams[0] != streams[2]


def test_beam_engine_dp_mesh_equality(rt):
    """Beam engine on an 8-device data-parallel mesh produces EXACTLY the
    callbacks of the single-device engine (VERDICT r4 task 3: beam's scale
    path). Sessions shard over the data axis; no collectives are needed."""
    from april_asr_tpu.parallel import make_mesh

    mesh = make_mesh()  # (8,) data mesh on the virtual CPU devices
    S = 8

    def run(mesh_arg):
        out = [[] for _ in range(S)]
        eng = BeamEngine(rt, batch=S, bcfg=BeamConfig(beam=4), mesh=mesh_arg)
        for i in range(S):
            sid = eng.alloc(
                lambda r, toks, i=i: out[i].append(
                    (r, tuple(t.token_id for t in toks))
                )
            )
            eng.feed(sid, _audio(seed=100 + i, n=9600))
        while eng.tick():
            pass
        eng.flush(np.ones(S, bool))
        return out

    ref = run(None)
    dp = run(mesh)
    assert any(len(o) for o in ref)  # streams actually produced results
    assert dp == ref
