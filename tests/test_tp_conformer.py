"""Conformer-family shard_map tensor parallelism (VERDICT r3 weak #3).

Round 3 gave the LSTM family the explicit shard_map TP treatment while the
Conformer fell back to GSPMD without int8. These tests cover the conformer
TP path (models/conformer.py `axis=` blocks + parallel/tp.py conformer
specs): head-sharded attention, GLU-shuffled conv, column/row-sharded FF
with explicit psums, KV-ring state sharded with the heads — f32 and int8,
block-level parity and full-engine stream agreement vs single-device.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from april_asr_tpu.config import EngineConfig
from april_asr_tpu.engine import build_engine, init_engine_state
from april_asr_tpu.engine.step import unpack_events_np
from april_asr_tpu.io.params import build_vocab_tables
from april_asr_tpu.models import conformer as CF
from april_asr_tpu.models import lstm_transducer as M
from april_asr_tpu.models.export import make_model_parameters
from april_asr_tpu.models.loader import (
    ModelRuntime,
    _fbank_opts_from_params,
    _native_joiner_argmax,
)
from april_asr_tpu.testing import default_tokens

DIMS = CF.ConformerDims(
    mel=80, segment_size=9, segment_step=4, d_model=32, heads=4, ffn=64,
    conv_kernel=4, att_context=16, joiner_dim=32, vocab=64, layers=2,
    context=2, decoder_groups=8, conv_channels=(4, 8, 8),
)
S = 8


def _tp_mesh():
    return Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("data", "model"))


@pytest.fixture(scope="module")
def params():
    p = CF.init_conformer_params(jax.random.PRNGKey(0), DIMS)
    p["join_b"] = p["join_b"].at[0].add(1.5)  # sparse emissions
    return M.precompute_decoder_tables(p, DIMS)


def _runtime(params):
    mp = make_model_parameters(DIMS, default_tokens(DIMS.vocab))
    return ModelRuntime(
        name="conf-tp", description="", language="en",
        params=mp, fbank_opts=_fbank_opts_from_params(mp),
        vocab=build_vocab_tables(mp), dims=DIMS, kind="native",
        weights=params,
        encoder_step=lambda w, x, h, c: CF.conformer_encoder_step(w, x, h, c, DIMS),
        decoder_step=lambda w, ctx: M.decoder_step(w, ctx, DIMS),
        joiner=M.joiner_logits,
        state_shapes=DIMS.state_shapes,
        encoder_embed=CF.conformer_encoder_embed,
        encoder_recurrent=lambda w, y, h, c, gate=None: (
            CF.conformer_encoder_recurrent(w, y, h, c, DIMS, gate)
        ),
        encoder_chunk=lambda w, y, h, c, can: CF.conformer_encoder_chunk(
            w, y, h, c, DIMS, can
        ),
        encoder_chunk_max_pulls=DIMS.att_context,
        joiner_argmax=_native_joiner_argmax(mp.blank_id),
    )


def test_glu_shuffle_roundtrip():
    from april_asr_tpu.parallel.tp import glu_shuffle_perm

    d, m = 32, 2
    perm = glu_shuffle_perm(d, m)
    assert sorted(perm.tolist()) == list(range(2 * d))
    dl = d // m
    for k in range(m):
        blk = perm[k * 2 * dl : (k + 1) * 2 * dl]
        np.testing.assert_array_equal(blk[:dl], k * dl + np.arange(dl))
        np.testing.assert_array_equal(blk[dl:], d + k * dl + np.arange(dl))


def _shard_map_chunk(params, mesh, quant=False):
    try:
        from jax import shard_map as shard_map_fn
    except ImportError:
        from jax.experimental.shard_map import shard_map as shard_map_fn
    from jax.sharding import PartitionSpec as P

    from april_asr_tpu.parallel.tp import conformer_tp_specs, glu_shuffle_columns

    p = M.quantize_weights(params) if quant else params
    shuffled = glu_shuffle_columns(p, 2)
    w_specs = conformer_tp_specs(shuffled)

    def body(w, y, h, c, can):
        return CF.conformer_encoder_chunk(w, y, h, c, DIMS, can, axis="model")

    fn = jax.jit(
        shard_map_fn(
            body,
            mesh=mesh,
            in_specs=(
                w_specs, P(None, "data"), P(None, "data", "model"),
                P(None, "data", "model"), P(None, "data"),
            ),
            out_specs=(
                P(None, "data"), P(None, "data", "model"),
                P(None, "data", "model"),
            ),
            check_vma=False,
        )
    )
    return fn, shuffled, p


@pytest.mark.parametrize("quant", [False, True], ids=["f32", "int8"])
def test_chunk_tp_matches_single_device(params, quant):
    """conformer_encoder_chunk under 2-way shard_map TP == single device
    (state round-trips through the sharded layout: h/c local rings
    concatenate to a REARRANGED global layout, so parity is checked by
    running a second chunk on the carried state, not by comparing state
    bytes)."""
    mesh = _tp_mesh()
    Pn = 4
    rng = np.random.default_rng(1)
    y1 = jnp.asarray(rng.normal(0, 0.5, (Pn, S, DIMS.d_model)), jnp.float32)
    y2 = jnp.asarray(rng.normal(0, 0.5, (Pn, S, DIMS.d_model)), jnp.float32)
    can = jnp.ones((Pn, S), bool)
    can2 = jnp.asarray(
        np.arange(Pn)[:, None] < np.array([4, 3, 2, 1, 4, 0, 2, 4])[None, :]
    )

    p = M.quantize_weights(params) if quant else params
    h0 = jnp.zeros((DIMS.layers, S, DIMS.state_shapes[0][1]), jnp.float32)
    c0 = jnp.zeros((DIMS.layers, S, DIMS.state_shapes[1][1]), jnp.float32)
    ref1, rh, rc = CF.conformer_encoder_chunk(p, y1, h0, c0, DIMS, can)
    ref2, _, _ = CF.conformer_encoder_chunk(p, y2, rh, rc, DIMS, can2)

    fn, shuffled, _ = _shard_map_chunk(params, mesh, quant)
    # TP state: padded conv row ((k-1)d + m) and per-shard ring layout
    d, k = DIMS.d_model, DIMS.conv_kernel
    h0t = jnp.zeros((DIMS.layers, S, 2 * DIMS.att_context * d), jnp.float32)
    c0t = jnp.zeros((DIMS.layers, S, (k - 1) * d + 2), jnp.float32)
    got1, th, tc = fn(shuffled, y1, h0t, c0t, can)
    got2, _, _ = fn(shuffled, y2, th, tc, can2)

    tol = dict(atol=2e-5, rtol=2e-4) if not quant else dict(atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1), **tol)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), **tol)


def _drive(rt, mesh, steps=2):
    prog = build_engine(rt, batch=S, cfg=EngineConfig(chunk_samples=3200), mesh=mesh)
    if mesh is not None and prog.tp_axes:
        from april_asr_tpu.parallel.tp import prepare_conformer_tp_weights

        weights = prepare_conformer_tp_weights(rt.weights, mesh)
    else:
        weights = rt.weights
    state = init_engine_state(prog, weights)
    if mesh is not None:
        from jax.sharding import NamedSharding

        from april_asr_tpu.parallel import state_spec_tree

        specs = state_spec_tree(
            state, "data", prog.tp_axes, prog.tp_family or "lstm"
        )

        def to_sh(t):
            if isinstance(t, dict):
                return {k: to_sh(v) for k, v in t.items()}
            return NamedSharding(mesh, t)

        state = jax.device_put(state, to_sh(specs))
    rng = np.random.default_rng(5)
    evs = []
    for _ in range(steps):
        audio = jnp.asarray(
            (rng.normal(0, 0.2, size=(S, 3200)) * 20000).astype(np.int16)
        )
        n = jnp.full(S, 3200, jnp.int32)
        state, events = prog.step(weights, state, audio, n)
        evs.append(unpack_events_np(events))
    state, events = prog.flush(weights, state, jnp.ones(S, bool))
    evs.append(unpack_events_np(events))
    return prog, evs


@pytest.mark.parametrize("quant", [False, True], ids=["f32", "int8"])
def test_engine_conformer_tp_stream_agreement(params, quant):
    """Full engine on a (data x model) mesh routes the conformer through the
    shard_map TP path (tp_family == 'conformer') and the decode streams
    agree with single-device execution for (nearly) every session — the
    same rate contract as the LSTM int8 TP (psum reordering can flip a
    borderline argmax on chaotic random weights; trained margins decode
    identically, docs/distributed.md)."""
    p = M.quantize_weights(params) if quant else params
    rt = _runtime(p)
    _, ev_ref = _drive(rt, mesh=None)
    prog, ev_tp = _drive(rt, mesh=_tp_mesh())
    assert prog.tp_axes == ("model",)
    assert prog.tp_family == "conformer"

    identical = 0
    for s in range(S):
        same = all(
            all(
                np.array_equal(a[k][s], b[k][s])
                for k in ("ops", "tok", "flags", "time_ms", "final_k")
            )
            for a, b in zip(ev_ref, ev_tp)
        )
        identical += bool(same)
    assert identical >= int(0.75 * S), f"only {identical}/{S} sessions identical"
