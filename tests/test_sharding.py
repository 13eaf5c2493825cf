"""Multi-chip sharding correctness on the 8-virtual-device CPU mesh:
tensor/data-parallel execution must match single-device results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from april_asr_tpu.models import (
    TransducerDims,
    encoder_step,
    init_streaming_state,
    init_transducer_params,
)
from april_asr_tpu.parallel import make_mesh, param_specs
from april_asr_tpu.train import make_train_step

DIMS = TransducerDims(
    mel=80, segment_size=9, segment_step=4, d_model=32, hidden=64, ffn=64,
    joiner_dim=32, vocab=64, layers=2, context=2, decoder_groups=8,
    conv_channels=(4, 8, 8),
)


@pytest.fixture(scope="module")
def params():
    return init_transducer_params(jax.random.PRNGKey(0), DIMS)


def test_mesh_shapes():
    mesh = make_mesh(model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_tp_encoder_matches_single_device(params):
    mesh = make_mesh(model_parallel=2)
    specs = param_specs(params)
    sharded = {
        k: jax.device_put(v, NamedSharding(mesh, specs[k])) for k, v in params.items()
    }
    S = 8
    x = jax.random.normal(jax.random.PRNGKey(1), (S, 9, DIMS.mel))
    h, c = init_streaming_state(DIMS, S)
    x_s = jax.device_put(x, NamedSharding(mesh, P("data")))

    ref_e, ref_h, ref_c = jax.jit(encoder_step)(params, x, h, c)
    got_e, got_h, got_c = jax.jit(encoder_step)(sharded, x_s, h, c)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(ref_e), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h), atol=1e-5, rtol=1e-5)


def test_dp_tp_train_step_matches_single_device(params):
    mesh = make_mesh(model_parallel=2)
    specs = param_specs(params)
    init_fn, step_fn = make_train_step(DIMS, blank_id=0)

    rng = np.random.default_rng(0)
    B, T, U = 8, 9 + 4 * 3, 4
    batch = {
        "mel": rng.normal(size=(B, T, DIMS.mel)).astype(np.float32),
        "labels": rng.integers(1, DIMS.vocab, size=(B, U)).astype(np.int32),
        "frame_lens": np.full(B, 4, np.int32),
        "label_lens": np.full(B, U, np.int32),
    }

    state = init_fn(params)
    _, ref_loss = jax.jit(step_fn)(state, {k: jnp.asarray(v) for k, v in batch.items()})

    sharded_params = {
        k: jax.device_put(v, NamedSharding(mesh, specs[k])) for k, v in params.items()
    }
    data_shard = NamedSharding(mesh, P("data"))
    sharded_batch = {k: jax.device_put(v, data_shard) for k, v in batch.items()}
    state_s = init_fn(sharded_params)
    new_state, got_loss = jax.jit(step_fn)(state_s, sharded_batch)

    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
    # updated params stay sharded and match the unsharded update
    ref_state, _ = jax.jit(step_fn)(state, {k: jnp.asarray(v) for k, v in batch.items()})
    # collective reduction order differs across shards; Adam's rsqrt
    # normalization amplifies the few-ulp gradient differences
    np.testing.assert_allclose(
        np.asarray(new_state.params["w_ih_t"]),
        np.asarray(ref_state.params["w_ih_t"]),
        atol=1e-5, rtol=1e-3,
    )


def test_sharded_serving_state(params):
    """Engine session state sharded over the data axis produces the same
    events as unsharded execution (batched serving scale-out)."""
    from april_asr_tpu.config import FbankOptions
    from april_asr_tpu.decode.greedy import init_decode_state
    from april_asr_tpu.engine import build_engine, init_engine_state
    from april_asr_tpu.io.params import build_vocab_tables
    from april_asr_tpu.models.loader import ModelRuntime, _native_runtime_fns, _fbank_opts_from_params
    from april_asr_tpu.models.export import make_model_parameters
    from april_asr_tpu.testing import default_tokens

    mp = make_model_parameters(DIMS, default_tokens(DIMS.vocab))
    enc, dec, joi = _native_runtime_fns(DIMS)
    rt = ModelRuntime(
        name="sharded-test", description="", language="en",
        params=mp, fbank_opts=_fbank_opts_from_params(mp),
        vocab=build_vocab_tables(mp), dims=DIMS, kind="native",
        weights=params, encoder_step=enc, decoder_step=dec, joiner=joi,
        state_shapes=((DIMS.layers, DIMS.d_model), (DIMS.layers, DIMS.hidden)),
    )
    prog = build_engine(rt, batch=8)
    state = init_engine_state(prog)

    rng = np.random.default_rng(2)
    audio = (rng.normal(0, 0.1, size=(8, 3200)) * 20000).astype(np.int16)
    n = np.full(8, 3200, np.int32)

    ref_state, ref_events = prog.step(rt.weights, state, jnp.asarray(audio), jnp.asarray(n))

    mesh = make_mesh(model_parallel=1)
    data_shard = NamedSharding(mesh, P("data"))
    state2 = init_engine_state(prog)
    state2 = jax.tree.map(
        lambda x: jax.device_put(x, data_shard) if x.ndim and x.shape[0] == 8 else x,
        state2,
    )
    got_state, got_events = prog.step(
        rt.weights, state2, jax.device_put(jnp.asarray(audio), data_shard),
        jax.device_put(jnp.asarray(n), data_shard),
    )
    from april_asr_tpu.engine.step import unpack_events_np

    got = unpack_events_np(got_events)
    ref = unpack_events_np(ref_events)
    # decode decisions must be identical; logprobs may differ by a few ulps
    # from sharded reduction order
    for k in ("ops", "tok", "flags", "time_ms", "final_k"):
        np.testing.assert_array_equal(got[k], ref[k], err_msg=k)
    np.testing.assert_allclose(got["logprob"], ref["logprob"], rtol=1e-5, atol=1e-5)


def _tiny_runtime(params):
    from april_asr_tpu.io.params import build_vocab_tables
    from april_asr_tpu.models.export import make_model_parameters
    from april_asr_tpu.models.loader import (
        ModelRuntime,
        _fbank_opts_from_params,
        _native_runtime_fns,
    )
    from april_asr_tpu.testing import default_tokens

    mp = make_model_parameters(DIMS, default_tokens(DIMS.vocab))
    enc, dec, joi = _native_runtime_fns(DIMS)
    return ModelRuntime(
        name="sharded-test", description="", language="en",
        params=mp, fbank_opts=_fbank_opts_from_params(mp),
        vocab=build_vocab_tables(mp), dims=DIMS, kind="native",
        weights=params, encoder_step=enc, decoder_step=dec, joiner=joi,
        state_shapes=((DIMS.layers, DIMS.d_model), (DIMS.layers, DIMS.hidden)),
    )


def test_batch_engine_on_mesh_matches_single_device(params):
    """Full BatchEngine host loop (alloc/feed/tick/flush) over a data x model
    mesh produces the identical callback stream to unsharded execution."""
    from april_asr_tpu.engine import BatchEngine

    rt = _tiny_runtime(params)
    rng = np.random.default_rng(7)
    S = 8
    audio = (rng.normal(0, 0.15, size=(S, 16000)) * 20000).astype(np.int16)

    def run(mesh):
        eng = BatchEngine(rt, batch=S, mesh=mesh)
        streams = [[] for _ in range(S)]

        def mk(i):
            return lambda result, toks: streams[i].append(
                (result, tuple((t.token_id, t.flags, t.time_ms) for t in toks))
            )

        slots = [eng.alloc(mk(i)) for i in range(S)]
        for off in range(0, audio.shape[1], 3200):
            for i, sl in enumerate(slots):
                eng.feed(sl, audio[i, off : off + 3200])
            while eng.tick():
                pass
        eng.flush(np.ones(S, bool))
        return streams

    ref = run(None)
    got = run(make_mesh(model_parallel=2))
    assert sum(len(s) for s in ref) > 0
    for i in range(8):
        assert got[i] == ref[i], f"slot {i} event stream diverged"


def test_batch_engine_on_mesh_disables_pallas(params, monkeypatch):
    """Forced-pallas mode on a data x model mesh must still produce the
    unsharded callback stream. Since round 3 the native LSTM family routes
    TP through shard_map (kernels allowed — ops/lstm_tp_pallas.py; these
    tiny dims fall back to the XLA TP layer body); families without a TP
    kernel path trace under pallas_disabled for GSPMD, which must not leak
    pallas calls into partitioned programs."""
    from april_asr_tpu.engine import BatchEngine

    rt = _tiny_runtime(params)
    rng = np.random.default_rng(11)
    S = 8
    audio = (rng.normal(0, 0.15, size=(S, 9600)) * 20000).astype(np.int16)

    def run(mesh):
        eng = BatchEngine(rt, batch=S, mesh=mesh)
        streams = [[] for _ in range(S)]

        def mk(i):
            return lambda result, toks: streams[i].append(
                (result, tuple((t.token_id, t.flags, t.time_ms) for t in toks))
            )

        slots = [eng.alloc(mk(i)) for i in range(S)]
        for off in range(0, audio.shape[1], 3200):
            for i, sl in enumerate(slots):
                eng.feed(sl, audio[i, off : off + 3200])
            while eng.tick():
                pass
        eng.flush(np.ones(S, bool))
        return streams

    monkeypatch.setenv("APRIL_PALLAS", "0")
    ref = run(None)
    monkeypatch.setenv("APRIL_PALLAS", "1")
    got = run(make_mesh(model_parallel=2))
    assert sum(len(s) for s in ref) > 0
    for i in range(S):
        assert got[i] == ref[i], f"slot {i} event stream diverged"


def test_batch_engine_data_parallel_keeps_pallas(params, monkeypatch):
    """Data-only meshes (model axis 1) build the engine via shard_map, where
    each shard is a complete per-device program — so the fused Pallas
    kernels stay ACTIVE (interpret mode on CPU), unlike GSPMD partitioning
    which must fall back to pure XLA. The callback stream must match
    unsharded pure-XLA execution."""
    from april_asr_tpu.engine import BatchEngine

    rt = _tiny_runtime(params)
    rng = np.random.default_rng(13)
    S = 8
    audio = (rng.normal(0, 0.15, size=(S, 9600)) * 20000).astype(np.int16)

    def run(mesh):
        eng = BatchEngine(rt, batch=S, mesh=mesh)
        streams = [[] for _ in range(S)]

        def mk(i):
            return lambda result, toks: streams[i].append(
                (result, tuple((t.token_id, t.flags, t.time_ms) for t in toks))
            )

        slots = [eng.alloc(mk(i)) for i in range(S)]
        for off in range(0, audio.shape[1], 3200):
            for i, sl in enumerate(slots):
                eng.feed(sl, audio[i, off : off + 3200])
            while eng.tick():
                pass
        eng.flush(np.ones(S, bool))
        return streams

    monkeypatch.setenv("APRIL_PALLAS", "0")
    ref = run(None)
    monkeypatch.setenv("APRIL_PALLAS", "1")  # kernels active inside shard_map
    got = run(make_mesh(model_parallel=1))
    assert sum(len(s) for s in ref) > 0
    for i in range(S):
        assert got[i] == ref[i], f"slot {i} event stream diverged"


def test_batch_engine_on_mesh_int8_quantized(params):
    """int8-quantized weights serve correctly over a data-parallel
    shard_map mesh AND a GSPMD data x model mesh: both produce the
    identical callback stream to unsharded quantized execution (the q8
    arrays ride the same replicate/shard specs as their originals,
    parallel/mesh.py _PARAM_SPECS)."""
    from april_asr_tpu.engine import BatchEngine
    from april_asr_tpu.models.lstm_transducer import quantize_weights

    rt = _tiny_runtime(params)
    rt.weights = quantize_weights(rt.weights)
    rng = np.random.default_rng(17)
    S = 8
    audio = (rng.normal(0, 0.15, size=(S, 9600)) * 20000).astype(np.int16)

    def run(mesh):
        eng = BatchEngine(rt, batch=S, mesh=mesh)
        streams = [[] for _ in range(S)]

        def mk(i):
            return lambda result, toks: streams[i].append(
                (result, tuple((t.token_id, t.flags, t.time_ms) for t in toks))
            )

        slots = [eng.alloc(mk(i)) for i in range(S)]
        for off in range(0, audio.shape[1], 3200):
            for i, sl in enumerate(slots):
                eng.feed(sl, audio[i, off : off + 3200])
            while eng.tick():
                pass
        eng.flush(np.ones(S, bool))
        return streams

    ref = run(None)
    assert sum(len(s) for s in ref) > 0
    got_dp = run(make_mesh(model_parallel=1))
    got_tp = run(make_mesh(model_parallel=2))
    for i in range(S):
        assert got_dp[i] == ref[i], f"slot {i} diverged on the DP mesh"
        assert got_tp[i] == ref[i], f"slot {i} diverged on the TP mesh"
