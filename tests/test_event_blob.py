"""Compact event-blob transfer format (engine/step.py blob layout).

The serving engine ships decode events device->host as a compacted int32
blob (~5x smaller than the dense tensor) with a dense-tensor fallback when a
step's events overflow the budget. These tests pin the contract the rest of
the suite relies on implicitly: the blob replays to EXACTLY the callback
stream the dense tensor replays to — native C and pure-Python replayers,
overflowed and non-overflowed budgets, unsharded and shard_map-sharded
engines (reference behavior being reproduced: the synchronous handler call
order of aas_process_logits, src/april_session.c:199-429).
"""

import numpy as np
import pytest

import jax

from april_asr_tpu.config import EngineConfig
from april_asr_tpu.engine import build_engine, init_engine_state
from april_asr_tpu.engine.batch import replay_packed
from april_asr_tpu.engine.replay import EventReplayer
from april_asr_tpu.engine.step import (
    BLOB_MAGIC,
    PackedEvents,
    iter_blobs,
    unpack_blob_np,
)
def tiny_runtime():
    from april_asr_tpu.io.params import build_vocab_tables
    from april_asr_tpu.models import TransducerDims, init_transducer_params
    from april_asr_tpu.models.export import make_model_parameters
    from april_asr_tpu.models.loader import (
        ModelRuntime,
        _fbank_opts_from_params,
        _native_runtime_fns,
    )
    from april_asr_tpu.testing import default_tokens

    dims = TransducerDims(
        mel=80, segment_size=9, segment_step=4, d_model=32, hidden=64, ffn=64,
        joiner_dim=32, vocab=64, layers=2, context=2, decoder_groups=8,
        conv_channels=(4, 8, 8),
    )
    params = init_transducer_params(jax.random.PRNGKey(0), dims)
    mp = make_model_parameters(dims, default_tokens(dims.vocab))
    enc, dec, joi = _native_runtime_fns(dims)
    return ModelRuntime(
        name="blob-test", description="", language="en",
        params=mp, fbank_opts=_fbank_opts_from_params(mp),
        vocab=build_vocab_tables(mp), dims=dims, kind="native",
        weights=params, encoder_step=enc, decoder_step=dec, joiner=joi,
        state_shapes=((dims.layers, dims.d_model), (dims.layers, dims.hidden)),
    )


class _Slot:
    def __init__(self, params, sink):
        self.replayer = EventReplayer(params, sink)


def _call_log(params, S, lp_digits=None):
    """lp_digits rounds logprobs for cross-program-structure comparisons
    (shard_map reduction order differs by a few ulps from single-device,
    as in test_sharding); None compares them bit-exactly."""
    log = []

    def fmt_lp(x):
        return float(x) if lp_digits is None else round(float(x), lp_digits)

    slots = [
        _Slot(
            params,
            lambda r, toks, s=s: log.append(
                (
                    s,
                    r,
                    tuple(
                        (t.token_id, fmt_lp(t.logprob), t.flags, t.time_ms)
                        for t in toks
                    ),
                )
            ),
        )
        for s in range(S)
    ]
    return log, slots


def _drive(rt, S, cfg, steps=3, seed=0):
    """Run a few steps + flush; return the list of PackedEvents."""
    prog = build_engine(rt, batch=S, cfg=cfg)
    state = init_engine_state(prog)
    rng = np.random.default_rng(seed)
    out = []
    chunk = cfg.chunk_samples
    for i in range(steps):
        audio = (rng.normal(0, 0.25, (S, chunk)) * 20000).astype(np.int16)
        n = np.full(S, chunk, np.int32)
        if i == 1:
            n[0] = chunk // 2  # one partial chunk
        state, events = prog.step(rt.weights, state, audio, n)
        assert isinstance(events, PackedEvents)
        out.append(events)
    state, events = prog.flush(rt.weights, state, np.ones(S, bool))
    out.append(events)
    return out


@pytest.fixture(scope="module")
def driven():
    rt = tiny_runtime()
    S = 4
    # random weights emit far above real-speech density; a budget >= the
    # per-session cell count makes overflow impossible for the layout tests
    # (the overflow path gets its own test below)
    cfg = EngineConfig(chunk_samples=3200, events_per_session=128)
    return rt, _drive(rt, S, cfg, steps=3)


def test_blob_layout_and_counts(driven):
    rt, packets = driven
    for ev in packets:
        arr = np.asarray(ev.blob)
        assert arr.dtype == np.int32
        subs = list(iter_blobs(arr))
        assert len(subs) == 1
        base, sub = subs[0]
        assert base == 0 and sub[0] == BLOB_MAGIC
        u = unpack_blob_np(sub)
        dense = np.asarray(ev.dense)
        I = (dense.shape[2] - 1) // 2
        dense_ops = dense[:, :, :I] & 0x7F
        # counts match the dense tensor's nonzero cells per session
        np.testing.assert_array_equal(
            u["counts"], (dense_ops != 0).sum(axis=(1, 2))
        )
        assert not u["overflow"]


def test_blob_replay_equals_dense_replay(driven):
    rt, packets = driven
    S = 4
    log_blob, slots_b = _call_log(rt.params, S)
    log_dense, slots_d = _call_log(rt.params, S)
    total_b = total_d = 0
    for ev in packets:
        total_b += replay_packed(ev, slots_b)
        total_d += replay_packed(np.asarray(ev.dense), slots_d)
    assert total_b == total_d > 0
    assert log_blob == log_dense


def test_blob_python_replay_equals_native(driven, monkeypatch):
    rt, packets = driven
    S = 4
    import april_asr_tpu.native.replay_ext as rex

    log_nat, slots_n = _call_log(rt.params, S)
    for ev in packets:
        replay_packed(ev, slots_n)

    monkeypatch.setattr(rex, "_mod", None)
    monkeypatch.setattr(rex, "_tried", True)  # force the Python fallback
    log_py, slots_p = _call_log(rt.params, S)
    for ev in packets:
        replay_packed(ev, slots_p)
    assert log_py == log_nat


def test_overflow_falls_back_to_dense(driven):
    """A 1-cell budget overflows on real emissions; the host must detect it
    via the counts and replay the dense tensor — identical streams."""
    rt, packets = driven
    S = 4
    tiny = _drive(
        rt, S, EngineConfig(chunk_samples=3200, events_per_session=1), steps=3
    )
    # same audio/config -> same dense streams; only the budget differs
    log_ref, slots_r = _call_log(rt.params, S)
    log_tiny, slots_t = _call_log(rt.params, S)
    saw_overflow = False
    for ev_ref, ev_tiny in zip(packets, tiny):
        assert np.asarray(ev_tiny.blob).shape[0] < np.asarray(ev_ref.blob).shape[0]
        for _, sub in iter_blobs(np.asarray(ev_tiny.blob)):
            saw_overflow |= bool(unpack_blob_np(sub)["overflow"])
        replay_packed(ev_ref, slots_r)
        replay_packed(ev_tiny, slots_t)
    assert saw_overflow
    assert log_tiny == log_ref


def test_sharded_blob_parses_per_shard():
    """shard_map engines emit one self-describing sub-blob per device; the
    host parser walks them and replays the identical stream the same step's
    dense tensor replays (numerics across program structures are covered by
    test_sharding with tolerances; this pins the transfer format)."""
    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices (CPU mesh conftest)")
    from april_asr_tpu.parallel import make_mesh, state_spec_tree
    from jax.sharding import NamedSharding

    rt = tiny_runtime()
    S = 8
    cfg = EngineConfig(chunk_samples=3200, events_per_session=128)
    mesh = make_mesh(devices=jax.devices()[:4])
    prog_m = build_engine(rt, batch=S, cfg=cfg, mesh=mesh)

    state = init_engine_state(prog_m)
    specs = state_spec_tree(state, mesh.axis_names[0], None)

    def to_sh(t):
        if isinstance(t, dict):
            return {k: to_sh(v) for k, v in t.items()}
        return NamedSharding(mesh, t)

    state_m = jax.device_put(state, to_sh(specs))

    rng = np.random.default_rng(3)
    log_blob, slots_b = _call_log(rt.params, S)
    log_dense, slots_d = _call_log(rt.params, S)
    for _ in range(2):
        audio = (rng.normal(0, 0.25, (S, 3200)) * 20000).astype(np.int16)
        n = np.full(S, 3200, np.int32)
        state_m, ev_m = prog_m.step(rt.weights, state_m, audio, n)
        subs = list(iter_blobs(np.asarray(ev_m.blob)))
        assert len(subs) == 4  # one sub-blob per device
        assert [b for b, _ in subs] == [0, 2, 4, 6]
        replay_packed(ev_m, slots_b)
        replay_packed(np.asarray(ev_m.dense), slots_d)
    assert log_blob == log_dense and len(log_blob) > 0
