"""Elastic serving: contained failures, per-slot eviction, engine survival.

The reference aborts the whole process on any backend error
(src/ort_util.h:29-38 ORT_ABORT_ON_ERROR). This framework must do better:
a failed step/flush resets device state from the init template and notifies
every live session with SESSION_ERROR while the engine keeps serving; silent
numerical corruption (non-finite carried state) is contained per-slot by
`scrub()` without touching healthy sessions."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from april_asr_tpu.decode.scalar import (
    RESULT_SESSION_ERROR,
)
from april_asr_tpu.engine import BatchEngine
from april_asr_tpu.io.params import build_vocab_tables
from april_asr_tpu.models import TransducerDims, init_transducer_params
from april_asr_tpu.models.export import make_model_parameters
from april_asr_tpu.models.loader import (
    ModelRuntime,
    _fbank_opts_from_params,
    _native_runtime_fns,
)
from april_asr_tpu.testing import default_tokens
from april_asr_tpu.utils import logging as log

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
        name="elastic", description="", language="en", params=mp,
        fbank_opts=_fbank_opts_from_params(mp), vocab=build_vocab_tables(mp),
        dims=DIMS, kind="native", weights=params, encoder_step=enc,
        decoder_step=dec, joiner=joi,
        state_shapes=((DIMS.layers, DIMS.d_model), (DIMS.layers, DIMS.hidden)),
    )


def _audio(seed, n=9600):
    rng = np.random.default_rng(seed)
    return (rng.normal(0, 0.15, size=n) * 20000).astype(np.int16)


def test_step_failure_recovers_and_keeps_serving(rt):
    """PERSISTENT program failure (the retry fails too): last-resort full
    recovery — every live session notified, engine keeps serving."""
    S = 4
    eng = BatchEngine(rt, batch=S)
    streams = [[] for _ in range(S)]
    for i in range(S):
        eng.alloc(lambda r, toks, i=i: streams[i].append(r))

    # fail the SECOND dispatch AND its containment retry
    orig_step = eng.prog.step
    calls = {"n": 0}

    def bad_step(w, s, a, n):
        calls["n"] += 1
        if calls["n"] in (2, 3):
            raise RuntimeError("injected device failure")
        return orig_step(w, s, a, n)

    eng.prog = dataclasses.replace(eng.prog, step=bad_step)

    audio = _audio(1)

    for i in range(S):
        eng.feed(i, audio)
    ok = eng.tick()          # dispatch 1: fine
    assert ok
    assert eng.tick() is False  # dispatch 2 + retry fail -> full recovery

    # every live session was notified and the engine is still serving
    for i in range(S):
        assert RESULT_SESSION_ERROR in streams[i]
    n_before = [len(s) for s in streams]
    for i in range(S):
        eng.feed(i, audio)
    while eng.tick():
        pass
    eng.flush(np.ones(S, bool))
    assert calls["n"] > 3  # post-recovery dispatches actually ran
    assert any(len(s) > n_before[i] for i, s in enumerate(streams)), (
        "no callbacks after recovery"
    )


def test_transient_failure_contained_no_eviction(rt):
    """A TRANSIENT program failure (clean state, retry succeeds) must be
    invisible to every session: no SESSION_ERROR, streams identical to an
    uninterrupted run."""
    S = 4
    audio = _audio(7)

    def run(inject: bool):
        eng = BatchEngine(rt, batch=S)
        streams = [[] for _ in range(S)]
        for i in range(S):
            eng.alloc(
                lambda r, toks, i=i: streams[i].append(
                    (r, tuple((t.token_id, t.time_ms) for t in toks))
                )
            )
        if inject:
            orig_step = eng.prog.step
            calls = {"n": 0}

            def bad_step(w, s, a, n):
                calls["n"] += 1
                if calls["n"] == 2:
                    raise RuntimeError("transient transport glitch")
                return orig_step(w, s, a, n)

            eng.prog = dataclasses.replace(eng.prog, step=bad_step)
        for i in range(S):
            eng.feed(i, audio)
        while eng.tick():
            pass
        eng.flush(np.ones(S, bool))
        return streams

    clean = run(inject=False)
    faulted = run(inject=True)
    assert faulted == clean
    assert all(RESULT_SESSION_ERROR not in [c[0] for c in s] for s in faulted)


def test_program_failure_contained_per_slot(rt):
    """One poisoned slot + a program failure: ONLY the poisoned slot is
    evicted (SESSION_ERROR); the healthy sessions' callback streams are
    IDENTICAL to an uninterrupted run (VERDICT r2 item 4)."""
    S = 4
    audio = [_audio(10 + i) for i in range(S)]

    def run(poison_slot):
        eng = BatchEngine(rt, batch=S)
        streams = [[] for _ in range(S)]
        for i in range(S):
            eng.alloc(
                lambda r, toks, i=i: streams[i].append(
                    (r, tuple((t.token_id, t.time_ms) for t in toks))
                )
            )
        for i in range(S):
            eng.feed(i, audio[i][:3200])
        while eng.tick():
            pass

        if poison_slot is not None:
            # silent corruption in one slot...
            h = np.array(eng.state["h"])
            h[:, poison_slot, :] = np.nan
            eng.state = dict(eng.state)
            eng.state["h"] = jnp.asarray(h)
            # ...AND the next program dispatch blows up
            orig_step = eng.prog.step
            calls = {"n": 0}

            def bad_step(w, s, a, n):
                calls["n"] += 1
                if calls["n"] == 1:
                    raise RuntimeError("injected program failure")
                return orig_step(w, s, a, n)

            eng.prog = dataclasses.replace(eng.prog, step=bad_step)

        for i in range(S):
            eng.feed(i, audio[i][3200:9600])
        while eng.tick():
            pass
        eng.flush(np.ones(S, bool))
        return streams

    clean = run(poison_slot=None)
    faulted = run(poison_slot=2)

    # poisoned slot: evicted exactly once, then kept serving from fresh state
    errs = [c[0] for c in faulted[2]]
    assert errs.count(RESULT_SESSION_ERROR) == 1
    # healthy slots: streams identical to the uninterrupted run
    for i in (0, 1, 3):
        assert faulted[i] == clean[i], f"slot {i} stream diverged"
        assert RESULT_SESSION_ERROR not in [c[0] for c in faulted[i]]


def test_scrub_evicts_only_poisoned_slots(rt):
    S = 4
    eng = BatchEngine(rt, batch=S)
    streams = [[] for _ in range(S)]
    for i in range(S):
        eng.alloc(
            lambda r, toks, i=i: streams[i].append(
                (r, tuple((t.token_id, t.time_ms) for t in toks))
            )
        )

    audio = _audio(2)
    for i in range(S):
        eng.feed(i, audio[:3200])
    while eng.tick():
        pass

    # poison slot 1's LSTM cell state with NaN (silent corruption: no
    # exception is raised, decode would just emit garbage forever)
    h = np.array(eng.state["h"])  # writable copy
    h[:, 1, :] = np.nan
    eng.state = dict(eng.state)
    eng.state["h"] = jnp.asarray(h)

    evicted = eng.scrub()
    assert evicted == 1
    assert streams[1][-1] == (RESULT_SESSION_ERROR, ())
    assert all(
        RESULT_SESSION_ERROR not in [c[0] for c in streams[i]]
        for i in (0, 2, 3)
    )

    # poisoned slot serves again from fresh state; healthy slots unaffected
    for i in range(S):
        eng.feed(i, audio[3200:6400])
    while eng.tick():
        pass
    eng.flush(np.ones(S, bool))
    assert len(streams[1]) > 1
    # healthy identical-audio slots must still agree with each other
    assert streams[0] == streams[2] == streams[3]


def test_scrub_clean_state_is_noop(rt):
    eng = BatchEngine(rt, batch=2)
    calls = []
    eng.alloc(lambda r, toks: calls.append(r))
    eng.feed(0, _audio(3, 3200))
    while eng.tick():
        pass
    assert eng.scrub() == 0
    assert RESULT_SESSION_ERROR not in calls
