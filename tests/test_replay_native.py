"""Native C replay extension vs the pure-Python replay loop.

Random packed event tensors (all op combinations) replayed through both
paths must produce identical callback sequences and identical final token
windows.
"""

import numpy as np
import pytest

from april_asr_tpu.decode import events as ev
from april_asr_tpu.engine.batch import replay_packed
from april_asr_tpu.engine.replay import EventReplayer
from april_asr_tpu.native.replay_ext import load_replay_ext
from april_asr_tpu.testing import default_tokens
from april_asr_tpu.models.export import make_model_parameters
from april_asr_tpu.models.lstm_transducer import TransducerDims


def _params():
    dims = TransducerDims(vocab=64)
    return make_model_parameters(dims, default_tokens(64))


def _random_packed(S, P, I, seed, density=0.3):
    rng = np.random.default_rng(seed)
    ops_choices = np.array(
        [
            0,
            ev.OP_APPEND | ev.OP_PARTIAL,
            ev.OP_APPEND | ev.OP_PARTIAL | ev.OP_POP,
            ev.OP_FINAL,
            ev.OP_FIX_PREV_EOS | ev.OP_FINAL,
            ev.OP_RESET_TOKENS,
            ev.OP_SILENCE,
            ev.OP_FINAL | ev.OP_APPEND | ev.OP_PARTIAL,
        ],
        np.int32,
    )
    pick = rng.choice(len(ops_choices), size=(S, P, I), p=[1 - density] + [density / 7] * 7)
    ops = ops_choices[pick]
    tok = rng.integers(0, 64, size=(S, P, I)).astype(np.int32)
    flags = rng.integers(0, 4, size=(S, P, I)).astype(np.int32)
    final_k = rng.integers(0, 72, size=(S, P, I)).astype(np.int32)
    word0 = ops | (flags << 7) | (final_k << 9) | (tok << 16)
    logprob = rng.normal(size=(S, P, I)).astype(np.float32)
    time_ms = rng.integers(0, 10_000, size=(S, P, 1)).astype(np.int32)
    return np.concatenate(
        [word0, logprob.view(np.int32), time_ms], axis=2
    )


class _Slot:
    def __init__(self, params, sink):
        self.replayer = EventReplayer(params, sink)


def _run(packed, params, force_python):
    log = []
    S = packed.shape[0]
    slots = [
        _Slot(params, lambda r, toks, s=s: log.append((s, r, [(t.token_id, round(float(t.logprob), 5), t.flags, t.time_ms) for t in toks])))
        for s in range(S)
    ]
    slots[S // 2] = None  # freed slot must be skipped
    if force_python:
        from april_asr_tpu.engine import batch as B
        from april_asr_tpu.engine.step import unpack_events_np

        ev_np = unpack_events_np(packed)
        ops = ev_np["ops"]
        coords = np.argwhere(ops != 0)
        n = 0
        tok, lp = ev_np["tok"], ev_np["logprob"]
        fl, tm, fk = ev_np["flags"], ev_np["time_ms"], ev_np["final_k"]
        for s, p, j in coords:
            slot = slots[s]
            if slot is None:
                continue
            slot.replayer.apply(
                int(ops[s, p, j]), int(tok[s, p, j]), float(lp[s, p, j]),
                int(fl[s, p, j]), int(tm[s, p]), int(fk[s, p, j]),
            )
            n += 1
    else:
        n = replay_packed(packed, slots)
    windows = [
        [(t.token_id, round(float(t.logprob), 5), t.flags, t.time_ms) for t in s.replayer.tokens]
        if s is not None
        else None
        for s in slots
    ]
    return n, log, windows


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_python(seed):
    ext = load_replay_ext()
    assert ext is not None, "native replay extension should build in this image"
    params = _params()
    packed = _random_packed(S=16, P=5, I=3, seed=seed)
    n0, log0, win0 = _run(packed, params, force_python=True)
    n1, log1, win1 = _run(packed, params, force_python=False)
    assert n1 == n0
    assert log1 == log0
    assert win1 == win0


def test_native_token_type_duck_compat():
    ext = load_replay_ext()
    assert ext is not None
    t = ext.Token(token_id=5, logprob=-0.25, flags=1, time_ms=120)
    assert (t.token_id, t.logprob, t.flags, t.time_ms) == (5, -0.25, 1, 120)
    c = t.copy()
    c.flags |= 2
    assert t.flags == 1 and c.flags == 3
    from april_asr_tpu.decode.scalar import ScalarToken

    assert t == ScalarToken(5, -0.25, 1, 120)
    assert t != ScalarToken(6, -0.25, 1, 120)
