"""Whole-chunk fused decode kernel vs the engine's scan + decode_step_pre.

ops/decode_pallas.chunk_decode_fused must reproduce the lazy-dout inner
decode loop (engine/step.py inner_decode: decoder_joiner_argmax +
decode_step_pre, 3 masked rounds per pull) element-exactly over a whole
chunk — state and every event field. Reference semantics under test:
aas_process_logits + the joiner/decoder loop, src/april_session.c:166-196,
:306-429.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from april_asr_tpu.config import DecodeConfig
from april_asr_tpu.decode.greedy import (
    decode_step_pre,
    init_decode_state,
    vocab_tables_device,
)
from april_asr_tpu.engine.step import INNER_STEPS_EMIT
from april_asr_tpu.io.params import build_vocab_tables
from april_asr_tpu.models import lstm_transducer as M
from april_asr_tpu.models.export import make_model_parameters
from april_asr_tpu.ops.decode_pallas import chunk_decode_fused
from april_asr_tpu.testing import default_tokens

S, P, V = 128, 5, 40
DIMS = M.TransducerDims(
    layers=1, d_model=128, hidden=128, ffn=128, joiner_dim=128, vocab=V,
    decoder_groups=32,
)
STRIDE = 40


def _setup(seed):
    params = M.init_transducer_params(jax.random.PRNGKey(seed), DIMS)
    params = M.precompute_decoder_tables(params, DIMS)
    mp = make_model_parameters(DIMS, default_tokens(V))
    vt = vocab_tables_device(build_vocab_tables(mp))
    cfg = DecodeConfig()
    k = jax.random.split(jax.random.PRNGKey(seed + 1), 4)
    # logit-scale eouts so blank/non-blank decisions and every heuristic
    # branch get exercised
    eouts = jax.random.normal(k[0], (P, S, DIMS.joiner_dim), jnp.float32) * 2.0
    can = jax.random.bernoulli(k[1], 0.85, (P, S))
    dstate = init_decode_state(S, DIMS.context, DIMS.joiner_dim, mp.blank_id, cfg)
    # age the state so finalize/silence/dedup paths are reachable
    dstate["head"] = jax.random.randint(k[2], (S,), 0, cfg.max_active_tokens)
    dstate["token_words"] = jax.random.randint(
        k[3], (S, cfg.max_active_tokens), 0, V
    ) | (
        jax.random.randint(jax.random.PRNGKey(seed + 9), (S, cfg.max_active_tokens), 0, 4)
        << 16
    )
    dstate["time_ms"] = jnp.full((S,), 4000, jnp.int32)
    dstate["last_emit_ms"] = jax.random.randint(
        jax.random.PRNGKey(seed + 5), (S,), 0, 4000
    )
    dstate["last_call"] = jax.random.randint(
        jax.random.PRNGKey(seed + 6), (S,), 0, cfg.max_active_tokens
    )
    return params, mp, vt, cfg, eouts, can, dstate


def _oracle(params, mp, vt, cfg, eouts, can, dstate):
    """The engine's scan path, lazy-dout ordering, pure XLA."""
    blank = mp.blank_id
    evs = []
    dstate = dict(dstate)
    for i in range(P):
        can_i = can[i]
        dstate["time_ms"] = dstate["time_ms"] + STRIDE * can_i.astype(jnp.int32)
        done = ~can_i
        evts = []
        for ee in INNER_STEPS_EMIT:
            mi, mv, bv, dout = M.decoder_joiner_argmax(
                params, dstate["context"], dstate["need_dec"], dstate["dout"],
                eouts[i], blank, DIMS,
            )
            dstate["dout"] = dout
            dstate, evt, is_blank, need_dec = decode_step_pre(
                dstate, mi, mv, bv, ~done, ee, blank, vt, cfg
            )
            dstate["need_dec"] = need_dec
            done = done | is_blank
            evts.append(evt)
        evs.append({k: jnp.stack([e[k] for e in evts], axis=1) for k in evts[0]})
    events = {k: jnp.stack([e[k] for e in evs], axis=0) for k in evs[0]}
    return dstate, events


@pytest.mark.parametrize("seed", [0, 3])
def test_chunk_decode_matches_scan(seed, monkeypatch):
    params, mp, vt, cfg, eouts, can, dstate = _setup(seed)
    # force the oracle's dj step onto the XLA fallback so it is the pure
    # reference composition (the fused dj kernel is itself verified
    # elsewhere; interpret-mode numerics match XLA exactly on CPU)
    monkeypatch.setenv("APRIL_TPU_NO_PALLAS", "1")
    ref_state, ref_events = _oracle(params, mp, vt, cfg, eouts, can, dict(dstate))
    monkeypatch.delenv("APRIL_TPU_NO_PALLAS")

    cfg_key = (
        float(cfg.punctuation_margin), float(cfg.confident_margin),
        float(cfg.confident_logprob_penalty), float(cfg.long_silence_ms),
        float(cfg.silence_decay_ms), int(cfg.max_active_tokens),
    )
    got_state, got_events = chunk_decode_fused(
        eouts, can, dict(dstate),
        params["dec_table"], params["dec_proj_t"], params["dec_proj_b"],
        params["join_t"], params["join_b"], vt["mask"],
        blank_id=mp.blank_id, stride_ms=STRIDE, emit_ramp=INNER_STEPS_EMIT,
        cfg_key=cfg_key, block_s=128, interpret=True,
    )

    for k in ("ops", "tok", "flags", "time_ms", "final_k"):
        np.testing.assert_array_equal(
            np.asarray(got_events[k]), np.asarray(ref_events[k]), err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(got_events["logprob"]), np.asarray(ref_events["logprob"]),
        atol=1e-5, rtol=1e-5,
    )
    for k in ("context", "token_words", "head", "last_call", "time_ms",
              "last_emit_ms"):
        np.testing.assert_array_equal(
            np.asarray(got_state[k]), np.asarray(ref_state[k]), err_msg=k
        )
    np.testing.assert_array_equal(
        np.asarray(got_state["need_dec"]), np.asarray(ref_state["need_dec"])
    )
    np.testing.assert_array_equal(
        np.asarray(got_state["emitted_silence"]),
        np.asarray(ref_state["emitted_silence"]),
    )
    np.testing.assert_allclose(
        np.asarray(got_state["dout"]), np.asarray(ref_state["dout"]),
        atol=1e-5, rtol=1e-5,
    )
