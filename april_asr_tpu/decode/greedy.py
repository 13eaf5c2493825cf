"""Batched frame-synchronous greedy transducer decode.

TPU-native vectorization of the reference's per-session decode heuristics
(src/april_session.c:306-429): the data-dependent `while` loop over emitted
symbols becomes a fixed 3-iteration masked loop over the whole session batch
(the reference's own symbols-per-frame cap, april_session.c:449-454), and all
string-based token tests become table lookups precomputed from the vocabulary
(io/params.py VocabTables). Handler-visible actions are emitted as event
records (events.py) that the host replays.

Heuristics replicated 1:1 (constants in config.DecodeConfig, reference
citations there): early-emit ramp, repeat-token guard, punctuation margin,
digit-dot exception, sentence-forced finalization, 72-token window with
word-split finalize, silence decay, confident-blank provisional emission with
dedup, 2200 ms silence reset with context clearing.

All functions operate on [S, ...] arrays; no data-dependent control flow.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DecodeConfig
from ..io.params import VocabTables
from . import events as ev

NEG_INF = jnp.float32(-1e30)


def vocab_tables_device(vt: VocabTables) -> Dict[str, jnp.ndarray]:
    return {
        "word_boundary": jnp.asarray(vt.word_boundary),
        "single_char": jnp.asarray(vt.single_char),
        "end_sentence": jnp.asarray(vt.end_sentence),
        "punctuation": jnp.asarray(vt.punctuation),
        "starts_digit": jnp.asarray(vt.starts_digit),
        "is_dot": jnp.asarray(vt.is_dot),
    }


def init_decode_state(
    batch: int, context_size: int, joiner_dim: int, blank_id: int, cfg: DecodeConfig
) -> Dict[str, jnp.ndarray]:
    """Per-session decode state, [S, ...] leaves.

    Mirrors struct AprilASRSession_i fields (april_session.h:44-66):
    context/dout/dout_init, active token window + heads, silence/time
    bookkeeping. emitted_silence starts true (april_session.c:64).
    """
    T = cfg.max_active_tokens
    return {
        "context": jnp.full((batch, context_size), blank_id, jnp.int32),
        "dout": jnp.zeros((batch, joiner_dim), jnp.float32),
        "dout_init": jnp.zeros(batch, bool),
        "token_ids": jnp.zeros((batch, T), jnp.int32),
        "token_flags": jnp.zeros((batch, T), jnp.int32),
        "head": jnp.zeros(batch, jnp.int32),
        "last_call": jnp.zeros(batch, jnp.int32),
        "emitted_silence": jnp.ones(batch, bool),
        "time_ms": jnp.zeros(batch, jnp.int32),
        "last_emit_ms": jnp.zeros(batch, jnp.int32),
    }


def _empty_events(batch: int) -> Dict[str, jnp.ndarray]:
    z = jnp.zeros(batch, jnp.int32)
    return {
        "ops": z,
        "tok": z,
        "logprob": jnp.zeros(batch, jnp.float32),
        "flags": z,
        "time_ms": z,
        "final_k": z,
    }


def _finalize_tokens(state, active):
    """aas_finalize_tokens (april_session.c:199-211): FINAL with all tokens,
    reset head, update last_call. Returns (state, ops, final_k)."""
    head = state["head"]
    do = active & (head > 0)
    ops = jnp.where(do, ev.OP_FINAL, 0).astype(jnp.int32)
    final_k = jnp.where(do, head, 0)
    state = dict(state)
    state["last_call"] = jnp.where(do, head, state["last_call"])
    state["head"] = jnp.where(do, 0, head)
    return state, ops, final_k


def _find_start_of_word(token_flags, head):
    """Last index i in (2, head-1] with WORD_BOUNDARY set, else -1
    (april_session.c:222-230 loop: i from head-1 down to 3)."""
    T = token_flags.shape[1]
    pos = jnp.arange(T)[None, :]
    wb = (token_flags & ev.FLAG_WORD_BOUNDARY) != 0
    cand = jnp.where(wb & (pos > 2) & (pos <= head[:, None] - 1), pos, -1)
    return jnp.max(cand, axis=1).astype(jnp.int32)


def _shift_tokens(token_arr, shift, head):
    """memmove semantics (april_session.c:245-250): only the head-shift live
    entries move; slots at and beyond the new head keep their stale values
    (the reference's dedup check reads one such slot, :272-274)."""
    T = token_arr.shape[1]
    pos = jnp.arange(T)[None, :]
    idx = jnp.clip(pos + shift[:, None], 0, T - 1)
    moved = jnp.take_along_axis(token_arr, idx, axis=1)
    live = pos < (head - shift)[:, None]
    return jnp.where(live, moved, token_arr)


def decode_step(
    state: Dict[str, jnp.ndarray],
    logits: jnp.ndarray,
    active: jnp.ndarray,
    early_emit: float,
    blank_id: int,
    vt: Dict[str, jnp.ndarray],
    cfg: DecodeConfig,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """One aas_process_logits step over the batch.

    Returns (new_state, events, is_blank, need_decoder): `need_decoder` marks
    sessions whose context changed (emission or context clear) and therefore
    need a decoder run before the next joiner call — the caller runs the
    decoder batched and merges dout where needed (mirrors aas_update_context
    running the decoder, april_session.c:181-196).
    """
    T = cfg.max_active_tokens
    S = logits.shape[0]
    state = dict(state)
    evt = _empty_events(S)

    # argmax over non-blank logits (april_session.c:311-320)
    masked = logits.at[:, blank_id].set(NEG_INF)
    max_idx = jnp.argmax(masked, axis=1).astype(jnp.int32)
    max_val = jnp.take_along_axis(masked, max_idx[:, None], axis=1)[:, 0]
    blank_val = logits[:, blank_id]

    last_ctx = state["context"][:, -1]
    was_context_cleared = last_ctx == blank_id  # :322
    is_equal_prev = last_ctx == max_idx  # :326
    eff_emit = jnp.where(is_equal_prev, 0.0, jnp.float32(early_emit))  # :327
    is_blank = (blank_val - eff_emit) > max_val  # :330

    # token flags from vocab tables (:338-353)
    wb = vt["word_boundary"][max_idx]
    eos = vt["end_sentence"][max_idx]
    punct = vt["punctuation"][max_idx]

    # digit-dot exception (:345-351)
    head = state["head"]
    prev_tok = jnp.take_along_axis(
        state["token_ids"], jnp.maximum(head - 1, 0)[:, None], axis=1
    )[:, 0]
    digit_exc = (
        punct & (head > 0) & vt["starts_digit"][prev_tok] & vt["is_dot"][max_idx]
    )
    eos = eos & ~digit_exc
    punct = punct & ~digit_exc

    tok_flags = (
        jnp.where(wb, ev.FLAG_WORD_BOUNDARY, 0) | jnp.where(eos, ev.FLAG_SENTENCE_END, 0)
    ).astype(jnp.int32)

    # punctuation boost (:356-358)
    boost = (
        ~was_context_cleared
        & punct
        & ~is_equal_prev
        & (max_val > blank_val - cfg.punctuation_margin)
    )
    is_blank = is_blank & ~boost

    nb = active & ~is_blank  # non-blank (emission) path
    bl = active & is_blank

    # ---- non-blank path (:361-400) --------------------------------------
    state["last_emit_ms"] = jnp.where(nb, state["time_ms"], state["last_emit_ms"])

    # context shift-append (aas_update_context :181-196); decoder run merged later
    new_context = jnp.concatenate(
        [state["context"][:, 1:], max_idx[:, None].astype(jnp.int32)], axis=1
    )
    state["context"] = jnp.where(nb[:, None], new_context, state["context"])
    need_decoder = nb

    is_final = nb & (head >= T - 1)  # :366

    # sentence boundary checks (:369-388)
    prev_flags = jnp.take_along_axis(
        state["token_flags"], jnp.maximum(head - 1, 0)[:, None], axis=1
    )[:, 0]
    check = nb & (head > 0) & wb
    prev_is_eos_char = vt["end_sentence"][prev_tok]  # string test on prev token
    fix_prev = check & prev_is_eos_char & ((prev_flags & ev.FLAG_SENTENCE_END) == 0)
    # set the flag on the stored previous token
    fixed_flags = prev_flags | ev.FLAG_SENTENCE_END
    upd = jnp.where(fix_prev, fixed_flags, prev_flags)
    state["token_flags"] = jnp.where(
        (jnp.arange(T)[None, :] == jnp.maximum(head - 1, 0)[:, None]) & fix_prev[:, None],
        upd[:, None],
        state["token_flags"],
    )
    evt["ops"] = evt["ops"] | jnp.where(fix_prev, ev.OP_FIX_PREV_EOS, 0)
    is_final = is_final | (check & prev_is_eos_char)  # :385-387

    # finalize_previous_words (:213-255, :390)
    start_of_word = _find_start_of_word(state["token_flags"], head)
    # full finalize when the new token starts a word OR no word start found
    full_fin = is_final & (head > 0) & (wb | (start_of_word < 0))
    shift_fin = is_final & (head > 0) & ~wb & (start_of_word >= 0)

    # full finalize: FINAL(head), last_call=head, head=0  (:199-211, :216-218)
    evt["ops"] = evt["ops"] | jnp.where(full_fin, ev.OP_FINAL, 0)
    evt["final_k"] = jnp.where(full_fin, head, evt["final_k"])
    state["last_call"] = jnp.where(full_fin, head, state["last_call"])
    head = jnp.where(full_fin, 0, head)

    # shift finalize: FINAL(start), shift window, head -= start; last_call
    # intentionally NOT updated (matches the reference's omission, :237-253)
    evt["ops"] = evt["ops"] | jnp.where(shift_fin, ev.OP_FINAL, 0)
    evt["final_k"] = jnp.where(shift_fin, start_of_word, evt["final_k"])
    shift = jnp.where(shift_fin, start_of_word, 0)
    state["token_ids"] = _shift_tokens(state["token_ids"], shift, head)
    state["token_flags"] = _shift_tokens(state["token_flags"], shift, head)
    head = jnp.where(shift_fin, head - start_of_word, head)

    # no room even after finalize (:392-396)
    no_room = nb & (head >= T - 1)
    evt["ops"] = evt["ops"] | jnp.where(no_room, ev.OP_RESET_TOKENS, 0)
    head = jnp.where(no_room, 0, head)

    # emit token (force=true) (:398): append + PARTIAL
    append_pos = jnp.clip(head, 0, T - 1)
    pos_mask = (jnp.arange(T)[None, :] == append_pos[:, None]) & nb[:, None]
    state["token_ids"] = jnp.where(pos_mask, max_idx[:, None], state["token_ids"])
    state["token_flags"] = jnp.where(pos_mask, tok_flags[:, None], state["token_flags"])
    head = jnp.where(nb, head + 1, head)
    evt["ops"] = evt["ops"] | jnp.where(nb, ev.OP_APPEND | ev.OP_PARTIAL, 0)
    evt["tok"] = jnp.where(nb, max_idx, evt["tok"])
    evt["logprob"] = jnp.where(nb, max_val, evt["logprob"])
    evt["flags"] = jnp.where(nb, tok_flags, evt["flags"])
    evt["time_ms"] = jnp.where(active, state["time_ms"], evt["time_ms"])
    state["last_call"] = jnp.where(nb, head, state["last_call"])
    state["emitted_silence"] = jnp.where(nb, False, state["emitted_silence"])

    # ---- blank path (:401-426) ------------------------------------------
    t_since = (state["time_ms"] - state["last_emit_ms"]).astype(jnp.float32)
    decayed = max_val - t_since / jnp.float32(cfg.silence_decay_ms)  # :406
    confident = ~is_equal_prev & (decayed > blank_val - cfg.confident_margin)  # :409
    long_sil = t_since >= cfg.long_silence_ms  # :411

    # long silence: finalize + clear context + silence (:413-416)
    ls = bl & long_sil
    fin_do = ls & (head > 0)
    evt["ops"] = evt["ops"] | jnp.where(fin_do, ev.OP_FINAL, 0)
    evt["final_k"] = jnp.where(fin_do, head, evt["final_k"])
    state["last_call"] = jnp.where(fin_do, head, state["last_call"])
    head = jnp.where(fin_do, 0, head)

    # aas_clear_context (:296-301): only when context[0] != blank
    do_clear = ls & (state["context"][:, 0] != blank_id)
    state["context"] = jnp.where(
        do_clear[:, None], jnp.int32(blank_id), state["context"]
    )
    need_decoder = need_decoder | do_clear

    sil_do = ls & ~state["emitted_silence"]
    evt["ops"] = evt["ops"] | jnp.where(sil_do, ev.OP_SILENCE, 0)
    state["emitted_silence"] = jnp.where(ls, True, state["emitted_silence"])

    # confident-blank provisional emission (:417-422) with dedup (:270-283)
    conf = bl & ~long_sil & confident
    tok_at_head = jnp.take_along_axis(
        state["token_ids"], jnp.clip(head, 0, T - 1)[:, None], axis=1
    )[:, 0]
    dedup = (state["last_call"] == head + 1) & (tok_at_head == max_idx)
    conf_emit = conf & ~dedup
    pos_mask2 = (jnp.arange(T)[None, :] == jnp.clip(head, 0, T - 1)[:, None]) & conf_emit[:, None]
    state["token_ids"] = jnp.where(pos_mask2, max_idx[:, None], state["token_ids"])
    state["token_flags"] = jnp.where(pos_mask2, tok_flags[:, None], state["token_flags"])
    evt["ops"] = evt["ops"] | jnp.where(
        conf_emit, ev.OP_APPEND | ev.OP_PARTIAL | ev.OP_POP, 0
    )
    evt["tok"] = jnp.where(conf_emit, max_idx, evt["tok"])
    evt["logprob"] = jnp.where(
        conf_emit, max_val - cfg.confident_logprob_penalty, evt["logprob"]
    )
    evt["flags"] = jnp.where(conf_emit, tok_flags, evt["flags"])
    # handler saw head+1 tokens; head itself is unchanged net of append+pop (:419-421)
    state["last_call"] = jnp.where(conf_emit, head + 1, state["last_call"])

    # bare PARTIAL refresh (:424): emit_token(NULL, false)
    bare = bl & ~long_sil & ~confident & (state["last_call"] != head)
    evt["ops"] = evt["ops"] | jnp.where(bare, ev.OP_PARTIAL, 0)
    state["last_call"] = jnp.where(bare, head, state["last_call"])

    state["head"] = head
    return state, evt, is_blank, need_decoder
