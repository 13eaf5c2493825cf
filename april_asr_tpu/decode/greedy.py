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

Performance notes (this step runs up to 3x per 40 ms frame for every session,
fused into the engine program — it must cost microseconds, not milliseconds):
  * token id+flags are packed into ONE int32 word array (ids < 16384 by the
    params validation, src/params.c:76), halving the window traffic
  * no gather/scatter HLOs: per-row reads are one-hot masked reductions and
    per-row writes are masked selects — these fuse into a handful of
    elementwise kernels on TPU, where gather is slow
  * the window shift uses an exact f32 one-hot contraction (values < 2^24)

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

# token word packing: id | flags << FLAG_SHIFT
FLAG_SHIFT = 16


# bit layout of the packed per-token property mask
MASK_WB, MASK_EOS, MASK_PUNCT, MASK_DIGIT, MASK_DOT = 1, 2, 4, 8, 16


def vocab_tables_device(vt: VocabTables) -> Dict[str, np.ndarray]:
    """Numpy constant tables: under jit they fold into the program at lowering
    (device arrays here would force device->host reads during tracing).

    All per-token boolean properties are packed into ONE int32 bitmask table
    so each decode step does one [S] gather per token operand instead of
    five."""
    mask = (
        np.asarray(vt.word_boundary, np.int32) * MASK_WB
        | np.asarray(vt.end_sentence, np.int32) * MASK_EOS
        | np.asarray(vt.punctuation, np.int32) * MASK_PUNCT
        | np.asarray(vt.starts_digit, np.int32) * MASK_DIGIT
        | np.asarray(vt.is_dot, np.int32) * MASK_DOT
    )
    return {
        "mask": mask,
        "single_char": np.asarray(vt.single_char),
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
        # lazy-dout carry for the fused decoder+joiner path: True marks
        # sessions whose context changed after `dout` was last computed, so
        # the NEXT inner-decode iteration must refresh dout before the
        # joiner (see models/lstm_transducer.decoder_joiner_argmax)
        "need_dec": jnp.zeros(batch, bool),
        "token_words": jnp.zeros((batch, T), jnp.int32),
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


def _row_gather(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """arr[s, idx[s]] as a one-hot masked reduction (no gather HLO)."""
    pos = jnp.arange(arr.shape[1], dtype=jnp.int32)[None, :]
    return jnp.sum(jnp.where(pos == idx[:, None], arr, 0), axis=1)


def _shift_left(words: jnp.ndarray, shift: jnp.ndarray, head: jnp.ndarray) -> jnp.ndarray:
    """memmove semantics (april_session.c:245-250): entries [0, head-shift)
    take words[i+shift]; slots at and beyond the new head keep their stale
    values (the reference's dedup check reads one such slot, :272-274).

    Implemented as a barrel shifter: log2(T) rounds of constant-offset rolls
    selected by the shift's bits. Row-indexed gathers (take_along_axis) cost
    ~0.7 ms per call on TPU for [S, 72] at S=1024 and this runs 3x per pull;
    the rolls are pure elementwise selects that fuse to microseconds.
    Wrapped-around lanes land at and beyond the new head, where `live`
    masks them off."""
    T = words.shape[1]
    pos = jnp.arange(T, dtype=jnp.int32)
    moved = words
    b = 1
    while b < T:
        rolled = jnp.roll(moved, -b, axis=1)
        moved = jnp.where((shift & b)[:, None] != 0, rolled, moved)
        b <<= 1
    live = pos[None, :] < (head - shift)[:, None]
    return jnp.where(live, moved, words)


def greedy_prologue(
    logits: jnp.ndarray, blank_id: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[S, V] logits -> (max_idx, max_val, blank_val), the only three values
    the greedy heuristics consume (april_session.c:311-320). Split out so
    native models can compute them fused with the joiner matmul
    (ops/joiner_pallas.py) without materializing logits in HBM."""
    V = logits.shape[1]
    vocab_iota = jnp.arange(V, dtype=jnp.int32)[None, :]
    masked = jnp.where(vocab_iota == blank_id, NEG_INF, logits)
    return (
        jnp.argmax(masked, axis=1).astype(jnp.int32),
        jnp.max(masked, axis=1),
        logits[:, blank_id],
    )


def decode_step(
    state: Dict[str, jnp.ndarray],
    logits: jnp.ndarray,
    active: jnp.ndarray,
    early_emit: float,
    blank_id: int,
    vt: Dict[str, np.ndarray],
    cfg: DecodeConfig,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """One aas_process_logits step over the batch (logits form)."""
    max_idx, max_val, blank_val = greedy_prologue(logits, blank_id)
    return decode_step_pre(
        state, max_idx, max_val, blank_val, active, early_emit, blank_id, vt, cfg
    )


def decode_step_pre(
    state: Dict[str, jnp.ndarray],
    max_idx: jnp.ndarray,
    max_val: jnp.ndarray,
    blank_val: jnp.ndarray,
    active: jnp.ndarray,
    early_emit: float,
    blank_id: int,
    vt: Dict[str, np.ndarray],
    cfg: DecodeConfig,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """One aas_process_logits step over the batch, from the precomputed
    (max_idx, max_val, blank_val) prologue.

    Returns (new_state, events, is_blank, need_decoder): `need_decoder` marks
    sessions whose context changed (emission or context clear) and therefore
    need a decoder run before the next joiner call — the caller runs the
    decoder batched and merges dout where needed (mirrors aas_update_context
    running the decoder, april_session.c:181-196).
    """
    T = cfg.max_active_tokens
    S = max_idx.shape[0]
    state = dict(state)
    evt = _empty_events(S)
    pos = jnp.arange(T, dtype=jnp.int32)[None, :]  # [1, T]

    # fold the packed numpy bitmask table into the trace as a constant
    t_mask = jnp.asarray(vt["mask"])

    last_ctx = state["context"][:, -1]
    was_context_cleared = last_ctx == blank_id  # :322
    is_equal_prev = last_ctx == max_idx  # :326
    eff_emit = jnp.where(is_equal_prev, 0.0, jnp.float32(early_emit))  # :327
    is_blank = (blank_val - eff_emit) > max_val  # :330

    # token flags from the packed vocab bitmask (:338-353)
    mask_max = t_mask[max_idx]
    wb = (mask_max & MASK_WB) != 0
    eos = (mask_max & MASK_EOS) != 0
    punct = (mask_max & MASK_PUNCT) != 0

    # digit-dot exception (:345-351); previous token read is a one-hot reduce
    head = state["head"]
    words = state["token_words"]
    prev_word = _row_gather(words, jnp.maximum(head - 1, 0))
    prev_tok = prev_word & ((1 << FLAG_SHIFT) - 1)
    prev_flags = prev_word >> FLAG_SHIFT
    mask_prev = t_mask[prev_tok]
    digit_exc = (
        punct
        & (head > 0)
        & ((mask_prev & MASK_DIGIT) != 0)
        & ((mask_max & MASK_DOT) != 0)
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
        [state["context"][:, 1:], max_idx[:, None]], axis=1
    )
    state["context"] = jnp.where(nb[:, None], new_context, state["context"])
    need_decoder = nb

    is_final = nb & (head >= T - 1)  # :366

    # sentence boundary checks (:369-388)
    check = nb & (head > 0) & wb
    prev_is_eos_char = (mask_prev & MASK_EOS) != 0  # string test on prev token
    fix_prev = check & prev_is_eos_char & ((prev_flags & ev.FLAG_SENTENCE_END) == 0)
    # set SENTENCE_END on the stored previous token (packed flag bit)
    fix_mask = (pos == jnp.maximum(head - 1, 0)[:, None]) & fix_prev[:, None]
    words = jnp.where(fix_mask, words | (ev.FLAG_SENTENCE_END << FLAG_SHIFT), words)
    evt["ops"] = evt["ops"] | jnp.where(fix_prev, ev.OP_FIX_PREV_EOS, 0)
    is_final = is_final | (check & prev_is_eos_char)  # :385-387

    # finalize_previous_words (:213-255, :390): find last word start in (2, head)
    wb_bits = (words >> FLAG_SHIFT) & ev.FLAG_WORD_BOUNDARY
    cand = jnp.where(
        (wb_bits != 0) & (pos > 2) & (pos <= head[:, None] - 1), pos, -1
    )
    start_of_word = jnp.max(cand, axis=1)

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
    words = _shift_left(words, shift, head)
    head = jnp.where(shift_fin, head - start_of_word, head)

    # no room even after finalize (:392-396)
    no_room = nb & (head >= T - 1)
    evt["ops"] = evt["ops"] | jnp.where(no_room, ev.OP_RESET_TOKENS, 0)
    head = jnp.where(no_room, 0, head)

    # emit token (force=true) (:398): append + PARTIAL
    new_word = max_idx | (tok_flags << FLAG_SHIFT)
    append_mask = (pos == jnp.clip(head, 0, T - 1)[:, None]) & nb[:, None]
    words = jnp.where(append_mask, new_word[:, None], words)
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

    # confident-blank provisional emission (:417-422) with dedup (:270-283):
    # the stale slot at `head` is read via a one-hot reduce
    conf = bl & ~long_sil & confident
    stale_tok = _row_gather(words, jnp.clip(head, 0, T - 1)) & ((1 << FLAG_SHIFT) - 1)
    dedup = (state["last_call"] == head + 1) & (stale_tok == max_idx)
    conf_emit = conf & ~dedup
    conf_mask = (pos == jnp.clip(head, 0, T - 1)[:, None]) & conf_emit[:, None]
    words = jnp.where(conf_mask, new_word[:, None], words)
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

    state["token_words"] = words
    state["head"] = head
    return state, evt, is_blank, need_decoder
