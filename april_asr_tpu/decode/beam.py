"""Batched RNN-T beam search (offline / full-utterance).

The reference ships only greedy decode; beam search is a framework extension
(SURVEY.md §7 build order step 7). This is a time-synchronous beam with the
same symbols-per-frame cap as the reference's greedy loop (<=3 per 40 ms
encoder frame, src/april_session.c:449-454), batched over utterances and
hypotheses so every op is a dense [S, K, ...] tensor op:

  * per frame, up to `max_symbols` expansion rounds; each round scores all
    K x V continuations with one joiner call over the flattened [S*K] axis,
    then takes a global top-K over blank-or-emit candidates;
  * hypotheses whose best continuation is blank are frozen for the rest of
    the frame (their score already includes the blank log-prob);
  * histories live in a fixed [S, K, U_max] window; extending hypothesis j
    from parent k copies the parent row (K is small, the gather is cheap).

Identical histories are RECOMBINED at each frame boundary (within a frame,
different blank/emit interleavings can converge on the same token sequence):
the first occurrence becomes the representative and absorbs the others'
probability mass via log-sum-exp, freeing their beam slots for distinct
hypotheses. Scores are log-softmax sums, higher is better.

The per-frame expansion round is exposed as `beam_expand_round` so the
streaming engine (engine/beam_engine.py) drives the exact same math per
fbank pull with carried [S, K] hypothesis state in HBM.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.float32(-1.0e30)


@dataclasses.dataclass(frozen=True)
class BeamConfig:
    beam: int = 4
    max_symbols_per_frame: int = 3  # reference cap, april_session.c:449
    max_tokens: int = 512  # history capacity
    recombine: bool = True  # merge identical histories at frame boundaries


def beam_expand_round(
    weights,
    state,
    eout_f: jnp.ndarray,
    can_expand: jnp.ndarray,
    frame_ok: jnp.ndarray,
    decoder_step: Callable,
    joiner: Callable,
    blank_id: int,
):
    """One expansion round within a frame, shared by the offline search and
    the streaming engine. state: {scores [S,K], context [S,K,ctx], dout
    [S,K,J], tokens [S,K,U], lengths [S,K]}; can_expand [S,K]; frame_ok [S].
    Returns (new_state, next_can_expand)."""
    S, K = state["scores"].shape
    U = state["tokens"].shape[2]
    scores, context, dout = state["scores"], state["context"], state["dout"]
    logits = joiner(
        weights,
        jnp.broadcast_to(eout_f[:, None, :], dout.shape).reshape(-1, dout.shape[-1]),
        dout.reshape(-1, dout.shape[-1]),
    )
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1).reshape(S, K, V)

    # frozen hypotheses (blank already taken this frame, or invalid frame)
    # contribute exactly one candidate: themselves, unchanged.
    cand = scores[:, :, None] + jnp.where(can_expand[:, :, None], logp, NEG_INF)
    # a frozen hyp's self-candidate is encoded in the blank column with
    # score = its current score (no extra cost)
    self_col = jnp.where(can_expand, NEG_INF, scores)
    cand = cand.at[:, :, blank_id].set(
        jnp.where(can_expand, cand[:, :, blank_id], self_col)
    )

    flat = cand.reshape(S, K * V)
    top_scores, top_idx = jax.lax.top_k(flat, K)  # [S, K]
    src = (top_idx // V).astype(jnp.int32)  # parent hypothesis
    tok = (top_idx % V).astype(jnp.int32)  # chosen symbol
    is_blank = tok == blank_id

    take = lambda arr: jnp.take_along_axis(  # noqa: E731
        arr, src.reshape(src.shape + (1,) * (arr.ndim - 2)), axis=1
    )
    context = take(state["context"])
    dout = take(state["dout"])
    tokens = take(state["tokens"])
    lengths = jnp.take_along_axis(state["lengths"], src, axis=1)
    parent_frozen = ~jnp.take_along_axis(can_expand, src, axis=1)

    emit = ~is_blank & frame_ok[:, None]
    # append token where emitted
    posu = jnp.arange(U, dtype=jnp.int32)[None, None, :]
    app = (posu == lengths[:, :, None]) & emit[:, :, None]
    tokens = jnp.where(app, tok[:, :, None], tokens)
    lengths = lengths + emit.astype(jnp.int32)
    new_ctx = jnp.concatenate([context[:, :, 1:], tok[:, :, None]], axis=2)
    context = jnp.where(emit[:, :, None], new_ctx, context)
    new_dout = decoder_step(weights, context.reshape(S * K, -1)).reshape(dout.shape)
    dout = jnp.where(emit[:, :, None], new_dout, dout)

    scores = jnp.where(frame_ok[:, None], top_scores, state["scores"])
    next_can = emit & ~parent_frozen
    new_state = {
        "scores": scores,
        "context": jnp.where(frame_ok[:, None, None], context, state["context"]),
        "dout": jnp.where(frame_ok[:, None, None], dout, state["dout"]),
        "tokens": jnp.where(frame_ok[:, None, None], tokens, state["tokens"]),
        "lengths": jnp.where(frame_ok[:, None], lengths, state["lengths"]),
    }
    return new_state, next_can


def recombine_identical(state):
    """Merge hypotheses with identical token histories: the first (lowest
    index) member of each group absorbs the others' probability mass via
    log-sum-exp; the rest drop to NEG_INF, freeing their beam slots at the
    next expansion. Decoder context/dout of merged members are identical by
    construction, so only scores change."""
    tokens, lengths, scores = state["tokens"], state["lengths"], state["scores"]
    S, K, U = tokens.shape
    eq_len = lengths[:, :, None] == lengths[:, None, :]  # [S, K, K]
    valid = (
        jnp.arange(U, dtype=jnp.int32)[None, None, None, :]
        < lengths[:, :, None, None]
    )  # [S, K, 1, U]
    tok_eq = (tokens[:, :, None, :] == tokens[:, None, :, :]) | ~valid
    eq = eq_len & tok_eq.all(axis=-1)  # [S, K, K] symmetric
    rep = jnp.argmax(eq, axis=2)  # first j with eq[i, j] == min equal index
    is_rep = rep == jnp.arange(K, dtype=rep.dtype)[None, :]
    # live-mass guard: dead slots (NEG_INF) merge among themselves harmlessly
    merged = jax.nn.logsumexp(
        jnp.where(eq, scores[:, None, :], NEG_INF), axis=2
    )
    new_scores = jnp.where(is_rep, merged, NEG_INF)
    out = dict(state)
    out["scores"] = new_scores
    return out


def beam_search(
    weights,
    eouts: jnp.ndarray,
    frame_mask: jnp.ndarray,
    decoder_step: Callable,
    joiner: Callable,
    context_size: int,
    blank_id: int,
    cfg: BeamConfig = BeamConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode [S, W, J] encoder outputs into token sequences.

    Args:
      weights: model params pytree.
      eouts: [S, W, J] per-window encoder outputs (encoder_seq).
      frame_mask: [S, W] bool, True for valid windows.
      decoder_step: (weights, context [N, ctx]) -> dout [N, J].
      joiner: (weights, eout [N, J], dout [N, J]) -> logits [N, V].
      context_size, blank_id: transducer decode parameters.

    Returns:
      tokens [S, U_max] int32 (best hypothesis, left-aligned),
      lengths [S] int32,
      scores [S] float32 (sum of log-probs of the best hypothesis).
    """
    S, W, J = eouts.shape
    K = cfg.beam
    U = cfg.max_tokens

    ctx0 = jnp.full((S, K, context_size), blank_id, jnp.int32)
    dout0 = decoder_step(weights, ctx0.reshape(S * K, context_size)).reshape(S, K, -1)
    state = {
        "scores": jnp.concatenate(
            [jnp.zeros((S, 1)), jnp.full((S, K - 1), NEG_INF)], axis=1
        ),
        "context": ctx0,
        "dout": dout0,
        "tokens": jnp.zeros((S, K, U), jnp.int32),
        "lengths": jnp.zeros((S, K), jnp.int32),
    }

    def frame_body(state, xs):
        eout_f, frame_ok = xs
        can = jnp.broadcast_to(frame_ok[:, None], (S, K))
        for _ in range(cfg.max_symbols_per_frame):
            state, can = beam_expand_round(
                weights, state, eout_f, can, frame_ok, decoder_step, joiner,
                blank_id,
            )
        if cfg.recombine:
            state = recombine_identical(state)
        return state, ()

    state, _ = jax.lax.scan(
        frame_body,
        state,
        (jnp.swapaxes(eouts, 0, 1), jnp.swapaxes(frame_mask, 0, 1)),
    )

    best = jnp.argmax(state["scores"], axis=1)
    bsel = lambda arr: jnp.take_along_axis(  # noqa: E731
        arr, best.reshape((-1,) + (1,) * (arr.ndim - 1)), axis=1
    )[:, 0]
    return (
        bsel(state["tokens"]),
        bsel(state["lengths"]),
        bsel(state["scores"]),
    )


def greedy_offline(
    weights,
    eouts: jnp.ndarray,
    frame_mask: jnp.ndarray,
    decoder_step: Callable,
    joiner: Callable,
    context_size: int,
    blank_id: int,
    max_symbols: int = 3,
    max_tokens: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plain argmax RNN-T decode (no april heuristics) — the beam=1 oracle."""
    S, W, J = eouts.shape
    U = max_tokens
    state = {
        "context": jnp.full((S, context_size), blank_id, jnp.int32),
        "tokens": jnp.zeros((S, U), jnp.int32),
        "lengths": jnp.zeros(S, jnp.int32),
    }
    state["dout"] = decoder_step(weights, state["context"])

    def frame_body(state, xs):
        eout_f, frame_ok = xs
        can = frame_ok
        for _ in range(max_symbols):
            logits = joiner(weights, eout_f, state["dout"])
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tok = jnp.argmax(logp, axis=-1).astype(jnp.int32)
            emit = can & (tok != blank_id)
            posu = jnp.arange(U, dtype=jnp.int32)[None, :]
            app = (posu == state["lengths"][:, None]) & emit[:, None]
            state = dict(state)
            state["tokens"] = jnp.where(app, tok[:, None], state["tokens"])
            state["lengths"] = state["lengths"] + emit.astype(jnp.int32)
            new_ctx = jnp.concatenate([state["context"][:, 1:], tok[:, None]], axis=1)
            state["context"] = jnp.where(emit[:, None], new_ctx, state["context"])
            new_dout = decoder_step(weights, state["context"])
            state["dout"] = jnp.where(emit[:, None], new_dout, state["dout"])
            can = emit
        return state, ()

    state, _ = jax.lax.scan(
        frame_body,
        state,
        (jnp.swapaxes(eouts, 0, 1), jnp.swapaxes(frame_mask, 0, 1)),
    )
    return state["tokens"], state["lengths"]
