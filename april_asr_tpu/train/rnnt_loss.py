"""RNN-T (transducer) loss in pure JAX.

The reference is inference-only — training happens in icefall and models
arrive via export (reference: extra/export-april.py). This module closes the
loop: the native transducer (models/lstm_transducer.py) can be trained
directly on TPU with the standard full-sum transducer objective
(Graves 2012), so the framework covers the whole model lifecycle.

Implementation notes (TPU-first):
  * the (t, u) lattice alpha recursion runs as a lax.scan over encoder frames
    with the label axis vectorized — O(T) sequential steps of [B, U+1] work,
    MXU-batched joiner evaluation up front
  * log-space arithmetic throughout; padded positions are masked with -inf
    transitions so variable lengths need no dynamic shapes
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def transducer_joint_logprobs(
    logits: jnp.ndarray, labels: jnp.ndarray, blank_id: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """From joint logits [B, T, U+1, V] produce per-transition log-probs.

    Returns (blank_lp [B, T, U+1], label_lp [B, T, U]): log P(blank | t, u)
    and log P(y_{u+1} | t, u).
    """
    lp = jax.nn.log_softmax(logits, axis=-1)
    blank_lp = lp[..., blank_id]
    # label_lp[b, t, u] = lp[b, t, u, labels[b, u]]
    label_lp = jnp.take_along_axis(
        lp[:, :, :-1, :], labels[:, None, :, None], axis=-1
    )[..., 0]
    return blank_lp, label_lp


def rnnt_loss_from_logprobs(
    blank_lp: jnp.ndarray,
    label_lp: jnp.ndarray,
    frame_lens: jnp.ndarray,
    label_lens: jnp.ndarray,
) -> jnp.ndarray:
    """Negative log-likelihood per sequence from transition log-probs.

    blank_lp: [B, T, U+1]; label_lp: [B, T, U]; frame_lens: [B]; label_lens: [B].
    Alpha recursion: alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
    alpha[t, u-1] + label[t, u-1]).
    """
    B, T, U1 = blank_lp.shape
    U = U1 - 1
    u_idx = jnp.arange(U1)

    # mask invalid label positions (u > label_len) with -inf emissions
    label_valid = u_idx[None, :U] < label_lens[:, None]  # [B, U]
    label_lp = jnp.where(label_valid[:, None, :], label_lp, NEG_INF)

    # alpha over u for t=0: only label transitions along u
    def u_scan(alpha_prev_u, lbl):
        a = alpha_prev_u + lbl
        return a, a

    init_alpha = jnp.full((B, U1), NEG_INF).at[:, 0].set(0.0)
    # build alpha[0, u] = sum of label_lp[0, :u]
    first_row = jnp.concatenate(
        [jnp.zeros((B, 1)), jnp.cumsum(label_lp[:, 0, :], axis=-1)], axis=-1
    )
    alpha0 = jnp.where(u_idx[None, :] <= label_lens[:, None], first_row, NEG_INF)

    def t_step(alpha, t):
        # advance from frame t-1 to t: blank from (t-1, u), then label moves
        # within frame t
        from_blank = alpha + blank_lp[:, t - 1, :]
        # label transitions within frame t: alpha'[u] = logaddexp(
        #   from_blank[u], alpha'[u-1] + label_lp[t, u-1]) — an associative
        # scan; U is short (≤ a few hundred), do a lax.scan over u.
        def u_step(carry, inputs):
            fb_u, lbl_u = inputs
            a = jnp.logaddexp(fb_u, carry + lbl_u)
            return a, a

        first = from_blank[:, 0]
        _, rest = jax.lax.scan(
            u_step,
            first,
            (from_blank[:, 1:].T, label_lp[:, t, :].T),
        )
        new_alpha = jnp.concatenate([first[:, None], rest.T], axis=-1)
        # only advance sequences still inside their frame length
        active = (t < frame_lens)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    alphaT, _ = jax.lax.scan(t_step, alpha0, jnp.arange(1, T))

    # final: alpha[frame_len-1, label_len] + blank at (frame_len-1, label_len)
    final_alpha = jnp.take_along_axis(alphaT, label_lens[:, None], axis=1)[:, 0]
    final_blank = blank_lp[jnp.arange(B), frame_lens - 1, label_lens]
    return -(final_alpha + final_blank)


def rnnt_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    frame_lens: jnp.ndarray,
    label_lens: jnp.ndarray,
    blank_id: int,
) -> jnp.ndarray:
    """Full-sum transducer NLL per sequence from joint logits [B,T,U+1,V]."""
    blank_lp, label_lp = transducer_joint_logprobs(logits, labels, blank_id)
    return rnnt_loss_from_logprobs(blank_lp, label_lp, frame_lens, label_lens)
