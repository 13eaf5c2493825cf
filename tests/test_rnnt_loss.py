"""RNN-T loss vs a slow numpy DP oracle; training step sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from april_asr_tpu.train import label_contexts, make_train_step, rnnt_loss


def np_rnnt_nll(log_probs, labels, T, U, blank):
    """Reference DP: log_probs [T, U+1, V] (already log-softmaxed)."""
    NEG = -1e30
    alpha = np.full((T, U + 1), NEG)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            best = NEG
            if t == 0 and u == 0:
                continue
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + log_probs[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1] + log_probs[t, u - 1, labels[u - 1]])
            if cands:
                m = max(cands)
                alpha[t, u] = m + np.log(sum(np.exp(c - m) for c in cands))
    return -(alpha[T - 1, U] + log_probs[T - 1, U, blank])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rnnt_loss_matches_numpy_dp(seed):
    rng = np.random.default_rng(seed)
    B, T, U, V, blank = 3, 7, 4, 11, 0
    logits = rng.normal(size=(B, T, U + 1, V)).astype(np.float32) * 2
    labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
    frame_lens = np.array([T, T - 2, T - 1], np.int32)
    label_lens = np.array([U, U - 1, U - 2], np.int32)

    got = np.asarray(
        rnnt_loss(
            jnp.asarray(logits), jnp.asarray(labels),
            jnp.asarray(frame_lens), jnp.asarray(label_lens), blank,
        )
    )

    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    for b in range(B):
        want = np_rnnt_nll(lp[b], labels[b], int(frame_lens[b]), int(label_lens[b]), blank)
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)


def test_label_contexts():
    labels = jnp.asarray([[5, 6, 7]])
    ctx = np.asarray(label_contexts(labels, blank_id=0, context=2))
    # position u sees [y_{u-1}, y_u] of [blank-padded] sequence
    np.testing.assert_array_equal(ctx[0], [[0, 0], [0, 5], [5, 6], [6, 7]])


def test_train_step_decreases_loss():
    from april_asr_tpu.models import TransducerDims, init_transducer_params

    dims = TransducerDims(
        mel=80, segment_size=9, segment_step=4, d_model=16, hidden=24, ffn=32,
        joiner_dim=16, vocab=20, layers=2, context=2, decoder_groups=4,
        conv_channels=(2, 4, 4),
    )
    params = init_transducer_params(jax.random.PRNGKey(0), dims)
    init_fn, step_fn = make_train_step(dims, blank_id=0)
    state = init_fn(params)
    step = jax.jit(step_fn)

    rng = np.random.default_rng(0)
    B, T, U = 2, 9 + 4 * 7, 5  # 8 encoder windows
    batch = {
        "mel": jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(1, 20, size=(B, U)).astype(np.int32)),
        "frame_lens": jnp.asarray([8, 8], jnp.int32),
        "label_lens": jnp.asarray([5, 4], jnp.int32),
    }
    losses = []
    for _ in range(8):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
