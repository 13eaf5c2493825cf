"""Batched JAX streaming fbank vs the NumPy oracle (which itself is validated
against golden vectors from the compiled reference C code)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from april_asr_tpu.config import FbankOptions
from april_asr_tpu.frontend import OracleFbank
from april_asr_tpu.frontend.fbank import (
    FbankLayout,
    fbank_accept,
    fbank_advance,
    fbank_can_pull,
    fbank_flush_pad,
    fbank_init,
    fbank_peek,
)

OPTS = FbankOptions()


def make_wave(n, kind="mixed", seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / OPTS.sample_freq
    if kind == "sine":
        return (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    return (
        0.25 * np.sin(2 * np.pi * 300 * t)
        + rng.uniform(-0.1, 0.1, n)
        + 0.05
    ).astype(np.float32)


def run_oracle(wave, chunk, do_flush=False):
    fb = OracleFbank(OPTS)
    segs = []
    for off in range(0, len(wave), chunk):
        fb.accept_waveform(wave[off : off + chunk])
        while (s := fb.pull_segments()) is not None:
            segs.append(s)
    if do_flush:
        while fb.flush():
            got = False
            while (s := fb.pull_segments()) is not None:
                segs.append(s)
                got = True
            if not got and len(fb.fifo) >= 9:
                break
    return np.stack(segs) if segs else np.zeros((0, 9, 80), np.float32)


def run_jax(wave, chunk, do_flush=False):
    layout = FbankLayout.build(OPTS, chunk)
    accept = jax.jit(lambda s, w, n: fbank_accept(layout, s, w, n))
    state = fbank_init(layout)
    segs = []

    def drain(state):
        while bool(fbank_can_pull(layout, state)):
            segs.append(np.asarray(fbank_peek(layout, state)))
            state = fbank_advance(layout, state, jnp.bool_(True))
        return state

    for off in range(0, len(wave), chunk):
        piece = wave[off : off + chunk]
        n = len(piece)
        padded = np.zeros(chunk, np.float32)
        padded[:n] = piece
        state = accept(state, jnp.asarray(padded), jnp.int32(n))
        state = drain(state)
    if do_flush:
        while True:
            state, did = fbank_flush_pad(layout, state)
            if not bool(did):
                break
            before = len(segs)
            state = drain(state)
            if len(segs) == before and not bool(fbank_can_pull(layout, state)):
                continue
    return np.stack(segs) if segs else np.zeros((0, 9, 80), np.float32)


@pytest.mark.parametrize("chunk", [3200, 1000, 777])
def test_jax_matches_oracle_streaming(chunk):
    wave = make_wave(12345)
    ref = run_oracle(wave, chunk)
    got = run_jax(wave, chunk)
    assert got.shape == ref.shape
    # float32 FFT vs the oracle/reference float64 FFT.
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=0)


def test_jax_matches_oracle_with_flush():
    wave = make_wave(7000)
    ref = run_oracle(wave, 777, do_flush=True)
    got = run_jax(wave, 777, do_flush=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=0)


def test_vmapped_sessions_with_ragged_feeds():
    """Four sessions with different per-step sample counts must match four
    independent oracle runs."""
    chunk = 3200
    layout = FbankLayout.build(OPTS, chunk)
    S = 4
    waves = [make_wave(9000, seed=i) for i in range(S)]
    # Ragged: session i gets i*700 samples per step.
    feeds = [min(3200, 700 * (i + 1)) for i in range(S)]

    accept = jax.jit(jax.vmap(lambda s, w, n: fbank_accept(layout, s, w, n)))
    peek = jax.vmap(lambda s: fbank_peek(layout, s))
    can = jax.vmap(lambda s: fbank_can_pull(layout, s))
    adv = jax.jit(jax.vmap(lambda s, d: fbank_advance(layout, s, d)))

    states = jax.vmap(lambda _: fbank_init(layout))(jnp.arange(S))
    oracles = [OracleFbank(OPTS) for _ in range(S)]
    got_segs = [[] for _ in range(S)]
    ref_segs = [[] for _ in range(S)]
    heads = [0] * S

    for step in range(12):
        batch = np.zeros((S, chunk), np.float32)
        ns = np.zeros(S, np.int32)
        for i in range(S):
            piece = waves[i][heads[i] : heads[i] + feeds[i]]
            batch[i, : len(piece)] = piece
            ns[i] = len(piece)
            heads[i] += len(piece)
            if len(piece):
                oracles[i].accept_waveform(piece)
            while (s := oracles[i].pull_segments()) is not None:
                ref_segs[i].append(s)
        states = accept(states, jnp.asarray(batch), jnp.asarray(ns))
        while True:
            cans = np.asarray(can(states))
            if not cans.any():
                break
            xs = np.asarray(peek(states))
            for i in range(S):
                if cans[i]:
                    got_segs[i].append(xs[i])
            states = adv(states, jnp.asarray(cans))

    for i in range(S):
        assert len(got_segs[i]) == len(ref_segs[i]), f"session {i}"
        if got_segs[i]:
            np.testing.assert_allclose(
                np.stack(got_segs[i]), np.stack(ref_segs[i]), atol=2e-3, rtol=0
            )


def test_overflow_drops_and_counts():
    """FIFO overflow must drop input, keep stale leftover, and count the event
    (fbank.c:190-193 behavior)."""
    chunk = 3200
    layout = FbankLayout.build(OPTS, chunk, fifo_rows=16)
    state = fbank_init(layout)
    wave = jnp.asarray(make_wave(chunk))
    accept = jax.jit(lambda s, w, n: fbank_accept(layout, s, w, n))
    state = accept(state, wave, jnp.int32(chunk))
    assert int(state["dropped"]) == 1  # 20 frames don't fit in 16 rows
    assert int(state["fifo_len"]) == 16
