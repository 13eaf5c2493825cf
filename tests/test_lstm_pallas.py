"""Fused Pallas LSTM layer kernel vs the pure-XLA layer body.

Runs in interpret mode on CPU (tests force JAX_PLATFORMS=cpu in conftest);
on TPU the same kernel compiles via Mosaic. Tolerances are loose enough for
bf16 weights, tight for f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from april_asr_tpu.models import lstm_transducer as M
from april_asr_tpu.ops.lstm_pallas import lstm_layer_fused, supported_dims


def _layer_args(dtype, S=128, d=128, H=256, F=256, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: rng.normal(size=s).astype(np.float32) * 0.1
    x = jnp.asarray(f(S, d))
    h = jnp.asarray(f(S, d))
    c = jnp.asarray(f(S, H))
    w = {
        "w_ih_t": jnp.asarray(f(d, 4 * H)).astype(dtype),
        "w_hh_t": jnp.asarray(f(d, 4 * H)).astype(dtype),
        "bias": jnp.asarray(f(4 * H)),
        "w_hr_t": jnp.asarray(f(H, d)).astype(dtype),
        "ff1_t": jnp.asarray(f(d, F)).astype(dtype),
        "ff1_b": jnp.asarray(f(F)),
        "ff2_t": jnp.asarray(f(F, d)).astype(dtype),
        "ff2_b": jnp.asarray(f(d)),
        "eps": jnp.float32(0.25),
    }
    return x, h, c, w


def _pure_layer(x, h, c, w):
    gates = (
        M._mm(x, w["w_ih_t"]) + M._mm(h, w["w_hh_t"]) + w["bias"].astype(jnp.float32)
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    hc = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    h_new = M._mm(hc, w["w_hr_t"])
    y = x + h_new
    ff = (
        M._mm(
            M._double_swish(M._mm(y, w["ff1_t"]) + w["ff1_b"].astype(jnp.float32)),
            w["ff2_t"],
        )
        + w["ff2_b"].astype(jnp.float32)
    )
    return M._basic_norm(y + ff, w["eps"]), h_new, c_new


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-5), (jnp.bfloat16, 5e-2)])
def test_fused_layer_matches_pure(dtype, atol):
    x, h, c, w = _layer_args(dtype)
    y0, h0, c0 = _pure_layer(x, h, c, w)
    y1, h1, c1 = lstm_layer_fused(
        x, h, c, w["w_ih_t"], w["w_hh_t"], w["bias"], w["w_hr_t"],
        w["ff1_t"], w["ff1_b"], w["ff2_t"], w["ff2_b"], w["eps"],
        block_s=64, interpret=jax.default_backend() != "tpu",
    )
    for a, b in ((y0, y1), (h0, h1), (c0, c1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=1e-3)


def test_stack_step_pallas_matches_pure(monkeypatch):
    """Full 3-layer stack: forced-pallas path (interpreted) vs pure scan."""
    dims = M.TransducerDims(
        mel=80, segment_size=9, d_model=128, hidden=256, ffn=256,
        joiner_dim=128, vocab=128, layers=3, decoder_groups=32,
        conv_channels=(4, 8, 8),
    )
    params = M.init_transducer_params(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(1)
    S = 128
    x = jnp.asarray(rng.normal(size=(S, dims.d_model)).astype(np.float32) * 0.2)
    h = jnp.asarray(rng.normal(size=(dims.layers, S, dims.d_model)).astype(np.float32) * 0.1)
    c = jnp.asarray(rng.normal(size=(dims.layers, S, dims.hidden)).astype(np.float32) * 0.1)

    monkeypatch.setenv("APRIL_PALLAS", "0")
    y0, h0, c0 = M._lstm_stack_step(params, x, h, c)
    monkeypatch.setenv("APRIL_PALLAS", "1")
    assert supported_dims(S, dims.d_model, dims.hidden, dims.ffn, 128)
    y1, h1, c1 = M._lstm_stack_step(params, x, h, c)
    for a, b in ((y0, y1), (h0, h1), (c0, c1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3)


def test_stack_step_gate(monkeypatch):
    """Gated stack step keeps carried h/c for masked sessions in both paths."""
    dims = M.TransducerDims(
        mel=80, segment_size=9, d_model=128, hidden=256, ffn=256,
        joiner_dim=128, vocab=128, layers=2, decoder_groups=32,
        conv_channels=(4, 8, 8),
    )
    params = M.init_transducer_params(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(2)
    S = 128
    x = jnp.asarray(rng.normal(size=(S, dims.d_model)).astype(np.float32) * 0.2)
    h = jnp.asarray(rng.normal(size=(dims.layers, S, dims.d_model)).astype(np.float32) * 0.1)
    c = jnp.asarray(rng.normal(size=(dims.layers, S, dims.hidden)).astype(np.float32) * 0.1)
    gate = jnp.asarray(rng.integers(0, 2, S).astype(bool))

    for mode in ("0", "1"):
        monkeypatch.setenv("APRIL_PALLAS", mode)
        y, h2, c2 = M._lstm_stack_step(params, x, h, c, gate)
        yn, hn, cn = M._lstm_stack_step(params, x, h, c, None)
        g = np.asarray(gate)
        np.testing.assert_allclose(np.asarray(h2)[:, g], np.asarray(hn)[:, g], atol=1e-6)
        np.testing.assert_allclose(np.asarray(c2)[:, g], np.asarray(cn)[:, g], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(h2)[:, ~g], np.asarray(h)[:, ~g])
        np.testing.assert_array_equal(np.asarray(c2)[:, ~g], np.asarray(c)[:, ~g])
        # y is computed regardless of the gate (callers mask downstream)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yn), atol=1e-6)


def test_pallas_disabled_context(monkeypatch):
    monkeypatch.setenv("APRIL_PALLAS", "1")
    assert M._pallas_wanted()
    with M.pallas_disabled():
        assert not M._pallas_wanted()
    assert M._pallas_wanted()


def test_stack_chunk_pallas_matches_pure(monkeypatch):
    """Whole-chunk fused kernel (time loop in-kernel) vs the pure layer-major
    scan, including per-session prefix participation masks."""
    dims = M.TransducerDims(
        mel=80, segment_size=9, d_model=128, hidden=256, ffn=256,
        joiner_dim=128, vocab=128, layers=3, decoder_groups=32,
        conv_channels=(4, 8, 8),
    )
    params = M.init_transducer_params(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(3)
    S, P = 128, 4
    y = jnp.asarray(rng.normal(size=(P, S, dims.d_model)).astype(np.float32) * 0.2)
    h = jnp.asarray(rng.normal(size=(dims.layers, S, dims.d_model)).astype(np.float32) * 0.1)
    c = jnp.asarray(rng.normal(size=(dims.layers, S, dims.hidden)).astype(np.float32) * 0.1)
    n_pulls = jnp.asarray(rng.integers(0, P + 1, S).astype(np.int32))
    can = jnp.arange(P)[:, None] < n_pulls[None, :]

    monkeypatch.setenv("APRIL_PALLAS", "0")
    y0, h0, c0 = M._lstm_stack_chunk(params, y, h, c, can)
    # direct call: the auto path only picks the kernel at P >= CHUNK_MIN_PULLS
    y1, h1, c1 = M._lstm_stack_chunk_pallas(params, y, h, c, can, block_s=64)
    live = np.asarray(can)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(y0) * live, np.asarray(y1) * live, atol=2e-5, rtol=1e-3
    )
    for a, b in ((h0, h1), (c0, c1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3)

    # ungated
    y0, h0, c0 = M._lstm_stack_chunk(params, y, h, c)
    y1, h1, c1 = M._lstm_stack_chunk_pallas(params, y, h, c, None, block_s=64)
    for a, b in ((y0, y1), (h0, h1), (c0, c1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-3)


def test_joiner_argmax_fused_matches_prologue(monkeypatch):
    """Fused joiner+argmax kernel vs joiner_logits + XLA greedy prologue."""
    from april_asr_tpu.decode.greedy import greedy_prologue

    dims = M.TransducerDims(
        mel=80, segment_size=9, d_model=128, hidden=256, ffn=256,
        joiner_dim=128, vocab=77, layers=2, decoder_groups=32,
        conv_channels=(4, 8, 8),
    )
    params = M.init_transducer_params(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(5)
    S = 128
    eout = jnp.asarray(rng.normal(size=(S, dims.joiner_dim)).astype(np.float32))
    dout = jnp.asarray(rng.normal(size=(S, dims.joiner_dim)).astype(np.float32))
    blank = 0

    monkeypatch.setenv("APRIL_PALLAS", "0")
    ref = M.joiner_argmax(params, eout, dout, blank)
    ref2 = greedy_prologue(M.joiner_logits(params, eout, dout), blank)
    for a, b in zip(ref, ref2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    monkeypatch.setenv("APRIL_PALLAS", "1")
    got = M.joiner_argmax(params, eout, dout, blank)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]), atol=2e-5, rtol=1e-5)

    # bf16 weights path
    wp = M.cast_weights(params, jnp.bfloat16)
    monkeypatch.setenv("APRIL_PALLAS", "0")
    ref = M.joiner_argmax(wp, eout, dout, blank)
    monkeypatch.setenv("APRIL_PALLAS", "1")
    got = M.joiner_argmax(wp, eout, dout, blank)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=1e-4, rtol=1e-4)
