"""int8 quantized encoder path: kernel/XLA parity + quantization error bounds.

The serving int8 path (models/lstm_transducer.quantize_weights) has three
implementations that must agree: the XLA per-pull scan (`_lstm_stack_step_q8`),
the XLA chunk form (`_lstm_stack_chunk_q8`), and the fused Pallas chunk kernel
(ops/lstm_pallas.lstm_layer_chunk_fused_i8, interpret mode on CPU). All three
quantize activations per row with the same formula and accumulate in exact
int32, so they agree to f32 rounding of the dequantization — far tighter than
the bf16 kernel's tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from april_asr_tpu.models import lstm_transducer as M

# dims chosen 128-divisible so the Pallas chunk kernel's tiling constraints
# (ops/lstm_pallas.supported_dims) are met on the interpret path
DIMS = M.TransducerDims(
    mel=80, segment_size=9, segment_step=4, d_model=128, hidden=128, ffn=128,
    joiner_dim=128, vocab=128, layers=3, context=2, decoder_groups=32,
    conv_channels=(4, 8, 8),
)
S = 128
P = 12  # >= CHUNK_MIN_PULLS so the chunk kernel engages


@pytest.fixture(scope="module")
def qparams():
    params = M.init_transducer_params(jax.random.PRNGKey(7), DIMS)
    return M.quantize_weights(params)


@pytest.fixture(scope="module")
def inputs():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    y = jax.random.normal(k1, (P, S, DIMS.d_model), jnp.float32)
    h = jax.random.normal(k2, (DIMS.layers, S, DIMS.d_model), jnp.float32) * 0.3
    c = jax.random.normal(k3, (DIMS.layers, S, DIMS.hidden), jnp.float32) * 0.3
    return y, h, c


def test_quantize_weights_shapes_and_idempotence(qparams):
    quantized = [n for n in M.QUANT_TARGETS if n in qparams]
    assert len(quantized) == 5  # the LSTM family's five layer matrices
    for name in quantized:
        q = qparams[name + "_q8"]
        s = qparams[name + "_q8s"]
        assert q.dtype == jnp.int8
        assert q.shape == qparams[name].shape
        assert s.shape == (q.shape[0], 1, q.shape[2])
        # scales reconstruct the columns' amax at int8 full range
        w = np.asarray(qparams[name], np.float32)
        rec = np.asarray(q, np.float32) * np.asarray(s)
        err = np.abs(rec - w).max()
        assert err <= np.abs(w).max() / 127.0 + 1e-7
    again = M.quantize_weights(qparams)
    assert again["w_ih_t_q8"] is qparams["w_ih_t_q8"]  # no re-quantization


def test_cast_weights_preserves_quantized(qparams):
    cast = M.cast_weights(qparams, jnp.bfloat16)
    assert cast["w_ih_t_q8"].dtype == jnp.int8
    assert cast["w_ih_t_q8s"].dtype == jnp.float32  # scales never cast
    assert cast["w_ih_t"].dtype == jnp.bfloat16


def _assert_stat_close(a, b, mean_tol=5e-3, p99_tol=0.05, name=""):
    """Cross-implementation int8 agreement bound: a single f32 ulp of XLA
    fusion difference can flip an int8 rounding decision exactly at a .5
    boundary, producing isolated jumps of ~1 quantization step (measured:
    ~1% of elements at depth 3 x 12 steps; single-layer agreement is at f32
    ulps). Bitwise parity across program structures is therefore not
    achievable — assert tight statistical agreement instead; exact
    transcript parity on trained margins is asserted in
    test_trained_e2e.py::test_int8_quantized_exact_transcripts."""
    d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
    assert float(d.mean()) < mean_tol, f"{name}: mean {d.mean():.5f}"
    assert float(np.percentile(d, 99)) < p99_tol, f"{name}: p99 {np.percentile(d, 99):.5f}"


def test_step_vs_chunk_q8_xla(qparams, inputs):
    """Scanning the per-pull q8 step over P pulls == the q8 chunk form."""
    y, h, c = inputs

    def scan_steps(y, h, c):
        def body(carry, x):
            h, c = carry
            out, h, c = M._lstm_stack_step_q8(qparams, x, h, c)
            return (h, c), out

        (h, c), ys = jax.lax.scan(body, (h, c), y)
        return ys, h, c

    ys_ref, h_ref, c_ref = jax.jit(scan_steps)(y, h, c)
    with M.pallas_disabled():
        ys_chk, h_chk, c_chk = jax.jit(
            lambda *a: M._lstm_stack_chunk(qparams, *a)
        )(y, h, c)
    _assert_stat_close(ys_chk, ys_ref, name="y")
    _assert_stat_close(h_chk, h_ref, name="h")
    _assert_stat_close(c_chk, c_ref, name="c")


def test_pallas_chunk_i8_matches_xla_q8(qparams, inputs):
    """Fused int8 chunk kernel (interpret mode) vs the XLA q8 chunk: same
    per-row quantization formula, exact int32 accumulation."""
    y, h, c = inputs
    gate = jnp.ones((P, S), bool)
    ys_k, h_k, c_k = M._lstm_stack_chunk_pallas(qparams, y, h[0:], c[0:], gate, 128)
    with M.pallas_disabled():
        ys_x, h_x, c_x = jax.jit(
            lambda *a: M._lstm_stack_chunk(qparams, *a, gate)
        )(y, h, c)
    _assert_stat_close(ys_k, ys_x, name="y")
    _assert_stat_close(h_k, h_x, name="h")
    _assert_stat_close(c_k, c_x, name="c")


def test_chunk_dispatch_picks_i8_kernel(qparams, inputs, monkeypatch):
    """With Pallas enabled and supported dims, the quantized chunk goes
    through the int8 split kernels (time-streamed recurrent core + batched
    FFN/norm — not the bf16 kernel, not XLA)."""
    import april_asr_tpu.ops.lstm_pallas as LP

    y, h, c = inputs
    called = {}
    orig_rec = LP.lstm_layer_chunk_rec_stream2_i8
    orig_ffn = LP.ffn_norm_i8

    def spy_rec(*a, **k):
        called["rec"] = True
        return orig_rec(*a, **k)

    def spy_ffn(*a, **k):
        called["ffn"] = True
        return orig_ffn(*a, **k)

    monkeypatch.setattr(LP, "lstm_layer_chunk_rec_stream2_i8", spy_rec)
    monkeypatch.setattr(LP, "ffn_norm_i8", spy_ffn)
    monkeypatch.setenv("APRIL_PALLAS", "1")
    M._lstm_stack_chunk(qparams, y, h, c)
    assert called.get("rec") and called.get("ffn")


def test_pallas_step_i8_matches_xla_q8(qparams, inputs):
    """Fused int8 single-step kernel (per-pull / flush / low-latency path,
    interpret mode) vs the XLA q8 step."""
    y, h, c = inputs
    x = y[0]
    gate = jnp.ones(S, bool)
    ys_k, h_k, c_k = M._lstm_stack_step_pallas_q8(qparams, x, h, c, 128, gate)
    ys_x, h_x, c_x = jax.jit(
        lambda *a: M._lstm_stack_step_q8(qparams, *a, gate)
    )(x, h, c)
    _assert_stat_close(ys_k, ys_x, name="y")
    _assert_stat_close(h_k, h_x, name="h")
    _assert_stat_close(c_k, c_x, name="c")


def test_step_dispatch_picks_i8_kernel(qparams, inputs, monkeypatch):
    import april_asr_tpu.ops.lstm_pallas as LP

    y, h, c = inputs
    called = {}
    orig = LP.lstm_layer_fused_i8

    def spy(*a, **k):
        called["i8"] = True
        return orig(*a, **k)

    monkeypatch.setattr(LP, "lstm_layer_fused_i8", spy)
    monkeypatch.setenv("APRIL_PALLAS", "1")
    M._lstm_stack_step(qparams, y[0], h, c)
    assert called.get("i8")


def test_quantization_error_bounded(qparams, inputs):
    """End-to-end relative error of the int8 stack vs the f32 stack stays
    small on realistic-scale random weights (the BasicNorm keeps activations
    O(1), so per-matmul error ~<1%)."""
    y, h, c = inputs
    with M.pallas_disabled():
        ys_q, hq, cq = jax.jit(lambda *a: M._lstm_stack_chunk(qparams, *a))(y, h, c)
        f32 = {k: v for k, v in qparams.items() if not k.endswith(("_q8", "_q8s"))}
        ys_f, hf, cf = jax.jit(lambda *a: M._lstm_stack_chunk(f32, *a))(y, h, c)
    rel = np.abs(np.asarray(ys_q) - np.asarray(ys_f)).mean() / (
        np.abs(np.asarray(ys_f)).mean() + 1e-9
    )
    assert rel < 0.05, f"int8 stack diverged: mean rel err {rel:.4f}"
