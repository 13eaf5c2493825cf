"""ONNX parser + JAX interpreter parity vs torch on traced transducer graphs.

The fixture graphs are traces of the icefall-style architecture in
april_asr_tpu/testing.py — the same graph shapes that real .april files
contain (reference: extra/export-april.py:285-331)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from april_asr_tpu.io.onnx_model import parse_model
from april_asr_tpu.ops import lower_graph
from april_asr_tpu.testing import FixtureConfig, build_torch_modules, export_onnx_networks

torch = pytest.importorskip("torch")

CFG = FixtureConfig()


@pytest.fixture(scope="module")
def fixture_networks():
    modules = build_torch_modules(CFG)
    networks = export_onnx_networks(CFG, modules)
    return modules, networks


def test_parse_encoder_graph(fixture_networks):
    _, (enc_bytes, dec_bytes, joi_bytes) = fixture_networks
    m = parse_model(enc_bytes)
    assert m.opset == 11
    g = m.graph
    assert g.inputs == ["x", "h", "c"]
    assert g.outputs == ["encoder_out", "next_h", "next_c"]
    assert g.input_shapes["x"] == [1, CFG.segment_size, CFG.mel]
    assert g.input_shapes["h"] == [CFG.layers, 1, CFG.d_model]
    assert g.input_shapes["c"] == [CFG.layers, 1, CFG.hidden]
    assert len(g.nodes) > 10
    assert len(g.initializers) > 0


def test_encoder_parity(fixture_networks):
    (enc, _, _), (enc_bytes, _, _) = fixture_networks
    g = parse_model(enc_bytes).graph
    fn, weights = lower_graph(g)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, CFG.segment_size, CFG.mel)).astype(np.float32)
    h = rng.normal(size=(CFG.layers, 1, CFG.d_model)).astype(np.float32) * 0.1
    c = rng.normal(size=(CFG.layers, 1, CFG.hidden)).astype(np.float32) * 0.1

    with torch.no_grad():
        te, th, tc = enc(torch.from_numpy(x), torch.from_numpy(h), torch.from_numpy(c))

    je, jh, jc = jax.jit(fn)(weights, x, h, c)
    np.testing.assert_allclose(np.asarray(je), te.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=2e-5, rtol=1e-4)


def test_decoder_joiner_parity(fixture_networks):
    (_, dec, joi), (_, dec_bytes, joi_bytes) = fixture_networks
    gd = parse_model(dec_bytes).graph
    gj = parse_model(joi_bytes).graph
    dfn, dweights = lower_graph(gd)
    jfn, jweights = lower_graph(gj)

    context = np.array([[3, 7]], dtype=np.int64)
    with torch.no_grad():
        td = dec(torch.from_numpy(context))
    (jd,) = jax.jit(dfn)(dweights, context)
    np.testing.assert_allclose(np.asarray(jd), td.numpy(), atol=2e-5, rtol=1e-4)

    rng = np.random.default_rng(1)
    eout = rng.normal(size=(1, 1, CFG.joiner_dim)).astype(np.float32)
    with torch.no_grad():
        tl = joi(torch.from_numpy(eout), td)
    (jl,) = jax.jit(jfn)(jweights, eout, np.asarray(jd))
    np.testing.assert_allclose(np.asarray(jl), tl.numpy(), atol=2e-5, rtol=1e-4)


def test_encoder_vmap_batches(fixture_networks):
    """The traced graph is batch-1; vmap must batch it over sessions."""
    (enc, _, _), (enc_bytes, _, _) = fixture_networks
    g = parse_model(enc_bytes).graph
    fn, weights = lower_graph(g)

    S = 3
    rng = np.random.default_rng(2)
    x = rng.normal(size=(S, 1, CFG.segment_size, CFG.mel)).astype(np.float32)
    h = np.zeros((S, CFG.layers, 1, CFG.d_model), np.float32)
    c = np.zeros((S, CFG.layers, 1, CFG.hidden), np.float32)

    batched = jax.jit(jax.vmap(fn, in_axes=(None, 0, 0, 0)))
    be, bh, bc = batched(weights, x, h, c)
    assert be.shape[0] == S

    for i in range(S):
        ei, hi, ci = fn(weights, x[i], h[i], c[i])
        np.testing.assert_allclose(np.asarray(be[i]), np.asarray(ei), atol=1e-5)


def test_onnx_lstm_op():
    """The LSTM op handler (used by our own exporter's graphs) matches torch."""
    import torch.nn as nn

    from april_asr_tpu.io.onnx_model import parse_model as _pm

    T, N, I, H = 5, 2, 8, 12
    lstm = nn.LSTM(I, H).eval()
    x = torch.randn(T, N, I)
    h0 = torch.randn(1, N, H)
    c0 = torch.randn(1, N, H)
    import io as _io

    b = _io.BytesIO()
    torch.onnx.export(
        lstm, (x, (h0, c0)), b, opset_version=11, dynamo=False,
        input_names=["x", "h0", "c0"], output_names=["y", "hn", "cn"],
    )
    g = _pm(b.getvalue()).graph
    fn, weights = lower_graph(g)
    with torch.no_grad():
        ty, (th, tc) = lstm(x, (h0, c0))
    outs = jax.jit(fn)(weights, x.numpy(), h0.numpy(), c0.numpy())
    # torch graph squeezes the direction dim in Y via post-ops; compare h/c
    np.testing.assert_allclose(np.asarray(outs[1]).reshape(N, H), th.numpy().reshape(N, H), atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs[2]).reshape(N, H), tc.numpy().reshape(N, H), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(outs[0]).reshape(T, N, H), ty.numpy().reshape(T, N, H), atol=1e-5
    )
