"""Export round-trip: native weights -> .april (both forms) -> load -> parity."""

import numpy as np
import pytest

import jax

from april_asr_tpu.models import TransducerDims, init_transducer_params, load_model
from april_asr_tpu.models.export import make_model_parameters, save_april
from april_asr_tpu.testing import default_tokens

DIMS = TransducerDims(
    mel=80, segment_size=9, segment_step=4, d_model=32, hidden=48, ffn=64,
    joiner_dim=32, vocab=48, layers=2, context=2, decoder_groups=8,
    conv_channels=(4, 8, 8),
)


@pytest.fixture(scope="module")
def native_params():
    return init_transducer_params(jax.random.PRNGKey(5), DIMS)


@pytest.mark.parametrize("form", ["onnx", "native"])
def test_roundtrip(tmp_path, native_params, form):
    mp = make_model_parameters(DIMS, default_tokens(DIMS.vocab))
    path = tmp_path / f"rt_{form}.april"
    save_april(path, DIMS, native_params, mp, form=form)

    rt = load_model(path)
    assert rt.kind == "native"
    assert rt.dims.layers == DIMS.layers
    assert rt.dims.decoder_groups == DIMS.decoder_groups

    # weights must round-trip exactly
    for k, v in native_params.items():
        np.testing.assert_array_equal(
            np.asarray(rt.weights[k]), np.asarray(v), err_msg=k
        )


def test_onnx_form_runs_under_interpreter(tmp_path, native_params):
    """The exported ONNX graphs must execute under the generic interpreter
    with outputs matching the native model (i.e. they are valid standalone
    ONNX, loadable by the reference library's ONNXRuntime)."""
    from april_asr_tpu.models.lstm_transducer import (
        decoder_step,
        encoder_step,
        joiner_logits,
    )

    mp = make_model_parameters(DIMS, default_tokens(DIMS.vocab))
    path = tmp_path / "interp.april"
    save_april(path, DIMS, native_params, mp, form="onnx")

    rt = load_model(path, prefer_native=False)
    assert rt.kind == "interp"

    rng = np.random.default_rng(0)
    S = 2
    x = rng.normal(size=(S, DIMS.segment_size, DIMS.mel)).astype(np.float32)
    h = (rng.normal(size=(DIMS.layers, S, DIMS.d_model)) * 0.1).astype(np.float32)
    c = (rng.normal(size=(DIMS.layers, S, DIMS.hidden)) * 0.1).astype(np.float32)
    ctx = rng.integers(0, DIMS.vocab, size=(S, DIMS.context)).astype(np.int32)

    ie, ih, ic = rt.encoder_step(rt.weights, x, h, c)
    ne, nh, nc = encoder_step(native_params, x, h, c)
    np.testing.assert_allclose(np.asarray(ie), np.asarray(ne), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ih), np.asarray(nh), atol=1e-5, rtol=1e-4)

    idv = rt.decoder_step(rt.weights, ctx)
    ndv = decoder_step(native_params, ctx, DIMS)
    np.testing.assert_allclose(np.asarray(idv), np.asarray(ndv), atol=1e-5, rtol=1e-4)

    il = rt.joiner(rt.weights, ie, idv)
    nl = joiner_logits(native_params, ne, ndv)
    np.testing.assert_allclose(np.asarray(il), np.asarray(nl), atol=1e-5, rtol=1e-4)
