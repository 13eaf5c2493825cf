"""Loader + extraction tests: fixture .april -> native extraction verified
against both the interpreter path and the original torch modules."""

import numpy as np
import pytest

import jax

from april_asr_tpu.models import load_model
from april_asr_tpu.testing import FixtureConfig, build_torch_modules, write_test_april

torch = pytest.importorskip("torch")

CFG = FixtureConfig()


@pytest.fixture(scope="module")
def april_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "fixture.april"
    write_test_april(path, CFG)
    return path


def test_load_native_extraction_verified(april_path):
    rt = load_model(april_path)
    assert rt.kind == "native"
    assert rt.dims.d_model == CFG.d_model
    assert rt.dims.hidden == CFG.hidden
    assert rt.dims.layers == CFG.layers
    assert rt.dims.vocab == CFG.vocab
    assert rt.dims.context == CFG.context
    assert rt.dims.decoder_groups == CFG.decoder_groups
    assert rt.sample_rate == 16000
    assert rt.fbank_opts.snip_edges  # forced, april_model.c:94
    assert rt.name == "Test Model"


def test_native_matches_torch_end_to_end(april_path):
    """The extracted native model must match the original torch modules, not
    just the interpreter."""
    rt = load_model(april_path)
    enc_t, dec_t, joi_t = build_torch_modules(CFG)

    rng = np.random.default_rng(7)
    S = 3
    x = rng.normal(size=(S, CFG.segment_size, CFG.mel)).astype(np.float32)
    h = np.zeros((CFG.layers, S, CFG.d_model), np.float32)
    c = np.zeros((CFG.layers, S, CFG.hidden), np.float32)
    ctx = rng.integers(0, CFG.vocab, size=(S, CFG.context))

    eout, h2, c2 = jax.jit(rt.encoder_step)(rt.weights, x, h, c)
    dout = jax.jit(rt.decoder_step)(rt.weights, ctx.astype(np.int32))
    logits = jax.jit(rt.joiner)(rt.weights, eout, dout)

    with torch.no_grad():
        for i in range(S):
            te, th, tc = enc_t(
                torch.from_numpy(x[i : i + 1]),
                torch.from_numpy(h[:, i : i + 1]),
                torch.from_numpy(c[:, i : i + 1]),
            )
            td = dec_t(torch.from_numpy(ctx[i : i + 1]))
            tl = joi_t(te, td)
            np.testing.assert_allclose(
                np.asarray(eout[i]), te.numpy()[0, 0], atol=1e-4, rtol=1e-3
            )
            np.testing.assert_allclose(
                np.asarray(h2[:, i]), th.numpy()[:, 0], atol=1e-4, rtol=1e-3
            )
            np.testing.assert_allclose(
                np.asarray(logits[i]), tl.numpy()[0, 0], atol=1e-4, rtol=1e-3
            )


def test_interp_path_matches_native(april_path):
    rt_n = load_model(april_path, prefer_native=True)
    rt_i = load_model(april_path, prefer_native=False)
    assert rt_i.kind == "interp"

    rng = np.random.default_rng(3)
    S = 2
    x = rng.normal(size=(S, CFG.segment_size, CFG.mel)).astype(np.float32)
    h = (rng.normal(size=(CFG.layers, S, CFG.d_model)) * 0.1).astype(np.float32)
    c = (rng.normal(size=(CFG.layers, S, CFG.hidden)) * 0.1).astype(np.float32)

    ne, nh, nc = rt_n.encoder_step(rt_n.weights, x, h, c)
    ie, ih, ic = rt_i.encoder_step(rt_i.weights, x, h, c)
    np.testing.assert_allclose(np.asarray(ne), np.asarray(ie), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(nh), np.asarray(ih), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(nc), np.asarray(ic), atol=1e-4, rtol=1e-3)


def test_rejects_wrong_network_count(tmp_path, april_path):
    from april_asr_tpu.io import read_container, write_container

    c = read_container(april_path)
    c.networks = c.networks[:2]
    bad = tmp_path / "bad.april"
    write_container(bad, c)
    with pytest.raises(ValueError, match="wrong network count"):
        load_model(bad)
