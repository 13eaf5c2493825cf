"""Icefall torch-checkpoint import (models/torch_import.py).

Builds a synthetic checkpoint with the exact parameter naming of icefall's
`lstm_transducer_stateless2` recipe — the module list the reference exporter
wraps (reference: extra/export-april.py:183-224) — including the Scaled*
log-scale parameterization, then proves:

  * the imported native pytree's forward matches the torch modules' forward
    (encoder, decoder, joiner) on random inputs,
  * `april-export --from-torch` writes a loadable `.april` whose decode
    callback stream is identical to the same weights arriving via the
    reference's own route (torch.onnx-exported graphs -> ONNX extraction),
  * Scaled* folding, bias_ih+bias_hh summing, BasicNorm log-eps, tokens.txt
    parsing (SentencePiece U+2581 -> space, <blk> id) all behave.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from april_asr_tpu.models.torch_import import (
    fold_scales,
    import_icefall_lstm,
    load_state_dict,
    parse_tokens_txt,
)
from april_asr_tpu.testing import (
    FixtureConfig,
    build_torch_modules,
    default_tokens,
    write_test_april,
)

CFG = FixtureConfig()


def _scaled(sd, name, tensor, rng, with_bias_scale=False, bias=None):
    """Store `tensor` as icefall Scaled* weight + log-scale pair."""
    s = float(rng.uniform(-0.5, 0.5))
    sd[name + ".weight"] = tensor / np.exp(s)
    sd[name + ".weight_scale"] = torch.tensor(s)
    if bias is not None:
        sb = float(rng.uniform(-0.5, 0.5)) if with_bias_scale else 0.0
        sd[name + ".bias"] = bias / np.exp(sb)
        if with_bias_scale:
            sd[name + ".bias_scale"] = torch.tensor(sb)


def make_icefall_state_dict(enc, dec, joi, seed=1):
    """Re-express the fixture modules' weights in the icefall recipe's
    state_dict naming + Scaled* parameterization (exactly invertible)."""
    rng = np.random.default_rng(seed)
    sd = {}
    E = "encoder.encoder_embed"
    for i, conv in enumerate((enc.embed.conv1, enc.embed.conv2, enc.embed.conv3)):
        _scaled(
            sd, f"{E}.conv.{(0, 3, 6)[i]}", conv.weight.detach().clone(), rng,
            with_bias_scale=True, bias=conv.bias.detach().clone(),
        )
    _scaled(
        sd, f"{E}.out", enc.embed.out.weight.detach().clone(), rng,
        with_bias_scale=True, bias=enc.embed.out.bias.detach().clone(),
    )
    for l, layer in enumerate(enc.layers):
        Lp = f"encoder.encoder.layers.{l}"
        lstm = layer.lstm
        split = torch.tensor(
            rng.uniform(0.2, 0.8, size=lstm.b.shape[0]), dtype=torch.float32
        )
        sd[f"{Lp}.lstm.weight_ih_l0"] = lstm.w_ih.detach().clone()
        sd[f"{Lp}.lstm.weight_hh_l0"] = lstm.w_hh.detach().clone()
        sd[f"{Lp}.lstm.weight_hr_l0"] = lstm.w_hr.detach().clone()
        # icefall's nn.LSTM keeps two bias vectors; the cell adds them
        sd[f"{Lp}.lstm.bias_ih_l0"] = lstm.b.detach() * split
        sd[f"{Lp}.lstm.bias_hh_l0"] = lstm.b.detach() * (1.0 - split)
        _scaled(
            sd, f"{Lp}.feed_forward.0", layer.ff1.weight.detach().clone(),
            rng, with_bias_scale=True, bias=layer.ff1.bias.detach().clone(),
        )
        _scaled(
            sd, f"{Lp}.feed_forward.4", layer.ff2.weight.detach().clone(),
            rng, with_bias_scale=True, bias=layer.ff2.bias.detach().clone(),
        )
        # BasicNorm keeps log-eps (icefall scaling.py); fixture eps = 0.25
        sd[f"{Lp}.norm_final.eps"] = torch.log(layer.norm.eps.detach().clone())
    # ScaledEmbedding: module-level `scale`
    es = float(rng.uniform(-0.5, 0.5))
    sd["decoder.embedding.weight"] = dec.embedding.weight.detach() / np.exp(es)
    sd["decoder.embedding.scale"] = torch.tensor(es)
    _scaled(sd, "decoder.conv", dec.conv.weight.detach().clone(), rng)
    _scaled(
        sd, "joiner.encoder_proj", enc.encoder_proj.weight.detach().clone(),
        rng, with_bias_scale=True, bias=enc.encoder_proj.bias.detach().clone(),
    )
    _scaled(
        sd, "joiner.decoder_proj", dec.decoder_proj.weight.detach().clone(),
        rng, with_bias_scale=True, bias=dec.decoder_proj.bias.detach().clone(),
    )
    _scaled(
        sd, "joiner.output_linear", joi.out.weight.detach().clone(),
        rng, with_bias_scale=True, bias=joi.out.bias.detach().clone(),
    )
    # training-only pruned-RNNT heads must be skipped by the importer
    sd["simple_am_proj.weight"] = torch.zeros(3, 3)
    sd["simple_lm_proj.weight"] = torch.zeros(3, 3)
    return {k: (v if torch.is_tensor(v) else torch.as_tensor(v)) for k, v in sd.items()}


@pytest.fixture(scope="module")
def modules():
    return build_torch_modules(CFG)


@pytest.fixture(scope="module")
def imported(modules, tmp_path_factory):
    enc, dec, joi = modules
    sd = make_icefall_state_dict(enc, dec, joi)
    path = tmp_path_factory.mktemp("ckpt") / "epoch-30.pt"
    torch.save({"model": sd, "epoch": 30}, path)
    loaded = load_state_dict(path)
    return import_icefall_lstm(loaded)


def test_dims_derived_from_shapes(imported):
    dims, _ = imported
    assert dims.d_model == CFG.d_model
    assert dims.hidden == CFG.hidden
    assert dims.ffn == CFG.ffn
    assert dims.layers == CFG.layers
    assert dims.vocab == CFG.vocab
    assert dims.context == CFG.context
    assert dims.decoder_groups == CFG.decoder_groups
    assert dims.joiner_dim == CFG.joiner_dim


def test_scale_folding_is_exact(modules, imported):
    enc, _, _ = modules
    _, p = imported
    np.testing.assert_allclose(
        p["w_ih_t"][0], enc.layers[0].lstm.w_ih.detach().numpy().T,
        rtol=0, atol=0,
    )
    # scaled tensors: weight/exp(s) stored, exp(s) refolded -> tiny fp error
    np.testing.assert_allclose(
        p["ff1_t"][0], enc.layers[0].ff1.weight.detach().numpy().T,
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(p["norm_eps"], [0.25] * CFG.layers, rtol=1e-6)


def test_forward_parity_vs_torch(modules, imported):
    """Imported pytree through the native JAX forward == torch modules."""
    import jax.numpy as jnp

    from april_asr_tpu.models.loader import _native_runtime_fns

    enc, dec, joi = modules
    dims, p = imported
    enc_fn, dec_fn, joi_fn = _native_runtime_fns(dims)
    pj = {k: jnp.asarray(v) for k, v in p.items()}

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, CFG.segment_size, CFG.mel)).astype(np.float32)
    h = rng.normal(0, 0.3, (CFG.layers, 2, CFG.d_model)).astype(np.float32)
    c = rng.normal(0, 0.3, (CFG.layers, 2, CFG.hidden)).astype(np.float32)
    with torch.no_grad():
        te, th, tc = enc(torch.from_numpy(x), torch.from_numpy(h), torch.from_numpy(c))
    je, jh, jc = enc_fn(pj, jnp.asarray(x), jnp.asarray(h), jnp.asarray(c))
    np.testing.assert_allclose(
        np.asarray(je), te.numpy()[:, -1, :], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), rtol=2e-4, atol=2e-5)

    ctx = rng.integers(0, CFG.vocab, size=(2, CFG.context))
    with torch.no_grad():
        td = dec(torch.from_numpy(ctx))
        tl = joi(te[:, -1:, :], td)
    jd = dec_fn(pj, jnp.asarray(ctx, jnp.int32))
    np.testing.assert_allclose(np.asarray(jd), td.numpy()[:, 0], rtol=2e-4, atol=2e-5)
    jl = joi_fn(pj, je, jd)
    np.testing.assert_allclose(np.asarray(jl), tl.numpy()[:, 0], rtol=2e-4, atol=2e-5)


def test_cli_roundtrip_decode_parity(modules, tmp_path):
    """--from-torch .april decodes the identical stream to the same weights
    arriving via the reference route (torch.onnx graphs -> extraction)."""
    from april_asr_tpu.api import Model, Session
    from april_asr_tpu.cli.export import main as export_main

    enc, dec, joi = modules
    sd = make_icefall_state_dict(enc, dec, joi)
    ckpt = tmp_path / "pretrained.pt"
    torch.save({"model": sd}, ckpt)

    toks_txt = tmp_path / "tokens.txt"
    with open(toks_txt, "w", encoding="utf-8") as f:
        for i, t in enumerate(default_tokens(CFG.vocab)):
            piece = t.decode("utf-8")
            if piece.startswith(" "):
                piece = "▁" + piece[1:]
            f.write(f"{piece} {i}\n")

    out = tmp_path / "imported.april"
    assert export_main([str(ckpt), str(out), "--from-torch", "--tokens", str(toks_txt)]) == 0

    ref_path = tmp_path / "reference_route.april"
    write_test_april(ref_path, CFG)  # same seed -> same module weights

    def stream(path):
        calls = []
        m = Model(str(path))
        s = Session(
            m,
            lambda r, toks: calls.append(
                (r, tuple((t.token, round(float(t.logprob), 4), t.time_ms) for t in toks))
            ),
        )
        rng = np.random.default_rng(7)
        s.feed_pcm16((rng.normal(0, 0.15, 16000) * 20000).astype(np.int16))
        s.flush()
        s.close()
        return calls

    got = stream(out)
    ref = stream(ref_path)
    assert len(got) > 0
    assert got == ref


def test_tokens_txt_parsing(tmp_path):
    p = tmp_path / "tokens.txt"
    p.write_text("<blk> 0\n▁the 1\ning 2\n▁a 3\n", encoding="utf-8")
    toks, blank = parse_tokens_txt(p)
    assert blank == 0
    assert toks == [b"<blk>", b" the", b"ing", b" a"]


def test_fold_scales_embedding_sibling():
    sd = {
        "decoder.embedding.weight": np.full((2, 2), 2.0, np.float32),
        "decoder.embedding.scale": np.float32(np.log(3.0)),
    }
    out = fold_scales(sd)
    np.testing.assert_allclose(out["decoder.embedding.weight"], 6.0, rtol=1e-6)
    assert "decoder.embedding.scale" not in out
