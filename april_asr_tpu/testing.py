"""Test-model construction: torch reference modules + .april fixture export.

The reference ships no test models and its exporter requires an icefall
checkpoint (reference: extra/export-april.py). For hermetic testing this module
builds a random-weight LSTM-transducer with the same macro-architecture as the
icefall `lstm_transducer_stateless2` recipe the reference targets
(export-april.py:183-224: encoder merged with joiner encoder_proj, decoder
merged with decoder_proj, tanh joiner), traces it to ONNX with torch, and
packs a `.april` file byte-compatible with the reference loader.

The torch modules double as the numerical oracle for the ONNX interpreter and
the native JAX model. torch is imported lazily — only tests and the fixture
CLI need it.

Architecture notes (all free-standing implementations):
  * encoder: Conv2d subsampling stack (3 convs, ~4x time reduction) feeding
    L layers of [LSTM(d->hidden, proj back to d) residual; FFN with
    x*sigmoid(x-1) activation residual; RMS-style basic norm], then the
    joiner-space projection. The LSTM-with-projection cell is unrolled
    explicitly because torch.onnx cannot export nn.LSTM with proj_size —
    matching how real .april encoder graphs appear as primitive ops.
  * decoder: embedding -> grouped Conv1d over the context window -> relu ->
    joiner-space projection.
  * joiner: out_linear(tanh(enc + dec)).
"""

from __future__ import annotations

import dataclasses
import io as _stdio
from typing import List, Tuple

import numpy as np

from .io.container import (
    MODEL_LSTM_TRANSDUCER_STATELESS,
    AprilContainer,
    write_container,
)
from .io.params import ModelParameters


@dataclasses.dataclass(frozen=True)
class FixtureConfig:
    mel: int = 80
    segment_size: int = 9
    segment_step: int = 4
    d_model: int = 64
    hidden: int = 96
    ffn: int = 128
    joiner_dim: int = 64
    vocab: int = 64
    layers: int = 2
    context: int = 2
    blank_id: int = 0
    decoder_groups: int = 16
    seed: int = 0


FLAGSHIP = FixtureConfig(
    mel=80,
    segment_size=9,
    segment_step=4,
    d_model=512,
    hidden=1024,
    ffn=2048,
    joiner_dim=512,
    vocab=500,
    layers=12,
    context=2,
    blank_id=0,
    decoder_groups=128,
    seed=0,
)


def default_tokens(vocab: int, blank_id: int = 0) -> List[bytes]:
    """A plausible SentencePiece-like vocabulary for testing: blank, word
    pieces with/without leading space, punctuation, digits."""
    base = [
        b"<blk>", b" the", b" a", b" and", b" to", b" of", b" in", b" it",
        b" is", b" was", b" i", b" he", b" that", b" you", b" his", b" on",
        b"s", b"ing", b"ed", b"er", b"ly", b"tion", b"es", b"re", b"an",
        b"ar", b"or", b"en", b"al", b"le", b".", b",", b"!", b"?", b"'",
        b"0", b"1", b"2", b"3", b"9", b" one", b" two", b" ten", b" time",
        b" hand", b" day", b" way", b" man", b" world", b" great", b" old",
        b" right", b" elephant", b" cool", b" water", b" sound", b" place",
        b"ous", b"ment", b"ness", b"ful", b"ted", b"ter", b"ver",
    ]
    toks = list(base[:vocab])
    i = 0
    while len(toks) < vocab:
        toks.append(f"tok{i}".encode())
        i += 1
    # ensure blank at blank_id
    toks[blank_id] = b"<blk>"
    return toks


def build_torch_modules(cfg: FixtureConfig):
    """Returns (encoder, decoder, joiner) torch modules in eval mode."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(cfg.seed)

    class DoubleSwish(nn.Module):
        def forward(self, x):
            return x * torch.sigmoid(x - 1.0)

    class BasicNorm(nn.Module):
        """x * (mean(x^2) + eps)^-0.5 with a learned eps (inference form)."""

        def __init__(self, dim, eps=0.25):
            super().__init__()
            self.register_buffer("eps", torch.tensor(eps))

        def forward(self, x):
            scale = (torch.mean(x * x, dim=-1, keepdim=True) + self.eps) ** -0.5
            return x * scale

    class ProjLSTMLayer(nn.Module):
        """One LSTM step with hidden->d_model projection, unrolled over time.

        Weight layout follows torch LSTM convention [4H, in] with gate order
        i f g o; the projection maps the hidden state back to d_model.
        """

        def __init__(self, d_model, hidden):
            super().__init__()
            self.hidden = hidden
            self.w_ih = nn.Parameter(torch.randn(4 * hidden, d_model) * 0.05)
            self.w_hh = nn.Parameter(torch.randn(4 * hidden, d_model) * 0.05)
            self.b = nn.Parameter(torch.randn(4 * hidden) * 0.01)
            self.w_hr = nn.Parameter(torch.randn(d_model, hidden) * 0.05)

        def forward(self, x, h, c):
            # x: [T, N, d]; h: [N, d]; c: [N, hidden]
            T = x.shape[0]
            outs = []
            for t in range(T):
                gates = x[t] @ self.w_ih.t() + h @ self.w_hh.t() + self.b
                i, f, g, o = gates.chunk(4, dim=-1)
                i = torch.sigmoid(i)
                f = torch.sigmoid(f)
                g = torch.tanh(g)
                o = torch.sigmoid(o)
                c = f * c + i * g
                hc = o * torch.tanh(c)
                h = hc @ self.w_hr.t()
                outs.append(h)
            return torch.stack(outs, dim=0), h, c

    class EncoderLayer(nn.Module):
        def __init__(self, d_model, hidden, ffn):
            super().__init__()
            self.lstm = ProjLSTMLayer(d_model, hidden)
            self.ff1 = nn.Linear(d_model, ffn)
            self.act = DoubleSwish()
            self.ff2 = nn.Linear(ffn, d_model)
            self.norm = BasicNorm(d_model)

        def forward(self, x, h, c):
            lstm_out, h2, c2 = self.lstm(x, h, c)
            x = x + lstm_out
            x = x + self.ff2(self.act(self.ff1(x)))
            x = self.norm(x)
            return x, h2, c2

    class ConvSubsample(nn.Module):
        """(N, T, mel) -> (N, T', d_model), T' = ((T-1)//2 - 1)//2."""

        def __init__(self, mel, d_model):
            super().__init__()
            self.conv1 = nn.Conv2d(1, 8, 3, padding=1)
            self.conv2 = nn.Conv2d(8, 32, 3, stride=2)
            self.conv3 = nn.Conv2d(32, 32, 3, stride=2)
            self.act = DoubleSwish()
            freq_out = ((mel - 1) // 2 - 1) // 2
            self.out = nn.Linear(32 * freq_out, d_model)

        def forward(self, x):
            x = x.unsqueeze(1)  # (N, 1, T, mel)
            x = self.act(self.conv1(x))
            x = self.act(self.conv2(x))
            x = self.act(self.conv3(x))
            n, ch, t, f = x.shape
            x = x.permute(0, 2, 1, 3).reshape(n, t, ch * f)
            return self.out(x)

    class Encoder(nn.Module):
        """Merged encoder: subsampling + LSTM stack + joiner encoder_proj
        (mirrors MergedEncoder, export-april.py:183-203)."""

        def __init__(self):
            super().__init__()
            self.embed = ConvSubsample(cfg.mel, cfg.d_model)
            self.layers = nn.ModuleList(
                EncoderLayer(cfg.d_model, cfg.hidden, cfg.ffn)
                for _ in range(cfg.layers)
            )
            self.encoder_proj = nn.Linear(cfg.d_model, cfg.joiner_dim)

        def forward(self, x, h, c):
            # x: (N, T, mel); h: (L, N, d); c: (L, N, hidden)
            x = self.embed(x)
            x = x.permute(1, 0, 2)  # (T', N, d)
            hs, cs = [], []
            for li, layer in enumerate(self.layers):
                x, h2, c2 = layer(x, h[li], c[li])
                hs.append(h2)
                cs.append(c2)
            x = x.permute(1, 0, 2)  # (N, T', d)
            return self.encoder_proj(x), torch.stack(hs, 0), torch.stack(cs, 0)

    class Decoder(nn.Module):
        """Merged decoder: embedding + grouped context conv + relu +
        decoder_proj (mirrors MergedDecoder, export-april.py:206-223)."""

        def __init__(self):
            super().__init__()
            self.embedding = nn.Embedding(cfg.vocab, cfg.d_model)
            self.conv = nn.Conv1d(
                cfg.d_model,
                cfg.d_model,
                kernel_size=cfg.context,
                groups=cfg.decoder_groups,
                bias=False,
            )
            self.decoder_proj = nn.Linear(cfg.d_model, cfg.joiner_dim)

        def forward(self, context):
            # context: (N, context) int64
            x = self.embedding(context)  # (N, ctx, d)
            x = x.permute(0, 2, 1)  # (N, d, ctx)
            x = self.conv(x)  # (N, d, 1)
            x = x.permute(0, 2, 1)  # (N, 1, d)
            x = torch.relu(x)
            return self.decoder_proj(x)  # (N, 1, J)

    class Joiner(nn.Module):
        def __init__(self):
            super().__init__()
            self.out = nn.Linear(cfg.joiner_dim, cfg.vocab)

        def forward(self, encoder_out, decoder_out):
            # (N, 1, J) + (N, 1, J) -> (N, 1, V)
            return self.out(torch.tanh(encoder_out + decoder_out))

    enc, dec, joi = Encoder().eval(), Decoder().eval(), Joiner().eval()
    return enc, dec, joi


def export_onnx_networks(cfg: FixtureConfig, modules=None) -> Tuple[bytes, bytes, bytes]:
    """Trace the three torch modules to ONNX bytes with the same I/O names,
    shapes, and opset as the reference exporter (export-april.py:285-331)."""
    import torch

    # torch's legacy exporter imports the `onnx` package (absent here) only to
    # splice in onnxscript custom functions — a no-op for standard graphs.
    # Bypass it so export works without the onnx package.
    try:
        from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

        onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    except ImportError:
        pass

    enc, dec, joi = modules if modules is not None else build_torch_modules(cfg)

    x = torch.zeros(1, cfg.segment_size, cfg.mel)
    h = torch.zeros(cfg.layers, 1, cfg.d_model)
    c = torch.zeros(cfg.layers, 1, cfg.hidden)
    context = torch.zeros(1, cfg.context, dtype=torch.int64)

    enc_b, dec_b, joi_b = _stdio.BytesIO(), _stdio.BytesIO(), _stdio.BytesIO()
    torch.onnx.export(
        enc, (x, h, c), enc_b, opset_version=11, dynamo=False,
        input_names=["x", "h", "c"],
        output_names=["encoder_out", "next_h", "next_c"],
    )
    torch.onnx.export(
        dec, (context,), dec_b, opset_version=11, dynamo=False,
        input_names=["context"], output_names=["decoder_out"],
    )
    with torch.no_grad():
        eout, _, _ = enc(x, h, c)
        dout = dec(context)
    torch.onnx.export(
        joi, (eout, dout), joi_b, opset_version=11, dynamo=False,
        input_names=["encoder_out", "decoder_out"], output_names=["logits"],
    )
    return enc_b.getvalue(), dec_b.getvalue(), joi_b.getvalue()


def make_test_params(cfg: FixtureConfig) -> ModelParameters:
    return ModelParameters(
        batch_size=1,
        segment_size=cfg.segment_size,
        segment_step=cfg.segment_step,
        mel_features=cfg.mel,
        sample_rate=16000,
        frame_shift_ms=10,
        frame_length_ms=25,
        round_pow2=True,
        mel_low=20,
        mel_high=0,
        snip_edges=False,  # the loader forces True, like april_model.c:94
        blank_id=cfg.blank_id,
        tokens=default_tokens(cfg.vocab, cfg.blank_id),
    )


def write_test_april(path, cfg: FixtureConfig | None = None, name="Test Model"):
    """Create a random-weight .april file in the reference layout."""
    cfg = cfg or FixtureConfig()
    networks = export_onnx_networks(cfg)
    container = AprilContainer(
        language="en-us",
        name=name,
        description=f"Random-weight test transducer (seed={cfg.seed})",
        model_type=MODEL_LSTM_TRANSDUCER_STATELESS,
        params=make_test_params(cfg),
        networks=list(networks),
    )
    write_container(path, container)
    return cfg


class ScalarSession:
    """Single-session behavioral oracle: same device primitives as the engine
    (batch-1 vmapped fbank, the model runtime's batched step functions at S=1)
    but with the decode state machine run in scalar host Python
    (decode/scalar.py). Used to validate the fused batched engine
    callback-for-callback; also a debugging aid.

    Mirrors the reference sync session loop: _aas_feed_pcm16 chunking
    (april_session.c:501-533), aas_infer pull loop (:431-476), _aas_flush
    (:547-564).
    """

    def __init__(self, rt, handler, chunk: int = 3200):
        import jax
        import jax.numpy as jnp

        from .config import DecodeConfig
        from .decode.scalar import ScalarDecoder
        from .frontend import fbank as fbk

        self._jnp = jnp
        self.rt = rt
        self.handler = handler
        self.chunk = chunk
        self.layout = fbk.FbankLayout.build(rt.fbank_opts, chunk)
        self.fbk = fbk
        self._accept = jax.jit(
            jax.vmap(lambda s, w, n: fbk.fbank_accept(self.layout, s, w, n))
        )
        self._flush_pad = jax.jit(
            jax.vmap(lambda s: fbk.fbank_flush_pad(self.layout, s))
        )
        self._advance = jax.jit(
            jax.vmap(lambda s, d: fbk.fbank_advance(self.layout, s, d))
        )
        self.fb = jax.vmap(lambda _: fbk.fbank_init(self.layout))(jnp.arange(1))

        L, dh = rt.state_shapes[0]
        _, dc = rt.state_shapes[1]
        self.h = jnp.zeros((L, 1, dh), jnp.float32)
        self.c = jnp.zeros((L, 1, dc), jnp.float32)
        self.dout = None

        def run_decoder(context):
            import numpy as _np

            self.dout = rt.decoder_step(
                rt.weights, jnp.asarray(_np.asarray(context, _np.int32)[None])
            )

        self.dec = ScalarDecoder(
            rt.params,
            rt.vocab,
            DecodeConfig(),
            handler,
            run_decoder,
            context_size=rt.dims.context,
        )
        # priming (april_session.c:432-438)
        for _ in range(self.dec.context_size):
            self.dec.update_context(self.dec.blank)
        self.was_flushed = False

    def _infer(self):
        jnp = self._jnp
        while bool(self.fbk.fbank_can_pull(self.layout, _first(self.fb))):
            x = self.fbk.fbank_peek(self.layout, _first(self.fb))[None]
            self.dec.time_ms += self.layout.opts.segment_stride_ms
            eout, self.h, self.c = self.rt.encoder_step(
                self.rt.weights, x, self.h, self.c
            )
            for ee in (1.0, 0.0, 0.0):
                logits = self.rt.joiner(self.rt.weights, eout, self.dout)
                import numpy as _np

                if self.dec.process_logits(_np.asarray(logits)[0], ee):
                    break
            self.fb = self._advance(self.fb, jnp.ones(1, bool))

    def feed_pcm16(self, pcm16):
        import numpy as _np

        jnp = self._jnp
        self.was_flushed = False
        pcm = _np.asarray(pcm16, _np.int16)
        for off in range(0, len(pcm), self.chunk):
            piece = pcm[off : off + self.chunk]
            buf = _np.zeros(self.chunk, _np.float32)
            buf[: len(piece)] = piece.astype(_np.float32) / 32768.0
            self.fb = self._accept(
                self.fb, jnp.asarray(buf)[None], jnp.asarray([len(piece)], jnp.int32)
            )
            self._infer()

    def flush(self):
        import numpy as _np

        jnp = self._jnp
        if self.was_flushed:
            return
        self.was_flushed = True
        for _ in range(64):
            self.fb, did = _split_did(self._flush_pad(self.fb))
            if not did:
                break
            self._infer()
        # two FIXED 3200-sample zero blocks (SEGSIZE, april_session.c:555-556)
        # regardless of this session's chunk size; split into chunk-sized
        # accepts with pad-free drains between (FIFO-order-invariant)
        zeros = jnp.zeros((1, self.chunk), jnp.float32)
        for _ in range(2):
            rem = 3200
            while rem > 0:
                take = min(self.chunk, rem)
                rem -= take
                self.fb = self._accept(
                    self.fb, zeros, jnp.asarray([take], jnp.int32)
                )
                self._infer()
        for _ in range(64):
            self.fb, did = _split_did(self._flush_pad(self.fb))
            if not did:
                break
            self._infer()
        self.dec.finalize_tokens()
        self.dec.clear_context()
        self.dec.emit_silence()


def _first(batched_state):
    return {k: v[0] for k, v in batched_state.items()}


def _split_did(res):
    state, did = res
    return state, bool(did[0])
