"""Model loading facade: .april file -> batched TPU-ready step functions.

Replaces the reference's aam_create_model (src/april_model.c:24-107): reads the
container, validates the model type/network count, derives fbank options with
the same overrides (snip_edges forced true, remove_dc_offset true, preemph
0.97 — april_model.c:84-97), cross-checks network shapes against params
(april_model.c:99-102), then prepares the compute path:

  1. parse the 3 ONNX graphs,
  2. try native weight extraction (models/extract.py) and VERIFY it against
     the generic interpreter on random inputs,
  3. on any mismatch fall back to the vmapped interpreter — any valid .april
     file runs either way.

The returned ModelRuntime exposes uniformly batched functions
(encoder_step/decoder_step/joiner) over a leading session axis with LSTM state
laid out [L, S, ·], which is what the engine jits and shards.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FbankOptions
from ..io.container import (
    MODEL_LSTM_TRANSDUCER_STATELESS,
    MODEL_NATIVE_TRANSDUCER_TPU,
    AprilContainer,
    read_container,
)
from ..io.onnx_model import parse_model
from ..io.params import ModelParameters, VocabTables, build_vocab_tables
from ..ops.onnx2jax import lower_graph
from ..utils import logging as log
from .extract import ExtractionError, extract_transducer
from .lstm_transducer import (
    TransducerDims,
    decoder_step,
    encoder_step,
    joiner_logits,
    precompute_decoder_tables,
)


@dataclasses.dataclass
class ModelRuntime:
    """Uniformly batched transducer compute functions plus metadata.

    encoder_step(weights, x[S,seg,mel], h[L,S,dh], c[L,S,dc]) -> (eout[S,J], h', c')
    decoder_step(weights, context[S,ctx]) -> dout[S,J]
    joiner(weights, eout[S,J], dout[S,J]) -> logits[S,V]
    """

    name: str
    description: str
    language: str
    params: ModelParameters
    fbank_opts: FbankOptions
    vocab: VocabTables
    dims: TransducerDims
    kind: str  # "native" | "interp"
    weights: Dict
    encoder_step: Callable
    decoder_step: Callable
    joiner: Callable
    state_shapes: tuple  # ((L,dh), (L,dc)) per-session h/c trailing shapes
    # Optional split encoder (native models): embed(w, x[N,seg,mel]) -> [N,d]
    # batched over all windows; recurrent(w, y[S,d], h, c) -> (eout, h', c').
    encoder_embed: Optional[Callable] = None
    encoder_recurrent: Optional[Callable] = None
    # Optional whole-chunk encoder (non-frame-recurrent families, e.g. the
    # Conformer): chunk(w, y[P,S,d], h, c, can[P,S]) -> (eout[P,S,J], h', c')
    # advances all P pulls per layer in one pass. Used by the engine when
    # P <= encoder_chunk_max_pulls.
    encoder_chunk: Optional[Callable] = None
    encoder_chunk_max_pulls: Optional[int] = None
    # Optional fused greedy prologue (native joiners): (w, eout, dout) ->
    # (max_idx, max_val, blank_val) — the engine prefers this over
    # joiner + decode-side argmax so [S, vocab] logits never hit HBM.
    joiner_argmax: Optional[Callable] = None
    # Optional lazy-dout fused inner-decode iteration:
    # (w, ctx, need_dec, dout, eout) -> (max_idx, max_val, blank_val, dout').
    # Refreshes dout where the previous iteration changed the context, then
    # joiner + argmax — one kernel per iteration on TPU. The engine prefers
    # this over joiner_argmax + an eager decoder_step when present.
    decoder_joiner_argmax: Optional[Callable] = None
    # Optional fused whole-front embed: (w, front[S,W,mel], P, step) ->
    # [P, S, d] — every pull window embedded in one kernel straight from the
    # un-stacked front buffer (ops/conv_embed_pallas.py). The engine prefers
    # this over stack-windows + encoder_embed when the geometry supports it.
    encoder_embed_front: Optional[Callable] = None

    @property
    def sample_rate(self) -> int:
        return self.fbank_opts.sample_freq

    @property
    def blank_id(self) -> int:
        return self.params.blank_id


def _fbank_opts_from_params(p: ModelParameters) -> FbankOptions:
    """Reference: april_model.c:84-97 (snip_edges/remove_dc/preemph forced)."""
    return FbankOptions(
        sample_freq=p.sample_rate,
        frame_shift_ms=p.frame_shift_ms,
        frame_length_ms=p.frame_length_ms,
        num_bins=p.mel_features,
        round_pow2=p.round_pow2,
        mel_low=p.mel_low,
        mel_high=p.mel_high,
        snip_edges=True,
        pull_segment_count=p.segment_size,
        pull_segment_step=p.segment_step,
        remove_dc_offset=True,
        preemph_coeff=0.97,
    )


def _interp_runtime_fns(enc_graph, dec_graph, joi_graph, h_shape, c_shape):
    """Vmapped batch-1 interpreter functions with engine-facing layouts."""
    enc_fn, enc_w = lower_graph(enc_graph)
    dec_fn, dec_w = lower_graph(dec_graph)
    joi_fn, joi_w = lower_graph(joi_graph)
    weights = {"enc": enc_w, "dec": dec_w, "joi": joi_w}

    def enc_one(w, x1, h1, c1):
        # x1 [seg, mel]; h1 [L, dh]; c1 [L, dc]
        e, h2, c2 = enc_fn(w, x1[None], h1[:, None], c1[:, None])
        return e[0, 0], h2[:, 0], c2[:, 0]

    def encoder(w, x, h, c):
        return jax.vmap(enc_one, in_axes=(None, 0, 1, 1), out_axes=(0, 1, 1))(
            w["enc"], x, h, c
        )

    def dec_one(w, ctx1):
        (d,) = dec_fn(w, ctx1[None].astype(jnp.int32))
        return d[0, 0]

    def decoder(w, ctx):
        return jax.vmap(dec_one, in_axes=(None, 0))(w["dec"], ctx)

    def joi_one(w, e1, d1):
        (l,) = joi_fn(w, e1[None, None], d1[None, None])
        return l.reshape(-1)

    def joiner(w, eout, dout):
        return jax.vmap(joi_one, in_axes=(None, 0, 0))(w["joi"], eout, dout)

    return weights, encoder, decoder, joiner


def _native_runtime_fns(dims: TransducerDims):
    def encoder(w, x, h, c):
        return encoder_step(w, x, h, c)

    def decoder(w, ctx):
        return decoder_step(w, ctx, dims)

    def joiner(w, eout, dout):
        return joiner_logits(w, eout, dout)

    return encoder, decoder, joiner


def _native_joiner_argmax(blank_id: int):
    from .lstm_transducer import joiner_argmax

    return lambda w, e, d: joiner_argmax(w, e, d, blank_id)


def _native_decoder_joiner(blank_id: int, dims):
    from .lstm_transducer import decoder_joiner_argmax

    return lambda w, ctx, nd, dout, e: decoder_joiner_argmax(
        w, ctx, nd, dout, e, blank_id, dims
    )


def _lstm_embed_front():
    from .lstm_transducer import encoder_embed_front

    return encoder_embed_front


def _native_split_fns():
    """Optional split-encoder trio for the engine's batched-window fast paths
    (embed over all windows at once; recurrent inside the scan; layer-major
    whole-chunk form for the hot path)."""
    from .lstm_transducer import encoder_chunk, encoder_embed, encoder_recurrent

    return encoder_embed, encoder_recurrent, encoder_chunk


def _verify_native(dims, native_w, interp_fns, seed=0, atol=2e-4) -> Optional[str]:
    """Compare native vs interpreter on random inputs. Returns None if they
    agree, else a description of the first mismatch."""
    interp_w, ienc, idec, ijoi = interp_fns
    nenc, ndec, njoi = _native_runtime_fns(dims)
    # jit everything: eager execution would pay one backend round-trip per op
    # (very expensive on remote TPU backends).
    ienc, idec, ijoi = jax.jit(ienc), jax.jit(idec), jax.jit(ijoi)
    nenc, ndec, njoi = jax.jit(nenc), jax.jit(ndec), jax.jit(njoi)
    rng = np.random.default_rng(seed)
    S = 2
    x = rng.normal(size=(S, dims.segment_size, dims.mel)).astype(np.float32)
    h = (rng.normal(size=(dims.layers, S, dims.d_model)) * 0.1).astype(np.float32)
    c = (rng.normal(size=(dims.layers, S, dims.hidden)) * 0.1).astype(np.float32)
    ctx = rng.integers(0, dims.vocab, size=(S, dims.context)).astype(np.int32)

    ne, nh, nc = nenc(native_w, x, h, c)
    ie, ih, ic = ienc(interp_w, x, h, c)
    for name, a, b in (("encoder_out", ne, ie), ("h", nh, ih), ("c", nc, ic)):
        if not np.allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=1e-3):
            return f"{name} mismatch (max diff {np.max(np.abs(np.asarray(a) - np.asarray(b))):.3e})"

    nd = ndec(native_w, ctx)
    idv = idec(interp_w, ctx)
    if not np.allclose(np.asarray(nd), np.asarray(idv), atol=atol, rtol=1e-3):
        return "decoder_out mismatch"

    nl = njoi(native_w, ne, nd)
    il = ijoi(interp_w, ie, idv)
    if not np.allclose(np.asarray(nl), np.asarray(il), atol=atol, rtol=1e-3):
        return "logits mismatch"
    return None


def load_model(path: str | os.PathLike, prefer_native: bool = True) -> ModelRuntime:
    """Load a .april model into a ModelRuntime (aam_create_model equivalent)."""
    container = read_container(path)
    p = container.params

    if container.model_type == MODEL_NATIVE_TRANSDUCER_TPU:
        return _load_native_container(container)

    if container.model_type != MODEL_LSTM_TRANSDUCER_STATELESS or container.network_count != 3:
        # reference: april_model.c:36-40
        raise ValueError(
            f"model has unknown type {container.model_type} or wrong network "
            f"count {container.network_count}"
        )

    enc_graph = parse_model(container.networks[0]).graph
    dec_graph = parse_model(container.networks[1]).graph
    joi_graph = parse_model(container.networks[2]).graph

    # Shape cross-checks, reference april_model.c:74-102.
    x_shape = enc_graph.input_shapes.get("x") or enc_graph.input_shapes.get(
        enc_graph.inputs[0]
    )
    if x_shape is not None:
        if x_shape[0] != p.batch_size or x_shape[1] != p.segment_size or x_shape[2] != p.mel_features:
            raise ValueError(f"encoder x shape {x_shape} inconsistent with params")
    h_shape = enc_graph.input_shapes.get("h") or enc_graph.input_shapes.get(
        enc_graph.inputs[1]
    )
    c_shape = enc_graph.input_shapes.get("c") or enc_graph.input_shapes.get(
        enc_graph.inputs[2]
    )

    interp_fns = _interp_runtime_fns(enc_graph, dec_graph, joi_graph, h_shape, c_shape)

    kind = "interp"
    dims = None
    weights: Dict = interp_fns[0]
    enc, dec, joi = interp_fns[1], interp_fns[2], interp_fns[3]

    if prefer_native:
        try:
            dims, native_w = extract_transducer(
                enc_graph,
                dec_graph,
                joi_graph,
                segment_size=p.segment_size,
                segment_step=p.segment_step,
                mel=p.mel_features,
            )
            mismatch = _verify_native(dims, native_w, interp_fns)
            if mismatch is None:
                kind = "native"
                weights = {k: jnp.asarray(v) for k, v in native_w.items()}
                weights = precompute_decoder_tables(weights, dims)
                enc, dec, joi = _native_runtime_fns(dims)
                log.info("model %s: native extraction verified", container.name)
            else:
                log.warning(
                    "model %s: native extraction failed verification (%s); "
                    "using interpreter path",
                    container.name,
                    mismatch,
                )
                dims = None
        except ExtractionError as e:
            log.info(
                "model %s: graphs don't match native architecture (%s); "
                "using interpreter path",
                container.name,
                e,
            )

    if dims is None:
        # Interpreter path: dims for state allocation from graph input shapes.
        if h_shape is None or c_shape is None:
            raise ValueError("encoder graph lacks h/c input shapes")
        logits_shape = joi_graph.output_shapes.get(joi_graph.outputs[0])
        vocab = p.token_count
        if logits_shape is not None and logits_shape[-1] != vocab:
            # reference: april_model.c:102
            raise ValueError(
                f"joiner logits dim {logits_shape[-1]} != token count {vocab}"
            )
        dims = TransducerDims(
            mel=p.mel_features,
            segment_size=p.segment_size,
            segment_step=p.segment_step,
            d_model=h_shape[2],
            hidden=c_shape[2],
            joiner_dim=0,
            vocab=vocab,
            layers=h_shape[0],
            context=p.token_count and (dec_graph.input_shapes.get(dec_graph.inputs[0], [1, 2])[1]),
        )

    if p.token_count != dims.vocab:
        raise ValueError(
            f"params token count {p.token_count} != model vocab {dims.vocab}"
        )

    state_shapes = (
        (dims.layers, dims.d_model),
        (dims.layers, dims.hidden),
    )

    embed = recur = chunk = None
    if kind == "native":
        embed, recur, chunk = _native_split_fns()
    return ModelRuntime(
        name=container.name,
        description=container.description,
        language=container.language,
        params=p,
        fbank_opts=_fbank_opts_from_params(p),
        vocab=build_vocab_tables(p),
        dims=dims,
        kind=kind,
        weights=weights,
        encoder_step=enc,
        decoder_step=dec,
        joiner=joi,
        state_shapes=state_shapes,
        encoder_embed=embed,
        encoder_recurrent=recur,
        encoder_chunk=chunk,
        joiner_argmax=_native_joiner_argmax(p.blank_id) if kind == "native" else None,
        decoder_joiner_argmax=(
            _native_decoder_joiner(p.blank_id, dims) if kind == "native" else None
        ),
        encoder_embed_front=_lstm_embed_front() if kind == "native" else None,
    )


def _load_native_container(container: AprilContainer) -> ModelRuntime:
    """Native checkpoint form: single safetensors network blob. The `arch`
    metadata selects the model family (lstm | conformer)."""
    from ..io.safetensors import load_safetensors_bytes

    p = container.params
    tensors, meta = load_safetensors_bytes(container.networks[0])
    arch = meta.get("arch", "lstm")
    dims_kw = {
        k: (tuple(v) if k == "conv_channels" else v)
        for k, v in meta["dims"].items()
    }
    if arch == "conformer":
        return _conformer_runtime(container, p, tensors, dims_kw)
    dims = TransducerDims(**dims_kw)
    weights = precompute_decoder_tables(
        {k: jnp.asarray(v) for k, v in tensors.items()}, dims
    )
    enc, dec, joi = _native_runtime_fns(dims)
    embed, recur, chunk = _native_split_fns()
    return ModelRuntime(
        name=container.name,
        description=container.description,
        language=container.language,
        params=p,
        fbank_opts=_fbank_opts_from_params(p),
        vocab=build_vocab_tables(p),
        dims=dims,
        kind="native",
        weights=weights,
        encoder_step=enc,
        decoder_step=dec,
        joiner=joi,
        state_shapes=((dims.layers, dims.d_model), (dims.layers, dims.hidden)),
        encoder_embed=embed,
        encoder_recurrent=recur,
        encoder_chunk=chunk,
        joiner_argmax=_native_joiner_argmax(p.blank_id),
        decoder_joiner_argmax=_native_decoder_joiner(p.blank_id, dims),
        encoder_embed_front=_lstm_embed_front(),
    )


def _conformer_runtime(container, p, tensors, dims_kw) -> ModelRuntime:
    """Runtime for the streaming Conformer family (models/conformer.py):
    same 3-function engine contract, attention/conv state packed into the
    h/c arrays per ConformerDims.state_shapes."""
    from .conformer import (
        ConformerDims,
        conformer_encoder_chunk,
        conformer_encoder_embed,
        conformer_encoder_recurrent,
        conformer_encoder_step,
    )

    dims = ConformerDims(**dims_kw)
    weights = precompute_decoder_tables(
        {k: jnp.asarray(v) for k, v in tensors.items()}, dims
    )
    return ModelRuntime(
        name=container.name,
        description=container.description,
        language=container.language,
        params=p,
        fbank_opts=_fbank_opts_from_params(p),
        vocab=build_vocab_tables(p),
        dims=dims,
        kind="native",
        weights=weights,
        encoder_step=lambda w, x, h, c: conformer_encoder_step(w, x, h, c, dims),
        decoder_step=lambda w, ctx: decoder_step(w, ctx, dims),
        joiner=joiner_logits,
        state_shapes=dims.state_shapes,
        encoder_embed=conformer_encoder_embed,
        encoder_recurrent=lambda w, y, h, c, gate=None: conformer_encoder_recurrent(
            w, y, h, c, dims, gate
        ),
        encoder_chunk=lambda w, y, h, c, can: conformer_encoder_chunk(
            w, y, h, c, dims, can
        ),
        encoder_chunk_max_pulls=dims.att_context,
    )
