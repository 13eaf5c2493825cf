"""Icefall torch-checkpoint importer: `lstm_transducer_stateless2` -> native.

The reference ecosystem's models are trained with icefall and converted by
the reference's exporter (reference: extra/export-april.py:183-224, which
wraps the recipe's encoder/decoder/joiner modules and torch.onnx-exports
them; :453-472 loads the checkpoint via the recipe's get_transducer_model).
A user migrating from that ecosystem holds a torch checkpoint (epoch-N.pt /
pretrained.pt) — this module ingests it directly, without icefall, torch
tracing, or ONNX:

  1. load the state_dict (handles the {"model": ...} checkpoint wrapper),
  2. fold icefall's Scaled* parameterization (every `<name>_scale` /
     embedding `scale` is a log-scale: effective = weight * exp(scale)),
  3. map the recipe's module names onto the native weights pytree
     (models/extract.py layout — the same pytree ONNX extraction produces,
     so everything downstream: engine, int8 quantization, TP, export),
  4. derive TransducerDims from the tensor shapes.

Module-name contract (icefall lstm_transducer_stateless2; the reference
exporter touches exactly these modules, export-april.py:183-224, 285-331):

  encoder.encoder_embed.conv.{0,3,6}.{weight,bias}   3x ScaledConv2d
  encoder.encoder_embed.out.{weight,bias}            ScaledLinear -> d_model
  encoder.encoder.layers.{l}.lstm.weight_ih_l0       [4H, d]
  encoder.encoder.layers.{l}.lstm.weight_hh_l0       [4H, d]  (proj LSTM)
  encoder.encoder.layers.{l}.lstm.weight_hr_l0       [d, H]
  encoder.encoder.layers.{l}.lstm.bias_{ih,hh}_l0    [4H] (summed)
  encoder.encoder.layers.{l}.feed_forward.{0,4}.*    ScaledLinear pair
  encoder.encoder.layers.{l}.norm_final.eps          BasicNorm log-eps
  decoder.embedding.{weight,scale}                   ScaledEmbedding
  decoder.conv.weight                                grouped context conv
  joiner.encoder_proj.{weight,bias}                  folded into encoder
  joiner.decoder_proj.{weight,bias}                  folded into decoder
  joiner.output_linear.{weight,bias}                 joiner logits

Gate order is torch's i f g o — the native layout's order (extract.py:17),
so no gate permutation is needed. Training-only heads (simple_am_proj /
simple_lm_proj, pruned-RNNT auxiliaries) are skipped.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..utils import logging as log
from .lstm_transducer import TransducerDims

# training-only / stateless entries a checkpoint may carry
_SKIP_PREFIXES = ("simple_am_proj.", "simple_lm_proj.")
_SKIP_SUFFIXES = ("num_batches_tracked",)


def load_state_dict(path) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into a name -> float32 ndarray dict.
    Accepts both raw state_dicts and icefall's {"model": state_dict, ...}
    checkpoint wrapper (icefall.checkpoint.save_checkpoint layout)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def fold_scales(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold icefall's Scaled* parameterization: for every `<name>_scale`
    entry, the effective tensor is `<name> * exp(scale)`; ScaledEmbedding
    instead keeps a sibling `scale` whose exp multiplies `weight`. (This is
    what icefall's convert_scaled_to_non_scaled does before the reference
    exporter traces the modules, export-april.py:57,474.)"""
    out = {}
    for k, v in sd.items():
        if k.endswith("_scale"):
            continue
        scale = sd.get(k + "_scale")
        if scale is None and k.endswith(".weight"):
            # ScaledEmbedding: module-level `scale` parameter
            sib = k[: -len("weight")] + "scale"
            scale = sd.get(sib)
        if scale is not None:
            v = v * np.exp(scale).astype(v.dtype)
        out[k] = v
    # module-level `scale` entries were consumed above
    return {k: v for k, v in out.items() if not k.endswith(".scale")}


def import_icefall_lstm(
    sd: Dict[str, np.ndarray],
    mel: int = 80,
    segment_size: int = 9,
    segment_step: int = 4,
) -> Tuple[TransducerDims, Dict[str, np.ndarray]]:
    """Map a (scale-folded) lstm_transducer_stateless2 state_dict onto the
    native pytree. Raises KeyError with the missing name when a required
    tensor is absent; unknown leftover names are logged, not fatal."""
    sd = fold_scales(sd)
    consumed = set()

    def take(name):
        if name not in sd:
            raise KeyError(
                f"checkpoint is missing {name!r} — not a "
                "lstm_transducer_stateless2 state_dict?"
            )
        consumed.add(name)
        return np.asarray(sd[name], np.float32)

    def take_opt(name, default=None):
        if name in sd:
            consumed.add(name)
            return np.asarray(sd[name], np.float32)
        return default

    E = "encoder.encoder_embed"
    p: Dict[str, np.ndarray] = {}
    for i, idx in enumerate((0, 3, 6), start=1):
        p[f"conv{i}_w"] = take(f"{E}.conv.{idx}.weight")
        b = take_opt(f"{E}.conv.{idx}.bias")
        if b is None:
            b = np.zeros(p[f"conv{i}_w"].shape[0], np.float32)
        p[f"conv{i}_b"] = b
    p["embed_out_w"] = take(f"{E}.out.weight").T.copy()
    p["embed_out_b"] = take_opt(
        f"{E}.out.bias", np.zeros(p["embed_out_w"].shape[1], np.float32)
    )

    L = 0
    while f"encoder.encoder.layers.{L}.lstm.weight_ih_l0" in sd:
        L += 1
    if L == 0:
        raise KeyError(
            "no encoder.encoder.layers.*.lstm.weight_ih_l0 entries — not a "
            "lstm_transducer_stateless2 state_dict?"
        )

    w_ih, w_hh, w_hr, bias, ff1, ff1_b, ff2, ff2_b, eps = (
        [], [], [], [], [], [], [], [], []
    )
    for l in range(L):
        Lp = f"encoder.encoder.layers.{l}"
        w_ih.append(take(f"{Lp}.lstm.weight_ih_l0").T.copy())
        w_hh.append(take(f"{Lp}.lstm.weight_hh_l0").T.copy())
        w_hr.append(take(f"{Lp}.lstm.weight_hr_l0").T.copy())
        b_ih = take(f"{Lp}.lstm.bias_ih_l0")
        b_hh = take_opt(f"{Lp}.lstm.bias_hh_l0", 0.0)
        bias.append(b_ih + b_hh)
        ff1.append(take(f"{Lp}.feed_forward.0.weight").T.copy())
        ff1_b.append(take(f"{Lp}.feed_forward.0.bias"))
        ff2.append(take(f"{Lp}.feed_forward.4.weight").T.copy())
        ff2_b.append(take(f"{Lp}.feed_forward.4.bias"))
        # BasicNorm stores log-eps (icefall scaling.py); native keeps eps
        eps.append(float(np.exp(take(f"{Lp}.norm_final.eps"))))

    p["w_ih_t"] = np.stack(w_ih)
    p["w_hh_t"] = np.stack(w_hh)
    p["w_hr_t"] = np.stack(w_hr)
    p["bias"] = np.stack(bias)
    p["ff1_t"] = np.stack(ff1)
    p["ff1_b"] = np.stack(ff1_b)
    p["ff2_t"] = np.stack(ff2)
    p["ff2_b"] = np.stack(ff2_b)
    p["norm_eps"] = np.asarray(eps, np.float32)

    p["enc_proj_t"] = take("joiner.encoder_proj.weight").T.copy()
    p["enc_proj_b"] = take("joiner.encoder_proj.bias")
    p["dec_embed"] = take("decoder.embedding.weight")
    p["dec_conv_w"] = take("decoder.conv.weight")
    dec_conv_b = take_opt("decoder.conv.bias")
    if dec_conv_b is not None and np.any(dec_conv_b):
        # the recipe's context conv is bias-free (matching extract.py's
        # decoder contract); a nonzero bias means a different architecture
        raise ValueError("decoder.conv.bias is nonzero — unsupported recipe")
    p["dec_proj_t"] = take("joiner.decoder_proj.weight").T.copy()
    p["dec_proj_b"] = take("joiner.decoder_proj.bias")
    p["join_t"] = take("joiner.output_linear.weight").T.copy()
    p["join_b"] = take("joiner.output_linear.bias")

    leftovers = [
        k
        for k in sd
        if k not in consumed
        and not k.startswith(_SKIP_PREFIXES)
        and not k.endswith(_SKIP_SUFFIXES)
    ]
    if leftovers:
        log.warning(
            "torch import: %d unmapped checkpoint entries ignored "
            "(first few: %s)",
            len(leftovers),
            ", ".join(sorted(leftovers)[:6]),
        )

    d_model = p["w_ih_t"].shape[1]
    hidden = p["w_ih_t"].shape[2] // 4
    dims = TransducerDims(
        mel=mel,
        segment_size=segment_size,
        segment_step=segment_step,
        d_model=d_model,
        hidden=hidden,
        ffn=p["ff1_t"].shape[2],
        joiner_dim=p["enc_proj_t"].shape[2] if p["enc_proj_t"].ndim == 3
        else p["enc_proj_t"].shape[1],
        vocab=p["dec_embed"].shape[0],
        layers=L,
        context=p["dec_conv_w"].shape[2],
        decoder_groups=d_model // p["dec_conv_w"].shape[1],
        conv_channels=(
            p["conv1_w"].shape[0],
            p["conv2_w"].shape[0],
            p["conv3_w"].shape[0],
        ),
    )
    return dims, p


def parse_tokens_txt(path) -> Tuple[List[bytes], int]:
    """Parse icefall's data/lang_bpe_*/tokens.txt ("<piece> <id>" lines)
    into the .april token table: SentencePiece's U+2581 word marker becomes
    a leading space, exactly as the reference exporter does at write time
    (export-april.py:359-364). Returns (tokens, blank_id)."""
    entries = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split()
            if not parts:
                continue
            piece = parts[0] if len(parts) > 1 else ""
            idx = int(parts[-1])
            entries[idx] = piece
    n = max(entries) + 1 if entries else 0
    blank_id = 0
    toks: List[bytes] = []
    for i in range(n):
        piece = entries.get(i, "")
        if piece == "<blk>":
            blank_id = i
        toks.append(piece.replace("▁", " ").encode("utf-8"))
    return toks, blank_id
