"""Model-FLOPs accounting for the serving bench (MFU / roofline).

The reference has no performance accounting at all (BASELINE.md: published
metrics "{}"); this module supplies the denominator for the TPU build's
throughput claims: FLOPs the model MUST execute per audio-second, counted
from the architecture dims (not from XLA cost models, so the number is
implementation-independent), divided into the sustained TFLOP/s implied by a
measured audio-s/s rate and the chip's peak for the active precision.

Counting rules (per 40 ms fbank pull — 25 pulls per audio-second at the
reference hop of segment_step * 10 ms, fbank.c:359-361):
  * 1 MAC = 2 FLOPs.
  * Conv-embed, encoder stack, and the <=3-symbol inner decode loop are all
    executed UNCONDITIONALLY by the batched engine (fixed-shape masked
    compute, engine/step.py) — so every term below is real device work, not
    a worst case.
  * Elementwise/norm/activation FLOPs are EXCLUDED (they are VPU work that
    overlaps MXU matmuls; including them would inflate MFU). The accounting
    is therefore a slight undercount — conservative in the honest direction.
  * The fbank frontend (DFT matmul) is excluded for the same reason: its
    cost is real but not "model FLOPs"; it is reported separately in the
    profiling docs (docs/serving.md).
"""

from __future__ import annotations

import os


def _conv_embed_macs(dims) -> int:
    """3-conv subsample stack + output projection on one [segment, mel]
    window (models/lstm_transducer.py conv_subsample — shared by both
    families)."""
    c1, c2, c3 = dims.conv_channels
    t, f = dims.segment_size, dims.mel
    macs = 0
    # conv1: 1 -> c1, 3x3, stride 1, pad 1 (same size out)
    macs += t * f * c1 * 1 * 9
    t, f = (t - 3) // 2 + 1, (f - 3) // 2 + 1  # conv2 stride 2, no pad
    macs += t * f * c2 * c1 * 9
    t, f = (t - 3) // 2 + 1, (f - 3) // 2 + 1  # conv3 stride 2
    macs += t * f * c3 * c2 * 9
    d_out = getattr(dims, "d_model")
    macs += (c3 * f) * d_out  # embed_out projection
    return macs


def _decode_macs_per_round(dims) -> int:
    """One inner decode round: decoder refresh (dec_proj via the exact
    precomputed table) + joiner logits."""
    j = dims.joiner_dim
    return j * j + j * dims.vocab


def model_gflops_per_audio_second(dims, arch: str = "lstm", beam: int = 1) -> float:
    """Architecture FLOPs per audio-second for the serving step.

    arch='lstm': reference-dim LSTMP transducer (april_model.h:35-41): per
    layer per pull ih [d,4H] + hh [d,4H] + proj [H,d] + FFN [d,F]+[F,d].
    arch='conformer': macaron FF pair, MHSA over the C-frame KV ring, GLU
    conv block. beam>1 multiplies the inner decode rounds by the beam width
    (beam_expand_round evaluates decoder+joiner for every hypothesis).
    """
    pulls_per_s = 1000.0 / (dims.segment_step * 10)
    macs = _conv_embed_macs(dims)
    if arch == "conformer":
        d, F, C, k = dims.d_model, dims.ffn, dims.att_context, dims.conv_kernel
        per_layer = (
            2 * (d * F + F * d)  # macaron FF + FF
            + 4 * d * d  # q, k, v, o projections
            + 2 * C * d  # scores + weighted sum over the ring
            + d * 2 * d + k * d + d * d  # conv: pw1 (GLU), depthwise, pw2
        )
        macs += dims.layers * per_layer
    else:
        d, H, F = dims.d_model, dims.hidden, dims.ffn
        per_layer = d * 4 * H + d * 4 * H + H * d + d * F + F * d
        macs += dims.layers * per_layer
    macs += 3 * beam * _decode_macs_per_round(dims)
    return 2.0 * macs * pulls_per_s / 1e9


def chip_peak_tflops(precision: str = "int8") -> float:
    """Peak matmul throughput of the local accelerator for `precision`
    ('int8' | 'bf16' | 'f32'), overridable via APRIL_CHIP_PEAK_TFLOPS.

    Known kinds: TPU v5e (v5litepod) 394 int8 TOPS / 197 bf16 TFLOPs
    (public spec). Unknown kinds fall back to the v5e numbers with a
    warning-by-honesty: the bench records the assumed peak in its output so
    a misdetected chip is visible, not silent.
    """
    env = os.environ.get("APRIL_CHIP_PEAK_TFLOPS")
    if env:
        return float(env)
    kind = ""
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        pass
    table = {
        # device_kind substring -> (bf16 peak, int8 peak)
        "v5 lite": (197.0, 394.0),
        "v5litepod": (197.0, 394.0),
        "v5e": (197.0, 394.0),
        "v5p": (459.0, 918.0),
        "v4": (275.0, 275.0),  # v4 has no 2x int8 mode
        "v6e": (918.0, 1836.0),
    }
    bf16, int8 = 197.0, 394.0  # default: v5e-class
    for sub, (b, i) in table.items():
        if sub in kind:
            bf16, int8 = b, i
            break
    if precision == "int8":
        return int8
    if precision in ("bf16", "f32"):
        return bf16
    return bf16
