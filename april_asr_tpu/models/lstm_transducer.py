"""Native batched LSTM-transducer forward pass (encoder / decoder / joiner).

TPU-first redesign of the three networks the reference runs through
ONNXRuntime at batch 1 (reference: src/april_session.c:131-179, architecture
exported by extra/export-april.py:183-224 from icefall's
lstm_transducer_stateless2):

  * All functions are batched over a leading session/utterance axis S — the
    central scaling axis (SURVEY.md §2.4). Weight matrices are stored
    pre-transposed for right-multiplication so every hot op is a single
    [S, in] x [in, out] MXU matmul.
  * The 12-layer LSTM stack runs as a lax.scan over stacked per-layer
    parameters ([L, ...] leaves) — one compiled layer body regardless of L.
  * Gate order is i f g o (torch/icefall convention); the ONNX extractor
    (models/extract.py) normalizes into this layout.
  * Dtype policy: parameters may be float32 or bfloat16; matmuls accumulate
    in float32 via preferred_element_type.

Dimensions follow the canonical reference model (src/april_model.h:35-41):
mel=80, segment=9, d_model=512, hidden=1024, joiner_dim=512, vocab=500,
layers=12, context=2; all are configurable.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TransducerDims:
    mel: int = 80
    segment_size: int = 9
    segment_step: int = 4
    d_model: int = 512
    hidden: int = 1024
    ffn: int = 2048
    joiner_dim: int = 512
    vocab: int = 500
    layers: int = 12
    context: int = 2
    decoder_groups: int = 128
    # Conv subsampling channels (time reduction 9 -> 1, like the reference's
    # encoder embed; see testing.py ConvSubsample).
    conv_channels: Tuple[int, int, int] = (8, 32, 32)

    @property
    def conv_freq_out(self) -> int:
        return ((self.mel - 1) // 2 - 1) // 2

    @property
    def subsampled_t(self) -> int:
        t = self.segment_size  # conv1: pad 1 keeps T
        t = (t - 3) // 2 + 1  # conv2 stride 2
        t = (t - 3) // 2 + 1  # conv3 stride 2
        return t


Params = Dict[str, jnp.ndarray]

# Inference-only derived entries (precompute_decoder_tables); never trained,
# checkpointed, or exported.
DERIVED_KEYS = frozenset({"dec_table"})

# Encoder layer matrices eligible for int8 quantization (quantize_weights):
# the LSTM family's five, plus the Conformer block's ten (models/conformer.py
# _mmq picks them up per layer). quantize_weights skips absent names, so one
# target list serves both families.
QUANT_TARGETS = (
    "w_ih_t", "w_hh_t", "w_hr_t", "ff1_t", "ff2_t",
    "ff1_a", "ff1_o", "att_q", "att_k", "att_v", "att_o",
    "cv_pw1", "cv_pw2", "ff2_a", "ff2_o",
)


def is_derived(key: str) -> bool:
    """True for inference-only derived params (decoder tables, int8
    quantized copies + scales) that must never be trained, checkpointed,
    exported, or dtype-cast."""
    return key in DERIVED_KEYS or key.endswith("_q8") or key.endswith("_q8s")


def init_transducer_params(
    rng: jax.Array, dims: TransducerDims, dtype=jnp.float32
) -> Params:
    """Random init with small scales (for tests/benches; real weights come
    from .april extraction or a native checkpoint)."""
    d, H, F, J, V, L = (
        dims.d_model,
        dims.hidden,
        dims.ffn,
        dims.joiner_dim,
        dims.vocab,
        dims.layers,
    )
    c1, c2, c3 = dims.conv_channels
    keys = jax.random.split(rng, 24)
    k = iter(keys)

    def w(key, shape, scale=None):
        scale = scale if scale is not None else 1.0 / np.sqrt(shape[0])
        return (jax.random.normal(key, shape) * scale).astype(dtype)

    params: Params = {
        # conv subsampling (NCHW / OIHW layouts)
        "conv1_w": w(next(k), (c1, 1, 3, 3), 0.3),
        "conv1_b": jnp.zeros(c1, dtype),
        "conv2_w": w(next(k), (c2, c1, 3, 3), 0.1),
        "conv2_b": jnp.zeros(c2, dtype),
        "conv3_w": w(next(k), (c3, c2, 3, 3), 0.1),
        "conv3_b": jnp.zeros(c3, dtype),
        "embed_out_w": w(next(k), (c3 * dims.conv_freq_out, d)),
        "embed_out_b": jnp.zeros(d, dtype),
        # stacked LSTM layers, pre-transposed: x[S,d] @ w_ih_t[d,4H]
        "w_ih_t": w(next(k), (L, d, 4 * H), 0.05),
        "w_hh_t": w(next(k), (L, d, 4 * H), 0.05),
        "bias": jnp.zeros((L, 4 * H), dtype),
        "w_hr_t": w(next(k), (L, H, d), 0.05),
        "ff1_t": w(next(k), (L, d, F)),
        "ff1_b": jnp.zeros((L, F), dtype),
        "ff2_t": w(next(k), (L, F, d)),
        "ff2_b": jnp.zeros((L, d), dtype),
        "norm_eps": jnp.full((L,), 0.25, dtype),
        # encoder -> joiner projection
        "enc_proj_t": w(next(k), (d, J)),
        "enc_proj_b": jnp.zeros(J, dtype),
        # decoder (stateless 2-gram): embedding + grouped context conv + proj
        "dec_embed": w(next(k), (V, d), 0.5),
        "dec_conv_w": w(next(k), (d, d // dims.decoder_groups, dims.context), 0.3),
        "dec_proj_t": w(next(k), (d, J)),
        "dec_proj_b": jnp.zeros(J, dtype),
        # joiner
        "join_t": w(next(k), (J, V)),
        "join_b": jnp.zeros(V, dtype),
    }
    return params


def cast_weights(params: Params, dtype) -> Params:
    """Cast matrix/embedding weights to `dtype` (e.g. bfloat16), keeping
    biases, norm eps, and derived tables in float32.

    bf16 weights halve HBM traffic and run the MXU at its native rate
    (~4x the f32 matmul peak on v5e); all matmuls still accumulate in f32
    via preferred_element_type, and the LSTM cell state stays f32 in
    _lstm_stack_step, so streaming error does not compound.
    """
    out = {}
    for k, v in params.items():
        if v.ndim >= 2 and not is_derived(k) and v.dtype == jnp.float32:
            out[k] = v.astype(dtype)
        else:
            out[k] = v
    return out


def quantize_weights(params: Params) -> Params:
    """Add per-output-channel symmetric int8 copies of the encoder layer
    matrices (`<name>_q8` int8 values + `<name>_q8s` f32 column scales).

    This is the int8 quantized SERVING path: the v5e MXU runs int8 x int8 ->
    int32 at ~2x its bf16 rate, and the 12-layer encoder is ~98% of the
    engine step's FLOPs. Activations are quantized dynamically per row at
    matmul time (see `_q8_mm` / ops/lstm_pallas._rowq8); accumulation is
    exact int32, dequantized to f32 before every nonlinearity, and the LSTM
    cell state stays f32 — so quantization error does not compound across
    the stream. Originals are kept alongside for training/export and the
    conv-embed/decoder/joiner (negligible FLOPs, stay bf16/f32).

    Call AFTER precompute_decoder_tables and ideally BEFORE cast_weights:
    quantization reads the stored originals, so quantizing after a bf16
    cast calibrates against bf16-rounded values (astype(f32) cannot recover
    the original f32 weights). The shipped apply_precision path quantizes
    first; a non-f32 source is accepted but logged."""
    out = dict(params)
    if params.get("w_ih_t") is not None and params["w_ih_t"].dtype != jnp.float32:
        from ..utils import logging as _log

        _log.warning(
            "quantize_weights: source weights are %s, not f32 — int8 scales "
            "will be calibrated against already-rounded values (quantize "
            "before cast_weights to avoid this)",
            params["w_ih_t"].dtype,
        )
    for name in QUANT_TARGETS:
        if name not in params or name + "_q8" in params:
            continue
        w = params[name].astype(jnp.float32)
        # [L, in, out]: amax over the contraction (input) axis -> [L, 1, out]
        amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
        s = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
        out[name + "_q8"] = jnp.round(w / s).astype(jnp.int8)
        out[name + "_q8s"] = s
    return out


def is_quantized(params: Params) -> bool:
    return "w_ih_t_q8" in params


def _q8_rows(x):
    """Dynamic per-row symmetric int8 activation quantization (XLA form,
    numerically identical to ops/lstm_pallas._rowq8)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    q = jnp.round(x * (1.0 / s)).astype(jnp.int8)
    return q, s


def _q8_mm(x, wq, ws):
    """int8 dynamic-activation matmul with exact int32 accumulation:
    x f32 [m, k] @ (wq int8 [k, n] * ws [1, n]) -> f32 [m, n]."""
    q, s = _q8_rows(x.astype(jnp.float32))
    acc = jnp.dot(q, wq, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (s * ws)


def _mm(x, w):
    """Matmul with f32 accumulation, casting x to the weight dtype first so
    bf16 weights get a bf16xbf16->f32 MXU issue instead of an f32 upcast."""
    return jnp.dot(x.astype(w.dtype), w, preferred_element_type=jnp.float32)


def _double_swish(x):
    """x * sigmoid(x - 1) (icefall DoubleSwish; fused by XLA)."""
    return x * _sig(x - 1.0)


def _basic_norm(x, eps):
    """x * rsqrt(mean(x^2) + eps) (icefall BasicNorm inference form)."""
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)


def conv_subsample(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """[S, T, mel] -> [S, T', d_model] via the 3-conv stack (T'=(T-1)//2-1)//2)."""
    h = x[:, None, :, :]  # NCHW: [S, 1, T, mel]

    def conv(h, wname, bname, stride, pad):
        w = params[wname]
        y = jax.lax.conv_general_dilated(
            h.astype(w.dtype),
            w,
            (stride, stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )
        return _double_swish(y + params[bname][None, :, None, None].astype(jnp.float32))

    h = conv(h, "conv1_w", "conv1_b", 1, 1)
    h = conv(h, "conv2_w", "conv2_b", 2, 0)
    h = conv(h, "conv3_w", "conv3_b", 2, 0)
    s, ch, t, f = h.shape
    h = jnp.transpose(h, (0, 2, 1, 3)).reshape(s, t, ch * f)
    return _mm(h, params["embed_out_w"]) + params["embed_out_b"].astype(jnp.float32)


# Pallas dispatch for the layer body: see ops/dispatch.py (shared with the
# fbank frontend). Re-exported here for call sites that think in model terms.
from ..ops.activations import sigmoid as _sig
from ..ops.dispatch import pallas_disabled, pallas_wanted as _pallas_wanted  # noqa: E402


def _pick_block_s(S: int) -> int:
    for b in (512, 256, 128):
        if S % b == 0:
            return b
    return 0


def _lstm_stack_step_pallas(
    params: Params, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, block_s: int,
    gate=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    from ..ops.lstm_pallas import lstm_layer_fused

    interpret = jax.default_backend() != "tpu"

    def layer(x, scan_in):
        (w_ih_t, w_hh_t, bias, w_hr_t, ff1_t, ff1_b, ff2_t, ff2_b, eps, h_l, c_l) = scan_in
        y, h_new, c_new = lstm_layer_fused(
            x, h_l, c_l, w_ih_t, w_hh_t, bias, w_hr_t,
            ff1_t, ff1_b, ff2_t, ff2_b, eps, gate,
            block_s=block_s, interpret=interpret,
        )
        return y, (h_new, c_new)

    scan_ins = (
        params["w_ih_t"], params["w_hh_t"], params["bias"], params["w_hr_t"],
        params["ff1_t"], params["ff1_b"], params["ff2_t"], params["ff2_b"],
        params["norm_eps"], h, c,
    )
    y, (h_new, c_new) = jax.lax.scan(layer, x, scan_ins)
    return y, h_new, c_new


def _lstm_stack_step_pallas_q8(
    params: Params, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, block_s: int,
    gate=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    from ..ops.lstm_pallas import lstm_layer_fused_i8

    interpret = jax.default_backend() != "tpu"

    def layer(x, scan_in):
        (wihq, wihs, whhq, whhs, bias, whrq, whrs,
         ff1q, ff1s, ff1_b, ff2q, ff2s, ff2_b, eps, h_l, c_l) = scan_in
        y, h_new, c_new = lstm_layer_fused_i8(
            x, h_l, c_l, wihq, wihs, whhq, whhs, bias, whrq, whrs,
            ff1q, ff1s, ff1_b, ff2q, ff2s, ff2_b, eps, gate,
            block_s=block_s, interpret=interpret,
        )
        return y, (h_new, c_new)

    scan_ins = (
        params["w_ih_t_q8"], params["w_ih_t_q8s"],
        params["w_hh_t_q8"], params["w_hh_t_q8s"],
        params["bias"],
        params["w_hr_t_q8"], params["w_hr_t_q8s"],
        params["ff1_t_q8"], params["ff1_t_q8s"], params["ff1_b"],
        params["ff2_t_q8"], params["ff2_t_q8s"], params["ff2_b"],
        params["norm_eps"], h, c,
    )
    y, (h_new, c_new) = jax.lax.scan(layer, x, scan_ins)
    return y, h_new, c_new


def _lstm_stack_step(
    params: Params, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, gate=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One timestep through all L encoder layers.

    x: [S, d]; h: [L, S, d]; c: [L, S, hidden]. Scans over stacked layer
    params so the compiled body is layer-count independent. `gate` (optional
    [S] bool) keeps the carried h/c for masked sessions — the streaming
    engine's per-pull participation mask, folded into the layer body so the
    big state arrays aren't re-written by a separate select pass.
    """
    if _pallas_wanted():
        from ..ops.lstm_pallas import supported_dims

        S, d = x.shape
        hidden = c.shape[2]
        ffn = params["ff1_t"].shape[2]
        block_s = _pick_block_s(S)
        if block_s and supported_dims(S, d, hidden, ffn, block_s):
            if is_quantized(params):
                return _lstm_stack_step_pallas_q8(params, x, h, c, block_s, gate)
            return _lstm_stack_step_pallas(params, x, h, c, block_s, gate)
    if is_quantized(params):
        return _lstm_stack_step_q8(params, x, h, c, gate)

    def layer(x, scan_in):
        (w_ih_t, w_hh_t, bias, w_hr_t, ff1_t, ff1_b, ff2_t, ff2_b, eps, h_l, c_l) = scan_in
        gates = _mm(x, w_ih_t) + _mm(h_l, w_hh_t) + bias.astype(jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        # cell state stays f32 (streaming error must not compound)
        c_new = _sig(f) * c_l + _sig(i) * jnp.tanh(g)
        hc = _sig(o) * jnp.tanh(c_new)
        h_new = _mm(hc, w_hr_t)

        y = x + h_new  # residual LSTM
        ff = _mm(_double_swish(_mm(y, ff1_t) + ff1_b.astype(jnp.float32)), ff2_t) + ff2_b.astype(jnp.float32)
        y = _basic_norm(y + ff, eps.astype(jnp.float32))
        if gate is not None:
            m = gate[:, None]
            h_new = jnp.where(m, h_new, h_l)
            c_new = jnp.where(m, c_new, c_l)
        return y, (h_new, c_new)

    scan_ins = (
        params["w_ih_t"],
        params["w_hh_t"],
        params["bias"],
        params["w_hr_t"],
        params["ff1_t"],
        params["ff1_b"],
        params["ff2_t"],
        params["ff2_b"],
        params["norm_eps"],
        h,
        c,
    )
    y, (h_new, c_new) = jax.lax.scan(layer, x, scan_ins)
    return y, h_new, c_new


def _lstm_stack_step_q8(
    params: Params, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, gate=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """int8-quantized `_lstm_stack_step` (XLA path; used for the per-pull /
    flush path and as the small-dims fallback — the chunk hot loop has a
    fused Pallas int8 kernel). Numerics match the kernel: same per-row
    activation quantization, exact int32 accumulation."""

    def layer(x, scan_in):
        (wihq, wihs, whhq, whhs, bias, whrq, whrs,
         ff1q, ff1s, ff1_b, ff2q, ff2s, ff2_b, eps, h_l, c_l) = scan_in
        gates = (
            _q8_mm(x, wihq, wihs)
            + _q8_mm(h_l, whhq, whhs)
            + bias.astype(jnp.float32)
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        # cell state stays f32 (streaming error must not compound)
        c_new = _sig(f) * c_l + _sig(i) * jnp.tanh(g)
        hc = _sig(o) * jnp.tanh(c_new)
        h_new = _q8_mm(hc, whrq, whrs)

        y = x + h_new  # residual LSTM
        mid = _double_swish(_q8_mm(y, ff1q, ff1s) + ff1_b.astype(jnp.float32))
        ff = _q8_mm(mid, ff2q, ff2s) + ff2_b.astype(jnp.float32)
        y = _basic_norm(y + ff, eps.astype(jnp.float32))
        if gate is not None:
            m = gate[:, None]
            h_new = jnp.where(m, h_new, h_l)
            c_new = jnp.where(m, c_new, c_l)
        return y, (h_new, c_new)

    scan_ins = (
        params["w_ih_t_q8"], params["w_ih_t_q8s"],
        params["w_hh_t_q8"], params["w_hh_t_q8s"],
        params["bias"],
        params["w_hr_t_q8"], params["w_hr_t_q8s"],
        params["ff1_t_q8"], params["ff1_t_q8s"], params["ff1_b"],
        params["ff2_t_q8"], params["ff2_t_q8s"], params["ff2_b"],
        params["norm_eps"],
        h, c,
    )
    y, (h_new, c_new) = jax.lax.scan(layer, x, scan_ins)
    return y, h_new, c_new


def _lstm_stack_chunk(
    params: Params, y: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, gate=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Layer-major whole-chunk stack: P timesteps through all L layers.

    y: [P, S, d]; h: [L, S, d]; c: [L, S, hidden]; gate: optional [P, S]
    bool — masked (pull, session) cells keep their carried h/c and their y
    output is garbage the caller must mask (the decode step does). The gate
    MUST be a per-session prefix over P (once false, stays false), which the
    engine's fifo_len construction guarantees — this keeps masked-step
    garbage from feeding any live step.

    This is the MXU-friendly form of the encoder hot loop: for each layer,
    the input-side gate matmul [P*S, d] x [d, 4*hidden] and the whole FFN run
    batched over all P pulls (62% of the layer FLOPs at reference dims), and
    only the recurrent half — h @ w_hh, the cell, and the [hidden, d]
    projection — stays inside the sequential time scan. Equivalent to
    scanning `_lstm_stack_step` over P (parity-tested in
    tests/test_native_model.py); with the fused chunk kernel below it cut
    the measured v5e engine step from 103 to 84 ms at S=2048, 25 pulls.
    """
    P, S, d = y.shape

    if _pallas_wanted():
        from ..ops.lstm_pallas import (
            CHUNK_MAX_PULLS,
            CHUNK_MIN_PULLS,
            lstm_layer_chunk_fused,
            supported_dims,
        )

        hidden = c.shape[2]
        ffn = params["ff1_t"].shape[2]
        # small session tiles: the x/y blocks are P timesteps deep, so the
        # VMEM budget scales with P * block_s (vs block_s for the step kernel)
        block_s = next((b for b in (128, 256) if S % b == 0), 0)
        if (
            CHUNK_MIN_PULLS <= P <= CHUNK_MAX_PULLS
            and block_s
            and supported_dims(S, d, hidden, ffn, block_s)
        ):
            return _lstm_stack_chunk_pallas(params, y, h, c, gate, block_s)
    if is_quantized(params):
        return _lstm_stack_chunk_q8(params, y, h, c, gate)

    def layer(x, scan_in):
        (w_ih_t, w_hh_t, bias, w_hr_t, ff1_t, ff1_b, ff2_t, ff2_b, eps, h_l, c_l) = scan_in
        # batched input-side gates for all P pulls (bias folded in here; the
        # recurrent term is added per step)
        gx = (
            _mm(x.reshape(P * S, d), w_ih_t) + bias.astype(jnp.float32)
        ).reshape(P, S, -1)

        def tstep(carry, xs):
            h_t, c_t = carry
            gx_t = xs[0]
            gates = gx_t + _mm(h_t, w_hh_t)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            # cell state stays f32 (streaming error must not compound)
            c_new = _sig(f) * c_t + _sig(i) * jnp.tanh(g)
            hc = _sig(o) * jnp.tanh(c_new)
            h_new = _mm(hc, w_hr_t)
            if gate is not None:
                m = xs[1][:, None]
                h_keep = jnp.where(m, h_new, h_t)
                c_keep = jnp.where(m, c_new, c_t)
            else:
                h_keep, c_keep = h_new, c_new
            return (h_keep, c_keep), h_new

        xs = (gx,) if gate is None else (gx, gate)
        (h_fin, c_fin), h_seq = jax.lax.scan(tstep, (h_l, c_l), xs)
        yr = x + h_seq  # residual LSTM, batched over P
        ff = _mm(_double_swish(_mm(yr, ff1_t) + ff1_b.astype(jnp.float32)), ff2_t) + ff2_b.astype(jnp.float32)
        yn = _basic_norm(yr + ff, eps.astype(jnp.float32))
        return yn, (h_fin, c_fin)

    scan_ins = (
        params["w_ih_t"],
        params["w_hh_t"],
        params["bias"],
        params["w_hr_t"],
        params["ff1_t"],
        params["ff1_b"],
        params["ff2_t"],
        params["ff2_b"],
        params["norm_eps"],
        h,
        c,
    )
    y, (h_new, c_new) = jax.lax.scan(layer, y, scan_ins)
    return y, h_new, c_new


def _lstm_stack_chunk_pallas(
    params: Params, y: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, gate, block_s: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Layers unrolled in Python (NOT lax.scan): scanning makes every layer's
    weights a dynamic-slice of the stacked [L, ...] arrays, and XLA fuses
    those slices into the pallas custom-call's operands on scoped VMEM —
    which OOMs its 16 MB stack at serving shapes. Static per-layer slices
    stay plain HBM tensors. 12 unrolled pallas calls also compile fine."""
    from ..ops.lstm_pallas import (
        ffn_norm_i8,
        lstm_layer_chunk_fused,
        lstm_layer_chunk_fused_i8,
        lstm_layer_chunk_rec_stream2_i8,
    )

    interpret = jax.default_backend() != "tpu"
    n_pulls = None if gate is None else jnp.sum(gate.astype(jnp.int32), axis=0)

    P, S, d = y.shape
    L = params["w_ih_t"].shape[0]
    q8 = is_quantized(params)
    # int8 split form: the serial recurrence streams one timestep per grid
    # step (x/hseq DMA'd per step instead of P-deep VMEM tiles), which
    # frees enough VMEM for 512-row session tiles; the non-recurrent
    # residual+FFN+norm half runs as a separate batched row-tile kernel at
    # full MXU efficiency. Bit-identical to the fused whole-layer kernel
    # (same per-row quant, same op order) and measured 41.3 -> 36.2 ms for
    # the 12-layer stack at S=2048, P=27 on v5e (tools/profile_chunk_split).
    rec_block = next((b for b in (512, 256, 128) if S % b == 0), 0)
    use_split = q8 and rec_block > 0
    hs, cs = [], []
    for l in range(L):
        if use_split:
            hseq, h_new, c_new = lstm_layer_chunk_rec_stream2_i8(
                y, h[l], c[l],
                params["w_ih_t_q8"][l], params["w_ih_t_q8s"][l],
                params["w_hh_t_q8"][l], params["w_hh_t_q8s"][l],
                params["bias"][l],
                params["w_hr_t_q8"][l], params["w_hr_t_q8s"][l],
                n_pulls,
                block_s=rec_block, interpret=interpret,
            )
            hseq, h_new, c_new = jax.lax.optimization_barrier(
                (hseq, h_new, c_new)
            )
            # 1024-row tiles measured fastest for the batched FFN (39.4 vs
            # 42.5 ms at 512 / 42.6 at 2048 for 12 layers, S=2048 P=27)
            ffn_block = next(
                (b for b in (1024, 512, 256, 128) if (P * S) % b == 0), rec_block
            )
            y = ffn_norm_i8(
                y.reshape(P * S, d), hseq.reshape(P * S, d),
                params["ff1_t_q8"][l], params["ff1_t_q8s"][l], params["ff1_b"][l],
                params["ff2_t_q8"][l], params["ff2_t_q8s"][l], params["ff2_b"][l],
                params["norm_eps"][l],
                block_r=ffn_block, interpret=interpret,
            ).reshape(P, S, d)
            y = jax.lax.optimization_barrier(y)
            hs.append(h_new)
            cs.append(c_new)
            continue
        if q8:
            y, h_new, c_new = lstm_layer_chunk_fused_i8(
                y, h[l], c[l],
                params["w_ih_t_q8"][l], params["w_ih_t_q8s"][l],
                params["w_hh_t_q8"][l], params["w_hh_t_q8s"][l],
                params["bias"][l],
                params["w_hr_t_q8"][l], params["w_hr_t_q8s"][l],
                params["ff1_t_q8"][l], params["ff1_t_q8s"][l], params["ff1_b"][l],
                params["ff2_t_q8"][l], params["ff2_t_q8s"][l], params["ff2_b"][l],
                params["norm_eps"][l],
                n_pulls,
                block_s=block_s, interpret=interpret,
            )
        else:
            y, h_new, c_new = lstm_layer_chunk_fused(
                y, h[l], c[l],
                params["w_ih_t"][l], params["w_hh_t"][l], params["bias"][l],
                params["w_hr_t"][l], params["ff1_t"][l], params["ff1_b"][l],
                params["ff2_t"][l], params["ff2_b"][l], params["norm_eps"][l],
                n_pulls,
                block_s=block_s, interpret=interpret,
            )
        # keep XLA from fusing the inter-layer stack/concat into the pallas
        # custom call — that fusion allocates the kernel outputs on the
        # 16 MB scoped-vmem stack and OOMs at serving shapes
        y, h_new, c_new = jax.lax.optimization_barrier((y, h_new, c_new))
        hs.append(h_new)
        cs.append(c_new)
    return y, jnp.stack(hs), jnp.stack(cs)


def _lstm_stack_chunk_q8(
    params: Params, y: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, gate=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """int8-quantized `_lstm_stack_chunk` (XLA path; small dims / non-TPU /
    TP fallback). Same structure: batched input-side gates + FFN, recurrent
    half inside the time scan — all matmuls int8 with exact int32
    accumulation (see quantize_weights)."""
    P, S, d = y.shape

    def layer(x, scan_in):
        (wihq, wihs, whhq, whhs, bias, whrq, whrs,
         ff1q, ff1s, ff1_b, ff2q, ff2s, ff2_b, eps, h_l, c_l) = scan_in
        # bias added inside the step (after both matmuls) so the f32 add
        # order matches `_lstm_stack_step_q8` / the Pallas i8 kernel exactly:
        # int32 accumulation is exact, so matching add order makes the three
        # int8 implementations agree to the last f32 ulp
        gx = _q8_mm(x.reshape(P * S, d), wihq, wihs).reshape(P, S, -1)

        def tstep(carry, xs):
            h_t, c_t = carry
            gx_t = xs[0]
            gates = gx_t + _q8_mm(h_t, whhq, whhs) + bias.astype(jnp.float32)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            # cell state stays f32 (streaming error must not compound)
            c_new = _sig(f) * c_t + _sig(i) * jnp.tanh(g)
            hc = _sig(o) * jnp.tanh(c_new)
            h_new = _q8_mm(hc, whrq, whrs)
            if gate is not None:
                m = xs[1][:, None]
                h_keep = jnp.where(m, h_new, h_t)
                c_keep = jnp.where(m, c_new, c_t)
            else:
                h_keep, c_keep = h_new, c_new
            return (h_keep, c_keep), h_new

        xs = (gx,) if gate is None else (gx, gate)
        (h_fin, c_fin), h_seq = jax.lax.scan(tstep, (h_l, c_l), xs)
        yr = x + h_seq  # residual LSTM, batched over P
        mid = _double_swish(
            _q8_mm(yr.reshape(P * S, d), ff1q, ff1s).reshape(P, S, -1)
            + ff1_b.astype(jnp.float32)
        )
        ff = _q8_mm(mid.reshape(P * S, -1), ff2q, ff2s).reshape(
            P, S, d
        ) + ff2_b.astype(jnp.float32)
        yn = _basic_norm(yr + ff, eps.astype(jnp.float32))
        return yn, (h_fin, c_fin)

    scan_ins = (
        params["w_ih_t_q8"], params["w_ih_t_q8s"],
        params["w_hh_t_q8"], params["w_hh_t_q8s"],
        params["bias"],
        params["w_hr_t_q8"], params["w_hr_t_q8s"],
        params["ff1_t_q8"], params["ff1_t_q8s"], params["ff1_b"],
        params["ff2_t_q8"], params["ff2_t_q8s"], params["ff2_b"],
        params["norm_eps"],
        h, c,
    )
    y, (h_new, c_new) = jax.lax.scan(layer, y, scan_ins)
    return y, h_new, c_new


def encoder_chunk(
    params: Params, y: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, can=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Whole-chunk streaming encoder (engine fast path, layer-major).

    y: [P, S, d] embedded pulls; can: optional [P, S] per-session prefix
    participation mask. Returns (eout [P, S, J], h', c'); masked pulls
    produce garbage eout rows the decode step masks off. Batched equivalent
    of P consecutive reference encoder Runs (src/april_session.c:131-148)."""
    y, h_new, c_new = _lstm_stack_chunk(params, y, h, c, can)
    eout = _mm(y, params["enc_proj_t"]) + params["enc_proj_b"].astype(jnp.float32)
    return eout, h_new, c_new


def encoder_embed(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Stateless front half of the encoder: [N, segment, mel] -> [N, d_model].

    Split out so the engine can batch it over all of a step's windows in one
    conv launch (the recurrent half is the only sequentially-dependent part)."""
    return conv_subsample(params, x)[:, 0, :]


def encoder_embed_front(params: Params, front: jnp.ndarray, P: int, step: int):
    """Fused whole-front embed: [S, W, mel] -> [P, S, d_model] or None.

    One pallas_call embeds every pull window straight from the un-stacked
    front buffer (ops/conv_embed_pallas.py) — same per-window zero-pad
    semantics as `encoder_embed` over stacked windows, without materializing
    the window tensor or the XLA conv relayout copies. Returns None when the
    kernel is disabled or the geometry is unsupported; the engine then falls
    back to the stack+embed path."""
    import os

    from ..ops.conv_embed_pallas import conv_embed_windows, front_embed_supported

    # The conv-embed Pallas kernels hang the Mosaic compiler on real TPUs at
    # every geometry tried (S=128..4096, P=5..27; interpret mode and the
    # numerics are fine — the 4-D tiny-lane intermediates appear to be the
    # trigger). Until that is resolved they are opt-in; the engine's stacked
    # NHWC XLA embed path (conv_subsample_nhwc) is the shipped fast path.
    if os.environ.get("APRIL_CONV_EMBED_KERNEL", "0") != "1":
        return None

    S, W, mel = front.shape
    seg = W - (P - 1) * step
    block_s = next((b for b in (512, 256, 128, 8, 4, 2, 1) if S % b == 0), None)
    if (
        not _pallas_wanted()
        or block_s is None
        or not front_embed_supported(seg, mel, P, step, W, S, block_s)
    ):
        return None
    interpret = jax.default_backend() != "tpu"
    return conv_embed_windows(
        params, front, P=P, step=step, seg=seg, block_s=block_s, interpret=interpret
    )


def encoder_recurrent(
    params: Params, y: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, gate=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Recurrent back half: embedded [S, d] -> (eout [S, J], h', c').

    `gate` (optional [S] bool): masked sessions keep their carried h/c —
    the engine's per-pull participation mask (eout for those sessions is
    still produced; the decode step masks it)."""
    y, h_new, c_new = _lstm_stack_step(params, y, h, c, gate)
    eout = _mm(y, params["enc_proj_t"]) + params["enc_proj_b"].astype(jnp.float32)
    return eout, h_new, c_new


def encoder_step(
    params: Params, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One streaming encoder step: a [S, segment, mel] window -> [S, joiner_dim].

    Batched equivalent of the reference's encoder Run with state double-buffer
    (april_session.c:131-148); the 9-frame window subsamples to one timestep.
    """
    return encoder_recurrent(params, encoder_embed(params, x), h, c)


def _lstm_stack_step_tp(
    params: Params, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, axis,
    gate=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Tensor-parallel `_lstm_stack_step`: one timestep through all L layers
    on a LOCAL model shard inside a `shard_map` body.

    Layout (parallel/tp.py gate-shuffled sharding): x/h are replicated
    [S, d]; c is the local [L, S, H/m] hidden slice; w_ih_t/w_hh_t/bias are
    the local gate-shuffled [., d, 4*H/m] slices (a standard smaller LSTMP
    layer per shard); w_hr_t [., H/m, d] and ff1/ff2 carry the local
    hidden/ffn slices. Two psums per layer cross `axis` (the mesh model
    axis name(s)): the recurrent projection partial (needed before the
    residual + FFN) and the FFN partial (before the second bias and
    BasicNorm). The heavy local compute runs in the TP Pallas kernels
    (ops/lstm_tp_pallas.py) — including the int8 quantized serving path —
    with a plain-XLA fallback for unsupported tilings.

    TP has no reference analog (the reference is strictly single-threaded,
    SURVEY.md §2.4); numerics match the single-chip path up to f32
    reduction-order (+ int8 local-row scale granularity, see
    ops/lstm_tp_pallas.py docstring).
    """
    S, d = x.shape
    Hs = c.shape[2]
    Fs = params["ff1_t"].shape[2]
    q = is_quantized(params)
    block_s = _pick_block_s(S)
    use_kern = False
    if _pallas_wanted() and block_s:
        from ..ops.lstm_pallas import supported_dims

        use_kern = supported_dims(S, d, Hs, Fs, block_s)
    interpret = jax.default_backend() != "tpu"

    def tp_q8_contract(v, wq8, ws, axis):
        """int8 contraction over a LOCAL (model-sharded) activation axis,
        BIT-EXACT vs the single-chip path: quantize v with the pmax-GLOBAL
        row scale (same int8 values as the full-row quantization), exact
        int32 dot per shard (XLA lowers int8xint8->int32 onto the MXU),
        then psum the INT32 partials — integer addition is associative, so
        the summed accumulator equals the single-chip int32 accumulation
        exactly and the single f32 dequantization matches bit-for-bit.
        (Dequantizing before the psum loses that: the f32 partial sums
        differ from single-chip by ulps, and the next timestep's dynamic
        re-quantization amplifies any ulp at a rounding boundary into a
        full int8 step — measured as ~1e-3 logit divergence.)"""
        from ..ops.lstm_tp_pallas import rowq8_global

        vq, s = rowq8_global(v, axis)
        acc = jnp.dot(vq, wq8, preferred_element_type=jnp.int32)
        acc = jax.lax.psum(acc, axis)
        return acc.astype(jnp.float32) * (s * ws)

    def layer(x, scan_in):
        (w_ih, w_hh, bias, w_hr, ff1, ff1_b, ff2, ff2_b, eps,
         wq, h_l, c_l) = scan_in
        if q:
            # int8: gates+cell in the kernel (x/h row quants are exact —
            # replicated rows), then the model-sharded contractions (w_hr,
            # ff2) as XLA int8 dots with pmax-global scales outside the
            # kernel (a collective cannot run inside a pallas_call)
            if use_kern:
                from ..ops.lstm_tp_pallas import ffn_mid_i8, lstm_gates_cell_i8

                hc, c_new = lstm_gates_cell_i8(
                    x, h_l, c_l,
                    wq["w_ih_t_q8"], wq["w_ih_t_q8s"],
                    wq["w_hh_t_q8"], wq["w_hh_t_q8s"], bias,
                    gate, block_s=block_s, interpret=interpret,
                )
            else:
                gates = (
                    _q8_mm(x, wq["w_ih_t_q8"], wq["w_ih_t_q8s"])
                    + _q8_mm(h_l, wq["w_hh_t_q8"], wq["w_hh_t_q8s"])
                    + bias.astype(jnp.float32)
                )
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c_new = _sig(f) * c_l + _sig(i) * jnp.tanh(g)
                hc = _sig(o) * jnp.tanh(c_new)
                if gate is not None:
                    c_new = jnp.where(gate[:, None], c_new, c_l)
            h_new = tp_q8_contract(hc, wq["w_hr_t_q8"], wq["w_hr_t_q8s"], axis)
            y = x + h_new
            if use_kern:
                mid = ffn_mid_i8(
                    y, wq["ff1_t_q8"], wq["ff1_t_q8s"], ff1_b,
                    block_s=block_s, interpret=interpret,
                )
            else:
                mid = _double_swish(
                    _q8_mm(y, wq["ff1_t_q8"], wq["ff1_t_q8s"])
                    + ff1_b.astype(jnp.float32)
                )
            ff_sum = tp_q8_contract(mid, wq["ff2_t_q8"], wq["ff2_t_q8s"], axis)
        elif use_kern:
            from ..ops.lstm_tp_pallas import ffn_partial, lstm_gate_cell_proj

            hp, c_new = lstm_gate_cell_proj(
                x, h_l, c_l, w_ih, w_hh, bias, w_hr,
                gate, block_s=block_s, interpret=interpret,
            )
            h_new = jax.lax.psum(hp, axis)
            y = x + h_new
            ff_sum = jax.lax.psum(
                ffn_partial(
                    y, ff1, ff1_b, ff2, block_s=block_s, interpret=interpret
                ),
                axis,
            )
        else:
            gates = _mm(x, w_ih) + _mm(h_l, w_hh) + bias.astype(jnp.float32)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = _sig(f) * c_l + _sig(i) * jnp.tanh(g)
            hc = _sig(o) * jnp.tanh(c_new)
            hp = _mm(hc, w_hr)
            if gate is not None:
                c_new = jnp.where(gate[:, None], c_new, c_l)
            h_new = jax.lax.psum(hp, axis)
            y = x + h_new
            mid = _double_swish(_mm(y, ff1) + ff1_b.astype(jnp.float32))
            ff_sum = jax.lax.psum(_mm(mid, ff2), axis)
        ff = ff_sum + ff2_b.astype(jnp.float32)
        y_out = _basic_norm(y + ff, eps.astype(jnp.float32))
        if gate is not None:
            h_new = jnp.where(gate[:, None], h_new, h_l)
        return y_out, (h_new, c_new)

    wq_tree = (
        {
            k: params[k]
            for k in (
                "w_ih_t_q8", "w_ih_t_q8s", "w_hh_t_q8", "w_hh_t_q8s",
                "w_hr_t_q8", "w_hr_t_q8s", "ff1_t_q8", "ff1_t_q8s",
                "ff2_t_q8", "ff2_t_q8s",
            )
        }
        if q
        else {"_": params["norm_eps"]}  # placeholder leaf so the scan tree is static
    )
    scan_ins = (
        params["w_ih_t"], params["w_hh_t"], params["bias"], params["w_hr_t"],
        params["ff1_t"], params["ff1_b"], params["ff2_t"], params["ff2_b"],
        params["norm_eps"], wq_tree, h, c,
    )
    y, (h_new, c_new) = jax.lax.scan(layer, x, scan_ins)
    return y, h_new, c_new


def encoder_recurrent_tp(
    params: Params, y: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, axis,
    gate=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Tensor-parallel `encoder_recurrent` for shard_map bodies: the LSTM
    stack runs on local shards with manual psums; the small enc->joiner
    projection is replicated."""
    y, h_new, c_new = _lstm_stack_step_tp(params, y, h, c, axis, gate)
    eout = _mm(y, params["enc_proj_t"]) + params["enc_proj_b"].astype(jnp.float32)
    return eout, h_new, c_new


def encoder_step_tp(
    params: Params, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, axis
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Tensor-parallel `encoder_step` (flush path's whole-window form)."""
    return encoder_recurrent_tp(params, encoder_embed(params, x), h, c, axis)


def encoder_seq(
    params: Params, mel: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, dims: TransducerDims
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Offline/full-utterance encoder: [S, T, mel] -> [S, W, joiner_dim] where
    W = (T - segment)//step + 1 overlapping windows, replicating the streaming
    windowing exactly (fbank FIFO pull semantics, fbank.c:327-349)."""
    seg, step = dims.segment_size, dims.segment_step
    T = mel.shape[1]
    W = (T - seg) // step + 1
    starts = jnp.arange(W) * step
    # [S, W, seg, mel]
    windows = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(mel, s, seg, axis=1), out_axes=1
    )(starts)
    S = mel.shape[0]
    flat = windows.reshape(S * W, seg, mel.shape[-1])
    sub = conv_subsample(params, flat)[:, 0, :].reshape(S, W, -1)  # [S, W, d]

    # layer-major: input matmuls + FFN batch over all W timesteps
    ys, h_new, c_new = _lstm_stack_chunk(params, jnp.swapaxes(sub, 0, 1), h, c)
    ys = jnp.swapaxes(ys, 0, 1)  # [S, W, d]
    eout = _mm(ys, params["enc_proj_t"]) + params["enc_proj_b"].astype(jnp.float32)
    return eout, h_new, c_new


def precompute_decoder_tables(params: Params, dims: TransducerDims) -> Params:
    """Add the derived `dec_table` [ctx, V, d] to the params pytree.

    The grouped context conv is linear in each position's embedding, so its
    pre-ReLU output decomposes exactly into per-position token tables:
    pre[s] = sum_k table[k, context[s, k]]. This turns the decoder step —
    which runs up to 3x per 40 ms frame for every session — from
    embedding-gather + grouped-conv (tiny 4x4 matmuls, terrible MXU
    utilization) into `ctx` row gathers + one dense [S,d]x[d,J] matmul.
    """
    if "dec_table" in params:
        return params
    V, d = params["dec_embed"].shape
    groups = dims.decoder_groups
    gin = d // groups
    gout = d // groups
    emb = params["dec_embed"].reshape(V, groups, gin)
    # w: [d, gin, ctx] -> [groups, gout, gin, ctx]
    w = params["dec_conv_w"].reshape(groups, gout, gin, dims.context)
    # table[k, v, (g,o)] = sum_i emb[v, g, i] * w[g, o, i, k]
    table = jnp.einsum(
        "vgi,goik->kvgo", emb, w, preferred_element_type=jnp.float32
    ).reshape(dims.context, V, d)
    out = dict(params)
    out["dec_table"] = table
    return out


def decoder_step(params: Params, context: jnp.ndarray, dims: TransducerDims) -> jnp.ndarray:
    """Stateless decoder: [S, context] int tokens -> [S, joiner_dim].

    Embedding lookup + grouped conv over the context window + relu + proj
    (the reference runs this graph on every emission, april_session.c:181-196).
    With precomputed `dec_table` (precompute_decoder_tables) the conv is two
    table rows summed — exact, not an approximation.
    """
    ctx_i = context.astype(jnp.int32)
    if "dec_table" in params:
        pre = params["dec_table"][0][ctx_i[:, 0]]
        for k in range(1, dims.context):
            pre = pre + params["dec_table"][k][ctx_i[:, k]]
        y = jax.nn.relu(pre)
        return _mm(y, params["dec_proj_t"]) + params["dec_proj_b"].astype(jnp.float32)
    emb = jnp.take(params["dec_embed"], context.astype(jnp.int32), axis=0)  # [S, ctx, d]
    # Grouped 1-D conv with kernel size == context collapses to a single
    # position: output[o] = sum_{g-slice, k} emb[k, i] * w[o, i, k].
    w = params["dec_conv_w"]  # [d, d/groups, ctx]
    d = w.shape[0]
    groups = dims.decoder_groups
    gin = d // groups
    S = emb.shape[0]
    # [S, ctx, groups, gin] -> [S, groups, gin*ctx]
    emb_g = emb.reshape(S, dims.context, groups, gin).transpose(0, 2, 3, 1)
    emb_g = emb_g.reshape(S, groups, gin * dims.context)
    # w: [groups, gout, gin, ctx] -> [groups, gin*ctx, gout]
    gout = d // groups
    w_g = w.reshape(groups, gout, gin, dims.context).transpose(0, 2, 3, 1)
    w_g = w_g.reshape(groups, gin * dims.context, gout)
    y = jnp.einsum(
        "sgi,gio->sgo",
        emb_g.astype(w_g.dtype),
        w_g,
        preferred_element_type=jnp.float32,
    )
    y = y.reshape(S, d)
    y = jax.nn.relu(y)
    return _mm(y, params["dec_proj_t"]) + params["dec_proj_b"].astype(jnp.float32)


def joiner_logits(params: Params, eout: jnp.ndarray, dout: jnp.ndarray) -> jnp.ndarray:
    """[S, J] + [S, J] -> [S, vocab] logits (tanh joiner, export-april.py:317-331)."""
    return _mm(jnp.tanh(eout + dout), params["join_t"]) + params["join_b"].astype(
        jnp.float32
    )


def joiner_argmax(
    params: Params, eout: jnp.ndarray, dout: jnp.ndarray, blank_id: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy-decode prologue: (max_idx, max_val, blank_val) without ever
    materializing the [S, vocab] logits in HBM. The greedy inner loop runs
    this up to 3x per 40 ms frame per session (src/april_session.c:166-179,
    :311-320); on TPU it fuses joiner matmul + blank-excluded argmax in one
    Pallas kernel, elsewhere it falls back to joiner_logits + the XLA
    prologue (identical results)."""
    if _pallas_wanted():
        from ..ops.joiner_pallas import joiner_argmax_fused, supported

        S, J = eout.shape
        block_s = _pick_block_s(S)
        if block_s and supported(S, J, block_s):
            return joiner_argmax_fused(
                eout, dout, params["join_t"], params["join_b"],
                blank_id=blank_id, block_s=block_s,
                interpret=jax.default_backend() != "tpu",
            )
    from ..decode.greedy import greedy_prologue

    return greedy_prologue(joiner_logits(params, eout, dout), blank_id)


def decoder_joiner_argmax(
    params: Params,
    ctx: jnp.ndarray,
    need_dec: jnp.ndarray,
    dout: jnp.ndarray,
    eout: jnp.ndarray,
    blank_id: int,
    dims: TransducerDims,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Lazy-dout fused inner-decode iteration: refresh dout for sessions
    whose PREVIOUS iteration changed the context (`need_dec`), then run the
    joiner + greedy argmax — one Pallas kernel on TPU (dec_table gathers as
    one-hot MXU contractions), an equivalent XLA fallback elsewhere.

    Equivalent to the reference's eager order (aas_update_context runs the
    decoder immediately on emission, src/april_session.c:181-196, then the
    next joiner uses it, :166-179): the refresh sees the same context
    either way; deferring it to the consuming iteration just lets the two
    matmuls fuse. Returns (max_idx, max_val, blank_val, dout')."""
    if _pallas_wanted() and "dec_table" in params and dims.context == 2:
        from ..ops.joiner_pallas import decoder_joiner_argmax_fused, dj_supported

        S, J = eout.shape
        d = params["dec_table"].shape[2]
        block_s = _pick_block_s(S)
        if block_s and dj_supported(
            S, J, d, dims.context, block_s,
            vocab=params["join_t"].shape[1],
            w_itemsize=params["join_t"].dtype.itemsize,
        ):
            return decoder_joiner_argmax_fused(
                ctx, need_dec, dout, eout, params["dec_table"],
                params["dec_proj_t"], params["dec_proj_b"],
                params["join_t"], params["join_b"],
                blank_id=blank_id, block_s=block_s,
                interpret=jax.default_backend() != "tpu",
            )
    new_dout = decoder_step(params, ctx, dims)
    dout = jnp.where(need_dec[:, None], new_dout, dout)
    mi, mv, bv = joiner_argmax(params, eout, dout, blank_id)
    return mi, mv, bv, dout


def init_streaming_state(
    dims: TransducerDims, batch: int, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zero LSTM carry (h, c) for `batch` sessions: [L, S, d], [L, S, hidden]."""
    return (
        jnp.zeros((dims.layers, batch, dims.d_model), dtype),
        jnp.zeros((dims.layers, batch, dims.hidden), dtype),
    )
