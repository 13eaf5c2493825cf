"""Streaming Conformer-transducer encoder (TPU-native model family).

The reference supports exactly one architecture — the 3-ONNX-graph LSTM
transducer (src/april_model.c:36 rejects everything else). This module adds
the attention-based streaming family BASELINE.json config 5 calls for
("Zipformer/Conformer-transducer streaming model sharded across chips"),
designed for the same batched engine contract as the LSTM path
(models/loader.py ModelRuntime): per-pull step functions over `[S, ...]`
state arrays resident in HBM.

Streaming design: each fbank pull embeds its 9-frame window to one d_model
frame (the same conv subsampling as the LSTM path), and every Conformer
block attends causally over a ring KV-cache of the last `att_context`
frames — O(1) state per session, the attention-model analog of the carried
LSTM (h, c) (SURVEY.md §5 "long-context": chunked causal attention with KV
cache). All per-layer state packs into the engine's two state arrays:

    h[L, S, 2*C*d]          k-cache ‖ v-cache (ring, slot = pos mod C)
    c[L, S, (k-1)*d + 1]    causal-conv left context ‖ position counter

so the whole serving stack — fused engine step, masked pulls, flush, slot
reset, speaker snapshots, mesh sharding — works unchanged.

Block structure (macaron Conformer): x += ½FF1(LN x); x += MHSA(LN x) with
per-distance relative bias; x += CausalConv(LN x) (pointwise-GLU →
depthwise k → swish → pointwise); x += ½FF2(LN x); x = LN_out(x).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.activations import sigmoid as _sig
import numpy as np

from .lstm_transducer import (
    Params,
    _double_swish,
    _mm,
    _q8_mm,
    conv_subsample,
)


@dataclasses.dataclass(frozen=True)
class ConformerDims:
    mel: int = 80
    segment_size: int = 9
    segment_step: int = 4
    d_model: int = 256
    heads: int = 4
    ffn: int = 1024
    conv_kernel: int = 8  # causal depthwise width (current + k-1 past frames)
    att_context: int = 64  # C: attended history length incl. current frame
    joiner_dim: int = 256
    vocab: int = 500
    layers: int = 12
    context: int = 2
    decoder_groups: int = 64
    conv_channels: Tuple[int, int, int] = (8, 32, 32)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.heads

    @property
    def conv_freq_out(self) -> int:
        return ((self.mel - 1) // 2 - 1) // 2

    @property
    def state_shapes(self):
        """Engine h/c per-layer row widths (see module docstring)."""
        d, C, k = self.d_model, self.att_context, self.conv_kernel
        return (
            (self.layers, 2 * C * d),
            (self.layers, (k - 1) * d + 1),
        )


def init_conformer_params(key, dims: ConformerDims, dtype=jnp.float32) -> Params:
    L, d, F = dims.layers, dims.d_model, dims.ffn
    H, C, k = dims.heads, dims.att_context, dims.conv_kernel
    J, V = dims.joiner_dim, dims.vocab
    c1, c2, c3 = dims.conv_channels
    ks = iter(jax.random.split(key, 32))

    def w(kk, shape, scale=None):
        fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
        s = scale if scale is not None else fan_in ** -0.5
        return (jax.random.normal(next(ks), shape) * s).astype(dtype)

    def ln(suffix):
        return {
            f"ln{suffix}_s": jnp.ones((L, d), dtype),
            f"ln{suffix}_b": jnp.zeros((L, d), dtype),
        }

    params: Params = {
        # shared conv-subsampling embed (identical keys to the LSTM path so
        # conv_subsample and the engine's batched-embed fast path reuse)
        "conv1_w": w(None, (c1, 1, 3, 3), 0.3),
        "conv1_b": jnp.zeros(c1, dtype),
        "conv2_w": w(None, (c2, c1, 3, 3), 0.1),
        "conv2_b": jnp.zeros(c2, dtype),
        "conv3_w": w(None, (c3, c2, 3, 3), 0.1),
        "conv3_b": jnp.zeros(c3, dtype),
        "embed_out_w": w(None, (c3 * dims.conv_freq_out, d)),
        "embed_out_b": jnp.zeros(d, dtype),
        # stacked Conformer blocks
        "ff1_a": w(None, (L, d, F)),
        "ff1_ab": jnp.zeros((L, F), dtype),
        "ff1_o": w(None, (L, F, d)),
        "ff1_ob": jnp.zeros((L, d), dtype),
        "att_q": w(None, (L, d, d)),
        "att_k": w(None, (L, d, d)),
        "att_v": w(None, (L, d, d)),
        "att_o": w(None, (L, d, d)),
        "att_qb": jnp.zeros((L, d), dtype),
        "att_kb": jnp.zeros((L, d), dtype),
        "att_vb": jnp.zeros((L, d), dtype),
        "att_ob": jnp.zeros((L, d), dtype),
        "rel_bias": jnp.zeros((L, H, C), dtype),
        "cv_pw1": w(None, (L, d, 2 * d)),
        "cv_pw1b": jnp.zeros((L, 2 * d), dtype),
        "cv_dw": w(None, (L, k, d), 0.3),
        "cv_dwb": jnp.zeros((L, d), dtype),
        "cv_pw2": w(None, (L, d, d)),
        "cv_pw2b": jnp.zeros((L, d), dtype),
        "ff2_a": w(None, (L, d, F)),
        "ff2_ab": jnp.zeros((L, F), dtype),
        "ff2_o": w(None, (L, F, d)),
        "ff2_ob": jnp.zeros((L, d), dtype),
        **ln(1), **ln(2), **ln(3), **ln(4), **ln("o"),
        # encoder -> joiner projection + stateless decoder + joiner: the
        # exact key set of the LSTM path so decoder_step / joiner_logits /
        # precompute_decoder_tables are shared
        "enc_proj_t": w(None, (d, J)),
        "enc_proj_b": jnp.zeros(J, dtype),
        "dec_embed": w(None, (V, d), 0.5),
        "dec_conv_w": w(None, (d, d // dims.decoder_groups, dims.context), 0.3),
        "dec_proj_t": w(None, (d, J)),
        "dec_proj_b": jnp.zeros(J, dtype),
        "join_t": w(None, (J, V)),
        "join_b": jnp.zeros(V, dtype),
    }
    return params


def _layer_norm(x, s, b, eps=1e-5):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * s.astype(jnp.float32) + b.astype(
        jnp.float32
    )


def _ff(x, a, ab, o, ob):
    mid = _double_swish(_mm(x, a) + ab.astype(jnp.float32))
    return _mm(mid, o) + ob.astype(jnp.float32)


def _mmq(p_l, name, x):
    """Projection matmul that transparently uses the int8 quantized copy
    (`<name>_q8` + per-column scales) when present — the Conformer side of
    the quantized serving path (lstm_transducer.quantize_weights). The
    attention/conv einsums stay f32: they are a small FLOPs fraction and
    softmax/GLU inputs are precision-sensitive."""
    q = p_l.get(name + "_q8")
    if q is None:
        return _mm(x, p_l[name])
    return _q8_mm(x, q, p_l[name + "_q8s"])


def _mmq_psum(p_l, name, x, axis):
    """Row-sharded projection under TP: partial output summed over the
    model axis. The int8 path is TP-exact vs single-chip int8 (the LSTM TP
    recipe, ops/lstm_tp_pallas.py): the dynamic activation scale is
    pmax-GLOBAL over the model axis — every shard quantizes its input slice
    to the identical int8 values a single chip would — and the INT32
    accumulators are psummed BEFORE the single dequantization, so the only
    residue is f32 multiply ordering."""
    q = p_l.get(name + "_q8")
    if axis is None:
        return _mmq(p_l, name, x)
    if q is None:
        return jax.lax.psum(_mm(x, p_l[name]), axis)
    xf = x.astype(jnp.float32)
    amax = jax.lax.pmax(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), axis)
    s = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
    qx = jnp.round(xf * (1.0 / s)).astype(jnp.int8)
    acc = jax.lax.psum(
        jnp.dot(qx, q, preferred_element_type=jnp.int32), axis
    )
    return acc.astype(jnp.float32) * (s * p_l[name + "_q8s"])


def _ffq(p_l, pre, x, axis=None):
    """Macaron FF half. Under TP (`axis` set) the `_a` matrix is
    column-sharded (local mid = F/m lanes) and `_o` row-sharded via
    _mmq_psum; the output bias is replicated and added once, after the
    psum."""
    mid = _double_swish(
        _mmq(p_l, pre + "_a", x) + p_l[pre + "_ab"].astype(jnp.float32)
    )
    return _mmq_psum(p_l, pre + "_o", mid, axis) + p_l[pre + "_ob"].astype(
        jnp.float32
    )


# Quantizable projection bases within _STACKED (see
# lstm_transducer.QUANT_TARGETS; quantize_weights adds the _q8/_q8s keys)
_Q8_BASES = (
    "ff1_a", "ff1_o", "att_q", "att_k", "att_v", "att_o",
    "cv_pw1", "cv_pw2", "ff2_a", "ff2_o",
)


def _stacked_params(params):
    keys = list(_STACKED)
    for base in _Q8_BASES:
        if base + "_q8" in params:
            keys += [base + "_q8", base + "_q8s"]
    return {k: params[k] for k in keys}


def _swish(x):
    return x * _sig(x)


# ---------------------------------------------------------------------------
# streaming step (one pull)
# ---------------------------------------------------------------------------


def _unpack(h_l, c_l, dims: ConformerDims):
    """Ring/conv state unpack. The feature width is derived from the state
    row itself, NOT dims.d_model: under shard_map TP each device's h_l/c_l
    row is its own heads' ring + conv slice (d_local = d/m), and the same
    code serves both."""
    S = h_l.shape[0]
    C, k = dims.att_context, dims.conv_kernel
    d = h_l.shape[1] // (2 * C)
    kc = h_l[:, : C * d].reshape(S, C, d)
    vc = h_l[:, C * d :].reshape(S, C, d)
    conv = c_l[:, : (k - 1) * d].reshape(S, k - 1, d)
    pos = c_l[:, -1]
    return kc, vc, conv, pos


def _pack(kc, vc, conv, pos):
    S = kc.shape[0]
    return (
        jnp.concatenate([kc.reshape(S, -1), vc.reshape(S, -1)], axis=1),
        jnp.concatenate([conv.reshape(S, -1), pos[:, None]], axis=1),
    )


def _block_step(p_l, x, h_l, c_l, dims: ConformerDims, gate=None, axis=None):
    """One Conformer block on one frame x [S, d]; returns (y, h_l', c_l').

    `gate` (optional [S] bool) keeps the carried KV-ring/conv/position state
    for masked sessions — the engine's per-pull participation mask, folded
    into the block body (same contract as the LSTM layer gate,
    lstm_transducer._lstm_stack_step).

    `axis` (optional mesh axis name(s)) runs the block tensor-parallel under
    shard_map: q/k/v and the FF/conv input matrices are column-sharded (the
    local shard computes its own heads / FF lanes / conv channels — the
    per-head softmax needs no cross-shard reduction), the output matrices
    are row-sharded, and each module's partial output crosses the model
    axis as ONE psum (4 per block). x and the layer norms are replicated.
    Local sizes are derived from the (sharded) weight shapes, so the same
    body serves single-chip and TP."""
    S, d = x.shape
    dk, C, k = dims.head_dim, dims.att_context, dims.conv_kernel
    Hl = p_l["rel_bias"].shape[0]  # local heads (H/m under TP)
    dl = Hl * dk  # local attention width
    dc = p_l["cv_dw"].shape[1]  # local conv channels (d/m under TP)
    kc, vc, conv_st, pos = _unpack(h_l, c_l, dims)
    ipos = pos.astype(jnp.int32)  # frame index of THIS pull (0-based)

    x = x + 0.5 * _ffq(p_l, "ff1", _layer_norm(x, p_l["ln1_s"], p_l["ln1_b"]), axis)

    # -- causal MHSA over the ring cache ----------------------------------
    u = _layer_norm(x, p_l["ln2_s"], p_l["ln2_b"])
    q = (_mmq(p_l, "att_q", u) + p_l["att_qb"].astype(jnp.float32)).reshape(S, Hl, dk)
    kn = (_mmq(p_l, "att_k", u) + p_l["att_kb"].astype(jnp.float32))
    vn = (_mmq(p_l, "att_v", u) + p_l["att_vb"].astype(jnp.float32))
    # write current frame into ring slot pos % C (one-hot select: no scatter)
    slot = ipos % C
    onehot = (jnp.arange(C)[None, :] == slot[:, None])[..., None]  # [S, C, 1]
    if gate is not None:
        onehot = onehot & gate[:, None, None]
    kc = jnp.where(onehot, kn[:, None, :], kc)
    vc = jnp.where(onehot, vn[:, None, :], vc)
    # slot j holds the latest frame ≡ j (mod C): distance = (slot - j) mod C
    dist = (slot[:, None] - jnp.arange(C)[None, :]) % C  # [S, C]
    valid = dist <= jnp.minimum(ipos, C - 1)[:, None]
    scores = jnp.einsum(
        "shd,schd->shc", q, kc.reshape(S, C, Hl, dk), preferred_element_type=jnp.float32
    )
    scores = scores * (dk ** -0.5)
    bias = p_l["rel_bias"].astype(jnp.float32)[:, dist]  # [Hl, S, C]
    scores = scores + jnp.transpose(bias, (1, 0, 2))
    scores = jnp.where(valid[:, None, :], scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    att = jnp.einsum(
        "shc,schd->shd", w, vc.reshape(S, C, Hl, dk), preferred_element_type=jnp.float32
    ).reshape(S, dl)
    x = x + _mmq_psum(p_l, "att_o", att, axis) + p_l["att_ob"].astype(
        jnp.float32
    )

    # -- causal conv module ------------------------------------------------
    u = _layer_norm(x, p_l["ln3_s"], p_l["ln3_b"])
    g = _mmq(p_l, "cv_pw1", u) + p_l["cv_pw1b"].astype(jnp.float32)  # [S, 2*dc]
    g = g[:, :dc] * _sig(g[:, dc:])  # GLU (TP: glu-shuffled halves)
    window = jnp.concatenate([conv_st, g[:, None, :]], axis=1)  # [S, k, dc]
    dw = jnp.einsum(
        "skd,kd->sd", window, p_l["cv_dw"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) + p_l["cv_dwb"].astype(jnp.float32)
    x = x + _mmq_psum(p_l, "cv_pw2", _swish(dw), axis) + p_l[
        "cv_pw2b"
    ].astype(jnp.float32)
    if gate is None:
        conv_st = window[:, 1:, :]
        pos = pos + 1.0
    else:
        conv_st = jnp.where(gate[:, None, None], window[:, 1:, :], conv_st)
        pos = pos + gate.astype(pos.dtype)

    x = x + 0.5 * _ffq(p_l, "ff2", _layer_norm(x, p_l["ln4_s"], p_l["ln4_b"]), axis)
    y = _layer_norm(x, p_l["lno_s"], p_l["lno_b"])

    h_l, c_l = _pack(kc, vc, conv_st, pos)
    return y, h_l, c_l


_STACKED = (
    "ff1_a", "ff1_ab", "ff1_o", "ff1_ob",
    "att_q", "att_k", "att_v", "att_o",
    "att_qb", "att_kb", "att_vb", "att_ob", "rel_bias",
    "cv_pw1", "cv_pw1b", "cv_dw", "cv_dwb", "cv_pw2", "cv_pw2b",
    "ff2_a", "ff2_ab", "ff2_o", "ff2_ob",
    "ln1_s", "ln1_b", "ln2_s", "ln2_b", "ln3_s", "ln3_b",
    "ln4_s", "ln4_b", "lno_s", "lno_b",
)


def conformer_encoder_embed(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Stateless front half: [N, segment, mel] -> [N, d_model]. Same conv
    subsampling as the LSTM path; split out so the engine batches it over
    all of a step's windows in one conv launch."""
    return conv_subsample(params, x)[:, 0, :]


def conformer_encoder_recurrent(
    params: Params, y: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray,
    dims: ConformerDims, gate=None, axis=None,
):
    """Stateful back half: embedded [S, d] -> (eout [S, J], h', c').

    `gate` ([S] bool, optional): masked sessions keep their carried
    ring-cache / conv / position state (eout for those sessions is still
    produced; the decode step masks it).

    `axis` (optional): run the blocks tensor-parallel over the named
    shard_map model axis (see _block_step); h/c are the per-shard local
    rings, weights the per-shard slices (parallel/tp.py conformer specs)."""

    def layer(y, scan_in):
        p_l, h_l, c_l = scan_in
        y, h_l, c_l = _block_step(p_l, y, h_l, c_l, dims, gate, axis)
        return y, (h_l, c_l)

    stacked = _stacked_params(params)
    y, (h_new, c_new) = jax.lax.scan(layer, y, (stacked, h, c))
    eout = _mm(y, params["enc_proj_t"]) + params["enc_proj_b"].astype(jnp.float32)
    return eout, h_new, c_new


def conformer_encoder_step(
    params: Params, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray,
    dims: ConformerDims, axis=None,
):
    """Engine-contract step: x [S, seg, mel] window -> (eout [S, J], h', c')."""
    return conformer_encoder_recurrent(
        params, conformer_encoder_embed(params, x), h, c, dims, axis=axis
    )


def conformer_encoder_chunk(
    params: Params, y: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray,
    dims: ConformerDims, can: jnp.ndarray, axis=None,
):
    """Whole-chunk streaming form: advance ALL of a step's pulls through each
    layer in one pass. This is the TPU-native hot path for the Conformer
    family: unlike the LSTM, the block is not frame-recurrent — the only
    cross-frame coupling is the KV ring / conv left-context — so a chunk of P
    pulls needs ONE ring read+write per layer instead of P, cutting HBM state
    traffic P-fold, and every matmul runs at [S*P, d] MXU shapes instead of
    [S, d] (the per-frame path `conformer_encoder_recurrent` remains as the
    engine-contract fallback and parity oracle).

    y:   [P, S, d]  embedded pulls (conformer_encoder_embed output)
    can: [P, S]     pull participation mask; MUST be a per-session prefix
                    (can[j] implies can[j'] for j' < j), which the engine's
                    fifo_len >= seg + j*step construction guarantees.
    Requires P <= dims.att_context (each ring slot written at most once).
    Returns (eout [P, S, J], h', c'); masked pulls produce garbage eout rows
    (the decode step masks them) and leave carried state untouched.
    """
    P, S, d = y.shape
    dk, C, k = dims.head_dim, dims.att_context, dims.conv_kernel
    Hl = params["rel_bias"].shape[1]  # local heads (H/m under shard_map TP)
    dl = Hl * dk
    dc = params["cv_dw"].shape[2]  # local conv channels
    if P > C:
        raise ValueError(f"chunk pulls {P} > att_context {C}")
    x = jnp.transpose(y, (1, 0, 2))  # [S, P, d]
    canT = jnp.transpose(can, (1, 0))  # [S, P]
    n = jnp.sum(canT.astype(jnp.int32), axis=1)  # [S] valid-pull count
    j_idx = jnp.arange(P)
    s_idx = jnp.arange(C)

    # in-chunk causal geometry (shared by every session and layer)
    djj = j_idx[:, None] - j_idx[None, :]  # [P, P] query - key
    chunk_valid = (djj >= 0) & (djj < C)
    djj_c = jnp.clip(djj, 0, C - 1)

    def layer(x, scan_in):
        p_l, h_l, c_l = scan_in
        kc, vc, conv_st, pos = _unpack(h_l, c_l, dims)
        ipos = pos.astype(jnp.int32)  # frame index of the chunk's FIRST pull

        x = x + 0.5 * _ffq(
            p_l, "ff1", _layer_norm(x, p_l["ln1_s"], p_l["ln1_b"]), axis
        )

        # -- causal MHSA: ring keys + in-chunk keys ------------------------
        u = _layer_norm(x, p_l["ln2_s"], p_l["ln2_b"])
        q = (_mmq(p_l, "att_q", u) + p_l["att_qb"].astype(jnp.float32)).reshape(
            S, P, Hl, dk
        )
        kn = _mmq(p_l, "att_k", u) + p_l["att_kb"].astype(jnp.float32)  # [S, P, d]
        vn = _mmq(p_l, "att_v", u) + p_l["att_vb"].astype(jnp.float32)
        bias = p_l["rel_bias"].astype(jnp.float32)  # [H, C]

        # ring slot s holds the latest pre-chunk frame ≡ s (mod C), i.e. age
        # r_s = (pos-1-s) mod C behind frame pos-1; distance to query j is
        # j+1+r_s, valid iff that frame exists (r_s <= pos-1) and is in
        # context (distance <= C-1 ⇔ r_s <= C-2-j)
        r = (ipos[:, None] - 1 - s_idx[None, :]) % C  # [S, C]
        ring_valid = r[:, None, :] <= jnp.minimum(
            ipos[:, None, None] - 1, C - 2 - j_idx[None, :, None]
        )
        sc_ring = jnp.einsum(
            "sphd,schd->shpc", q, kc.reshape(S, C, Hl, dk),
            preferred_element_type=jnp.float32,
        ) * (dk ** -0.5)
        # Ring bias WITHOUT the [S, P, C]-indexed gather (bias[:, dist_ring]
        # lowered to a ~38 ms/layer serial gather at S=1024 — measured; it
        # was HALF the Conformer step). dist = j + 1 + r depends on the
        # session only through phase = (pos-1) mod C, so: (1) tiny static
        # gather BJ[h, j, rr] = bias[h, min(j+1+rr, C-1)]; (2) rearrange rr
        # -> ring slot per phase with a constant one-hot einsum; (3) select
        # each session's phase row by one-hot matmul. One-hot f32 matmuls
        # select rows exactly, so this is value-identical to the gather.
        phase = (ipos - 1) % C  # [S]
        jr = np.minimum(np.arange(P)[:, None] + 1 + np.arange(C)[None, :], C - 1)
        BJ = bias[:, jr]  # [H, P, C(rr)] — static [P, C] index gather
        oh_pcr = jnp.asarray(
            (np.arange(C)[:, None, None] - np.arange(C)[None, :, None]) % C
            == np.arange(C)[None, None, :],
            jnp.float32,
        )  # [C(phase), C(slot), C(rr)]
        BJ2 = jnp.einsum(
            "pcr,hjr->phjc", oh_pcr, BJ, preferred_element_type=jnp.float32
        )  # [C(phase), H, P, C(slot)]
        oh_s = (phase[:, None] == jnp.arange(C)[None, :]).astype(jnp.float32)
        sc_ring = sc_ring + jnp.dot(
            oh_s, BJ2.reshape(C, Hl * P * C), preferred_element_type=jnp.float32
        ).reshape(S, Hl, P, C)
        sc_ring = jnp.where(ring_valid[:, None], sc_ring, -jnp.inf)

        sc_chunk = jnp.einsum(
            "sphd,sthd->shpt", q, kn.reshape(S, P, Hl, dk),
            preferred_element_type=jnp.float32,
        ) * (dk ** -0.5)
        sc_chunk = sc_chunk + bias[:, djj_c][None]
        sc_chunk = jnp.where(chunk_valid[None, None], sc_chunk, -jnp.inf)

        w = jax.nn.softmax(jnp.concatenate([sc_ring, sc_chunk], axis=-1), axis=-1)
        att = (
            jnp.einsum(
                "shpc,schd->sphd", w[..., :C], vc.reshape(S, C, Hl, dk),
                preferred_element_type=jnp.float32,
            )
            + jnp.einsum(
                "shpt,sthd->sphd", w[..., C:], vn.reshape(S, P, Hl, dk),
                preferred_element_type=jnp.float32,
            )
        ).reshape(S, P, dl)
        x = x + _mmq_psum(p_l, "att_o", att, axis) + p_l["att_ob"].astype(
            jnp.float32
        )

        # -- causal conv over [conv_st ‖ chunk] ----------------------------
        u = _layer_norm(x, p_l["ln3_s"], p_l["ln3_b"])
        g = _mmq(p_l, "cv_pw1", u) + p_l["cv_pw1b"].astype(jnp.float32)
        g = g[:, :, :dc] * _sig(g[:, :, dc:])  # [S, P, dc]
        full = jnp.concatenate([conv_st, g], axis=1)  # [S, k-1+P, dc]
        dwk = p_l["cv_dw"].astype(jnp.float32)  # [k, dc]
        dw = sum(full[:, i : i + P] * dwk[i] for i in range(k)) + p_l[
            "cv_dwb"
        ].astype(jnp.float32)
        x = x + _mmq_psum(p_l, "cv_pw2", _swish(dw), axis) + p_l[
            "cv_pw2b"
        ].astype(jnp.float32)
        # new left context = last k-1 rows of the valid prefix (len k-1+n)
        idx = n[:, None] + jnp.arange(k - 1)[None, :]  # [S, k-1]
        conv_new = jnp.take_along_axis(full, idx[..., None], axis=1)

        x = x + 0.5 * _ffq(
            p_l, "ff2", _layer_norm(x, p_l["ln4_s"], p_l["ln4_b"]), axis
        )
        y_out = _layer_norm(x, p_l["lno_s"], p_l["lno_b"])

        # -- ring update: valid pull j writes slot (pos+j) mod C -----------
        wslot = (ipos[:, None] + j_idx[None, :]) % C  # [S, P]
        M = (wslot[:, None, :] == s_idx[None, :, None]) & canT[:, None, :]  # [S,C,P]
        Mf = M.astype(jnp.float32)
        kn_z = jnp.where(canT[..., None], kn, 0.0)
        vn_z = jnp.where(canT[..., None], vn, 0.0)
        written = jnp.any(M, axis=2, keepdims=True)  # [S, C, 1]
        kc = jnp.where(
            written,
            jnp.einsum("scp,spd->scd", Mf, kn_z, preferred_element_type=jnp.float32),
            kc,
        )
        vc = jnp.where(
            written,
            jnp.einsum("scp,spd->scd", Mf, vn_z, preferred_element_type=jnp.float32),
            vc,
        )
        h_l, c_l = _pack(kc, vc, conv_new, pos + n.astype(pos.dtype))
        return y_out, (h_l, c_l)

    stacked = _stacked_params(params)
    # Layers unrolled in Python (NOT lax.scan): scanning makes every layer's
    # 128 MB KV state a dynamic-slice of h[L, S, 2Cd] that XLA materializes
    # with a layout round-trip and writes back with dynamic-update-slice —
    # measured ~18 ms/step of pure state movement at S=1024. Static h[l]
    # slices read/write in place.
    hs, cs = [], []
    for l in range(dims.layers):
        p_l = {k: v[l] for k, v in stacked.items()}
        x, (h_l, c_l) = layer(x, (p_l, h[l], c[l]))
        hs.append(h_l)
        cs.append(c_l)
    h_new = jnp.stack(hs)
    c_new = jnp.stack(cs)
    eout = _mm(x, params["enc_proj_t"]) + params["enc_proj_b"].astype(jnp.float32)
    return jnp.transpose(eout, (1, 0, 2)), h_new, c_new


# ---------------------------------------------------------------------------
# full-sequence form (training / offline / parity oracle)
# ---------------------------------------------------------------------------


def conformer_encoder_seq(
    params: Params, mel: jnp.ndarray, dims: ConformerDims
) -> jnp.ndarray:
    """[S, T, mel] -> [S, W, joiner_dim]: the streaming semantics computed
    full-sequence — causal attention limited to the last `att_context`
    frames (incl. current), causal depthwise conv. Differentiable; used by
    the RNN-T training step and as the streaming-parity oracle."""
    seg, step = dims.segment_size, dims.segment_step
    S, T = mel.shape[0], mel.shape[1]
    W = (T - seg) // step + 1
    starts = jnp.arange(W) * step
    windows = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(mel, s, seg, axis=1), out_axes=1
    )(starts)  # [S, W, seg, mel]
    flat = windows.reshape(S * W, seg, dims.mel)
    y = conv_subsample(params, flat)[:, 0, :].reshape(S, W, dims.d_model)

    H, dk, C, k = dims.heads, dims.head_dim, dims.att_context, dims.conv_kernel
    d = dims.d_model
    t_i = jnp.arange(W)
    dist = t_i[:, None] - t_i[None, :]  # [W, W] (query - key)
    causal = (dist >= 0) & (dist < C)

    stacked = _stacked_params(params)

    def layer(y, p_l):
        x = y
        x = x + 0.5 * _ffq(
            p_l, "ff1", _layer_norm(x, p_l["ln1_s"], p_l["ln1_b"])
        )
        u = _layer_norm(x, p_l["ln2_s"], p_l["ln2_b"])
        q = (_mmq(p_l, "att_q", u) + p_l["att_qb"].astype(jnp.float32)).reshape(S, W, H, dk)
        kk = (_mmq(p_l, "att_k", u) + p_l["att_kb"].astype(jnp.float32)).reshape(S, W, H, dk)
        vv = (_mmq(p_l, "att_v", u) + p_l["att_vb"].astype(jnp.float32)).reshape(S, W, H, dk)
        scores = jnp.einsum(
            "sqhd,skhd->shqk", q, kk, preferred_element_type=jnp.float32
        ) * (dk ** -0.5)
        bias = p_l["rel_bias"].astype(jnp.float32)[:, jnp.clip(dist, 0, C - 1)]
        scores = scores + bias[None]
        scores = jnp.where(causal[None, None], scores, -jnp.inf)
        wgt = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum(
            "shqk,skhd->sqhd", wgt, vv, preferred_element_type=jnp.float32
        ).reshape(S, W, d)
        x = x + _mmq(p_l, "att_o", att) + p_l["att_ob"].astype(jnp.float32)

        u = _layer_norm(x, p_l["ln3_s"], p_l["ln3_b"])
        g = _mmq(p_l, "cv_pw1", u) + p_l["cv_pw1b"].astype(jnp.float32)
        g = g[:, :, :d] * _sig(g[:, :, d:])  # [S, W, d]
        padded = jnp.pad(g, ((0, 0), (k - 1, 0), (0, 0)))
        dw = sum(
            padded[:, i : i + W] * p_l["cv_dw"].astype(jnp.float32)[i]
            for i in range(k)
        ) + p_l["cv_dwb"].astype(jnp.float32)
        x = x + _mmq(p_l, "cv_pw2", _swish(dw)) + p_l["cv_pw2b"].astype(jnp.float32)

        x = x + 0.5 * _ffq(
            p_l, "ff2", _layer_norm(x, p_l["ln4_s"], p_l["ln4_b"])
        )
        return _layer_norm(x, p_l["lno_s"], p_l["lno_b"]), None

    # layers consume the previous layer's full sequence: a python loop over
    # per-layer slices (L is small and static)
    L = dims.layers
    for l in range(L):
        p_l = {kk: stacked[kk][l] for kk in stacked}
        y, _ = layer(y, p_l)
    return _mm(y, params["enc_proj_t"]) + params["enc_proj_b"].astype(jnp.float32)
