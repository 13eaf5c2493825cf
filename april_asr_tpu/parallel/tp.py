"""Tensor-parallel weight layout for the shard_map TP engine path.

The GSPMD TP path (mesh.py _PARAM_SPECS) lets XLA partition the original
weight layout; the shard_map TP path (engine/step.py model_size > 1 branch)
instead runs EXPLICIT per-device programs — the fused Pallas kernels stay
alive and the psums are placed by hand (ops/lstm_tp_pallas.py). That
requires each device's contiguous weight slice to be a self-contained
smaller LSTMP layer, which the stock [.., 4H] gate-concatenated layout does
not give (a contiguous 4H/m slice of [i|f|g|o] spans partial gates).

`shuffle_gate_columns` permutes the 4H gate axis into per-shard blocks —
shard k's contiguous slice holds [i_k | f_k | g_k | o_k] for its H/m hidden
units — so plain contiguous sharding (PartitionSpec over the last axis)
hands every device a standard smaller layer, and the cell state c shards as
a contiguous [.., k*H/m:(k+1)*H/m] slice with NO permutation (the shuffle
maps shard k exactly onto that hidden-unit range).

No reference analog: the reference is strictly single-threaded
(src/params.c:71 batch=1; SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import jax

# Weight keys carrying a gate-concatenated 4H last axis.
_GATE_KEYS = ("w_ih_t", "w_hh_t", "bias", "w_ih_t_q8", "w_ih_t_q8s",
              "w_hh_t_q8", "w_hh_t_q8s")

# shard_map TP specs: ONLY the encoder LSTM stack is tensor-parallel; the
# conv embed, decoder, and joiner are tiny and stay replicated (they run
# identically on every model shard — deterministic, so event outputs agree).
# Written against the canonical axis name 'model'; tp_param_specs rewrites
# the axis to the mesh's actual model-axis name(s).
_TP_SPECS: Dict[str, P] = {
    "w_ih_t": P(None, None, "model"),
    "w_hh_t": P(None, None, "model"),
    "bias": P(None, "model"),
    "w_hr_t": P(None, "model", None),
    "ff1_t": P(None, None, "model"),
    "ff1_b": P(None, "model"),
    "ff2_t": P(None, "model", None),
    "ff2_b": P(),
    "w_ih_t_q8": P(None, None, "model"),
    "w_ih_t_q8s": P(None, None, "model"),
    "w_hh_t_q8": P(None, None, "model"),
    "w_hh_t_q8s": P(None, None, "model"),
    "w_hr_t_q8": P(None, "model", None),
    "w_hr_t_q8s": P(),
    "ff1_t_q8": P(None, None, "model"),
    "ff1_t_q8s": P(None, None, "model"),
    "ff2_t_q8": P(None, "model", None),
    "ff2_t_q8s": P(),
}


def gate_shuffle_perm(H: int, m: int) -> np.ndarray:
    """Permutation of the 4H gate axis: output position
    k*4*(H/m) + g*(H/m) + j  <-  g*H + k*(H/m) + j  (shard k, gate g)."""
    if H % m:
        raise ValueError(f"hidden {H} not divisible by model_parallel {m}")
    Hs = H // m
    perm = np.empty(4 * H, np.int64)
    pos = 0
    for k in range(m):
        for g in range(4):
            perm[pos : pos + Hs] = g * H + k * Hs + np.arange(Hs)
            pos += Hs
    return perm


def shuffle_gate_columns(params: Dict, m: int) -> Dict:
    """Gate-shuffle every 4H-axis weight for an m-way model axis (no-op for
    m == 1). Idempotence is NOT a property — apply exactly once, to the
    stock layout."""
    if m == 1:
        return params
    out = dict(params)
    perm = None
    for k in _GATE_KEYS:
        if k not in params:
            continue
        w = params[k]
        if perm is None or perm.shape[0] != w.shape[-1]:
            perm = gate_shuffle_perm(w.shape[-1] // 4, m)
        out[k] = jax.numpy.take(w, perm, axis=-1)
    return out


def tp_param_specs(params: Dict, model_axis="model") -> Dict[str, P]:
    """PartitionSpec per param for the shard_map TP path (gate-shuffled
    layout); anything not in the TP table is replicated. `model_axis` is the
    mesh's actual model-axis name (a string, or a tuple of names for meshes
    whose model dimension spans several axes) — MeshConfig.model_axis is
    configurable, so the canonical 'model' in the table is rewritten."""
    def fix(spec: P) -> P:
        return P(*(model_axis if e == "model" else e for e in spec))

    return {k: fix(_TP_SPECS.get(k, P())) for k in params}


def tp_shard_map_eligible(params: Dict, dims) -> bool:
    """Whether the explicit shard_map TP path can serve these weights:
    native LSTM-family pytree with the full layer stack present."""
    return all(
        k in params
        for k in ("w_ih_t", "w_hh_t", "bias", "w_hr_t", "ff1_t", "ff2_t", "norm_eps")
    )


# ---------------------------------------------------------------------------
# Conformer family (models/conformer.py) shard_map TP
#
# Head-sharded attention + column-sharded FF/conv inputs + row-sharded
# outputs with explicit psums (conformer._block_step axis= path). Column
# shards are contiguous EXCEPT the conv GLU matrix cv_pw1 [L, d, 2d], whose
# columns pair (i, d+i): glu_shuffle_perm rearranges them so shard k's
# contiguous slice is [a_k | b_k] — the conformer analog of the LSTM gate
# shuffle above. The KV ring state h and conv state c shard with the heads /
# conv channels (each device carries its own heads' rings).
# ---------------------------------------------------------------------------

# [L, d, X] matrices whose LAST axis shards (X = heads*dk, F, or d)
_CONF_COL = ("att_q", "att_k", "att_v", "ff1_a", "ff2_a", "cv_pw1", "cv_dw")
# [L, X] vectors that shard with the matching column shard
_CONF_COL_B = (
    "att_qb", "att_kb", "att_vb", "ff1_ab", "ff2_ab", "cv_pw1b", "cv_dwb",
)
# [L, X, d] matrices whose MIDDLE axis shards (partial outputs -> psum)
_CONF_ROW = ("att_o", "ff1_o", "ff2_o", "cv_pw2")


def conformer_tp_specs(params: Dict, model_axis="model") -> Dict[str, P]:
    """PartitionSpec per param for the conformer shard_map TP path (glu-
    shuffled cv_pw1 layout); everything else (embed convs, layer norms,
    output biases, decoder, joiner) is replicated."""
    specs: Dict[str, P] = {}
    for k in params:
        base = k[:-3] if k.endswith("_q8") else (
            k[:-4] if k.endswith("_q8s") else k
        )
        if base == "rel_bias":
            specs[k] = P(None, model_axis, None)
        elif base in _CONF_COL:
            # q8s scales are per-output-column [L, 1, X]: shard with columns
            specs[k] = P(None, None, model_axis)
        elif base in _CONF_COL_B:
            specs[k] = P(None, model_axis)
        elif base in _CONF_ROW:
            if k.endswith("_q8s"):
                specs[k] = P()  # per-column scales span all row shards
            else:
                specs[k] = P(None, model_axis, None)
        else:
            specs[k] = P()
    return specs


def glu_shuffle_perm(d: int, m: int) -> np.ndarray:
    """Permutation of cv_pw1's 2d column axis: shard k's contiguous slice
    becomes [a-half cols k*d/m:(k+1)*d/m | b-half cols d + same range]."""
    if d % m:
        raise ValueError(f"d_model {d} not divisible by model_parallel {m}")
    dl = d // m
    perm = np.empty(2 * d, np.int64)
    pos = 0
    for k in range(m):
        perm[pos : pos + dl] = k * dl + np.arange(dl)
        perm[pos + dl : pos + 2 * dl] = d + k * dl + np.arange(dl)
        pos += 2 * dl
    return perm


def glu_shuffle_columns(params: Dict, m: int) -> Dict:
    """Apply the GLU column shuffle to cv_pw1 (+ its bias and q8 copies).
    No-op for m == 1; apply exactly once, to the stock layout."""
    if m == 1:
        return params
    out = dict(params)
    d2 = params["cv_pw1"].shape[-1]
    perm = glu_shuffle_perm(d2 // 2, m)
    for k in ("cv_pw1", "cv_pw1b", "cv_pw1_q8", "cv_pw1_q8s"):
        if k in params:
            out[k] = jax.numpy.take(params[k], perm, axis=-1)
    return out


def conformer_tp_eligible(params: Dict, dims, m: int) -> bool:
    """Whether the conformer shard_map TP path can serve these weights."""
    return (
        "att_q" in params
        and "cv_dw" in params
        and dims.heads % m == 0
        and dims.ffn % m == 0
        and dims.d_model % m == 0
    )


def prepare_conformer_tp_weights(params: Dict, mesh: Mesh) -> Dict:
    """GLU-shuffle + place conformer weights for the shard_map TP engine."""
    model_axes = tuple(mesh.axis_names[1:])
    m = 1
    for ax in model_axes:
        m *= mesh.shape[ax]
    shuffled = glu_shuffle_columns(params, m)
    specs = conformer_tp_specs(
        shuffled, model_axes if len(model_axes) != 1 else model_axes[0]
    )
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in shuffled.items()
    }


def prepare_tp_weights(params: Dict, mesh: Mesh) -> Dict:
    """Gate-shuffle + place weights for the shard_map TP engine: sharded
    per tp_param_specs over `mesh` (model axes = mesh.axis_names[1:],
    whatever they are named)."""
    model_axes = tuple(mesh.axis_names[1:])
    m = 1
    for ax in model_axes:
        m *= mesh.shape[ax]
    shuffled = shuffle_gate_columns(params, m)
    specs = tp_param_specs(
        shuffled, model_axes if len(model_axes) != 1 else model_axes[0]
    )
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in shuffled.items()
    }
