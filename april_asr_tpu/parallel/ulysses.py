"""Ulysses-style sequence parallelism for the Conformer encoder.

The reference has no attention and therefore no sequence/context
parallelism (SURVEY.md §2.4); for the attention family this module shards
the *sequence* (window) axis of the full-utterance encoder across a mesh
axis — the long-context scaling path for training and offline bulk
transcription, where one utterance's window count can exceed what a single
chip wants to hold.

Layout per layer (classic Ulysses, head-sharded attention):

  * feed-forward / layernorm / pointwise ops run on the local sequence
    shard — no communication;
  * attention: `all_to_all` over ICI re-shards [S, W_local, H, dk] into
    [S, W_full, H_local, dk] (each device sees the FULL sequence for its
    head group), computes the context-limited causal attention exactly like
    `conformer_encoder_seq`, and `all_to_all`s back;
  * the causal depthwise conv needs only a (kernel-1)-frame halo from the
    left neighbor, exchanged with `ppermute`.

Requires heads % seq_shards == 0 and W % seq_shards == 0 (pad windows).
Output is numerically equivalent to the unsharded `conformer_encoder_seq`
(tests/test_ulysses.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.conformer import (
    _STACKED,
    ConformerDims,
    _ff,
    _layer_norm,
    _mm,
    _swish,
    conv_subsample,
)
from ..ops.activations import sigmoid as _sig

try:  # jax >= 0.7 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def conformer_encoder_seq_sp(
    params,
    mel: jnp.ndarray,
    dims: ConformerDims,
    mesh: Mesh,
    seq_axis: str = "seq",
) -> jnp.ndarray:
    """[S, T, mel] -> [S, W_pad, joiner_dim], sequence-sharded over
    `seq_axis`. Matches `conformer_encoder_seq` on the first W windows;
    rows beyond W are padding (zero mel windows)."""
    n = mesh.shape[seq_axis]
    if dims.heads % n:
        raise ValueError(f"heads {dims.heads} not divisible by {seq_axis}={n}")
    seg, step = dims.segment_size, dims.segment_step
    S, T = mel.shape[0], mel.shape[1]
    W = (T - seg) // step + 1
    # each shard must hold >= conv_kernel-1 windows so the depthwise-conv
    # halo is a single left-neighbor exchange
    per_shard = max(-(-W // n), dims.conv_kernel - 1, 1)
    W_pad = per_shard * n

    # window + embed (local compute; GSPMD shards the N axis freely)
    starts = jnp.arange(W) * step
    windows = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(mel, s, seg, axis=1), out_axes=1
    )(starts)  # [S, W, seg, mel]
    windows = jnp.pad(windows, ((0, 0), (0, W_pad - W), (0, 0), (0, 0)))
    flat = windows.reshape(S * W_pad, seg, dims.mel)
    y = conv_subsample(params, flat)[:, 0, :].reshape(S, W_pad, dims.d_model)

    H, dk, C, k = dims.heads, dims.head_dim, dims.att_context, dims.conv_kernel
    d = dims.d_model
    L = dims.layers

    def body(y, prm):
        stacked = {kk: prm[kk] for kk in _STACKED}
        idx = jax.lax.axis_index(seq_axis)
        Wl = y.shape[1]  # local windows per shard
        base = idx * Wl  # global offset of this shard's rows

        # global causal-banded mask for the full sequence (used head-sharded)
        t_full = jnp.arange(W_pad)
        t_local = base + jnp.arange(Wl)

        def layer(y, p_l):
            x = y
            x = x + 0.5 * _ff(
                _layer_norm(x, p_l["ln1_s"], p_l["ln1_b"]),
                p_l["ff1_a"], p_l["ff1_ab"], p_l["ff1_o"], p_l["ff1_ob"],
            )
            u = _layer_norm(x, p_l["ln2_s"], p_l["ln2_b"])
            q = (_mm(u, p_l["att_q"]) + p_l["att_qb"].astype(jnp.float32)).reshape(
                S, Wl, H, dk
            )
            kk_ = (_mm(u, p_l["att_k"]) + p_l["att_kb"].astype(jnp.float32)).reshape(
                S, Wl, H, dk
            )
            vv = (_mm(u, p_l["att_v"]) + p_l["att_vb"].astype(jnp.float32)).reshape(
                S, Wl, H, dk
            )
            # re-shard: full sequence, H/n heads per device
            a2a = lambda t: jax.lax.all_to_all(  # noqa: E731
                t, seq_axis, split_axis=2, concat_axis=1, tiled=True
            )
            qf, kf, vf = a2a(q), a2a(kk_), a2a(vv)  # [S, W_pad, H/n, dk]
            dist = t_full[:, None] - t_full[None, :]
            causal = (dist >= 0) & (dist < C)
            scores = jnp.einsum(
                "sqhd,skhd->shqk", qf, kf, preferred_element_type=jnp.float32
            ) * (dk ** -0.5)
            # rel_bias rows for this device's head group
            hsel = jax.lax.dynamic_slice_in_dim(
                p_l["rel_bias"].astype(jnp.float32), idx * (H // n), H // n, axis=0
            )
            scores = scores + hsel[:, jnp.clip(dist, 0, C - 1)][None]
            scores = jnp.where(causal[None, None], scores, -jnp.inf)
            wgt = jax.nn.softmax(scores, axis=-1)
            att = jnp.einsum(
                "shqk,skhd->sqhd", wgt, vf, preferred_element_type=jnp.float32
            )
            # back to sequence-sharded, all heads
            att = jax.lax.all_to_all(
                att, seq_axis, split_axis=1, concat_axis=2, tiled=True
            ).reshape(S, Wl, d)
            x = x + _mm(att, p_l["att_o"]) + p_l["att_ob"].astype(jnp.float32)

            u = _layer_norm(x, p_l["ln3_s"], p_l["ln3_b"])
            g = _mm(u, p_l["cv_pw1"]) + p_l["cv_pw1b"].astype(jnp.float32)
            g = g[:, :, :d] * _sig(g[:, :, d:])  # [S, Wl, d]
            # halo: last k-1 frames of the LEFT neighbor (zeros for shard 0)
            tail = g[:, -(k - 1):, :] if k > 1 else g[:, :0, :]
            halo = jax.lax.ppermute(
                tail, seq_axis, [(i, i + 1) for i in range(n - 1)]
            )
            halo = jnp.where(idx > 0, halo, 0.0)
            padded = jnp.concatenate([halo, g], axis=1)  # [S, Wl+k-1, d]
            dw = sum(
                padded[:, i : i + Wl] * p_l["cv_dw"].astype(jnp.float32)[i]
                for i in range(k)
            ) + p_l["cv_dwb"].astype(jnp.float32)
            x = x + _mm(_swish(dw), p_l["cv_pw2"]) + p_l["cv_pw2b"].astype(
                jnp.float32
            )

            x = x + 0.5 * _ff(
                _layer_norm(x, p_l["ln4_s"], p_l["ln4_b"]),
                p_l["ff2_a"], p_l["ff2_ab"], p_l["ff2_o"], p_l["ff2_ob"],
            )
            return _layer_norm(x, p_l["lno_s"], p_l["lno_b"])

        for l in range(L):
            y = layer(y, {kk: stacked[kk][l] for kk in _STACKED})
        return _mm(y, prm["enc_proj_t"]) + prm["enc_proj_b"].astype(jnp.float32)

    out = _shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, seq_axis, None), P()),
        out_specs=P(None, seq_axis, None),
        check_vma=False,
    )(y, dict(params))
    return out
