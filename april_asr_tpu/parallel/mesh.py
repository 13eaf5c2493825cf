"""Device mesh construction and sharding rules.

The reference has no parallelism of any kind (batch hard-required to 1,
src/params.c:71; ORT pinned to one thread, src/april_model.c:54-55;
multi-session = independent sessions sharing weights). This module introduces
the TPU scale axes (SURVEY.md §2.4):

  * `data` — the central axis: concurrent sessions (serving) or utterances
    (training) sharded across chips; per-session LSTM state lives in HBM on
    the chip that owns the session.
  * `model` — tensor parallelism for when the model exceeds one chip: LSTM
    gate dims, FFN hidden, and joiner vocab are sharded; XLA/GSPMD inserts
    the psum/all-gather collectives over ICI from the shardings alone.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def make_mesh(
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
    cfg: MeshConfig = MeshConfig(),
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


# Per-parameter partition specs for the native transducer pytree
# (models/lstm_transducer.py layout). Rules: shard the big contraction
# output dims (gates 4H, FFN hidden, vocab) over `model`; keep small convs
# and norm scalars replicated. GSPMD derives the collectives.
_PARAM_SPECS: Dict[str, P] = {
    "w_ih_t": P(None, None, "model"),
    "w_hh_t": P(None, None, "model"),
    "bias": P(None, "model"),
    "w_hr_t": P(None, "model", None),
    "ff1_t": P(None, None, "model"),
    "ff1_b": P(None, "model"),
    "ff2_t": P(None, "model", None),
    "ff2_b": P(),
    "norm_eps": P(),
    "enc_proj_t": P(),
    "enc_proj_b": P(),
    "dec_embed": P("model", None),
    "dec_conv_w": P("model", None, None),
    "dec_proj_t": P(),
    "dec_proj_b": P(),
    "join_t": P(None, "model"),
    "join_b": P("model"),
    # conformer family (models/conformer.py): shard attention projections on
    # the head/output dim and FFN on the hidden dim; the small conv module,
    # layernorms, and relative bias stay replicated
    # int8 quantized serving copies (lstm_transducer.quantize_weights):
    # values and per-output-column scales shard exactly like their originals
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
    "att_q": P(None, None, "model"),
    "att_k": P(None, None, "model"),
    "att_v": P(None, None, "model"),
    "att_qb": P(None, "model"),
    "att_kb": P(None, "model"),
    "att_vb": P(None, "model"),
    "att_o": P(None, "model", None),
    "ff1_a": P(None, None, "model"),
    "ff1_ab": P(None, "model"),
    "ff1_o": P(None, "model", None),
    "ff2_a": P(None, None, "model"),
    "ff2_ab": P(None, "model"),
    "ff2_o": P(None, "model", None),
}


def param_specs(params: Dict) -> Dict[str, P]:
    """PartitionSpec per native param; replicated for anything unknown
    (conv weights etc.)."""
    return {k: _PARAM_SPECS.get(k, P()) for k in params}


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    specs = param_specs(params)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k])) for k, v in params.items()
    }


def state_spec_tree(
    state: Dict, data_axis: str = "data", tp_axes=None, tp_family: str = "lstm"
) -> Dict:
    """PartitionSpecs for engine/session state: session axis sharded over
    `data`. h/c are [L, S, ·] (session axis 1); everything else is [S, ...].
    Under the shard_map TP path (`tp_axes` = the model axis name(s)) the
    cell state c additionally shards its hidden axis over the model axis
    (gate-shuffled layout, parallel/tp.py); for the Conformer family
    (`tp_family="conformer"`) the KV-ring state h shards too (each device
    carries its own heads' rings)."""

    def spec_for(path, leaf):
        model = tp_axes if not tp_axes or len(tp_axes) > 1 else tp_axes[0]
        if path in ("h", "c") and tp_family == "pipeline":
            # stage mesh: the layer dim shards over the stage slabs
            return P("stage", data_axis)
        if path == "c" and tp_axes:
            return P(None, data_axis, model)
        if path == "h" and tp_axes and tp_family == "conformer":
            return P(None, data_axis, model)
        if path in ("h", "c"):
            return P(None, data_axis)
        return P(data_axis)

    out = {}
    for k, v in state.items():
        if isinstance(v, dict):
            out[k] = {kk: spec_for(kk if k != "fbank" else "x", vv) for kk, vv in v.items()}
            if k in ("fbank", "decode"):
                out[k] = {kk: P(data_axis) for kk in v}
        else:
            out[k] = spec_for(k, v)
    return out


def shard_batch(x, mesh: Mesh, data_axis: str = "data"):
    """Shard a [B, ...] batch over the data axis."""
    return jax.device_put(x, NamedSharding(mesh, P(data_axis)))
