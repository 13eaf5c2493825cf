"""Training checkpoint save/resume on the safetensors container.

The reference has no checkpointing at all (SURVEY.md §5: AprilSpeakerID is
reserved-but-unimplemented; training lives outside the repo in icefall).
Here it is first-class: the full TrainState (params + optimizer state + step)
round-trips through one file, resumable on a different mesh — arrays are
saved unsharded and re-placed by the caller's shardings on restore.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from ..io.safetensors import load_safetensors_bytes, save_safetensors_bytes
from ..models.lstm_transducer import is_derived


def _to_host(v) -> np.ndarray:
    """Fetch a (possibly multi-host-sharded) array to host memory.

    np.asarray raises on jax.Arrays spanning non-addressable devices; gather
    those across processes first so every host writes a complete checkpoint.
    """
    if isinstance(v, jax.Array) and not v.is_fully_addressable:
        from jax.experimental import multihost_utils

        v = multihost_utils.process_allgather(v, tiled=True)
    return np.asarray(v)


def _flatten_state(state) -> Tuple[Dict[str, np.ndarray], dict]:
    """TrainState -> flat name->array dict + metadata. Optimizer-state leaves
    are keyed by flatten order; resume must use the same optimizer config
    (same treedef), which the step counter metadata lets us sanity-check."""
    params = {
        f"params.{k}": _to_host(v)
        for k, v in state.params.items()
        if not is_derived(k)
    }
    opt_leaves = jax.tree_util.tree_leaves(state.opt_state)
    opt = {f"opt.{i:04d}": _to_host(v) for i, v in enumerate(opt_leaves)}
    meta = {"step": int(state.step), "n_opt_leaves": len(opt_leaves)}
    return {**params, **opt}, meta


def save_checkpoint(path: str | os.PathLike, state) -> None:
    flat, meta = _flatten_state(state)
    data = save_safetensors_bytes(flat, metadata=meta)
    tmp = os.fspath(path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_checkpoint(path: str | os.PathLike, template_state):
    """Restore into the structure of `template_state` (a freshly-initialized
    TrainState from the same dims/optimizer). Returns the restored state."""
    with open(path, "rb") as f:
        flat, meta = load_safetensors_bytes(f.read())
    params = dict(template_state.params)
    for k in list(params.keys()):
        if is_derived(k):
            continue
        key = f"params.{k}"
        if key not in flat:
            raise ValueError(f"checkpoint missing parameter {k}")
        params[k] = jax.numpy.asarray(flat[key])
    # re-derive any derived tables lazily (loader recomputes them)
    params = {k: v for k, v in params.items() if not is_derived(k)}

    leaves, treedef = jax.tree_util.tree_flatten(template_state.opt_state)
    n = int(meta.get("n_opt_leaves", -1))
    if n != len(leaves):
        raise ValueError(
            f"optimizer state mismatch: checkpoint has {n} leaves, "
            f"template has {len(leaves)} (different optimizer config?)"
        )
    new_leaves = [jax.numpy.asarray(flat[f"opt.{i:04d}"]) for i in range(n)]
    opt_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return template_state._replace(
        params=params, opt_state=opt_state, step=jax.numpy.int32(meta["step"])
    )


def load_checkpoint_params(path: str | os.PathLike) -> Dict[str, np.ndarray]:
    """Load only the model parameters from a checkpoint (no optimizer-state
    template needed — for export / eval tooling that doesn't resume
    training). Derived tables are recomputed by the model loader."""
    with open(path, "rb") as f:
        flat, _ = load_safetensors_bytes(f.read())
    return {
        k[len("params."):]: v for k, v in flat.items() if k.startswith("params.")
    }


def latest_checkpoint(ckpt_dir: str | os.PathLike) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [f for f in os.listdir(ckpt_dir) if f.endswith(".ckpt.safetensors")]
    if not cands:
        return None
    return os.path.join(ckpt_dir, max(cands))
