"""Per-speaker session state snapshot/restore on the batched engine.

The reference RESERVED this capability but never implemented it
(april_api.h:78-84 `AprilSpeakerID` — "Currently not implemented, has no
effect"; :194-196 "Saves state to a file if AprilSpeakerID was supplied").
Here it works for real, for EVERY client surface: the per-session state is
four plain array rows (LSTM/Conformer h & c, decoder context, decoder
output), so a speaker snapshot is a device->host copy keyed by
(model name, speaker key), and restore is a row write into the engine's
state arrays. api/session.py uses these for in-process Python sessions;
cli/serve.py exposes them over the wire (opcode 6) so the C/C#/Java
bindings' `AprilConfig.speaker` has an effect too.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

import numpy as np

from ..utils import logging as log


def speaker_dir() -> str:
    return os.environ.get(
        "APRIL_SPEAKER_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "april_asr_tpu", "speakers"),
    )


def speaker_path(model_name: str, speaker_key: str) -> str:
    h = hashlib.sha256((model_name + "\0" + speaker_key).encode()).hexdigest()[:32]
    return os.path.join(speaker_dir(), f"{h}.npz")


def save_speaker_state(engine, slot: int, model_name: str, speaker_key: str) -> bool:
    """Snapshot `slot`'s carried state under (model, speaker). Never raises
    (a failed snapshot must not fail a session close); returns success."""
    try:
        os.makedirs(speaker_dir(), exist_ok=True)
        # _step_lock: the serve tick thread mutates engine.state concurrently;
        # snapshot a consistent post-step state, not a mid-transition one.
        with engine._step_lock:
            # canonical_state: under shard_map TP the h/c leaves are gathered
            # to the canonical layout first, so a speaker saved on a TP mesh
            # restores into any serving geometry (parallel/multihost.py)
            from ..parallel.multihost import canonical_state

            st = canonical_state(engine)
            rows = {
                "h": np.asarray(st["h"])[:, slot],
                "c": np.asarray(st["c"])[:, slot],
                "context": np.asarray(st["decode"]["context"])[slot],
                "dout": np.asarray(st["decode"]["dout"])[slot],
            }
        np.savez(speaker_path(model_name, speaker_key), **rows)
        return True
    except Exception as e:  # never fail a close on snapshot errors
        log.warning("speaker state save failed: %s", e)
        return False


def restore_speaker_state(
    engine, slot: int, model_name: str, speaker_key: str
) -> bool:
    """Load a prior snapshot into `slot` (no-op when none exists); returns
    whether a snapshot was applied."""
    path = speaker_path(model_name, speaker_key)
    if not os.path.exists(path):
        return False
    try:
        import jax.numpy as jnp

        from ..parallel.multihost import rows_from_canonical

        data = np.load(path)
        # snapshots store the canonical layout; map onto this engine's
        # (possibly TP-rearranged) global h/c layout before the row write
        h_rows = rows_from_canonical(engine, "h", jnp.asarray(data["h"])[:, None])[:, 0]
        c_rows = rows_from_canonical(engine, "c", jnp.asarray(data["c"])[:, None])[:, 0]
        # _step_lock: the read-modify-write of engine.state must not
        # interleave with a concurrent tick — a tick completing between the
        # read and the assignment would be silently rewound for EVERY slot.
        with engine._step_lock:
            st = dict(engine.state)
            st["decode"] = dict(st["decode"])
            st["h"] = st["h"].at[:, slot].set(h_rows)
            st["c"] = st["c"].at[:, slot].set(c_rows)
            st["decode"]["context"] = (
                st["decode"]["context"].at[slot].set(jnp.asarray(data["context"]))
            )
            st["decode"]["dout"] = (
                st["decode"]["dout"].at[slot].set(jnp.asarray(data["dout"]))
            )
            engine.state = st
        log.info("restored speaker state for %r", speaker_key)
        return True
    except Exception as e:
        log.warning("speaker state restore failed: %s", e)
        return False
