"""Multi-host runtime: jax.distributed bring-up + serving mesh layout.

The reference is strictly single-process (SURVEY.md §2.4: no multi-process,
no RPC, no collectives anywhere in the repo); scaling beyond one host is a
new first-class capability of the TPU framework. This module is the thin
bring-up layer: one call per process wires the JAX distributed runtime
(coordination service + per-process device visibility), after which the
ordinary `make_mesh` / `shard_params` / `BatchEngine(mesh=...)` path works
unchanged — GSPMD inserts ICI collectives within a slice and DCN collectives
across hosts from the shardings alone.

Deployment shape for serving: the `data` (sessions) axis spans all chips of
all hosts; each host stages audio only for the session slots whose shards are
locally addressable (`local_slot_range`), so ingest never crosses hosts.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax

from ..utils import logging as log


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Initialize the JAX distributed runtime for this process.

    All arguments default to auto-detection (TPU pod metadata or the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars),
    matching `jax.distributed.initialize` semantics. Call once per process
    before any other JAX operation — `jax.distributed.initialize` refuses to
    run after the XLA backend has been touched, so this guard must not
    itself query devices/process_count. No-ops when the runtime is already
    up or when running single-process with no coordinator configured.
    """
    if jax.distributed.is_initialized():
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        # single-process run; nothing to bring up
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    log.info(
        "distributed runtime up: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def local_slot_range(batch: int, mesh) -> Tuple[int, int]:
    """[start, stop) of the session slots whose `data`-axis shards live on
    this process's devices.

    The engine shards slot s onto data-shard `s // (batch / data_size)`;
    a host should accept/stage sessions only in its own range so the audio
    staging arrays it fills are the ones its local chips consume.
    """
    data_axis = mesh.axis_names[0]
    data_size = mesh.shape[data_axis]
    if batch % data_size:
        raise ValueError(f"batch {batch} not divisible by data axis {data_size}")
    per_shard = batch // data_size
    # which data-axis coordinates are local to this process
    local = {d.id for d in jax.local_devices()}
    coords = [
        i
        for i in range(data_size)
        if any(dev.id in local for dev in mesh.devices[i].flatten())
    ]
    if not coords:
        return (0, 0)
    lo, hi = min(coords), max(coords)
    if coords != list(range(lo, hi + 1)):
        # a span would include slots whose shards live on OTHER hosts —
        # two hosts staging the same slot cross-wires sessions. Reorder the
        # mesh so each host's data coordinates are contiguous instead.
        raise ValueError(
            f"process {jax.process_index()} owns non-contiguous data shards "
            f"{coords}; build the mesh with host-contiguous device order"
        )
    return (lo * per_shard, (hi + 1) * per_shard)
