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
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from ..utils import logging as log


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
    on_peer_failure=None,
) -> None:
    """Initialize the JAX distributed runtime for this process.

    All arguments default to auto-detection (TPU pod metadata or the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars),
    matching `jax.distributed.initialize` semantics. Call once per process
    before any other JAX operation — `jax.distributed.initialize` refuses to
    run after the XLA backend has been touched, so this guard must not
    itself query devices/process_count. No-ops when the runtime is already
    up or when running single-process with no coordinator configured.

    `on_peer_failure(status_message)` is the serving-layer failure detector:
    WITHOUT it, the stock runtime LOG(FATAL)s this process the moment any
    peer dies or misses heartbeats (xla distributed client default
    "Terminating process because the JAX distributed service detected fatal
    errors") — the exact opposite of elastic serving. With it, the runtime
    is brought up with a custom callback instead: peer death invokes the
    handler (e.g. trigger abandon_distributed + a local-engine failover,
    tests/test_host_failover.py) and this process keeps running.
    """
    if jax.distributed.is_initialized():
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        # single-process run; nothing to bring up
        return
    if on_peer_failure is None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    else:
        _init_with_failure_handler(
            coordinator_address, num_processes, process_id, on_peer_failure
        )
    log.info(
        "distributed runtime up: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def _init_with_failure_handler(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    handler,
    interval: float = 2.0,
    grace: int = 3,
) -> None:
    """Bring up the distributed runtime SURVIVABLY (mirrors
    jax._src.distributed.State.initialize with three changes):

    * the client registers as `recoverable`, so the coordination service
      does not error-propagate a peer's death to every task (the stock
      non-recoverable path LOG(FATAL)s each survivor ~1 s after any peer
      dies — measured; the custom missed_heartbeat_callback hook crashes
      with std::bad_cast on the error-poll path in current jaxlib, so it
      cannot be used for this);
    * the preemption sync manager is not started (its poll RPCs error-spam
      the coordination service after a peer death);
    * a PeerWatchdog thread heartbeats through the coordination KV store
      and invokes `handler(peer_id)` when a peer's heartbeat stops
      advancing for `grace * interval` seconds — the serving layer's
      failure DETECTION signal (trigger abandon_distributed + failover).
    """
    from jax._src import distributed as _dist

    state = _dist.global_state
    if state.client is not None:
        raise RuntimeError("distributed runtime already initialized")

    state.coordinator_address = coordinator_address
    state.process_id = process_id
    state.num_processes = num_processes
    if process_id == 0:
        bind = "[::]:" + coordinator_address.rsplit(":", 1)[1]
        state.service = _dist._jax.get_distributed_runtime_service(
            bind, num_processes
        )
    state.client = _dist._jax.get_distributed_runtime_client(
        coordinator_address,
        process_id,
        use_compression=True,
        recoverable=True,
        shutdown_on_destruction=False,
    )
    state.client.connect()
    _start_peer_watchdog(
        state.client, process_id, num_processes, handler, interval, grace
    )


def _start_peer_watchdog(
    client, process_id: int, num_processes: int, handler,
    interval: float, grace: int,
) -> None:
    """Daemon thread: publish this process's heartbeat counter in the
    coordination KV store and watch the peers'. A peer whose counter stops
    advancing for `grace` consecutive checks (and any peer that never
    appears within the same budget after first being seen alive) is
    reported dead via `handler(peer_id)`, exactly once."""
    import threading
    import time as _time

    def loop():
        seq = 0
        last = {}  # peer -> (last_value, stale_checks)
        dead = set()
        while True:
            try:
                client.key_value_set(
                    f"/april_hb/{process_id}", str(seq), allow_overwrite=True
                )
            except Exception:
                return  # runtime torn down (abandon_distributed)
            seq += 1
            for peer in range(num_processes):
                if peer == process_id or peer in dead:
                    continue
                try:
                    v = client.key_value_try_get(f"/april_hb/{peer}")
                except Exception:
                    v = None  # not published yet (or runtime down)
                prev, stale = last.get(peer, (None, 0))
                if v is not None and v != prev:
                    last[peer] = (v, 0)
                elif prev is not None:
                    stale += 1
                    last[peer] = (prev, stale)
                    if stale >= grace:
                        dead.add(peer)
                        log.error("peer %d heartbeat lost; reporting dead", peer)
                        try:
                            handler(peer)
                        except Exception:
                            log.warning("peer-failure handler raised", exc_info=True)
            _time.sleep(interval)

    threading.Thread(target=loop, daemon=True, name="april-peer-watchdog").start()


def abandon_distributed() -> None:
    """Abandon a distributed runtime whose peer(s) died: detach the global
    state (KEEPING the old client/service referenced — their destructors
    could block on the dead peer) and drop the initialized backends so the
    next JAX call builds a single-process client over the local devices.
    The caller then rebuilds its engine locally (restore_slots)."""
    from jax._src import distributed as _dist

    global _abandoned  # keep the dead runtime's objects alive, detached
    _abandoned = _dist.global_state
    _dist.global_state = _dist.State()
    import jax.extend.backend as _xb

    _xb.clear_backends()
    log.warning("distributed runtime abandoned; now single-process")


_abandoned = None


def rejoin_distributed(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    on_peer_failure=None,
) -> None:
    """Scale BACK OUT after a failover: bring up a fresh distributed runtime
    from a process that has already been serving locally (the inverse of
    abandon_distributed, and the 'rejoin' half of SURVEY §2.4's elastic
    contract). `jax.distributed.initialize` refuses to run once the XLA
    backend has been touched, so the local backends are dropped first — the
    caller must rebuild its engine on the new global mesh and restore slots
    from its snapshot (tests/test_host_rejoin.py drives the full sequence:
    serve locally -> snapshot -> rejoin -> mesh engine -> restore -> hand
    half the slots to the replacement host)."""
    import jax.extend.backend as _xb

    _xb.clear_backends()
    init_distributed(
        coordinator_address, num_processes, process_id,
        on_peer_failure=on_peer_failure,
    )
    log.warning(
        "rejoined distributed runtime as process %d/%d", process_id,
        num_processes,
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


# ---------------------------------------------------------------------------
# Host-failure recovery: slot snapshots + failover (SURVEY.md §5 elasticity —
# "fail/rejoin at the serving layer"; the reference aborts the process on any
# backend error, ort_util.h:29-38, and has no multi-host anything)
#
# Contract (docs/distributed.md "Host failure recovery"):
#   * each host periodically calls snapshot_local_slots(engine, path) for the
#     slot rows its devices own — ALL carried per-session state (fbank rings,
#     LSTM/Conformer h & c, decode state incl. time_ms), so a restore resumes
#     the stream bit-exactly from the snapshot point;
#   * when a peer host dies, the distributed runtime that spanned it is gone:
#     the survivor rebuilds a LOCAL engine over its own devices and calls
#     restore_slots() with its own last snapshot (its sessions continue
#     exactly) and optionally the dead host's last snapshot (adopting those
#     sessions); audio staged after the snapshot is lost (clients see the
#     usual CANT_KEEP_UP-style gap), sessions without a snapshot restart and
#     their handlers get SESSION_ERROR;
#   * snapshots are per-slot-row state only; the host-side token window is
#     rebuilt empty for ADOPTED sessions (their original host's mirror died
#     with it), so their next FINAL covers post-recovery tokens only.
# ---------------------------------------------------------------------------


def _session_axis(leaf_key: str) -> int:
    return 1 if leaf_key in ("h", "c") else 0


# ---------------------------------------------------------------------------
# TP <-> canonical state layout
#
# Snapshots are stored in the CANONICAL single-device layout so they restore
# into any serving geometry (DP, TP of any width, single chip). Under
# shard_map TP the global h/c arrays differ per family:
#   * LSTM: h is replicated over the model axis; c's hidden axis shards as
#     contiguous canonical slices (the gate shuffle maps shard k exactly onto
#     hidden range [k*H/m, (k+1)*H/m) — parallel/tp.py module docstring), so
#     the global array IS canonical and only the replication gather is needed.
#   * Conformer: the global rows are m back-to-back per-shard blocks — shard
#     j's KV ring and conv slice for ITS heads (d_local = d/m), plus a
#     per-shard position scalar (global c width (k-1)*d + m vs canonical
#     (k-1)*d + 1; engine/step.py state_shapes override). The transforms
#     below reassemble/split those blocks.
# ---------------------------------------------------------------------------


def _conformer_tp_to_canonical(h, c, m: int, dims):
    import jax.numpy as jnp

    L, S = h.shape[0], h.shape[1]
    C, k, d = dims.att_context, dims.conv_kernel, dims.d_model
    dl = d // m
    hb = h.reshape(L, S, m, 2 * C * dl)
    kc = jnp.moveaxis(hb[..., : C * dl].reshape(L, S, m, C, dl), 2, 3)
    vc = jnp.moveaxis(hb[..., C * dl :].reshape(L, S, m, C, dl), 2, 3)
    h2 = jnp.concatenate(
        [kc.reshape(L, S, C * d), vc.reshape(L, S, C * d)], axis=-1
    )
    cb = c.reshape(L, S, m, (k - 1) * dl + 1)
    conv = jnp.moveaxis(cb[..., :-1].reshape(L, S, m, k - 1, dl), 2, 3)
    pos = cb[..., 0, -1:]  # identical across shards (replicated counter)
    c2 = jnp.concatenate([conv.reshape(L, S, (k - 1) * d), pos], axis=-1)
    return h2, c2


def _conformer_canonical_to_tp(arr, key: str, m: int, dims):
    import jax.numpy as jnp

    L, S = arr.shape[0], arr.shape[1]
    C, k, d = dims.att_context, dims.conv_kernel, dims.d_model
    dl = d // m
    if key == "h":
        kc = jnp.moveaxis(arr[..., : C * d].reshape(L, S, C, m, dl), 3, 2)
        vc = jnp.moveaxis(arr[..., C * d :].reshape(L, S, C, m, dl), 3, 2)
        return jnp.concatenate(
            [kc.reshape(L, S, m, C * dl), vc.reshape(L, S, m, C * dl)],
            axis=-1,
        ).reshape(L, S, 2 * C * d)
    conv = jnp.moveaxis(arr[..., :-1].reshape(L, S, k - 1, m, dl), 3, 2)
    pos = jnp.broadcast_to(arr[..., None, -1:], (L, S, m, 1))
    return jnp.concatenate(
        [conv.reshape(L, S, m, (k - 1) * dl), pos], axis=-1
    ).reshape(L, S, (k - 1) * d + m)


def _tp_model_size(engine) -> int:
    mesh = getattr(engine, "mesh", None)
    if mesh is None:
        return 1
    if getattr(engine.prog, "tp_family", None) == "pipeline":
        # stage mesh: h/c shard their LAYER dim over the stage axis in the
        # canonical order (contiguous slabs) — only the gather is needed,
        # but it IS needed (the addressable-shards walk dedupes by session
        # start and would otherwise drop every slab but the first)
        return int(mesh.shape.get("stage", 1))
    tp_axes = getattr(engine.prog, "tp_axes", None)
    if not tp_axes:
        return 1
    m = 1
    for ax in tp_axes:
        m *= mesh.shape[ax]
    return m


def canonical_state(engine) -> Dict:
    """`engine.state` with every model-sharded leaf gathered to the canonical
    single-device layout (replicated over the model axis, still sharded over
    data). Identity for DP/single-device engines. In a multi-process TP mesh
    this is a collective — every process must call it together (snapshots are
    periodic, taken while all hosts are alive)."""
    m = _tp_model_size(engine)
    if m == 1:
        return engine.state
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = engine.mesh
    dims = engine.rt.dims
    fam = engine.prog.tp_family

    def fix(h, c):
        if fam == "conformer":
            return _conformer_tp_to_canonical(h, c, m, dims)
        return h, c  # LSTM: global layout is already canonical

    ns = NamedSharding(mesh, P(None, mesh.axis_names[0]))
    h, c = jax.jit(fix, out_shardings=(ns, ns))(
        engine.state["h"], engine.state["c"]
    )
    return {**engine.state, "h": h, "c": c}


def rows_from_canonical(engine, key: str, rows):
    """Inverse of canonical_state for one h/c leaf: canonical rows -> this
    engine's global layout (identity unless the engine is conformer TP)."""
    m = _tp_model_size(engine)
    if m == 1 or key not in ("h", "c"):
        return rows
    if engine.prog.tp_family == "conformer":
        return _conformer_canonical_to_tp(rows, key, m, engine.rt.dims)
    return rows


def _flatten_state(state: Dict) -> Dict[str, object]:
    flat = {}
    for k, v in state.items():
        if isinstance(v, dict):
            for kk, vv in v.items():
                flat[f"{k}.{kk}"] = vv
        else:
            flat[k] = v
    return flat


def _addressable_rows(arr, s_axis: int):
    """(row_start, host-local rows) of `arr` along the session axis from this
    process's addressable shards (dedupes replicated shards)."""
    by_start = {}
    for sh in arr.addressable_shards:
        start = sh.index[s_axis].start or 0
        if start not in by_start:
            by_start[start] = np.asarray(sh.data)
    starts = sorted(by_start)
    rows = np.concatenate([by_start[s] for s in starts], axis=s_axis)
    return starts[0], rows


def snapshot_local_slots(engine, path: str) -> Tuple[int, int]:
    """Write this process's slot rows of the ENTIRE engine state to `path`
    (.npz). Works for single-process engines too (all rows). Returns the
    (lo, hi) row range saved. Under shard_map TP the model-sharded h/c
    leaves are first gathered to the canonical layout (canonical_state), so
    a snapshot taken on any mesh restores into any mesh — this makes the
    gather a collective across a multi-process TP mesh (reference analog:
    the speaker-persistence reservation, april_api.h:78-84)."""
    with engine._step_lock:
        flat = _flatten_state(canonical_state(engine))
        out = {}
        lo = hi = None
        for k, v in flat.items():
            ax = _session_axis(k)
            start, rows = _addressable_rows(v, ax)
            out[k] = rows
            n = rows.shape[ax]
            if lo is None:
                lo, hi = start, start + n
            elif (start, start + n) != (lo, hi):
                raise RuntimeError(
                    f"inconsistent addressable rows: {k} [{start},{start+n}) "
                    f"vs [{lo},{hi})"
                )
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:  # file handle: savez must not append ".npz"
        np.savez(f, __lo__=lo, __hi__=hi, **out)
    os.replace(tmp, path)  # atomic: readers never see a torn snapshot
    log.info("slot snapshot: rows [%d, %d) -> %s", lo, hi, path)
    return lo, hi


def restore_slots(engine, path: str, at: Optional[int] = None) -> Tuple[int, int]:
    """Load a snapshot's slot rows into `engine` at row offset `at` (default:
    the snapshot's original range). The engine must have the same model/
    state geometry; restore is a jitted row write under the engine's step
    lock, so it is safe against a concurrent serving tick."""
    import jax.numpy as jnp

    data = np.load(path)
    lo = int(data["__lo__"])
    hi = int(data["__hi__"])
    dst = lo if at is None else at
    n = hi - lo
    with engine._step_lock:
        state = dict(engine.state)
        new_groups: Dict[str, Dict] = {}
        for k in data.files:
            if k.startswith("__"):
                continue
            # snapshots are canonical-layout; map onto this engine's global
            # layout (conformer TP rearranges + pads the h/c feature axis)
            rows = rows_from_canonical(engine, k, jnp.asarray(data[k]))
            ax = _session_axis(k)
            idx = (slice(None),) * ax + (slice(dst, dst + n),)
            if "." in k:
                g, kk = k.split(".", 1)
                grp = new_groups.setdefault(g, dict(state[g]))
                grp[kk] = grp[kk].at[idx].set(rows)
            else:
                state[k] = state[k].at[idx].set(rows)
        for g, grp in new_groups.items():
            state[g] = grp
        engine.state = state
    log.info("restored %d slot rows from %s at row %d", n, path, dst)
    return dst, dst + n
