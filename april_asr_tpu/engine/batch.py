"""Host-side batched session engine: slot allocation, audio staging, ticks.

Replaces the reference's one-thread-per-session model (src/proc_thread.c,
src/audio_provider.c) with a slot-based batch engine: S sessions share one
set of device state arrays and one jitted step program; the host stages
incoming PCM16 per slot, dispatches one device step per tick for all slots,
and replays the returned event records into per-session callbacks.

Backpressure mirrors the reference's bounded ring buffer: staged audio beyond
`max_buffered_seconds` is dropped and the session's handler gets
ERROR_CANT_KEEP_UP (reference: audio_provider.c:59-64, april_session.c:485-492).
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DecodeConfig, EngineConfig
from ..decode.scalar import RESULT_CANT_KEEP_UP, RESULT_SESSION_ERROR, ScalarToken
from ..models.loader import ModelRuntime
from ..utils import logging as log
from .replay import EventReplayer
from .step import EngineProgram, build_engine, init_engine_state


def replay_packed(packed, slots) -> int:
    """Replay step/flush event outputs into per-slot replayers.

    `packed` is either a step.PackedEvents (compact blob + device-resident
    dense fallback — the serving format) or a raw dense tensor [S, R, 2I+1].
    Only the blob crosses the device->host link on the common path; the
    dense tensor is transferred just for sub-blobs whose event count
    overflowed the compact budget.

    Fast path: the native CPython extension (native/replay_ext.c) scans the
    buffer and applies window ops / fires callbacks in C (~0.5 us per event
    vs ~3.5 us for the Python loop — at >20k events/step the Python loop,
    not the TPU, is the serving bottleneck). Returns the number of events
    applied. `slots` is indexable by session; entries may be None (freed)
    or expose `.replayer`.
    """
    from .step import PackedEvents, iter_blobs

    if not isinstance(packed, PackedEvents):
        return _replay_dense(np.asarray(packed), slots)

    arr = np.ascontiguousarray(np.asarray(packed.blob), dtype=np.int32)
    n = 0
    dense = None  # transferred lazily, once, only on overflow
    for base, sub in iter_blobs(arr):
        S = int(sub[1])
        K = int(sub[2])
        if int(sub[4 : 4 + S].sum()) > K:
            if dense is None:
                dense = np.asarray(packed.dense)
            log.metrics.incr("event_blob_overflows")
            n += _replay_dense(dense[base : base + S], slots[base : base + S])
        else:
            n += _replay_blob(sub, slots[base : base + S])
    return n


def _replay_dense(arr: np.ndarray, slots) -> int:
    from ..native.replay_ext import load_replay_ext
    from .step import unpack_events_np

    ext = load_replay_ext()
    if ext is not None:
        arr = np.ascontiguousarray(arr, dtype=np.int32)
        S, P, width = arr.shape
        return ext.replay(arr.data, S, P, (width - 1) // 2, slots)

    ev_np = unpack_events_np(arr)
    ops = ev_np["ops"]
    coords = np.argwhere(ops != 0)
    if coords.size == 0:
        return 0
    tok, lp = ev_np["tok"], ev_np["logprob"]
    fl, tm, fk = ev_np["flags"], ev_np["time_ms"], ev_np["final_k"]
    n = 0
    for s, p, j in coords:
        slot = slots[s]
        if slot is None:
            continue
        slot.replayer.apply(
            int(ops[s, p, j]), int(tok[s, p, j]), float(lp[s, p, j]),
            int(fl[s, p, j]), int(tm[s, p]), int(fk[s, p, j]),
        )
        n += 1
    return n


def _replay_blob(sub: np.ndarray, slots) -> int:
    """Replay one non-overflowed sub-blob (see step.py blob layout)."""
    from ..native.replay_ext import load_replay_ext
    from .step import unpack_blob_np

    ext = load_replay_ext()
    if ext is not None and hasattr(ext, "replay_blob"):
        sub = np.ascontiguousarray(sub, dtype=np.int32)
        return ext.replay_blob(sub.data, slots)

    ev = unpack_blob_np(sub)
    n = 0
    stride = ev["stride"]
    base_time, sess = ev["base_time"], ev["session"]
    for k in range(ev["total"]):
        s = int(sess[k])
        slot = slots[s]
        if slot is None:
            continue
        slot.replayer.apply(
            int(ev["ops"][k]), int(ev["tok"][k]), float(ev["logprob"][k]),
            int(ev["flags"][k]),
            int(base_time[s]) + int(ev["dt"][k]) * stride,
            int(ev["final_k"][k]),
        )
        n += 1
    return n


class _Slot:
    def __init__(self, replayer: EventReplayer, handler):
        self.replayer = replayer
        self.handler = handler
        self.staged = np.zeros(0, np.int16)
        self.was_flushed = False


class BatchEngine:
    """S-session batched engine over one model."""

    def __init__(
        self,
        rt: ModelRuntime,
        batch: int = 8,
        cfg: EngineConfig | None = None,
        dcfg: DecodeConfig | None = None,
        prog: EngineProgram | None = None,
        mesh=None,
    ):
        """`prog` lets multiple engines share one compiled program (e.g. every
        batch-1 Session of a Model reuses the same jitted step).

        `mesh` (a jax.sharding.Mesh from parallel.make_mesh) runs the engine
        multi-chip: weights sharded per parallel.param_specs (TP over the
        `model` axis), session state and per-tick audio sharded over the
        `data` axis. The host-side slot/staging logic is unchanged — GSPMD
        compiles the same step program with collectives over ICI.
        """
        self.rt = rt
        self._multiprocess = False
        self._local_rows = (0, batch)
        if prog is not None and prog.batch != batch:
            raise ValueError(f"program batch {prog.batch} != engine batch {batch}")
        # donate=False: the serving engine keeps the pre-step state alive so
        # a program failure can be contained per slot (see _contain) instead
        # of evicting every session. Costs the output allocation + the
        # pass-through copies donation would have aliased away (~1 ms device
        # time per tick at S=2048 — containment is worth it on the serving
        # path; the bench drives build_engine directly with donation on).
        self.prog: EngineProgram = prog or build_engine(
            rt, batch, cfg or EngineConfig(), dcfg or DecodeConfig(), mesh=mesh,
            donate=False,
        )
        self.cfg = self.prog.cfg
        self.dcfg = self.prog.dcfg
        self.batch = batch
        self.mesh = mesh
        self._audio_sharding = None
        if mesh is None:
            self.weights = rt.weights
            self.state = init_engine_state(self.prog)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import shard_params, state_spec_tree

            # Pallas-vs-GSPMD handling lives in build_engine: data-parallel
            # meshes get shard_map programs (Pallas kernels intact), and so
            # do TP meshes for the native LSTM family (explicit TP kernels +
            # psums, parallel/tp.py); only families without a TP kernel
            # path trace pure-XLA under pallas_disabled via GSPMD.
            data_axis = mesh.axis_names[0]
            if batch % mesh.shape[data_axis]:
                raise ValueError(
                    f"batch {batch} not divisible by data axis "
                    f"{mesh.shape[data_axis]}"
                )
            self._multiprocess = jax.process_count() > 1
            tp_axes = self.prog.tp_axes
            if self.prog.tp_family == "pipeline":
                # stage mesh (PP serving): encoder layer slabs shard over
                # the `stage` axis; everything else replicates
                from ..parallel.pipeline import stage_param_specs

                specs_w = stage_param_specs(rt.weights)
                if self._multiprocess:
                    # same recipe as multi-process TP: device_put cannot
                    # reach non-addressable stage shards, so jit with
                    # out_shardings materializes the global arrays from
                    # (identical) per-host values
                    w_shardings = {
                        k: NamedSharding(mesh, specs_w[k]) for k in rt.weights
                    }
                    host_w = {k: np.asarray(v) for k, v in rt.weights.items()}
                    self.weights = jax.jit(
                        lambda w: w, out_shardings=w_shardings
                    )(host_w)
                else:
                    self.weights = {
                        k: jax.device_put(v, NamedSharding(mesh, specs_w[k]))
                        for k, v in rt.weights.items()
                    }
            elif tp_axes:
                # shard_map TP path: family-specific shuffled layout + TP
                # specs (LSTM: gate shuffle + fused kernels on local layer
                # slices; Conformer: GLU shuffle + head-sharded blocks —
                # parallel/tp.py)
                from ..parallel.tp import (
                    conformer_tp_specs,
                    glu_shuffle_columns,
                    prepare_conformer_tp_weights,
                    prepare_tp_weights,
                    shuffle_gate_columns,
                    tp_param_specs,
                )

                conf = self.prog.tp_family == "conformer"
                if self._multiprocess:
                    m = 1
                    for ax in tp_axes:
                        m *= mesh.shape[ax]
                    ax = tp_axes if len(tp_axes) != 1 else tp_axes[0]
                    if conf:
                        shuffled = glu_shuffle_columns(rt.weights, m)
                        specs_w = conformer_tp_specs(shuffled, ax)
                    else:
                        shuffled = shuffle_gate_columns(rt.weights, m)
                        specs_w = tp_param_specs(shuffled, ax)
                    w_shardings = {
                        k: NamedSharding(mesh, specs_w[k]) for k in shuffled
                    }
                    host_w = {k: np.asarray(v) for k, v in shuffled.items()}
                    self.weights = jax.jit(
                        lambda w: w, out_shardings=w_shardings
                    )(host_w)
                elif conf:
                    self.weights = prepare_conformer_tp_weights(rt.weights, mesh)
                else:
                    self.weights = prepare_tp_weights(rt.weights, mesh)
            elif self._multiprocess:
                # device_put cannot reach non-addressable devices; jit with
                # out_shardings materializes global arrays from (identical)
                # per-host values instead.
                from ..parallel import param_specs

                specs_w = param_specs(rt.weights)
                w_shardings = {
                    k: NamedSharding(mesh, specs_w[k]) for k in rt.weights
                }
                host_w = {k: np.asarray(v) for k, v in rt.weights.items()}
                self.weights = jax.jit(lambda w: w, out_shardings=w_shardings)(
                    host_w
                )
            else:
                self.weights = shard_params(rt.weights, mesh)

            def to_shardings(t):
                # explicit dict walk: PartitionSpec is a tuple subclass, so
                # jax.tree.map would wrongly recurse into the specs themselves
                if isinstance(t, dict):
                    return {k: to_shardings(v) for k, v in t.items()}
                return NamedSharding(mesh, t)

            if self._multiprocess:
                # spec tree from an abstract trace (no host-local state can
                # exist here — its arrays couldn't be device_put cross-host)
                from .step import engine_state_init_fn

                abstract = jax.eval_shape(
                    lambda w: engine_state_init_fn(self.prog, w), self.weights
                )
                specs = state_spec_tree(
                    abstract, data_axis, self.prog.tp_axes,
                    self.prog.tp_family or "lstm",
                )
                self.state = init_engine_state(
                    self.prog, self.weights, out_shardings=to_shardings(specs)
                )
            else:
                state = init_engine_state(self.prog, self.weights)
                specs = state_spec_tree(
                    state, data_axis, self.prog.tp_axes,
                    self.prog.tp_family or "lstm",
                )
                self.state = jax.device_put(state, to_shardings(specs))
            self._audio_sharding = NamedSharding(mesh, P(data_axis))
            if self._multiprocess:
                from ..parallel import local_slot_range

                self._local_rows = local_slot_range(batch, mesh)
        # Reset template: an independent on-device COPY of the fresh state.
        # Aliasing self.state here would hand the template's buffers to the
        # step program's donation (donate_argnums=(1,)) on the first tick —
        # harmless on CPU (no donation support) but a deleted-buffer crash
        # on TPU at the first alloc-after-start.
        self._copy_state = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
        self._init_state = self._copy_state(self.state)
        self.slots: List[Optional[_Slot]] = [None] * batch
        self.max_staged = int(self.cfg.max_buffered_seconds * rt.sample_rate)
        # Realtime-speedup estimate (reference april_session.c:456-462:
        # speed_needed = 0.9*old + 0.1*(1.1*elapsed/audio_ms), EMA'd per
        # inference round — here per engine tick over the batched chunk).
        self._speed_ema = 1.0
        self._lock = threading.Lock()
        # Serializes every device-state transition (step/flush/slot reset):
        # the step program donates the state buffers, so two concurrent
        # executions would race on a deleted buffer. RLock because flush()
        # drains via tick().
        self._step_lock = threading.RLock()

        @jax.jit
        def _reset(state, init_state, idx):
            def reset_leaf(leaf, init_leaf, s_axis):
                sel = (slice(None),) * s_axis + (idx,)
                init_sel = (slice(None),) * s_axis + (0,)
                return leaf.at[sel].set(init_leaf[init_sel])

            out = {}
            for group in ("fbank", "decode"):
                out[group] = {
                    k: reset_leaf(state[group][k], init_state[group][k], 0)
                    for k in state[group]
                }
            out["h"] = reset_leaf(state["h"], init_state["h"], 1)
            out["c"] = reset_leaf(state["c"], init_state["c"], 1)
            return out

        self._reset_jit = _reset

        if mesh is None:
            scrub_shardings = None
        else:
            from jax.sharding import NamedSharding as _NS, PartitionSpec as _P

            # replicated output: every host reads the full [S] verdict, so
            # multi-process scrubs stay in lockstep
            scrub_shardings = _NS(mesh, _P())

        def _bad_slots(state):
            h_ok = jnp.isfinite(state["h"]).all(axis=(0, 2))
            c_ok = jnp.isfinite(state["c"]).all(axis=(0, 2))
            d_ok = jnp.isfinite(state["decode"]["dout"]).all(axis=1)
            return ~(h_ok & c_ok & d_ok)

        self._scrub_jit = jax.jit(_bad_slots, out_shardings=scrub_shardings)

    # -- failure containment ----------------------------------------------

    def _contain(self, exc: Exception, run) -> bool:
        """Per-slot containment of a step/flush failure. With non-donating
        programs (the serving default) the pre-step state survived the failed
        execution, so instead of evicting everyone: scrub the surviving state
        to find poisoned slots (evicting just those), then RETRY the program
        for the healthy sessions — their streams continue exactly as if the
        failure never happened. Falls back to full recovery when the retry
        also fails or when the program donated its state (bench-style
        programs; nothing left to retry on). Returns True when the retry
        produced a result (stored by `run`)."""
        if self.prog.donated:
            self._recover(exc)
            return False
        log.error(
            "engine program failed (%s: %s); scrubbing + retrying",
            type(exc).__name__, exc,
        )
        log.metrics.incr("engine_step_retries")
        try:
            # the scrub itself dispatches a device program — if the original
            # failure was a wedged transport/device it throws too, and must
            # route to full recovery instead of escaping tick() and killing
            # the caller's serving loop
            bad = self._scrub_impl()
            if bad:
                log.warning("containment: evicted %d poisoned slot(s)", len(bad))
            run(bad)
            return True
        except Exception as exc2:  # noqa: BLE001 - any program failure
            self._recover(exc2)
            return False

    def _recover(self, exc: Exception) -> None:
        """Last-resort elastic recovery from a step/flush failure. The
        reference aborts the whole process on any backend error
        (ort_util.h:29-38); here the error is contained to the engine:
        device state is rebuilt from the init template (the failed program
        may have consumed donated state buffers, or the retry after a scrub
        failed too), every live session's handler receives SESSION_ERROR,
        staged audio is dropped, and the engine keeps serving."""
        log.error("engine program failed (%s: %s); recovering", type(exc).__name__, exc)
        log.metrics.incr("engine_recoveries")
        self.state = self._copy_state(self._init_state)
        with self._lock:
            for s in self.slots:
                if s is None:
                    continue
                s.staged = np.zeros(0, np.int16)
                s.was_flushed = False
                s.replayer = EventReplayer(self.rt.params, s.handler)
                log.metrics.incr("sessions_evicted")
                s.handler(RESULT_SESSION_ERROR, [])

    def scrub(self) -> int:
        """Per-slot containment sweep for silent numerical corruption:
        detects non-finite carried state (LSTM h/c, decoder output), resets
        JUST those slots to the init template, and fires SESSION_ERROR to
        their handlers — other sessions are untouched. Returns the number of
        slots evicted. Serving loops may call this periodically; in
        multi-process runs every host must call it in lockstep (the sweep
        and the per-slot resets are collective programs)."""
        return len(self._scrub_impl())

    def _scrub_impl(self) -> list:
        """scrub() body; returns the evicted slot indices."""
        with self._step_lock:
            bad = np.asarray(self._scrub_jit(self.state))
            evicted = []
            for i in np.nonzero(bad)[0]:
                i = int(i)
                s = self.slots[i]
                self._reset_slot_state(i)
                if s is not None:
                    s.staged = np.zeros(0, np.int16)
                    s.was_flushed = False
                    s.replayer = EventReplayer(self.rt.params, s.handler)
                    log.metrics.incr("sessions_evicted")
                    s.handler(RESULT_SESSION_ERROR, [])
                evicted.append(i)
        return evicted

    # -- slot lifecycle ----------------------------------------------------

    def alloc(self, handler: Callable[[int, List[ScalarToken]], None]) -> int:
        """Claim a slot; `handler(result_type, tokens)` receives results."""
        with self._lock:
            for i, s in enumerate(self.slots):
                if s is None:
                    self.slots[i] = _Slot(EventReplayer(self.rt.params, handler), handler)
                    self._reset_slot_state(i)
                    log.metrics.incr("sessions_total")
                    log.metrics.gauge(
                        "sessions_active", sum(x is not None for x in self.slots)
                    )
                    return i
        log.metrics.incr("alloc_rejected")
        raise RuntimeError("no free session slots")

    def free(self, slot: int) -> None:
        with self._lock:
            self.slots[slot] = None
            log.metrics.gauge(
                "sessions_active", sum(x is not None for x in self.slots)
            )

    def _reset_slot_state(self, i: int) -> None:
        """Reset device state for one slot to the initial template (one jitted
        program; the slot index is a traced argument so all slots share it)."""
        with self._step_lock:
            self.state = self._reset_jit(self.state, self._init_state, jnp.int32(i))

    # -- audio path --------------------------------------------------------

    def feed(self, slot: int, pcm16: np.ndarray) -> None:
        """Stage PCM16 samples for a slot (non-blocking)."""
        s = self.slots[slot]
        if s is None:
            raise ValueError(f"slot {slot} not allocated")
        s.was_flushed = False
        with self._lock:
            if len(s.staged) + len(pcm16) > self.max_staged:
                # bounded-buffer overflow (audio_provider.c:59-64)
                s.handler(RESULT_CANT_KEEP_UP, [])
                log.metrics.incr("cant_keep_up")
                log.metrics.incr("samples_dropped", len(pcm16))
                log.warning("slot %d: dropping %d samples (can't keep up)", slot, len(pcm16))
                return
            s.staged = np.concatenate([s.staged, np.asarray(pcm16, np.int16)])

    def pending(self, slot: int) -> int:
        s = self.slots[slot]
        return len(s.staged) if s else 0

    def rt_speedup(self, slot: Optional[int] = None) -> float:
        """Per-session realtime-speedup estimate (the reference's
        aas_realtime_get_speedup telemetry, april_api.h:188-192): how much
        faster than realtime this session's audio must be consumed for the
        engine to keep up. The base is the engine-tick EMA of
        1.1 * tick_time / chunk_time (april_session.c:456-462); a slot with
        a staged backlog additionally has to drain it within the buffer
        bound, so its estimate scales by (1 + backlog/buffer)."""
        v = self._speed_ema
        if slot is not None and 0 <= slot < self.batch:
            s = self.slots[slot]
            if s is not None and self.max_staged > 0:
                v *= 1.0 + len(s.staged) / float(self.max_staged)
        return float(v)

    def tick(self) -> bool:
        """Dispatch one chunk step for all slots with staged audio. Returns
        True if any session had samples to process."""
        chunk = self.cfg.chunk_samples
        audio = np.zeros((self.batch, chunk), np.int16)
        n = np.zeros(self.batch, np.int32)
        with self._lock:
            for i, s in enumerate(self.slots):
                if s is None or len(s.staged) == 0:
                    continue
                take = min(chunk, len(s.staged))
                audio[i, :take] = s.staged[:take]
                s.staged = s.staged[take:]
                n[i] = take
        if not n.any():
            return False

        import time as _time

        t0 = _time.perf_counter()
        with self._step_lock:
            out = {}

            def run(bad=()):
                # evicted slots must not consume the stale chunk the failed
                # step was fed — their streams restarted at SESSION_ERROR
                nn = n
                if len(bad):
                    nn = n.copy()
                    nn[list(bad)] = 0
                out["v"] = self.prog.step(
                    self.weights, self.state, self._put(audio), self._put(nn)
                )

            try:
                run()
            except Exception as e:
                if not self._contain(e, run):
                    return False
            self.state, events = out["v"]
        self._replay(events)
        dt = _time.perf_counter() - t0
        chunk_s = self.cfg.chunk_samples / self.rt.sample_rate
        self._speed_ema = (self._speed_ema * 9.0 + (dt * 1.1) / chunk_s) / 10.0
        log.metrics.observe("tick_latency_s", dt)
        audio_s = float(n.sum()) / self.rt.sample_rate
        log.metrics.incr("audio_seconds", audio_s)
        log.metrics.gauge("rtf", audio_s / dt if dt > 0 else 0.0)
        log.metrics.gauge(
            "staged_depth",
            max((len(s.staged) for s in self.slots if s is not None), default=0),
        )
        return True

    def _put(self, arr):
        """Move a [S, ...] host array to device, sharded over `data` when
        the engine runs on a mesh. In multi-process runs each host supplies
        only the rows of its own slots (`local_slot_range`) — ingest never
        crosses hosts; the global array is assembled from per-process
        shards."""
        if self._audio_sharding is None:
            return jnp.asarray(arr)
        if self._multiprocess:
            lo, hi = self._local_rows
            return jax.make_array_from_process_local_data(
                self._audio_sharding, np.ascontiguousarray(arr[lo:hi]), arr.shape
            )
        return jax.device_put(arr, self._audio_sharding)

    def flush(self, slot_mask: np.ndarray) -> None:
        """Run the flush program for the masked slots (aas_flush semantics:
        drains staged audio first, then pads and finalizes)."""
        with self._step_lock:
            # drain remaining staged audio first
            while any(
                self.slots[i] is not None and len(self.slots[i].staged) > 0
                for i in range(self.batch)
                if slot_mask[i]
            ):
                self.tick()
            for i in range(self.batch):
                if slot_mask[i] and self.slots[i] is not None:
                    if self.slots[i].was_flushed:
                        slot_mask = slot_mask.copy()
                        slot_mask[i] = False  # guard, april_session.c:548-550
                    else:
                        self.slots[i].was_flushed = True
            if not slot_mask.any():
                return
            out = {}

            def run(bad=()):
                m = slot_mask
                if len(bad):
                    m = slot_mask.copy()
                    m[list(bad)] = False
                out["v"] = self.prog.flush(
                    self.weights, self.state, self._put(m)
                )

            try:
                run()
            except Exception as e:
                if not self._contain(e, run):
                    return
            self.state, events = out["v"]
        self._replay(events)

    # -- event replay ------------------------------------------------------

    def _replay(self, packed_events) -> None:
        from .step import PackedEvents

        if self._multiprocess and isinstance(packed_events, PackedEvents):
            # only this host's addressable sub-blobs are readable; each
            # device shard of the blob is one self-describing sub-blob
            # (dedupe model-axis replicas by start offset)
            n = 0
            dense_by_row = None
            seen = set()
            for sh in packed_events.blob.addressable_shards:
                start = sh.index[0].start or 0
                if start in seen:
                    continue
                seen.add(start)
                sub = np.ascontiguousarray(np.asarray(sh.data), np.int32)
                S_loc, K_loc = int(sub[1]), int(sub[2])
                base = (start // sub.shape[0]) * S_loc
                if int(sub[4 : 4 + S_loc].sum()) > K_loc:
                    if dense_by_row is None:
                        dense_by_row = {}
                        for dsh in packed_events.dense.addressable_shards:
                            ds = dsh.index[0].start or 0
                            dense_by_row.setdefault(ds, dsh)
                    log.metrics.incr("event_blob_overflows")
                    n += _replay_dense(
                        np.asarray(dense_by_row[base].data),
                        self.slots[base : base + S_loc],
                    )
                else:
                    n += _replay_blob(sub, self.slots[base : base + S_loc])
        elif self._multiprocess:
            # dense-format programs (GSPMD fallback path): replay this
            # host's addressable row ranges
            by_start = {}
            for sh in packed_events.addressable_shards:
                start = sh.index[0].start or 0
                if start not in by_start:
                    by_start[start] = np.asarray(sh.data)
            starts = sorted(by_start)
            arr = np.concatenate([by_start[s] for s in starts], axis=0)
            off = starts[0]
            n = replay_packed(arr, self.slots[off : off + arr.shape[0]])
        else:
            n = replay_packed(packed_events, self.slots)
        log.metrics.incr("events_replayed", n)
