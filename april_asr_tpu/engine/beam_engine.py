"""Streaming beam-search engine: batched K-hypothesis decode per session.

The reference has greedy only; streaming beam is a framework extension
(SURVEY.md §7 step 7). Same batched layout as the greedy engine
(engine/step.py): ONE jitted program accepts a chunk, drains all fbank
pulls, and for each pull runs up to 3 beam expansion rounds
(decode/beam.py:beam_expand_round — the exact math of the offline search)
with identical-history recombination at pull boundaries. Per-session
hypothesis state lives in HBM as dense [S, K, ...] arrays.

Event contract (beam-specific; the greedy window-op packing cannot express
best-hypothesis rewrites): per pull, the best hypothesis's token window
ships as one int32 row [valid | final | len | time_ms | tok0..tokU-1]; the
host replayer diffs consecutive windows and fires PARTIAL only on change,
FINAL at flush. PARTIAL = best hypothesis prefix, exactly as the offline
beam would report it at that audio position.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..decode.beam import (
    NEG_INF,
    BeamConfig,
    beam_expand_round,
    recombine_identical,
)
from ..decode.scalar import RESULT_FINAL, RESULT_PARTIAL, ScalarToken
from ..frontend.fbank import (
    FbankLayout,
    fbank_accept_batch,
    fbank_advance,
    fbank_flush_pad,
    fbank_init,
    fbank_peek,
)
from ..models.loader import ModelRuntime

# Packed beam event row: [valid, final, len, time_ms, tok0..tok{U-1}]
_HDR = 4


@dataclasses.dataclass
class BeamEngineProgram:
    rt: ModelRuntime
    layout: FbankLayout
    cfg: EngineConfig
    bcfg: BeamConfig
    win: int  # token window capacity shipped per event
    step: Callable  # (weights, state, audio_i16 [S,chunk], n [S]) -> (state, events)
    flush: Callable  # (weights, state, do_flush [S]) -> (state, events)
    batch: int


def build_beam_engine(
    rt: ModelRuntime,
    batch: int,
    cfg: EngineConfig | None = None,
    bcfg: BeamConfig | None = None,
    win: int = 72,  # reference token-window capacity (april_session.h:30)
    mesh=None,
) -> BeamEngineProgram:
    """`mesh` (first axis = data) runs the beam step data-parallel via
    shard_map: every state leaf is [S, ...] (h/c are [L, S, .]) and the step
    has no cross-session math, so sessions shard over the data axis with no
    collectives — same scale path as the greedy engine (engine/step.py).
    Tensor parallelism is not wired for beam: the [S, K]-wide hypothesis
    arrays make S*K the effective batch, so DP over more chips is the
    efficient scale-out; a TP mesh would shard the same matmuls the greedy
    TP path shards but pay K times the per-shard decode glue."""
    cfg = cfg or EngineConfig()
    bcfg = bcfg or BeamConfig()
    layout = FbankLayout.build(rt.fbank_opts, cfg.chunk_samples)
    blank = rt.blank_id
    seg = layout.opts.pull_segment_count
    seg_step = layout.opts.pull_segment_step
    stride = layout.opts.segment_stride_ms
    P = layout.max_pulls_per_step
    S, K = batch, bcfg.beam
    ctx = rt.dims.context

    v_accept = lambda s, w, n: fbank_accept_batch(layout, s, w, n)
    v_peek = jax.vmap(lambda s: fbank_peek(layout, s))
    v_advance = jax.vmap(lambda s, d: fbank_advance(layout, s, d))
    v_flush_pad = jax.vmap(lambda s: fbank_flush_pad(layout, s))

    def beam_pull(weights, fb, h, c, bstate, time_ms):
        # batch from the traced shape, not the closure: under a shard_map
        # DP mesh each shard sees S/n_devices rows
        can = fb["fifo_len"] >= seg
        Sl = can.shape[0]
        x = v_peek(fb)
        time_ms = time_ms + stride * can.astype(jnp.int32)
        eout, h2, c2 = rt.encoder_step(weights, x, h, c)
        m3 = can[None, :, None]
        h = jnp.where(m3, h2, h)
        c = jnp.where(m3, c2, c)

        can_k = jnp.broadcast_to(can[:, None], (Sl, K))
        for _ in range(bcfg.max_symbols_per_frame):
            bstate, can_k = beam_expand_round(
                weights, bstate, eout, can_k, can, rt.decoder_step, rt.joiner,
                blank,
            )
        bstate = recombine_identical(bstate)
        fb = v_advance(fb, can)

        # best-hypothesis window for this pull
        best = jnp.argmax(bstate["scores"], axis=1)  # [S]
        sel = lambda a: jnp.take_along_axis(  # noqa: E731
            a, best.reshape((-1,) + (1,) * (a.ndim - 1)), axis=1
        )[:, 0]
        toks = sel(bstate["tokens"])
        lens = sel(bstate["lengths"])
        # ship the LAST `win` tokens (rolling window like the reference's 72)
        U = toks.shape[1]
        start = jnp.maximum(lens - win, 0)
        posw = jnp.arange(win, dtype=jnp.int32)[None, :]
        idx = jnp.minimum(start[:, None] + posw, U - 1)
        window = jnp.take_along_axis(toks, idx, axis=1)
        wlen = jnp.minimum(lens, win)
        row = jnp.concatenate(
            [
                can.astype(jnp.int32)[:, None],
                jnp.zeros((Sl, 1), jnp.int32),  # final flag (flush sets it)
                wlen[:, None],
                time_ms[:, None],
                window,
            ],
            axis=1,
        )
        return fb, h, c, bstate, time_ms, row

    def step(weights, state, audio_i16, n):
        audio = audio_i16.astype(jnp.float32) / 32768.0
        fb = v_accept(state["fbank"], audio, n)
        h, c, bstate, time_ms = (
            state["h"], state["c"], state["beam"], state["time_ms"]
        )

        def body(carry, _):
            fb, h, c, bstate, time_ms = carry
            fb, h, c, bstate, time_ms, row = beam_pull(
                weights, fb, h, c, bstate, time_ms
            )
            return (fb, h, c, bstate, time_ms), row

        (fb, h, c, bstate, time_ms), rows = jax.lax.scan(
            body, (fb, h, c, bstate, time_ms), None, length=P
        )
        state = {
            "fbank": fb, "h": h, "c": c, "beam": bstate, "time_ms": time_ms,
        }
        return state, jnp.transpose(rows, (1, 0, 2))  # [S, P, HDR+win]

    pad_pull_rounds = ((seg - 1) + 3 * seg) // seg_step + 1
    FLUSH_BLOCK = 3200
    hop = layout.opts.sample_freq * layout.opts.frame_shift_ms // 1000

    def flush(weights, state, do_flush):
        """Drain + pad like the greedy flush (reference _aas_flush phases),
        then emit one FINAL row with the best hypothesis and reset the beam
        state for the flushed sessions."""
        fb, h, c, bstate, time_ms = (
            state["fbank"], state["h"], state["c"], state["beam"],
            state["time_ms"],
        )
        rows_all = []

        def pad_round(carry, _):
            fb, h, c, bstate, time_ms = carry
            padded, did = v_flush_pad(fb)
            do = do_flush & did
            fb = {
                k: jnp.where(_bmask(do, fb[k]), padded[k], fb[k]) for k in fb
            }
            fb_gated = dict(fb)
            fb_gated["fifo_len"] = jnp.where(do, fb["fifo_len"], 0)
            fb2, h, c, bstate, time_ms, row = beam_pull(
                weights, fb_gated, h, c, bstate, time_ms
            )
            fb = {k: jnp.where(_bmask(do, fb[k]), fb2[k], fb[k]) for k in fb}
            return (fb, h, c, bstate, time_ms), row

        def drain_round(carry, _):
            fb, h, c, bstate, time_ms = carry
            fb_gated = dict(fb)
            fb_gated["fifo_len"] = jnp.where(do_flush, fb["fifo_len"], 0)
            fb2, h, c, bstate, time_ms, row = beam_pull(
                weights, fb_gated, h, c, bstate, time_ms
            )
            fb = {
                k: jnp.where(_bmask(do_flush, fb[k]), fb2[k], fb[k])
                for k in fb
            }
            return (fb, h, c, bstate, time_ms), row

        carry = (fb, h, c, bstate, time_ms)
        carry, rA = jax.lax.scan(pad_round, carry, None, length=pad_pull_rounds)
        rows_all.append(rA)
        zeros = jnp.zeros((do_flush.shape[0], layout.chunk), jnp.float32)
        for _ in range(2):
            rem = FLUSH_BLOCK
            while rem > 0:
                take = min(layout.chunk, rem)
                rem -= take
                fb, h, c, bstate, time_ms = carry
                nz = jnp.where(do_flush, take, 0).astype(jnp.int32)
                fb = v_accept(fb, zeros, nz)
                carry = (fb, h, c, bstate, time_ms)
                drain = (take // hop + seg) // seg_step + 1
                carry, rB = jax.lax.scan(drain_round, carry, None, length=drain)
                rows_all.append(rB)
        carry, rC = jax.lax.scan(pad_round, carry, None, length=pad_pull_rounds)
        rows_all.append(rC)
        fb, h, c, bstate, time_ms = carry

        # FINAL row with the best hypothesis, then reset flushed sessions
        best = jnp.argmax(bstate["scores"], axis=1)
        sel = lambda a: jnp.take_along_axis(  # noqa: E731
            a, best.reshape((-1,) + (1,) * (a.ndim - 1)), axis=1
        )[:, 0]
        toks, lens = sel(bstate["tokens"]), sel(bstate["lengths"])
        U = toks.shape[1]
        start = jnp.maximum(lens - win, 0)
        idx = jnp.minimum(
            start[:, None] + jnp.arange(win, dtype=jnp.int32)[None, :], U - 1
        )
        window = jnp.take_along_axis(toks, idx, axis=1)
        frow = jnp.concatenate(
            [
                do_flush.astype(jnp.int32)[:, None],
                do_flush.astype(jnp.int32)[:, None],
                jnp.minimum(lens, win)[:, None],
                time_ms[:, None],
                window,
            ],
            axis=1,
        )[:, None, :]

        fresh = _init_beam(do_flush.shape[0], K, ctx, rt, jnp_weights=weights)
        m2 = do_flush[:, None]
        bstate = {
            "scores": jnp.where(m2, fresh["scores"], bstate["scores"]),
            "context": jnp.where(m2[:, :, None], fresh["context"], bstate["context"]),
            "dout": jnp.where(m2[:, :, None], fresh["dout"], bstate["dout"]),
            "tokens": jnp.where(m2[:, :, None], fresh["tokens"], bstate["tokens"]),
            "lengths": jnp.where(m2, fresh["lengths"], bstate["lengths"]),
        }
        state = {
            "fbank": fb, "h": h, "c": c, "beam": bstate, "time_ms": time_ms,
        }
        rows = jnp.concatenate(
            [jnp.transpose(r, (1, 0, 2)) for r in rows_all] + [frow], axis=1
        )
        return state, rows

    def _bmask(mask, arr):
        return mask.reshape(mask.shape + (1,) * (arr.ndim - 1))

    def _init_beam(S, K, ctx, rt, jnp_weights):
        ctx0 = jnp.full((S, K, ctx), blank, jnp.int32)
        dout0 = rt.decoder_step(jnp_weights, ctx0.reshape(S * K, ctx)).reshape(
            S, K, -1
        )
        return {
            "scores": jnp.concatenate(
                [jnp.zeros((S, 1)), jnp.full((S, K - 1), NEG_INF)], axis=1
            ),
            "context": ctx0,
            "dout": dout0,
            "tokens": jnp.zeros((S, K, bcfg.max_tokens), jnp.int32),
            "lengths": jnp.zeros((S, K), jnp.int32),
        }

    if mesh is None:
        step_c = jax.jit(step, donate_argnums=(1,))
        flush_c = jax.jit(flush, donate_argnums=(1,))
    else:
        from jax.sharding import PartitionSpec as PS

        try:
            from jax import shard_map as _shard_map

            _sm_kwargs = {"check_vma": False}
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map as _shard_map

            _sm_kwargs = {"check_rep": False}

        d_ax = mesh.axis_names[0]
        if batch % mesh.shape[d_ax]:
            raise ValueError(
                f"batch {batch} not divisible by data axis {mesh.shape[d_ax]}"
            )
        state_specs = {
            "fbank": PS(d_ax),
            "h": PS(None, d_ax),
            "c": PS(None, d_ax),
            "beam": PS(d_ax),
            "time_ms": PS(d_ax),
        }
        step_c = jax.jit(
            _shard_map(
                step, mesh=mesh,
                in_specs=(PS(), state_specs, PS(d_ax), PS(d_ax)),
                out_specs=(state_specs, PS(d_ax)),
                **_sm_kwargs,
            ),
            donate_argnums=(1,),
        )
        flush_c = jax.jit(
            _shard_map(
                flush, mesh=mesh,
                in_specs=(PS(), state_specs, PS(d_ax)),
                out_specs=(state_specs, PS(d_ax)),
                **_sm_kwargs,
            ),
            donate_argnums=(1,),
        )

    prog = BeamEngineProgram(
        rt=rt, layout=layout, cfg=cfg, bcfg=bcfg, win=win,
        step=step_c, flush=flush_c, batch=batch,
    )
    prog._init_beam = functools.partial(_init_beam, S, K, ctx, rt)  # type: ignore[attr-defined]
    prog._mesh = mesh  # type: ignore[attr-defined]
    prog._state_specs = None if mesh is None else state_specs  # type: ignore[attr-defined]
    return prog


def init_beam_engine_state(prog: BeamEngineProgram, weights=None) -> Dict:
    rt = prog.rt
    S = prog.batch
    weights = rt.weights if weights is None else weights
    mesh = getattr(prog, "_mesh", None)
    jit_kw = {}
    if mesh is not None:
        from jax.sharding import NamedSharding

        jit_kw["out_shardings"] = jax.tree.map(
            lambda spec: NamedSharding(mesh, spec),
            prog._state_specs,  # type: ignore[attr-defined]
            is_leaf=lambda x: not isinstance(x, dict),
        )

    @functools.partial(jax.jit, **jit_kw)
    def build(w):
        fb = jax.vmap(lambda _: fbank_init(prog.layout))(jnp.arange(S))
        h = jnp.zeros((rt.state_shapes[0][0], S, rt.state_shapes[0][1]), jnp.float32)
        c = jnp.zeros((rt.state_shapes[1][0], S, rt.state_shapes[1][1]), jnp.float32)
        return {
            "fbank": fb,
            "h": h,
            "c": c,
            "beam": prog._init_beam(jnp_weights=w),  # type: ignore[attr-defined]
            "time_ms": jnp.zeros(S, jnp.int32),
        }

    return build(weights)


class BeamReplayer:
    """Host-side replay of beam event rows into PARTIAL/FINAL callbacks.

    Fires PARTIAL whenever the best-hypothesis window changed since the last
    callback; FINAL rows flush the mirror. Token flags (word boundary /
    sentence end) derive from the vocab tables; time_ms is first-seen per
    position (history rewrites refresh the suffix times)."""

    def __init__(self, params, vocab, handler):
        self.params = params
        self.vocab = vocab
        self.handler = handler
        self._last: tuple = ()
        self._times: List[int] = []

    def apply_row(self, row: np.ndarray) -> None:
        valid, final, n, time_ms = int(row[0]), int(row[1]), int(row[2]), int(row[3])
        if not valid:
            return
        toks = tuple(int(t) for t in row[_HDR : _HDR + n])
        # refresh first-seen times: keep times for the unchanged prefix
        keep = 0
        while (
            keep < min(len(toks), len(self._last)) and toks[keep] == self._last[keep]
        ):
            keep += 1
        self._times = self._times[:keep] + [time_ms] * (len(toks) - keep)
        changed = toks != self._last
        self._last = toks
        if final:
            if toks:
                self.handler(RESULT_FINAL, self._materialize(toks))
            self._last = ()
            self._times = []
        elif changed:
            self.handler(RESULT_PARTIAL, self._materialize(toks))

    def _materialize(self, toks) -> List[ScalarToken]:
        out = []
        for i, t in enumerate(toks):
            flags = int(self.vocab.word_boundary[t]) | (
                int(self.vocab.end_sentence[t]) << 1
            )
            out.append(ScalarToken(t, 0.0, flags, self._times[i]))
        return out


def replay_rows(arr: np.ndarray, slots) -> int:
    """Vectorized host replay of a [S, P, HDR+win] row tensor.

    A valid, non-final row whose (len, window) equals the previous valid
    row's is a guaranteed no-op in BeamReplayer.apply_row (the window
    didn't change, so neither callbacks nor first-seen times move) — the
    numpy prefilter drops those WITHOUT entering Python, cutting the
    per-step host loop from S*P apply_row calls to roughly the number of
    actual window changes (bench: wall step 433 -> 403 ms at S=512,
    beam=4, 1 s chunks; the remaining wall-vs-device gap is the dense row
    readback, not host replay). Returns the number of valid rows (the
    event-rate denominator), not the number applied.
    """
    arr = np.asarray(arr)
    valid = arr[:, :, 0] != 0
    final = arr[:, :, 1] != 0
    n = arr[:, :, 2]
    toks = arr[:, :, _HDR:]
    same_as_prev = np.zeros_like(valid)
    if arr.shape[1] > 1:
        same_as_prev[:, 1:] = (
            (n[:, 1:] == n[:, :-1])
            & (toks[:, 1:] == toks[:, :-1]).all(-1)
            & valid[:, :-1]
        )
    apply_mask = valid & (final | ~same_as_prev)
    for s, p in np.argwhere(apply_mask):
        slot = slots[s]
        if slot is not None:
            slot.apply_row(arr[s, p])
    return int(valid.sum())


class BeamEngine:
    """S-session streaming beam engine (host loop mirrors BatchEngine)."""

    def __init__(
        self,
        rt: ModelRuntime,
        batch: int = 8,
        cfg: EngineConfig | None = None,
        bcfg: BeamConfig | None = None,
        prog: Optional[BeamEngineProgram] = None,
        mesh=None,
    ):
        self.rt = rt
        self.prog = prog or build_beam_engine(rt, batch, cfg, bcfg, mesh=mesh)
        self.cfg = self.prog.cfg
        self.batch = batch
        self.weights = rt.weights
        self.state = init_beam_engine_state(self.prog)
        self._init_state = jax.jit(lambda t: jax.tree.map(jnp.copy, t))(self.state)
        self.slots: List[Optional[BeamReplayer]] = [None] * batch
        self._staged: List[np.ndarray] = [np.zeros(0, np.int16)] * batch

    def alloc(self, handler) -> int:
        for i, s in enumerate(self.slots):
            if s is None:
                self.slots[i] = BeamReplayer(self.rt.params, self.rt.vocab, handler)
                self._staged[i] = np.zeros(0, np.int16)
                return i
        raise RuntimeError("no free beam session slots")

    def free(self, slot: int) -> None:
        self.slots[slot] = None

    def feed(self, slot: int, pcm16: np.ndarray) -> None:
        self._staged[slot] = np.concatenate(
            [self._staged[slot], np.asarray(pcm16, np.int16)]
        )

    def pending(self, slot: int) -> int:
        return len(self._staged[slot])

    def tick(self) -> bool:
        chunk = self.cfg.chunk_samples
        audio = np.zeros((self.batch, chunk), np.int16)
        n = np.zeros(self.batch, np.int32)
        for i in range(self.batch):
            if self.slots[i] is None or len(self._staged[i]) == 0:
                continue
            take = min(chunk, len(self._staged[i]))
            audio[i, :take] = self._staged[i][:take]
            self._staged[i] = self._staged[i][take:]
            n[i] = take
        if not n.any():
            return False
        self.state, rows = self.prog.step(
            self.weights, self.state, jnp.asarray(audio), jnp.asarray(n)
        )
        self._replay(rows)
        return True

    def flush(self, slot_mask: np.ndarray) -> None:
        while any(
            self.slots[i] is not None and len(self._staged[i]) > 0
            for i in range(self.batch)
            if slot_mask[i]
        ):
            self.tick()
        self.state, rows = self.prog.flush(
            self.weights, self.state, jnp.asarray(slot_mask)
        )
        self._replay(rows)

    def _replay(self, rows) -> None:
        replay_rows(np.asarray(rows), self.slots)
