"""Fused batched engine step: audio chunk -> fbank -> encoder -> decode events.

This is the TPU replacement for the reference's per-session synchronous loop
(_aas_feed_pcm16 -> fbank_accept_waveform -> aas_infer,
src/april_session.c:501-533 and :431-476): ONE jitted XLA program advances ALL
sessions by one audio chunk — feature extraction as batched FFT+matmul, the
pull loop as a lax.scan with masked per-session participation, the ≤3-symbol
inner decode loop unrolled with done-masks, and all handler-visible actions
emitted as event records for host replay. The flush program reproduces
_aas_flush (:547-564) as fixed-bound masked rounds.

Shapes are static everywhere: sessions that can't pull this round are masked,
not skipped — the classic SIMD-ification of RNN-T greedy decode (SURVEY.md §7
"hard parts").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DecodeConfig, EngineConfig
from ..decode import events as ev
from ..decode.greedy import (
    decode_step,
    decode_step_pre,
    init_decode_state,
    vocab_tables_device,
)
from ..frontend.fbank import (
    FbankLayout,
    fbank_accept_batch,
    fbank_advance,
    fbank_advance_n,
    fbank_flush_pad,
    fbank_front,
    fbank_front_batch,
    fbank_init,
    fbank_peek,
)
from ..models.loader import ModelRuntime

INNER_STEPS_EMIT = (1.0, 0.0, 0.0)  # early-emit ramp (april_session.c:449-453)

# Device->host event transfer. Two representations are built per step:
#
# DENSE tensor [S, R, 2*I + 1] int32 (R = pulls/rounds this program runs):
#   cols [0, I)    word0 = ops(7b) | flags(2b)<<7 | final_k(7b)<<9 | tok(14b)<<16
#       (ops fit 7 bits by events.py; final_k <= 72-token window; token ids
#        < 16384 per the reference's params validation, src/params.c:76)
#   cols [I, 2I)   float32 logprob bitcast to int32 (exact)
#   col  2I        pull time_ms (identical for a pull's inner cells)
#
# COMPACT blob, ONE int32 vector — the array the host actually reads every
# tick. ~96% of dense cells are zeros (a saturated real-speech stream emits
# ~0.5 events per pull), so the cells are compacted device-side, in (session,
# round, inner-step) order, into a bounded list; the dense tensor stays on
# device and is only transferred when the list overflows (rare; correctness
# never depends on the budget). Per-shard layout (self-describing, so a
# sharded global blob is just sub-blobs back to back):
#   [0]            BLOB_MAGIC
#   [1]            S     sessions in this sub-blob
#   [2]            K     cell capacity (S * per-session budget)
#   [3]            stride_ms
#   [4,      4+S)  per-session event count (sum > K signals overflow)
#   [4+S,   4+2S)  per-session time_ms at program entry (cell dt base)
#   [.., +K)       cell word0 (same bit layout as dense)
#   [.., +K)       cell logprob, f32 bitcast (exact)
#   [.., +K/4)     cell dt in stride units, u8 x4 per word, little-endian
#                  (cell time_ms = base_time[s] + dt * stride_ms)
# Cells carry no session id: spans are recovered from the counts (cells are
# emitted session-major). Blob bytes = 16 + 8*S + 9*K vs dense 28*S*R —
# ~5x smaller at the default budget, independent of activity.
BLOB_MAGIC = 0x41505234  # "APR4"
BLOB_HEADER = 4


def events_budget(rounds: int, cfg_budget: int = 0) -> int:
    """Per-session compact-cell budget for a program with `rounds` pulls."""
    if cfg_budget > 0:
        return cfg_budget
    return max(8, -(-rounds * 3 // 5))  # ceil(0.6 * rounds)


def pack_events(
    events: Dict[str, jnp.ndarray],
    base_time: jnp.ndarray,
    stride_ms: int,
    budget: int = 0,
) -> "PackedEvents":
    word0 = (
        events["ops"].astype(jnp.int32)
        | (events["flags"].astype(jnp.int32) << 7)
        | (events["final_k"].astype(jnp.int32) << 9)
        | (events["tok"].astype(jnp.int32) << 16)
    )
    lp = jax.lax.bitcast_convert_type(events["logprob"], jnp.int32)
    time = events["time_ms"][:, :, :1].astype(jnp.int32)
    dense = jnp.concatenate([word0, lp, time], axis=2)

    S, R, I = word0.shape
    if R > 255:
        raise ValueError(f"{R} rounds overflow the 8-bit cell dt (max 255)")
    N = R * I
    E = events_budget(R, budget)
    K = S * E
    base_time = base_time.astype(jnp.int32)

    opsf = events["ops"].reshape(S, N)
    mask = opsf != 0
    # rank of each cell within its session (stable: (round, inner) order)
    midx = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    counts = jnp.sum(mask, axis=1).astype(jnp.int32)  # [S]

    # srcn[s, e] = flat cell index of the e-th event of session s
    e_ids = jnp.arange(N, dtype=jnp.int32)
    oh = (midx[:, :, None] == e_ids[None, None, :]) & mask[:, :, None]
    srcn = jnp.sum(
        jnp.where(oh, e_ids[None, :, None], 0), axis=1, dtype=jnp.int32
    )  # [S, N]

    # global destination k -> (session, within-session rank) via the counts
    # prefix sums (no scatter: TPU-friendly compare-reduce + gathers)
    cum = jnp.cumsum(counts)
    k_ids = jnp.arange(K, dtype=jnp.int32)
    ge = k_ids[:, None] >= cum[None, :]  # [K, S]
    s_k = jnp.minimum(jnp.sum(ge, axis=1, dtype=jnp.int32), S - 1)
    off_k = jnp.sum(jnp.where(ge, counts[None, :], 0), axis=1, dtype=jnp.int32)
    j_k = jnp.clip(k_ids - off_k, 0, N - 1)
    n_k = jnp.take(srcn.reshape(-1), s_k * N + j_k, mode="clip")
    src = s_k * N + n_k

    dt = (
        (events["time_ms"].astype(jnp.int32) - base_time[:, None, None])
        // jnp.int32(stride_ms)
    ).reshape(S * N)
    w0_k = jnp.take(word0.reshape(-1), src, mode="clip")
    lp_k = jnp.take(lp.reshape(-1), src, mode="clip")
    dt_k = jnp.clip(jnp.take(dt, src, mode="clip"), 0, 255)
    Kp = -(-K // 4) * 4
    dt_p = jnp.pad(dt_k, (0, Kp - K)).reshape(Kp // 4, 4)
    dt_w = dt_p[:, 0] | (dt_p[:, 1] << 8) | (dt_p[:, 2] << 16) | (dt_p[:, 3] << 24)

    header = jnp.array([BLOB_MAGIC, S, K, stride_ms], jnp.int32)
    blob = jnp.concatenate([header, counts, base_time, w0_k, lp_k, dt_w])
    return PackedEvents(blob=blob, dense=dense)


class PackedEvents(NamedTuple):
    """Step/flush event outputs: the compact `blob` (read every tick) and
    the `dense` tensor (device-resident overflow fallback)."""

    blob: jnp.ndarray
    dense: jnp.ndarray


def unpack_events_np(packed) -> Dict[str, np.ndarray]:
    """Dense-tensor unpack (accepts a PackedEvents or a raw dense array)."""
    if isinstance(packed, PackedEvents):
        packed = packed.dense
    arr = np.asarray(packed)
    I = (arr.shape[2] - 1) // 2
    w = arr[:, :, :I]
    return {
        "ops": w & 0x7F,
        "flags": (w >> 7) & 0x3,
        "final_k": (w >> 9) & 0x7F,
        "tok": (w >> 16) & 0x3FFF,
        "logprob": np.ascontiguousarray(arr[:, :, I : 2 * I]).view(np.float32),
        "time_ms": arr[:, :, 2 * I],
    }


def iter_blobs(arr: np.ndarray):
    """Split a (possibly multi-shard) host copy of the blob vector into
    per-shard sub-blob views. Yields (slot_base, sub_blob) with slot_base
    the first session row the sub-blob covers."""
    pos = 0
    base = 0
    n = arr.shape[0]
    while pos < n:
        if arr[pos] != BLOB_MAGIC:
            raise ValueError(f"bad event blob magic at {pos}: {arr[pos]:#x}")
        S = int(arr[pos + 1])
        K = int(arr[pos + 2])
        size = BLOB_HEADER + 2 * S + 2 * K + (-(-K // 4))
        yield base, arr[pos : pos + size]
        pos += size
        base += S


def unpack_blob_np(sub: np.ndarray) -> Dict[str, np.ndarray]:
    """Decode one sub-blob into per-cell arrays (host-side, little-endian)."""
    S, K, stride = int(sub[1]), int(sub[2]), int(sub[3])
    o = BLOB_HEADER
    counts = sub[o : o + S]
    base_time = sub[o + S : o + 2 * S]
    w0 = sub[o + 2 * S : o + 2 * S + K]
    lp = np.ascontiguousarray(sub[o + 2 * S + K : o + 2 * S + 2 * K]).view(
        np.float32
    )
    dt = np.ascontiguousarray(sub[o + 2 * S + 2 * K :]).view(np.uint8)[:K]
    total = int(counts.sum())
    sess = np.repeat(np.arange(S), counts) if total <= K else None
    return {
        "S": S,
        "K": K,
        "stride": stride,
        "counts": counts,
        "base_time": base_time,
        "total": total,
        "overflow": total > K,
        "session": sess,
        "ops": w0 & 0x7F,
        "flags": (w0 >> 7) & 0x3,
        "final_k": (w0 >> 9) & 0x7F,
        "tok": (w0 >> 16) & 0x3FFF,
        "logprob": lp,
        "dt": dt,
    }


def _empty_pull_events(S: int) -> Dict[str, jnp.ndarray]:
    z = jnp.zeros((S, len(INNER_STEPS_EMIT)), jnp.int32)
    return {
        "ops": z,
        "tok": z,
        "logprob": jnp.zeros_like(z, jnp.float32),
        "flags": z,
        "time_ms": z,
        "final_k": z,
    }


@dataclasses.dataclass
class EngineProgram:
    """Compiled batched programs for one model + chunk configuration."""

    rt: ModelRuntime
    layout: FbankLayout
    cfg: EngineConfig
    dcfg: DecodeConfig
    step: Callable  # (weights, state, audio_i16 [S,chunk], n [S]) -> (state, events)
    flush: Callable  # (weights, state, do_flush [S]) -> (state, events)
    batch: int
    # shard_map TP model axes (None = DP-only or GSPMD path). When set, the
    # engine runs the explicit tensor-parallel kernel path and weights must
    # be placed with parallel.tp.prepare_tp_weights (LSTM) /
    # prepare_conformer_tp_weights (Conformer); the cell state c is sharded
    # over these axes (Conformer: the KV-ring state h too).
    tp_axes: tuple | None = None
    # which family's TP layout is active: "lstm" | "conformer" | None
    tp_family: str | None = None
    # Whether step/flush donate the state buffers. Donation saves the output
    # allocation + pass-through copies (the bench's dispatch loop uses it),
    # but a FAILED execution leaves donated inputs unusable — so the serving
    # engine builds with donate=False, which is what makes per-slot failure
    # containment possible (BatchEngine retries the step on the surviving
    # pre-step state instead of evicting every session).
    donated: bool = True

    @property
    def stride_ms(self) -> int:
        return self.layout.opts.segment_stride_ms


def init_engine_state(prog: EngineProgram, weights=None, out_shardings=None) -> Dict:
    """Fresh state for `prog.batch` sessions. The decoder is primed with the
    all-blank context (equivalent to the reference's first-infer priming,
    april_session.c:432-438). Jitted as one program — eager init would pay
    one backend round-trip per op on remote TPU backends.

    `out_shardings` (a pytree of NamedSharding matching the state tree)
    materializes the state directly as global sharded arrays — required in
    multi-process runs, where a host-local build followed by device_put
    cannot reach non-addressable devices."""
    weights = prog.rt.weights if weights is None else weights
    build = functools.partial(engine_state_init_fn, prog)
    return jax.jit(build, out_shardings=out_shardings)(weights)


def engine_state_init_fn(prog: EngineProgram, w) -> Dict:
    """Pure state-init body (also traced abstractly by the multi-process
    engine to derive the state spec tree before any array exists)."""
    rt = prog.rt
    S = prog.batch
    fb = jax.vmap(lambda _: fbank_init(prog.layout))(jnp.arange(S))
    dims = rt.dims
    dstate = init_decode_state(
        S, dims.context, max(dims.joiner_dim, 1), rt.blank_id, prog.dcfg
    )
    dstate["dout"] = rt.decoder_step(w, dstate["context"])
    dstate["dout_init"] = jnp.ones(S, bool)
    h = jnp.zeros((rt.state_shapes[0][0], S, rt.state_shapes[0][1]), jnp.float32)
    c = jnp.zeros((rt.state_shapes[1][0], S, rt.state_shapes[1][1]), jnp.float32)
    return {"fbank": fb, "h": h, "c": c, "decode": dstate}


def build_engine(
    rt: ModelRuntime,
    batch: int,
    cfg: EngineConfig | None = None,
    dcfg: DecodeConfig | None = None,
    mesh=None,
    donate: bool = True,
) -> EngineProgram:
    """`mesh` builds the programs for multi-chip serving. Sessions are
    independent, so the data-parallel case maps onto `shard_map` over the
    data axis — each shard runs the full fused step locally, Pallas kernels
    included (GSPMD cannot partition a pallas_call, but shard_map bodies are
    per-device programs, so the fused LSTM/joiner kernels survive).

    Tensor parallelism (model axis > 1) ALSO runs as shard_map for the
    native LSTM family: each device's weight slice is a self-contained
    smaller LSTMP layer (gate-shuffled layout, parallel/tp.py), the local
    compute runs the TP Pallas kernels — int8 quantized serving included —
    and the two per-layer partial sums cross the model axis as explicit
    psums (models/lstm_transducer._lstm_stack_step_tp). Weights must be
    placed with parallel.tp.prepare_tp_weights (BatchEngine does). Only
    model families without a TP kernel path (ONNX interpreter, Conformer)
    fall back to GSPMD partitioning with the pure-XLA compute paths."""
    cfg = cfg or EngineConfig()
    dcfg = dcfg or DecodeConfig()

    tp_axes = None
    tp_family = None
    pp_mesh = mesh is not None and "stage" in mesh.axis_names
    if pp_mesh:
        # Pipeline-parallel serving surface: a mesh with a `stage` axis
        # routes the encoder through parallel/pipeline.py — the L layers
        # split into contiguous slabs over the stages and a chunk's pulls
        # flow through them as microbatches over ppermute (the TPU-native
        # generalization of the reference's sequential 3-network pipeline,
        # april_session.c:447-454). The WHOLE step runs under one shard_map
        # over the mesh (like the TP path): each stage's slab executes the
        # fused Pallas kernels on its local layers, and the replicated
        # parts (fbank, decode) run identically on every stage shard —
        # deterministic, so event outputs agree across stages.
        from ..models.lstm_transducer import _mm, conv_subsample
        from ..parallel.pipeline import STACKED_KEYS, stage_chunk_body

        if rt.kind != "native" or "w_ih_t" not in rt.weights:
            raise ValueError(
                "pipeline-stage meshes support the native LSTM family"
            )
        ns = mesh.shape["stage"]
        if rt.dims.layers % ns:
            raise ValueError(
                f"{rt.dims.layers} layers not divisible by {ns} stages"
            )

        def _pp_slab(w):
            keys = [k for k in w if k in STACKED_KEYS
                    or (k.endswith("_q8") and k[:-3] in STACKED_KEYS)
                    or (k.endswith("_q8s") and k[:-4] in STACKED_KEYS)]
            return {k: w[k] for k in keys}

        def pp_chunk_inner(w, y0, h, c, can):
            ys, h2, c2 = stage_chunk_body(
                _pp_slab(w), y0, can, h, c, "stage", ns, use_pallas=True
            )
            eouts = _mm(ys, w["enc_proj_t"]) + w["enc_proj_b"].astype(
                jnp.float32
            )
            return eouts, h2, c2

        def pp_step_inner(w, x, h, c):
            y0 = conv_subsample(w, x)[:, 0, :][None]  # [1, S, d]
            can1 = jnp.ones((1, x.shape[0]), bool)
            ys, h2, c2 = stage_chunk_body(
                _pp_slab(w), y0, can1, h, c, "stage", ns, use_pallas=True
            )
            eout = _mm(ys[0], w["enc_proj_t"]) + w["enc_proj_b"].astype(
                jnp.float32
            )
            return eout, h2, c2

        rt = dataclasses.replace(
            rt,
            encoder_step=pp_step_inner,
            encoder_chunk=pp_chunk_inner,
            encoder_chunk_max_pulls=None,
        )
        tp_family = "pipeline"
    if mesh is not None and not pp_mesh and len(mesh.axis_names) > 1:
        model_axes = tuple(mesh.axis_names[1:])
        model_size = 1
        for ax in model_axes:
            model_size *= mesh.shape[ax]
        if model_size > 1 and rt.kind == "native" and "att_q" in rt.weights:
            # Conformer family: head-sharded attention + column/row-sharded
            # FF/conv with explicit psums (models/conformer.py axis= path).
            # Each shard carries its own heads' KV rings and conv channels,
            # so BOTH state arrays shard over the model axis; the conv
            # state row pads to (k-1)*d + m ints (one position counter per
            # shard — they advance in lockstep).
            from ..parallel.tp import conformer_tp_eligible

            if conformer_tp_eligible(rt.weights, rt.dims, model_size):
                from ..models.conformer import (
                    conformer_encoder_chunk,
                    conformer_encoder_recurrent,
                    conformer_encoder_step,
                )

                axis = model_axes if len(model_axes) > 1 else model_axes[0]
                dims = rt.dims
                d, k = dims.d_model, dims.conv_kernel
                rt = dataclasses.replace(
                    rt,
                    encoder_step=lambda w, x, h, c: conformer_encoder_step(
                        w, x, h, c, dims, axis=axis
                    ),
                    encoder_recurrent=lambda w, y, h, c, gate=None: (
                        conformer_encoder_recurrent(
                            w, y, h, c, dims, gate, axis=axis
                        )
                    ),
                    encoder_chunk=lambda w, y, h, c, can: (
                        conformer_encoder_chunk(w, y, h, c, dims, can, axis=axis)
                    ),
                    state_shapes=(
                        rt.state_shapes[0],
                        (dims.layers, (k - 1) * d + model_size),
                    ),
                )
                tp_axes = model_axes
                tp_family = "conformer"
        elif model_size > 1 and rt.kind == "native":
            from ..parallel.tp import tp_shard_map_eligible

            H = rt.state_shapes[1][1]
            F = rt.weights["ff1_t"].shape[2] if "ff1_t" in rt.weights else 0
            if (
                tp_shard_map_eligible(rt.weights, rt.dims)
                and H % model_size == 0
                and F % model_size == 0
            ):
                from ..models.lstm_transducer import (
                    encoder_recurrent_tp,
                    encoder_step_tp,
                )

                axis = model_axes if len(model_axes) > 1 else model_axes[0]
                rt = dataclasses.replace(
                    rt,
                    encoder_step=lambda w, x, h, c: encoder_step_tp(
                        w, x, h, c, axis
                    ),
                    encoder_recurrent=lambda w, y, h, c, gate=None: (
                        encoder_recurrent_tp(w, y, h, c, axis, gate)
                    ),
                    # per-pull recurrent path: the whole-chunk kernel cannot
                    # contain the per-timestep psums
                    encoder_chunk=None,
                    encoder_chunk_max_pulls=None,
                )
                tp_axes = model_axes
                tp_family = "lstm"
    layout = FbankLayout.build(rt.fbank_opts, cfg.chunk_samples)
    vt = vocab_tables_device(rt.vocab)
    blank = rt.blank_id
    stride = layout.opts.segment_stride_ms
    seg = layout.opts.pull_segment_count
    P = layout.max_pulls_per_step

    # int8-serving engines run the frontend DFT on the int8 MXU path too:
    # its 7.7e-4 worst-case log-mel error is below the bf16 cast the
    # encoder applies to these rows (ops/fbank_pallas._buf_kernel_i8).
    # APRIL_FBANK_DFT overrides: "exact" forces the bf16x3 kernel (used by
    # tests that compare pallas-on vs pallas-off decode streams, where the
    # frontends must match), "i8" forces the int8 path.
    import os as _os

    _dft_mode = _os.environ.get("APRIL_FBANK_DFT", "auto")
    _dft_i8 = _dft_mode == "i8" or (
        _dft_mode == "auto"
        and isinstance(rt.weights, dict)
        and any(str(k).endswith("_q8") for k in rt.weights)
    )
    v_accept = lambda s, w, n: fbank_accept_batch(layout, s, w, n, dft_i8=_dft_i8)
    v_peek = jax.vmap(lambda s: fbank_peek(layout, s))
    v_advance = jax.vmap(lambda s, d: fbank_advance(layout, s, d))
    v_flush_pad = jax.vmap(lambda s: fbank_flush_pad(layout, s))

    def pull_once(weights, fb, h, c, dstate):
        """One fbank pull + encoder step + masked inner decode loop.

        Returns updated states and a [S, 3] event group.
        """
        can = fb["fifo_len"] >= seg
        x = v_peek(fb)  # [S, seg, mel]
        dstate = dict(dstate)
        dstate["time_ms"] = dstate["time_ms"] + stride * can.astype(jnp.int32)

        eout, h2, c2 = rt.encoder_step(weights, x, h, c)
        m3 = can[None, :, None]
        h = jnp.where(m3, h2, h)
        c = jnp.where(m3, c2, c)

        dstate, events = inner_decode(weights, eout, can, dstate)
        fb = v_advance(fb, can)
        return fb, h, c, dstate, events

    def inner_decode(weights, eout, can, dstate):
        """The <=3-symbol masked inner loop for one pull (shared by both
        step paths and the flush path). Native joiners use the fused
        joiner+argmax prologue so the [S, vocab] logits never leave VMEM
        (this loop runs up to 3x per pull for every session)."""
        done = ~can
        evts = []
        for ee in INNER_STEPS_EMIT:
            if rt.decoder_joiner_argmax is not None:
                # lazy-dout path: the dout refresh owed from the previous
                # iteration (need_dec) fuses with this iteration's joiner +
                # argmax into ONE kernel — same values, same context, two
                # fewer op groups per iteration (x75 per 1 s chunk)
                mi, mv, bv, dout = rt.decoder_joiner_argmax(
                    weights, dstate["context"], dstate["need_dec"],
                    dstate["dout"], eout,
                )
                dstate["dout"] = dout
                dstate, evt, is_blank, need_dec = decode_step_pre(
                    dstate, mi, mv, bv, ~done, ee, blank, vt, dcfg
                )
                dstate["need_dec"] = need_dec
            elif rt.joiner_argmax is not None:
                mi, mv, bv = rt.joiner_argmax(weights, eout, dstate["dout"])
                dstate, evt, is_blank, need_dec = decode_step_pre(
                    dstate, mi, mv, bv, ~done, ee, blank, vt, dcfg
                )
                new_dout = rt.decoder_step(weights, dstate["context"])
                dstate["dout"] = jnp.where(
                    need_dec[:, None], new_dout, dstate["dout"]
                )
            else:
                logits = rt.joiner(weights, eout, dstate["dout"])
                dstate, evt, is_blank, need_dec = decode_step(
                    dstate, logits, ~done, ee, blank, vt, dcfg
                )
                new_dout = rt.decoder_step(weights, dstate["context"])
                dstate["dout"] = jnp.where(
                    need_dec[:, None], new_dout, dstate["dout"]
                )
            done = done | is_blank
            evts.append(evt)
        events = {k: jnp.stack([e[k] for e in evts], axis=1) for k in evts[0]}
        return dstate, events

    def _try_chunk_decode(weights, eouts, can, dstate):
        """Whole-chunk fused decode (ops/decode_pallas.py): the entire
        P-pull x <=3-round inner decode — heuristics included — in ONE
        pallas_call, replacing ~180 op launches per pull of scan glue
        (~12.5 ms of the S=4096 step; tools/profile_xplane.py `while`).
        Returns None when the kernel is off or the geometry/weights don't
        support it (the scan fallback below is the reference semantics)."""
        from ..ops.dispatch import pallas_wanted as _pw

        if not _pw() or rt.decoder_joiner_argmax is None:
            return None
        if not isinstance(weights, dict) or "dec_table" not in weights:
            return None
        from ..ops.decode_pallas import chunk_decode_fused, chunk_decode_supported

        P_, S, J = eouts.shape
        d = weights["dec_table"].shape[2]
        V = weights["join_t"].shape[1]
        block_s = next((b for b in (512, 256, 128) if S % b == 0), 0)
        if not block_s or not chunk_decode_supported(
            S, J, d, rt.dims.context, V, block_s
        ):
            return None
        cfg_key = (
            float(dcfg.punctuation_margin),
            float(dcfg.confident_margin),
            float(dcfg.confident_logprob_penalty),
            float(dcfg.long_silence_ms),
            float(dcfg.silence_decay_ms),
            int(dcfg.max_active_tokens),
        )
        return chunk_decode_fused(
            eouts, can, dstate,
            weights["dec_table"], weights["dec_proj_t"], weights["dec_proj_b"],
            weights["join_t"], weights["join_b"], vt["mask"],
            blank_id=blank, stride_ms=int(stride),
            emit_ramp=INNER_STEPS_EMIT, cfg_key=cfg_key,
            block_s=block_s, interpret=jax.default_backend() != "tpu",
        )

    def step_body(weights, state, audio_f32, n):
        """Accept one chunk then drain all pulls (aas_infer's while loop).

        Fast path (native models with a split encoder): ONE ring read
        materializes every pull's window, ONE batched conv embeds all of
        them, and the per-pull scan only carries the recurrent LSTM state +
        decode — the FIFO is read/advanced once per step instead of once
        per pull.
        """
        fb = v_accept(state["fbank"], audio_f32, n)
        h, c, dstate = state["h"], state["c"], state["decode"]

        if rt.encoder_embed is None:
            def scan_body(carry, _):
                fb, h, c, dstate = carry
                fb, h, c, dstate, events = pull_once(weights, fb, h, c, dstate)
                return (fb, h, c, dstate), events

            (fb, h, c, dstate), events = jax.lax.scan(
                scan_body, (fb, h, c, dstate), None, length=P
            )
        else:
            S = n.shape[0]
            step_rows = layout.opts.pull_segment_step
            W = (P - 1) * step_rows + seg
            front = fbank_front_batch(layout, fb, W)  # [S, W, mel]
            can = fb["fifo_len"][None, :] >= (
                seg + step_rows * jnp.arange(P, dtype=jnp.int32)[:, None]
            )  # [P, S]
            y0 = None
            if rt.encoder_embed_front is not None:
                # fused whole-front embed: no stacked-window tensor, no XLA
                # conv relayouts (ops/conv_embed_pallas.py); returns None
                # when the kernel is off or the geometry is unsupported
                y0 = rt.encoder_embed_front(weights, front, P, step_rows)
            if y0 is None:
                windows = jnp.stack(
                    [front[:, i * step_rows : i * step_rows + seg] for i in range(P)]
                )  # [P, S, seg, mel]
                y0 = rt.encoder_embed(
                    weights, windows.reshape(P * S, seg, windows.shape[-1])
                ).reshape(P, S, -1)

            use_chunk = rt.encoder_chunk is not None and (
                rt.encoder_chunk_max_pulls is None or P <= rt.encoder_chunk_max_pulls
            )
            if rt.encoder_chunk is not None and not use_chunk:
                from ..utils import logging as _log

                # visible, not silent: large chunks on attention models drop
                # to the slower per-pull recurrent path when P exceeds the
                # attention context (VERDICT: this fallback must be loggable)
                _log.warning(
                    "engine: chunk of %d pulls exceeds encoder_chunk_max_pulls"
                    "=%d; using the per-pull recurrent path (slower). Reduce "
                    "chunk_samples or raise the attention context.",
                    P, rt.encoder_chunk_max_pulls,
                )
            if use_chunk:
                # non-frame-recurrent encoder (Conformer family): every pull
                # advances through each layer in ONE pass — one KV-ring
                # read/write per layer per step instead of per pull — and the
                # per-pull scan carries only the decode state
                eouts, h, c = rt.encoder_chunk(weights, y0, h, c, can)

                fused = _try_chunk_decode(weights, eouts, can, dstate)
                if fused is not None:
                    dstate, events = fused
                else:
                    def scan_body(dstate, xs):
                        eout_i, can_i = xs
                        dstate = dict(dstate)
                        dstate["time_ms"] = dstate["time_ms"] + stride * can_i.astype(
                            jnp.int32
                        )
                        dstate, events = inner_decode(weights, eout_i, can_i, dstate)
                        return dstate, events

                    dstate, events = jax.lax.scan(scan_body, dstate, (eouts, can))
            else:
                def scan_body(carry, xs):
                    h, c, dstate = carry
                    y0_i, can_i = xs
                    dstate = dict(dstate)
                    dstate["time_ms"] = dstate["time_ms"] + stride * can_i.astype(
                        jnp.int32
                    )
                    # the pull mask gates the h/c update inside the encoder
                    # (no separate [L, S, .] select pass over the state arrays)
                    eout, h, c = rt.encoder_recurrent(weights, y0_i, h, c, can_i)
                    dstate, events = inner_decode(weights, eout, can_i, dstate)
                    return (h, c, dstate), events

                (h, c, dstate), events = jax.lax.scan(
                    scan_body, (h, c, dstate), (y0, can)
                )
            n_pulled = jnp.clip(
                (fb["fifo_len"] - seg) // step_rows + 1, 0, P
            )
            fb = jax.vmap(lambda s, k: fbank_advance_n(layout, s, k))(fb, n_pulled)

        # events leaves: [P, S, 3] -> [S, P, 3]
        events = {k: jnp.transpose(v, (1, 0, 2)) for k, v in events.items()}
        new_state = {"fbank": fb, "h": h, "c": c, "decode": dstate}
        packed = pack_events(
            events, state["decode"]["time_ms"], stride, cfg.events_per_session
        )
        return new_state, packed

    def step(weights, state, audio_i16, n):
        audio = audio_i16.astype(jnp.float32) / 32768.0  # april_session.c:520-522
        return step_body(weights, state, audio, n)

    def flush_round(weights, carry, _):
        """One `while fbank_flush: aas_infer` round (masked): pad to seg if
        the debt bound allows, then a single pull-infer."""
        fb, h, c, dstate, flushing = carry
        padded, did = v_flush_pad(fb)
        do = flushing & did
        fb = {k: jnp.where(_bmask(do, fb[k]), padded[k], fb[k]) for k in fb}
        # gate the pull on sessions still flushing
        fb_gated = dict(fb)
        fb_gated["fifo_len"] = jnp.where(do, fb["fifo_len"], 0)
        fb2, h, c, dstate, events = pull_once(weights, fb_gated, h, c, dstate)
        fb = {
            k: jnp.where(_bmask(do, fb[k]), fb2[k], fb[k]) for k in fb
        }
        return (fb, h, c, dstate, flushing), events

    def _bmask(mask, arr):
        """Broadcast [S] mask against an [S, ...] array."""
        return mask.reshape(mask.shape + (1,) * (arr.ndim - 1))

    def pull_round(weights, carry, _):
        """One masked pull WITHOUT log-eps padding — used to drain the FIFO
        between the flush's zero-block accepts, where the reference performs
        no fbank_flush padding (april_session.c:555-556 accepts both blocks
        back-to-back; pulling real rows early is FIFO-order-invariant, but
        padding here would inject rows the reference doesn't have)."""
        fb, h, c, dstate, flushing = carry
        fb_gated = dict(fb)
        fb_gated["fifo_len"] = jnp.where(flushing, fb["fifo_len"], 0)
        fb2, h, c, dstate, events = pull_once(weights, fb_gated, h, c, dstate)
        fb = {k: jnp.where(_bmask(flushing, fb[k]), fb2[k], fb[k]) for k in fb}
        return (fb, h, c, dstate, flushing), events

    # Derived flush bounds (NOT constants — correct for any chunk size /
    # segment geometry). A pad+pull round pulls once and decrements
    # fifo_len_f by `step`; rounds stop when fifo_len_f < -3*seg
    # (fbank.c:308-310). Entering with fifo_len_f <= seg-1, that is at most:
    seg_step = layout.opts.pull_segment_step
    pad_pull_rounds = ((seg - 1) + 3 * seg) // seg_step + 1
    # The reference flush pushes two FIXED 3200-sample zero blocks
    # (SEGSIZE, april_session.c:500,555-556) — independent of the engine's
    # chunk size.
    FLUSH_BLOCK = 3200
    hop = layout.opts.sample_freq * layout.opts.frame_shift_ms // 1000

    def flush(weights, state, do_flush):
        """_aas_flush (:547-564) for the masked sessions."""
        fb, h, c, dstate = state["fbank"], state["h"], state["c"], state["decode"]
        S = do_flush.shape[0]
        ev_groups = []

        # Phase A: drain + pad rounds until the debt bound stops padding.
        (fb, h, c, dstate, _), evA = jax.lax.scan(
            functools.partial(flush_round, weights),
            (fb, h, c, dstate, do_flush),
            None,
            length=pad_pull_rounds,
        )
        ev_groups.append(evA)

        # Phase B: two fixed 3200-sample zero blocks (:555-556), split into
        # chunk-sized accepts when the engine chunk is smaller, each followed
        # by pad-free drain pulls so the FIFO (sized for one chunk) never
        # overflows.
        zeros = jnp.zeros((S, layout.chunk), jnp.float32)
        for _ in range(2):
            rem = FLUSH_BLOCK
            while rem > 0:
                take = min(layout.chunk, rem)
                rem -= take
                nz = jnp.where(do_flush, take, 0).astype(jnp.int32)
                fb = v_accept(fb, zeros, nz)
                drain = (take // hop + seg) // seg_step + 1
                (fb, h, c, dstate, _), evB = jax.lax.scan(
                    functools.partial(pull_round, weights),
                    (fb, h, c, dstate, do_flush),
                    None,
                    length=drain,
                )
                ev_groups.append(evB)

        # Phase C: drain + pad rounds again (:558-559).
        (fb, h, c, dstate, _), evC = jax.lax.scan(
            functools.partial(flush_round, weights),
            (fb, h, c, dstate, do_flush),
            None,
            length=pad_pull_rounds,
        )
        ev_groups.append(evC)

        # Phase D: finalize + clear context + silence (:561-563).
        dstate = dict(dstate)
        head = dstate["head"]
        fin = do_flush & (head > 0)
        evD = {
            "ops": (
                jnp.where(fin, ev.OP_FINAL, 0)
                | jnp.where(do_flush & ~dstate["emitted_silence"], ev.OP_SILENCE, 0)
            ).astype(jnp.int32),
            "tok": jnp.zeros(S, jnp.int32),
            "logprob": jnp.zeros(S, jnp.float32),
            "flags": jnp.zeros(S, jnp.int32),
            "time_ms": dstate["time_ms"],
            "final_k": jnp.where(fin, head, 0),
        }
        dstate["last_call"] = jnp.where(fin, head, dstate["last_call"])
        dstate["head"] = jnp.where(fin, 0, head)
        do_clear = do_flush & (dstate["context"][:, 0] != blank)
        dstate["context"] = jnp.where(
            do_clear[:, None], jnp.int32(blank), dstate["context"]
        )
        new_dout = rt.decoder_step(weights, dstate["context"])
        dstate["dout"] = jnp.where(do_clear[:, None], new_dout, dstate["dout"])
        # dout was just refreshed eagerly for cleared sessions — cancel any
        # pending lazy refresh so the fused path doesn't redo it against the
        # (now blank) context with a stale need_dec
        dstate["need_dec"] = jnp.where(do_clear, False, dstate["need_dec"])
        dstate["emitted_silence"] = jnp.where(do_flush, True, dstate["emitted_silence"])

        # Stack event groups: each [rounds, S, 3] -> [S, sum(rounds)+1, 3]
        ev_groups = [
            {k: jnp.transpose(v, (1, 0, 2)) for k, v in g.items()}
            for g in ev_groups
        ]
        evD3 = {
            k: jnp.concatenate(
                [v[:, None, None], jnp.zeros((S, 1, 2), v.dtype)], axis=2
            )
            for k, v in evD.items()
        }
        events = {
            k: jnp.concatenate([g[k] for g in ev_groups] + [evD3[k]], axis=1)
            for k in evD3
        }
        new_state = {"fbank": fb, "h": h, "c": c, "decode": dstate}
        packed = pack_events(
            events, state["decode"]["time_ms"], stride, cfg.events_per_session
        )
        return new_state, packed

    donate_args = (1,) if donate else ()
    if mesh is None:
        step_c = jax.jit(step, donate_argnums=donate_args)
        flush_c = jax.jit(flush, donate_argnums=donate_args)
    elif pp_mesh:
        # engine-wide shard_map over the ('data', 'stage') mesh, exactly
        # like the TP path: stacked encoder leaves shard over the stage
        # axis (layer slabs, Pallas kernels alive inside the body), state
        # h/c shard (stage, data), everything else shards over data and
        # replicates across stages (identical deterministic compute, so
        # per-stage event blobs agree).
        from jax.sharding import PartitionSpec as PS

        from ..parallel.pipeline import stage_param_specs

        try:
            from jax import shard_map as _shard_map

            _sm_kwargs = {"check_vma": False}
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map as _shard_map

            _sm_kwargs = {"check_rep": False}

        data_axis = mesh.axis_names[0]
        w_specs = stage_param_specs(rt.weights)
        state_specs = {
            "fbank": PS(data_axis),
            "h": PS("stage", data_axis),
            "c": PS("stage", data_axis),
            "decode": PS(data_axis),
        }
        ev_specs = PackedEvents(blob=PS(data_axis), dense=PS(data_axis))
        step_c = jax.jit(
            _shard_map(
                step, mesh=mesh,
                in_specs=(w_specs, state_specs, PS(data_axis), PS(data_axis)),
                out_specs=(state_specs, ev_specs),
                **_sm_kwargs,
            ),
            donate_argnums=donate_args,
        )
        flush_c = jax.jit(
            _shard_map(
                flush, mesh=mesh,
                in_specs=(w_specs, state_specs, PS(data_axis)),
                out_specs=(state_specs, ev_specs),
                **_sm_kwargs,
            ),
            donate_argnums=donate_args,
        )
    else:
        data_axis = mesh.axis_names[0]
        model_size = 1
        for ax in mesh.axis_names[1:]:
            model_size *= mesh.shape[ax]
        if model_size == 1 or tp_axes is not None:
            from jax.sharding import PartitionSpec as PS

            try:
                from jax import shard_map as _shard_map
            except ImportError:  # pragma: no cover - older jax
                from jax.experimental.shard_map import shard_map as _shard_map

            # Prefix specs: every state leaf is [S, ...] except h/c
            # ([L, S, .]). Under shard_map TP the state shards by family:
            # LSTM — c shards its hidden axis over the model axis (the
            # gate-shuffled layout makes shard k's slice exactly its local
            # layer's cell) while h (the d-dim projected state) is
            # replicated; Conformer — BOTH h (KV rings, head-sharded) and c
            # (conv channels + per-shard position) shard over model.
            m_ax = (
                None
                if tp_axes is None
                else (tp_axes if len(tp_axes) > 1 else tp_axes[0])
            )
            c_spec = (
                PS(None, data_axis)
                if tp_axes is None
                else PS(None, data_axis, m_ax)
            )
            h_spec = (
                PS(None, data_axis, m_ax)
                if tp_family == "conformer"
                else PS(None, data_axis)
            )
            state_specs = {
                "fbank": PS(data_axis),
                "h": h_spec,
                "c": c_spec,
                "decode": PS(data_axis),
            }
            if tp_axes is None:
                w_specs = PS()
            elif tp_family == "conformer":
                from ..parallel.tp import conformer_tp_specs

                w_specs = conformer_tp_specs(rt.weights, m_ax)
            else:
                from ..parallel.tp import tp_param_specs

                w_specs = tp_param_specs(rt.weights, m_ax)
            # events: the blob is a 1-D per-device vector, so the sharded
            # global is per-shard sub-blobs back to back (iter_blobs parses
            # them; each is self-describing); dense shards over sessions.
            ev_specs = PackedEvents(blob=PS(data_axis), dense=PS(data_axis))
            step_sm = _shard_map(
                step,
                mesh=mesh,
                in_specs=(w_specs, state_specs, PS(data_axis), PS(data_axis)),
                out_specs=(state_specs, ev_specs),
                check_vma=False,
            )
            flush_sm = _shard_map(
                flush,
                mesh=mesh,
                in_specs=(w_specs, state_specs, PS(data_axis)),
                out_specs=(state_specs, ev_specs),
                check_vma=False,
            )
            step_c = jax.jit(step_sm, donate_argnums=donate_args)
            flush_c = jax.jit(flush_sm, donate_argnums=donate_args)
        else:
            # TP without a shard_map kernel path (ONNX interpreter,
            # Conformer): GSPMD must partition the model contractions, which
            # excludes pallas_call — trace with the pure-XLA compute paths.
            # The dispatch flag is read at TRACE time, so wrap the jitted
            # entry points; later calls hit the jit cache and the wrapper is
            # a no-op.
            from ..ops.dispatch import pallas_disabled

            def _no_pallas(fn):
                @functools.wraps(fn)
                def inner(*a, **k):
                    with pallas_disabled():
                        return fn(*a, **k)

                return inner

            def _dense_events(fn):
                # GSPMD picks the output shardings itself, so the compact
                # blob's per-shard layout contract doesn't hold; this path
                # ships the dense tensor (XLA dead-code-eliminates the
                # compaction) and the host replays it as before.
                @functools.wraps(fn)
                def inner(*a):
                    st, evp = fn(*a)
                    return st, evp.dense

                return inner

            step_c = _no_pallas(
                jax.jit(_dense_events(step), donate_argnums=donate_args)
            )
            flush_c = _no_pallas(
                jax.jit(_dense_events(flush), donate_argnums=donate_args)
            )

    return EngineProgram(
        rt=rt,
        layout=layout,
        cfg=cfg,
        dcfg=dcfg,
        step=step_c,
        flush=flush_c,
        batch=batch,
        tp_axes=tp_axes,
        tp_family=tp_family,
        donated=donate,
    )
