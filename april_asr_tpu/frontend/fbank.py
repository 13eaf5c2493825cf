"""Batched streaming log-mel fbank frontend for TPU.

TPU-native redesign of the reference's per-sample C loop (src/fbank.c): instead
of one frame at a time through pocketfft, each engine step processes a whole
audio chunk per session — all frames are gathered into a [frames, padded]
matrix, windowed/FFT'd/mel-projected as batched dense ops (MXU-friendly
matmuls), and appended to a fixed-capacity mel-row FIFO with masked scatters.
All state lives in fixed-shape arrays so the whole pipeline jits and vmaps over
the session axis; there is no data-dependent control flow.

Semantics replicated from the reference (validated against the oracle in
oracle.py, which in turn is validated against golden vectors from the compiled
reference):
  * frame layout: hop `window_shift`, window `padded_window_size` with the
    Povey window computed over the padded size (fbank.c:140-141)
  * DC removal, pre-emphasis with the data[0] quirk, f32 power spectrum with
    dropped Nyquist bin (fbank.c:241-280)
  * leftover-sample carry between chunks (fbank.c:195-226), FIFO overflow
    drops input and keeps stale leftover (fbank.c:190-193)
  * segment pull of `pull_segment_count` rows advancing by `pull_segment_step`
    (fbank.c:327-349), flush padding of log(eps) rows bounded by the real-data
    debt counter (fbank.c:308-325)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FbankOptions
from .oracle import K_EPS, mel_banks, povey_window

# Every contraction in this module runs at HIGHEST (f32-equivalent) matmul
# precision. XLA's *default* TPU precision rounds f32 dot operands to bf16
# (one MXU pass) — acceptable for the encoder's weights under the bf16
# policy, but catastrophic here: the one-hot contractions MOVE raw samples
# and log-mel rows (0.4% value corruption), and the DFT's bf16 rounding
# blows the log-mel error to >1.3 vs the float64 oracle (the frame tests'
# budget is 2e-3, tests/test_fbank_jax.py). One-hot matmuls are exact at
# HIGHEST; the cost is negligible at these shapes.
_EXACT = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class FbankLayout:
    """Static shapes for the streaming fbank, derived from options + chunk size."""

    opts: FbankOptions
    chunk: int  # samples accepted per step
    leftover_cap: int
    max_frames: int  # frame slots computed per step (upper bound)
    fifo_rows: int

    @staticmethod
    def build(opts: FbankOptions, chunk: int, fifo_rows: int | None = None) -> "FbankLayout":
        padded = opts.padded_window_size
        shift = opts.window_shift
        # Multiple of the hop so the leftover always spans whole sample rows
        # (accept moves samples in [shift]-wide rows; see fbank_accept).
        # Max leftover is padded + shift - 1 samples.
        leftover_cap = ((padded + shift) + shift - 1) // shift * shift
        # Worst case: leftover nearly full (padded+shift-1 real samples) plus a
        # full chunk.
        max_total = (padded + shift - 1) + chunk
        max_frames = max(0, (max_total - padded) // shift + 1)
        if fifo_rows is None:
            # Steady state holds < pull_segment_count rows plus one chunk's
            # frames; round up to a multiple of 8 for clean tiling.
            need = opts.pull_segment_count + max_frames
            fifo_rows = ((need + 7) // 8) * 8
        return FbankLayout(
            opts=opts,
            chunk=chunk,
            leftover_cap=leftover_cap,
            max_frames=max_frames,
            fifo_rows=fifo_rows,
        )

    @property
    def max_pulls_per_step(self) -> int:
        """Upper bound on segment pulls after one accept (fifo fully drained
        to < pull_segment_count each step, like the reference's
        while-pull loop in aas_infer, april_session.c:441)."""
        o = self.opts
        return max(
            1, (self.fifo_rows - (o.pull_segment_count - o.pull_segment_step) + (o.pull_segment_step - 1)) // o.pull_segment_step
        )


# Per-session streaming state: a plain dict pytree with fixed-shape leaves
# (unbatched; the engine vmaps over a leading session axis):
#   leftover     f32[leftover_cap]  zero-padded beyond leftover_len
#   leftover_len i32
#   fifo         f32[fifo_rows, num_bins]  ring buffer of mel rows
#   fifo_off     i32   ring index of the oldest valid row
#   fifo_len     i32   rows available (includes flush padding)
#   fifo_len_f   i32   real-data availability, may go negative during flush
#   dropped      i32   overflow event count (CANT_KEEP_UP-style observability)
FbankState = dict


def fbank_init(layout: FbankLayout) -> FbankState:
    o = layout.opts
    return FbankState(
        leftover=jnp.zeros(layout.leftover_cap, jnp.float32),
        leftover_len=jnp.int32(0),
        fifo=jnp.zeros((layout.fifo_rows, o.num_bins), jnp.float32),
        fifo_off=jnp.int32(0),
        fifo_len=jnp.int32(0),
        fifo_len_f=jnp.int32(0),
        dropped=jnp.int32(0),
    )


def _dft_matrices(padded: int, num_fft_bins: int):
    """Real-DFT basis [padded, num_fft_bins] as numpy constants (float64
    trig, f32 storage). TPUs have no FFT hardware — a dense DFT matmul runs
    on the MXU and beats XLA's generic FFT for these frame sizes."""
    t = np.arange(padded)[:, None]
    k = np.arange(num_fft_bins)[None, :]
    ang = 2.0 * np.pi * t * k / padded
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _frame_dsp(layout: FbankLayout, frames: jnp.ndarray) -> jnp.ndarray:
    """[F, padded] raw frames -> [F, num_bins] log-mel rows.

    Batched equivalent of fbank.c:241-295; float32 throughout (the reference
    FFT is float64 — WER-neutral per the tolerance tests in
    tests/test_fbank_jax.py). The spectrum is computed as a real-DFT matmul
    (see _dft_matrices); only bins 0..num_fft_bins-1 are produced, which
    drops the Nyquist bin and zeroes the DC imaginary exactly like the
    reference's layout handling (fbank.c:269-280).
    """
    o = layout.opts
    padded = o.padded_window_size
    window = jnp.asarray(povey_window(padded))
    mel_t = jnp.asarray(
        mel_banks(o.num_bins, o.num_fft_bins, padded, o.sample_freq, o.mel_low, o.mel_high).T
    )  # [nfft, bins]
    cos_m, sin_m = _dft_matrices(padded, o.num_fft_bins)

    x = frames
    if o.remove_dc_offset:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        x = x - mean
    c = jnp.float32(o.preemph_coeff)
    if o.preemph_coeff > 0.0:
        shifted = jnp.concatenate([x[:, :1], x[:, :-1]], axis=-1)
        x = x - c * shifted
    x = x * window

    re = jnp.dot(x, jnp.asarray(cos_m), preferred_element_type=jnp.float32, precision=_EXACT)
    im = jnp.dot(x, jnp.asarray(sin_m), preferred_element_type=jnp.float32, precision=_EXACT)
    power = re * re + im * im

    mel = jnp.dot(power, mel_t, preferred_element_type=jnp.float32, precision=_EXACT)
    return jnp.log(jnp.maximum(jnp.float32(K_EPS), mel))


def _roll_right(x: jnp.ndarray, amt: jnp.ndarray, max_amt: int) -> jnp.ndarray:
    """Circular right-shift of the last axis by a traced amount < max_amt.

    Barrel shifter: log2(max_amt) rounds of constant-offset rolls selected by
    the amount's bits. A traced-offset roll/slice would otherwise lower to a
    batched gather, which XLA turns into a serial per-session while loop on
    TPU (~30 ms per engine step at S=2048 — measured; this is microseconds).
    """
    b = 1
    while b < max_amt:
        rolled = jnp.roll(x, b, axis=-1)
        x = jnp.where((amt & b) != 0, rolled, x)
        b <<= 1
    return x


def _pad_to_rows(layout: FbankLayout, wave: jnp.ndarray) -> jnp.ndarray:
    """Append >= shift zeros and round the last axis up to whole hop rows."""
    shift = layout.opts.window_shift
    pad = shift + (-(layout.chunk + shift) % shift)
    zshape = wave.shape[:-1] + (pad,)
    return jnp.concatenate([wave, jnp.zeros(zshape, jnp.float32)], axis=-1)


def fbank_accept_batch(
    layout: FbankLayout,
    state: FbankState,
    wave: jnp.ndarray,
    n: jnp.ndarray,
    *,
    dft_i8: bool = False,
) -> FbankState:
    """Batched accept: state leaves/wave/n carry a leading session axis.

    Hoists the phase-alignment barrel roll above the per-session vmap behind
    a batch-level lax.cond: whenever every session's pending stream length is
    hop-aligned (always true when feeds are multiples of the 10 ms hop — the
    engine's steady state), the roll's ~8 full passes over the audio are
    skipped at runtime.

    On TPU the frame DSP runs as the fused Pallas kernel
    (ops/fbank_pallas.py) over the whole batch's assembled buffers: the
    per-session assembly and ring commit stay vmapped, the bandwidth-heavy
    frame pipeline runs once with all intermediates in VMEM.
    """
    from ..ops.dispatch import pallas_wanted

    shift = layout.opts.window_shift
    S = n.shape[0]
    n = jnp.asarray(n, jnp.int32)
    wave = jnp.where(
        jnp.arange(layout.chunk)[None, :] < n[:, None], wave, 0.0
    ).astype(jnp.float32)
    phi = state["leftover_len"] % shift  # [S]
    wave_p = _pad_to_rows(layout, wave)
    wave_p = jax.lax.cond(
        jnp.any(phi != 0),
        lambda w: _roll_right(w, phi[:, None], shift),
        lambda w: w,
        wave_p,
    )

    if pallas_wanted():
        from ..ops.fbank_pallas import (
            fused_supported,
            logmel_rows_from_buf,
            logmel_rows_from_buf_i8,
            logmel_rows_fused,
        )

        if fused_supported(layout, S):
            buf, total = jax.vmap(
                lambda s, w, m: _accept_assemble(layout, s, w, m)
            )(state, wave_p, n)
            interp = jax.default_backend() != "tpu"
            n_views = -(-layout.opts.padded_window_size // shift)
            if buf.shape[1] // shift >= layout.max_frames + n_views - 1:
                # frames formed IN-KERNEL from the hop-row buffer: no
                # [S, F, padded] intermediate, no XLA view gathers/copies
                # (~7 ms of data movement per step at S=2048). 8-session
                # tiles measured fastest by DEVICE time (6.08 vs 6.76 ms
                # per step at 32 — wall-clock micro A/Bs through the remote
                # tunnel are RTT-dominated and misleading here)
                #
                # dft_i8 (int8-serving engines only): exact two-plane int8
                # sample split + two-level int8 DFT matrix — 10.6 vs
                # 13.5 ms per step at S=4096, max 1.4e-3 log-mel error vs
                # the f64 oracle (below the bf16 activation cast the
                # encoder applies to these rows anyway; the exact-path
                # golden budget 2e-3 still holds, tests/test_fbank_pallas)
                if dft_i8:
                    rows = logmel_rows_from_buf_i8(layout, buf, interpret=interp)
                else:
                    rows = logmel_rows_from_buf(layout, buf, interpret=interp)
            else:
                frames = jax.vmap(lambda b: _frames_from_buf(layout, b))(buf)
                rows = logmel_rows_fused(layout, frames, interpret=interp)
            return jax.vmap(
                lambda s, b, r, t: _accept_commit(layout, s, b, r, t)
            )(state, buf, rows, total)

    return jax.vmap(
        lambda s, w, m: fbank_accept(layout, s, w, m, prealigned=True)
    )(state, wave_p, n)


def fbank_accept(
    layout: FbankLayout,
    state: FbankState,
    wave: jnp.ndarray,
    n: jnp.ndarray,
    *,
    prealigned: bool = False,
) -> FbankState:
    """Accept up to `layout.chunk` samples (`wave[:n]` valid) for one session.

    Batched equivalent of fbank_accept_waveform (fbank.c:174-306).

    All sample movement here is either phase-bounded (one barrel roll of at
    most `shift` samples) or row-granular via one-hot matmul contractions
    over [shift]-wide sample rows — never a traced-offset slice or update,
    which XLA lowers to serial per-session scatter/gather loops on TPU. The
    streaming invariant is that the leftover is stored start-aligned, so
    frame starts land at static multiples of the hop; the incoming wave is
    phase-rolled by `leftover_len % shift` and row-placed at
    `leftover_len // shift`. Frame consumption is always a whole number of
    rows, so the new leftover is a row-granular gather.
    """
    o = layout.opts
    padded = o.padded_window_size
    shift = o.window_shift
    cap = layout.leftover_cap
    F = layout.max_frames

    n = jnp.asarray(n, jnp.int32)
    lo_len = state["leftover_len"]

    if not prealigned:
        wave = jnp.where(jnp.arange(layout.chunk) < n, wave, 0.0).astype(
            jnp.float32
        )
        wave = _roll_right(_pad_to_rows(layout, wave), lo_len % shift, shift)

    buf, total = _accept_assemble(layout, state, wave, n)
    rows = _frame_dsp(layout, _frames_from_buf(layout, buf))
    return _accept_commit(layout, state, buf, rows, total)


def _frames_from_buf(layout: FbankLayout, buf: jnp.ndarray) -> jnp.ndarray:
    """[L] buf -> [max_frames, padded] frame matrix for one session.

    Frame extraction as static slices + reshape: frame i =
    buf[shift*i : shift*i + padded]; n_views shift-strided views cover
    every frame (4 views for the canonical 25 ms / 10 ms config).
    """
    o = layout.opts
    padded = o.padded_window_size
    shift = o.window_shift
    F = layout.max_frames
    n_views = -(-padded // shift)
    views = [
        buf[v * shift : v * shift + F * shift].reshape(F, shift)
        for v in range(n_views)
    ]
    return jnp.concatenate(views, axis=1)[:, :padded]  # [F, padded]


def _accept_assemble(
    layout: FbankLayout, state: FbankState, wave_p: jnp.ndarray, n: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hop-aligned sample buffer for one session: (buf [L], total samples).

    `wave_p` must already be phase-rolled by leftover_len % shift and padded
    to whole hop rows (fbank_accept_batch hoists that roll above the vmap).
    Buf row t receives wave row t - leftover_len//shift; the start-aligned
    leftover overlays [0, leftover_len).
    """
    o = layout.opts
    padded = o.padded_window_size
    shift = o.window_shift
    cap = layout.leftover_cap

    lo_len = state["leftover_len"]
    total = lo_len + n

    n_views = -(-padded // shift)  # ceil: views needed to cover one frame
    L = cap + layout.chunk + n_views * shift
    L = ((L + shift - 1) // shift) * shift
    nbuf = L // shift

    row_off = lo_len // shift
    src = wave_p.reshape(-1, shift)  # [nsrc, shift] hop-grid rows
    nsrc = src.shape[0]

    # Row placement: buf row t receives src row t - row_off.
    t_iota = jnp.arange(nbuf, dtype=jnp.int32)[:, None]
    s_iota = jnp.arange(nsrc, dtype=jnp.int32)[None, :]
    place = (t_iota == s_iota + row_off).astype(jnp.float32)  # [nbuf, nsrc]
    buf = jnp.dot(place, src, preferred_element_type=jnp.float32, precision=_EXACT).reshape(L)

    # Leftover is start-aligned: overlay it on [0, lo_len) (the rolled wave's
    # garbage-free zeros occupy [row_off*shift, lo_len) and are replaced).
    lo_padded = jnp.concatenate(
        [state["leftover"], jnp.zeros(L - cap, jnp.float32)]
    )
    pos = jnp.arange(L, dtype=jnp.int32)
    buf = jnp.where(pos < lo_len, lo_padded, buf)
    return buf, total


def _accept_commit(
    layout: FbankLayout,
    state: FbankState,
    buf: jnp.ndarray,
    rows: jnp.ndarray,
    total: jnp.ndarray,
) -> FbankState:
    """Ring-append the new log-mel rows and update the leftover for one
    session. `rows` is [max_frames, num_bins] (entries beyond the session's
    frame count are garbage and masked off here)."""
    o = layout.opts
    padded = o.padded_window_size
    shift = o.window_shift
    cap = layout.leftover_cap
    F = layout.max_frames
    lo_len = state["leftover_len"]
    nbuf = buf.shape[0] // shift

    nframes = jnp.maximum(0, (total - padded) // shift + 1)
    space = layout.fifo_rows - state["fifo_len"]
    nf_eff = jnp.minimum(nframes, space)
    truncated = nf_eff < nframes

    # Ring append via one-hot contraction (no scatter HLO): fifo slot r takes
    # new row (rel(r) - len) when that index is a valid new frame, where
    # rel(r) = (r - off) mod rows.
    R = layout.fifo_rows
    rel = (jnp.arange(R) - state["fifo_off"]) % R
    row_idx = rel - state["fifo_len"]
    write = (row_idx >= 0) & (row_idx < nf_eff)
    onehot = (row_idx[None, :] == jnp.arange(F)[:, None]).astype(jnp.float32)
    written = jnp.einsum(
        "fr,fb->rb", onehot, rows, preferred_element_type=jnp.float32, precision=_EXACT
    )
    fifo = jnp.where(write[:, None], written, state["fifo"])

    fifo_len = state["fifo_len"] + nf_eff
    # avail_f tracks real rows; it snaps to avail whenever a real row lands
    # (fbank.c:300), otherwise keeps its (possibly lower) value.
    fifo_len_f = jnp.where(nf_eff > 0, fifo_len, state["fifo_len_f"])

    # Leftover update (fbank.c:195-226); on truncation the reference returns
    # early leaving the previous leftover in place (fbank.c:190-193).
    # `consumed` is a whole number of rows, so the new leftover is a
    # row-granular one-hot gather: leftover row j = buf row j + nframes.
    consumed = nframes * shift
    new_lo_len = total - consumed
    nlo = cap // shift
    j_iota = jnp.arange(nlo, dtype=jnp.int32)[:, None]
    r_iota = jnp.arange(nbuf, dtype=jnp.int32)[None, :]
    take = (r_iota == j_iota + nframes).astype(jnp.float32)  # [nlo, nbuf]
    new_leftover = jnp.dot(
        take, buf.reshape(nbuf, shift), preferred_element_type=jnp.float32,
        precision=_EXACT,
    ).reshape(cap)
    lo_idx = jnp.arange(cap)
    new_leftover = jnp.where(lo_idx < new_lo_len, new_leftover, 0.0)

    keep_stale = truncated
    leftover = jnp.where(keep_stale, state["leftover"], new_leftover)
    leftover_len = jnp.where(keep_stale, lo_len, new_lo_len)
    dropped = state["dropped"] + keep_stale.astype(jnp.int32)

    return FbankState(
        leftover=leftover,
        leftover_len=leftover_len,
        fifo=fifo,
        fifo_off=state["fifo_off"],
        fifo_len=fifo_len,
        fifo_len_f=fifo_len_f,
        dropped=dropped,
    )


def fbank_flush_pad(layout: FbankLayout, state: FbankState) -> Tuple[FbankState, jnp.ndarray]:
    """Pad log(eps) rows up to pull_segment_count if the debt bound allows.

    Returns (state, did_flush). Equivalent of fbank_flush (fbank.c:308-325):
    padded rows raise fifo_len but not fifo_len_f; flushing stops once
    fifo_len_f has been drawn below -3*pull_segment_count.
    """
    o = layout.opts
    seg = o.pull_segment_count
    did = state["fifo_len_f"] >= -(seg * 3)

    log_eps = jnp.full((o.num_bins,), jnp.log(jnp.float32(K_EPS)), jnp.float32)
    R = layout.fifo_rows
    rel = (jnp.arange(R) - state["fifo_off"]) % R
    pad_mask = did & (rel >= state["fifo_len"]) & (rel < seg)
    fifo = jnp.where(pad_mask[:, None], log_eps[None, :], state["fifo"])
    fifo_len = jnp.where(did, jnp.maximum(state["fifo_len"], seg), state["fifo_len"])

    new_state = FbankState(state)
    new_state["fifo"] = fifo
    new_state["fifo_len"] = fifo_len
    return new_state, did


def fbank_can_pull(layout: FbankLayout, state: FbankState) -> jnp.ndarray:
    return state["fifo_len"] >= layout.opts.pull_segment_count


def fbank_peek(layout: FbankLayout, state: FbankState) -> jnp.ndarray:
    """Front pull_segment_count rows as the [seg, num_bins] network input
    (one-hot ring read; no gather HLO)."""
    seg = layout.opts.pull_segment_count
    R = layout.fifo_rows
    rel = (jnp.arange(R) - state["fifo_off"]) % R
    onehot = (rel[None, :] == jnp.arange(seg)[:, None]).astype(jnp.float32)
    return jnp.einsum(
        "ur,rb->ub", onehot, state["fifo"], preferred_element_type=jnp.float32,
        precision=_EXACT,
    )


def fbank_front(layout: FbankLayout, state: FbankState, w: int) -> jnp.ndarray:
    """Front `w` FIFO rows as [w, num_bins] (single one-hot ring read).

    Lets the engine materialize every window of a step's pull loop with ONE
    pass over the FIFO instead of one peek per pull — the FIFO is the
    largest per-session state array, so per-pull reads dominate HBM traffic
    at scale."""
    R = layout.fifo_rows
    rel = (jnp.arange(R) - state["fifo_off"]) % R
    onehot = (rel[None, :] == jnp.arange(w)[:, None]).astype(jnp.float32)
    return jnp.einsum(
        "ur,rb->ub", onehot, state["fifo"], preferred_element_type=jnp.float32,
        precision=_EXACT,
    )


def fbank_front_batch(
    layout: FbankLayout, state: FbankState, w: int
) -> jnp.ndarray:
    """Batched `fbank_front`: state leaves carry a leading session axis;
    returns [S, w, num_bins].

    Fast path (lax.cond at the batch level): in the engine's steady state
    every session advances by the same number of pulls per step, so
    `fifo_off` is batch-uniform — the ring read is then ONE roll by a
    shared traced offset (concat-double + dynamic_slice), instead of S
    independent [w, R] one-hot matmuls (tiny per-session matrices the MXU
    cannot tile; measured ~7 ms of the S=4096 engine step,
    tools/profile_engine_variants.py). Sessions at different phases (mixed
    starts, partial feeds, flush) fall back to the exact one-hot path."""
    R = layout.fifo_rows
    off = state["fifo_off"]

    def slow(st):
        return jax.vmap(lambda s: fbank_front(layout, s, w))(st)

    if w > 2 * R:
        return slow(state)

    def fast(st):
        off0 = st["fifo_off"][0]
        ext = jnp.concatenate([st["fifo"], st["fifo"]], axis=1)  # [S, 2R, b]
        rows = jax.lax.dynamic_slice_in_dim(ext, off0, w, axis=1)
        if w > R:
            # rows beyond one ring turn read duplicates; the one-hot path
            # yields zeros there (rel never matches u >= R) — replicate that
            rows = jnp.where(
                (jnp.arange(w) < R)[None, :, None], rows, 0.0
            )
        return rows

    return jax.lax.cond(
        jnp.all(off == off[0]), fast, slow, state
    )


def fbank_advance_n(
    layout: FbankLayout, state: FbankState, n_pulls: jnp.ndarray
) -> FbankState:
    """Advance the FIFO by `n_pulls` pulls' worth of rows at once."""
    step = layout.opts.pull_segment_step
    d = n_pulls.astype(jnp.int32) * step
    new_state = FbankState(state)
    new_state["fifo_off"] = (state["fifo_off"] + d) % layout.fifo_rows
    new_state["fifo_len"] = state["fifo_len"] - d
    new_state["fifo_len_f"] = state["fifo_len_f"] - d
    return new_state


def fbank_advance(layout: FbankLayout, state: FbankState, do: jnp.ndarray) -> FbankState:
    """Advance the FIFO by pull_segment_step rows where `do` (fbank.c:343-346)."""
    o = layout.opts
    step = o.pull_segment_step
    d = do.astype(jnp.int32)
    new_state = FbankState(state)
    new_state["fifo_off"] = (state["fifo_off"] + step * d) % layout.fifo_rows
    new_state["fifo_len"] = state["fifo_len"] - step * d
    new_state["fifo_len_f"] = state["fifo_len_f"] - step * d
    return new_state
