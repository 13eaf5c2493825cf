"""Whole-chunk fused greedy-decode Pallas kernel.

The engine's inner decode is op-count-bound, not FLOP-bound: per pull it
runs 3 fused decoder+joiner+argmax kernel calls with ~60 small XLA
elementwise ops of `decode_step_pre` glue between them, all inside a
`lax.scan` over the chunk's P pulls — ~180 op launches per pull, measured
~12.5 ms of the S=4096 engine step (tools/profile_xplane.py: the `while`
aggregate) for work that is <2% of the step's FLOPs.

This kernel runs the ENTIRE chunk decode in ONE pallas_call: grid
(session tiles, P pulls); each grid step executes the <=3-round masked
inner loop — the decoder-table one-hot refresh, joiner matmul,
blank-excluded argmax, and every emission heuristic of
`decode/greedy.decode_step_pre` — on VPU/MXU with the decode state
(context, dout, token window, heads, silence clocks) resident in VMEM
scratch across pulls. Only the per-pull event records and the final state
leave the chip.

Heuristic fidelity: the logic is a line-for-line translation of
decode_step_pre (reference: aas_process_logits, src/april_session.c:306-429
— early-emit ramp, repeat guard, punctuation margin, digit-dot exception,
sentence-forced finalization, 72-token window with word-split finalize via
barrel shift, silence decay, confident-blank with dedup, 2200 ms reset).
Parity with the XLA path is asserted element-exact in
tests/test_decode_pallas.py and end-to-end by the golden decode tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..decode import events as ev
from ..decode.greedy import FLAG_SHIFT, MASK_DIGIT, MASK_DOT, MASK_EOS, MASK_PUNCT, MASK_WB

NEG_INF = -1e30


def _chunk_decode_kernel(
    P,
    blank,
    V,
    T,
    stride_ms,
    emit_ramp,
    punct_margin,
    conf_margin,
    conf_penalty,
    long_sil_ms,
    decay_ms,
    # inputs
    e_ref,  # [1, bs, J] eout for this pull
    can_ref,  # [1, bs, 1] i32
    ctx_in,  # [bs, 2] i32
    dout_in,  # [bs, J] f32
    nd_in,  # [bs, 1] f32
    words_in,  # [bs, T] i32
    head_in,  # [bs, 1] i32
    lastcall_in,  # [bs, 1] i32
    time_in,  # [bs, 1] i32
    lastemit_in,  # [bs, 1] i32
    sil_in,  # [bs, 1] i32
    t0_ref,  # [Vp, d] f32 dec table 0
    t1_ref,  # [Vp, d]
    dp_ref,  # [d, J]
    dpb_ref,  # [1, J]
    w_ref,  # [J, Vp] joiner
    b_ref,  # [1, Vp]
    tm_ref,  # [1, Vp] i32 packed vocab bitmask
    # outputs
    ctx_out,
    dout_out,
    nd_out,
    words_out,
    head_out,
    lastcall_out,
    time_out,
    lastemit_out,
    sil_out,
    ev_ops,  # [1, bs, R]
    ev_tok,
    ev_logprob,
    ev_flags,
    ev_time,
    ev_fink,
    # scratch
    ctx_s,
    dout_s,
    nd_s,
    words_s,
    head_s,
    lastcall_s,
    time_s,
    lastemit_s,
    sil_s,
):
    p = pl.program_id(1)
    bs = ctx_s.shape[0]
    d = t0_ref.shape[1]
    Vp = w_ref.shape[1]

    @pl.when(p == 0)
    def _init():
        ctx_s[:] = ctx_in[:]
        dout_s[:] = dout_in[:]
        nd_s[:] = nd_in[:]
        words_s[:] = words_in[:]
        head_s[:] = head_in[:]
        lastcall_s[:] = lastcall_in[:]
        time_s[:] = time_in[:]
        lastemit_s[:] = lastemit_in[:]
        sil_s[:] = sil_in[:]

    can = can_ref[0] != 0  # [bs, 1] bool
    time_s[:] = time_s[:] + jnp.int32(stride_ms) * can.astype(jnp.int32)

    eout = e_ref[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (bs, T), 1)
    viota = jax.lax.broadcasted_iota(jnp.int32, (bs, Vp), 1)
    tmask_b = jnp.broadcast_to(tm_ref[:], (bs, Vp))

    done = ~can  # [bs, 1]
    for r, ee in enumerate(emit_ramp):
        ctx = ctx_s[:]
        words = words_s[:]
        head = head_s[:]  # [bs, 1]
        time_ms = time_s[:]

        # ---- fused decoder refresh + joiner + argmax (lazy-dout path) ----
        c0 = ctx[:, 0:1]
        c1 = ctx[:, 1:2]
        oh0 = jnp.where(viota == c0, 1.0, 0.0)
        oh1 = jnp.where(viota == c1, 1.0, 0.0)
        pre = jnp.dot(oh0, t0_ref[:], preferred_element_type=jnp.float32) + jnp.dot(
            oh1, t1_ref[:], preferred_element_type=jnp.float32
        )
        y = jnp.maximum(pre, 0.0)
        wd = dp_ref.dtype
        new_dout = (
            jnp.dot(y.astype(wd), dp_ref[:], preferred_element_type=jnp.float32)
            + dpb_ref[:].astype(jnp.float32)
        )
        nd = nd_s[:]
        dout = nd * new_dout + (1.0 - nd) * dout_s[:]
        dout_s[:] = dout

        t = jnp.tanh(eout + dout)
        logits = (
            jnp.dot(t.astype(w_ref.dtype), w_ref[:], preferred_element_type=jnp.float32)
            + b_ref[:].astype(jnp.float32)
        )
        blank_val = logits[:, blank : blank + 1]  # [bs, 1]
        masked = jnp.where(
            (viota == blank) | (viota >= V), jnp.float32(NEG_INF), logits
        )
        max_val = jnp.max(masked, axis=1, keepdims=True)
        max_idx = jnp.argmax(masked, axis=1).astype(jnp.int32)[:, None]

        # ---- decode_step_pre, translated 1:1 (april_session.c:306-429) ----
        active = ~done
        last_ctx = ctx[:, 1:2]
        was_cleared = last_ctx == blank
        is_equal_prev = last_ctx == max_idx
        eff_emit = jnp.where(is_equal_prev, 0.0, jnp.float32(ee))
        is_blank = (blank_val - eff_emit) > max_val

        oh_max = viota == max_idx
        mask_max = jnp.sum(jnp.where(oh_max, tmask_b, 0), axis=1, keepdims=True)
        wb = (mask_max & MASK_WB) != 0
        eos = (mask_max & MASK_EOS) != 0
        punct = (mask_max & MASK_PUNCT) != 0

        prev_word = jnp.sum(
            jnp.where(pos == jnp.maximum(head - 1, 0), words, 0),
            axis=1,
            keepdims=True,
        )
        prev_tok = prev_word & ((1 << FLAG_SHIFT) - 1)
        prev_flags = prev_word >> FLAG_SHIFT
        mask_prev = jnp.sum(
            jnp.where(viota == prev_tok, tmask_b, 0), axis=1, keepdims=True
        )
        digit_exc = (
            punct
            & (head > 0)
            & ((mask_prev & MASK_DIGIT) != 0)
            & ((mask_max & MASK_DOT) != 0)
        )
        eos = eos & ~digit_exc
        punct = punct & ~digit_exc
        tok_flags = jnp.where(wb, ev.FLAG_WORD_BOUNDARY, 0) | jnp.where(
            eos, ev.FLAG_SENTENCE_END, 0
        )

        boost = (
            ~was_cleared
            & punct
            & ~is_equal_prev
            & (max_val > blank_val - jnp.float32(punct_margin))
        )
        is_blank = is_blank & ~boost

        nb = active & ~is_blank
        bl = active & is_blank

        evt_ops = jnp.zeros((bs, 1), jnp.int32)
        evt_tok = jnp.zeros((bs, 1), jnp.int32)
        evt_logprob = jnp.zeros((bs, 1), jnp.float32)
        evt_flags = jnp.zeros((bs, 1), jnp.int32)
        evt_fink = jnp.zeros((bs, 1), jnp.int32)

        lastemit_s[:] = jnp.where(nb, time_ms, lastemit_s[:])
        new_ctx = jnp.concatenate([ctx[:, 1:], max_idx], axis=1)
        ctx = jnp.where(nb, new_ctx, ctx)
        need_dec = nb

        is_final = nb & (head >= T - 1)

        check = nb & (head > 0) & wb
        prev_is_eos = (mask_prev & MASK_EOS) != 0
        fix_prev = check & prev_is_eos & ((prev_flags & ev.FLAG_SENTENCE_END) == 0)
        fix_mask = (pos == jnp.maximum(head - 1, 0)) & fix_prev
        words = jnp.where(fix_mask, words | (ev.FLAG_SENTENCE_END << FLAG_SHIFT), words)
        evt_ops = evt_ops | jnp.where(fix_prev, ev.OP_FIX_PREV_EOS, 0)
        is_final = is_final | (check & prev_is_eos)

        wb_bits = (words >> FLAG_SHIFT) & ev.FLAG_WORD_BOUNDARY
        cand = jnp.where((wb_bits != 0) & (pos > 2) & (pos <= head - 1), pos, -1)
        start_of_word = jnp.max(cand, axis=1, keepdims=True)

        full_fin = is_final & (head > 0) & (wb | (start_of_word < 0))
        shift_fin = is_final & (head > 0) & ~wb & (start_of_word >= 0)

        evt_ops = evt_ops | jnp.where(full_fin, ev.OP_FINAL, 0)
        evt_fink = jnp.where(full_fin, head, evt_fink)
        lastcall_s[:] = jnp.where(full_fin, head, lastcall_s[:])
        head = jnp.where(full_fin, 0, head)

        evt_ops = evt_ops | jnp.where(shift_fin, ev.OP_FINAL, 0)
        evt_fink = jnp.where(shift_fin, start_of_word, evt_fink)
        shift = jnp.where(shift_fin, start_of_word, 0)
        # barrel shift-left (memmove semantics, _shift_left): wrapped lanes
        # land at/beyond the new head where `live` masks them off
        moved = words
        b = 1
        while b < T:
            # roll left by b == roll right by T-b (pltpu.roll requires a
            # non-negative shift; modulus is the true dim T, not lane pad)
            if hasattr(pltpu, "roll"):
                rolled = pltpu.roll(moved, T - b, 1)
            else:
                rolled = jnp.roll(moved, -b, axis=1)
            moved = jnp.where((shift & b) != 0, rolled, moved)
            b <<= 1
        live = pos < (head - shift)
        words = jnp.where(live, moved, words)
        head = jnp.where(shift_fin, head - start_of_word, head)

        no_room = nb & (head >= T - 1)
        evt_ops = evt_ops | jnp.where(no_room, ev.OP_RESET_TOKENS, 0)
        head = jnp.where(no_room, 0, head)

        new_word = max_idx | (tok_flags << FLAG_SHIFT)
        append_mask = (pos == jnp.clip(head, 0, T - 1)) & nb
        words = jnp.where(append_mask, new_word, words)
        head = jnp.where(nb, head + 1, head)
        evt_ops = evt_ops | jnp.where(nb, ev.OP_APPEND | ev.OP_PARTIAL, 0)
        evt_tok = jnp.where(nb, max_idx, evt_tok)
        evt_logprob = jnp.where(nb, max_val, evt_logprob)
        evt_flags = jnp.where(nb, tok_flags, evt_flags)
        evt_time = jnp.where(active, time_ms, jnp.zeros((bs, 1), jnp.int32))
        lastcall_s[:] = jnp.where(nb, head, lastcall_s[:])
        sil_s[:] = jnp.where(nb, 0, sil_s[:])

        # ---- blank path ----
        t_since = (time_ms - lastemit_s[:]).astype(jnp.float32)
        decayed = max_val - t_since / jnp.float32(decay_ms)
        confident = ~is_equal_prev & (decayed > blank_val - jnp.float32(conf_margin))
        long_sil = t_since >= jnp.float32(long_sil_ms)

        ls = bl & long_sil
        fin_do = ls & (head > 0)
        evt_ops = evt_ops | jnp.where(fin_do, ev.OP_FINAL, 0)
        evt_fink = jnp.where(fin_do, head, evt_fink)
        lastcall_s[:] = jnp.where(fin_do, head, lastcall_s[:])
        head = jnp.where(fin_do, 0, head)

        do_clear = ls & (ctx[:, 0:1] != blank)
        ctx = jnp.where(do_clear, jnp.int32(blank), ctx)
        need_dec = need_dec | do_clear

        sil_do = ls & (sil_s[:] == 0)
        evt_ops = evt_ops | jnp.where(sil_do, ev.OP_SILENCE, 0)
        sil_s[:] = jnp.where(ls, 1, sil_s[:])

        conf = bl & ~long_sil & confident
        stale_tok = (
            jnp.sum(
                jnp.where(pos == jnp.clip(head, 0, T - 1), words, 0),
                axis=1,
                keepdims=True,
            )
            & ((1 << FLAG_SHIFT) - 1)
        )
        dedup = (lastcall_s[:] == head + 1) & (stale_tok == max_idx)
        conf_emit = conf & ~dedup
        conf_mask = (pos == jnp.clip(head, 0, T - 1)) & conf_emit
        words = jnp.where(conf_mask, new_word, words)
        evt_ops = evt_ops | jnp.where(
            conf_emit, ev.OP_APPEND | ev.OP_PARTIAL | ev.OP_POP, 0
        )
        evt_tok = jnp.where(conf_emit, max_idx, evt_tok)
        evt_logprob = jnp.where(
            conf_emit, max_val - jnp.float32(conf_penalty), evt_logprob
        )
        evt_flags = jnp.where(conf_emit, tok_flags, evt_flags)
        lastcall_s[:] = jnp.where(conf_emit, head + 1, lastcall_s[:])

        bare = bl & ~long_sil & ~confident & (lastcall_s[:] != head)
        evt_ops = evt_ops | jnp.where(bare, ev.OP_PARTIAL, 0)
        lastcall_s[:] = jnp.where(bare, head, lastcall_s[:])

        # commit round
        ctx_s[:] = ctx
        words_s[:] = words
        head_s[:] = head
        nd_s[:] = need_dec.astype(jnp.float32)
        done = done | is_blank

        ev_ops[0, :, r : r + 1] = evt_ops
        ev_tok[0, :, r : r + 1] = evt_tok
        ev_logprob[0, :, r : r + 1] = evt_logprob
        ev_flags[0, :, r : r + 1] = evt_flags
        ev_time[0, :, r : r + 1] = evt_time
        ev_fink[0, :, r : r + 1] = evt_fink

    @pl.when(p == P - 1)
    def _fin():
        ctx_out[:] = ctx_s[:]
        dout_out[:] = dout_s[:]
        nd_out[:] = nd_s[:]
        words_out[:] = words_s[:]
        head_out[:] = head_s[:]
        lastcall_out[:] = lastcall_s[:]
        time_out[:] = time_s[:]
        lastemit_out[:] = lastemit_s[:]
        sil_out[:] = sil_s[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "blank_id",
        "stride_ms",
        "emit_ramp",
        "cfg_key",
        "block_s",
        "interpret",
    ),
)
def chunk_decode_fused(
    eouts,
    can,
    dstate,
    dec_table,
    dec_proj_t,
    dec_proj_b,
    w_t,
    b,
    tmask,
    *,
    blank_id: int,
    stride_ms: int,
    emit_ramp,
    cfg_key,
    block_s: int = 512,
    interpret: bool = False,
):
    """eouts [P, S, J], can [P, S] -> (dstate', events dict of [P, S, R]).

    `cfg_key` is a hashable tuple (punct_margin, conf_margin, conf_penalty,
    long_sil_ms, decay_ms, T) from DecodeConfig. State keys consumed and
    produced match decode/greedy.init_decode_state; `dout_init` passes
    through untouched.
    """
    punct_margin, conf_margin, conf_penalty, long_sil_ms, decay_ms, T = cfg_key
    P, S, J = eouts.shape
    V = w_t.shape[1]
    d = dec_table.shape[2]
    R = len(emit_ramp)
    Vp = -(-V // 128) * 128
    if Vp != V:
        w_t = jnp.pad(w_t, ((0, 0), (0, Vp - V)))
        b = jnp.pad(b, (0, Vp - V), constant_values=-1e30)
        dec_table = jnp.pad(dec_table, ((0, 0), (0, Vp - V), (0, 0)))
        tmask = jnp.pad(tmask, (0, Vp - V))
    grid = (S // block_s, P)

    def srow(i, p):
        return (i, 0)

    def pull(i, p):
        return (p, i, 0)

    def const(i, p):
        return (0, 0)

    kern = functools.partial(
        _chunk_decode_kernel,
        P,
        blank_id,
        V,
        T,
        stride_ms,
        tuple(emit_ramp),
        punct_margin,
        conf_margin,
        conf_penalty,
        long_sil_ms,
        decay_ms,
    )

    state_specs = [
        pl.BlockSpec((block_s, 2), srow, memory_space=pltpu.VMEM),  # ctx
        pl.BlockSpec((block_s, J), srow, memory_space=pltpu.VMEM),  # dout
        pl.BlockSpec((block_s, 1), srow, memory_space=pltpu.VMEM),  # need_dec
        pl.BlockSpec((block_s, T), srow, memory_space=pltpu.VMEM),  # words
        pl.BlockSpec((block_s, 1), srow, memory_space=pltpu.VMEM),  # head
        pl.BlockSpec((block_s, 1), srow, memory_space=pltpu.VMEM),  # last_call
        pl.BlockSpec((block_s, 1), srow, memory_space=pltpu.VMEM),  # time_ms
        pl.BlockSpec((block_s, 1), srow, memory_space=pltpu.VMEM),  # last_emit
        pl.BlockSpec((block_s, 1), srow, memory_space=pltpu.VMEM),  # emitted_sil
    ]
    ev_spec = pl.BlockSpec((1, block_s, R), pull, memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_s, J), pull, memory_space=pltpu.VMEM),  # eout
            pl.BlockSpec((1, block_s, 1), pull, memory_space=pltpu.VMEM),  # can
            *state_specs,
            pl.BlockSpec((Vp, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, J), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((J, Vp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), const, memory_space=pltpu.VMEM),  # tmask
        ],
        out_specs=(*state_specs, *([ev_spec] * 6)),
        out_shape=(
            jax.ShapeDtypeStruct((S, 2), jnp.int32),
            jax.ShapeDtypeStruct((S, J), jnp.float32),
            jax.ShapeDtypeStruct((S, 1), jnp.float32),
            jax.ShapeDtypeStruct((S, T), jnp.int32),
            jax.ShapeDtypeStruct((S, 1), jnp.int32),
            jax.ShapeDtypeStruct((S, 1), jnp.int32),
            jax.ShapeDtypeStruct((S, 1), jnp.int32),
            jax.ShapeDtypeStruct((S, 1), jnp.int32),
            jax.ShapeDtypeStruct((S, 1), jnp.int32),
            jax.ShapeDtypeStruct((P, S, R), jnp.int32),
            jax.ShapeDtypeStruct((P, S, R), jnp.int32),
            jax.ShapeDtypeStruct((P, S, R), jnp.float32),
            jax.ShapeDtypeStruct((P, S, R), jnp.int32),
            jax.ShapeDtypeStruct((P, S, R), jnp.int32),
            jax.ShapeDtypeStruct((P, S, R), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_s, 2), jnp.int32),
            pltpu.VMEM((block_s, J), jnp.float32),
            pltpu.VMEM((block_s, 1), jnp.float32),
            pltpu.VMEM((block_s, T), jnp.int32),
            pltpu.VMEM((block_s, 1), jnp.int32),
            pltpu.VMEM((block_s, 1), jnp.int32),
            pltpu.VMEM((block_s, 1), jnp.int32),
            pltpu.VMEM((block_s, 1), jnp.int32),
            pltpu.VMEM((block_s, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * S * P * R * (2 * Vp * d + d * J + J * Vp),
            bytes_accessed=(
                (2 * Vp * d + d * J + J * Vp) * 4
                + S * (P * (J + 1) + 2 * J + T + 16) * 4
                + S * P * R * 6 * 4
            ),
            transcendentals=S * P * R * J,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        eouts,
        can.astype(jnp.int32)[:, :, None],
        dstate["context"].astype(jnp.int32),
        dstate["dout"],
        dstate["need_dec"].astype(jnp.float32).reshape(S, 1),
        dstate["token_words"],
        dstate["head"].reshape(S, 1),
        dstate["last_call"].reshape(S, 1),
        dstate["time_ms"].reshape(S, 1),
        dstate["last_emit_ms"].reshape(S, 1),
        dstate["emitted_silence"].astype(jnp.int32).reshape(S, 1),
        dec_table[0],
        dec_table[1],
        dec_proj_t,
        dec_proj_b.reshape(1, -1),
        w_t,
        b.reshape(1, -1),
        jnp.asarray(tmask, jnp.int32).reshape(1, -1),
    )
    (
        ctx,
        dout,
        nd,
        words,
        head,
        last_call,
        time_ms,
        last_emit,
        sil,
        e_ops,
        e_tok,
        e_logprob,
        e_flags,
        e_time,
        e_fink,
    ) = outs
    state = dict(dstate)
    state.update(
        context=ctx,
        dout=dout,
        need_dec=nd[:, 0] != 0,
        token_words=words,
        head=head[:, 0],
        last_call=last_call[:, 0],
        time_ms=time_ms[:, 0],
        last_emit_ms=last_emit[:, 0],
        emitted_silence=sil[:, 0] != 0,
    )
    events = {
        "ops": e_ops,
        "tok": e_tok,
        "logprob": e_logprob,
        "flags": e_flags,
        "time_ms": e_time,
        "final_k": e_fink,
    }
    return state, events


def chunk_decode_supported(
    S: int, J: int, d: int, context: int, vocab: int, block_s: int = 512
) -> bool:
    """Geometry gate, mirroring joiner_pallas.dj_supported plus the event
    stream: 2-token context, whole session tiles, lane-tileable dims, and
    the vocab-resident operands under the VMEM budget."""
    if not (context == 2 and S % block_s == 0 and J % 128 == 0 and d % 128 == 0):
        return False
    Vp = -(-vocab // 128) * 128 if vocab else 0
    resident = 2 * Vp * d * 4 + J * Vp * 4 + d * J * 4 + block_s * (6 * J + 64) * 4
    return resident <= 56 * 1024 * 1024
