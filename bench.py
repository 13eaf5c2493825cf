#!/usr/bin/env python
"""Throughput benchmark: concurrent streaming sessions on one chip.

Measures steady-state audio-seconds processed per wall-clock second for the
flagship model (reference dims: 12-layer LSTM 512/1024, vocab 500 —
src/april_model.h:35-41) across a batch of concurrent realtime sessions,
including the host event transfer + callback replay.

Baseline: the reference's design point is ~1x realtime per CPU thread
(april-docs/src/concepts.md:73-83; BASELINE.md), i.e. 1.0 audio-second/s —
vs_baseline is the speedup over that. North star: >=10,000 concurrent
realtime 16 kHz sessions per v5e host.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def build_runtime(bias_blank: float = 2.0, arch: str = "lstm"):
    """Flagship random-weight runtime with a realistic emission rate (blank
    logit biased up so emissions are sparse like real speech). `arch`
    selects the model family: the reference-dim LSTM transducer (default)
    or the streaming Conformer (APRIL_BENCH_ARCH=conformer)."""
    import jax

    from april_asr_tpu.api.model import _enable_compile_cache

    _enable_compile_cache()

    from april_asr_tpu.io.params import build_vocab_tables
    from april_asr_tpu.models import TransducerDims, init_transducer_params
    from april_asr_tpu.models.export import make_model_parameters
    from april_asr_tpu.models.loader import (
        ModelRuntime,
        _fbank_opts_from_params,
        _native_decoder_joiner,
        _native_joiner_argmax,
        _native_runtime_fns,
    )
    from april_asr_tpu.testing import default_tokens

    import jax.numpy as jnp

    from april_asr_tpu.models.lstm_transducer import (
        cast_weights,
        precompute_decoder_tables,
    )

    if arch == "conformer":
        from april_asr_tpu.models.conformer import (
            ConformerDims,
            conformer_encoder_chunk,
            conformer_encoder_embed,
            conformer_encoder_recurrent,
            conformer_encoder_step,
            init_conformer_params,
        )
        from april_asr_tpu.models.lstm_transducer import decoder_step, joiner_logits

        dims = ConformerDims()
        params = init_conformer_params(jax.random.PRNGKey(0), dims)
    else:
        dims = TransducerDims()
        params = init_transducer_params(jax.random.PRNGKey(0), dims)
    params["join_b"] = params["join_b"].at[0].add(bias_blank)
    params = precompute_decoder_tables(params, dims)
    prec = os.environ.get("APRIL_BENCH_PRECISION", "int8")
    if prec == "int8":
        # quantized serving path: per-channel int8 encoder matmuls on the
        # MXU's 2x-rate int8 mode (models/lstm_transducer.quantize_weights;
        # covers both the LSTM and Conformer families)
        from april_asr_tpu.models.lstm_transducer import quantize_weights

        params = cast_weights(quantize_weights(params), jnp.bfloat16)
    elif prec == "bf16":
        params = cast_weights(params, jnp.bfloat16)
    mp = make_model_parameters(dims, default_tokens(dims.vocab))

    if arch == "conformer":
        return ModelRuntime(
            name="conformer-bench", description="", language="en-us",
            params=mp, fbank_opts=_fbank_opts_from_params(mp),
            vocab=build_vocab_tables(mp), dims=dims, kind="native",
            weights=params,
            encoder_step=lambda w, x, h, c: conformer_encoder_step(w, x, h, c, dims),
            decoder_step=lambda w, ctx: decoder_step(w, ctx, dims),
            joiner=joiner_logits,
            state_shapes=dims.state_shapes,
            encoder_embed=conformer_encoder_embed,
            encoder_recurrent=lambda w, y, h, c, gate=None: conformer_encoder_recurrent(
                w, y, h, c, dims, gate
            ),
            encoder_chunk=lambda w, y, h, c, can: conformer_encoder_chunk(
                w, y, h, c, dims, can
            ),
            encoder_chunk_max_pulls=dims.att_context,
            joiner_argmax=_native_joiner_argmax(mp.blank_id),
        )

    from april_asr_tpu.models.loader import _lstm_embed_front, _native_split_fns

    enc, dec, joi = _native_runtime_fns(dims)
    embed, recur, chunk = _native_split_fns()
    return ModelRuntime(
        name="flagship-bench", description="", language="en-us",
        params=mp, fbank_opts=_fbank_opts_from_params(mp),
        vocab=build_vocab_tables(mp), dims=dims, kind="native",
        weights=params, encoder_step=enc, decoder_step=dec, joiner=joi,
        state_shapes=((dims.layers, dims.d_model), (dims.layers, dims.hidden)),
        encoder_embed=embed, encoder_recurrent=recur, encoder_chunk=chunk,
        # fused whole-front conv embed (ops/conv_embed_pallas.py) — the
        # loader wires this for real models; without it the engine falls
        # back to stacked windows + XLA convs (~10.5 ms of relayout copies
        # and conv fusions per step at S=4096, tools/profile_xplane.py)
        encoder_embed_front=_lstm_embed_front(),
        joiner_argmax=_native_joiner_argmax(mp.blank_id),
        decoder_joiner_argmax=_native_decoder_joiner(mp.blank_id, dims),
    )


def bench_batch(
    rt,
    S: int,
    steps: int = 20,
    warmup: int = 3,
    chunk_seconds: float = 0.2,
    interim=None,
    beam: int = 0,
):
    """Returns (audio_seconds_per_second, step_ms, events_per_step).

    The dispatch loop is pipelined with lag-1 event readback: step k+1 is
    dispatched before step k's packed event tensor is copied to host, so the
    ~40 ms per-dispatch round-trip of the remote TPU backend overlaps device
    compute (the state chain lives entirely on device). Host replay of step k
    runs while the device executes step k+1 — exactly what the serving engine
    does in pipelined mode.
    """
    import jax
    import jax.numpy as jnp

    from april_asr_tpu.config import EngineConfig
    from april_asr_tpu.engine import build_engine, init_engine_state
    from april_asr_tpu.engine.batch import replay_packed
    from april_asr_tpu.engine.replay import EventReplayer

    chunk = int(rt.sample_rate * chunk_seconds)
    audio_s_per_step = S * chunk / rt.sample_rate
    if beam:
        # beam serving rung (VERDICT r4 task 3): the beam engine's jitted
        # step has the same (weights, state, audio, n) contract; events are
        # dense [S, P, 4+win] best-hypothesis window rows replayed per slot
        from april_asr_tpu.decode.beam import BeamConfig
        from april_asr_tpu.engine.beam_engine import (
            BeamReplayer,
            build_beam_engine,
            init_beam_engine_state,
        )

        prog = build_beam_engine(
            rt, S, EngineConfig(chunk_samples=chunk), BeamConfig(beam=beam)
        )
        state = init_beam_engine_state(prog)
    else:
        prog = build_engine(rt, batch=S, cfg=EngineConfig(chunk_samples=chunk))
        state = init_engine_state(prog)

    # 8 distinct tone-burst buffers cycled through the run so emissions stay
    # at a realistic sustained rate (identical repeated audio lets every
    # session settle into permanent silence, which would understate decode +
    # replay cost). Buffers are pre-staged on device: the audio payload is
    # 32 kB/s per session (3 ms per step over PCIe at S=1024), but this
    # environment reaches the chip through a ~23 MB/s tunnel that would
    # swamp the measurement with an artifact of the test harness.
    rng = np.random.default_rng(0)
    t = np.arange(chunk) / rt.sample_rate
    bufs = []
    for i in range(8):
        gate = (np.sin(2 * np.pi * 1.3 * t + i) > -0.2).astype(np.float32)
        base = 0.35 * np.sin(2 * np.pi * (180 + 60 * i) * t) * gate
        bufs.append(
            jnp.asarray(
                ((base[None, :] + rng.normal(0, 0.05, size=(S, chunk))) * 20000).astype(
                    np.int16
                )
            )
        )
    jax.block_until_ready(bufs)
    n = jnp.full(S, chunk, jnp.int32)

    sink = []

    if beam:
        from april_asr_tpu.engine.beam_engine import replay_rows

        replayers = [
            BeamReplayer(rt.params, rt.vocab, lambda r, toks: sink.append(r))
            for _ in range(S)
        ]

        def replay(rows):
            return replay_rows(rows, replayers)
    else:
        class _BenchSlot:
            __slots__ = ("replayer",)

            def __init__(self):
                self.replayer = EventReplayer(rt.params, lambda r, toks: sink.append(r))

        slots = [_BenchSlot() for _ in range(S)]

        def replay(packed):
            return replay_packed(packed, slots)

    # Warmup doubles as the compile step; heartbeat each one so a parent
    # staring at a silent child can tell compile from a wedged transport.
    for i in range(warmup):
        t_w = time.perf_counter()
        state, events = prog.step(rt.weights, state, bufs[i % 8], n)
        jax.block_until_ready(events)
        print(
            f"# warmup {i + 1}/{warmup} done in {time.perf_counter() - t_w:.1f}s"
            + (" (includes compile)" if i == 0 else ""),
            file=sys.stderr,
            flush=True,
        )

    import contextlib

    from april_asr_tpu.utils.profiling import annotate, trace

    prof_dir = os.environ.get("APRIL_BENCH_PROFILE")
    prof = trace(prof_dir) if prof_dir else contextlib.nullcontext()

    n_events = 0
    prev = None
    lat = []  # per-step partial-result latency: dispatch -> events replayed
    durs = []  # per-iteration wall time (dispatch + lag-1 replay of prev)
    t_disp = None

    # Watchdog: a wedged transport can stall ONE dispatch for many minutes
    # (observed: 530+ s), starving the interim salvage entirely. This
    # daemon thread re-emits the latest measured stats every 20 s so a
    # parent-side timeout still finds a result line as long as at least one
    # step ever completed.
    if interim is not None:
        import threading

        def _watchdog():
            last = 0
            while True:
                time.sleep(20.0)
                if len(lat) and len(lat) == last:
                    interim(list(durs), list(lat), n_events, len(durs))
                last = len(lat)

        threading.Thread(target=_watchdog, daemon=True).start()

    with prof:
        t0 = time.perf_counter()
        t_iter = t0
        for i in range(steps):
            with annotate("dispatch"):
                state, events = prog.step(rt.weights, state, bufs[i % 8], n)
            t_new = time.perf_counter()
            if prev is not None:
                with annotate("host_replay"):
                    n_events += replay(prev)  # lag-1: overlaps device compute
                lat.append(time.perf_counter() - t_disp)
            prev, t_disp = events, t_new
            t_now = time.perf_counter()
            durs.append(t_now - t_iter)
            t_iter = t_now
            # salvage path: a transport stall or parent-side timeout must not
            # lose the config — report running medians from the FIRST step
            # with a latency sample (round 2 lost its number because the
            # first interim waited for 3 measured steps that never came)
            if interim is not None and lat and (i < 6 or (i + 1) % 3 == 0):
                interim(durs, lat, n_events, i + 1)
        n_events += replay(prev)
        lat.append(time.perf_counter() - t_disp)
        dt = time.perf_counter() - t0

    # bank the measured result BEFORE the device probe: a transport stall
    # inside the probe must not lose the rung (the first run of round 5 lost
    # its three big rungs to exactly this — the probe then used 4-deep
    # chained dispatch, which deterministically wedged the remote transport
    # at S>=4096; warmup's 1-in-flight pattern never did)
    if interim is not None:
        interim(durs, lat, n_events, steps)

    # Device-step probe (VERDICT r4 weak #1): single-in-flight dispatches
    # blocked on the carried STATE only — no event-blob transfer — so the
    # wall time is device step + dispatch ack, with the multi-MB readback
    # excluded. Reported as a (p50, max) pair; it upper-bounds pure device
    # time by one transport ack (~sub-ms measured on this tunnel when idle).
    # Each blocked dispatch also carries one full transport round trip that
    # has nothing to do with the chip — on this tunnel the RTT is sub-ms
    # when idle but tens of ms at congested hours, which at small S can
    # exceed the device step itself. Measure the RTT floor the same way
    # (trivial jitted no-op on a device-resident array, single-in-flight)
    # and subtract its median, so device_step_ms is hour-independent.
    # NB: jax.block_until_ready is NOT a completion barrier on this remote
    # backend (observed returning in 0.1 ms with tens of seconds of queued
    # work still in flight) — a scalar element readback is the only reliable
    # sync, so both probes force one. The extra slice+transfer round trip is
    # identical in both and cancels in the subtraction.
    def _sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(jnp.ravel(leaf)[0])

    device_step_ms = None
    try:
        tiny = jnp.arange(8, dtype=jnp.int32)
        f_noop = jax.jit(lambda x: x + 1)
        _sync(f_noop(tiny))  # compile
        rtts = []
        for _ in range(9):
            t_c = time.perf_counter()
            _sync(f_noop(tiny))
            rtts.append((time.perf_counter() - t_c) * 1000.0)
        rtt_ms = float(np.median(rtts))
        dev = []
        for j in range(5):
            t_c = time.perf_counter()
            state, _ev = prog.step(rt.weights, state, bufs[j % 8], n)
            _sync(state)
            dev.append((time.perf_counter() - t_c) * 1000.0)
        # a transport stall inside the 5-sample probe would otherwise land in
        # the reported max; drop samples the stall rule flags (same rule as
        # the latency stats) before taking it
        med = float(np.median(dev))
        clean = [d for d in dev if d <= max(5.0 * med, med + 500.0)] or dev
        device_step_ms = (
            max(med - rtt_ms, 0.0),
            max(float(np.max(clean)) - rtt_ms, 0.0),
            rtt_ms,
        )
    except Exception:
        pass

    return _stats(audio_s_per_step, durs, lat, n_events, steps, dt, device_step_ms)


def _stats(audio_s_per_step, durs, lat, n_events, steps, dt, device_step_ms=None):
    # Median step time is the throughput basis: the remote TPU service here
    # intermittently stalls a single dispatch for seconds-to-minutes, which
    # says nothing about the chip's steady-state rate. The mean is reported
    # alongside so stalls stay visible.
    step_ms = float(np.median(durs)) * 1000.0
    mean_ms = dt / max(steps, 1) * 1000.0
    # Latency percentiles over STALL-FREE windows: a dispatch that the remote
    # service wedges for seconds-to-minutes is a transport artifact, not an
    # SLA property of the engine; mixing it into p99 makes the number
    # meaningless (round 1 reported p99 = 439,817 ms from one such stall).
    # A window counts as a stall when it exceeds max(10x median, median+500ms);
    # stalls are reported separately as a count + worst duration.
    med = float(np.median(lat))
    stall_cut = max(10.0 * med, med + 0.5)
    clean = [x for x in lat if x <= stall_cut]
    stalls = [x for x in lat if x > stall_cut]
    p50, p99 = (float(np.percentile(clean, q)) * 1000.0 for q in (50, 99))
    # wall p99 over ALL windows, stalls included — so a reader of the JSON
    # can tell the chip's tail (device_step_ms / p99) from the harness's
    wall_p99 = float(np.percentile(lat, 99)) * 1000.0
    return (
        audio_s_per_step / (step_ms / 1000.0),
        step_ms,
        n_events / max(steps, 1),
        (p50, p99, len(stalls), max(stalls) * 1000.0 if stalls else 0.0),
        mean_ms,
        wall_p99,
        device_step_ms,
    )


def _run_one(S: int, chunk_s: float, steps: int, arch: str) -> dict:
    plat = os.environ.get("APRIL_BENCH_PLATFORM")
    if plat:
        # this box's sitecustomize force-registers the TPU platform; the
        # config update (not the env var) is what actually moves backends
        import jax

        jax.config.update("jax_platforms", plat)
    prec = os.environ.get("APRIL_BENCH_PRECISION", "int8")
    # arch 'beam<K>' = LSTM runtime decoded by the K-wide streaming beam
    # engine (engine/beam_engine.py)
    beam = 0
    family = arch
    if arch.startswith("beam"):
        beam = int(arch[4:] or "4")
        family = "lstm"
    print(
        f"# building runtime: arch={arch} precision={prec} S={S} chunk={chunk_s}s",
        file=sys.stderr,
        flush=True,
    )
    t_b = time.perf_counter()
    rt = build_runtime(arch=family)
    print(
        f"# runtime built in {time.perf_counter() - t_b:.1f}s; compiling engine",
        file=sys.stderr,
        flush=True,
    )
    audio_s_per_step = S * chunk_s

    def _hbm():
        # HBM headroom evidence for the concurrency rungs; not all remote
        # backends expose memory_stats, so absence is reported as None
        try:
            import jax

            st = jax.local_devices()[0].memory_stats() or {}
            used = st.get("peak_bytes_in_use", st.get("bytes_in_use"))
            lim = st.get("bytes_limit")
            if used is not None:
                return round(used / 2**30, 2), (
                    round(lim / 2**30, 2) if lim else None
                )
        except Exception:
            pass
        return None, None

    # model-FLOPs accounting (VERDICT r4 task 1): GFLOP per audio-second
    # from the architecture dims; MFU = sustained TFLOP/s / chip peak at
    # the active precision (utils/flops.py documents the counting rules)
    from april_asr_tpu.utils.flops import (
        chip_peak_tflops,
        model_gflops_per_audio_second,
    )

    gfa = model_gflops_per_audio_second(rt.dims, family, beam=max(beam, 1))
    peak = chip_peak_tflops("int8" if prec == "int8" else "bf16")

    def pack(res, done):
        thr, step_ms, evps, (p50, p99, n_stalls, max_stall), mean_ms = res[:5]
        wall_p99 = res[5] if len(res) > 5 else None
        dev = res[6] if len(res) > 6 else None
        hbm_used, hbm_lim = _hbm()
        r = {
            "S": S, "chunk_s": chunk_s, "thr": thr, "step_ms": step_ms,
            "evps": evps, "p50": p50, "p99": p99, "mean_ms": mean_ms,
            "stalls": n_stalls, "max_stall_ms": max_stall, "steps_done": done,
            "arch": arch, "precision": prec,
            "hbm_used_gib": hbm_used, "hbm_limit_gib": hbm_lim,
            # >= 1x realtime for every one of the S concurrent sessions
            "realtime": bool(thr >= S),
            "gflop_per_audio_s": round(gfa, 3),
            "model_tflops": round(gfa * thr / 1000.0, 1),
            "chip_peak_tflops": peak,
            "mfu": round(gfa * thr / 1000.0 / peak, 4),
            "wall_p99_ms": None if wall_p99 is None else round(wall_p99, 1),
        }
        if dev is not None and dev[0] > 0:
            dev_thr = audio_s_per_step / (dev[0] / 1000.0)
            dev_mfu = gfa * dev_thr / 1000.0 / peak
            rtt = dev[2] if len(dev) > 2 else 0.0
            # Credibility guard: the probe is wall-time minus the tunnel RTT
            # median, so when the device step is small relative to the RTT
            # the residual is jitter, not chip time (observed: a ~16 ms step
            # at S=256 reporting 1.5 ms -> device MFU 186%). Publish device
            # fields only when the residual is at least 20% of the raw
            # blocked-dispatch wall AND the implied device MFU is physical;
            # otherwise record the raw probe values, flagged unreliable.
            credible = dev_mfu < 1.0 and dev[0] >= 0.2 * (dev[0] + rtt)
            if credible:
                r.update(
                    device_step_ms_p50=round(dev[0], 2),
                    device_step_ms_p99=round(dev[1], 2),
                    device_mfu=round(dev_mfu, 4),
                )
            else:
                r["device_probe_unreliable"] = {
                    "device_step_ms_p50": round(dev[0], 2),
                    "device_step_ms_p99": round(dev[1], 2),
                }
            if len(dev) > 2:
                # the transport round trip subtracted from the probe (see
                # bench_batch) — kept in the record so a reader can see how
                # much of the raw blocked-dispatch wall was tunnel, not chip
                r["transport_rtt_ms"] = round(dev[2], 2)
        return r

    def interim(durs, lat, n_events, done):
        # printed + flushed so a parent-side timeout can still salvage a
        # measured number for this config from the last interim line
        r = pack(_stats(audio_s_per_step, durs, lat, n_events, done, sum(durs)), done)
        print(json.dumps(r), flush=True)

    res = bench_batch(
        rt, S, steps=steps, chunk_seconds=chunk_s, interim=interim, beam=beam
    )
    return pack(res, steps)


def _run_one_subprocess(
    S: int, chunk_s: float, timeout_s: float, arch: str, steps: int | None = None
) -> dict | None:
    """Run one config in a child process so a wedged backend compile (the
    remote TPU service here can hang indefinitely) cannot take down the
    whole benchmark — the child is killed at the timeout and the remaining
    configs still run."""
    import subprocess

    global _child
    env = dict(os.environ)
    if steps is not None:
        env["APRIL_BENCH_STEPS"] = str(steps)
    proc = subprocess.Popen(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--one",
            str(S),
            str(chunk_s),
            arch,
        ],
        stdout=subprocess.PIPE,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        env=env,
    )
    _child = proc
    timed_out = False
    try:
        out, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        timed_out = True
        # SIGTERM first: give a child whose main thread is wedged in a
        # blocked transport call a moment to flush buffered interim lines
        # (the watchdog thread keeps emitting them); SIGKILL as backstop
        proc.terminate()
        try:
            out, _ = proc.communicate(timeout=5)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()  # salvage buffered interim lines
        print(
            f"# config ({S},{chunk_s}) timed out after {timeout_s:.0f}s"
            " (salvaging interim measurements)",
            file=sys.stderr,
        )
    finally:
        _child = None
    if not timed_out and proc.returncode != 0:
        print(f"# config ({S},{chunk_s}) exited {proc.returncode}", file=sys.stderr)
        return None
    for line in (out or b"").decode(errors="replace").splitlines()[::-1]:
        if line.startswith("{"):
            r = json.loads(line)
            if timed_out:
                r["timed_out"] = True
            return r
    print(f"# config ({S},{chunk_s}) produced no result line", file=sys.stderr)
    return None


_results: list = []  # accumulated per-config results for the final JSON line
_arch = "lstm"
_emitted = False
_child = None  # in-flight per-config subprocess, killed on SIGTERM


def _emit_summary():
    """Print the ONE official JSON line from whatever results exist so far.

    Called on the normal path, and from the SIGTERM/SIGALRM handlers so that
    even a driver-side kill still records an official number (round 1 lost
    its 26k audio-s/s result to exactly this: rc=124, parsed null)."""
    global _emitted
    if _emitted:
        return
    _emitted = True
    best = max(_results, key=lambda r: r["thr"], default=None)
    if best is None:
        print(
            json.dumps(
                {
                    "metric": "audio_seconds_per_second_per_chip (no config finished)",
                    "value": 0.0,
                    "unit": "audio-s/s",
                    "vs_baseline": 0.0,
                }
            ),
            flush=True,
        )
        return
    fam = (
        "streaming Conformer"
        if best.get("arch", _arch) == "conformer"
        else "LSTM"
    )
    lowlat = min(_results, key=lambda r: (r["chunk_s"], r["p50"]))
    extra = ""
    # INTERACTIVE north star: >=10,240 sessions at sub-second cadence with
    # p99 partial latency under one chunk time (VERDICT r4 task 2)
    inter = [
        r for r in _results
        if r["S"] >= 10240 and r["chunk_s"] < 1.0 and r.get("realtime")
        and r["p99"] < r["chunk_s"] * 1000.0
    ]
    if inter:
        ir = max(inter, key=lambda r: r["S"])
        extra += (
            f"; interactive north star: {ir['S']:,} sessions at "
            f"{ir['chunk_s']*1000:.0f} ms chunks, p99 partial "
            f"{ir['p99']:.0f} ms < chunk ({ir['step_ms']:.0f} ms step)"
        )
    # north-star concurrency demo: the largest S that sustained >= 1x
    # realtime for every session (audio-s/s >= S)
    rt_rungs = [r for r in _results if r.get("realtime")]
    if rt_rungs:
        ns = max(rt_rungs, key=lambda r: r["S"])
        if ns["S"] > 2048:
            hbm = (
                f", HBM {ns['hbm_used_gib']}"
                + (f"/{ns['hbm_limit_gib']}" if ns.get("hbm_limit_gib") else "")
                + " GiB"
                if ns.get("hbm_used_gib") is not None
                else ""
            )
            extra += (
                f"; north star: {ns['S']:,} concurrent sessions at "
                f"{ns['thr']/ns['S']:.2f}x realtime ({ns['step_ms']:.0f} ms "
                f"step / {ns['chunk_s']:g} s chunk, p99 {ns['p99']:.0f} ms"
                f"{hbm})"
            )
    if lowlat is not best and lowlat["chunk_s"] < best["chunk_s"]:
        extra += (
            f"; low-latency point: {lowlat['thr']:,.0f} audio-s/s at "
            f"{lowlat['chunk_s']*1000:.0f} ms chunks, p50 {lowlat['p50']:.0f} ms"
        )
    conf = [r for r in _results if r.get("arch") == "conformer"]
    if conf and best.get("arch") != "conformer":
        ob = max(conf, key=lambda r: r["thr"])
        extra += (
            f"; Conformer family: {ob['thr']:,.0f} audio-s/s at S={ob['S']}, "
            f"p50 {ob['p50']:.0f} ms"
        )
    beams = [r for r in _results if str(r.get("arch", "")).startswith("beam")]
    if beams:
        bb = max(beams, key=lambda r: r["thr"])
        extra += (
            f"; beam={bb['arch'][4:]}: {bb['thr']:,.0f} audio-s/s at "
            f"S={bb['S']} ({bb['step_ms']:.0f} ms step)"
        )
    mfu_bits = ""
    if best.get("mfu") is not None:
        mfu_bits = (
            f"; MFU {best['mfu']*100:.1f}% of {best['chip_peak_tflops']:.0f} "
            f"TFLOP/s {best.get('precision','')} peak"
            + (
                f", device step {best['device_step_ms_p50']:.0f} ms "
                f"-> {best['device_mfu']*100:.1f}% device MFU"
                if best.get("device_step_ms_p50") is not None
                else ""
            )
        )
    out = {
        "metric": (
            f"audio_seconds_per_second_per_chip (flagship {fam} transducer, "
            f"{best['S']} concurrent streaming sessions, lag-1 pipelined "
            f"dispatch incl. host event replay; {best['step_ms']:.0f} ms per "
            f"{best['chunk_s']:.1f} s chunk, partial p50 {best['p50']:.0f} ms "
            f"/ p99 {best['p99']:.0f} ms{mfu_bits}{extra})"
        ),
        "value": round(best["thr"], 1),
        "unit": "audio-s/s",
        "vs_baseline": round(best["thr"] / 1.0, 1),
        # structured record (VERDICT r4 tasks 1-3, weak #1): per-rung dicts
        # incl. mfu / device_step_ms_p50/p99 / wall_p99_ms / stall counts,
        # machine-readable for tools/update_readme_numbers.py
        "mfu": best.get("mfu"),
        "device_step_ms_p50": best.get("device_step_ms_p50"),
        "device_step_ms_p99": best.get("device_step_ms_p99"),
        "wall_p99_ms": best.get("wall_p99_ms"),
        "rungs": _results,
    }
    print(json.dumps(out), flush=True)


def main():
    # Config ladder (S, chunk_seconds, arch): opens with a config that
    # compiles in about a minute so the FIRST official number never depends
    # on the most expensive compile (rounds 1+2 both lost their numbers to
    # compile-time starvation of the big config). Then the throughput point
    # (1 s chunks), the low-latency serving point (200 ms chunks — reference
    # cadence, april_session.c:515 SEGSIZE), and the second model family.
    default_arch = os.environ.get("APRIL_BENCH_ARCH", "lstm")
    # Every rung earns its slot (the remote tunnel wedges a dispatch for
    # minutes at random, so any config can burn its whole timeout — a lean
    # ladder is what lets the summary keep all four clauses):
    #   256    — insurance: compiles in ~1 min, banks the first number
    #   12288  — THE north-star rung (BASELINE.md: >=10,000 concurrent
    #            realtime sessions; >=1x realtime means audio-s/s >= S);
    #            retried at the end if it fails and budget remains
    #   4096   — throughput record holder (S=2048 is transfer-bound through
    #            the tunnel: ~65 ms wall vs ~57 ms device; 4096 amortizes
    #            the readback; 8192 measured within ~3% of it)
    #   2048/0.2 — low-latency serving point (reference 200 ms cadence,
    #            april_session.c:515 SEGSIZE)
    #   1024 conformer — second model family
    #   10240/0.5 — INTERACTIVE north star (VERDICT r4 task 2): >=10,240
    #            concurrent sessions at sub-second cadence with p99 partial
    #            latency under one chunk time
    #   2048 conformer — the second family's saturation rung (task 6)
    #   1024 beam4 — streaming beam serving cost next to greedy (task 3)
    NORTH_STAR = (12288, 1.0, default_arch)
    INTERACTIVE = (10240, 0.5, default_arch)
    configs = [
        (256, 1.0, default_arch),
        INTERACTIVE,
        NORTH_STAR,
        (4096, 1.0, default_arch),
        (2048, 0.2, default_arch),
        (2048, 1.0, "conformer" if default_arch == "lstm" else default_arch),
        # beam rung at S=512: the per-pull fused int8 kernel's scoped-VMEM
        # allocation overflows at S=1024 inside the beam engine's nested
        # while structure (XLA AOT: 17.29M > 16M limit); scale-out for beam
        # is the DP mesh (engine/beam_engine.py), not bigger per-chip S
        (512, 1.0, "beam4" if default_arch == "lstm" else default_arch),
    ]
    if "APRIL_BENCH_BATCHES" in os.environ:
        configs = [
            (int(x), float(os.environ.get("APRIL_BENCH_CHUNK_S", "1.0")), default_arch)
            for x in os.environ["APRIL_BENCH_BATCHES"].split(",")
        ]
    steps = int(os.environ.get("APRIL_BENCH_STEPS", "20"))

    if len(sys.argv) >= 4 and sys.argv[1] == "--one":
        arch = sys.argv[4] if len(sys.argv) > 4 else default_arch
        r = _run_one(int(sys.argv[2]), float(sys.argv[3]), steps, arch)
        print(json.dumps(r))
        return

    inproc = os.environ.get("APRIL_BENCH_INPROC", "0") == "1"
    timeout_s = float(os.environ.get("APRIL_BENCH_CONFIG_TIMEOUT_S", "540"))
    retries = int(os.environ.get("APRIL_BENCH_RETRIES", "0"))
    # Global wall-clock deadline (worst case = 2 configs x 540 s = 18 min,
    # under this cap): past it, no new config is launched and the summary
    # emits from what's done.
    deadline = time.monotonic() + float(
        os.environ.get("APRIL_BENCH_DEADLINE_S", "1680")
    )

    import signal

    def _on_term(signum, frame):
        print(f"# signal {signum}: emitting summary and exiting", file=sys.stderr)
        if _child is not None:
            try:
                _child.kill()
            except Exception:
                pass
        _emit_summary()
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    def run_config(S, chunk_s, arch):
        remaining = deadline - time.monotonic()
        # the insurance config (first rung) must finish; later rungs only
        # launch when they could plausibly complete AND a number is already
        # banked (never risk the official line on an expensive compile)
        if remaining < 60 or (_results and remaining < 120):
            print(f"# deadline reached, skipping ({S},{chunk_s})", file=sys.stderr)
            return
        # big rungs: fewer timed steps (a per-step tunnel stall costs
        # seconds-to-minutes and the median needs ~10 samples, not 20) and a
        # capped timeout so ONE wedged attempt cannot starve every later rung
        # (observed: the 12288 rung burning its full 540 s left the 4096 /
        # low-latency / conformer rungs unmeasured)
        cfg_steps = min(steps, 10) if S >= 8192 else steps
        cfg_timeout = min(timeout_s, 420.0) if S >= 8192 else timeout_s
        r = None
        for attempt in range(1 + retries):
            if inproc:
                try:
                    r = _run_one(S, chunk_s, cfg_steps, arch)
                except Exception as e:
                    print(
                        f"# config ({S},{chunk_s}) failed: {type(e).__name__}: {e}",
                        file=sys.stderr,
                    )
                    r = None
            else:
                r = _run_one_subprocess(
                    S, chunk_s, min(cfg_timeout, remaining), arch,
                    steps=cfg_steps,
                )
            if r is not None:
                break
            if attempt < retries:
                print(f"# retrying config ({S},{chunk_s})", file=sys.stderr)
        if r is None:
            return
        hbm = (
            f", HBM {r['hbm_used_gib']} GiB"
            if r.get("hbm_used_gib") is not None
            else ""
        )
        print(
            f"# batch={S} chunk={chunk_s}s: {r['thr']:,.0f} audio-s/s "
            f"({r['thr']/S:.2f}x realtime/session), "
            f"step {r['step_ms']:.1f} ms (mean {r.get('mean_ms', r['step_ms']):.1f}), "
            f"{r['evps']:.0f} events/step, "
            f"partial latency p50 {r['p50']:.0f} ms / p99 {r['p99']:.0f} ms "
            f"({r.get('stalls', 0)} transport stalls, worst "
            f"{r.get('max_stall_ms', 0.0):.0f} ms){hbm} "
            f"(+ up to {chunk_s*1000:.0f} ms staging)",
            file=sys.stderr,
        )
        _results.append(r)

    for S, chunk_s, arch in configs:
        run_config(S, chunk_s, arch)

    # the north-star rung gets a second chance at the end: its failure mode
    # is a randomly wedged tunnel, not the chip, and the demo (>=10,240
    # concurrent realtime sessions) is the one clause a retry can rescue
    if (
        "APRIL_BENCH_BATCHES" not in os.environ
        and not any(r.get("realtime") and r["S"] >= 10240 for r in _results)
        and deadline - time.monotonic() >= 240
    ):
        print("# retrying the north-star rung with leftover budget", file=sys.stderr)
        run_config(*NORTH_STAR)

    _emit_summary()


if __name__ == "__main__":
    main()
