"""Tracing/profiling hooks (SURVEY.md §5).

The reference's only perf instrumentation is an inline realtime-factor
estimator (clock() around the encoder+joiner per 40 ms frame, EMA'd into
`speed_needed`, src/april_session.c:445-462) — which this framework mirrors
in api/session.py `get_rt_speedup`. The TPU-native equivalents here are the
XLA-level tools:

  * `trace(dir)` — context manager writing a jax.profiler trace (TensorBoard
    /Perfetto format): device timelines, per-HLO cost, fusion boundaries.
    Used by `april-serve --profile-dir` (first ticks) and
    `APRIL_BENCH_PROFILE=<dir> python bench.py` (the timed loop).
  * `annotate(name)` — host-side named region that shows up on the trace
    timeline (jax.profiler.TraceAnnotation), for bracketing host replay,
    staging, and dispatch phases.

Structured step metrics (sessions active, audio-s/s, RTF, queue depth,
CANT_KEEP_UP counts, tick latency percentiles) live in engine/batch.py
`BatchEngine.metrics`; this module is only the timeline-trace layer.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str):
    """Write a jax.profiler trace for the enclosed block into `log_dir`.

    View with TensorBoard's profile plugin or ui.perfetto.dev. Safe on any
    backend (CPU traces host + XLA:CPU activity)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host region on the profiler timeline (no-op overhead when no
    trace is active)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
