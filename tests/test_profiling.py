"""jax.profiler trace helpers (utils/profiling.py) produce real trace files."""

import os

import jax
import jax.numpy as jnp

from april_asr_tpu.utils.profiling import annotate, trace


def test_trace_writes_files(tmp_path):
    d = str(tmp_path / "prof")
    with trace(d):
        with annotate("work"):
            x = jax.jit(lambda a: (a * 2 + 1).sum())(jnp.arange(128.0))
            jax.block_until_ready(x)
    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(d)
        for f in fs
    ]
    assert any(f.endswith((".trace.json.gz", ".xplane.pb")) for f in files), files


def test_annotate_without_trace_is_noop():
    with annotate("idle"):
        pass
