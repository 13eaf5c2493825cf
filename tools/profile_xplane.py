"""Per-op device-time attribution for the serving step from an xplane trace.

Traces a few chained engine steps, parses the xspace in-process
(jax.profiler.ProfileData), and aggregates device-plane event durations by
op name — the ground truth the knockout tool can only approximate.

Usage: python tools/profile_xplane.py [S] [chunk_samples] [arch]
"""

import re
import sys
import tempfile
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import build_runtime  # noqa: E402

from april_asr_tpu.config import EngineConfig  # noqa: E402
from april_asr_tpu.engine import build_engine, init_engine_state  # noqa: E402


def collect(log_dir):
    import glob
    import gzip
    import os

    paths = glob.glob(
        os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no xplane.pb under {log_dir}")
    path = max(paths, key=os.path.getmtime)
    data = open(path, "rb").read()
    if path.endswith(".gz"):
        data = gzip.decompress(data)
    return jax.profiler.ProfileData.from_serialized_xspace(data)


GROUPS = [
    ("lstm-rec", r"rec_core|lstm_rec|recurrent"),
    ("lstm-ffn", r"ffn|chunk_ffn|row_kernel"),
    ("fbank-dsp", r"fbank|logmel|dsp"),
    ("decode", r"joiner|argmax|decoder|decode"),
    ("conv-embed", r"conv"),
    ("fusion", r"^(loop_)?fusion"),
    ("copy", r"copy|bitcast|transpose|reshape"),
    ("dynamic", r"dynamic-(update-)?slice"),
]


def group_of(name):
    for g, pat in GROUPS:
        if re.search(pat, name):
            return g
    return "other"


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    arch = sys.argv[3] if len(sys.argv) > 3 else "lstm"
    rt = build_runtime(arch=arch)
    prog = build_engine(rt, batch=S, cfg=EngineConfig(chunk_samples=chunk))
    state = init_engine_state(prog)
    audio = jnp.asarray(
        (np.random.default_rng(0).normal(0, 0.2, (S, chunk)) * 20000).astype(
            np.int16
        )
    )
    n = jnp.full(S, chunk, jnp.int32)
    for _ in range(3):  # compile + settle
        state, ev = prog.step(rt.weights, state, audio, n)
    jax.block_until_ready(ev)

    log_dir = tempfile.mkdtemp(prefix="xplane_")
    NSTEP = 4
    with jax.profiler.trace(log_dir):
        for _ in range(NSTEP):
            state, ev = prog.step(rt.weights, state, audio, n)
        jax.block_until_ready(state)

    pd = collect(log_dir)
    per_op = defaultdict(float)
    per_plane = {}
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        tot = 0.0
        for line in plane.lines:
            # XLA op lines carry per-op events; durations in ns
            for evt in line.events:
                dur = evt.duration_ns / 1e6
                per_op[(line.name, evt.name)] += dur
                tot += dur
        per_plane[plane.name] = tot

    print(f"# planes: { {k: round(v, 1) for k, v in per_plane.items()} }")
    # aggregate over the XLA-op line (avoid double counting module+op lines):
    # pick the line with the most distinct names per plane
    by_line = defaultdict(lambda: defaultdict(float))
    for (ln, name), ms in per_op.items():
        by_line[ln][name] += ms
    best = max(by_line.items(), key=lambda kv: len(kv[1]), default=(None, {}))
    ln, ops = best
    total = sum(ops.values())
    print(f"# line '{ln}': {len(ops)} distinct ops, {total:.1f} ms total over {NSTEP} steps -> {total / NSTEP:.1f} ms/step")
    # group by SSA-name prefix: '%copy.251 = ...' -> 'copy',
    # '%ffn_norm_i8.12 = ...' -> 'ffn_norm_i8' (custom-call target)
    groups = defaultdict(lambda: [0.0, 0])
    for name, ms in ops.items():
        key = name.split(" = ")[0].lstrip("%")
        key = re.sub(r"[.\d]+$", "", key)
        groups[key][0] += ms
        groups[key][1] += 1
    for g, (ms, cnt) in sorted(groups.items(), key=lambda kv: -kv[1][0]):
        if ms / NSTEP < 0.05:
            continue
        print(f"{g:44s} {ms / NSTEP:8.2f} ms/step  x{cnt}")
    import os

    topn = int(os.environ.get("TOPN", "25"))
    flt = os.environ.get("OP_FILTER")
    items = sorted(ops.items(), key=lambda kv: -kv[1])
    if flt:
        items = [kv for kv in items if re.search(flt, kv[0])]
        print(f"# filter {flt!r}: {sum(ms for _, ms in items) / NSTEP:.2f} ms/step total")
    print(f"# top {topn} ops:")
    for name, ms in items[:topn]:
        print(f"  {ms / NSTEP:8.3f} ms/step  {name[:140]}")


if __name__ == "__main__":
    main()
