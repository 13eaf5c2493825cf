"""Real multi-process execution: 2 jax.distributed processes, one engine.

Spawns two OS processes (4 virtual CPU devices each), brings up the JAX
distributed runtime via `init_distributed`, builds one 8-device global mesh,
and runs the batched serving engine with per-host audio staging restricted
to `local_slot_range` — ingest never crosses hosts; GSPMD assembles the
global step from per-process shards. Each host replays only its addressable
event shards into its own slots.

The combined callback streams from both hosts must equal a single-process
run of the same engine on the same audio (the multihost path was previously
untested logic — SURVEY.md §2.4 distributed backend)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")

WORKER = r"""
import json, os, sys

port, pid_, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "1"
mpar = 1 if mode == "pp" else int(mode)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax

jax.config.update("jax_platforms", "cpu")

from april_asr_tpu.parallel import init_distributed, local_slot_range, make_mesh

init_distributed(f"localhost:{port}", 2, pid_)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import numpy as np

from april_asr_tpu.engine import BatchEngine
from april_asr_tpu.io.params import build_vocab_tables
from april_asr_tpu.models import TransducerDims, init_transducer_params
from april_asr_tpu.models.export import make_model_parameters
from april_asr_tpu.models.loader import (
    ModelRuntime, _fbank_opts_from_params, _native_runtime_fns,
)
from april_asr_tpu.testing import default_tokens

DIMS = TransducerDims(
    mel=80, segment_size=9, segment_step=4, d_model=32, hidden=64, ffn=64,
    joiner_dim=32, vocab=64, layers=2, context=2, decoder_groups=8,
    conv_channels=(4, 8, 8),
)
params = {
    k: np.asarray(v)
    for k, v in init_transducer_params(jax.random.PRNGKey(0), DIMS).items()
}
mp = make_model_parameters(DIMS, default_tokens(DIMS.vocab))
enc, dec, joi = _native_runtime_fns(DIMS)
rt = ModelRuntime(
    name="mh", description="", language="en", params=mp,
    fbank_opts=_fbank_opts_from_params(mp), vocab=build_vocab_tables(mp),
    dims=DIMS, kind="native", weights=params, encoder_step=enc,
    decoder_step=dec, joiner=joi,
    state_shapes=((DIMS.layers, DIMS.d_model), (DIMS.layers, DIMS.hidden)),
)

S = 8
if mode == "pp":
    # 2-process pipeline-stage mesh: (data=4, stage=2); each stage slab of
    # the layer stack lives on devices spanning BOTH processes' rows
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "stage"))
else:
    mesh = make_mesh(model_parallel=mpar)
eng = BatchEngine(rt, batch=S, mesh=mesh)
if mode == "pp":
    assert eng.prog.tp_family == "pipeline", eng.prog.tp_family
elif mpar > 1:
    # must have routed through the multi-process shard_map TP placement
    # (gate-shuffled weights materialized via jit out_shardings)
    assert eng.prog.tp_axes == ("model",), eng.prog.tp_axes
lo, hi = local_slot_range(S, mesh)
assert hi - lo == 4, (lo, hi)

streams = [[] for _ in range(S)]


def mk(i):
    return lambda r, toks: streams[i].append(
        (r, [[t.token_id, t.flags, t.time_ms] for t in toks])
    )


# every host allocates ALL slots in the same order: the per-slot state reset
# is a collective jitted program, so allocation must run in lockstep
for i in range(S):
    eng.alloc(mk(i))

rng = np.random.default_rng(3)
audio = (rng.normal(0, 0.15, size=(S, 9600)) * 20000).astype(np.int16)
for off in range(0, 9600, 3200):
    for i in range(lo, hi):  # stage only the slots this host owns
        eng.feed(i, audio[i, off : off + 3200])
    while eng.tick():
        pass
eng.flush(np.ones(S, bool))

with open(out_path, "w") as f:
    json.dump({"pid": pid_, "lo": lo, "hi": hi, "streams": streams[lo:hi]}, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_process(tmp_path, model_parallel):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # the worker script lives in tmp_path, so Python puts THAT dir (not the
    # cwd) on sys.path — the repo must be importable explicitly
    env["PYTHONPATH"] = os.path.abspath(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    procs, outs = [], []
    for pid_ in range(2):
        out = tmp_path / f"out{pid_}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), str(port), str(pid_), str(out),
                 str(model_parallel)],
                cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        logs.append(stdout.decode(errors="replace"))
    for p, log_text in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log_text[-4000:]}"

    results = [json.load(open(o)) for o in outs]
    results.sort(key=lambda r: r["pid"])
    assert results[0]["lo"] == 0 and results[0]["hi"] == 4
    assert results[1]["lo"] == 4 and results[1]["hi"] == 8
    combined = results[0]["streams"] + results[1]["streams"]
    assert all(len(s) > 0 for s in combined), "a host produced no callbacks"

    # single-process reference on the same audio (8 local CPU devices here)
    import jax

    from april_asr_tpu.engine import BatchEngine
    from april_asr_tpu.io.params import build_vocab_tables
    from april_asr_tpu.models import TransducerDims, init_transducer_params
    from april_asr_tpu.models.export import make_model_parameters
    from april_asr_tpu.models.loader import (
        ModelRuntime, _fbank_opts_from_params, _native_runtime_fns,
    )
    from april_asr_tpu.testing import default_tokens

    DIMS = TransducerDims(
        mel=80, segment_size=9, segment_step=4, d_model=32, hidden=64, ffn=64,
        joiner_dim=32, vocab=64, layers=2, context=2, decoder_groups=8,
        conv_channels=(4, 8, 8),
    )
    params = {
        k: np.asarray(v)
        for k, v in init_transducer_params(jax.random.PRNGKey(0), DIMS).items()
    }
    mp = make_model_parameters(DIMS, default_tokens(DIMS.vocab))
    enc, dec, joi = _native_runtime_fns(DIMS)
    rt = ModelRuntime(
        name="mh", description="", language="en", params=mp,
        fbank_opts=_fbank_opts_from_params(mp), vocab=build_vocab_tables(mp),
        dims=DIMS, kind="native", weights=params, encoder_step=enc,
        decoder_step=dec, joiner=joi,
        state_shapes=((DIMS.layers, DIMS.d_model), (DIMS.layers, DIMS.hidden)),
    )
    S = 8
    eng = BatchEngine(rt, batch=S)
    ref = [[] for _ in range(S)]
    for i in range(S):
        eng.alloc(
            lambda r, toks, i=i: ref[i].append(
                (r, [[t.token_id, t.flags, t.time_ms] for t in toks])
            )
        )
    rng = np.random.default_rng(3)
    audio = (rng.normal(0, 0.15, size=(S, 9600)) * 20000).astype(np.int16)
    for off in range(0, 9600, 3200):
        for i in range(S):
            eng.feed(i, audio[i, off : off + 3200])
        while eng.tick():
            pass
    eng.flush(np.ones(S, bool))

    ref_json = json.loads(json.dumps([[list(c) for c in s] for s in ref]))
    for i in range(S):
        assert combined[i] == ref_json[i], f"slot {i} diverged across hosts"


def test_two_process_engine_matches_single_process(tmp_path):
    _run_two_process(tmp_path, model_parallel=1)


def test_two_process_engine_tensor_parallel(tmp_path):
    """2 processes x (data=4, model=2) mesh: the multi-process shard_map TP
    placement (gate-shuffled weights materialized on non-addressable devices
    via jit out_shardings, cell state sharded over the model axis, explicit
    per-layer psums crossing process boundaries) must reproduce the
    single-process callback streams exactly. The worker asserts the engine
    actually took the TP path (prog.tp_axes == ('model',))."""
    _run_two_process(tmp_path, model_parallel=2)


def test_two_process_engine_pipeline_stages(tmp_path):
    """2 processes x (data=4, stage=2) mesh: multi-process PIPELINE serving
    (VERDICT r4 weak #3 lifted engine/batch.py's single-process limit). The
    layer slabs shard over the stage axis with ppermute handoffs crossing
    the process boundary; callback streams must reproduce the
    single-process engine exactly."""
    _run_two_process(tmp_path, model_parallel="pp")
