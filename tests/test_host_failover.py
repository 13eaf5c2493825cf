"""Host-failure drain/rejoin at the serving layer (VERDICT r3 missing #4).

Two jax.distributed processes serve one 8-slot engine (4 slots each). Both
hosts snapshot their slot rows (parallel.snapshot_local_slots — the FULL
carried state: fbank rings, LSTM h/c, decode state incl. time_ms). Then
host B is SIGKILLed mid-stream. Host A:

  1. detects the death (parent drops a sentinel; production would use a
     heartbeat), abandons the now-dead distributed runtime,
  2. rebuilds a LOCAL single-host engine over its own devices,
  3. restores its OWN slots from its snapshot — their token-window mirrors
     survived in-process, so those streams continue BIT-EXACTLY —
  4. adopts the dead host's slots from B's last snapshot (fresh windows:
     B's host-side mirrors died with it), and keeps serving everyone.

Assertions against a no-failure single-process run of the same program
sequence (mesh phase, snapshot, local phase):
  * A's own slots' full callback streams match token for token — the
    failover is invisible to them;
  * adopted slots' post-recovery streams match the reference's
    post-boundary streams bit for bit — the cross-host snapshot written by
    two processes holds exactly the state a single-process run holds, and
    adoption loses nothing the device emits after the boundary. (Window
    mirrors for adopted sessions start fresh by contract: a provisional
    confident-blank token pending at the crash is re-resolved on the device
    side, not in the dead host's lost mirror.)

Also exercised: the runtime-level failure DETECTOR — init_distributed's
on_peer_failure KV-heartbeat watchdog must fire (the stock runtime instead
LOG(FATAL)s every surviving process ~1 s after a peer dies).

Reference baseline: the reference library aborts the whole process on any
backend error (ort_util.h:29-38) and has no multi-host anything.
"""

import json
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")

DIMS_KW = dict(
    mel=80, segment_size=9, segment_step=4, d_model=32, hidden=64, ffn=64,
    joiner_dim=32, vocab=64, layers=2, context=2, decoder_groups=8,
    conv_channels=(4, 8, 8),
)
S = 8
CHUNK = 3200
N_CHUNKS = 3  # phase 1 = chunk 0; phases 2+ = chunks 1..2 + flush


def _build_rt():
    import jax

    from april_asr_tpu.io.params import build_vocab_tables
    from april_asr_tpu.models import TransducerDims, init_transducer_params
    from april_asr_tpu.models.export import make_model_parameters
    from april_asr_tpu.models.loader import (
        ModelRuntime, _fbank_opts_from_params, _native_runtime_fns,
    )
    from april_asr_tpu.testing import default_tokens

    dims = TransducerDims(**DIMS_KW)
    params = init_transducer_params(jax.random.PRNGKey(0), dims)
    params["join_b"] = params["join_b"].at[0].add(1.5)  # sparse emissions
    params = {k: np.asarray(v) for k, v in params.items()}
    mp = make_model_parameters(dims, default_tokens(dims.vocab))
    enc, dec, joi = _native_runtime_fns(dims)
    return ModelRuntime(
        name="fo", description="", language="en", params=mp,
        fbank_opts=_fbank_opts_from_params(mp), vocab=build_vocab_tables(mp),
        dims=dims, kind="native", weights=params, encoder_step=enc,
        decoder_step=dec, joiner=joi,
        state_shapes=((dims.layers, dims.d_model), (dims.layers, dims.hidden)),
    )


def _audio():
    rng = np.random.default_rng(3)
    return (rng.normal(0, 0.15, size=(S, CHUNK * N_CHUNKS)) * 20000).astype(
        np.int16
    )


WORKER = r"""
import json, os, sys, time

port, pid_, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import threading

from april_asr_tpu.parallel import (
    init_distributed, local_slot_range, make_mesh,
    restore_slots, snapshot_local_slots,
)
from april_asr_tpu.parallel.multihost import abandon_distributed

# failure detector: without a handler the stock runtime LOG(FATAL)s this
# process the moment its peer dies; with it, peer death sets an event the
# serving loop consumes to trigger failover
peer_died = threading.Event()
init_distributed(
    f"localhost:{port}", 2, pid_,
    on_peer_failure=lambda msg: peer_died.set(),
)
assert jax.process_count() == 2

# engine/test-module imports touch the XLA backend: AFTER init_distributed
sys.path.insert(0, workdir)
from fo_common import CHUNK, N_CHUNKS, S, _audio, _build_rt

from april_asr_tpu.engine import BatchEngine

rt = _build_rt()
mesh = make_mesh()
eng = BatchEngine(rt, batch=S, mesh=mesh)
lo, hi = local_slot_range(S, mesh)

streams = [[] for _ in range(S)]


def mk(i):
    return lambda r, toks: streams[i].append(
        (r, [[t.token_id, t.flags, t.time_ms] for t in toks])
    )


for i in range(S):
    eng.alloc(mk(i))

audio = _audio()

# ---- phase 1: one chunk through the 2-host engine, then snapshot ----------
for i in range(lo, hi):
    eng.feed(i, audio[i, :CHUNK])
while eng.tick():
    pass
snap = os.path.join(workdir, f"host{pid_}.npz")
snapshot_local_slots(eng, snap)

with open(os.path.join(workdir, f"phase1_{pid_}.json"), "w") as f:
    json.dump({"streams": streams[lo:hi], "lo": lo, "hi": hi}, f)

if pid_ == 1:
    os._exit(37)  # simulated host crash (SIGKILL-equivalent: no cleanup)

# ---- host A: detect B's death --------------------------------------------
# primary signal: the runtime's peer-failure callback; the parent's sentinel
# file is the test-side backstop so the wait is bounded either way
dead = os.path.join(workdir, "b_dead")
for _ in range(600):
    if peer_died.is_set() or os.path.exists(dead):
        break
    time.sleep(0.1)
else:
    raise SystemExit("peer death never detected")
peer_died.wait(timeout=120)  # the callback must fire (failure DETECTION)
assert peer_died.is_set(), "on_peer_failure callback never fired"

# ---- failover: abandon the dead distributed runtime, go local -------------
abandon_distributed()
assert jax.process_count() == 1

eng2 = BatchEngine(rt, batch=S)  # local single-host engine
for i in range(S):
    eng2.alloc(mk(i))
# own slots: restore state AND keep the surviving in-process window mirrors
restore_slots(eng2, snap)
for i in range(lo, hi):
    eng2.slots[i].replayer = eng.slots[i].replayer
# adopted slots: the dead host's last snapshot (fresh window mirrors)
restore_slots(eng2, os.path.join(workdir, "host1.npz"))

# ---- phases 2..N: serve EVERY slot locally --------------------------------
for c in range(1, N_CHUNKS):
    for i in range(S):
        eng2.feed(i, audio[i, c * CHUNK : (c + 1) * CHUNK])
    while eng2.tick():
        pass
eng2.flush(np.ones(S, bool))

with open(os.path.join(workdir, "survivor.json"), "w") as f:
    json.dump({"streams": streams}, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_survivor_rebuilds_and_streams_continue(tmp_path):
    # the worker imports _build_rt/_audio from this very test module
    common = tmp_path / "fo_common.py"
    common.write_text(
        "import sys\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})\n"
        "from test_host_failover import CHUNK, N_CHUNKS, S, _audio, _build_rt\n"
    )
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.abspath(REPO) + os.pathsep + env.get("PYTHONPATH", "")

    procs = []
    for pid_ in range(2):
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), str(port), str(pid_), str(tmp_path)],
                cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    # B self-terminates after phase 1 (simulated crash)
    try:
        out_b, _ = procs[1].communicate(timeout=600)
    except subprocess.TimeoutExpired:
        for q in procs:
            q.kill()
        pytest.fail("host B never crashed")
    assert procs[1].returncode == 37, out_b.decode(errors="replace")[-2000:]
    (tmp_path / "b_dead").write_text("1")

    try:
        out_a, _ = procs[0].communicate(timeout=600)
    except subprocess.TimeoutExpired:
        procs[0].kill()
        pytest.fail("survivor timed out")
    assert procs[0].returncode == 0, out_a.decode(errors="replace")[-4000:]

    survivor = json.load(open(tmp_path / "survivor.json"))["streams"]
    b_phase1 = json.load(open(tmp_path / "phase1_1.json"))

    # ---- no-failure reference: SAME program sequence, single process ------
    # phase 1 on the same 8-device global mesh (the 2-process run's shardings
    # and programs, minus the process boundary), snapshot, then the same
    # local batch-8 engine for phases 2+. This keeps every numerical program
    # identical to the survivor's life minus the crash, so the assertions
    # are bit-exact; what the comparison then proves is that the CROSS-HOST
    # snapshot (written by two processes over non-addressable shards) holds
    # exactly the state the single-process run holds, and that restore +
    # adoption lose nothing.
    from april_asr_tpu.engine import BatchEngine
    from april_asr_tpu.parallel import make_mesh, restore_slots, snapshot_local_slots

    rt = _build_rt()
    audio = _audio()
    ref = [[] for _ in range(S)]

    def mk(i):
        return lambda r, toks: ref[i].append(
            (r, [[t.token_id, t.flags, t.time_ms] for t in toks])
        )

    eng_m = BatchEngine(rt, batch=S, mesh=make_mesh())
    for i in range(S):
        eng_m.alloc(mk(i))
    for i in range(S):
        eng_m.feed(i, audio[i, :CHUNK])
    while eng_m.tick():
        pass
    ref_snap = str(tmp_path / "ref.npz")
    snapshot_local_slots(eng_m, ref_snap)

    eng_l = BatchEngine(rt, batch=S)
    for i in range(S):
        eng_l.alloc(mk(i))
    restore_slots(eng_l, ref_snap)
    # slots 0-3 mirror the survivor's OWN slots (window mirrors carried
    # through); slots 4-7 mirror ADOPTION (fresh windows at the boundary,
    # exactly what the survivor does for the dead host's sessions)
    for i in range(0, 4):
        eng_l.slots[i].replayer = eng_m.slots[i].replayer
    cut = [len(ref[i]) for i in range(S)]
    for c in range(1, N_CHUNKS):
        for i in range(S):
            eng_l.feed(i, audio[i, c * CHUNK : (c + 1) * CHUNK])
        while eng_l.tick():
            pass
    eng_l.flush(np.ones(S, bool))
    ref = json.loads(json.dumps(ref))

    # A's own slots: the failover must be invisible — full stream equality
    # (phase-1 on the cross-process mesh + phase-2 on the rebuilt local
    # engine, windows carried through, token for token)
    for i in range(0, 4):
        assert survivor[i] == ref[i], f"own slot {i} diverged through failover"

    # adopted slots: the survivor's post-recovery streams (restored from the
    # DEAD host's snapshot, fresh windows) must equal the reference's
    # post-boundary streams bit for bit — the cross-host snapshot holds
    # exactly the state a never-failed run holds, and nothing the device
    # emits after the boundary is lost or altered by adoption
    for j, i in enumerate(range(4, 8)):
        post = survivor[i]
        ref_post = ref[i][cut[i] :]
        assert post == ref_post, f"adopted slot {i} diverged after adoption"
        assert len(post) > 0, f"adopted slot {i} produced nothing post-recovery"
        # and B really processed + reported phase 1 for it before dying
        assert len(b_phase1["streams"][j]) > 0
