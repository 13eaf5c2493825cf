"""Host REJOIN / scale-back-out at the serving layer (VERDICT r4 weak #6 —
the other half of SURVEY §2.4's "fail/rejoin" elastic contract; the drain/
adopt half is tests/test_host_failover.py).

Scenario: host A has been serving all 8 slots LOCALLY (the post-failover
steady state). A replacement host C comes up. A snapshots every slot,
re-forms a 2-process distributed runtime with C (parallel.rejoin_distributed
— the local backends must be dropped before jax.distributed can initialize),
both build the global mesh engine, restore all slots from A's snapshot, and
C takes over serving the upper half.

Assertions vs a single-process run of the same program sequence (local
phase, snapshot, 8-device mesh phase):
  * A's retained slots: FULL stream equality — scale-out is invisible to
    them (their in-process window mirrors survive);
  * C's migrated slots: post-rejoin streams equal the reference's
    post-boundary streams bit for bit (fresh window mirrors by contract —
    A's mirrors cannot move across the process boundary, exactly like
    adoption in the failover test).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")

S = 8
CHUNK = 3200
N_CHUNKS = 3

WORKER = r"""
import json, os, sys

port, pid_, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import time

sys.path.insert(0, workdir)
from rj_common import CHUNK, N_CHUNKS, S, _audio, _build_rt

from april_asr_tpu.engine import BatchEngine
from april_asr_tpu.parallel import (
    local_slot_range, make_mesh, restore_slots, snapshot_local_slots,
)
from april_asr_tpu.parallel.multihost import rejoin_distributed

rt = _build_rt()
audio = _audio()
streams = [[] for _ in range(S)]


def mk(i):
    return lambda r, toks: streams[i].append(
        (r, [[t.token_id, t.flags, t.time_ms] for t in toks])
    )


snap = os.path.join(workdir, "all_slots.npz")
ready = os.path.join(workdir, "snapshot_ready")

if pid_ == 0:
    # ---- phase 1: host A serves ALL slots locally (post-failover state) --
    eng = BatchEngine(rt, batch=S)
    for i in range(S):
        eng.alloc(mk(i))
    for i in range(S):
        eng.feed(i, audio[i, :CHUNK])
    while eng.tick():
        pass
    snapshot_local_slots(eng, snap)
    with open(ready, "w") as f:
        f.write("1")
else:
    # replacement host C: wait for A's snapshot, then join the runtime
    for _ in range(1200):
        if os.path.exists(ready):
            break
        time.sleep(0.1)
    else:
        raise SystemExit("A's snapshot never appeared")

# ---- phase 2: re-form the 2-process runtime (A rejoins, C joins fresh) ---
rejoin_distributed(f"localhost:{port}", 2, pid_)
assert jax.process_count() == 2, jax.process_count()

mesh = make_mesh()
eng2 = BatchEngine(rt, batch=S, mesh=mesh)
lo, hi = local_slot_range(S, mesh)
# A keeps the lower half, C takes the upper half
assert (lo, hi) == ((0, 4) if pid_ == 0 else (4, 8))

for i in range(S):
    eng2.alloc(mk(i))
if pid_ == 0:
    # A's retained slots keep their in-process window mirrors
    for i in range(lo, hi):
        eng2.slots[i].replayer = eng.slots[i].replayer
restore_slots(eng2, snap)

# ---- phases 2..N on the mesh: each host stages its own slots -------------
for c in range(1, N_CHUNKS):
    for i in range(lo, hi):
        eng2.feed(i, audio[i, c * CHUNK : (c + 1) * CHUNK])
    while eng2.tick():
        pass
eng2.flush(np.ones(S, bool))

with open(os.path.join(workdir, f"rejoin_{pid_}.json"), "w") as f:
    json.dump({"streams": streams[lo:hi], "lo": lo, "hi": hi}, f)
"""


def _build_rt():
    import jax

    from april_asr_tpu.io.params import build_vocab_tables
    from april_asr_tpu.models import TransducerDims, init_transducer_params
    from april_asr_tpu.models.export import make_model_parameters
    from april_asr_tpu.models.loader import (
        ModelRuntime, _fbank_opts_from_params, _native_runtime_fns,
    )
    from april_asr_tpu.testing import default_tokens

    dims = TransducerDims(
        mel=80, segment_size=9, segment_step=4, d_model=32, hidden=64, ffn=64,
        joiner_dim=32, vocab=64, layers=2, context=2, decoder_groups=8,
        conv_channels=(4, 8, 8),
    )
    params = init_transducer_params(jax.random.PRNGKey(0), dims)
    params["join_b"] = params["join_b"].at[0].add(1.5)
    params = {k: np.asarray(v) for k, v in params.items()}
    mp = make_model_parameters(dims, default_tokens(dims.vocab))
    enc, dec, joi = _native_runtime_fns(dims)
    return ModelRuntime(
        name="rj", description="", language="en", params=mp,
        fbank_opts=_fbank_opts_from_params(mp), vocab=build_vocab_tables(mp),
        dims=dims, kind="native", weights=params, encoder_step=enc,
        decoder_step=dec, joiner=joi,
        state_shapes=((dims.layers, dims.d_model), (dims.layers, dims.hidden)),
    )


def _audio():
    rng = np.random.default_rng(5)
    return (rng.normal(0, 0.15, size=(S, CHUNK * N_CHUNKS)) * 20000).astype(
        np.int16
    )


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_replacement_host_takes_half_the_slots_back(tmp_path):
    common = tmp_path / "rj_common.py"
    common.write_text(
        "import sys\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})\n"
        "from test_host_rejoin import CHUNK, N_CHUNKS, S, _audio, _build_rt\n"
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
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("rejoin worker timed out")
        logs.append(out.decode(errors="replace"))
    for p, log_text in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log_text[-4000:]}"

    a = json.load(open(tmp_path / "rejoin_0.json"))
    c = json.load(open(tmp_path / "rejoin_1.json"))
    assert (a["lo"], a["hi"]) == (0, 4) and (c["lo"], c["hi"]) == (4, 8)

    # ---- no-rejoin reference: same program sequence, single process ------
    from april_asr_tpu.engine import BatchEngine
    from april_asr_tpu.parallel import make_mesh, restore_slots, snapshot_local_slots

    rt = _build_rt()
    audio = _audio()
    ref = [[] for _ in range(S)]

    def mk(i):
        return lambda r, toks: ref[i].append(
            (r, [[t.token_id, t.flags, t.time_ms] for t in toks])
        )

    eng_l = BatchEngine(rt, batch=S)
    for i in range(S):
        eng_l.alloc(mk(i))
    for i in range(S):
        eng_l.feed(i, audio[i, :CHUNK])
    while eng_l.tick():
        pass
    snap = str(tmp_path / "ref.npz")
    snapshot_local_slots(eng_l, snap)

    eng_m = BatchEngine(rt, batch=S, mesh=make_mesh())
    for i in range(S):
        eng_m.alloc(mk(i))
        eng_m.slots[i].replayer = eng_l.slots[i].replayer
    restore_slots(eng_m, snap)
    cut = [len(ref[i]) for i in range(S)]
    for ch in range(1, N_CHUNKS):
        for i in range(S):
            eng_m.feed(i, audio[i, ch * CHUNK : (ch + 1) * CHUNK])
        while eng_m.tick():
            pass
    eng_m.flush(np.ones(S, bool))
    ref = json.loads(json.dumps(ref))

    # A's retained slots: full stream equality (rejoin invisible)
    for j, i in enumerate(range(0, 4)):
        assert a["streams"][j] == ref[i], f"retained slot {i} diverged"
    # C's migrated slots: event-for-event match with the reference's
    # post-boundary stream, where each event's token window is a SUFFIX of
    # the reference's — C's window mirrors start fresh by contract (A's
    # in-process mirrors cannot cross the process boundary, exactly like
    # adoption in test_host_failover.py), so tokens emitted BEFORE the
    # boundary may be absent from C's windows; everything the device emits
    # after the boundary must be present and identical.
    for j, i in enumerate(range(4, 8)):
        post = c["streams"][j]
        ref_post = ref[i][cut[i]:]
        assert len(post) == len(ref_post), f"migrated slot {i}: event count"
        for k, ((r1, toks1), (r2, toks2)) in enumerate(zip(post, ref_post)):
            assert r1 == r2, f"migrated slot {i} event {k}: kind {r1} != {r2}"
            assert toks1 == toks2[len(toks2) - len(toks1):], (
                f"migrated slot {i} event {k}: {toks1} not a suffix of {toks2}"
            )
        assert len(post) > 0, f"migrated slot {i} produced nothing"
        assert any(toks for _, toks in post), f"migrated slot {i}: no tokens"
