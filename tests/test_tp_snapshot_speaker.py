"""Speaker state composes with shard_map TP (VERDICT r4 task 4, second half).

Speaker snapshots carry the acoustic/decoder state (h, c, context, dout) —
not the fbank ring or clock, matching the e2e speaker semantics
(tests/test_session_e2e.py::test_speaker_state_roundtrip; reference analog:
the reserved AprilSpeakerID, april_api.h:78-84). On a TP mesh the h/c rows
are saved in the CANONICAL layout (engine/speaker.py -> canonical_state), so:

  * a speaker saved on a TP mesh restores into a single-device engine and
    vice versa (cross-geometry files are identical in shape and meaning),
  * restoring into a TP engine and re-gathering yields the saved rows
    BIT-EXACTLY (canonical -> TP -> canonical is the identity through the
    real engine state arrays, not just the pure transforms).
"""

import numpy as np
import pytest

from april_asr_tpu.config import EngineConfig
from april_asr_tpu.engine import BatchEngine
from april_asr_tpu.engine.speaker import (
    restore_speaker_state,
    save_speaker_state,
    speaker_path,
)
from april_asr_tpu.parallel.multihost import canonical_state

from test_tp_snapshot import CHUNK, S, _audio, _conf_rt, _lstm_rt, _tp_mesh


@pytest.mark.parametrize("family", ["lstm", "conformer"])
def test_speaker_canonical_roundtrip_through_tp_engine(
    family, tmp_path, monkeypatch
):
    monkeypatch.setenv("APRIL_SPEAKER_CACHE", str(tmp_path / "spk"))
    rt = _lstm_rt() if family == "lstm" else _conf_rt()
    audio = _audio()
    mesh = _tp_mesh()

    eng_a = BatchEngine(rt, batch=S, cfg=EngineConfig(chunk_samples=CHUNK),
                        mesh=mesh)
    assert eng_a.prog.tp_axes
    sink = [[] for _ in range(S)]
    for i in range(S):
        eng_a.alloc(lambda r, toks, i=i: sink[i].append(r))
    for i in range(S):
        eng_a.feed(i, audio[i, :CHUNK])
    while eng_a.tick():
        pass
    assert save_speaker_state(eng_a, 3, "m", "alice")

    # the file holds CANONICAL widths, not the (padded) TP widths
    data = np.load(speaker_path("m", "alice"))
    dims = rt.dims
    if family == "conformer":
        assert data["h"].shape[-1] == 2 * dims.att_context * dims.d_model
        assert data["c"].shape[-1] == (dims.conv_kernel - 1) * dims.d_model + 1
    else:
        assert data["h"].shape[-1] == dims.d_model
        assert data["c"].shape[-1] == dims.hidden
    # canonical rows saved == canonical gather of the live engine slot
    canon = canonical_state(eng_a)
    np.testing.assert_array_equal(
        data["h"], np.asarray(canon["h"])[:, 3]
    )

    # restore into a FRESH TP engine; regathering the slot must reproduce
    # the saved rows bit for bit (layout round-trip through real state)
    eng_b = BatchEngine(rt, batch=S, cfg=EngineConfig(chunk_samples=CHUNK),
                        mesh=mesh)
    sid = eng_b.alloc(lambda r, toks: None)
    assert restore_speaker_state(eng_b, sid, "m", "alice")
    canon_b = canonical_state(eng_b)
    np.testing.assert_array_equal(
        np.asarray(canon_b["h"])[:, sid], data["h"]
    )
    np.testing.assert_array_equal(
        np.asarray(canon_b["c"])[:, sid], data["c"]
    )

    # cross-geometry: the same file restores into a single-device engine,
    # whose rows then equal the canonical saved rows directly
    eng_l = BatchEngine(rt, batch=S, cfg=EngineConfig(chunk_samples=CHUNK))
    sid_l = eng_l.alloc(lambda r, toks: None)
    assert restore_speaker_state(eng_l, sid_l, "m", "alice")
    np.testing.assert_array_equal(
        np.asarray(eng_l.state["h"])[:, sid_l], data["h"]
    )
    np.testing.assert_array_equal(
        np.asarray(eng_l.state["c"])[:, sid_l], data["c"]
    )

    # carried state changes decode (the e2e speaker semantic): restored
    # slot's continuation differs from a fresh slot on the same audio
    got_restored, got_fresh = [], []
    eng_b.slots[sid].replayer.on_result = (
        lambda r, toks: got_restored.append(
            (r, [[t.token_id, t.flags] for t in toks])
        )
    )
    fresh = eng_b.alloc(
        lambda r, toks: got_fresh.append(
            (r, [[t.token_id, t.flags] for t in toks])
        )
    )
    for s_ in (sid, fresh):
        eng_b.feed(s_, audio[3, CHUNK : 2 * CHUNK])
    while eng_b.tick():
        pass
    eng_b.flush(np.asarray([s_ in (sid, fresh) for s_ in range(S)]))
    assert got_restored != got_fresh
