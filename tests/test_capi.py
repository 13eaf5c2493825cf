"""C ABI client library (native/april_capi.cc) end-to-end test.

Builds libapril_tpu.so and a small C client with the system toolchain,
starts an in-process april-serve server on an ephemeral port backed by the
fixture model, and verifies the C client receives model metadata and
PARTIAL/FINAL results through the reference-compatible handler.
"""

import shutil
import subprocess
import time
import textwrap
import threading

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or shutil.which("gcc") is None,
    reason="no C/C++ toolchain",
)

torch = pytest.importorskip("torch")

C_CLIENT = textwrap.dedent("""
    #include <stdio.h>
    #include <stdlib.h>
    #include <string.h>
    #include <unistd.h>
    #include "april_tpu_api.h"

    static int n_partial = 0, n_final = 0;

    static void handler(void *ud, AprilResultType rt, size_t count,
                        const AprilToken *tokens) {
        (void)ud; (void)count; (void)tokens;
        if (rt == APRIL_RESULT_RECOGNITION_PARTIAL) n_partial++;
        if (rt == APRIL_RESULT_RECOGNITION_FINAL) n_final++;
    }

    int main(int argc, char **argv) {
        aam_api_init(APRIL_VERSION);
        AprilASRModel model = aam_create_model(argv[1]);
        if (!model) return 2;
        if (aam_get_sample_rate(model) != 16000) return 3;
        if (strlen(aam_get_name(model)) == 0) return 4;

        AprilConfig cfg;
        memset(&cfg, 0, sizeof(cfg));
        cfg.handler = handler;
        AprilASRSession s = aas_create_session(model, cfg);
        if (!s) return 5;

        short buf[3200];
        srand(7);
        for (int c = 0; c < 5; c++) {
            for (int i = 0; i < 3200; i++) buf[i] = (short)((rand() % 16384) - 8192);
            aas_feed_pcm16(s, buf, 3200);
        }
        aas_flush(s);
        for (int i = 0; i < 1200 && n_final == 0; i++) usleep(100000);
        aas_free(s);
        aam_free(model);
        printf("partial=%d final=%d\\n", n_partial, n_final);
        return (n_partial + n_final > 0) ? 0 : 6;
    }
""")


@pytest.fixture(scope="module")
def capi_lib(tmp_path_factory):
    d = tmp_path_factory.mktemp("capi")
    lib = d / "libapril_tpu.so"
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
         "native/april_capi.cc", "-o", str(lib), "-pthread"],
        check=True,
    )
    src = d / "client.c"
    src.write_text(C_CLIENT)
    exe = d / "client"
    subprocess.run(
        ["gcc", "-O2", str(src), "-Inative", f"-L{d}", "-lapril_tpu",
         f"-Wl,-rpath,{d}", "-o", str(exe)],
        check=True,
    )
    return exe


def test_c_client_end_to_end(capi_lib, tmp_path):
    from april_asr_tpu.api import Model
    from april_asr_tpu.cli.serve import _Handler, _Server
    from april_asr_tpu.engine.batch import BatchEngine
    from april_asr_tpu.testing import FixtureConfig, write_test_april

    path = tmp_path / "fixture.april"
    write_test_april(path, FixtureConfig())
    model = Model(path)
    engine = BatchEngine(model.runtime, batch=2)
    server = _Server(
        ("127.0.0.1", 0),
        _Handler,
        engine,
        model.runtime.params,
        model_info={
            "name": model.get_name(),
            "description": model.get_description(),
            "language": model.get_language(),
            "sample_rate": model.get_sample_rate(),
        },
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # prime the engine compile so the C client's wait stays short
        slot = engine.alloc(lambda r, toks: None)
        engine.feed(slot, np.zeros(3200, np.int16))
        engine.tick()
        engine.flush(np.array([i == slot for i in range(engine.batch)]))
        engine.free(slot)

        out = subprocess.run(
            [str(capi_lib), f"127.0.0.1:{port}"],
            capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == 0, (out.returncode, out.stdout, out.stderr)
        assert "partial=" in out.stdout
    finally:
        server.shutdown()


SPEEDUP_CLIENT = textwrap.dedent("""
    #include <stdio.h>
    #include <stdlib.h>
    #include <string.h>
    #include <unistd.h>
    #include "april_tpu_api.h"

    static void handler(void *ud, AprilResultType rt, size_t count,
                        const AprilToken *tokens) {
        (void)ud; (void)rt; (void)count; (void)tokens;
    }

    int main(int argc, char **argv) {
        aam_api_init(APRIL_VERSION);
        AprilASRModel model = aam_create_model(argv[1]);
        if (!model) return 2;
        AprilConfig cfg;
        memset(&cfg, 0, sizeof(cfg));
        cfg.handler = handler;
        AprilASRSession s = aas_create_session(model, cfg);
        if (!s) return 5;

        short buf[3200];
        srand(7);
        float sp = 1.0f;
        /* keep feeding while the (artificially slowed) server falls behind;
           poll the live telemetry until it reports >1x needed speedup */
        for (int c = 0; c < 120 && sp <= 1.05f; c++) {
            for (int i = 0; i < 3200; i++) buf[i] = (short)((rand() % 16384) - 8192);
            aas_feed_pcm16(s, buf, 3200);
            sp = aas_realtime_get_speedup(s);
        }
        printf("speedup=%f\\n", sp);
        aas_free(s);
        aam_free(model);
        return sp > 1.05f ? 0 : 7;
    }
""")


def test_speedup_reported_under_forced_slowdown(capi_lib, tmp_path):
    """aas_realtime_get_speedup surfaces the server's per-session estimate:
    with the engine step artificially slowed below realtime, the C client
    must observe a speedup > 1 (the reference's degrade-gracefully
    telemetry, april_api.h:188-192 — hardcoded to 1.0 in round 2)."""
    import dataclasses
    import subprocess as sp

    from april_asr_tpu.api import Model
    from april_asr_tpu.cli.serve import _Handler, _Server
    from april_asr_tpu.engine.batch import BatchEngine
    from april_asr_tpu.testing import FixtureConfig, write_test_april

    path = tmp_path / "fixture.april"
    write_test_april(path, FixtureConfig())
    model = Model(path)
    engine = BatchEngine(model.runtime, batch=2)

    # Force every dispatch well below realtime: chunk is 3200 samples
    # (200 ms of audio), so a 350 ms sleep drives the needed-speedup EMA
    # toward 1.1 * 0.35 / 0.2 ~= 1.9.
    orig_step = engine.prog.step

    def slow_step(*a):
        time.sleep(0.35)
        return orig_step(*a)

    engine.prog = dataclasses.replace(engine.prog, step=slow_step)

    server = _Server(
        ("127.0.0.1", 0), _Handler, engine, model.runtime.params,
        model_info={
            "name": model.get_name(), "description": "", "language": "en",
            "sample_rate": model.get_sample_rate(),
        },
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    d = capi_lib.parent
    src = d / "speedup_client.c"
    src.write_text(SPEEDUP_CLIENT)
    exe = d / "speedup_client"
    subprocess.run(
        ["gcc", "-O2", str(src), "-Inative", f"-L{d}", "-lapril_tpu",
         f"-Wl,-rpath,{d}", "-o", str(exe)],
        check=True,
    )
    try:
        out = subprocess.run(
            [str(exe), f"127.0.0.1:{port}"],
            capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == 0, (out.returncode, out.stdout, out.stderr)
        assert float(out.stdout.split("speedup=")[1]) > 1.05
    finally:
        server.shutdown()


def test_speaker_opcode_roundtrip(tmp_path, monkeypatch):
    """opcode 6: a speaker key restores saved session state across
    connections (the reference reserved AprilConfig.speaker but never
    implemented it — april_api.h:78-84; over the wire it works for every
    binding). First connection reports 'new' and snapshots on disconnect;
    the second reports 'restored' and the slot's carried LSTM state equals
    the snapshot."""
    import json
    import socket
    import struct

    from april_asr_tpu.api import Model
    from april_asr_tpu.cli.serve import _Handler, _Server
    from april_asr_tpu.engine.batch import BatchEngine
    from april_asr_tpu.engine.speaker import speaker_path
    from april_asr_tpu.testing import FixtureConfig, write_test_april

    monkeypatch.setenv("APRIL_SPEAKER_CACHE", str(tmp_path / "spk"))
    path = tmp_path / "fixture.april"
    write_test_april(path, FixtureConfig())
    model = Model(path)
    engine = BatchEngine(model.runtime, batch=2)
    server = _Server(
        ("127.0.0.1", 0), _Handler, engine, model.runtime.params,
        model_info={
            "name": model.get_name(), "description": "", "language": "en",
            "sample_rate": model.get_sample_rate(),
        },
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(5)
        pcm = (rng.normal(0, 0.2, 16000) * 20000).astype(np.int16).tobytes()

        def connect():
            s = socket.create_connection(("127.0.0.1", port), timeout=120)
            s.settimeout(120)
            return s, s.makefile()

        # connection 1: new speaker, stream audio, disconnect (snapshots)
        s, f = connect()
        s.sendall(struct.pack("<BI", 6, 5) + b"alice")
        assert json.loads(f.readline())["speaker"] == "new"
        s.sendall(struct.pack("<BI", 1, len(pcm)) + pcm)
        s.sendall(struct.pack("<BI", 2, 0))
        deadline = time.time() + 120
        while time.time() < deadline:
            if json.loads(f.readline()).get("result") == "final":
                break
        f.close()  # makefile() dups the fd — close both so the server sees EOF
        s.close()

        import os

        snap_file = speaker_path(model.get_name(), "alice")
        deadline = time.time() + 60
        while time.time() < deadline and not os.path.exists(snap_file):
            time.sleep(0.1)
        assert os.path.exists(snap_file), "disconnect did not snapshot"
        saved_h = np.load(snap_file)["h"]
        assert np.abs(saved_h).max() > 0, "snapshot carried no state"

        # connection 2: same speaker restores the carried state
        s, f = connect()
        s.sendall(struct.pack("<BI", 6, 5) + b"alice")
        assert json.loads(f.readline())["speaker"] == "restored"
        # the restoring connection owns one of the two slots; its h row now
        # equals the snapshot
        h_now = np.asarray(engine.state["h"])
        assert any(
            np.allclose(h_now[:, i], saved_h) for i in range(engine.batch)
        ), "restored slot state does not match the snapshot"
        f.close()
        s.close()
    finally:
        server.shutdown()


def test_metrics_opcode(tmp_path):
    """opcode 4 returns a metrics snapshot with engine counters populated."""
    import json
    import socket
    import struct

    from april_asr_tpu.api import Model
    from april_asr_tpu.cli.serve import _Handler, _Server
    from april_asr_tpu.engine.batch import BatchEngine
    from april_asr_tpu.testing import FixtureConfig, write_test_april

    path = tmp_path / "fixture.april"
    write_test_april(path, FixtureConfig())
    model = Model(path)
    engine = BatchEngine(model.runtime, batch=2)
    server = _Server(
        ("127.0.0.1", 0), _Handler, engine, model.runtime.params,
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=60)
        f = s.makefile()
        pcm = np.zeros(3200, np.int16).tobytes()
        s.sendall(struct.pack("<BI", 1, len(pcm)) + pcm)
        deadline = time.time() + 120
        snap = {}
        while time.time() < deadline:
            s.sendall(struct.pack("<BI", 4, 0))
            line = f.readline()
            msg = json.loads(line)
            if "metrics" in msg:
                snap = msg["metrics"]
                if snap.get("audio_seconds", 0) > 0:
                    break
            time.sleep(0.2)
        assert snap.get("sessions_active") == 1
        assert snap.get("audio_seconds", 0) > 0
        assert "tick_latency_s_p50" in snap
        assert "uptime_s" in snap
        s.close()
    finally:
        server.shutdown()
