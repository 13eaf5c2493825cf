"""Streaming transcription server: many concurrent sessions over TCP.

Where the reference offers in-process C#/Java bindings (bindings/csharp,
bindings/java), this framework's cross-language surface is a network protocol:
any language can stream PCM16 over a socket and receive JSON results. Sessions
share one batched TPU engine (slot per connection).

Protocol (client -> server), little-endian framed:
    [u8 opcode][u32 length][payload]
    opcode 1 = audio (payload: PCM16 mono samples at the model rate)
    opcode 2 = flush (no payload)
    opcode 3 = info request (no payload) -> one {"info": {...}} JSON line
               with name/description/language/sample_rate
    opcode 4 = metrics request (no payload) -> one {"metrics": {...}} JSON
               line: sessions_active, audio_seconds, rtf, cant_keep_up,
               events_replayed, tick_latency_s_p50/p99, staged_depth, ...
    opcode 5 = realtime-speedup request (no payload) -> one
               {"speedup": float} JSON line: this session's estimate of how
               much faster than realtime its audio must be consumed for the
               engine to keep up (reference aas_realtime_get_speedup,
               april_api.h:188-192; >1 means the session is falling behind)
    opcode 6 = speaker id (payload: UTF-8 speaker key, sent BEFORE audio)
               -> restores that speaker's saved session state (LSTM state +
               decoder context) into this session's slot and snapshots it
               back on disconnect — the reference reserved AprilConfig
               .speaker but never implemented it (april_api.h:78-84); here
               it works from every binding. Replies {"speaker": "restored"}
               or {"speaker": "new"}.
Server -> client: newline-delimited JSON:
    {"result": "partial"|"final"|"silence"|"cant_keep_up",
     "text": "...", "tokens": [{"t": str, "lp": float, "wb": bool,
     "se": bool, "time": float}]}

Example client:

    import socket, struct, json
    s = socket.create_connection(("localhost", 8765))
    s.sendall(struct.pack("<BI", 1, len(pcm)) + pcm)   # audio bytes
    s.sendall(struct.pack("<BI", 2, 0))                 # flush
    for line in s.makefile():
        print(json.loads(line))
"""

from __future__ import annotations

import argparse
import json
import socket
import socketserver
import struct
import sys
import threading
import time

import numpy as np

RESULT_NAMES = {1: "partial", 2: "final", 3: "cant_keep_up", 4: "silence"}


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(
        self, addr, handler_cls, engine, params, model_info=None,
        profile_dir=None, profile_ticks=50, scrub_every=0.0,
    ):
        super().__init__(addr, handler_cls)
        self.engine = engine
        self.params = params
        self.model_info = model_info or {
            "name": "", "description": "", "language": "", "sample_rate": 16000,
        }
        self._profile_dir = profile_dir
        self._profile_ticks = profile_ticks
        self._scrub_every = scrub_every
        self._last_scrub = time.monotonic()
        self._prof = None
        self._prof_lock = threading.Lock()
        self._tick_thread = threading.Thread(target=self._tick_loop, daemon=True)
        self._tick_thread.start()

    def _stop_profile(self):
        with self._prof_lock:
            prof, self._prof = self._prof, None
        if prof is not None:
            prof.__exit__(None, None, None)
            print(
                f"profiler trace written to {self._profile_dir}", file=sys.stderr
            )

    def server_close(self):
        # finalize a still-open trace so short sessions aren't lost
        self._stop_profile()
        super().server_close()

    def _tick_loop(self):
        # optional one-shot jax.profiler trace of the first N non-idle ticks
        # (--profile-dir); inspect with TensorBoard / Perfetto
        traced = 0
        if self._profile_dir:
            from ..utils.profiling import trace

            self._prof = trace(self._profile_dir)
            self._prof.__enter__()
        while True:
            # tick() contains/recovers program failures internally, but any
            # escaping exception must not kill this thread — a dead tick loop
            # accepts audio forever and never processes it
            try:
                ticked = self.engine.tick()
            except Exception as e:  # noqa: BLE001 - keep serving
                print(f"tick loop error (continuing): {e!r}", file=sys.stderr)
                time.sleep(0.1)
                continue
            if not ticked:
                time.sleep(0.005)
            elif self._prof is not None:
                traced += 1
                if traced >= self._profile_ticks:
                    self._stop_profile()
            if self._scrub_every > 0:
                now = time.monotonic()
                if now - self._last_scrub >= self._scrub_every:
                    self._last_scrub = now
                    # per-slot containment sweep (elastic serving): evicts
                    # sessions whose carried state went non-finite
                    self.engine.scrub()


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        engine = self.server.engine
        params = self.server.params
        sock = self.request
        send_lock = threading.Lock()

        def on_result(result_type, tokens):
            msg = {
                "result": RESULT_NAMES.get(result_type, "unknown"),
                "text": "".join(params.token_str(t.token_id) for t in tokens),
                "tokens": [
                    {
                        "t": params.token_str(t.token_id),
                        "lp": round(t.logprob, 3),
                        "wb": bool(t.flags & 1),
                        "se": bool(t.flags & 2),
                        "time": t.time_ms / 1000.0,
                    }
                    for t in tokens
                ],
            }
            data = (json.dumps(msg) + "\n").encode()
            with send_lock:
                try:
                    sock.sendall(data)
                except OSError:
                    pass

        # the session slot is claimed lazily on the first audio/flush opcode
        # so info/metrics polls work (and cost nothing) even when every slot
        # is occupied — the exact overload condition metrics diagnose
        slot = None
        speaker_key = None

        def send_error():
            # under send_lock like every other reply: a concurrent replay
            # callback write must not interleave mid-line in the NDJSON stream
            with send_lock:
                try:
                    sock.sendall(b'{"error": "no free session slots"}\n')
                except OSError:
                    pass

        def ensure_slot():
            nonlocal slot
            if slot is None:
                slot = engine.alloc(on_result)
            return slot

        try:
            while True:
                header = self._recv_exact(5)
                if header is None:
                    break
                opcode, length = struct.unpack("<BI", header)
                payload = self._recv_exact(length) if length else b""
                if payload is None:
                    break
                if opcode == 1:
                    try:
                        engine.feed(ensure_slot(), np.frombuffer(payload, dtype="<i2"))
                    except RuntimeError:
                        send_error()
                        return
                elif opcode == 2:
                    try:
                        s = ensure_slot()
                    except RuntimeError:
                        send_error()
                        return
                    mask = np.zeros(engine.batch, bool)
                    mask[s] = True
                    engine.flush(mask)
                elif opcode == 3:
                    info = {
                        "info": {
                            "name": self.server.model_info["name"],
                            "description": self.server.model_info["description"],
                            "language": self.server.model_info["language"],
                            "sample_rate": self.server.model_info["sample_rate"],
                        }
                    }
                    with send_lock:
                        sock.sendall((json.dumps(info) + "\n").encode())
                elif opcode == 6:
                    from ..engine.speaker import restore_speaker_state

                    try:
                        s = ensure_slot()
                    except RuntimeError:
                        send_error()
                        return
                    speaker_key = payload.decode("utf-8", errors="replace")
                    restored = restore_speaker_state(
                        engine, s, self.server.model_info["name"], speaker_key
                    )
                    with send_lock:
                        sock.sendall(
                            (json.dumps(
                                {"speaker": "restored" if restored else "new"}
                            ) + "\n").encode()
                        )
                elif opcode == 5:
                    sp = engine.rt_speedup(slot) if slot is not None else 1.0
                    with send_lock:
                        sock.sendall(
                            (json.dumps({"speedup": round(sp, 4)}) + "\n").encode()
                        )
                elif opcode == 4:
                    from ..utils.logging import metrics

                    snap = {
                        k: (round(v, 6) if isinstance(v, float) else v)
                        for k, v in metrics.snapshot().items()
                    }
                    with send_lock:
                        sock.sendall(
                            (json.dumps({"metrics": snap}) + "\n").encode()
                        )
                else:
                    break
        finally:
            if slot is not None:
                if speaker_key:
                    from ..engine.speaker import save_speaker_state

                    save_speaker_state(
                        engine, slot, self.server.model_info["name"], speaker_key
                    )
                engine.free(slot)

    def _recv_exact(self, n):
        buf = b""
        while len(buf) < n:
            chunk = self.request.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", help=".april model path")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--slots", type=int, default=32, help="max concurrent sessions")
    ap.add_argument(
        "--mesh", action="store_true",
        help="shard the engine over all local chips (data axis = sessions)",
    )
    ap.add_argument(
        "--model-parallel", type=int, default=1,
        help="tensor-parallel degree over the model axis (implies --mesh)",
    )
    ap.add_argument(
        "--pipeline-stages", type=int, default=1,
        help="pipeline-parallel stages: split the encoder layer stack into "
        "N slabs over a `stage` mesh axis; a chunk's pulls flow through "
        "them as ppermute microbatches (LSTM family). The whole step runs "
        "as one shard_map over a (data, stage) mesh — remaining devices "
        "form the data axis, the fused Pallas/int8 kernels stay alive on "
        "each stage's slab, and multi-process meshes are supported "
        "(tests/test_multihost_2proc.py). Steady-state stage utilization "
        "is P/(P+N-1) for P pulls per chunk (e.g. 25 pulls, 2 stages: 96%)",
    )
    ap.add_argument(
        "--profile-dir", default=None,
        help="write a jax.profiler trace of the first engine ticks here "
        "(view with TensorBoard's profile plugin or ui.perfetto.dev)",
    )
    ap.add_argument(
        "--profile-ticks", type=int, default=50,
        help="non-idle ticks to trace before finalizing --profile-dir",
    )
    ap.add_argument(
        "--precision", default=None, choices=["f32", "bf16", "int8"],
        help="serving numerics: f32 (as stored), bf16 (cast matrices), "
        "int8 (bf16 + per-channel int8 encoder matmuls on the MXU's "
        "2x-rate int8 mode); defaults to APRIL_PRECISION or the stored dtype",
    )
    ap.add_argument(
        "--scrub-every", type=float, default=30.0,
        help="seconds between per-slot non-finite state sweeps (elastic "
        "serving: poisoned sessions are evicted with SESSION_ERROR and "
        "reset; 0 disables)",
    )
    args = ap.parse_args(argv)

    from ..api import Model
    from ..engine.batch import BatchEngine

    model = Model(args.model, precision=args.precision)
    mesh = None
    if args.pipeline_stages > 1:
        if args.model_parallel > 1:
            print("error: --pipeline-stages and --model-parallel are exclusive",
                  file=sys.stderr)
            return 1
        import jax
        import numpy as _np
        from jax.sharding import Mesh

        ns = args.pipeline_stages
        nd = max(1, len(jax.devices()) // ns)  # leftover devices: data axis
        mesh = Mesh(
            _np.array(jax.devices()[: nd * ns]).reshape(nd, ns),
            ("data", "stage"),
        )
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}", file=sys.stderr)
    elif args.mesh or args.model_parallel > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(model_parallel=args.model_parallel)
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}", file=sys.stderr)
    engine = BatchEngine(model.runtime, batch=args.slots, mesh=mesh)
    print(
        f"serving {model.get_name()} on {args.host}:{args.port} "
        f"({args.slots} slots, {model.get_sample_rate()} Hz)",
        file=sys.stderr,
    )
    server = _Server(
        (args.host, args.port),
        _Handler,
        engine,
        model.runtime.params,
        profile_dir=args.profile_dir,
        profile_ticks=args.profile_ticks,
        scrub_every=args.scrub_every,
        model_info={
            "name": model.get_name(),
            "description": model.get_description(),
            "language": model.get_language(),
            "sample_rate": model.get_sample_rate(),
        },
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
