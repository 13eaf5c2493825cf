#!/usr/bin/env bash
# One-command CI for every surface of april_asr_tpu (counterpart of the
# reference's build+package workflow, reference: .github/workflows/
# main.ci.yml:12-126 — which only compiles; this also RUNS everything).
#
#   tools/ci.sh            full run: native libs, pytest, live-server smoke
#                          of the C / Python surfaces, Java + C# when their
#                          toolchains exist (gradle / dotnet), else SKIP
#   tools/ci.sh --quick    skip the full pytest suite (smokes only)
#
# Requires: gcc/g++, python with the repo installed (pip install -e .).
set -u
cd "$(dirname "$0")/.."
REPO="$PWD"
WORK="$(mktemp -d)"
trap 'if [ -n "${SERVE_PID:-}" ]; then kill "$SERVE_PID" 2>/dev/null; fi; rm -rf "$WORK"' EXIT

export JAX_PLATFORMS="${JAX_PLATFORMS:-cpu}"

PASS=()
FAIL=()
SKIP=()
note() { echo ">>> $*"; }
ok()   { PASS+=("$1"); note "PASS: $1"; }
bad()  { FAIL+=("$1"); note "FAIL: $1"; }
skip() { SKIP+=("$1 ($2)"); note "SKIP: $1 ($2)"; }

# -- 1. native libraries -----------------------------------------------------
note "building native libraries"
if g++ -O2 -shared -fPIC -std=c++17 native/april_capi.cc \
       -o "$WORK/libapril_tpu.so" -pthread; then
    ok "build libapril_tpu.so (C ABI client)"
else
    bad "build libapril_tpu.so (C ABI client)"
fi
if python - <<'EOF'
from april_asr_tpu.native import load_native
raise SystemExit(0 if load_native() is not None else 1)
EOF
then
    ok "build april_native extension (SPSC ring / stretcher / replay)"
else
    bad "build april_native extension"
fi

# -- 1a. TSAN: native host runtime race check --------------------------------
# (the reference's cautionary tale: its SPSC ring's `#define _Atomic
# volatile` on MSVC, src/audio_provider.c:25-27; VERDICT r2 item 9)
note "tsan: native runtime race check"
if g++ -O2 -g -std=c++17 -fsanitize=thread native/april_native.cc \
       native/tsan_driver.cc -o "$WORK/tsan_driver" -pthread 2>/dev/null; then
    if "$WORK/tsan_driver" >"$WORK/tsan.log" 2>&1; then
        ok "tsan: ring + stretcher clean ($(tail -1 "$WORK/tsan.log"))"
    else
        cat "$WORK/tsan.log"; bad "tsan: native runtime race check"
    fi
else
    skip "tsan" "g++ lacks -fsanitize=thread"
fi

# -- 1b. wheel: build + install into a fresh venv ----------------------------
# (reference CI packages wheels that ship the .so inside the package,
# .github/workflows/main.ci.yml:12-126 + bindings/python/setup.py:20-37;
# here setup.py BuildPyWithNative embeds libapril_native/libapril_tpu/_replay)
note "building wheel"
if pip wheel . --no-deps --no-build-isolation -w "$WORK/dist" >"$WORK/wheel.log" 2>&1; then
    WHEEL=$(ls "$WORK"/dist/*.whl 2>/dev/null | head -1)
    ok "build wheel ($(basename "$WHEEL"))"
    # fresh venv; jax/numpy come from the outer environment's site-packages
    # via PYTHONPATH (zero egress forbids installing them — and PYTHONPATH
    # does NOT process .pth files, so any editable april install there
    # cannot shadow the wheel under test)
    BASE_SITE=$(python -c "import sysconfig; print(sysconfig.get_paths()['purelib'])")
    if python -m venv "$WORK/venv" >/dev/null 2>&1 \
       && "$WORK/venv/bin/pip" install --no-deps --no-index -q "$WHEEL" \
       && cd "$WORK" \
       && JAX_PLATFORMS=cpu PYTHONPATH="$BASE_SITE" "$WORK/venv/bin/python" - <<'PYEOF'
import sys
import april_asr_tpu
assert "venv" in april_asr_tpu.__file__, f"wrong install resolved: {april_asr_tpu.__file__}"
from april_asr_tpu.native import capi_library_path, load_native
from april_asr_tpu.native.replay_ext import load_replay_ext
assert load_native() is not None, "native runtime missing from wheel"
assert load_replay_ext() is not None, "replay extension missing from wheel"
assert capi_library_path(), "C ABI client library missing from wheel"
print("wheel ok:", april_asr_tpu.__file__)
print("capi lib:", capi_library_path())
PYEOF
    then
        cd "$REPO"
        ok "wheel installs in a fresh venv (native libs embedded)"
    else
        cd "$REPO"
        bad "wheel venv install"
    fi
else
    tail -5 "$WORK/wheel.log"; bad "build wheel"
fi

# -- 2. test suite -----------------------------------------------------------
if [ "${1:-}" = "--quick" ]; then
    skip "pytest suite" "--quick"
else
    note "running pytest"
    if python -m pytest tests/ -x -q; then
        ok "pytest suite"
    else
        bad "pytest suite"
    fi
fi

# -- 3. live server + every client surface -----------------------------------
note "generating fixture model + starting april-serve"
python tools/make_test_model.py "$WORK/ci.april" || bad "fixture model"
PORT=$(python - <<'EOF'
import socket
s = socket.socket(); s.bind(("127.0.0.1", 0)); print(s.getsockname()[1]); s.close()
EOF
)
python -m april_asr_tpu.cli.serve "$WORK/ci.april" --port "$PORT" \
    >"$WORK/serve.log" 2>&1 &
SERVE_PID=$!
for i in $(seq 1 120); do
    if python - "$PORT" <<'EOF'
import socket, sys
s = socket.socket()
s.settimeout(1)
try:
    s.connect(("127.0.0.1", int(sys.argv[1])))
except OSError:
    raise SystemExit(1)
EOF
    then break; fi
    if ! kill -0 "$SERVE_PID" 2>/dev/null; then
        echo "--- serve.log ---"; tail -20 "$WORK/serve.log"
        bad "april-serve startup"; break
    fi
    sleep 1
done

ENDPOINT="127.0.0.1:$PORT"

# Python client over the documented wire protocol (serve.py docstring)
if python - "$ENDPOINT" <<'EOF'
import json, socket, struct, sys

import numpy as np

host, port = sys.argv[1].rsplit(":", 1)
s = socket.create_connection((host, int(port)), timeout=120)
t = np.arange(16000) / 16000.0
rng = np.random.default_rng(7)
pcm = ((8000 * np.sin(2 * np.pi * 440 * t))
       + rng.integers(-2000, 2000, t.shape)).astype(np.int16).tobytes()
for off in range(0, len(pcm), 6400):
    piece = pcm[off:off + 6400]
    s.sendall(struct.pack("<BI", 1, len(piece)) + piece)
s.sendall(struct.pack("<BI", 2, 0))
s.settimeout(120)
got = 0
f = s.makefile()
for line in f:
    msg = json.loads(line)
    got += 1
    if msg.get("result") in ("final", 2):
        break
raise SystemExit(0 if got > 0 else 1)
EOF
then ok "python wire-protocol client smoke"; else bad "python wire-protocol client smoke"; fi

# C surface: compile + run the example against the live server
if gcc -O2 examples/c/main.c -Inative -L"$WORK" -lapril_tpu \
       -Wl,-rpath,"$WORK" -o "$WORK/c_example"; then
    if "$WORK/c_example" '?' "$ENDPOINT" >"$WORK/c_out.txt" 2>&1; then
        ok "C example end-to-end (examples/c/main.c)"
    else
        cat "$WORK/c_out.txt"; bad "C example end-to-end"
    fi
else
    bad "compile C example"
fi

# Java surface (gradlew bootstraps gradle: PATH -> cache -> download)
if command -v java >/dev/null 2>&1; then
    if (cd bindings/java && APRIL_SERVE_ENDPOINT="$ENDPOINT" \
         APRIL_NATIVE_LIB_DIR="$WORK" ./gradlew --console=plain -q test); then
        ok "java binding (gradlew test)"
    else
        rc=$?
        if [ "$rc" = "69" ]; then
            skip "java binding" "no gradle and no network to bootstrap one"
        else
            bad "java binding (gradlew test)"
        fi
    fi
else
    skip "java binding" "no JDK in image"
fi

# C# surface
if command -v dotnet >/dev/null 2>&1; then
    if LD_LIBRARY_PATH="$WORK:${LD_LIBRARY_PATH:-}" \
       dotnet run --project bindings/csharp/AprilAsrTpu.Smoke -- "$ENDPOINT"; then
        ok "csharp binding (dotnet smoke)"
    else
        bad "csharp binding (dotnet smoke)"
    fi
else
    skip "csharp binding" "no dotnet in image"
fi

kill "$SERVE_PID" 2>/dev/null
SERVE_PID=""

# -- summary -----------------------------------------------------------------
echo
echo "== CI summary =="
for p in "${PASS[@]:-}"; do [ -n "$p" ] && echo "  PASS  $p"; done
for s in "${SKIP[@]:-}"; do [ -n "$s" ] && echo "  SKIP  $s"; done
for f in "${FAIL[@]:-}"; do [ -n "$f" ] && echo "  FAIL  $f"; done
[ "${#FAIL[@]}" -eq 0 ]
