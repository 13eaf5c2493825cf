"""Build-on-first-use loader for the native packed-event replay extension.

`native/replay_ext.c` is a CPython extension module (not a ctypes library:
it manipulates Python lists and calls back into handlers, so it needs the
C API). Compiled with the interpreter's include path on first use and
cached; `load_replay_ext()` returns the module or None, in which case
engine/batch.py falls back to the pure-Python replay loop.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig
import threading
from typing import Optional

from ..utils import logging as log

_mod = None
_tried = False
_lock = threading.Lock()


def _source_path() -> str:
    repo = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "replay_ext.c",
    )
    if os.path.exists(repo):
        return repo
    # wheel install: the _src/ copy shipped by setup.py BuildPyWithNative
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "_src", "replay_ext.c"
    )


def _build(src: str, out: str) -> bool:
    inc = sysconfig.get_paths()["include"]
    try:
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", f"-I{inc}", src, "-o", out],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:
        log.debug("replay extension build failed: %s", e)
        return False


def load_replay_ext():
    """The `_replay` extension module, or None if it can't be built."""
    global _mod, _tried
    with _lock:
        if _mod is not None or _tried:
            return _mod
        _tried = True
        if os.environ.get("APRIL_NO_NATIVE_REPLAY"):
            return None
        src = _source_path()
        soname = "_replay" + (sysconfig.get_config_var("EXT_SUFFIX") or ".so")
        candidates = [
            # wheel-shipped prebuilt (setup.py BuildPyWithNative)
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "_lib", soname
            ),
            os.path.join(os.path.dirname(src), soname),
            os.path.join(
                os.environ.get(
                    "APRIL_NATIVE_CACHE", os.path.expanduser("~/.cache/april_asr_tpu")
                ),
                soname,
            ),
        ]
        so: Optional[str] = None
        for cand in candidates:
            if os.path.exists(cand) and os.path.getmtime(cand) >= (
                os.path.getmtime(src) if os.path.exists(src) else 0
            ):
                so = cand
                break
        if so is None and os.path.exists(src):
            for cand in candidates:
                try:
                    os.makedirs(os.path.dirname(cand), exist_ok=True)
                except OSError:
                    continue
                if _build(src, cand):
                    so = cand
                    break
        if so is None:
            log.info("native replay extension unavailable; using Python replay")
            return None
        try:
            spec = importlib.util.spec_from_file_location("april_asr_tpu._replay", so)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
        except Exception as e:
            log.warning("failed to load %s: %s", so, e)
            return None
        _mod = mod
        return _mod
