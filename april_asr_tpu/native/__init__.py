"""Native host-runtime bindings: SPSC audio ring + realtime time-stretch.

Loads ``libapril_native.so`` (C++17, built from ``native/april_native.cc``)
via ctypes; if the shared library is missing it is compiled on first use with
g++ (cached next to the source), and if no compiler is available a pure-NumPy
fallback provides the same API.

These are the TPU framework's equivalents of the reference's host-side C
runtime (reference: src/audio_provider.{c,h} SPSC ring between caller and
worker threads; src/sonic/sonic.{c,h} PICOLA time-stretch for the ASYNC_RT
catch-up mode, fbank.c:174-186).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from ..utils import logging as log

_lib = None
_lib_lock = threading.Lock()
_lib_tried = False


def _pkg_dir() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def _source_path() -> str:
    """april_native.cc: the repo checkout's native/ dir, or the _src/ copy
    a wheel ships (setup.py BuildPyWithNative)."""
    repo = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "april_native.cc",
    )
    if os.path.exists(repo):
        return repo
    return os.path.join(_pkg_dir(), "_src", "april_native.cc")


def capi_library_path() -> Optional[str]:
    """Path to the prebuilt C ABI client library (libapril_tpu.so) when this
    install ships one (wheel builds with a toolchain); None otherwise. C/C#/
    Java clients can dlopen this directly."""
    p = os.path.join(_pkg_dir(), "_lib", "libapril_tpu.so")
    return p if os.path.exists(p) else None


def _build(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:  # compiler missing, read-only tree, ...
        log.debug("native build failed: %s", e)
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _lib, _lib_tried
    with _lib_lock:
        if _lib is not None or _lib_tried:
            return _lib
        _lib_tried = True
        src = _source_path()
        candidates = [
            # wheel-shipped prebuilt (setup.py BuildPyWithNative)
            os.path.join(_pkg_dir(), "_lib", "libapril_native.so"),
            os.path.join(os.path.dirname(src), "libapril_native.so"),
            os.path.join(
                os.environ.get("APRIL_NATIVE_CACHE", os.path.expanduser("~/.cache/april_asr_tpu")),
                "libapril_native.so",
            ),
        ]
        for so in candidates:
            if os.path.exists(so):
                break
        else:
            so = None
            if os.path.exists(src):
                for cand in candidates:
                    os.makedirs(os.path.dirname(cand), exist_ok=True)
                    if _build(src, cand):
                        so = cand
                        break
        if so is None:
            log.info("native runtime unavailable; using NumPy fallback")
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:
            log.warning("failed to load %s: %s", so, e)
            return None
        _bind(lib)
        _lib = lib
        return _lib


def _bind(lib: ctypes.CDLL) -> None:
    i16p = ctypes.POINTER(ctypes.c_int16)
    u64 = ctypes.c_uint64
    p = ctypes.c_void_p
    sigs = {
        "an_ring_create": ([u64], p),
        "an_ring_free": ([p], None),
        "an_ring_capacity": ([p], u64),
        "an_ring_available": ([p], u64),
        "an_ring_dropped": ([p], u64),
        "an_ring_push": ([p, i16p, u64], u64),
        "an_ring_pull": ([p, i16p, u64], u64),
        "an_stretch_create": ([ctypes.c_int], p),
        "an_stretch_free": ([p], None),
        "an_stretch_set_speed": ([p, ctypes.c_double], None),
        "an_stretch_get_speed": ([p], ctypes.c_double),
        "an_stretch_write": ([p, i16p, u64], None),
        "an_stretch_flush": ([p], None),
        "an_stretch_available": ([p], u64),
        "an_stretch_read": ([p, i16p, u64], u64),
        "an_version": ([], ctypes.c_int),
    }
    for name, (argtypes, restype) in sigs.items():
        fn = getattr(lib, name)
        fn.argtypes = argtypes
        fn.restype = restype


def _i16p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))


class AudioRing:
    """Bounded SPSC PCM16 ring. ``push`` is all-or-nothing: False means the
    block did not fit and the caller should report CANT_KEEP_UP (reference
    ap_push_audio semantics, audio_provider.c:59-64)."""

    def __init__(self, capacity: int):
        self._lib = load_native()
        if self._lib is not None:
            self._h = self._lib.an_ring_create(capacity)
            if not self._h:
                raise MemoryError("an_ring_create failed")
        else:
            self._buf = np.zeros(capacity, np.int16)
            self._head = 0
            self._tail = 0
            self._dropped = 0
            self._lock = threading.Lock()
        self.capacity = capacity

    def push(self, pcm: np.ndarray) -> bool:
        pcm = np.ascontiguousarray(pcm, np.int16)
        if self._lib is not None:
            return bool(self._lib.an_ring_push(self._h, _i16p(pcm), len(pcm)))
        with self._lock:
            if self._tail - self._head + len(pcm) > self.capacity:
                self._dropped += len(pcm)
                return False
            idx = (self._tail + np.arange(len(pcm))) % self.capacity
            self._buf[idx] = pcm
            self._tail += len(pcm)
            return True

    def pull(self, max_samples: int) -> np.ndarray:
        if self._lib is not None:
            out = np.empty(max_samples, np.int16)
            n = self._lib.an_ring_pull(self._h, _i16p(out), max_samples)
            return out[:n]
        with self._lock:
            n = min(self._tail - self._head, max_samples)
            idx = (self._head + np.arange(n)) % self.capacity
            out = self._buf[idx].copy()
            self._head += n
            return out

    @property
    def available(self) -> int:
        if self._lib is not None:
            return int(self._lib.an_ring_available(self._h))
        with self._lock:
            return self._tail - self._head

    @property
    def dropped(self) -> int:
        if self._lib is not None:
            return int(self._lib.an_ring_dropped(self._h))
        return self._dropped

    def close(self) -> None:
        if self._lib is not None and getattr(self, "_h", None):
            self._lib.an_ring_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class TimeStretcher:
    """Pitch-synchronous speed-up (>= 1x) of PCM16 audio, used by ASYNC_RT
    sessions to catch up when processing falls behind realtime (reference:
    fbank_set_speed + sonic, fbank.c:164-186)."""

    def __init__(self, sample_rate: int):
        self._lib = load_native()
        self.sample_rate = sample_rate
        self._speed = 1.0
        if self._lib is not None:
            self._h = self._lib.an_stretch_create(sample_rate)
            if not self._h:
                raise MemoryError("an_stretch_create failed")
        else:
            self._pending = np.zeros(0, np.int16)
            self._min_p = max(4, sample_rate // 400)
            self._max_p = sample_rate // 65

    @property
    def speed(self) -> float:
        return self._speed

    def set_speed(self, speed: float) -> None:
        self._speed = max(1.0, float(speed))
        if self._lib is not None:
            self._lib.an_stretch_set_speed(self._h, self._speed)

    def process(self, pcm: np.ndarray, flush: bool = False) -> np.ndarray:
        """Feed samples, return whatever stretched output is ready."""
        pcm = np.ascontiguousarray(pcm, np.int16)
        if self._lib is not None:
            if len(pcm):
                self._lib.an_stretch_write(self._h, _i16p(pcm), len(pcm))
            if flush:
                self._lib.an_stretch_flush(self._h)
            n = int(self._lib.an_stretch_available(self._h))
            out = np.empty(n, np.int16)
            if n:
                self._lib.an_stretch_read(self._h, _i16p(out), n)
            return out
        return self._process_numpy(pcm, flush)

    def _process_numpy(self, pcm: np.ndarray, flush: bool) -> np.ndarray:
        buf = np.concatenate([self._pending, pcm])
        speed = self._speed
        if speed <= 1.0 + 1e-6:
            self._pending = np.zeros(0, np.int16)
            return buf
        out = []
        pos = 0
        x = buf.astype(np.float32)
        while len(buf) - pos >= 2 * self._max_p:
            seg = x[pos : pos + 2 * self._max_p]
            p = self._find_period(seg)
            t = np.arange(p, dtype=np.float32) / max(p, 1)
            ola = seg[:p] * (1.0 - t) + seg[p : 2 * p] * t
            out.append(ola.astype(np.int16))
            pos += 2 * p
            if speed < 2.0:
                keep = int(round(p * (2.0 - speed) / (speed - 1.0)))
                keep = min(keep, len(buf) - pos)
                out.append(buf[pos : pos + keep])
                pos += keep
            elif speed > 2.0:
                pos += min(int(round(p * (speed - 2.0))), len(buf) - pos)
        self._pending = buf[pos:]
        if flush and len(self._pending):
            n_in = len(self._pending)
            n_out = int(n_in / speed)
            t = np.arange(n_out) * speed
            j = np.minimum(t.astype(np.int64), n_in - 1)
            j1 = np.minimum(j + 1, n_in - 1)
            frac = (t - j).astype(np.float32)
            tail = self._pending[j] * (1.0 - frac) + self._pending[j1] * frac
            out.append(tail.astype(np.int16))
            self._pending = np.zeros(0, np.int16)
        return np.concatenate(out) if out else np.zeros(0, np.int16)

    def _find_period(self, seg: np.ndarray) -> int:
        periods = np.arange(self._min_p, self._max_p + 1)
        # vectorized AMDF on a subsampled grid
        best_p, best = self._min_p, None
        for p in periods:
            d = np.mean(np.abs(seg[0:p:4] - seg[p : 2 * p : 4]))
            if best is None or d < best:
                best, best_p = d, int(p)
        return best_p

    def close(self) -> None:
        if self._lib is not None and getattr(self, "_h", None):
            self._lib.an_stretch_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def native_available() -> bool:
    return load_native() is not None
