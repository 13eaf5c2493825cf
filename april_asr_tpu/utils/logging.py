"""Leveled stderr logger.

TPU-native equivalent of the reference's log macros (reference: src/log.h:23-56
and src/init.c:36-44): level gated by the APRIL_LOG_LEVEL environment variable,
ANSI-colored level tags, file:line prefixes. Unlike the reference this also
exposes structured counters for the serving engine (sessions active, dropped
chunks, etc.) via `metrics`.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from collections import defaultdict

LEVEL_ERROR = 0
LEVEL_WARNING = 1
LEVEL_INFO = 2
LEVEL_DEBUG = 3

_LEVEL_NAMES = {
    "ERROR": LEVEL_ERROR,
    "WARNING": LEVEL_WARNING,
    "INFO": LEVEL_INFO,
    "DEBUG": LEVEL_DEBUG,
}

_COLORS = {
    LEVEL_ERROR: "\x1b[31m",
    LEVEL_WARNING: "\x1b[33m",
    LEVEL_INFO: "\x1b[36m",
    LEVEL_DEBUG: "\x1b[90m",
}
_RESET = "\x1b[0m"
_TAGS = {
    LEVEL_ERROR: "ERROR",
    LEVEL_WARNING: "WARN ",
    LEVEL_INFO: "INFO ",
    LEVEL_DEBUG: "DEBUG",
}


def _env_level() -> int:
    raw = os.environ.get("APRIL_LOG_LEVEL", "WARNING").strip().upper()
    if raw.isdigit():
        return max(LEVEL_ERROR, min(LEVEL_DEBUG, int(raw)))
    return _LEVEL_NAMES.get(raw, LEVEL_WARNING)


_level = _env_level()
_lock = threading.Lock()


def set_level(level: int) -> None:
    global _level
    _level = level


def get_level() -> int:
    return _level


def _log(level: int, msg: str, *args) -> None:
    if level > _level:
        return
    if args:
        msg = msg % args
    frame = sys._getframe(2)
    loc = f"{os.path.basename(frame.f_code.co_filename)}:{frame.f_lineno}"
    color = _COLORS[level] if sys.stderr.isatty() else ""
    reset = _RESET if sys.stderr.isatty() else ""
    with _lock:
        print(f"{color}[{_TAGS[level]}]{reset} {loc}: {msg}", file=sys.stderr)


def error(msg: str, *args) -> None:
    _log(LEVEL_ERROR, msg, *args)


def warning(msg: str, *args) -> None:
    _log(LEVEL_WARNING, msg, *args)


def info(msg: str, *args) -> None:
    _log(LEVEL_INFO, msg, *args)


def debug(msg: str, *args) -> None:
    _log(LEVEL_DEBUG, msg, *args)


class Metrics:
    """Structured counters for observability (no analog in the reference,
    which only has the stderr logger; see SURVEY.md §5)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._counters = defaultdict(float)
        self._gauges = {}
        self._samples = {}
        self._sample_pos = {}
        self.start_time = time.time()

    def incr(self, name: str, amount: float = 1.0) -> None:
        with self._lock:
            self._counters[name] += amount

    def gauge(self, name: str, value: float) -> None:
        with self._lock:
            self._gauges[name] = value

    def observe(self, name: str, value: float, keep: int = 4096) -> None:
        """Record a sample into a bounded reservoir (ring) for percentile
        reporting — e.g. step latency, partial-result latency."""
        with self._lock:
            ring = self._samples.setdefault(name, [])
            if len(ring) >= keep:
                ring[self._sample_pos.get(name, 0) % keep] = value
                self._sample_pos[name] = self._sample_pos.get(name, 0) + 1
            else:
                ring.append(value)

    def percentiles(self, name: str, qs=(50, 99)) -> dict:
        with self._lock:
            ring = list(self._samples.get(name, ()))
        if not ring:
            return {}
        ring.sort()
        return {
            f"p{q}": ring[min(len(ring) - 1, int(len(ring) * q / 100))] for q in qs
        }

    def snapshot(self) -> dict:
        with self._lock:
            out = dict(self._counters)
            out.update(self._gauges)
            names = list(self._samples)
        for n in names:
            for q, v in self.percentiles(n).items():
                out[f"{n}_{q}"] = v
        out["uptime_s"] = time.time() - self.start_time
        return out


metrics = Metrics()
