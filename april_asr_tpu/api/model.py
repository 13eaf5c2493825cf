"""Model API mirroring the reference Python binding's Model class
(reference: bindings/python/april_asr/_april.py:59-96, C API
april_api.h:58-74)."""

from __future__ import annotations

import os
import threading
from typing import Dict, Optional, Tuple

from ..config import DecodeConfig, EngineConfig
from ..models.loader import ModelRuntime, load_model
from ..utils import logging as log

_cache_enabled = False


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache so CLI/server restarts reuse compiled
    engine programs (first compile of the fused step is expensive on TPU)."""
    global _cache_enabled
    if _cache_enabled:
        return
    _cache_enabled = True
    try:
        import jax

        path = os.environ.get(
            "APRIL_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "april_asr_tpu", "jaxcache"),
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        log.debug("compilation cache unavailable: %s", e)


def apply_precision(weights, precision: str):
    """Apply a serving precision policy to a weights pytree: "f32" (no-op),
    "bf16" (cast matrices), or "int8" (bf16 + per-channel int8 quantization
    of the encoder layer matrices, which the engine's matmul paths pick up
    automatically)."""
    from ..models.lstm_transducer import cast_weights, quantize_weights

    if precision in (None, "", "f32", "float32"):
        return weights
    if precision in ("bf16", "bfloat16"):
        import jax.numpy as jnp

        return cast_weights(weights, jnp.bfloat16)
    if precision == "int8":
        import jax.numpy as jnp

        w = quantize_weights(weights)  # quantizes from the f32 originals
        if not any(k.endswith("_q8") for k in w):
            log.warning(
                "precision=int8: no quantizable encoder matrices found for "
                "this model family; serving with bf16 numerics"
            )
        return cast_weights(w, jnp.bfloat16)
    raise ValueError(f"unknown precision {precision!r} (f32 | bf16 | int8)")


class Model:
    """A loaded `.april` speech-to-text model.

    Many sessions may share one Model (the reference's multi-session pattern,
    april-docs/src/concepts.md:41-46); sessions created from the same Model
    share weights on device.
    """

    def __init__(
        self,
        path: str | os.PathLike,
        prefer_native: bool = True,
        precision: Optional[str] = None,
    ):
        """`precision` selects the serving numerics: "f32" (as loaded),
        "bf16" (cast matrix weights, f32 accumulation — the recommended
        default for TPUs), or "int8" (bf16 plus per-channel int8 encoder
        matmuls on the MXU's 2x-rate int8 mode; see
        models/lstm_transducer.quantize_weights). Defaults to the
        APRIL_PRECISION env var, else the weights' stored dtype."""
        _enable_compile_cache()
        self._rt: ModelRuntime = load_model(path, prefer_native=prefer_native)
        precision = precision or os.environ.get("APRIL_PRECISION")
        if precision:
            self._rt.weights = apply_precision(self._rt.weights, precision)
        # Shared engines keyed by (batch, chunk) — sessions attach to slots.
        self._engines: Dict[Tuple[int, int], object] = {}
        self._lock = threading.Lock()

    def get_name(self) -> str:
        return self._rt.name

    def get_description(self) -> str:
        return self._rt.description

    def get_language(self) -> str:
        return self._rt.language

    def get_sample_rate(self) -> int:
        return self._rt.sample_rate

    @property
    def runtime(self) -> ModelRuntime:
        return self._rt

    def _get_program(
        self,
        batch: int,
        cfg: Optional[EngineConfig] = None,
        dcfg: Optional[DecodeConfig] = None,
    ):
        """Cached compiled engine program (shared across sessions/engines of
        the same shape, so N sessions don't trigger N compilations)."""
        from ..engine.step import build_engine

        cfg = cfg or EngineConfig()
        dcfg = dcfg or DecodeConfig()
        key = (batch, cfg.chunk_samples)
        with self._lock:
            prog = self._engines.get(key)
            if prog is None:
                prog = build_engine(self._rt, batch, cfg, dcfg)
                self._engines[key] = prog
            return prog

    def _get_beam_program(
        self,
        batch: int,
        beam: int,
        cfg: Optional[EngineConfig] = None,
    ):
        """Cached compiled streaming-beam program (framework extension; see
        engine/beam_engine.py)."""
        from ..decode.beam import BeamConfig
        from ..engine.beam_engine import build_beam_engine

        cfg = cfg or EngineConfig()
        key = (batch, cfg.chunk_samples, "beam", beam)
        with self._lock:
            prog = self._engines.get(key)
            if prog is None:
                prog = build_beam_engine(
                    self._rt, batch, cfg, BeamConfig(beam=beam)
                )
                self._engines[key] = prog
            return prog
