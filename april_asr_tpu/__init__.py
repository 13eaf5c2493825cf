"""april_asr_tpu — a TPU-native streaming speech-to-text framework.

Provides the capabilities of the april-asr reference library (model loading
from `.april` files, streaming PCM16 sessions with PARTIAL/FINAL/SILENCE
results) rebuilt from scratch on JAX/XLA/Pallas: batched multi-session serving,
device-mesh parallelism, and transducer training.

The public surface mirrors the reference Python binding
(reference: bindings/python/april_asr/_april.py): `Model`, `Session`, `Token`,
`Result`, plus `init()` in place of `aam_api_init` (reference: src/init.c:33-51).
"""

import os as _os

from .version import APRIL_VERSION, __version__
from .config import DecodeConfig, EngineConfig, FbankOptions, MeshConfig

# Restore standard JAX_PLATFORMS env semantics: this box's sitecustomize
# force-registers the remote TPU platform in a way that overrides the env
# var, which silently routes "CPU" runs (tests, CLI smoke checks) to the
# remote chip and its multi-minute transport stalls. The config update wins
# over the sitecustomize registration as long as it lands before the first
# backend use, which package import time guarantees for our entry points.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

_initialized = False


def init(version: int = APRIL_VERSION) -> None:
    """Optional explicit init, mirroring aam_api_init (reference: src/init.c:33-51).

    The reference requires this to grab the ORT API pointer; here there is no
    global backend handle, so this only validates the requested ABI version and
    re-reads APRIL_LOG_LEVEL. Calling it is optional.
    """
    global _initialized
    if version != APRIL_VERSION:
        raise ValueError(
            f"unsupported API version {version}, expected {APRIL_VERSION}"
        )
    _initialized = True


# Public API re-exports (imported lazily to keep `import april_asr_tpu` light
# for tools that only need io/config).
def __getattr__(name):
    if name in (
        "Model",
        "Session",
        "Token",
        "Result",
        "transcribe_files",
        "transcribe_pcm_batch",
    ):
        from . import api

        return getattr(api, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "__version__",
    "APRIL_VERSION",
    "init",
    "Model",
    "Session",
    "Token",
    "Result",
    "transcribe_files",
    "transcribe_pcm_batch",
    "DecodeConfig",
    "EngineConfig",
    "FbankOptions",
    "MeshConfig",
]
