from .batch import BatchEngine
from .replay import EventReplayer
from .step import EngineProgram, build_engine, init_engine_state

__all__ = [
    "BatchEngine",
    "EventReplayer",
    "EngineProgram",
    "build_engine",
    "init_engine_state",
]
