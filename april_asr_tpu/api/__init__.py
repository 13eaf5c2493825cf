from .model import Model
from .offline import transcribe_files, transcribe_pcm_batch
from .session import Session
from .types import Result, Token

__all__ = [
    "Model",
    "Session",
    "Result",
    "Token",
    "transcribe_files",
    "transcribe_pcm_batch",
]
