"""Model export: native JAX transducer weights -> `.april` files.

Counterpart of the reference's exporter (reference: extra/export-april.py) and
of SURVEY.md §2.3's model-export tooling, with two output forms:

  * ONNX form (model type 1): three opset-11 graphs built by io/onnx_build.py
    — byte-format compatible with the reference library (and ONNXRuntime).
  * native form (model type 64): a single safetensors blob + dims metadata —
    fastest load path for this framework; the reference rejects the unknown
    type cleanly.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np

from ..io.container import (
    MODEL_LSTM_TRANSDUCER_STATELESS,
    MODEL_NATIVE_TRANSDUCER_TPU,
    AprilContainer,
    write_container,
)
from ..io.onnx_build import build_transducer_graphs
from ..io.params import ModelParameters
from ..io.safetensors import save_safetensors_bytes
from .lstm_transducer import TransducerDims, is_derived


def make_model_parameters(
    dims: TransducerDims,
    tokens: List[bytes],
    blank_id: int = 0,
    sample_rate: int = 16000,
) -> ModelParameters:
    return ModelParameters(
        batch_size=1,
        segment_size=dims.segment_size,
        segment_step=dims.segment_step,
        mel_features=dims.mel,
        sample_rate=sample_rate,
        frame_shift_ms=10,
        frame_length_ms=25,
        round_pow2=True,
        mel_low=20,
        mel_high=0,
        snip_edges=False,
        blank_id=blank_id,
        tokens=tokens,
    )


def save_april(
    path,
    dims: TransducerDims,
    params: Dict[str, np.ndarray],
    model_params: ModelParameters,
    name: str = "Exported Model",
    description: str = "Exported by april_asr_tpu",
    language: str = "en-us",
    form: str = "onnx",
) -> None:
    """Write a .april file from a native weights pytree.

    form="onnx": reference-compatible (type 1, 3 ONNX networks).
    form="native": framework-native (type 64, safetensors payload).
    """
    np_params = {
        k: np.asarray(v) for k, v in params.items() if not is_derived(k)
    }
    from .conformer import ConformerDims

    arch = "conformer" if isinstance(dims, ConformerDims) else "lstm"
    if form == "onnx":
        if arch != "lstm":
            raise ValueError(
                "onnx form is reference-compatible and supports only the "
                "LSTM transducer; use form='native' for conformer models"
            )
        networks = list(build_transducer_graphs(dims, np_params))
        model_type = MODEL_LSTM_TRANSDUCER_STATELESS
    elif form == "native":
        meta = {"dims": dataclasses.asdict(dims), "arch": arch}
        networks = [save_safetensors_bytes(np_params, metadata=meta)]
        model_type = MODEL_NATIVE_TRANSDUCER_TPU
    else:
        raise ValueError(f"unknown export form {form!r}")

    container = AprilContainer(
        language=language,
        name=name,
        description=description,
        model_type=model_type,
        params=model_params,
        networks=networks,
    )
    write_container(path, container)
