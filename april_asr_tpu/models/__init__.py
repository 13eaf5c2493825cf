from .loader import ModelRuntime, load_model
from .lstm_transducer import (
    TransducerDims,
    conv_subsample,
    decoder_step,
    encoder_chunk,
    encoder_seq,
    encoder_step,
    init_streaming_state,
    init_transducer_params,
    joiner_logits,
)

__all__ = [
    "ModelRuntime",
    "load_model",
    "TransducerDims",
    "init_transducer_params",
    "init_streaming_state",
    "encoder_step",
    "encoder_seq",
    "encoder_chunk",
    "decoder_step",
    "joiner_logits",
    "conv_subsample",
]
