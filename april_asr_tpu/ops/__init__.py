from .onnx2jax import OnnxUnsupported, lower_graph, supported_ops

__all__ = ["lower_graph", "supported_ops", "OnnxUnsupported"]
