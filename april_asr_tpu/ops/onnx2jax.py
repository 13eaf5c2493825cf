"""Lower a parsed ONNX graph to a jittable JAX function.

This is the universal execution path for `.april` models: whatever graph the
exporter traced (reference: extra/export-april.py:226-332 traces icefall
modules with torch.onnx at opset 11), it executes under `jax.jit` on TPU. The
native fast path (models/extract.py) pattern-matches known architectures out
of the same graphs for fused batched kernels; this interpreter is the fallback
that guarantees any reference model file keeps working.

Design notes (TPU/XLA-first):
  * The value environment holds either JAX tracers (dynamic tensors) or
    numpy arrays (static values). `Shape` always yields a static numpy array
    — shapes are known at trace time — so shape-computation subgraphs
    (Shape -> Gather -> Concat -> Reshape chains from torch traces) fold away
    at trace time instead of becoming dynamic ops XLA can't tile.
  * Graphs are traced once per input signature; no Python control flow
    depends on tensor *values*, so everything stays inside one XLA program.
  * The generated function takes the weights as an explicit pytree argument,
    so weights stay jit arguments (donate/shard-able) instead of baked
    constants.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.onnx_model import OnnxGraph, OnnxNode

INT64_MAX = (1 << 63) - 1
INT32_MAX = (1 << 31) - 1


class OnnxUnsupported(NotImplementedError):
    pass


def _is_static(x) -> bool:
    return isinstance(x, (np.ndarray, np.generic, int, float, bool))


def _static_np(x, what: str = "value") -> np.ndarray:
    """Require a static (trace-time-known) value, e.g. a reshape target."""
    if isinstance(x, (np.ndarray, np.generic, int, float, bool)):
        return np.asarray(x)
    raise OnnxUnsupported(f"{what} must be static (got traced tensor)")


def _xp(*vals):
    return np if all(_is_static(v) for v in vals) else jnp


# -- op handlers -----------------------------------------------------------
# Each handler: (inputs, attrs) -> list of outputs.

_REGISTRY: Dict[str, Callable] = {}


def op(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def _elementwise(fn_np, fn_jnp=None):
    fn_jnp = fn_jnp or fn_np

    def handler(inputs, attrs):
        xp = _xp(*inputs)
        f = fn_np if xp is np else fn_jnp
        return [f(*inputs)]

    return handler


for _name, _np_fn, _jnp_fn in [
    ("Add", lambda a, b: np.asarray(a) + b, lambda a, b: a + b),
    ("Sub", lambda a, b: np.asarray(a) - b, lambda a, b: a - b),
    ("Mul", lambda a, b: np.asarray(a) * b, lambda a, b: a * b),
    ("Div", lambda a, b: np.asarray(a) / b if np.asarray(a).dtype.kind == "f" else np.asarray(a) // b,
     lambda a, b: a / b if jnp.asarray(a).dtype.kind == "f" else a // b),
    ("Pow", np.power, jnp.power),
    ("Sqrt", np.sqrt, jnp.sqrt),
    ("Exp", np.exp, jnp.exp),
    ("Log", np.log, jnp.log),
    ("Neg", np.negative, jnp.negative),
    ("Abs", np.abs, jnp.abs),
    ("Floor", np.floor, jnp.floor),
    ("Ceil", np.ceil, jnp.ceil),
    ("Min", np.minimum, jnp.minimum),
    ("Max", np.maximum, jnp.maximum),
    ("Equal", np.equal, jnp.equal),
    ("Greater", np.greater, jnp.greater),
    ("GreaterOrEqual", np.greater_equal, jnp.greater_equal),
    ("Less", np.less, jnp.less),
    ("LessOrEqual", np.less_equal, jnp.less_equal),
    ("And", np.logical_and, jnp.logical_and),
    ("Or", np.logical_or, jnp.logical_or),
    ("Not", np.logical_not, jnp.logical_not),
    ("Sign", np.sign, jnp.sign),
    ("Reciprocal", np.reciprocal, jnp.reciprocal),
]:
    _REGISTRY[_name] = _elementwise(_np_fn, _jnp_fn)


@op("Sigmoid")
def _sigmoid(inputs, attrs):
    return [jax.nn.sigmoid(jnp.asarray(inputs[0]))]


@op("Tanh")
def _tanh(inputs, attrs):
    return [jnp.tanh(jnp.asarray(inputs[0]))]


@op("Relu")
def _relu(inputs, attrs):
    return [jax.nn.relu(jnp.asarray(inputs[0]))]


@op("LeakyRelu")
def _leaky_relu(inputs, attrs):
    return [jax.nn.leaky_relu(jnp.asarray(inputs[0]), attrs.get("alpha", 0.01))]


@op("Elu")
def _elu(inputs, attrs):
    return [jax.nn.elu(jnp.asarray(inputs[0]), attrs.get("alpha", 1.0))]


@op("Softplus")
def _softplus(inputs, attrs):
    return [jax.nn.softplus(jnp.asarray(inputs[0]))]


@op("Erf")
def _erf(inputs, attrs):
    return [jax.scipy.special.erf(jnp.asarray(inputs[0]))]


@op("Softmax")
def _softmax(inputs, attrs):
    axis = attrs.get("axis", -1)
    return [jax.nn.softmax(jnp.asarray(inputs[0]), axis=axis)]


@op("LogSoftmax")
def _log_softmax(inputs, attrs):
    axis = attrs.get("axis", -1)
    return [jax.nn.log_softmax(jnp.asarray(inputs[0]), axis=axis)]


@op("Clip")
def _clip(inputs, attrs):
    x = inputs[0]
    lo = inputs[1] if len(inputs) > 1 and inputs[1] is not None else attrs.get("min")
    hi = inputs[2] if len(inputs) > 2 and inputs[2] is not None else attrs.get("max")
    x = jnp.asarray(x)
    if lo is not None:
        x = jnp.maximum(x, jnp.asarray(lo))
    if hi is not None:
        x = jnp.minimum(x, jnp.asarray(hi))
    return [x]


@op("MatMul")
def _matmul(inputs, attrs):
    a, b = (jnp.asarray(v) for v in inputs)
    return [jnp.matmul(a, b, preferred_element_type=jnp.float32)
            if a.dtype.kind == "f" else jnp.matmul(a, b)]


@op("Gemm")
def _gemm(inputs, attrs):
    a = jnp.asarray(inputs[0])
    b = jnp.asarray(inputs[1])
    alpha = attrs.get("alpha", 1.0)
    beta = attrs.get("beta", 1.0)
    if attrs.get("transA", 0):
        a = a.T
    if attrs.get("transB", 0):
        b = b.T
    y = alpha * jnp.matmul(a, b, preferred_element_type=jnp.float32)
    if len(inputs) > 2 and inputs[2] is not None:
        y = y + beta * jnp.asarray(inputs[2])
    return [y]


@op("Conv")
def _conv(inputs, attrs):
    x = jnp.asarray(inputs[0])  # [N, C, *spatial]
    w = jnp.asarray(inputs[1])  # [O, C/groups, *kernel]
    nspatial = w.ndim - 2
    groups = attrs.get("group", 1)
    strides = tuple(attrs.get("strides", [1] * nspatial))
    dilations = tuple(attrs.get("dilations", [1] * nspatial))
    pads = attrs.get("pads", [0] * (2 * nspatial))
    auto_pad = attrs.get("auto_pad", b"NOTSET")
    if isinstance(auto_pad, bytes):
        auto_pad = auto_pad.decode()
    if auto_pad in ("SAME_UPPER", "SAME_LOWER"):
        padding = "SAME"
    else:
        padding = [(pads[i], pads[i + nspatial]) for i in range(nspatial)]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape,
        ("NCHW"[: nspatial + 2] if nspatial <= 2 else None,
         "OIHW"[: nspatial + 2] if nspatial <= 2 else None,
         "NCHW"[: nspatial + 2] if nspatial <= 2 else None),
    )
    y = jax.lax.conv_general_dilated(
        x, w, strides, padding,
        rhs_dilation=dilations,
        dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if len(inputs) > 2 and inputs[2] is not None:
        b = jnp.asarray(inputs[2]).reshape((1, -1) + (1,) * nspatial)
        y = y + b
    return [y]


@op("Reshape")
def _reshape(inputs, attrs):
    x = inputs[0]
    shape = _static_np(inputs[1], "Reshape shape").astype(np.int64).tolist()
    x_arr = jnp.asarray(x) if not _is_static(x) else np.asarray(x)
    # ONNX: 0 means "copy dim from input", -1 infers.
    out = []
    for i, d in enumerate(shape):
        if d == 0 and not attrs.get("allowzero", 0):
            out.append(x_arr.shape[i])
        else:
            out.append(int(d))
    return [x_arr.reshape(out)]


@op("Transpose")
def _transpose(inputs, attrs):
    x = inputs[0]
    perm = attrs.get("perm")
    xp = _xp(x)
    return [xp.transpose(xp.asarray(x), perm)]


@op("Squeeze")
def _squeeze(inputs, attrs):
    x = inputs[0]
    axes = attrs.get("axes")
    if axes is None and len(inputs) > 1 and inputs[1] is not None:
        axes = _static_np(inputs[1], "Squeeze axes").tolist()
    xp = _xp(x)
    arr = xp.asarray(x)
    if axes is None:
        return [xp.squeeze(arr)]
    return [xp.squeeze(arr, axis=tuple(int(a) for a in axes))]


@op("Unsqueeze")
def _unsqueeze(inputs, attrs):
    x = inputs[0]
    axes = attrs.get("axes")
    if axes is None and len(inputs) > 1:
        axes = _static_np(inputs[1], "Unsqueeze axes").tolist()
    xp = _xp(x)
    arr = xp.asarray(x)
    for a in sorted(int(a) for a in axes):
        arr = xp.expand_dims(arr, a if a >= 0 else a + arr.ndim + 1)
    return [arr]


@op("Concat")
def _concat(inputs, attrs):
    axis = attrs.get("axis", 0)
    xp = _xp(*inputs)
    return [xp.concatenate([xp.asarray(v) for v in inputs], axis=axis)]


@op("Split")
def _split(inputs, attrs):
    x = jnp.asarray(inputs[0]) if not _is_static(inputs[0]) else np.asarray(inputs[0])
    axis = attrs.get("axis", 0)
    split = attrs.get("split")
    if split is None and len(inputs) > 1 and inputs[1] is not None:
        split = _static_np(inputs[1], "Split sizes").tolist()
    xp = _xp(inputs[0])
    if split is None:
        raise OnnxUnsupported("Split without sizes")
    indices = np.cumsum(split)[:-1].tolist()
    return list(xp.split(x, indices, axis=axis))


@op("Slice")
def _slice(inputs, attrs):
    x = inputs[0]
    if "starts" in attrs:  # opset < 10 attribute form
        starts = attrs["starts"]
        ends = attrs["ends"]
        axes = attrs.get("axes", list(range(len(starts))))
        steps = [1] * len(starts)
    else:
        starts = _static_np(inputs[1], "Slice starts").tolist()
        ends = _static_np(inputs[2], "Slice ends").tolist()
        axes = (
            _static_np(inputs[3], "Slice axes").tolist()
            if len(inputs) > 3 and inputs[3] is not None
            else list(range(len(starts)))
        )
        steps = (
            _static_np(inputs[4], "Slice steps").tolist()
            if len(inputs) > 4 and inputs[4] is not None
            else [1] * len(starts)
        )
    xp = _xp(x)
    arr = xp.asarray(x)
    slices = [slice(None)] * arr.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        ax = int(ax) % arr.ndim
        st, en, sp = int(st), int(en), int(sp)
        # Clamp the INT64/INT32 sentinels torch emits for "to the end".
        if en >= INT32_MAX:
            en = None
        elif en <= -INT32_MAX:
            en = None if sp < 0 else 0
        slices[ax] = slice(st, en, sp)
    return [arr[tuple(slices)]]


@op("Gather")
def _gather(inputs, attrs):
    x, idx = inputs
    axis = attrs.get("axis", 0)
    xp = _xp(x, idx)
    return [xp.take(xp.asarray(x), xp.asarray(idx).astype(xp.int64 if xp is np else jnp.int32), axis=axis)]


@op("GatherElements")
def _gather_elements(inputs, attrs):
    x, idx = (jnp.asarray(v) for v in inputs)
    axis = attrs.get("axis", 0)
    return [jnp.take_along_axis(x, idx.astype(jnp.int32), axis=axis)]


@op("Shape")
def _shape(inputs, attrs):
    x = inputs[0]
    shape = np.asarray(x).shape if _is_static(x) else jnp.asarray(x).shape
    return [np.array(shape, dtype=np.int64)]


@op("Size")
def _size(inputs, attrs):
    x = inputs[0]
    n = int(np.prod(np.asarray(x).shape if _is_static(x) else jnp.asarray(x).shape))
    return [np.array(n, dtype=np.int64)]


@op("Constant")
def _constant(inputs, attrs):
    if "value" in attrs:
        return [np.asarray(attrs["value"])]
    for k in ("value_float", "value_int"):
        if k in attrs:
            return [np.asarray(attrs[k])]
    if "value_floats" in attrs:
        return [np.asarray(attrs["value_floats"], dtype=np.float32)]
    if "value_ints" in attrs:
        return [np.asarray(attrs["value_ints"], dtype=np.int64)]
    raise OnnxUnsupported("Constant without value")


@op("ConstantOfShape")
def _constant_of_shape(inputs, attrs):
    shape = _static_np(inputs[0], "ConstantOfShape shape").astype(np.int64).tolist()
    value = attrs.get("value")
    if value is None:
        value = np.zeros(1, np.float32)
    value = np.asarray(value).reshape(-1)
    return [np.full(shape, value[0], dtype=value.dtype)]


@op("Expand")
def _expand(inputs, attrs):
    x = inputs[0]
    shape = _static_np(inputs[1], "Expand shape").astype(np.int64).tolist()
    xp = _xp(x)
    arr = xp.asarray(x)
    # ONNX Expand uses bidirectional broadcasting: result dim = max(in, target)
    # with 1s broadcast.
    nd = max(arr.ndim, len(shape))
    in_shape = (1,) * (nd - arr.ndim) + arr.shape
    target = [1] * (nd - len(shape)) + [int(s) for s in shape]
    out_shape = tuple(max(a, b) for a, b in zip(in_shape, target))
    return [xp.broadcast_to(arr.reshape(in_shape), out_shape)]


@op("Flatten")
def _flatten(inputs, attrs):
    x = inputs[0]
    axis = attrs.get("axis", 1)
    xp = _xp(x)
    arr = xp.asarray(x)
    lead = int(np.prod(arr.shape[:axis])) if axis > 0 else 1
    return [arr.reshape(lead, -1)]


@op("Cast")
def _cast(inputs, attrs):
    from ..io.onnx_model import _NP_DTYPES

    to = attrs.get("to")
    np_dtype = _NP_DTYPES.get(to)
    if np_dtype is None:
        raise OnnxUnsupported(f"Cast to unsupported dtype {to}")
    x = inputs[0]
    if _is_static(x):
        return [np.asarray(x).astype(np_dtype)]
    # JAX has no float64 on TPU; map double -> float32.
    if np_dtype == np.float64:
        np_dtype = np.float32
    if np_dtype == np.int64:
        np_dtype = np.int32
    return [jnp.asarray(x).astype(np_dtype)]


@op("Identity")
def _identity(inputs, attrs):
    return [inputs[0]]


@op("Dropout")
def _dropout(inputs, attrs):
    # Inference mode: identity (+ optional all-true mask output).
    x = inputs[0]
    arr = jnp.asarray(x) if not _is_static(x) else np.asarray(x)
    return [x, np.ones(np.shape(arr), dtype=np.bool_)]


@op("Where")
def _where(inputs, attrs):
    xp = _xp(*inputs)
    c, a, b = (xp.asarray(v) for v in inputs)
    return [xp.where(c, a, b)]


@op("Range")
def _range(inputs, attrs):
    start, limit, delta = (_static_np(v, "Range input") for v in inputs)
    return [np.arange(start, limit, delta)]


def _reduce(fn_np, fn_jnp):
    def handler(inputs, attrs):
        x = inputs[0]
        axes = attrs.get("axes")
        if axes is None and len(inputs) > 1 and inputs[1] is not None:
            axes = _static_np(inputs[1], "Reduce axes").tolist()
        keepdims = bool(attrs.get("keepdims", 1))
        xp = _xp(x)
        fn = fn_np if xp is np else fn_jnp
        arr = xp.asarray(x)
        axis = tuple(int(a) for a in axes) if axes is not None else None
        return [fn(arr, axis=axis, keepdims=keepdims)]

    return handler


_REGISTRY["ReduceMean"] = _reduce(np.mean, jnp.mean)
_REGISTRY["ReduceSum"] = _reduce(np.sum, jnp.sum)
_REGISTRY["ReduceMax"] = _reduce(np.max, jnp.max)
_REGISTRY["ReduceMin"] = _reduce(np.min, jnp.min)
_REGISTRY["ReduceProd"] = _reduce(np.prod, jnp.prod)
_REGISTRY["ReduceL2"] = _reduce(
    lambda a, axis, keepdims: np.sqrt(np.sum(a * a, axis=axis, keepdims=keepdims)),
    lambda a, axis, keepdims: jnp.sqrt(jnp.sum(a * a, axis=axis, keepdims=keepdims)),
)


@op("ArgMax")
def _argmax(inputs, attrs):
    x = jnp.asarray(inputs[0])
    axis = attrs.get("axis", 0)
    keepdims = bool(attrs.get("keepdims", 1))
    idx = jnp.argmax(x, axis=axis)
    if keepdims:
        idx = jnp.expand_dims(idx, axis)
    return [idx.astype(jnp.int32)]


@op("Pad")
def _pad(inputs, attrs):
    x = inputs[0]
    if "pads" in attrs:
        pads = attrs["pads"]
    else:
        pads = _static_np(inputs[1], "Pad pads").tolist()
    value = 0.0
    if len(inputs) > 2 and inputs[2] is not None:
        value = float(_static_np(inputs[2], "Pad value"))
    mode = attrs.get("mode", b"constant")
    if isinstance(mode, bytes):
        mode = mode.decode()
    xp = _xp(x)
    arr = xp.asarray(x)
    nd = arr.ndim
    pad_width = [(int(pads[i]), int(pads[i + nd])) for i in range(nd)]
    if mode == "constant":
        return [xp.pad(arr, pad_width, mode="constant", constant_values=value)]
    return [xp.pad(arr, pad_width, mode={"reflect": "reflect", "edge": "edge"}[mode])]


@op("LayerNormalization")
def _layer_norm(inputs, attrs):
    x = jnp.asarray(inputs[0])
    scale = jnp.asarray(inputs[1])
    bias = jnp.asarray(inputs[2]) if len(inputs) > 2 and inputs[2] is not None else None
    axis = attrs.get("axis", -1)
    eps = attrs.get("epsilon", 1e-5)
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=axis, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps) * scale
    if bias is not None:
        y = y + bias
    return [y]


@op("BatchNormalization")
def _batch_norm(inputs, attrs):
    x, scale, bias, mean, var = (jnp.asarray(v) for v in inputs[:5])
    eps = attrs.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    y = (x - mean.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape) + eps)
    return [y * scale.reshape(shape) + bias.reshape(shape)]


@op("LSTM")
def _lstm(inputs, attrs):
    """ONNX LSTM, forward direction, gate order iofc (ONNX spec §LSTM).

    Lowered to a lax.scan over time with the gate matmuls batched — the same
    cell math as ops/lstm.py's native kernel but driven by graph weights.
    """
    X = jnp.asarray(inputs[0])  # [T, N, I]
    W = jnp.asarray(inputs[1])  # [1, 4H, I]
    R = jnp.asarray(inputs[2])  # [1, 4H, H]
    B = jnp.asarray(inputs[3]) if len(inputs) > 3 and inputs[3] is not None else None
    # inputs[4] = sequence_lens (unsupported; assume full length)
    h0 = jnp.asarray(inputs[5]) if len(inputs) > 5 and inputs[5] is not None else None
    c0 = jnp.asarray(inputs[6]) if len(inputs) > 6 and inputs[6] is not None else None
    if len(inputs) > 7 and inputs[7] is not None:
        raise OnnxUnsupported("LSTM peepholes not supported")

    direction = attrs.get("direction", b"forward")
    if isinstance(direction, bytes):
        direction = direction.decode()
    if direction != "forward":
        raise OnnxUnsupported(f"LSTM direction {direction}")
    hidden = int(attrs["hidden_size"])

    T, N, _ = X.shape
    Wt = W[0].T  # [I, 4H]
    Rt = R[0].T  # [H, 4H]
    if B is not None:
        bias = B[0, : 4 * hidden] + B[0, 4 * hidden :]
    else:
        bias = jnp.zeros(4 * hidden, X.dtype)
    h = h0[0] if h0 is not None else jnp.zeros((N, hidden), X.dtype)
    c = c0[0] if c0 is not None else jnp.zeros((N, hidden), X.dtype)

    def cell(carry, x_t):
        h, c = carry
        gates = (
            jnp.dot(x_t, Wt, preferred_element_type=jnp.float32)
            + jnp.dot(h, Rt, preferred_element_type=jnp.float32)
            + bias
        )
        i, o, f, g = jnp.split(gates, 4, axis=-1)  # ONNX order: i o f c
        i = jax.nn.sigmoid(i)
        o = jax.nn.sigmoid(o)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (h_fin, c_fin), ys = jax.lax.scan(cell, (h, c), X)
    Y = ys[:, None]  # [T, 1, N, H]
    return [Y, h_fin[None], c_fin[None]]


# -- graph executor --------------------------------------------------------


def lower_graph(graph: OnnxGraph) -> Tuple[Callable, Dict[str, np.ndarray]]:
    """Return (fn, weights): fn(weights, *inputs) -> tuple(outputs).

    `weights` is the initializer dict; pass it through jit so XLA treats the
    parameters as arguments (shardable, donatable) rather than constants.
    Small integer initializers (Reshape/Slice shape tensors etc.) are kept as
    static closure constants instead — under jit they must stay trace-time
    values, not tracers.
    """
    weights = {}
    static_consts = {}
    for k, v in graph.initializers.items():
        if v.dtype.kind in "iu" and v.size <= 64:
            static_consts[k] = v
        else:
            weights[k] = v

    def fn(params: Dict[str, np.ndarray], *args):
        if len(args) != len(graph.inputs):
            raise ValueError(
                f"graph {graph.name!r} expects {len(graph.inputs)} inputs "
                f"({graph.inputs}), got {len(args)}"
            )
        env: Dict[str, object] = {}
        env.update(static_consts)
        env.update(params)
        for name, val in zip(graph.inputs, args):
            env[name] = val

        for node in graph.nodes:
            handler = _REGISTRY.get(node.op_type)
            if handler is None:
                raise OnnxUnsupported(f"ONNX op {node.op_type} not supported")
            ins = [env[n] if n else None for n in node.inputs]
            try:
                outs = handler(ins, node.attrs)
            except OnnxUnsupported:
                raise
            except Exception as e:
                raise RuntimeError(
                    f"error executing {node.op_type} node {node.name!r}: {e}"
                ) from e
            for name, val in zip(node.outputs, outs):
                if name:
                    env[name] = val

        return tuple(
            jnp.asarray(env[n]) if not _is_static(env[n]) else np.asarray(env[n])
            for n in graph.outputs
        )

    return fn, weights


def supported_ops() -> List[str]:
    return sorted(_REGISTRY.keys())
