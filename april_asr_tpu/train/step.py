"""Training step for the native transducer: forward, RNN-T loss, optax update.

No reference analog (the reference consumes icefall-trained exports); this
makes the framework self-sufficient end-to-end. The step jits over a device
mesh with data-parallel batches and tensor-parallel weights
(parallel/mesh.py); GSPMD derives the gradient collectives.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.lstm_transducer import (
    TransducerDims,
    decoder_step,
    encoder_seq,
    init_streaming_state,
    joiner_logits,
    pallas_disabled,
)
from .rnnt_loss import rnnt_loss


def label_contexts(labels: jnp.ndarray, blank_id: int, context: int = 2) -> jnp.ndarray:
    """[B, U] labels -> [B, U+1, context] decoder contexts: position u sees
    the last `context` tokens of [blank, y_1..y_u] (stateless decoder input,
    matching streaming where the context window trails the emitted tokens)."""
    B, U = labels.shape
    padded = jnp.concatenate(
        [jnp.full((B, context), blank_id, labels.dtype), labels], axis=1
    )  # [B, context+U]
    idx = jnp.arange(U + 1)[:, None] + jnp.arange(context)[None, :]  # [U+1, ctx]
    return padded[:, idx]  # [B, U+1, context]


def transducer_loss_fn(
    dims: TransducerDims, blank_id: int
) -> Callable[[Dict, Dict], jnp.ndarray]:
    """Returns loss(params, batch) -> scalar mean NLL.

    batch: mel [B, T, mel] (T >= segment_size, windows at segment_step),
           labels [B, U] int32, frame_lens [B] (in encoder windows),
           label_lens [B].
    """

    from ..models.conformer import ConformerDims, conformer_encoder_seq

    is_conformer = isinstance(dims, ConformerDims)

    def loss(params, batch):
        mel = batch["mel"]
        labels = batch["labels"]
        B = mel.shape[0]
        # Pure-XLA encoder: the fused inference kernel has no VJP, and the
        # train step is GSPMD-partitioned (tensor-parallel weights).
        if is_conformer:
            f = conformer_encoder_seq(params, mel, dims)  # [B, W, J]
        else:
            h0, c0 = init_streaming_state(dims, B)
            with pallas_disabled():
                f, _, _ = encoder_seq(params, mel, h0, c0, dims)  # [B, W, J]

        ctxs = label_contexts(labels, blank_id, dims.context)  # [B, U+1, ctx]
        U1 = ctxs.shape[1]
        g = decoder_step(
            params, ctxs.reshape(B * U1, dims.context), dims
        ).reshape(B, U1, -1)  # [B, U+1, J]

        # joint: [B, W, U+1, V]
        joint_in = jnp.tanh(f[:, :, None, :] + g[:, None, :, :])
        logits = (
            jnp.dot(joint_in, params["join_t"], preferred_element_type=jnp.float32)
            + params["join_b"]
        )
        nll = rnnt_loss(
            logits, labels, batch["frame_lens"], batch["label_lens"], blank_id
        )
        return jnp.mean(nll)

    return loss


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_train_step(
    dims: TransducerDims,
    blank_id: int,
    optimizer: optax.GradientTransformation | None = None,
    mesh=None,
):
    """Returns (init_fn, step_fn): step_fn(state, batch) -> (state, loss).

    With a data-parallel-only `mesh` (every non-leading axis of size 1), the
    step is built as an explicit shard_map whose ENTIRE cross-device traffic
    is ONE psum of the flat [grads; loss] vector, instead of letting GSPMD
    infer one all-reduce per parameter leaf. Besides being the explicit
    TPU-native formulation (pick a mesh, place the collective yourself),
    this is a hard correctness requirement on host-platform (virtual-device
    CPU) meshes: XLA:CPU's thunk executor runs independent collectives of
    one execution in whatever order they become ready PER SHARD, so two
    GSPMD gradient all-reduces can interleave across shards — some shards
    enter collective A first, the rest enter B first — and every participant
    then blocks in its rendezvous until the 40 s termination timeout
    LOG(FATAL)s the process (xla rendezvous.cc:127; reproduced in this
    repo's test suite). A single collective cannot split that way.

    Meshes with a model axis keep the GSPMD step (tensor-parallel weights
    need GSPMD's sharding propagation through the forward/backward).
    """
    optimizer = optimizer or optax.adamw(1e-3)
    loss_fn = transducer_loss_fn(dims, blank_id)

    def init_fn(params) -> TrainState:
        return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.int32(0))

    data_only = mesh is not None and all(
        mesh.shape[ax] == 1 for ax in mesh.axis_names[1:]
    )

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, jnp.ndarray]:
        if data_only:
            loss, grads = _dp_loss_and_grads(
                loss_fn, mesh, state.params, batch
            )
        else:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss

    return init_fn, step_fn


def _dp_loss_and_grads(loss_fn, mesh, params, batch):
    """Data-parallel loss+grads with exactly ONE collective.

    Parameters enter the shard_map replicated as ONE flat vector (so the
    backward pass owes a single psum for the broadcast, not one per leaf);
    the local mean loss is appended to the local gradient vector and the
    concatenation crosses the mesh as a single psum. Equal shard sizes make
    mean-of-shard-means the exact global batch mean.
    """
    from jax.flatten_util import ravel_pytree
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map as _shard_map

        _sm_kwargs = {"check_vma": False}
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _shard_map

        _sm_kwargs = {"check_rep": False}

    data_axis = mesh.axis_names[0]
    n_shards = mesh.shape[data_axis]
    flat, unravel = ravel_pytree(params)

    def body(flat_v, local_batch):
        loss_l, g_l = jax.value_and_grad(
            lambda fv: loss_fn(unravel(fv), local_batch)
        )(flat_v)
        packed = jnp.concatenate([g_l, loss_l[None]])
        return jax.lax.psum(packed, data_axis)

    batch_specs = jax.tree.map(lambda _: P(data_axis), batch)
    packed = _shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=P(),
        **_sm_kwargs,
    )(flat, batch)
    scale = 1.0 / n_shards
    return packed[-1] * scale, unravel(packed[:-1] * scale)
