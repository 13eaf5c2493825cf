from .mesh import make_mesh, param_specs, shard_batch, shard_params, state_spec_tree
from .multihost import init_distributed, local_slot_range
from .pipeline import pipeline_encoder_seq, stage_param_specs
from .tp import (
    gate_shuffle_perm,
    prepare_tp_weights,
    shuffle_gate_columns,
    tp_param_specs,
    tp_shard_map_eligible,
)
from .ulysses import conformer_encoder_seq_sp

__all__ = [
    "make_mesh",
    "param_specs",
    "shard_params",
    "shard_batch",
    "state_spec_tree",
    "init_distributed",
    "local_slot_range",
    "pipeline_encoder_seq",
    "stage_param_specs",
    "conformer_encoder_seq_sp",
    "gate_shuffle_perm",
    "prepare_tp_weights",
    "shuffle_gate_columns",
    "tp_param_specs",
    "tp_shard_map_eligible",
]
