from .mesh import make_mesh, param_specs, shard_batch, shard_params, state_spec_tree
from .multihost import (
    init_distributed,
    local_slot_range,
    restore_slots,
    snapshot_local_slots,
)
from .pipeline import pipeline_encoder_seq, stage_param_specs
from .tp import (
    conformer_tp_eligible,
    conformer_tp_specs,
    gate_shuffle_perm,
    glu_shuffle_columns,
    glu_shuffle_perm,
    prepare_conformer_tp_weights,
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
    "snapshot_local_slots",
    "restore_slots",
    "pipeline_encoder_seq",
    "stage_param_specs",
    "conformer_encoder_seq_sp",
    "gate_shuffle_perm",
    "glu_shuffle_perm",
    "glu_shuffle_columns",
    "prepare_tp_weights",
    "prepare_conformer_tp_weights",
    "conformer_tp_eligible",
    "conformer_tp_specs",
    "shuffle_gate_columns",
    "tp_param_specs",
    "tp_shard_map_eligible",
]
