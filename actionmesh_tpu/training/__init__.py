"""Flow-matching training for the ActionMesh cascade (TPU-native SPMD).

The reference is strictly inference-only — SURVEY.md §2.4 / §4: no training
code, no optimizer, no distributed execution anywhere in the tree. This
package supplies the missing training path as a first-class capability of
the TPU framework: rectified-flow loss matched to the inference sampler's
conventions, bf16 compute over fp32 master params, per-block
rematerialization, and a jitted optimizer step that runs sharded over the
same dp x tp mesh the inference stack uses (parallel/mesh.py).
"""

from actionmesh_tpu.training.decoder_train import (
    decoder_loss,
    make_decoder_train_step,
    masked_position_mse,
)
from actionmesh_tpu.training.checkpoint import (
    export_for_inference,
    restore_train_state,
    save_train_state,
)
from actionmesh_tpu.training.data import (
    ClipWindowDataset,
    DecoderTrackDataset,
    DevicePrefetcher,
    decoder_batches,
    flow_batches,
    synthesize_clip_dir,
    write_clip,
)
from actionmesh_tpu.training.loop import (
    TrainLoopConfig,
    make_optimizer,
    run_decoder_training,
    run_flow_training,
)
from actionmesh_tpu.training.flow_train import (
    cast_params_for_compute,
    flow_matching_loss,
    init_train_state,
    make_train_step,
    masked_velocity_mse,
    sample_flow_sigma,
)

__all__ = [
    "ClipWindowDataset",
    "DecoderTrackDataset",
    "DevicePrefetcher",
    "decoder_batches",
    "TrainLoopConfig",
    "cast_params_for_compute",
    "flow_batches",
    "make_optimizer",
    "run_decoder_training",
    "run_flow_training",
    "synthesize_clip_dir",
    "write_clip",
    "decoder_loss",
    "export_for_inference",
    "make_decoder_train_step",
    "masked_position_mse",
    "flow_matching_loss",
    "init_train_state",
    "make_train_step",
    "masked_velocity_mse",
    "restore_train_state",
    "sample_flow_sigma",
    "save_train_state",
]
