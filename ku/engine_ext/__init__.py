"""Engine extensions (reference ku/engine_ext)."""

from ku.engine_ext.spec import LayerSpec, Stack, spec, infer_shapes
from ku.engine_ext.training import (
    PROGRESSIVE_MODE_FORWARD,
    PROGRESSIVE_MODE_BACKWARD,
    Trainer,
    glue_layers,
    create_prog_specs,
    select_params,
    merge_params,
    train_on_batch_forward_prog_model,
    train_on_batch_backward_prog_model,
)
