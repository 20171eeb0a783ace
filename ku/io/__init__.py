from ku.io.checkpoint import CheckpointManager, save_train_state, restore_train_state
from ku.io.export import export_fn, load_exported
from ku.io.keras_h5 import (
    flax_to_keras_layers,
    graft_keras_weights,
    load_keras_h5_weights,
    load_reference_rbm_h5,
    save_keras_h5,
    save_reference_rbm_h5,
)
