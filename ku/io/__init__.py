from ku.io.checkpoint import CheckpointManager, save_train_state, restore_train_state
from ku.io.export import export_fn, load_exported
