from ku.io.checkpoint import CheckpointManager, save_train_state, restore_train_state
