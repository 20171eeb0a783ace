from ku.utils.callbacks import (
    Callback,
    History,
    EarlyStopping,
    CheckpointCallback,
    LambdaCallback,
)
from ku.utils.trace import trace, step_trace, start_profile, stop_profile
