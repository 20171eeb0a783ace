"""Core primitives: PRNG key threading, config contract, train state."""

from ku.core.rng import KeySeq
from ku.core.config import load_config, Config
from ku.core.state import TrainState
