"""Real-TPU regression lane (VERDICT r1 item 9).

Run with: ``python -m pytest tests_tpu/ -q`` (from the repo root, with the
axon TPU visible — do NOT set JAX_PLATFORMS=cpu). This suite exercises the
TPU-only branches the CPU suite cannot: compiled Mosaic kernels, the
hardware PRNG, bf16 MXU paths. It fails loudly if any of them regress;
without a TPU every test is skipped (the CPU suite under ``tests/`` is the
no-hardware lane).
"""

import os

# Must precede the jax import — jax reads the cache dir at import time.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import pytest

import jax

ON_TPU = jax.default_backend() == "tpu"

collect_ignore: list = []


def pytest_collection_modifyitems(config, items):
    if not ON_TPU:
        skip = pytest.mark.skip(reason="no TPU backend — run the tests/ "
                                       "suite for the CPU lane")
        for item in items:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
