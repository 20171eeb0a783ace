"""Shared example utilities: path bootstrap + offline-friendly MNIST.

The reference examples read Kaggle ``train.csv``/``test.csv`` from the
working directory (reference examples/rbm/rbm_softmax_mnist.py:97-99,
:131-133). This helper keeps that contract and adds two offline fallbacks:
a cached keras ``mnist.npz`` and, failing that, sklearn's bundled 8×8
digits upscaled to 28×28 on device — so the examples always run in
air-gapped environments.
"""

from __future__ import annotations

import os
import sys

# Make `import ku` work when running an example script directly. NB: never
# overwrite PYTHONPATH wholesale in this environment — the TPU plugin lives
# on it; appending to sys.path here is side-effect free.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Persistent XLA compilation cache: repeat example runs skip the multi-
# minute first compile.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import numpy as np


def load_mnist(flatten: bool = True, data_dir: str = "."):
    """Return (V, labels) with V in [0, 255] float32, labels int.

    Order of preference: Kaggle train.csv (reference contract) → cached
    keras mnist.npz → sklearn digits upscaled to 28×28.
    """
    csv_path = os.path.join(data_dir, "train.csv")
    if os.path.exists(csv_path):
        import pandas as pd

        df = pd.read_csv(csv_path)
        labels = df.iloc[:, 0].to_numpy(np.int64)
        V = df.iloc[:, 1:].to_numpy(np.float32)
        if not flatten:
            V = V.reshape(-1, 28, 28, 1)
        return V, labels

    npz = os.path.expanduser("~/.keras/datasets/mnist.npz")
    if os.path.exists(npz):
        with np.load(npz) as d:
            x, y = d["x_train"], d["y_train"]
        V = x.astype(np.float32)
        V = V.reshape(-1, 784) if flatten else V[..., None]
        return V, y.astype(np.int64)

    from sklearn.datasets import load_digits

    d = load_digits()
    import jax

    imgs = d.images.astype(np.float32) / 16.0 * 255.0  # (N, 8, 8) → [0,255]
    imgs = np.asarray(
        jax.image.resize(imgs[..., None], (imgs.shape[0], 28, 28, 1), "linear")
    )
    V = imgs.reshape(-1, 784) if flatten else imgs
    return V.astype(np.float32), d.target.astype(np.int64)
