"""Measure THE REFERENCE's RBM CD-1 hot loop on TF2 CPU (BASELINE.md
protocol step 1).

Runs the reference's own ku/ebm/rbm.py (from /root/reference, read-only)
on the tensorflow 2.21 + tf.compat.v1 graph mode this image provides, at
the bench.py workload (784 visible x 128 hidden, batch 128), and prints
one JSON line with the measured samples/sec.

The committed reference code CANNOT run as-is on ANY TensorFlow version —
it contains three fatal bugs on its only code path (verified by attempting
the run; each raises before one epoch completes):

1. ``build``: the ``self.transform`` sampler draws its uniform with shape
   ``(batch, input_shape[1])`` but compares against a ``(batch,
   output_dim)`` sigmoid (reference rbm.py:46-48, :58-59) — a static shape
   error whenever V != H (the shipped MNIST conf is 784x128).
2. ``build``: the same lines call ``K.cast`` without the required
   ``dtype`` argument (TypeError).
3. ``fit``: the last-batch graph rebuild computes its shape as
   ``int(i*batch_size, V.shape[1])`` — a two-argument ``int()`` over a
   non-string (reference rbm.py:169, :192), a TypeError raised on the
   final step of EVERY epoch regardless of divisibility.

This script applies exactly those three minimal corrections (in memory —
the reference tree is never modified) so that the reference's *intended*
CD-1 loop — 3 update ``K.function`` dispatches + 2 scoring dispatches per
batch, graphs rebuilt per epoch, per-step host printing — is what gets
timed. Optional heavy deps the reference imports at module scope
(tensorflow_probability, used only by the Gaussian mode we don't measure)
are stubbed.

Usage: python benchmarks/reference_tf2_baseline.py [num_samples]
"""

from __future__ import annotations

import contextlib
import importlib.util
import io
import json
import os
import sys
import time
import types

import numpy as np

V_DIM, H_DIM, BATCH = 784, 128, 128  # bench.py workload (MNIST-scale)


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def load_reference_rbm():
    """Import the reference RBM with the three documented bug-patches."""
    _stub(
        "tensorflow_probability",
        distributions=types.SimpleNamespace(MultivariateNormalDiag=None),
    )
    import tensorflow as tf

    tf.compat.v1.disable_eager_execution()  # the reference is TF1-graph-style
    _stub("tensorflow.python.estimator", inputs=None)

    # Patch 2: K.cast without dtype (reference :46-48/:58-59) — give the
    # backend cast a float32 default, matching the dtype the reference
    # passes everywhere it remembers to.
    from tensorflow.python.keras import backend as K

    _orig_cast = K.cast

    def _cast(x, dtype=np.float32):
        return _orig_cast(x, dtype)

    K.cast = _cast

    # The reference assigns self.name before super().__init__ — legal on
    # the Layer it was written for; make the property settable here.
    from tensorflow.python.keras.engine import base_layer, base_layer_v1

    for cls in (base_layer_v1.Layer, base_layer.Layer):
        old = cls.name
        cls.name = property(
            lambda self, _old=old: getattr(self, "_name_override", None)
            or _old.fget(self),
            lambda self, v: object.__setattr__(self, "_name_override", v),
        )

    # Bypass /root/reference/ku/__init__.py (imports the GAN engine, which
    # needs Keras-2-only enqueuer classes) — load only ebm.rbm + its one dep.
    for pkg, path in [
        ("refku", "/root/reference/ku"),
        ("refku.ebm", "/root/reference/ku/ebm"),
        ("refku.backend_ext", "/root/reference/ku/backend_ext"),
    ]:
        m = types.ModuleType(pkg)
        m.__path__ = [path]
        sys.modules[pkg] = m

    spec = importlib.util.spec_from_file_location(
        "refku.backend_ext.tensorflow_backend",
        "/root/reference/ku/backend_ext/tensorflow_backend.py",
    )
    tb = importlib.util.module_from_spec(spec)
    sys.modules["refku.backend_ext.tensorflow_backend"] = tb
    spec.loader.exec_module(tb)
    sys.modules["refku.backend_ext"].tensorflow_backend = tb
    sys.modules["ku"] = sys.modules["refku"]  # rbm.py does `from ku...`
    sys.modules["ku.backend_ext"] = sys.modules["refku.backend_ext"]

    src = open("/root/reference/ku/ebm/rbm.py").read()
    # Patch 1: transform's uniform must span the HIDDEN units.
    src = src.replace(
        "self.transform = K.cast(K.less(K.random_uniform("
        "shape=(self.hps['batch_size'], input_shape[1]))",
        "self.transform = K.cast(K.less(K.random_uniform("
        "shape=(self.hps['batch_size'], self.output_dim))",
    )
    # Patch 3: the intended last-batch shape tuple.
    src = src.replace(
        "int(i*self.hps['batch_size'], V.shape[1])",
        "int(i*self.hps['batch_size']), V.shape[1]",
    )
    mod = types.ModuleType("refku.ebm.rbm")
    mod.__file__ = "/root/reference/ku/ebm/rbm.py (patched in memory)"
    sys.modules["refku.ebm.rbm"] = mod
    exec(compile(src, mod.__file__, "exec"), mod.__dict__)
    return mod


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12800  # 100 steps
    n = (n // BATCH) * BATCH
    rbm_mod = load_reference_rbm()
    rng = np.random.default_rng(0)
    V = (rng.random((n, V_DIM)) < 0.13).astype(np.float32)

    hps = {"lr": 1e-3, "batch_size": BATCH, "epochs": 1}
    rbm = rbm_mod.RBM(hps, output_dim=H_DIM,
                      mode=rbm_mod.MODE_VISIBLE_BERNOULLI)
    rbm.build((None, V_DIM))

    # Warm-up epoch on a slice (graph build + first dispatches), then the
    # timed epoch. The per-step score print is part of the reference loop;
    # swallow the output without removing the work.
    sink = io.StringIO()
    warm = dict(hps, epochs=1)
    rbm.hps = warm
    with contextlib.redirect_stdout(sink):
        rbm.fit(V[: 4 * BATCH], verbose=0)

    start = time.perf_counter()
    with contextlib.redirect_stdout(sink):
        rbm.fit(V, verbose=0)
    elapsed = time.perf_counter() - start

    print(json.dumps({
        "metric": "reference_tf2_cpu_rbm_cd1_samples_per_sec",
        "value": round(n / elapsed, 1),
        "unit": "samples/sec",
        "samples": n,
        "epoch_seconds": round(elapsed, 3),
        "tf_version": __import__("tensorflow").__version__,
        "patched_bugs": ["transform-uniform-shape", "cast-dtype",
                         "last-batch-int()"],
    }))


if __name__ == "__main__":
    main()
