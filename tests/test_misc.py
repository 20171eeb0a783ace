"""Coverage for config contract, persistence, RBMLayer, MHA flash path."""

import json

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ku
from ku.core.config import load_config, validate
from ku.ebm import RBMLayer
from ku.utility import load_model_jh5, save_model_jh5


def test_config_contract(tmp_path):
    conf_dict = {"mode": "train", "hps": {"lr": 0.001, "batch_size": 128},
                 "nn_arch": {"output_dim": 128}, "model_loading": False}
    p = tmp_path / "conf.json"
    p.write_text(json.dumps(conf_dict))
    conf = load_config(str(p), required=["hps.lr", "nn_arch.output_dim"])
    assert conf["hps"]["lr"] == 0.001      # dict access (reference style)
    assert conf.hps.batch_size == 128      # attribute access
    with pytest.raises(KeyError):
        validate(conf, ["hps.missing_key"])


def test_save_load_model_jh5(tmp_path, rng):
    params = {
        "layer1": {"kernel": rng.normal(size=(4, 3)).astype(np.float32),
                   "bias": np.zeros(3, np.float32)},
        "layer2": {"kernel": rng.normal(size=(3, 2)).astype(np.float32)},
    }
    spec = {"arch": "mlp", "dims": [4, 3, 2]}
    name = str(tmp_path / "model")
    save_model_jh5(spec, params, name)
    spec2, params2 = load_model_jh5(name)
    assert spec2["arch"] == "mlp"
    np.testing.assert_allclose(
        np.asarray(params2["layer1"]["kernel"]), params["layer1"]["kernel"]
    )
    np.testing.assert_allclose(
        np.asarray(params2["layer2"]["kernel"]), params["layer2"]["kernel"]
    )


def test_rbm_layer_in_model(key, rng):
    """RBM embedded as a layer: supervised grads reach Dense but NOT the
    RBM weights (reference rbm.py:80-86 semantics)."""

    class Classifier(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic: bool = True):
            h = RBMLayer.as_flax(output_dim=16)(x, deterministic)
            return nn.Dense(10)(h)

    x = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    model = Classifier()
    variables = model.init(key, x)
    y = model.apply(variables, x)
    assert y.shape == (4, 10)

    def loss(params):
        return jnp.sum(model.apply({"params": params}, x) ** 2)

    grads = jax.grad(loss)(variables["params"])
    rbm_grad = grads["_RBMLayer_0"]["rbm_weight"]
    dense_grad = grads["Dense_0"]["kernel"]
    assert float(jnp.abs(rbm_grad).max()) == 0.0
    assert float(jnp.abs(dense_grad).max()) > 0.0


def test_rbm_layer_sampled_mode(key, rng):
    layer = RBMLayer.as_flax(output_dim=16, sample=True)
    x = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    variables = layer.init({"params": key, "sample": jax.random.key(1)}, x,
                           False)
    out = layer.apply(variables, x, False, rngs={"sample": jax.random.key(2)})
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}


def test_mha_use_flash_matches_reference_path(key, rng):
    q = jnp.asarray(rng.normal(size=(2, 16, 8)).astype(np.float32))
    base = ku.MultiHeadAttention(2, 8, 0.0, similarity_type="scaled")
    flash = ku.MultiHeadAttention(2, 8, 0.0, similarity_type="scaled",
                                  use_flash=True)
    params = base.init(key, [q, q, q, None])
    out_base = base.apply(params, [q, q, q, None])
    out_flash = flash.apply(params, [q, q, q, None])
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_flash), rtol=1e-4, atol=1e-5
    )


def test_package_root_exports():
    """Public API parity with the reference's root exports."""
    for name in [
        "RBM", "DBN", "EqualizedLRDense", "EqualizedLRConv2D",
        "FusedEqualizedLRConv2DTranspose", "BlurDepthwiseConv2D",
        "AdaptiveIN", "AdaptiveINWithStyle", "StyleMixingRegularization",
        "TruncationTrick", "MinibatchStddevConcat", "MultiHeadAttention",
        "Transformer", "InterferedTransformer", "DenseBatchNormalization",
        "GraphConvolutionNetwork", "save_model_jh5", "load_model_jh5",
        "MODE_VISIBLE_BERNOULLI", "MODE_VISIBLE_GAUSSIAN", "MODE_COMPLEX",
    ]:
        assert hasattr(ku, name), name


def test_export_serving_roundtrip(tmp_path, rng):
    """StableHLO export → reload → same outputs (serving path)."""
    from ku.io import export_fn, load_exported

    w = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))

    def fn(w, x):
        return jax.nn.relu(x @ w)

    path = str(tmp_path / "model.stablehlo")
    export_fn(fn, (w, x), path)
    exported = load_exported(path)
    out = exported.call(w, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fn(w, x)),
                               rtol=1e-6)
