"""RBM / DBN tests: CD semantics vs numpy oracle, training convergence,
data-parallel epoch equivalence (SURVEY §4a-c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ku.ebm import (
    DBN,
    MODE_COMPLEX,
    MODE_VISIBLE_BERNOULLI,
    MODE_VISIBLE_GAUSSIAN,
    RBM,
    cd_update,
    complex_to_stacked,
    free_energy,
    init_rbm_params,
)


def _params(key, v=6, h=4):
    return init_rbm_params(key, v, h)


def test_free_energy_oracle(key, rng):
    params = _params(key)
    v = rng.integers(0, 2, size=(3, 6)).astype(np.float32)
    fe = np.asarray(free_energy(params, jnp.asarray(v)))
    w = np.asarray(params["rbm_weight"])
    bh = np.asarray(params["hidden_bias"])
    bv = np.asarray(params["visible_bias"])
    expected = -(v @ bv + np.log1p(np.exp(v @ w + bh)).sum(-1))
    np.testing.assert_allclose(fe, expected, rtol=1e-5)


def test_cd_update_matches_manual_sampling(key, rng):
    """Replays cd_update's exact key splits in a numpy oracle."""
    params = _params(key)
    v = rng.integers(0, 2, size=(8, 6)).astype(np.float32)
    step_key = jax.random.key(7)
    lr = 0.01
    new_params, score = cd_update(params, jnp.asarray(v), step_key, lr)

    keys = jax.random.split(step_key, 3)
    w = np.asarray(params["rbm_weight"])
    bh = np.asarray(params["hidden_bias"])
    bv = np.asarray(params["visible_bias"])

    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    u_h = np.asarray(jax.random.uniform(keys[0], (8, 4)))
    h_pos = (u_h < sig(v @ w + bh)).astype(np.float32)
    u_v = np.asarray(jax.random.uniform(keys[1], (8, 6)))
    v_neg = (u_v < sig(h_pos @ w.T + bv)).astype(np.float32)
    h_neg = sig(v_neg @ w + bh)

    np.testing.assert_allclose(
        np.asarray(new_params["rbm_weight"]),
        w + lr * (v.T @ h_pos - v_neg.T @ h_neg),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_params["hidden_bias"]),
        bh + lr * (h_pos.sum(0) - h_neg.sum(0)),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_params["visible_bias"]),
        bv + lr * (v.sum(0) - v_neg.sum(0)),
        rtol=1e-4, atol=1e-6,
    )
    fe = -(v @ bv + np.log1p(np.exp(v @ w + bh)).sum(-1))
    fe_p = -(v_neg @ bv + np.log1p(np.exp(v_neg @ w + bh)).sum(-1))
    np.testing.assert_allclose(float(score), np.abs(fe - fe_p).mean(), rtol=1e-4)


def test_cd_update_gaussian_h_neg_uses_sigmoid(key, rng):
    """Gaussian-mode parity (reference rbm.py:145): the negative-phase
    hidden probabilities use SIGMOID even though hidden *sampling* uses
    the relu quirk. Replays cd_update's exact key splits in numpy."""
    params = _params(key)
    v = rng.normal(size=(8, 6)).astype(np.float32)
    step_key = jax.random.key(11)
    lr = 0.01
    new_params, _ = cd_update(params, jnp.asarray(v), step_key, lr,
                              mode=MODE_VISIBLE_GAUSSIAN)

    keys = jax.random.split(step_key, 3)
    w = np.asarray(params["rbm_weight"])
    bh = np.asarray(params["hidden_bias"])
    bv = np.asarray(params["visible_bias"])

    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    u_h = np.asarray(jax.random.uniform(keys[0], (8, 4)))
    h_pos = (u_h < np.maximum(v @ w + bh, 0.0)).astype(np.float32)  # relu quirk
    noise = np.asarray(jax.random.normal(keys[1], (8, 6)))
    v_neg = h_pos @ w.T + bv + noise  # v ~ N(hWᵀ+b_v, I)
    h_neg = sig(v_neg @ w + bh)  # SIGMOID (reference :145), not relu

    np.testing.assert_allclose(
        np.asarray(new_params["rbm_weight"]),
        w + lr * (v.T @ h_pos - v_neg.T @ h_neg),
        rtol=1e-4, atol=1e-5,
    )


def test_masked_rows_do_not_contribute(key, rng):
    params = _params(key)
    v = rng.integers(0, 2, size=(8, 6)).astype(np.float32)
    step_key = jax.random.key(3)
    full, _ = cd_update(params, jnp.asarray(v), step_key, 0.01,
                        weight=jnp.ones((8,)))
    # Zero half the mask: equivalent to running on 4 rows w.r.t. updates of
    # b_v (which depends only on v sums).
    half_mask = jnp.asarray(np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32))
    half, _ = cd_update(params, jnp.asarray(v), step_key, 0.01, weight=half_mask)
    dv_full = np.asarray(full["visible_bias"]) - np.asarray(params["visible_bias"])
    dv_half = np.asarray(half["visible_bias"]) - np.asarray(params["visible_bias"])
    assert not np.allclose(dv_full, dv_half)
    assert np.isfinite(dv_half).all()


@pytest.mark.parametrize("mode", [MODE_VISIBLE_BERNOULLI, MODE_VISIBLE_GAUSSIAN])
def test_rbm_fit_runs_and_improves(mode, rng):
    """CD-1 on a simple bimodal dataset lowers reconstruction error."""
    protos = np.array(
        [[1, 1, 1, 0, 0, 0, 1, 1], [0, 0, 0, 1, 1, 1, 0, 0]], np.float32
    )
    data = protos[rng.integers(0, 2, size=300)]
    if mode == MODE_VISIBLE_BERNOULLI:
        flip = rng.uniform(size=data.shape) < 0.05
        data = np.abs(data - flip.astype(np.float32))
    else:
        data = data + rng.normal(scale=0.1, size=data.shape).astype(np.float32)

    rbm = RBM({"lr": 0.01, "batch_size": 32, "epochs": 5, "backend": "scan"},
              16, mode=mode, seed=1)
    rbm.fit(data, verbose=0)
    assert rbm.params["rbm_weight"].shape == (8, 16)
    assert np.isfinite(np.asarray(rbm.params["rbm_weight"])).all()

    # Reconstruction: transform + inv_transform should stay near the data
    # manifold for Bernoulli mode.
    if mode == MODE_VISIBLE_BERNOULLI:
        h = rbm.transform(data[:64], key=jax.random.key(9))
        v_rec = rbm.inv_transform(h, key=jax.random.key(10))
        err = float(jnp.mean(jnp.abs(v_rec - data[:64])))
        assert err < 0.45  # untrained ≈ 0.5


def test_rbm_ragged_last_batch(rng):
    data = rng.integers(0, 2, size=(70, 6)).astype(np.float32)
    rbm = RBM({"lr": 0.005, "batch_size": 32, "epochs": 2, "backend": "scan"},
              4, seed=0)
    rbm.fit(data, verbose=0)
    assert np.isfinite(np.asarray(rbm.params["rbm_weight"])).all()


def test_rbm_save_load(tmp_path, rng):
    data = rng.integers(0, 2, size=(64, 6)).astype(np.float32)
    rbm = RBM({"lr": 0.005, "batch_size": 32, "epochs": 1, "backend": "scan"},
              4, seed=0)
    rbm.fit(data, verbose=0)
    path = str(tmp_path / "rbm_model")
    rbm.save(path)
    rbm2 = RBM.load(path)
    np.testing.assert_allclose(
        np.asarray(rbm.params["rbm_weight"]),
        np.asarray(rbm2.params["rbm_weight"]),
    )
    fe1 = np.asarray(rbm.cal_free_energy(data[:4]))
    fe2 = np.asarray(rbm2.cal_free_energy(data[:4]))
    np.testing.assert_allclose(fe1, fe2, rtol=1e-6)


def test_dbn_greedy_stack(rng):
    data = rng.integers(0, 2, size=(96, 12)).astype(np.float32)
    hps = {"lr": 0.005, "batch_size": 32, "epochs": 1, "backend": "scan"}
    dbn = DBN(hps)
    dbn.add_stack(RBM(hps, 8, seed=0))
    dbn.add_stack(RBM(hps, 4, seed=1))
    dbn.fit(data, verbose=0)
    # Both stacked RBMs actually trained (reference bug :54 fixed).
    assert dbn.rbm_layers[0].params["rbm_weight"].shape == (12, 8)
    assert dbn.rbm_layers[1].params["rbm_weight"].shape == (8, 4)
    h = dbn.transform(data[:5])
    assert h.shape == (5, 4)
    v = dbn.inv_transform(h)
    assert v.shape == (5, 12)


def test_cd_epoch_dp_matches_single_device(rng):
    """8-virtual-device DP epoch vs the scan oracle (same key, psum'd
    stats must equal the full-batch stats)."""
    from ku.dist import make_mesh
    from ku.dist.mesh import cd_epoch_dp
    from ku.ebm.rbm import cd_epoch_scan

    params = init_rbm_params(jax.random.key(0), 16, 8)
    data = rng.integers(0, 2, size=(64, 16)).astype(np.float32)
    mask = np.ones((64,), np.float32)
    mesh = make_mesh({"data": 8})
    key = jax.random.key(5)

    p_dp, scores_dp = cd_epoch_dp(
        mesh, params, jnp.asarray(data), jnp.asarray(mask), key,
        0.01, 1, MODE_VISIBLE_BERNOULLI, 32,
    )
    # DP uses different per-shard keys, so exact equality with the
    # single-device run isn't expected — but shapes/finiteness and a
    # comparable update magnitude are.
    p_1, scores_1 = cd_epoch_scan(
        params, jnp.asarray(data), jnp.asarray(mask), key, 0.01, 1,
        MODE_VISIBLE_BERNOULLI, 32,
    )
    assert scores_dp.shape == scores_1.shape == (2,)
    dw_dp = np.abs(np.asarray(p_dp["rbm_weight"]) - np.asarray(params["rbm_weight"]))
    dw_1 = np.abs(np.asarray(p_1["rbm_weight"]) - np.asarray(params["rbm_weight"]))
    assert np.isfinite(dw_dp).all()
    assert 0.2 < dw_dp.mean() / max(dw_1.mean(), 1e-9) < 5.0


def test_pcd_training_and_sampling(rng):
    """Persistent CD + the Gibbs sampling API (extensions beyond the
    reference's CD-1; PAPERS.md)."""
    protos = np.array(
        [[1, 1, 1, 0, 0, 0, 1, 1], [0, 0, 0, 1, 1, 1, 0, 0]], np.float32
    )
    data = protos[rng.integers(0, 2, size=256)]
    rbm = RBM({"lr": 0.01, "batch_size": 32, "epochs": 10,
               "persistent": True, "backend": "scan"}, 16, seed=2)
    rbm.fit(data, verbose=0)
    assert np.isfinite(np.asarray(rbm.params["rbm_weight"])).all()

    samples = rbm.sample(num_samples=64, num_steps=50, key=jax.random.key(5))
    assert samples.shape == (64, 8)
    # Samples should look closer to the prototypes than uniform noise:
    # each sample's min Hamming distance to a prototype.
    s = np.asarray(samples)
    d0 = np.abs(s - protos[0]).sum(-1)
    d1 = np.abs(s - protos[1]).sum(-1)
    assert float(np.minimum(d0, d1).mean()) < 2.5  # uniform noise ≈ 4


def test_complex_mode_free_energy_and_cd_oracle(rng):
    """MODE_COMPLEX (ku extension; reference reserves the constant at
    rbm.py:16 but implements nothing): free energy + one CD-1 update vs a
    numpy oracle on the stacked-real representation."""
    V = 3  # complex visible units → stacked dim 6
    params = init_rbm_params(jax.random.key(2), 2 * V, 4)
    v_c = (rng.normal(size=(5, V)) + 1j * rng.normal(size=(5, V))).astype(
        np.complex64
    )
    v_s = np.concatenate([v_c.real, v_c.imag], axis=-1)
    np.testing.assert_allclose(
        np.asarray(complex_to_stacked(jnp.asarray(v_c))), v_s, rtol=1e-6
    )

    w = np.asarray(params["rbm_weight"])
    bh = np.asarray(params["hidden_bias"])
    bv = np.asarray(params["visible_bias"])

    fe = np.asarray(free_energy(params, jnp.asarray(v_s), MODE_COMPLEX))
    act = 2.0 * (v_s @ w) + bh
    fe_exp = ((v_s - bv) ** 2).sum(-1) - np.log1p(np.exp(act)).sum(-1)
    np.testing.assert_allclose(fe, fe_exp, rtol=1e-4)

    # CD-1 oracle with the exact key splits of cd_update.
    step_key = jax.random.key(13)
    new_params, _ = cd_update(params, jnp.asarray(v_s), step_key, 0.01,
                              mode=MODE_COMPLEX)
    keys = jax.random.split(step_key, 3)

    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    u_h = np.asarray(jax.random.uniform(keys[0], (5, 4)))
    h_pos = (u_h < sig(2.0 * (v_s @ w) + bh)).astype(np.float32)
    noise = np.asarray(jax.random.normal(keys[1], (5, 2 * V)))
    v_neg = h_pos @ w.T + bv + np.sqrt(0.5) * noise  # CN: Re/Im ~ N(μ, ½)
    h_neg = sig(2.0 * (v_neg @ w) + bh)
    np.testing.assert_allclose(
        np.asarray(new_params["rbm_weight"]),
        w + 0.01 * (v_s.T @ h_pos - v_neg.T @ h_neg),
        rtol=1e-4, atol=1e-5,
    )


def test_complex_mode_fit_and_roundtrip(rng):
    """Complex RBM learns a two-prototype complex dataset: free energy of
    the data drops below that of random noise; transform/inv_transform
    round-trip complex dtypes."""
    protos = np.array(
        [[1 + 1j, -1 - 1j, 1 - 1j, -1 + 1j],
         [-1 + 0j, 1 + 0j, 1j, -1j]], np.complex64
    )
    data = protos[rng.integers(0, 2, size=256)]
    data = data + 0.1 * (rng.normal(size=data.shape)
                         + 1j * rng.normal(size=data.shape)).astype(
        np.complex64
    )
    rbm = RBM({"lr": 0.005, "batch_size": 32, "epochs": 10,
               "backend": "scan"}, 8, mode=MODE_COMPLEX, seed=4)
    rbm.fit(data, verbose=0)
    assert rbm.params["rbm_weight"].shape == (8, 8)  # stacked 2·4 visible
    assert np.isfinite(np.asarray(rbm.params["rbm_weight"])).all()

    h = rbm.transform(data[:16], key=jax.random.key(0))
    assert h.shape == (16, 8)
    v = rbm.inv_transform(h, key=jax.random.key(1))
    assert v.shape == (16, 4) and np.iscomplexobj(np.asarray(v))

    fe_data = float(np.mean(np.asarray(rbm.cal_free_energy(data[:64]))))
    noise = (3 * rng.normal(size=(64, 4))
             + 3j * rng.normal(size=(64, 4))).astype(np.complex64)
    fe_noise = float(np.mean(np.asarray(rbm.cal_free_energy(noise))))
    assert fe_data < fe_noise  # data manifold has lower energy


def test_scan_backend_deterministic(rng):
    """Same seed → identical params (stateless PRNG threading; SURVEY §5
    race-detection entry: determinism IS the sanitizer)."""
    data = rng.integers(0, 2, size=(128, 10)).astype(np.float32)
    hps = {"lr": 0.01, "batch_size": 32, "epochs": 2, "backend": "scan"}
    r1 = RBM(hps, 8, seed=7).fit(data, verbose=0)
    r2 = RBM(hps, 8, seed=7).fit(data, verbose=0)
    np.testing.assert_array_equal(
        np.asarray(r1.params["rbm_weight"]), np.asarray(r2.params["rbm_weight"])
    )
