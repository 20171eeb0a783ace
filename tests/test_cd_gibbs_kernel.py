"""Pallas CD kernel vs the lax.scan oracle.

Determinism trick: with saturating biases (±200 ⇒ sigmoid exactly 0/1 in
f32) every Bernoulli draw is forced, so the kernel (hardware PRNG) and the
oracle (threefry) must produce IDENTICAL parameter trajectories — this
validates every matmul, mask, bias, score, and the multi-step in-VMEM
parameter carry, independent of RNG implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ku.ebm.rbm import (
    MODE_VISIBLE_BERNOULLI,
    MODE_VISIBLE_GAUSSIAN,
    cd_epoch_scan,
)
from ku.pallas.cd_gibbs import cd_epoch_pallas


def _saturated_params(v_dim=6, h_dim=4):
    return {
        "rbm_weight": jnp.zeros((v_dim, h_dim)),
        "hidden_bias": jnp.asarray(
            np.where(np.arange(h_dim) % 2 == 0, 200.0, -200.0), jnp.float32
        ),
        "visible_bias": jnp.asarray(
            np.where(np.arange(v_dim) % 3 == 0, 200.0, -200.0), jnp.float32
        ),
    }


@pytest.mark.parametrize("k", [1, 2])
def test_pallas_matches_scan_when_deterministic(rng, k):
    params = _saturated_params()
    batch = 16
    steps = 4
    n = batch * steps - 5  # ragged final batch
    data = rng.integers(0, 2, size=(batch * steps, 6)).astype(np.float32)
    data[n:] = 0.0
    mask = np.zeros((batch * steps,), np.float32)
    mask[:n] = 1.0

    key = jax.random.key(11)
    p_pallas, s_pallas = cd_epoch_pallas(
        params, jnp.asarray(data), jnp.asarray(mask), key, 1e-3, k,
        MODE_VISIBLE_BERNOULLI, batch, interpret=True,
    )
    p_scan, s_scan = cd_epoch_scan(
        params, jnp.asarray(data), jnp.asarray(mask), key, 1e-3, k,
        MODE_VISIBLE_BERNOULLI, batch,
    )
    for name in ("rbm_weight", "hidden_bias", "visible_bias"):
        np.testing.assert_allclose(
            np.asarray(p_pallas[name]), np.asarray(p_scan[name]),
            rtol=1e-5, atol=1e-6, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(s_pallas), np.asarray(s_scan), rtol=1e-4, atol=1e-5
    )


def test_pallas_gaussian_mode_finite(rng):
    params = {
        "rbm_weight": jnp.asarray(
            rng.normal(scale=0.05, size=(6, 4)).astype(np.float32)
        ),
        "hidden_bias": jnp.zeros((4,)),
        "visible_bias": jnp.zeros((6,)),
    }
    batch = 8
    data = rng.normal(size=(batch * 2, 6)).astype(np.float32)
    mask = np.ones((batch * 2,), np.float32)
    p, s = cd_epoch_pallas(
        params, jnp.asarray(data), jnp.asarray(mask), jax.random.key(0),
        1e-3, 1, MODE_VISIBLE_GAUSSIAN, batch, interpret=True,
    )
    assert np.isfinite(np.asarray(p["rbm_weight"])).all()
    assert np.isfinite(np.asarray(s)).all()


@pytest.mark.parametrize("epochs", [1, 2])
def test_dp_ring_kernel_matches_single_device(rng, epochs):
    """The data-parallel fused kernel (in-grid RDMA ring psum of CD stats,
    8-device CPU mesh, interpret mode) must produce the SAME parameter
    trajectory as the single-device fused kernel on the same global data
    in the deterministic saturation regime — the ring-summed shard
    statistics equal the full-batch statistics, which transitively matches
    cd_epoch_dp's scan+psum math (cd_epoch_pallas == cd_epoch_scan is
    covered above)."""
    from ku.dist import make_mesh
    from ku.pallas.cd_gibbs import cd_train_pallas, cd_train_pallas_dp

    params = _saturated_params()
    batch, steps = 32, 3  # 32 global = 4 rows/device on 8 devices
    data = rng.integers(0, 2, size=(batch * steps, 6)).astype(np.float32)
    mask = np.ones((batch * steps,), np.float32)
    mask[-3:] = 0.0  # ragged tail inside the last shard
    key = jax.random.key(17)
    mesh = make_mesh({"data": 8})

    p_dp, s_dp = cd_train_pallas_dp(
        mesh, params, jnp.asarray(data), jnp.asarray(mask), key, 1e-3, 1,
        MODE_VISIBLE_BERNOULLI, batch, epochs, interpret=True,
    )
    from ku.pallas.cd_gibbs import cd_train_pallas as _single

    p_1, s_1 = _single(
        params, jnp.asarray(data), jnp.asarray(mask), key, 1e-3, 1,
        MODE_VISIBLE_BERNOULLI, batch, epochs, interpret=True,
    )
    for name in ("rbm_weight", "hidden_bias", "visible_bias"):
        np.testing.assert_allclose(
            np.asarray(p_dp[name]), np.asarray(p_1[name]),
            rtol=1e-5, atol=1e-6, err_msg=name,
        )
    assert s_dp.shape == (epochs * steps,)
    np.testing.assert_allclose(np.asarray(s_dp), np.asarray(s_1),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="interpret-mode TPU PRNG is a zero-stub; needs real hardware",
)
def test_pallas_bernoulli_training_converges(rng):
    """Statistical check: the kernel's own PRNG trains the bimodal toy
    problem as well as the oracle does."""
    protos = np.array(
        [[1, 1, 1, 0, 0, 0, 1, 1], [0, 0, 0, 1, 1, 1, 0, 0]], np.float32
    )
    data = protos[rng.integers(0, 2, size=256)]
    params = {
        "rbm_weight": jnp.asarray(
            rng.uniform(-0.05, 0.05, size=(8, 16)).astype(np.float32)
        ),
        "hidden_bias": jnp.zeros((16,)),
        "visible_bias": jnp.zeros((8,)),
    }
    mask = np.ones((256,), np.float32)
    key = jax.random.key(3)
    scores_first = None
    for e in range(4):
        key = jax.random.fold_in(key, e)
        params, scores = cd_epoch_pallas(
            params, jnp.asarray(data), jnp.asarray(mask), key, 0.01, 1,
            MODE_VISIBLE_BERNOULLI, 32, interpret=True,
        )
        if scores_first is None:
            scores_first = float(jnp.mean(scores))
    # Free-energy gap should not blow up, and weights should develop
    # structure separating the two prototypes.
    assert np.isfinite(np.asarray(params["rbm_weight"])).all()
    w = np.asarray(params["rbm_weight"])
    assert np.abs(w).max() > 0.05  # learned something beyond init scale


@pytest.mark.parametrize("epochs", [2, 3])
def test_multi_epoch_fusion_matches_sequential(rng, epochs):
    """One (epochs, steps)-grid dispatch == `epochs` sequential one-epoch
    dispatches (deterministic saturation regime; the flat program counter
    must reproduce the same seed sequence)."""
    from ku.pallas.cd_gibbs import cd_train_pallas

    params = _saturated_params()
    batch, steps = 16, 3
    data = rng.integers(0, 2, size=(batch * steps, 6)).astype(np.float32)
    mask = np.ones((batch * steps,), np.float32)
    key = jax.random.key(21)

    p_fused, s_fused = cd_train_pallas(
        params, jnp.asarray(data), jnp.asarray(mask), key, 1e-3, 1,
        MODE_VISIBLE_BERNOULLI, batch, epochs, interpret=True,
    )
    assert s_fused.shape == (epochs * steps,)

    # Sequential epochs with seeds offset by the flat counter: emulate by
    # deriving the same integer seed then advancing per epoch.
    # In the saturation regime the PRNG is irrelevant, so sequential
    # single-epoch dispatches with ANY keys must match.
    p_seq = params
    for e in range(epochs):
        p_seq, s = cd_epoch_pallas(
            p_seq, jnp.asarray(data), jnp.asarray(mask),
            jax.random.fold_in(key, e), 1e-3, 1, MODE_VISIBLE_BERNOULLI,
            batch, interpret=True,
        )
    for name in ("rbm_weight", "hidden_bias", "visible_bias"):
        np.testing.assert_allclose(
            np.asarray(p_fused[name]), np.asarray(p_seq[name]),
            rtol=1e-5, atol=1e-6, err_msg=name,
        )


@pytest.mark.parametrize("k", [1, 2])
def test_pallas_complex_mode_matches_inline_oracle(rng, k):
    """MODE_COMPLEX fused kernel (VERDICT r2 item 8) vs an inline numpy
    oracle that replicates the interpret-mode PRNG exactly (zero-stub:
    uniforms = 0 → every Bernoulli draw fires; Box-Muller normal = the
    constant sqrt(−2·ln 1e−7)). This pins the complex math end-to-end —
    doubled activation, σ=√½ visible noise, ‖v−b_v‖² free energy, raw-sum
    CD statistics, multi-step parameter carry."""
    from ku.ebm.rbm import MODE_COMPLEX
    from ku.pallas.cd_gibbs import cd_epoch_pallas

    v_dim, h_dim = 6, 4  # stacked-real (3 complex units)
    batch, steps = 8, 3
    lr = 1e-3
    params = {
        "rbm_weight": jnp.asarray(
            rng.normal(scale=0.1, size=(v_dim, h_dim)).astype(np.float32)),
        "hidden_bias": jnp.asarray(
            rng.normal(scale=0.1, size=(h_dim,)).astype(np.float32)),
        "visible_bias": jnp.asarray(
            rng.normal(scale=0.1, size=(v_dim,)).astype(np.float32)),
    }
    n = batch * steps - 3  # ragged final batch
    data = rng.normal(size=(batch * steps, v_dim)).astype(np.float32)
    data[n:] = 0.0
    mask = np.zeros((batch * steps,), np.float32)
    mask[:n] = 1.0

    p_pallas, s_pallas = cd_epoch_pallas(
        params, jnp.asarray(data), jnp.asarray(mask), jax.random.key(5),
        lr, k, MODE_COMPLEX, batch, interpret=True,
    )

    # Inline oracle with the interpreter's deterministic draws.
    C = np.sqrt(-2.0 * np.log(1e-7))  # Box-Muller at u1=1e-7, u2=0
    inv_sqrt2 = np.float32(0.7071067811865476)
    w = np.asarray(params["rbm_weight"], np.float64)
    bh = np.asarray(params["hidden_bias"], np.float64)
    bv = np.asarray(params["visible_bias"], np.float64)

    def fe(vv):
        a = 2.0 * vv @ w + bh
        sp = np.where(a > 30.0, a, np.log1p(np.exp(np.minimum(a, 30.0))))
        return np.sum((vv - bv) ** 2, axis=1) - np.sum(sp, axis=1)

    scores = []
    for s in range(steps):
        v_pos = data[s * batch:(s + 1) * batch].astype(np.float64)
        mrow = mask[s * batch:(s + 1) * batch][:, None].astype(np.float64)
        h_pos = np.ones((batch, h_dim)) * mrow  # u=0 < sigmoid(·) always
        h = h_pos
        v_neg_first = None
        for i in range(kk := k):
            v_neg = (h @ w.T + bv + inv_sqrt2 * C) * mrow
            if v_neg_first is None:
                v_neg_first = v_neg
            act_neg = 2.0 * v_neg @ w + bh
            h_neg = (1.0 / (1.0 + np.exp(-act_neg))) * mrow
            if i < kk - 1:
                h = (h_neg > 0).astype(np.float64) * mrow
        diff = np.abs(fe(v_pos) - fe(v_neg_first)) * mrow[:, 0]
        scores.append(diff.sum() / max(mrow.sum(), 1.0))
        v_pos_m = v_pos * mrow
        w = w + lr * (v_pos_m.T @ h_pos - v_neg.T @ h_neg)
        bh = bh + lr * (h_pos.sum(0) - h_neg.sum(0))
        bv = bv + lr * (v_pos_m.sum(0) - v_neg.sum(0))

    np.testing.assert_allclose(np.asarray(p_pallas["rbm_weight"]), w,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(p_pallas["hidden_bias"]), bh,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(p_pallas["visible_bias"]), bv,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_pallas), np.asarray(scores),
                               rtol=1e-3, atol=1e-4)


def test_dp_ring_kernel_complex_mode_matches_single_device(rng):
    """MODE_COMPLEX through the data-parallel ring kernel: identical
    parameter trajectory to the single-device fused kernel on the same
    global data (interpret PRNG draws are seed-independent constants, so
    sharding the batch changes nothing but the ring summation — which
    must equal the full-batch statistics)."""
    from ku.dist import make_mesh
    from ku.ebm.rbm import MODE_COMPLEX
    from ku.pallas.cd_gibbs import cd_train_pallas, cd_train_pallas_dp

    v_dim, h_dim = 6, 4  # stacked-real (3 complex units)
    params = {
        "rbm_weight": jnp.asarray(
            rng.normal(scale=0.1, size=(v_dim, h_dim)).astype(np.float32)),
        "hidden_bias": jnp.asarray(
            rng.normal(scale=0.1, size=(h_dim,)).astype(np.float32)),
        "visible_bias": jnp.asarray(
            rng.normal(scale=0.1, size=(v_dim,)).astype(np.float32)),
    }
    batch, steps = 32, 3
    data = rng.normal(size=(batch * steps, v_dim)).astype(np.float32)
    mask = np.ones((batch * steps,), np.float32)
    mask[-5:] = 0.0
    data[-5:] = 0.0
    key = jax.random.key(23)
    mesh = make_mesh({"data": 8})

    p_dp, s_dp = cd_train_pallas_dp(
        mesh, params, jnp.asarray(data), jnp.asarray(mask), key, 1e-3, 1,
        MODE_COMPLEX, batch, 2, interpret=True,
    )
    p_1, s_1 = cd_train_pallas(
        params, jnp.asarray(data), jnp.asarray(mask), key, 1e-3, 1,
        MODE_COMPLEX, batch, 2, interpret=True,
    )
    for name in ("rbm_weight", "hidden_bias", "visible_bias"):
        np.testing.assert_allclose(
            np.asarray(p_dp[name]), np.asarray(p_1[name]),
            rtol=1e-5, atol=1e-6, err_msg=name,
        )
    np.testing.assert_allclose(np.asarray(s_dp), np.asarray(s_1),
                               rtol=1e-4, atol=1e-5)
