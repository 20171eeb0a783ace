"""TPU-only regression tests: hardware-PRNG statistics, compiled Mosaic
kernels vs oracles, bf16 training smoke. Each of these paths is invisible
to the CPU suite (tests/conftest.py forces a CPU mesh and the interpret
PRNG is a zero stub) — a regression here would otherwise land silently
(round-1 VERDICT weak-spot 8).

Compile note: first run over the axon tunnel compiles for minutes; the
persistent compilation cache (JAX_COMPILATION_CACHE_DIR) makes repeats
fast. Keep shapes small.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_kernel_prng_uniform_statistics():
    """pltpu hardware-PRNG uniforms: mean/var/range sanity (the CD kernel's
    Bernoulli draws depend on this mapping of raw bits → U[0,1))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ku.pallas.cd_gibbs import _uniform

    def kernel(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0, 0])
        o_ref[:] = _uniform(o_ref.shape)

    draws = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
    )(jnp.asarray([[1234]], jnp.int32))
    u = np.asarray(draws)
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1.0 / 12.0) < 0.005
    # Bit-level sanity: no stuck lanes (every column has spread).
    assert (u.std(axis=0) > 0.2).all()


def test_kernel_prng_normal_statistics():
    """Box-Muller normals from the hardware PRNG (Gaussian-mode sampling)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ku.pallas.cd_gibbs import _normal

    def kernel(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0, 0])
        o_ref[:] = _normal(o_ref.shape)

    draws = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
    )(jnp.asarray([[99]], jnp.int32))
    z = np.asarray(draws)
    assert abs(z.mean()) < 0.02
    assert abs(z.std() - 1.0) < 0.02
    assert np.isfinite(z).all()


def test_cd_kernel_compiled_matches_scan_oracle(rng):
    """Compiled Mosaic CD kernel == lax.scan oracle in the deterministic
    saturation regime (the CPU suite only checks the interpreter)."""
    from ku.ebm.rbm import MODE_VISIBLE_BERNOULLI, cd_epoch_scan
    from ku.pallas.cd_gibbs import cd_epoch_pallas

    params = {
        "rbm_weight": jnp.zeros((6, 4)),
        "hidden_bias": jnp.asarray(
            np.where(np.arange(4) % 2 == 0, 200.0, -200.0), jnp.float32),
        "visible_bias": jnp.asarray(
            np.where(np.arange(6) % 3 == 0, 200.0, -200.0), jnp.float32),
    }
    batch, steps = 16, 4
    data = rng.integers(0, 2, size=(batch * steps, 6)).astype(np.float32)
    mask = np.ones((batch * steps,), np.float32)
    key = jax.random.key(11)
    p_pallas, s_pallas = cd_epoch_pallas(
        params, jnp.asarray(data), jnp.asarray(mask), key, 1e-3, 1,
        MODE_VISIBLE_BERNOULLI, batch, interpret=False,
    )
    p_scan, s_scan = cd_epoch_scan(
        params, jnp.asarray(data), jnp.asarray(mask), key, 1e-3, 1,
        MODE_VISIBLE_BERNOULLI, batch,
    )
    for name in ("rbm_weight", "hidden_bias", "visible_bias"):
        np.testing.assert_allclose(
            np.asarray(p_pallas[name]), np.asarray(p_scan[name]),
            rtol=1e-5, atol=1e-6, err_msg=name,
        )
    np.testing.assert_allclose(np.asarray(s_pallas), np.asarray(s_scan),
                               rtol=1e-4, atol=1e-5)


def test_cd_kernel_hardware_prng_trains(rng):
    """Statistical: the kernel's own PRNG trains the bimodal toy problem
    (weights develop structure; finite scores)."""
    from ku.ebm import RBM

    protos = np.array(
        [[1, 1, 1, 0, 0, 0, 1, 1], [0, 0, 0, 1, 1, 1, 0, 0]], np.float32
    )
    data = protos[rng.integers(0, 2, size=256)]
    rbm = RBM({"lr": 0.01, "batch_size": 32, "epochs": 6,
               "backend": "pallas"}, 16, seed=1)
    rbm.fit(data, verbose=0)
    w = np.asarray(rbm.params["rbm_weight"])
    assert np.isfinite(w).all()
    assert np.abs(w).max() > 0.05  # learned beyond the U(-.05,.05) init
    h = rbm.transform(data[:64], key=jax.random.key(9))
    v_rec = rbm.inv_transform(h, key=jax.random.key(10))
    err = float(jnp.mean(jnp.abs(v_rec - data[:64])))
    assert err < 0.4, err


def test_flash_attention_compiled_fwd_bwd(rng):
    """Compiled streaming flash kernels (fwd + the dq/dkv backward) vs the
    dense oracle, causal."""
    from ku.pallas.flash_attention import _bwd_pallas, _fwd_pallas

    n, d = 256, 64
    q = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32))
    o, lse = _fwd_pallas(q, k, v, 0.125, 128, 128, True, False)
    dq, dk, dv = _bwd_pallas(q, k, v, o, lse, g, 0.125, 128, 128, True,
                             False)

    mask = jnp.tril(jnp.ones((n, n), bool))

    def dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * 0.125
        p = jax.nn.softmax(jnp.where(mask[None, None], s, -jnp.inf), axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                          preferred_element_type=jnp.float32)

    np.testing.assert_allclose(np.asarray(o), np.asarray(dense(q, k, v)),
                               rtol=2e-2, atol=2e-2)
    gd = jax.grad(lambda q, k, v: jnp.sum(dense(q, k, v) * g),
                  argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip((dq, dk, dv), gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2, err_msg=name)


def test_stylegan_packed_matches_unpacked_on_tpu(rng):
    """Compiled lane-packed generator/discriminator vs the unpacked path on
    REAL hardware (same params; f32 so only float reassociation differs —
    the CPU suite proves exactness, this gates the compiled TPU lowering)."""
    from ku.models import StyleGANDiscriminator, StyleGANGenerator

    gen_kw = dict(resolution=32, ch_base=256, max_ch=128, latent_dim=16,
                  dlatent_dim=64, dense1_dim=64, num_mapping_layers=3,
                  num_classes=8, label_usage=True, mixing_prob=0.9,
                  trunc_psi=0.7, trunc_cutoff=4)
    ref = StyleGANGenerator(**gen_kw)
    pk = StyleGANGenerator(**gen_kw, lane_packing=True, lane_pack_min=8)
    z1 = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 8, size=(2, 1)))
    inputs = (z1, label, z2)
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
            "style": jax.random.key(2)}
    variables = ref.init(rngs, inputs, deterministic=True)
    img_ref = jax.jit(lambda v: ref.apply(v, inputs, deterministic=True))(
        variables
    )
    img_pk = jax.jit(lambda v: pk.apply(v, inputs, deterministic=True))(
        variables
    )
    np.testing.assert_allclose(np.asarray(img_pk), np.asarray(img_ref),
                               rtol=2e-2, atol=2e-2)

    dref = StyleGANDiscriminator(resolution=32, ch_base=256, max_ch=128)
    dpk = StyleGANDiscriminator(resolution=32, ch_base=256, max_ch=128,
                                lane_packing=True, lane_pack_min=8)
    imgs = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    labf = label.astype(np.float32)
    dv = dref.init(jax.random.key(3), (imgs, labf))
    out_ref = jax.jit(lambda v: dref.apply(v, (imgs, labf)))(dv)
    out_pk = jax.jit(lambda v: dpk.apply(v, (imgs, labf)))(dv)
    np.testing.assert_allclose(np.asarray(out_pk), np.asarray(out_ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("lane_packing", [False, True])
def test_stylegan_bf16_train_smoke(rng, lane_packing):
    """Two bf16 StyleGAN train steps at 32px, with AND without lane
    packing (packed is the example default, unpacked stays user-reachable
    via nn_arch): losses finite, params move (exercises the bf16 MXU
    path, the packed convs, and the R1 grad-of-grad on hardware)."""
    from ku.backprop import STYLE_GAN_SOFTPLUS_INVERSE_R1_GP, GAN
    from ku.models import StyleGANDiscriminator, StyleGANGenerator

    res, latent, batch = 32, 16, 4
    gen = StyleGANGenerator(
        resolution=res, ch_base=256, max_ch=128, latent_dim=latent,
        dlatent_dim=64, dense1_dim=64, num_mapping_layers=3, num_classes=8,
        label_usage=True, mixing_prob=0.9, trunc_psi=0.7, trunc_cutoff=4,
        dtype=jnp.bfloat16, lane_packing=lane_packing, lane_pack_min=8,
    )
    disc = StyleGANDiscriminator(resolution=res, ch_base=256, max_ch=128,
                                 dtype=jnp.bfloat16,
                                 lane_packing=lane_packing,
                                 lane_pack_min=8)
    conf = {"hps": {
        "composing_mode": STYLE_GAN_SOFTPLUS_INVERSE_R1_GP,
        "epochs": 1, "batch_step": 2, "disc_k_step": 2, "r_gamma": 10.0,
        "disc_ext_hps": {"lr": 1e-3, "beta_1": 0.0, "beta_2": 0.99},
        "gen_disc_hps": {"lr": 1e-3, "beta_1": 0.0, "beta_2": 0.99},
    }, "nn_arch": {"gen_rng_streams": ["noise", "style"]}}
    engine = GAN(conf, gen, disc).compose_gan_with_mode().compile()

    def it():
        r = np.random.default_rng(5)
        while True:
            yield {
                "x": r.normal(size=(batch, res, res, 3)).astype(np.float32),
                "z": (r.normal(size=(batch, latent)).astype(np.float32),
                      r.integers(0, 8, size=(batch, 1)),
                      r.normal(size=(batch, latent)).astype(np.float32)),
                "label": r.integers(0, 8, size=(batch, 1)).astype(np.float32),
            }

    h = engine.fit_generator(it(), verbose=0)
    assert np.isfinite(h["disc_ext_loss"]).all()
    assert np.isfinite(h["gen_disc_loss"]).all()


def test_cd_kernel_complex_mode_trains(rng):
    """Compiled MODE_COMPLEX Mosaic kernel with hardware PRNG (VERDICT r2
    item 8): a complex RBM trained with backend='pallas' learns the same
    two-prototype complex dataset the scan-backend CPU test uses — the
    data manifold's free energy drops below random noise — so the fused
    kernel's doubled-activation / σ=√½ sampling path works end-to-end on
    hardware, not only in the interpreter."""
    from ku.ebm import RBM
    from ku.ebm.rbm import MODE_COMPLEX

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
               "backend": "pallas"}, 8, mode=MODE_COMPLEX, seed=4)
    rbm.fit(data, verbose=0)
    assert rbm.params["rbm_weight"].shape == (8, 8)
    assert np.isfinite(np.asarray(rbm.params["rbm_weight"])).all()
    assert np.isfinite(rbm.last_scores).all()

    fe_data = float(np.mean(np.asarray(rbm.cal_free_energy(data[:64]))))
    noise = (3 * rng.normal(size=(64, 4))
             + 3j * rng.normal(size=(64, 4))).astype(np.complex64)
    fe_noise = float(np.mean(np.asarray(rbm.cal_free_energy(noise))))
    assert fe_data < fe_noise


def test_flash_attention_compiled_d128_bf16(rng):
    """Compiled Mosaic flash kernels in the MXU regime (D=128, bf16,
    VERDICT r3 item 2): fwd + bwd vs the XLA fallback / dense grads at
    bf16 tolerance."""
    from ku.pallas.flash_attention import (
        _bwd_pallas,
        _fwd_pallas,
        flash_attention_xla,
    )

    b, h, n, d = 2, 4, 512, 128
    scale = 1.0 / np.sqrt(d)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)) * 0.1, jnp.bfloat16)

    o, lse = jax.jit(lambda q, k, v: _fwd_pallas(
        q, k, v, scale, None, None, True, False))(q, k, v)
    o_xla = flash_attention_xla(q.astype(jnp.float32),
                                k.astype(jnp.float32),
                                v.astype(jnp.float32),
                                softmax_scale=scale, causal=True)
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(o_xla), rtol=0.08, atol=0.02)

    do = jnp.asarray(rng.normal(size=(b, h, n, d)) * 0.1, jnp.bfloat16)
    dq, dk, dv = jax.jit(lambda *a: _bwd_pallas(
        *a, scale, None, None, True, False))(q, k, v, o, lse, do)

    def loss_dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        mask = jnp.tril(jnp.ones((n, n), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v)
                       * do.astype(jnp.float32))

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    for got, want, name in zip((dq, dk, dv), gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want),
            rtol=0.1, atol=0.05, err_msg=name)


def test_flash_window_compiled(rng):
    """Compiled sliding-window flash kernels (banded grids + fetch-clamped
    index maps — Mosaic-specific lowering the CPU suite only interprets):
    fwd + both backward kernels vs the dense banded oracle. window=160 is
    not a multiple of the auto block sizes."""
    from ku.pallas.flash_attention import _bwd_pallas, _fwd_pallas

    b, h, n, d, window = 1, 2, 512, 64, 160
    scale = 1.0 / np.sqrt(d)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)) * 0.1
    k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)) * 0.1
    v = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)) * 0.1
    g = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))

    o, lse = jax.jit(lambda q, k, v: _fwd_pallas(
        q, k, v, scale, None, None, True, False, window=window))(q, k, v)
    dq, dk, dv = jax.jit(lambda *a: _bwd_pallas(
        *a, scale, None, None, True, False, window=window))(
        q, k, v, o, lse, g)

    q_pos = np.arange(n)[:, None]
    k_pos = np.arange(n)[None, :]
    keep = jnp.asarray((k_pos <= q_pos) & (q_pos - k_pos < window))

    def dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        p = jax.nn.softmax(jnp.where(keep[None, None], s, -jnp.inf), -1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    np.testing.assert_allclose(np.asarray(o), np.asarray(dense(q, k, v)),
                               rtol=2e-2, atol=2e-3)
    gd = jax.grad(lambda q, k, v: jnp.sum(dense(q, k, v) * g),
                  argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip((dq, dk, dv), gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-3, err_msg=name)


def test_flash_gqa_compiled(rng):
    """Compiled GQA flash kernels (shared-KV-page index maps + grouped
    dk/dv partial sum): fwd + bwd vs the repeated-dense oracle."""
    from ku.pallas.flash_attention import _bwd_pallas, _fwd_pallas

    b, h, hkv, n, d = 1, 4, 2, 256, 64
    scale = 1.0 / np.sqrt(d)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)) * 0.1
    k = jnp.asarray(rng.normal(size=(b, hkv, n, d)).astype(np.float32)) * 0.1
    v = jnp.asarray(rng.normal(size=(b, hkv, n, d)).astype(np.float32)) * 0.1
    g = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))

    o, lse = jax.jit(lambda q, k, v: _fwd_pallas(
        q, k, v, scale, None, None, True, False))(q, k, v)
    dq, dk, dv = jax.jit(lambda *a: _bwd_pallas(
        *a, scale, None, None, True, False))(q, k, v, o, lse, g)

    def dense(q, k, v):
        kr = jnp.repeat(k, h // hkv, axis=1)
        vr = jnp.repeat(v, h // hkv, axis=1)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kr) * scale
        mask = jnp.tril(jnp.ones((n, n), bool))
        p = jax.nn.softmax(jnp.where(mask[None, None], s, -jnp.inf), -1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, vr)

    np.testing.assert_allclose(np.asarray(o), np.asarray(dense(q, k, v)),
                               rtol=2e-2, atol=2e-3)
    gd = jax.grad(lambda q, k, v: jnp.sum(dense(q, k, v) * g),
                  argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip((dq, dk, dv), gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-3, err_msg=name)


def test_flash_segments_compiled(rng):
    """Compiled packed-sequence (segment_ids) flash kernels: fwd + both
    backwards vs the dense block-diagonal oracle, causal, boundaries not
    block-aligned."""
    from ku.pallas.flash_attention import _bwd_pallas, _fwd_pallas

    b, h, n, d = 1, 2, 384, 64
    scale = 1.0 / np.sqrt(d)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)) * 0.1
    k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)) * 0.1
    v = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)) * 0.1
    g = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    seg = np.zeros((b, n), np.int32)
    seg[0, 150:] = 1
    seg[0, 290:] = 2
    seg_j = jnp.asarray(seg)

    o, lse = jax.jit(lambda q, k, v, s: _fwd_pallas(
        q, k, v, scale, None, None, True, False, segment_ids=s))(
        q, k, v, seg_j)
    dq, dk, dv = jax.jit(lambda q, k, v, o, lse, g, s: _bwd_pallas(
        q, k, v, o, lse, g, scale, None, None, True, False,
        segment_ids=s))(q, k, v, o, lse, g, seg_j)

    keep = jnp.asarray(
        (seg[0][:, None] == seg[0][None, :])
        & np.tril(np.ones((n, n), bool)))

    def dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        p = jax.nn.softmax(jnp.where(keep[None, None], s, -1e30), -1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    np.testing.assert_allclose(np.asarray(o), np.asarray(dense(q, k, v)),
                               rtol=2e-2, atol=2e-3)
    gd = jax.grad(lambda q, k, v: jnp.sum(dense(q, k, v) * g),
                  argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip((dq, dk, dv), gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-3, err_msg=name)


def test_sparse_attention_compiled(rng):
    """Compiled block-sparse (splash-style) kernels: scalar-prefetch
    block maps drive the Mosaic grid; fwd + both backwards vs the dense
    sink+window+extra oracle."""
    from ku.pallas.sparse_attention import make_block_mask, sparse_attention

    b, h, n, d = 1, 2, 2048, 64
    bq = bk = 256
    w, sink = 640, 96
    extra = ((7, 2),)
    scale = 1.0 / np.sqrt(d)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)) * 0.1
    k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)) * 0.1
    v = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)) * 0.1
    g = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    mask = make_block_mask(n, block_q=bq, block_k=bk, causal=True,
                           window=w, global_prefix=sink,
                           extra_blocks=extra)
    assert mask.sparsity > 0.5

    q_pos = np.arange(n)[:, None]
    k_pos = np.arange(n)[None, :]
    keep = (q_pos - k_pos < w) | (k_pos < sink)
    for qb, kb in extra:
        keep[qb * bq:(qb + 1) * bq, kb * bk:(kb + 1) * bk] = True
    keep = jnp.asarray(keep & (k_pos <= q_pos))

    def dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        p = jax.nn.softmax(jnp.where(keep[None, None], s, -1e30), -1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    out = sparse_attention(q, k, v, mask, softmax_scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense(q, k, v)),
                               rtol=2e-2, atol=2e-3)

    gs = jax.grad(lambda q, k, v: jnp.sum(
        sparse_attention(q, k, v, mask, softmax_scale=scale) * g),
        argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(lambda q, k, v: jnp.sum(dense(q, k, v) * g),
                  argnums=(0, 1, 2))(q, k, v)
    # atol 5e-3: the dense ORACLE's einsums run at the TPU's default
    # bf16 matmul precision; at n=2048 a handful of near-zero dv
    # elements land ~0.0035 off the f32-accumulated kernel.
    for got, want, name in zip(gs, gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=5e-3, err_msg=name)


def test_ring_attention_compiled_single_device(rng):
    """Compiled flash-in-ring path on hardware: a 1-device mesh ring
    (degenerate but real Mosaic — offsets threaded as SMEM scalars, the
    LSE hop merge, and the custom-VJP ring backward all compile and match
    the dense oracle). The multi-device ring is CPU-mesh-tested; this
    pins the compiled kernel variants the CPU suite only interprets."""
    from ku.dist import make_mesh
    from ku.pallas.flash_attention import ring_attention

    mesh = make_mesh({"data": 1})
    n, d = 256, 64
    q = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32)) * 0.1
    k = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32)) * 0.1
    v = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32)) * 0.1
    scale = 1.0 / np.sqrt(d)

    out = ring_attention(q, k, v, mesh, axis_name="data",
                         softmax_scale=scale, causal=True)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    mask = np.tril(np.ones((n, n), bool))
    s = np.where(mask[None, None], s, -np.inf)
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    expected = np.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-2,
                               atol=2e-3)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, axis_name="data",
                                      softmax_scale=scale, causal=True) ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)

    def loss_dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        s = jnp.where(jnp.asarray(mask)[None, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v) ** 2)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gr, gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2,
                                   atol=2e-3, err_msg=name)

    # Packed sequences in the ring (offsets + segment SMEM/VMEM streams
    # compile together): causal + segment_ids vs the dense oracle.
    seg = np.zeros((1, n), np.int32)
    seg[0, 100:] = 1
    seg[0, 200:] = 2
    out_seg = ring_attention(q, k, v, mesh, axis_name="data",
                             softmax_scale=scale, causal=True,
                             segment_ids=jnp.asarray(seg))
    s2 = np.where((seg[0][:, None] == seg[0][None, :]) & mask,
                  np.einsum("bhqd,bhkd->bhqk", q, k) * scale, -np.inf)
    e2 = np.exp(s2 - s2.max(-1, keepdims=True))
    expected_seg = np.einsum("bhqk,bhkd->bhqd",
                             e2 / e2.sum(-1, keepdims=True), v)
    np.testing.assert_allclose(np.asarray(out_seg), expected_seg,
                               rtol=2e-2, atol=2e-3)


def test_transformer_flash_training_on_tpu(rng):
    """A transformer with use_flash=True TRAINS on hardware: the flash
    custom-VJP (Pallas fwd + dq/dkv backward) sits inside a jitted
    scanned training loop, gradients flow, loss drops on a learnable toy
    task. Covers the compiled kernels under optimization, not just
    one-shot oracle calls."""
    import optax

    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "examples", "transformer"))
    try:
        from transformer_classify import (
            TransformerClassifier,
            make_dataset,
            softmax_xent,
        )
    finally:
        _sys.path.pop(0)
    from ku.engine_ext import Trainer

    x, y = make_dataset(2048, 128, 16, seed=0)
    model = TransformerClassifier(vocab=16, seq_len=128, d_model=64,
                                  num_head=2, num_blocks=1, use_flash=True)
    tr = Trainer(model, softmax_xent, optimizer=optax.adam(1e-3),
                 rng_streams=("dropout",))
    h = tr.fit(x, y, batch_size=128, epochs=6, verbose=0)
    assert np.isfinite(h).all(), h
    assert h[-1] < h[0], h  # learning, not just running
    logits = tr.predict(x[:256])
    assert np.isfinite(logits).all()


def test_flash_prefill_offsets_compiled(rng):
    """Compiled traced-offset flash forward (KV-cache prefill paths):
    scalar q_offset and PER-SEQUENCE (B,) offset arrays — the per-(b,h)
    SMEM BlockSpec lowering the CPU suite only interprets — vs the dense
    shifted-causal oracle."""
    from ku.pallas.flash_attention import flash_attention_pallas

    b, h, L, mx, d = 2, 2, 128, 512, 64
    scale = 1.0 / np.sqrt(d)
    q = jnp.asarray(rng.normal(size=(b, h, L, d)).astype(np.float32)) * 0.1
    k = jnp.asarray(rng.normal(size=(b, h, mx, d)).astype(np.float32)) * 0.1
    v = jnp.asarray(rng.normal(size=(b, h, mx, d)).astype(np.float32)) * 0.1

    def dense(offs):
        s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k))
        keep = (np.arange(mx)[None, None, :]
                <= offs[:, None, None] + np.arange(L)[None, :, None])
        s = np.where(keep[:, None], s * scale, -1e30)
        e = np.exp(s - s.max(-1, keepdims=True))
        p = e / e.sum(-1, keepdims=True)
        return np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v))

    got = jax.jit(lambda q, k, v, off: flash_attention_pallas(
        q, k, v, softmax_scale=scale, causal=True, q_offset=off))(
        q, k, v, jnp.int32(200))
    np.testing.assert_allclose(np.asarray(got),
                               dense(np.array([200, 200])),
                               rtol=2e-2, atol=2e-3)

    offs = np.array([37, 301])
    got = jax.jit(lambda q, k, v, off: flash_attention_pallas(
        q, k, v, softmax_scale=scale, causal=True, q_offset=off))(
        q, k, v, jnp.asarray(offs, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), dense(offs),
                               rtol=2e-2, atol=2e-3)


def test_serving_decode_stack_on_tpu(rng):
    """Serving smoke on hardware: int8 ring-buffer decode + generate run
    compiled on the TPU and match the CPU-suite semantics (step decode
    == full forward). The flash-prefill kernel path is covered by
    test_flash_prefill_offsets_compiled above."""
    import ku
    from ku.nn import generate

    b, t, dm = 2, 12, 16
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    layer = ku.MultiHeadAttention(2, dm, 0.0, causal=True, window=6,
                                  global_prefix=2, num_kv_head=1,
                                  kv_cache_dtype="int8")
    variables = layer.init(jax.random.key(0), [x, x, x])
    full = np.asarray(layer.apply(variables, [x, x, x]))
    cache, steps = {}, []
    step = jax.jit(lambda v, tok: layer.apply(
        v, [tok, tok, tok], decode=True, mutable=["cache"]))
    for i in range(t):
        y, cache = step({"params": variables["params"], **cache},
                        x[:, i:i + 1])
        steps.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(steps, axis=1), full,
                               rtol=6e-2, atol=6e-3)

    vocab = 11
    table = jnp.asarray(rng.normal(size=(vocab, dm)).astype(np.float32))
    block = ku.Transformer(2, dm, 0.0, causal=True, max_decode_len=24)
    ids = jnp.asarray(rng.integers(0, vocab, size=(b, 6)), jnp.int32)
    params = block.init(jax.random.key(1),
                        [table[ids]])["params"]
    out = np.asarray(generate(block, params, ids, 8,
                              embed=lambda i, p=None: table[i],
                              readout=lambda y: y @ table.T))
    assert out.shape == (b, 8) and (out >= 0).all() and (out < vocab).all()


def test_flash_softcap_compiled(rng):
    """Compiled logit-softcap flash kernels (tanh in the score slab +
    chain-factor backward): fwd + both backwards vs the dense capped
    oracle."""
    from ku.pallas.flash_attention import _bwd_pallas, _fwd_pallas

    b, h, n, d, cap = 1, 2, 256, 64, 4.0
    scale = 1.0 / np.sqrt(d)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)) * 0.3
    g = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))

    o, lse = jax.jit(lambda q, k, v: _fwd_pallas(
        q, k, v, scale, None, None, True, False, softcap=cap))(q, k, v)
    dq, dk, dv = jax.jit(lambda *a: _bwd_pallas(
        *a, scale, None, None, True, False, softcap=cap))(
        q, k, v, o, lse, g)

    def dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        s = cap * jnp.tanh(s / cap)
        keep = jnp.arange(n)[None, :] <= jnp.arange(n)[:, None]
        s = jnp.where(keep[None, None], s, -jnp.inf)
        return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)

    np.testing.assert_allclose(np.asarray(o), np.asarray(dense(q, k, v)),
                               rtol=2e-2, atol=2e-3)
    gd = jax.grad(lambda q, k, v: jnp.sum(dense(q, k, v) * g),
                  argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip((dq, dk, dv), gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-3, err_msg=name)


def test_paged_serving_on_tpu(rng):
    """Paged-cache serving on hardware: the per-token page-scan decode
    (online-softmax lax.scan over table entries) and the pool-bounded
    ContinuousBatcher run COMPILED on the TPU; paged decode matches the
    dense layout within bf16-matmul tolerance."""
    import ku
    from ku.nn.serving import ContinuousBatcher

    b, t, dm = 2, 12, 16
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    dense = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  max_decode_len=t, num_kv_head=1)
    paged = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  max_decode_len=t, num_kv_head=1,
                                  kv_page_size=4)
    variables = dense.init(jax.random.key(0), [x, x, x])

    def run(layer):
        cache, steps = {}, []
        step = jax.jit(lambda v, tok: layer.apply(
            v, [tok, tok, tok], decode=True, mutable=["cache"]))
        for i in range(t):
            y, cache = step({"params": variables["params"], **cache},
                            x[:, i:i + 1])
            steps.append(np.asarray(y))
        return np.concatenate(steps, axis=1)

    np.testing.assert_allclose(run(paged), run(dense), rtol=6e-2,
                               atol=6e-3)

    vocab = 11
    table = jnp.asarray(rng.normal(size=(vocab, dm)).astype(np.float32))
    block = ku.Transformer(2, dm, 0.0, causal=True, max_decode_len=32,
                           kv_page_size=4, kv_num_pages=11)
    ids0 = jnp.zeros((1, 2), jnp.int32)
    params = block.init(jax.random.key(1), [table[ids0]])["params"]
    cb = ContinuousBatcher(block, params,
                           embed=lambda i, p=None: table[i],
                           readout=lambda y: y @ table.T, num_slots=2,
                           prompt_len=4, max_decode_len=32, chunk=3)
    prompts = [np.asarray(rng.integers(0, vocab, size=(p,)), np.int32)
               for p in (3, 1, 4)]
    outs = cb.serve(prompts, 6,
                    shared_prefix=np.asarray(
                        rng.integers(0, vocab, size=(5,)), np.int32))
    assert all(o.shape == (6,) for o in outs)
    assert cb.last_stats["shared_prefix_pages"] == 2
    assert 0 < cb.last_stats["peak_pages_in_use"] <= 10


def test_bf16_int8_decode_dtype_on_tpu(rng):
    """bf16 model + int8 KV cache on hardware: the dequantized reads
    stay in bf16 (ku/nn/attention.py kv_dt cast — a bf16 model must not
    silently upcast its decode path to f32) and step decode matches the
    full bf16 forward within quantization+bf16 tolerance."""
    import ku

    b, t, dm = 2, 10, 16
    x = jnp.asarray(rng.normal(size=(b, t, dm)), jnp.bfloat16)
    layer = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  max_decode_len=t, num_kv_head=1,
                                  kv_cache_dtype="int8")
    variables = layer.init(jax.random.key(0), [x, x, x])
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          variables["params"])
    full = layer.apply({"params": params}, [x, x, x])
    assert full.dtype == jnp.bfloat16
    cache, steps = {}, []
    step = jax.jit(lambda v, tok: layer.apply(
        v, [tok, tok, tok], decode=True, mutable=["cache"]))
    for i in range(t):
        y, cache = step({"params": params, **cache}, x[:, i:i + 1])
        assert y.dtype == jnp.bfloat16  # the dequant path must not leak f32
        steps.append(np.asarray(y, np.float32))
    np.testing.assert_allclose(
        np.concatenate(steps, axis=1), np.asarray(full, np.float32),
        rtol=1.2e-1, atol=2e-2)  # int8 quant + bf16 matmuls


def test_topp_repetition_sampler_on_tpu(rng):
    """generate() with the top-p + repetition-penalty sampler (seen-mask
    scan carry) compiles and runs on hardware; outputs stay in-vocab and
    are deterministic per key."""
    import ku
    from ku.nn import generate, make_sampler

    vocab, dm, b = 11, 16, 2
    table = jnp.asarray(rng.normal(size=(vocab, dm)).astype(np.float32))
    block = ku.Transformer(2, dm, 0.0, causal=True, max_decode_len=24)
    ids = jnp.asarray(rng.integers(0, vocab, size=(b, 5)), jnp.int32)
    params = block.init(jax.random.key(0), [table[ids]])["params"]
    samp = make_sampler(temperature=0.9, top_k=6, top_p=0.9,
                        repetition_penalty=1.4)
    run = lambda: np.asarray(generate(
        block, params, ids, 8, embed=lambda i, p=None: table[i],
        readout=lambda y: y @ table.T, sampler=samp,
        rng=jax.random.key(3)))
    a, bb = run(), run()
    np.testing.assert_array_equal(a, bb)
    assert a.shape == (b, 8) and a.min() >= 0 and a.max() < vocab


def test_flash_decode_kernel_compiled(rng):
    """Flash-decoding Pallas kernel COMPILED on hardware (Mosaic, not
    interpret): dense, int8, and paged per-token decode through
    flash_decode=True match the XLA decode paths (flash_decode=False)
    step for step. Exercises the scalar-prefetch clamped index_map, the
    in-VMEM int8 dequant, and the block-table DMA gather — the serving
    hot paths that CPU interpret mode cannot validate."""
    import ku

    b, dm = 2, 32
    # The compiled paged kernel needs 128-aligned pages (VMEM lane
    # tiling — smaller pages fall back to the XLA page-scan), so its
    # confs decode 160 steps across a 2-page table (the boundary at
    # step 128 exercises the multi-page DMA walk + tail masking).
    xs = {t: jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
          for t in (24, 160)}

    def run(t, **kw):
        x = xs[t]
        layer = ku.MultiHeadAttention(4, dm, 0.0, causal=True,
                                      max_decode_len=t, num_kv_head=2,
                                      **kw)
        variables = layer.init(jax.random.key(0), [x, x, x])
        cache, steps = {}, []
        step = jax.jit(lambda v, tok: layer.apply(
            v, [tok, tok, tok], decode=True, mutable=["cache"]))
        for i in range(t):
            y, cache = step({"params": variables["params"], **cache},
                            x[:, i:i + 1])
            steps.append(np.asarray(y))
        return np.concatenate(steps, axis=1)

    for t, conf in ((24, dict()),
                    (24, dict(kv_cache_dtype="int8")),
                    (160, dict(kv_page_size=128)),
                    (160, dict(kv_page_size=128, kv_cache_dtype="int8")),
                    (24, dict(logit_softcap=30.0))):
        np.testing.assert_allclose(
            run(t, flash_decode=True, **conf),
            run(t, flash_decode=False, **conf),
            rtol=6e-2, atol=6e-3, err_msg=str(conf))
