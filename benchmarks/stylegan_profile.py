"""Ablation profile of the StyleGAN train step on the real TPU.

Times each component of the reference-config (128px, ch_base 1024,
max_ch 512, batch 12, bf16) train step separately, plus isolated ops at
narrow vs full channel counts, to locate the utilization bound
(BASELINE.md: 380 GFLOP/step at 57 ms = ~3% of v5e peak).

Timing rule (axon tunnel): fence every measurement with a full
np.asarray readback; report best-of-N.

SUPERSEDED for absolute numbers: every single dispatch here carries the
~25-30 ms tunnel round trip (that discovery is recorded in BASELINE.md),
so these per-call timings measure the tunnel for anything under ~30 ms.
Use the scan-amortized scripts instead: stylegan_lane_packing.py
(step-level), stylegan_component_profile.py / stylegan_floor_probe2.py
(components, KU_SCAN_S>=256), profile_step.py (per-fusion device trace).
This file is kept for the dispatch-floor ablation itself.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from ku.backprop import STYLE_GAN_SOFTPLUS_INVERSE_R1_GP, GAN
from ku.models import StyleGANDiscriminator, StyleGANGenerator

B = 12
RES = 128
DTYPE = jnp.bfloat16


def scalarize(fn):
    """Wrap fn so the jitted computation ends in a scalar — the timing
    fence then reads back 4 bytes instead of megabytes over the tunnel."""
    def wrapped(*args):
        out = fn(*args)
        return jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda t: jnp.sum(t.astype(jnp.float32)), out),
        )
    return wrapped


def bench(fn, *args, n=5):
    # A per-iteration salt feeds the output so repeated timing calls never
    # present identical (executable, args) pairs — the axon tunnel may
    # dedupe identical dispatches (CLAUDE.md), which would under-measure.
    base = jax.jit(scalarize(fn))

    def salted(salt, *a):
        return base(*a) + 0.0 * salt

    f = jax.jit(salted)
    _ = np.asarray(f(jnp.float32(0), *args))  # compile + fence
    best = float("inf")
    for i in range(n):
        t0 = time.perf_counter()
        out = f(jnp.float32(i + 1), *args)
        _ = np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return round(best * 1e3, 3)  # ms


def main():
    results = {}
    rng = np.random.default_rng(0)

    gen = StyleGANGenerator(
        resolution=RES, ch_base=1024, max_ch=512, latent_dim=64,
        dlatent_dim=512, dense1_dim=512, num_mapping_layers=8,
        num_classes=1000, label_usage=True, mixing_prob=0.9,
        trunc_psi=0.7, trunc_cutoff=8, dtype=DTYPE,
    )
    disc = StyleGANDiscriminator(resolution=RES, ch_base=1024, max_ch=512,
                                 dtype=DTYPE)
    z1 = jnp.asarray(rng.normal(size=(B, 64)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(B, 64)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 1000, size=(B, 1)))
    x_real = jnp.asarray(rng.normal(size=(B, RES, RES, 3)).astype(np.float32))
    label_f = label.astype(np.float32)

    gv = gen.init({"params": jax.random.key(0), "noise": jax.random.key(1),
                   "style": jax.random.key(2)}, (z1, label, z2))
    dv = disc.init({"params": jax.random.key(3)}, (x_real, label_f))

    def gen_fwd(params, stats, z1, label, z2, key):
        out, _ = gen.apply(
            {"params": params, "batch_stats": stats}, (z1, label, z2),
            rngs={"noise": key, "style": jax.random.fold_in(key, 1)},
            mutable=["batch_stats"], deterministic=False,
        )
        return out

    results["gen_fwd_ms"] = bench(
        gen_fwd, gv["params"], gv["batch_stats"], z1, label, z2, jax.random.key(5)
    )

    def gen_fwd_bwd(params, stats, z1, label, z2, key):
        def loss(p):
            return jnp.sum(gen_fwd(p, stats, z1, label, z2, key)
                           .astype(jnp.float32))
        return jax.grad(loss)(params)

    results["gen_fwd_bwd_ms"] = bench(
        gen_fwd_bwd, gv["params"], gv["batch_stats"], z1, label, z2,
        jax.random.key(5),
    )

    def disc_fwd(params, x, lab):
        return disc.apply({"params": params}, (x, lab))

    results["disc_fwd_ms"] = bench(disc_fwd, dv["params"], x_real,
                                   label_f)

    def disc_fwd_bwd(params, x, lab):
        return jax.grad(
            lambda p: jnp.sum(disc_fwd(p, x, lab)))(params)

    results["disc_fwd_bwd_ms"] = bench(disc_fwd_bwd, dv["params"],
                                       x_real, label_f)

    def r1_grad(params, x, lab):
        def loss(p):
            gr = jax.grad(lambda xx: jnp.sum(disc_fwd(p, xx, lab)))(x)
            return jnp.sum(jnp.square(gr.astype(jnp.float32)))
        return jax.grad(loss)(params)

    results["r1_grad_ms"] = bench(r1_grad, dv["params"], x_real,
                                  label_f)

    # Full engine train step (same as BASELINE.md measurement).
    conf = {
        "hps": {
            "composing_mode": STYLE_GAN_SOFTPLUS_INVERSE_R1_GP,
            "disc_k_step": 2, "r_gamma": 10.0,
            "disc_ext_hps": {"lr": 1.5e-4, "beta_1": 0.0, "beta_2": 0.99},
            "gen_disc_hps": {"lr": 1.5e-3, "beta_1": 0.0, "beta_2": 0.99},
        },
        "nn_arch": {"gen_rng_streams": ["noise", "style"]},
    }
    engine = GAN(conf, gen, disc).compose_gan_with_mode().compile()
    n_b = 3  # disc_k_step + 1
    batches = {
        "x": jnp.stack([x_real] * n_b),
        "z": (jnp.stack([z1] * n_b), jnp.stack([label] * n_b),
              jnp.stack([z2] * n_b)),
        "label": jnp.stack([label_f] * n_b),
    }
    engine.init_state(jax.tree.map(lambda t: t[0], batches), seed=0)

    def step(state, key):
        return engine._train_step(state, batches, 2, key)

    out = step(engine.state, jax.random.key(9))
    _ = np.asarray(out[2])
    best = float("inf")
    st = out[0]
    for i in range(5):
        t0 = time.perf_counter()
        st, d, g = engine._train_step(st, batches, 2,
                                      jax.random.fold_in(jax.random.key(9), i))
        _ = np.asarray(g)
        best = min(best, time.perf_counter() - t0)
    results["train_step_ms"] = best * 1e3
    results["imgs_per_sec"] = round(3 * B / best, 1)

    # ---- isolated op costs: narrow vs full lanes --------------------------
    for c in (16, 32, 128):
        res = 128 if c == 16 else (64 if c == 32 else 16)
        x = jnp.asarray(rng.normal(size=(B, res, res, c)), DTYPE)
        k = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, DTYPE)

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )

        results[f"conv3x3_{res}px_c{c}_ms"] = bench(conv, x, k)

        def epilogue(x):
            t = jax.nn.leaky_relu(x, 0.2)
            t = t * jax.lax.rsqrt(
                jnp.mean(jnp.square(t), axis=-1, keepdims=True) + 1e-8)
            m = jnp.mean(t, axis=(1, 2), keepdims=True)
            s = jnp.std(t, axis=(1, 2), keepdims=True) + 1e-8
            return (t - m) / s

        results[f"epilogue_{res}px_c{c}_ms"] = bench(epilogue, x)

    # Same conv work but channel-padded to 128 lanes at 128px (what lane
    # repacking would buy at the cost of 64x the FLOPs).
    x = jnp.asarray(rng.normal(size=(B, 128, 128, 128)), DTYPE)
    k = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, DTYPE)
    results["conv3x3_128px_c128_ms"] = bench(
        lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32), x, k)

    # Marginal cost of each synthesis stage: generator fwd at growing
    # resolutions (params re-initialized per size; compile cached).
    for res_probe in (8, 16, 32, 64, 128):
        g2 = StyleGANGenerator(
            resolution=res_probe, ch_base=1024, max_ch=512, latent_dim=64,
            dlatent_dim=512, dense1_dim=512, num_mapping_layers=8,
            num_classes=1000, label_usage=True, mixing_prob=0.9,
            trunc_psi=0.7, trunc_cutoff=8, dtype=DTYPE,
        )
        gv2 = g2.init({"params": jax.random.key(0),
                       "noise": jax.random.key(1),
                       "style": jax.random.key(2)}, (z1, label, z2))

        def g2_fwd(params, stats, z1, label, z2, key):
            out, _ = g2.apply(
                {"params": params, "batch_stats": stats}, (z1, label, z2),
                rngs={"noise": key, "style": jax.random.fold_in(key, 1)},
                mutable=["batch_stats"], deterministic=False)
            return out

        results[f"gen_fwd_res{res_probe}_ms"] = bench(
            g2_fwd, gv2["params"], gv2["batch_stats"], z1, label, z2,
            jax.random.key(5))

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
