"""Backward-traffic A/B: StyleGAN train-step variants (VERDICT r3 item 1).

The packed exact-semantics step is traffic-bound (BASELINE.md: 15.8 ms
loop body = 673 fusions averaging ~one HBM pass each). The levers here
change only WHERE activation bytes move, never the math (exactness tested
in tests/test_gan.py::test_r1_fused_vjp_matches_separate_grad and
::test_remat_policies_match_exact):

- ``r1_fused_vjp``: the R1 input grad reuses the stacked real/fake
  forward's activations via jax.vjp instead of a separate jax.grad
  forward (saves one disc fwd per D step).
- ``remat`` / ``remat_gen`` / ``remat_disc``: jax.checkpoint policies
  (dots | dots_no_batch | nothing) — the backward recomputes elementwise
  chains inside its own fusions instead of round-tripping saved
  intermediates through HBM.

Methodology (CLAUDE.md): S=32 fused steps/dispatch, scalar-readback
fencing, best-of-N. Run: python benchmarks/stylegan_backward_ab.py
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

B = int(os.environ.get("KU_BENCH_B", "12"))
RES = 128
DTYPE = jnp.bfloat16
S = int(os.environ.get("KU_SCAN_S", "32"))
K = 2

# Round-3 measured results (S=32, best-of-5, one v5e over the tunnel):
#   baseline 16.76 ms/step | fused_r1 17.85 | +remat_dots 19.09 |
#   +remat_gen_dots 18.83 | +remat_disc_dots 18.62 |
#   +remat_dots_no_batch 24.67 | +remat_nothing 24.58
# ⇒ every lever NEGATIVE; defaults stay baseline (see ku/backprop/gan.py
# docstrings). Variant dicts below are explicit so re-runs measure the
# same graphs regardless of engine defaults.
VARIANTS = {
    "baseline_r2": {},
    "fused_r1": {"r1_fused_vjp": True},
    "fused_r1+remat_dots": {"r1_fused_vjp": True, "remat": "dots"},
    "fused_r1+remat_gen_dots": {"r1_fused_vjp": True, "remat_gen": "dots"},
    "fused_r1+remat_disc_dots": {"r1_fused_vjp": True, "remat_disc": "dots"},
    "fused_r1+remat_dots_no_batch": {"r1_fused_vjp": True,
                                     "remat": "dots_no_batch"},
    "fused_r1+remat_nothing": {"r1_fused_vjp": True, "remat": "nothing"},
    "remat_disc_dots": {"remat_disc": "dots"},
    "remat_dots": {"remat": "dots"},
}


def build_engine(extra_hps):
    gen = StyleGANGenerator(
        resolution=RES, ch_base=1024, max_ch=512, latent_dim=64,
        dlatent_dim=512, dense1_dim=512, num_mapping_layers=8,
        num_classes=1000, label_usage=True, mixing_prob=0.9,
        trunc_psi=0.7, trunc_cutoff=8, dtype=DTYPE, lane_packing=True,
    )
    disc = StyleGANDiscriminator(
        resolution=RES, ch_base=1024, max_ch=512, dtype=DTYPE,
        lane_packing=True,
    )
    hps = {
        "composing_mode": STYLE_GAN_SOFTPLUS_INVERSE_R1_GP,
        "disc_k_step": K, "r_gamma": 10.0, "r1_interval": 1,
        "disc_ext_hps": {"lr": 1.5e-4, "beta_1": 0.0, "beta_2": 0.99},
        "gen_disc_hps": {"lr": 1.5e-3, "beta_1": 0.0, "beta_2": 0.99},
    }
    hps.update(extra_hps)
    conf = {"hps": hps, "nn_arch": {"gen_rng_streams": ["noise", "style"]}}
    return GAN(conf, gen, disc).compose_gan_with_mode().compile()


def batches_stacked(rng):
    n_b = K + 1
    mk = lambda shape: jnp.asarray(
        rng.normal(size=(S, n_b) + shape).astype(np.float32))
    labels_i = jnp.asarray(rng.integers(0, 1000, size=(S, n_b, B, 1)))
    return {
        "x": mk((B, RES, RES, 3)),
        "z": (mk((B, 64)), labels_i, mk((B, 64))),
        "label": labels_i.astype(jnp.float32),
    }


def measure(engine, batches, n=5):
    engine.init_state(jax.tree.map(lambda t: t[0, 0], batches), seed=0)
    st, d, g = engine._train_multi_step(
        engine.state, batches, K, jax.random.key(9))
    _ = np.asarray(g)
    best = float("inf")
    for i in range(n):
        t0 = time.perf_counter()
        st, d, g = engine._train_multi_step(
            st, batches, K, jax.random.fold_in(jax.random.key(9), i))
        _ = np.asarray(g)
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / S
    return {"ms_per_step": round(ms, 2),
            "imgs_per_sec": round((K + 1) * B / (ms / 1e3), 1),
            "g_loss_tail": float(np.asarray(g)[-1])}


def main():
    print(f"devices: {jax.devices()}  S={S} B={B}", file=sys.stderr)
    only = os.environ.get("KU_VARIANTS")
    variants = {k: v for k, v in VARIANTS.items()
                if only is None or k in only.split(",")}
    rng = np.random.default_rng(0)
    batches = batches_stacked(rng)
    results = {}
    for tag, extra in variants.items():
        t0 = time.time()
        engine = build_engine(extra)
        results[tag] = measure(engine, batches)
        results[tag]["wall_incl_compile_s"] = round(time.time() - t0, 1)
        print(tag, results[tag], file=sys.stderr, flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
