"""Lane-repacking A/B: StyleGAN train-step throughput, packed vs unpacked.

Measures the reference 128px config (ch_base 1024, max_ch 512, batch 12,
bf16, 2 D-steps + 1 G-step with R1) with ``lane_packing`` off/on, at
r1_interval 1 (exact reference semantics) and 16 (lazy R1).

Methodology (CLAUDE.md): every tunnel dispatch costs ~24.5 ms flat, so ONLY
multi-step-fused dispatches are timed (S steps per dispatch via
``_train_multi_step``), fenced by scalar readback, best-of-N.
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
S = int(os.environ.get("KU_SCAN_S", "16"))  # fused steps per dispatch
K = 2  # disc_k_step


def build_engine(lane_packing: bool, r1_interval: int, extra_hps=None):
    """Reference-conf engine. This is THE shared constructor — bench.py's
    flagship gate and benchmarks/stylegan_backward_ab.py reuse it so a
    conf change cannot silently diverge between the scripts."""
    gen = StyleGANGenerator(
        resolution=RES, ch_base=1024, max_ch=512, latent_dim=64,
        dlatent_dim=512, dense1_dim=512, num_mapping_layers=8,
        num_classes=1000, label_usage=True, mixing_prob=0.9,
        trunc_psi=0.7, trunc_cutoff=8, dtype=DTYPE,
        lane_packing=lane_packing,
        lane_pack_min=int(os.environ.get("KU_PACK_MIN", "64")),
    )
    disc = StyleGANDiscriminator(
        resolution=RES, ch_base=1024, max_ch=512, dtype=DTYPE,
        lane_packing=lane_packing,
        lane_pack_min=int(os.environ.get("KU_PACK_MIN", "64")),
    )
    hps = {
        "composing_mode": STYLE_GAN_SOFTPLUS_INVERSE_R1_GP,
        "disc_k_step": K, "r_gamma": 10.0, "r1_interval": r1_interval,
        "disc_ext_hps": {"lr": 1.5e-4, "beta_1": 0.0, "beta_2": 0.99},
        "gen_disc_hps": {"lr": 1.5e-3, "beta_1": 0.0, "beta_2": 0.99},
    }
    hps.update(extra_hps or {})
    conf = {"hps": hps, "nn_arch": {"gen_rng_streams": ["noise", "style"]}}
    return GAN(conf, gen, disc).compose_gan_with_mode().compile()


def batches_stacked(rng, s: int = None, b: int = None):
    s = S if s is None else s
    b = B if b is None else b
    n_b = K + 1

    def mk(shape, f=None):
        return jnp.asarray(
            rng.normal(size=(s, n_b) + shape).astype(np.float32)
        )

    labels_i = jnp.asarray(rng.integers(0, 1000, size=(s, n_b, b, 1)))
    return {
        "x": mk((b, RES, RES, 3)),
        "z": (mk((b, 64)), labels_i, mk((b, 64))),
        "label": labels_i.astype(jnp.float32),
    }


def measure(engine, batches, n=4):
    s = jax.tree.leaves(batches)[0].shape[0]
    b = batches["x"].shape[2]
    engine.init_state(
        jax.tree.map(lambda t: t[0, 0], batches), seed=0
    )
    st, d, g = engine._train_multi_step(
        engine.state, batches, K, jax.random.key(9)
    )
    _ = np.asarray(g)  # compile + fence
    best = float("inf")
    for i in range(n):
        t0 = time.perf_counter()
        st, d, g = engine._train_multi_step(
            st, batches, K, jax.random.fold_in(jax.random.key(9), i)
        )
        _ = np.asarray(g)
        best = min(best, time.perf_counter() - t0)
    ms_per_step = best * 1e3 / s
    return {
        "ms_per_step": round(ms_per_step, 2),
        "imgs_per_sec": round((K + 1) * b / (ms_per_step / 1e3), 1),
        "g_loss_tail": float(np.asarray(g)[-1]),
    }


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    batches = batches_stacked(rng)
    results = {}
    packed_opts = ((True,) if os.environ.get("KU_PACKED_ONLY")
                   else (False, True))
    for r1 in (1, 16):
        for packed in packed_opts:
            tag = f"packed={int(packed)}_r1int={r1}"
            t0 = time.time()
            engine = build_engine(packed, r1)
            results[tag] = measure(engine, batches)
            results[tag]["wall_incl_compile_s"] = round(time.time() - t0, 1)
            print(tag, results[tag], file=sys.stderr, flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
