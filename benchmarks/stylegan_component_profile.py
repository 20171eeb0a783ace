"""Component breakdown of the (packed) StyleGAN train step on the TPU.

Times each train-step component as a 16-iteration lax.scan per dispatch
(loop-hoisting defeated by scanning over stacked inputs), fenced by scalar
readback — the same methodology as the step-level numbers in BASELINE.md.

Usage: python benchmarks/stylegan_component_profile.py [packed] [unpacked]
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

from ku.models import StyleGANDiscriminator, StyleGANGenerator

B = 12
RES = 128
DTYPE = jnp.bfloat16
S = int(os.environ.get("KU_SCAN_S", "16"))


def scan_bench(fn, stacked_xs, n=4):
    """Time S scanned applications of fn over stacked inputs."""

    def scanned(salt, xs):
        def one(carry, x):
            out = fn(x)
            tot = jax.tree.reduce(
                lambda a, b: a + b,
                jax.tree.map(lambda t: jnp.sum(t.astype(jnp.float32)), out),
            )
            return carry + tot, ()

        tot, _ = jax.lax.scan(one, salt, xs)
        return tot

    f = jax.jit(scanned)
    _ = np.asarray(f(jnp.float32(0), stacked_xs))
    best = float("inf")
    for i in range(n):
        t0 = time.perf_counter()
        out = f(jnp.float32(i + 1), stacked_xs)
        _ = np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return round(best * 1e3 / S, 3)  # ms per iteration


def profile(lane_packing: bool):
    rng = np.random.default_rng(0)
    gen = StyleGANGenerator(
        resolution=RES, ch_base=1024, max_ch=512, latent_dim=64,
        dlatent_dim=512, dense1_dim=512, num_mapping_layers=8,
        num_classes=1000, label_usage=True, mixing_prob=0.9,
        trunc_psi=0.7, trunc_cutoff=8, dtype=DTYPE,
        lane_packing=lane_packing,
    )
    disc = StyleGANDiscriminator(
        resolution=RES, ch_base=1024, max_ch=512, dtype=DTYPE,
        lane_packing=lane_packing,
    )
    z1 = jnp.asarray(rng.normal(size=(S, B, 64)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(S, B, 64)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 1000, size=(S, B, 1)))
    # Disc runs at 2B per D-step (vmapped real/fake stack).
    x2 = jnp.asarray(
        rng.normal(size=(S, 2 * B, RES, RES, 3)).astype(np.float32)
    )
    lab2 = jnp.asarray(
        rng.integers(0, 1000, size=(S, 2 * B, 1)).astype(np.float32)
    )
    keys = jax.random.split(jax.random.key(5), S)

    gv = gen.init({"params": jax.random.key(0), "noise": jax.random.key(1),
                   "style": jax.random.key(2)},
                  (z1[0], label[0], z2[0]))
    dv = disc.init({"params": jax.random.key(3)}, (x2[0], lab2[0]))

    def gen_fwd(xs):
        zz1, lab, zz2, key = xs
        out, _ = gen.apply(
            {"params": gv["params"], "batch_stats": gv["batch_stats"]},
            (zz1, lab, zz2),
            rngs={"noise": key, "style": jax.random.fold_in(key, 1)},
            mutable=["batch_stats"], deterministic=False,
        )
        return out

    def gen_fwd_bwd(xs):
        def loss(p):
            zz1, lab, zz2, key = xs
            out, _ = gen.apply(
                {"params": p, "batch_stats": gv["batch_stats"]},
                (zz1, lab, zz2),
                rngs={"noise": key, "style": jax.random.fold_in(key, 1)},
                mutable=["batch_stats"], deterministic=False,
            )
            return jnp.sum(out.astype(jnp.float32))

        return jax.grad(loss)(gv["params"])

    def disc_fwd(xs):
        x, lab = xs
        return disc.apply({"params": dv["params"]}, (x, lab))

    def disc_fwd_bwd(xs):
        x, lab = xs
        return jax.grad(
            lambda p: jnp.sum(disc.apply({"params": p}, (x, lab)))
        )(dv["params"])

    def r1_grad(xs):
        x, lab = xs

        def loss(p):
            gr = jax.grad(
                lambda xx: jnp.sum(disc.apply({"params": p}, (xx, lab)))
            )(x)
            return jnp.sum(jnp.square(gr.astype(jnp.float32)))

        return jax.grad(loss)(dv["params"])

    r = {}
    r["gen_fwd_ms"] = scan_bench(gen_fwd, (z1, label, z2, keys))
    r["gen_fwd_bwd_ms"] = scan_bench(gen_fwd_bwd, (z1, label, z2, keys))
    r["disc_fwd_2B_ms"] = scan_bench(disc_fwd, (x2, lab2))
    r["disc_fwd_bwd_2B_ms"] = scan_bench(disc_fwd_bwd, (x2, lab2))
    r["r1_grad_2B_ms"] = scan_bench(r1_grad, (x2, lab2))
    return r


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    which = sys.argv[1:] or ["packed", "unpacked"]
    out = {}
    for w in which:
        out[w] = profile(lane_packing=(w == "packed"))
        print(w, out[w], file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
