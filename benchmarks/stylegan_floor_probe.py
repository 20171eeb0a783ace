"""Probe the packed StyleGAN latency floor: gen-fwd by resolution + batch scaling.

All numbers are 16-iteration lax.scan per dispatch (hoisting defeated),
scalar-readback fenced, best-of-N — see BASELINE.md methodology.
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

from ku.models import StyleGANGenerator

DTYPE = jnp.bfloat16
S = int(os.environ.get("KU_SCAN_S", "16"))


def scan_bench(fn, stacked_xs, n=4):
    def scanned(salt, xs):
        def one(carry, x):
            out = fn(x)
            return carry + jnp.sum(out.astype(jnp.float32)), ()

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
    return round(best * 1e3 / S, 3)


def gen_fwd_probe(res: int, batch: int, lane_packing: bool):
    rng = np.random.default_rng(0)
    gen = StyleGANGenerator(
        resolution=res, ch_base=1024, max_ch=512, latent_dim=64,
        dlatent_dim=512, dense1_dim=512, num_mapping_layers=8,
        num_classes=1000, label_usage=True, mixing_prob=0.9,
        trunc_psi=0.7, trunc_cutoff=8, dtype=DTYPE,
        lane_packing=lane_packing,
    )
    z1 = jnp.asarray(rng.normal(size=(S, batch, 64)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(S, batch, 64)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 1000, size=(S, batch, 1)))
    keys = jax.random.split(jax.random.key(5), S)
    gv = gen.init({"params": jax.random.key(0), "noise": jax.random.key(1),
                   "style": jax.random.key(2)}, (z1[0], label[0], z2[0]))

    def fwd(xs):
        zz1, lab, zz2, key = xs
        out, _ = gen.apply(
            {"params": gv["params"], "batch_stats": gv["batch_stats"]},
            (zz1, lab, zz2),
            rngs={"noise": key, "style": jax.random.fold_in(key, 1)},
            mutable=["batch_stats"], deterministic=False,
        )
        return out

    return scan_bench(fwd, (z1, label, z2, keys))


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    out = {}
    for res in (8, 16, 32, 64, 128):
        out[f"gen_fwd_res{res}_B12_packed_ms"] = gen_fwd_probe(res, 12, True)
        print(res, out[f"gen_fwd_res{res}_B12_packed_ms"], file=sys.stderr,
              flush=True)
    for b in (24, 48):
        out[f"gen_fwd_res128_B{b}_packed_ms"] = gen_fwd_probe(128, b, True)
        print(b, out[f"gen_fwd_res128_B{b}_packed_ms"], file=sys.stderr,
              flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
