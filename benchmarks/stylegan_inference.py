"""StyleGAN 128px generator INFERENCE throughput (serving path).

Round-1 recorded "~1300-1800 imgs/sec (batch 64, tunnel microbenchmark,
treat as approximate)" — measured before lane packing and at
single-dispatch granularity (mostly tunnel). This measures it properly:
S scanned forward passes per dispatch (deterministic, fresh z per
iteration via fold_in), scalar-readback fencing, best-of-N, packed vs
unpacked, batch sweep.

Run: python benchmarks/stylegan_inference.py
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

RES = 128
S = int(os.environ.get("KU_SCAN_S", "64"))


def build(lane_packing: bool):
    return StyleGANGenerator(
        resolution=RES, ch_base=1024, max_ch=512, latent_dim=64,
        dlatent_dim=512, dense1_dim=512, num_mapping_layers=8,
        num_classes=1000, label_usage=True, mixing_prob=None,
        trunc_psi=0.7, trunc_cutoff=8, dtype=jnp.bfloat16,
        lane_packing=lane_packing,
    )


def measure(gen, batch: int, n: int = 4):
    rng = np.random.default_rng(0)
    z1 = jnp.asarray(rng.normal(size=(batch, 64)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(batch, 64)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 1000, size=(batch, 1)))
    variables = gen.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1),
         "style": jax.random.key(2)}, (z1, label, z2),
    )

    def scanned(params, stats, z1, label, z2, salt):
        def one(carry, i):
            # Fresh z per iteration (salted fold) so the scan can't be
            # collapsed; chain by data dependency through the carry.
            z1_i = z1 + 1e-6 * i + carry
            img = gen.apply(
                {"params": params, "batch_stats": stats},
                (z1_i, label, z2), deterministic=True,
            )
            return jnp.mean(img.astype(jnp.float32)) * 1e-6, img[0, 0, 0, 0]
        _, outs = jax.lax.scan(one, salt, jnp.arange(S, dtype=jnp.float32))
        return jnp.sum(outs)

    f = jax.jit(scanned)
    args = (variables["params"], variables.get("batch_stats", {}),
            z1, label, z2)
    _ = np.asarray(f(*args, jnp.float32(0)))  # compile + fence
    best = float("inf")
    for i in range(n):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args, jnp.float32(1e-7 * i)))
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / S
    return {"ms_per_batch": round(ms, 3),
            "imgs_per_sec": round(batch / (ms / 1e3), 1)}


def main():
    print(f"devices: {jax.devices()}  S={S}", file=sys.stderr)
    out = {}
    for packed in (False, True):
        for batch in (12, 64, 256):
            tag = f"packed={int(packed)}_b{batch}"
            t0 = time.time()
            out[tag] = measure(build(packed), batch)
            out[tag]["wall_incl_compile_s"] = round(time.time() - t0, 1)
            print(tag, out[tag], file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
