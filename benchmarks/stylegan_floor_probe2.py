"""Decompose the ~1.7 ms res-8 generator floor: harness vs mapping vs
mixing/truncation vs synthesis. Same scan methodology as floor_probe."""

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
from ku.models.stylegan import MappingNetwork, SynthesisNetwork
from ku.nn import StyleMixingRegularization, TruncationTrick

DTYPE = jnp.bfloat16
S = int(os.environ.get("KU_SCAN_S", "16"))
B = 12


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


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    out = {}

    z1 = jnp.asarray(rng.normal(size=(S, B, 64)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(S, B, 64)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 1000, size=(S, B, 1)))
    keys = jax.random.split(jax.random.key(5), S)

    out["harness_trivial_ms"] = scan_bench(lambda xs: xs[0] * 2.0,
                                           (z1, label, z2, keys))

    num_layers = 12  # 128px broadcast count
    mapping = MappingNetwork(
        latent_dim=64, dlatent_dim=512, dense1_dim=512,
        num_mapping_layers=8, num_broadcast_layers=num_layers,
        num_classes=1000, label_usage=True, dtype=DTYPE,
    )
    mv = mapping.init(jax.random.key(0), z1[0], label[0])

    def map_fwd(xs):
        zz1, lab, zz2, _k = xs
        # The engine maps [z1; z2] in one pass (2B rows).
        zz = jnp.concatenate([zz1, zz2], axis=0)
        ll = jnp.concatenate([lab, lab], axis=0)
        return mapping.apply(mv, zz, ll)

    out["mapping_2B_ms"] = scan_bench(map_fwd, (z1, label, z2, keys))

    mix = StyleMixingRegularization(mixing_prob=0.9)
    trunc = TruncationTrick(psi=0.7, cutoff=8, momentum=0.99)
    mixv = mix.init({"params": jax.random.key(0),
                     "style": jax.random.key(1)},
                    [jnp.zeros((B, num_layers, 512), DTYPE)] * 2,
                    deterministic=False)
    truncv = trunc.init(jax.random.key(0),
                        jnp.zeros((B, num_layers, 512), DTYPE),
                        deterministic=False)

    def map_mix_trunc(xs):
        zz1, lab, zz2, key = xs
        dd = map_fwd(xs)
        d1, d2 = dd[:B], dd[B:]
        d = mix.apply(mixv, [d1, d2], deterministic=False,
                      rngs={"style": key})
        d, _ = trunc.apply(truncv, d, deterministic=False,
                           mutable=["batch_stats"])
        return d

    out["map_mix_trunc_ms"] = scan_bench(map_mix_trunc,
                                         (z1, label, z2, keys))

    for res in (8, 32, 128):
        nl = int(np.log2(res)) * 2 - 2
        syn = SynthesisNetwork(resolution=res, ch_base=1024, max_ch=512,
                               dtype=DTYPE, lane_packing=True)
        d_in = jnp.asarray(
            rng.normal(size=(S, B, nl, 512)).astype(np.float32)
        )
        sv = syn.init({"params": jax.random.key(0),
                       "noise": jax.random.key(1)}, d_in[0],
                      deterministic=True)

        def syn_fwd(xs, syn=syn, sv=sv):
            d, key = xs
            return syn.apply(sv, d, deterministic=False,
                             rngs={"noise": key})

        out[f"synthesis_res{res}_ms"] = scan_bench(syn_fwd, (d_in, keys))
        print(res, out[f"synthesis_res{res}_ms"], file=sys.stderr, flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
