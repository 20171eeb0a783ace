"""Comparator: ku flash kernel vs JAX's builtin TPU flash kernel.

Runs ``jax.experimental.pallas.ops.tpu.flash_attention`` (the upstream
Mosaic reference kernel, default block sizes) and ku's streaming kernel
at identical shapes with the SAME amortized methodology as
``flash_amortized.py`` (S chained calls per dispatch — single-dispatch
timings over the axon tunnel measure the tunnel, not the kernel).

Establishes what throughput is ACHIEVABLE on this chip at these shapes —
if upstream lands at the same TFLOP/s, the bound is the hardware/Mosaic;
if it is much faster, the gap is ours to close.
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
from jax.experimental.pallas.ops.tpu import flash_attention as jfa

from ku.pallas.flash_attention import _fwd_pallas
from benchmarks.flash_amortized import chain, timed, measure


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    out = {}
    B, H, NN = 4, 8, 8192
    for D in (64, 128, 256):
        q = jnp.asarray(rng.normal(size=(B, H, NN, D)) * 0.1, jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, H, NN, D)) * 0.1, jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, H, NN, D)) * 0.1, jnp.bfloat16)
        scale = 1.0 / np.sqrt(D)
        flops = B * H * 2 * 2 * NN * NN * D * 0.5  # causal

        per = measure(
            f"jax_d{D}_fwd", lambda s, q, k, v: jfa.flash_attention(
                q * (1 + s * 1e-20), k, v, causal=True, sm_scale=scale),
            q, k, v, out=out)
        out[f"jax_d{D}_fwd_tflops"] = round(flops / (per / 1e3) / 1e12, 2)
        print(f"  jax d{D} fwd {out[f'jax_d{D}_fwd_tflops']} TFLOP/s",
              file=sys.stderr, flush=True)

        per = measure(
            f"ku_d{D}_fwd", lambda s, q, k, v: _fwd_pallas(
                q * (1 + s * 1e-20), k, v, scale, None, None, True,
                False)[0],
            q, k, v, out=out)
        out[f"ku_d{D}_fwd_tflops"] = round(flops / (per / 1e3) / 1e12, 2)
        print(f"  ku d{D} fwd {out[f'ku_d{D}_fwd_tflops']} TFLOP/s",
              file=sys.stderr, flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
