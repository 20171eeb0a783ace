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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import stylegan_lane_packing as slp  # shared engine/batches/measure

B = int(os.environ.get("KU_BENCH_B", "12"))
S = int(os.environ.get("KU_SCAN_S", "32"))
K = slp.K

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
    return slp.build_engine(lane_packing=True, r1_interval=1,
                            extra_hps=extra_hps)


def batches_stacked(rng):
    return slp.batches_stacked(rng, s=S, b=B)


def measure(engine, batches, n=5):
    return slp.measure(engine, batches, n=n)


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
