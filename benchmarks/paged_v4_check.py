"""Hardware exactness probe: is the v4 fused-slab fast path CORRECT on
compiled Mosaic at the big-conf shapes?

Motivation (round 5): paged_kernel_micro measured v4 at 24.9 us/call
where the pool's full read needs >= 164 us at the 819 GB/s HBM peak —
physically impossible, so the contiguous-chunk fast path must be
reading less than it claims at these shapes (it is interpret-exact and
compiled-exact at the small tests_tpu shapes). This compares v4/v3/v2
outputs on the REAL device at the micro-bench shapes and prints the
max abs deviation from v2 (the long-trusted baseline) plus a
same-bytes dense-kernel check.

Usage: python benchmarks/paged_v4_check.py [S] [D] [dtype] [pg] [ppb]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from ku.pallas.decode_attention import (decode_attention,
                                        decode_attention_paged)

B, HKV, G = 8, 4, 4


def main():
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    dtype = jnp.dtype(sys.argv[3]) if len(sys.argv) > 3 else jnp.bfloat16
    pg = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    ppb = int(sys.argv[5]) if len(sys.argv) > 5 else None
    mp = -(-s // pg)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, HKV, G, d)), dtype)
    kd = jnp.asarray(rng.normal(size=(B, HKV, d, s)), dtype)
    vd = jnp.asarray(rng.normal(size=(B, HKV, d, s)), dtype)
    kp = jnp.transpose(kd.reshape(B, HKV, d, mp, pg),
                       (0, 3, 1, 2, 4)).reshape(B * mp, HKV, d, pg)
    vp = jnp.transpose(vd.reshape(B, HKV, d, mp, pg),
                       (0, 3, 1, 2, 4)).reshape(B * mp, HKV, d, pg)
    table = jnp.arange(B * mp, dtype=jnp.int32).reshape(B, mp)
    print(f"devices: {jax.devices()} pg={pg} mp={mp} ppb={ppb}",
          file=sys.stderr)
    kw = {} if ppb is None else dict(pages_per_block=ppb)

    for fill in (1.0, 0.5):
        lengths = jnp.full((B,), max(1, int(s * fill)), jnp.int32)
        outs = {}
        for name, fn in (
            ("dense", lambda: decode_attention(q, kd, vd, lengths)),
            ("v2", lambda: decode_attention_paged(
                q, kp, vp, table, lengths, pipelined=False, **kw)),
            ("v3", lambda: decode_attention_paged(
                q, kp, vp, table, lengths, pipelined=True, **kw)),
            ("v4", lambda: decode_attention_paged(
                q, kp, vp, table, lengths, pipelined="v4", **kw)),
        ):
            outs[name] = np.asarray(jax.jit(fn)()).astype(np.float64)
        ref = outs["v2"]
        scale = np.abs(ref).max()
        for name in ("dense", "v3", "v4"):
            dmax = np.abs(outs[name] - ref).max()
            print(f"fill={fill:.2f} {name:5s} max|Δ| vs v2 = {dmax:.6f} "
                  f"(ref max {scale:.3f}) "
                  f"{'OK' if dmax < 0.02 * scale else 'MISMATCH'}",
                  flush=True)


if __name__ == "__main__":
    main()
