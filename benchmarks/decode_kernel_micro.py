"""Standalone flash-decoding kernel microbenchmark (no model around it).

Times N chained decode_attention calls in ONE dispatch (each call's
output perturbs the next call's q — a true data dependency), reports
the per-call SLOPE between two chain lengths (amortizes the tunnel
round trip AND any per-dispatch constant), at several fills and block
sizes. Answers: what is the kernel's fixed per-call cost, and what
streaming bandwidth does it reach on the live prefix?

Usage: python benchmarks/decode_kernel_micro.py [S] [D] [dtype] [dus]

4th arg ``dus``: carry the K/V cache through the scan and write one
token per step (dynamic_update_slice) before the kernel reads it — the
real serving loop's structure. Compare against the bare mode to expose
copy-insertion around the custom call (suspected XLA relayout of
sub-128-lane caches: D=64 model steps cost ~110 us/call MORE than the
bare kernel at the same shapes).
"""
import functools
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from ku.pallas.decode_attention import decode_attention

B, HKV, G = 8, 2, 4


def main():
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    dtype = jnp.dtype(sys.argv[3]) if len(sys.argv) > 3 else jnp.float32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, HKV, G, d)), dtype)
    # Kernel consumes the TRANSPOSED cache convention (key axis minor).
    k = jnp.asarray(rng.normal(size=(B, HKV, d, s)), dtype)
    v = jnp.asarray(rng.normal(size=(B, HKV, d, s)), dtype)
    print(f"devices: {jax.devices()}  cache {2 * k.nbytes / 1e6:.0f} MB",
          file=sys.stderr)

    dus = len(sys.argv) > 4 and sys.argv[4] == "dus"

    def chain(n, bt, q, k, v, lengths):
        if dus:
            def step(carry, _):
                qc, kc, vc, ln = carry
                # (B, Hkv, D, 1) writeback token, slot-minor.
                tok = qc[:, :, :1, :].swapaxes(2, 3)
                kc = jax.lax.dynamic_update_slice(
                    kc, tok.astype(kc.dtype), (0, 0, 0, ln[0]))
                vc = jax.lax.dynamic_update_slice(
                    vc, tok.astype(vc.dtype), (0, 0, 0, ln[0]))
                o = decode_attention(qc, kc, vc, ln + 1, block_t=bt)
                return (qc * 0.999 + 0.001 * o.astype(qc.dtype),
                        kc, vc, ln + 1), ()

            (qf, _, _, _), _ = jax.lax.scan(step, (q, k, v, lengths),
                                            None, length=n)
        else:
            def step(qc, _):
                o = decode_attention(qc, k, v, lengths, block_t=bt)
                return (qc * 0.999 + 0.001 * o.astype(qc.dtype)), ()

            qf, _ = jax.lax.scan(step, q, None, length=n)
        return jnp.sum(qf)

    for bt in (512, 2048, 4096, None):
        jitted = {n: jax.jit(functools.partial(chain, n, bt))
                  for n in (8, 64)}
        for fill in (1, s // 2, s):
            lengths = jnp.full((B,), fill, jnp.int32)
            times = {}
            for n, f in jitted.items():
                _ = np.asarray(f(q, k, v, lengths))  # compile+warm
                best = float("inf")
                for i in range(4):
                    qs = q * (1 + 1e-6 * (i + 1))
                    t0 = time.perf_counter()
                    _ = np.asarray(f(qs, k, v, lengths))
                    best = min(best, time.perf_counter() - t0)
                times[n] = best
            per_call = (times[64] - times[8]) / 56
            live = 2 * B * HKV * fill * d * dtype.itemsize
            gbps = live / per_call / 1e9
            print(f"bt={bt} fill={fill:6d}: {per_call * 1e6:8.2f} us/call "
                  f"live {live / 1e6:7.1f} MB -> {gbps:7.1f} GB/s",
                  flush=True)


if __name__ == "__main__":
    main()
