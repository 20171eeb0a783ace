"""Fused contrastive-divergence (CD-k) epoch as a single Pallas TPU kernel.

Reference hot loop: ku/ebm/rbm.py:163-234 — per batch, the reference
dispatches 5 separate host→device graphs (weight/bias updates + 2 scoring
functions). Here the ENTIRE EPOCH is one ``pallas_call``:

- grid = (num_steps,): one grid step per batch; TPU grid steps run
  sequentially, so parameter updates carry across batches.
- The parameters live in VMEM for the whole epoch (constant-index output
  blocks are only flushed to HBM once, at the end) — the Gibbs chain never
  touches HBM for weights.
- Each batch block is streamed HBM→VMEM by the Pallas pipeline, overlapping
  the next batch's DMA with the current batch's compute (double-buffered).
- Bernoulli/Gaussian draws use the on-chip TPU PRNG
  (``pltpu.prng_seed`` / ``pltpu.prng_random_bits``); Gaussian sampling is
  Box-Muller on two uniform draws.
- All matmuls are MXU ops with ``preferred_element_type=float32``.

Padding strategy: the visible/hidden dims are zero-padded to multiples of
128 (MXU lane width). Sampled tensors are masked so padded units never
contaminate the real statistics: padded *columns* are forced to zero via
``vmask``/``hmask`` and padded *rows* (ragged final batch) via the per-row
``mask`` input — see the row/column masking in the kernel body.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MODE_VISIBLE_BERNOULLI = 0
MODE_VISIBLE_GAUSSIAN = 1
# Stacked-real complex mode (ku/ebm/rbm.py MODE_COMPLEX derivation):
# hidden activation doubled (2·Re(v^H W) + b_h, sigmoid for sampling AND
# statistics), visible ~ CN(b_v + Wh, I) i.e. stacked-real noise at
# σ = √½ per component, free energy ‖v − b_v‖² − Σ softplus(2a + b_h).
MODE_COMPLEX = 2

_LANE = 128
_INV_SQRT2 = 0.7071067811865476  # σ = √½ for CN(μ, I) components


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _uniform(shape):
    """U[0,1) from on-chip PRNG bits (top 24 bits, exact in f32).

    Mosaic can't cast uint32→f32 directly; after the logical shift the
    value fits in 24 bits, so a bitcast to int32 is lossless.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (
        1.0 / (1 << 24)
    )


def _normal(shape):
    """N(0,1) via Box-Muller on two uniform draws."""
    u1 = jnp.maximum(_uniform(shape), 1e-7)
    u2 = _uniform(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * jnp.pi * u2)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """a @ b.T without materializing the transpose (MXU dot_general)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_tt(a, b):
    """a.T @ b (contract over rows — batch contraction for CD statistics)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _make_kernel(lr: float, k: int, mode: int, grid_rank: int = 1):
    def kernel(
        seed_ref,  # (1,1) int32, SMEM
        v_ref,  # (batch, Vp) current batch block
        m_ref,  # (batch, 1) row mask
        w_in,  # (Vp, Hp)
        bh_in,  # (1, Hp)
        bv_in,  # (1, Vp)
        vmask_ref,  # (1, Vp)
        hmask_ref,  # (1, Hp)
        w_out,
        bh_out,
        bv_out,
        score_ref,  # (1, 1)
    ):
        if grid_rank == 2:
            # Multi-epoch fusion: grid = (epochs, steps); a single flat
            # program counter orders every (epoch, step) pair.
            step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        else:
            step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            w_out[:] = w_in[:]
            bh_out[:] = bh_in[:]
            bv_out[:] = bv_in[:]

        pltpu.prng_seed(seed_ref[0, 0] + step)

        w = w_out[:]
        bh = bh_out[:]
        bv = bv_out[:]
        vmask = vmask_ref[:]
        hmask = hmask_ref[:]
        mrow = m_ref[:]

        v_pos = v_ref[:]

        # Positive phase: sample h (reference rbm.py:46-48 / :58-59;
        # MODE_COMPLEX doubles the activation — rbm.py hidden_prob).
        act_pos = _dot(v_pos, w)
        act_pos = (2.0 * act_pos + bh) if mode == MODE_COMPLEX else (
            act_pos + bh
        )
        h_prob_pos = (
            jnp.maximum(act_pos, 0.0) if mode == MODE_VISIBLE_GAUSSIAN
            else jax.nn.sigmoid(act_pos)
        )
        h_pos = (
            (_uniform(h_prob_pos.shape) < h_prob_pos).astype(jnp.float32)
            * hmask
            * mrow
        )

        # Gibbs chain (k steps); h_neg = probabilities at chain end (:124).
        h = h_pos
        v_neg_first = v_pos  # overwritten on first iteration
        v_neg = v_pos
        h_neg = h_prob_pos
        for i in range(k):
            stat = _dot_t(h, w) + bv
            if mode == MODE_VISIBLE_BERNOULLI:
                p_v = jax.nn.sigmoid(stat)
                v_neg = (_uniform(p_v.shape) < p_v).astype(jnp.float32)
            elif mode == MODE_COMPLEX:
                v_neg = stat + _INV_SQRT2 * _normal(stat.shape)
            else:
                v_neg = stat + _normal(stat.shape)
            v_neg = v_neg * vmask * mrow
            if i == 0:
                v_neg_first = v_neg
            act_neg = _dot(v_neg, w)
            act_neg = (2.0 * act_neg + bh) if mode == MODE_COMPLEX else (
                act_neg + bh
            )
            # Negative-phase statistics use sigmoid in ALL modes
            # (reference rbm.py:124/:145); only *sampling* keeps the
            # Gaussian relu quirk.
            h_neg = jax.nn.sigmoid(act_neg) * hmask * mrow
            if i < k - 1:
                p_h = (
                    jnp.maximum(act_neg, 0.0) * hmask * mrow
                    if mode == MODE_VISIBLE_GAUSSIAN else h_neg
                )
                h = (_uniform(p_h.shape) < p_h).astype(jnp.float32)

        # Score BEFORE the update (reference computes it on pre-step params
        # only in effect of its K.function ordering; we match cd_update).
        def fe(vv):
            a = _dot(vv, w)
            a = (2.0 * a + bh) if mode == MODE_COMPLEX else (a + bh)
            sp = jnp.where(a > 30.0, a, jnp.log1p(jnp.exp(jnp.minimum(a, 30.0))))
            sp_sum = jnp.sum(sp * hmask, axis=1, keepdims=True)
            if mode == MODE_COMPLEX:
                # F(v) = ‖v − b_v‖² − Σ softplus (rbm.py free_energy).
                quad = jnp.sum((vv - bv) ** 2 * vmask, axis=1, keepdims=True)
                return quad - sp_sum
            return -(jnp.sum(vv * bv, axis=1, keepdims=True) + sp_sum)

        diff = jnp.abs(fe(v_pos) - fe(v_neg_first)) * mrow
        count = jnp.maximum(jnp.sum(mrow), 1.0)
        score_ref[pl.ds(step, 1), :] = jnp.full(
            (1, _LANE), jnp.sum(diff) / count, jnp.float32
        )

        # CD update (reference :121-134): raw sums over batch rows.
        v_pos_m = v_pos * mrow
        w_out[:] = w + lr * (_dot_tt(v_pos_m, h_pos) - _dot_tt(v_neg, h_neg))
        bh_out[:] = bh + lr * (
            jnp.sum(h_pos, axis=0, keepdims=True)
            - jnp.sum(h_neg, axis=0, keepdims=True)
        )
        bv_out[:] = bv + lr * (
            jnp.sum(v_pos_m, axis=0, keepdims=True)
            - jnp.sum(v_neg, axis=0, keepdims=True)
        )

    return kernel


def _cd_pallas_impl(params, v_all, mask, key, lr, k, mode, batch_size,
                    epochs, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # On CPU use the TPU-semantics interpreter (supports pltpu.prng_*,
    # though its PRNG is a zero-stub — fine for correctness tests that
    # force deterministic draws, not for real sampling).
    interpret_mode = pltpu.InterpretParams() if interpret else False

    v_dim = v_all.shape[1]
    h_dim = params["rbm_weight"].shape[1]
    vp = _round_up(v_dim, _LANE)
    hp = _round_up(h_dim, _LANE)
    num_steps = v_all.shape[0] // batch_size
    total_steps = num_steps * epochs

    v_pad = jnp.pad(v_all, ((0, 0), (0, vp - v_dim)))
    w_pad = jnp.pad(params["rbm_weight"], ((0, vp - v_dim), (0, hp - h_dim)))
    bh_pad = jnp.pad(params["hidden_bias"], (0, hp - h_dim))[None, :]
    bv_pad = jnp.pad(params["visible_bias"], (0, vp - v_dim))[None, :]
    vmask = (jnp.arange(vp) < v_dim).astype(jnp.float32)[None, :]
    hmask = (jnp.arange(hp) < h_dim).astype(jnp.float32)[None, :]
    seed = jax.random.randint(key, (1, 1), 0, np.int32(2**31 - 1), jnp.int32)

    if epochs == 1:
        grid = (num_steps,)
        grid_rank = 1
        const = lambda i: (0, 0)
        data_map = lambda i: (i, 0)
    else:
        # Multi-epoch fusion: the whole TRAINING RUN is one dispatch.
        # Grid (epochs, steps) revisits the same data blocks each epoch;
        # params stay in VMEM for the entire run.
        grid = (epochs, num_steps)
        grid_rank = 2
        const = lambda e, i: (0, 0)
        data_map = lambda e, i: (i, 0)

    out_shape = (
        jax.ShapeDtypeStruct((vp, hp), jnp.float32),
        jax.ShapeDtypeStruct((1, hp), jnp.float32),
        jax.ShapeDtypeStruct((1, vp), jnp.float32),
        jax.ShapeDtypeStruct((total_steps, _LANE), jnp.float32),
    )
    w_new, bh_new, bv_new, scores = pl.pallas_call(
        _make_kernel(float(lr), int(k), int(mode), grid_rank),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((batch_size, vp), data_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_size, 1), data_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((vp, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((vp, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), const, memory_space=pltpu.VMEM),
            # Whole scores array stays resident in VMEM (constant index);
            # each grid step writes one broadcast row.
            pl.BlockSpec((total_steps, _LANE), const, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        interpret=interpret_mode,
    )(seed, v_pad, mask[:, None], w_pad, bh_pad, bv_pad, vmask, hmask)

    new_params = {
        "rbm_weight": w_new[:v_dim, :h_dim],
        "hidden_bias": bh_new[0, :h_dim],
        "visible_bias": bv_new[0, :v_dim],
    }
    return new_params, scores[:, 0]


@functools.partial(
    jax.jit, static_argnames=("lr", "k", "mode", "batch_size", "interpret")
)
def cd_epoch_pallas(params, v_all, mask, key, lr: float, k: int, mode: int,
                    batch_size: int, interpret: bool | None = None):
    """Drop-in replacement for :func:`ku.ebm.rbm.cd_epoch_scan`.

    Same contract: ``v_all`` (num_steps·batch, V) zero-padded rows, ``mask``
    matching 0/1 row mask; returns (params, per-step scores). Sampling uses
    the TPU hardware PRNG, so draws differ from the scan oracle's
    threefry draws (same distributions).
    """
    return _cd_pallas_impl(params, v_all, mask, key, lr, k, mode, batch_size,
                           1, interpret)


# ---------------------------------------------------------------------------
# Data-parallel fused kernel: per-device whole-run kernels with an in-grid
# RDMA ring all-reduce of the CD statistics each batch step.
# ---------------------------------------------------------------------------


def _make_dp_kernel(lr: float, k: int, mode: int, n_dev: int,
                    axis_name: str, shards):
    """Per-device CD kernel with ring-psum'd statistics.

    Weights are stored TRANSPOSED (Hp, Vp) inside this kernel so the ring
    payload (h-major statistics) and both Gibbs matmuls need no in-kernel
    transposes. Ring protocol (see the credit/barrier notes inline): two
    communication slots per device, a credit semaphore gating slot reuse
    within a step, and a neighbor barrier between grid steps gating reuse
    across steps — without both, a fast neighbor overwrites a slot before
    it is forwarded/accumulated (verified failure mode in interpret mode).
    ``shards``: static list of (row_start, row_end) payload shards, one
    comm scratch buffer per shard.
    """

    def kernel(
        seed_ref,   # (1,1) int32 SMEM
        v_ref,      # (local_batch, Vp)
        m_ref,      # (local_batch, 1)
        wt_in,      # (Hp, Vp)  — W transposed
        bh_in,      # (1, Hp)
        bv_in,      # (1, Vp)
        vmask_ref,  # (1, Vp)
        hmask_ref,  # (1, Hp)
        wt_out,
        bh_out,
        bv_out,
        score_ref,  # (total_steps, LANE)
        *scratch,   # comms[n_shards] (2, rows_i, Cp), acc (Hp+3, Cp),
                    # send/recv DMA sems (2, n_shards), credit REGULAR
    ):
        comms = scratch[:len(shards)]
        acc, send_sem, recv_sem, credit_sem = scratch[len(shards):]
        step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        my_id = jax.lax.axis_index(axis_name)
        left = jax.lax.rem(my_id - 1 + n_dev, n_dev)
        right = jax.lax.rem(my_id + 1, n_dev)

        @pl.when(step == 0)
        def _():
            wt_out[:] = wt_in[:]
            bh_out[:] = bh_in[:]
            bv_out[:] = bv_in[:]

        # Cross-step barrier: my neighbors must have finished accumulating
        # the PREVIOUS step's final ring message before this step's first
        # RDMA may land in their slots (slot-reuse hazard across steps).
        if n_dev > 1:
            @pl.when(step > 0)
            def _():
                barrier = pltpu.get_barrier_semaphore()
                pltpu.semaphore_signal(
                    barrier, inc=1, device_id=left,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
                pltpu.semaphore_signal(
                    barrier, inc=1, device_id=right,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
                pltpu.semaphore_wait(barrier, 2)

        # Distinct PRNG stream per (device, step).
        pltpu.prng_seed(seed_ref[0, 0] + step * n_dev + my_id)

        wt = wt_out[:]
        bh = bh_out[:]
        bv = bv_out[:]
        vmask = vmask_ref[:]
        hmask = hmask_ref[:]
        mrow = m_ref[:]
        v_pos = v_ref[:]

        hp = wt.shape[0]
        vp = wt.shape[1]
        cp = acc.shape[1]

        # --- local Gibbs chain (same math as the single-device kernel,
        # incl. the MODE_COMPLEX doubled activation / σ=√½ sampling) ---
        act_pos = _dot_t(v_pos, wt)
        act_pos = (2.0 * act_pos + bh) if mode == MODE_COMPLEX else (
            act_pos + bh
        )
        h_prob_pos = (
            jnp.maximum(act_pos, 0.0) if mode == MODE_VISIBLE_GAUSSIAN
            else jax.nn.sigmoid(act_pos)
        )
        h_pos = (
            (_uniform(h_prob_pos.shape) < h_prob_pos).astype(jnp.float32)
            * hmask * mrow
        )
        h = h_pos
        v_neg = v_pos
        v_neg_first = v_pos
        h_neg = h_prob_pos
        for i in range(k):
            stat = _dot(h, wt) + bv
            if mode == MODE_VISIBLE_BERNOULLI:
                p_v = jax.nn.sigmoid(stat)
                v_neg = (_uniform(p_v.shape) < p_v).astype(jnp.float32)
            elif mode == MODE_COMPLEX:
                v_neg = stat + _INV_SQRT2 * _normal(stat.shape)
            else:
                v_neg = stat + _normal(stat.shape)
            v_neg = v_neg * vmask * mrow
            if i == 0:
                v_neg_first = v_neg
            act_neg = _dot_t(v_neg, wt)
            act_neg = (2.0 * act_neg + bh) if mode == MODE_COMPLEX else (
                act_neg + bh
            )
            h_neg = jax.nn.sigmoid(act_neg) * hmask * mrow
            if i < k - 1:
                p_h = (
                    jnp.maximum(act_neg, 0.0) * hmask * mrow
                    if mode == MODE_VISIBLE_GAUSSIAN else h_neg
                )
                h = (_uniform(p_h.shape) < p_h).astype(jnp.float32)

        def fe(vv):
            a = _dot_t(vv, wt)
            a = (2.0 * a + bh) if mode == MODE_COMPLEX else (a + bh)
            sp = jnp.where(a > 30.0, a, jnp.log1p(jnp.exp(jnp.minimum(a, 30.0))))
            sp_sum = jnp.sum(sp * hmask, axis=1, keepdims=True)
            if mode == MODE_COMPLEX:
                quad = jnp.sum((vv - bv) ** 2 * vmask, axis=1, keepdims=True)
                return quad - sp_sum
            return -(jnp.sum(vv * bv, axis=1, keepdims=True) + sp_sum)

        v_pos_m = v_pos * mrow
        diff = jnp.abs(fe(v_pos) - fe(v_neg_first)) * mrow

        # --- pack local stats into acc (the running global sum) ---
        # rows [0:Hp]   : d_wT  (Hp × Vp)
        # row  Hp       : d_bh  in [0:Hp]
        # row  Hp+1     : d_bv  in [0:Vp]
        # row  Hp+2     : [0]=score_sum, [1]=count
        d_wt = _dot_tt(h_pos, v_pos_m) - _dot_tt(h_neg, v_neg)
        acc[:hp, :vp] = d_wt
        d_bh = jnp.sum(h_pos, axis=0, keepdims=True) - jnp.sum(
            h_neg, axis=0, keepdims=True
        )
        d_bv = jnp.sum(v_pos_m, axis=0, keepdims=True) - jnp.sum(
            v_neg, axis=0, keepdims=True
        )
        # Unwritten column tails of these rows carry scratch garbage — the
        # ring transmits and accumulates them, but reads below slice only
        # the written ranges.
        acc[hp:hp + 1, :hp] = d_bh
        acc[hp + 1:hp + 2, :vp] = d_bv
        col = jax.lax.broadcasted_iota(jnp.int32, (1, cp), 1)
        acc[hp + 2:hp + 3, :] = jnp.where(
            col == 0, jnp.sum(diff),
            jnp.where(col == 1, jnp.sum(mrow), 0.0),
        )

        # --- ring all-reduce (pass-through): n-1 hops, 2 slots, credits ---
        # The payload is split across the per-shard comm buffers: multiple
        # ≤32 KB RDMAs pipeline on the ICI link per hop, and RDMA-addressed
        # buffers beyond ~48 KB also deadlock the CPU interpreter in CI.
        for i, (r0, r1) in enumerate(shards):
            comms[i][0] = acc[r0:r1]
        for hop in range(n_dev - 1):
            send_slot = hop % 2
            recv_slot = (hop + 1) % 2
            # Msg `hop` lands in dst slot (hop+1)%2 — freed by dst's send
            # at hop-1. Wait for that credit from hop 1 on (slot 1 is
            # guaranteed free at hop 0 by the cross-step barrier).
            if hop >= 1:
                pltpu.semaphore_wait(credit_sem, 1)
            rdmas = []
            for i in range(len(shards)):
                rdmas.append(pltpu.make_async_remote_copy(
                    src_ref=comms[i].at[send_slot],
                    dst_ref=comms[i].at[recv_slot],
                    send_sem=send_sem.at[send_slot, i],
                    recv_sem=recv_sem.at[recv_slot, i],
                    device_id=right,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                ))
            for r in rdmas:
                r.start()
            for r in rdmas:
                r.wait()
            # My send slot is free → left may deliver its next message.
            pltpu.semaphore_signal(
                credit_sem, inc=1, device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            for i, (r0, r1) in enumerate(shards):
                acc[r0:r1] = acc[r0:r1] + comms[i][recv_slot]
        if n_dev > 1:
            pltpu.semaphore_wait(credit_sem, 1)  # drain the unconsumed credit

        # --- apply the GLOBAL update (identical on every device) ---
        wt_out[:] = wt + lr * acc[:hp, :vp]
        bh_out[:] = bh + lr * acc[hp:hp + 1, :hp]
        bv_out[:] = bv + lr * acc[hp + 1:hp + 2, :vp]
        score_ref[pl.ds(step, 1), :] = jnp.full(
            (1, _LANE),
            acc[hp + 2, 0] / jnp.maximum(acc[hp + 2, 1], 1.0),
            jnp.float32,
        )

    return kernel


def _cd_pallas_dp_device_fn(params_t, v_local, m_local, seed, lr, k, mode,
                            local_batch, epochs, n_dev, axis_name,
                            interpret):
    """Per-device body (runs inside shard_map): one pallas_call for the
    whole multi-epoch run, ring-reducing stats each step."""
    hp, vp = params_t["wt"].shape
    num_steps = v_local.shape[0] // local_batch
    cp = max(vp, hp)
    grid = (epochs, num_steps)
    const2 = lambda e, i: (0, 0)
    data2 = lambda e, i: (i, 0)
    total_steps = epochs * num_steps
    # Payload shards: each comm buffer ≤ ~32 KB (pipelines on ICI; larger
    # RDMA-addressed buffers also deadlock the CPU interpreter in CI).
    rows_total = hp + 3
    rows_per_shard = max(1, (32 * 1024) // (cp * 4))
    shards = [
        (r0, min(r0 + rows_per_shard, rows_total))
        for r0 in range(0, rows_total, rows_per_shard)
    ]

    out_shape = (
        jax.ShapeDtypeStruct((hp, vp), jnp.float32),
        jax.ShapeDtypeStruct((1, hp), jnp.float32),
        jax.ShapeDtypeStruct((1, vp), jnp.float32),
        jax.ShapeDtypeStruct((total_steps, _LANE), jnp.float32),
    )
    interpret_mode = pltpu.InterpretParams() if interpret else False
    wt_new, bh_new, bv_new, scores = pl.pallas_call(
        _make_dp_kernel(float(lr), int(k), int(mode), int(n_dev), axis_name,
                        shards),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), const2, memory_space=pltpu.SMEM),
            pl.BlockSpec((local_batch, vp), data2, memory_space=pltpu.VMEM),
            pl.BlockSpec((local_batch, 1), data2, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, vp), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((hp, vp), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((total_steps, _LANE), const2,
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((2, r1 - r0, cp), jnp.float32) for r0, r1 in shards]
            + [
                pltpu.VMEM((hp + 3, cp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, len(shards))),
                pltpu.SemaphoreType.DMA((2, len(shards))),
                pltpu.SemaphoreType.REGULAR,
            ]
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=0,
        ),
        interpret=interpret_mode,
    )(seed, v_local, m_local, params_t["wt"], params_t["bh"],
      params_t["bv"], params_t["vmask"], params_t["hmask"])
    return wt_new, bh_new, bv_new, scores


def cd_train_pallas_dp(mesh, params, v_all, mask, key, lr: float, k: int,
                       mode: int, batch_size: int, epochs: int,
                       axis_name: str = "data",
                       interpret: bool | None = None):
    """Data-parallel fused CD training run (VERDICT r1 item 4).

    Same contract as :func:`cd_train_pallas` plus a mesh: the GLOBAL batch
    is sharded over ``axis_name`` (``batch_size % n_dev == 0``), each
    device runs the whole multi-epoch grid with its weights VMEM-resident,
    and the CD statistics are all-reduced per batch step by an RDMA ring
    INSIDE the kernel — parameters never leave VMEM between steps, unlike
    :func:`ku.dist.mesh.cd_epoch_dp` (scan + psum, params reloaded every
    step). Returns (params, scores of shape (epochs·steps,)).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_dev = mesh.shape[axis_name]
    assert batch_size % n_dev == 0, "batch_size must divide over the mesh"
    local_batch = batch_size // n_dev
    v_dim = v_all.shape[1]
    h_dim = params["rbm_weight"].shape[1]
    vp = _round_up(v_dim, _LANE)
    hp = _round_up(h_dim, _LANE)
    num_steps = v_all.shape[0] // batch_size

    # (steps, dev, local, Vp) — axis 1 sharded over the mesh.
    v_pad = jnp.pad(v_all, ((0, 0), (0, vp - v_dim)))
    v_b = v_pad.reshape(num_steps, n_dev, local_batch, vp)
    m_b = mask.reshape(num_steps, n_dev, local_batch, 1)

    params_t = {
        "wt": jnp.pad(params["rbm_weight"],
                      ((0, vp - v_dim), (0, hp - h_dim))).T,
        "bh": jnp.pad(params["hidden_bias"], (0, hp - h_dim))[None, :],
        "bv": jnp.pad(params["visible_bias"], (0, vp - v_dim))[None, :],
        "vmask": (jnp.arange(vp) < v_dim).astype(jnp.float32)[None, :],
        "hmask": (jnp.arange(hp) < h_dim).astype(jnp.float32)[None, :],
    }
    seed = jax.random.randint(key, (1, 1), 0, np.int32(2**31 - 1), jnp.int32)

    def per_device(params_t, v_shard, m_shard, seed):
        v_local = v_shard.reshape(num_steps * local_batch, vp)
        m_local = m_shard.reshape(num_steps * local_batch, 1)
        outs = _cd_pallas_dp_device_fn(
            params_t, v_local, m_local, seed, lr, k, mode, local_batch,
            epochs, n_dev, axis_name, interpret,
        )
        # Stack a leading device axis: replicated (P()) pallas outputs from
        # shard_map hang the TPU interpret machinery on CPU meshes, so the
        # results (identical on every device after the ring) come back
        # device-stacked and are unstacked below.
        return jax.tree.map(lambda t: t[None], outs)

    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(None, axis_name), P(None, axis_name), P()),
        out_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
        check_vma=False,
    )
    wt_new, bh_new, bv_new, scores = jax.jit(fn)(params_t, v_b, m_b, seed)
    new_params = {
        "rbm_weight": wt_new[0].T[:v_dim, :h_dim],
        "hidden_bias": bh_new[0, 0, :h_dim],
        "visible_bias": bv_new[0, 0, :v_dim],
    }
    return new_params, scores[0, :, 0]


@functools.partial(
    jax.jit,
    static_argnames=("lr", "k", "mode", "batch_size", "epochs", "interpret"),
)
def cd_train_pallas(params, v_all, mask, key, lr: float, k: int, mode: int,
                    batch_size: int, epochs: int,
                    interpret: bool | None = None):
    """The ENTIRE multi-epoch training run as ONE kernel dispatch:
    grid = (epochs, steps), parameters resident in VMEM throughout.
    Returns (params, scores of shape (epochs·steps,)). This collapses the
    reference's 5·steps·epochs host dispatches (rbm.py:163-234) — and
    even the one-dispatch-per-epoch pattern — to a single call, which on
    remote-dispatch TPU setups is the difference between ~6 ms/epoch of
    round-trip latency and none."""
    return _cd_pallas_impl(params, v_all, mask, key, lr, k, mode, batch_size,
                           epochs, interpret)
