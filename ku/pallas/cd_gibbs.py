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

_LANE = 128


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

        # Positive phase: sample h (reference rbm.py:46-48 / :58-59).
        act_pos = _dot(v_pos, w) + bh
        h_prob_pos = (
            jax.nn.sigmoid(act_pos) if mode == MODE_VISIBLE_BERNOULLI
            else jnp.maximum(act_pos, 0.0)
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
            else:
                v_neg = stat + _normal(stat.shape)
            v_neg = v_neg * vmask * mrow
            if i == 0:
                v_neg_first = v_neg
            act_neg = _dot(v_neg, w) + bh
            # Negative-phase statistics use sigmoid in BOTH modes
            # (reference rbm.py:124/:145); only *sampling* keeps the
            # Gaussian relu quirk.
            h_neg = jax.nn.sigmoid(act_neg) * hmask * mrow
            if i < k - 1:
                p_h = (
                    h_neg if mode == MODE_VISIBLE_BERNOULLI
                    else jnp.maximum(act_neg, 0.0) * hmask * mrow
                )
                h = (_uniform(p_h.shape) < p_h).astype(jnp.float32)

        # Score BEFORE the update (reference computes it on pre-step params
        # only in effect of its K.function ordering; we match cd_update).
        def fe(vv):
            a = _dot(vv, w) + bh
            sp = jnp.where(a > 30.0, a, jnp.log1p(jnp.exp(jnp.minimum(a, 30.0))))
            return -(
                jnp.sum(vv * bv, axis=1, keepdims=True)
                + jnp.sum(sp * hmask, axis=1, keepdims=True)
            )

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
