"""Device-mesh helpers and data-parallel training steps.

The reference has no working distribution (its ``multi_gpu``/``num_gpus``
config keys are threaded into ``compose_gan_with_mode`` but never used —
reference ku/backprop/gan.py:1002,1014-1178). Here parallelism is
first-class and expressed the TPU way: a ``jax.sharding.Mesh`` over ICI,
``shard_map`` for per-device code with explicit ``psum`` of statistics /
gradients, and ``NamedSharding`` annotations for pjit-style tensor
sharding. No custom transport — XLA lowers the collectives onto ICI.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``; the
same code then spans slices (DCN) transparently.

Scope (SURVEY §2.5): data parallelism and tensor/FSDP-style sharding are
implemented; sequence parallelism is covered by
:func:`ku.pallas.flash_attention.ring_attention`. Pipeline (PP) and expert
(EP) parallelism are explicitly out of scope for this capability set —
the model families here (RBM/DBN, StyleGAN-scale GANs) have no pipeline
stages or experts to shard.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map


def initialize_multihost(**kwargs) -> None:
    """Initialize multi-host JAX (one process per host; same SPMD program
    then spans slices over DCN). Thin wrapper for discoverability —
    call before :func:`make_mesh` on multi-host deployments."""
    jax.distributed.initialize(**kwargs)


def make_mesh(axis_shapes: Optional[dict] = None, devices=None) -> Mesh:
    """Build a mesh; default is 1-D data parallelism over all devices.

    ``make_mesh({'data': 4, 'model': 2})`` builds a 2-D DP×TP mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    if not axis_shapes:
        axis_shapes = {"data": len(devices)}
    names = tuple(axis_shapes)
    shape = tuple(axis_shapes[n] for n in names)
    n_needed = int(np.prod(shape))
    if n_needed > len(devices):
        raise ValueError(f"mesh needs {n_needed} devices, have {len(devices)}")
    arr = np.array(devices[:n_needed]).reshape(shape)
    return Mesh(arr, names)


def data_parallel_sharding(mesh: Mesh, ndim: int, axis: int = 0,
                           axis_name: str = "data") -> NamedSharding:
    """Shard dimension ``axis`` of an ndim-array over ``axis_name``."""
    spec = [None] * ndim
    spec[axis] = axis_name
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: int = 0, axis_name: str = "data"):
    """Device-put a pytree with its ``axis`` dim sharded over the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, data_parallel_sharding(mesh, np.ndim(x), axis, axis_name)
        ),
        tree,
    )


def shard_gan_state(state, mesh, model_axis: str = "model",
                    tp_patterns: Sequence[str] = ("map_dense", "style_dense",
                                                  "dense_1")):
    """Place a GAN train state on the mesh: matmul kernels matching
    ``tp_patterns`` tensor-parallel over ``model_axis`` (column-sharded),
    everything else replicated. GSPMD propagates the rest of the sharding
    through the jitted train step."""
    from jax.sharding import NamedSharding

    def spec_for(path, leaf):
        names = "/".join(
            str(getattr(p, "key", getattr(p, "name", p))) for p in path
        )
        if (
            getattr(leaf, "ndim", 0) == 2
            and "kernel" in names
            and any(pat in names for pat in tp_patterns)
            and model_axis in mesh.shape
            and leaf.shape[1] % mesh.shape[model_axis] == 0
        ):
            return NamedSharding(mesh, P(None, model_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, spec_for(path, leaf))
        if hasattr(leaf, "ndim") else leaf,
        state,
    )


def shard_decode_state(params, cache, mesh, model_axis: str = "model",
                       num_head: Optional[int] = None,
                       num_kv_head: Optional[int] = None,
                       data_axis: Optional[str] = None):
    """Tensor-parallel SERVING: place a transformer stack's params and KV
    cache on the mesh with attention heads sharded over ``model_axis``.

    Head parallelism is the natural TP axis for decode — every per-head
    einsum in the KV-cache step is head-local, so the only collective
    GSPMD inserts is the psum closing the output projection (and the MLP,
    whose first/second Dense kernels are column-/row-sharded to ride the
    same psum). The KV cache shards over its head axis: each device holds
    ``H_kv / tp`` heads' slots — cache HBM per device shrinks by the TP
    degree, which is what lets one serving replica hold long contexts.

    Layout notes: ``W_Q``/``W_K``/``W_V`` are (d, heads·dh) with heads
    OUTER in the head split, so contiguous column shards = contiguous
    head groups, matching the cache's axis-1 shard; GQA query groups
    (h/hkv consecutive query heads per KV head) stay device-local because
    h and h_kv shard by the same factor. ``W_multi_head`` row-shards so
    its contraction closes with one psum.

    Requires ``h_kv % tp == 0`` (cache axis); kernels whose columns/rows
    don't divide fall back to replicated. Pass ``num_head`` (and
    ``num_kv_head`` for GQA) to let the helper verify head counts divide
    the TP degree — a tp that divides the raw matrix dims but NOT the
    head counts would shard weights mid-head while the cache stays
    replicated (no HBM saving + per-step resharding collectives); in that
    case weights and the cache head axis fall back to replicated with a
    warning. ``data_axis``: additionally shard every cache leaf's batch
    axis (axis 0) over that mesh axis — 2-D request-DP × head-TP serving
    placement; batch DP survives the head-divisibility fallback.
    Returns (params, cache) placed.
    """
    tp = mesh.shape[model_axis]
    hkv = num_kv_head if num_kv_head is not None else num_head
    if num_head is not None and (num_head % tp or hkv % tp):
        import warnings

        warnings.warn(
            f"shard_decode_state: num_head={num_head}/num_kv_head={hkv} "
            f"do not divide tp={tp} — placing weights and cache heads "
            "replicated (head-parallel serving needs head counts "
            "divisible by the model axis)", stacklevel=2)

        def rep_param(leaf):
            return jax.device_put(leaf, NamedSharding(mesh, P()))

        def rep_cache(path, leaf):
            # Keep the orthogonal batch-DP placement the caller asked
            # for even when head-TP is impossible — but NEVER batch-shard
            # paged pool leaves: their axis 0 is pages, not batch.
            name = str(getattr(path[-1], "key", path[-1])) if path else ""
            if name in ("pages_k", "pages_v", "key_scale_pages",
                        "value_scale_pages"):
                return jax.device_put(leaf, NamedSharding(mesh, P()))
            spec = (P(data_axis) if data_axis is not None
                    and getattr(leaf, "ndim", 0) >= 1 else P())
            return jax.device_put(leaf, NamedSharding(mesh, spec))

        return (jax.tree.map(rep_param, params),
                jax.tree_util.tree_map_with_path(rep_cache, cache))

    def put(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    def param_spec(path, leaf):
        name = "/".join(
            str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        nd = getattr(leaf, "ndim", 0)
        if nd == 2:
            if (name.endswith(("W_Q", "W_K", "W_V"))
                    or "Dense_0/kernel" in name):
                if leaf.shape[1] % tp == 0:
                    return P(None, model_axis)
            elif (name.endswith("W_multi_head")
                    or "Dense_1/kernel" in name):
                if leaf.shape[0] % tp == 0:
                    return P(model_axis, None)
        if nd == 1 and "Dense_0/bias" in name and leaf.shape[0] % tp == 0:
            return P(model_axis)
        return P()

    def cache_spec(path, leaf):
        name = str(getattr(path[-1], "key", path[-1])) if path else ""
        nd = getattr(leaf, "ndim", 0)
        da = data_axis  # batch axis 0 of every cache leaf
        if name in ("cached_key", "cached_value") and nd == 4 \
                and leaf.shape[1] % tp == 0:
            return P(da, model_axis, None, None)
        if name in ("key_scale", "value_scale") and nd == 3 \
                and leaf.shape[1] % tp == 0:
            return P(da, model_axis, None)
        # Paged pools: axis 0 is PAGES (shared across rows), never the
        # batch — shard the head axis over TP, replicate across data
        # (each data shard keeps the whole pool; the per-row tables are
        # what shard by batch).
        if name in ("pages_k", "pages_v") and nd == 4:
            return (P(None, model_axis, None, None)
                    if leaf.shape[1] % tp == 0 else P())
        if name in ("key_scale_pages", "value_scale_pages") and nd == 3:
            return (P(None, model_axis, None)
                    if leaf.shape[1] % tp == 0 else P())
        if da is not None and nd >= 1:
            return P(da)  # cache_index (B,), page_table/cache_pos (B, m)
        return P()

    params = jax.tree_util.tree_map_with_path(
        lambda path, leaf: put(leaf, param_spec(path, leaf)), params)
    cache = jax.tree_util.tree_map_with_path(
        lambda path, leaf: put(leaf, cache_spec(path, leaf)), cache)
    return params, cache


def shard_stacked_batches(batches, mesh, axis_name: str = "data",
                          batch_axis: int = 1):
    """Shard the engine's stacked batch dict over the data axis.
    ``batch_axis``: 1 for (k, batch, ...) stacks, 2 for the multi-step
    (S, k, batch, ...) stacks."""
    from jax.sharding import NamedSharding

    spec = [None] * batch_axis + [axis_name]
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(*spec))),
        batches,
    )


@functools.partial(
    jax.jit, static_argnames=("mesh", "lr", "k", "mode", "batch_size")
)
def cd_epoch_dp(mesh: Mesh, params, v_all, mask, key, lr: float, k: int,
                mode: int, batch_size: int):
    """Data-parallel CD epoch: batch rows sharded over the 'data' axis,
    CD statistics ``psum``'d over ICI each step, params replicated.

    TPU-native replacement for the reference's never-implemented multi-GPU
    path (SURVEY §2.5). Requires ``batch_size % mesh.shape['data'] == 0``.
    """
    from ku.ebm.rbm import apply_stats, cd_stats

    n_dev = mesh.shape["data"]
    assert batch_size % n_dev == 0, "batch_size must divide over the data axis"
    num_steps = v_all.shape[0] // batch_size
    # (steps, dev_shard, local_batch, V): axis 1 is the sharded axis.
    v_b = v_all.reshape(num_steps, n_dev, batch_size // n_dev, -1)
    m_b = mask.reshape(num_steps, n_dev, batch_size // n_dev)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, "data"), P(None, "data"), P()),
        out_specs=(P(), P()),
    )
    def epoch(params, v_shards, m_shards, key):
        # Decorrelate sampling across shards.
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))

        def step(carry, xs):
            p, key = carry
            v_s, m_s = xs
            key, sub = jax.random.split(key)
            stats = cd_stats(p, v_s[0], sub, k, mode, weight=m_s[0])
            stats = jax.lax.psum(stats, "data")
            p = apply_stats(p, stats, lr)
            score = stats["score_sum"] / jnp.maximum(stats["count"], 1.0)
            return (p, key), score

        (params, _), scores = jax.lax.scan(step, (params, key), (v_shards, m_shards))
        return params, scores

    return epoch(params, v_b, m_b, key)
