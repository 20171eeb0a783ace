"""Layer-spec model representation.

The reference builds models as Keras graphs and then *introspects* them —
walking ``inbound_nodes`` to reverse an encoder (reference
ku/backprop/autoencoder.py:49-171), slicing ``model.layers`` to truncate
for progressive training (engine_ext/training.py:195-293), splicing layers
between named layers (``glue_layers``, training.py:114-193). Graph
introspection doesn't exist in JAX; instead models that want these
structural operations are declared as a sequence of :class:`LayerSpec`s —
a pure data structure that is trivially reversible / sliceable / spliceable
— and compiled to a flax module by :class:`Stack`.

Specs are hashable (frozen dataclass with a tuple config) so they can be
static arguments under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ku.nn.common import resolve_activation
from ku.nn.dense_composite import DenseBatchNormalization
from ku.nn.gnn import GraphConvolutionNetwork


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    """One layer: ``kind`` selects the builder, ``config`` its kwargs."""

    kind: str
    name: str
    config: Tuple[Tuple[str, Any], ...] = ()

    @property
    def cfg(self) -> Dict[str, Any]:
        return dict(self.config)

    def with_config(self, **updates) -> "LayerSpec":
        cfg = self.cfg
        cfg.update(updates)
        return LayerSpec(self.kind, self.name, tuple(sorted(cfg.items())))

    def to_json(self):
        return {"kind": self.kind, "name": self.name, "config": self.cfg}

    @classmethod
    def from_json(cls, d):
        cfg = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in d["config"].items()
        }
        return cls(d["kind"], d["name"], tuple(sorted(cfg.items())))


def spec(kind: str, name: str, **config) -> LayerSpec:
    canon = {
        k: tuple(v) if isinstance(v, list) else v for k, v in config.items()
    }
    return LayerSpec(kind, name, tuple(sorted(canon.items())))


# -- builders ---------------------------------------------------------------


def _build(s: LayerSpec) -> nn.Module:
    c = s.cfg
    kind = s.kind
    if kind == "dense":
        return nn.Dense(c["units"], use_bias=c.get("use_bias", True), name=s.name)
    if kind == "dense_bn":
        return DenseBatchNormalization(
            c["units"], activation=c.get("activation"),
            dropout_rate=c.get("dropout_rate"), name=s.name,
        )
    if kind in ("conv1d", "conv2d", "conv3d", "separable_conv1d"):
        rank = {"conv1d": 1, "separable_conv1d": 1, "conv2d": 2, "conv3d": 3}[kind]
        ks = c["kernel_size"]
        ks = (ks,) * rank if isinstance(ks, int) else tuple(ks)
        st = c.get("strides", 1)
        st = (st,) * rank if isinstance(st, int) else tuple(st)
        return nn.Conv(
            c["filters"], ks, strides=st, padding=str(c.get("padding", "SAME")).upper(),
            use_bias=c.get("use_bias", True), name=s.name,
        )
    if kind in ("conv1d_transpose", "conv2d_transpose", "conv3d_transpose"):
        rank = {"conv1d_transpose": 1, "conv2d_transpose": 2,
                "conv3d_transpose": 3}[kind]
        ks = c["kernel_size"]
        ks = (ks,) * rank if isinstance(ks, int) else tuple(ks)
        st = c.get("strides", 1)
        st = (st,) * rank if isinstance(st, int) else tuple(st)
        return nn.ConvTranspose(
            c["filters"], ks, strides=st, padding=str(c.get("padding", "SAME")).upper(),
            use_bias=c.get("use_bias", True), name=s.name,
        )
    if kind == "gcn":
        return GraphConvolutionNetwork(
            c["n_node"], c["d_out"], output_adjacency=c.get("output_adjacency", False),
            activation=c.get("activation"), name=s.name,
        )
    if kind in ("upsampling1d", "upsampling2d", "upsampling3d"):
        return None  # handled functionally in Stack
    if kind in ("activation", "flatten"):
        return None
    raise ValueError(f"unknown layer kind {kind!r}")


def _apply_functional(s: LayerSpec, x):
    c = s.cfg
    if s.kind == "activation":
        return resolve_activation(c["activation"])(x)
    if s.kind == "flatten":
        return x.reshape(x.shape[0], -1)
    if s.kind == "reshape":
        return x.reshape((x.shape[0],) + tuple(c["target_shape"]))
    if s.kind.startswith("upsampling"):
        rank = int(s.kind[-2])
        size = c.get("size", 2)
        sizes = (size,) * rank if isinstance(size, int) else tuple(size)
        for axis, r in zip(range(1, rank + 1), sizes):
            x = jnp.repeat(x, r, axis=axis)
        return x
    raise AssertionError(s.kind)


_FUNCTIONAL = ("activation", "flatten", "reshape", "upsampling1d",
               "upsampling2d", "upsampling3d")


class Stack(nn.Module):
    """Sequential model compiled from a spec tuple.

    Supports the post-layer activation convention (specs may carry an
    ``activation`` config key even for parameterized kinds) and threads
    the adjacency through GCN layers.
    """

    specs: Tuple[LayerSpec, ...]

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        adjacency = None
        if isinstance(x, (list, tuple)):
            x, adjacency = x
        for s in self.specs:
            if s.kind in _FUNCTIONAL:
                x = _apply_functional(s, x)
                continue
            layer = _build(s)
            if s.kind == "gcn":
                out = layer([x, adjacency])
                x = out[0] if s.cfg.get("output_adjacency", False) else out
            elif s.kind == "dense_bn":
                x = layer(x, deterministic=deterministic)
                continue  # activation handled inside the composite
            else:
                x = layer(x)
            act = s.cfg.get("activation")
            if act is not None and s.kind not in ("gcn",):
                x = resolve_activation(act)(x)
        return x


def infer_shapes(specs: Sequence[LayerSpec], input_shape: Tuple[int, ...],
                 adjacency_shape: Optional[Tuple[int, ...]] = None):
    """Per-layer input shapes by abstract evaluation (no FLOPs, no device).

    Returns a list with one entry per spec: the shape flowing INTO that
    layer; plus the final output shape appended.
    """
    if adjacency_shape is None:
        for s in specs:
            if s.kind == "gcn":
                n = s.cfg["n_node"]
                adjacency_shape = (input_shape[0], n, n)
                break
    # Single O(n) pass: abstract-evaluate each layer once on its own
    # input shape.
    shapes = [tuple(input_shape)]
    cur = tuple(input_shape)
    for s in specs:
        sub = Stack(specs=(s,))
        x = jax.ShapeDtypeStruct(cur, jnp.float32)
        if adjacency_shape is not None:
            a = jax.ShapeDtypeStruct(tuple(adjacency_shape), jnp.float32)
            out = jax.eval_shape(
                lambda xx, aa: sub.init_with_output(jax.random.key(0),
                                                    [xx, aa])[0],
                x, a,
            )
        else:
            out = jax.eval_shape(
                lambda xx: sub.init_with_output(jax.random.key(0), xx)[0], x
            )
        cur = tuple(out.shape)
        shapes.append(cur)
    return shapes
