"""Autoencoder construction by structural encoder reversal.

Reference: ku/backprop/autoencoder.py — builds a decoder by walking the
encoder's Keras graph ``inbound_nodes`` from the output layer up (:63-64)
and emitting the mirror layer per type: Dense→Dense(input_dim) (:69-76),
DenseBatchNormalization→same composite (:77-98), Conv1D/SeparableConv1D→
UpSampling1D+conv or same-shape conv (:99-120), strided Conv2D→
Conv2DTranspose (:121-148), Conv3D→Conv3DTranspose (:149-160), GCN→GCN
(:161-169), else raise (:171).

TPU-native: encoders that want reversal are spec lists
(:class:`ku.engine_ext.spec.LayerSpec`); reversal is a pure function over
the list with shapes from abstract evaluation — no graph introspection
(SURVEY §3.3 "avoid graph introspection entirely"). The same dispatch
table is implemented over spec kinds.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

import importlib

_spec_mod = importlib.import_module("ku.engine_ext.spec")
from ku.engine_ext.spec import LayerSpec, Stack, infer_shapes, spec  # noqa: E402
from ku.nn.common import resolve_activation


def _reverse_one(s: LayerSpec, in_shape: Tuple[int, ...],
                 out_shape: Tuple[int, ...]) -> Tuple[LayerSpec, ...]:
    """Mirror one spec. ``in_shape``/``out_shape``: the ENCODER layer's
    shapes; the emitted decoder specs map out_shape → in_shape."""
    c = s.cfg
    rname = f"{s.name}_rev"
    if s.kind == "dense":
        # Dense(units) → Dense(input_dim) (reference :69-76).
        return (spec("dense", rname, units=in_shape[-1],
                     activation=c.get("activation")),)
    if s.kind == "dense_bn":
        # Same composite mirrored (reference :77-98).
        return (spec("dense_bn", rname, units=in_shape[-1],
                     activation=c.get("activation"),
                     dropout_rate=c.get("dropout_rate")),)
    if s.kind in ("conv1d", "separable_conv1d"):
        # Strided → UpSampling1D + conv; else same-shape conv (:99-120).
        strides = c.get("strides", 1)
        stride = strides[0] if isinstance(strides, (tuple, list)) else strides
        out = []
        if stride > 1:
            out.append(spec("upsampling1d", rname + "_up", size=stride))
        out.append(
            spec("conv1d", rname, filters=in_shape[-1],
                 kernel_size=c["kernel_size"], strides=1, padding="same",
                 activation=c.get("activation"))
        )
        return tuple(out)
    if s.kind == "conv2d":
        # Strided Conv2D → Conv2DTranspose (:121-148).
        return (
            spec("conv2d_transpose", rname, filters=in_shape[-1],
                 kernel_size=c["kernel_size"], strides=c.get("strides", 1),
                 padding=c.get("padding", "same"),
                 activation=c.get("activation")),
        )
    if s.kind == "conv3d":
        # Conv3D → Conv3DTranspose (:149-160).
        return (
            spec("conv3d_transpose", rname, filters=in_shape[-1],
                 kernel_size=c["kernel_size"], strides=c.get("strides", 1),
                 padding=c.get("padding", "same"),
                 activation=c.get("activation")),
        )
    if s.kind == "gcn":
        # GCN → GCN(d_out=d_in) (:161-169).
        return (
            spec("gcn", rname, n_node=c["n_node"], d_out=in_shape[-1],
                 output_adjacency=c.get("output_adjacency", False),
                 activation=c.get("activation")),
        )
    if s.kind == "activation":
        return (s,)  # activations are self-mirroring
    if s.kind == "flatten":
        # Mirror of flatten = reshape back to the pre-flatten shape.
        return (spec("reshape", rname, target_shape=tuple(in_shape[1:])),)
    raise ValueError(
        f"layer kind {s.kind!r} is not reversible (reference autoencoder.py:171)"
    )


def reverse_groups(encoder_specs: Sequence[LayerSpec],
                   input_shape: Tuple[int, ...]):
    """Per-encoder-layer mirror groups, innermost first: ``groups[j]``
    mirrors encoder layer ``n-1-j``."""
    shapes = infer_shapes(encoder_specs, input_shape)
    return tuple(
        _reverse_one(encoder_specs[i], shapes[i], shapes[i + 1])
        for i in range(len(encoder_specs) - 1, -1, -1)
    )


def reverse_specs(encoder_specs: Sequence[LayerSpec],
                  input_shape: Tuple[int, ...]) -> Tuple[LayerSpec, ...]:
    """Decoder spec list mirroring the encoder, output layer first
    (reference ``reverse_model``/``_get_reversed_outputs``, :17-171)."""
    return tuple(
        s for group in reverse_groups(encoder_specs, input_shape) for s in group
    )


def reverse_model(encoder_specs: Sequence[LayerSpec],
                  input_shape: Tuple[int, ...]) -> Stack:
    """Decoder Stack for an encoder spec list (reference :17-46)."""
    return Stack(specs=reverse_specs(encoder_specs, input_shape))


def make_decoder_from_encoder(encoder_specs, input_shape) -> Stack:
    """Reference :396-420."""
    return reverse_model(encoder_specs, input_shape)


def _apply_spec(s: LayerSpec, x, deterministic: bool):
    """Apply one spec outside a Stack (used by the skip autoencoder)."""
    if s.kind in _spec_mod._FUNCTIONAL:
        return _spec_mod._apply_functional(s, x)
    layer = _spec_mod._build(s)
    if s.kind == "dense_bn":
        return layer(x, deterministic=deterministic)
    x = layer(x)
    act = s.cfg.get("activation")
    if act is not None:
        x = resolve_activation(act)(x)
    return x


class Autoencoder(nn.Module):
    """Encoder + structurally-reversed decoder (reference :423-450)."""

    encoder_specs: Tuple[LayerSpec, ...]
    decoder_specs: Tuple[LayerSpec, ...]

    def setup(self):
        self.encoder = Stack(specs=self.encoder_specs)
        self.decoder = Stack(specs=self.decoder_specs)

    def __call__(self, x, deterministic: bool = True):
        z = self.encoder(x, deterministic=deterministic)
        return self.decoder(z, deterministic=deterministic)

    def encode(self, x, deterministic: bool = True):
        return self.encoder(x, deterministic=deterministic)

    def decode(self, z, deterministic: bool = True):
        return self.decoder(z, deterministic=deterministic)


def make_autoencoder_from_encoder(encoder_specs, input_shape) -> Autoencoder:
    """Reference :423-450: model = decoder(encoder(x))."""
    return Autoencoder(
        encoder_specs=tuple(encoder_specs),
        decoder_specs=reverse_specs(encoder_specs, input_shape),
    )


class SymSkipAutoencoder(nn.Module):
    """Autoencoder with U-Net-style symmetric skip connections
    (reference ``make_autoencoder_with_sym_sc``, :174-393).

    The mirror group of encoder layer i maps shape_out(i) → shape_in(i);
    its input tensor therefore has the same shape as encoder layer i's
    output, so that output is concatenated on (channel axis) before the
    group — except for the innermost layer, whose output IS the decoder
    input.
    """

    encoder_specs: Tuple[LayerSpec, ...]
    decoder_groups: Tuple[Tuple[LayerSpec, ...], ...]

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        outs = []
        for s in self.encoder_specs:
            x = _apply_spec(s, x, deterministic)
            outs.append(x)

        n = len(self.encoder_specs)
        for j, group in enumerate(self.decoder_groups):
            i = n - 1 - j  # encoder layer this group mirrors
            if j > 0:
                x = jnp.concatenate([x, outs[i]], axis=-1)
            for s in group:
                x = _apply_spec(s, x, deterministic)
        return x


def make_autoencoder_with_sym_sc(encoder_specs, input_shape) -> SymSkipAutoencoder:
    """Reference :174-393."""
    return SymSkipAutoencoder(
        encoder_specs=tuple(encoder_specs),
        decoder_groups=reverse_groups(encoder_specs, input_shape),
    )
