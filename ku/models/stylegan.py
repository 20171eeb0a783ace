"""Style-based GAN (StyleGAN) — mapping net, synthesis net, discriminator.

Reference: examples/style_based_gan/style_based_gan.py —
- mapping net (:336-370): z (+ label-embedding concat) → pixel-norm →
  8×[Dense + LeakyReLU(0.2)] → broadcast to num_layers.
- synthesis (:186-328): 4×4 start block from a constant (:229-257), per
  resolution {upsample (FusedEqualizedLRConv2DTranspose if ≥128 px else
  bilinear UpSampling2D + EqualizedLRConv2D, :268-275) → blur → noise +
  LeakyReLU + pixel-norm → AdaIN(style) (:304-328)}, final 1×1 conv with
  tanh (:289-293).
- discriminator (:372-435): mirror pyramid with blur + (Fused)EqualizedLR
  convs, MinibatchStddevConcat at 4×4 (:414), label-projection output
  (:426-430).
- channels: ``min(ch_base / 2^layer, max_ch)`` (:171-183).
- num_layers = 2·log2(resolution) − 2 (:192).

Deviations (documented): the reference's learned constant and per-channel
noise weights are created with raw ``K.variable`` and never registered as
Keras weights (:231, :333) — effectively frozen at ones; here they are real
trainable params (NVIDIA semantics, strictly more capable). Noise draws
come from the flax ``'noise'`` RNG stream; style mixing from ``'style'``.

Progressive training (reference ``create_prog_model`` +
``fit_generator_progressively``): build these modules at a smaller
``resolution`` — layer names are resolution-indexed, so params transfer
between stages by name (see ku/engine_ext/training.py:select_params).

TPU notes: everything is NHWC; convs/matmuls run through the MXU and XLA
fuses the noise/LReLU/pixel-norm/AdaIN chains into the surrounding convs.
``dtype=bfloat16`` on the generator halves HBM traffic for inference.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ku.nn import (
    AdaptiveINWithStyle,
    BlurDepthwiseConv2D,
    EqualizedLRConv2D,
    EqualizedLRDense,
    FusedEqualizedLRConv2D,
    FusedEqualizedLRConv2DTranspose,
    MinibatchStddevConcat,
    StyleMixingRegularization,
    TruncationTrick,
)


def cal_num_chs(layer_idx: int, ch_base: int = 1024, max_ch: int = 512) -> int:
    """Channels per synthesis layer (reference :171-183)."""
    return int(min(ch_base / (2.0**layer_idx), max_ch))


def _pixel_norm(x, eps: float = 1e-8):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)


class _ApplyNoise(nn.Module):
    """x + N(0,1)·w_c (reference ``_apply_noise_layer``, :330-334)."""

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        w = self.param("noise_weight", nn.initializers.ones, (x.shape[-1],))
        if deterministic:
            return x
        n = jax.random.normal(self.make_rng("noise"), x.shape[1:], x.dtype)
        return x + n[None] * w.reshape(1, 1, 1, -1)


class MappingNetwork(nn.Module):
    """z (+label) → broadcast dlatents (reference :336-370)."""

    latent_dim: int = 64
    dlatent_dim: int = 512
    dense1_dim: int = 512
    num_mapping_layers: int = 8
    num_broadcast_layers: int = 12
    num_classes: int = 0
    label_usage: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z, label=None):
        x = z if self.dtype is None else z.astype(self.dtype)
        if self.label_usage:
            emb = nn.Embed(self.num_classes, self.latent_dim, name="label_embed",
                           dtype=self.dtype)(
                jnp.asarray(label, jnp.int32).reshape(-1)
            )
            x = jnp.concatenate([x, emb], axis=-1)
        x = _pixel_norm(x)
        for i in range(self.num_mapping_layers - 1):
            x = nn.leaky_relu(
                nn.Dense(self.dense1_dim, name=f"map_dense_{i}",
                         dtype=self.dtype)(x), 0.2
            )
        x = nn.leaky_relu(
            nn.Dense(self.dlatent_dim, name="map_output", dtype=self.dtype)(x),
            0.2,
        )
        return jnp.repeat(x[:, None, :], self.num_broadcast_layers, axis=1)


class _ApplyNoisePacked(nn.Module):
    """:class:`_ApplyNoise` on a lane-packed tensor (ku/nn/packed.py).

    Owns the same ``noise_weight`` (C,) param path, so param trees are
    identical whether the synthesis net runs packed or not.

    Documented deviation: the noise field is drawn directly in the packed
    layout, so for the SAME ``'noise'`` RNG key the packed and unpacked
    generators produce different (identically distributed, iid N(0,1))
    noise — seed-level trajectories differ between ``lane_packing``
    settings even though the math and parameters are identical.
    Deterministic mode (and every parameterized computation) is exact.
    """

    @nn.compact
    def __call__(self, xp, deterministic: bool = False):
        from ku.nn import packed as _pk

        c = xp.shape[-1] // _pk.PHASES
        w = self.param("noise_weight", nn.initializers.ones, (c,))
        if deterministic:
            return xp
        n = jax.random.normal(self.make_rng("noise"), xp.shape[1:], xp.dtype)
        return xp + n[None] * _pk.tile_channels(w).reshape(1, 1, 1, -1)


class SynthesisNetwork(nn.Module):
    """Broadcast dlatents → image (reference :186-328).

    ``lane_packing=True`` runs every layer at feature-map sizes
    >= ``lane_pack_min`` on a 2x2 space-to-depth packed layout
    (ku/nn/packed.py): same math, same parameter tree, ~4x less
    lane-padded HBM/VPU traffic and denser MXU matmuls for the reference
    config's narrow high-resolution channels.

    (A Pallas-fused style-block epilogue existed through round 2
    [``fused_epilogue``]; it measured at-par-to-worse than XLA's own
    elementwise fusion and the round-3 remat/restructure A/B confirmed
    the whole approach is superseded — retired, see BASELINE.md.)
    """

    resolution: int = 128
    ch_base: int = 1024
    max_ch: int = 512
    dtype: Optional[jnp.dtype] = None
    lane_packing: bool = False
    lane_pack_min: int = 64

    def _style_block(self, x, dlatents, layer_idx: int, deterministic: bool,
                     packed: bool = False):
        """noise → LReLU → pixel-norm → AdaIN(style) (reference :304-328)."""
        from ku.nn import packed as _pk

        ch = x.shape[-1] // (_pk.PHASES if packed else 1)
        style = EqualizedLRDense(
            ch * 2, name=f"style_dense_{layer_idx}", dtype=self.dtype
        )(dlatents[:, layer_idx])
        if packed:
            x = _ApplyNoisePacked(name=f"noise_{layer_idx}")(x, deterministic)
            x = nn.leaky_relu(x, 0.2)
            x = _pk.packed_pixel_norm(x)
            return _pk.packed_adain_with_style(x, style, eps=1e-8)
        x = _ApplyNoise(name=f"noise_{layer_idx}")(x, deterministic)
        x = nn.leaky_relu(x, 0.2)
        x = _pixel_norm(x)
        return AdaptiveINWithStyle(epsilon=1e-8, name=f"adain_{layer_idx}")(
            [x, style]
        )

    @nn.compact
    def __call__(self, dlatents, deterministic: bool = False):
        from ku.nn import packed as _pk

        res_log2 = int(math.log2(self.resolution))
        assert self.resolution == 2**res_log2 and self.resolution >= 4
        assert self.lane_pack_min >= 8
        nch = lambda i: cal_num_chs(i, self.ch_base, self.max_ch)
        dtype = self.dtype or dlatents.dtype

        # 4×4 start: learned constant (reference :229-257).
        const = self.param(
            "const_input", nn.initializers.ones, (1, 4, 4, nch(1))
        )
        batch = dlatents.shape[0]
        dlatents = dlatents.astype(dtype)
        x = jnp.tile(const.astype(dtype), (batch, 1, 1, 1))
        x = self._style_block(x, dlatents, 0, deterministic)
        x = EqualizedLRConv2D(nch(1), 3, padding="same", name="conv_4x4",
                              dtype=self.dtype)(x)
        x = self._style_block(x, dlatents, 1, deterministic)

        packed = False
        for res in range(3, res_log2 + 1):
            layer_idx = res * 2 - 4
            out_size = 2**res
            want = self.lane_packing and out_size >= self.lane_pack_min
            if out_size >= 128:
                # Fused upsample+conv for large maps (reference :268-271).
                x = FusedEqualizedLRConv2DTranspose(
                    nch(res - 1), 3, strides=2, padding="same",
                    name=f"up_fused_{res}", dtype=self.dtype,
                    lane_packed=packed,
                )(x)
                if want and not packed:
                    x, packed = _pk.space_to_depth(x), True
            else:
                if packed:  # bilinear resize runs unpacked
                    x, packed = _pk.depth_to_space(x), False
                x = jax.image.resize(
                    x, (x.shape[0], out_size, out_size, x.shape[-1]),
                    method="bilinear",
                )
                if want:
                    x, packed = _pk.space_to_depth(x), True
                x = EqualizedLRConv2D(
                    nch(res - 1), 3, padding="same", name=f"up_conv_{res}",
                    dtype=self.dtype, lane_packed=packed,
                )(x)
            x = BlurDepthwiseConv2D(padding="same", name=f"blur_{res}",
                                    lane_packed=packed)(x)
            x = self._style_block(x, dlatents, layer_idx, deterministic,
                                  packed)
            x = EqualizedLRConv2D(
                nch(res - 1), 3, padding="same", name=f"conv_{res}",
                dtype=self.dtype, lane_packed=packed,
            )(x)
            x = self._style_block(x, dlatents, layer_idx + 1, deterministic,
                                  packed)

        # to-RGB (reference :289-293) — the fixed tail for progressive
        # mode; computed and returned in f32 for a stable tanh output.
        out = EqualizedLRConv2D(
            3, 1, activation="tanh", padding="same", name="to_rgb",
            dtype=jnp.float32, lane_packed=packed,
        )(x.astype(jnp.float32))
        return _pk.depth_to_space(out) if packed else out


class StyleGANGenerator(nn.Module):
    """Full generator: mapping ×2 → style mixing → truncation → synthesis
    (reference ``_create_generator``, :186-302).

    Call: ``gen.apply(vars, (z1, label, z2))`` (label_usage) or
    ``(z1, z2)``; needs rngs ``{'noise', 'style'}`` when not deterministic
    and mutable ``['batch_stats']`` for the truncation moving average.
    """

    resolution: int = 128
    ch_base: int = 1024
    max_ch: int = 512
    latent_dim: int = 64
    dlatent_dim: int = 512
    dense1_dim: int = 512
    num_mapping_layers: int = 8
    num_classes: int = 0
    label_usage: bool = True
    mixing_prob: Optional[float] = 0.9
    trunc_psi: float = 0.7
    trunc_cutoff: Optional[int] = 8
    trunc_momentum: float = 0.99
    dtype: Optional[jnp.dtype] = None  # bf16 compute, f32 params/output
    lane_packing: bool = False
    lane_pack_min: int = 64

    @nn.compact
    def __call__(self, inputs, deterministic: bool = False):
        if self.label_usage:
            z1, label, z2 = inputs
        else:
            z1, z2 = inputs
            label = None
        num_layers = int(math.log2(self.resolution)) * 2 - 2
        mapping = MappingNetwork(
            latent_dim=self.latent_dim,
            dlatent_dim=self.dlatent_dim,
            dense1_dim=self.dense1_dim,
            num_mapping_layers=self.num_mapping_layers,
            num_broadcast_layers=num_layers,
            num_classes=self.num_classes,
            label_usage=self.label_usage,
            dtype=self.dtype,
            name="map",
        )
        # One mapping pass over [z1; z2] instead of two half-size passes —
        # per-sample math is identical and every mapping matmul runs at 2B
        # rows (the net is M-dim-starved at the reference batch of 12).
        batch_n = z1.shape[0]
        zz = jnp.concatenate([z1, z2], axis=0)
        ll = None if label is None else jnp.concatenate(
            [jnp.asarray(label)] * 2, axis=0
        )
        dd = mapping(zz, ll)
        d1, d2 = dd[:batch_n], dd[batch_n:]
        d = StyleMixingRegularization(mixing_prob=self.mixing_prob,
                                      name="style_mixing")(
            [d1, d2], deterministic=deterministic
        )
        d = TruncationTrick(
            psi=self.trunc_psi, cutoff=self.trunc_cutoff,
            momentum=self.trunc_momentum, name="truncation",
        )(d, deterministic=deterministic)
        return SynthesisNetwork(
            resolution=self.resolution, ch_base=self.ch_base,
            max_ch=self.max_ch, dtype=self.dtype,
            lane_packing=self.lane_packing,
            lane_pack_min=self.lane_pack_min, name="synthesis",
        )(d, deterministic=deterministic)


class StyleGANDiscriminator(nn.Module):
    """Discriminator pyramid (reference ``_create_discriminator``,
    :372-435). Call with ``(images, labels)`` when ``label_usage``."""

    resolution: int = 128
    ch_base: int = 1024
    max_ch: int = 512
    dropout_rate: float = 0.0
    label_usage: bool = True
    dtype: Optional[jnp.dtype] = None
    lane_packing: bool = False
    lane_pack_min: int = 64

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        from ku.nn import packed as _pk

        if self.label_usage:
            images, labels = inputs
        else:
            images, labels = inputs, None
        res_log2 = int(math.log2(self.resolution))
        assert self.lane_pack_min >= 8
        nch = lambda i: cal_num_chs(i, self.ch_base, self.max_ch)
        if self.dtype is not None:
            images = images.astype(self.dtype)

        packed = self.lane_packing and self.resolution >= self.lane_pack_min
        if packed:
            images = _pk.space_to_depth(images)
        x = EqualizedLRConv2D(
            nch(res_log2 - 1), 1, padding="same", name="from_rgb",
            dtype=self.dtype, lane_packed=packed,
        )(images)
        x = nn.leaky_relu(x, 0.2)

        for res in range(res_log2, 2, -1):
            cur_size = 2**res
            x = EqualizedLRConv2D(
                nch(res - 1), 3, padding="same", name=f"conv_{res}_a",
                dtype=self.dtype, lane_packed=packed,
            )(x)
            x = nn.leaky_relu(x, 0.2)
            x = BlurDepthwiseConv2D(padding="same", name=f"blur_{res}",
                                    lane_packed=packed)(x)
            if cur_size * 2 >= 128:
                # Reference :398-401 applies the fused conv with stride 1,
                # which never downsamples large maps (latent bug); the
                # intended NVIDIA op is the fused blur+downscale conv —
                # stride 2 here.
                x = FusedEqualizedLRConv2D(
                    nch(res - 2), 3, strides=2, padding="same",
                    name=f"conv_{res}_b", dtype=self.dtype,
                    lane_packed=packed,
                )(x)
            else:
                x = EqualizedLRConv2D(
                    nch(res - 2), 3, padding="same", name=f"conv_{res}_b",
                    dtype=self.dtype, lane_packed=packed,
                )(x)
                if packed:
                    x = _pk.packed_avg_pool2x(x)
                    packed = False
                else:
                    x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = nn.leaky_relu(x, 0.2)
            new_size = cur_size // 2
            keep = self.lane_packing and new_size >= self.lane_pack_min
            if packed and not keep:
                x, packed = _pk.depth_to_space(x), False
            elif keep and not packed:
                x, packed = _pk.space_to_depth(x), True

        x = MinibatchStddevConcat(name="mbstd")(x)
        x = EqualizedLRConv2D(nch(1), 3, padding="same", name="conv_4x4",
                              dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        x = EqualizedLRDense(nch(0), name="dense_1", dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        if self.dropout_rate:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        # Final logit in f32 for loss stability.
        x = EqualizedLRDense(1, name="dense_out", dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        if self.label_usage:
            # Label projection (reference :426-430).
            x = jnp.sum(
                x * jnp.asarray(labels, x.dtype).reshape(-1, 1), axis=1,
                keepdims=True,
            )
        else:
            x = jnp.sum(x, axis=1, keepdims=True)
        return x
