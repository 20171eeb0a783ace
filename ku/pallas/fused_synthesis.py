"""Fused StyleGAN style-block epilogue kernel.

The synthesis network applies, after every conv:
``AdaIN(pixel_norm(leaky_relu(x + noise·w)), style)`` (reference
examples/style_based_gan/style_based_gan.py:304-328 — noise add, LReLU,
pixel-norm, AdaIN). Unfused, that chain makes ~4 HBM round trips of the
activation per block (×12 blocks ×fwd/bwd). This kernel computes the whole
epilogue in one VMEM pass per batch item:

- pixel-norm: rsqrt(mean over C) per pixel,
- instance stats: mean/std over (H, W) per channel,
- modulation: ``(s0+1)·(t−μ)/σ + s1``.

Backward is a custom-VJP recompute through the identical XLA composition
(same trade as flash attention: FLOPs for memory traffic).

Measured on v5e at the reference 128px config (BASELINE.md): the fused
path is ~par for inference but SLOWER for training than plain XLA — XLA's
elementwise fusion already covers this chain and the recompute backward
dominates. It therefore ships default-OFF (``SynthesisNetwork(
fused_epilogue=True)`` to opt in); kept as the validated kernel substrate
for a future fully-custom backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _epilogue_xla(x, noise, w_noise, style, eps=1e-8):
    """Reference composition in plain XLA (oracle + backward path)."""
    t = x + noise[None] * w_noise.reshape(1, 1, 1, -1)
    t = jax.nn.leaky_relu(t, 0.2)
    t = t * jax.lax.rsqrt(jnp.mean(jnp.square(t), axis=-1, keepdims=True) + eps)
    c_mean = jnp.mean(t, axis=(1, 2), keepdims=True)
    c_std = jnp.std(t, axis=(1, 2), keepdims=True) + eps
    s = style.reshape(-1, 2, 1, 1, x.shape[-1])
    return (s[:, 0] + 1.0) * ((t - c_mean) / c_std) + s[:, 1]


def _kernel(x_ref, n_ref, w_ref, s_ref, o_ref, *, eps):
    x = x_ref[0].astype(jnp.float32)          # (H, W, C)
    n = n_ref[:].astype(jnp.float32)          # (H, W, C)
    w = w_ref[:].astype(jnp.float32)          # (1, C)
    # Style kept as the full (B, 2C) block (batch rows aren't 8-tileable);
    # select this program's row dynamically.
    s = s_ref[pl.ds(pl.program_id(0), 1), :].astype(jnp.float32)  # (1, 2C)
    h, wd, c = x.shape

    t = x + n * w.reshape(1, 1, c)
    t = jnp.where(t >= 0, t, 0.2 * t)         # leaky_relu(0.2)
    t = t * jax.lax.rsqrt(jnp.mean(jnp.square(t), axis=-1, keepdims=True) + eps)

    hw = float(h * wd)
    mean = jnp.sum(t, axis=(0, 1), keepdims=True) / hw
    var = jnp.sum(jnp.square(t - mean), axis=(0, 1), keepdims=True) / hw
    std = jnp.sqrt(var) + eps

    s0 = s[0, :c].reshape(1, 1, c)
    s1 = s[0, c:].reshape(1, 1, c)
    o_ref[0] = ((s0 + 1.0) * ((t - mean) / std) + s1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_forward(x, noise, w_noise, style, interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    out_dtype = x.dtype
    # Kernel operates in f32 (Mosaic chokes on bf16 dynamic slices here;
    # the math is f32 internally anyway).
    x = x.astype(jnp.float32)
    noise = noise.astype(jnp.float32)
    w_noise = w_noise.astype(jnp.float32)
    style = style.astype(jnp.float32)
    # Style (B, 2C) packs [scales | biases] contiguously (the reference's
    # reshape(-1, 2, 1, 1, C) layout) — sliceable directly in the kernel.
    return pl.pallas_call(
        functools.partial(_kernel, eps=1e-8),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 2 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, noise, w_noise.reshape(1, c), style).astype(out_dtype)


@jax.custom_vjp
def fused_style_epilogue(x, noise, w_noise, style):
    """Fused noise+LReLU+pixel-norm+AdaIN. x: (B,H,W,C), noise: (H,W,C),
    w_noise: (C,), style: (B, 2C) packed as the reference's
    ``reshape(-1, 2, 1, 1, C)`` layout.

    The Pallas kernel runs for channel counts ≥128 (full MXU/VPU lanes);
    narrower high-resolution blocks fall back to XLA, which fuses the
    elementwise chain itself (and Mosaic currently miscompiles large
    spatial × narrow channel blocks)."""
    if jax.default_backend() == "tpu" and x.shape[-1] % 128 == 0:
        return _fused_forward(x, noise, w_noise, style)
    return _epilogue_xla(x, noise, w_noise, style)


def _fwd(x, noise, w_noise, style):
    return fused_style_epilogue(x, noise, w_noise, style), (
        x, noise, w_noise, style,
    )


def _bwd(res, g):
    x, noise, w_noise, style = res
    _, vjp = jax.vjp(_epilogue_xla, x, noise, w_noise, style)
    return vjp(g)


fused_style_epilogue.defvjp(_fwd, _bwd)
