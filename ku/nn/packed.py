"""Space-to-depth lane repacking for narrow-channel, high-resolution convs.

Motivation (BASELINE.md speed-of-light analysis): the reference StyleGAN
config runs 16-64 channels at 64-128 px. On TPU the minor (channel) dim is
padded to the 128-lane vector width, so every elementwise op and every conv
on a (B, 128, 128, 16) bf16 tensor moves 8x more HBM/VPU traffic than the
data needs, and conv matmuls fill <=50% of the MXU lanes. Packing a 2x2
pixel neighbourhood into channels — (B, H, W, C) -> (B, H/2, W/2, 4C) —
cuts the padded traffic ~4x and quadruples conv lane fill, while computing
the *same function* (same parameters, same math, float reassociation only).

This module provides exact packed equivalents for every op in the StyleGAN
>=64 px section (reference examples/style_based_gan/style_based_gan.py
:223-328 generator, :372-435 discriminator):

- ``space_to_depth`` / ``depth_to_space``: plain 2x2 packing, phase-major
  channel order ``packed_c = (ph*2 + pw)*C + c`` (phase = pixel position in
  the 2x2 block). Phase-major keeps per-original-channel ops a reshape away.
- ``packed_conv2d``: a k x k stride-s SAME conv becomes a packed conv whose
  kernel is a static scatter of the original (kh, kw, C, F) kernel into
  (Dh, Dw, 4C, 4F) — parameters keep their original shape, so checkpoints
  are layout-independent. Derivation: original row m read by packed output
  (i', q) at tap dh is ``m = s*(2i' + q) + dh - pt``; writing ``m = 2j + p``
  with ``j = s*i' + d`` gives ``2d + p = s*q + dh - pt`` — each (q, dh)
  maps to exactly one (p, d), the rest of the packed kernel is zero.
- ``packed_depthwise_conv2d``: depthwise kernels are embedded block-diagonal
  and routed through the same transform (a dense 4C x 4C packed conv beats
  an unpacked VPU depthwise on traffic at these shapes).
- ``packed_conv_transpose2x``: stride-2 transposed conv (the fused StyleGAN
  upsample) via its per-output-phase decomposition — a 3x3 stride-1 packed
  conv emitting 4F phase channels (= the 2x-resolution packed layout after
  an outer depth-to-space on the input phases).
- packed pixel-norm / AdaIN / noise helpers: per-original-pixel reductions
  reshape to (..., 4, C) and reduce only the C axis; per-channel stats
  reduce spatial axes *and* the phase axis.

All helpers are pure jnp/lax — JAX autodiff differentiates through the
kernel scatter, so gradients land on the original parameter shapes.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

P = 2  # packing factor per spatial axis (2x2 -> 4 phases)
PHASES = P * P


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major channel order."""
    b, h, w, c = x.shape
    assert h % P == 0 and w % P == 0, (h, w)
    x = x.reshape(b, h // P, P, w // P, P, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, H', W', ph, pw, C
    return x.reshape(b, h // P, w // P, PHASES * c)


def depth_to_space(xp: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, hp, wp, c4 = xp.shape
    c = c4 // PHASES
    x = xp.reshape(b, hp, wp, P, P, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, H', ph, W', pw, C
    return x.reshape(b, hp * P, wp * P, c)


def tile_channels(v: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a per-original-channel vector (C,) to packed channels (4C,)."""
    return jnp.tile(v, (PHASES,))


def _axis_taps(k: int, stride: int, pad_lo: int):
    """Tap map for one spatial axis.

    Returns (taps, d_min, D) where taps is a list of (q, dk, p, d):
    output phase q reading original tap dk lands on packed input phase p at
    packed spatial offset d.
    """
    taps = []
    ds = []
    for q in range(P):
        for dk in range(k):
            v = stride * q + dk - pad_lo
            p = v % P
            d = (v - p) // P
            taps.append((q, dk, p, d))
            ds.append(d)
    d_min, d_max = min(ds), max(ds)
    return taps, d_min, d_max - d_min + 1


def _axis_scatter(k: int, stride: int, pad_lo: int) -> Tuple[np.ndarray, int, int]:
    """0/1 scatter tensor S[dk, D, p, q] for one axis (numpy constant)."""
    taps, d_min, D = _axis_taps(k, stride, pad_lo)
    s = np.zeros((k, D, P, P), np.float32)
    for q, dk, p, d in taps:
        s[dk, d - d_min, p, q] = 1.0
    return s, d_min, D


def _same_pad_lo(k: int, stride: int) -> int:
    """Low-side padding of XLA SAME for size-divisible inputs."""
    pad_total = max(k - stride, 0)
    return pad_total // 2


def pack_conv2d_kernel(kernel: jnp.ndarray, stride: int = 1):
    """Scatter an original (kh, kw, C, F) kernel to packed (Dh, Dw, 4C, 4F).

    Returns (packed_kernel, (pad_h, pad_w)) where pads are the packed-input
    (lo, hi) paddings replacing the original SAME padding.
    """
    kh, kw, c, f = kernel.shape
    pt = _same_pad_lo(kh, stride)
    pl = _same_pad_lo(kw, stride)
    s_h, dmin_h, d_h = _axis_scatter(kh, stride, pt)
    s_w, dmin_w, d_w = _axis_scatter(kw, stride, pl)
    # Wp[Dh, Dw, ph, pw, c, qh, qw, f]
    wp = jnp.einsum(
        "hHpq,wWrs,hwcf->HWprcqsf",
        jnp.asarray(s_h, kernel.dtype),
        jnp.asarray(s_w, kernel.dtype),
        kernel,
    )
    wp = wp.reshape(d_h, d_w, PHASES * c, PHASES * f)
    return wp, ((-dmin_h, d_h), (-dmin_w, d_w))


def _packed_pad(pads, hp: int, stride: int, out_hp: int, d: int) -> Tuple[int, int]:
    lo = pads[0]
    hi = (out_hp - 1) * stride + d - hp - lo
    # A negative hi would mean the tap layout yields MORE rows than out_hp;
    # unreachable for in-tree kernel shapes — fail fast rather than clamp.
    assert hi >= 0, (pads, hp, stride, out_hp, d)
    return lo, hi


def packed_conv2d(
    xp: jnp.ndarray, kernel: jnp.ndarray, stride: int = 1
) -> jnp.ndarray:
    """SAME conv on packed input: conv2d(x, kernel, stride, SAME) packed.

    ``kernel`` is the ORIGINAL (kh, kw, C, F) kernel; xp is the packed input
    (B, H/2, W/2, 4C). Output is packed (B, H/(2s), W/(2s), 4F).
    """
    b, hp, wp_, c4 = xp.shape
    assert c4 == PHASES * kernel.shape[2], (xp.shape, kernel.shape)
    wp, (pads_h, pads_w) = pack_conv2d_kernel(kernel, stride)
    d_h, d_w = wp.shape[0], wp.shape[1]
    out_hp, out_wp = hp // stride, wp_ // stride
    ph = _packed_pad(pads_h, hp, stride, out_hp, d_h)
    pw = _packed_pad(pads_w, wp_, stride, out_wp, d_w)
    return lax.conv_general_dilated(
        xp,
        wp,
        window_strides=(stride, stride),
        padding=(ph, pw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def packed_depthwise_conv2d(xp: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """SAME depthwise conv on packed input.

    ``kernel``: original Keras-layout (kh, kw, C, 1). Embedded block-diagonal
    into a dense (kh, kw, C, C) kernel, then packed. Depth multiplier 1 only
    (the StyleGAN blur path).
    """
    kh, kw, c, mult = kernel.shape
    assert mult == 1, "packed depthwise supports depth_multiplier=1"
    eye = jnp.asarray(np.eye(c, dtype=np.float32), kernel.dtype)
    dense = kernel * eye[None, None]  # (kh,kw,C,1)*(C,C) -> (kh,kw,C,C) diag
    return packed_conv2d(xp, dense, stride=1)


def _transpose2x_phase_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """Per-output-phase kernel for a stride-2 SAME transposed conv.

    ``lax.conv_transpose(x, K(4,4,C,F), strides=2, padding='SAME')`` computes
    ``out[r] = sum_dh x[(r + dh - ptt)/2] * K[dh]`` over integral indices,
    with ptt = 2 (verified against the lax oracle in tests). Output phase
    q = r mod 2 selects taps dh = q (mod 2); tap offset t = (q + dh - ptt)/2
    spans {-1, 0, 1} -> a 3x3 stride-1 SAME conv over the input grid whose
    output channels are the 4 output phases x F.
    """
    kh, kw, c, f = kernel.shape
    assert kh == 4 and kw == 4, "transpose2x expects the fused 4x4 kernel"
    ptt = 2

    def axis_scatter():
        s = np.zeros((4, 3, P), np.float32)  # [dh, t - tmin, q]
        for q in range(P):
            for dh in range(4):
                v = q + dh - ptt
                if v % 2:
                    continue
                t = v // 2
                s[dh, t + 1, q] = 1.0
        return s

    s = jnp.asarray(axis_scatter(), kernel.dtype)
    # Kt[t_h, t_w, c, qh, qw, f]
    kt = jnp.einsum("hHq,wWs,hwcf->HWcqsf", s, s, kernel)
    return kt.reshape(3, 3, c, PHASES * f)


def packed_conv_transpose2x(xp: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 SAME transposed conv on packed input -> packed 2x output.

    Equivalent to ``space_to_depth(lax.conv_transpose(depth_to_space(xp),
    kernel, strides=(2,2), padding='SAME'))`` without ever materializing the
    unpacked tensors. xp: (B, H', W', 4C) -> (B, 2H', 2W', 4F).
    """
    kt = _transpose2x_phase_kernel(kernel)  # (3,3,C,4F)
    y = packed_conv2d(xp, kt, stride=1)  # (B, H', W', 4*(4F))
    # y's channels are (input-phase, output-phase, F); the input phases are
    # one resolution level up -> expand them back to spatial.
    b, hp, wp_, _ = y.shape
    f4 = kt.shape[-1]
    y = y.reshape(b, hp, wp_, P, P, f4)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp * P, wp_ * P, f4)
    return y


# -- packed elementwise / normalization helpers ------------------------------
#
# These deliberately avoid reshaping the big activation to (..., PHASES, C):
# on TPU that view re-tiles the tensor with a 16-wide minor dim (padded back
# to 128 lanes) — a full-tensor relayout that costs more than the op itself.
# Per-phase-group reductions instead go through a tiny 0/1 block matrix on
# the MXU (pixel norm) or through lane-aligned spatial moments followed by a
# (B, 4C) phase combine (instance stats).


def _phase_group_matrix(c4: int, dtype) -> jnp.ndarray:
    """(4C, 4C) 0/1 matrix; x @ M sums the C channels within each phase.

    Block-diagonal ones: output p*C+c receives sum_d x[p*C+d] — the
    per-original-pixel (= per-phase) channel sum pixel norm needs.
    """
    c = c4 // PHASES
    blocks = np.kron(np.eye(PHASES, dtype=np.float32), np.ones((c, c), np.float32))
    return jnp.asarray(blocks, dtype)


def packed_pixel_norm(xp: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Per-original-pixel feature norm: reduce the C axis only, not phases."""
    c = xp.shape[-1] // PHASES
    m = _phase_group_matrix(xp.shape[-1], xp.dtype)
    sumsq = lax.dot_general(
        jnp.square(xp), m,
        dimension_numbers=(((xp.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    denom = lax.rsqrt(sumsq / c + eps).astype(xp.dtype)
    return xp * denom


def packed_instance_stats(xp: jnp.ndarray):
    """Per-(sample, original-channel) mean/std over spatial axes + phases.

    Moment form (std = sqrt(E[x^2] - E[x]^2), algebraically equal to the
    unpacked ``jnp.std``): the spatial reductions stay in the lane-aligned
    (B, 4C) layout; only the tiny (B, 4, C) combine is reshaped.
    """
    b, _, _, c4 = xp.shape
    c = c4 // PHASES
    x32 = xp.astype(jnp.float32)
    m1 = jnp.mean(x32, axis=(1, 2)).reshape(b, PHASES, c).mean(axis=1)
    m2 = jnp.mean(jnp.square(x32), axis=(1, 2)).reshape(b, PHASES, c).mean(
        axis=1
    )
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    return m1.astype(xp.dtype), jnp.sqrt(var).astype(xp.dtype)


def packed_adain_with_style(
    xp: jnp.ndarray, style: jnp.ndarray, eps: float = 1e-7
) -> jnp.ndarray:
    """StyleGAN AdaIN on a packed tensor (ku/nn/normalization.py:49-68)."""
    c = xp.shape[-1] // PHASES
    assert style.ndim == 2 and style.shape[-1] == 2 * c
    mean, std = packed_instance_stats(xp)
    s = style.reshape(-1, 2, c)
    scale = tile_channels_batched(s[:, 0] + 1.0)
    bias = tile_channels_batched(s[:, 1])
    mean_t = tile_channels_batched(mean)
    std_t = tile_channels_batched(std) + eps
    return scale[:, None, None] * (
        (xp - mean_t[:, None, None]) / std_t[:, None, None]
    ) + bias[:, None, None]


def tile_channels_batched(v: jnp.ndarray) -> jnp.ndarray:
    """(B, C) per-channel vector -> (B, 4C) packed channels (phase-major)."""
    return jnp.tile(v, (1, PHASES))


def packed_avg_pool2x(xp: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pool on a packed tensor == mean over phases.

    Returns the UNPACKED half-resolution result (B, H', W', C) — pooling
    by the packing factor consumes the phase dimension entirely.
    """
    b, hp, wp_, c4 = xp.shape
    c = c4 // PHASES
    return xp.reshape(b, hp, wp_, PHASES, c).mean(axis=3)
