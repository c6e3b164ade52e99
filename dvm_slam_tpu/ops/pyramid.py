"""Image pyramid + separable Gaussian blur (XLA convolutions).

Replaces `ORBextractor::ComputePyramid` (`orb_slam3/src/ORBextractor.cc:957`)
and the pre-descriptor `cv::GaussianBlur(7x7, sigma=2)` of
`ORBextractor::operator()` (`ORBextractor.cc:876`). All shapes are static
(computed from the config at trace time) so each level compiles once.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def level_scales(n_levels: int, scale_factor: float):
    """Per-level scale factors (level 0 = 1.0), like `mvScaleFactor`."""
    return [scale_factor ** i for i in range(n_levels)]


def level_shapes(h: int, w: int, n_levels: int, scale_factor: float):
    """Static (h, w) of each pyramid level, matching `ComputePyramid`'s
    `cvRound(W/scale)` sizing."""
    return [
        (int(round(h / s)), int(round(w / s)))
        for s in level_scales(n_levels, scale_factor)
    ]


def build_pyramid(img, n_levels: int, scale_factor: float):
    """Grayscale image [H,W] float32 -> list of n_levels arrays.

    Each level is resized from the previous one with bilinear interpolation
    (the reference uses cv::resize INTER_LINEAR, `ORBextractor.cc:969`).
    """
    h, w = img.shape[-2], img.shape[-1]
    shapes = level_shapes(h, w, n_levels, scale_factor)
    levels = [img]
    # bilinear resize is a pair of interpolation matmuls inside
    # jax.image.resize; image data tolerates bf16 inputs (<1 greylevel error)
    # and avoids the 6-pass f32-highest matmul path
    with jax.default_matmul_precision("bfloat16"):
        for lv in range(1, n_levels):
            prev = levels[-1]
            levels.append(
                jax.image.resize(prev, prev.shape[:-2] + shapes[lv], method="linear")
            )
    return levels


def _gaussian_kernel1d(ksize: int, sigma: float):
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur with replicate padding, [...,H,W].

    Implemented as explicit shifted multiply-adds (2*ksize fused VPU ops)
    rather than conv_general_dilated: small fixed kernels lower to slow
    multi-pass convolutions under f32-highest precision, while shift+FMA is
    exact f32 and ~10x faster on TPU."""
    k = _gaussian_kernel1d(ksize, sigma)
    r = ksize // 2
    h, w = img.shape[-2], img.shape[-1]
    xp = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(r, r), (0, 0)], mode="edge")
    out = jnp.zeros_like(img)
    for i in range(ksize):
        out = out + float(k[i]) * jax.lax.slice_in_dim(xp, i, i + h, axis=-2)
    xp = jnp.pad(out, [(0, 0)] * (img.ndim - 2) + [(0, 0), (r, r)], mode="edge")
    out = jnp.zeros_like(img)
    for i in range(ksize):
        out = out + float(k[i]) * jax.lax.slice_in_dim(xp, i, i + w, axis=-1)
    return out
