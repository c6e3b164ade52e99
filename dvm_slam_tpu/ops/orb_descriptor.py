"""Keypoint orientation (intensity centroid) + steered rBRIEF descriptors.

Re-design of the tail of `ORBextractor::operator()`
(`orb_slam3/src/ORBextractor.cc:876`): `IC_Angle` / `computeOrientation`
(intensity-centroid over a radius-15 circular patch) and `computeOrbDescriptor`
(256 steered binary tests on the Gaussian-blurred level image).

The sampling pattern is NOT the reference's learned `bit_pattern_31_` table —
copying it is neither allowed nor needed (this framework trains its own
vocabulary, so descriptors only have to be self-consistent and
discriminative). We generate the canonical BRIEF pattern instead: 256 i.i.d.
Gaussian test pairs, sigma = patch/5, clipped to stay inside the rotated
31x31 patch (Calonder et al., BRIEF; Rublee et al., ORB §4.2), from a fixed
seed so every agent/process produces identical descriptors.

Descriptors are produced UNPACKED: [N, 256] uint8 in {0,1}. That is the
TPU-native layout — Hamming matching and BoW scoring are int8 popcount
matmuls on the MXU (see ops/matching.py); packing to 32 bytes happens only in
the wire codec.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PATCH_SIZE = 31          # reference ORBextractor.cc:71
HALF_PATCH = 15          # reference ORBextractor.cc:72
DESC_BITS = 256

_PATTERN_SEED = 20240131  # fixed framework-wide seed


def _make_pattern():
    """[256, 4] int32 (x1, y1, x2, y2), Gaussian sigma=patch/5, |coord|<=13
    so rotated integer samples stay within the 31x31 patch."""
    rs = np.random.RandomState(_PATTERN_SEED)
    sigma = PATCH_SIZE / 5.0
    pts = np.clip(np.round(rs.randn(DESC_BITS, 4) * sigma), -13, 13).astype(np.int32)
    return pts


PATTERN = _make_pattern()  # numpy constant, baked into traces


def _circular_mask_rows():
    """Boolean [31,31] circular mask of radius HALF_PATCH (behavioral
    equivalent of the reference's per-row `umax` Bresenham bounds)."""
    r = HALF_PATCH
    y, x = np.mgrid[-r:r + 1, -r:r + 1]
    return (x * x + y * y) <= r * r + 1


_CIRC_MASK = _circular_mask_rows()


def _gather_patches(img, xy, size: int):
    """Extract [N, size, size] patches centered on integer keypoints.

    xy: [N,2] float (x=col, y=row). Indices are clamped to the image so
    gathers are always in-bounds (keypoints already live >= BORDER from the
    edge, so clamping never fires for valid slots)."""
    h, w = img.shape
    half = size // 2
    cx = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), half, w - half - 1)
    cy = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), half, h - half - 1)
    dy = jnp.arange(-half, half + 1)
    dx = jnp.arange(-half, half + 1)
    rows = cy[:, None, None] + dy[None, :, None]   # [N,size,1]
    cols = cx[:, None, None] + dx[None, None, :]   # [N,1,size]
    flat = img.reshape(-1)
    idx = rows * w + cols                           # [N,size,size]
    return flat[idx.reshape(-1)].reshape(xy.shape[0], size, size)


@jax.jit
def moments(img, xy):
    """Intensity-centroid moments (m01, m10) per keypoint (`IC_Angle`).

    img: raw (unblurred) pyramid level [H,W]; xy: [N,2] level coords.
    """
    patches = _gather_patches(img, xy, PATCH_SIZE)  # [N,31,31]
    mask = jnp.asarray(_CIRC_MASK, img.dtype)
    r = HALF_PATCH
    ys = jnp.arange(-r, r + 1, dtype=img.dtype)[None, :, None]
    xs = jnp.arange(-r, r + 1, dtype=img.dtype)[None, None, :]
    pm = patches * mask[None]
    m01 = jnp.sum(pm * ys, axis=(1, 2))
    m10 = jnp.sum(pm * xs, axis=(1, 2))
    return m01, m10


@jax.jit
def orientations(img, xy):
    """Intensity-centroid angle (radians) per keypoint, `IC_Angle` semantics."""
    m01, m10 = moments(img, xy)
    return jnp.arctan2(m01, m10)


def _dir_from_moments(m01, m10):
    """Unit steering direction (ca, sa) straight from the moments — the
    algebraic form of (cos(atan2), sin(atan2)). Both descriptor paths
    (this module and ops/pallas_orb.py) use EXACTLY this formulation so
    the rotated-offset rounding is bit-identical across backends (an
    atan2->cos/sin round trip differs between XLA and Mosaic transcendental
    implementations and flips near-tie roundings)."""
    rlen = jnp.sqrt(m01 * m01 + m10 * m10)
    safe = rlen > 1e-9
    inv = jnp.where(safe, 1.0 / jnp.where(safe, rlen, 1.0), 0.0)
    return jnp.where(safe, m10 * inv, 1.0), jnp.where(safe, m01 * inv, 0.0)


@jax.jit
def descriptors(img_blur, xy, angle, ca=None, sa=None):
    """Steered rBRIEF: [N,256] uint8 bits in {0,1}.

    img_blur: Gaussian-blurred pyramid level [H,W]; xy [N,2] level coords;
    angle [N] radians. Pattern offsets are rotated by the keypoint angle and
    rounded to integers, exactly the reference's steering discretization
    (`computeOrbDescriptor`'s `GET_VALUE`). Pass (ca, sa) from
    `_dir_from_moments` for bit-parity with the Pallas kernel.
    """
    h, w = img_blur.shape
    if ca is None:
        ca, sa = jnp.cos(angle), jnp.sin(angle)  # [N]
    pat = jnp.asarray(PATTERN, img_blur.dtype)  # [256,4]
    px1, py1, px2, py2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]

    def rot(px, py):
        # row offset = round(x sin + y cos), col offset = round(x cos - y sin)
        rx = jnp.round(px[None, :] * ca[:, None] - py[None, :] * sa[:, None])
        ry = jnp.round(px[None, :] * sa[:, None] + py[None, :] * ca[:, None])
        return rx.astype(jnp.int32), ry.astype(jnp.int32)  # [N,256]

    cx = jnp.round(xy[:, 0]).astype(jnp.int32)[:, None]
    cy = jnp.round(xy[:, 1]).astype(jnp.int32)[:, None]
    flat = img_blur.reshape(-1)

    def sample(px, py):
        rx, ry = rot(px, py)
        c = jnp.clip(cx + rx, 0, w - 1)
        r = jnp.clip(cy + ry, 0, h - 1)
        return flat[(r * w + c).reshape(-1)].reshape(xy.shape[0], DESC_BITS)

    v1 = sample(px1, py1)
    v2 = sample(px2, py2)
    return (v1 < v2).astype(jnp.uint8)


@jax.jit
def orient_and_describe(img_raw, img_blur, xy):
    """XLA sibling of `pallas_orb.orient_and_describe`: moments computed
    once, steering direction algebraic — bit-parity contract with the
    kernel (asserted on real TPU by bench.py)."""
    m01, m10 = moments(img_raw, xy)
    ca, sa = _dir_from_moments(m01, m10)
    ang = jnp.arctan2(m01, m10)
    return ang, descriptors(img_blur, xy, ang, ca=ca, sa=sa)


def pack_descriptors(bits):
    """[N,256] {0,1} -> [N,32] uint8 (wire/serialization layout)."""
    b = bits.reshape(bits.shape[0], 32, 8)
    weights = jnp.asarray(1 << np.arange(8, dtype=np.uint32), jnp.uint32)
    return jnp.sum(b.astype(jnp.uint32) * weights, axis=-1).astype(jnp.uint8)


def unpack_descriptors(packed):
    """[N,32] uint8 -> [N,256] {0,1} uint8."""
    bits = (packed[:, :, None].astype(jnp.uint32) >> np.arange(8, dtype=np.uint32)) & 1
    return bits.reshape(packed.shape[0], 256).astype(jnp.uint8)
