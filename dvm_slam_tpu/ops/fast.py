"""FAST-9/16 corner detection + grid-bucketed spatially-uniform top-k NMS.

TPU-native re-design of `ORBextractor::ComputeKeyPointsOctTree` +
`DistributeOctTree` (`orb_slam3/src/ORBextractor.cc:612-692,419`):

* The segment test is evaluated densely for the *whole level at both
  thresholds in one fused pass* (bitmask trick on the 16-pixel Bresenham
  ring). The reference's per-35px-cell "retry with the low threshold if the
  cell is empty" fallback (`ORBextractor.cc:653-669`) becomes a per-cell
  select between the two dense response maps — identical behavior, no second
  pass, no data-dependent control flow.
* The sequential quadtree NMS is replaced by 3x3 local-max suppression plus
  grid-bucketed ranked top-k: every cell ranks its corners by score, and the
  global budget is filled breadth-first across cells (all rank-0 corners
  before any rank-1). This preserves the quadtree's spatial-uniformity
  contract (SURVEY.md §7 "behavior, not implementation, must match") while
  being a single argsort.

Corner score is the ring SAD score (sum over the contiguous arc of
|p_i - center| - t), the standard vectorized-FAST surrogate for OpenCV's
max-threshold score; only relative ordering inside a cell matters for NMS.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# 16-pixel Bresenham circle of radius 3, (dx, dy), clockwise from 12 o'clock.
RING_OFFSETS = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)  # (dx=col offset, dy=row offset)

ARC_LEN = 9  # FAST-9/16 contiguous arc length
BORDER = 16  # detection margin, matches reference minBorder = EDGE_THRESHOLD-3


def _ring_stack(img):
    """[H,W] -> [16,H,W] of the ring-shifted images (zero padding outside;
    border rows/cols are masked out by BORDER anyway)."""
    shifted = []
    for dx, dy in RING_OFFSETS:
        s = jnp.roll(img, shift=(-int(dy), -int(dx)), axis=(-2, -1))
        shifted.append(s)
    return jnp.stack(shifted, axis=0)


def fast_response(img, threshold: float):
    """Dense FAST-9/16 response map. img [H,W] float32 -> [H,W] float32 score
    (0 where not a corner)."""
    ring = _ring_stack(img)  # [16,H,W]
    center = img[None]
    bright = ring > center + threshold
    dark = ring < center - threshold

    def arc_mask(flags):
        # pack 16 bools into a uint32 bitmask (unsigned: logical >> shifts)
        bits = jnp.sum(
            flags.astype(jnp.uint32)
            * jnp.asarray(1 << np.arange(16, dtype=np.uint32), jnp.uint32)[:, None, None],
            axis=0,
            dtype=jnp.uint32,
        )
        # duplicate to handle wraparound: m16 | m16<<16, then AND of 9 shifts
        m = bits | (bits << jnp.uint32(16))
        acc = m
        for k in range(1, ARC_LEN):
            acc = acc & (m >> jnp.uint32(k))
        return acc != 0

    is_bright = arc_mask(bright)
    is_dark = arc_mask(dark)

    # SAD score over contributing pixels
    score_b = jnp.sum(jnp.maximum(ring - center - threshold, 0.0), axis=0)
    score_d = jnp.sum(jnp.maximum(center - ring - threshold, 0.0), axis=0)
    score = jnp.maximum(
        jnp.where(is_bright, score_b, 0.0), jnp.where(is_dark, score_d, 0.0)
    )

    h, w = img.shape[-2:]
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    inside = (
        (row >= BORDER) & (row < h - BORDER) & (col >= BORDER) & (col < w - BORDER)
    )
    return jnp.where(inside, score, 0.0)


def local_max_3x3(score):
    """3x3 non-max suppression: keep score only at strict local maxima."""
    neigh = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            neigh.append(jnp.roll(score, (dy, dx), axis=(-2, -1)))
    m = jnp.stack(neigh, 0).max(0)
    return jnp.where(score > m, score, 0.0)


@partial(jax.jit, static_argnames=("cell", "max_out", "ini_th", "min_th"))
def detect_level(img, ini_th: float, min_th: float, cell: int, max_out: int):
    """Detect up to `max_out` spatially-uniform corners on one pyramid level.

    Implements the reference per-cell dual-threshold semantics
    (`ORBextractor.cc:653-669`): a cell uses the high-threshold responses if
    it has any, otherwise falls back to its low-threshold responses.

    Returns (xy [max_out,2] float32 (x=col,y=row), score [max_out],
    valid [max_out] bool). Slots are filled breadth-first by in-cell rank so
    the selected set is spatially uniform.
    """
    hi = local_max_3x3(fast_response(img, ini_th))
    lo = local_max_3x3(fast_response(img, min_th))

    h, w = img.shape
    gh, gw = -(-h // cell), -(-w // cell)
    ph, pw = gh * cell, gw * cell
    hi_p = jnp.pad(hi, ((0, ph - h), (0, pw - w)))
    lo_p = jnp.pad(lo, ((0, ph - h), (0, pw - w)))
    # [gh,gw,cell*cell]
    hi_c = hi_p.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3).reshape(gh, gw, -1)
    lo_c = lo_p.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3).reshape(gh, gw, -1)
    use_hi = jnp.any(hi_c > 0, axis=-1, keepdims=True)
    resp = jnp.where(use_hi, hi_c, lo_c)  # per-cell threshold fallback

    k = min(max_out, cell * cell)
    top_s, top_i = jax.lax.top_k(resp, k)  # [gh,gw,k] in-cell rank order
    # global coordinates of each candidate
    cy = jnp.arange(gh)[:, None, None] * cell + top_i // cell
    cx = jnp.arange(gw)[None, :, None] * cell + top_i % cell

    flat_s = top_s.reshape(-1)
    flat_rank = jnp.broadcast_to(jnp.arange(k)[None, None, :], top_s.shape).reshape(-1)
    flat_y = cy.reshape(-1)
    flat_x = cx.reshape(-1)

    # breadth-first across cells: order by (rank asc, score desc), invalid last
    valid = flat_s > 0
    order_key = jnp.where(valid, flat_rank.astype(jnp.float32) * 1e9 - flat_s, jnp.inf)
    sel = jax.lax.top_k(-order_key, max_out)[1]

    xy = jnp.stack([flat_x[sel], flat_y[sel]], axis=-1).astype(jnp.float32)
    score = flat_s[sel]
    return xy, score, valid[sel]
