"""Stereo correspondence for rectified pairs + RGB-D depth lookup.

TPU-native `Frame::ComputeStereoMatches` (`orb_slam3/src/Frame.cc:645-792`)
and `Frame::ComputeStereoFromRGBD` (`Frame.cc:794-824`): instead of per-row
candidate lists and per-keypoint SAD loops, the coarse stage is ONE masked
dense Hamming matrix on the MXU (row band, disparity range, level band), and
the subpixel stage slides an 11x11 SAD window over gathered image strips for
every match at once — a static [F,11,11,11] tensor, no data-dependent loops.

Reference behavioral constants kept: descriptor gate (TH_HIGH+TH_LOW)/2=75,
row band 2*scale(level_r), disparity in (0, fx], level band +/-1, SAD
window w=5 slide +/-5 with parabola refinement rejected outside [-1,1],
median outlier pass at 1.5*1.4*median.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import matching

TH_ORB = (matching.TH_HIGH + matching.TH_LOW) // 2  # 75, Frame.cc:656
_W = 5        # SAD half-window (11x11), Frame.cc:714
_SLIDE = 5    # +/- slide range, Frame.cc:719
_BIG = 1 << 20


def _sad_refine_level(img_l, img_r, xl, yl, xr0, ok):
    """Vectorized SAD subpixel refinement at one pyramid level.

    img_l/img_r: [H,W] level images; xl,yl,xr0: [F] level-resolution coords
    (xr0 = coarse right x); ok: [F] rows to refine.
    Returns (inc_best [F], delta [F], sad_best [F], ok [F])."""
    H, W = img_l.shape
    F = xl.shape[0]
    ixl = jnp.round(xl).astype(jnp.int32)
    iyl = jnp.round(yl).astype(jnp.int32)
    ixr = jnp.round(xr0).astype(jnp.int32)
    # clamp so every gather stays in bounds (masked rows read garbage safely)
    ixl = jnp.clip(ixl, _W, W - 1 - _W)
    iyl = jnp.clip(iyl, _W, H - 1 - _W)
    ixr = jnp.clip(ixr, _W + _SLIDE, W - 1 - _W - _SLIDE)

    dw = jnp.arange(-_W, _W + 1)
    # left patch [F,11,11]
    patch_l = img_l[iyl[:, None, None] + dw[None, :, None],
                    ixl[:, None, None] + dw[None, None, :]]
    patch_l = patch_l - patch_l[:, _W, _W][:, None, None]  # center-normalized
    # right strip [F,11,21]
    ds = jnp.arange(-_W - _SLIDE, _W + _SLIDE + 1)
    strip = img_r[iyl[:, None, None] + dw[None, :, None],
                  ixr[:, None, None] + ds[None, None, :]]
    strip = strip - strip[:, _W, _W + _SLIDE][:, None, None]
    # windows at each slide offset: [F,11(slide),11,11]
    wins = jnp.stack([strip[:, :, o:o + 2 * _W + 1]
                      for o in range(2 * _SLIDE + 1)], axis=1)
    sad = jnp.sum(jnp.abs(patch_l[:, None] - wins), axis=(2, 3))  # [F,11]
    best = jnp.argmin(sad, axis=1)
    sad_best = jnp.take_along_axis(sad, best[:, None], axis=1)[:, 0]
    # parabola over (best-1, best, best+1); edge hits are rejected
    interior = (best > 0) & (best < 2 * _SLIDE)
    bi = jnp.clip(best, 1, 2 * _SLIDE - 1)
    d_m1 = jnp.take_along_axis(sad, (bi - 1)[:, None], 1)[:, 0]
    d_0 = jnp.take_along_axis(sad, bi[:, None], 1)[:, 0]
    d_p1 = jnp.take_along_axis(sad, (bi + 1)[:, None], 1)[:, 0]
    denom = 2.0 * (d_m1 + d_p1 - 2.0 * d_0)
    delta = jnp.where(jnp.abs(denom) > 1e-9, (d_m1 - d_p1) / denom, 2.0)
    good = interior & (delta >= -1.0) & (delta <= 1.0) & ok
    inc = (best - _SLIDE).astype(jnp.float32)
    # account for the clamp shift applied to ixr
    inc = inc + (ixr.astype(jnp.float32) - jnp.round(xr0))
    return inc, jnp.where(good, delta, 0.0), sad_best, good


@partial(jax.jit, static_argnames=("scale_factor", "n_levels"))
def compute_stereo_matches(
    xy_l, level_l, desc_l, valid_l,
    xy_r, level_r, desc_r, valid_r,
    pyr_l, pyr_r,
    fx, baseline,
    scale_factor: float = 1.2, n_levels: int = 8,
):
    """Rectified-stereo correspondence (`Frame::ComputeStereoMatches`).

    xy_* are level-0 RAW pixel coordinates; pyr_l/pyr_r are tuples of the
    pyramid level images of both views (same levels as extraction).
    Returns (u_right [F], depth [F]) in level-0 pixels / world units, with
    -1 where no stereo match exists.
    """
    F = xy_l.shape[0]
    bf = fx * baseline
    scales = jnp.asarray([scale_factor ** i for i in range(n_levels)],
                         jnp.float32)
    s_l = scales[jnp.clip(level_l, 0, n_levels - 1)]
    s_r = scales[jnp.clip(level_r, 0, n_levels - 1)]

    # ---- coarse: masked dense Hamming (MXU) -----------------------------
    dist = matching.hamming_matrix(desc_l, desc_r)
    row_band = jnp.abs(xy_l[:, 1:2] - xy_r[None, :, 1]) <= 2.0 * s_r[None, :]
    disp = xy_l[:, 0:1] - xy_r[None, :, 0]
    disp_ok = (disp > 0.0) & (disp <= fx)           # minZ = b -> maxD = fx
    lvl_ok = jnp.abs(level_l[:, None] - level_r[None, :]) <= 1
    mask = row_band & disp_ok & lvl_ok & valid_l[:, None] & valid_r[None, :]
    ridx, best_d, ok = matching.masked_best_match(dist, mask, TH_ORB)
    ric = jnp.clip(ridx, 0)

    # ---- subpixel: SAD slide at the left keypoint's level ----------------
    ur0_l0 = xy_r[ric, 0]                            # coarse uR, level-0 px
    inc_all = jnp.zeros((F,), jnp.float32)
    delta_all = jnp.zeros((F,), jnp.float32)
    sad_all = jnp.full((F,), jnp.inf, jnp.float32)
    good_all = jnp.zeros((F,), bool)
    for lv in range(n_levels):
        here = ok & (level_l == lv)
        s = float(scale_factor ** lv)
        inc, delta, sad, good = _sad_refine_level(
            pyr_l[lv], pyr_r[lv],
            xy_l[:, 0] / s, xy_l[:, 1] / s, ur0_l0 / s, here,
        )
        inc_all = jnp.where(here, inc, inc_all)
        delta_all = jnp.where(here, delta, delta_all)
        sad_all = jnp.where(here, sad, sad_all)
        good_all = jnp.where(here, good, good_all)

    u_right = ur0_l0 + s_l * (inc_all + delta_all)
    disparity = xy_l[:, 0] - u_right
    good = good_all & (disparity > 0.0) & (disparity <= fx)
    # degenerate near-zero disparity: clamp like the reference (uR -> uL-eps)
    u_right = jnp.where(good, u_right, -1.0)

    # ---- median outlier pass (Frame.cc:775-791) --------------------------
    sad_valid = jnp.where(good, sad_all, jnp.nan)
    med = jnp.nanmedian(sad_valid)
    med = jnp.where(jnp.isfinite(med), med, 0.0)
    keep = good & (sad_all < 1.5 * 1.4 * med + 1e-6)
    u_right = jnp.where(keep, u_right, -1.0)
    depth = jnp.where(keep, bf / jnp.maximum(xy_l[:, 0] - u_right, 1e-6), -1.0)
    return u_right, depth


@jax.jit
def compute_stereo_from_rgbd(xy_raw, valid, depth_map, bf, depth_factor):
    """RGB-D -> virtual right coordinate (`Frame::ComputeStereoFromRGBD`):
    sample the registered depth image at each (raw) keypoint and synthesize
    uR = u - bf/d. depth_map in sensor units; depth_factor scales to meters.
    Returns (u_right [F], depth [F]), -1 where depth is missing."""
    H, W = depth_map.shape
    xi = jnp.clip(jnp.round(xy_raw[:, 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(xy_raw[:, 1]).astype(jnp.int32), 0, H - 1)
    d = depth_map[yi, xi].astype(jnp.float32) * depth_factor
    ok = valid & (d > 0.0)
    u_right = jnp.where(ok, xy_raw[:, 0] - bf / jnp.maximum(d, 1e-6), -1.0)
    return u_right, jnp.where(ok, d, -1.0)
