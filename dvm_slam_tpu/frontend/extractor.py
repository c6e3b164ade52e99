"""ORB feature extraction pipeline: pyramid -> FAST -> orientation -> rBRIEF.

The TPU-native `ORBextractor::operator()` + mono `Frame` construction
(`orb_slam3/src/ORBextractor.cc:876`, `orb_slam3/src/Frame.cc:371,481,508`):
one jitted function maps a grayscale image to a fixed-capacity `Frame` of
keypoints + unpacked binary descriptors. Everything is static-shape; invalid
slots carry `valid=False` masks instead of ragged lists.

The reference's 64x48 feature grid (`Frame::AssignFeaturesToGrid`) is
deliberately NOT rebuilt: window-constrained matching on TPU is a masked
dense distance matrix (see ops/matching.py), which the MXU evaluates faster
than pointer-chasing grid buckets.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fast, orb_descriptor, pyramid


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Static extraction parameters (hashable -> usable as jit static arg).

    Defaults follow `configs/euroc.yaml:49-62` of the reference:
    1000-1250 features, 8 levels x1.2, FAST thresholds 20 -> 7.
    """

    height: int
    width: int
    n_features: int = 1250
    n_levels: int = 8
    scale_factor: float = 1.2
    ini_th: float = 20.0
    min_th: float = 7.0
    cell: int = 35
    # None = auto: the fused Pallas orientation+descriptor kernel on TPU,
    # the XLA gather path elsewhere
    use_pallas: bool | None = None

    @property
    def scales(self):
        return tuple(pyramid.level_scales(self.n_levels, self.scale_factor))

    @property
    def level_budgets(self):
        """Features per level, geometric in 1/scale (ORBextractor ctor
        semantics), padded so they sum to capacity()."""
        f = 1.0 / self.scale_factor
        n = self.n_features
        raw = [n * (1 - f) / (1 - f ** self.n_levels) * (f ** i) for i in range(self.n_levels)]
        budgets = [max(8, int(round(r))) for r in raw]
        return tuple(budgets)

    @property
    def capacity(self):
        return sum(self.level_budgets)

    @property
    def sigma2(self):
        """Per-level variance of keypoint position, `mvLevelSigma2`."""
        return tuple(s * s for s in self.scales)


class Frame(NamedTuple):
    """Fixed-capacity feature set of one image. All arrays have leading dim
    F = config.capacity; invalid slots are masked.

    Stereo / RGB-D frames (`Frame.cc:149,265`) carry two extra channels:
    `ur` (virtual right-image u coordinate, -1 for monocular observations)
    and `depth` (metric depth, -1 unknown). Monocular frames leave them as
    None (empty pytree leaves — no cost in jit)."""

    xy: jnp.ndarray        # [F,2] float32 undistorted keypoints, level-0 px
    xy_raw: jnp.ndarray    # [F,2] float32 raw (distorted) keypoints, level-0 px
    level: jnp.ndarray     # [F] int32 pyramid level
    angle: jnp.ndarray     # [F] float32 orientation (radians)
    response: jnp.ndarray  # [F] float32 FAST score
    desc: jnp.ndarray      # [F,256] uint8 bits in {0,1}
    valid: jnp.ndarray     # [F] bool
    ur: jnp.ndarray | None = None      # [F] float32 right-u, -1 = mono
    depth: jnp.ndarray | None = None   # [F] float32 metric depth, -1 = none

    @property
    def capacity(self):
        return self.xy.shape[-2]


@partial(jax.jit, static_argnames=("config",))
def extract(img, config: FrontendConfig):
    """Grayscale [H,W] float32 (0..255) -> Frame (keypoints in RAW px;
    undistortion is applied by `make_frame` with camera params)."""
    return _extract_impl(img, config)[0]


def _extract_impl(img, config: FrontendConfig):
    """extract() body; also returns the pyramid levels (stereo SAD needs
    them alive inside the same jit)."""
    # cast on DEVICE: callers upload camera frames in their native dtype
    # (uint8 crosses the host->device link at 1/4 the float32 bytes)
    img = img.astype(jnp.float32)
    levels = pyramid.build_pyramid(img, config.n_levels, config.scale_factor)
    budgets = config.level_budgets
    scales = config.scales
    use_pallas = config.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)

    all_xy, all_lv, all_ang, all_resp, all_desc, all_valid = [], [], [], [], [], []
    for lv, (im, budget, s) in enumerate(zip(levels, budgets, scales)):
        xy, score, valid = fast.detect_level(
            im, config.ini_th, config.min_th, config.cell, budget
        )
        blur = pyramid.gaussian_blur(im)
        if use_pallas:
            from ..ops import pallas_orb

            ang, desc = pallas_orb.orient_and_describe(im, blur, xy)
        else:
            ang, desc = orb_descriptor.orient_and_describe(im, blur, xy)
        all_xy.append(xy * s)  # back to level-0 pixel coordinates
        all_lv.append(jnp.full((budget,), lv, jnp.int32))
        all_ang.append(ang)
        all_resp.append(score)
        all_desc.append(desc)
        all_valid.append(valid)

    frame = Frame(
        xy=jnp.concatenate(all_xy),
        xy_raw=jnp.concatenate(all_xy),
        level=jnp.concatenate(all_lv),
        angle=jnp.concatenate(all_ang),
        response=jnp.concatenate(all_resp),
        desc=jnp.concatenate(all_desc),
        valid=jnp.concatenate(all_valid),
    )
    return frame, levels


@partial(jax.jit, static_argnames=("config", "camera_model"))
def make_frame(img, K, dist, config: FrontendConfig, camera_model: str = "pinhole"):
    """Full mono frame construction (`Frame.cc:371`): extract + undistort.

    camera_model:
      * "pinhole": radial-tangential keypoint undistortion
        (`Frame::UndistortKeyPoints` semantics).
      * "kb8": fisheye keypoints are RECTIFIED onto the ideal pinhole with
        the same (fx,fy,cx,cy) — kb8_unproject then pinhole re-projection.
        The reference instead keeps KB8 projections throughout (needed for
        its stereo-fisheye overlap handling); for the monocular pipeline the
        rectified-keypoint formulation is behaviorally equivalent within the
        valid FOV and lets every downstream stage stay pinhole. `dist` holds
        the four theta-polynomial coefficients k1..k4.
    """
    from ..geometry import cameras

    f = extract(img, config)
    return _undistort_frame(f, K, dist, camera_model)


def _undistort_frame(f: Frame, K, dist, camera_model: str):
    from ..geometry import cameras

    if camera_model == "kb8":
        params = jnp.concatenate([K[:4], dist[:4]])
        rays = cameras.kb8_unproject(params, f.xy_raw)
        xy_un, _ = cameras.pinhole_project(K[:4], rays)
    else:
        xy_un = cameras.undistort_pixels(K, dist, f.xy_raw)
    return f._replace(xy=jnp.where(f.valid[:, None], xy_un, f.xy_raw))


@partial(jax.jit, static_argnames=("config",))
def make_frame_stereo(img_l, img_r, K, dist, config: FrontendConfig,
                      baseline):
    """Rectified-stereo frame construction (`Frame.cc:149`): extract ORB in
    both views, dense-Hamming + SAD stereo correspondence (ops/stereo.py),
    keypoints/descriptors of the LEFT view define the frame. Rectified
    input assumed -> `dist` applies to neither view (pass zeros)."""
    from ..ops import stereo as stereo_ops

    fl, pyr_l = _extract_impl(img_l, config)
    fr, pyr_r = _extract_impl(img_r, config)
    ur, depth = stereo_ops.compute_stereo_matches(
        fl.xy_raw, fl.level, fl.desc, fl.valid,
        fr.xy_raw, fr.level, fr.desc, fr.valid,
        pyr_l, pyr_r, K[0], baseline,
        scale_factor=config.scale_factor, n_levels=config.n_levels,
    )
    fl = _undistort_frame(fl, K, dist, "pinhole")
    return fl._replace(ur=ur, depth=depth)


@partial(jax.jit, static_argnames=("config",))
def make_frame_rgbd(img, depth_map, K, dist, config: FrontendConfig,
                    bf, depth_factor: float = 1.0):
    """RGB-D frame construction (`Frame.cc:265`): mono extraction + depth
    lookup at each keypoint, virtual right coordinate uR = u - bf/d
    (`Frame::ComputeStereoFromRGBD`). bf = fx * virtual baseline (the
    reference's `Camera.bf` setting)."""
    from ..ops import stereo as stereo_ops

    f = extract(img, config)
    ur, depth = stereo_ops.compute_stereo_from_rgbd(
        f.xy_raw, f.valid, depth_map, bf, depth_factor
    )
    f = _undistort_frame(f, K, dist, "pinhole")
    return f._replace(ur=ur, depth=depth)
