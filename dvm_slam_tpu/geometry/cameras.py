"""Camera models: pinhole (+ radial-tangential undistortion) and
Kannala-Brandt-8 fisheye, as batched pure JAX functions.

Functional re-design of the reference's `GeometricCamera` hierarchy
(`orb_slam3/include/CameraModels/GeometricCamera.h:61-83`,
`Pinhole.cpp`, `KannalaBrandt8.cpp`):

* pinhole projection is distortion-free — like the reference, radial-tangential
  distortion is removed from detected keypoints once per frame
  (`Frame::UndistortKeyPoints`) so that all downstream geometry works on ideal
  pinhole coordinates.
* KB8 projects *with* its theta-polynomial distortion (fisheye keypoints are
  never undistorted in the reference either).

Parameters are flat float arrays so cameras vmap/shard trivially:
  pinhole: [fx, fy, cx, cy]            (+ separate dist [k1,k2,p1,p2,(k3)])
  kb8:     [fx, fy, cx, cy, k1..k4]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


# --------------------------------------------------------------------------
# pinhole
# --------------------------------------------------------------------------

def pinhole_project(K, p):
    """Project camera-frame points `p [...,3]` with `K = [fx,fy,cx,cy]`.

    Returns (uv [...,2], valid [...] bool) — valid iff depth > 0.
    Semantics of `Pinhole::project` (`CameraModels/Pinhole.cpp`).
    """
    z = p[..., 2]
    zs = jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    u = K[..., 0] * p[..., 0] / zs + K[..., 2]
    v = K[..., 1] * p[..., 1] / zs + K[..., 3]
    return jnp.stack([u, v], axis=-1), z > _EPS


def pinhole_unproject(K, uv):
    """Pixel [...,2] -> normalized ray at z=1, [...,3]."""
    x = (uv[..., 0] - K[..., 2]) / K[..., 0]
    y = (uv[..., 1] - K[..., 3]) / K[..., 1]
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def radtan_distort(dist, xy):
    """Apply [k1,k2,p1,p2,(k3)] distortion to normalized coords [...,2]."""
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    k3 = dist[4] if dist.shape[-1] > 4 else jnp.zeros_like(k1)
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def radtan_undistort(dist, xy_d, iters: int = 10):
    """Invert radtan distortion by fixed-point iteration (cv::undistortPoints
    semantics, used by `Frame::UndistortKeyPoints`)."""
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    k3 = dist[4] if dist.shape[-1] > 4 else jnp.zeros_like(k1)
    xd, yd = xy_d[..., 0], xy_d[..., 1]

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        inv = 1.0 / jnp.maximum(radial, _EPS)
        return ((xd - dx) * inv, (yd - dy) * inv)

    x, y = jax.lax.fori_loop(0, iters, body, (xd, yd))
    return jnp.stack([x, y], axis=-1)


def undistort_pixels(K, dist, uv, iters: int = 10):
    """Undistort pixel keypoints: distorted px -> ideal pinhole px."""
    xy_d = pinhole_unproject(K, uv)[..., :2]
    xy = radtan_undistort(dist, xy_d, iters)
    u = K[..., 0] * xy[..., 0] + K[..., 2]
    v = K[..., 1] * xy[..., 1] + K[..., 3]
    return jnp.stack([u, v], axis=-1)


# --------------------------------------------------------------------------
# Kannala-Brandt 8 (fisheye)
# --------------------------------------------------------------------------

def kb8_project(params, p):
    """KB8 projection (`KannalaBrandt8::project`): theta-polynomial fisheye.

    params = [fx, fy, cx, cy, k1, k2, k3, k4]; returns (uv, valid).
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k = params[4:8]
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    r2 = x * x + y * y
    small = r2 < 1e-14
    r = jnp.sqrt(jnp.where(small, 1.0, r2))
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    d = theta * (1.0 + t2 * (k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3]))))
    scale = jnp.where(small, jnp.zeros_like(r), d / r)
    u = fx * x * scale + cx
    v = fy * y * scale + cy
    # on-axis point: projects to principal point
    u = jnp.where(small, fx * 0 + cx, u)
    v = jnp.where(small, fy * 0 + cy, v)
    valid = z > 1e-6  # forward hemisphere only (matches tracking usage)
    return jnp.stack([u, v], axis=-1), valid


def kb8_unproject(params, uv, iters: int = 10):
    """Invert the theta polynomial by Newton iteration
    (`KannalaBrandt8::unproject` uses the same scheme). Returns unit-z ray."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k = params[4:8]
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    d2 = mx * mx + my * my
    d = jnp.sqrt(jnp.maximum(d2, 1e-18))
    theta_d = jnp.minimum(jnp.maximum(d, -jnp.pi / 2), jnp.pi / 2)

    def body(_, theta):
        t2 = theta * theta
        f = theta * (1.0 + t2 * (k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3])))) - theta_d
        fp = 1.0 + t2 * (3 * k[0] + t2 * (5 * k[1] + t2 * (7 * k[2] + 9 * t2 * k[3])))
        return theta - f / jnp.where(jnp.abs(fp) < _EPS, _EPS, fp)

    theta = jax.lax.fori_loop(0, iters, body, theta_d)
    scale = jnp.where(d < 1e-9, 1.0, jnp.tan(theta) / d)
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


# --------------------------------------------------------------------------
# model-dispatching helpers (static model string keeps jit happy)
# --------------------------------------------------------------------------

PINHOLE = "pinhole"
KB8 = "kb8"


def project(model: str, params, p):
    if model == PINHOLE:
        return pinhole_project(params[:4], p)
    if model == KB8:
        return kb8_project(params, p)
    raise ValueError(f"unknown camera model {model!r}")


def unproject(model: str, params, uv):
    if model == PINHOLE:
        return pinhole_unproject(params[:4], uv)
    if model == KB8:
        return kb8_unproject(params, uv)
    raise ValueError(f"unknown camera model {model!r}")


def intrinsic_matrix(params):
    """[fx,fy,cx,cy,...] -> 3x3 K."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    return jnp.stack([fx, z, cx, z, fy, cy, z, z, o], axis=-1).reshape(params.shape[:-1] + (3, 3))
