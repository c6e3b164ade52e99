"""Synthetic textured-plane world: renders real images a feature tracker can
genuinely track, with exact ground-truth trajectories.

Replaces the reference's Webots simulation + rosbag datasets
(`src/webots_sim/`, EuRoC/TUM replay via `central_management_interface`) as
the no-hardware test/benchmark harness: a camera moves through a world made
of one or more textured planes; frames are rendered by ray/plane intersection
+ bilinear texture sampling, so ORB detection/matching/triangulation/BA run
on honest image data with known poses.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import lie


def make_texture(rng, size=1024, octaves=4):
    """Multi-octave value-noise texture with strong local contrast."""
    tex = np.zeros((size, size), np.float32)
    for o in range(octaves):
        s = 8 << o
        small = rng.rand(s, s).astype(np.float32)
        up = np.asarray(jax.image.resize(jnp.asarray(small), (size, size), "linear"))
        tex += up * (0.5 ** o)
    tex -= tex.min()
    tex *= 255.0 / max(tex.max(), 1e-6)
    # add sparse bright blobs => strong corners at all scales
    n_blob = size * size // 512
    ys = rng.randint(2, size - 3, n_blob)
    xs = rng.randint(2, size - 3, n_blob)
    amp = rng.rand(n_blob).astype(np.float32) * 120 - 60
    for y, x, a in zip(ys, xs, amp):
        tex[y - 2:y + 3, x - 2:x + 3] += a
    return np.clip(tex, 0, 255).astype(np.float32)


class PlaneWorld:
    """World of a single textured plane z = plane_z (world frame), with the
    texture spanning x,y in [-extent/2, extent/2]."""

    def __init__(self, seed=0, tex_size=1024, plane_z=6.0, extent=24.0):
        rng = np.random.RandomState(seed)
        self.texture = jnp.asarray(make_texture(rng, tex_size))
        self.tex_size = tex_size
        self.plane_z = plane_z
        self.extent = extent

    @partial(jax.jit, static_argnames=("self", "h", "w"))
    def render(self, T_cw, K, h: int, w: int):
        """Render [h,w] float32 image from world->camera pose T_cw."""
        T_wc = lie.se3_inv(T_cw)
        c = lie.se3_t(T_wc)
        u, v = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                            jnp.arange(h, dtype=jnp.float32))
        d_cam = jnp.stack(
            [(u - K[2]) / K[0], (v - K[3]) / K[1], jnp.ones_like(u)], axis=-1
        )  # [h,w,3]
        d_w = lie.quat_rotate(lie.se3_q(T_wc)[None, None], d_cam)
        t = (self.plane_z - c[2]) / jnp.where(jnp.abs(d_w[..., 2]) < 1e-9, 1e-9, d_w[..., 2])
        pw = c[None, None] + t[..., None] * d_w
        hit = t > 1e-3
        # texture lookup with bilinear interpolation
        tx = (pw[..., 0] / self.extent + 0.5) * (self.tex_size - 1)
        ty = (pw[..., 1] / self.extent + 0.5) * (self.tex_size - 1)
        inside = (tx >= 0) & (tx < self.tex_size - 1) & (ty >= 0) & (ty < self.tex_size - 1)
        tx = jnp.clip(tx, 0, self.tex_size - 2)
        ty = jnp.clip(ty, 0, self.tex_size - 2)
        x0 = jnp.floor(tx).astype(jnp.int32)
        y0 = jnp.floor(ty).astype(jnp.int32)
        fx = tx - x0
        fy = ty - y0
        tex = self.texture
        val = (
            tex[y0, x0] * (1 - fx) * (1 - fy)
            + tex[y0, x0 + 1] * fx * (1 - fy)
            + tex[y0 + 1, x0] * (1 - fx) * fy
            + tex[y0 + 1, x0 + 1] * fx * fy
        )
        return jnp.where(hit & inside, val, 0.0)


def smooth_trajectory(n_frames: int, lateral=2.5, forward=1.0, yaw=0.15,
                      seed=1, z_amp=0.1):
    """Smooth camera trajectory (list of world->camera SE3 [7] numpy).

    Sideways arc with mild yaw and height variation — keeps the plane in
    view while producing real parallax (a monocular SLAM needs translation).
    """
    poses = []
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        # camera center in world
        cx = lateral * np.sin(s * np.pi)
        cy = z_amp * np.sin(2 * np.pi * s * 2)
        cz = forward * s
        yaw_i = yaw * np.sin(s * np.pi)
        q = np.asarray(lie.so3_exp(jnp.array([0.0, yaw_i, 0.0], jnp.float32)))
        c = np.array([cx, cy, cz], np.float32)
        T_wc = np.concatenate([q, c]).astype(np.float32)
        T_cw = np.asarray(lie.se3_inv(jnp.asarray(T_wc)))
        poses.append(T_cw)
    return poses
