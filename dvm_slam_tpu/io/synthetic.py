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
    """World of textured z-planes (a deep background plane plus bounded
    foreground patches at varying depth, so monocular BA sees real 3D
    structure — a single plane leaves the plane-parallax ambiguity
    unconstrained). Rendering is z-buffered ray/plane intersection.
    """

    def __init__(self, seed=0, tex_size=1024, plane_z=6.0, extent=24.0,
                 n_patches=8, depth_range=(0.45, 0.90), spread=(0.5, 0.3),
                 patch_half=(0.04, 0.14)):
        """Defaults reproduce the historical 8-patch layout bit-for-bit
        (same RNG draw order). For ACCURACY benchmarks pass a dense field
        (e.g. n_patches=36, depth_range=(0.30, 0.92), patch_half=(0.03,
        0.09)): a sparse layout leaves whole views fronto-parallel at one
        depth, where lateral-translation flow is uniform and a pose-only
        optimizer can explain it with yaw — the rotation-for-translation
        substitution that collapses monocular scale (measured: est rotation
        3x gt, est translation ~0, depth median -2%/frame compounding).
        Real benchmark scenes (EuRoC rooms) are full-3D; dense multi-depth
        patches are the synthetic equivalent."""
        rng = np.random.RandomState(seed)
        self.texture = jnp.asarray(make_texture(rng, tex_size))
        self.tex_size = tex_size
        self.extent = extent
        d_lo, d_hi = depth_range
        sx, sy = spread
        h_lo, h_hi = patch_half
        # planes: (z, xmin, xmax, ymin, ymax); first = unbounded background
        planes = [(plane_z, -extent, extent, -extent, extent)]
        for _ in range(n_patches):
            z = plane_z * (d_lo + (d_hi - d_lo) * rng.rand())
            cx = (rng.rand() - 0.5) * extent * sx
            cy = (rng.rand() - 0.5) * extent * sy
            half = extent * (h_lo + (h_hi - h_lo) * rng.rand())
            planes.append((z, cx - half, cx + half, cy - half, cy + half))
        self.planes = np.asarray(planes, np.float32)

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

        planes = jnp.asarray(self.planes)
        dz = jnp.where(jnp.abs(d_w[..., 2]) < 1e-9, 1e-9, d_w[..., 2])

        # z-buffer over the plane table with a traced loop: compile time is
        # O(1) in the plane count (dense multi-depth worlds use hundreds of
        # patches; a Python unroll took minutes of XLA time at that scale)
        def body(pi, carry):
            best_t, best_xy, best_off = carry
            z, x0p, x1p, y0p, y1p = (planes[pi, j] for j in range(5))
            t = (z - c[2]) / dz
            pw = c[None, None] + t[..., None] * d_w
            inside = (
                (t > 1e-3) & (pw[..., 0] >= x0p) & (pw[..., 0] <= x1p)
                & (pw[..., 1] >= y0p) & (pw[..., 1] <= y1p)
            )
            closer = inside & (t < best_t)
            best_t = jnp.where(closer, t, best_t)
            best_xy = jnp.where(closer[..., None], pw[..., :2], best_xy)
            # texture offset per plane decorrelates patch textures
            best_off = jnp.where(closer, pi.astype(jnp.float32) * 137.0, best_off)
            return best_t, best_xy, best_off

        best_t, best_xy, best_off = jax.lax.fori_loop(
            0, planes.shape[0], body,
            (jnp.full((h, w), jnp.inf), jnp.zeros((h, w, 2)), jnp.zeros((h, w))),
        )

        hit = jnp.isfinite(best_t)
        tx = (best_xy[..., 0] / self.extent + 0.5) * (self.tex_size - 1) + best_off
        ty = (best_xy[..., 1] / self.extent + 0.5) * (self.tex_size - 1) + best_off * 0.7
        tx = jnp.mod(tx, self.tex_size - 1.001)
        ty = jnp.mod(ty, self.tex_size - 1.001)
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
        return jnp.where(hit, val, 0.0)

    @partial(jax.jit, static_argnames=("self", "h", "w"))
    def render_depth(self, T_cw, K, h: int, w: int):
        """Ray-traced z-depth map [h,w] (0 where no surface is hit) — the
        camera-frame z of the first plane intersection. Exact ground truth
        for RGB-D pipelines."""
        T_wc = lie.se3_inv(T_cw)
        c = lie.se3_t(T_wc)
        u, v = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                            jnp.arange(h, dtype=jnp.float32))
        d_cam = jnp.stack(
            [(u - K[2]) / K[0], (v - K[3]) / K[1], jnp.ones_like(u)], axis=-1
        )
        d_w = lie.quat_rotate(lie.se3_q(T_wc)[None, None], d_cam)
        planes = jnp.asarray(self.planes)
        dz = jnp.where(jnp.abs(d_w[..., 2]) < 1e-9, 1e-9, d_w[..., 2])

        def body(pi, best_t):
            z, x0p, x1p, y0p, y1p = (planes[pi, j] for j in range(5))
            t = (z - c[2]) / dz
            pw = c[None, None] + t[..., None] * d_w
            inside = (
                (t > 1e-3) & (pw[..., 0] >= x0p) & (pw[..., 0] <= x1p)
                & (pw[..., 1] >= y0p) & (pw[..., 1] <= y1p)
            )
            return jnp.where(inside & (t < best_t), t, best_t)

        best_t = jax.lax.fori_loop(0, planes.shape[0], body,
                                   jnp.full((h, w), jnp.inf))
        # ray param t multiplies a unit-z camera direction -> t IS the z-depth
        return jnp.where(jnp.isfinite(best_t), best_t, 0.0)

    def render_stereo(self, T_cw, K, h: int, w: int, baseline: float):
        """Rectified stereo pair: the right camera is the left translated by
        +baseline along the camera x-axis (p_right = p_left - (b,0,0), i.e.
        T_cw_right = Trans(-b) o T_cw_left). Returns (img_l, img_r)."""
        img_l = self.render(T_cw, K, h, w)
        shift = jnp.asarray([1.0, 0.0, 0.0, 0.0, -baseline, 0.0, 0.0],
                            T_cw.dtype)
        img_r = self.render(lie.se3_mul(shift, T_cw), K, h, w)
        return img_l, img_r


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


def circuit_trajectory(n_frames: int, radius=2.2, forward=0.0, yaw_amp=0.25,
                       loops=1.0, z_amp=0.08):
    """Loop-closing circuit (list of world->camera SE3 [7] numpy): the
    camera center travels `loops` times around an x-y circle of `radius`
    while facing the background plane (+z), with mild sinusoidal yaw and
    height variation for parallax. After one loop the view RETURNS to the
    start — the long-trajectory revisit benchmark the reference evaluates
    on EuRoC MH sequences (BASELINE.md: 7.4 cm over 50 m)."""
    poses = []
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1) * loops
        ang = 2 * np.pi * s
        cx = radius * np.sin(ang)
        cy = radius * 0.55 * (np.cos(ang) - 1.0)
        cz = forward * s + z_amp * np.sin(4 * np.pi * s)
        yaw_i = yaw_amp * np.sin(ang)
        q = np.asarray(lie.so3_exp(jnp.array([0.0, yaw_i, 0.0], jnp.float32)))
        c = np.array([cx, cy, cz], np.float32)
        T_wc = np.concatenate([q, c]).astype(np.float32)
        poses.append(np.asarray(lie.se3_inv(jnp.asarray(T_wc))))
    return poses


def vi_trajectory(n_frames: int, fps: float = 10.0, imu_rate: float = 100.0,
                  lateral=2.0, forward=0.5, yaw=0.08, z_amp=0.1,
                  g=(0.0, 0.0, -9.81)):
    """Analytic camera(=body) trajectory with exact IMU measurements.

    Continuous-time version of `smooth_trajectory` sampled at the camera
    rate, plus per-frame IMU sample chunks (acc, gyro, dts) covering
    (t_{i-1}, t_i] derived from the same analytic pose function — the
    synthetic stand-in for a real camera+IMU rig (webots has no IMU; the
    reference evaluates VI on EuRoC/TUM-VI).

    Returns (poses_T_cw [N][7] np, imu_chunks [N] list of (acc [M,3],
    gyro [M,3], dts [M]) with imu_chunks[0] empty, vel_w [N,3])."""
    g = np.asarray(g, np.float64)
    T_total = (n_frames - 1) / fps

    def center(t):
        s = t / max(T_total, 1e-9)
        return np.array([
            lateral * np.sin(s * np.pi),
            z_amp * np.sin(4 * np.pi * s),
            forward * s,
        ], np.float64)

    def rot_wc(t):  # body(=camera)->world rotation
        s = t / max(T_total, 1e-9)
        yaw_i = yaw * np.sin(s * np.pi)
        return np.asarray(lie.quat_to_matrix(
            lie.so3_exp(jnp.array([0.0, yaw_i, 0.0], jnp.float32))
        ), np.float64)

    eps = 1e-4

    def vel(t):
        return (center(t + eps) - center(t - eps)) / (2 * eps)

    def acc_w(t):
        return (vel(t + eps) - vel(t - eps)) / (2 * eps)

    poses, chunks, vels = [], [], []
    dti = 1.0 / imu_rate
    for i in range(n_frames):
        t = i / fps
        R = rot_wc(t)
        c = center(t)
        q = np.asarray(lie.quat_from_matrix(jnp.asarray(R, jnp.float32)))
        T_wc = np.concatenate([q, c]).astype(np.float32)
        poses.append(np.asarray(lie.se3_inv(jnp.asarray(T_wc))))
        vels.append(vel(t).astype(np.float32))
        if i == 0:
            chunks.append((np.zeros((0, 3), np.float32),
                           np.zeros((0, 3), np.float32),
                           np.zeros((0,), np.float32)))
            continue
        tt = np.arange(t - 1.0 / fps, t - 1e-9, dti)
        accs, gyrs, dts = [], [], []
        for tk in tt:
            R0, R1 = rot_wc(tk), rot_wc(tk + dti)
            w = np.asarray(lie.so3_log(lie.quat_from_matrix(
                jnp.asarray(R0.T @ R1, jnp.float32)))) / dti
            a_b = R0.T @ (acc_w(tk) - g)
            accs.append(a_b.astype(np.float32))
            gyrs.append(w.astype(np.float32))
            dts.append(dti)
        chunks.append((np.stack(accs), np.stack(gyrs),
                       np.asarray(dts, np.float32)))
    return poses, chunks, np.stack(vels)
