"""Pose-only optimization (motion-only bundle adjustment).

TPU-native `Optimizer::PoseOptimization` (`orb_slam3/src/Optimizer.cc:744`):
4 outer rounds x 10 Gauss-Newton iterations, Huber kernel at
delta = sqrt(5.991), chi2(2dof) = 5.991 outlier re-classification between
rounds, outliers excluded from the next round (reference semantics
`Optimizer.cc:929-931`).

Layout note (TPU): Jacobians are kept as PLANES `[6, N]` — the observation
axis lives in the 128-lane dimension, so every product/reduction is fully
lane-utilized and the normal equations are two [6,N]x[N,6] MXU matmuls.
A `[N,2,6]`-blocked layout wastes ~95% of each vector register.

Closed-form Jacobian (left-multiplied se3 tangent (v, omega) at zero), with
pc = T X, r = uv - pi(pc), a00 = fx/z, a02 = -fx x/z^2, a11 = fy/z,
a12 = -fy y/z^2:
  J_u = [-a00, 0, -a02, -a02*y, -a00*z + a02*x,  a00*y]
  J_v = [0, -a11, -a12,  a11*z - a12*y,  a12*x, -a11*x]
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import lie

CHI2_MONO = 5.991
CHI2_STEREO = 7.815  # chi2(3dof), `Optimizer.cc:888` deltaStereo^2
HUBER_DELTA = math.sqrt(CHI2_MONO)
HUBER_DELTA_STEREO = math.sqrt(CHI2_STEREO)


def _residuals_and_planes(T, pts, uv, K):
    """Returns (r [N,2], z [N], Ju [6,N], Jv [6,N])."""
    pc = lie.quat_rotate(lie.se3_q(T)[None], pts) + lie.se3_t(T)[None]
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z = 1.0 / zs
    u_pred = K[0] * x * inv_z + K[2]
    v_pred = K[1] * y * inv_z + K[3]
    r = uv - jnp.stack([u_pred, v_pred], axis=-1)

    a00 = K[0] * inv_z
    a02 = -K[0] * x * inv_z * inv_z
    a11 = K[1] * inv_z
    a12 = -K[1] * y * inv_z * inv_z
    zero = jnp.zeros_like(x)
    Ju = jnp.stack([-a00, zero, -a02, -a02 * y, -a00 * z + a02 * x, a00 * y])
    Jv = jnp.stack([zero, -a11, -a12, a11 * z - a12 * y, a12 * x, -a11 * x])
    return r, z, Ju, Jv


def _stereo_residual_and_plane(T, pts, ur, bf, K):
    """Third residual row of stereo observations (EdgeStereoSE3ProjectXYZ,
    `g2o/types_six_dof_expmap.h` role): r_ur = ur - (u_pred - bf/z).
    Returns (r_ur [N], Jur [6,N]); rows with ur<0 are monocular (weight 0
    at the caller)."""
    pc = lie.quat_rotate(lie.se3_q(T)[None], pts) + lie.se3_t(T)[None]
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z = 1.0 / zs
    u_pred = K[0] * x * inv_z + K[2]
    r_ur = ur - (u_pred - bf * inv_z)
    a00 = K[0] * inv_z
    a02 = -K[0] * x * inv_z * inv_z
    zero = jnp.zeros_like(x)
    # d(u_r)/dpc = d(u)/dpc + (bf/z^2) * dz/dpc: the extra term is the
    # Ju plane pattern evaluated at (a00=0, a02=bf/z^2)
    c = bf * inv_z * inv_z
    Ju = jnp.stack([-a00, zero, -a02, -a02 * y, -a00 * z + a02 * x, a00 * y])
    Jz = jnp.stack([zero, zero, -c, -c * y, c * x, zero])
    return r_ur, Ju + Jz


@partial(jax.jit, static_argnames=("rounds", "iters"))
def pose_optimization(T_init, pts, uv, sigma2, valid, K,
                      rounds: int = 4, iters: int = 10, damping: float = 1e-3,
                      ur=None, bf=None):
    """Optimize a world->camera pose against fixed 3D points.

    Args:
      T_init: [7] SE3 world->camera.
      pts:    [N,3] world points.
      uv:     [N,2] observed (undistorted) pixels.
      sigma2: [N] keypoint level variance (pixels^2), `mvLevelSigma2`.
      valid:  [N] bool observation mask.
      K:      [4] fx fy cx cy.
      ur:     optional [N] stereo right-u observations (-1 = monocular row);
              with `bf` (= fx * baseline) stereo rows contribute a third
              residual and are gated at chi2(3dof) = 7.815
              (`Optimizer::PoseOptimization` stereo edges, Optimizer.cc:888).

    Returns: (T [7], inliers [N] bool, chi2 [N]).
    """
    info = 1.0 / jnp.maximum(sigma2, 1e-12)
    stereo = None if ur is None else (ur >= 0.0) & valid
    chi2_th = CHI2_MONO if ur is None else jnp.where(
        stereo, CHI2_STEREO, CHI2_MONO
    )
    delta_h = HUBER_DELTA if ur is None else jnp.where(
        stereo, HUBER_DELTA_STEREO, HUBER_DELTA
    )

    def chi2_of(T):
        r, z, _, _ = _residuals_and_planes(T, pts, uv, K)
        chi2 = jnp.sum(r * r, axis=-1) * info
        if ur is not None:
            r_ur, _ = _stereo_residual_and_plane(T, pts, ur, bf, K)
            chi2 = chi2 + jnp.where(stereo, r_ur * r_ur * info, 0.0)
        return chi2, z

    def gn_round(T, active):
        def body(_, T):
            r, z, Ju, Jv = _residuals_and_planes(T, pts, uv, K)
            chi2 = jnp.sum(r * r, axis=-1) * info
            if ur is not None:
                r_ur, Jur = _stereo_residual_and_plane(T, pts, ur, bf, K)
                chi2 = chi2 + jnp.where(stereo, r_ur * r_ur * info, 0.0)
            rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            w = info * jnp.minimum(1.0, delta_h / rn) * active
            # normal equations via [6,N] @ [N,6] MXU matmuls
            H = jnp.einsum("in,n,jn->ij", Ju, w, Ju) + jnp.einsum(
                "in,n,jn->ij", Jv, w, Jv
            )
            b = jnp.einsum("in,n->i", Ju, w * r[:, 0]) + jnp.einsum(
                "in,n->i", Jv, w * r[:, 1]
            )
            if ur is not None:
                ws = w * stereo
                H = H + jnp.einsum("in,n,jn->ij", Jur, ws, Jur)
                b = b + jnp.einsum("in,n->i", Jur, ws * r_ur)
            H = H + damping * jnp.eye(6, dtype=T.dtype) * (1.0 + jnp.trace(H) / 6.0)
            # measured: the LU custom-call beats the blocked closed form
            # here (single 6x6 per iteration, latency hidden in the chain)
            dx = jnp.linalg.solve(H, -b)
            dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
            return lie.se3_retract(T, dx)

        return jax.lax.fori_loop(0, iters, body, T)

    active = valid.astype(T_init.dtype)
    T = T_init
    for _ in range(rounds):
        T = gn_round(T, active)
        chi2, z = chi2_of(T)
        inl = valid & (chi2 <= chi2_th) & (z > 0)
        active = inl.astype(T_init.dtype)

    chi2, z = chi2_of(T)
    inliers = valid & (chi2 <= chi2_th) & (z > 0)
    return T, inliers, chi2
