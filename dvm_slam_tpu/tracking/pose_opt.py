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
        def body(i, T):
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
            # Damping DECAYS over the round's iterations (x0.3/iter): a
            # constant trace-proportional lambda leaves the weak-curvature
            # direction (forward translation at low parallax: contraction
            # lambda/(h+lambda) per step) unconverged after every round —
            # a systematic per-frame translation undershoot that the
            # constant-velocity model feeds back until monocular scale
            # collapses (measured: 1000-frame circuit est displacement
            # decayed ~1000x, benchmarks/circuit_diag.py). g2o's LM shrinks
            # lambda on every accepted step (the reference path); decaying
            # to ~GN by the last iterations restores its fixed point while
            # keeping early-iteration robustness.
            damp_i = damping * jnp.power(0.3, i.astype(T.dtype))
            H = H + damp_i * jnp.eye(6, dtype=T.dtype) * (1.0 + jnp.trace(H) / 6.0)
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


@partial(jax.jit, static_argnames=("rounds", "iters"))
def pose_inertial_optimization(
    T_bw_init,    # [7] world->body SE3 of the current frame (initial)
    v_init,       # [3] body velocity (world frame)
    bg_init,      # [3] gyro bias
    ba_init,      # [3] accel bias
    T_bw_anchor,  # [7] world->body of the anchor keyframe (FIXED)
    v_anchor,     # [3] anchor velocity (FIXED)
    bg_anchor,    # [3] anchor gyro bias (random-walk reference)
    ba_anchor,    # [3] anchor accel bias
    pre,          # imu.Preintegrated: anchor -> current frame
    pts,          # [N,3] world points (associated map points)
    uv,           # [N,2] observed pixels
    sigma2,       # [N] keypoint level variance
    valid,        # [N] bool
    K,            # [4] fx fy cx cy
    T_cb,         # [7] camera-from-body extrinsic
    gravity,      # [3]
    rounds: int = 4,
    iters: int = 6,
    damping: float = 1e-3,
):
    """Per-frame pose-INERTIAL optimization: the role of
    `Optimizer::PoseInertialOptimizationLastKeyFrame` (`Optimizer.cc:4181`;
    the LastFrame variant `:4545` differs only in anchoring the previous
    frame plus a marginalized prior — the keyframe anchor with the
    preintegration chain from `_imu_kf` covers the tracking contract).

    One 15-dof state (pose tangent 6, velocity 3, gyro bias 3, accel bias 3)
    optimized against (a) monocular reprojection residuals with Huber +
    chi2(2dof) reclassification over `rounds` rounds, (b) the 9-dof
    preintegration edge to the fixed anchor, whitened by the inverse
    Cholesky of the preintegration covariance (`EdgeInertial`), (c) bias
    random-walk factors to the anchor biases whitened by the walk covariance
    blocks (`EdgeGyroRW`/`EdgeAccRW`). Jacobians by forward-mode autodiff of
    the retraction (the 15-wide tangent basis is trivially cheap at frame
    scale).

    Returns (T_bw, v, bg, ba, inliers [N] bool, chi2_vis [N])."""
    from ..mapping.vi_ba import _whiten9, inertial_edge_residual

    dtype = T_bw_init.dtype
    info = 1.0 / jnp.maximum(sigma2, 1e-12)
    W9 = _whiten9(pre.C[:9, :9].astype(dtype))
    # walk information: whiten (bias_j - bias_i) by the accumulated walk
    # covariance blocks (G2oTypes EdgeGyroRW/EdgeAccRW information)
    def _whiten3(C3, eps=1e-12):
        Cs = 0.5 * (C3 + C3.T) + eps * jnp.eye(3, dtype=dtype)
        Lc = jnp.linalg.cholesky(Cs)
        return jax.scipy.linalg.solve_triangular(
            Lc, jnp.eye(3, dtype=dtype), lower=True)

    Wg = _whiten3(pre.C[9:12, 9:12].astype(dtype))
    Wa = _whiten3(pre.C[12:15, 12:15].astype(dtype))
    g = jnp.asarray(gravity, dtype)

    def vis_chi2(T_bw):
        T_cw = lie.se3_mul(T_cb, T_bw)
        r, z, _, _ = _residuals_and_planes(T_cw, pts, uv, K)
        return jnp.sum(r * r, axis=-1) * info, z

    def residual_vec(state, w_vis):
        """Stacked whitened residual [2N + 9 + 6]; w_vis holds the frozen
        per-observation robust weights of this iteration."""
        T_bw, v, bg, ba = state
        T_cw = lie.se3_mul(T_cb, T_bw)
        r, _, _, _ = _residuals_and_planes(T_cw, pts, uv, K)
        sw = jnp.sqrt(w_vis)
        r_v = (r * sw[:, None]).reshape(-1)
        r_i = W9 @ inertial_edge_residual(
            T_bw_anchor, v_anchor, bg, ba, T_bw, v, pre, g)
        r_b = jnp.concatenate([Wg @ (bg - bg_anchor), Wa @ (ba - ba_anchor)])
        return jnp.concatenate([r_v, r_i, r_b])

    def retract(state, dx):
        T_bw, v, bg, ba = state
        return (lie.se3_retract(T_bw, dx[:6]), v + dx[6:9],
                bg + dx[9:12], ba + dx[12:15])

    def gn_round(state, active):
        def body(i, st):
            chi2, z = vis_chi2(st[0])
            rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            w = info * jnp.minimum(1.0, HUBER_DELTA / rn) * active * (z > 0)
            f = lambda dx: residual_vec(retract(st, dx), w)
            r0 = f(jnp.zeros((15,), dtype))
            J = jax.jacfwd(f)(jnp.zeros((15,), dtype))      # [M,15]
            H = J.T @ J
            b = J.T @ r0
            # decaying damping — same undershoot-bias rationale as
            # pose_optimization's gn_round above
            damp_i = damping * jnp.power(0.3, jnp.asarray(i, dtype))
            H = H + damp_i * jnp.eye(15, dtype=dtype) * (
                1.0 + jnp.trace(H) / 15.0)
            dx = jnp.linalg.solve(H, -b)
            dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx,
                           jnp.zeros_like(dx))
            return retract(st, dx)

        return jax.lax.fori_loop(0, iters, body, state)

    state = (T_bw_init, v_init, bg_init, ba_init)
    active = valid.astype(dtype)
    for _ in range(rounds):
        state = gn_round(state, active)
        chi2, z = vis_chi2(state[0])
        inl = valid & (chi2 <= CHI2_MONO) & (z > 0)
        active = inl.astype(dtype)

    chi2, z = vis_chi2(state[0])
    inliers = valid & (chi2 <= CHI2_MONO) & (z > 0)
    return state[0], state[1], state[2], state[3], inliers, chi2
