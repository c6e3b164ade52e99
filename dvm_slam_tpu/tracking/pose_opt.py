"""Pose-only optimization (motion-only bundle adjustment).

TPU-native `Optimizer::PoseOptimization` (`orb_slam3/src/Optimizer.cc:744`):
4 outer rounds x 10 Gauss-Newton/LM iterations, Huber kernel at
delta = sqrt(5.991), chi2(2dof) = 5.991 outlier re-classification between
rounds, outliers excluded from the next round (reference semantics
`Optimizer.cc:929-931`). One jitted program; the per-observation 2x6
Jacobians come from forward-mode autodiff of the retraction — no hand-coded
Jacobians to get wrong.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import cameras, lie

CHI2_MONO = 5.991
HUBER_DELTA = jnp.sqrt(CHI2_MONO)


def _residual(T, X, uv, K):
    """[2] reprojection residual of one point under pose T (world->cam)."""
    pc = lie.se3_apply(T, X)
    uvp, _ = cameras.pinhole_project(K, pc)
    return uv - uvp, pc[2]


def _residuals_and_jacobians(T, pts, uv, K):
    """Batched residuals [N,2], depths [N], Jacobians [N,2,6] wrt the
    left-multiplied se3 tangent (v, omega) at zero — closed form.

    With pc = T X, r = uv - pi(pc), A = d pi/d pc:
      dr/dv     = -A
      dr/domega = A @ hat(pc)
    (left perturbation: pc' ~= pc + v + omega x pc).
    """
    pc = jax.vmap(lambda X: lie.se3_apply(T, X))(pts)          # [N,3]
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z = 1.0 / zs
    u_pred = K[0] * x * inv_z + K[2]
    v_pred = K[1] * y * inv_z + K[3]
    r = uv - jnp.stack([u_pred, v_pred], axis=-1)

    fx, fy = K[0], K[1]
    zero = jnp.zeros_like(x)
    # A = d pi / d pc, [N,2,3]
    A = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * x * inv_z * inv_z], -1),
            jnp.stack([zero, fy * inv_z, -fy * y * inv_z * inv_z], -1),
        ],
        axis=-2,
    )
    Jv = -A
    Jw = jnp.einsum("nij,njk->nik", A, lie.hat(pc))
    J = jnp.concatenate([Jv, Jw], axis=-1)                      # [N,2,6]
    return r, z, J


@partial(jax.jit, static_argnames=("rounds", "iters"))
def pose_optimization(T_init, pts, uv, sigma2, valid, K,
                      rounds: int = 4, iters: int = 10, damping: float = 1e-3):
    """Optimize a world->camera pose against fixed 3D points.

    Args:
      T_init: [7] SE3 world->camera.
      pts:    [N,3] world points.
      uv:     [N,2] observed (undistorted) pixels.
      sigma2: [N] keypoint level variance (pixels^2), `mvLevelSigma2`.
      valid:  [N] bool observation mask.
      K:      [4] fx fy cx cy.

    Returns: (T [7], inliers [N] bool, chi2 [N]).
    """
    info = 1.0 / jnp.maximum(sigma2, 1e-12)

    def gn_round(T, active):
        def body(_, T):
            r, z, J = _residuals_and_jacobians(T, pts, uv, K)
            chi2 = jnp.sum(r * r, axis=-1) * info
            # Huber IRLS weight on top of the information weight
            rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            w_h = jnp.minimum(1.0, HUBER_DELTA / rn)
            w = info * w_h * active
            H = jnp.einsum("nki,n,nkj->ij", J, w, J)
            b = jnp.einsum("nki,n,nk->i", J, w, r)
            H = H + damping * jnp.eye(6, dtype=T.dtype) * (1.0 + jnp.trace(H) / 6.0)
            dx = jnp.linalg.solve(H, -b)
            # residual is (obs - pred) so step direction is -H^-1 J^T r;
            # guard non-finite solves
            dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
            return lie.se3_retract(T, dx)

        return jax.lax.fori_loop(0, iters, body, T)

    active = valid.astype(T_init.dtype)
    T = T_init
    for _ in range(rounds):
        T = gn_round(T, active)
        r, z, _ = _residuals_and_jacobians(T, pts, uv, K)
        chi2 = jnp.sum(r * r, axis=-1) * info
        inl = valid & (chi2 <= CHI2_MONO) & (z > 0)
        active = inl.astype(T_init.dtype)

    r, z, _ = _residuals_and_jacobians(T, pts, uv, K)
    chi2 = jnp.sum(r * r, axis=-1) * info
    inliers = valid & (chi2 <= CHI2_MONO) & (z > 0)
    return T, inliers, chi2
