"""Batched Levenberg-Marquardt bundle adjustment with Schur complement.

TPU-native replacement for g2o's sparse LM on the reference's BA problems
(`Optimizer::LocalBundleAdjustment` `orb_slam3/src/Optimizer.cc:1030`,
`GlobalBundleAdjustemnt` `:48`): camera/point block structure is exploited
exactly as g2o's Schur solver does, but fully batched —

  * residuals/Jacobians: one vmapped autodiff pass over the dense
    per-keyframe feature table `kf_obs [K,F]` (zero padding waste: F is the
    per-KF observation list),
  * H_pp: [P,3,3] block diagonal, inverted in closed form,
  * W:    [L,P,6,3] camera-point coupling, built by scatter-add,
  * reduced camera system S = H_cc − W H_pp⁻¹ Wᵀ: a [6L,6L] dense Cholesky
    solve (L = local window ≤ ~40 cameras → ≤ 240x240, trivially MXU-sized),
  * back-substitution for point updates.

Huber kernel at sqrt(5.991) px like the reference's mono edges; gauge fixed
by the caller-provided `kf_fixed` mask (reference fixes all observers outside
the covisible window plus keyframe 0, `Optimizer.cc:1090-1107`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import cameras, lie
from . import map_state

CHI2_MONO = 5.991
HUBER_DELTA = jnp.sqrt(CHI2_MONO)


@partial(jax.jit, static_argnames=("iters", "stage2_iters"))
def bundle_adjust(
    kf_pose,      # [L,7] poses of the L window keyframes (world->cam)
    kf_fixed,     # [L] bool: True = pose held constant (gauge / out-of-window)
    kf_xy,        # [L,F,2] undistorted observations
    kf_sigma2,    # [L,F] per-observation pixel variance
    obs_pt,       # [L,F] int32 -> row into pts (NOT global map slot), -1 none
    pts,          # [P,3] point positions (rows referenced by obs_pt)
    pt_opt,       # [P] bool: optimize this point (False = constant)
    K,            # [4] intrinsics
    iters: int = 10,
    damping: float = 1e-4,
    stage2_iters: int = 5,
):
    """Windowed BA. Returns (kf_pose', pts', total_chi2, inlier_mask [L,F]).

    Two-stage like the reference (`Optimizer.cc:1030` runs 5 iterations,
    drops chi2>5.991 edges, then 10 more): `iters` robust iterations,
    re-classify outliers, then `stage2_iters` with outlier edges removed.
    """
    L, F = obs_pt.shape
    P = pts.shape[0]
    dtype = pts.dtype

    info = 1.0 / jnp.maximum(kf_sigma2, 1e-12)
    obs_valid = obs_pt >= 0
    pidx = jnp.clip(obs_pt, 0)

    def compute_system(poses, points, active, robust=True):
        """Closed-form residuals + Jacobians (same derivation as
        tracking.pose_opt._residuals_and_jacobians; additionally
        Jp = dr/dX = -A @ R since pc = R X + t)."""
        Xo = points[pidx]  # [L,F,3]
        pc = jax.vmap(lambda T, Xs: jax.vmap(lambda X: lie.se3_apply(T, X))(Xs))(
            poses, Xo
        )  # [L,F,3]
        x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        inv_z = 1.0 / zs
        u_pred = K[0] * x * inv_z + K[2]
        v_pred = K[1] * y * inv_z + K[3]
        r = kf_xy - jnp.stack([u_pred, v_pred], axis=-1)

        fx, fy = K[0], K[1]
        zero = jnp.zeros_like(x)
        A = jnp.stack(
            [
                jnp.stack([fx * inv_z, zero, -fx * x * inv_z * inv_z], -1),
                jnp.stack([zero, fy * inv_z, -fy * y * inv_z * inv_z], -1),
            ],
            axis=-2,
        )  # [L,F,2,3]
        Jv = -A
        Jw = jnp.einsum("lfij,lfjk->lfik", A, lie.hat(pc))
        Jc = jnp.concatenate([Jv, Jw], axis=-1)                 # [L,F,2,6]
        R = jax.vmap(lambda T: lie.quat_to_matrix(lie.se3_q(T)))(poses)  # [L,3,3]
        Jp = -jnp.einsum("lfij,ljk->lfik", A, R)                # [L,F,2,3]

        chi2 = jnp.sum(r * r, axis=-1) * info
        w = info * active
        if robust:
            rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            w = w * jnp.minimum(1.0, HUBER_DELTA / rn)
        w = w * (z > 0)
        return r, Jc, Jp, chi2, w, z

    def gn_step(carry, _):
        poses, points, active = carry
        r, Jc, Jp, chi2, w, z = compute_system(poses, points, active)

        # zero out jacobians of fixed cameras / constant points
        Jc = Jc * (~kf_fixed)[:, None, None, None]
        popt_obs = pt_opt[pidx]  # [L,F]
        Jp = Jp * popt_obs[..., None, None]

        # camera blocks
        Hcc = jnp.einsum("lfki,lf,lfkj->lij", Jc, w, Jc)      # [L,6,6]
        bc = jnp.einsum("lfki,lf,lfk->li", Jc, w, r)          # [L,6]
        # point blocks (scatter over point rows)
        Hpp_obs = jnp.einsum("lfki,lf,lfkj->lfij", Jp, w, Jp)  # [L,F,3,3]
        bp_obs = jnp.einsum("lfki,lf,lfk->lfi", Jp, w, r)      # [L,F,3]
        Hpp = jnp.zeros((P, 3, 3), dtype).at[pidx].add(
            Hpp_obs * obs_valid[..., None, None]
        )
        bp = jnp.zeros((P, 3), dtype).at[pidx].add(bp_obs * obs_valid[..., None])
        # coupling W[l,p] = sum_f Jc^T w Jp
        W_obs = jnp.einsum("lfki,lf,lfkj->lfij", Jc, w, Jp)    # [L,F,6,3]
        W = jnp.zeros((L, P, 6, 3), dtype)
        W = W.at[jnp.arange(L)[:, None], pidx].add(W_obs * obs_valid[..., None, None])

        # damp + invert point blocks
        lam_p = damping * (1.0 + jnp.einsum("pii->p", Hpp) / 3.0)
        Hpp_d = Hpp + lam_p[:, None, None] * jnp.eye(3, dtype=dtype)
        # guard empty points
        empty = jnp.einsum("pii->p", Hpp) < 1e-12
        Hpp_d = jnp.where(empty[:, None, None], jnp.eye(3, dtype=dtype), Hpp_d)
        Hpp_inv = jnp.linalg.inv(Hpp_d)
        Hpp_inv = jnp.where(empty[:, None, None], 0.0, Hpp_inv)

        # Schur complement
        WHi = jnp.einsum("apij,pjk->apik", W, Hpp_inv)          # [L,P,6,3]
        S_off = jnp.einsum("apik,bplk->abil", WHi, W)           # [L,L,6,6]
        S = -S_off
        S = S.at[jnp.arange(L), jnp.arange(L)].add(Hcc)
        lam_c = damping * (1.0 + jnp.einsum("lii->l", Hcc) / 6.0)
        S = S.at[jnp.arange(L), jnp.arange(L)].add(
            lam_c[:, None, None] * jnp.eye(6, dtype=dtype)
        )
        # fixed cameras: identity rows to keep S well-posed
        eye_blk = jnp.eye(6, dtype=dtype)
        S = jnp.where(
            (kf_fixed[:, None] | kf_fixed[None, :])[:, :, None, None],
            jnp.zeros_like(S), S,
        )
        S = S.at[jnp.arange(L), jnp.arange(L)].add(kf_fixed[:, None, None] * eye_blk)

        rhs = -(bc - jnp.einsum("apik,pk->ai", WHi, bp))        # [L,6]
        rhs = rhs * (~kf_fixed)[:, None]

        Sm = S.transpose(0, 2, 1, 3).reshape(L * 6, L * 6)
        dc = jnp.linalg.solve(Sm, rhs.reshape(-1)).reshape(L, 6)
        dc = jnp.where(jnp.isfinite(dc), dc, 0.0)
        dc = dc * (~kf_fixed)[:, None]

        dp = jnp.einsum("pij,pj->pi", Hpp_inv, -(bp + jnp.einsum("apij,ai->pj", W, dc)))
        dp = jnp.where(jnp.isfinite(dp), dp, 0.0) * pt_opt[:, None]

        new_poses = jax.vmap(lie.se3_retract)(poses, dc)
        new_points = points + dp
        return (new_poses, new_points, active), jnp.sum(jnp.where(obs_valid, chi2, 0.0))

    active0 = obs_valid.astype(dtype)
    (poses, points, _), _ = jax.lax.scan(
        gn_step, (kf_pose, pts, active0), None, length=iters
    )
    # drop outlier edges, re-optimize (reference stage 2)
    r, Jc, Jp, chi2, w, z = compute_system(poses, points, active0, robust=False)
    stage2 = obs_valid & (chi2 <= CHI2_MONO) & (z > 0)
    (poses, points, _), _ = jax.lax.scan(
        gn_step, (poses, points, stage2.astype(dtype)), None, length=stage2_iters
    )
    r, Jc, Jp, chi2, w, z = compute_system(poses, points, active0, robust=False)
    inliers = obs_valid & (chi2 <= CHI2_MONO) & (z > 0)
    total = jnp.sum(jnp.where(inliers, chi2, 0.0))
    return poses, points, total, inliers
