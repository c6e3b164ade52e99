"""Batched Levenberg-Marquardt bundle adjustment with Schur complement.

TPU-native replacement for g2o's sparse LM on the reference's BA problems
(`Optimizer::LocalBundleAdjustment` `orb_slam3/src/Optimizer.cc:1030`,
`GlobalBundleAdjustemnt` `:48`): camera/point block structure is exploited
exactly as g2o's Schur solver does, but fully batched.

Layout (TPU): everything observation-indexed is stored as PLANES with the
per-keyframe feature axis F in the 128-lane dimension — `[6, L, F]` camera
Jacobian rows, `[3, L, F]` point Jacobian rows — so products/reductions are
lane-dense, and the two heavy contractions are real MXU matmuls:

  * camera blocks  H_cc:  per-l [6,F] @ [F,6]
  * reduced system S = H_cc − W H_pp⁻¹ Wᵀ with W flattened to [6L, 3P]:
    one [6L,3P] @ [3P,6L] matmul.

Point blocks H_pp are [P,3,3] with closed-form damping/inverse; assembly
uses scatter-adds over the observation table. Huber kernel at sqrt(5.991) px
like the reference's mono edges; two optimization stages with outlier-edge
removal in between (the reference's 5-then-10-iteration scheme).

Closed-form Jacobians (same derivation as tracking/pose_opt.py; additionally
Jp = dr/dX = -A @ R since pc = R X + t).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import lie

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
    """Windowed BA. Returns (kf_pose', pts', total_chi2, inlier_mask [L,F])."""
    L, F = obs_pt.shape
    P = pts.shape[0]
    dtype = pts.dtype

    info = 1.0 / jnp.maximum(kf_sigma2, 1e-12)
    obs_valid = obs_pt >= 0
    pidx = jnp.clip(obs_pt, 0)
    free_cam = (~kf_fixed).astype(dtype)          # [L]
    eyeL = jnp.eye(3, dtype=dtype)

    # The observation->point incidence is CONSTANT across iterations: build
    # the one-hot [L,F,P] once and every per-iteration gather (point
    # positions) and scatter (H_pp/b_p/W assembly) becomes an MXU matmul —
    # random gather/scatter runs at ~85ns/element on TPU and would otherwise
    # dominate the entire solve.
    oh = (
        (pidx[..., None] == jnp.arange(P, dtype=jnp.int32)) & obs_valid[..., None]
    ).astype(dtype)                                # [L,F,P]

    def compute_system(poses, points, active, robust=True):
        """Residuals + Jacobian planes.

        Returns r [L,F,2], z [L,F], Ju/Jv [6,L,F], Pu/Pv [3,L,F], chi2, w."""
        Xo = jnp.einsum("lfp,pd->lfd", oh, points)            # gather-as-matmul
        q = lie.se3_q(poses)                                   # [L,4]
        t = lie.se3_t(poses)
        pc = lie.quat_rotate(q[:, None, :], Xo) + t[:, None, :]
        x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        inv_z = 1.0 / zs
        u_pred = K[0] * x * inv_z + K[2]
        v_pred = K[1] * y * inv_z + K[3]
        r = kf_xy - jnp.stack([u_pred, v_pred], axis=-1)

        a00 = K[0] * inv_z
        a02 = -K[0] * x * inv_z * inv_z
        a11 = K[1] * inv_z
        a12 = -K[1] * y * inv_z * inv_z
        zero = jnp.zeros_like(x)
        Ju = jnp.stack([-a00, zero, -a02, -a02 * y, -a00 * z + a02 * x, a00 * y])
        Jv = jnp.stack([zero, -a11, -a12, a11 * z - a12 * y, a12 * x, -a11 * x])

        # Jp = -A @ R, rows: Pu_j = -(a00 R0j + a02 R2j), Pv_j = -(a11 R1j + a12 R2j)
        R = lie.quat_to_matrix(q)                              # [L,3,3]
        R0 = R[:, 0, :][:, None, :]                            # [L,1,3]
        R1 = R[:, 1, :][:, None, :]
        R2 = R[:, 2, :][:, None, :]
        Pu = -(a00[..., None] * R0 + a02[..., None] * R2)      # [L,F,3]
        Pv = -(a11[..., None] * R1 + a12[..., None] * R2)
        Pu = jnp.moveaxis(Pu, -1, 0)                           # [3,L,F]
        Pv = jnp.moveaxis(Pv, -1, 0)

        chi2 = jnp.sum(r * r, axis=-1) * info
        w = info * active
        if robust:
            rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            w = w * jnp.minimum(1.0, HUBER_DELTA / rn)
        w = w * (z > 0)
        return r, z, Ju, Jv, Pu, Pv, chi2, w

    def gn_step(carry, _):
        poses, points, active = carry
        r, z, Ju, Jv, Pu, Pv, chi2, w = compute_system(poses, points, active)

        # gate fixed cameras / constant points
        Juc = Ju * free_cam[None, :, None]
        Jvc = Jv * free_cam[None, :, None]
        popt_obs = pt_opt[pidx].astype(dtype)                  # [L,F]
        Puc = Pu * popt_obs[None]
        Pvc = Pv * popt_obs[None]

        ru, rv = r[..., 0], r[..., 1]

        # camera blocks: per-l [6,F] @ [F,6] (MXU, F in lanes)
        Hcc = jnp.einsum("ilf,lf,jlf->lij", Juc, w, Juc) + jnp.einsum(
            "ilf,lf,jlf->lij", Jvc, w, Jvc
        )
        bc = jnp.einsum("ilf,lf->li", Juc, w * ru) + jnp.einsum(
            "ilf,lf->li", Jvc, w * rv
        )

        # point blocks: [3,3,L,F] plane products, assembled by matmul.
        # tensorfloat32 (3-pass) is plenty for Hessian assembly — the solve
        # is damped GN; the gather of point POSITIONS stays full f32.
        with jax.default_matmul_precision("tensorfloat32"):
            HppV = (
                Puc[:, None] * Puc[None, :] + Pvc[:, None] * Pvc[None, :]
            ) * w[None, None]                                  # [3,3,L,F]
            Hpp = jnp.einsum("lfp,ijlf->pij", oh, HppV)
            bpV = Puc * (w * ru)[None] + Pvc * (w * rv)[None]  # [3,L,F]
            bp = jnp.einsum("lfp,ilf->pi", oh, bpV)

            # coupling [L,P,6,3]: per-l [P,F] @ [F,18]
            WV = (Juc[:, None] * Puc[None, :] + Jvc[:, None] * Pvc[None, :]) * w[None, None]
            W = jnp.einsum("lfp,ijlf->lpij", oh, WV)

        # damp + closed-form invert point blocks
        trp = jnp.einsum("pii->p", Hpp)
        lam_p = damping * (1.0 + trp / 3.0)
        Hpp_d = Hpp + lam_p[:, None, None] * eyeL
        empty = trp < 1e-12
        Hpp_d = jnp.where(empty[:, None, None], eyeL, Hpp_d)
        Hpp_inv = jnp.linalg.inv(Hpp_d)
        Hpp_inv = jnp.where(empty[:, None, None], 0.0, Hpp_inv)

        # Schur complement via one [6L,3P] @ [3P,6L] matmul
        Wm = W.transpose(0, 2, 1, 3)                            # [L,6,P,3]
        WHi = jnp.einsum("lqpj,pjk->lqpk", Wm, Hpp_inv)
        Wm_flat = Wm.reshape(L * 6, P * 3)
        WHi_flat = WHi.reshape(L * 6, P * 3)
        S_off = jax.lax.dot_general(
            WHi_flat, Wm_flat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(L, 6, L, 6).transpose(0, 2, 1, 3)             # [L,L,6,6]

        S = -S_off
        S = S.at[jnp.arange(L), jnp.arange(L)].add(Hcc)
        lam_c = damping * (1.0 + jnp.einsum("lii->l", Hcc) / 6.0)
        eye6 = jnp.eye(6, dtype=dtype)
        S = S.at[jnp.arange(L), jnp.arange(L)].add(lam_c[:, None, None] * eye6)
        # fixed cameras: identity rows keep S well-posed
        fix2 = kf_fixed[:, None] | kf_fixed[None, :]
        S = jnp.where(fix2[:, :, None, None], 0.0, S)
        S = S.at[jnp.arange(L), jnp.arange(L)].add(kf_fixed[:, None, None] * eye6)

        rhs = -(bc.reshape(-1) - WHi_flat @ bp.reshape(-1))
        rhs = (rhs.reshape(L, 6) * free_cam[:, None]).reshape(-1)

        Sm = S.transpose(0, 2, 1, 3).reshape(L * 6, L * 6)
        dc = jnp.linalg.solve(Sm, rhs).reshape(L, 6)
        dc = jnp.where(jnp.isfinite(dc), dc, 0.0) * free_cam[:, None]

        # back-substitution: dp = Hpp^-1 (-(bp + W^T dc))
        Wt_dc = (dc.reshape(-1) @ Wm_flat).reshape(P, 3)
        dp = jnp.einsum("pij,pj->pi", Hpp_inv, -(bp + Wt_dc))
        dp = jnp.where(jnp.isfinite(dp), dp, 0.0) * pt_opt[:, None]

        new_poses = jax.vmap(lie.se3_retract)(poses, dc)
        new_points = points + dp
        return (new_poses, new_points, active), jnp.sum(jnp.where(obs_valid, chi2, 0.0))

    active0 = obs_valid.astype(dtype)
    (poses, points, _), _ = jax.lax.scan(
        gn_step, (kf_pose, pts, active0), None, length=iters
    )
    # drop outlier edges, re-optimize (reference stage 2)
    r, z = _resid_only(poses, points, pidx, kf_xy, K)
    chi2 = jnp.sum(r * r, axis=-1) * info
    stage2 = obs_valid & (chi2 <= CHI2_MONO) & (z > 0)
    (poses, points, _), _ = jax.lax.scan(
        gn_step, (poses, points, stage2.astype(dtype)), None, length=stage2_iters
    )
    r, z = _resid_only(poses, points, pidx, kf_xy, K)
    chi2 = jnp.sum(r * r, axis=-1) * info
    inliers = obs_valid & (chi2 <= CHI2_MONO) & (z > 0)
    total = jnp.sum(jnp.where(inliers, chi2, 0.0))
    return poses, points, total, inliers


def _resid_only(poses, points, pidx, kf_xy, K):
    Xo = points[pidx]
    pc = lie.quat_rotate(lie.se3_q(poses)[:, None, :], Xo) + lie.se3_t(poses)[:, None, :]
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K[0] * pc[..., 0] / zs + K[2]
    v = K[1] * pc[..., 1] / zs + K[3]
    return kf_xy - jnp.stack([u, v], axis=-1), z
