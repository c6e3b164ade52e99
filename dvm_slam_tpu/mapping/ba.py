"""Batched Levenberg-Marquardt bundle adjustment with Schur complement.

TPU-native replacement for g2o's sparse LM on the reference's BA problems
(`Optimizer::LocalBundleAdjustment` `orb_slam3/src/Optimizer.cc:1030`,
`GlobalBundleAdjustemnt` `:48`): camera/point block structure is exploited
exactly as g2o's Schur solver does, but fully batched.

TPU layout rules this file lives by:
  1. Observation-indexed tensors keep the BIG axis (F or P) in the last
     (128-lane) dimension: camera Jacobian planes `[6,L,F]`, point Jacobian
     planes `[3,L,F]`, point-block tensors `[3,3,P]` / `[L,6,3,P]`.
     Small-minor-dim layouts like `[L,F,2,6]` waste ~95% of every vector
     register and MXU tile.
  2. The constant observation->point incidence becomes a one-hot `[L,F,P]`
     built ONCE per solve; per-iteration point gathers (positions) and
     scatters (H_pp/b_p/W assembly) are einsums whose OUTPUT axis is the big
     one — a small-output matmul pads to 128 lanes and throws away 14-43x
     of the MXU.
  3. The reduced camera system S = H_cc − W H_pp⁻¹ Wᵀ is one
     [6L,3P] @ [3P,6L] matmul + a dense [6L,6L] solve.

Huber kernel at sqrt(5.991) px like the reference's mono edges; two
optimization stages with outlier-edge removal in between (the reference's
5-then-10-iteration scheme). Closed-form Jacobians (derivation in
tracking/pose_opt.py; additionally Jp = dr/dX = -A @ R since pc = R X + t).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import lie

CHI2_MONO = 5.991
HUBER_DELTA = math.sqrt(CHI2_MONO)


def inv3x3(A, eps: float = 1e-12):
    """Closed-form batched 3x3 inverse (adjugate / det).

    `jnp.linalg.inv` lowers to an LU custom-call that executes serially per
    batch element on TPU — profiled at ~50% of the whole BA solve. The
    cofactor form is a handful of fused VPU ops."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    M = jnp.stack([
        jnp.stack([A11, A12, A13], -1),
        jnp.stack([A21, A22, A23], -1),
        jnp.stack([A31, A32, A33], -1),
    ], -2)
    return M * inv_det[..., None, None]


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
    eye3 = jnp.eye(3, dtype=dtype)

    # one-hot incidence, built once (indices are constant across iterations)
    oh = (
        (pidx[..., None] == jnp.arange(P, dtype=jnp.int32)) & obs_valid[..., None]
    ).astype(dtype)                                # [L,F,P]

    ru_obs = kf_xy[..., 0]                         # [L,F]
    rv_obs = kf_xy[..., 1]

    def compute_system(poses, points, active, robust=True):
        """Residuals + Jacobian planes, all [., L, F]."""
        # gather-as-matmul with the big axis (F) as the matmul output
        Xo = jnp.einsum("pd,lfp->ldf", points, oh)             # [L,3,F]
        R = lie.quat_to_matrix(lie.se3_q(poses))               # [L,3,3]
        t = lie.se3_t(poses)
        pc = jnp.einsum("lij,ljf->lif", R, Xo) + t[:, :, None]  # [L,3,F]
        x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]                 # [L,F]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        inv_z = 1.0 / zs
        ru = ru_obs - (K[0] * x * inv_z + K[2])
        rv = rv_obs - (K[1] * y * inv_z + K[3])

        a00 = K[0] * inv_z
        a02 = -K[0] * x * inv_z * inv_z
        a11 = K[1] * inv_z
        a12 = -K[1] * y * inv_z * inv_z
        zero = jnp.zeros_like(x)
        Ju = jnp.stack([-a00, zero, -a02, -a02 * y, -a00 * z + a02 * x, a00 * y])
        Jv = jnp.stack([zero, -a11, -a12, a11 * z - a12 * y, a12 * x, -a11 * x])

        # Jp rows: Pu_d = -(a00 R[l,0,d] + a02 R[l,2,d]); Pv analogous
        R0 = jnp.moveaxis(R[:, 0, :], -1, 0)                   # [3,L]
        R1 = jnp.moveaxis(R[:, 1, :], -1, 0)
        R2 = jnp.moveaxis(R[:, 2, :], -1, 0)
        Pu = -(R0[:, :, None] * a00[None] + R2[:, :, None] * a02[None])  # [3,L,F]
        Pv = -(R1[:, :, None] * a11[None] + R2[:, :, None] * a12[None])

        chi2 = (ru * ru + rv * rv) * info
        w = info * active
        if robust:
            rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            w = w * jnp.minimum(1.0, HUBER_DELTA / rn)
        w = w * (z > 0)
        return ru, rv, z, Ju, Jv, Pu, Pv, chi2, w

    def gn_step(carry, _):
        poses, points, active = carry
        ru, rv, z, Ju, Jv, Pu, Pv, chi2, w = compute_system(poses, points, active)

        # gate fixed cameras / constant points
        Juc = Ju * free_cam[None, :, None]
        Jvc = Jv * free_cam[None, :, None]
        popt_obs = jnp.einsum("p,lfp->lf", pt_opt.astype(dtype), oh)
        Puc = Pu * popt_obs[None]
        Pvc = Pv * popt_obs[None]

        # camera blocks: per-l [6,F] @ [F,6] (F in lanes)
        Hcc = jnp.einsum("ilf,lf,jlf->lij", Juc, w, Juc) + jnp.einsum(
            "ilf,lf,jlf->lij", Jvc, w, Jvc
        )
        bc = jnp.einsum("ilf,lf->li", Juc, w * ru) + jnp.einsum(
            "ilf,lf->li", Jvc, w * rv
        )

        # point blocks: outputs keep P in lanes
        HppV = (
            Puc[:, None] * Puc[None, :] + Pvc[:, None] * Pvc[None, :]
        ) * w[None, None]                                      # [3,3,L,F]
        HppP = jnp.einsum("ijlf,lfp->ijp", HppV, oh)           # [3,3,P]
        Hpp = jnp.moveaxis(HppP, -1, 0)                        # [P,3,3]
        bpV = Puc * (w * ru)[None] + Pvc * (w * rv)[None]      # [3,L,F]
        bpP = jnp.einsum("ilf,lfp->ip", bpV, oh)               # [3,P]

        # coupling: [L,6,3,P]
        WV = (Juc[:, None] * Puc[None, :] + Jvc[:, None] * Pvc[None, :]) * w[None, None]
        W = jnp.einsum("ijlf,lfp->lijp", WV, oh)               # [L,6,3,P]

        # damp + closed-form invert point blocks
        trp = jnp.einsum("pii->p", Hpp)
        lam_p = damping * (1.0 + trp / 3.0)
        Hpp_d = Hpp + lam_p[:, None, None] * eye3
        empty = trp < 1e-12
        Hpp_d = jnp.where(empty[:, None, None], eye3, Hpp_d)
        Hpp_inv = inv3x3(Hpp_d)
        Hpp_inv = jnp.where(empty[:, None, None], 0.0, Hpp_inv)

        # Schur complement via one [6L,3P] @ [3P,6L] matmul
        WHi = jnp.einsum("lijp,pjk->likp", W, Hpp_inv)         # [L,6,3,P]
        Wf = W.reshape(L * 6, 3 * P)
        WHif = WHi.reshape(L * 6, 3 * P)
        S_off = jax.lax.dot_general(
            WHif, Wf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(L, 6, L, 6).transpose(0, 2, 1, 3)            # [L,L,6,6]

        S = -S_off
        S = S.at[jnp.arange(L), jnp.arange(L)].add(Hcc)
        lam_c = damping * (1.0 + jnp.einsum("lii->l", Hcc) / 6.0)
        eye6 = jnp.eye(6, dtype=dtype)
        S = S.at[jnp.arange(L), jnp.arange(L)].add(lam_c[:, None, None] * eye6)
        # fixed cameras: identity rows keep S well-posed
        fix2 = kf_fixed[:, None] | kf_fixed[None, :]
        S = jnp.where(fix2[:, :, None, None], 0.0, S)
        S = S.at[jnp.arange(L), jnp.arange(L)].add(kf_fixed[:, None, None] * eye6)

        rhs = -(bc.reshape(-1) - WHif @ bpP.reshape(-1))
        rhs = (rhs.reshape(L, 6) * free_cam[:, None]).reshape(-1)

        Sm = S.transpose(0, 2, 1, 3).reshape(L * 6, L * 6)
        dc = jnp.linalg.solve(Sm, rhs).reshape(L, 6)
        dc = jnp.where(jnp.isfinite(dc), dc, 0.0) * free_cam[:, None]

        # back-substitution: dp = Hpp^-1 (-(bp + W^T dc))
        Wt_dc = (dc.reshape(-1) @ Wf).reshape(3, P)            # [3,P]
        dp = jnp.einsum(
            "pij,pj->pi", Hpp_inv, -(bpP.T + Wt_dc.T)
        )
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
