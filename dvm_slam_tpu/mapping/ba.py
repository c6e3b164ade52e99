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
from ..ops.pallas_scatter import onehot_adjoint, onehot_gather

CHI2_MONO = 5.991
HUBER_DELTA = math.sqrt(CHI2_MONO)
CHI2_STEREO = 7.815  # chi2(3dof), stereo edges (`Optimizer.cc:1106`)
HUBER_DELTA_STEREO = math.sqrt(CHI2_STEREO)

# bundle_adjust_pcg picks its Schur strategy by the dense-coupling footprint:
# below this, the [L,P,6,3] coupling matrix is materialized once per LM
# iteration and every Schur product is an MXU matmul; above it, matrix-free
# PCG with per-observation scatters (scalable, slower per iteration).
_DENSE_W_MAX_BYTES = 384 * 1024 * 1024


def _block_jacobi_pcg(Sm, Minv_d, r0, iters: int):
    """PCG on a dense SPD reduced camera system with 6x6 block-Jacobi
    preconditioning. `jnp.linalg.solve`'s LU custom call executes serially
    on TPU (profiled at ~0.8 ms per [120,120] solve — ~70% of a whole BA
    iteration); ~30 MXU matvecs replace it at a fraction of the cost.

    Sm [6L,6L], Minv_d [L,6,6] inverse diagonal blocks, r0 [6L]."""
    L = Minv_d.shape[0]

    def precond(r):
        return jnp.einsum("lij,lj->li", Minv_d, r.reshape(L, 6)).reshape(-1)

    z0 = precond(r0)

    def body(_, st):
        xk, rk, pk, rzk = st
        Ap = Sm @ pk
        alpha = rzk / jnp.maximum(jnp.dot(pk, Ap), 1e-30)
        xk = xk + alpha * pk
        rk = rk - alpha * Ap
        zk = precond(rk)
        rzn = jnp.dot(rk, zk)
        beta = rzn / jnp.maximum(rzk, 1e-30)
        return xk, rk, zk + beta * pk, rzn

    x, _, _, _ = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros_like(r0), r0, z0, jnp.dot(r0, z0))
    )
    return x


def inv3x3_planes(A, eps: float = 1e-12):
    """Closed-form 3x3 inverse in plane-major layout: A [3,3,...] with the
    batch in TRAILING (lane) dimensions -> [3,3,...]. Pure VPU elementwise
    ops; no [N,3,3] transpose ever materializes (profiled: the layout
    shuffles around minor-dim-3 tensors cost more than the whole Schur
    product on TPU)."""
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d, e, f = A[1, 0], A[1, 1], A[1, 2]
    g, h, i = A[2, 0], A[2, 1], A[2, 2]
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
    rows = [[A11, A12, A13], [A21, A22, A23], [A31, A32, A33]]
    return jnp.stack([jnp.stack(r) for r in rows]) * inv_det[None, None]


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


@partial(jax.jit, static_argnames=("iters", "stage2_iters", "schur_iters",
                                   "adjoint_dtype"))
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
    kf_ur=None,   # optional [L,F] stereo right-u (-1 mono); with bf adds the
                  # third residual row (EdgeStereoSE3ProjectXYZ role)
    bf=None,      # fx * baseline
    schur_iters: int = 32,  # PCG iterations on the reduced camera system
    adjoint_dtype: str = "float32",  # MXU dtype for the adjoint contraction
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
    stereo = None if kf_ur is None else (kf_ur >= 0.0) & obs_valid
    chi2_th = CHI2_MONO if kf_ur is None else jnp.where(
        stereo, CHI2_STEREO, CHI2_MONO
    )
    delta_h = HUBER_DELTA if kf_ur is None else jnp.where(
        stereo, HUBER_DELTA_STEREO, HUBER_DELTA
    )
    # observation -> point incidence for the adjoint contraction: invalid
    # slots get -1 (they match no column); valid weights are already zeroed
    # for invalid obs, so this is belt-and-braces
    pidx_adj = jnp.where(obs_valid, pidx, -1)

    ru_obs = kf_xy[..., 0]                         # [L,F]
    rv_obs = kf_xy[..., 1]

    def compute_system(poses, points_pl):
        """Residuals + Jacobian planes, all [., L, F]. points_pl: [3,P]."""
        # one-hot MXU gather (XLA's row gather profiled at ~25% of a whole
        # iteration) and explicit rotation FMAs: a [L,3,3]@[L,3,F] batched
        # matmul has M=3 and lowers to a slow tiny-matmul path; 9 broadcast
        # FMAs stay on the VPU
        Xo = onehot_gather(points_pl, pidx_adj)                # [L,3,F]
        R = lie.quat_to_matrix(lie.se3_q(poses))               # [L,3,3]
        t = lie.se3_t(poses)

        def rot_row(i):
            return (R[:, i, 0, None] * Xo[:, 0] + R[:, i, 1, None] * Xo[:, 1]
                    + R[:, i, 2, None] * Xo[:, 2] + t[:, i, None])

        x, y, z = rot_row(0), rot_row(1), rot_row(2)           # [L,F]
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
        if kf_ur is None:
            rw = zw = Jw = Pw = None
        else:
            # stereo third row: same plane pattern with a02 -> a02 + bf/z^2
            c = bf * inv_z * inv_z
            a02s = a02 + c
            rw_ = kf_ur - (K[0] * x * inv_z + K[2] - bf * inv_z)
            rw = jnp.where(stereo, rw_, 0.0)
            Jw = jnp.stack([-a00, zero, -a02s, -a02s * y,
                            -a00 * z + a02s * x, a00 * y])
            Pw = -(R0[:, :, None] * a00[None] + R2[:, :, None] * a02s[None])
            chi2 = chi2 + rw * rw * info
        # robust base weight (active mask applied by the caller)
        rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        w_base = info * jnp.minimum(1.0, delta_h / rn) * (z > 0)
        return ru, rv, rw, z, Ju, Jv, Jw, Pu, Pv, Pw, chi2, w_base

    def robust_cost(chi2, active):
        # Huber rho on the whitened squared residual (g2o's robustChi2):
        # rho(s) = s for sqrt(s) <= delta, else 2*delta*sqrt(s) - delta^2.
        rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        rho = jnp.where(rn <= delta_h, chi2, 2.0 * delta_h * rn - delta_h * delta_h)
        return jnp.sum(rho * active)

    def gn_step(carry, k):
        poses, points_pl, active, best_poses, best_points, best_cost, lam, \
            stage_done = carry
        ru, rv, rw, z, Ju, Jv, Jw, Pu, Pv, Pw, chi2, w_base = compute_system(
            poses, points_pl)
        # ---- LM step acceptance (g2o semantics, deferred by one iteration).
        # Pure GN with fixed damping accepts divergent steps: on a
        # near-degenerate window ONE exploding solve scales the cameras ~x9,
        # every edge then fails the stage-2 chi2 cut, weights go to zero and
        # all later BAs are exact no-ops — the map is permanently poisoned
        # (measured on the monocular circuit bench). Instead: evaluate the
        # robust cost of the CURRENT state; if it is worse than the best
        # accepted state, revert to the best, raise lambda and retry; else
        # accept and decay lambda. The evaluation reuses the residual pass
        # every iteration computes anyway, so rejection costs one wasted
        # solve, never an extra residual pass.
        cost_cur = robust_cost(chi2, active)
        reject = cost_cur > best_cost
        # stage boundary (reference's two-stage scheme, `Optimizer.cc:1030`
        # tail): once past `iters` steps and on an ACCEPTED state, drop
        # outlier edges by chi2 at the current estimate, then keep optimizing
        # — folded into ONE scan instead of two scans with a full residual
        # pass in between
        stage2_mask = (obs_valid & (chi2 <= chi2_th) & (z > 0)).astype(dtype)
        do_stage = (~reject) & (k >= iters) & (~stage_done)
        active = jnp.where(do_stage, stage2_mask, active)
        stage_done = stage_done | do_stage
        # cost under the (possibly narrowed) mask — masking only removes
        # non-negative terms, so the comparison stays monotone
        cost_eff = jnp.where(do_stage, robust_cost(chi2, active), cost_cur)
        best_cost = jnp.where(reject, best_cost, cost_eff)
        best_poses = jnp.where(reject, best_poses, poses)
        best_points = jnp.where(reject, best_points, points_pl)
        lam = jnp.clip(jnp.where(reject, lam * 4.0, lam * 0.5), 1e-7, 1e3)
        w = w_base * active

        # gate fixed cameras / constant points
        Juc = Ju * free_cam[None, :, None]
        Jvc = Jv * free_cam[None, :, None]
        popt_obs = (pt_opt[pidx] & obs_valid).astype(dtype)     # [L,F] gather
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
        bpV = Puc * (w * ru)[None] + Pvc * (w * rv)[None]      # [3,L,F]
        # coupling values
        WV = (Juc[:, None] * Puc[None, :] + Jvc[:, None] * Pvc[None, :]) * w[None, None]

        if kf_ur is not None:
            ws = w * stereo
            Jwc = Jw * free_cam[None, :, None]
            Pwc = Pw * popt_obs[None]
            Hcc = Hcc + jnp.einsum("ilf,lf,jlf->lij", Jwc, ws, Jwc)
            bc = bc + jnp.einsum("ilf,lf->li", Jwc, ws * rw)
            HppV = HppV + (Pwc[:, None] * Pwc[None, :]) * ws[None, None]
            bpV = bpV + Pwc * (ws * rw)[None]
            WV = WV + (Jwc[:, None] * Pwc[None, :]) * ws[None, None]

        # ONE fused adjoint contraction per iteration: stack the 30 value
        # planes (HppV 9 | bpV 3 | WV 18) and contract with the incidence
        # once — on TPU a Pallas kernel builds each one-hot tile in VMEM so
        # no [L,F,P] tensor ever touches HBM (ops/pallas_scatter.py)
        Vals = jnp.concatenate([
            HppV.reshape(9, L, F), bpV, WV.reshape(18, L, F)
        ], axis=0).transpose(1, 0, 2)                          # [L,30,F]
        Fused = onehot_adjoint(Vals, pidx_adj, P,
                               dot_dtype=adjoint_dtype)        # [L,30,P]
        # everything below stays plane-major (P in lanes): the [P,3,3]-major
        # formulation forced layout transposes around every minor-dim-3
        # tensor, which profiled at ~60% of the whole GN iteration
        HppP = jnp.sum(Fused[:, :9], axis=0).reshape(3, 3, P)  # [3,3,P]
        bpP = jnp.sum(Fused[:, 9:12], axis=0)                  # [3,P]
        W = Fused[:, 12:].reshape(L, 6, 3, P)                  # [L,6,3,P]

        # damp + closed-form invert point blocks (VPU, lane-parallel)
        trp = HppP[0, 0] + HppP[1, 1] + HppP[2, 2]             # [P]
        lam_p = lam * (1.0 + trp / 3.0)
        eyeP = eye3[:, :, None]
        Hpp_d = HppP + lam_p[None, None] * eyeP
        empty = trp < 1e-12
        Hpp_d = jnp.where(empty[None, None], eyeP, Hpp_d)
        Hpi = jnp.where(empty[None, None], 0.0, inv3x3_planes(Hpp_d))

        # WHi[l,i,k,p] = sum_j W[l,i,j,p] Hpi[j,k,p] — unrolled FMAs beat
        # both the 5-D broadcast-sum and an einsum here (measured)
        WHi = jnp.stack(
            [W[:, :, 0] * Hpi[None, None, 0, k]
             + W[:, :, 1] * Hpi[None, None, 1, k]
             + W[:, :, 2] * Hpi[None, None, 2, k] for k in range(3)],
            axis=2,
        )
        # S_off[l1,i,l2,k] = sum_{j,p} WHi[l1,i,j,p] W[l2,k,j,p]
        S_off = jax.lax.dot_general(
            WHi, W, dimension_numbers=(((2, 3), (2, 3)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # [L,6,L,6]

        ii = jnp.arange(L)
        S = -S_off
        S = S.at[ii, :, ii, :].add(Hcc)
        lam_c = lam * (1.0 + jnp.einsum("lii->l", Hcc) / 6.0)
        eye6 = jnp.eye(6, dtype=dtype)
        S = S.at[ii, :, ii, :].add(lam_c[:, None, None] * eye6)
        # fixed cameras: identity rows keep S well-posed
        fix2 = kf_fixed[:, None] | kf_fixed[None, :]
        S = jnp.where(fix2[:, None, :, None], 0.0, S)
        S = S.at[ii, :, ii, :].add(kf_fixed[:, None, None] * eye6)

        # rhs[l,i] = -(bc - sum_{j,p} WHi[l,i,j,p] bpP[j,p])
        rhs = -(bc - jax.lax.dot_general(
            WHi, bpP, dimension_numbers=(((2, 3), (0, 1)), ((), ()))))
        rhs = (rhs * free_cam[:, None]).reshape(-1)

        Sm = S.reshape(L * 6, L * 6)
        Minv_d = _inv6x6_block(S[ii, :, ii, :])
        dc = _block_jacobi_pcg(Sm, Minv_d, rhs, schur_iters).reshape(L, 6)
        dc = jnp.where(jnp.isfinite(dc), dc, 0.0) * free_cam[:, None]

        # back-substitution: dp = Hpp^-1 (-(bp + W^T dc)), all [3,P] planes
        Wt_dc = jax.lax.dot_general(
            dc, W, dimension_numbers=(((0, 1), (0, 1)), ((), ())))  # [3,P]
        rhs_p = -(bpP + Wt_dc)
        dpP = jnp.sum(Hpi * rhs_p[None], axis=1)               # [3,P]
        dpP = jnp.where(jnp.isfinite(dpP), dpP, 0.0) * pt_opt[None, :]

        # on reject: revert to the best state and take no step (the solve at
        # the rejected state is discarded; next iteration recomputes there)
        new_poses = jnp.where(reject, best_poses,
                              jax.vmap(lie.se3_retract)(poses, dc))
        new_points = jnp.where(reject, best_points, points_pl + dpP)
        return ((new_poses, new_points, active, best_poses, best_points,
                 best_cost, lam, stage_done),
                jnp.sum(jnp.where(obs_valid, chi2, 0.0)))

    active0 = obs_valid.astype(dtype)
    points0 = pts.T
    # +1 step so the last real step is itself cost-evaluated; the returned
    # state is the best ACCEPTED one, so a divergent final step cannot leak
    steps = jnp.arange(iters + stage2_iters + 1, dtype=jnp.int32)
    carry0 = (kf_pose, points0, active0, kf_pose, points0,
              jnp.asarray(jnp.inf, dtype), jnp.asarray(damping, dtype),
              jnp.asarray(False))
    (_, _, _, poses, points_pl, _, _, _), _ = jax.lax.scan(
        gn_step, carry0, steps
    )
    # final residual pass for the returned chi2/inlier classification
    sys_fin = compute_system(poses, points_pl)
    z, chi2 = sys_fin[3], sys_fin[10]
    inliers = obs_valid & (chi2 <= chi2_th) & (z > 0)
    total = jnp.sum(jnp.where(inliers, chi2, 0.0))
    return poses, points_pl.T, total, inliers


# --------------------------------------------------------------------------
# matrix-free global BA: PCG on the Schur complement
# --------------------------------------------------------------------------

def _inv6x6_block(H, eps: float = 1e-12):
    """Batched closed-form 6x6 inverse via 2x2-of-3x3 block Schur complement
    (avoids the serial per-batch LU custom call, same rationale as inv3x3).
    H: [...,6,6] assumed invertible (damped)."""
    A = H[..., :3, :3]
    B = H[..., :3, 3:]
    C = H[..., 3:, :3]
    D = H[..., 3:, 3:]
    Ai = inv3x3(A, eps)
    S = D - C @ Ai @ B
    Si = inv3x3(S, eps)
    AiB = Ai @ B
    CAi = C @ Ai
    top = jnp.concatenate([Ai + AiB @ Si @ CAi, -AiB @ Si], -1)
    bot = jnp.concatenate([-Si @ CAi, Si], -1)
    return jnp.concatenate([top, bot], -2)


@partial(jax.jit, static_argnames=("lm_iters", "pcg_iters", "stage2_iters"))
def bundle_adjust_pcg(
    kf_pose,      # [L,7] poses (world->cam)
    kf_fixed,     # [L] bool
    kf_xy,        # [L,F,2] observations
    kf_sigma2,    # [L,F]
    obs_pt,       # [L,F] int32 row into pts, -1 = none
    pts,          # [P,3]
    pt_opt,       # [P] bool
    K,            # [4]
    kf_ur=None,   # optional [L,F] stereo right-u (-1 mono); with bf adds the
                  # disparity residual row (pins metric scale in global BA)
    bf=None,      # fx * baseline
    lm_iters: int = 8,
    pcg_iters: int = 40,
    stage2_iters: int = 4,
    damping: float = 1e-4,
):
    """Full-map bundle adjustment without the dense [L,F,P] incidence of
    `bundle_adjust`: observation-list assembly + preconditioned conjugate
    gradient on the implicit reduced camera system
        S = Hcc - W Hpp^-1 W^T
    (the `ITERATIVE_SCHUR` strategy). Memory is O(L*F), so it scales to the
    full keyframe capacity — this is the path `LoopClosing::
    RunGlobalBundleAdjustment` (`LoopClosing.cc:2267`) maps onto, with no
    silent truncation of keyframes or points.

    Returns (kf_pose', pts', total_chi2, inlier_mask [L,F])."""
    L, F = obs_pt.shape
    P = pts.shape[0]
    dtype = pts.dtype
    O = L * F

    okf = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[:, None], (L, F)).reshape(O)
    opt_row = obs_pt.reshape(O)
    ovalid0 = opt_row >= 0
    optc = jnp.clip(opt_row, 0)
    ouv = kf_xy.reshape(O, 2)
    oinfo = (1.0 / jnp.maximum(kf_sigma2, 1e-12)).reshape(O)
    if kf_ur is not None:
        our = kf_ur.reshape(O)
        stereo_o = (our >= 0.0) & ovalid0
        stereo_f = stereo_o.astype(pts.dtype)
        chi2_th = jnp.where(stereo_o, CHI2_STEREO, CHI2_MONO)
        delta_h = jnp.where(stereo_o, HUBER_DELTA_STEREO, HUBER_DELTA)
    else:
        chi2_th = CHI2_MONO
        delta_h = HUBER_DELTA
    free_cam = (~kf_fixed).astype(dtype)
    popt = pt_opt.astype(dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)

    def residuals(poses, points):
        X = points[optc]                              # [O,3]
        Rq = lie.se3_q(poses)[okf]
        t = lie.se3_t(poses)[okf]
        pc = lie.quat_rotate(Rq, X) + t
        x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        inv_z = 1.0 / zs
        ru = ouv[:, 0] - (K[0] * x * inv_z + K[2])
        rv = ouv[:, 1] - (K[1] * y * inv_z + K[3])
        if kf_ur is None:
            rw = jnp.zeros_like(ru)
        else:
            rw = jnp.where(stereo_o,
                           our - (K[0] * x * inv_z + K[2] - bf * inv_z), 0.0)
        return ru, rv, rw, x, y, z, inv_z

    def robust_cost(chi2, active):
        rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        rho = jnp.where(rn <= delta_h, chi2,
                        2.0 * delta_h * rn - delta_h * delta_h)
        return jnp.sum(rho * active)

    def lm_step(carry, _):
        # LM with deferred step acceptance (see bundle_adjust.gn_step): a
        # cost-increasing step is reverted on the next iteration and lambda
        # raised; the best accepted state is what the scan returns.
        poses, points, active, best_poses, best_points, best_cost, lam = carry
        ru, rv, rw, x, y, z, inv_z = residuals(poses, points)
        chi2 = (ru * ru + rv * rv + rw * rw) * oinfo
        cost_cur = robust_cost(chi2, active)
        reject = cost_cur > best_cost
        best_cost = jnp.where(reject, best_cost, cost_cur)
        best_poses = jnp.where(reject, best_poses, poses)
        best_points = jnp.where(reject, best_points, points)
        lam = jnp.clip(jnp.where(reject, lam * 4.0, lam * 0.5), 1e-7, 1e3)
        rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        w = oinfo * active * jnp.minimum(1.0, delta_h / rn) * (z > 0)

        a00 = K[0] * inv_z
        a02 = -K[0] * x * inv_z * inv_z
        a11 = K[1] * inv_z
        a12 = -K[1] * y * inv_z * inv_z
        zero = jnp.zeros_like(x)
        # camera Jacobian rows [O,6] (same closed form as bundle_adjust)
        Ju = jnp.stack([-a00, zero, -a02, -a02 * y, -a00 * z + a02 * x, a00 * y], -1)
        Jv = jnp.stack([zero, -a11, -a12, a11 * z - a12 * y, a12 * x, -a11 * x], -1)
        Ju = Ju * free_cam[okf, None]
        Jv = Jv * free_cam[okf, None]
        # point Jacobian rows [O,3]: -(a00 R0 + a02 R2), -(a11 R1 + a12 R2)
        Rm = lie.quat_to_matrix(lie.se3_q(poses))[okf]  # [O,3,3]
        Pu = -(Rm[:, 0, :] * a00[:, None] + Rm[:, 2, :] * a02[:, None])
        Pv = -(Rm[:, 1, :] * a11[:, None] + Rm[:, 2, :] * a12[:, None])
        Pu = Pu * popt[optc, None]
        Pv = Pv * popt[optc, None]

        # camera blocks: observations are row-major ([L,F] flattened), so
        # the per-camera reduction is a plain reshape+sum — no scatter
        ccv = w[:, None, None] * (Ju[:, :, None] * Ju[:, None, :]
                                  + Jv[:, :, None] * Jv[:, None, :])
        bcv = w[:, None] * (Ju * ru[:, None] + Jv * rv[:, None])
        hpv = w[:, None, None] * (Pu[:, :, None] * Pu[:, None, :]
                                  + Pv[:, :, None] * Pv[:, None, :])
        bpv = w[:, None] * (Pu * ru[:, None] + Pv * rv[:, None])
        Wo = w[:, None, None] * (Ju[:, :, None] * Pu[:, None, :]
                                 + Jv[:, :, None] * Pv[:, None, :])  # [O,6,3]
        if kf_ur is not None:
            # stereo third row: same plane pattern with a02 -> a02 + bf/z^2
            a02s = a02 + bf * inv_z * inv_z
            Jw = jnp.stack([-a00, zero, -a02s, -a02s * y,
                            -a00 * z + a02s * x, a00 * y], -1)
            Jw = Jw * free_cam[okf, None]
            Pw = -(Rm[:, 0, :] * a00[:, None] + Rm[:, 2, :] * a02s[:, None])
            Pw = Pw * popt[optc, None]
            ws = w * stereo_f
            ccv = ccv + ws[:, None, None] * (Jw[:, :, None] * Jw[:, None, :])
            bcv = bcv + (ws * rw)[:, None] * Jw
            hpv = hpv + ws[:, None, None] * (Pw[:, :, None] * Pw[:, None, :])
            bpv = bpv + (ws * rw)[:, None] * Pw
            Wo = Wo + ws[:, None, None] * (Jw[:, :, None] * Pw[:, None, :])
        Hcc = ccv.reshape(L, F, 6, 6).sum(axis=1)
        bc = bcv.reshape(L, F, 6).sum(axis=1)
        Hpp = jnp.zeros((P, 3, 3), dtype).at[optc].add(
            hpv * ovalid0[:, None, None])
        bp = jnp.zeros((P, 3), dtype).at[optc].add(
            bpv * ovalid0[:, None])

        trp = jnp.einsum("pii->p", Hpp)
        lam_p = lam * (1.0 + trp / 3.0)
        Hpp_d = Hpp + lam_p[:, None, None] * eye3
        empty = trp < 1e-12
        Hpp_inv = jnp.where(
            empty[:, None, None], 0.0, inv3x3(jnp.where(empty[:, None, None], eye3, Hpp_d))
        )

        trc = jnp.einsum("lii->l", Hcc)
        lam_c = lam * (1.0 + trc / 6.0)
        Hcc_d = Hcc + lam_c[:, None, None] * eye6
        Hcc_d = jnp.where(kf_fixed[:, None, None], eye6, Hcc_d)

        # TPU scatters are slow; with a dense per-iteration coupling matrix
        # Wd [L,P,6,3] (ONE scatter per iteration), every Schur product is
        # an MXU matmul. Memory L*P*72B — fine up to a few hundred KFs; past
        # `_DENSE_W_MAX_BYTES` fall back to matrix-free PCG whose matvecs
        # scatter per observation (scalable, slower per iteration).
        use_dense = L * P * 72 <= _DENSE_W_MAX_BYTES

        if use_dense:
            Wd = jnp.zeros((L, P, 6, 3), dtype).at[okf, optc].add(
                Wo * ovalid0[:, None, None]
            )
            WHid = Wd @ Hpp_inv[None]                           # [L,P,6,3]
            A = WHid.transpose(0, 2, 1, 3).reshape(L * 6, P * 3)
            B = Wd.transpose(0, 2, 1, 3).reshape(L * 6, P * 3)
            S_off = jax.lax.dot_general(
                A, B, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(L, 6, L, 6)
            ii = jnp.arange(L)
            S = -S_off
            S = S.at[ii, :, ii, :].add(Hcc_d)
            fix2 = kf_fixed[:, None] | kf_fixed[None, :]
            S = jnp.where(fix2[:, None, :, None], 0.0, S)
            S = S.at[ii, :, ii, :].add(kf_fixed[:, None, None] * eye6)
            rhs = -(bc - (A @ bp.reshape(-1)).reshape(L, 6))
            rhs = rhs * free_cam[:, None]
            Sm = S.reshape(L * 6, L * 6)
            # solve the dense SPD reduced system with block-Jacobi PCG:
            # the LU/Cholesky custom call serializes on TPU (it dominated
            # global-BA wall time); ~40 matvec iterations of a [6L,6L]
            # matmul stay entirely on the MXU
            Minv_d = _inv6x6_block(S[ii, :, ii, :])
            dc = _block_jacobi_pcg(Sm, Minv_d, rhs.reshape(-1),
                                   pcg_iters).reshape(L, 6)
            dc = jnp.where(jnp.isfinite(dc), dc, 0.0) * free_cam[:, None]
            WTdc = (dc.reshape(-1) @ B).reshape(P, 3)
            dp = jnp.einsum("pij,pj->pi", Hpp_inv, -(bp + WTdc))
        else:
            def WT_x(xc):      # [L,6] -> [P,3]  (W^T x via obs scatter)
                v = jnp.einsum("oij,oi->oj", Wo, xc[okf])
                return jnp.zeros((P, 3), dtype).at[optc].add(v * ovalid0[:, None])

            def W_u(u):        # [P,3] -> [L,6]
                g = jnp.einsum("oij,oj->oi", Wo, u[optc]) * ovalid0[:, None]
                return jnp.zeros((L, 6), dtype).at[okf].add(g)

            def S_mv(xc):      # reduced-camera-system matvec
                Hx = jnp.einsum("lij,lj->li", Hcc_d, xc)
                u = jnp.einsum("pij,pj->pi", Hpp_inv, WT_x(xc))
                return (Hx - W_u(u)) * free_cam[:, None] + xc * kf_fixed[:, None]

            rhs = -(bc - W_u(jnp.einsum("pij,pj->pi", Hpp_inv, bp)))
            rhs = rhs * free_cam[:, None]
            Minv = _inv6x6_block(Hcc_d)  # block-Jacobi preconditioner

            def pcg(rhs):
                x0 = jnp.zeros((L, 6), dtype)
                r0 = rhs
                z0 = jnp.einsum("lij,lj->li", Minv, r0)
                p0 = z0
                rz0 = jnp.sum(r0 * z0)

                def body(_, st):
                    xk, rk, pk, rzk = st
                    Ap = S_mv(pk)
                    alpha = rzk / jnp.maximum(jnp.sum(pk * Ap), 1e-30)
                    xk = xk + alpha * pk
                    rk = rk - alpha * Ap
                    zk = jnp.einsum("lij,lj->li", Minv, rk)
                    rzn = jnp.sum(rk * zk)
                    beta = rzn / jnp.maximum(rzk, 1e-30)
                    return xk, rk, zk + beta * pk, rzn

                x, _, _, _ = jax.lax.fori_loop(0, pcg_iters, body,
                                               (x0, r0, p0, rz0))
                return x

            dc = pcg(rhs)
            dc = jnp.where(jnp.isfinite(dc), dc, 0.0) * free_cam[:, None]
            dp = jnp.einsum("pij,pj->pi", Hpp_inv, -(bp + WT_x(dc)))
        dp = jnp.where(jnp.isfinite(dp), dp, 0.0) * pt_opt[:, None]

        new_poses = jnp.where(reject, best_poses,
                              jax.vmap(lie.se3_retract)(poses, dc))
        new_points = jnp.where(reject, best_points, points + dp)
        return ((new_poses, new_points, active, best_poses, best_points,
                 best_cost, lam),
                jnp.sum(jnp.where(ovalid0, chi2, 0.0)))

    def run_stage(poses, points, active, n):
        # n+1 steps so the last real step is itself evaluated; return the
        # best ACCEPTED state, never an unevaluated final step
        carry0 = (poses, points, active, poses, points,
                  jnp.asarray(jnp.inf, dtype), jnp.asarray(damping, dtype))
        (_, _, _, bp, bx, _, _), _ = jax.lax.scan(
            lm_step, carry0, None, length=n + 1)
        return bp, bx

    active0 = ovalid0.astype(dtype)
    poses, points = run_stage(kf_pose, pts, active0, lm_iters)
    # stage 2: drop outlier edges, re-optimize (reference two-stage scheme)
    ru, rv, rw, _, _, z, _ = residuals(poses, points)
    chi2 = (ru * ru + rv * rv + rw * rw) * oinfo
    stage2 = ovalid0 & (chi2 <= chi2_th) & (z > 0)
    poses, points = run_stage(poses, points, stage2.astype(dtype), stage2_iters)
    ru, rv, rw, _, _, z, _ = residuals(poses, points)
    chi2 = (ru * ru + rv * rv + rw * rw) * oinfo
    inliers = ovalid0 & (chi2 <= chi2_th) & (z > 0)
    total = jnp.sum(jnp.where(inliers, chi2, 0.0))
    return poses, points, total, inliers.reshape(L, F)
