"""Joint visual-inertial bundle adjustment.

TPU-native `Optimizer::LocalInertialBA` (`orb_slam3/src/Optimizer.cc:2214`)
and `FullInertialBA` (`:358`): one batched Gauss-Newton problem over per-
keyframe 15-dof states (world->body pose tangent 6, velocity 3, gyro bias 3,
accel bias 3) plus map points, with

  * visual reprojection residuals (closed-form Jacobians, Huber at
    sqrt(5.991), the same math as mapping/ba.py),
  * 9-dof preintegration edges between consecutive keyframes, whitened by
    the inverse Cholesky of the preintegration covariance (the reference's
    `EdgeInertial` information matrix, `G2oTypes.cc`), Jacobians via
    forward-mode autodiff of the tangent retraction,
  * bias random-walk factors (`EdgeGyroRW`/`EdgeAccRW`),

and points Schur-eliminated exactly like the visual solver: 3x3 block
inversion, reduced state system solved dense (15L x 15L — window sizes are
tens of keyframes). The same function covers the local window
(LocalInertialBA) and the full map (FullInertialBA); only the inputs differ.

Conventions: pose state is T_bw (world->body); the camera sees through the
body-camera extrinsic `T_cb` (camera-from-body; identity when the camera is
the body frame, `Tbc` in the reference's Settings).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import imu, lie

CHI2_MONO = 5.991
HUBER_DELTA = math.sqrt(CHI2_MONO)


class ViWindow(NamedTuple):
    """Per-keyframe inertial states of a BA window."""

    T_bw: jnp.ndarray   # [L,7] world->body SE3
    v: jnp.ndarray      # [L,3] velocity (world)
    bg: jnp.ndarray     # [L,3] gyro bias
    ba: jnp.ndarray     # [L,3] accel bias


def _whiten9(C9, eps=1e-8):
    """Inverse Cholesky factor of the 9x9 preintegration covariance: returns
    W with W^T W = C^-1, i.e. whitened residual = W r."""
    Cs = 0.5 * (C9 + C9.T) + eps * jnp.eye(9, dtype=C9.dtype)
    Lc = jnp.linalg.cholesky(Cs)
    return jax.scipy.linalg.solve_triangular(
        Lc, jnp.eye(9, dtype=C9.dtype), lower=True
    )


def _body_from_Tbw(T_bw):
    """T_bw (world->body) -> (R_wb, p_w): body rotation/pos in world."""
    R_bw = lie.quat_to_matrix(lie.se3_q(T_bw))
    R_wb = R_bw.T
    p_w = -(R_wb @ lie.se3_t(T_bw))
    return R_wb, p_w


def inertial_edge_residual(T_bw_i, v_i, bg_i, ba_i, T_bw_j, v_j,
                           pre: imu.Preintegrated, gravity):
    """Whitened-later 9-dof residual (EdgeInertial::computeError)."""
    Ri, pi = _body_from_Tbw(T_bw_i)
    Rj, pj = _body_from_Tbw(T_bw_j)
    dT = pre.dT
    dR = imu.delta_rotation(pre, bg_i)
    dV = imu.delta_velocity(pre, bg_i, ba_i)
    dP = imu.delta_position(pre, bg_i, ba_i)
    r_R = lie.so3_log(lie.quat_from_matrix(dR.T @ Ri.T @ Rj))
    r_v = Ri.T @ (v_j - v_i - gravity * dT) - dV
    r_p = Ri.T @ (pj - pi - v_i * dT - 0.5 * gravity * dT * dT) - dP
    return jnp.concatenate([r_R, r_v, r_p])


@partial(jax.jit, static_argnames=("iters",))
def vi_bundle_adjust(
    win: ViWindow,    # [L] keyframe inertial states
    kf_fixed,         # [L] bool: pose gauge-fixed (vel/bias stay free)
    kf_xy,            # [L,F,2] observations
    kf_sigma2,        # [L,F]
    obs_pt,           # [L,F] int32 row into pts, -1 = none
    pts,              # [P,3]
    pt_opt,           # [P] bool
    K,                # [4] intrinsics
    T_cb,             # [7] camera-from-body extrinsic (identity = cam==body)
    pres: imu.Preintegrated,  # stacked [L-1]: edge k links k -> k+1
    pre_valid,        # [L-1] bool (False = no inertial edge, e.g. gap)
    gravity=None,
    w_bias_walk: float = 1e4,
    iters: int = 8,
    damping: float = 1e-3,
):
    """Returns (win', pts', total_chi2_visual)."""
    L, F = obs_pt.shape
    P = pts.shape[0]
    dtype = pts.dtype
    O = L * F
    g = jnp.asarray(imu.GRAVITY if gravity is None else gravity, dtype)

    okf = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[:, None], (L, F)).reshape(O)
    opt_row = obs_pt.reshape(O)
    ovalid = opt_row >= 0
    optc = jnp.clip(opt_row, 0)
    ouv = kf_xy.reshape(O, 2)
    oinfo = (1.0 / jnp.maximum(kf_sigma2, 1e-12)).reshape(O)
    free_pose = (~kf_fixed).astype(dtype)
    popt = pt_opt.astype(dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    eI = jnp.asarray([k for k in range(L - 1)], jnp.int32)

    Wwh = jax.vmap(lambda C: _whiten9(C[:9, :9]))(pres.C)  # [L-1,9,9]

    def cam_pose(T_bw):
        return lie.se3_mul(T_cb, T_bw)  # world->camera

    def visual_system(T_bw_all, points, active):
        Tc = jax.vmap(cam_pose)(T_bw_all)                # [L,7]
        X = points[optc]
        Rq = lie.se3_q(Tc)[okf]
        t = lie.se3_t(Tc)[okf]
        pc = lie.quat_rotate(Rq, X) + t
        x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        iz = 1.0 / zs
        ru = ouv[:, 0] - (K[0] * x * iz + K[2])
        rv = ouv[:, 1] - (K[1] * y * iz + K[3])
        chi2 = (ru * ru + rv * rv) * oinfo
        rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        w = oinfo * active * jnp.minimum(1.0, HUBER_DELTA / rn) * (z > 0)

        a00 = K[0] * iz
        a02 = -K[0] * x * iz * iz
        a11 = K[1] * iz
        a12 = -K[1] * y * iz * iz
        zero = jnp.zeros_like(x)
        # Jacobian wrt the CAMERA pose tangent; chain to the body tangent:
        # T_cw = T_cb * T_bw, and with left-retraction on T_bw,
        # d(T_cw)/d(xi_bw) = Ad(T_cb) acting on the camera tangent — for
        # T_cb = (R_cb, t_cb): [dt; dw]_cam = [R_cb dt + hat(t_cb) R_cb dw;
        # R_cb dw].
        Ju_c = jnp.stack([-a00, zero, -a02, -a02 * y, -a00 * z + a02 * x, a00 * y], -1)
        Jv_c = jnp.stack([zero, -a11, -a12, a11 * z - a12 * y, a12 * x, -a11 * x], -1)
        R_cb = lie.quat_to_matrix(lie.se3_q(T_cb))
        t_cb = lie.se3_t(T_cb)
        Adj = jnp.zeros((6, 6), dtype)
        Adj = Adj.at[0:3, 0:3].set(R_cb)
        Adj = Adj.at[0:3, 3:6].set(lie.hat(t_cb) @ R_cb)
        Adj = Adj.at[3:6, 3:6].set(R_cb)
        Ju = Ju_c @ Adj
        Jv = Jv_c @ Adj
        Ju = Ju * free_pose[okf, None]
        Jv = Jv * free_pose[okf, None]
        Rm = lie.quat_to_matrix(lie.se3_q(Tc))[okf]
        Pu = -(Rm[:, 0, :] * a00[:, None] + Rm[:, 2, :] * a02[:, None]) * popt[optc, None]
        Pv = -(Rm[:, 1, :] * a11[:, None] + Rm[:, 2, :] * a12[:, None]) * popt[optc, None]
        return ru, rv, Ju, Jv, Pu, Pv, w, chi2, z

    zero15 = jnp.zeros(15, dtype)

    def retract_one(T_bw, v, bg, ba, dx):
        return (lie.se3_retract(T_bw, dx[0:6]), v + dx[6:9],
                bg + dx[9:12], ba + dx[12:15])

    def inertial_system(w_state: ViWindow):
        def edge(k):
            Ti, vi_, bgi, bai = (w_state.T_bw[k], w_state.v[k],
                                 w_state.bg[k], w_state.ba[k])
            Tj, vj_ = w_state.T_bw[k + 1], w_state.v[k + 1]
            prek = jax.tree.map(lambda x: x[k], pres)
            Wk = Wwh[k]

            def f(dxi, dxj):
                Ti2, vi2, bgi2, bai2 = retract_one(Ti, vi_, bgi, bai, dxi)
                Tj2, vj2, _, _ = retract_one(Tj, vj_, jnp.zeros(3, dtype),
                                             jnp.zeros(3, dtype), dxj)
                return Wk @ inertial_edge_residual(
                    Ti2, vi2, bgi2, bai2, Tj2, vj2, prek, g
                )

            r = f(zero15, zero15)
            Ji = jax.jacfwd(f, argnums=0)(zero15, zero15)   # [9,15]
            Jj = jax.jacfwd(f, argnums=1)(zero15, zero15)
            return r, Ji, Jj

        return jax.vmap(edge)(eI)  # [L-1,9], [L-1,9,15] x2

    def gn_step(carry, _):
        w_state, points, active = carry
        ru, rv, Ju, Jv, Pu, Pv, w, chi2, z = visual_system(
            w_state.T_bw, points, active
        )

        # ---- visual blocks (pose part of the 15-dim state) ----
        Hcc6 = jnp.zeros((L, 6, 6), dtype).at[okf].add(
            w[:, None, None] * (Ju[:, :, None] * Ju[:, None, :]
                                + Jv[:, :, None] * Jv[:, None, :]))
        bc6 = jnp.zeros((L, 6), dtype).at[okf].add(
            w[:, None] * (Ju * ru[:, None] + Jv * rv[:, None]))
        Hpp = jnp.zeros((P, 3, 3), dtype).at[optc].add(
            (w * ovalid)[:, None, None] * (Pu[:, :, None] * Pu[:, None, :]
                                           + Pv[:, :, None] * Pv[:, None, :]))
        bp = jnp.zeros((P, 3), dtype).at[optc].add(
            (w * ovalid)[:, None] * (Pu * ru[:, None] + Pv * rv[:, None]))
        # dense coupling [L,6,3,P] via scatter over the obs list
        Wo = (w * ovalid)[:, None, None] * (
            Ju[:, :, None] * Pu[:, None, :] + Jv[:, :, None] * Pv[:, None, :]
        )  # [O,6,3]
        Wd = jnp.zeros((L, P, 6, 3), dtype).at[okf, optc].add(Wo)

        # point-block inversion
        trp = jnp.einsum("pii->p", Hpp)
        lam_p = damping * (1.0 + trp / 3.0)
        empty = trp < 1e-12
        Hpp_d = jnp.where(empty[:, None, None], eye3,
                          Hpp + lam_p[:, None, None] * eye3)
        from .ba import inv3x3
        Hpi = jnp.where(empty[:, None, None], 0.0, inv3x3(Hpp_d))

        # Schur corrections (pose rows only)
        WHi = jnp.einsum("lpij,pjk->lpik", Wd, Hpi)             # [L,P,6,3]
        A = WHi.transpose(0, 2, 1, 3).reshape(L * 6, P * 3)
        B = Wd.transpose(0, 2, 1, 3).reshape(L * 6, P * 3)
        S6 = jax.lax.dot_general(
            A, B, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(L, 6, L, 6)
        bc_corr = (A @ bp.reshape(-1)).reshape(L, 6)

        # ---- assemble the full [L,15,L,15] system ----
        H = jnp.zeros((L, 15, L, 15), dtype)
        ii = jnp.arange(L)
        H = H.at[ii, 0:6, ii, 0:6].add(
            jnp.moveaxis(Hcc6 - S6[ii, :, ii, :], 0, 0)
        )
        # visual off-diagonal Schur coupling
        off = -S6  # [L,6,L,6]
        off = off.at[ii, :, ii, :].set(0.0)
        H = H.at[:, 0:6, :, 0:6].add(off)
        b = jnp.zeros((L, 15), dtype)
        b = b.at[:, 0:6].add(bc6 - bc_corr)

        # ---- inertial edges ----
        r_in, Ji, Jj = inertial_system(w_state)
        wv = pre_valid.astype(dtype)
        # zero fixed-pose columns (vel/bias always free, like the reference)
        pose_cols = jnp.concatenate(
            [jnp.ones(6, dtype), jnp.zeros(9, dtype)])
        mi = jnp.where(kf_fixed[eI, None], 1.0 - pose_cols[None, :], 1.0)
        mj = jnp.where(kf_fixed[eI + 1, None], 1.0 - pose_cols[None, :], 1.0)
        Ji = Ji * wv[:, None, None] * mi[:, None, :]
        Jj = Jj * wv[:, None, None] * mj[:, None, :]
        r_inw = r_in * wv[:, None]
        H = H.at[eI, :, eI, :].add(jnp.einsum("eki,ekj->eij", Ji, Ji))
        H = H.at[eI + 1, :, eI + 1, :].add(jnp.einsum("eki,ekj->eij", Jj, Jj))
        Hij = jnp.einsum("eki,ekj->eij", Ji, Jj)
        H = H.at[eI, :, eI + 1, :].add(Hij)
        H = H.at[eI + 1, :, eI, :].add(jnp.swapaxes(Hij, -1, -2))
        b = b.at[eI].add(jnp.einsum("eki,ek->ei", Ji, r_inw))
        b = b.at[eI + 1].add(jnp.einsum("eki,ek->ei", Jj, r_inw))

        # ---- bias random walk ----
        wbw = w_bias_walk * wv
        r_bg = (w_state.bg[1:] - w_state.bg[:-1])
        r_ba = (w_state.ba[1:] - w_state.ba[:-1])
        for base, rwall in ((9, r_bg), (12, r_ba)):
            sl = slice(base, base + 3)
            H = H.at[eI, sl, eI, sl].add(wbw[:, None, None] * eye3)
            H = H.at[eI + 1, sl, eI + 1, sl].add(wbw[:, None, None] * eye3)
            H = H.at[eI, sl, eI + 1, sl].add(-wbw[:, None, None] * eye3)
            H = H.at[eI + 1, sl, eI, sl].add(-wbw[:, None, None] * eye3)
            b = b.at[eI, sl].add(-wbw[:, None] * rwall)
            b = b.at[eI + 1, sl].add(wbw[:, None] * rwall)

        # ---- damping, gauge, solve ----
        diag = jnp.einsum("lili->li", H)
        lam = damping * (1.0 + diag / 15.0)
        H = H.at[ii[:, None], jnp.arange(15)[None, :],
                 ii[:, None], jnp.arange(15)[None, :]].add(lam + 1e-8)
        # fixed POSE rows/cols -> identity (vel/bias stay estimated)
        pose_mask = (kf_fixed[:, None] * pose_cols[None, :])  # [L,15] 1=pin
        pm = pose_mask.reshape(-1) > 0
        Hm = H.reshape(L * 15, L * 15)
        Hm = jnp.where(pm[:, None] | pm[None, :], 0.0, Hm)
        Hm = Hm + jnp.diag(pm.astype(dtype))
        bv = jnp.where(pm, 0.0, b.reshape(-1))

        # Jacobi equilibration: the whitened inertial blocks carry ~1e8
        # information vs ~1e2 visual — without rescaling the f32 solve
        # loses all significant digits (the reference solves in double)
        d = jnp.sqrt(jnp.maximum(jnp.diag(Hm), 1e-12))
        di = 1.0 / d
        Heq = Hm * di[:, None] * di[None, :]
        dx = (jnp.linalg.solve(Heq, -bv * di) * di).reshape(L, 15)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        dx = dx * (1.0 - pose_mask)

        # backsub points: dp = Hpi (-(bp + W^T dc6))
        dc6 = dx[:, 0:6]
        WTdc = (dc6.reshape(-1) @ B).reshape(P, 3)
        dp = jnp.einsum("pij,pj->pi", Hpi, -(bp + WTdc))
        dp = jnp.where(jnp.isfinite(dp), dp, 0.0) * pt_opt[:, None]

        T2, v2, bg2, ba2 = jax.vmap(retract_one)(
            w_state.T_bw, w_state.v, w_state.bg, w_state.ba, dx
        )
        new_state = ViWindow(T_bw=T2, v=v2, bg=bg2, ba=ba2)
        return (new_state, points + dp, active), jnp.sum(jnp.where(ovalid, chi2, 0.0))

    active0 = ovalid.astype(dtype)
    (w_state, points, _), _ = jax.lax.scan(
        gn_step, (win, pts, active0), None, length=iters
    )
    # outlier pass + short re-optimize (two-stage like the visual solvers)
    ru, rv, *_ , chi2, z = _vis_chi2(w_state.T_bw, points, optc, okf, ouv,
                                     oinfo, K, T_cb)
    stage2 = ovalid & (chi2 <= CHI2_MONO) & (z > 0)
    (w_state, points, _), _ = jax.lax.scan(
        gn_step, (w_state, points, stage2.astype(dtype)), None, length=3
    )
    ru, rv, *_, chi2, z = _vis_chi2(w_state.T_bw, points, optc, okf, ouv,
                                    oinfo, K, T_cb)
    total = jnp.sum(jnp.where(ovalid & (chi2 <= CHI2_MONO) & (z > 0), chi2, 0.0))
    return w_state, points, total


def _vis_chi2(T_bw_all, points, optc, okf, ouv, oinfo, K, T_cb):
    Tc = jax.vmap(lambda T: lie.se3_mul(T_cb, T))(T_bw_all)
    X = points[optc]
    pc = lie.quat_rotate(lie.se3_q(Tc)[okf], X) + lie.se3_t(Tc)[okf]
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    ru = ouv[:, 0] - (K[0] * pc[:, 0] / zs + K[2])
    rv = ouv[:, 1] - (K[1] * pc[:, 1] / zs + K[3])
    chi2 = (ru * ru + rv * rv) * oinfo
    return ru, rv, chi2, z


# --------------------------------------------------------------------------
# IMU initialization (LocalMapping::InitializeIMU, LocalMapping.cc:1174)
# --------------------------------------------------------------------------

def estimate_gyro_bias(T_bw_list, pres: imu.Preintegrated):
    """Gyro bias from rotation-only alignment over the keyframe chain:
    minimize sum_k |Log(dR_k(bg)^T R_i^T R_j)|^2 — linearized closed form
    (`InertialOptimization` rotation part)."""
    L = T_bw_list.shape[0]

    def terms(k):
        Ri = lie.quat_to_matrix(lie.se3_q(T_bw_list[k])).T
        Rj = lie.quat_to_matrix(lie.se3_q(T_bw_list[k + 1])).T
        prek = jax.tree.map(lambda x: x[k], pres)
        r = lie.so3_log(lie.quat_from_matrix(prek.dR.T @ (Ri.T @ Rj)))
        return prek.JRg, r

    J, r = jax.vmap(terms)(jnp.arange(L - 1))
    H = jnp.einsum("kij,kil->jl", J, J)
    b = jnp.einsum("kij,ki->j", J, r)
    return jnp.linalg.solve(H + 1e-9 * jnp.eye(3), b)


def estimate_gravity_scale(T_bw_list, dts, pres: imu.Preintegrated,
                           g_norm: float = 9.81, bias_g=None):
    """Linear gravity + scale + per-KF velocity initialization from
    up-to-scale visual poses and preintegrated deltas (the classic
    VI-initialization linear system; the role of the reference's
    `InertialOptimization(map, Rwg, scale)` with fixed poses).

    Solves for x = [s, g_w(3), v_0..v_{L-1} (3L)] minimizing the
    position+velocity preintegration residuals; then projects g to norm
    g_norm. Returns (scale, g_w, velocities)."""
    L = T_bw_list.shape[0]
    Rwb = []
    p = []
    for k in range(L):
        Rk, pk = _body_from_Tbw(T_bw_list[k])
        Rwb.append(Rk)
        p.append(pk)
    Rwb = jnp.stack(Rwb)
    p = jnp.stack(p)

    bg = jnp.zeros(3) if bias_g is None else jnp.asarray(bias_g)
    n_unk = 4 + 3 * L
    rows = []
    rhs = []
    for k in range(L - 1):
        prek = jax.tree.map(lambda x: x[k], pres)
        dT = prek.dT
        dP = imu.delta_position(prek, bg, prek.bias_a)
        dV = imu.delta_velocity(prek, bg, prek.bias_a)
        # position: s*(p_j - p_i) = R_i dP + v_i dT + 0.5 g dT^2
        Ap = jnp.zeros((3, n_unk))
        Ap = Ap.at[:, 0].set(p[k + 1] - p[k])
        Ap = Ap.at[:, 1:4].set(-0.5 * dT * dT * jnp.eye(3))
        Ap = Ap.at[:, 4 + 3 * k:7 + 3 * k].set(-dT * jnp.eye(3))
        rows.append(Ap)
        rhs.append(Rwb[k] @ dP)
        # velocity: v_j - v_i - g dT = R_i dV
        Av = jnp.zeros((3, n_unk))
        Av = Av.at[:, 1:4].set(-dT * jnp.eye(3))
        Av = Av.at[:, 4 + 3 * k:7 + 3 * k].set(-jnp.eye(3))
        Av = Av.at[:, 7 + 3 * k:10 + 3 * k].set(jnp.eye(3))
        rows.append(Av)
        rhs.append(Rwb[k] @ dV)
    A = jnp.concatenate(rows)
    y = jnp.concatenate(rhs)
    x, *_ = jnp.linalg.lstsq(A, y)
    s = x[0]
    g_est = x[1:4]
    g_w = g_est / jnp.maximum(jnp.linalg.norm(g_est), 1e-9) * g_norm
    vels = x[4:].reshape(L, 3)
    return s, g_w, vels


def gravity_alignment_rotation(g_w, g_norm: float = 9.81):
    """Rotation R_gw taking the estimated world gravity to the canonical
    (0,0,-g) — applied to the whole map so GRAVITY is valid afterwards
    (the reference rotates with Rwg then uses (0,0,-G))."""
    g_target = jnp.asarray([0.0, 0.0, -g_norm], g_w.dtype)
    a = g_w / jnp.maximum(jnp.linalg.norm(g_w), 1e-9)
    b = g_target / g_norm
    v = jnp.cross(a, b)
    c = jnp.dot(a, b)
    s = jnp.linalg.norm(v)
    axis = v / jnp.where(s < 1e-9, 1.0, s)
    ang = jnp.arctan2(s, c)
    return lie.so3_exp(axis * ang)
