"""Inertial factors + inertial-only optimization.

The optimization side of the visual-inertial pipeline (`Optimizer.cc`:
`FullInertialBA` `:358`, `InertialOptimization` `:2820,2996` and the inertial
edge of `G2oTypes.cc`): the preintegration residual of Forster et al. between
consecutive keyframe states, bias random-walk factors, and a batched
Gauss-Newton solver over (pose, velocity, bias) chains. Jacobians come from
forward-mode autodiff of the tangent retraction (these run per keyframe
pair, not per frame — autodiff cost is irrelevant here).

State per keyframe: (q_wb [4], p_w [3], v_w [3], bg [3], ba [3]) — body-to-
world convention like the reference's `VertexPose` ImuCamPose.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import imu, lie


class ImuState(NamedTuple):
    q: jnp.ndarray   # [N,4] body->world rotation
    p: jnp.ndarray   # [N,3] position (world)
    v: jnp.ndarray   # [N,3] velocity (world)
    bg: jnp.ndarray  # [N,3] gyro bias
    ba: jnp.ndarray  # [N,3] accel bias


def inertial_residual(qi, pi, vi, bgi, bai, qj, pj, vj, pre: imu.Preintegrated,
                      gravity=imu.GRAVITY):
    """9-dof preintegration residual between keyframes i and j
    (`EdgeInertial::computeError` semantics):
       r_R = Log( dR(bg)^T R_i^T R_j )
       r_v = R_i^T (v_j - v_i - g dT) - dV(bg, ba)
       r_p = R_i^T (p_j - p_i - v_i dT - 0.5 g dT^2) - dP(bg, ba)
    """
    Ri = lie.quat_to_matrix(qi)
    Rj = lie.quat_to_matrix(qj)
    dT = pre.dT
    dR = imu.delta_rotation(pre, bgi)
    dV = imu.delta_velocity(pre, bgi, bai)
    dP = imu.delta_position(pre, bgi, bai)
    r_R = lie.so3_log(lie.quat_from_matrix(dR.T @ Ri.T @ Rj))
    r_v = Ri.T @ (vj - vi - gravity * dT) - dV
    r_p = Ri.T @ (pj - pi - vi * dT - 0.5 * gravity * dT * dT) - dP
    return jnp.concatenate([r_R, r_v, r_p])


def _retract_state(s: ImuState, dx):
    """dx [N,15] = (dphi, dp, dv, dbg, dba)."""
    q = jax.vmap(lambda qq, d: lie.quat_mul(lie.so3_exp(d), qq))(s.q, dx[:, 0:3])
    return ImuState(
        q=jax.vmap(lie.quat_normalize)(q),
        p=s.p + dx[:, 3:6],
        v=s.v + dx[:, 6:9],
        bg=s.bg + dx[:, 9:12],
        ba=s.ba + dx[:, 12:15],
    )


@partial(jax.jit, static_argnames=("iters",))
def inertial_optimization(state: ImuState, pres: imu.Preintegrated,
                          prior_q, prior_p, fixed,
                          w_inertial: float = 1.0,
                          w_prior_rot: float = 1e2,
                          w_prior_pos: float = 1e2,
                          w_bias_walk: float = 1e3,
                          iters: int = 15, damping: float = 1e-4):
    """Chain visual-inertial optimization (`FullInertialBA` structure with
    pose priors standing in for the reprojection factors — the visual side
    supplies `prior_q/prior_p`, e.g. keyframe poses from the monocular map):

      * inertial 9-dof edges between consecutive keyframes (preintegrations
        `pres` stacked along the leading axis, entry k links k -> k+1),
      * bias random-walk factors between consecutive states,
      * rotation/position priors on every non-fixed state.

    Returns (state', final_cost). Used for IMU initialization (gravity/bias/
    velocity estimation given up-to-scale visual poses) and as the inertial
    refinement after merges.
    """
    N = state.q.shape[0]

    def residuals(s: ImuState):
        def edge(k):
            return inertial_residual(
                s.q[k], s.p[k], s.v[k], s.bg[k], s.ba[k],
                s.q[k + 1], s.p[k + 1], s.v[k + 1],
                jax.tree.map(lambda x: x[k], pres),
            )

        r_in = jnp.stack([edge(k) for k in range(N - 1)])         # [N-1,9]
        r_bw = jnp.concatenate([
            (s.bg[1:] - s.bg[:-1]), (s.ba[1:] - s.ba[:-1])
        ], axis=-1)                                                # [N-1,6]
        r_pr_rot = jax.vmap(
            lambda qa, qb: lie.so3_log(lie.quat_mul(lie.quat_conj(qb), qa))
        )(s.q, prior_q)                                            # [N,3]
        r_pr_pos = s.p - prior_p                                   # [N,3]
        return (
            jnp.sqrt(w_inertial) * r_in.reshape(-1),
            jnp.sqrt(w_bias_walk) * r_bw.reshape(-1),
            jnp.sqrt(w_prior_rot) * r_pr_rot.reshape(-1),
            jnp.sqrt(w_prior_pos) * r_pr_pos.reshape(-1),
        )

    def stacked(dx_flat, s):
        s2 = _retract_state(s, dx_flat.reshape(N, 15))
        return jnp.concatenate(residuals(s2))

    def gn(s, _):
        zero = jnp.zeros(N * 15)
        r = stacked(zero, s)
        J = jax.jacfwd(stacked)(zero, s)
        # gauge: a "fixed" state pins only its POSE (rotation+position);
        # velocity and biases stay free — like the reference, which fixes
        # gauge keyframes but always estimates their velocity/bias vertices
        pose_only = jnp.concatenate(
            [jnp.ones(6, bool), jnp.zeros(9, bool)]
        )
        mask15 = ~(fixed[:, None] & pose_only[None, :])        # [N,15]
        mask = mask15.reshape(-1).astype(r.dtype)
        J = J * mask[None, :]
        H = J.T @ J
        H = H + damping * (1.0 + jnp.trace(H) / H.shape[0]) * jnp.eye(H.shape[0])
        b = J.T @ r
        dx = jnp.linalg.solve(H, -b) * mask
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        return _retract_state(s, dx.reshape(N, 15)), jnp.sum(r * r)

    s, costs = jax.lax.scan(gn, state, None, length=iters)
    final = jnp.sum(jnp.square(stacked(jnp.zeros(N * 15), s)))
    return s, final


@partial(jax.jit, static_argnames=("start", "end"))
def marginalize(H, b, start: int, end: int):
    """Schur-complement marginalization of the state block [start, end) out
    of a Gauss-Newton system (`Optimizer::Marginalize`, `Optimizer.cc:2744`):
    returns (H', b') of the remaining states with the marginalized block's
    information folded in as a dense prior. H [D,D], b [D]; the returned
    system keeps the original indexing with zeroed marginalized rows/cols,
    exactly like the reference (it re-embeds the reduced system).
    """
    D = H.shape[0]
    keep = jnp.ones((D,), bool).at[jnp.arange(start, end)].set(False)
    # partition via gather on static index sets
    import numpy as _np
    ki = _np.concatenate([_np.arange(0, start), _np.arange(end, D)])
    mi = _np.arange(start, end)
    Hrr = H[_np.ix_(ki, ki)]
    Hrm = H[_np.ix_(ki, mi)]
    Hmm = H[_np.ix_(mi, mi)]
    br = b[ki]
    bm = b[mi]
    # symmetrize + eigen-guarded pseudo-inverse of the marginal block
    Hmm = 0.5 * (Hmm + Hmm.T)
    w, V = jnp.linalg.eigh(Hmm)
    w_inv = jnp.where(w > 1e-8, 1.0 / w, 0.0)
    Hmm_inv = (V * w_inv[None, :]) @ V.T
    Hp = Hrr - Hrm @ Hmm_inv @ Hrm.T
    bp = br - Hrm @ (Hmm_inv @ bm)
    # re-embed at original indices (marginalized rows/cols zero)
    Hout = jnp.zeros_like(H).at[_np.ix_(ki, ki)].set(Hp)
    bout = jnp.zeros_like(b).at[ki].set(bp)
    return Hout, bout
