"""Sim(3) pose-graph (essential graph) optimization.

TPU-native `Optimizer::OptimizeEssentialGraph` (`orb_slam3/src/Optimizer.cc:1389`):
nodes = keyframe Sim3 poses S_iw (world->camera, scale carries monocular
drift); edges = spanning tree + strong-covisibility (weight >= 100) +
loop/merge edges, each with measurement S_ij fixed at graph build time;
residual r_e = log_sim3(S_ij_meas^{-1} . S_iw_est . S_jw_est^{-1}) in R^7.

Batched Gauss-Newton: per-edge 7x7(x2) Jacobians via forward-mode autodiff
of the tangent retraction, Hessian assembled dense [7N,7N] (N <= a few
hundred keyframes -> <= ~2800^2, one MXU Cholesky), identity information
like g2o's matLambda. Point correction afterwards follows the reference's
spanning-tree propagation: X' = S_new^{-1} ( S_old (X) ) of the point's
reference keyframe (`LoopClosing.cc:2267+` / `Optimizer.cc:1550+`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import lie


def edge_residual(S_iw, S_jw, S_ij_meas):
    """r = log_sim3( S_ij_meas^{-1} * S_iw * S_jw^{-1} ), [7]."""
    rel = lie.sim3_mul(S_iw, lie.sim3_inv(S_jw))
    return lie.sim3_log(lie.sim3_mul(lie.sim3_inv(S_ij_meas), rel))


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(poses, fixed, ei, ej, emeas, emask, iters: int = 20,
                        damping: float = 1e-6):
    """Args:
      poses: [N,8] Sim3 world->camera estimates.
      fixed: [N] bool — held constant (the loop/merge anchor side).
      ei, ej: [E] int32 edge endpoints; emeas: [E,8] measured S_ij;
      emask: [E] bool valid edges.
    Returns (poses' [N,8], final_cost)."""
    N = poses.shape[0]
    E = ei.shape[0]
    dtype = poses.dtype
    zero7 = jnp.zeros(7, dtype)

    def gn_step(carry, _):
        p = carry

        def per_edge(i, j, meas):
            Si, Sj = p[i], p[j]

            def f(xi, xj):
                return edge_residual(
                    lie.sim3_retract(Si, xi), lie.sim3_retract(Sj, xj), meas
                )

            r = f(zero7, zero7)
            Ji = jax.jacfwd(f, argnums=0)(zero7, zero7)  # [7,7]
            Jj = jax.jacfwd(f, argnums=1)(zero7, zero7)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(per_edge)(ei, ej, emeas)    # [E,7],[E,7,7]x2
        w = emask.astype(dtype)
        Ji = Ji * (~fixed[ei])[:, None, None]
        Jj = Jj * (~fixed[ej])[:, None, None]

        # assemble H [N,N,7,7] and b [N,7] by scatter-add
        Hii = jnp.einsum("eki,e,ekj->eij", Ji, w, Ji)
        Hjj = jnp.einsum("eki,e,ekj->eij", Jj, w, Jj)
        Hij = jnp.einsum("eki,e,ekj->eij", Ji, w, Jj)
        bi = jnp.einsum("eki,e,ek->ei", Ji, w, r)
        bj = jnp.einsum("eki,e,ek->ei", Jj, w, r)

        H = jnp.zeros((N, N, 7, 7), dtype)
        H = H.at[ei, ei].add(Hii)
        H = H.at[ej, ej].add(Hjj)
        H = H.at[ei, ej].add(Hij)
        H = H.at[ej, ei].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((N, 7), dtype).at[ei].add(bi).at[ej].add(bj)

        lam = damping * (1.0 + jnp.einsum("nnii->", H) / (7 * N))
        H = H.at[jnp.arange(N), jnp.arange(N)].add(
            lam * jnp.eye(7, dtype=dtype)
        )
        # fixed nodes: identity diagonal, zero couplings
        fix2 = fixed[:, None] | fixed[None, :]
        H = jnp.where(fix2[:, :, None, None], 0.0, H)
        H = H.at[jnp.arange(N), jnp.arange(N)].add(
            fixed[:, None, None] * jnp.eye(7, dtype=dtype)
        )
        b = b * (~fixed)[:, None]

        Hm = H.transpose(0, 2, 1, 3).reshape(7 * N, 7 * N)
        dx = jnp.linalg.solve(Hm, -b.reshape(-1)).reshape(N, 7)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0) * (~fixed)[:, None]
        newp = jax.vmap(lie.sim3_retract)(p, dx)
        cost = jnp.sum(jnp.where(emask, jnp.sum(r * r, -1), 0.0))
        return newp, cost

    poses, costs = jax.lax.scan(gn_step, poses, None, length=iters)
    r = jax.vmap(lambda i, j, s: edge_residual(poses[i], poses[j], s))(ei, ej, emeas)
    final = jnp.sum(jnp.where(emask, jnp.sum(r * r, -1), 0.0))
    return poses, final


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph_4dof(poses, fixed, ei, ej, emeas, emask,
                             iters: int = 20, damping: float = 1e-6):
    """4-DoF essential graph (`Optimizer::OptimizeEssentialGraph4DoF`,
    `Optimizer.cc:4940`): with an IMU, roll/pitch (and scale) are observable
    from gravity, so loop corrections distribute only translation + yaw.

    Nodes are SE3 [7] world->camera; the per-node tangent is restricted to
    (tx,ty,tz,yaw) — a left-multiplied update exp([v, (0,0,w_z)]), exactly
    the reference's VertexPose4DoF Rz(dyaw) composition. Edges are SE3
    relative-pose measurements; residual r = log_se3(meas^-1 T_iw T_jw^-1).

    Returns (poses' [N,7], final_cost)."""
    N = poses.shape[0]
    dtype = poses.dtype
    zero4 = jnp.zeros(4, dtype)

    def embed(x4):  # (tx,ty,tz,yaw) -> se3 tangent [6]
        return jnp.concatenate([x4[:3], jnp.zeros(2, dtype), x4[3:4]])

    def edge_res(T_iw, T_jw, meas):
        rel = lie.se3_mul(T_iw, lie.se3_inv(T_jw))
        return lie.se3_log(lie.se3_mul(lie.se3_inv(meas), rel))

    def gn_step(carry, _):
        p = carry

        def per_edge(i, j, meas):
            Ti, Tj = p[i], p[j]

            def f(xi, xj):
                return edge_res(
                    lie.se3_retract(Ti, embed(xi)),
                    lie.se3_retract(Tj, embed(xj)), meas
                )

            r = f(zero4, zero4)
            Ji = jax.jacfwd(f, argnums=0)(zero4, zero4)  # [6,4]
            Jj = jax.jacfwd(f, argnums=1)(zero4, zero4)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(per_edge)(ei, ej, emeas)
        w = emask.astype(dtype)
        Ji = Ji * (~fixed[ei])[:, None, None]
        Jj = Jj * (~fixed[ej])[:, None, None]

        Hii = jnp.einsum("eki,e,ekj->eij", Ji, w, Ji)
        Hjj = jnp.einsum("eki,e,ekj->eij", Jj, w, Jj)
        Hij = jnp.einsum("eki,e,ekj->eij", Ji, w, Jj)
        bi = jnp.einsum("eki,e,ek->ei", Ji, w, r)
        bj = jnp.einsum("eki,e,ek->ei", Jj, w, r)

        H = jnp.zeros((N, N, 4, 4), dtype)
        H = H.at[ei, ei].add(Hii)
        H = H.at[ej, ej].add(Hjj)
        H = H.at[ei, ej].add(Hij)
        H = H.at[ej, ei].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((N, 4), dtype).at[ei].add(bi).at[ej].add(bj)

        lam = damping * (1.0 + jnp.einsum("nnii->", H) / (4 * N))
        H = H.at[jnp.arange(N), jnp.arange(N)].add(
            lam * jnp.eye(4, dtype=dtype)
        )
        fix2 = fixed[:, None] | fixed[None, :]
        H = jnp.where(fix2[:, :, None, None], 0.0, H)
        H = H.at[jnp.arange(N), jnp.arange(N)].add(
            fixed[:, None, None] * jnp.eye(4, dtype=dtype)
        )
        b = b * (~fixed)[:, None]

        Hm = H.transpose(0, 2, 1, 3).reshape(4 * N, 4 * N)
        dx = jnp.linalg.solve(Hm, -b.reshape(-1)).reshape(N, 4)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0) * (~fixed)[:, None]
        newp = jax.vmap(lambda T, x: lie.se3_retract(T, embed(x)))(p, dx)
        cost = jnp.sum(jnp.where(emask, jnp.sum(r * r, -1), 0.0))
        return newp, cost

    poses, _ = jax.lax.scan(gn_step, poses, None, length=iters)
    r = jax.vmap(lambda i, j, s: edge_res(poses[i], poses[j], s))(ei, ej, emeas)
    final = jnp.sum(jnp.where(emask, jnp.sum(r * r, -1), 0.0))
    return poses, final


def compute_spanning_tree(covis, kf_valid):
    """Maximum-weight spanning tree over the covisibility graph (the role of
    the reference's incremental `KeyFrame::ChangeParent` spanning tree,
    `KeyFrame.cc:544-734`): returns parent[i] (-1 for roots/invalid). Prim's
    algorithm from the lowest valid slot, numpy host-side."""
    import numpy as np

    W = np.asarray(covis)
    valid = np.asarray(kf_valid)
    n = W.shape[0]
    parent = np.full(n, -1, np.int64)
    nodes = np.nonzero(valid)[0]
    if len(nodes) == 0:
        return parent
    in_tree = np.zeros(n, bool)
    in_tree[nodes[0]] = True
    # best connection of each node to the current tree
    best_w = W[:, nodes[0]].astype(np.int64).copy()
    best_p = np.full(n, nodes[0], np.int64)
    for _ in range(len(nodes) - 1):
        cand = np.where(valid & ~in_tree, best_w, -1)
        j = int(np.argmax(cand))
        if cand[j] <= 0:
            break  # disconnected component: remaining nodes stay roots
        parent[j] = best_p[j]
        in_tree[j] = True
        upd = W[:, j] > best_w
        best_w = np.where(upd, W[:, j], best_w)
        best_p = np.where(upd, j, best_p)
    return parent


def build_essential_edges(covis, kf_valid, min_weight: int = 100,
                          spanning_parent=None, extra_edges=None):
    """Build the essential-graph edge list on the host (numpy-ish): strong
    covisibility edges (weight >= 100, `Optimizer.cc:1556`), spanning-tree
    edges (parent links), plus loop/merge edges. Returns (ei, ej) int32
    arrays with i < j deduplicated."""
    import numpy as np

    W = np.asarray(covis)
    valid = np.asarray(kf_valid)
    ii, jj = np.nonzero(np.triu(W >= min_weight, 1))
    keep = valid[ii] & valid[jj]
    pairs = set(zip(ii[keep].tolist(), jj[keep].tolist()))
    if spanning_parent is not None:
        for c, p in enumerate(np.asarray(spanning_parent)):
            if p >= 0 and valid[c] and valid[p]:
                pairs.add((min(c, int(p)), max(c, int(p))))
    if extra_edges:
        for a, b in extra_edges:
            if valid[a] and valid[b] and a != b:
                pairs.add((min(a, b), max(a, b)))
    if not pairs:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    arr = np.asarray(sorted(pairs), np.int32)
    return arr[:, 0], arr[:, 1]


@jax.jit
def correct_points(pt_pos, pt_ref_kf, pt_valid, poses_old, poses_new):
    """Propagate a pose-graph correction to map points through their
    reference keyframes: X' = S_new_rw^{-1} ( S_old_rw (X) )."""
    r = jnp.clip(pt_ref_kf, 0)
    S_old = poses_old[r]
    S_new = poses_new[r]
    Xc = lie.sim3_apply(S_old, pt_pos)
    Xw = lie.sim3_apply(jax.vmap(lie.sim3_inv)(S_new), Xc)
    return jnp.where(pt_valid[:, None], Xw, pt_pos)


@jax.jit
def se3_from_sim3_poses(poses_sim3):
    """Post-optimization conversion back to SE3 keyframe poses: the scale is
    folded into the translation, [R, t/s] (reference `LoopClosing.cc` /
    `Optimizer.cc:1630` eigt *=(1./s))."""
    q = lie.sim3_q(poses_sim3)
    t = lie.sim3_t(poses_sim3) / jnp.maximum(lie.sim3_s(poses_sim3)[..., None], 1e-12)
    return jnp.concatenate([q, t], axis=-1)
