"""RANSAC PnP for relocalization.

Replaces `MLPnPsolver` (`orb_slam3/src/MLPnPsolver.cpp`, used by
`Tracking::Relocalization`, `Tracking.cc:3276`): fully-vectorized
hypothesize-and-verify — H minimal 6-point DLT pose hypotheses are solved
simultaneously (batched 12x12 eigendecompositions), inliers counted in one
[H,N] reprojection pass, and the winner refined by the Gauss-Newton
pose optimizer. Same role, TPU-shaped: no sequential RANSAC loop, no
bearing-vector nullspace Jacobians (the refinement stage supplies the
maximum-likelihood polish that MLPnP's covariance machinery exists for).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import lie


def _dlt_pose(X_raw, xn):
    """6+ point DLT: camera pose from world points X [K,3] and normalized
    image points xn [K,2]. Returns SE3 [7] (world->camera).

    World points are Hartley-normalized (centroid + unit RMS scale) before
    building the 12x12 system — without this the f32 eigendecomposition is
    too ill-conditioned to survive RANSAC minimal sets."""
    k = X_raw.shape[0]
    c = jnp.mean(X_raw, axis=0)
    s = jnp.sqrt(jnp.mean(jnp.sum((X_raw - c) ** 2, -1))) + 1e-9
    X = (X_raw - c) / s
    o = jnp.ones((k,), X.dtype)
    z = jnp.zeros((k, 4), X.dtype)
    Xh = jnp.concatenate([X, o[:, None]], axis=-1)  # [K,4]
    r1 = jnp.concatenate([Xh, z, -xn[:, 0:1] * Xh], axis=-1)
    r2 = jnp.concatenate([z, Xh, -xn[:, 1:2] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)           # [2K,12]
    _, V = jnp.linalg.eigh(A.T @ A)
    P0 = V[:, 0].reshape(3, 4)

    def extract(P):
        # nearest rotation to the 3x3 part + matching translation scale
        M = P[:, :3]
        U, s, Vt = jnp.linalg.svd(M)
        d = jnp.linalg.det(U @ Vt)
        R = U @ jnp.diag(jnp.array([1.0, 1.0, 1.0], X.dtype).at[2].set(d)) @ Vt
        scale = jnp.mean(s) * d
        t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
        pc_z = (jnp.einsum("ij,kj->ki", R, X) + t[None])[:, 2]
        return lie.se3(lie.quat_from_matrix(R), t), jnp.sum(pc_z > 0)

    # the DLT nullvector has a sign ambiguity: pick by cheirality
    Ta, na = extract(P0)
    Tb, nb = extract(-P0)
    Tn = jnp.where(na >= nb, Ta, Tb)
    # denormalize: X' = (X - c)/s and projection is scale-invariant, so
    # R = R', t = s*t' - R'c (then the common 1/s factor drops out)
    q = lie.se3_q(Tn)
    t = s * lie.se3_t(Tn) + lie.quat_rotate(q, -c)
    return lie.se3(q, t)


@partial(jax.jit, static_argnames=("num_hypotheses", "sample_size"))
def ransac_pnp(key, X, uv, mask, K,
               num_hypotheses: int = 64,
               sample_size: int = 6,
               inlier_px: float = 5.99):
    """Vectorized RANSAC PnP.

    Args:
      X: [N,3] world points; uv: [N,2] observed pixels; mask: [N] valid.
      K: [4] fx fy cx cy.
    Returns (T_cw [7], inliers [N] bool, n_inliers)."""
    n = X.shape[0]
    xn = jnp.stack([(uv[:, 0] - K[2]) / K[0], (uv[:, 1] - K[3]) / K[1]], -1)
    keys = jax.random.split(key, num_hypotheses)

    def draw(k):
        g = jax.random.gumbel(k, (n,)) + jnp.where(mask, 0.0, -1e9)
        return jax.lax.top_k(g, sample_size)[1]

    idx = jax.vmap(draw)(keys)
    hyps = jax.vmap(lambda i: _dlt_pose(X[i], xn[i]))(idx)  # [H,7]

    def count(T):
        pc = jax.vmap(lambda p: lie.se3_apply(T, p))(X)
        u = K[0] * pc[:, 0] / jnp.maximum(pc[:, 2], 1e-9) + K[2]
        v = K[1] * pc[:, 1] / jnp.maximum(pc[:, 2], 1e-9) + K[3]
        err2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        inl = mask & (pc[:, 2] > 0) & (err2 < inlier_px * inlier_px)
        return jnp.sum(inl), inl

    counts, inls = jax.vmap(count)(hyps)
    best = jnp.argmax(counts)
    return hyps[best], inls[best], counts[best]
