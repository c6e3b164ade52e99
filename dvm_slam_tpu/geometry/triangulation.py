"""Two-view DLT triangulation, batched.

Replaces `GeometricTools::Triangulate` (`orb_slam3/src/GeometricTools.cc:48`):
given two normalized bearing observations (x, y at z=1) and the two camera
poses, solve the 4x4 homogeneous DLT system. Implemented batched so entire
match sets triangulate in one fused XLA call.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import lie


def projection_matrix(T_cw):
    """World->camera SE3 [...,7] -> 3x4 projection (identity intrinsics)."""
    M = lie.se3_matrix(T_cw)
    return M[..., :3, :]


def triangulate(xn1, xn2, T1_cw, T2_cw):
    """DLT triangulation of normalized image points.

    Args:
      xn1, xn2: [...,2] or [...,3] normalized coords (z=1 implied if 2D)
        in cameras 1 and 2.
      T1_cw, T2_cw: [...,7] world->camera poses.

    Returns: (Xw [...,3] world points, ok [...] bool finite/solvable flag).
    """
    P1 = projection_matrix(T1_cw)
    P2 = projection_matrix(T2_cw)
    if xn1.shape[-1] == 3:
        x1, y1 = xn1[..., 0] / xn1[..., 2], xn1[..., 1] / xn1[..., 2]
        x2, y2 = xn2[..., 0] / xn2[..., 2], xn2[..., 1] / xn2[..., 2]
    else:
        x1, y1 = xn1[..., 0], xn1[..., 1]
        x2, y2 = xn2[..., 0], xn2[..., 1]

    A = jnp.stack(
        [
            x1[..., None] * P1[..., 2, :] - P1[..., 0, :],
            y1[..., None] * P1[..., 2, :] - P1[..., 1, :],
            x2[..., None] * P2[..., 2, :] - P2[..., 0, :],
            y2[..., None] * P2[..., 2, :] - P2[..., 1, :],
        ],
        axis=-2,
    )  # [...,4,4]

    # smallest right singular vector of A via eigendecomposition of A^T A
    # (4x4 symmetric — cheaper and more TPU-friendly than full SVD)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    w, V = jnp.linalg.eigh(AtA)
    X = V[..., :, 0]  # eigenvector for smallest eigenvalue
    w_h = X[..., 3]
    ok = jnp.abs(w_h) > 1e-12
    Xw = X[..., :3] / jnp.where(ok, w_h, 1.0)[..., None]
    ok = ok & jnp.all(jnp.isfinite(Xw), axis=-1)
    return Xw, ok


def depth_in_camera(T_cw, Xw):
    """z-coordinate of world points in a camera frame."""
    return lie.se3_apply(T_cw, Xw)[..., 2]


def parallax_cos(T1_cw, T2_cw, Xw):
    """Cosine of the ray parallax angle at a triangulated point (used by the
    reference's cheirality checks, `TwoViewReconstruction::CheckRT`)."""
    c1 = lie.se3_t(lie.se3_inv(T1_cw))
    c2 = lie.se3_t(lie.se3_inv(T2_cw))
    r1 = Xw - c1
    r2 = Xw - c2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    return jnp.sum(r1 * r2, axis=-1) / jnp.maximum(n1 * n2, 1e-12)
