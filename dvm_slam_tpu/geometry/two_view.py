"""Monocular two-view reconstruction (map initialization).

TPU-native `TwoViewReconstruction` (`orb_slam3/src/TwoViewReconstruction.cc`):
RANSAC homography + essential-matrix estimation run *simultaneously and fully
vectorized* (the reference runs them in two host threads,
`TwoViewReconstruction.cc:100-101`; here both are one batched XLA program),
model selection by SH/(SH+SF) > 0.5 (`:119-124`), then pose recovery with
cheirality + parallax checks over all 12 candidate decompositions (8 Faugeras
homography solutions + 4 essential) scored in one batched triangulation pass.

Works in normalized bearing coordinates (z=1) so pinhole and fisheye frontends
share the solver; chi-squared thresholds are given in pixels and scaled by the
focal length.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie, triangulation

CHI2_H = 5.991
CHI2_F = 3.841
SCORE_GAMMA = 5.991  # both models score against 5.991 (reference CheckFundamental)


class TwoViewResult(NamedTuple):
    ok: jnp.ndarray          # [] bool
    T21: jnp.ndarray         # [7] SE3 camera1 -> camera2
    points: jnp.ndarray      # [N,3] in camera-1 frame
    good: jnp.ndarray        # [N] bool triangulated inliers
    used_homography: jnp.ndarray  # [] bool


def _dlt_h(x1, x2):
    """Homography from >=4 correspondences ([K,2] normalized): DLT via the
    smallest eigenvector of AtA."""
    k = x1.shape[0]
    u, v = x2[:, 0], x2[:, 1]
    x, y = x1[:, 0], x1[:, 1]
    o = jnp.ones_like(x)
    z = jnp.zeros_like(x)
    r1 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], axis=-1)
    r2 = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # [2K,9]
    _, V = jnp.linalg.eigh(A.T @ A)
    return V[:, 0].reshape(3, 3)


def _eight_point_e(x1, x2):
    """Essential matrix from 8 normalized correspondences, projected onto the
    essential manifold (singular values 1,1,0)."""
    x, y = x1[:, 0], x1[:, 1]
    u, v = x2[:, 0], x2[:, 1]
    o = jnp.ones_like(x)
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, o], axis=-1)  # [8,9]
    _, V = jnp.linalg.eigh(A.T @ A)
    E = V[:, 0].reshape(3, 3)
    U, s, Vt = jnp.linalg.svd(E)
    return U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], E.dtype)) @ Vt


def _h_transfer_chi2(H, x1, x2, f2):
    """Symmetric transfer chi2 (pixel units) of homography on [N,2] points."""
    def apply(Hm, p):
        ph = jnp.concatenate([p, jnp.ones_like(p[:, :1])], axis=-1)
        q = ph @ Hm.T
        return q[:, :2] / jnp.where(jnp.abs(q[:, 2:]) < 1e-12, 1e-12, q[:, 2:])

    Hinv = jnp.linalg.inv(H)
    e12 = jnp.sum((x2 - apply(H, x1)) ** 2, axis=-1) * f2
    e21 = jnp.sum((x1 - apply(Hinv, x2)) ** 2, axis=-1) * f2
    return e12, e21


def _e_epipolar_chi2(E, x1, x2, f2):
    """Squared point-to-epipolar-line distance both ways (pixel units)."""
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    l2 = x1h @ E.T  # lines in image 2
    l1 = x2h @ E    # lines in image 1
    num2 = jnp.sum(l2 * x2h, axis=-1) ** 2
    num1 = jnp.sum(l1 * x1h, axis=-1) ** 2
    d2 = num2 / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12) * f2
    d1 = num1 / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12) * f2
    return d1, d2


def _decompose_e(E):
    """E -> 4 candidate (R [4,3,3], t [4,3]) with |t|=1."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _decompose_h(H):
    """Faugeras 1988 SVD decomposition of a Euclidean homography -> 8
    candidate (R [8,3,3], t [8,3]) (`TwoViewReconstruction::ReconstructH`
    follows the same construction)."""
    U, d, Vt = jnp.linalg.svd(H)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = d[0], d[1], d[2]
    eps = 1e-9
    den13 = jnp.maximum(d1 * d1 - d3 * d3, eps)
    aux1 = jnp.sqrt(jnp.maximum(d1 * d1 - d2 * d2, 0.0) / den13)
    aux3 = jnp.sqrt(jnp.maximum(d2 * d2 - d3 * d3, 0.0) / den13)
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0], H.dtype) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0], H.dtype) * aux3

    # case d' = +d2
    sin_t = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 + d3) * d2, eps
    )
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)
    sign_pos = jnp.array([1.0, -1.0, -1.0, 1.0], H.dtype)  # sign(x1*x3)
    stheta = sign_pos * sin_t

    def rot_pos(st):
        return jnp.array(
            [[cos_t, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, cos_t]], H.dtype
        )

    Rp = jax.vmap(rot_pos)(stheta)                       # [4,3,3]
    tp = (d1 - d3) * jnp.stack([x1s, jnp.zeros_like(x1s), -x3s], axis=-1)

    # case d' = -d2
    sin_p = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 - d3) * d2, eps
    )
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, eps)
    sphi = sign_pos * sin_p

    def rot_neg(sp):
        return jnp.array(
            [[cos_p, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cos_p]], H.dtype
        )

    Rn = jax.vmap(rot_neg)(sphi)
    tn = (d1 + d3) * jnp.stack([x1s, jnp.zeros_like(x1s), x3s], axis=-1)

    Rp_full = s * jnp.einsum("ij,njk,kl->nil", U, Rp, Vt)
    Rn_full = s * jnp.einsum("ij,njk,kl->nil", U, Rn, Vt)
    tp_full = jnp.einsum("ij,nj->ni", U, tp)
    tn_full = jnp.einsum("ij,nj->ni", U, tn)
    Rs = jnp.concatenate([Rp_full, Rn_full])
    ts = jnp.concatenate([tp_full, tn_full])
    ts = ts / jnp.maximum(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12)
    return Rs, ts


def _check_rt(R, t, x1, x2, mask, f2, sigma2: float):
    """Cheirality check of one candidate (`TwoViewReconstruction::CheckRT`):
    triangulate every match, count points with positive depth in both views,
    acceptable reprojection error (< 4 sigma2 px), and real parallax.

    Returns (n_good, good [N], parallax_ok_count, points [N,3])."""
    n = x1.shape[0]
    T1 = jnp.broadcast_to(lie.se3_identity(dtype=x1.dtype), (n, 7))
    q = lie.quat_from_matrix(R)
    T2 = jnp.broadcast_to(lie.se3(q, t), (n, 7))
    X, okt = triangulation.triangulate(x1[:, :2], x2[:, :2], T1, T2)
    z1 = X[:, 2]
    Xc2 = lie.se3_apply(T2, X)
    z2 = Xc2[:, 2]
    cpar = triangulation.parallax_cos(T1, T2, X)
    # reprojection error (pixels^2)
    p1 = X[:, :2] / jnp.where(jnp.abs(z1[:, None]) < 1e-12, 1e-12, z1[:, None])
    p2 = Xc2[:, :2] / jnp.where(jnp.abs(z2[:, None]) < 1e-12, 1e-12, z2[:, None])
    e1 = jnp.sum((p1 - x1[:, :2]) ** 2, axis=-1) * f2
    e2 = jnp.sum((p2 - x2[:, :2]) ** 2, axis=-1) * f2
    th = 4.0 * sigma2
    has_parallax = cpar < 0.99998
    good = (
        mask & okt & (z1 > 0) & (z2 > 0) & (e1 < th) & (e2 < th) & has_parallax
    )
    return jnp.sum(good), good, X


def _ransac_best(key, x1, x2, mask, solver, chi2_fn, th_inlier, iters, sample):
    n = x1.shape[0]
    keys = jax.random.split(key, iters)

    def draw(k):
        g = jax.random.gumbel(k, (n,)) + jnp.where(mask, 0.0, -1e9)
        return jax.lax.top_k(g, sample)[1]

    idx = jax.vmap(draw)(keys)
    models = jax.vmap(lambda i: solver(x1[i, :2], x2[i, :2]))(idx)  # [I,3,3]

    def score(M):
        e1, e2 = chi2_fn(M)
        inl = (e1 < th_inlier) & (e2 < th_inlier) & mask
        sc = jnp.sum(
            jnp.where(inl, (SCORE_GAMMA - e1) + (SCORE_GAMMA - e2), 0.0)
        )
        return sc, inl

    scores, inls = jax.vmap(score)(models)
    best = jnp.argmax(scores)
    return models[best], scores[best], inls[best]


@partial(jax.jit, static_argnames=("iters", "min_triangulated"))
def reconstruct_two_views(
    key,
    xn1,
    xn2,
    mask,
    focal,
    sigma_px: float = 1.0,
    iters: int = 200,
    min_triangulated: int = 50,
):
    """Full monocular initializer on N putative matches.

    Args:
      xn1, xn2: [N,3] normalized bearings (z=1) of matched keypoints.
      mask: [N] bool valid matches.
      focal: scalar focal length (pixels) for threshold scaling.
    """
    f2 = focal * focal
    sigma2 = sigma_px * sigma_px
    k_h, k_e = jax.random.split(key)

    H, sh, _ = _ransac_best(
        k_h, xn1, xn2, mask, _dlt_h,
        lambda M: _h_transfer_chi2(M, xn1[:, :2], xn2[:, :2], f2 / sigma2),
        CHI2_H, iters, 8,
    )
    E, sf, _ = _ransac_best(
        k_e, xn1, xn2, mask, _eight_point_e,
        lambda M: _e_epipolar_chi2(M, xn1[:, :2], xn2[:, :2], f2 / sigma2),
        CHI2_F, iters, 8,
    )

    use_h = sh / jnp.maximum(sh + sf, 1e-9) > 0.5

    Rh, th_ = _decompose_h(H)
    Re, te = _decompose_e(E)
    Rs = jnp.concatenate([Rh, Re])        # [12,3,3]
    ts = jnp.concatenate([th_, te])       # [12,3]
    cand_valid = jnp.concatenate(
        [jnp.full((8,), True), jnp.full((4,), True)]
    )
    cand_is_h = jnp.concatenate([jnp.full((8,), True), jnp.full((4,), False)])
    cand_on = jnp.where(use_h, cand_is_h, ~cand_is_h) & cand_valid

    ngood, goods, Xs = jax.vmap(
        lambda R, t: _check_rt(R, t, xn1, xn2, mask, f2 / sigma2, sigma2)
    )(Rs, ts)
    ngood = jnp.where(cand_on, ngood, -1)
    best = jnp.argmax(ngood)
    n_best = ngood[best]

    # uniqueness: no second enabled candidate with > 0.7x the best support
    second = jnp.sort(jnp.where(cand_on, ngood, -1))[-2]
    n_matches = jnp.sum(mask)
    enough = n_best >= jnp.maximum(
        jnp.asarray(min_triangulated), (0.5 * n_matches).astype(jnp.int32)
    )
    unique = second.astype(jnp.float32) < 0.75 * n_best.astype(jnp.float32)
    ok = enough & unique & (n_best > 0)

    T21 = lie.se3(lie.quat_from_matrix(Rs[best]), ts[best])
    return TwoViewResult(
        ok=ok, T21=T21, points=Xs[best], good=goods[best] & ok, used_homography=use_h
    )
