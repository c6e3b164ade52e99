"""Closed-form point-set alignment (Horn / Umeyama) + vectorized RANSAC.

TPU-native equivalents of:
* `OrbSlam3Wrapper::pointSetAlignment` (Umeyama, masked/weighted;
  reference `src/slam_system/src/orb_slam3_wrapper.cpp:1165-1219`)
* `OrbSlam3Wrapper::ransacPointSetAlignment` (4-point minimal sets, 500
  iterations, variance-scaled inlier threshold;
  `orb_slam3_wrapper.cpp:1099-1163`)
* the Horn closed form inside `Sim3Solver::ComputeSim3`
  (`orb_slam3/src/Sim3Solver.cc:294`)

RANSAC on TPU is expressed as a fully-vectorized hypothesize-and-verify: all
H hypotheses are solved simultaneously (vmap over minimal sets), all N×H
residuals are evaluated in one fused pass, and the best hypothesis is an
argmax — no data-dependent loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import lie


def umeyama(src, dst, mask=None, with_scale: bool = True):
    """Least-squares similarity `dst ≈ s R src + t`.

    Args:
      src, dst: [N,3] corresponding points.
      mask: optional [N] bool/float weights.
    Returns:
      Sim3 [8] (q, t, s) mapping src -> dst.
    """
    n = src.shape[0]
    w = jnp.ones((n,), src.dtype) if mask is None else mask.astype(src.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_s = jnp.sum(w[:, None] * src, axis=0) / wsum
    mu_d = jnp.sum(w[:, None] * dst, axis=0) / wsum
    sc = src - mu_s
    dc = dst - mu_d
    cov = (dc * w[:, None]).T @ sc / wsum  # [3,3] = E[dst_c src_c^T]
    var_s = jnp.sum(w * jnp.sum(sc * sc, axis=-1)) / wsum

    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = jnp.array([1.0, 1.0, 0.0], src.dtype)
    S = jnp.concatenate([S[:2], jnp.sign(det)[None]])
    R = (U * S[None, :]) @ Vt
    if with_scale:
        s = jnp.sum(D * S) / jnp.maximum(var_s, 1e-12)
    else:
        s = jnp.ones((), src.dtype)
    t = mu_d - s * R @ mu_s
    q = lie.quat_from_matrix(R)
    return jnp.concatenate([q, t, s[None]])


def alignment_residuals(S, src, dst):
    """Per-point Euclidean error of `dst - S⊗src`, [N]."""
    return jnp.linalg.norm(dst - lie.sim3_apply(S, src), axis=-1)


@partial(jax.jit, static_argnames=("num_hypotheses", "sample_size", "with_scale"))
def ransac_umeyama(
    key,
    src,
    dst,
    mask,
    num_hypotheses: int = 500,
    sample_size: int = 4,
    inlier_sigma: float = 1e-5,
    with_scale: bool = True,
):
    """Vectorized RANSAC similarity alignment.

    Mirrors `ransacPointSetAlignment` (`orb_slam3_wrapper.cpp:1099-1163`):
    4-point minimal sets, 500 hypotheses, inlier threshold scaled by the
    source cloud variance (`inlier_sigma * var`), final refit on the inlier
    set of the best hypothesis.

    Returns: (S_best [8] sim3 src->dst, inlier_mask [N], num_inliers []).
    """
    n = src.shape[0]
    w = mask.astype(src.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(w[:, None] * src, axis=0) / wsum
    var = jnp.sum(w * jnp.sum((src - mu) ** 2, axis=-1)) / wsum
    thresh = inlier_sigma * jnp.maximum(var, 1e-12)

    # sample hypotheses only among valid points: draw by masked gumbel top-k
    keys = jax.random.split(key, num_hypotheses)

    def draw(k):
        g = jax.random.gumbel(k, (n,)) + jnp.where(mask, 0.0, -1e9)
        return jax.lax.top_k(g, sample_size)[1]

    idx = jax.vmap(draw)(keys)  # [H, sample_size]

    def solve(i):
        return umeyama(src[i], dst[i], with_scale=with_scale)

    hyps = jax.vmap(solve)(idx)  # [H, 8]

    # residuals of every point under every hypothesis: [H, N]
    err = jax.vmap(lambda S: alignment_residuals(S, src, dst))(hyps)
    inl = (err * err < thresh) & mask[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    best_inl = inl[best]
    # refit on inliers (fall back to best hypothesis mask if degenerate)
    refined = umeyama(src, dst, mask=best_inl.astype(src.dtype), with_scale=with_scale)
    ok = counts[best] >= sample_size
    S = jnp.where(ok, refined, hyps[best])
    return S, best_inl, counts[best]


def horn_sim3(p1, p2, with_scale: bool = True):
    """Horn closed-form similarity from exactly-3 (or more) correspondences —
    the inner solver of `Sim3Solver::ComputeSim3` (`Sim3Solver.cc:294`).
    Same math as Umeyama, kept as an alias for the 3-point minimal case."""
    return umeyama(p1, p2, with_scale=with_scale)
