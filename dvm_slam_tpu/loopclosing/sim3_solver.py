"""RANSAC Sim(3) solver between two keyframes from matched map points.

TPU-native `Sim3Solver` (`orb_slam3/src/Sim3Solver.cc`): Horn's closed form
on 3-point minimal sets (`ComputeSim3`, `Sim3Solver.cc:294`), verified by
two-way reprojection (`CheckInliers`, `:391`, chi2 9.210 * level-sigma^2 per
direction). All hypotheses are solved and verified in one batched pass.

Inputs are map-point positions in each keyframe's CAMERA frame (like the
reference, which transforms to camera coords before solving) so the
recovered transform is S12: camera2 coords -> camera1 coords.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import alignment, lie

CHI2_2D_99 = 9.210


@partial(jax.jit, static_argnames=("iters", "with_scale"))
def ransac_sim3(key, pc1, pc2, uv1, uv2, sigma2_1, sigma2_2, mask, K,
                iters: int = 300, with_scale: bool = True):
    """Args:
      pc1, pc2: [N,3] matched map points in camera-1 / camera-2 frames.
      uv1, uv2: [N,2] the observed keypoints (undistorted px).
      sigma2_1, sigma2_2: [N] level variances of those keypoints.
      mask: [N] valid matches; K: [4] intrinsics (shared camera).
    Returns (S12 [8] sim3, inliers [N] bool, n_inliers)."""
    n = pc1.shape[0]
    keys = jax.random.split(key, iters)

    def draw(k):
        g = jax.random.gumbel(k, (n,)) + jnp.where(mask, 0.0, -1e9)
        return jax.lax.top_k(g, 3)[1]

    idx = jax.vmap(draw)(keys)
    hyps = jax.vmap(
        lambda i: alignment.horn_sim3(pc2[i], pc1[i], with_scale=with_scale)
    )(idx)  # [I,8] S12 maps cam2 -> cam1

    def project(p):
        return jnp.stack(
            [K[0] * p[..., 0] / jnp.maximum(p[..., 2], 1e-9) + K[2],
             K[1] * p[..., 1] / jnp.maximum(p[..., 2], 1e-9) + K[3]], -1
        )

    def check(S12):
        S21 = lie.sim3_inv(S12)
        p2in1 = lie.sim3_apply(S12[None], pc2)
        p1in2 = lie.sim3_apply(S21[None], pc1)
        e1 = jnp.sum((project(p2in1) - uv1) ** 2, -1)
        e2 = jnp.sum((project(p1in2) - uv2) ** 2, -1)
        inl = (
            mask
            & (e1 < CHI2_2D_99 * sigma2_1)
            & (e2 < CHI2_2D_99 * sigma2_2)
            & (p2in1[:, 2] > 0) & (p1in2[:, 2] > 0)
        )
        return jnp.sum(inl), inl

    counts, inls = jax.vmap(check)(hyps)
    best = jnp.argmax(counts)
    inl = inls[best]
    # refine on inliers with full Horn (reference refines via OptimizeSim3;
    # the closed form over all inliers is this solver's output contract)
    S = alignment.umeyama(pc2, pc1, mask=inl.astype(pc1.dtype), with_scale=with_scale)
    n_ref, inl_ref = check(S)
    better = n_ref >= counts[best]
    S_out = jnp.where(better, S, hyps[best])
    inl_out = jnp.where(better, inl_ref, inl)
    return S_out, inl_out, jnp.maximum(n_ref, counts[best])
