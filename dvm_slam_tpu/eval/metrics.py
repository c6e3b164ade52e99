"""Trajectory evaluation: ATE / RPE with Sim(3) alignment.

Replaces the reference's evo-based evaluation notebook
(`src/evaluation/evaluation.ipynb`): `align_multiple(correct_scale=True)` +
APE RMSE becomes `ate_rmse` (Umeyama Sim3 alignment of camera centers, then
RMS of residuals); RPE over a fixed frame delta matches evo's RPE.

Fully vectorized (no per-frame Python loops): real sequences are thousands
of frames and the evaluation path must not be quadratic in trajectory
length.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import alignment, lie


def camera_centers(poses_cw):
    """[N,7] world->camera SE3 -> [N,3] camera centers in world."""
    T = jnp.asarray(poses_cw)
    if T.ndim == 1:
        return np.asarray(lie.se3_t(lie.se3_inv(T)))
    return np.asarray(lie.se3_t(jax.vmap(lie.se3_inv)(T)))


def ate_rmse(est_cw, gt_cw, correct_scale: bool = True):
    """Absolute trajectory error after Sim3 (or SE3) alignment.

    Args: est_cw, gt_cw: [N,7] world->camera poses (aligned by index).
    Returns (rmse, aligned_est_centers [N,3], sim3 [8])."""
    est_c = camera_centers(np.asarray(est_cw))
    gt_c = camera_centers(np.asarray(gt_cw))
    S = alignment.umeyama(jnp.asarray(est_c), jnp.asarray(gt_c), with_scale=correct_scale)
    est_aligned = np.asarray(lie.sim3_apply(jnp.asarray(S)[None], jnp.asarray(est_c)))
    err = est_aligned - gt_c
    rmse = float(np.sqrt(np.mean(np.sum(err * err, axis=-1))))
    return rmse, est_aligned, np.asarray(S)


def rpe(est_cw, gt_cw, delta: int = 1):
    """Relative pose error (translation RMSE over frame pairs `delta` apart),
    one vmapped device call over all pairs."""
    est = jnp.asarray(np.asarray(est_cw))
    gt = jnp.asarray(np.asarray(gt_cw))
    n = est.shape[0] - delta
    if n <= 0:
        return 0.0

    def pair_err(ei, ei_d, gi, gi_d):
        de = lie.se3_mul(lie.se3_inv(ei_d), ei)
        dg = lie.se3_mul(lie.se3_inv(gi_d), gi)
        rel = lie.se3_mul(lie.se3_inv(dg), de)
        return jnp.sum(lie.se3_t(rel) ** 2)

    sq = jax.vmap(pair_err)(est[:n], est[delta:], gt[:n], gt[delta:])
    return float(jnp.sqrt(jnp.mean(sq)))
