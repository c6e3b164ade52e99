"""Regression: local BA's observation writeback must only erase edges that
PARTICIPATED in the solve (their point made the window selection).

A fixed observer keyframe (`Optimizer.cc:1030` window semantics: other
observers of window points) typically has most of its observations pointing
at points OUTSIDE the window — those edges must survive the writeback
untouched, or every local BA silently strips the covisibility graph."""

import numpy as np
import jax.numpy as jnp

from dvm_slam_tpu.geometry import lie, cameras
from dvm_slam_tpu.mapping import map_state, local_mapping

K4 = jnp.array([300.0, 300.0, 160.0, 120.0])
F = 16  # feature capacity


def _mk_kf(m, tx, obs_slots, X):
    """Keyframe at x-offset `tx` observing point slots `obs_slots` with
    exact (noise-free) projections."""
    T_wc = lie.se3(lie.so3_exp(jnp.zeros(3)), jnp.asarray([tx, 0.0, 0.0]))
    T_cw = lie.se3_inv(T_wc)
    obs = np.full((F,), -1, np.int32)
    xy = np.zeros((F, 2), np.float32)
    valid = np.zeros((F,), bool)
    for f, p in enumerate(obs_slots):
        obs[f] = p
        pc = lie.se3_apply(T_cw, jnp.asarray(X[p]))
        uv, _ = cameras.pinhole_project(K4, pc)
        xy[f] = np.asarray(uv)
        valid[f] = True
    m, slot = map_state.add_keyframe(
        m, T_cw, jnp.asarray(xy), jnp.zeros((F,), jnp.int32),
        jnp.zeros((F,)), jnp.zeros((F, 256), jnp.uint8),
        jnp.asarray(valid), jnp.asarray(obs),
    )
    return m, slot


def test_fixed_observer_edges_to_nonwindow_points_survive():
    m = map_state.create(8, 32, F)
    X = np.zeros((16, 3), np.float32)
    X[:, 0] = np.linspace(-1.0, 1.0, 16)
    X[:, 1] = np.linspace(-0.5, 0.5, 16)
    X[:, 2] = 8.0
    m, _ = map_state.add_points(
        m, jnp.asarray(X), jnp.zeros((16, 256), jnp.uint8),
        jnp.zeros((16, 3)), jnp.zeros(16), jnp.full((16,), 1e9),
        jnp.int32(0), jnp.ones(16, bool),
    )
    m = m._replace(pt_found=m.pt_found.at[:16].set(5),
                   pt_visible=m.pt_visible.at[:16].set(5))

    # KF0 shares 10 points with the center -> the one local covisible
    # (n_local=2); KF2 shares only point 10 -> fixed observer, and also
    # holds exclusive edges to points 11..15 (never in the window)
    m, _ = _mk_kf(m, 0.0, list(range(10)), X)           # KF0 (gauge)
    m, center = _mk_kf(m, 0.3, list(range(11)), X)      # KF1 = center
    m, kf2 = _mk_kf(m, 0.6, [10, 11, 12, 13, 14, 15], X)

    obs_before = np.asarray(m.kf_obs[kf2]).copy()
    m2, _chi2 = local_mapping.local_ba(
        m, jnp.int32(center), K4, n_local=2, n_fixed=4, n_pts=16, iters=2,
        n_obs=F,
    )
    obs_after = np.asarray(m2.kf_obs[kf2])

    # the participating edge (point 10, perfect geometry) stays an inlier,
    # and the non-window edges 11..15 must be untouched
    np.testing.assert_array_equal(obs_after[:6], obs_before[:6])
    # fixed keyframes keep their pose bit-exact
    np.testing.assert_allclose(np.asarray(m2.kf_pose[kf2]),
                               np.asarray(m.kf_pose[kf2]))
