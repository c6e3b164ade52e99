"""Derived map structures: the cheap covisibility-row and observer-count
formulations must agree exactly with the [K,P] incidence reference
(`KeyFrame::UpdateConnections` / `MapPoint::Observations` source data)."""

import numpy as np
import jax.numpy as jnp

from dvm_slam_tpu.mapping import map_state


def _random_map(rng, K=32, P=512, F=64):
    """Obs tables MAY repeat a point slot within one KF row: fuse_duplicates
    remaps observations to the winning point, so two features of a row can
    reference the same point. Counting structures must dedup such pairs
    (count once), matching incidence's any-reduction."""
    kf_obs = np.full((K, F), -1, np.int32)
    for k in range(K):
        n = rng.randint(5, F)
        kf_obs[k, :n] = rng.choice(P, size=n, replace=False)
        # inject duplicates: redirect a few features to slots the row
        # already observes (the post-fuse state)
        if n >= 8:
            dup = rng.choice(n, size=3, replace=False)
            kf_obs[k, dup] = kf_obs[k, rng.randint(0, n)]
    m = map_state.create(K, P, F)
    return m._replace(
        kf_obs=jnp.asarray(kf_obs),
        kf_valid=jnp.asarray(rng.rand(K) > 0.25),
        pt_valid=jnp.asarray(rng.rand(P) > 0.3),
        n_kf=jnp.int32(K), n_pt=jnp.int32(P),
    )


def test_covis_row_matches_full_covisibility():
    rng = np.random.RandomState(3)
    m = _random_map(rng)
    full = np.asarray(map_state.covisibility(m))
    kv = np.asarray(m.kf_valid)
    for c in np.nonzero(kv)[0][:8]:
        row = np.asarray(map_state.covis_row(m, jnp.int32(c)))
        exp = np.where(np.arange(m.kf_capacity) != c, full[c], 0)
        np.testing.assert_array_equal(row, exp)


def test_point_observers_scatter_matches_incidence():
    rng = np.random.RandomState(4)
    m = _random_map(rng)
    ref = np.asarray(map_state.point_observers(m))
    alt = np.asarray(map_state.point_observers_scatter(m))
    np.testing.assert_array_equal(ref, alt)
    # and both equal the column sums of the incidence matrix
    inc = np.asarray(map_state.incidence(m))
    np.testing.assert_array_equal(ref, inc.sum(axis=0))
