"""Matching ops + two-view reconstruction tests on synthetic geometry."""

import numpy as np
import jax
import jax.numpy as jnp

from dvm_slam_tpu.ops import matching
from dvm_slam_tpu.geometry import lie, two_view


class TestHamming:
    def test_matches_numpy_popcount(self, rng):
        a = (rng.rand(40, 256) > 0.5).astype(np.uint8)
        b = (rng.rand(30, 256) > 0.5).astype(np.uint8)
        d = matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b))
        expect = (a[:, None, :] != b[None, :, :]).sum(-1)
        np.testing.assert_array_equal(d, expect)

    def test_best_match_threshold_and_ratio(self, rng):
        a = (rng.rand(5, 256) > 0.5).astype(np.uint8)
        b = a.copy()
        b[0, :10] ^= 1  # dist 10 to a[0]
        d = matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b))
        mask = jnp.ones((5, 5), bool)
        idx, best, ok = matching.masked_best_match(d, mask, matching.TH_LOW)
        np.testing.assert_array_equal(idx, np.arange(5))
        assert int(best[0]) == 10

    def test_ratio_tie_semantics(self, rng):
        """A duplicated target descriptor (exact tie) is rejected by the
        strict ratio test but accepted with tie_ok=True — the case where the
        target set holds two copies of the same map point (post-splice maps
        in the mesh protocol's periodic Sim3 re-verification)."""
        a = (rng.rand(3, 256) > 0.5).astype(np.uint8)
        b = np.concatenate([a, a[:1]], axis=0)  # b[3] duplicates b[0]
        d = matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b))
        mask = jnp.ones((3, 4), bool)
        _, _, ok_strict = matching.masked_best_match(
            d, mask, matching.TH_LOW, ratio=0.9)
        assert not bool(ok_strict[0])          # tie kills the strict ratio
        idx, _, ok_tie = matching.masked_best_match(
            d, mask, matching.TH_LOW, ratio=0.9, tie_ok=True)
        assert bool(ok_tie[0]) and int(idx[0]) in (0, 3)
        # rows 1,2 are unique: identical verdict under both modes
        np.testing.assert_array_equal(np.asarray(ok_strict[1:]),
                                      np.asarray(ok_tie[1:]))

    def test_mutual_filter(self):
        idx_ab = jnp.array([1, 0, 2])
        idx_ba = jnp.array([1, 0, 0])  # col2 prefers row 0 -> row2 dropped
        idx, ok = matching.mutual_filter(idx_ab, idx_ba)
        np.testing.assert_array_equal(np.asarray(ok), [True, True, False])

    def test_dedupe(self):
        idx = jnp.array([3, 3, 2, -1])
        ok = jnp.array([True, True, True, False])
        keep = matching.dedupe_matches(idx, ok, 5)
        np.testing.assert_array_equal(np.asarray(keep), [True, False, True, False])


class TestSearchInit:
    def test_recovers_shifted_features(self, rng):
        n = 100
        desc = (rng.rand(n, 256) > 0.5).astype(np.uint8)
        xy1 = rng.rand(n, 2).astype(np.float32) * 400
        shift = np.array([8.0, -5.0], np.float32)
        perm = rng.permutation(n)
        xy2 = (xy1 + shift)[perm]
        desc2 = desc[perm].copy()
        # light descriptor noise
        flip = rng.rand(n, 256) < 0.02
        desc2 = desc2 ^ flip.astype(np.uint8)
        ang = np.zeros(n, np.float32)
        valid = jnp.ones(n, bool)
        idx, ok = matching.search_for_initialization(
            jnp.asarray(xy1), jnp.asarray(desc), jnp.asarray(ang), valid,
            jnp.asarray(xy2), jnp.asarray(desc2), jnp.asarray(ang), valid,
        )
        idx, ok = np.asarray(idx), np.asarray(ok)
        inv = np.argsort(perm)
        assert ok.sum() > 90
        assert (idx[ok] == inv[ok]).all()


class TestTwoView:
    def _make_scene(self, rng, n=300, planar=False):
        if planar:
            X = np.stack(
                [rng.rand(n) * 4 - 2, rng.rand(n) * 4 - 2, np.full(n, 5.0)], -1
            ).astype(np.float32)
        else:
            X = rng.randn(n, 3).astype(np.float32)
            X[:, 2] = X[:, 2] * 1.5 + 6.0
        T21 = lie.se3(
            lie.so3_exp(jnp.array([0.02, -0.08, 0.01])), jnp.array([0.8, 0.1, 0.05])
        )
        x1 = jnp.asarray(X[:, :2] / X[:, 2:3])
        Xc2 = lie.se3_apply(T21[None], jnp.asarray(X))
        x2 = Xc2[:, :2] / Xc2[:, 2:3]
        mk3 = lambda p: jnp.concatenate([p, jnp.ones_like(p[:, :1])], -1)
        return mk3(x1), mk3(x2), T21, X

    def _check(self, res, T21_true):
        assert bool(res.ok)
        # translation only up to scale: compare directions
        t_est = np.asarray(lie.se3_t(res.T21))
        t_true = np.asarray(lie.se3_t(T21_true))
        cos = t_est @ t_true / (np.linalg.norm(t_est) * np.linalg.norm(t_true))
        assert cos > 0.999
        q_rel = lie.quat_mul(lie.quat_conj(lie.se3_q(res.T21)), lie.se3_q(T21_true))
        ang = 2 * np.arccos(min(1.0, abs(float(q_rel[0]))))
        assert ang < 0.01

    def test_general_scene_uses_essential(self, rng):
        x1, x2, T21, X = self._make_scene(rng, planar=False)
        mask = jnp.ones(x1.shape[0], bool)
        res = two_view.reconstruct_two_views(
            jax.random.PRNGKey(1), x1, x2, mask, focal=450.0
        )
        assert not bool(res.used_homography)
        self._check(res, T21)
        # triangulated points match ground truth up to the translation scale
        good = np.asarray(res.good)
        assert good.sum() > 250
        s = np.median(np.asarray(res.points)[good, 2] / X[good, 2])
        np.testing.assert_allclose(
            np.asarray(res.points)[good] / s, X[good], atol=0.05, rtol=0.02
        )

    def test_planar_scene_uses_homography(self, rng):
        x1, x2, T21, X = self._make_scene(rng, planar=True)
        mask = jnp.ones(x1.shape[0], bool)
        res = two_view.reconstruct_two_views(
            jax.random.PRNGKey(2), x1, x2, mask, focal=450.0
        )
        assert bool(res.used_homography)
        self._check(res, T21)

    def test_outliers_rejected(self, rng):
        x1, x2, T21, X = self._make_scene(rng, planar=False)
        x2n = np.array(x2)
        x2n[:60, :2] += rng.randn(60, 2) * 0.3  # gross outliers
        mask = jnp.ones(x1.shape[0], bool)
        res = two_view.reconstruct_two_views(
            jax.random.PRNGKey(3), x1, jnp.asarray(x2n), mask, focal=450.0
        )
        self._check(res, T21)
        assert np.asarray(res.good)[:60].sum() < 8

    def test_insufficient_parallax_fails(self, rng):
        n = 200
        X = rng.randn(n, 3).astype(np.float32)
        X[:, 2] = X[:, 2] * 1.5 + 6.0
        # pure rotation: no parallax
        T21 = lie.se3(lie.so3_exp(jnp.array([0.0, 0.1, 0.0])), jnp.zeros(3))
        x1 = jnp.asarray(X[:, :2] / X[:, 2:3])
        Xc2 = lie.se3_apply(T21[None], jnp.asarray(X))
        x2 = Xc2[:, :2] / Xc2[:, 2:3]
        mk3 = lambda p: jnp.concatenate([p, jnp.ones_like(p[:, :1])], -1)
        res = two_view.reconstruct_two_views(
            jax.random.PRNGKey(4), mk3(x1), mk3(x2), jnp.ones(n, bool), focal=450.0
        )
        assert not bool(res.ok)
