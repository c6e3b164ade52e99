"""Cameras, triangulation, and point-set alignment tests."""

import numpy as np
import jax
import jax.numpy as jnp

from dvm_slam_tpu.geometry import lie, cameras, triangulation, alignment


def make_pose(rng, scale=0.5):
    phi = rng.randn(3).astype(np.float32) * scale
    t = rng.randn(3).astype(np.float32)
    return lie.se3(lie.so3_exp(jnp.asarray(phi)), jnp.asarray(t))


class TestPinhole:
    K = jnp.array([458.654, 457.296, 367.215, 248.375], jnp.float32)
    dist = jnp.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05], jnp.float32)

    def test_project_unproject(self, rng):
        p = rng.rand(100, 3).astype(np.float32)
        p[:, :2] -= 0.5
        p[:, 2] += 0.5
        uv, valid = cameras.pinhole_project(self.K, jnp.asarray(p))
        assert bool(valid.all())
        rays = cameras.pinhole_unproject(self.K, uv)
        np.testing.assert_allclose(rays * p[:, 2:3], p, rtol=1e-4, atol=1e-4)

    def test_undistort_roundtrip(self, rng):
        xy = (rng.rand(200, 2).astype(np.float32) - 0.5) * 0.8
        xy_d = cameras.radtan_distort(self.dist, jnp.asarray(xy))
        xy_u = cameras.radtan_undistort(self.dist, xy_d, iters=20)
        np.testing.assert_allclose(xy_u, xy, atol=1e-4)

    def test_undistort_pixels_identity_when_no_dist(self, rng):
        uv = rng.rand(50, 2).astype(np.float32) * 400 + 100
        zero = jnp.zeros(4)
        out = cameras.undistort_pixels(self.K, zero, jnp.asarray(uv))
        np.testing.assert_allclose(out, uv, atol=1e-3)


class TestKB8:
    params = jnp.array(
        [190.978, 190.973, 254.932, 256.897, 0.00348238, 0.000715034, -0.0020532, 0.000202937],
        jnp.float32,
    )  # TUM-VI style fisheye

    def test_project_unproject(self, rng):
        p = rng.randn(200, 3).astype(np.float32)
        p[:, 2] = np.abs(p[:, 2]) + 0.8
        uv, valid = cameras.kb8_project(self.params, jnp.asarray(p))
        rays = cameras.kb8_unproject(self.params, uv, iters=20)
        expect = p / p[:, 2:3]
        np.testing.assert_allclose(np.asarray(rays)[np.asarray(valid)], expect[np.asarray(valid)], atol=2e-3)

    def test_center_projects_to_principal_point(self):
        p = jnp.array([[0.0, 0.0, 2.0]])
        uv, valid = cameras.kb8_project(self.params, p)
        np.testing.assert_allclose(uv[0], self.params[2:4], atol=1e-4)
        assert bool(valid[0])


class TestTriangulation:
    def test_exact_recovery(self, rng):
        Xw = rng.randn(100, 3).astype(np.float32)
        Xw[:, 2] += 6.0
        T1 = lie.se3_identity()
        T2 = lie.se3(lie.so3_exp(jnp.array([0.0, 0.05, 0.0])), jnp.array([-0.5, 0.0, 0.0]))
        p1 = lie.se3_apply(T1, jnp.asarray(Xw))
        p2 = lie.se3_apply(T2[None], jnp.asarray(Xw))
        xn1 = p1[:, :2] / p1[:, 2:3]
        xn2 = p2[:, :2] / p2[:, 2:3]
        T1b = jnp.broadcast_to(T1, (100, 7))
        T2b = jnp.broadcast_to(T2, (100, 7))
        Xr, ok = triangulation.triangulate(xn1, xn2, T1b, T2b)
        assert bool(ok.all())
        np.testing.assert_allclose(Xr, Xw, atol=5e-2, rtol=1e-3)

    def test_depth_and_parallax(self, rng):
        Xw = jnp.array([[0.0, 0.0, 5.0]])
        T1 = lie.se3_identity()[None]
        T2 = lie.se3(lie.quat_identity(), jnp.array([-1.0, 0.0, 0.0]))[None]
        assert float(triangulation.depth_in_camera(T1, Xw)[0]) == 5.0
        c = triangulation.parallax_cos(T1, T2, Xw)
        assert 0.9 < float(c[0]) < 1.0


class TestAlignment:
    def test_umeyama_exact(self, rng):
        src = rng.randn(50, 3).astype(np.float32)
        S_true = jnp.concatenate(
            [lie.so3_exp(jnp.array([0.2, -0.1, 0.4])), jnp.array([1.0, -2.0, 0.5, 1.7])]
        )
        dst = lie.sim3_apply(S_true[None], jnp.asarray(src))
        S = alignment.umeyama(jnp.asarray(src), dst)
        np.testing.assert_allclose(
            lie.sim3_apply(S[None], jnp.asarray(src)), dst, atol=1e-4
        )
        np.testing.assert_allclose(float(S[7]), 1.7, atol=1e-4)

    def test_umeyama_no_scale(self, rng):
        src = rng.randn(50, 3).astype(np.float32)
        T = make_pose(rng)
        dst = lie.se3_apply(T[None], jnp.asarray(src))
        S = alignment.umeyama(jnp.asarray(src), dst, with_scale=False)
        assert abs(float(S[7]) - 1.0) < 1e-6
        np.testing.assert_allclose(lie.sim3_apply(S[None], jnp.asarray(src)), dst, atol=1e-4)

    def test_umeyama_masked_ignores_outliers(self, rng):
        src = rng.randn(60, 3).astype(np.float32)
        S_true = jnp.concatenate(
            [lie.so3_exp(jnp.array([0.0, 0.3, 0.0])), jnp.array([0.5, 0.0, 0.0, 0.9])]
        )
        dst = np.array(lie.sim3_apply(S_true[None], jnp.asarray(src)))
        dst[50:] += 100.0  # corrupt last 10
        mask = jnp.asarray(np.arange(60) < 50)
        S = alignment.umeyama(jnp.asarray(src), jnp.asarray(dst), mask=mask)
        err = alignment.alignment_residuals(S, jnp.asarray(src[:50]), jnp.asarray(dst[:50]))
        assert float(err.max()) < 1e-3

    def test_ransac_with_outliers(self, rng):
        n = 600
        src = rng.randn(n, 3).astype(np.float32) * 2.0
        S_true = jnp.concatenate(
            [lie.so3_exp(jnp.array([0.1, 0.2, -0.3])), jnp.array([1.0, 2.0, 3.0, 1.25])]
        )
        dst = np.array(lie.sim3_apply(S_true[None], jnp.asarray(src)))
        n_out = 200
        dst[:n_out] = rng.randn(n_out, 3) * 10  # 1/3 outliers
        mask = jnp.ones(n, bool)
        S, inl, cnt = alignment.ransac_umeyama(
            jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst), mask,
            num_hypotheses=500, inlier_sigma=1e-4,
        )
        assert int(cnt) > 350
        assert not bool(inl[:n_out].any())
        np.testing.assert_allclose(float(S[7]), 1.25, atol=1e-3)
        err = alignment.alignment_residuals(S, jnp.asarray(src[n_out:]), jnp.asarray(dst[n_out:]))
        assert float(jnp.median(err)) < 1e-3
