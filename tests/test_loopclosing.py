"""PnP relocalization, Sim3 solver, and pose-graph optimization tests."""

import numpy as np
import jax
import jax.numpy as jnp

from dvm_slam_tpu.geometry import lie, pnp, cameras
from dvm_slam_tpu.loopclosing import sim3_solver, pose_graph

K4 = jnp.array([300.0, 300.0, 160.0, 120.0])


class TestPnP:
    def test_recovers_pose_with_outliers(self, rng):
        n = 200
        X = rng.randn(n, 3).astype(np.float32)
        X[:, 2] = X[:, 2] * 2 + 8.0
        T_true = lie.se3(lie.so3_exp(jnp.array([0.1, -0.2, 0.05])), jnp.array([0.5, -0.3, 0.2]))
        pc = lie.se3_apply(T_true[None], jnp.asarray(X))
        uv, _ = cameras.pinhole_project(K4, pc)
        uvn = np.array(uv)
        uvn[:50] = rng.rand(50, 2) * 300  # 25% outliers
        uvn[50:] += rng.randn(150, 2) * 0.5
        T, inl, cnt = pnp.ransac_pnp(
            jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(uvn),
            jnp.ones(n, bool), K4,
        )
        assert int(cnt) > 120
        inl = np.asarray(inl)
        assert inl[:50].sum() < 5
        # refine on RANSAC inliers like Tracking::Relocalization does
        from dvm_slam_tpu.tracking import pose_opt
        Tr, inl2, _ = pose_opt.pose_optimization(
            T, jnp.asarray(X), jnp.asarray(uvn), jnp.ones(n), jnp.asarray(inl), K4
        )
        dt = np.linalg.norm(np.asarray(lie.se3_t(Tr)) - np.asarray(lie.se3_t(T_true)))
        assert dt < 0.05


class TestSim3Solver:
    def test_recovers_relative_sim3(self, rng):
        n = 150
        # world points + two cameras seeing them
        X = rng.randn(n, 3).astype(np.float32)
        X[:, 2] = X[:, 2] * 1.5 + 7.0
        T1 = lie.se3_identity()
        T2 = lie.se3(lie.so3_exp(jnp.array([0.05, 0.3, -0.05])), jnp.array([-1.0, 0.2, 0.3]))
        # camera 2's map is scale-drifted by s
        s = 1.3
        pc1 = lie.se3_apply(T1[None], jnp.asarray(X))
        pc2 = lie.se3_apply(T2[None], jnp.asarray(X)) * s
        uv1, _ = cameras.pinhole_project(K4, pc1)
        uv2, _ = cameras.pinhole_project(K4, pc2)  # projection is scale-invariant
        sig = jnp.ones(n)
        mask = np.ones(n, bool)
        pc2n = np.array(pc2)
        pc2n[:30] += rng.randn(30, 3) * 5  # outlier associations
        S12, inl, cnt = sim3_solver.ransac_sim3(
            jax.random.PRNGKey(1), pc1, jnp.asarray(pc2n), uv1, uv2, sig, sig,
            jnp.asarray(mask), K4,
        )
        assert int(cnt) > 100
        # S12 should map cam2 coords -> cam1 coords: T1 * T2^-1 with scale 1/s
        expect = lie.sim3_mul(
            lie.sim3_from_se3(lie.se3_mul(T1, lie.se3_inv(T2))),
            lie.sim3_identity().at[7].set(1.0 / s),
        )
        got = lie.sim3_apply(S12[None], jnp.asarray(pc2n[50:]))
        want = lie.sim3_apply(expect[None], jnp.asarray(pc2n[50:]))
        np.testing.assert_allclose(got, want, atol=0.05)
        np.testing.assert_allclose(float(S12[7]), 1.0 / s, rtol=0.02)


class TestPoseGraph:
    def _chain(self, rng, n=12):
        """Ground-truth chain of poses along x with mild rotation."""
        poses = []
        for i in range(n):
            T_wc = lie.se3(
                lie.so3_exp(jnp.array([0.0, 0.05 * i, 0.0])),
                jnp.array([0.5 * i, 0.0, 0.0]),
            )
            poses.append(lie.sim3_from_se3(lie.se3_inv(T_wc)))
        return jnp.stack(poses)

    def test_loop_closure_distributes_drift(self, rng):
        n = 12
        gt = self._chain(rng, n)
        # odometry edges from ground truth
        ei = np.arange(n - 1, dtype=np.int32)
        ej = np.arange(1, n, dtype=np.int32)
        meas = jax.vmap(lambda i, j: lie.sim3_mul(gt[i], lie.sim3_inv(gt[j])))(
            jnp.asarray(ei), jnp.asarray(ej)
        )
        # drifted estimates: accumulate noisy odometry
        drift = [np.asarray(gt[0])]
        for i in range(n - 1):
            noise = lie.sim3_exp(jnp.asarray(
                np.concatenate([rng.randn(3) * 0.03, rng.randn(3) * 0.01, rng.randn(1) * 0.02]).astype(np.float32)
            ))
            step = lie.sim3_mul(noise, lie.sim3_mul(gt[i], lie.sim3_inv(gt[i + 1])))
            drift.append(np.asarray(lie.sim3_mul(lie.sim3_inv(step), jnp.asarray(drift[-1]))))
        est = jnp.asarray(np.stack(drift))
        # loop edge: last-to-first, measured exactly
        ei_all = jnp.asarray(np.concatenate([ei, [n - 1]]).astype(np.int32))
        ej_all = jnp.asarray(np.concatenate([ej, [0]]).astype(np.int32))
        loop_meas = lie.sim3_mul(gt[n - 1], lie.sim3_inv(gt[0]))
        meas_all = jnp.concatenate([meas, loop_meas[None]])
        fixed = jnp.asarray([True] + [False] * (n - 1))
        emask = jnp.ones(n, bool)

        r0 = jax.vmap(lambda i, j, s: pose_graph.edge_residual(est[i], est[j], s))(
            ei_all, ej_all, meas_all
        )
        cost0 = float(jnp.sum(r0 * r0))
        opt, cost = pose_graph.optimize_pose_graph(est, fixed, ei_all, ej_all, meas_all, emask, iters=25)
        assert float(cost) < cost0 * 0.05
        # optimized poses should be close to ground truth
        err_t = np.abs(np.asarray(lie.sim3_t(opt)) - np.asarray(lie.sim3_t(gt))).max()
        err_s = np.abs(np.asarray(lie.sim3_s(opt)) - 1.0).max()
        assert err_t < 0.15
        assert err_s < 0.05

    def test_correct_points_follows_ref_kf(self, rng):
        n = 4
        gt = self._chain(rng, n)
        # new poses: global sim3 applied
        G = jnp.concatenate([lie.so3_exp(jnp.array([0.0, 0.2, 0.0])), jnp.array([1.0, 0.0, 0.0, 1.5])])
        new = jax.vmap(lambda S: lie.sim3_mul(S, lie.sim3_inv(G)))(gt)
        pts = jnp.asarray(rng.randn(20, 3).astype(np.float32))
        ref = jnp.asarray(rng.randint(0, n, 20).astype(np.int32))
        out = pose_graph.correct_points(pts, ref, jnp.ones(20, bool), gt, new)
        # X' = S_new^-1 S_old X = G X
        expect = lie.sim3_apply(G[None], pts)
        np.testing.assert_allclose(out, expect, atol=1e-4)

    def test_build_edges(self):
        covis = np.zeros((5, 5), np.int32)
        covis[0, 1] = covis[1, 0] = 150
        covis[1, 2] = covis[2, 1] = 50
        valid = np.ones(5, bool)
        ei, ej = pose_graph.build_essential_edges(
            covis, valid, spanning_parent=[-1, 0, 1, 2, 3], extra_edges=[(0, 4)]
        )
        pairs = set(zip(ei.tolist(), ej.tolist()))
        assert (0, 1) in pairs and (1, 2) in pairs and (0, 4) in pairs
        assert (2, 3) in pairs and (3, 4) in pairs


class TestPoseGraph4DoF:
    def _chain_se3(self, n=10):
        poses = []
        for i in range(n):
            T_wc = lie.se3(
                lie.so3_exp(jnp.array([0.0, 0.0, 0.06 * i])),  # yaw only
                jnp.array([0.5 * i, 0.1 * i, 0.0]),
            )
            poses.append(lie.se3_inv(T_wc))
        return jnp.stack(poses)

    def test_yaw_translation_loop_correction(self, rng):
        """`OptimizeEssentialGraph4DoF` (Optimizer.cc:4940): yaw+translation
        drift is corrected; roll/pitch stay untouched."""
        n = 10
        gt = self._chain_se3(n)
        ei = np.arange(n - 1, dtype=np.int32)
        ej = np.arange(1, n, dtype=np.int32)
        meas = jax.vmap(lambda i, j: lie.se3_mul(gt[i], lie.se3_inv(gt[j])))(
            jnp.asarray(ei), jnp.asarray(ej)
        )
        # drift only in the observable dims (translation + yaw)
        drift = [np.asarray(gt[0])]
        for i in range(n - 1):
            tang = np.zeros(6, np.float32)
            tang[:3] = rng.randn(3) * 0.04
            tang[5] = rng.randn() * 0.02
            noise = lie.se3_exp(jnp.asarray(tang))
            step = lie.se3_mul(noise, lie.se3_mul(gt[i], lie.se3_inv(gt[i + 1])))
            drift.append(np.asarray(
                lie.se3_mul(lie.se3_inv(step), jnp.asarray(drift[-1]))
            ))
        est = jnp.asarray(np.stack(drift))
        ei_all = jnp.asarray(np.concatenate([ei, [n - 1]]).astype(np.int32))
        ej_all = jnp.asarray(np.concatenate([ej, [0]]).astype(np.int32))
        loop = lie.se3_mul(gt[n - 1], lie.se3_inv(gt[0]))
        meas_all = jnp.concatenate([meas, loop[None]])
        fixed = jnp.asarray([True] + [False] * (n - 1))
        emask = jnp.ones(n, bool)

        opt, cost = pose_graph.optimize_pose_graph_4dof(
            est, fixed, ei_all, ej_all, meas_all, emask, iters=25
        )
        err_t = np.abs(np.asarray(lie.se3_t(opt)) - np.asarray(lie.se3_t(gt))).max()
        assert err_t < 0.15, err_t
        assert float(cost) < 1e-3


class TestMarginalize:
    def test_schur_prior_matches_direct_solution(self, rng):
        """Marginalizing x_m out of a quadratic and solving the remainder
        equals the joint solve restricted to the kept block
        (`Optimizer::Marginalize`, Optimizer.cc:2744)."""
        from dvm_slam_tpu.mapping import inertial

        D, s, e = 12, 3, 7
        A = rng.randn(D, D + 4).astype(np.float32)
        H = jnp.asarray(A @ A.T + 0.5 * np.eye(D, dtype=np.float32))
        b = jnp.asarray(rng.randn(D).astype(np.float32))
        Hm, bm = inertial.marginalize(H, b, s, e)
        # direct joint solution
        x = np.linalg.solve(np.asarray(H), -np.asarray(b))
        ki = np.concatenate([np.arange(0, s), np.arange(e, D)])
        # solve the marginalized system on the kept block
        xk = np.linalg.solve(np.asarray(Hm)[np.ix_(ki, ki)],
                             -np.asarray(bm)[ki])
        assert np.allclose(xk, x[ki], atol=1e-3)
        # marginalized rows/cols are zeroed in the re-embedded system
        assert np.allclose(np.asarray(Hm)[s:e], 0.0)
