"""Bundle adjustment, local mapping ops, and the full tracking+mapping
end-to-end accuracy test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvm_slam_tpu.geometry import lie, cameras
from dvm_slam_tpu.mapping import ba, map_state, local_mapping
from dvm_slam_tpu.tracking import tracker
from dvm_slam_tpu.frontend.extractor import FrontendConfig
from dvm_slam_tpu.io import synthetic
from dvm_slam_tpu.eval import metrics

pytestmark = pytest.mark.slow  # heavy e2e; deselect with -m 'not slow'

K4 = jnp.array([300.0, 300.0, 160.0, 120.0])


def make_ba_problem(rng, n_cams=6, n_pts=300, noise_px=0.5):
    X = rng.randn(n_pts, 3).astype(np.float32)
    X[:, 2] = X[:, 2] * 2 + 10.0
    poses = []
    for i in range(n_cams):
        t = np.array([i * 0.4 - 1.0, 0.02 * i, 0.0], np.float32)
        phi = np.array([0.0, 0.02 * i, 0.0], np.float32)
        T_wc = lie.se3(lie.so3_exp(jnp.asarray(phi)), jnp.asarray(t))
        poses.append(np.asarray(lie.se3_inv(T_wc)))
    poses = jnp.asarray(np.stack(poses))
    # observations: every camera sees every point
    uv = []
    for i in range(n_cams):
        pc = lie.se3_apply(poses[i][None], jnp.asarray(X))
        u, _ = cameras.pinhole_project(K4, pc)
        uv.append(np.asarray(u) + rng.randn(n_pts, 2).astype(np.float32) * noise_px)
    uv = jnp.asarray(np.stack(uv))  # [L,F=P,2]
    obs_pt = jnp.broadcast_to(jnp.arange(n_pts, dtype=jnp.int32)[None], (n_cams, n_pts))
    sigma2 = jnp.ones((n_cams, n_pts))
    return poses, jnp.asarray(X), uv, obs_pt, sigma2


class TestBundleAdjust:
    def test_recovers_from_perturbation(self, rng):
        poses, X, uv, obs_pt, sigma2 = make_ba_problem(rng, noise_px=0.0)
        n_cams, n_pts = obs_pt.shape
        key = jax.random.PRNGKey(0)
        dp = jax.random.normal(key, poses[:, :1].shape) * 0  # placeholder
        pert = jnp.asarray(
            np.concatenate(
                [np.zeros((2, 6), np.float32),
                 rng.randn(n_cams - 2, 6).astype(np.float32) * 0.02]
            )
        )
        poses0 = jax.vmap(lie.se3_retract)(poses, pert)
        X0 = X + jnp.asarray(rng.randn(n_pts, 3).astype(np.float32) * 0.05)
        fixed = jnp.asarray([True, True] + [False] * (n_cams - 2))
        newp, newx, chi2, inl = ba.bundle_adjust(
            poses0, fixed, uv, sigma2, obs_pt, X0, jnp.ones(n_pts, bool), K4, iters=15
        )
        assert float(chi2) < 1e-2
        np.testing.assert_allclose(
            np.asarray(lie.se3_t(newp)), np.asarray(lie.se3_t(poses)), atol=2e-3
        )
        np.testing.assert_allclose(np.asarray(newx), np.asarray(X), atol=5e-3)
        assert bool(inl.all())

    def test_fixed_cameras_unchanged(self, rng):
        poses, X, uv, obs_pt, sigma2 = make_ba_problem(rng)
        n_cams, n_pts = obs_pt.shape
        fixed = jnp.asarray([True] * n_cams)
        newp, newx, chi2, inl = ba.bundle_adjust(
            poses, fixed, uv, sigma2, obs_pt, X, jnp.ones(n_pts, bool), K4, iters=3
        )
        np.testing.assert_allclose(newp, poses, atol=1e-6)

    def test_robust_to_outlier_observations(self, rng):
        poses, X, uv, obs_pt, sigma2 = make_ba_problem(rng, noise_px=0.3)
        uvn = np.array(uv)
        uvn[2, :20] += 80.0  # corrupt 20 observations in camera 2
        n_cams, n_pts = obs_pt.shape
        fixed = jnp.asarray([True, True] + [False] * (n_cams - 2))
        newp, newx, chi2, inl = ba.bundle_adjust(
            poses, fixed, jnp.asarray(uvn), sigma2, obs_pt, X,
            jnp.ones(n_pts, bool), K4, iters=10
        )
        inl = np.asarray(inl)
        assert inl[2, :20].sum() == 0  # outliers classified
        assert inl[2, 20:].sum() > 260  # clean obs kept
        # the 80px-corrupted edges must not measurably bias the solution:
        # compare against the same solve on clean data (the ML optimum wanders
        # ~2cm from truth at this noise/geometry — that part is legitimate)
        newp_c, _, _, _ = ba.bundle_adjust(
            poses, fixed, uv, sigma2, obs_pt, X, jnp.ones(n_pts, bool), K4, iters=10
        )
        np.testing.assert_allclose(
            np.asarray(lie.se3_t(newp)), np.asarray(lie.se3_t(newp_c)), atol=5e-3
        )


class TestCulling:
    def test_low_found_ratio_culled(self):
        m = map_state.create(8, 64, 16)
        m, _ = map_state.add_points(
            m, jnp.zeros((4, 3)), jnp.zeros((4, 256), jnp.uint8),
            jnp.zeros((4, 3)), jnp.zeros(4), jnp.ones(4), jnp.int32(0),
            jnp.ones(4, bool),
        )
        m = m._replace(
            pt_visible=m.pt_visible.at[:4].set(jnp.array([10, 10, 10, 10])),
            pt_found=m.pt_found.at[:4].set(jnp.array([1, 9, 2, 8])),
        )
        m2 = local_mapping.cull_points(m, jnp.int32(1))
        v = np.asarray(m2.pt_valid[:4])
        assert not v[0] and not v[2]  # ratio 0.1, 0.2 -> culled


@pytest.fixture(scope="module")
def world():
    return synthetic.PlaneWorld(seed=3, tex_size=1024, plane_z=6.0, extent=30.0)


class TestEndToEndWithMapping:
    H, W = 240, 320
    K = np.array([260.0, 260.0, 160.0, 120.0], np.float32)

    def _run(self, world, n_frames=50, **traj_kw):
        cfg = tracker.TrackerConfig(
            frontend=FrontendConfig(height=self.H, width=self.W, n_features=600),
            kf_cap=64, pt_cap=4096, fps=10.0,
        )
        mapper = local_mapping.LocalMapper(
            n_neighbors=4, ba_local=8, ba_fixed=8, ba_pts=2048, ba_iters=6
        )
        t = tracker.MonocularTracker(cfg, self.K, np.zeros(4, np.float32),
                                     local_mapper=mapper)
        poses_gt = synthetic.smooth_trajectory(n_frames, **traj_kw)
        est, gt = [], []
        for i, T_cw in enumerate(poses_gt):
            img = world.render(jnp.asarray(T_cw), jnp.asarray(self.K), self.H, self.W)
            pose = t.process_image(np.asarray(img), i * 0.1)
            if pose is not None:
                est.append(np.asarray(pose))
                gt.append(T_cw)
        return t, est, gt

    def test_accuracy_with_mapping(self, world):
        t, est, gt = self._run(world, n_frames=50, lateral=2.0, forward=0.5, yaw=0.08)
        assert t.state == tracker.OK
        assert len(est) > 30
        assert int(t.map.n_kf) >= 3  # mapping created keyframes
        assert int(jnp.sum(t.map.pt_valid)) > 200
        rmse, _, _ = metrics.ate_rmse(np.stack(est), np.stack(gt))
        assert rmse < 0.06, f"ATE RMSE {rmse:.3f} m"


class TestApplyGbaCorrection:
    """Async-GBA catch-up semantics (`LoopClosing::RunGlobalBundleAdjustment`
    role, `LoopClosing.cc:2267`): snapshot slots take optimized values;
    keyframes/points created while the solve ran are corrected through the
    anchor / reprojected through their reference keyframe."""

    def test_grow_during_solve(self, rng):
        Kc, Pc = 8, 16
        m = map_state.create(Kc, Pc, feat_cap=4)
        # 3 snapshot keyframes with small random poses
        poses = []
        for i in range(3):
            T = lie.se3(lie.so3_exp(jnp.asarray(rng.randn(3) * 0.1)),
                        jnp.asarray(rng.randn(3) * 0.5))
            poses.append(T)
        kf_pose = m.kf_pose.at[:3].set(jnp.stack(poses))
        kf_valid = m.kf_valid.at[:3].set(True)
        pt_pos = m.pt_pos.at[:4].set(jnp.asarray(rng.randn(4, 3) + [0, 0, 6]))
        pt_valid = m.pt_valid.at[:4].set(True)
        pt_ref = m.pt_ref_kf.at[:4].set(jnp.asarray([0, 1, 2, 0]))
        m = m._replace(kf_pose=kf_pose, kf_valid=kf_valid, pt_pos=pt_pos,
                       pt_valid=pt_valid, pt_ref_kf=pt_ref,
                       n_kf=jnp.int32(3), n_pt=jnp.int32(4))

        # the async solve's result: every snapshot pose/point shifted
        dT = lie.se3(lie.so3_exp(jnp.asarray([0.0, 0.05, 0.0])),
                     jnp.asarray([0.2, 0.0, -0.1]))
        res_pose = jax.vmap(lambda T: lie.se3_mul(T, dT))(m.kf_pose)
        res_pt = m.pt_pos + 0.25

        # the live map grew while the solve ran: one new KF + one new point
        # referenced to it
        T_new = lie.se3(lie.so3_exp(jnp.asarray([0.02, 0.0, 0.0])),
                        jnp.asarray([1.0, 0.0, 0.0]))
        live = m._replace(
            kf_pose=m.kf_pose.at[3].set(T_new),
            kf_valid=m.kf_valid.at[3].set(True),
            pt_pos=m.pt_pos.at[4].set(jnp.asarray([0.5, -0.5, 7.0])),
            pt_valid=m.pt_valid.at[4].set(True),
            pt_ref_kf=m.pt_ref_kf.at[4].set(3),
            n_kf=jnp.int32(4), n_pt=jnp.int32(5),
        )

        out = local_mapping.apply_gba_correction(
            live, res_pose, res_pt, jnp.int32(3), jnp.int32(4), jnp.int32(0))

        # snapshot keyframes take the optimized poses verbatim
        np.testing.assert_allclose(np.asarray(out.kf_pose[:3]),
                                   np.asarray(res_pose[:3]), atol=1e-5)
        # the new keyframe moves by the anchor correction:
        # T' = T_new . T_anchor_live^-1 . T_anchor_gba
        corr = lie.se3_mul(lie.se3_inv(live.kf_pose[0]), res_pose[0])
        expect = lie.se3_mul(T_new, corr)
        np.testing.assert_allclose(np.asarray(out.kf_pose[3]),
                                   np.asarray(expect), atol=1e-5)
        # snapshot points take the optimized positions verbatim
        np.testing.assert_allclose(np.asarray(out.pt_pos[:4]),
                                   np.asarray(res_pt[:4]), atol=1e-5)
        # the new point re-projects through its (corrected) reference KF:
        # its camera-frame coordinates are preserved
        cam_old = lie.se3_apply(live.kf_pose[3], live.pt_pos[4])
        cam_new = lie.se3_apply(out.kf_pose[3], out.pt_pos[4])
        np.testing.assert_allclose(np.asarray(cam_new), np.asarray(cam_old),
                                   atol=1e-5)
        # invalid slots untouched
        np.testing.assert_allclose(np.asarray(out.kf_pose[5]),
                                   np.asarray(live.kf_pose[5]))


class TestBundleAdjustPCG:
    """Matrix-free Schur-PCG global BA (`ba.bundle_adjust_pcg`) — the
    scalable path behind `local_mapping.global_ba` full-map coverage."""

    def test_matches_dense_solver(self, rng):
        poses, X, uv, obs_pt, sigma2 = make_ba_problem(rng, noise_px=0.0)
        n_cams, n_pts = obs_pt.shape
        pert = jnp.asarray(
            np.concatenate(
                [np.zeros((2, 6), np.float32),
                 rng.randn(n_cams - 2, 6).astype(np.float32) * 0.02]
            )
        )
        poses0 = jax.vmap(lie.se3_retract)(poses, pert)
        X0 = X + jnp.asarray(rng.randn(n_pts, 3).astype(np.float32) * 0.05)
        fixed = jnp.asarray([True, True] + [False] * (n_cams - 2))
        newp, newx, chi2, inl = ba.bundle_adjust_pcg(
            poses0, fixed, uv, sigma2, obs_pt, X0, jnp.ones(n_pts, bool), K4,
            lm_iters=15, pcg_iters=40,
        )
        assert float(chi2) < 1e-2
        np.testing.assert_allclose(
            np.asarray(lie.se3_t(newp)), np.asarray(lie.se3_t(poses)), atol=2e-3
        )
        np.testing.assert_allclose(np.asarray(newx), np.asarray(X), atol=5e-3)
        assert bool(inl.all())

    def test_fixed_cameras_unchanged(self, rng):
        poses, X, uv, obs_pt, sigma2 = make_ba_problem(rng)
        n_cams, n_pts = obs_pt.shape
        fixed = jnp.asarray([True] * n_cams)
        newp, _, _, _ = ba.bundle_adjust_pcg(
            poses, fixed, uv, sigma2, obs_pt, X, jnp.ones(n_pts, bool), K4,
            lm_iters=3,
        )
        np.testing.assert_allclose(newp, poses, atol=1e-6)

    def test_outlier_classification(self, rng):
        poses, X, uv, obs_pt, sigma2 = make_ba_problem(rng, noise_px=0.3)
        uvn = np.array(uv)
        uvn[2, :20] += 80.0
        n_cams, n_pts = obs_pt.shape
        fixed = jnp.asarray([True, True] + [False] * (n_cams - 2))
        newp, _, _, inl = ba.bundle_adjust_pcg(
            poses, fixed, jnp.asarray(uvn), sigma2, obs_pt, X,
            jnp.ones(n_pts, bool), K4, lm_iters=10,
        )
        inl = np.asarray(inl)
        assert inl[2, :20].sum() == 0
        assert inl[2, 20:].sum() > 260

    def test_stereo_rows_pin_metric_scale(self, rng):
        """With only keyframe 0 (at the origin) fixed, a mono-only global BA
        has a free scale gauge: a consistently scaled map has zero
        reprojection error and survives the solve. The stereo disparity
        rows must pull the map back to metric scale (review r3 finding:
        bundle_adjust_pcg silently dropped them)."""
        bf = float(K4[0]) * 0.1  # fx * 10cm baseline
        poses, X, uv, obs_pt, sigma2 = make_ba_problem(rng, noise_px=0.0)
        n_cams, n_pts = obs_pt.shape
        # ground-truth right-u observations from the TRUE geometry
        ur = []
        for i in range(n_cams):
            pc = lie.se3_apply(poses[i][None], jnp.asarray(X))
            z = pc[:, 2]
            u = K4[0] * pc[:, 0] / z + K4[2]
            ur.append(np.asarray(u - bf / z))
        ur = jnp.asarray(np.stack(ur))
        # consistently scale the whole initialization by 1.1 ABOUT CAMERA
        # 0's center (the fixed gauge camera): its pose is unchanged, every
        # other center and point scales with it -> mono residuals stay ~0
        s = 1.1
        q0 = lie.se3_q(poses[0])
        C0 = -lie.quat_rotate(lie.quat_conj(q0), lie.se3_t(poses[0]))
        X0 = C0 + (jnp.asarray(X) - C0) * s

        def scale_pose(T):
            q = lie.se3_q(T)
            C = -lie.quat_rotate(lie.quat_conj(q), lie.se3_t(T))  # center
            Cs = C0 + (C - C0) * s
            return lie.se3(q, -lie.quat_rotate(q, Cs))

        poses0 = jax.vmap(scale_pose)(poses)
        fixed = jnp.zeros((n_cams,), bool).at[0].set(True)

        # mono-only: the scaled configuration is a valid optimum
        newp_m, newx_m, chi2_m, _ = ba.bundle_adjust_pcg(
            poses0, fixed, uv, sigma2, obs_pt, X0, jnp.ones(n_pts, bool),
            K4, lm_iters=10, pcg_iters=40,
        )
        scale_m = float(jnp.median(
            jnp.linalg.norm(newx_m - C0, axis=1)
            / jnp.linalg.norm(jnp.asarray(X) - C0, axis=1)))
        assert abs(scale_m - s) < 0.02, "mono gauge check (sanity)"

        # with disparity rows: scale is observable and must return to 1
        newp_s, newx_s, chi2_s, _ = ba.bundle_adjust_pcg(
            poses0, fixed, uv, sigma2, obs_pt, X0, jnp.ones(n_pts, bool),
            K4, kf_ur=ur, bf=jnp.float32(bf), lm_iters=20, pcg_iters=40,
        )
        scale_s = float(jnp.median(
            jnp.linalg.norm(newx_s - C0, axis=1)
            / jnp.linalg.norm(jnp.asarray(X) - C0, axis=1)))
        assert abs(scale_s - 1.0) < 0.02, f"scale not recovered: {scale_s}"

    def test_scales_past_dense_window(self, rng):
        """A 40-camera / 1500-point problem — larger than the old dense
        global-BA window — converges and moves every free camera."""
        from dvm_slam_tpu.geometry import cameras as cams_mod

        n_cams, n_pts = 40, 1500
        X = rng.randn(n_pts, 3).astype(np.float32)
        X[:, 2] = X[:, 2] * 2 + 10.0
        pl = []
        for i in range(n_cams):  # compact ring: every camera sees the cloud
            t = np.array([np.sin(i * 0.15) * 1.5, 0.02 * i, -np.cos(i * 0.15)],
                         np.float32)
            phi = np.array([0.0, 0.05 * np.sin(i * 0.3), 0.0], np.float32)
            T_wc = lie.se3(lie.so3_exp(jnp.asarray(phi)), jnp.asarray(t))
            pl.append(np.asarray(lie.se3_inv(T_wc)))
        poses = jnp.asarray(np.stack(pl))
        uv = []
        for i in range(n_cams):
            pc = lie.se3_apply(poses[i][None], jnp.asarray(X))
            u, _ = cams_mod.pinhole_project(K4, pc)
            uv.append(np.asarray(u))
        uv = jnp.asarray(np.stack(uv))
        obs_pt = jnp.broadcast_to(jnp.arange(n_pts, dtype=jnp.int32)[None],
                                  (n_cams, n_pts))
        sigma2 = jnp.ones((n_cams, n_pts))
        X = jnp.asarray(X)
        pert = jnp.asarray(
            np.concatenate(
                [np.zeros((2, 6), np.float32),
                 rng.randn(n_cams - 2, 6).astype(np.float32) * 0.01]
            )
        )
        poses0 = jax.vmap(lie.se3_retract)(poses, pert)
        fixed = jnp.asarray([True, True] + [False] * (n_cams - 2))
        newp, newx, chi2, _ = ba.bundle_adjust_pcg(
            poses0, fixed, uv, sigma2, obs_pt, X, jnp.ones(n_pts, bool), K4,
            lm_iters=12, pcg_iters=50,
        )
        np.testing.assert_allclose(
            np.asarray(lie.se3_t(newp)), np.asarray(lie.se3_t(poses)), atol=3e-3
        )
        moved = np.abs(np.asarray(newp) - np.asarray(poses0)).sum(-1) > 1e-7
        assert moved[2:].all()  # every free camera was optimized
