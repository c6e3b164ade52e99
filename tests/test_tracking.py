"""Pose optimization + end-to-end single-agent tracking on the synthetic
textured-plane world (the M4 minimum slice)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvm_slam_tpu.geometry import lie, cameras
from dvm_slam_tpu.tracking import pose_opt, tracker
from dvm_slam_tpu.frontend.extractor import FrontendConfig
from dvm_slam_tpu.io import synthetic
from dvm_slam_tpu.eval import metrics

pytestmark = pytest.mark.slow  # heavy e2e; deselect with -m 'not slow'


class TestPoseOpt:
    K = jnp.array([300.0, 300.0, 160.0, 120.0])

    def _problem(self, rng, n=200, noise=0.3):
        X = rng.randn(n, 3).astype(np.float32)
        X[:, 2] = X[:, 2] * 1.5 + 8.0
        T_true = lie.se3(lie.so3_exp(jnp.array([0.05, -0.1, 0.02])), jnp.array([0.3, -0.2, 0.1]))
        pc = lie.se3_apply(T_true[None], jnp.asarray(X))
        uv, _ = cameras.pinhole_project(self.K, pc)
        uv = uv + rng.randn(n, 2).astype(np.float32) * noise
        return jnp.asarray(X), uv, T_true

    def test_recovers_pose(self, rng):
        X, uv, T_true = self._problem(rng)
        sigma2 = jnp.ones(X.shape[0])
        T0 = lie.se3_retract(T_true, jnp.array([0.2, -0.1, 0.15, 0.03, 0.05, -0.04]))
        T, inl, chi2 = pose_opt.pose_optimization(T0, X, uv, sigma2, jnp.ones(X.shape[0], bool), self.K)
        assert int(inl.sum()) > 180
        dt = np.linalg.norm(np.asarray(lie.se3_t(T)) - np.asarray(lie.se3_t(T_true)))
        assert dt < 1e-2  # 0.3 px noise floor

    def test_exact_recovery_no_noise(self, rng):
        X, uv, T_true = self._problem(rng, noise=0.0)
        sigma2 = jnp.ones(X.shape[0])
        T0 = lie.se3_retract(T_true, jnp.array([0.15, -0.1, 0.1, 0.02, 0.04, -0.03]))
        T, inl, _ = pose_opt.pose_optimization(T0, X, uv, sigma2, jnp.ones(X.shape[0], bool), self.K)
        dt = np.linalg.norm(np.asarray(lie.se3_t(T)) - np.asarray(lie.se3_t(T_true)))
        assert dt < 2e-4
        assert int(inl.sum()) == X.shape[0]

    def test_outliers_classified(self, rng):
        X, uv, T_true = self._problem(rng, noise=0.2)
        uvn = np.array(uv)
        uvn[:40] += rng.randn(40, 2) * 60 + 30  # gross outliers
        sigma2 = jnp.ones(X.shape[0])
        T0 = lie.se3_retract(T_true, jnp.array([0.1, 0.0, 0.05, 0.01, -0.02, 0.0]))
        T, inl, chi2 = pose_opt.pose_optimization(
            T0, X, jnp.asarray(uvn), sigma2, jnp.ones(X.shape[0], bool), self.K
        )
        inl = np.asarray(inl)
        assert inl[:40].sum() <= 2
        assert inl[40:].sum() > 140
        dt = np.linalg.norm(np.asarray(lie.se3_t(T)) - np.asarray(lie.se3_t(T_true)))
        assert dt < 1e-2

    def test_respects_information_weights(self, rng):
        X, uv, T_true = self._problem(rng, noise=0.0)
        sigma2 = jnp.full((X.shape[0],), 4.0)
        T, inl, chi2 = pose_opt.pose_optimization(
            T_true, X, uv, sigma2, jnp.ones(X.shape[0], bool), self.K
        )
        assert int(inl.sum()) == X.shape[0]


@pytest.fixture(scope="module")
def world():
    return synthetic.PlaneWorld(seed=3, tex_size=1024, plane_z=6.0, extent=30.0)


class TestEndToEndTracking:
    H, W = 240, 320
    K = np.array([260.0, 260.0, 160.0, 120.0], np.float32)

    def test_initialize_and_track(self, world):
        cfg = tracker.TrackerConfig(
            frontend=FrontendConfig(height=self.H, width=self.W, n_features=600),
            kf_cap=64, pt_cap=2048, fps=10.0,
        )
        t = tracker.MonocularTracker(cfg, self.K, np.zeros(4, np.float32))
        n_frames = 40
        poses_gt = synthetic.smooth_trajectory(n_frames, lateral=2.0, forward=0.5, yaw=0.08)
        est, gt = [], []
        for i, T_cw in enumerate(poses_gt):
            img = world.render(jnp.asarray(T_cw), jnp.asarray(self.K), self.H, self.W)
            pose = t.process_image(np.asarray(img), i * 0.1)
            if pose is not None:
                est.append(np.asarray(pose))
                gt.append(T_cw)
        assert t.state == tracker.OK, f"tracker state {t.state}"
        assert len(est) > n_frames * 0.6, f"only {len(est)} tracked frames"
        rmse, _, S = metrics.ate_rmse(np.stack(est), np.stack(gt))
        # mapping-less tracker (frozen init map, no BA): coarse bound only.
        # test_mapping.py asserts cm-level accuracy with local mapping on.
        assert rmse < 0.5, f"ATE RMSE {rmse:.3f} m"

    def test_lost_on_black_frames(self, world):
        cfg = tracker.TrackerConfig(
            frontend=FrontendConfig(height=self.H, width=self.W, n_features=600),
            kf_cap=64, pt_cap=2048, fps=10.0,
        )
        t = tracker.MonocularTracker(cfg, self.K, np.zeros(4, np.float32))
        poses_gt = synthetic.smooth_trajectory(20, lateral=1.5, forward=0.3)
        for i, T_cw in enumerate(poses_gt):
            img = world.render(jnp.asarray(T_cw), jnp.asarray(self.K), self.H, self.W)
            t.process_image(np.asarray(img), i * 0.1)
        assert t.state == tracker.OK
        black = np.zeros((self.H, self.W), np.float32)
        out = t.process_image(black, 99.0)
        assert out is None
        assert t.state in (tracker.RECENTLY_LOST, tracker.LOST)


class TestAutonomousMode:
    """Device-autonomous tracking (`tracker.autonomous_step`): keyframe
    decision + mapper chain under lax.cond on device, host bookkeeping
    catching up from async flag readbacks (the TPU-native 3-thread
    overlap, `System.cc:209,226`)."""

    H, W = 240, 320
    K = np.asarray([260.0, 260.0, 160.0, 120.0], np.float32)

    def test_autonomous_matches_host_bookkeeping(self, world):
        from dvm_slam_tpu.mapping import local_mapping

        cfg = tracker.TrackerConfig(
            frontend=FrontendConfig(height=self.H, width=self.W,
                                    n_features=600, n_levels=4),
            kf_cap=64, pt_cap=4096, fps=10.0,
        )
        mapper = local_mapping.LocalMapper(n_neighbors=4, ba_local=8,
                                           ba_fixed=4, ba_pts=2048,
                                           ba_iters=4)
        t = tracker.MonocularTracker(cfg, self.K, np.zeros(4, np.float32),
                                     local_mapper=mapper)
        poses = synthetic.smooth_trajectory(36, lateral=2.0, forward=0.5,
                                            yaw=0.08)
        Kj = jnp.asarray(self.K)
        entered = False
        for i, p in enumerate(poses):
            img = np.asarray(world.render(jnp.asarray(p), Kj, self.H, self.W))
            t.process_image(img, i * 0.1)
            if not entered and t.state == tracker.OK and i >= 10:
                t.async_depth = 3
                entered = t.enter_autonomous()
        assert entered
        t.exit_autonomous()
        t.flush_meta()
        assert t.state == tracker.OK
        # host keyframe mirror stayed consistent with the device map
        assert t.n_kf_host == int(t.map.n_kf)
        assert t.n_kf_host >= 4
        # uuids assigned for every keyframe created on-device
        assert (t.meta.kf_uuid[:t.n_kf_host].sum(axis=1) != 0).all()
        # timestamps recorded for autonomous keyframes too
        assert set(t.kf_timestamps) == set(range(t.n_kf_host))
        assert int(np.asarray(t.map.pt_valid).sum()) > 150

    def test_autonomous_hands_back_on_lost(self, world):
        from dvm_slam_tpu.mapping import local_mapping

        cfg = tracker.TrackerConfig(
            frontend=FrontendConfig(height=self.H, width=self.W,
                                    n_features=600, n_levels=4),
            kf_cap=64, pt_cap=4096, fps=10.0,
        )
        mapper = local_mapping.LocalMapper(n_neighbors=4, ba_local=8,
                                           ba_fixed=4, ba_pts=2048,
                                           ba_iters=4)
        t = tracker.MonocularTracker(cfg, self.K, np.zeros(4, np.float32),
                                     local_mapper=mapper)
        poses = synthetic.smooth_trajectory(16, lateral=2.0, forward=0.5,
                                            yaw=0.08)
        Kj = jnp.asarray(self.K)
        for i, p in enumerate(poses):
            img = np.asarray(world.render(jnp.asarray(p), Kj, self.H, self.W))
            t.process_image(img, i * 0.1)
        assert t.state == tracker.OK
        t.async_depth = 2
        assert t.enter_autonomous()
        black = np.zeros((self.H, self.W), np.float32)
        for j in range(6):
            t.process_image(black, 10.0 + j * 0.1)
            if not t.autonomous:
                break
        # the lost flag must hand control back to the host state machine
        assert not t.autonomous
        assert t.state in (tracker.RECENTLY_LOST, tracker.LOST)

    def _run(self, world, auto_batch, frames=None):
        from dvm_slam_tpu.mapping import local_mapping

        cfg = tracker.TrackerConfig(
            frontend=FrontendConfig(height=self.H, width=self.W,
                                    n_features=600, n_levels=4),
            kf_cap=64, pt_cap=4096, fps=10.0,
        )
        mapper = local_mapping.LocalMapper(n_neighbors=4, ba_local=8,
                                           ba_fixed=4, ba_pts=2048,
                                           ba_iters=4)
        t = tracker.MonocularTracker(cfg, self.K, np.zeros(4, np.float32),
                                     local_mapper=mapper)
        if frames is None:
            poses = synthetic.smooth_trajectory(36, lateral=2.0, forward=0.5,
                                                yaw=0.08)
            Kj = jnp.asarray(self.K)
            frames = [np.asarray(world.render(jnp.asarray(p), Kj, self.H,
                                              self.W)) for p in poses]
        for i, img in enumerate(frames[:12]):
            t.process_image(img, i * 0.1)
        assert t.state == tracker.OK
        t.async_depth = 3
        t.auto_batch = auto_batch
        assert t.enter_autonomous()
        for i, img in enumerate(frames[12:]):
            t.process_image(img, (12 + i) * 0.1)
        t.exit_autonomous()
        t.flush_meta()
        return t, frames

    def test_batched_dispatch_matches_single(self, world):
        """auto_batch=4 (the System/SlamAgent production default — B frames
        per dispatch through `autonomous_step_batch`, one packed [B,10]
        readback per retire) must produce the same map and bookkeeping as
        one-dispatch-per-frame."""
        t1, frames = self._run(world, auto_batch=1)
        t4, _ = self._run(world, auto_batch=4, frames=frames)
        assert t4.state == tracker.OK
        assert t4.n_kf_host == int(t4.map.n_kf) == t1.n_kf_host
        assert set(t4.kf_timestamps) == set(range(t4.n_kf_host))
        assert (t4.meta.kf_uuid[:t4.n_kf_host].sum(axis=1) != 0).all()
        # identical frames through identical device programs: poses agree
        traj1 = {round(ts, 6): p for ts, p, _ in t1.trajectory}
        traj4 = {round(ts, 6): p for ts, p, _ in t4.trajectory}
        assert set(traj4) == set(traj1)
        for ts, p4 in traj4.items():
            np.testing.assert_allclose(p4, traj1[ts], atol=1e-4)

    def test_loss_exit_preserves_inflight_frames(self, world):
        """When a retired record ends lost, the remaining in-flight records
        and the buffered-but-undispatched frames must NOT be discarded:
        their device effects are already in the map, and dropping them used
        to silently delete up to async_depth frames from the evaluated
        trajectory (review r3 finding). Good frames on either side of a
        black span must all end up with trajectory rows."""
        poses = synthetic.smooth_trajectory(32, lateral=2.0, forward=0.5,
                                            yaw=0.08)
        Kj = jnp.asarray(self.K)
        good = [np.asarray(world.render(jnp.asarray(p), Kj, self.H, self.W))
                for p in poses]
        black = np.zeros((self.H, self.W), np.float32)
        # 12 host init + 8 good autonomous + 4 black (one lost batch) + 12
        # good: the lost batch retires while later good batches are in
        # flight, forcing the exit-with-pending-work path
        frames = good[:20] + [black] * 4 + good[20:]
        t, _ = self._run(world, auto_batch=4, frames=frames)
        t.flush_pipeline()
        have = {round(ts, 6) for ts, _, _ in t.trajectory}
        # every good frame after the black span must have been either
        # retired from a pending record or re-fed through the host path
        missing = [i for i in range(24, 36) if round(i * 0.1, 6) not in have]
        assert not missing, f"trajectory rows dropped for frames {missing}"
        # and the good frames before the span too
        pre_missing = [i for i in range(12, 20)
                       if round(i * 0.1, 6) not in have]
        assert not pre_missing, f"pre-loss rows dropped: {pre_missing}"
        # mirrors stayed consistent through the mixed path
        assert t.n_kf_host == int(t.map.n_kf)
        assert (t.meta.kf_uuid[:t.n_kf_host].sum(axis=1) != 0).all()

    def test_lost_mid_batch_resyncs_kf_mirror(self, world):
        """A batch whose tail goes lost: the host must exit autonomous AND
        resync n_kf_host to the device count (keyframes made by the good
        prefix of the batch must not be orphaned — advisor r2 finding)."""
        poses = synthetic.smooth_trajectory(20, lateral=2.0, forward=0.5,
                                            yaw=0.08)
        Kj = jnp.asarray(self.K)
        frames = [np.asarray(world.render(jnp.asarray(p), Kj, self.H,
                                          self.W)) for p in poses]
        black = np.zeros((self.H, self.W), np.float32)
        frames = frames + [black] * 8  # lost tail lands inside a batch
        t, _ = self._run(world, auto_batch=4, frames=frames)
        assert t.state in (tracker.RECENTLY_LOST, tracker.LOST)
        assert t.n_kf_host == int(t.map.n_kf)
        assert (t.meta.kf_uuid[:t.n_kf_host].sum(axis=1) != 0).all()
        assert set(t.kf_timestamps) == set(range(t.n_kf_host))
