"""Stereo and RGB-D pipeline (`Frame.cc:149,265`, `Tracking.cc:2194,3015`):

* stereo correspondence accuracy: disparity-derived depth vs the ray-traced
  ground-truth depth at the keypoints (rendered rectified pair);
* stereo pose optimization recovers metric scale;
* e2e stereo tracking: single-frame initialization, depth-created points,
  METRIC trajectory (no Sim3 alignment needed — SE3-only error is checked);
* e2e RGB-D tracking on the same world via rendered depth maps.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvm_slam_tpu.frontend.extractor import (
    FrontendConfig, make_frame_stereo, make_frame_rgbd,
)
from dvm_slam_tpu.geometry import lie
from dvm_slam_tpu.io import synthetic
from dvm_slam_tpu.mapping import local_mapping
from dvm_slam_tpu.tracking import tracker as trk

H, W = 240, 320
K = np.asarray([260.0, 260.0, 160.0, 120.0], np.float32)
BASELINE = 0.12


@pytest.fixture(scope="module")
def world():
    return synthetic.PlaneWorld(seed=3, tex_size=1024, plane_z=6.0,
                                extent=30.0)


@pytest.fixture(scope="module")
def fc():
    return FrontendConfig(height=H, width=W, n_features=600, n_levels=4)


class TestStereoMatching:
    def test_depth_from_disparity_matches_ground_truth(self, world, fc):
        T = jnp.asarray(synthetic.smooth_trajectory(3, lateral=1.0)[1])
        Kj = jnp.asarray(K)
        img_l, img_r = world.render_stereo(T, Kj, H, W, BASELINE)
        gt_depth = world.render_depth(T, Kj, H, W)
        f = make_frame_stereo(img_l, img_r, Kj, jnp.zeros(4), fc,
                              jnp.float32(BASELINE))
        ur = np.asarray(f.ur)
        depth = np.asarray(f.depth)
        xy = np.asarray(f.xy_raw)
        ok = ur >= 0
        assert ok.sum() > 100, "too few stereo matches"
        gtd = np.asarray(gt_depth)[
            np.clip(np.round(xy[:, 1]).astype(int), 0, H - 1),
            np.clip(np.round(xy[:, 0]).astype(int), 0, W - 1),
        ]
        sel = ok & (gtd > 0)
        rel = np.abs(depth[sel] - gtd[sel]) / gtd[sel]
        # median relative depth error of the surviving matches
        assert np.median(rel) < 0.05, float(np.median(rel))
        # and the match set is not poisoned by gross outliers
        assert (rel < 0.2).mean() > 0.8, float((rel < 0.2).mean())


class TestStereoTracking:
    def _run(self, world, fc, mode):
        cfg = trk.TrackerConfig(
            frontend=fc, kf_cap=32, pt_cap=4096, fps=10.0,
            sensor=mode, baseline=BASELINE,
        )
        mapper = local_mapping.LocalMapper(
            n_neighbors=4, ba_local=8, ba_fixed=4, ba_pts=2048, ba_iters=4
        )
        t = trk.MonocularTracker(cfg, K, np.zeros(4, np.float32),
                                 local_mapper=mapper)
        poses = synthetic.smooth_trajectory(20, lateral=1.6, forward=0.5,
                                            yaw=0.06)
        Kj = jnp.asarray(K)
        est, gt = [], []
        for i, p in enumerate(poses):
            Tj = jnp.asarray(p)
            if mode == "stereo":
                il, ir = world.render_stereo(Tj, Kj, H, W, BASELINE)
                pose = t.process_stereo_pair(np.asarray(il), np.asarray(ir),
                                             i * 0.1)
            else:
                img = np.asarray(world.render(Tj, Kj, H, W))
                dm = np.asarray(world.render_depth(Tj, Kj, H, W))
                pose = t.process_rgbd(img, dm, i * 0.1)
            if pose is not None:
                est.append(np.asarray(pose))
                gt.append(p)
        return t, est, gt

    def _metric_ate(self, est, gt):
        """SE3-aligned (first-pose) ATE — scale is NOT aligned, so metric
        scale errors show up directly."""
        A = lie.se3_mul(jnp.asarray(gt[0]), lie.se3_inv(jnp.asarray(est[0])))
        errs = []
        for e, g in zip(est, gt):
            ew = lie.se3_mul(A, jnp.asarray(e))
            ce = lie.se3_t(lie.se3_inv(ew))
            cg = lie.se3_t(lie.se3_inv(jnp.asarray(g)))
            errs.append(float(jnp.linalg.norm(ce - cg)))
        return float(np.sqrt(np.mean(np.square(errs))))

    def test_stereo_e2e_metric(self, world, fc):
        t, est, gt = self._run(world, fc, "stereo")
        assert t.state == trk.OK
        # single-frame init: pose available from the very first frame
        assert len(est) == 20
        assert t.n_kf_host >= 2
        assert int(np.asarray(t.map.pt_valid).sum()) > 200
        ate = self._metric_ate(est, gt)
        assert ate < 0.30, f"metric ATE {ate}"

    def test_rgbd_e2e_metric(self, world, fc):
        t, est, gt = self._run(world, fc, "rgbd")
        assert t.state == trk.OK
        assert len(est) == 20
        ate = self._metric_ate(est, gt)
        assert ate < 0.30, f"metric ATE {ate}"

    def test_stereo_map_has_ur_channel(self, world, fc):
        t, est, gt = self._run(world, fc, "stereo")
        n_kf = t.n_kf_host
        ur = np.asarray(t.map.kf_ur[:n_kf])
        obs = np.asarray(t.map.kf_obs[:n_kf])
        # a healthy share of stored observations carry a stereo right-u
        stereo_obs = (ur >= 0) & (obs >= 0)
        assert stereo_obs.sum() > 100


class TestStereoSystemFacade:
    def test_system_stereo_and_rgbd(self, world, fc):
        from dvm_slam_tpu.io import config as config_mod
        from dvm_slam_tpu.models.system import System

        cam = config_mod.CameraSettings(
            fx=260.0, fy=260.0, cx=160.0, cy=120.0, width=W, height=H,
            dist=(0, 0, 0, 0), fps=10.0, baseline=BASELINE,
        )
        st = config_mod.SystemSettings(
            camera=cam,
            orb=config_mod.OrbSettings(n_features=600, n_levels=4),
            kf_capacity=16, pt_capacity=2048,
        )
        sys_s = System(st, sensor="stereo")
        Kj = jnp.asarray(K)
        for i, p in enumerate(synthetic.smooth_trajectory(6, lateral=1.0)):
            il, ir = world.render_stereo(jnp.asarray(p), Kj, H, W, BASELINE)
            pose = sys_s.track_stereo(np.asarray(il), np.asarray(ir), i * 0.1)
        assert pose is not None
        assert sys_s.get_tracking_state() == trk.OK

        sys_d = System(st, sensor="rgbd")
        for i, p in enumerate(synthetic.smooth_trajectory(6, lateral=1.0)):
            img = np.asarray(world.render(jnp.asarray(p), Kj, H, W))
            dm = np.asarray(world.render_depth(jnp.asarray(p), Kj, H, W))
            pose = sys_d.track_rgbd(img, dm, i * 0.1)
        assert pose is not None
        assert sys_d.get_tracking_state() == trk.OK

    def test_mono_rejects_missing_baseline(self):
        from dvm_slam_tpu.io import config as config_mod
        from dvm_slam_tpu.models.system import System

        st = config_mod.SystemSettings()
        with pytest.raises(ValueError):
            System(st, sensor="stereo")


class TestStereoConsoleReplay:
    @pytest.mark.slow
    def test_run_sensor_stereo_euroc_layout(self, world, fc, tmp_path):
        """console run-sensor: EuRoC-layout cam0/cam1 dirs rendered from the
        synthetic world -> System stereo replay -> metric (unscaled) ATE."""
        import csv as _csv

        from PIL import Image

        from dvm_slam_tpu.tools import console

        root = tmp_path / "seq"
        poses = synthetic.smooth_trajectory(12, lateral=1.4, forward=0.4,
                                            yaw=0.05)
        Kj = jnp.asarray(K)
        gt_rows = []
        for cam in ("cam0", "cam1"):
            d = root / "mav0" / cam / "data"
            d.mkdir(parents=True)
            rows = []
            for i, p in enumerate(poses):
                ts_ns = int(1e9 * (100 + i * 0.1))
                Tj = jnp.asarray(p)
                il, ir = world.render_stereo(Tj, Kj, H, W, BASELINE)
                img = il if cam == "cam0" else ir
                name = f"{ts_ns}.png"
                Image.fromarray(np.asarray(img).astype(np.uint8)).save(
                    str(d / name))
                rows.append((ts_ns, name))
                if cam == "cam0":
                    T_wc = lie.se3_inv(Tj)
                    q = np.asarray(T_wc[:4])
                    t = np.asarray(T_wc[4:])
                    gt_rows.append(
                        (ts_ns * 1e-9, *t, q[1], q[2], q[3], q[0]))
            with open(root / "mav0" / cam / "data.csv", "w", newline="") as f:
                w = _csv.writer(f)
                for r in rows:
                    w.writerow(r)
        gt_path = root / "gt_tum.txt"
        with open(gt_path, "w") as f:
            for r in gt_rows:
                f.write(" ".join(str(x) for x in r) + "\n")
        settings = root / "settings.yaml"
        settings.write_text(
            "camera:\n"
            f"  fx: {K[0]}\n  fy: {K[1]}\n  cx: {K[2]}\n  cy: {K[3]}\n"
            f"  width: {W}\n  height: {H}\n"
            "  dist: [0.0, 0.0, 0.0, 0.0]\n"
            "  fps: 10.0\n"
            f"  baseline: {BASELINE}\n"
            "orb:\n  n_features: 600\n  n_levels: 4\n"
            "kf_capacity: 16\npt_capacity: 4096\n"
        )
        rep = console.run_dataset_sensor(
            str(root), sensor="stereo", settings_path=str(settings),
            out_dir=str(tmp_path / "out"), gt_path=str(gt_path),
        )
        assert rep["frames"] >= 10, rep
        assert rep["ate_rmse_metric_m"] < 0.35, rep
