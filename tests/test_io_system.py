"""IO layer (datasets, config, trajectory) + System facade + checkpoint."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from dvm_slam_tpu.io import config as config_mod
from dvm_slam_tpu.io import datasets, synthetic, trajectory
from dvm_slam_tpu.geometry import lie
from dvm_slam_tpu.models import system as system_mod


class TestConfig:
    def test_native_configs_load(self):
        root = os.path.join(os.path.dirname(__file__), "..", "configs")
        for name in ["euroc", "tum", "kitti", "robomaster", "rpi_cam", "webots"]:
            s = config_mod.load_settings(os.path.join(root, f"{name}.yaml"))
            assert s.camera.fx > 0
            fc = s.frontend_config()
            assert fc.capacity > 0
        e = config_mod.load_settings(os.path.join(root, "euroc.yaml"))
        assert e.camera.out_width == 600  # resize applied
        np.testing.assert_allclose(e.K()[0] if hasattr(e, "K") else e.camera.K()[0],
                                   458.654 * 600 / 752, rtol=1e-5)

    def test_reference_style_keys(self, tmp_path):
        p = tmp_path / "ref.yaml"
        p.write_text(
            "%YAML:1.0\n"
            "Camera.type: \"PinHole\"\n"
            "Camera1.fx: 500.0\nCamera1.fy: 501.0\nCamera1.cx: 320.0\nCamera1.cy: 240.0\n"
            "Camera1.k1: -0.1\nCamera1.k2: 0.02\nCamera1.p1: 0.0\nCamera1.p2: 0.0\n"
            "Camera.width: 640\nCamera.height: 480\nCamera.fps: 30\n"
            "ORBextractor.nFeatures: 900\nORBextractor.scaleFactor: 1.2\n"
            "ORBextractor.nLevels: 8\nORBextractor.iniThFAST: 20\n"
            "ORBextractor.minThFAST: 7\n"
            "System.SaveAtlasToFile: \"out.atlas\"\n"
        )
        s = config_mod.load_settings(str(p))
        assert s.camera.fx == 500.0
        assert s.orb.n_features == 900
        assert s.camera.dist[0] == -0.1
        assert s.save_atlas_to_file == "out.atlas"


class TestDatasets:
    def _fake_euroc(self, tmp_path, rng, n=4):
        from PIL import Image

        base = tmp_path / "mav0" / "cam0"
        (base / "data").mkdir(parents=True)
        rows = ["#ts,filename"]
        for i in range(n):
            name = f"{1000000000 + i}.png"
            img = (rng.rand(48, 64) * 255).astype(np.uint8)
            Image.fromarray(img).save(base / "data" / name)
            rows.append(f"{1000000000 + i * 50000000},{name}")
        (base / "data.csv").write_text("\n".join(rows))
        return str(tmp_path)

    def test_euroc_loader(self, tmp_path, rng):
        root = self._fake_euroc(tmp_path, rng)
        seq = datasets.load_euroc(root)
        assert len(seq) == 4
        ts, img = seq[0]
        assert img.shape == (48, 64) and img.dtype == np.float32
        assert abs(seq.stamps[1] - seq.stamps[0] - 0.05) < 1e-6

    def test_split_for_agents(self, tmp_path, rng):
        root = self._fake_euroc(tmp_path, rng, n=10)
        seq = datasets.load_euroc(root)
        parts = seq.split_for_agents(2, overlap=0.4)
        assert len(parts) == 2
        s0 = set(parts[0].paths)
        s1 = set(parts[1].paths)
        assert s0 & s1, "agent segments must overlap"
        assert s0 | s1 == set(seq.paths)


class TestTrajectory:
    def test_tum_roundtrip(self, tmp_path, rng):
        traj = []
        for i in range(5):
            T = lie.se3(lie.so3_exp(jnp.asarray(rng.randn(3).astype(np.float32) * 0.1)),
                        jnp.asarray(rng.randn(3).astype(np.float32)))
            traj.append((i * 0.1, np.asarray(T), "OK"))
        p = str(tmp_path / "traj.txt")
        trajectory.save_tum(p, traj)
        back = trajectory.load_tum(p)
        assert len(back) == 5
        for (t0, T0, _), (t1, T1) in zip(traj, back):
            assert abs(t0 - t1) < 1e-6
            np.testing.assert_allclose(
                lie.se3_apply(jnp.asarray(T0), jnp.ones(3)),
                lie.se3_apply(jnp.asarray(T1), jnp.ones(3)), atol=1e-4,
            )

    def test_kitti_format(self, tmp_path):
        traj = [(0.0, np.asarray(lie.se3_identity()), "OK")]
        p = str(tmp_path / "k.txt")
        trajectory.save_kitti(p, traj)
        vals = [float(v) for v in open(p).read().split()]
        assert len(vals) == 12
        np.testing.assert_allclose(
            np.asarray(vals).reshape(3, 4), np.eye(3, 4), atol=1e-6
        )


@pytest.fixture(scope="module")
def tracked_system():
    settings = config_mod.SystemSettings()
    settings.camera = config_mod.CameraSettings(
        fx=260.0, fy=260.0, cx=160.0, cy=120.0, width=320, height=240,
        dist=(0.0, 0.0, 0.0, 0.0), fps=10.0,
    )
    settings.orb = config_mod.OrbSettings(n_features=600)
    settings.kf_capacity = 64
    settings.pt_capacity = 4096
    sys = system_mod.System(settings, agent_id=3)
    world = synthetic.PlaneWorld(seed=3, tex_size=1024, plane_z=6.0, extent=30.0)
    poses = synthetic.smooth_trajectory(30, lateral=2.0, forward=0.5, yaw=0.08)
    K = jnp.asarray(settings.camera.K())
    for i, T in enumerate(poses):
        img = world.render(jnp.asarray(T), K, 240, 320)
        sys.track_monocular(np.asarray(img), i * 0.1)
    return sys, settings


class TestSystemFacade:
    def test_tracks_and_exports(self, tracked_system, tmp_path):
        sys, settings = tracked_system
        assert sys.get_tracking_state() == "OK"
        assert sys.get_agent_id() == 3
        p = str(tmp_path / "traj_tum.txt")
        sys.save_trajectory_tum(p)
        assert len(open(p).read().splitlines()) > 15
        sys.save_trajectory_kitti(str(tmp_path / "traj_kitti.txt"))
        sys.save_trajectory_euroc(str(tmp_path / "traj_euroc.csv"))
        blob = sys.serialize_map()
        assert len(blob) > 1000

    def test_checkpoint_resume(self, tracked_system, tmp_path):
        sys, settings = tracked_system
        path = str(tmp_path / "atlas.dvm")
        sys.save_atlas(path)
        sys2 = system_mod.System(settings, agent_id=3)
        sys2.load_atlas(path)
        assert int(sys2.map.n_kf) == int(sys.map.n_kf)
        assert int(jnp.sum(sys2.map.pt_valid)) == int(jnp.sum(sys.map.pt_valid))
        np.testing.assert_allclose(
            np.asarray(sys2.tracker.last_pose), np.asarray(sys.tracker.last_pose),
            atol=1e-5,
        )
        # resumed system keeps tracking
        world = synthetic.PlaneWorld(seed=3, tex_size=1024, plane_z=6.0, extent=30.0)
        poses = synthetic.smooth_trajectory(30, lateral=2.0, forward=0.5, yaw=0.08)
        K = jnp.asarray(settings.camera.K())
        img = world.render(jnp.asarray(poses[-1]), K, 240, 320)
        out = sys2.track_monocular(np.asarray(img), 99.0)
        assert out is not None

    def test_checksum_detects_corruption(self, tracked_system, tmp_path):
        sys, settings = tracked_system
        path = str(tmp_path / "atlas2.dvm")
        sys.save_atlas(path)
        data = bytearray(open(path, "rb").read())
        data[-10] ^= 0xFF
        open(path, "wb").write(bytes(data))
        with pytest.raises(IOError):
            system_mod.System(settings, agent_id=3).load_atlas(path)


class TestRunDataset:
    def test_run_dataset_euroc_layout(self, tmp_path):
        """End-to-end: rendered synthetic frames written as a EuRoC-layout
        dataset, replayed through the console's dataset runner."""
        from PIL import Image
        from dvm_slam_tpu.tools import console

        world = synthetic.PlaneWorld(seed=3, tex_size=512, plane_z=6.0, extent=30.0)
        K = np.array([200.0, 200.0, 120.0, 90.0], np.float32)
        traj = synthetic.smooth_trajectory(24, lateral=1.5, forward=0.4)
        base = tmp_path / "mav0" / "cam0"
        (base / "data").mkdir(parents=True)
        rows = ["#ts,filename"]
        gt_rows = []
        for i, T in enumerate(traj):
            img = np.asarray(world.render(jnp.asarray(T), jnp.asarray(K), 180, 240))
            name = f"{i}.png"
            Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(base / "data" / name)
            ts_ns = 1000000000 + i * 100000000
            rows.append(f"{ts_ns},{name}")
            Twc = lie.se3_inv(jnp.asarray(T))
            q = np.asarray(Twc[:4]); t = np.asarray(Twc[4:])
            gt_rows.append(f"{ts_ns*1e-9:.6f} {t[0]} {t[1]} {t[2]} {q[1]} {q[2]} {q[3]} {q[0]}")
        (base / "data.csv").write_text("\n".join(rows))
        gt_path = tmp_path / "gt.txt"
        gt_path.write_text("\n".join(gt_rows))
        settings = tmp_path / "settings.yaml"
        settings.write_text(
            "camera:\n  model: pinhole\n  fx: 200.0\n  fy: 200.0\n  cx: 120.0\n"
            "  cy: 90.0\n  dist: [0.0, 0.0, 0.0, 0.0]\n  width: 240\n  height: 180\n"
            "  fps: 5.0\norb:\n  n_features: 500\nkf_capacity: 32\npt_capacity: 2048\n"
        )
        rep = console.run_dataset(
            str(tmp_path), fmt="euroc", settings_path=str(settings),
            n_agents=1, out_dir=str(tmp_path / "out"), gt_path=str(gt_path),
        )
        assert "agents" in rep
        a1 = rep["agents"].get("1")
        assert a1 is not None and a1["frames"] > 5
        assert a1["ate_rmse_m"] < 0.15, rep


class TestLiveViewer:
    def test_headless_png_frames(self, tmp_path):
        """`LiveViewer` (the Pangolin Viewer/MapDrawer/FrameDrawer role)
        renders map + trajectory + frame overlay to PNG when headless."""
        import numpy as np
        import jax.numpy as jnp

        from dvm_slam_tpu.io.viz import LiveViewer
        from dvm_slam_tpu.mapping import map_state
        from dvm_slam_tpu.geometry import lie

        m = map_state.create(8, 256, 64)
        rng = np.random.RandomState(0)
        m = m._replace(
            pt_pos=jnp.asarray(rng.randn(256, 3).astype(np.float32) + [0, 0, 5]),
            pt_valid=jnp.ones(256, bool),
            kf_valid=m.kf_valid.at[:3].set(True),
            n_kf=jnp.int32(3),
        )
        traj = [(i * 0.1, np.asarray(lie.se3_identity()), "OK")
                for i in range(5)]
        v = LiveViewer(out_dir=str(tmp_path), interactive=False)
        img = (rng.rand(120, 160) * 255).astype(np.float32)
        p1 = v.update(m, trajectory=traj, img=img, title="t")
        p2 = v.update(m)
        v.close()
        import os
        assert os.path.exists(p1) and os.path.getsize(p1) > 1000
        assert os.path.exists(p2)
