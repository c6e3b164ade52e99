"""KB8 fisheye through the full tracking pipeline: pinhole renders are
warped into synthetic fisheye images; the tracker runs with
camera_model='kb8' (rectified keypoints) and must reach pinhole-grade ATE."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvm_slam_tpu.frontend.extractor import FrontendConfig
from dvm_slam_tpu.geometry import cameras
from dvm_slam_tpu.io import synthetic
from dvm_slam_tpu.mapping import local_mapping
from dvm_slam_tpu.tracking import tracker
from dvm_slam_tpu.eval import metrics

pytestmark = pytest.mark.slow  # heavy e2e; deselect with -m 'not slow'

H, W = 240, 320
K4 = np.array([200.0, 200.0, 160.0, 120.0], np.float32)
KB = np.array([0.02, -0.005, 0.003, -0.001], np.float32)  # theta polynomial
PARAMS = np.concatenate([K4, KB])


def fisheye_warp_field():
    """For each fisheye pixel: the source pinhole pixel (same K)."""
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    uv = jnp.asarray(np.stack([u, v], -1).reshape(-1, 2))
    rays = cameras.kb8_unproject(jnp.asarray(PARAMS), uv, iters=20)
    src, _ = cameras.pinhole_project(jnp.asarray(K4), rays)
    return np.asarray(src).reshape(H, W, 2)


def warp_to_fisheye(img, field):
    x = np.clip(field[..., 0], 0, W - 1.001)
    y = np.clip(field[..., 1], 0, H - 1.001)
    x0 = x.astype(np.int32)
    y0 = y.astype(np.int32)
    fx = x - x0
    fy = y - y0
    return (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x0 + 1] * fx * (1 - fy)
            + img[y0 + 1, x0] * (1 - fx) * fy + img[y0 + 1, x0 + 1] * fx * fy)


class TestKB8Tracking:
    def test_tracks_fisheye_sequence(self):
        world = synthetic.PlaneWorld(seed=3, tex_size=1024, plane_z=6.0, extent=30.0)
        field = fisheye_warp_field()
        cfg = tracker.TrackerConfig(
            frontend=FrontendConfig(height=H, width=W, n_features=600),
            kf_cap=64, pt_cap=4096, fps=10.0, camera_model="kb8",
        )
        mapper = local_mapping.LocalMapper(n_neighbors=4, ba_local=8, ba_fixed=8,
                                           ba_pts=2048, ba_iters=6)
        t = tracker.MonocularTracker(cfg, K4, KB, local_mapper=mapper)
        traj = synthetic.smooth_trajectory(40, lateral=1.6, forward=0.4, yaw=0.06)
        est, gt = [], []
        for i, T_cw in enumerate(traj):
            img = np.asarray(world.render(jnp.asarray(T_cw), jnp.asarray(K4), H, W))
            fish = warp_to_fisheye(img, field)
            pose = t.process_image(fish.astype(np.float32), i * 0.1)
            if pose is not None:
                est.append(np.asarray(pose))
                gt.append(T_cw)
        assert t.state == tracker.OK, f"state {t.state}"
        assert len(est) > 20
        rmse, _, _ = metrics.ate_rmse(np.stack(est), np.stack(gt))
        assert rmse < 0.08, f"KB8 ATE {rmse:.3f} m"

    def test_rectified_keypoints(self):
        """make_frame('kb8') must place keypoints at their ideal-pinhole
        positions."""
        from dvm_slam_tpu.frontend.extractor import make_frame

        rng = np.random.RandomState(0)
        img = rng.rand(H, W).astype(np.float32) * 255
        cfg = FrontendConfig(height=H, width=W, n_features=200)
        f = make_frame(jnp.asarray(img), jnp.asarray(K4), jnp.asarray(KB), cfg,
                       camera_model="kb8")
        v = np.asarray(f.valid)
        raw = np.asarray(f.xy_raw)[v]
        un = np.asarray(f.xy)[v]
        # verify against the closed chain kb8_unproject -> pinhole_project
        rays = cameras.kb8_unproject(jnp.asarray(PARAMS), jnp.asarray(raw), iters=10)
        expect, _ = cameras.pinhole_project(jnp.asarray(K4), rays)
        np.testing.assert_allclose(un, np.asarray(expect), atol=1e-2)
