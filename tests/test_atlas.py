"""Multi-submap Atlas: new map on persistent LOST, merge-back on revisit."""

import numpy as np
import jax.numpy as jnp
import pytest

from dvm_slam_tpu.frontend.extractor import FrontendConfig, make_frame
from dvm_slam_tpu.io import synthetic
from dvm_slam_tpu.mapping import atlas as atlas_mod, local_mapping
from dvm_slam_tpu.placerec import vocabulary
from dvm_slam_tpu.tracking import tracker

pytestmark = pytest.mark.slow  # heavy e2e; deselect with -m 'not slow'

H, W = 240, 320
K = np.array([260.0, 260.0, 160.0, 120.0], np.float32)


class TestAtlas:
    def test_new_map_on_lost_then_merge_back(self):
        world = synthetic.PlaneWorld(seed=3, tex_size=1024, plane_z=6.0, extent=30.0)
        cfg = tracker.TrackerConfig(
            frontend=FrontendConfig(height=H, width=W, n_features=600),
            kf_cap=96, pt_cap=8192, fps=2.0,  # KF at least every 2 frames
        )
        # vocabulary from the world
        traj = synthetic.smooth_trajectory(40, lateral=2.0, forward=0.5, yaw=0.08)
        descs = []
        for i in range(0, 40, 8):
            img = world.render(jnp.asarray(traj[i]), jnp.asarray(K), H, W)
            f = make_frame(jnp.asarray(np.asarray(img)), jnp.asarray(K), jnp.zeros(4),
                           cfg.frontend)
            descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
        voc = vocabulary.train(np.concatenate(descs)[:5000], branch=8, depth=2, seed=0)

        mapper = local_mapping.LocalMapper(n_neighbors=4, ba_local=8, ba_fixed=8,
                                           ba_pts=2048, ba_iters=6)
        t = tracker.MonocularTracker(cfg, K, np.zeros(4, np.float32),
                                     local_mapper=mapper)
        t.atlas = atlas_mod.Atlas(voc, K, cfg.frontend)

        # phase 1: map the world
        for i in range(30):
            img = world.render(jnp.asarray(traj[i]), jnp.asarray(K), H, W)
            t.process_image(np.asarray(img), i * 0.1)
        assert t.state == tracker.OK
        kf_phase1 = int(t.map.n_kf)
        assert kf_phase1 >= 10

        # phase 2: long blackout -> LOST -> CreateMapInAtlas
        black = np.zeros((H, W), np.float32)
        for j in range(8):
            t.process_image(black, 10.0 + j * 0.1)
        assert len(t.atlas.inactive) == 1, "map was not stashed"
        assert t.state == tracker.NOT_INITIALIZED
        assert int(t.map.n_kf) == 0

        # phase 3: re-map a *revisited* stretch -> new submap initializes,
        # then merges back into the stored map
        merged = False
        for j, i in enumerate(range(8, 30)):
            img = world.render(jnp.asarray(traj[i]), jnp.asarray(K), H, W)
            t.process_image(np.asarray(img), 20.0 + j * 0.1)
            if len(t.atlas.inactive) == 0 and int(t.map.n_kf) > kf_phase1:
                merged = True
                break
        assert t.state == tracker.OK
        assert merged, (
            f"no merge-back: inactive={len(t.atlas.inactive)} "
            f"n_kf={int(t.map.n_kf)} (phase1 {kf_phase1})"
        )
        # merged map contains both epochs' keyframes
        assert int(t.map.n_kf) > kf_phase1
