"""Two-agent map merge: two independent trackers map overlapping regions of
the same world; BoW merge detection + Sim3 estimation + map splice must
produce one consistent map (the miniature of BASELINE config 3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvm_slam_tpu.tracking import tracker
from dvm_slam_tpu.mapping import local_mapping, map_state
from dvm_slam_tpu.frontend.extractor import FrontendConfig
from dvm_slam_tpu.io import synthetic
from dvm_slam_tpu.placerec import vocabulary, database
from dvm_slam_tpu.loopclosing import merge
from dvm_slam_tpu.geometry import lie, alignment
from dvm_slam_tpu.eval import metrics

pytestmark = pytest.mark.slow  # heavy e2e; deselect with -m 'not slow'

H, W = 240, 320
K = np.array([260.0, 260.0, 160.0, 120.0], np.float32)


def run_agent(world, poses_gt, t0, agent_id, seed):
    cfg = tracker.TrackerConfig(
        frontend=FrontendConfig(height=H, width=W, n_features=600),
        kf_cap=64, pt_cap=4096, fps=10.0,
    )
    mapper = local_mapping.LocalMapper(n_neighbors=4, ba_local=8, ba_fixed=8,
                                       ba_pts=2048, ba_iters=6)
    t = tracker.MonocularTracker(cfg, K, np.zeros(4, np.float32),
                                 local_mapper=mapper, rng_seed=seed)
    t.meta.agent_id = agent_id
    for i, T_cw in enumerate(poses_gt):
        img = world.render(jnp.asarray(T_cw), jnp.asarray(K), H, W)
        t.process_image(np.asarray(img), t0 + i * 0.1)
    return t


@pytest.fixture(scope="module")
def agents():
    world = synthetic.PlaneWorld(seed=3, tex_size=1024, plane_z=6.0, extent=30.0)
    traj = synthetic.smooth_trajectory(70, lateral=2.2, forward=0.6, yaw=0.08)
    # A covers the first 2/3, B the last 2/3 — the middle third overlaps
    tA = run_agent(world, traj[:46], 0.0, agent_id=1, seed=0)
    tB = run_agent(world, traj[24:], 100.0, agent_id=2, seed=1)
    return tA, tB, traj


def kf_bows(t, voc):
    levels, idf = voc.device_arrays()
    out = {}
    for slot in sorted(t.kf_timestamps):
        out[slot] = vocabulary.bow_vector(
            levels, idf, t.map.kf_desc[slot], t.map.kf_feat_valid[slot],
            voc.branch, voc.n_words,
        )
    return out


class TestTwoAgentMerge:
    def test_merge_pipeline(self, agents):
        tA, tB, traj = agents
        assert tA.state == tracker.OK and tB.state == tracker.OK
        mA, mB = tA.map, tB.map

        # --- vocabulary from agent A's descriptors (shared in practice) ---
        descs = np.asarray(mA.kf_desc[np.asarray(mA.kf_valid)]).reshape(-1, 256)
        vmask = np.asarray(mA.kf_feat_valid[np.asarray(mA.kf_valid)]).reshape(-1)
        voc = vocabulary.train(descs[vmask][:4000], branch=8, depth=2, seed=0)

        # --- BoW merge detection: B's keyframes queried against A's db ---
        db = database.create(mA.kf_capacity, voc.n_words)
        for slot, bow in kf_bows(tA, voc).items():
            db = database.add(db, jnp.int32(slot), bow)
        covisA = map_state.covisibility(mA)

        bowsB = kf_bows(tB, voc)
        best_pair, best_score = None, -1.0
        for slotB, bow in bowsB.items():
            ok, bestA, score, baseline = database.detect_merge_possibility(db, bow, covisA)
            if bool(ok) and float(score) > best_score:
                best_pair = (int(bestA), slotB)
                best_score = float(score)
        assert best_pair is not None, "no merge candidate detected"
        kfA, kfB = best_pair

        # --- Sim3 between the candidate keyframes ---
        res = merge.compute_sim3_between(
            jax.random.PRNGKey(0), mA, jnp.int32(kfA), mB, jnp.int32(kfB),
            jnp.asarray(K),
        )
        assert bool(res.ok), (
            f"sim3 failed: inl={int(res.n_inliers)} proj={int(res.n_proj)}"
        )

        # --- splice ---
        merged, meta, kf_map, pt_map = merge.merge_maps(
            mA, tA.meta, mB, tB.meta, res.S_ab
        )
        assert int(merged.n_kf) == int(mA.n_kf) + int(mB.n_kf)  # all uuids new

        # --- welding BA around the merge keyframe ---
        merged = local_mapping.fuse_duplicates(
            merged, jnp.int32(kfA), jnp.asarray(K), n_neighbors=5,
        )
        merged, _ = local_mapping.local_ba(
            merged, jnp.int32(kfA), jnp.asarray(K),
            n_local=12, n_fixed=8, n_pts=2048, iters=6,
        )

        # --- consistency: all merged KF poses vs ground truth, ONE Sim3 ---
        gt_by_ts = {round(i * 0.1, 5): traj[i] for i in range(46)}
        gt_by_ts.update({round(100.0 + i * 0.1, 5): traj[24 + i] for i in range(len(traj) - 24)})
        est, gt = [], []
        for slot, ts in tA.kf_timestamps.items():
            est.append(np.asarray(merged.kf_pose[slot]))
            gt.append(gt_by_ts[round(ts, 5)])
        for slotB, ts in tB.kf_timestamps.items():
            slot = int(kf_map[slotB])
            assert slot >= 0
            est.append(np.asarray(merged.kf_pose[slot]))
            gt.append(gt_by_ts[round(ts, 5)])
        rmse, _, _ = metrics.ate_rmse(np.stack(est), np.stack(gt))
        assert rmse < 0.15, f"merged-map ATE {rmse:.3f} m over {len(est)} KFs"
