"""Three-agent decentralized run: chained overlaps must produce pairwise
merges plus the IMPLICIT transitive merge, with every agent converging on
agent 1's coordinate frame (BASELINE config 4 in miniature)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dvm_slam_tpu.frontend.extractor import FrontendConfig, make_frame
from dvm_slam_tpu.io import synthetic
from dvm_slam_tpu.mapping import local_mapping
from dvm_slam_tpu.multiagent import agent as agent_mod, transport
from dvm_slam_tpu.placerec import vocabulary
from dvm_slam_tpu.tracking import tracker
from dvm_slam_tpu.eval import metrics

pytestmark = pytest.mark.slow  # heavy e2e; deselect with -m 'not slow'

H, W = 240, 320
K = np.array([260.0, 260.0, 160.0, 120.0], np.float32)


@pytest.fixture(scope="module")
def three_agent_run():
    world = synthetic.PlaneWorld(seed=3, tex_size=1024, plane_z=6.0, extent=34.0)
    n = 110
    traj = synthetic.smooth_trajectory(n, lateral=2.6, forward=0.7, yaw=0.08)
    cfg = tracker.TrackerConfig(
        frontend=FrontendConfig(height=H, width=W, n_features=600),
        kf_cap=128, pt_cap=8192, fps=4.0,
    )
    imgs = [np.asarray(world.render(jnp.asarray(traj[i]), jnp.asarray(K), H, W))
            for i in range(0, n, 12)]
    descs = []
    for im in imgs:
        f = make_frame(jnp.asarray(im), jnp.asarray(K), jnp.zeros(4), cfg.frontend)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = vocabulary.train(np.concatenate(descs)[:6000], branch=8, depth=2, seed=0)

    bus = transport.LoopbackTransport()
    mk = lambda aid, **kw: agent_mod.SlamAgent(
        aid, cfg, K, np.zeros(4, np.float32), voc, bus, [1, 2, 3],
        mapper=local_mapping.LocalMapper(n_neighbors=4, ba_local=8, ba_fixed=8,
                                         ba_pts=2048, ba_iters=5),
        **kw,
    )
    agents = {1: mk(1), 2: mk(2, post_merge_pose_graph=True), 3: mk(3)}
    # chained overlaps: 1 and 3 never share territory directly at start
    segs = {1: (0, 46), 2: (28, 78), 3: (62, 110)}
    gt = {1: [], 2: [], 3: []}
    steps = max(hi - lo for lo, hi in segs.values())
    for t in range(steps):
        for aid, (lo, hi) in segs.items():
            i = lo + t
            if i >= hi:
                continue
            img = world.render(jnp.asarray(traj[i]), jnp.asarray(K), H, W)
            ts = t * 0.1
            pose = agents[aid].process_image(np.asarray(img), ts)
            if pose is not None:
                gt[aid].append((np.asarray(pose), traj[i]))
    for a in agents.values():
        a.flush()  # end of stream: dispatch buffered autonomous frames
    for e in range(8):
        for a in agents.values():
            a.run_once((steps + e) * 0.1)
    return agents, bus, gt


class TestThreeAgents:
    def test_all_pairs_merged(self, three_agent_run):
        agents, bus, gt = three_agent_run
        for a in agents.values():
            for p in a.peers:
                assert p.successfully_merged, (
                    f"agent {a.agent_id} not merged with {p.agent_id}; "
                    f"logs: {[x.log for x in agents.values()]}"
                )

    def test_frame_tree_converged_on_agent1(self, three_agent_run):
        agents, bus, gt = three_agent_run
        assert agents[1].frames.parent_frame == "world"
        assert agents[2].frames.parent_frame == "robot1/origin"
        # 3 may hang under robot1 or robot2 (both are in agent 1's frame)
        assert agents[3].frames.parent_frame in ("robot1/origin", "robot2/origin")

    def test_shared_map_has_all_creators(self, three_agent_run):
        agents, bus, gt = three_agent_run
        for aid, a in agents.items():
            n = int(a.map.n_kf)
            creators = set(
                int(c) for c, v in zip(a.meta.kf_creator[:n],
                                       np.asarray(a.map.kf_valid[:n])) if v
            )
            missing = {1, 2, 3} - creators
            assert not missing, f"agent {aid} map missing creators {missing}"

    def test_per_agent_accuracy(self, three_agent_run):
        """Evaluate the (re-based) trajectory logs: after merging + frame
        changes the whole history lives in one frame per agent."""
        agents, bus, gt = three_agent_run
        segs = {1: 0, 2: 28, 3: 62}
        from dvm_slam_tpu.io import synthetic
        traj = synthetic.smooth_trajectory(110, lateral=2.6, forward=0.7, yaw=0.08)
        for aid, a in agents.items():
            est, gtp = [], []
            for ts, T, state in a.tracker.trajectory:
                i = segs[aid] + int(round(ts / 0.1))
                if i < len(traj):
                    est.append(T)
                    gtp.append(traj[i])
            rmse, _, _ = metrics.ate_rmse(np.stack(est), np.stack(gtp))
            assert rmse < 0.25, f"agent {aid} ATE {rmse:.3f} m over {len(est)}"
