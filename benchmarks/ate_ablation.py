#!/usr/bin/env python
"""ATE ablation: isolate WHY the 1000-frame production-agent circuit
(benchmarks/long_ate.py solo_circuit) measures worse than bench.py's
500-frame plain-tracker circuit on the same dense world.

Axes (one run each, same world/seed):
  A. plain tracker, caps 128/8192,  500 frames  (bench.py's exact row)
  B. plain tracker, caps 256/16384, 500 frames  (caps effect)
  C. plain tracker, caps 256/16384, 1000 frames (frame-density effect)
  D. SlamAgent,     caps 256/16384, 1000 frames (agent-loop effect;
     == long_ate solo_circuit)

Prints one JSON line per run.  Run: python benchmarks/ate_ablation.py
Env: ATE_ABLATION_RUNS=A,B,C,D  to select a subset.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp

    from dvm_slam_tpu.eval import metrics
    from dvm_slam_tpu.frontend.extractor import FrontendConfig
    from dvm_slam_tpu.io import synthetic
    from dvm_slam_tpu.mapping import local_mapping
    from dvm_slam_tpu.tracking import tracker as trk

    H, W = 480, 752
    K = np.array([458.654, 457.296, 367.215, 248.375], np.float32)
    fc = FrontendConfig(height=H, width=W, n_features=1250)
    world = synthetic.PlaneWorld(seed=7, tex_size=2048, plane_z=6.0,
                                 extent=36.0, n_patches=36,
                                 depth_range=(0.30, 0.92),
                                 patch_half=(0.03, 0.09))
    Kj = jnp.asarray(K)
    mapper_kw = dict(n_neighbors=5, ba_local=12, ba_fixed=8,
                     ba_pts=4096, ba_iters=6)

    def render(p):
        return jnp.clip(world.render(jnp.asarray(p), Kj, H, W),
                        0, 255).astype(jnp.uint8)

    def evaluate(traj, poses):
        gt_by_ts = {round(i * 0.05, 4): poses[i] for i in range(len(poses))}
        est, gt = [], []
        for ts, T, state in traj:
            g = gt_by_ts.get(round(ts, 4))
            if g is not None:
                est.append(np.asarray(T))
                gt.append(g)
        if len(est) < 10:
            return None, len(est)
        rmse, _, _ = metrics.ate_rmse(np.stack(est), np.stack(gt))
        return float(rmse), len(est)

    def run_tracker(label, kf_cap, pt_cap, n):
        cfg = trk.TrackerConfig(frontend=fc, kf_cap=kf_cap, pt_cap=pt_cap,
                                fps=20.0)
        t = trk.MonocularTracker(cfg, K, np.zeros(4, np.float32),
                                 local_mapper=local_mapping.LocalMapper(
                                     **mapper_kw))
        t.auto_mode = True
        t.auto_batch = 4
        t.async_depth = 8
        poses = synthetic.circuit_trajectory(n, loops=1.0)
        t0 = time.perf_counter()
        for i, p in enumerate(poses):
            t.process_image(render(p), i * 0.05)
        t.drain_auto()
        t.flush_meta()
        jax.block_until_ready(t.map.kf_pose)
        wall = time.perf_counter() - t0
        rmse, n_ev = evaluate(t.trajectory, poses)
        print(json.dumps({
            "run": label, "frames": n, "kf_cap": kf_cap, "pt_cap": pt_cap,
            "ate_rmse_m": None if rmse is None else round(rmse, 4),
            "poses_evaluated": n_ev, "n_kf": int(t.map.n_kf),
            "n_pt": int(t.map.n_pt), "fps": round(n / wall, 2),
            "state": t.state}), flush=True)

    def run_agent(label, kf_cap, pt_cap, n):
        from dvm_slam_tpu.multiagent import transport as mtransport
        from dvm_slam_tpu.multiagent.agent import SlamAgent
        from dvm_slam_tpu.placerec import vocabulary
        rngv = np.random.RandomState(0)
        voc = vocabulary.train((rngv.rand(4000, 256) > 0.5).astype(np.uint8),
                               branch=8, depth=3, seed=0)
        cfg = trk.TrackerConfig(frontend=fc, kf_cap=kf_cap, pt_cap=pt_cap,
                                fps=20.0)
        ag = SlamAgent(1, cfg, K, np.zeros(4, np.float32), voc,
                       mtransport.LoopbackTransport(), [1],
                       mapper=local_mapping.LocalMapper(**mapper_kw))
        poses = synthetic.circuit_trajectory(n, loops=1.0)
        t0 = time.perf_counter()
        for i, p in enumerate(poses):
            ag.process_image(render(p), i * 0.05)
        ag.flush()
        jax.block_until_ready(ag.map.kf_pose)
        wall = time.perf_counter() - t0
        rmse, n_ev = evaluate(ag.tracker.trajectory, poses)
        print(json.dumps({
            "run": label, "frames": n, "kf_cap": kf_cap, "pt_cap": pt_cap,
            "ate_rmse_m": None if rmse is None else round(rmse, 4),
            "poses_evaluated": n_ev, "n_kf": int(ag.map.n_kf),
            "n_pt": int(ag.map.n_pt), "fps": round(n / wall, 2),
            "state": ag.tracker.state}), flush=True)

    sel = os.environ.get("ATE_ABLATION_RUNS", "A,B,C,D").split(",")
    if "A" in sel:
        run_tracker("A_tracker_128cap_500f", 128, 8192, 500)
    if "B" in sel:
        run_tracker("B_tracker_256cap_500f", 256, 16384, 500)
    if "C" in sel:
        run_tracker("C_tracker_256cap_1000f", 256, 16384, 1000)
    if "D" in sel:
        run_agent("D_agent_256cap_1000f", 256, 16384, 1000)


if __name__ == "__main__":
    main()
