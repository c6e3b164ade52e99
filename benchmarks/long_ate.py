#!/usr/bin/env python
"""Long-trajectory accuracy benchmark (VERDICT r3 item 5): committed ATE
numbers the environment can actually reproduce, since no EuRoC data ships
with it (`tests/test_dataset_integration.py` stays gated on EUROC_ROOT for
real data).

Three configurations over the synthetic circuit world at EuRoC geometry
(752x480, 1250 features, 20 fps):
  * solo_circuit   — 1000 frames, one full loop (the revisit closes at the
                     end); production autonomous tracking
  * solo_revisit   — 1000 frames, 1.6 loops: >half the trajectory re-covers
                     mapped ground (loop-heavy)
  * two_agent_merge— two agents split 600 frames of the circuit with a 120-
                     frame overlap, full protocol over loopback; ATE of the
                     merged map's keyframes + each agent's trajectory

Reference bar: "7.4 cm RMS over a 50 m trajectory" (docs/index.html).
The circuit here is ~13 m; ATE is scale-corrected (monocular).

Frames stay ON DEVICE end to end (render -> uint8 cast -> tracker) — the
tunnel's ~40 MB/s would otherwise dominate a 1000-frame run.

Prints one JSON line per configuration.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ate_of_trajectory(traj, gt_by_ts):
    from dvm_slam_tpu.eval import metrics
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


def _make_voc():
    from dvm_slam_tpu.placerec import vocabulary
    rngv = np.random.RandomState(0)
    return vocabulary.train((rngv.rand(4000, 256) > 0.5).astype(np.uint8),
                            branch=8, depth=3, seed=0)


def run_solo(world, traj_poses, label, K, cfg, mapper_kw, render, voc,
             loop_correction=False):
    """Solo config runs the PRODUCTION loop (SlamAgent with zero peers):
    autonomous tracking + the protocol round with the loop detector live —
    with loop_correction=True the opt-in Sim3 essential-graph correction is
    applied on confirmed triggers (measures what the reference's disabled
    CorrectLoop costs, VERDICT r3 item 7)."""
    import jax
    from dvm_slam_tpu.mapping import local_mapping
    from dvm_slam_tpu.multiagent import transport as mtransport
    from dvm_slam_tpu.multiagent.agent import SlamAgent

    ag = SlamAgent(1, cfg, K, np.zeros(4, np.float32), voc,
                   mtransport.LoopbackTransport(), [1],
                   mapper=local_mapping.LocalMapper(**mapper_kw),
                   loop_correction=loop_correction)
    t0 = time.perf_counter()
    for i, p in enumerate(traj_poses):
        ag.process_image(render(p), i * 0.05)
    ag.flush()
    jax.block_until_ready(ag.map.kf_pose)
    wall = time.perf_counter() - t0
    gt_by_ts = {round(i * 0.05, 4): traj_poses[i]
                for i in range(len(traj_poses))}
    rmse, n = _ate_of_trajectory(ag.tracker.trajectory, gt_by_ts)
    out = {"config": label, "frames": len(traj_poses),
           "ate_rmse_m": None if rmse is None else round(rmse, 4),
           "poses_evaluated": n, "n_kf": int(ag.map.n_kf),
           "fps": round(len(traj_poses) / wall, 2),
           "loop_triggers": len(ag.loop_detector.triggers),
           "loop_corrections": sum(1 for e in ag.log
                                   if e[0] == "loop_corrected"),
           "final_state": ag.tracker.state}
    print(json.dumps(out), flush=True)
    return out


def run_two_agent(world, traj_poses, K, cfg, mapper_kw, render):
    import jax
    from dvm_slam_tpu.mapping import local_mapping
    from dvm_slam_tpu.multiagent import transport as mtransport
    from dvm_slam_tpu.multiagent.agent import SlamAgent
    from dvm_slam_tpu.placerec import vocabulary

    rngv = np.random.RandomState(0)
    voc = vocabulary.train((rngv.rand(4000, 256) > 0.5).astype(np.uint8),
                           branch=8, depth=3, seed=0)
    bus = mtransport.LoopbackTransport()
    mk = lambda aid: SlamAgent(
        aid, cfg, K, np.zeros(4, np.float32), voc, bus, [1, 2],
        mapper=local_mapping.LocalMapper(**mapper_kw))
    a1, a2 = mk(1), mk(2)
    n = len(traj_poses)
    half = n // 2 + 60          # 120-frame overlap
    segs = {1: (0, half), 2: (half - 120, n)}
    agents = {1: a1, 2: a2}
    t0 = time.perf_counter()
    steps = max(half, n - (half - 120))
    for step in range(steps):
        for aid, (lo, hi) in segs.items():
            i = lo + step
            if i >= hi:
                continue
            agents[aid].process_image(render(traj_poses[i]), i * 0.05)
    for a in agents.values():
        a.flush()
    for extra in range(6):
        for a in agents.values():
            a.run_once((n + extra) * 0.05)
    for a in agents.values():
        a.flush()
    jax.block_until_ready(a1.map.kf_pose)
    wall = time.perf_counter() - t0
    gt_by_ts = {round(i * 0.05, 4): traj_poses[i] for i in range(n)}

    merged = a1.peers[2].successfully_merged and a2.peers[1].successfully_merged
    out = {"config": "two_agent_merge", "frames": n, "merged": bool(merged),
           "wall_s": round(wall, 1)}
    for aid, a in agents.items():
        rmse, ne = _ate_of_trajectory(a.tracker.trajectory, gt_by_ts)
        out[f"agent{aid}_ate_rmse_m"] = None if rmse is None else round(rmse, 4)
        out[f"agent{aid}_n_kf"] = int(a.map.n_kf)
    # merged-map keyframe ATE on the receiving agent
    from dvm_slam_tpu.eval import metrics
    for aid, a in agents.items():
        m = a.map
        nkf = int(m.n_kf)
        valid = np.asarray(m.kf_valid)[:nkf]
        est, gt = [], []
        for slot, ts in a.tracker.kf_timestamps.items():
            g = gt_by_ts.get(round(ts, 4))
            if slot < nkf and valid[slot] and g is not None:
                est.append(np.asarray(m.kf_pose[slot]))
                gt.append(g)
        if len(est) >= 10:
            rmse, _, _ = metrics.ate_rmse(np.stack(est), np.stack(gt))
            out[f"agent{aid}_map_kf_ate_m"] = round(float(rmse), 4)
    print(json.dumps(out), flush=True)
    return out


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    from dvm_slam_tpu.frontend.extractor import FrontendConfig
    from dvm_slam_tpu.tracking import tracker as trk
    from dvm_slam_tpu.io import synthetic

    H, W = 480, 752
    K = np.array([458.654, 457.296, 367.215, 248.375], np.float32)
    fc = FrontendConfig(height=H, width=W, n_features=1250)
    cfg = trk.TrackerConfig(frontend=fc, kf_cap=256, pt_cap=16384, fps=20.0)
    mapper_kw = dict(n_neighbors=5, ba_local=12, ba_fixed=8,
                     ba_pts=4096, ba_iters=6)
    # DENSE multi-depth world for all accuracy rows — the configuration the
    # PlaneWorld docstring prescribes for accuracy benchmarks. The default
    # sparse 8-patch layout collapses monocular scale by construction
    # (rotation-for-translation substitution) and is kept below ONLY as an
    # explicitly labeled degeneracy stressor.
    world = synthetic.PlaneWorld(seed=7, tex_size=2048, plane_z=6.0,
                                 extent=36.0, n_patches=36,
                                 depth_range=(0.30, 0.92),
                                 patch_half=(0.03, 0.09))
    world_sparse = synthetic.PlaneWorld(seed=7, tex_size=2048, plane_z=6.0,
                                        extent=36.0)
    Kj = jnp.asarray(K)

    def mk_render(w):
        def render(p):
            # stays on device: render -> clip -> uint8 (the tracker casts
            # back to f32 inside the jitted front end)
            img = w.render(jnp.asarray(p), Kj, H, W)
            return jnp.clip(img, 0, 255).astype(jnp.uint8)
        return render

    render = mk_render(world)
    n = int(os.environ.get("LONG_ATE_FRAMES", "1000"))
    voc = _make_voc()
    run_solo(world, synthetic.circuit_trajectory(n, loops=1.0),
             "solo_circuit", K, cfg, mapper_kw, render, voc)
    revisit = synthetic.circuit_trajectory(n, loops=1.6)
    run_solo(world, revisit, "solo_revisit", K, cfg, mapper_kw, render, voc)
    run_solo(world, revisit, "solo_revisit_corrected", K, cfg, mapper_kw,
             render, voc, loop_correction=True)
    run_two_agent(world,
                  synthetic.circuit_trajectory(max(n * 3 // 5, 300),
                                               loops=1.0),
                  K, cfg, mapper_kw, render)
    # degeneracy stressor: the sparse world whose fronto-parallel views admit
    # the yaw-for-translation monocular collapse; a large ATE here is the
    # EXPECTED failure signature, committed so regressions in the scale gauge
    # show up as this row suddenly improving or the dense rows degrading
    run_solo(world_sparse,
             synthetic.circuit_trajectory(min(n, 500), loops=1.0),
             "sparse_stressor", K, cfg, mapper_kw, mk_render(world_sparse),
             voc)
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
