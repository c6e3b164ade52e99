#!/usr/bin/env python
"""Where does the 1000-frame circuit run lose accuracy?

Runs the plain autonomous tracker on the dense-world circuit (the failing
ablation run C), dumps est/gt trajectories, then reports:
  * per-frame position error after global Sim3 alignment (printed as a
    20-bucket profile over time)
  * rolling per-window scale (est displacement / gt displacement) — the
    monocular scale-drift signature
  * keyframe count + inlier stats over time

Run: CIRCUIT_FRAMES=1000 python benchmarks/circuit_diag.py
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
    from dvm_slam_tpu.geometry import lie
    from dvm_slam_tpu.io import synthetic
    from dvm_slam_tpu.mapping import local_mapping
    from dvm_slam_tpu.tracking import tracker as trk

    H, W = 480, 752
    K = np.array([458.654, 457.296, 367.215, 248.375], np.float32)
    fc = FrontendConfig(height=H, width=W, n_features=1250)
    n = int(os.environ.get("CIRCUIT_FRAMES", "1000"))
    cfg = trk.TrackerConfig(frontend=fc, kf_cap=256, pt_cap=16384, fps=20.0)
    world = synthetic.PlaneWorld(seed=7, tex_size=2048, plane_z=6.0,
                                 extent=36.0, n_patches=36,
                                 depth_range=(0.30, 0.92),
                                 patch_half=(0.03, 0.09))
    Kj = jnp.asarray(K)
    t = trk.MonocularTracker(cfg, K, np.zeros(4, np.float32),
                             local_mapper=local_mapping.LocalMapper(
                                 n_neighbors=5, ba_local=12, ba_fixed=8,
                                 ba_pts=4096, ba_iters=6))
    t.auto_mode = True
    t.auto_batch = 4
    t.async_depth = 8
    poses = synthetic.circuit_trajectory(n, loops=1.0)
    for i, p in enumerate(poses):
        img = jnp.clip(world.render(jnp.asarray(p), Kj, H, W),
                       0, 255).astype(jnp.uint8)
        t.process_image(img, i * 0.05)
    t.drain_auto()
    t.flush_meta()
    jax.block_until_ready(t.map.kf_pose)

    gt_by_ts = {round(i * 0.05, 4): poses[i] for i in range(n)}
    est, gt, idxs = [], [], []
    for ts, T, state in t.trajectory:
        g = gt_by_ts.get(round(ts, 4))
        if g is not None:
            est.append(np.asarray(T))
            gt.append(g)
            idxs.append(int(round(ts / 0.05)))
    est, gt = np.stack(est), np.stack(gt)
    rmse, est_al, gt_c = metrics.ate_rmse(est, gt)
    print(json.dumps({"frames": n, "ate_rmse_m": round(float(rmse), 4),
                      "n_kf": int(t.map.n_kf), "n_pt": int(t.map.n_pt)}),
          flush=True)

    # est_al: aligned est positions, gt_c: gt positions (metrics internals
    # may differ; recompute positions here from scratch to be safe)
    def cam_center(T):
        Tin = np.asarray(lie.se3_inv(jnp.asarray(T)))
        return Tin[4:7]

    p_est = np.stack([cam_center(T) for T in est])
    p_gt = np.stack([cam_center(T) for T in gt])
    # global Sim3 (Umeyama) alignment of est onto gt
    mu_e, mu_g = p_est.mean(0), p_gt.mean(0)
    E0, G0 = p_est - mu_e, p_gt - mu_g
    U, S, Vt = np.linalg.svd(E0.T @ G0)
    D = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        D[2, 2] = -1
    R = (U @ D @ Vt).T
    s = np.trace(np.diag(S) @ D) / (E0 ** 2).sum()
    p_al = s * (R @ p_est.T).T + (mu_g - s * R @ mu_e)
    err = np.linalg.norm(p_al - p_gt, axis=1)

    B = 20
    prof = []
    for b in range(B):
        lo, hi = b * len(err) // B, (b + 1) * len(err) // B
        prof.append(round(float(err[lo:hi].mean()), 3))
    print(json.dumps({"err_profile_20buckets_m": prof}), flush=True)

    # rolling scale: windowed displacement ratio
    wlen = max(len(p_est) // 20, 5)
    scales = []
    for b in range(B):
        lo = min(b * len(err) // B, len(err) - wlen - 1)
        de = np.linalg.norm(np.diff(p_est[lo:lo + wlen], axis=0),
                            axis=1).sum()
        dg = np.linalg.norm(np.diff(p_gt[lo:lo + wlen], axis=0), axis=1).sum()
        scales.append(round(float(s * de / max(dg, 1e-9)), 3))
    print(json.dumps({"rolling_scale_vs_gt": scales}), flush=True)

    # keyframe timestamps -> circuit position
    kts = sorted(ts for s_, ts in t.kf_timestamps.items()) \
        if isinstance(t.kf_timestamps, dict) else sorted(t.kf_timestamps)
    print(json.dumps({"n_traj": len(est),
                      "kf_ts_first10": [round(x, 2) for x in kts[:10]],
                      "kf_ts_last5": [round(x, 2) for x in kts[-5:]]}),
          flush=True)
    np.savez("/tmp/circuit_diag.npz", est=est, gt=gt, idxs=np.asarray(idxs))


if __name__ == "__main__":
    main()
