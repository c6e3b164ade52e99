"""Per-stage device-time profile of the per-keyframe mapper chain at bench
shapes (kf_cap=128, pt_cap=8192, 1250 feats): cull / create_new_points /
fuse_duplicates / update_point_stats (and its desc-vote vs geometry split) /
local BA. The chain runs once per created keyframe inside the autonomous
dispatch, so its device cost sets how far e2e fps falls below tracking fps
whenever keyframes fire (VERDICT r4 item 3).

Times are BLOCKING per-dispatch medians on the axon tunnel — subtract the
~24 ms relay round-trip (PARITY.md #4) to estimate pure device time.

Run: python benchmarks/mapper_chain_profile.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n=7, **kw):
    import jax
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args, **kw)
        jax.block_until_ready(r)
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)), float(np.min(ts))


def main():
    import jax
    import jax.numpy as jnp

    from dvm_slam_tpu.frontend.extractor import FrontendConfig
    from dvm_slam_tpu.tracking import tracker as trk
    from dvm_slam_tpu.mapping import local_mapping, map_state
    from dvm_slam_tpu.io import synthetic

    H, W = 480, 752
    K = np.array([458.654, 457.296, 367.215, 248.375], np.float32)
    fc = FrontendConfig(height=H, width=W, n_features=1250)
    cfg = trk.TrackerConfig(frontend=fc, kf_cap=128, pt_cap=8192, fps=20.0)
    world = synthetic.PlaneWorld(seed=7, tex_size=2048, plane_z=6.0,
                                 extent=36.0)
    mapper = local_mapping.LocalMapper(n_neighbors=5, ba_local=12, ba_fixed=8,
                                       ba_pts=4096, ba_iters=6)
    t = trk.MonocularTracker(cfg, K, np.zeros(4, np.float32),
                             local_mapper=mapper)
    poses = synthetic.smooth_trajectory(60, lateral=2.5, forward=0.8, yaw=0.1)
    Kj = jnp.asarray(K)
    for i, p in enumerate(poses):
        t.process_image(np.asarray(world.render(jnp.asarray(p), Kj, H, W)),
                        i * 0.05)
    m = t.map
    c = jnp.int32(int(m.n_kf) - 1)
    Kd = t.K
    n_levels, sf = fc.n_levels, fc.scale_factor
    print(json.dumps({"n_kf": int(m.n_kf), "n_pt": int(m.n_pt),
                      "device": str(jax.devices()[0])}), flush=True)

    from dvm_slam_tpu.mapping.local_mapping import (
        cull_points, create_new_points, fuse_duplicates, local_ba)

    cull_j = jax.jit(cull_points)
    create_j = jax.jit(lambda mm: create_new_points(
        mm, c, Kd, n_neighbors=5, n_levels=n_levels, scale_factor=sf)[0])
    fuse_j = jax.jit(lambda mm: fuse_duplicates(
        mm, c, Kd, n_neighbors=5, n_levels=n_levels, scale_factor=sf))
    stats_j = jax.jit(lambda mm: map_state.update_point_stats(
        mm, n_levels, sf))
    ba_j = jax.jit(lambda mm: local_ba(
        mm, c, Kd, n_local=12, n_fixed=8, n_pts=4096, iters=6,
        n_levels=n_levels, scale_factor=sf)[0])

    for name, fn in [("cull_points", lambda: cull_j(m, c)),
                     ("create_new_points", lambda: create_j(m)),
                     ("fuse_duplicates", lambda: fuse_j(m)),
                     ("update_point_stats", lambda: stats_j(m)),
                     ("local_ba", lambda: ba_j(m))]:
        med, mn = timed(fn)
        print(json.dumps({"stage": name, "ms_median": round(med, 2),
                          "ms_min": round(mn, 2)}), flush=True)

    # stats split: geometry-only refresh (the post-BA need) vs full
    try:
        geom_j = jax.jit(lambda mm: map_state.update_point_stats(
            mm, n_levels, sf, with_desc=False))
        med, mn = timed(lambda: geom_j(m))
        print(json.dumps({"stage": "update_point_stats[geom-only]",
                          "ms_median": round(med, 2),
                          "ms_min": round(mn, 2)}), flush=True)
    except TypeError:
        print(json.dumps({"stage": "update_point_stats[geom-only]",
                          "skipped": "no with_desc param"}), flush=True)


if __name__ == "__main__":
    main()
