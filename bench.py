#!/usr/bin/env python
"""Benchmark: per-agent front-end + tracking FPS on the flagship hot path.

Runs the full jitted per-frame pipeline (ORB extraction -> two-stage map
projection matching -> pose-only BA) at EuRoC geometry (752x480, 1250
features, 8 levels) against a populated map, on whatever accelerator JAX
provides (TPU under the driver). Also times one windowed local BA solve.

Prints ONE JSON line:
  {"metric": "tracking_fps", "value": N, "unit": "fps", "vs_baseline": N/20}

Baseline: the reference tracks its configured camera rate, 20 fps on EuRoC
(`src/slam_system/configs/euroc.yaml:39`); BASELINE.md's rebuild target is
>= 60 fps/agent (3x the reference rate), i.e. vs_baseline >= 3.0.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dvm_slam_tpu.frontend.extractor import FrontendConfig, make_frame
    from dvm_slam_tpu.tracking import tracker as trk
    from dvm_slam_tpu.mapping import local_mapping, map_state
    from dvm_slam_tpu.io import synthetic

    H, W = 480, 752
    K = np.array([458.654, 457.296, 367.215, 248.375], np.float32)
    fc = FrontendConfig(height=H, width=W, n_features=1250)
    cfg = trk.TrackerConfig(frontend=fc, kf_cap=128, pt_cap=8192, fps=20.0)

    world = synthetic.PlaneWorld(seed=7, tex_size=2048, plane_z=6.0, extent=36.0)
    mapper = local_mapping.LocalMapper(n_neighbors=5, ba_local=12, ba_fixed=8,
                                       ba_pts=4096, ba_iters=6)
    t = trk.MonocularTracker(cfg, K, np.zeros(4, np.float32), local_mapper=mapper)

    poses = synthetic.smooth_trajectory(60, lateral=2.5, forward=0.8, yaw=0.1)
    Kj = jnp.asarray(K)
    imgs = [np.asarray(world.render(jnp.asarray(p), Kj, H, W)) for p in poses]

    # build a map (also warms every jit cache)
    for i, img in enumerate(imgs):
        t.process_image(img, i * 0.05)
    if int(np.asarray(t.map.pt_valid).sum()) < 100:
        # retry once with a gentler trajectory before reporting a failure
        t = trk.MonocularTracker(cfg, K, np.zeros(4, np.float32),
                                 local_mapper=mapper)
        poses = synthetic.smooth_trajectory(80, lateral=1.8, forward=0.5, yaw=0.06)
        imgs = [np.asarray(world.render(jnp.asarray(p), Kj, H, W)) for p in poses]
        for i, img in enumerate(imgs):
            t.process_image(img, i * 0.05)
    if int(np.asarray(t.map.pt_valid).sum()) < 100:
        print(json.dumps({"metric": "tracking_fps", "value": 0.0,
                          "unit": "fps", "vs_baseline": 0.0,
                          "error": f"tracker state {t.state}"}))
        return

    # ---- timed: the steady-state per-frame hot path --------------------
    # rotate over distinct recent frames: repeated identical dispatches can
    # be elided by the device transport, inflating FPS
    T_pred = t.last_pose
    m = t.map
    pool = [jnp.asarray(im) for im in imgs[-10:]]

    def hot(img):
        f = make_frame(img, t.K, t.dist, fc)
        return trk.track_frame(m, f, T_pred, t.K, cfg)

    r = hot(pool[0])
    jax.block_until_ready(r.T_cw)

    n_iter = 50
    t0 = time.perf_counter()
    for i in range(n_iter):
        r = hot(pool[i % len(pool)])
    jax.block_until_ready(r.T_cw)
    dt = (time.perf_counter() - t0) / n_iter
    fps = 1.0 / dt

    # ---- local BA timing (secondary, reported inside the same line) ----
    centers = [jnp.int32(max(int(m.n_kf) - 1 - i, 1)) for i in range(4)]
    mm, chi2 = local_mapping.local_ba(m, centers[0], t.K, n_local=12, n_fixed=8,
                                      n_pts=4096, iters=6)
    jax.block_until_ready(mm.kf_pose)
    t0 = time.perf_counter()
    for i in range(10):
        mm, chi2 = local_mapping.local_ba(m, centers[i % 4], t.K, n_local=12,
                                          n_fixed=8, n_pts=4096, iters=6)
    jax.block_until_ready(mm.kf_pose)
    ba_ms = (time.perf_counter() - t0) / 10 * 1000.0

    # ---- same-algorithm CPU reference for the BA speedup claim ---------
    cpu_ba_ms = _cpu_ba_reference()

    out = {
        "metric": "tracking_fps",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 20.0, 3),
        "local_ba_ms": round(ba_ms, 2),
        "device": str(jax.devices()[0]),
    }
    if cpu_ba_ms:
        out["cpu_local_ba_ms"] = round(cpu_ba_ms, 2)
        out["ba_speedup_vs_cpu"] = round(cpu_ba_ms / ba_ms, 2)
    print(json.dumps(out))


def _cpu_ba_reference():
    """Run the identical local-BA problem on the host CPU (separate process
    so the platform can differ) — the 'CPU solver' baseline for the >=10x
    target. Returns ms or None."""
    import subprocess

    code = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import time, numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)
import jax.numpy as jnp
from dvm_slam_tpu.mapping import local_mapping, map_state
from dvm_slam_tpu.geometry import lie, cameras
rng = np.random.RandomState(0)
m = map_state.create(128, 8192, 1300)
P = 8192
X = jnp.asarray(rng.randn(P,3).astype(np.float32)*2 + [0,0,8])
m = m._replace(pt_pos=X, pt_valid=jnp.ones(P,bool), pt_ref_kf=jnp.zeros(P,jnp.int32), n_pt=jnp.int32(P))
K = jnp.asarray([458.0,457.0,367.0,248.0])
L = 24
poses = jnp.asarray(np.tile([1,0,0,0,0,0,0],(L,1)).astype(np.float32)).at[:,4].set(jnp.arange(L)*0.1)
obs = jnp.asarray(rng.randint(0,P,(L,1300)).astype(np.int32))
obs = jnp.where(jnp.asarray(rng.rand(L,1300) < 0.35), obs, -1)
uv = jax.vmap(lambda T, o: cameras.pinhole_project(K, jax.vmap(lambda x: lie.se3_apply(T,x))(X[jnp.clip(o,0)]))[0])(poses, obs)
m = m._replace(kf_pose=m.kf_pose.at[:L].set(poses), kf_valid=m.kf_valid.at[:L].set(True),
               kf_xy=m.kf_xy.at[:L].set(uv), kf_obs=m.kf_obs.at[:L].set(obs),
               kf_feat_valid=m.kf_feat_valid.at[:L].set(True), n_kf=jnp.int32(L))
r = local_mapping.local_ba(m, jnp.int32(8), K, n_local=12, n_fixed=8, n_pts=4096, iters=6)
jax.block_until_ready(r[0].kf_pose)
t0 = time.perf_counter()
for i in range(3):
    r = local_mapping.local_ba(m, jnp.int32(8+i), K, n_local=12, n_fixed=8, n_pts=4096, iters=6)
jax.block_until_ready(r[0].kf_pose)
print((time.perf_counter()-t0)/3*1000)
"""
    try:
        env = dict(**__import__("os").environ)
        env["JAX_PLATFORMS"] = "cpu"
        res = subprocess.run(["python", "-c", code], capture_output=True,
                             text=True, timeout=600, env=env)
        return float(res.stdout.strip().splitlines()[-1])
    except Exception:
        return None


if __name__ == "__main__":
    sys.exit(main())
