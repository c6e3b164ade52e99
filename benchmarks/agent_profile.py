#!/usr/bin/env python
"""Per-stage profile of the production SlamAgent loop (bench.py's
e2e-agent-loop stage): separates tracker.process_image time from the
protocol round (`run_once`) per frame, and reports steady-state fps with
compile cost excluded — the diagnostic VERDICT r3 item 1 asked for.

Run: python benchmarks/agent_profile.py          (real TPU via axon)
     JAX_PLATFORMS=cpu python benchmarks/agent_profile.py
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

    from dvm_slam_tpu.frontend.extractor import FrontendConfig
    from dvm_slam_tpu.tracking import tracker as trk
    from dvm_slam_tpu.mapping import local_mapping
    from dvm_slam_tpu.io import synthetic
    from dvm_slam_tpu.multiagent import transport as mtransport
    from dvm_slam_tpu.multiagent.agent import SlamAgent
    from dvm_slam_tpu.placerec import vocabulary

    H, W = 480, 752
    K = np.array([458.654, 457.296, 367.215, 248.375], np.float32)
    fc = FrontendConfig(height=H, width=W, n_features=1250)
    cfg = trk.TrackerConfig(frontend=fc, kf_cap=128, pt_cap=8192, fps=20.0)

    world = synthetic.PlaneWorld(seed=7, tex_size=2048, plane_z=6.0, extent=36.0)
    poses = synthetic.smooth_trajectory(180, lateral=2.5, forward=0.8, yaw=0.1)
    Kj = jnp.asarray(K)
    imgs_f32 = [np.asarray(world.render(jnp.asarray(p), Kj, H, W))
                for p in poses[:60]]
    imgs_u8 = [np.clip(np.asarray(world.render(jnp.asarray(p), Kj, H, W)),
                       0, 255).astype(np.uint8) for p in poses[60:]]

    rngv = np.random.RandomState(0)
    voc = vocabulary.train((rngv.rand(4000, 256) > 0.5).astype(np.uint8),
                           branch=8, depth=3, seed=0)
    ag = SlamAgent(1, cfg, K, np.zeros(4, np.float32), voc,
                   mtransport.LoopbackTransport(), [1],
                   mapper=local_mapping.LocalMapper(
                       n_neighbors=5, ba_local=12, ba_fixed=8,
                       ba_pts=4096, ba_iters=6))
    t0 = time.perf_counter()
    for i, img in enumerate(imgs_f32):
        ag.process_image(img, i * 0.05)
    warm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for w in range(4):
        ag.process_image(imgs_u8[w], (60 + w) * 0.05)
    ag.flush()
    warm_u8_s = time.perf_counter() - t0

    # ---- timed steady state, per-stage ----
    # AGENT_PROFILE_TRACE=1 additionally times every run_once sub-call and
    # prints the breakdown of any frame slower than 0.5 s — the attribution
    # tool for rare mid-run stalls (compile? readback? device sync?)
    trace = os.environ.get("AGENT_PROFILE_TRACE") == "1"
    trk_ms, proto_ms, total_ms = [], [], []
    n = len(imgs_u8) - 4
    t_all0 = time.perf_counter()
    for i, img in enumerate(imgs_u8[4:]):
        ts = (64 + i) * 0.05
        f0 = time.perf_counter()
        ag.tracker.process_image(img, ts)
        f1 = time.perf_counter()
        if trace:
            sub = {}
            for name in ("_poll_gba", "_update_bow_db", "_drain_channels",
                         "_update_is_lost", "_send_new_key_frame_bows",
                         "_send_new_key_frames"):
                s0 = time.perf_counter()
                if name in ("_drain_channels",):
                    getattr(ag, name)(ts)
                else:
                    getattr(ag, name)()
                sub[name] = (time.perf_counter() - s0) * 1e3
            if ts >= ag._next_scale_ts:
                s0 = time.perf_counter()
                ag._update_map_scale(ts)
                sub["_update_map_scale"] = (time.perf_counter() - s0) * 1e3
        else:
            ag.run_once(ts)
        f2 = time.perf_counter()
        trk_ms.append((f1 - f0) * 1e3)
        proto_ms.append((f2 - f1) * 1e3)
        total_ms.append((f2 - f0) * 1e3)
        if (f2 - f0) > 0.5:
            line = {"slow_frame": i, "trk_ms": round(trk_ms[-1], 1),
                    "proto_ms": round(proto_ms[-1], 1),
                    "n_kf_host": ag.tracker.n_kf_host}
            if trace:
                line.update({k: round(v, 1) for k, v in sub.items()})
            print(json.dumps(line), flush=True)
    fps_nodrain = n / (time.perf_counter() - t_all0)
    t_d0 = time.perf_counter()
    ag.flush()
    drain_s = time.perf_counter() - t_d0
    fps = n / (time.perf_counter() - t_all0)

    pct = lambda a, q: round(float(np.percentile(a, q)), 2)
    out = {
        "e2e_agent_fps": round(fps, 2),
        "fps_before_drain": round(fps_nodrain, 2),
        "drain_s": round(drain_s, 3),
        "warmup_s": round(warm_s, 1),
        "warmup_u8_s": round(warm_u8_s, 1),
        "trk_ms_p50": pct(trk_ms, 50), "trk_ms_p95": pct(trk_ms, 95),
        "trk_ms_max": round(max(trk_ms), 1),
        "proto_ms_p50": pct(proto_ms, 50), "proto_ms_p95": pct(proto_ms, 95),
        "proto_ms_max": round(max(proto_ms), 1),
        "total_ms_max": round(max(total_ms), 1),
        "n_kf": int(ag.map.n_kf),
        "loop_triggers": len(ag.loop_detector.triggers),
        "pending_folds": len(ag._pending_protocol),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
