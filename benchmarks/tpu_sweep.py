"""TPU experiment sweep, ready for the moment the tunnel returns.

Measures, on the real chip:
  1. autonomous e2e fps vs auto_batch B in {1,2,4,8}
  2. local BA per-solve ms vs batch in {1,4,8,16}
  3. same-problem BA (the C++ baseline's exact problem)
  4. pallas kernel verification
Prints one JSON line per experiment.
"""
import json
import os
import sys
import time

import numpy as np

# NOTE: self-insert like the other benchmark scripts rather than asking the
# caller for PYTHONPATH=/root/repo — overriding PYTHONPATH drops the
# preexisting /root/.axon_site entry the TPU plugin needs to register
# ("axon is not a known backend" otherwise).
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from dvm_slam_tpu.frontend.extractor import FrontendConfig
    from dvm_slam_tpu.tracking import tracker as trk
    from dvm_slam_tpu.mapping import local_mapping, map_state
    from dvm_slam_tpu.io import synthetic

    print(json.dumps({"devices": str(jax.devices())}), flush=True)

    H, W = 480, 752
    K = np.array([458.654, 457.296, 367.215, 248.375], np.float32)
    fc = FrontendConfig(height=H, width=W, n_features=1250)
    cfg = trk.TrackerConfig(frontend=fc, kf_cap=128, pt_cap=8192, fps=20.0)
    world = synthetic.PlaneWorld(seed=7, tex_size=2048, plane_z=6.0,
                                 extent=36.0)
    mapper = local_mapping.LocalMapper(n_neighbors=5, ba_local=12, ba_fixed=8,
                                       ba_pts=4096, ba_iters=6)
    Kj = jnp.asarray(K)

    n_warm = 60
    poses = synthetic.smooth_trajectory(n_warm + 300, lateral=2.5,
                                        forward=0.8, yaw=0.1)
    warm_imgs = [np.asarray(world.render(jnp.asarray(p), Kj, H, W))
                 for p in poses[:n_warm]]
    run_imgs = [np.clip(np.asarray(world.render(jnp.asarray(p), Kj, H, W)),
                        0, 255).astype(np.uint8) for p in poses[n_warm:]]

    # --- experiment 0: H2D upload bandwidth --------------------------------
    # uint8 480x752 = 353 KB/frame; at the tunnel's nominal ~40 MB/s this is
    # ~9 ms/frame — over half a 60 fps budget. Measure what it actually is.
    warm_up = [jnp.asarray(im) for im in run_imgs[:4]]
    jax.block_until_ready(warm_up)
    t0 = time.perf_counter()
    ups = [jnp.asarray(im) for im in run_imgs[:48]]
    jax.block_until_ready(ups)
    dt = time.perf_counter() - t0
    mb = sum(im.nbytes for im in run_imgs[:48]) / 1e6
    print(json.dumps({"exp": "h2d_upload", "MB_s": round(mb / dt, 1),
                      "ms_per_frame": round(dt / 48 * 1000, 2)}), flush=True)
    del warm_up, ups

    # --- experiment 1: autonomous fps vs B --------------------------------
    for B in (1, 2, 4, 8, 12):
        t = trk.MonocularTracker(cfg, K, np.zeros(4, np.float32),
                                 local_mapper=mapper)
        for i, img in enumerate(warm_imgs):
            t.process_image(img, i * 0.05)
        if t.state != trk.OK:
            print(json.dumps({"exp": "auto_fps", "B": B, "error": "not OK"}),
                  flush=True)
            continue
        t.async_depth = 8
        t.auto_batch = B
        if not t.enter_autonomous():
            print(json.dumps({"exp": "auto_fps", "B": B,
                              "error": "enter failed"}), flush=True)
            continue
        for w in range(2 * B):   # warm both dispatch shapes
            t.process_image(run_imgs[w], (n_warm + w) * 0.05)
        t.drain_auto()
        jax.block_until_ready(t._auto_state.T_cw)
        n = 72
        t0 = time.perf_counter()
        for i in range(n):
            t.process_image(run_imgs[2 * B + i], (n_warm + 2 * B + i) * 0.05)
            if not t.autonomous:
                break
        ok = t.autonomous
        if ok:
            t.drain_auto()
            jax.block_until_ready(t._auto_state.T_cw)
        dt = time.perf_counter() - t0
        print(json.dumps({"exp": "auto_fps", "B": B,
                          "fps": round(n / dt, 2), "still_auto": bool(ok),
                          "n_kf": int(t.map.n_kf)}), flush=True)

        # 1b: same loop with DEVICE-RESIDENT frames (no H2D in the loop):
        # the fps delta vs the host-upload run is the upload cost; the
        # remainder is dispatch + device compute.
        if ok and t.autonomous:
            base = n_warm + 2 * B + n
            dev = [jnp.asarray(run_imgs[2 * B + n + i]) for i in range(72)]
            jax.block_until_ready(dev[-1])
            t0 = time.perf_counter()
            nd = 0
            for i, im in enumerate(dev):
                t.process_image(im, (base + i) * 0.05)
                nd += 1
                if not t.autonomous:
                    break
            if t.autonomous:
                t.drain_auto()
                jax.block_until_ready(t._auto_state.T_cw)
            dt = time.perf_counter() - t0
            print(json.dumps({"exp": "auto_fps_devres", "B": B,
                              "fps": round(nd / dt, 2),
                              "still_auto": bool(t.autonomous)}), flush=True)
        t.exit_autonomous()
        t.flush_meta()
        m_ref = t.map

    # --- experiment 1d: per-stage device time (blocking, distinct inputs) --
    # answers WHERE the per-frame milliseconds go: extract vs track vs mapper
    def _time_stage(name, fn, inputs, n=8):
        fn(inputs[0])
        out = fn(inputs[0])
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        ts = []
        for j in range(n):
            t0 = time.perf_counter()
            out = fn(inputs[j % len(inputs)])
            jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"exp": "stage_ms", "stage": name,
                          "ms_median": round(float(np.median(ts)) * 1000, 2),
                          "ms_min": round(float(np.min(ts)) * 1000, 2)}),
              flush=True)

    t = trk.MonocularTracker(cfg, K, np.zeros(4, np.float32),
                             local_mapper=mapper)
    for i, img in enumerate(warm_imgs):
        t.process_image(img, i * 0.05)
    if t.state == trk.OK:
        from dvm_slam_tpu.frontend.extractor import make_frame
        from dvm_slam_tpu.mapping.local_mapping import _mapper_chain
        dev = [jnp.asarray(im) for im in run_imgs[:8]]
        jax.block_until_ready(dev[-1])
        mkf = jax.jit(lambda im: make_frame(
            im, t.K, t.dist, cfg.frontend, camera_model="pinhole"))
        _time_stage("make_frame", mkf, dev)
        frames = [mkf(d) for d in dev]
        m0, T0 = t.map, jnp.asarray(t.last_pose)
        trkfn = jax.jit(lambda fr: trk.track_frame(m0, fr, T0, t.K, cfg))
        _time_stage("track_frame", trkfn, frames)
        slot = jnp.int32(max(int(m0.n_kf) - 1, 0))
        chain = jax.jit(lambda mm: _mapper_chain(
            mm, slot, t.K, n_neighbors=5, n_levels=8, scale_factor=1.2,
            run_ba_traced=jnp.bool_(False), ba_local=12, ba_fixed=8,
            ba_pts=4096, ba_iters=6))
        _time_stage("mapper_noBA", chain, [m0])
        chain_ba = jax.jit(lambda mm: _mapper_chain(
            mm, slot, t.K, n_neighbors=5, n_levels=8, scale_factor=1.2,
            run_ba_traced=jnp.bool_(True), ba_local=12, ba_fixed=8,
            ba_pts=4096, ba_iters=6))
        _time_stage("mapper_withBA", chain_ba, [m0])
        from dvm_slam_tpu.mapping import map_state as ms_mod
        _time_stage("incidence", jax.jit(
            lambda mm: ms_mod.incidence(mm)), [m0])
        _time_stage("update_point_stats", jax.jit(
            lambda mm: ms_mod.update_point_stats(mm, 8, 1.2)), [m0])

    # --- experiment 1c: blocking per-dispatch time of the autonomous step --
    # (device compute + one round trip; no pipelining) at each B
    t = trk.MonocularTracker(cfg, K, np.zeros(4, np.float32),
                             local_mapper=mapper)
    for i, img in enumerate(warm_imgs):
        t.process_image(img, i * 0.05)
    if t.state == trk.OK and t.enter_autonomous():
        st0, m0 = t._auto_state, t.map
        for B in (1, 4, 8):
            dev = jnp.asarray(np.stack(run_imgs[:8 * B]).reshape(
                8, B, H, W)) if B > 1 else jnp.asarray(
                np.stack(run_imgs[:8])[:, None].reshape(8, 1, H, W))
            fn = (trk.autonomous_step_batch if B > 1
                  else trk.autonomous_step_packed)
            args = lambda j: (dev[j] if B > 1 else dev[j, 0])
            m, st, p = fn(args(0), m0, st0, t.K, t.dist, t.config,
                          t._auto_cfg)
            jax.block_until_ready(p)
            ts = []
            for j in range(8):
                t0 = time.perf_counter()
                m, st, p = fn(args(j), m0, st0, t.K, t.dist, t.config,
                              t._auto_cfg)
                jax.block_until_ready(p)
                ts.append(time.perf_counter() - t0)
            print(json.dumps({
                "exp": "auto_dispatch_blocking", "B": B,
                "ms_median": round(float(np.median(ts)) * 1000, 2),
                "ms_min": round(float(np.min(ts)) * 1000, 2)}), flush=True)
        t.exit_autonomous()

    # --- experiment 2: local BA per-solve vs batch -------------------------
    for BATCH in (1, 4, 8, 16):
        ms_stack = map_state.stack_maps([m_ref] * BATCH)
        cen_sets = [
            jnp.asarray([(3 + i * BATCH + b) % max(int(m_ref.n_kf) - 2, 1) + 1
                         for b in range(BATCH)], jnp.int32)
            for i in range(4)
        ]
        mm, chi2 = local_mapping.local_ba_batched(
            ms_stack, cen_sets[0], t.K, n_local=12, n_fixed=8, n_pts=4096,
            iters=6)
        jax.block_until_ready(chi2)
        t0 = time.perf_counter()
        for i in range(8):
            mm, chi2 = local_mapping.local_ba_batched(
                ms_stack, cen_sets[i % 4], t.K, n_local=12, n_fixed=8,
                n_pts=4096, iters=6)
        jax.block_until_ready(chi2)
        per = (time.perf_counter() - t0) / 8 / BATCH * 1000.0
        print(json.dumps({"exp": "local_ba", "batch": BATCH,
                          "per_solve_ms": round(per, 3)}), flush=True)

    # --- experiment 2b: selection vs solve split ----------------------------
    try:
        ms_stack = map_state.stack_maps([m_ref] * 8)
        cen = jnp.asarray([(3 + b) % max(int(m_ref.n_kf) - 2, 1) + 1
                           for b in range(8)], jnp.int32)
        for iters in (1, 6, 12):
            mm, chi2 = local_mapping.local_ba_batched(
                ms_stack, cen, t.K, n_local=12, n_fixed=8, n_pts=4096,
                iters=iters)
            jax.block_until_ready(chi2)
            t0 = time.perf_counter()
            for i in range(6):
                mm, chi2 = local_mapping.local_ba_batched(
                    ms_stack, cen + i % 3, t.K, n_local=12, n_fixed=8,
                    n_pts=4096, iters=iters)
            jax.block_until_ready(chi2)
            per = (time.perf_counter() - t0) / 6 / 8 * 1000.0
            print(json.dumps({"exp": "local_ba_iters", "iters": iters,
                              "per_solve_ms": round(per, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"exp": "local_ba_iters", "error": str(e)[:200]}),
              flush=True)

    # --- experiment 3+4: reuse bench helpers --------------------------------
    import bench
    for bsz in (8, 16, 32):
        try:
            ba_ms = bench._tpu_same_problem_ba_ms(bsz)
            print(json.dumps({"exp": "same_problem_ba", "batch": bsz,
                              "per_solve_ms": round(ba_ms, 3) if ba_ms
                              else None}), flush=True)
        except Exception as e:
            print(json.dumps({"exp": "same_problem_ba", "batch": bsz,
                              "error": str(e)[:200]}), flush=True)
    pv = bench._verify_pallas_kernels(warm_imgs[0], t)
    print(json.dumps({"exp": "pallas_verify", "ok": pv}), flush=True)

    # --- experiment 5: global BA ------------------------------------------
    mg, _ = local_mapping.global_ba(m_ref, t.K, iters=8)
    jax.block_until_ready(mg.kf_pose)
    t0 = time.perf_counter()
    for _ in range(3):
        mg, _ = local_mapping.global_ba(m_ref, t.K, iters=8)
    jax.block_until_ready(mg.kf_pose)
    print(json.dumps({"exp": "global_ba",
                      "ms": round((time.perf_counter() - t0) / 3 * 1000, 1)}),
          flush=True)

    # --- experiment 6: VI fps, sync vs pipelined lane ----------------------
    # the pipelined VI lane replaces two blocking round-trips per frame
    # (inlier gate + bias readback) with one packed async readback
    try:
        from dvm_slam_tpu.io import config as config_mod
        from dvm_slam_tpu.models import system as system_mod
        for depth, tag in ((0, "vi_sync"), (8, "vi_pipelined")):
            settings = config_mod.SystemSettings()
            settings.camera = config_mod.CameraSettings(
                fx=float(K[0]), fy=float(K[1]), cx=float(K[2]),
                cy=float(K[3]), width=W, height=H,
                dist=(0.0, 0.0, 0.0, 0.0), fps=20.0)
            settings.orb = config_mod.OrbSettings(n_features=1250)
            settings.kf_capacity = 128
            settings.pt_capacity = 8192
            settings.imu = config_mod.ImuSettings(frequency=200.0)
            sy = system_mod.System(settings, sensor="imu-monocular",
                                   agent_id=1)
            sy.tracker.async_depth = depth
            vi_poses, vi_chunks, _ = synthetic.vi_trajectory(
                150, fps=20.0, imu_rate=200.0, lateral=2.5, forward=0.8,
                z_amp=0.3)
            vi_imgs = [np.clip(np.asarray(world.render(
                jnp.asarray(p), Kj, H, W)), 0, 255).astype(np.uint8)
                for p in vi_poses]
            for i in range(90):  # init + warm both dispatch shapes
                a, g, d = vi_chunks[i]
                sy.track_monocular_inertial(vi_imgs[i], i * 0.05, a, g, d)
            n_vi = 60
            t0 = time.perf_counter()
            for i in range(90, 90 + n_vi):
                a, g, d = vi_chunks[i]
                sy.track_monocular_inertial(vi_imgs[i], i * 0.05, a, g, d)
            sy.tracker.flush_pipeline()
            jax.block_until_ready(sy.tracker.last_pose)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "exp": tag, "fps": round(n_vi / dt, 2),
                "imu_init": bool(sy.tracker.imu_initialized),
                "state": sy.tracker.state}), flush=True)
    except Exception as e:
        print(json.dumps({"exp": "vi_fps", "error": str(e)[:200]}),
              flush=True)


if __name__ == "__main__":
    main()
