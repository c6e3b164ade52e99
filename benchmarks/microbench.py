#!/usr/bin/env python
"""Per-stage performance regression harness.

Times each hot stage of the pipeline in isolation on the live JAX backend
(TPU under the driver, CPU elsewhere) and prints one JSON line per stage:

    {"stage": "track_frame", "ms": 3.1, "shapes": "..."}

Usage:
    python benchmarks/microbench.py            # all stages
    python benchmarks/microbench.py track ba   # substring filter

`bench.py` at the repo root remains the driver-facing single-line benchmark;
this file is the developer-facing breakdown (the REGISTER_TIMES role,
`Tracking.cc:253` PrintTimeStats).
"""

import json
import sys
import time

import numpy as np


def timeit(fn, args_pool, n=20):
    import jax

    out = fn(*args_pool[0])
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args_pool[i % len(args_pool)])
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n * 1000.0


def main(filters):
    import jax
    import jax.numpy as jnp

    from dvm_slam_tpu.frontend.extractor import FrontendConfig, make_frame
    from dvm_slam_tpu.tracking import tracker as trk
    from dvm_slam_tpu.mapping import ba, local_mapping, map_state
    from dvm_slam_tpu.ops import matching
    from dvm_slam_tpu.placerec import vocabulary
    from dvm_slam_tpu.io import synthetic

    rng = np.random.RandomState(0)
    results = []

    def report(stage, ms, shapes=""):
        line = {"stage": stage, "ms": round(ms, 3), "shapes": shapes,
                "device": jax.devices()[0].platform}
        results.append(line)
        print(json.dumps(line), flush=True)

    def want(name):
        return not filters or any(f in name for f in filters)

    H, W = 480, 752
    K = jnp.asarray([458.654, 457.296, 367.215, 248.375])
    fc = FrontendConfig(height=H, width=W, n_features=1250)
    cfg = trk.TrackerConfig(frontend=fc, kf_cap=128, pt_cap=8192, fps=20.0)

    world = synthetic.PlaneWorld(seed=7, tex_size=2048, plane_z=6.0, extent=36.0)
    poses = synthetic.smooth_trajectory(12, lateral=2.0, forward=0.5)
    imgs = [world.render(jnp.asarray(p), K, H, W) for p in poses]

    if want("extract"):
        ms = timeit(lambda im: make_frame(im, K, jnp.zeros(4), fc),
                    [(im,) for im in imgs])
        report("frontend_extract", ms, f"{H}x{W}, {fc.n_features} feats")

    # a populated map for tracking / BA stages
    mapper = local_mapping.LocalMapper(ba_local=12, ba_fixed=8, ba_pts=4096,
                                       ba_iters=6)
    t = trk.MonocularTracker(cfg, np.asarray(K), np.zeros(4, np.float32),
                             local_mapper=mapper)
    warm = synthetic.smooth_trajectory(50, lateral=2.5, forward=0.8, yaw=0.1)
    for i, p in enumerate(warm):
        t.process_image(np.asarray(world.render(jnp.asarray(p), K, H, W)),
                        i * 0.05)
    m = t.map

    if want("track"):
        frames = [make_frame(im, K, jnp.zeros(4), fc) for im in imgs]
        ms = timeit(lambda f: trk.track_frame(m, f, t.last_pose, K, cfg),
                    [(f,) for f in frames])
        report("track_frame", ms, f"P={cfg.pt_cap}, F={fc.capacity}")

    if want("local_ba") or want("ba"):
        centers = [jnp.int32(max(int(m.n_kf) - 1 - i, 1)) for i in range(4)]
        ms = timeit(
            lambda c: local_mapping.local_ba(m, c, K, n_local=12, n_fixed=8,
                                             n_pts=4096, iters=6),
            [(c,) for c in centers], n=10)
        report("local_ba", ms, "12+8 KFs, 4096 pts, 6 iters")

    if want("global_ba") or want("ba"):
        ms = timeit(lambda mm: local_mapping.global_ba(mm, K, iters=8),
                    [(m,)], n=3)
        report("global_ba_pcg", ms,
               f"K={m.kf_capacity}, P={m.pt_capacity}, 8 LM iters")

    if want("hamming") or want("match"):
        d1 = jnp.asarray((rng.rand(1250, 256) > 0.5).astype(np.uint8))
        pool = [jnp.asarray((rng.rand(8192, 256) > 0.5).astype(np.uint8))
                for _ in range(4)]
        fn = jax.jit(matching.hamming_matrix)
        ms = timeit(lambda d2: fn(d1, d2), [(p,) for p in pool])
        report("hamming_1250x8192", ms)

    if want("bow") or want("vocab"):
        voc = vocabulary.train((rng.rand(4000, 256) > 0.5).astype(np.uint8),
                               branch=10, depth=3, seed=0)
        lv, idf = voc.device_arrays()
        pool = [jnp.asarray((rng.rand(fc.capacity, 256) > 0.5).astype(np.uint8))
                for _ in range(4)]
        valid = jnp.ones((fc.capacity,), bool)
        ms = timeit(
            lambda d: vocabulary.bow_vector(lv, idf, d, valid, voc.branch,
                                            voc.n_words),
            [(p,) for p in pool])
        report("bow_transform", ms, f"{fc.capacity} feats -> {voc.n_words} words")

    if want("pose_graph"):
        from dvm_slam_tpu.loopclosing import pose_graph
        from dvm_slam_tpu.geometry import lie
        N, E = 128, 512
        p0 = jnp.tile(jnp.asarray([1., 0, 0, 0, 0, 0, 0, 1.]), (N, 1))
        ei = jnp.asarray(rng.randint(0, N, E), jnp.int32)
        ej = jnp.asarray((np.asarray(ei) + 1 + rng.randint(0, N - 1, E)) % N,
                         jnp.int32)
        meas = jnp.tile(jnp.asarray([1., 0, 0, 0, 0, 0, 0, 1.]), (E, 1))
        fixed = jnp.zeros(N, bool).at[0].set(True)
        ms = timeit(
            lambda p: pose_graph.optimize_pose_graph(
                p, fixed, ei, ej, meas, jnp.ones(E, bool), iters=12),
            [(p0,)], n=3)
        report("sim3_pose_graph", ms, f"N={N}, E={E}, 12 iters")

    return results


if __name__ == "__main__":
    main(sys.argv[1:])
