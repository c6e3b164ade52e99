#!/usr/bin/env python
"""On-chip sweep of the windowed-BA solve knobs (BASELINE's >=10x target).

Times `ba.bundle_adjust` on the exact 20-KF / 4096-pt / ~9.1k-obs problem
`native/ba_baseline.cpp` solves (same rng), batched x8 like the multi-agent
mapper runs it, across:
  * schur_iters (PCG depth on the reduced camera system) — the prime
    suspect: 11 LM iterations x 32 PCG steps is a ~350-deep sequential
    chain of tiny kernels on a problem whose FLOPs fit in ~0.3 ms
  * iters/stage2_iters (LM schedule)
  * adjoint dtype
and prints per-config (ms_per_solve, final chi2) so speed can be traded
against solution quality explicitly. chi2 within ~1% of the deepest-PCG
config means the LM step quality is preserved (inexact-Newton tolerance).

Run: python benchmarks/ba_sweep.py            (real TPU via axon)
     JAX_PLATFORMS=cpu python benchmarks/ba_sweep.py   (debug)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_problem():
    rng = np.random.RandomState(0)
    L, F, P = 20, 1300, 4096
    X = (rng.randn(P, 3) * 2 + [0, 0, 8]).astype(np.float32)
    K = np.array([458.0, 457.0, 367.0, 248.0], np.float32)
    poses_t = np.zeros((L, 3), np.float32)
    poses_t[:, 0] = np.arange(L) * 0.1
    obs = rng.randint(0, P, (L, F)).astype(np.int32)
    obs = np.where(rng.rand(L, F) < 0.35, obs, -1)
    uv = np.zeros((L, F, 2), np.float32)
    for l in range(L):
        Xl = X[np.clip(obs[l], 0, None)] - poses_t[l]
        uv[l, :, 0] = K[0] * Xl[:, 0] / Xl[:, 2] + K[2]
        uv[l, :, 1] = K[1] * Xl[:, 1] / Xl[:, 2] + K[3]
    uv += rng.randn(L, F, 2).astype(np.float32) * 0.5
    poses0 = np.tile([1, 0, 0, 0, 0, 0, 0], (L, 1)).astype(np.float32)
    poses0[:, 4:7] = -poses_t
    return X, K, obs, uv, poses0, rng


def main():
    import os
    import jax
    import jax.numpy as jnp
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        jax.config.update("jax_enable_compilation_cache", False)
    from dvm_slam_tpu.mapping import ba
    from dvm_slam_tpu.mapping.local_mapping import _compact_obs

    X, K, obs, uv, poses0, rng = make_problem()
    L, F = obs.shape
    P = X.shape[0]
    xy_c, sig_c, obs_c, _ = _compact_obs(
        jnp.asarray(uv), jnp.ones((L, F), jnp.float32), jnp.asarray(obs), 512)
    fixed = jnp.zeros(L, bool).at[:2].set(True)
    popt = jnp.ones(P, bool)
    Kj = jnp.asarray(K)
    Xj = jnp.asarray(X)
    BATCH = 8

    def bench_config(iters, s2, schur, adt, n_time=9):
        def solve(pose_batch):
            def f(p):
                po, pt, chi2, _ = ba.bundle_adjust(
                    p, fixed, xy_c, sig_c, obs_c, Xj, popt, Kj,
                    iters=iters, stage2_iters=s2, schur_iters=schur,
                    adjoint_dtype=adt)
                return po, chi2
            poses_out, chi2s = jax.vmap(f)(pose_batch)
            return poses_out, jnp.sum(chi2s)

        solve = jax.jit(solve)
        psets = [jnp.asarray(np.stack([
            poses0 + rng.randn(L, 7).astype(np.float32) * 0.002
            for _ in range(BATCH)])) for _ in range(12)]
        for i in range(3):
            po, r = solve(psets[i])
        chi2 = float(r)
        t0 = time.perf_counter()
        for i in range(n_time):
            po, r = solve(psets[(3 + i) % 12])
        float(r)
        ms = (time.perf_counter() - t0) / n_time / BATCH * 1000.0
        return ms, chi2 / BATCH

    configs = [
        # (iters, stage2, schur_iters, adjoint_dtype, label)
        (6, 5, 32, "bfloat16", "r03 default"),
        (6, 5, 24, "bfloat16", "pcg24"),
        (6, 5, 16, "bfloat16", "pcg16"),
        (6, 5, 12, "bfloat16", "pcg12"),
        (6, 5, 8,  "bfloat16", "pcg8"),
        (6, 5, 6,  "bfloat16", "pcg6"),
        (5, 4, 12, "bfloat16", "lm5+4 pcg12"),
        (6, 5, 12, "float32",  "pcg12 f32adj"),
    ]
    out = []
    for it, s2, sc, adt, label in configs:
        ms, chi2 = bench_config(it, s2, sc, adt)
        row = {"label": label, "iters": it, "stage2": s2, "schur": sc,
               "adjoint": adt, "ms_per_solve": round(ms, 3),
               "chi2": round(chi2, 1)}
        out.append(row)
        print(json.dumps(row), flush=True)
    best = min(out, key=lambda r: r["ms_per_solve"])
    print(json.dumps({"best": best["label"], "device":
                      str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
