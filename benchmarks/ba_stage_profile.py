#!/usr/bin/env python
"""Isolate where the windowed-BA iteration time goes at the benchmark shape
(batch 8 x [L=20, F=512, P=4096], 11 LM iterations):

  * full solve                      (the number bench.py reports /8)
  * onehot_adjoint alone x11       (the Pallas scatter)
  * onehot_gather alone x11        (the Pallas gather inside compute_system)
  * adjoint via XLA dense one-hot  (is the Pallas grid latency-bound?)
  * S_off dot + PCG alone x11      (the Schur/solve tail)

Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ba_sweep import make_problem  # noqa: E402


def timeit(fn, args_list, n=12):
    import jax
    r = fn(*args_list[0])
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        jax.config.update("jax_enable_compilation_cache", False)
    from dvm_slam_tpu.mapping import ba
    from dvm_slam_tpu.mapping.local_mapping import _compact_obs
    from dvm_slam_tpu.ops import pallas_scatter as ps

    X, K, obs, uv, poses0, rng = make_problem()
    L, F = obs.shape
    P = X.shape[0]
    B = 8
    Fc = 512
    xy_c, sig_c, obs_c, _ = _compact_obs(
        jnp.asarray(uv), jnp.ones((L, F), jnp.float32), jnp.asarray(obs), Fc)
    fixed = jnp.zeros(L, bool).at[:2].set(True)
    popt = jnp.ones(P, bool)
    Kj, Xj = jnp.asarray(K), jnp.asarray(X)
    ITERS = 11

    # ---- full solve ----
    def solve(pose_batch):
        f = lambda p: ba.bundle_adjust(
            p, fixed, xy_c, sig_c, obs_c, Xj, popt, Kj,
            iters=6, stage2_iters=5, adjoint_dtype="bfloat16")[2]
        return jnp.sum(jax.vmap(f)(pose_batch))
    solve = jax.jit(solve)
    psets = [jnp.asarray(np.stack([
        poses0 + rng.randn(L, 7).astype(np.float32) * 0.002
        for _ in range(B)])) for _ in range(6)]
    ms = timeit(solve, [(p,) for p in psets])
    print(json.dumps({"stage": "full_solve_dispatch_ms", "ms": round(ms, 3),
                      "per_solve": round(ms / B, 3)}), flush=True)

    # ---- adjoint alone, x11 per dispatch, batched like the solve ----
    vals_np = rng.randn(B, L, 30, Fc).astype(np.float32)
    pidx_np = np.asarray(obs_c)
    pidx_b = jnp.asarray(np.broadcast_to(pidx_np, (B, L, Fc)))
    valsets = [jnp.asarray(vals_np + 0.001 * i) for i in range(4)]

    def adj_pallas(vals, pidx):
        def one(v, pi):
            acc = jnp.zeros((), jnp.float32)
            out = None
            for k in range(ITERS):
                out = ps.onehot_adjoint_pallas(v + k * 1e-6, pi, P,
                                               dot_dtype="bfloat16")
                acc = acc + out[0, 0, 0]
            return acc
        return jnp.sum(jax.vmap(one)(vals, pidx))
    adj_pallas = jax.jit(adj_pallas)
    ms = timeit(adj_pallas, [(v, pidx_b) for v in valsets])
    print(json.dumps({"stage": "adjoint_pallas_x11_ms", "ms": round(ms, 3)}),
          flush=True)

    def adj_xla(vals, pidx):
        def one(v, pi):
            acc = jnp.zeros((), jnp.float32)
            for k in range(ITERS):
                out = ps.onehot_adjoint_xla(v + k * 1e-6, pi, P,
                                            dot_dtype="bfloat16")
                acc = acc + out[0, 0, 0]
            return acc
        return jnp.sum(jax.vmap(one)(vals, pidx))
    adj_xla = jax.jit(adj_xla)
    ms = timeit(adj_xla, [(v, pidx_b) for v in valsets])
    print(json.dumps({"stage": "adjoint_xla_x11_ms", "ms": round(ms, 3)}),
          flush=True)

    # ---- gather alone x11 ----
    pts_pl = jnp.asarray(Xj.T)  # [3,P]

    def gat(vals, pidx):
        def one(pi):
            acc = jnp.zeros((), jnp.float32)
            for k in range(ITERS):
                out = ps.onehot_gather_pallas(pts_pl + k * 1e-6, pi)
                acc = acc + out[0, 0, 0]
            return acc
        return jnp.sum(jax.vmap(one)(pidx))
    gat = jax.jit(gat)
    ms = timeit(gat, [(v, pidx_b) for v in valsets])
    print(json.dumps({"stage": "gather_pallas_x11_ms", "ms": round(ms, 3)}),
          flush=True)

    # ---- Schur product + PCG alone x11 ----
    W_np = rng.randn(B, L, 6, 3, P).astype(np.float32) * 0.01
    Hpi_np = np.tile(np.eye(3, dtype=np.float32)[None, :, :, None],
                     (B, 1, 1, P))
    Wj = jnp.asarray(W_np)
    Hpij = jnp.asarray(Hpi_np)
    Hcc = jnp.asarray(
        np.tile(np.eye(6, dtype=np.float32)[None, None] * 100.0, (B, L, 1, 1)))
    rhs0 = jnp.asarray(rng.randn(B, L * 6).astype(np.float32))

    def schur(W, Hpi, rhs):
        def one(W1, Hpi1, r1):
            acc = jnp.zeros((), jnp.float32)
            for k in range(ITERS):
                WHi = jnp.stack(
                    [W1[:, :, 0] * Hpi1[None, None, 0, kk]
                     + W1[:, :, 1] * Hpi1[None, None, 1, kk]
                     + W1[:, :, 2] * Hpi1[None, None, 2, kk]
                     for kk in range(3)], axis=2)
                S_off = jax.lax.dot_general(
                    WHi, W1, dimension_numbers=(((2, 3), (2, 3)), ((), ())),
                    preferred_element_type=jnp.float32)
                ii = jnp.arange(L)
                S = (-S_off).at[ii, :, ii, :].add(Hcc[0] + k * 1e-6)
                Sm = S.reshape(L * 6, L * 6)
                from dvm_slam_tpu.mapping.ba import _block_jacobi_pcg, _inv6x6_block
                Minv = _inv6x6_block(S[ii, :, ii, :])
                dc = _block_jacobi_pcg(Sm, Minv, r1, 32)
                acc = acc + jnp.sum(dc)
            return acc
        return jnp.sum(jax.vmap(one)(W, Hpi, rhs))
    schur = jax.jit(schur)
    ms = timeit(schur, [(Wj, Hpij, rhs0)], n=8)
    print(json.dumps({"stage": "schur_pcg_x11_ms", "ms": round(ms, 3)}),
          flush=True)
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
