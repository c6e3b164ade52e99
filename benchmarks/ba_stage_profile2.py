#!/usr/bin/env python
"""Honest version of ba_stage_profile: every variant's FULL output is
consumed (dotted with a fixed random tensor) so XLA cannot dead-code or
slice the contraction. Compares, at the exact batch-8 BA shape:

  * onehot_adjoint_pallas vs onehot_adjoint_xla (bf16)
  * onehot_gather_pallas vs XLA row gather (pts[pidx] + moveaxis)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ba_sweep import make_problem  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        jax.config.update("jax_enable_compilation_cache", False)
    from dvm_slam_tpu.mapping.local_mapping import _compact_obs
    from dvm_slam_tpu.ops import pallas_scatter as ps

    X, K, obs, uv, poses0, rng = make_problem()
    L, F = obs.shape
    P = X.shape[0]
    B, Fc, ITERS = 8, 512, 11
    _, _, obs_c, _ = _compact_obs(
        jnp.asarray(uv), jnp.ones((L, F), jnp.float32), jnp.asarray(obs), Fc)
    pidx_b = jnp.asarray(np.broadcast_to(np.asarray(obs_c), (B, L, Fc)))
    vals_np = rng.randn(B, L, 30, Fc).astype(np.float32)
    valsets = [jnp.asarray(vals_np + 0.001 * i) for i in range(4)]
    rP = jnp.asarray(rng.randn(P).astype(np.float32))
    rF = jnp.asarray(rng.randn(Fc).astype(np.float32))
    pts_pl = jnp.asarray(X.T)

    def timeit(fn, args_list, n=10):
        r = fn(*args_list[0])
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for i in range(n):
            r = fn(*args_list[i % len(args_list)])
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n * 1000.0

    def bench_adj(impl, label):
        def run(vals, pidx):
            def one(v, pi):
                acc = jnp.zeros((), jnp.float32)
                for k in range(ITERS):
                    out = impl(v + k * 1e-6, pi, P, dot_dtype="bfloat16")
                    acc = acc + jnp.sum(out * rP[None, None, :])
                return acc
            return jnp.sum(jax.vmap(one)(vals, pidx))
        ms = timeit(jax.jit(run), [(v, pidx_b) for v in valsets])
        print(json.dumps({"stage": f"adjoint_{label}_x11_ms",
                          "ms": round(ms, 3)}), flush=True)

    bench_adj(ps.onehot_adjoint_pallas, "pallas")
    bench_adj(ps.onehot_adjoint_xla, "xla")

    def gather_xla(pts, pidx):
        safe = jnp.clip(pidx, 0)
        g = jnp.moveaxis(pts[:, safe], 0, 1)        # [L,3,F]
        return jnp.where(pidx[:, None, :] >= 0, g, 0.0)

    def bench_gat(impl, label):
        def run(pidx):
            def one(pi):
                acc = jnp.zeros((), jnp.float32)
                for k in range(ITERS):
                    out = impl(pts_pl + k * 1e-6, pi)
                    acc = acc + jnp.sum(out * rF[None, None, :])
                return acc
            return jnp.sum(jax.vmap(one)(pidx))
        ms = timeit(jax.jit(run), [(pidx_b,)])
        print(json.dumps({"stage": f"gather_{label}_x11_ms",
                          "ms": round(ms, 3)}), flush=True)

    bench_gat(ps.onehot_gather_pallas, "pallas")
    bench_gat(gather_xla, "xla_rowgather")
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
