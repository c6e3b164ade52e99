"""Pallas one-hot adjoint kernel (the BA assembly "scatter") equivalence
against the XLA reference formulation, in interpret mode (no TPU in CI).
Real-TPU bit-equality is asserted by bench.py on hardware."""

import numpy as np
import jax.numpy as jnp

from dvm_slam_tpu.ops import pallas_scatter as ps


class TestOnehotAdjoint:
    def test_interpret_matches_xla(self, rng):
        L, G, F, P = 5, 30, 130, 260   # deliberately unaligned F and P
        vals = jnp.asarray(rng.randn(L, G, F).astype(np.float32))
        pidx = jnp.asarray(rng.randint(-1, P, (L, F)).astype(np.int32))
        got = ps.onehot_adjoint_pallas(vals, pidx, P, interpret=True)
        ref = ps.onehot_adjoint_xla(vals, pidx, P)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_negative_index_contributes_nowhere(self, rng):
        L, G, F, P = 2, 4, 128, 256
        vals = jnp.ones((L, G, F), jnp.float32)
        pidx = jnp.full((L, F), -1, jnp.int32)
        got = ps.onehot_adjoint_pallas(vals, pidx, P, interpret=True)
        assert float(jnp.abs(got).max()) == 0.0

    def test_bf16_dot_close(self, rng):
        L, G, F, P = 3, 30, 128, 512
        vals = jnp.asarray(rng.randn(L, G, F).astype(np.float32))
        pidx = jnp.asarray(rng.randint(0, P, (L, F)).astype(np.int32))
        got = ps.onehot_adjoint_pallas(vals, pidx, P, interpret=True,
                                       dot_dtype="bfloat16")
        ref = ps.onehot_adjoint_xla(vals, pidx, P)
        # one-hot is exact in bf16; values round to 8 mantissa bits
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-2, atol=1e-2)

    def test_accumulates_duplicate_indices(self):
        # several observations of the same point must sum
        vals = jnp.ones((1, 2, 128), jnp.float32)
        pidx = jnp.zeros((1, 128), jnp.int32)
        got = ps.onehot_adjoint_pallas(vals, pidx, 128, interpret=True)
        assert float(got[0, 0, 0]) == 128.0
        assert float(jnp.abs(got[0, :, 1:]).max()) == 0.0


class TestOnehotGather:
    def test_interpret_matches_reference(self, rng):
        G, P, L, F = 3, 260, 5, 130
        pts = jnp.asarray(rng.randn(G, P).astype(np.float32))
        pidx = jnp.asarray(rng.randint(-1, P, (L, F)).astype(np.int32))
        got = ps.onehot_gather_pallas(pts, pidx, interpret=True)
        ref = np.zeros((L, G, F), np.float32)
        pn = np.asarray(pts)
        for l in range(L):
            for f in range(F):
                if int(pidx[l, f]) >= 0:
                    ref[l, :, f] = pn[:, int(pidx[l, f])]
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6, atol=1e-6)

    def test_xla_fallback_matches(self, rng):
        G, P, L, F = 3, 512, 4, 128
        pts = jnp.asarray(rng.randn(G, P).astype(np.float32))
        pidx = jnp.asarray(rng.randint(-1, P, (L, F)).astype(np.int32))
        got = ps.onehot_gather(pts, pidx)  # cpu -> fallback
        ref = ps.onehot_gather_pallas(pts, pidx, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
