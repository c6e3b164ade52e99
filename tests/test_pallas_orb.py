"""Pallas fused orientation+descriptor kernel: interpret-mode equivalence
with the XLA reference path (CPU-runnable)."""

import numpy as np
import jax.numpy as jnp

from dvm_slam_tpu.ops import orb_descriptor, pallas_orb, pyramid


class TestPallasOrb:
    def test_equivalent_to_xla_path(self, rng):
        img = jnp.asarray(rng.rand(120, 160).astype(np.float32) * 255)
        blur = pyramid.gaussian_blur(img)
        xy = jnp.asarray(
            np.stack([rng.randint(20, 140, 24), rng.randint(20, 100, 24)], -1)
            .astype(np.float32)
        )
        ang_p, desc_p = pallas_orb.orient_and_describe(img, blur, xy, interpret=True)
        ang_x = orb_descriptor.orientations(img, xy)
        desc_x = orb_descriptor.descriptors(blur, xy, ang_x)
        np.testing.assert_allclose(ang_p, ang_x, atol=2e-3)  # f32 sum order
        # bit mismatches only from f32 summation-order at rotation-rounding
        # boundaries: must stay well below 1%
        mismatch = float((np.asarray(desc_p) != np.asarray(desc_x)).mean())
        assert mismatch < 0.01, f"{mismatch:.4f} fraction of bits differ"

    def test_clamped_keypoints_safe(self, rng):
        img = jnp.asarray(rng.rand(96, 128).astype(np.float32) * 255)
        blur = pyramid.gaussian_blur(img)
        xy = jnp.asarray([[0.0, 0.0], [127.0, 95.0], [64.0, 48.0]])
        ang, desc = pallas_orb.orient_and_describe(img, blur, xy, interpret=True)
        assert bool(jnp.all(jnp.isfinite(ang)))
        assert desc.shape == (3, 256)
