"""ORB front-end tests: FAST vs a naive NumPy oracle, orientation/descriptor
invariances, and full-frame extraction."""

import numpy as np
import jax.numpy as jnp

from dvm_slam_tpu.ops import fast, pyramid, orb_descriptor
from dvm_slam_tpu.frontend import extractor


def naive_fast_mask(img, t, arc=9):
    """Oracle: dense FAST-9/16 segment test (no NMS)."""
    h, w = img.shape
    out = np.zeros((h, w), bool)
    offs = fast.RING_OFFSETS
    for y in range(fast.BORDER, h - fast.BORDER):
        for x in range(fast.BORDER, w - fast.BORDER):
            c = img[y, x]
            ring = np.array([img[y + dy, x + dx] for dx, dy in offs])
            for flags in (ring > c + t, ring < c - t):
                dd = np.concatenate([flags, flags])
                run, best = 0, 0
                for v in dd:
                    run = run + 1 if v else 0
                    best = max(best, run)
                if best >= arc:
                    out[y, x] = True
    return out


def synthetic_image(rng, h=120, w=160, n_blobs=40):
    """Image with gaussian blobs -> strong corners, plus mild noise."""
    img = np.zeros((h, w), np.float32)
    ys = rng.randint(20, h - 20, n_blobs)
    xs = rng.randint(20, w - 20, n_blobs)
    for y, x in zip(ys, xs):
        sz = rng.randint(3, 7)
        img[y - sz:y + sz, x - sz:x + sz] += rng.rand() * 150 + 50
    img += rng.rand(h, w).astype(np.float32) * 5
    return np.clip(img, 0, 255).astype(np.float32)


class TestFAST:
    def test_matches_naive_oracle(self, rng):
        img = synthetic_image(rng, 80, 100, 15)
        t = 20.0
        resp = np.asarray(fast.fast_response(jnp.asarray(img), t))
        oracle = naive_fast_mask(img, t)
        np.testing.assert_array_equal(resp > 0, oracle)

    def test_detect_level_returns_valid_corners(self, rng):
        img = synthetic_image(rng)
        xy, score, valid = fast.detect_level(jnp.asarray(img), 20.0, 7.0, 35, 200)
        assert int(valid.sum()) > 20
        xy, score, valid = map(np.asarray, (xy, score, valid))
        resp = np.asarray(fast.fast_response(jnp.asarray(img), 7.0))
        for p, s, v in zip(xy, score, valid):
            if v:
                assert resp[int(p[1]), int(p[0])] > 0

    def test_low_threshold_fallback(self, rng):
        """A cell whose only corner is weak must still yield it."""
        img = np.full((70, 70), 100.0, np.float32)
        img[30:40, 30:40] += 12.0  # contrast 12: above min_th=7, below ini_th=20
        xy, score, valid = fast.detect_level(jnp.asarray(img), 20.0, 7.0, 70, 50)
        assert int(valid.sum()) > 0

    def test_spatial_uniformity(self, rng):
        """Breadth-first cell filling: corners spread across cells, one
        dominant cluster can't hog the budget."""
        img = np.full((140, 140), 50.0, np.float32)
        # dense strong cluster in one cell, single corners elsewhere
        for y in range(30, 45, 4):
            for x in range(30, 45, 4):
                img[y - 1:y + 2, x - 1:x + 2] += 120
        img[100:108, 100:108] += 90
        img[100:108, 30:38] += 90
        xy, score, valid = fast.detect_level(jnp.asarray(img), 20.0, 7.0, 35, 3)
        xy = np.asarray(xy)[np.asarray(valid)]
        cells = set(map(tuple, (xy // 35).astype(int)))
        assert len(cells) >= 3  # budget spread over >= 3 distinct cells


class TestPyramid:
    def test_shapes(self):
        img = jnp.zeros((480, 752))
        lv = pyramid.build_pyramid(img, 8, 1.2)
        shapes = pyramid.level_shapes(480, 752, 8, 1.2)
        assert [l.shape for l in lv] == shapes
        assert lv[0].shape == (480, 752)

    def test_blur_preserves_constant(self):
        img = jnp.full((64, 64), 7.0)
        out = pyramid.gaussian_blur(img)
        np.testing.assert_allclose(out, 7.0, atol=1e-4)


class TestDescriptors:
    def test_rotation_changes_angle(self, rng):
        """Orientation must follow the intensity gradient direction."""
        img = np.zeros((64, 64), np.float32)
        img[:, 32:] = 200.0  # bright right half -> centroid points +x
        ang = orb_descriptor.orientations(jnp.asarray(img), jnp.array([[32.0, 32.0]]))
        assert abs(float(ang[0])) < 0.1
        img2 = np.zeros((64, 64), np.float32)
        img2[32:, :] = 200.0  # bright bottom -> +y
        ang2 = orb_descriptor.orientations(jnp.asarray(img2), jnp.array([[32.0, 32.0]]))
        assert abs(float(ang2[0]) - np.pi / 2) < 0.1

    def test_descriptor_deterministic(self, rng):
        img = jnp.asarray(synthetic_image(rng))
        xy = jnp.array([[40.0, 40.0], [60.0, 50.0]])
        ang = jnp.array([0.3, -1.0])
        d1 = orb_descriptor.descriptors(img, xy, ang)
        d2 = orb_descriptor.descriptors(img, xy, ang)
        np.testing.assert_array_equal(d1, d2)
        assert d1.shape == (2, 256)

    def test_descriptor_rotation_invariance(self, rng):
        """Steering: rotating image + angle by 90 deg keeps descriptor
        (up to small interpolation noise)."""
        img = synthetic_image(rng, 129, 129)
        imgj = jnp.asarray(img)
        rot = jnp.asarray(np.rot90(img, k=-1).copy())  # CW 90deg
        c = 64.0
        xy = jnp.array([[40.0, 30.0]])
        # point maps under CW rot90: (x,y) -> (W-1-y, x)
        xy_r = jnp.array([[128.0 - 30.0, 40.0]])
        ang = orb_descriptor.orientations(imgj, xy)
        ang_r = orb_descriptor.orientations(rot, xy_r)
        d = np.asarray(orb_descriptor.descriptors(imgj, xy, ang))
        d_r = np.asarray(orb_descriptor.descriptors(rot, xy_r, ang_r))
        ham = int(np.sum(d != d_r))
        assert ham < 40  # max 256; unrelated patches average ~128

    def test_pack_unpack_roundtrip(self, rng):
        bits = jnp.asarray((rng.rand(10, 256) > 0.5).astype(np.uint8))
        packed = orb_descriptor.pack_descriptors(bits)
        assert packed.shape == (10, 32)
        np.testing.assert_array_equal(orb_descriptor.unpack_descriptors(packed), bits)


class TestExtractor:
    def test_full_frame(self, rng):
        img = synthetic_image(rng, 240, 320, 80)
        cfg = extractor.FrontendConfig(height=240, width=320, n_features=500)
        f = extractor.extract(jnp.asarray(img), cfg)
        assert f.capacity == cfg.capacity
        nv = int(f.valid.sum())
        assert nv > 100
        xy = np.asarray(f.xy)[np.asarray(f.valid)]
        assert xy[:, 0].max() < 320 and xy[:, 1].max() < 240
        lv = np.asarray(f.level)[np.asarray(f.valid)]
        assert lv.min() == 0 and lv.max() >= 1  # multiple levels populated

    def test_make_frame_undistorts(self, rng):
        img = synthetic_image(rng, 240, 320, 60)
        cfg = extractor.FrontendConfig(height=240, width=320, n_features=300)
        K = jnp.array([250.0, 250.0, 160.0, 120.0])
        dist = jnp.array([-0.3, 0.08, 0.0, 0.0])
        f = extractor.make_frame(jnp.asarray(img), K, dist, cfg)
        v = np.asarray(f.valid)
        assert (np.abs(np.asarray(f.xy)[v] - np.asarray(f.xy_raw)[v]).sum(1) > 0).any()
