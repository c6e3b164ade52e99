"""Vocabulary tree + keyframe database (place recognition) tests."""

import numpy as np
import jax.numpy as jnp

from dvm_slam_tpu.placerec import vocabulary, database


def rand_desc(rng, n):
    return (rng.rand(n, 256) > 0.5).astype(np.uint8)


def perturb(rng, d, flips=10):
    out = d.copy()
    for i in range(out.shape[0]):
        ix = rng.choice(256, flips, replace=False)
        out[i, ix] ^= 1
    return out


class TestVocabulary:
    def test_train_and_transform(self, rng):
        descs = rand_desc(rng, 2000)
        voc = vocabulary.train(descs, branch=5, depth=2, seed=0)
        assert voc.n_words == 25
        levels, idf = voc.device_arrays()
        words = vocabulary.transform_words(
            levels, jnp.asarray(descs[:64]), jnp.ones(64, bool), voc.branch
        )
        w = np.asarray(words)
        assert (w >= 0).all() and (w < 25).all()
        assert len(np.unique(w)) > 3  # spread over words

    def test_perturbed_descriptor_same_word(self, rng):
        descs = rand_desc(rng, 3000)
        voc = vocabulary.train(descs, branch=5, depth=2, seed=1)
        levels, idf = voc.device_arrays()
        base = descs[:100]
        noisy = perturb(rng, base, flips=5)
        w1 = np.asarray(vocabulary.transform_words(levels, jnp.asarray(base), jnp.ones(100, bool), 5))
        w2 = np.asarray(vocabulary.transform_words(levels, jnp.asarray(noisy), jnp.ones(100, bool), 5))
        assert (w1 == w2).mean() > 0.6  # small perturbations mostly stable

    def test_bow_vector_normalized(self, rng):
        descs = rand_desc(rng, 1000)
        voc = vocabulary.train(descs, branch=5, depth=2)
        levels, idf = voc.device_arrays()
        bow = vocabulary.bow_vector(levels, idf, jnp.asarray(descs[:50]), jnp.ones(50, bool), 5, 25)
        np.testing.assert_allclose(float(jnp.sum(jnp.abs(bow))), 1.0, atol=1e-5)

    def test_invalid_descriptors_ignored(self, rng):
        descs = rand_desc(rng, 500)
        voc = vocabulary.train(descs, branch=5, depth=2)
        levels, idf = voc.device_arrays()
        valid = jnp.asarray(np.arange(50) < 25)
        b1 = vocabulary.bow_vector(levels, idf, jnp.asarray(descs[:50]), valid, 5, 25)
        b2 = vocabulary.bow_vector(levels, idf, jnp.asarray(descs[:25]), jnp.ones(25, bool), 5, 25)
        np.testing.assert_allclose(b1, b2, atol=1e-6)

    def test_save_load_roundtrip(self, rng, tmp_path):
        descs = rand_desc(rng, 500)
        voc = vocabulary.train(descs, branch=4, depth=2)
        p = str(tmp_path / "voc.npz")
        vocabulary.save(voc, p)
        voc2 = vocabulary.load(p)
        assert voc2.branch == 4 and voc2.depth == 2
        for a, b in zip(voc.levels, voc2.levels):
            np.testing.assert_array_equal(a, b)


def make_db(rng, voc, kf_descs):
    levels, idf = voc.device_arrays()
    db = database.create(len(kf_descs) + 4, voc.n_words)
    for i, d in enumerate(kf_descs):
        bow = vocabulary.bow_vector(levels, idf, jnp.asarray(d), jnp.ones(d.shape[0], bool), voc.branch, voc.n_words)
        db = database.add(db, jnp.int32(i), bow)
    return db


class TestDatabase:
    def _setup(self, rng, n_kf=8, n_feat=80):
        pool = rand_desc(rng, 4000)
        voc = vocabulary.train(pool, branch=10, depth=2, seed=2)
        # realistic structure: consecutive keyframes see half the same
        # landmarks (they are covisible), each KF adds new ones
        kf_descs = [rand_desc(rng, n_feat)]
        for _ in range(n_kf - 1):
            prev = kf_descs[-1]
            kf_descs.append(
                np.concatenate([prev[n_feat // 2:], rand_desc(rng, n_feat // 2)])
            )
        db = make_db(rng, voc, kf_descs)
        covis = np.zeros((n_kf + 4, n_kf + 4), np.int32)
        for i in range(n_kf - 1):  # chain covisibility
            covis[i, i + 1] = covis[i + 1, i] = 30
        return voc, kf_descs, db, jnp.asarray(covis)

    def test_same_place_high_score(self, rng):
        voc, kf_descs, db, covis = self._setup(rng)
        levels, idf = voc.device_arrays()
        # query = noisy copy of KF 3's descriptors
        noisy = perturb(rng, kf_descs[3], flips=8)
        q = vocabulary.bow_vector(levels, idf, jnp.asarray(noisy), jnp.ones(noisy.shape[0], bool), voc.branch, voc.n_words)
        acc, s, el = database.accumulated_scores(db, q, jnp.zeros(db.valid.shape, bool), covis)
        assert int(jnp.argmax(s)) == 3

    def test_merge_possibility_true_for_overlap(self, rng):
        voc, kf_descs, db, covis = self._setup(rng)
        levels, idf = voc.device_arrays()
        noisy = perturb(rng, kf_descs[5], flips=8)
        q = vocabulary.bow_vector(levels, idf, jnp.asarray(noisy), jnp.ones(noisy.shape[0], bool), voc.branch, voc.n_words)
        ok, best, score, baseline = database.detect_merge_possibility(db, q, covis)
        assert bool(ok)
        assert int(best) == 5

    def test_merge_possibility_false_for_unrelated(self, rng):
        voc, kf_descs, db, covis = self._setup(rng)
        levels, idf = voc.device_arrays()
        other = rand_desc(rng, 80)  # unrelated place
        q = vocabulary.bow_vector(levels, idf, jnp.asarray(other), jnp.ones(80, bool), voc.branch, voc.n_words)
        ok, best, score, baseline = database.detect_merge_possibility(db, q, covis)
        assert not bool(ok)

    def test_detect_candidates_excludes(self, rng):
        voc, kf_descs, db, covis = self._setup(rng)
        levels, idf = voc.device_arrays()
        noisy = perturb(rng, kf_descs[3], flips=8)
        q = vocabulary.bow_vector(levels, idf, jnp.asarray(noisy), jnp.ones(noisy.shape[0], bool), voc.branch, voc.n_words)
        exclude = jnp.zeros(db.valid.shape, bool).at[3].set(True)
        idx, ok = database.detect_candidates(db, q, exclude, covis, n=3)
        assert 3 not in np.asarray(idx)[np.asarray(ok)]


class TestPrecisionRecallUnderAliasing:
    """Loop/merge detection quality with perceptually-aliased distractors:
    many places sampled from ONE textured world (shared texture statistics),
    queried with revisit frames from perturbed viewpoints. Quantifies what
    the shipped vocabulary buys (the reference leans on a 10^6-word ORBvoc;
    `KeyFrameDatabase.cc:555-640`)."""

    def _render_place(self, world, K, center_x, center_z, dx=0.0, dyaw=0.0):
        import jax.numpy as jnp
        from dvm_slam_tpu.geometry import lie
        import jax

        q = np.asarray(lie.so3_exp(jnp.asarray([0.0, dyaw, 0.0], jnp.float32)))
        c = np.array([center_x + dx, 0.0, center_z], np.float32)
        T_wc = np.concatenate([q, c]).astype(np.float32)
        T_cw = lie.se3_inv(jnp.asarray(T_wc))
        return world.render(T_cw, K, 180, 240)

    def test_top1_precision_on_revisits(self):
        import jax.numpy as jnp
        from dvm_slam_tpu.frontend.extractor import FrontendConfig, make_frame
        from dvm_slam_tpu.io import synthetic
        from dvm_slam_tpu.placerec import database, vocabulary

        voc = vocabulary.load_default()
        assert voc.n_words >= 1000
        lv, idf = voc.device_arrays()
        fc = FrontendConfig(height=180, width=240, n_features=400, n_levels=4)
        K = jnp.asarray([200.0, 200.0, 120.0, 90.0])
        world = synthetic.PlaneWorld(seed=11, tex_size=2048, plane_z=6.0,
                                     extent=60.0)

        # 12 places on a grid inside one world (aliased texture statistics);
        # both rows keep the textured plane (z=6) fully in view
        places = [(-21 + 7 * (i % 6), -4.0 - 5.0 * (i // 6)) for i in range(12)]
        n = len(places)
        db = database.create(n, voc.n_words)

        def bow_of(img):
            f = make_frame(img, K, jnp.zeros(4), fc)
            return vocabulary.bow_vector(lv, idf, f.desc, f.valid,
                                         voc.branch, voc.n_words)

        for i, (x, z) in enumerate(places):
            img = self._render_place(world, K, x, z)
            db = database.add(db, jnp.int32(i), bow_of(img))

        covis = jnp.zeros((n, n), jnp.int32)
        exclude = jnp.zeros((n,), bool)
        hits = 0
        for i, (x, z) in enumerate(places):
            img = self._render_place(world, K, x, z, dx=0.35, dyaw=0.04)
            q = bow_of(img)
            idx, ok = database.detect_candidates(db, q, exclude, covis, n=1)
            if bool(ok[0]) and int(idx[0]) == i:
                hits += 1
        precision = hits / n
        assert precision >= 0.9, f"top-1 revisit precision {precision}"

    def test_merge_gate_rejects_unseen_place(self):
        import jax.numpy as jnp
        from dvm_slam_tpu.frontend.extractor import FrontendConfig, make_frame
        from dvm_slam_tpu.io import synthetic
        from dvm_slam_tpu.mapping import map_state
        from dvm_slam_tpu.placerec import database, vocabulary

        voc = vocabulary.load_default()
        lv, idf = voc.device_arrays()
        fc = FrontendConfig(height=180, width=240, n_features=400, n_levels=4)
        K = jnp.asarray([200.0, 200.0, 120.0, 90.0])
        world = synthetic.PlaneWorld(seed=11, tex_size=2048, plane_z=6.0,
                                     extent=60.0)
        other = synthetic.PlaneWorld(seed=77, tex_size=2048, plane_z=6.0,
                                     extent=60.0)

        def bow_of(w, x, z, dx=0.0):
            img = self._render_place(w, K, x, z, dx=dx)
            f = make_frame(img, K, jnp.zeros(4), fc)
            return vocabulary.bow_vector(lv, idf, f.desc, f.valid,
                                         voc.branch, voc.n_words)

        # db shaped like a real map: CONSECUTIVE keyframes along a path
        # (overlapping views) so the best match has own-map support and the
        # baseline score is meaningful — the gate compares a foreign match
        # against that baseline (`KeyFrameDatabase.cc` DetectMergePossibility)
        n = 8
        db = database.create(n, voc.n_words)
        for i in range(n):
            db = database.add(db, jnp.int32(i), bow_of(world, -2 + 0.6 * i, -4.0))
        covis = jnp.zeros((n, n), jnp.int32)

        # a true revisit passes the 0.9x-baseline gate
        ok_true, _, s_t, b_t = database.detect_merge_possibility(
            db, bow_of(world, -2, -4.0, dx=0.25), covis)
        # a frame from a DIFFERENT world does not
        ok_false, _, s_f, b_f = database.detect_merge_possibility(
            db, bow_of(other, 0.0, -4.0), covis)
        assert bool(ok_true), (float(s_t), float(b_t))
        assert not bool(ok_false), (float(s_f), float(b_f))
