"""Vocabulary scale curve: retrieval precision vs n_words (10^3..10^5).

The reference leans on a ~10^6-word ORBvoc (`orb_slam3/Thirdparty/DBoW2/`,
shipped as a large blob); this framework trains its own tree
(`placerec/vocabulary.py`) and ships a 10^4-word default. This benchmark
quantifies what vocabulary scale buys on the two retrieval tasks the system
actually performs, so the default is a measured choice, not a guess
(VERDICT r3/r4 stretch item):

  1. synthetic-aliased top-1 precision: 48 places sampled from TWO textured
     worlds that share texture statistics, queried from perturbed viewpoints
     (the test_placerec.py task, 4x more places), plus the top1/top2 score
     margin (the merge gate thresholds on relative score, 0.9x-baseline).
  2. mini-EuRoC revisit: real imagery, query each frame of the second half
     against the first half; a hit is a retrieved frame whose ground-truth
     position is within 0.5 m of the query's.

Vocabularies are trained on a descriptor corpus DISJOINT from both query
sets (different world seeds): ~200k descriptors, branch 10, depth 3/4/5.

Run: python benchmarks/vocab_scale.py            (CPU is fine; ~15 min)
Output: one JSON line per vocabulary + a final summary line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures", "mini_euroc")


def main():
    import jax
    import jax.numpy as jnp

    from dvm_slam_tpu.frontend.extractor import FrontendConfig, make_frame
    from dvm_slam_tpu.geometry import lie
    from dvm_slam_tpu.io import datasets, synthetic
    from dvm_slam_tpu.placerec import database, vocabulary

    fc = FrontendConfig(height=180, width=240, n_features=400, n_levels=4)
    K = jnp.asarray([200.0, 200.0, 120.0, 90.0])

    def render_place(world, cx, cz, dx=0.0, dyaw=0.0):
        q = np.asarray(lie.so3_exp(jnp.asarray([0.0, dyaw, 0.0], jnp.float32)))
        c = np.array([cx + dx, 0.0, cz], np.float32)
        T_cw = lie.se3_inv(jnp.asarray(np.concatenate([q, c]).astype(np.float32)))
        return world.render(T_cw, K, 180, 240)

    def frame_of(img):
        """(desc, valid) — extraction is vocabulary-independent, so every
        frame is extracted ONCE and only bow_vector re-runs per vocab."""
        f = make_frame(img, K, jnp.zeros(4), fc)
        return f.desc, f.valid

    # ---- training corpus: synthetic worlds DISJOINT from the eval seeds ---
    t0 = time.perf_counter()
    corpus = []
    for seed in (101, 202, 303, 404):
        w = synthetic.PlaneWorld(seed=seed, tex_size=2048, plane_z=6.0,
                                 extent=60.0)
        for i in range(40):
            img = render_place(w, -21 + 7 * (i % 6), -4.0 - 4.0 * (i // 6),
                               dx=0.13 * (i % 3), dyaw=0.02 * (i % 5))
            d, v = frame_of(img)
            corpus.append(np.asarray(d)[np.asarray(v)])
    # plus the real fixture frames (db half AND query half: a deployed vocab
    # has seen imagery like what it retrieves)
    seq = datasets.load_euroc(FIXTURE)
    real_frames = [frame_of(datasets._read_gray(p).astype(np.float32))
                   for p in seq.paths]
    corpus += [np.asarray(d)[np.asarray(v)]
               for d, v in real_frames[: len(real_frames) // 2]]
    corpus = np.concatenate(corpus, axis=0)
    print(json.dumps({"corpus_descs": int(corpus.shape[0]),
                      "extract_s": round(time.perf_counter() - t0, 1)}),
          flush=True)

    # ---- eval set 1: synthetic aliased places (2 worlds x 24 places) ------
    eval_worlds = [synthetic.PlaneWorld(seed=s, tex_size=2048, plane_z=6.0,
                                        extent=60.0) for s in (11, 12)]
    places = [(w, -21 + 7 * (i % 6), -4.0 - 5.0 * (i // 6))
              for w in eval_worlds for i in range(24)]
    place_frames = [frame_of(render_place(w, x, z)) for w, x, z in places]
    query_frames = [frame_of(render_place(w, x, z, dx=0.35, dyaw=0.04))
                    for w, x, z in places]

    # ---- gt positions for the real-revisit task ----------------------------
    gt = np.loadtxt(os.path.join(FIXTURE, "gt_tum.txt"), comments="#")
    # nearest-timestamp association (stamps are seconds in both files)
    pos = np.array([gt[np.argmin(np.abs(gt[:, 0] - float(ts))), 1:4]
                    for ts in seq.stamps])
    half = len(seq) // 2

    rows = []
    for depth in (3, 4, 5):
        t0 = time.perf_counter()
        voc = vocabulary.train(corpus, branch=10, depth=depth, seed=0)
        train_s = time.perf_counter() - t0
        lv, idf = voc.device_arrays()

        def bow_of(frame):
            d, v = frame
            return vocabulary.bow_vector(lv, idf, d, v,
                                         voc.branch, voc.n_words)

        def db_scores(dbx, q):
            s = np.asarray(vocabulary.l1_score(q, dbx.bow))
            s[~np.asarray(dbx.valid)] = -np.inf
            return s

        # task 1: synthetic aliased top-1 + margin
        n = len(places)
        db = database.create(n, voc.n_words)
        for i, fr in enumerate(place_frames):
            db = database.add(db, jnp.int32(i), bow_of(fr))
        hits, margins = 0, []
        t0 = time.perf_counter()
        for i, fr in enumerate(query_frames):
            scores = db_scores(db, bow_of(fr))
            order = np.argsort(-scores)
            if order[0] == i:
                hits += 1
            margins.append(float(scores[order[0]] /
                                 max(float(scores[order[1]]), 1e-9)))
        syn_q_ms = (time.perf_counter() - t0) / n * 1e3
        syn_precision = hits / n

        # task 2: real-imagery revisit (second half queries first half)
        db2 = database.create(half, voc.n_words)
        for i in range(half):
            db2 = database.add(db2, jnp.int32(i), bow_of(real_frames[i]))
        r_hits, r_n = 0, 0
        for i in range(half, len(seq)):
            # only query frames that HAVE a true neighbor in the db half
            d = np.linalg.norm(pos[:half] - pos[i], axis=1)
            if d.min() > 0.5:
                continue
            j = int(np.argmax(db_scores(db2, bow_of(real_frames[i]))))
            r_n += 1
            if np.linalg.norm(pos[j] - pos[i]) <= 0.5:
                r_hits += 1
        real_precision = r_hits / max(r_n, 1)

        row = {
            "n_words": voc.n_words, "depth": depth, "branch": 10,
            "train_s": round(train_s, 1),
            "syn_top1_precision": round(syn_precision, 3),
            "syn_margin_p50": round(float(np.median(margins)), 3),
            "real_revisit_precision": round(real_precision, 3),
            "real_queries": r_n,
            "bow_query_ms": round(syn_q_ms, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    best = max(rows, key=lambda r: (r["syn_top1_precision"]
                                    + r["real_revisit_precision"]))
    print(json.dumps({"summary": rows, "best_n_words": best["n_words"]}),
          flush=True)


if __name__ == "__main__":
    main()
