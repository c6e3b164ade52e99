"""Own-map loop detection + trigger recording (+ optional correction).

Reference behavior (`LoopClosing.cc`): loop candidates come from
`DetectNBestCandidates` excluding the query's covisible set, are verified by
descriptor matching + Sim3 RANSAC + projection gates (`DetectCommonRegionsFromBoW`,
`:644`) — but the actual intra-map correction is deliberately DISABLED
upstream: `CorrectLoop()` is commented out (`LoopClosing.cc:328-329`) and a
detected loop only records a trigger uuid (`Atlas::AddLoopClosureTrigger`,
`:339`); the loop benefit arrives through the merge machinery.

`LoopDetector` reproduces exactly that (record triggers, no correction) with
the same 3-consecutive-keyframe consistency gate (`:451,494`), and offers an
opt-in `correct=True` extension that runs the Sim3 essential-graph
optimization (`Optimizer::OptimizeEssentialGraph`) — OFF by default for
behavioral parity.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import lie
from ..mapping import map_state
from ..placerec import database, vocabulary
from . import merge as merge_mod
from . import pose_graph

CONSISTENCY_REQUIRED = 3  # LoopClosing.cc:451
MAX_MISSES = 2            # :462,501


def _detect_verdict(key, m, db, covis, q, kf_slot, K, with_scale):
    """Device-side detection verdict for ONE keyframe: candidate query +
    Sim3 geometric verification, packed into a [12] f32 row:
      [cand_ok, cand0, sim3_ok, n_inliers, S_ab(8)].
    Traced end-to-end (kf_slot is a traced index) so the caller can batch
    it under vmap and read the row back ASYNCHRONOUSLY — the host never
    blocks on the verdict (the round-3 agent loop paid 3-4 full pipeline
    syncs per keyframe here, serializing the whole in-flight autonomous
    chain behind each `bool(...)` pull)."""
    exclude = (covis[kf_slot] > 0).at[kf_slot].set(True)
    cand, okc = database.detect_candidates(db, q, exclude, covis, n=3)
    # Sim3 verify the best candidate unconditionally (it's off the critical
    # path); the host gates the verdict on cand_ok at fold time
    res = merge_mod.compute_sim3_between(
        key, m, kf_slot, m, cand[0], K, with_scale=with_scale
    )
    return jnp.concatenate([
        jnp.stack([okc[0].astype(jnp.float32),
                   cand[0].astype(jnp.float32),
                   res.ok.astype(jnp.float32),
                   res.n_inliers.astype(jnp.float32)]),
        res.S_ab.astype(jnp.float32),
    ])


@partial(jax.jit, static_argnames=("with_scale",))
def detect_verdict_batch(keys, m, db, covis, qs, kf_slots, K,
                         with_scale: bool = True):
    """[n] keyframes' detection verdicts in ONE dispatch -> [n,12]."""
    return jax.vmap(
        _detect_verdict, in_axes=(0, None, None, None, 0, 0, None, None)
    )(keys, m, db, covis, qs, kf_slots, K, with_scale)


class LoopDetector:
    def __init__(self, voc, K, correct: bool = False,
                 fix_scale: bool = False):
        self.voc = voc
        self.K = jnp.asarray(K)
        self.correct = correct
        # stereo/RGB-D/inertial maps are metric: loop Sim3 solved at s=1
        # (`LoopClosing.cc:785` mbFixScale)
        self.fix_scale = fix_scale
        self.triggers = []           # recorded trigger uuids (Atlas set)
        self._streak_target = None   # candidate region anchor kf
        self._streak = 0
        self._misses = 0
        self.key = jax.random.PRNGKey(77)

    def on_keyframe(self, m: map_state.MapState, meta, db, kf_slot: int):
        """Run loop detection for a new keyframe SYNCHRONOUSLY (dispatch +
        blocking fold). The production agent loop instead calls
        `detect_verdict_batch` itself and folds the row asynchronously
        (`SlamAgent._poll_protocol`). Returns (found, info)."""
        covis = map_state.covisibility(m)
        levels, idf = self.voc.device_arrays()
        q = vocabulary.bow_vector(
            levels, idf, m.kf_desc[kf_slot], m.kf_feat_valid[kf_slot],
            self.voc.branch, self.voc.n_words,
        )
        self.key, sub = jax.random.split(self.key)
        rows = detect_verdict_batch(
            sub[None], m, db, covis, q[None],
            jnp.asarray([kf_slot], jnp.int32), self.K,
            with_scale=not self.fix_scale,
        )
        return self.fold(np.asarray(rows)[0], meta, kf_slot)

    def fold(self, row, meta, kf_slot: int):
        """Host-side half of loop detection: apply one [12] verdict row
        (see `_detect_verdict`) to the 3-consecutive-keyframe consistency
        state (`LoopClosing.cc:451,494`). Rows must fold in keyframe order.
        Returns (found, info)."""
        cand_ok, cand0, sim3_ok = bool(row[0] > 0.5), int(row[1]), bool(row[2] > 0.5)
        if not cand_ok or not sim3_ok:
            self._note_miss()
            return False, None

        # 3-consecutive-keyframe consistency on the same region
        region = cand0
        if self._streak_target is not None and abs(region - self._streak_target) <= 10:
            self._streak += 1
        else:
            self._streak = 1
        self._streak_target = region
        self._misses = 0
        if self._streak < CONSISTENCY_REQUIRED:
            return False, None

        # loop confirmed: record the trigger (reference behavior)
        uuid = tuple(int(v) for v in meta.kf_uuid[kf_slot])
        self.triggers.append(uuid)
        info = {"kf": kf_slot, "match": cand0, "S": np.asarray(row[4:12])}
        self._streak = 0
        self._streak_target = None
        return True, info

    def _note_miss(self):
        if self._streak_target is not None:
            self._misses += 1
            if self._misses > MAX_MISSES:
                self._streak = 0
                self._streak_target = None
                self._misses = 0

    # -- opt-in correction (disabled-by-default extension) -----------------

    def correct_loop(self, m: map_state.MapState, kf_slot: int, match_slot: int,
                     S_loop, iters: int = 20):
        """Sim3 essential-graph correction: fix the matched (older) side,
        constrain kf_slot to the loop transform, optimize, propagate to
        points. Returns the corrected map."""
        K = m.kf_capacity
        covis = map_state.covisibility(m)
        parent = pose_graph.compute_spanning_tree(covis, np.asarray(m.kf_valid))
        ei, ej = pose_graph.build_essential_edges(
            covis, np.asarray(m.kf_valid), min_weight=30,
            spanning_parent=parent,
            extra_edges=[(int(kf_slot), int(match_slot))],
        )
        poses = jax.vmap(lie.sim3_from_se3)(m.kf_pose)
        meas = jax.vmap(lambda a, b: lie.sim3_mul(poses[a], lie.sim3_inv(poses[b])))(
            jnp.asarray(ei), jnp.asarray(ej)
        )
        # replace the loop edge's measurement with the Sim3 estimate:
        # S_kf_match = pose_kf . S_loop-ish; here S_loop is world-level B->A
        # with A==B==this map, i.e. the drift: constrain via corrected pose
        loop_idx = int(np.nonzero((ei == min(kf_slot, match_slot))
                                  & (ej == max(kf_slot, match_slot)))[0][0])
        Si_corr = lie.sim3_mul(poses[kf_slot], jnp.asarray(S_loop))
        a, b = int(ei[loop_idx]), int(ej[loop_idx])
        Sa = Si_corr if a == kf_slot else poses[a]
        Sb = Si_corr if b == kf_slot else poses[b]
        meas = meas.at[loop_idx].set(lie.sim3_mul(Sa, lie.sim3_inv(Sb)))

        fixed = jnp.zeros((K,), bool).at[match_slot].set(True).at[0].set(True)
        emask = jnp.ones((len(ei),), bool)
        new_poses, _ = pose_graph.optimize_pose_graph(
            poses, fixed, jnp.asarray(ei), jnp.asarray(ej), meas, emask, iters=iters
        )
        pts = pose_graph.correct_points(m.pt_pos, m.pt_ref_kf, m.pt_valid,
                                        poses, new_poses)
        return m._replace(
            kf_pose=jnp.where(m.kf_valid[:, None],
                              pose_graph.se3_from_sim3_poses(new_poses), m.kf_pose),
            pt_pos=pts,
        )
