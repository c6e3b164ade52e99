"""Relocalization: recover a lost tracker from place recognition + PnP.

TPU-native `Tracking::Relocalization` (`orb_slam3/src/Tracking.cc:3276`):
BoW relocalization candidates from the keyframe database
(`KeyFrameDatabase::DetectRelocalizationCandidates`, `KeyFrameDatabase.cc:810`),
descriptor matching of the lost frame against each candidate keyframe's map
points, vectorized RANSAC PnP (replacing MLPnP), and pose-only GN refinement;
accepted above an inlier floor.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import pnp
from ..mapping import map_state
from ..ops import matching
from ..placerec import database, vocabulary
from . import pose_opt

MIN_RELOC_INLIERS = 30


class RelocalizationService:
    """Owns the vocabulary + BoW database needed for relocalization; can be
    shared with an agent's existing database or self-maintained (it registers
    BoWs for any valid keyframes it hasn't seen)."""

    def __init__(self, voc, K, sigma2, db=None, kf_cap: int = 0):
        self.voc = voc
        self.K = jnp.asarray(K)
        self.sigma2 = tuple(sigma2)
        self._own_db = db is None
        self.db = db if db is not None else database.create(kf_cap, voc.n_words)
        self._slots = set()
        self.key = jax.random.PRNGKey(4242)

    def reset(self, kf_cap: int):
        """Clear the database (called when the tracker starts a new submap)."""
        if self._own_db:
            self.db = database.create(kf_cap, self.voc.n_words)
            self._slots = set()

    def _refresh(self, m):
        if not self._own_db:
            return
        import numpy as np

        levels, idf = self.voc.device_arrays()
        n = int(m.n_kf)
        valid = np.asarray(m.kf_valid[:n])
        for slot in range(n):
            if slot in self._slots or not valid[slot]:
                continue
            bow = vocabulary.bow_vector(
                levels, idf, m.kf_desc[slot], m.kf_feat_valid[slot],
                self.voc.branch, self.voc.n_words,
            )
            self.db = database.add(self.db, jnp.int32(slot), bow)
            self._slots.add(slot)

    def __call__(self, m, frame):
        """Returns (ok, T_cw or None, n_inliers)."""
        self._refresh(m)
        covis = map_state.covisibility(m)
        self.key, sub = jax.random.split(self.key)
        return relocalize(sub, m, self.db, covis, self.voc, frame,
                          self.K, self.sigma2)


@partial(jax.jit, static_argnames=("sigma2",))
def _match_and_pnp(key, m, kf_slot, frame_xy, frame_desc, frame_level,
                   frame_valid, K, sigma2):
    """Match a frame against one candidate keyframe's map points, solve PnP,
    refine. Returns (T, n_inliers)."""
    obs = m.kf_obs[kf_slot]
    has_pt = (obs >= 0) & m.kf_feat_valid[kf_slot]
    psl = jnp.clip(obs, 0)
    pt_desc = m.pt_desc[psl]
    dist = matching.hamming_matrix(pt_desc, frame_desc)
    mask = has_pt[:, None] & frame_valid[None, :]
    idx, dd, ok = matching.masked_best_match(dist, mask, matching.TH_LOW, ratio=0.75)
    ok = matching.dedupe_matches(idx, ok, frame_desc.shape[0])
    j = jnp.clip(idx, 0)
    X = m.pt_pos[psl]
    uv = frame_xy[j]
    T0, inl0, cnt0 = pnp.ransac_pnp(key, X, uv, ok, K, num_hypotheses=128)
    sig = jnp.asarray(sigma2)[frame_level[j]]
    T, inl, _ = pose_opt.pose_optimization(T0, X, uv, sig, inl0, K)
    return T, jnp.sum(inl)


def relocalize(key, m: map_state.MapState, db, covis, voc, frame, K,
               sigma2, exclude=None, n_candidates: int = 3):
    """Try to relocalize `frame` against the map. Returns (ok, T_cw, inliers).
    Host loop over the (few) candidates; each attempt is one fused program."""
    levels, idf = voc.device_arrays()
    q = vocabulary.bow_vector(levels, idf, frame.desc, frame.valid,
                              voc.branch, voc.n_words)
    if exclude is None:
        exclude = jnp.zeros(db.valid.shape, bool)
    cand, ok = database.detect_candidates(db, q, exclude, covis, n=n_candidates)
    best = (False, None, 0)
    for i in range(n_candidates):
        if not bool(ok[i]):
            continue
        key, sub = jax.random.split(key)
        T, n = _match_and_pnp(
            sub, m, cand[i], frame.xy, frame.desc, frame.level, frame.valid,
            K, tuple(sigma2),
        )
        n = int(n)
        if n > best[2]:
            best = (n >= MIN_RELOC_INLIERS, T, n)
        if best[0]:
            break
    return best
