"""Atlas: multi-submap container with merge-back.

The reference's `Atlas` (`orb_slam3/src/Atlas.cc`) keeps multiple maps: when
tracking is irrecoverably LOST, `Tracking::CreateMapInAtlas`
(`Tracking.cc:2409`) stashes the active map and starts a fresh one; later,
place recognition across the whole atlas lets `LoopClosing` merge the active
map into a stored one. This host-side Atlas reproduces that flow on top of
MapState + the merge machinery:

  * `stash_active` — park the current (map, meta, BoW slots) as inactive
  * `try_merge_back` — BoW-match a new keyframe of the active map against
    every inactive map's database; on a geometric Sim3 verification, splice
    the active map INTO the stored one (the stored map's frame wins, like
    the reference keeping the big-map frame) and make the result active.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..loopclosing import merge as merge_mod
from ..placerec import database, vocabulary
from . import local_mapping, map_state


@dataclasses.dataclass
class StoredMap:
    m: map_state.MapState
    meta: map_state.MapMeta
    db: database.BowDatabase
    kf_timestamps: dict
    covis: object = None  # covisibility, computed once at stash (immutable)


class Atlas:
    def __init__(self, voc, K, fc, agent_id: int = 0,
                 fix_scale: bool = False):
        self.voc = voc
        self.K = jnp.asarray(K)
        self.fc = fc
        self.agent_id = agent_id
        # metric maps (stereo/RGB-D/inertial): merge-back Sim3 at s=1
        # (`Sim3Solver` bFixScale, `LoopClosing.cc:785`)
        self.fix_scale = fix_scale
        self.inactive: List[StoredMap] = []
        self.key = jax.random.PRNGKey(31337)
        # DVM merge registry (Atlas.h:154-166) + loop triggers (Atlas.cc:442)
        self.merged_agent_ids: List[int] = []
        self.merged_agent_sim3: dict = {}
        self.loop_closure_triggers: set = set()

    # -- DVM registry (merge bookkeeping used by the wrapper) --------------
    def add_successfully_merged(self, agent_id: int, S):
        if agent_id not in self.merged_agent_ids:
            self.merged_agent_ids.append(agent_id)
        self.merged_agent_sim3[agent_id] = np.asarray(S)

    def add_loop_closure_trigger(self, uuid):
        self.loop_closure_triggers.add(tuple(int(v) for v in np.asarray(uuid).reshape(-1)))

    # -- submap management ---------------------------------------------------

    def _build_db(self, m):
        levels, idf = self.voc.device_arrays()
        db = database.create(m.kf_capacity, self.voc.n_words)
        n = int(m.n_kf)
        valid = np.asarray(m.kf_valid[:n])
        for slot in range(n):
            if not valid[slot]:
                continue
            bow = vocabulary.bow_vector(
                levels, idf, m.kf_desc[slot], m.kf_feat_valid[slot],
                self.voc.branch, self.voc.n_words,
            )
            db = database.add(db, jnp.int32(slot), bow)
        return db

    def stash_active(self, m, meta, kf_timestamps):
        """Park the current map (CreateMapInAtlas's 'store current map').
        Stored maps are immutable, so the covisibility used by merge-back
        scoring is computed ONCE here instead of on every new keyframe."""
        self.inactive.append(StoredMap(
            m=m, meta=meta, db=self._build_db(m),
            kf_timestamps=dict(kf_timestamps),
            covis=map_state.covisibility(m),
        ))

    def try_merge_back(self, m_active, meta_active, query_slot: int):
        """Attempt to weld the active map into a stored one via the query
        keyframe. Returns None or (merged_map, merged_meta, kf_map,
        S_ab [8] Sim3 active->stored, stored_kf_timestamps)."""
        levels, idf = self.voc.device_arrays()
        q = vocabulary.bow_vector(
            levels, idf, m_active.kf_desc[query_slot],
            m_active.kf_feat_valid[query_slot],
            self.voc.branch, self.voc.n_words,
        )
        for si, stored in enumerate(self.inactive):
            covis = stored.covis if stored.covis is not None \
                else map_state.covisibility(stored.m)
            ok, best, score, baseline = database.detect_merge_possibility(
                stored.db, q, covis
            )
            if not bool(ok):
                continue
            self.key, sub = jax.random.split(self.key)
            res = merge_mod.compute_sim3_between(
                sub, stored.m, jnp.int32(int(best)),
                m_active, jnp.int32(query_slot), self.K,
                with_scale=not self.fix_scale,
            )
            if not bool(res.ok):
                continue
            merged, meta, kf_map, pt_map = merge_mod.merge_maps(
                stored.m, stored.meta, m_active, meta_active, res.S_ab
            )
            merged = local_mapping.fuse_duplicates(
                merged, jnp.int32(int(best)), self.K, n_neighbors=5,
                n_levels=self.fc.n_levels, scale_factor=self.fc.scale_factor,
            )
            merged, _ = local_mapping.local_ba(
                merged, jnp.int32(int(best)), self.K,
                n_local=12, n_fixed=8, n_pts=2048, iters=6,
                n_levels=self.fc.n_levels, scale_factor=self.fc.scale_factor,
            )
            ts = dict(stored.kf_timestamps)
            self.inactive.pop(si)
            return merged, meta, kf_map, np.asarray(res.S_ab), ts
        return None
