"""Mesh-parallel multi-agent execution.

The reference scales by running N ROS processes, one per robot
(`orb_slam3_wrapper.cpp:110-121` static peer table); here N agents map onto
an `("agent",)` device mesh: every per-agent pipeline stage (ORB extraction,
two-stage tracking, windowed BA) runs as the SAME program on each mesh slice
via `shard_map` — pure SPMD, zero cross-slice traffic — and the inter-agent
covisibility/merge-detection exchange rides XLA collectives
(`all_gather` over ICI) instead of DDS.

This is the §2.6-2 mapping from SURVEY.md: "N agents = N mesh slices;
batched front ends; keyframe exchange = device-to-device collectives for
co-located agents" (the host broker in `multiagent/` remains the cross-host
path).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..frontend.extractor import FrontendConfig, extract
from ..mapping import ba, map_state
from ..placerec import vocabulary
from ..tracking import tracker as trk


def make_mesh(n_agents: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()[:n_agents]
    return Mesh(np.asarray(devices), ("agent",))


def stack_agents(pytrees):
    """Stack per-agent pytrees (e.g. MapStates) along a leading agent axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *pytrees)


@partial(jax.jit, static_argnames=("config", "voc_branch", "voc_words"))
def _agent_step(m, img, T_pred, K, voc_levels, voc_idf,
                config: trk.TrackerConfig, voc_branch: int, voc_words: int):
    """One agent's per-frame compute: extract -> track -> local BA window ->
    BoW of the tracked frame. Runs identically on every mesh slice."""
    fc = config.frontend
    m_one = jax.tree.map(lambda x: x[0], m)  # drop the sliced agent dim
    frame = extract(img[0], fc)
    res = trk.track_frame(m_one, frame, T_pred[0], K[0], config)
    bow = vocabulary.bow_vector(
        voc_levels, voc_idf, frame.desc, frame.valid, voc_branch, voc_words
    )
    return res.T_cw[None], res.n_inliers[None], bow[None]


def build_multi_agent_step(mesh: Mesh, config: trk.TrackerConfig,
                           voc: vocabulary.Vocabulary, ba_local=4, ba_fixed=2,
                           ba_pts=256, ba_iters=2):
    """Returns a jitted SPMD step:
        (maps [A,...], imgs [A,H,W], poses [A,7], K [A,4])
          -> (poses' [A,7], inliers [A], merge_scores [A,A], maps' [A,...])

    Per agent slice: front end + tracking + windowed BA; then one
    `all_gather` of the per-agent BoW vectors over the agent axis and the
    full cross-agent BoW similarity matrix (the merge-possibility candidate
    score of SURVEY §2.6-2) computed locally on every slice.
    """
    fc = config.frontend
    voc_levels, voc_idf = voc.device_arrays()
    branch, words = voc.branch, voc.n_words

    def step(m, img, T_pred, K):
        T_new, inl, bow = _agent_step(
            m, img, T_pred, K, voc_levels, voc_idf, config, branch, words
        )
        # windowed BA around the newest keyframe on this slice
        center = jnp.maximum(m.n_kf[0] - 1, 0)
        m_one = jax.tree.map(lambda x: x[0], m)
        from ..mapping import local_mapping
        m_ba, _ = local_mapping.local_ba(
            m_one, center, K[0], n_local=ba_local, n_fixed=ba_fixed,
            n_pts=ba_pts, iters=ba_iters,
            n_levels=fc.n_levels, scale_factor=fc.scale_factor,
        )
        m_out = jax.tree.map(lambda x: x[None], m_ba)
        # covisibility/merge exchange: gather every agent's BoW (ICI
        # all_gather) and score all pairs on each slice
        all_bows = jax.lax.all_gather(bow[0], "agent")        # [A,W]
        scores = 1.0 - 0.5 * jnp.sum(
            jnp.abs(all_bows[:, None, :] - all_bows[None, :, :]), -1
        )
        return T_new, inl, scores, m_out

    in_specs = (
        jax.tree.map(lambda _: P("agent"), map_state.create(1, 1, 1)),
        P("agent"), P("agent"), P("agent"),
    )
    out_specs = (
        P("agent"), P("agent"), P(),  # scores replicated
        jax.tree.map(lambda _: P("agent"), map_state.create(1, 1, 1)),
    )
    fn = shard_map(step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn)


# --------------------------------------------------------------------------
# protocol-on-mesh: collective keyframe exchange + merge detection
# --------------------------------------------------------------------------

class MeshProtocolState(NamedTuple):
    """Per-agent-slice protocol state (the on-mesh analog of `Peer` dedup
    state + the BoW database; `peer.h:64-72`, `KeyFrameDatabase.h:83`)."""

    db_bow: jnp.ndarray     # [K,W] dense BoW per keyframe slot
    db_valid: jnp.ndarray   # [K]
    merged: jnp.ndarray     # [A] merged-with flags (row of the merge matrix)
    last_seen: jnp.ndarray  # [A] int32: newest peer KF id already integrated


def create_protocol_state(kf_cap: int, n_words: int, n_agents: int):
    return MeshProtocolState(
        db_bow=jnp.zeros((kf_cap, n_words), jnp.float32),
        db_valid=jnp.zeros((kf_cap,), bool),
        merged=jnp.zeros((n_agents,), bool),
        last_seen=jnp.full((n_agents,), -1, jnp.int32),
    )


def _add_keyframe_masked(m, pose, xy, level, angle, desc, feat_valid, obs,
                         accept):
    """Conditionally append a keyframe: a no-op when accept=False (fixed
    shapes — the slot is written then masked)."""
    i = jnp.minimum(m.n_kf, m.kf_capacity - 1)
    acc = accept & (m.n_kf < m.kf_capacity)

    def wr(arr, val):
        return arr.at[i].set(jnp.where(acc, val.astype(arr.dtype), arr[i]))

    m = m._replace(
        kf_pose=wr(m.kf_pose, pose),
        kf_valid=m.kf_valid.at[i].set(jnp.where(acc, True, m.kf_valid[i])),
        kf_xy=wr(m.kf_xy, xy),
        kf_level=wr(m.kf_level, level),
        kf_angle=wr(m.kf_angle, angle),
        kf_desc=wr(m.kf_desc, desc),
        kf_feat_valid=wr(m.kf_feat_valid, feat_valid & acc),
        kf_obs=wr(m.kf_obs, jnp.where(acc, obs, -1)),
        n_kf=m.n_kf + acc.astype(jnp.int32),
    )
    return m, i


def build_protocol_step(mesh: Mesh, config: trk.TrackerConfig,
                        voc: vocabulary.Vocabulary, fuse_after: bool = True):
    """One collective protocol round, SPMD over the ("agent",) mesh — the
    on-mesh realization of the reference's per-frame wrapper loop
    (`orb_slam3_wrapper.cpp:131-148` sendNewKeyFrameBows/sendNewKeyFrames):

      1. each slice BoW-transforms its newest keyframe and registers it in
         its on-device database,
      2. ONE `all_gather` broadcasts every agent's BoW (the NewKeyFrameBows
         topic over ICI instead of DDS),
      3. each slice runs `DetectMergePossibility` (0.9x-baseline rule,
         `KeyFrameDatabase.cc:789`) against every peer BoW,
      4. a second tiny `all_gather` shares the per-agent merge rows; the
         merge matrix is closed symmetrically and transitively (implicit
         transitive merges, `orb_slam3_wrapper.cpp:684-707`),
      5. every agent's newest-keyframe packet (pose + features + observed
         point geometry — the NewKeyFrames payload) travels in the same
         gathered tensors; slices splice packets from merged peers into
         their own map (uuid-free on-mesh dedup: per-peer monotone KF ids),
      6. optional duplicate fusion around the spliced keyframe
         (`LocalMapping::SearchInNeighbors` role).

    Returns jitted fn:
      (maps [A,...], states [A,...]) -> (maps', states', merge_matrix [A,A])
    """
    from ..mapping import local_mapping, map_state as ms
    from ..placerec import database

    fc = config.frontend
    voc_levels, voc_idf = voc.device_arrays()
    branch, words = voc.branch, voc.n_words
    A = mesh.devices.size

    def step(m, st, K, own_slot, own_seq):
        m1 = jax.tree.map(lambda x: x[0], m)
        st1 = jax.tree.map(lambda x: x[0], st)
        K1 = K[0]
        me = jax.lax.axis_index("agent")

        # the agent's own newest keyframe (callers track it: spliced foreign
        # keyframes must not be re-shared — creator gating,
        # `orb_slam3_wrapper.cpp:240-247`)
        c = jnp.maximum(own_slot[0], 0)
        bow = vocabulary.bow_vector(
            voc_levels, voc_idf, m1.kf_desc[c], m1.kf_feat_valid[c],
            branch, words,
        )
        db = database.BowDatabase(bow=st1.db_bow, valid=st1.db_valid)
        db = database.add(db, c, bow)

        # --- collective BoW advertisement (ICI all_gather) ---
        all_bows = jax.lax.all_gather(bow, "agent")            # [A,W]
        covis = ms.covisibility(m1)
        ok_row, best_row, score_row, base_row = jax.vmap(
            lambda q: database.detect_merge_possibility(db, q, covis)
        )(all_bows)
        ok_row = ok_row & (jnp.arange(A) != me) & (m1.n_kf >= 2)

        # --- merge matrix: symmetric + transitive closure ---
        M = jax.lax.all_gather(ok_row, "agent")                # [A,A]
        M = M | M.T | jnp.eye(A, dtype=bool)
        for _ in range(max(1, int(np.ceil(np.log2(max(A, 2)))))):
            M = M | (M @ M)
        merged_row = M[me] & (jnp.arange(A) != me)

        # --- keyframe packet exchange (NewKeyFrames over ICI) ---
        F = fc.capacity
        obs_c = m1.kf_obs[c]
        pt_ok = (obs_c >= 0) & m1.pt_valid[jnp.clip(obs_c, 0)]
        packet = dict(
            kf_id=own_seq[0],
            pose=m1.kf_pose[c],
            xy=m1.kf_xy[c], level=m1.kf_level[c], angle=m1.kf_angle[c],
            desc=m1.kf_desc[c], feat_valid=m1.kf_feat_valid[c] & (m1.n_kf > 0),
            pt_pos=m1.pt_pos[jnp.clip(obs_c, 0)],
            pt_ok=pt_ok,
        )
        g = {k: jax.lax.all_gather(v, "agent") for k, v in packet.items()}

        last_seen = st1.last_seen
        spliced_any = jnp.zeros((), bool)
        spliced_slot = jnp.int32(0)
        for a in range(A):  # static unroll over the (small) agent axis
            fresh = g["kf_id"][a] > last_seen[a]
            accept = merged_row[a] & fresh & (jnp.int32(a) != me)
            take = g["pt_ok"][a] & accept
            m1, slots = ms.add_points(
                m1,
                pos=g["pt_pos"][a],
                desc=g["desc"][a],
                normal=jnp.zeros((F, 3), m1.pt_pos.dtype),
                min_dist=jnp.zeros((F,), m1.pt_pos.dtype),
                max_dist=jnp.full((F,), 1e9, m1.pt_pos.dtype),
                ref_kf=jnp.minimum(m1.n_kf, m1.kf_capacity - 1),
                valid=take,
            )
            m1, slot = _add_keyframe_masked(
                m1, g["pose"][a], g["xy"][a], g["level"][a], g["angle"][a],
                g["desc"][a], g["feat_valid"][a], slots, accept,
            )
            last_seen = last_seen.at[a].set(
                jnp.where(accept, g["kf_id"][a], last_seen[a])
            )
            spliced_any = spliced_any | accept
            spliced_slot = jnp.where(accept, slot, spliced_slot)

        if fuse_after:
            fused = local_mapping.fuse_duplicates(
                m1, spliced_slot, K1, n_neighbors=5,
                n_levels=fc.n_levels, scale_factor=fc.scale_factor,
            )
            # keep the fused map only when something was spliced this round
            m1 = jax.tree.map(
                lambda a_, b_: jnp.where(spliced_any, a_, b_), fused, m1
            )

        st1 = MeshProtocolState(db_bow=db.bow, db_valid=db.valid,
                                merged=merged_row, last_seen=last_seen)
        return (jax.tree.map(lambda x: x[None], m1),
                jax.tree.map(lambda x: x[None], st1), M)

    in_specs = (
        jax.tree.map(lambda _: P("agent"), map_state_spec()),
        jax.tree.map(lambda _: P("agent"), protocol_state_spec(A)),
        P("agent"), P("agent"), P("agent"),
    )
    out_specs = (
        jax.tree.map(lambda _: P("agent"), map_state_spec()),
        jax.tree.map(lambda _: P("agent"), protocol_state_spec(A)),
        P(),
    )
    fn = shard_map(step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn)


def map_state_spec():
    return map_state.create(1, 1, 1)


def protocol_state_spec(n_agents):
    return create_protocol_state(1, 1, n_agents)
