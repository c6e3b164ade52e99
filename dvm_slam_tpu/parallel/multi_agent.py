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
    if len(devices) != n_agents:
        # silently shrinking the mesh makes every collective degenerate
        # (observed: a 1-device "4-agent" mesh runs but verifies nothing)
        raise ValueError(
            f"requested a {n_agents}-agent mesh but only {len(devices)} "
            f"device(s) available — set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_agents} "
            f"(and JAX_PLATFORMS=cpu) before backend init")
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
    S_peer: jnp.ndarray     # [A,8] Sim3 peer-world -> my-world (q,t,s)
    S_ok: jnp.ndarray       # [A] bool: Sim3 geometrically verified
    round: jnp.ndarray      # [] int32 protocol round counter (refresh cadence)
    dropped: jnp.ndarray    # [A] int32 peer keyframes lost to backlog gaps
                            # > window (surfaced, not silent — SURVEY "no
                            # silent caps" discipline)
    refresh_interval: jnp.ndarray  # [A] int32 AIMD Sim3-refresh cadence in
                                   # rounds (`orb_slam3_wrapper.cpp:804-812`:
                                   # converged refit doubles it, drifted
                                   # refit resets to base)
    next_refresh: jnp.ndarray      # [A] int32 round at which the per-peer
                                   # Sim3 refit is next due


def create_protocol_state(kf_cap: int, n_words: int, n_agents: int,
                          refresh_base: int = 5):
    return MeshProtocolState(
        db_bow=jnp.zeros((kf_cap, n_words), jnp.float32),
        db_valid=jnp.zeros((kf_cap,), bool),
        merged=jnp.zeros((n_agents,), bool),
        last_seen=jnp.full((n_agents,), -1, jnp.int32),
        S_peer=jnp.tile(
            jnp.asarray([1, 0, 0, 0, 0, 0, 0, 1], jnp.float32),
            (n_agents, 1)),
        S_ok=jnp.zeros((n_agents,), bool),
        round=jnp.int32(0),
        dropped=jnp.zeros((n_agents,), jnp.int32),
        refresh_interval=jnp.full((n_agents,), max(refresh_base, 1),
                                  jnp.int32),
        next_refresh=jnp.full((n_agents,), max(refresh_base, 1) - 1,
                              jnp.int32),
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
                        voc: vocabulary.Vocabulary, fuse_after: bool = True,
                        window: int = 4,
                        sim3_min_inliers: int = 20,
                        proj_min_matches: int = 50,
                        ransac_hypotheses: int = 200,
                        match_max_dist: int = 60,
                        refresh_every: int = 5,
                        weld_ba: bool = True,
                        pose_graph_after: bool = True,
                        pose_graph_iters: int = 8,
                        global_ba_after: bool = True,
                        global_ba_iters: int = 6):
    """One collective protocol round, SPMD over the ("agent",) mesh — the
    on-mesh realization of the reference's per-frame wrapper loop
    (`orb_slam3_wrapper.cpp:131-148` sendNewKeyFrameBows/sendNewKeyFrames):

      1. each slice BoW-transforms its `window` newest OWN keyframes and
         registers them in its on-device database,
      2. ONE `all_gather` broadcasts every agent's newest BoW (the
         NewKeyFrameBows topic over ICI instead of DDS),
      3. each slice runs `DetectMergePossibility` (0.9x-baseline rule,
         `KeyFrameDatabase.cc:789`) against every peer BoW,
      4. a second tiny `all_gather` shares the per-agent merge rows; the
         merge matrix is closed symmetrically and transitively (implicit
         transitive merges, `orb_slam3_wrapper.cpp:684-707`),
      5. NO splice happens on BoW score alone: the first fresh packet from a
         BoW-merged peer is verified GEOMETRICALLY — descriptor matches
         between the peer's observed points and the local map feed a
         batched Horn-Sim3 RANSAC (the `Sim3Solver` + inlier-gate role of
         `LoopClosing.cc:644-780`; gates `proj_min_matches` matched pairs /
         `sim3_min_inliers` RANSAC inliers, the nProjMatches=50 /
         nSim3Inliers=20 constants). The accepted Sim3 (peer world -> my
         world) is stored per peer and applied to every subsequent packet,
         so agents may start in arbitrarily rotated/scaled frames,
      6. a WINDOW of each agent's newest own keyframes travels per round
         (pose + features + observed point geometry — the NewKeyFrames
         payload): backlog created between protocol rounds is re-offered
         until `last_seen` catches up, matching the host path's
         all-unsent-keyframes dedup semantics (`orb_slam3_wrapper.cpp:
         240-247`) for gaps up to `window` per round,
      7. optional duplicate fusion around the spliced keyframe
         (`LocalMapping::SearchInNeighbors` role),
      8. the per-peer Sim3 is RE-VERIFIED from the freshest packet on an
         AIMD cadence (drift/scale re-alignment — the host path's 5 s
         `updateMapScale` timer with AIMD backoff, `orb_slam3_wrapper.cpp:
         766-833,804-812`): `refresh_every` is the base interval in rounds;
         a refit whose scale matches the standing weld within 1% doubles
         the interval (cap 32x), a drifted refit resets it to base, a
         failing one keeps the old weld and the old interval,
      9. backlog gaps larger than `window` are COUNTED per peer in
         `state.dropped` (the keyframes the windowed re-offer can never
         deliver) instead of dropped silently,
     10. when a splice happened this round: windowed welding BA around the
         spliced keyframe (`LoopClosing::MergeLocal` welding BA,
         `LoopClosing.cc:1657` role); with `pose_graph_after`, an
         essential-graph Sim3 optimization over device-built edges
         (sequential chain + strongest covisibility neighbor per node —
         an APPROXIMATION of the reference's full covisibility/loop-edge
         graph, `Optimizer.cc:1389`, `LoopClosing.cc:1747`) with
         splice-time poses as the NonCorrectedSim3 measurements; and with
         `global_ba_after`, a bounded-iteration full-map BA (the detached
         post-merge GBA, `LoopClosing.cc:1796-1799` role) — all under
         `lax.cond`, so rounds without a splice pay none of it.

    Returns jitted fn:
      (maps [A,...], states [A,...], K [A,4], own_slots [A,window] int32
       (-1 = empty, oldest -> newest), own_seqs [A,window] int32 monotone
       per-agent own-keyframe ids, keys [A,2] uint32 RANSAC PRNG keys)
        -> (maps', states', merge_matrix [A,A])
    """
    from ..geometry import alignment, lie
    from ..mapping import local_mapping, map_state as ms
    from ..ops import matching
    from ..placerec import database

    fc = config.frontend
    voc_levels, voc_idf = voc.device_arrays()
    branch, words = voc.branch, voc.n_words
    A = mesh.devices.size
    Wn = window

    def step(m, st, K, own_slots, own_seqs, keys):
        m1 = jax.tree.map(lambda x: x[0], m)
        st1 = jax.tree.map(lambda x: x[0], st)
        K1 = K[0]
        slots_w = own_slots[0]       # [Wn] oldest -> newest, -1 = empty
        seqs_w = own_seqs[0]         # [Wn]
        key1 = keys[0]
        me = jax.lax.axis_index("agent")

        # register the window's own keyframes (callers track own slots:
        # spliced foreign keyframes must not be re-shared — creator gating,
        # `orb_slam3_wrapper.cpp:240-247`)
        db = database.BowDatabase(bow=st1.db_bow, valid=st1.db_valid)
        newest_bow = jnp.zeros((words,), jnp.float32)
        for w in range(Wn):
            cw = jnp.maximum(slots_w[w], 0)
            bw = vocabulary.bow_vector(
                voc_levels, voc_idf, m1.kf_desc[cw], m1.kf_feat_valid[cw],
                branch, words,
            )
            has = slots_w[w] >= 0
            db = database.BowDatabase(
                bow=jnp.where(has, db.bow.at[cw].set(bw), db.bow),
                valid=jnp.where(has, db.valid.at[cw].set(True), db.valid),
            )
            newest_bow = jnp.where(has, bw, newest_bow)

        # --- collective BoW advertisement (ICI all_gather) ---
        all_bows = jax.lax.all_gather(newest_bow, "agent")     # [A,W]
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

        def pack_one(c, seq):
            cc = jnp.maximum(c, 0)
            obs_c = m1.kf_obs[cc]
            pt_ok = ((obs_c >= 0) & m1.pt_valid[jnp.clip(obs_c, 0)]
                     & (c >= 0))
            return dict(
                kf_id=jnp.where(c >= 0, seq, -1),
                pose=m1.kf_pose[cc],
                xy=m1.kf_xy[cc], level=m1.kf_level[cc],
                angle=m1.kf_angle[cc],
                desc=m1.kf_desc[cc],
                feat_valid=m1.kf_feat_valid[cc] & (c >= 0) & (m1.n_kf > 0),
                pt_pos=m1.pt_pos[jnp.clip(obs_c, 0)],
                pt_ok=pt_ok,
            )

        packet = jax.vmap(pack_one)(slots_w, seqs_w)   # [Wn,...] pytree
        g = {k: jax.lax.all_gather(v, "agent") for k, v in packet.items()}

        # --- Sim3 geometric verification (LoopClosing.cc:644-780 role) ---
        # newest valid window entry of each peer supplies the candidate
        # correspondence set: peer observed points (their world) matched by
        # descriptor against MY map points (my world) -> Horn-Sim3 RANSAC
        newest_idx = jnp.argmax(
            jnp.where(g["kf_id"] >= 0, g["kf_id"], -1), axis=1)  # [A]
        S_peer, S_ok = st1.S_peer, st1.S_ok
        # periodic re-verification un-latches the weld: drift between two
        # live maps is re-estimated from fresh correspondences (host path:
        # the 5 s scale-alignment timer). The cadence is AIMD per peer
        # (`orb_slam3_wrapper.cpp:804-812`): a refit whose scale is within
        # 1% of unity doubles the interval (cap 32x base); a drifted refit
        # resets it to the base; a failed refit keeps the old S and the old
        # interval. `refresh_every` is the base interval in rounds.
        base_iv = jnp.int32(max(refresh_every, 1))
        cap_iv = jnp.int32(32 * max(refresh_every, 1))
        refresh_iv = st1.refresh_interval
        next_refresh = st1.next_refresh
        refresh_due = st1.round >= st1.next_refresh   # [A]
        for a in range(A):
            wsel = newest_idx[a]
            need = (merged_row[a] & (~S_ok[a] | refresh_due[a])
                    & (jnp.int32(a) != me))

            # the [F,P] Hamming matrix + 200-hypothesis RANSAC is the
            # expensive part of the round; once a peer is verified (S_ok)
            # the result would be discarded anyway — lax.cond genuinely
            # skips it here (per-device shard_map code, not vmapped)
            def _verify(_, _a=a, _wsel=wsel):
                cand_desc = g["desc"][_a][_wsel]        # [F,256]
                cand_pos = g["pt_pos"][_a][_wsel]       # [F,3]
                cand_ok = g["pt_ok"][_a][_wsel]         # [F]
                dist = matching.hamming_matrix(cand_desc, m1.pt_desc)
                mask = cand_ok[:, None] & m1.pt_valid[None, :]
                # tie_ok: after a prior splice MY map holds duplicate copies
                # of peer points (identical descriptors at the same world
                # position) — a strict ratio test would reject every such
                # match and the periodic re-verification could never refit;
                # exact ties are accepted and RANSAC stays the gate
                idx, _d, okm = matching.masked_best_match(
                    dist, mask, max_dist=match_max_dist, ratio=0.9,
                    tie_ok=True)
                n_match = jnp.sum(okm)
                dst = m1.pt_pos[jnp.clip(idx, 0)]
                S, _inl, n_inl = alignment.ransac_umeyama(
                    jax.random.fold_in(jax.random.wrap_key_data(key1), _a),
                    cand_pos, dst, okm, num_hypotheses=ransac_hypotheses,
                )
                passed = ((n_match >= proj_min_matches)
                          & (n_inl >= sim3_min_inliers)
                          & jnp.all(jnp.isfinite(S)))
                return S, passed

            def _skip(_, _a=a):
                return S_peer[_a], jnp.zeros((), bool)

            S, passed = jax.lax.cond(need, _verify, _skip, None)
            passed = passed & need
            S_peer = S_peer.at[a].set(jnp.where(passed, S, S_peer[a]))
            S_ok = S_ok.at[a].set(S_ok[a] | passed)
            # AIMD cadence update: only a refresh ATTEMPT (refit while
            # already welded and due) moves the clock. "Converged" compares
            # the refit scale against the standing weld's scale — the host
            # tests |s-1| AFTER applying each alignment to its own map
            # (`orb_slam3_wrapper.cpp:804`); on mesh the peer frame is never
            # rebased, so zero new drift shows up as S_new/S_old ~= 1
            attempted = need & refresh_due[a] & st1.S_ok[a]
            rel = S[7] / jnp.maximum(st1.S_peer[a, 7], 1e-12)
            converged = passed & (jnp.abs(rel - 1.0) < 0.01)
            new_iv = jnp.where(
                attempted & converged, jnp.minimum(refresh_iv[a] * 2, cap_iv),
                jnp.where(attempted & passed, base_iv, refresh_iv[a]))
            refresh_iv = refresh_iv.at[a].set(new_iv)
            # the timer is free-running (host parity: the 5 s wall timer
            # starts at t=0, not at merge time) — only an attempt re-arms it
            next_refresh = next_refresh.at[a].set(
                jnp.where(attempted, st1.round + new_iv, next_refresh[a]))

        last_seen = st1.last_seen
        # backlog-overflow accounting: ids below the oldest entry a peer
        # still re-offers can never splice — count them the moment the
        # window slides past, instead of silently skipping (st.dropped)
        has_any = jnp.any(g["kf_id"] >= 0, axis=1)               # [A]
        oldest = jnp.min(
            jnp.where(g["kf_id"] >= 0, g["kf_id"], jnp.iinfo(jnp.int32).max),
            axis=1)                                              # [A]
        receiving = (merged_row & S_ok & has_any
                     & (jnp.arange(A) != me))
        gap = jnp.maximum(0, oldest - last_seen - 1)
        dropped = st1.dropped + jnp.where(receiving, gap, 0)
        # the gap is permanently lost: advance last_seen past it so it is
        # counted exactly once
        last_seen = jnp.where(receiving & (gap > 0), oldest - 1, last_seen)
        spliced_any = jnp.zeros((), bool)
        spliced_slot = jnp.int32(0)
        for a in range(A):  # static unroll over the (small) agent axis
            Sa = S_peer[a]
            for w in range(Wn):
                fresh = g["kf_id"][a][w] > last_seen[a]
                has = g["kf_id"][a][w] >= 0
                accept = (merged_row[a] & S_ok[a] & fresh & has
                          & (jnp.int32(a) != me))
                take = g["pt_ok"][a][w] & accept
                # frame alignment: packets arrive in the peer's world; the
                # verified Sim3 maps them into mine
                pos_al = jax.vmap(lambda x: lie.sim3_apply(Sa, x))(
                    g["pt_pos"][a][w])
                Sc = lie.sim3_mul(lie.sim3_from_se3(g["pose"][a][w]),
                                  lie.sim3_inv(Sa))
                pose_al = lie.se3(
                    lie.sim3_q(Sc),
                    lie.sim3_t(Sc) / jnp.maximum(lie.sim3_s(Sc), 1e-12))
                m1, slots = ms.add_points(
                    m1,
                    pos=pos_al,
                    desc=g["desc"][a][w],
                    normal=jnp.zeros((F, 3), m1.pt_pos.dtype),
                    min_dist=jnp.zeros((F,), m1.pt_pos.dtype),
                    max_dist=jnp.full((F,), 1e9, m1.pt_pos.dtype),
                    ref_kf=jnp.minimum(m1.n_kf, m1.kf_capacity - 1),
                    valid=take,
                )
                m1, slot = _add_keyframe_masked(
                    m1, pose_al, g["xy"][a][w], g["level"][a][w],
                    g["angle"][a][w], g["desc"][a][w],
                    g["feat_valid"][a][w], slots, accept,
                )
                last_seen = last_seen.at[a].set(
                    jnp.where(accept, g["kf_id"][a][w], last_seen[a])
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

        # --- post-merge optimization on mesh (host-path parity) ---
        # splice-time poses are the essential-graph measurements
        # (NonCorrectedSim3, `Optimizer.cc:1389`); the welding BA then moves
        # the window around the spliced keyframe (`LoopClosing.cc:1657`)
        poses_pre = m1.kf_pose
        if weld_ba:
            def _weld(mm):
                mw, _ = local_mapping.local_ba(
                    mm, spliced_slot, K1, n_local=8, n_fixed=4,
                    n_pts=1024, iters=4,
                    n_levels=fc.n_levels, scale_factor=fc.scale_factor,
                )
                return mw

            m1 = jax.lax.cond(spliced_any, _weld, lambda mm: mm, m1)

        if pose_graph_after:
            from ..loopclosing import pose_graph as pg_mod

            def _pg(mm):
                # device-built essential edges (the host path builds them in
                # numpy, impossible under shard_map): sequential chain +
                # strongest covisibility neighbor per node, weight >= 30
                covis2 = ms.covisibility(mm)
                Kc = mm.kf_capacity
                iiK = jnp.arange(Kc, dtype=jnp.int32)
                top_w, top_i = jax.lax.top_k(covis2, 2)
                nb = jnp.where(top_i[:, 0] != iiK, top_i[:, 0], top_i[:, 1])
                nb_w = jnp.where(top_i[:, 0] != iiK, top_w[:, 0], top_w[:, 1])
                ei = jnp.concatenate([iiK[1:], iiK])
                ej = jnp.concatenate([iiK[:-1], nb.astype(jnp.int32)])
                emask = jnp.concatenate([
                    mm.kf_valid[1:] & mm.kf_valid[:-1],
                    mm.kf_valid & mm.kf_valid[nb] & (nb_w >= 30) & (nb != iiK),
                ])
                poses_s = jax.vmap(lie.sim3_from_se3)(mm.kf_pose)
                meas_src = jax.vmap(lie.sim3_from_se3)(poses_pre)
                meas = jax.vmap(lambda a_, b_: lie.sim3_mul(
                    meas_src[a_], lie.sim3_inv(meas_src[b_])))(ei, ej)
                # nodes the welding BA corrected are the CorrectedSim3 side:
                # held fixed, their correction distributes through the graph
                moved = jnp.any(mm.kf_pose != poses_pre, axis=1)
                fixed = (moved | ~mm.kf_valid).at[0].set(True)
                fixed = fixed.at[spliced_slot].set(True)
                new_poses, _ = pg_mod.optimize_pose_graph(
                    poses_s, fixed, ei, ej, meas, emask,
                    iters=pose_graph_iters)
                pts = pg_mod.correct_points(mm.pt_pos, mm.pt_ref_kf,
                                            mm.pt_valid, poses_s, new_poses)
                return mm._replace(
                    kf_pose=jnp.where(mm.kf_valid[:, None],
                                      pg_mod.se3_from_sim3_poses(new_poses),
                                      mm.kf_pose),
                    pt_pos=pts,
                )

            m1 = jax.lax.cond(spliced_any, _pg, lambda mm: mm, m1)

        if global_ba_after:
            # post-merge global BA on mesh (host path: the detached abortable
            # GBA dispatched after every merge, `agent.py::_pending_gba` <->
            # `LoopClosing::RunGlobalBundleAdjustment`, `LoopClosing.cc:
            # 1796-1799`). Bounded iterations under lax.cond: rounds without
            # a splice pay nothing at run time.
            def _gba(mm):
                mg, _chi2 = local_mapping.global_ba(
                    mm, K1, iters=global_ba_iters,
                    n_levels=fc.n_levels, scale_factor=fc.scale_factor,
                )
                return mg

            m1 = jax.lax.cond(spliced_any, _gba, lambda mm: mm, m1)

        st1 = MeshProtocolState(db_bow=db.bow, db_valid=db.valid,
                                merged=merged_row, last_seen=last_seen,
                                S_peer=S_peer, S_ok=S_ok,
                                round=st1.round + 1, dropped=dropped,
                                refresh_interval=refresh_iv,
                                next_refresh=next_refresh)
        return (jax.tree.map(lambda x: x[None], m1),
                jax.tree.map(lambda x: x[None], st1), M)

    in_specs = (
        jax.tree.map(lambda _: P("agent"), map_state_spec()),
        jax.tree.map(lambda _: P("agent"), protocol_state_spec(A)),
        P("agent"), P("agent"), P("agent"), P("agent"),
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
