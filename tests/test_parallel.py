"""Mesh-parallel multi-agent execution: SPMD step and the protocol-on-mesh
(collective keyframe exchange, 0.9x-baseline merge detection, transitive
closure). Runs on the virtual 8-device CPU mesh from conftest.

Reference semantics: `orb_slam3_wrapper.cpp:131-148` (protocol loop),
`KeyFrameDatabase.cc:789` (DetectMergePossibility), `:684-707` (implicit
transitive merges), `:212-384` (keyframe sharing).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvm_slam_tpu.frontend.extractor import FrontendConfig
from dvm_slam_tpu.geometry import lie
from dvm_slam_tpu.mapping import map_state
from dvm_slam_tpu.parallel import multi_agent
from dvm_slam_tpu.placerec import vocabulary
from dvm_slam_tpu.tracking import tracker as trk


def _voc(rng):
    return vocabulary.train((rng.rand(800, 256) > 0.5).astype(np.uint8),
                            branch=6, depth=3, seed=0)


def _agent_map(rng, pts_w, descs, kf_cap=16, pt_cap=256, F=64,
               pose_offsets=((0.0, 0.0), (0.3, 0.1))):
    """A small map with two own keyframes observing `pts_w` (world frame)."""
    P = pts_w.shape[0]
    m = map_state.create(kf_cap, pt_cap, F)
    n = min(P, F, pt_cap)
    m, slots = map_state.add_points(
        m, pos=jnp.asarray(pts_w[:n]),
        desc=jnp.asarray(descs[:n]),
        normal=jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (n, 1)),
        min_dist=jnp.zeros((n,)), max_dist=jnp.full((n,), 100.0),
        ref_kf=jnp.int32(0), valid=jnp.ones((n,), bool),
    )
    K = np.asarray([100.0, 100.0, 64.0, 48.0], np.float32)
    for dx, dy in pose_offsets:
        q = np.asarray([1, 0, 0, 0], np.float32)
        T_cw = jnp.asarray(np.concatenate([q, [dx, dy, 0.0]]), jnp.float32)
        pc = np.asarray(jax.vmap(lambda X: lie.se3_apply(T_cw, X))(
            jnp.asarray(pts_w[:n])))
        uv = np.zeros((F, 2), np.float32)
        uv[:n, 0] = K[0] * pc[:, 0] / pc[:, 2] + K[2]
        uv[:n, 1] = K[1] * pc[:, 1] / pc[:, 2] + K[3]
        obs = np.full((F,), -1, np.int32)
        obs[:n] = np.asarray(slots)[:n]
        fv = np.zeros((F,), bool)
        fv[:n] = True
        desc_f = np.zeros((F, 256), np.uint8)
        desc_f[:n] = descs[:n]
        m, _ = map_state.add_keyframe(
            m, T_cw, jnp.asarray(uv), jnp.zeros((F,), jnp.int32),
            jnp.zeros((F,)), jnp.asarray(desc_f), jnp.asarray(fv),
            jnp.asarray(obs),
        )
    return m, K


@pytest.fixture(scope="module")
def mesh4():
    devs = jax.devices()[:4]
    return multi_agent.make_mesh(4, devs)


class TestProtocolOnMesh:
    def test_merge_detect_share_converge(self, mesh4):
        """3 overlapping agents merge (0.9x-baseline BoW rule on-mesh) and
        exchange keyframes via collectives; a 4th agent viewing a different
        scene stays unmerged and its map untouched."""
        rng = np.random.RandomState(0)
        A = 4
        fc = FrontendConfig(height=96, width=128, n_features=64, n_levels=2)
        cfg = trk.TrackerConfig(frontend=fc, kf_cap=16, pt_cap=256, fps=10.0)
        voc = _voc(rng)

        # shared world for agents 0..2 (same points, same descriptors)
        pts_shared = (rng.randn(60, 3) * 1.5 + [0, 0, 8]).astype(np.float32)
        desc_shared = (rng.rand(60, 256) > 0.5).astype(np.uint8)
        # disjoint world for agent 3
        pts_other = (rng.randn(60, 3) * 1.5 + [40, 0, 8]).astype(np.float32)
        desc_other = (rng.rand(60, 256) > 0.5).astype(np.uint8)

        maps, Ks = [], []
        offsets = [((0.0, 0.0), (0.25, 0.05)), ((0.1, -0.1), (0.35, 0.0)),
                   ((-0.1, 0.1), (0.2, 0.2)), ((0.0, 0.0), (0.3, 0.1))]
        for a in range(A):
            pw = pts_shared if a < 3 else pts_other
            dc = desc_shared if a < 3 else desc_other
            m, K = _agent_map(rng, pw, dc, kf_cap=16, pt_cap=256,
                              F=fc.capacity, pose_offsets=offsets[a])
            maps.append(m)
            Ks.append(K)

        step = multi_agent.build_protocol_step(
            mesh4, cfg, voc, window=1,
            proj_min_matches=25, sim3_min_inliers=12)
        stacked = multi_agent.stack_agents(maps)
        # pre-register keyframe 0 of each agent (the step registers the
        # newest KF each round; earlier ones entered in earlier rounds)
        lv, idf = voc.device_arrays()
        sts = []
        for a in range(A):
            st = multi_agent.create_protocol_state(16, voc.n_words, A)
            from dvm_slam_tpu.placerec import database as dbm
            bow0 = vocabulary.bow_vector(
                lv, idf, maps[a].kf_desc[0], maps[a].kf_feat_valid[0],
                voc.branch, voc.n_words)
            st = st._replace(db_bow=st.db_bow.at[0].set(bow0),
                             db_valid=st.db_valid.at[0].set(True))
            sts.append(st)
        states = multi_agent.stack_agents(sts)
        Kb = jnp.asarray(np.stack(Ks))
        own_slot = jnp.ones((A, 1), jnp.int32)  # each agent's 2nd KF is own
        own_seq = jnp.zeros((A, 1), jnp.int32)
        keys = jnp.asarray(rng.randint(0, 2 ** 31, (A, 2)), jnp.uint32)

        n_kf_before = np.asarray(stacked.n_kf).copy()
        maps_out, states_out, M = step(stacked, states, Kb, own_slot,
                                       own_seq, keys)
        M = np.asarray(M)

        # merge matrix: 0-2 mutually merged, 3 isolated
        for i in range(3):
            for j in range(3):
                assert M[i, j], f"agents {i},{j} failed to merge"
        for i in range(3):
            assert not M[i, 3] and not M[3, i], "disjoint agent merged"

        n_kf_after = np.asarray(maps_out.n_kf)
        # each of 0..2 spliced keyframes from its 2 merged peers
        for a in range(3):
            assert n_kf_after[a] == n_kf_before[a] + 2, (
                f"agent {a}: {n_kf_before[a]} -> {n_kf_after[a]}")
        # agent 3 untouched
        assert n_kf_after[3] == n_kf_before[3]

        # spliced geometry agrees: agent 0 received agent 1's newest KF pose
        pose_recv = np.asarray(maps_out.kf_pose[0, int(n_kf_before[0])])
        pose_src = np.asarray(maps[1].kf_pose[1])
        np.testing.assert_allclose(pose_recv, pose_src, atol=1e-5)

        # second round with fresh own keyframes: dedup lets new ones through
        own_seq2 = own_seq + 1
        maps3, states3, M2 = step(maps_out, states_out, Kb, own_slot,
                                  own_seq2, keys)
        n_kf_3 = np.asarray(maps3.n_kf)
        for a in range(3):
            assert n_kf_3[a] == n_kf_after[a] + 2  # two fresh peer KFs again

        # third round with STALE sequence ids: nothing new is spliced
        maps4, _, _ = step(maps3, states3, Kb, own_slot, own_seq2, keys)
        assert np.array_equal(np.asarray(maps4.n_kf), n_kf_3)

    def test_spliced_points_match_source_geometry(self, mesh4):
        """Points arriving with a spliced keyframe land at the sender's world
        positions (agents share one world frame here)."""
        rng = np.random.RandomState(1)
        A = 4
        fc = FrontendConfig(height=96, width=128, n_features=64, n_levels=2)
        cfg = trk.TrackerConfig(frontend=fc, kf_cap=16, pt_cap=256, fps=10.0)
        voc = _voc(rng)
        pts = (rng.randn(50, 3) * 1.5 + [0, 0, 8]).astype(np.float32)
        descs = (rng.rand(50, 256) > 0.5).astype(np.uint8)
        maps, Ks = [], []
        for a in range(A):
            m, K = _agent_map(rng, pts, descs, F=fc.capacity)
            maps.append(m)
            Ks.append(K)
        step = multi_agent.build_protocol_step(
            mesh4, cfg, voc, fuse_after=False, window=1,
            proj_min_matches=20, sim3_min_inliers=10)
        stacked = multi_agent.stack_agents(maps)
        lv, idf = voc.device_arrays()
        sts = []
        for a in range(A):
            st = multi_agent.create_protocol_state(16, voc.n_words, A)
            bow0 = vocabulary.bow_vector(
                lv, idf, maps[a].kf_desc[0], maps[a].kf_feat_valid[0],
                voc.branch, voc.n_words)
            st = st._replace(db_bow=st.db_bow.at[0].set(bow0),
                             db_valid=st.db_valid.at[0].set(True))
            sts.append(st)
        states = multi_agent.stack_agents(sts)
        keys = jnp.asarray(rng.randint(0, 2 ** 31, (A, 2)), jnp.uint32)
        maps_out, _, M = step(stacked, states, jnp.asarray(np.stack(Ks)),
                              jnp.ones((A, 1), jnp.int32),
                              jnp.zeros((A, 1), jnp.int32), keys)
        assert bool(np.asarray(M).all())
        # received points (slots beyond the original n_pt) lie on the shared
        # cloud: nearest-neighbor distance to the source positions ~ 0
        m0 = jax.tree.map(lambda x: np.asarray(x[0]), maps_out)
        n0 = 50
        new_valid = m0.pt_valid.copy()
        new_valid[:n0] = False
        new_pts = m0.pt_pos[new_valid]
        assert len(new_pts) > 0
        d = np.linalg.norm(new_pts[:, None, :] - pts[None, :, :], axis=-1)
        assert d.min(axis=1).max() < 1e-4


class TestSim3OnMesh:
    def test_rotated_scaled_frames_converge(self, mesh4):
        """Agents observing the SAME scene but bootstrapped in different
        world frames (rotated + scaled + translated): the on-mesh Sim3
        verification must recover the frame offset and splice peer geometry
        into the local frame (`LoopClosing.cc:644-780` role) — merging on
        BoW score alone would corrupt both maps."""
        rng = np.random.RandomState(3)
        A = 4
        fc = FrontendConfig(height=96, width=128, n_features=64, n_levels=2)
        cfg = trk.TrackerConfig(frontend=fc, kf_cap=16, pt_cap=256, fps=10.0)
        voc = _voc(rng)
        pts = (rng.randn(60, 3) * 1.5 + [0, 0, 8]).astype(np.float32)
        descs = (rng.rand(60, 256) > 0.5).astype(np.uint8)

        # agent 1 lives in a transformed frame: x_b = G(x_a)
        G = np.concatenate([
            np.asarray(lie.so3_exp(jnp.asarray([0.1, -0.2, 0.3]))),
            [0.5, -0.3, 0.8], [1.4],
        ]).astype(np.float32)
        Gj = jnp.asarray(G)
        pts_b = np.asarray(jax.vmap(lambda x: lie.sim3_apply(Gj, x))(
            jnp.asarray(pts)))

        maps, Ks = [], []
        for a in range(A):
            if a == 1:
                m, K = _agent_map(rng, pts_b, descs, F=fc.capacity)
                # keyframe poses must also live in frame b: T_b = T_a G^-1
                def to_b(T):
                    Sc = lie.sim3_mul(lie.sim3_from_se3(T), lie.sim3_inv(Gj))
                    return lie.se3(
                        lie.sim3_q(Sc),
                        lie.sim3_t(Sc) / jnp.maximum(lie.sim3_s(Sc), 1e-12))
                m = m._replace(kf_pose=jax.vmap(to_b)(m.kf_pose))
            else:
                m, K = _agent_map(rng, pts, descs, F=fc.capacity)
            maps.append(m)
            Ks.append(K)

        # post-splice optimization off: this test pins the SPLICE-time frame
        # mapping; welding BA / pose graph / GBA may legitimately move
        # points afterwards (single-observation spliced points are only
        # ray-constrained)
        step = multi_agent.build_protocol_step(
            mesh4, cfg, voc, fuse_after=False, window=1,
            proj_min_matches=25, sim3_min_inliers=12,
            weld_ba=False, pose_graph_after=False, global_ba_after=False)
        stacked = multi_agent.stack_agents(maps)
        lv, idf = voc.device_arrays()
        sts = []
        for a in range(A):
            st = multi_agent.create_protocol_state(16, voc.n_words, A)
            bow0 = vocabulary.bow_vector(
                lv, idf, maps[a].kf_desc[0], maps[a].kf_feat_valid[0],
                voc.branch, voc.n_words)
            st = st._replace(db_bow=st.db_bow.at[0].set(bow0),
                             db_valid=st.db_valid.at[0].set(True))
            sts.append(st)
        states = multi_agent.stack_agents(sts)
        keys = jnp.asarray(rng.randint(0, 2 ** 31, (A, 2)), jnp.uint32)
        n_before = np.asarray(stacked.n_kf).copy()
        maps_out, states_out, M = step(
            stacked, states, jnp.asarray(np.stack(Ks)),
            jnp.ones((A, 1), jnp.int32), jnp.zeros((A, 1), jnp.int32), keys)
        assert bool(np.asarray(M)[0, 1])

        # agent 0 verified agent 1's Sim3: stored estimate ~ G^-1 (b -> a)
        S01 = np.asarray(
            jax.tree.map(lambda x: x[0], states_out).S_peer)[1]
        assert bool(np.asarray(
            jax.tree.map(lambda x: x[0], states_out).S_ok)[1])
        Ginv = np.asarray(lie.sim3_inv(Gj))
        assert abs(S01[7] - Ginv[7]) < 0.02 * Ginv[7], (
            f"scale {S01[7]} vs {Ginv[7]}")

        # agent 1's keyframe arrived in agent 0's frame: its spliced points
        # coincide with agent 0's own world positions
        m0 = jax.tree.map(lambda x: np.asarray(x[0]), maps_out)
        n0 = 60
        newly = m0.pt_valid.copy()
        newly[:n0] = False
        new_pts = m0.pt_pos[newly]
        assert len(new_pts) > 0
        d = np.linalg.norm(new_pts[:, None, :] - pts[None, :, :], axis=-1)
        assert d.min(axis=1).max() < 1e-3, (
            "peer geometry not mapped into the local frame")

    def test_unverified_peer_not_spliced(self, mesh4):
        """A peer whose packet cannot be geometrically verified (too few
        descriptor matches) must NOT be spliced even if the BoW score says
        merge — the nProjMatches/nSim3Inliers gate."""
        rng = np.random.RandomState(4)
        A = 4
        fc = FrontendConfig(height=96, width=128, n_features=64, n_levels=2)
        cfg = trk.TrackerConfig(frontend=fc, kf_cap=16, pt_cap=256, fps=10.0)
        voc = _voc(rng)
        pts = (rng.randn(60, 3) * 1.5 + [0, 0, 8]).astype(np.float32)
        descs = (rng.rand(60, 256) > 0.5).astype(np.uint8)
        maps, Ks = [], []
        for a in range(A):
            m, K = _agent_map(rng, pts, descs, F=fc.capacity)
            maps.append(m)
            Ks.append(K)
        # impossible gate: more matches than points exist
        step = multi_agent.build_protocol_step(
            mesh4, cfg, voc, fuse_after=False, window=1,
            proj_min_matches=1000, sim3_min_inliers=1000)
        stacked = multi_agent.stack_agents(maps)
        lv, idf = voc.device_arrays()
        sts = []
        for a in range(A):
            st = multi_agent.create_protocol_state(16, voc.n_words, A)
            bow0 = vocabulary.bow_vector(
                lv, idf, maps[a].kf_desc[0], maps[a].kf_feat_valid[0],
                voc.branch, voc.n_words)
            st = st._replace(db_bow=st.db_bow.at[0].set(bow0),
                             db_valid=st.db_valid.at[0].set(True))
            sts.append(st)
        states = multi_agent.stack_agents(sts)
        keys = jnp.asarray(rng.randint(0, 2 ** 31, (A, 2)), jnp.uint32)
        n_before = np.asarray(stacked.n_kf).copy()
        maps_out, states_out, M = step(
            stacked, states, jnp.asarray(np.stack(Ks)),
            jnp.ones((A, 1), jnp.int32), jnp.zeros((A, 1), jnp.int32), keys)
        # BoW says merge, geometry gate blocks the splice
        assert bool(np.asarray(M)[0, 1])
        assert np.array_equal(np.asarray(maps_out.n_kf), n_before)
        assert not bool(np.asarray(states_out.S_ok).any())

    def test_backlog_window_catches_up(self, mesh4):
        """Keyframes created between protocol rounds are NOT skipped: a
        window of unsent keyframes travels per round and last_seen advances
        over all of them (`orb_slam3_wrapper.cpp:240-247` dedup semantics;
        round-2 verdict: the old path jumped last_seen past the backlog)."""
        rng = np.random.RandomState(5)
        A = 4
        fc = FrontendConfig(height=96, width=128, n_features=64, n_levels=2)
        cfg = trk.TrackerConfig(frontend=fc, kf_cap=16, pt_cap=256, fps=10.0)
        voc = _voc(rng)
        pts = (rng.randn(60, 3) * 1.5 + [0, 0, 8]).astype(np.float32)
        descs = (rng.rand(60, 256) > 0.5).astype(np.uint8)
        maps, Ks = [], []
        for a in range(A):
            m, K = _agent_map(rng, pts, descs, F=fc.capacity)
            maps.append(m)
            Ks.append(K)
        step = multi_agent.build_protocol_step(
            mesh4, cfg, voc, fuse_after=False, window=2,
            proj_min_matches=25, sim3_min_inliers=12)
        stacked = multi_agent.stack_agents(maps)
        lv, idf = voc.device_arrays()
        sts = []
        for a in range(A):
            st = multi_agent.create_protocol_state(16, voc.n_words, A)
            bow0 = vocabulary.bow_vector(
                lv, idf, maps[a].kf_desc[0], maps[a].kf_feat_valid[0],
                voc.branch, voc.n_words)
            st = st._replace(db_bow=st.db_bow.at[0].set(bow0),
                             db_valid=st.db_valid.at[0].set(True))
            sts.append(st)
        states = multi_agent.stack_agents(sts)
        keys = jnp.asarray(rng.randint(0, 2 ** 31, (A, 2)), jnp.uint32)

        # BOTH own keyframes (slots 0 and 1, seqs 0 and 1) offered in one
        # round — the backlog case where two KFs landed between rounds
        own_slots = jnp.tile(jnp.asarray([0, 1], jnp.int32), (A, 1))
        own_seqs = jnp.tile(jnp.asarray([0, 1], jnp.int32), (A, 1))
        n_before = np.asarray(stacked.n_kf).copy()
        maps_out, states_out, M = step(
            stacked, states, jnp.asarray(np.stack(Ks)), own_slots,
            own_seqs, keys)
        n_after = np.asarray(maps_out.n_kf)
        # every agent received BOTH backlog keyframes from each of 3 peers
        for a in range(A):
            assert n_after[a] == n_before[a] + 6, (
                f"agent {a}: {n_before[a]} -> {n_after[a]} (backlog dropped)")
        ls = np.asarray(jax.tree.map(lambda x: x[0], states_out).last_seen)
        assert (ls[1:] == 1).all(), f"last_seen did not advance: {ls}"

        # stale re-offer: nothing spliced twice
        maps2, _, _ = step(maps_out, states_out, jnp.asarray(np.stack(Ks)),
                           own_slots, own_seqs, keys)
        assert np.array_equal(np.asarray(maps2.n_kf), n_after)

    def test_sim3_refresh_tracks_scale_drift(self, mesh4):
        """The per-peer Sim3 is RE-verified every `refresh_every` rounds
        (the host path's 5 s scale-alignment timer role): when a peer's
        frame drifts in scale between rounds, the refreshed S_peer tracks
        the new scale instead of staying latched at the first weld
        (round-3 verdict: `S_ok` latched forever)."""
        from dvm_slam_tpu.loopclosing import merge as merge_mod

        rng = np.random.RandomState(6)
        A = 4
        fc = FrontendConfig(height=96, width=128, n_features=64, n_levels=2)
        cfg = trk.TrackerConfig(frontend=fc, kf_cap=16, pt_cap=256, fps=10.0)
        voc = _voc(rng)
        pts = (rng.randn(60, 3) * 1.5 + [0, 0, 8]).astype(np.float32)
        descs = (rng.rand(60, 256) > 0.5).astype(np.uint8)
        maps, Ks = [], []
        for a in range(A):
            m, K = _agent_map(rng, pts, descs, F=fc.capacity)
            maps.append(m)
            Ks.append(K)
        # agent 1 lives in a scaled frame: X_B = S1(X_W), scale 1.3
        s1 = 1.3
        S1 = jnp.asarray([1, 0, 0, 0, 0, 0, 0, s1], jnp.float32)
        maps[1] = merge_mod.transform_map(maps[1], S1)

        step = multi_agent.build_protocol_step(
            mesh4, cfg, voc, window=1, refresh_every=2,
            proj_min_matches=25, sim3_min_inliers=12)
        stacked = multi_agent.stack_agents(maps)
        lv, idf = voc.device_arrays()
        sts = []
        for a in range(A):
            st = multi_agent.create_protocol_state(16, voc.n_words, A,
                                                   refresh_base=2)
            bow0 = vocabulary.bow_vector(
                lv, idf, maps[a].kf_desc[0], maps[a].kf_feat_valid[0],
                voc.branch, voc.n_words)
            st = st._replace(db_bow=st.db_bow.at[0].set(bow0),
                             db_valid=st.db_valid.at[0].set(True))
            sts.append(st)
        states = multi_agent.stack_agents(sts)
        Kb = jnp.asarray(np.stack(Ks))
        keys = jnp.asarray(rng.randint(0, 2 ** 31, (A, 2)), jnp.uint32)

        # round 1 (st.round=0): initial weld — S_peer[0,1] scale ~ 1/1.3
        maps_out, states_out, M = step(
            stacked, states, Kb,
            jnp.ones((A, 1), jnp.int32), jnp.zeros((A, 1), jnp.int32), keys)
        s_before = float(np.asarray(states_out.S_peer)[0, 1, 7])
        assert abs(s_before - 1.0 / s1) < 0.05, s_before

        # agent 1's frame drifts by a further 1.15x between rounds
        sd = 1.15
        Sd = jnp.asarray([1, 0, 0, 0, 0, 0, 0, sd], jnp.float32)
        m1_drift = merge_mod.transform_map(
            jax.tree.map(lambda x: x[1], maps_out), Sd)
        maps_out = jax.tree.map(
            lambda full, one: full.at[1].set(one), maps_out, m1_drift)

        # round 2 (st.round=1): refresh round — the refit must track it
        maps2, states2, _ = step(
            maps_out, states_out, Kb,
            jnp.ones((A, 1), jnp.int32), jnp.ones((A, 1), jnp.int32), keys)
        s_after = float(np.asarray(states2.S_peer)[0, 1, 7])
        assert abs(s_after - 1.0 / (s1 * sd)) < 0.05, (
            f"refresh did not track drift: {s_before} -> {s_after}, "
            f"expected ~{1.0 / (s1 * sd):.3f}")

    def test_backlog_overflow_counted(self, mesh4):
        """Backlog gaps larger than the re-offer window are not silent:
        `state.dropped` counts the keyframes that can never splice
        (round-3 verdict: silent window drop)."""
        rng = np.random.RandomState(7)
        A = 4
        fc = FrontendConfig(height=96, width=128, n_features=64, n_levels=2)
        cfg = trk.TrackerConfig(frontend=fc, kf_cap=16, pt_cap=256, fps=10.0)
        voc = _voc(rng)
        pts = (rng.randn(60, 3) * 1.5 + [0, 0, 8]).astype(np.float32)
        descs = (rng.rand(60, 256) > 0.5).astype(np.uint8)
        maps, Ks = [], []
        for a in range(A):
            m, K = _agent_map(rng, pts, descs, F=fc.capacity)
            maps.append(m)
            Ks.append(K)
        step = multi_agent.build_protocol_step(
            mesh4, cfg, voc, fuse_after=False, window=1,
            refresh_every=1000,
            proj_min_matches=25, sim3_min_inliers=12)
        stacked = multi_agent.stack_agents(maps)
        lv, idf = voc.device_arrays()
        sts = []
        for a in range(A):
            st = multi_agent.create_protocol_state(16, voc.n_words, A,
                                                   refresh_base=1000)
            bow0 = vocabulary.bow_vector(
                lv, idf, maps[a].kf_desc[0], maps[a].kf_feat_valid[0],
                voc.branch, voc.n_words)
            st = st._replace(db_bow=st.db_bow.at[0].set(bow0),
                             db_valid=st.db_valid.at[0].set(True))
            sts.append(st)
        states = multi_agent.stack_agents(sts)
        Kb = jnp.asarray(np.stack(Ks))
        keys = jnp.asarray(rng.randint(0, 2 ** 31, (A, 2)), jnp.uint32)

        # round 1: seq 0 splices everywhere, no gap
        maps_out, states_out, _ = step(
            stacked, states, Kb,
            jnp.ones((A, 1), jnp.int32), jnp.zeros((A, 1), jnp.int32), keys)
        assert int(np.asarray(states_out.dropped).sum()) == 0
        n1 = np.asarray(maps_out.n_kf).copy()

        # round 2: each agent's newest own keyframe jumps to seq 5 — seqs
        # 1-4 slid past the window and are permanently lost
        maps2, states2, _ = step(
            maps_out, states_out, Kb,
            jnp.ones((A, 1), jnp.int32),
            jnp.full((A, 1), 5, jnp.int32), keys)
        dropped = np.asarray(states2.dropped)
        for a in range(A):
            for b in range(A):
                expect = 4 if a != b else 0
                assert dropped[a, b] == expect, (
                    f"dropped[{a},{b}]={dropped[a, b]}, expected {expect}")
        # the fresh (seq-5) keyframes still spliced
        n2 = np.asarray(maps2.n_kf)
        for a in range(A):
            assert n2[a] == n1[a] + A - 1

    def test_refresh_cadence_is_aimd(self, mesh4):
        """The Sim3 refresh cadence is AIMD (`orb_slam3_wrapper.cpp:
        804-812` role): a converged refit doubles the interval, during the
        backed-off window no refit runs (drift stays un-tracked), and the
        next due refit that sees drift resets the interval to base."""
        from dvm_slam_tpu.loopclosing import merge as merge_mod

        rng = np.random.RandomState(8)
        A = 4
        fc = FrontendConfig(height=96, width=128, n_features=64, n_levels=2)
        cfg = trk.TrackerConfig(frontend=fc, kf_cap=16, pt_cap=256, fps=10.0)
        voc = _voc(rng)
        pts = (rng.randn(60, 3) * 1.5 + [0, 0, 8]).astype(np.float32)
        descs = (rng.rand(60, 256) > 0.5).astype(np.uint8)
        maps, Ks = [], []
        for a in range(A):
            m, K = _agent_map(rng, pts, descs, F=fc.capacity)
            maps.append(m)
            Ks.append(K)
        s1 = 1.3
        S1 = jnp.asarray([1, 0, 0, 0, 0, 0, 0, s1], jnp.float32)
        maps[1] = merge_mod.transform_map(maps[1], S1)

        step = multi_agent.build_protocol_step(
            mesh4, cfg, voc, window=1, refresh_every=2,
            proj_min_matches=25, sim3_min_inliers=12)
        stacked = multi_agent.stack_agents(maps)
        lv, idf = voc.device_arrays()
        sts = []
        for a in range(A):
            st = multi_agent.create_protocol_state(16, voc.n_words, A,
                                                   refresh_base=2)
            bow0 = vocabulary.bow_vector(
                lv, idf, maps[a].kf_desc[0], maps[a].kf_feat_valid[0],
                voc.branch, voc.n_words)
            st = st._replace(db_bow=st.db_bow.at[0].set(bow0),
                             db_valid=st.db_valid.at[0].set(True))
            sts.append(st)
        states = multi_agent.stack_agents(sts)
        Kb = jnp.asarray(np.stack(Ks))
        keys = jnp.asarray(rng.randint(0, 2 ** 31, (A, 2)), jnp.uint32)
        slot1 = jnp.ones((A, 1), jnp.int32)

        def run(mp, st, seq):
            return step(mp, st, Kb, slot1,
                        jnp.full((A, 1), seq, jnp.int32), keys)

        # round 0: initial weld; the free-running timer is not reset
        mp, st, _ = run(stacked, states, 0)
        assert np.asarray(st.refresh_interval)[0, 1] == 2
        s_weld = float(np.asarray(st.S_peer)[0, 1, 7])
        assert abs(s_weld - 1.0 / s1) < 0.05

        # round 1: due, refit sees NO new drift -> interval doubles to 4,
        # next refresh at round 1 + 4 = 5
        mp, st, _ = run(mp, st, 1)
        assert np.asarray(st.refresh_interval)[0, 1] == 4, (
            np.asarray(st.refresh_interval)[0])
        assert np.asarray(st.next_refresh)[0, 1] == 5

        # agent 1 drifts a further 1.15x; rounds 2-4 are inside the
        # backed-off window -> no refit, S stays latched at the weld value
        sd = 1.15
        Sd = jnp.asarray([1, 0, 0, 0, 0, 0, 0, sd], jnp.float32)
        m1d = merge_mod.transform_map(jax.tree.map(lambda x: x[1], mp), Sd)
        mp = jax.tree.map(lambda full, one: full.at[1].set(one), mp, m1d)
        for r, seq in ((2, 2), (3, 3), (4, 4)):
            mp, st, _ = run(mp, st, seq)
            s_now = float(np.asarray(st.S_peer)[0, 1, 7])
            assert abs(s_now - s_weld) < 1e-6, f"round {r} refit ran early"

        # round 5: due again -> refit tracks the drift and the DRIFTED
        # refit resets the interval to base
        mp, st, _ = run(mp, st, 5)
        s_after = float(np.asarray(st.S_peer)[0, 1, 7])
        assert abs(s_after - 1.0 / (s1 * sd)) < 0.05, s_after
        assert np.asarray(st.refresh_interval)[0, 1] == 2

    def test_post_merge_gba_restores_perturbed_map(self, mesh4):
        """On-mesh post-merge GBA (`LoopClosing.cc:1796-1799` role): a
        splice into a map whose points were perturbed triggers the bounded
        full-map BA under lax.cond, pulling reprojection error back down;
        with global_ba_after=False the error stays."""
        rng = np.random.RandomState(9)
        A = 4
        fc = FrontendConfig(height=96, width=128, n_features=64, n_levels=2)
        cfg = trk.TrackerConfig(frontend=fc, kf_cap=16, pt_cap=256, fps=10.0)
        voc = _voc(rng)
        pts = (rng.randn(60, 3) * 1.5 + [0, 0, 8]).astype(np.float32)
        descs = (rng.rand(60, 256) > 0.5).astype(np.uint8)
        maps, Ks = [], []
        for a in range(A):
            m, K = _agent_map(rng, pts, descs, F=fc.capacity)
            maps.append(m)
            Ks.append(K)
        # perturb a THIRD of agent 0's points with gross noise: the Sim3
        # verify still passes (the clean majority supplies its inliers;
        # the perturbed ones are RANSAC outliers) while reprojection error
        # becomes O(pixels). Two clean consistent observations per point
        # mean a full-map BA can restore them.
        noise = np.zeros(maps[0].pt_pos.shape, np.float32)
        noise[:20] = rng.randn(20, 3) * 0.3
        maps[0] = maps[0]._replace(pt_pos=maps[0].pt_pos + jnp.asarray(noise))

        def reproj_err(m, a, K):
            """Mean pixel reprojection error over agent a's map."""
            nkf = int(np.asarray(m.n_kf[a]))
            kf_pose = np.asarray(m.kf_pose[a])
            obs = np.asarray(m.kf_obs[a])
            xy = np.asarray(m.kf_xy[a])
            fv = np.asarray(m.kf_feat_valid[a])
            pv = np.asarray(m.pt_valid[a])
            pos = np.asarray(m.pt_pos[a])
            errs = []
            for k in range(nkf):
                sel = fv[k] & (obs[k] >= 0)
                sel &= pv[np.clip(obs[k], 0, None)]
                if not sel.any():
                    continue
                X = pos[obs[k][sel]]
                T = jnp.asarray(kf_pose[k])
                pc = np.asarray(jax.vmap(
                    lambda x: lie.se3_apply(T, x))(jnp.asarray(X)))
                u = K[0] * pc[:, 0] / pc[:, 2] + K[2]
                v = K[1] * pc[:, 1] / pc[:, 2] + K[3]
                errs.append(np.hypot(u - xy[k][sel, 0], v - xy[k][sel, 1]))
            return float(np.concatenate(errs).mean())

        def run(gba):
            # weld BA / pose graph off in BOTH arms: at these tiny caps the
            # welding window covers the whole map, which would mask what
            # the GBA stage itself contributes
            step = multi_agent.build_protocol_step(
                mesh4, cfg, voc, window=1,
                proj_min_matches=25, sim3_min_inliers=12,
                weld_ba=False, pose_graph_after=False,
                global_ba_after=gba, global_ba_iters=8)
            stacked = multi_agent.stack_agents(maps)
            lv, idf = voc.device_arrays()
            sts = []
            for a in range(A):
                st = multi_agent.create_protocol_state(16, voc.n_words, A)
                bow0 = vocabulary.bow_vector(
                    lv, idf, maps[a].kf_desc[0], maps[a].kf_feat_valid[0],
                    voc.branch, voc.n_words)
                st = st._replace(db_bow=st.db_bow.at[0].set(bow0),
                                 db_valid=st.db_valid.at[0].set(True))
                sts.append(st)
            states = multi_agent.stack_agents(sts)
            Kb = jnp.asarray(np.stack(Ks))
            keys = jnp.asarray(rng.randint(0, 2 ** 31, (A, 2)), jnp.uint32)
            mp, st, M = step(stacked, states, Kb,
                             jnp.ones((A, 1), jnp.int32),
                             jnp.zeros((A, 1), jnp.int32), keys)
            assert np.asarray(M)[0, 1], "agents failed to merge"
            assert int(np.asarray(mp.n_kf[0])) > int(np.asarray(
                stacked.n_kf[0])), "no splice happened"
            return reproj_err(mp, 0, Ks[0])

        err_before = reproj_err(multi_agent.stack_agents(maps), 0, Ks[0])
        err_off = run(gba=False)
        err_on = run(gba=True)
        assert err_before > 0.8, f"perturbation too small: {err_before}"
        # without GBA the splice leaves the perturbation in place (the
        # spliced keyframes' clean observations dilute the mean, so the
        # bound is loose — the point is it stays O(err_before), not ~0)
        assert err_off > 0.3 * err_before, (err_off, err_before)
        # the on-mesh GBA pulls it down
        assert err_on < 0.4 * err_off, (err_on, err_off)


@pytest.mark.slow
class TestEightAgentStress:
    def test_two_groups_converge_isolated(self):
        """BASELINE's 8-agent stress config: 8 agents on the full 8-device
        mesh form TWO independent merge groups (0-4 share one world, 5-7
        another); each group reaches transitive closure and splices peer
        keyframes, with zero cross-group contamination."""
        rng = np.random.RandomState(3)
        A = 8
        devs = jax.devices()[:A]
        mesh8 = multi_agent.make_mesh(A, devs)
        fc = FrontendConfig(height=96, width=128, n_features=64, n_levels=2)
        cfg = trk.TrackerConfig(frontend=fc, kf_cap=32, pt_cap=256, fps=10.0)
        voc = _voc(rng)
        group = [0, 0, 0, 0, 0, 1, 1, 1]

        worlds = []
        for g, off in ((0, [0, 0, 8]), (1, [40, 0, 8])):
            pts = (rng.randn(60, 3) * 1.5 + off).astype(np.float32)
            desc = (rng.rand(60, 256) > 0.5).astype(np.uint8)
            worlds.append((pts, desc))

        maps, Ks = [], []
        for a in range(A):
            pts, desc = worlds[group[a]]
            off = ((0.05 * a, -0.02 * a), (0.25 + 0.03 * a, 0.05))
            m, K = _agent_map(rng, pts, desc, kf_cap=32, pt_cap=256,
                              F=fc.capacity, pose_offsets=off)
            maps.append(m)
            Ks.append(K)

        step = multi_agent.build_protocol_step(
            mesh8, cfg, voc, window=1,
            proj_min_matches=25, sim3_min_inliers=12)
        stacked = multi_agent.stack_agents(maps)
        lv, idf = voc.device_arrays()
        sts = []
        for a in range(A):
            st = multi_agent.create_protocol_state(32, voc.n_words, A)
            bow0 = vocabulary.bow_vector(
                lv, idf, maps[a].kf_desc[0], maps[a].kf_feat_valid[0],
                voc.branch, voc.n_words)
            st = st._replace(db_bow=st.db_bow.at[0].set(bow0),
                             db_valid=st.db_valid.at[0].set(True))
            sts.append(st)
        states = multi_agent.stack_agents(sts)
        Kb = jnp.asarray(np.stack(Ks))
        own_slot = jnp.ones((A, 1), jnp.int32)
        own_seq = jnp.zeros((A, 1), jnp.int32)
        keys = jnp.asarray(rng.randint(0, 2 ** 31, (A, 2)), jnp.uint32)

        n_before = np.asarray(stacked.n_kf).copy()
        maps_out, states_out, M = step(stacked, states, Kb, own_slot,
                                       own_seq, keys)
        M = np.asarray(M)
        for i in range(A):
            for j in range(A):
                if i == j:
                    continue
                if group[i] == group[j]:
                    assert M[i, j], f"same-group {i},{j} failed to merge"
                else:
                    assert not M[i, j], f"cross-group {i},{j} merged"

        n_after = np.asarray(maps_out.n_kf)
        sizes = [group.count(group[a]) for a in range(A)]
        for a in range(A):
            assert n_after[a] == n_before[a] + sizes[a] - 1, (
                f"agent {a}: {n_before[a]} -> {n_after[a]} "
                f"(group size {sizes[a]})")

        # second round, fresh sequence ids: every agent splices its peers'
        # fresh keyframes again (dedup passes new, blocks old)
        maps3, _, _ = step(maps_out, states_out, Kb, own_slot,
                           own_seq + 1, keys)
        n3 = np.asarray(maps3.n_kf)
        for a in range(A):
            assert n3[a] == n_after[a] + sizes[a] - 1


class TestSpmdStep:
    def test_spmd_agent_step_shapes(self, mesh4):
        """The per-slice SPMD compute step (front end + tracking + BA +
        BoW all_gather) runs over the mesh — the dryrun contract."""
        import __graft_entry__ as ge

        rng = np.random.RandomState(1)
        cfg, m, img, T, K = ge._small_setup()
        voc = vocabulary.train((rng.rand(600, 256) > 0.5).astype(np.uint8),
                               branch=4, depth=2, seed=0)
        step = multi_agent.build_multi_agent_step(mesh4, cfg, voc)
        A = 4
        maps = multi_agent.stack_agents([m] * A)
        imgs = jnp.stack([img + i for i in range(A)])
        poses = jnp.stack([T] * A)
        Ks = jnp.stack([K] * A)
        T_new, inl, scores, maps_out = step(maps, imgs, poses, Ks)
        assert T_new.shape == (A, 7)
        assert scores.shape == (A, A)
        # off-diagonal scores are real similarities in [0,1], not garbage
        s = np.asarray(scores)
        assert np.all(s >= -1e-3) and np.all(s <= 1 + 1e-3)
        np.testing.assert_allclose(np.diag(s), 1.0, atol=1e-3)
