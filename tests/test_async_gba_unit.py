"""Async post-merge GBA bookkeeping (`LoopClosing.cc:1796-1799` role):
the tracker continuation must move with the corrected map, and any map
splice supersedes (aborts) an in-flight solve."""

import numpy as np
import jax
import jax.numpy as jnp

from dvm_slam_tpu.frontend.extractor import FrontendConfig
from dvm_slam_tpu.geometry import lie
from dvm_slam_tpu.mapping import map_state
from dvm_slam_tpu.multiagent import agent as agent_mod
from dvm_slam_tpu.multiagent import codec, messages as msgs, transport
from dvm_slam_tpu.placerec import vocabulary
from dvm_slam_tpu.tracking import tracker


def _mk_agent():
    rng = np.random.RandomState(0)
    voc = vocabulary.train((rng.rand(600, 256) > 0.5).astype(np.uint8),
                           branch=6, depth=2, seed=0)
    cfg = tracker.TrackerConfig(
        frontend=FrontendConfig(height=240, width=320, n_features=16),
        kf_cap=8, pt_cap=32,
    )
    bus = transport.LoopbackTransport()
    return agent_mod.SlamAgent(
        1, cfg, np.array([260.0, 260.0, 160.0, 120.0], np.float32),
        np.zeros(4, np.float32), voc, bus, [1, 2], autonomous=False,
    ), rng


def _install_map(a, rng):
    """3 keyframes + 4 points directly in the tracker's map mirrors."""
    m = a.tracker.map
    poses = []
    for i in range(3):
        poses.append(lie.se3(lie.so3_exp(jnp.asarray(rng.randn(3) * 0.05)),
                             jnp.asarray(rng.randn(3) * 0.3)))
    m = m._replace(
        kf_pose=m.kf_pose.at[:3].set(jnp.stack(poses)),
        kf_valid=m.kf_valid.at[:3].set(True),
        pt_pos=m.pt_pos.at[:4].set(jnp.asarray(rng.randn(4, 3) + [0, 0, 6])),
        pt_valid=m.pt_valid.at[:4].set(True),
        pt_ref_kf=m.pt_ref_kf.at[:4].set(jnp.asarray([0, 1, 2, 0])),
        n_kf=jnp.int32(3), n_pt=jnp.int32(4),
    )
    a.tracker.map = m
    a.tracker.n_kf_host = 3
    a.tracker.meta.kf_uuid[:3] = a.tracker.meta.new_uuids(3)
    a.tracker.meta.kf_creator[:3] = 1
    a.tracker.meta.pt_uuid[:4] = a.tracker.meta.new_uuids(4)
    a.tracker.meta.pt_creator[:4] = 1
    return m


def test_poll_gba_corrects_tracker_continuation():
    a, rng = _mk_agent()
    m = _install_map(a, rng)
    T_last = lie.se3(lie.so3_exp(jnp.asarray([0.0, 0.1, 0.0])),
                     jnp.asarray([0.5, 0.0, 0.2]))
    a.tracker.last_pose = T_last
    v_before = np.asarray(a.tracker.velocity).copy()

    # fake async result: every snapshot pose shifted by dT
    dT = lie.se3(lie.so3_exp(jnp.asarray([0.0, 0.04, 0.0])),
                 jnp.asarray([0.15, 0.0, -0.1]))
    res_pose = jax.vmap(lambda T: lie.se3_mul(T, dT))(m.kf_pose)
    res_pt = m.pt_pos + 0.1
    anchor = 1
    a._pending_gba = {"res_pose": res_pose, "res_pt": res_pt,
                      "n_kf": 3, "n_pt": 4, "anchor": anchor, "t0": 0.0}
    corr = lie.se3_mul(lie.se3_inv(m.kf_pose[anchor]), res_pose[anchor])
    expect_lp = np.asarray(lie.se3_mul(T_last, corr))

    a._poll_gba(block=True)
    assert any(e[0] == "gba_applied" for e in a.log)
    # the map took the optimized poses...
    np.testing.assert_allclose(np.asarray(a.map.kf_pose[:3]),
                               np.asarray(res_pose[:3]), atol=1e-5)
    # ...and the tracker continuation composed the SAME anchor correction
    # (T' = T . T_anchor_live^-1 . T_anchor_gba) — otherwise the next
    # motion-model prediction starts in the pre-correction frame
    np.testing.assert_allclose(np.asarray(a.tracker.last_pose), expect_lp,
                               atol=1e-5)
    # velocity is a relative delta and must be untouched
    np.testing.assert_allclose(np.asarray(a.tracker.velocity), v_before,
                               atol=1e-7)


def test_splice_aborts_inflight_gba():
    a, rng = _mk_agent()
    _install_map(a, rng)
    a._pending_gba = {"res_pose": a.map.kf_pose, "res_pt": a.map.pt_pos,
                      "n_kf": 3, "n_pt": 4, "anchor": 0, "t0": 0.0}

    # a peer's keyframe packet arrives (uuid-disjoint -> genuine splice)
    mB = map_state.create(8, 32, a.config.frontend.capacity)
    metaB = map_state.MapMeta.create(8, 32, agent_id=2)
    pos = rng.randn(4, 3).astype(np.float32) + [0, 0, 5]
    mB, slots = map_state.add_points(
        mB, jnp.asarray(pos), (rng.rand(4, 256) > 0.5).astype(np.uint8),
        jnp.zeros((4, 3)), jnp.zeros(4), jnp.ones(4), jnp.int32(0),
        jnp.ones(4, bool),
    )
    F = a.config.frontend.capacity
    obs = jnp.full((F,), -1, jnp.int32).at[:4].set(slots[:4])
    mB, _ = map_state.add_keyframe(
        mB, jnp.asarray([1.0, 0, 0, 0, 0.2, 0.1, 0.0]),
        jnp.asarray(rng.rand(F, 2).astype(np.float32) * 100),
        jnp.zeros(F, jnp.int32), jnp.zeros(F),
        (rng.rand(F, 256) > 0.5).astype(np.uint8),
        jnp.ones(F, bool), obs,
    )
    metaB.kf_uuid[0] = metaB.new_uuids(1)[0]
    metaB.kf_creator[0] = 2
    metaB.pt_uuid[:4] = metaB.new_uuids(4)
    metaB.pt_creator[:4] = 2
    mask = np.zeros(8, bool)
    mask[0] = True
    pkt = codec.extract_submap(mB, metaB, mask)

    a._receive_new_key_frames(msgs.NewKeyFrames(2, pkt.to_bytes()))
    # the stale pre-splice solve was superseded, not applied
    assert a._pending_gba is None
    assert ("gba_aborted", "kf_splice") in a.log
    a._poll_gba(block=True)
    assert not any(e[0] == "gba_applied" for e in a.log)
