"""Fast unit tests for merge/codec invariants found in the round-3 review:
transform_map must rotate viewing normals with the frame, materialize must
pad packets from peers with smaller feature budgets, and hostile packets
must fail with ValueError (never leak parser internals)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dvm_slam_tpu.geometry import lie
from dvm_slam_tpu.loopclosing import merge as merge_mod
from dvm_slam_tpu.mapping import map_state
from dvm_slam_tpu.multiagent import codec


def test_transform_map_rotates_normals():
    m = map_state.create(4, 8, 4)
    m, _ = map_state.add_points(
        m, jnp.asarray([[0.0, 0.0, 5.0], [1.0, 0.0, 5.0]]),
        jnp.zeros((2, 256), jnp.uint8),
        jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]]),  # normals
        jnp.zeros(2), jnp.ones(2), jnp.int32(0), jnp.ones(2, bool),
    )
    # 90 deg about x, scale 2: normals rotate, do NOT scale or translate
    S = lie.sim3(lie.so3_exp(jnp.asarray([np.pi / 2, 0.0, 0.0])),
                 jnp.asarray([3.0, 0.0, 0.0]), jnp.float32(2.0))
    out = merge_mod.transform_map(m, S)
    n = np.asarray(out.pt_normal[:2])
    np.testing.assert_allclose(n, [[0.0, 1.0, 0.0]] * 2, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-6)
    # positions DO take the full Sim3
    np.testing.assert_allclose(np.asarray(out.pt_pos[0]),
                               np.asarray(lie.sim3_apply(S, m.pt_pos[0])),
                               atol=1e-5)


def _tiny_packet(rng, F):
    m = map_state.create(4, 8, F)
    meta = map_state.MapMeta.create(4, 8, agent_id=2)
    pos = rng.randn(3, 3).astype(np.float32) + [0, 0, 5]
    m, slots = map_state.add_points(
        m, jnp.asarray(pos), (rng.rand(3, 256) > 0.5).astype(np.uint8),
        jnp.zeros((3, 3)), jnp.zeros(3), jnp.ones(3), jnp.int32(0),
        jnp.ones(3, bool),
    )
    obs = jnp.full((F,), -1, jnp.int32).at[:3].set(slots[:3])
    m, _ = map_state.add_keyframe(
        m, jnp.asarray([1.0, 0, 0, 0, 0.1, 0.0, 0.0]),
        jnp.asarray(rng.rand(F, 2).astype(np.float32) * 60),
        jnp.zeros(F, jnp.int32), jnp.zeros(F),
        (rng.rand(F, 256) > 0.5).astype(np.uint8), jnp.ones(F, bool), obs,
    )
    meta.kf_uuid[0] = meta.new_uuids(1)[0]
    meta.pt_uuid[:3] = meta.new_uuids(3)
    mask = np.zeros(4, bool)
    mask[0] = True
    return codec.extract_submap(m, meta, mask)


def test_materialize_pads_smaller_feature_capacity():
    rng = np.random.RandomState(0)
    pkt = _tiny_packet(rng, F=8)          # peer runs an 8-feature budget
    mB, metaB = codec.materialize(pkt, feat_cap=16)  # mine is 16
    assert mB.feat_capacity == 16
    obs = np.asarray(mB.kf_obs[0])
    assert (obs[8:] == -1).all()          # padding observes nothing
    assert not np.asarray(mB.kf_feat_valid[0][8:]).any()
    assert (np.asarray(mB.kf_ur[0][8:]) == -1.0).all()
    # and the padded map splices cleanly into a 16-capacity map
    mA = map_state.create(8, 16, 16)
    metaA = map_state.MapMeta.create(8, 16, agent_id=1)
    merged, meta, kf_map, pt_map = merge_mod.merge_maps(
        mA, metaA, mB, metaB, lie.sim3_identity())
    assert int(merged.n_kf) == 1 and int(merged.n_pt) == 3
    # oversized packets are rejected with the documented error type
    with pytest.raises(ValueError):
        codec.materialize(_tiny_packet(rng, F=32), feat_cap=16)


def test_hostile_packets_raise_valueerror_only():
    rng = np.random.RandomState(1)
    good = _tiny_packet(rng, F=8).to_bytes()
    cases = {
        "truncated": good[:25],
        "flipped_byte": good[:40] + bytes([good[40] ^ 0xFF]) + good[41:],
        "unknown_dtype": None,  # built below
        "empty": b"",
        "garbage": b"\x00" * 64,
    }
    # an otherwise-valid stream whose first dtype code is bogus
    import io
    import struct
    import zlib
    raw = zlib.decompress(good[8:])
    name_len = raw[8]
    pos = 9 + name_len  # dtype code byte of the first array
    bad = bytearray(raw)
    bad[pos] = 250
    blob = struct.pack("<Q", len(bad)) + zlib.compress(bytes(bad), 6)
    cases["unknown_dtype"] = blob
    for name, blob in cases.items():
        with pytest.raises(ValueError, match="packet"):
            codec.MapPacket.from_bytes(blob)


def test_merge_maps_does_not_mutate_meta_argument():
    rng = np.random.RandomState(2)
    pkt = _tiny_packet(rng, F=8)
    mB, metaB = codec.materialize(pkt, feat_cap=8)
    mA = map_state.create(8, 16, 8)
    metaA = map_state.MapMeta.create(8, 16, agent_id=1)
    snap_kf = metaA.kf_uuid.copy()
    snap_pt = metaA.pt_uuid.copy()
    merged, meta, _, _ = merge_mod.merge_maps(
        mA, metaA, mB, metaB, lie.sim3_identity())
    np.testing.assert_array_equal(metaA.kf_uuid, snap_kf)
    np.testing.assert_array_equal(metaA.pt_uuid, snap_pt)
    # the RETURNED meta carries the spliced identities
    assert meta.kf_uuid[0].sum() != 0
