"""MapState: the struct-of-arrays SLAM map.

This is the TPU-native replacement for the reference's pointer-graph
`Atlas -> Map -> {KeyFrame, MapPoint}` object model
(`orb_slam3/src/{Atlas,Map,KeyFrame,MapPoint}.cc`): one immutable pytree of
fixed-capacity arrays with validity masks. Map growth = writing the next free
slot; culling = clearing a mask bit; "locks" disappear because updates are
functional. Host-side identity metadata (UUIDs, creator agent ids — the DVM
decentralization layer, `KeyFrame.h:315-316`, `MapPoint.h:164-165`) lives in
the `MapMeta` companion (numpy, never traced).

Covisibility is not stored: it is *derived* from the observation table with
one MXU matmul (`covisibility()`), replacing `KeyFrame::UpdateConnections`'s
incremental bookkeeping (`KeyFrame.cc:457`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MapState(NamedTuple):
    """All-device SLAM map. K = keyframe capacity, P = point capacity,
    F = features per keyframe."""

    # --- keyframes ---
    kf_pose: jnp.ndarray    # [K,7] SE3 world->camera (T_cw)
    kf_valid: jnp.ndarray   # [K] bool
    kf_xy: jnp.ndarray      # [K,F,2] undistorted keypoints (level-0 px)
    kf_level: jnp.ndarray   # [K,F] int32
    kf_angle: jnp.ndarray   # [K,F] float32
    kf_desc: jnp.ndarray    # [K,F,256] uint8 {0,1}
    kf_feat_valid: jnp.ndarray  # [K,F] bool
    kf_obs: jnp.ndarray     # [K,F] int32 -> point slot, -1 if none
    kf_ur: jnp.ndarray      # [K,F] float32 stereo right-u (level-0 px),
                            #   -1 = monocular observation (KeyFrame::mvuRight)
    # --- map points ---
    pt_pos: jnp.ndarray     # [P,3] world position
    pt_valid: jnp.ndarray   # [P] bool
    pt_desc: jnp.ndarray    # [P,256] uint8 representative descriptor
    pt_normal: jnp.ndarray  # [P,3] mean viewing direction
    pt_min_dist: jnp.ndarray  # [P] scale-invariance range (MapPoint.cc
    pt_max_dist: jnp.ndarray  # [P]  UpdateNormalAndDepth semantics)
    pt_ref_kf: jnp.ndarray  # [P] int32 reference keyframe slot
    pt_visible: jnp.ndarray  # [P] int32 nVisible (found-ratio culling)
    pt_found: jnp.ndarray    # [P] int32 nFound
    pt_first_kf: jnp.ndarray  # [P] int32 kf slot at creation (culling window)
    # --- counters ---
    n_kf: jnp.ndarray       # [] int32 next keyframe slot
    n_pt: jnp.ndarray       # [] int32 next point slot

    @property
    def kf_capacity(self):
        return self.kf_pose.shape[0]

    @property
    def pt_capacity(self):
        return self.pt_pos.shape[0]

    @property
    def feat_capacity(self):
        return self.kf_xy.shape[1]


@dataclasses.dataclass
class MapMeta:
    """Host-side identity companion of a MapState (never traced).

    kf_uuid/pt_uuid: [cap] uint64x2 (random 128-bit, like the reference's
    boost uuids, `KeyFrame.cc:179`); creator: [cap] int32 agent id."""

    kf_uuid: np.ndarray
    pt_uuid: np.ndarray
    kf_creator: np.ndarray
    pt_creator: np.ndarray
    agent_id: int

    @staticmethod
    def create(kf_cap: int, pt_cap: int, agent_id: int):
        return MapMeta(
            kf_uuid=np.zeros((kf_cap, 2), np.uint64),
            pt_uuid=np.zeros((pt_cap, 2), np.uint64),
            kf_creator=np.full((kf_cap,), -1, np.int32),
            pt_creator=np.full((pt_cap,), -1, np.int32),
            agent_id=agent_id,
        )

    def new_uuids(self, n, rng=None):
        rng = rng or np.random
        return rng.randint(0, 2 ** 63, size=(n, 2)).astype(np.uint64)


def create(kf_cap: int, pt_cap: int, feat_cap: int, dtype=jnp.float32) -> MapState:
    return MapState(
        kf_pose=jnp.zeros((kf_cap, 7), dtype).at[:, 0].set(1.0),
        kf_valid=jnp.zeros((kf_cap,), bool),
        kf_xy=jnp.zeros((kf_cap, feat_cap, 2), dtype),
        kf_level=jnp.zeros((kf_cap, feat_cap), jnp.int32),
        kf_angle=jnp.zeros((kf_cap, feat_cap), dtype),
        kf_desc=jnp.zeros((kf_cap, feat_cap, 256), jnp.uint8),
        kf_feat_valid=jnp.zeros((kf_cap, feat_cap), bool),
        kf_obs=jnp.full((kf_cap, feat_cap), -1, jnp.int32),
        kf_ur=jnp.full((kf_cap, feat_cap), -1.0, dtype),
        pt_pos=jnp.zeros((pt_cap, 3), dtype),
        pt_valid=jnp.zeros((pt_cap,), bool),
        pt_desc=jnp.zeros((pt_cap, 256), jnp.uint8),
        pt_normal=jnp.zeros((pt_cap, 3), dtype),
        pt_min_dist=jnp.zeros((pt_cap,), dtype),
        pt_max_dist=jnp.zeros((pt_cap,), dtype),
        pt_ref_kf=jnp.full((pt_cap,), -1, jnp.int32),
        pt_visible=jnp.zeros((pt_cap,), jnp.int32),
        pt_found=jnp.zeros((pt_cap,), jnp.int32),
        pt_first_kf=jnp.full((pt_cap,), -1, jnp.int32),
        n_kf=jnp.zeros((), jnp.int32),
        n_pt=jnp.zeros((), jnp.int32),
    )


def stack_maps(maps) -> MapState:
    """Stack N same-capacity maps on a leading batch axis (one per agent)
    for batched device work (`local_ba_batched`, vmapped tracking)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *maps)


def unstack_maps(ms: MapState, n: int):
    """Inverse of `stack_maps`: split the batch axis back into N maps."""
    return [jax.tree_util.tree_map(lambda x: x[i], ms) for i in range(n)]


# --------------------------------------------------------------------------
# derived structures
# --------------------------------------------------------------------------

def incidence(m: MapState):
    """[K,P] bool observation incidence matrix (KF i observes point j).

    Computed as a tiled compare-reduce (any_f obs[k,f]==p) rather than a
    scatter: TPU scatters serialize; the broadcast-compare fuses into a
    vectorized reduction and measures ~1.5x faster at [128,1300]x8192."""
    K, F = m.kf_obs.shape
    P = m.pt_capacity
    obs = jnp.where(m.kf_obs >= 0, m.kf_obs, P)  # overflow slot
    tile = 16 if K % 16 == 0 else (8 if K % 8 == 0 else 1)

    def one_tile(ob):  # [kt,F] -> [kt,P]
        oh = ob[:, :, None] == jnp.arange(P, dtype=jnp.int32)[None, None, :]
        return jnp.any(oh, axis=1)

    M = jax.lax.map(one_tile, obs.reshape(K // tile, tile, F)).reshape(K, P)
    return M & m.kf_valid[:, None] & m.pt_valid[None, :]


def covisibility(m: MapState):
    """[K,K] int32 shared-observation counts (KeyFrame::GetCovisiblesByWeight
    equivalent source data) — one int8 matmul over the incidence matrix."""
    # bf16 MXU matmul with f32 accumulation: exact for {0,1} inputs
    M = incidence(m).astype(jnp.bfloat16)
    W = jax.lax.dot_general(
        M, M, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(jnp.int32)
    return W * (1 - jnp.eye(W.shape[0], dtype=jnp.int32))


def point_observers(m: MapState):
    """[P] int32 number of observing keyframes per point."""
    return jnp.sum(incidence(m), axis=0).astype(jnp.int32)


def _first_occurrence(obs):
    """[...,F] bool: True where obs[...,f] is the FIRST feature in its row
    pointing at that point slot. After `fuse_duplicates` remaps
    observations, one row can reference the same point through several
    features; counting structures (covisibility, observer counts) must
    count such a (KF, point) pair ONCE, like incidence's any-reduction."""
    F = obs.shape[-1]
    eq = obs[..., None, :] == obs[..., :, None]          # [...,F,F]
    return jnp.argmax(eq, axis=-1) == jnp.arange(F)


def point_observers_scatter(m: MapState):
    """`point_observers` as a [K*F] scatter-add instead of the [K,F,P]
    compare-reduce: far less arithmetic, but TPU scatters serialize —
    benchmarks/tpu_sweep.py measures which wins on the real chip."""
    P = m.pt_capacity
    live = ((m.kf_obs >= 0) & m.kf_valid[:, None]
            & _first_occurrence(m.kf_obs))
    tgt = jnp.where(live, m.kf_obs, P)  # overflow slot
    counts = jnp.zeros((P + 1,), jnp.int32).at[tgt.reshape(-1)].add(
        live.reshape(-1).astype(jnp.int32),
    )[:P]
    return jnp.where(m.pt_valid, counts, 0)


def covis_row(m: MapState, center):
    """[K] int32 covisibility row of keyframe `center`, bit-equal to
    `covisibility(m)[center]` WITHOUT materializing the [K,P] incidence:
    compare every row's observations against the center's dedup'd point
    list ([K,F,F] tiled compare-any — ~P/F times less arithmetic than the
    [K,F,P] incidence at P=8192, F~1300)."""
    K, F = m.kf_obs.shape
    obs_c = m.kf_obs[center]                                  # [F]
    ok_c = ((obs_c >= 0) & _first_occurrence(obs_c)
            & m.pt_valid[jnp.clip(obs_c, 0)])
    ref = jnp.where(ok_c, obs_c, -2)   # -2: never matches (-1 = empty slot)
    tile = 16 if K % 16 == 0 else (8 if K % 8 == 0 else 1)

    def one_tile(ob):  # [kt,F] -> [kt]: distinct center-points seen
        hit = ob[:, :, None] == ref[None, None, :]            # [kt,F,F]
        return jnp.sum(jnp.any(hit, axis=1), axis=1)

    cov = jax.lax.map(
        one_tile, m.kf_obs.reshape(K // tile, tile, F)
    ).reshape(K).astype(jnp.int32)
    return jnp.where(
        m.kf_valid & (jnp.arange(m.kf_capacity) != center), cov, 0
    )


# --------------------------------------------------------------------------
# mutation ops (pure; all fixed-shape)
# --------------------------------------------------------------------------

@jax.jit
def add_keyframe(m: MapState, pose, xy, level, angle, desc, feat_valid, obs,
                 ur=None):
    """Append a keyframe at slot n_kf. obs: [F] int32 point slots (-1 none);
    ur: optional [F] stereo right-u (-1 mono). Returns (map, slot)."""
    i = m.n_kf
    if ur is None:
        ur = jnp.full(xy.shape[:1], -1.0, m.kf_ur.dtype)
    m = m._replace(
        kf_pose=m.kf_pose.at[i].set(pose),
        kf_valid=m.kf_valid.at[i].set(True),
        kf_xy=m.kf_xy.at[i].set(xy),
        kf_level=m.kf_level.at[i].set(level),
        kf_angle=m.kf_angle.at[i].set(angle),
        kf_desc=m.kf_desc.at[i].set(desc),
        kf_feat_valid=m.kf_feat_valid.at[i].set(feat_valid),
        kf_obs=m.kf_obs.at[i].set(obs),
        kf_ur=m.kf_ur.at[i].set(ur),
        n_kf=m.n_kf + 1,
    )
    return m, i


@jax.jit
def add_points(m: MapState, pos, desc, normal, min_dist, max_dist, ref_kf, valid):
    """Append up to N points at slots [n_pt, n_pt+N) — only rows with
    valid=True are activated, but slots are consumed contiguously so that
    row r lands at slot n_pt + cumsum(valid)[r]-1. Returns (map, slot [N])."""
    n = pos.shape[0]
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    slot = jnp.where(valid, m.n_pt + rank, m.pt_capacity)  # overflow -> dropped
    in_cap = slot < m.pt_capacity
    w = valid & in_cap
    slot_c = jnp.where(w, slot, m.pt_capacity)  # clip writes to overflow row

    def scat(arr, vals):
        # rows with w=False target the sacrificial pad row, then dropped
        pad = jnp.zeros((1,) + arr.shape[1:], arr.dtype)
        big = jnp.concatenate([arr, pad])
        return big.at[slot_c].set(vals.astype(arr.dtype))[:-1]

    m = m._replace(
        pt_pos=scat(m.pt_pos, pos),
        pt_valid=scat(m.pt_valid, w),
        pt_desc=scat(m.pt_desc, desc),
        pt_normal=scat(m.pt_normal, normal),
        pt_min_dist=scat(m.pt_min_dist, min_dist),
        pt_max_dist=scat(m.pt_max_dist, max_dist),
        pt_ref_kf=scat(m.pt_ref_kf, jnp.broadcast_to(ref_kf, (n,)).astype(jnp.int32)),
        pt_first_kf=scat(m.pt_first_kf, jnp.broadcast_to(ref_kf, (n,)).astype(jnp.int32)),
        pt_visible=scat(m.pt_visible, jnp.ones((n,), jnp.int32)),
        pt_found=scat(m.pt_found, jnp.ones((n,), jnp.int32)),
        n_pt=jnp.minimum(m.n_pt + jnp.sum(w), m.pt_capacity),
    )
    return m, jnp.where(w, slot, -1)


def check_invariants(m: MapState) -> list:
    """Runtime consistency checks (`Map::CheckEssentialGraph` role,
    `Map.h:129-130`): returns a list of violation strings (empty = healthy).
    Host-side debug utility, not jitted."""
    import numpy as np

    errs = []
    n_kf, n_pt = int(m.n_kf), int(m.n_pt)
    kf_valid = np.asarray(m.kf_valid)
    pt_valid = np.asarray(m.pt_valid)
    obs = np.asarray(m.kf_obs)
    if kf_valid[n_kf:].any():
        errs.append("kf_valid set beyond n_kf")
    if pt_valid[n_pt:].any():
        errs.append("pt_valid set beyond n_pt")
    live = obs[kf_valid]
    live = live[live >= 0]
    if live.size and live.max() >= m.pt_capacity:
        errs.append("kf_obs points past pt capacity")
    if live.size:
        dead = ~pt_valid[live]
        if dead.any():
            errs.append(f"{int(dead.sum())} observations reference invalid points")
    ref = np.asarray(m.pt_ref_kf)[pt_valid]
    if ref.size and (ref >= 0).any():
        bad = ref[(ref >= 0) & ((ref >= m.kf_capacity) | ~kf_valid[np.clip(ref, 0, m.kf_capacity - 1)])]
        if bad.size:
            errs.append(f"{bad.size} points reference invalid ref keyframes")
    pos = np.asarray(m.pt_pos)[pt_valid]
    if pos.size and not np.isfinite(pos).all():
        errs.append("non-finite point positions")
    poses = np.asarray(m.kf_pose)[kf_valid]
    if poses.size and not np.isfinite(poses).all():
        errs.append("non-finite keyframe poses")
    return errs


def predict_scale(dist, max_dist, n_levels: int, scale_factor: float):
    """`MapPoint::PredictScale`: level = ceil(log(max_dist/dist)/log(sf))."""
    ratio = jnp.maximum(max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    lv = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / np.log(scale_factor))
    return jnp.clip(lv, 0, n_levels - 1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_levels", "scale_factor", "with_desc"))
def update_point_stats(m: MapState, n_levels: int, scale_factor: float,
                       with_desc: bool = True):
    """Recompute normals, distance ranges and representative descriptors for
    all valid points in one batched pass (`MapPoint::UpdateNormalAndDepth` +
    `ComputeDistinctiveDescriptors`, `MapPoint.cc`).

    Representative descriptor = per-point *rounded bit-mean* of its observing
    keyframes' descriptors (majority vote per bit). This differs from the
    reference's min-median-distance pick but preserves the contract (a
    descriptor near the cluster center) and is a single matmul.

    `with_desc=False` refreshes geometry only (normals + distance ranges):
    the post-BA refresh needs it because BA moves points and poses, but the
    observation set — what the descriptor vote depends on — is unchanged by
    BA, and the [K,P,256] descriptor gather+vote is the expensive half of
    this pass (the reference mirrors this: `UpdateNormalAndDepth` is called
    after pose/point updates, `ComputeDistinctiveDescriptors` only when
    observations change, `Optimizer.cc` vs `MapPoint.cc` call sites).
    """
    from ..geometry import lie

    M = incidence(m)                       # [K,P]
    counts = jnp.maximum(jnp.sum(M, axis=0), 1)  # [P]
    centers = lie.se3_t(jax.vmap(lie.se3_inv)(m.kf_pose))  # [K,3] camera centers

    # mean viewing direction
    diff = m.pt_pos[None, :, :] - centers[:, None, :]        # [K,P,3]
    dist = jnp.linalg.norm(diff, axis=-1)                    # [K,P]
    dirs = diff / jnp.maximum(dist[..., None], 1e-9)
    normal = jnp.einsum("kp,kpd->pd", M.astype(dirs.dtype), dirs) / counts[:, None]

    # scale-invariance distances from the reference keyframe observation
    ref = jnp.clip(m.pt_ref_kf, 0)
    ref_dist = dist[ref, jnp.arange(m.pt_capacity)]
    # level of the observing feature in the ref keyframe
    feat_idx = jnp.argmax(
        (m.kf_obs[ref] == jnp.arange(m.pt_capacity)[:, None]), axis=-1
    )
    lv = m.kf_level[ref, feat_idx]
    sf = scale_factor ** lv.astype(m.pt_pos.dtype)
    max_d = ref_dist * sf
    min_d = max_d / (scale_factor ** (n_levels - 1))

    keep = m.pt_valid
    out = m._replace(
        pt_normal=jnp.where(keep[:, None], normal, m.pt_normal),
        pt_max_dist=jnp.where(keep, max_d, m.pt_max_dist),
        pt_min_dist=jnp.where(keep, min_d, m.pt_min_dist),
    )
    if not with_desc:
        return out

    # majority-vote descriptor over observers: gather per-KF descriptor of the
    # feature observing each point
    # desc_of_obs[k,p] = kf_desc[k, feat observing p] if M[k,p]
    K, F = m.kf_obs.shape
    P = m.pt_capacity
    # feature index per (k, p): argmax over F of (kf_obs[k]==p)
    # computed as scatter: for each (k,f) with obs>=0 write f at [k, obs]
    obs = jnp.where(m.kf_obs >= 0, m.kf_obs, P)
    feat_of = jnp.zeros((K, P + 1), jnp.int32).at[
        jnp.arange(K)[:, None], obs
    ].set(jnp.broadcast_to(jnp.arange(F)[None, :], (K, F)))[:, :P]
    dsel = jnp.take_along_axis(
        m.kf_desc, feat_of[:, :, None].clip(0, F - 1), axis=1
    )  # [K,P,256]
    # bf16 mask-and-reduce with f32 accumulation: every value is a small
    # integer (bits 0/1, counts <= K <= 256 exact in bf16's 8-bit mantissa),
    # so the vote is bit-exact at half the HBM traffic of f32
    votes = jnp.einsum("kp,kpb->pb", M.astype(jnp.bfloat16),
                       dsel.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    desc = (votes * 2 > counts[:, None].astype(jnp.float32)).astype(jnp.uint8)
    return out._replace(pt_desc=jnp.where(keep[:, None], desc, m.pt_desc))
