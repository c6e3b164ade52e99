"""Inter-map Sim(3) alignment and map merging.

TPU-native counterpart of the reference's merge path
(`LoopClosing::NewDetectCommonRegions` -> `DetectCommonRegionsFromBoW`
geometric verification, `LoopClosing.cc:644`; `MergeLocal`,
`LoopClosing.cc:1262`; uuid-relinked map ingestion `Map::PostLoad`,
`Map.cc:420-520`): given a local map A and a foreign map B plus a pair of
matching keyframes found by place recognition, estimate S_ab (B-world ->
A-world Sim3) by descriptor matching + RANSAC Horn + Sim3-guided projection
re-matching, then re-base B and splice it into A's slot arrays with
host-side UUID dedup (duplicate keyframes/points keep A's copy; B's
observation table is remapped through the point slot map).

The reference's "welding bundle adjustment" (`LoopClosing.cc:1657`) is the
caller running `local_ba` around the merge keyframe on the merged map.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import lie
from ..mapping import map_state
from ..ops import matching
from . import sim3_solver

# reference geometric-verification gates (`LoopClosing.cc:647-655`)
N_BOW_MATCHES = 20
N_SIM3_INLIERS = 20
N_PROJ_MATCHES = 50


class Sim3Result(NamedTuple):
    ok: jnp.ndarray       # [] bool
    S_ab: jnp.ndarray     # [8] Sim3 mapping B-world -> A-world
    n_inliers: jnp.ndarray
    n_proj: jnp.ndarray


@partial(jax.jit, static_argnames=("with_scale",))
def compute_sim3_between(key, mA: map_state.MapState, kfA,
                         mB: map_state.MapState, kfB, K,
                         with_scale: bool = True):
    """Estimate S_ab from one candidate keyframe pair.

    with_scale=False fixes s=1 (the reference's `Sim3Solver` bFixScale for
    stereo/RGB-D/inertial maps whose scale is observable,
    `LoopClosing.cc:785`).

    Mirrors `DetectCommonRegionsFromBoW`'s verification chain: descriptor
    matching between the two keyframes' map points (the BoW direct index is
    unnecessary — the dense Hamming matrix is one MXU matmul), RANSAC Horn
    Sim3 on the matched points in camera frames, then Sim3-guided projection
    of B's local points into A's keyframe and a final Horn refit.
    """
    F = mA.feat_capacity
    TA = mA.kf_pose[kfA]
    TB = mB.kf_pose[kfB]

    # features of each KF that carry map points
    obsA = mA.kf_obs[kfA]
    obsB = mB.kf_obs[kfB]
    okA = (obsA >= 0) & mA.kf_feat_valid[kfA]
    okB = (obsB >= 0) & mB.kf_feat_valid[kfB]
    pA = jnp.clip(obsA, 0)
    pB = jnp.clip(obsB, 0)

    dist = matching.hamming_matrix(mA.kf_desc[kfA], mB.kf_desc[kfB])
    mask = okA[:, None] & okB[None, :]
    idx, dd, ok = matching.masked_best_match(dist, mask, matching.TH_LOW, ratio=0.75)
    idx_ba, _, _ = matching.masked_best_match(dist.T, mask.T, matching.TH_LOW)
    idx, mut = matching.mutual_filter(jnp.where(ok, idx, -1), idx_ba)
    ok = ok & mut
    n_matches = jnp.sum(ok)

    j = jnp.clip(idx, 0)
    # matched map points in each camera frame
    XA_w = mA.pt_pos[pA]                        # via A's feature order
    XB_w = mB.pt_pos[pB[j]]
    pcA = jax.vmap(lambda X: lie.se3_apply(TA, X))(XA_w)
    pcB = jax.vmap(lambda X: lie.se3_apply(TB, X))(XB_w)
    uvA = mA.kf_xy[kfA]
    uvB = mB.kf_xy[kfB][j]
    # per-level variance (scale factor 1.2 static here; callers use default)
    sigA = (1.2 ** mA.kf_level[kfA].astype(jnp.float32)) ** 2
    sigB = (1.2 ** mB.kf_level[kfB, j].astype(jnp.float32)) ** 2

    S12, inl, n_inl = sim3_solver.ransac_sim3(
        key, pcA, pcB, uvA, uvB, sigA, sigB, ok, K, with_scale=with_scale
    )  # camB coords -> camA coords

    # ---- guided projection: all B points near kfB into kfA through S12 ----
    # B points in camB frame, then into camA via S12, project, match
    nearB = mB.pt_valid
    XB_all_cb = jax.vmap(lambda X: lie.se3_apply(TB, X))(mB.pt_pos)
    Xb_in_a = lie.sim3_apply(S12[None], XB_all_cb)
    uv_proj = jnp.stack(
        [K[0] * Xb_in_a[:, 0] / jnp.maximum(Xb_in_a[:, 2], 1e-9) + K[2],
         K[1] * Xb_in_a[:, 1] / jnp.maximum(Xb_in_a[:, 2], 1e-9) + K[3]], -1
    )
    d2 = jnp.sum((uv_proj[:, None, :] - mA.kf_xy[kfA][None, :, :]) ** 2, -1)
    pmask = (
        nearB[:, None] & (Xb_in_a[:, 2:3] > 0) & mA.kf_feat_valid[kfA][None, :]
        & (d2 <= (7.5) ** 2)
    )
    pdist = matching.hamming_matrix(mB.pt_desc, mA.kf_desc[kfA])
    pidx, _, pok = matching.masked_best_match(pdist, pmask, matching.TH_HIGH)
    pok = matching.dedupe_matches(pidx, pok, F)
    n_proj = jnp.sum(pok)

    # final refit on the union of RANSAC inliers and projected matches that
    # correspond to A map points
    fj = jnp.clip(pidx, 0)
    obsA_at = mA.kf_obs[kfA][fj]
    strong = pok & (obsA_at >= 0)
    XA2 = jax.vmap(lambda X: lie.se3_apply(TA, X))(mA.pt_pos[jnp.clip(obsA_at, 0)])
    from ..geometry import alignment
    src = jnp.concatenate([pcB, XB_all_cb])      # camB coords
    dst = jnp.concatenate([pcA, XA2])            # camA coords
    w = jnp.concatenate([inl, strong]).astype(pcA.dtype)
    S_ref = alignment.umeyama(src, dst, mask=w, with_scale=with_scale)
    use_ref = n_proj >= N_PROJ_MATCHES
    S12f = jnp.where(use_ref, S_ref, S12)

    # world-level: S_ab = sim3(TA)^-1 . S12 . sim3(TB)
    S_ab = lie.sim3_mul(
        lie.sim3_inv(lie.sim3_from_se3(TA)),
        lie.sim3_mul(S12f, lie.sim3_from_se3(TB)),
    )
    ok_all = (n_matches >= N_BOW_MATCHES) & (n_inl >= N_SIM3_INLIERS) & (
        n_proj >= N_PROJ_MATCHES
    )
    return Sim3Result(ok=ok_all, S_ab=S_ab, n_inliers=n_inl, n_proj=n_proj)


@jax.jit
def transform_map(m: map_state.MapState, S):
    """Re-base an entire map by a world-level Sim3 (`Map::ApplyScaledRotation`
    semantics): points X' = S (X); keyframe poses T'_cw = fold(S_cB . S^-1)
    with the scale folded into the translation."""
    pt = lie.sim3_apply(S[None], m.pt_pos)
    Sinv = lie.sim3_inv(S)

    def newpose(T):
        Sc = lie.sim3_mul(lie.sim3_from_se3(T), Sinv)
        q = lie.sim3_q(Sc)
        t = lie.sim3_t(Sc) / jnp.maximum(lie.sim3_s(Sc), 1e-12)
        return lie.se3(q, t)

    kf = jax.vmap(newpose)(m.kf_pose)
    s = lie.sim3_s(S)
    # viewing normals rotate with the frame (no scale/translation) — leaving
    # them in the old world frame would make the view_cos projection gate
    # reject every re-based point after a large inter-map rotation
    nrm = lie.quat_rotate(lie.sim3_q(S)[None], m.pt_normal)
    return m._replace(
        pt_pos=jnp.where(m.pt_valid[:, None], pt, m.pt_pos),
        pt_normal=jnp.where(m.pt_valid[:, None], nrm, m.pt_normal),
        kf_pose=jnp.where(m.kf_valid[:, None], kf, m.kf_pose),
        pt_min_dist=m.pt_min_dist * s,
        pt_max_dist=m.pt_max_dist * s,
    )


def build_slot_maps(metaA, validA_kf, validA_pt, n_kf_A, n_pt_A,
                    metaB, validB_kf, validB_pt):
    """Host-side UUID dedup (the uuid-relink of `Map::PostLoad`,
    `Map.cc:420-520`): returns (kf_map [KB], pt_map [PB], kf_new [KB],
    pt_new [PB], n_kf_after, n_pt_after) mapping each valid B slot to its A
    slot (existing on uuid match, else a freshly assigned one)."""
    def build(uuidA, validA, n_A, uuidB, validB, cap):
        lut = {tuple(u): i for i, u in enumerate(np.asarray(uuidA)[: int(n_A)])
               if validA[i]}
        mp = np.full(uuidB.shape[0], -1, np.int64)
        new = np.zeros(uuidB.shape[0], bool)
        nxt = int(n_A)
        for j in range(uuidB.shape[0]):
            if not validB[j]:
                continue
            key = tuple(np.asarray(uuidB[j]))
            if key in lut:
                mp[j] = lut[key]
            elif nxt < cap:
                mp[j] = nxt
                new[j] = True
                nxt += 1
        return mp, new, nxt

    kf_map, kf_new, n_kf = build(
        metaA.kf_uuid, validA_kf, n_kf_A, metaB.kf_uuid, validB_kf,
        metaA.kf_uuid.shape[0],
    )
    pt_map, pt_new, n_pt = build(
        metaA.pt_uuid, validA_pt, n_pt_A, metaB.pt_uuid, validB_pt,
        metaA.pt_uuid.shape[0],
    )
    return kf_map, pt_map, kf_new, pt_new, n_kf, n_pt


@jax.jit
def splice_map(mA: map_state.MapState, mB: map_state.MapState,
               kf_map, pt_map, kf_new, pt_new, n_kf_after, n_pt_after):
    """Append B's novel keyframes/points into A at host-assigned slots and
    remap B's observation table through the point slot map. Existing
    (duplicate-uuid) entities keep A's copy — B's observations of them are
    preserved on B's keyframes, which is the duplicate-point fusion contract
    of `LocalMapping::ProcessExternalKeyFrame` (`LocalMapping.cc:308-354`);
    residual duplicates are cleaned by `fuse_duplicates` afterwards."""
    KA = mA.kf_capacity
    PA = mA.pt_capacity

    # --- points ---
    tgt_p = jnp.where(pt_new, pt_map, PA)

    def scat_p(a, b):
        pad = jnp.zeros((1,) + a.shape[1:], a.dtype)
        return jnp.concatenate([a, pad]).at[tgt_p].set(b.astype(a.dtype))[:-1]

    m = mA._replace(
        pt_pos=scat_p(mA.pt_pos, mB.pt_pos),
        pt_valid=scat_p(mA.pt_valid, mB.pt_valid & pt_new),
        pt_desc=scat_p(mA.pt_desc, mB.pt_desc),
        pt_normal=scat_p(mA.pt_normal, mB.pt_normal),
        pt_min_dist=scat_p(mA.pt_min_dist, mB.pt_min_dist),
        pt_max_dist=scat_p(mA.pt_max_dist, mB.pt_max_dist),
        pt_ref_kf=scat_p(mA.pt_ref_kf, jnp.where(mB.pt_ref_kf >= 0, kf_map[jnp.clip(mB.pt_ref_kf, 0)], -1).astype(jnp.int32)),
        pt_visible=scat_p(mA.pt_visible, mB.pt_visible),
        pt_found=scat_p(mA.pt_found, mB.pt_found),
        pt_first_kf=scat_p(mA.pt_first_kf, jnp.where(mB.pt_first_kf >= 0, kf_map[jnp.clip(mB.pt_first_kf, 0)], -1).astype(jnp.int32)),
        n_pt=n_pt_after.astype(jnp.int32),
    )

    # --- keyframes (remap obs through pt_map) ---
    obsB = jnp.where(
        mB.kf_obs >= 0, pt_map[jnp.clip(mB.kf_obs, 0)], -1
    ).astype(jnp.int32)
    tgt_k = jnp.where(kf_new, kf_map, KA)

    def scat_k(a, b):
        pad = jnp.zeros((1,) + a.shape[1:], a.dtype)
        return jnp.concatenate([a, pad]).at[tgt_k].set(b.astype(a.dtype))[:-1]

    m = m._replace(
        kf_pose=scat_k(m.kf_pose, mB.kf_pose),
        kf_valid=scat_k(m.kf_valid, mB.kf_valid & kf_new),
        kf_xy=scat_k(m.kf_xy, mB.kf_xy),
        kf_level=scat_k(m.kf_level, mB.kf_level),
        kf_angle=scat_k(m.kf_angle, mB.kf_angle),
        kf_desc=scat_k(m.kf_desc, mB.kf_desc),
        kf_feat_valid=scat_k(m.kf_feat_valid, mB.kf_feat_valid),
        kf_obs=scat_k(m.kf_obs, obsB),
        kf_ur=scat_k(m.kf_ur, mB.kf_ur),
        n_kf=n_kf_after.astype(jnp.int32),
    )
    return m


def merge_maps(mA, metaA, mB, metaB, S_ab):
    """Full merge: re-base B by S_ab, splice into A (uuid dedup), merge host
    metadata. Returns (merged MapState, merged MapMeta, kf_map, pt_map)."""
    mBt = transform_map(mB, jnp.asarray(S_ab))
    kf_map, pt_map, kf_new, pt_new, n_kf, n_pt = build_slot_maps(
        metaA, np.asarray(mA.kf_valid), np.asarray(mA.pt_valid),
        int(mA.n_kf), int(mA.n_pt),
        metaB, np.asarray(mB.kf_valid), np.asarray(mB.pt_valid),
    )
    merged = splice_map(
        mA, mBt, jnp.asarray(kf_map), jnp.asarray(pt_map),
        jnp.asarray(kf_new), jnp.asarray(pt_new),
        jnp.asarray(n_kf), jnp.asarray(n_pt),
    )
    if (kf_map[np.asarray(mB.kf_valid)] < 0).any() or \
            (pt_map[np.asarray(mB.pt_valid)] < 0).any():
        import warnings
        warnings.warn("merge_maps: capacity overflow dropped keyframes/"
                      "points from the incoming map", stacklevel=2)
    # host metadata — COPY: metaA may be a stored snapshot (atlas stash,
    # async-GBA reference) that must not change if a later stage fails
    meta = map_state.MapMeta(
        kf_uuid=metaA.kf_uuid.copy(), pt_uuid=metaA.pt_uuid.copy(),
        kf_creator=metaA.kf_creator.copy(),
        pt_creator=metaA.pt_creator.copy(), agent_id=metaA.agent_id,
    )
    for j in np.nonzero(kf_new)[0]:
        meta.kf_uuid[kf_map[j]] = metaB.kf_uuid[j]
        meta.kf_creator[kf_map[j]] = metaB.kf_creator[j]
    for j in np.nonzero(pt_new)[0]:
        meta.pt_uuid[pt_map[j]] = metaB.pt_uuid[j]
        meta.pt_creator[pt_map[j]] = metaB.pt_creator[j]
    return merged, meta, kf_map, pt_map
