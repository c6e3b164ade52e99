"""Local mapping: new-point triangulation, duplicate fusion, windowed BA,
map-point culling.

TPU-native `LocalMapping` (`orb_slam3/src/LocalMapping.cc`): the reference's
mapping thread becomes a set of jitted batch ops driven by a host
`LocalMapper`. Pipeline per keyframe (reference loop `LocalMapping.cc:78-300`):

  ProcessNewKeyFrame  -> observation wiring happens at insert (tracker)
  MapPointCulling     -> `cull_points` (mask update; `LocalMapping.cc:410`)
  CreateNewMapPoints  -> `create_new_points` (epipolar match + batched
                         triangulation over the top-NN covisible keyframes;
                         `LocalMapping.cc:446`, `ORBmatcher.cc:836`)
  SearchInNeighbors   -> `fuse_duplicates` (projection fuse + point-merge
                         remap table; `LocalMapping.cc:757`, `ORBmatcher.cc:1060`)
  LocalBundleAdjustment -> `local_ba` (windowed Schur LM; `Optimizer.cc:1030`)
  KeyFrameCulling     -> intentionally disabled, like the reference
                         (`LocalMapping.cc:933` returns immediately:
                         "Dont to any keyframe culling").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import lie, triangulation as tri
from ..ops import matching
from . import ba, map_state


# --------------------------------------------------------------------------
# new point creation
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_neighbors", "n_levels", "scale_factor"))
def create_new_points(m: map_state.MapState, center, K,
                      n_neighbors: int = 5,
                      n_levels: int = 8, scale_factor: float = 1.2):
    """Triangulate new map points between the center KF and its top covisible
    neighbors (`LocalMapping::CreateNewMapPoints` semantics).

    Returns (map, n_added)."""
    scales = jnp.asarray([scale_factor ** i for i in range(n_levels)], m.pt_pos.dtype)
    sigma2 = scales * scales
    F = m.feat_capacity
    f = K[0]

    cov = map_state.covis_row(m, center)                       # [K]
    nw, nidx = jax.lax.top_k(cov, n_neighbors)
    nvalid = (nw > 0) & m.kf_valid[nidx]

    Tc = m.kf_pose[center]
    xc = (m.kf_xy[center] - K[None, 2:4]) / K[None, 0:2]       # normalized
    xc3 = jnp.concatenate([xc, jnp.ones((F, 1), xc.dtype)], -1)
    free_c = (m.kf_obs[center] < 0) & m.kf_feat_valid[center]

    # median scene depth of center KF for the baseline check
    pc_all = jax.vmap(lambda X: lie.se3_apply(Tc, X))(m.pt_pos)
    obs_c = m.kf_obs[center]
    zvals = jnp.where(
        (obs_c >= 0), pc_all[jnp.clip(obs_c, 0), 2], jnp.nan
    )
    med_depth = jnp.nanmedian(zvals)
    med_depth = jnp.where(jnp.isfinite(med_depth), med_depth, 1.0)

    def per_neighbor(n, valid_n):
        Tn = m.kf_pose[n]
        # relative pose c -> n
        Tnc = lie.se3_mul(Tn, lie.se3_inv(Tc))
        R = lie.quat_to_matrix(lie.se3_q(Tnc))
        t = lie.se3_t(Tnc)
        baseline = jnp.linalg.norm(
            lie.se3_t(lie.se3_inv(Tn)) - lie.se3_t(lie.se3_inv(Tc))
        )
        enough_baseline = baseline / jnp.maximum(med_depth, 1e-9) > 0.01

        E = lie.hat(t) @ R  # xn^T E xc = 0
        xn = (m.kf_xy[n] - K[None, 2:4]) / K[None, 0:2]
        xn3 = jnp.concatenate([xn, jnp.ones((F, 1), xn.dtype)], -1)
        free_n = (m.kf_obs[n] < 0) & m.kf_feat_valid[n]

        sig_n = sigma2[m.kf_level[n]] / (f * f)  # normalized units
        epi = matching.epipolar_mask(xc3, xn3, E, sig_n)
        dist = matching.hamming_matrix(m.kf_desc[center], m.kf_desc[n])
        mask = epi & free_c[:, None] & free_n[None, :] & valid_n & enough_baseline
        idx, dd, ok = matching.masked_best_match(dist, mask, matching.TH_LOW, ratio=0.75)
        ok = matching.dedupe_matches(idx, ok, F)
        j = jnp.clip(idx, 0)

        # triangulate
        Tcb = jnp.broadcast_to(Tc, (F, 7))
        Tnb = jnp.broadcast_to(Tn, (F, 7))
        X, okt = tri.triangulate(xc, xn[j], Tcb, Tnb)
        z1 = jax.vmap(lambda p: lie.se3_apply(Tc, p))(X)[:, 2]
        z2 = jax.vmap(lambda p: lie.se3_apply(Tn, p))(X)[:, 2]
        cpar = tri.parallax_cos(Tcb, Tnb, X)
        # reprojection chi2 in px
        def reproj_err(T, xn_obs, Xp):
            pc = jax.vmap(lambda p: lie.se3_apply(T, p))(Xp)
            uv = pc[:, :2] / jnp.maximum(pc[:, 2:3], 1e-9)
            return jnp.sum((uv - xn_obs) ** 2, -1) * f * f

        e1 = reproj_err(Tc, xc, X)
        e2 = reproj_err(Tn, xn[j], X)
        s1 = sigma2[m.kf_level[center]]
        s2 = sigma2[m.kf_level[n, j]]
        # scale consistency (ratioDist vs ratioOctave within 1.5x)
        d1 = jnp.linalg.norm(X - lie.se3_t(lie.se3_inv(Tc))[None], axis=-1)
        d2 = jnp.linalg.norm(X - lie.se3_t(lie.se3_inv(Tn))[None], axis=-1)
        ratio_d = d2 / jnp.maximum(d1, 1e-9)
        ratio_o = scales[m.kf_level[center]] / scales[m.kf_level[n, j]]
        scale_ok = (ratio_d < ratio_o * scale_factor * 1.5) & (
            ratio_d * scale_factor * 1.5 > ratio_o
        )
        good = (
            ok & okt & (z1 > 0) & (z2 > 0) & (cpar < 0.9998)
            & (e1 < 5.991 * s1) & (e2 < 5.991 * s2) & scale_ok
        )
        return X, jnp.where(good, j, -1), good

    Xs, js, goods = jax.vmap(per_neighbor)(nidx, nvalid)  # [NN,F,...]

    # one new point per center feature: pick the first neighbor that produced
    # a good triangulation for it
    any_good = jnp.any(goods, axis=0)                      # [F]
    first = jnp.argmax(goods, axis=0)                      # [NN index]
    Xsel = Xs[first, jnp.arange(F)]
    jsel = js[first, jnp.arange(F)]
    nsel = nidx[first]

    m2, slots = map_state.add_points(
        m,
        pos=Xsel,
        desc=m.kf_desc[center],
        normal=jnp.zeros((F, 3), m.pt_pos.dtype),
        min_dist=jnp.zeros((F,), m.pt_pos.dtype),
        max_dist=jnp.full((F,), 1e9, m.pt_pos.dtype),
        ref_kf=center,
        valid=any_good,
    )
    added = slots >= 0
    # wire observations: center feature -> slot, neighbor feature -> slot
    kf_obs = m2.kf_obs.at[center].set(
        jnp.where(added, slots, m2.kf_obs[center])
    )
    # neighbor scatter (rows nsel, cols jsel); invalid -> pad row
    Kcap = m2.kf_capacity
    rown = jnp.where(added, nsel, Kcap)
    coln = jnp.where(added, jsel, 0)
    pad = jnp.full((1, F), -1, jnp.int32)
    big = jnp.concatenate([kf_obs, pad])
    big = big.at[rown, coln].set(jnp.where(added, slots, big[rown, coln]))
    kf_obs = big[:-1]
    return m2._replace(kf_obs=kf_obs), jnp.sum(added)


# --------------------------------------------------------------------------
# fusion of duplicate points
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_neighbors", "n_levels", "scale_factor"))
def fuse_duplicates(m: map_state.MapState, center, K,
                    n_neighbors: int = 5,
                    n_levels: int = 8, scale_factor: float = 1.2):
    """Project the center KF's points into its neighbors and fuse
    (`LocalMapping::SearchInNeighbors` + `ORBmatcher::Fuse`):
      - matched feature already observes another point -> merge the two
        points (keep the more-observed one, remap the other everywhere);
      - matched feature is free -> add the observation.
    """
    scales = jnp.asarray([scale_factor ** i for i in range(n_levels)], m.pt_pos.dtype)
    F = m.feat_capacity
    P = m.pt_capacity

    cov = map_state.covis_row(m, center)
    nw, nidx = jax.lax.top_k(cov, n_neighbors)
    nvalid = (nw > 0) & m.kf_valid[nidx]

    pts_c = m.kf_obs[center]                      # [F] point slots of center
    src_valid = (pts_c >= 0) & m.kf_feat_valid[center]
    psl = jnp.clip(pts_c, 0)
    pos = m.pt_pos[psl]
    desc = m.pt_desc[psl]

    n_obs = map_state.point_observers(m)          # [P]

    def per_neighbor(n, valid_n):
        Tn = m.kf_pose[n]
        pc = jax.vmap(lambda X: lie.se3_apply(Tn, X))(pos)
        uv, front = jax.vmap(lambda p: (K[0:2] * p[:2] / jnp.maximum(p[2], 1e-9) + K[2:4], p[2] > 0))(pc)
        dist_c = jnp.linalg.norm(pos - lie.se3_t(lie.se3_inv(Tn))[None], axis=-1)
        lvl = map_state.predict_scale(
            dist_c, m.pt_max_dist[psl], n_levels, scale_factor
        )
        radii = 3.0 * scales[lvl]
        dmat = matching.hamming_matrix(desc, m.kf_desc[n])
        d2 = jnp.sum((uv[:, None, :] - m.kf_xy[n][None, :, :]) ** 2, -1)
        lvl_ok = jnp.abs(m.kf_level[n][None, :] - lvl[:, None]) <= 1
        mask = (
            (d2 <= radii[:, None] ** 2) & lvl_ok & src_valid[:, None]
            & m.kf_feat_valid[n][None, :] & front[:, None] & valid_n
        )
        idx, dd, ok = matching.masked_best_match(dmat, mask, matching.TH_LOW)
        ok = matching.dedupe_matches(idx, ok, F)
        return jnp.where(ok, idx, -1), ok

    idxs, oks = jax.vmap(per_neighbor)(nidx, nvalid)   # [NN,F]

    # build merge remap + new observations
    remap = jnp.arange(P, dtype=jnp.int32)
    kf_obs = m.kf_obs
    pt_valid = m.pt_valid

    NN = nidx.shape[0]
    for ni in range(NN):  # static unroll over neighbors
        n = nidx[ni]
        ok = oks[ni]
        feat = jnp.clip(idxs[ni], 0)
        tgt = kf_obs[n, feat]                     # existing point at target
        p_src = remap[psl]                        # follow prior merges
        has_tgt = (tgt >= 0) & ok
        tgt_c = jnp.clip(remap[jnp.clip(tgt, 0)], 0)
        # merge: keep the point with more observers
        keep_src = n_obs[p_src] >= n_obs[tgt_c]
        winner = jnp.where(keep_src, p_src, tgt_c)
        loser = jnp.where(keep_src, tgt_c, p_src)
        do_merge = has_tgt & (p_src != tgt_c) & src_valid
        # update remap: loser -> winner (one hop per round)
        remap = remap.at[jnp.where(do_merge, loser, P - 1)].set(
            jnp.where(do_merge, winner, remap[P - 1])
        )
        pt_valid = pt_valid & ~(
            jnp.zeros((P,), bool).at[jnp.where(do_merge, loser, 0)].set(do_merge)
        )
        # free feature -> add observation of src point
        add_obs = ok & (tgt < 0) & src_valid
        kf_obs = kf_obs.at[n, jnp.where(add_obs, feat, F - 1)].set(
            jnp.where(add_obs, p_src, kf_obs[n, F - 1])
        )

    # apply remap across the whole observation table
    kf_obs = jnp.where(kf_obs >= 0, remap[jnp.clip(kf_obs, 0)], -1)
    return m._replace(kf_obs=kf_obs, pt_valid=pt_valid)


# --------------------------------------------------------------------------
# culling
# --------------------------------------------------------------------------

@jax.jit
def cull_points(m: map_state.MapState, current_kf):
    """`LocalMapping::MapPointCulling` (`LocalMapping.cc:410`):
      - found/visible ratio < 0.25 -> bad
      - >= 2 keyframes since creation and <= 2 observers -> bad
      - survived 3 keyframes -> permanent (we simply stop testing).
    """
    age = current_kf - m.pt_first_kf
    ratio = m.pt_found.astype(jnp.float32) / jnp.maximum(m.pt_visible, 1).astype(jnp.float32)
    nobs = map_state.point_observers(m)
    young = age <= 3
    bad = (ratio < 0.25) & young
    bad = bad | ((age >= 2) & (nobs <= 2) & young)
    keep = m.pt_valid & ~bad
    # drop observations of culled points
    dead = m.pt_valid & bad
    kf_obs = jnp.where(
        (m.kf_obs >= 0) & dead[jnp.clip(m.kf_obs, 0)], -1, m.kf_obs
    )
    return m._replace(pt_valid=keep, kf_obs=kf_obs)


# --------------------------------------------------------------------------
# windowed bundle adjustment
# --------------------------------------------------------------------------

def _compact_obs(kf_xy, kf_sig, obs_pt, n_obs: int, kf_ur=None):
    """Keep the `n_obs` best slots per keyframe row (valid observations
    first). The feature table is mostly masked slots — compaction cuts every
    per-observation gather/scatter in the BA iterations proportionally."""
    score = (obs_pt >= 0).astype(jnp.float32)
    _, sel = jax.lax.top_k(score, n_obs)              # [L,n_obs]
    take = lambda a: jnp.take_along_axis(a, sel, axis=1)
    return (
        jnp.take_along_axis(kf_xy, sel[..., None], axis=1),
        take(kf_sig),
        take(obs_pt),
        None if kf_ur is None else take(kf_ur),
    )


@partial(jax.jit, static_argnames=("n_local", "n_fixed", "n_pts", "iters", "n_levels", "scale_factor", "n_obs"))
def local_ba(m: map_state.MapState, center, K,
             n_local: int = 16, n_fixed: int = 16, n_pts: int = 4096,
             iters: int = 6, n_levels: int = 8, scale_factor: float = 1.2,
             n_obs: int = 512, bf=None):
    """Covisibility-window BA around `center` (`Optimizer::LocalBundleAdjustment`
    window semantics, `Optimizer.cc:1030-1107`): local = center + covisible
    keyframes; points = those observed by local keyframes; fixed = other
    observers of those points + keyframe 0."""
    scales = jnp.asarray([scale_factor ** i for i in range(n_levels)], m.pt_pos.dtype)
    sigma2_lv = scales * scales
    P = m.pt_capacity
    F = m.feat_capacity
    n_pts = min(n_pts, P)  # small maps: window cannot exceed capacity
    n_local = min(n_local, int(m.kf_capacity) + 1)  # top_k(cov, n_local-1)
    n_fixed = min(n_fixed, int(m.kf_capacity))

    # covisibility ROW of `center` without materializing [K,P] incidence
    # (map_state.covis_row: flagged gather, no scatters)
    obs_all = jnp.where(m.kf_obs >= 0, m.kf_obs, P)           # [K,F]
    cov = map_state.covis_row(m, center)
    cw, cidx = jax.lax.top_k(cov, n_local - 1)
    lmask = jnp.concatenate([jnp.array([True]), (cw > 0) & m.kf_valid[cidx]])
    lidx = jnp.concatenate([center[None].astype(jnp.int32), cidx.astype(jnp.int32)])

    # local points: observed by any local KF (compare-any, L rows only)
    obs_l = m.kf_obs[lidx]                                   # [L,F]
    obs_l = jnp.where(lmask[:, None], obs_l, -1)
    is_local_pt = jnp.any(
        (obs_l.reshape(-1)[None, :] == jnp.arange(P, dtype=jnp.int32)[:, None])
        & (obs_l.reshape(-1) >= 0)[None, :], axis=1
    ) & m.pt_valid
    # select top n_pts local points ranked by tracked-observation count
    # (the pt_found counter the tracker maintains per frame), so when the
    # window holds more than n_pts the best-constrained points win (not the
    # lowest slots). pt_found is a free proxy for the KF-observer count —
    # recomputing exact observer counts needs a [K,P] incidence reduction
    # that costs more than the whole solver's per-iteration step.
    sel_score = jnp.where(is_local_pt, 1.0 + m.pt_found.astype(jnp.float32),
                          0.0)
    _, sel = jax.lax.top_k(sel_score, n_pts)
    sel_ok = is_local_pt[sel]
    inv = jnp.full((P + 1,), -1, jnp.int32).at[jnp.where(sel_ok, sel, P)].set(
        jnp.arange(n_pts, dtype=jnp.int32)
    )[: P + 1]

    # fixed KFs: observers of selected points that are not local — again a
    # flagged gather instead of the [K,P] incidence product
    sel_flag = jnp.zeros((P + 1,), bool).at[jnp.where(sel_ok, sel, P)].set(
        sel_ok
    )
    obs_sel_count = jnp.sum(sel_flag[obs_all], axis=1)
    is_local_kf = jnp.zeros((m.kf_capacity,), bool).at[
        jnp.where(lmask, lidx, 0)
    ].set(lmask)
    fscore = jnp.where(
        m.kf_valid & ~is_local_kf, obs_sel_count, 0
    )
    fw, fidx = jax.lax.top_k(fscore, n_fixed)
    fmask = fw > 0

    rows = jnp.concatenate([lidx, fidx.astype(jnp.int32)])   # [L+X]
    rmask = jnp.concatenate([lmask, fmask])
    fixed = jnp.concatenate([jnp.zeros((n_local,), bool), jnp.ones((n_fixed,), bool)])
    fixed = fixed | (rows == 0)  # keyframe 0 is the gauge anchor
    fixed = fixed | ~rmask
    # Gauge completeness. A MONOCULAR window needs the full Sim(3) gauge
    # pinned: one fixed camera kills the 6 SE(3) DOF but leaves the 7th —
    # scaling every point and camera centre about the anchor's centre is an
    # EXACT null direction of the reprojection cost. The reference gets away
    # with one anchor because g2o's float64 LM has a numerically zero
    # gradient along the null space (`Optimizer.cc:1030` fixes only
    # out-of-window observers + nothing else early on); our bf16-adjoint
    # Schur-PCG does not — the null-space noise component makes each BA a
    # random scale step and the map ratchets (measured: median scene depth
    # x2.3 in ONE early-map BA where the covisibility window held every
    # keyframe, i.e. zero external anchors). Pin at least TWO cameras —
    # the two oldest valid rows (most-settled poses) — whenever the window
    # brought fewer than two of its own. Depth-sensor maps (bf) are pinned
    # by the disparity residuals and keep reference semantics, but still
    # need ONE anchor even when keyframe 0 is not in the window.
    ids = jnp.where(rmask, rows, jnp.int32(2 ** 30))
    oldest = jnp.min(ids)
    second = jnp.min(jnp.where(ids == oldest, jnp.int32(2 ** 30), ids))
    n_anchor = jnp.sum(fixed & rmask)
    if bf is None:
        need = n_anchor < 2
        fixed = fixed | (need & ((rows == oldest) | (rows == second)) & rmask)
    else:
        fixed = fixed | ((n_anchor == 0) & (rows == oldest) & rmask)

    rowc = jnp.clip(rows, 0)
    obs_pt_g = jnp.where(rmask[:, None], m.kf_obs[rowc], -1)  # global slots
    obs_pt = jnp.where(obs_pt_g >= 0, inv[jnp.clip(obs_pt_g, 0)], -1)

    kf_xy = m.kf_xy[rowc]
    kf_sig = sigma2_lv[m.kf_level[rowc]]
    poses = m.kf_pose[rowc]
    pts = m.pt_pos[sel]
    pt_opt = sel_ok

    F = m.feat_capacity
    no = min(n_obs, F)
    kf_ur = None if bf is None else jnp.where(rmask[:, None], m.kf_ur[rowc], -1.0)
    kf_xy_c, kf_sig_c, obs_pt_c, kf_ur_c = _compact_obs(
        kf_xy, kf_sig, obs_pt, no, kf_ur)
    new_poses, new_pts, chi2, inliers_c = ba.bundle_adjust(
        poses, fixed, kf_xy_c, kf_sig_c, obs_pt_c, pts, pt_opt, K, iters=iters,
        kf_ur=kf_ur_c, bf=bf,
        adjoint_dtype="bfloat16" if jax.default_backend() == "tpu"
        else "float32",
    )
    # expand the compacted inlier mask back onto the full feature table:
    # _compact_obs's top_k is stable, so compacted slot i of row l is the
    # i-th valid observation — a rank GATHER undoes it (TPU scatters on the
    # [L,F] table serialize; this whole writeback is gather/select only)
    LX = obs_pt.shape[0]
    valid_o = obs_pt >= 0
    rank = jnp.cumsum(valid_o.astype(jnp.int32), axis=1) - 1        # [LX,F]
    in_c = jnp.take_along_axis(inliers_c, jnp.clip(rank, 0, no - 1), axis=1)
    inliers = jnp.where(valid_o & (rank < no), in_c, valid_o)

    # blend back poses (only non-fixed local rows) and points via inverse
    # row maps (one tiny [K]-scatter builds the map; rows flow as gathers)
    upd = rmask & ~fixed
    Kcap = m.kf_capacity
    arangeLX = jnp.arange(LX, dtype=jnp.int32)
    wpos_all = jnp.full((Kcap,), -1, jnp.int32).at[
        jnp.where(rmask, rows, Kcap - 1)
    ].max(jnp.where(rmask, arangeLX, -1))
    wpos_upd = jnp.full((Kcap,), -1, jnp.int32).at[
        jnp.where(upd, rows, Kcap - 1)
    ].max(jnp.where(upd, arangeLX, -1))
    has_w = wpos_upd >= 0
    kf_pose = jnp.where(has_w[:, None], new_poses[jnp.clip(wpos_upd, 0)],
                        m.kf_pose)

    # inv (from selection) is already the P -> window-row map
    has_p = (inv[:P] >= 0) & sel_flag[:P]
    pt_pos = jnp.where(has_p[:, None], new_pts[jnp.clip(inv[:P], 0)],
                       m.pt_pos)

    # remove observations that ended as BA outliers (reference erases those
    # edges after optimization, Optimizer.cc tail of LocalBundleAdjustment):
    # every window row (incl. fixed observers) gets its edited row back.
    # Only edges that PARTICIPATED in the solve (obs_pt >= 0, i.e. their
    # point made the window selection) are eligible for erasure — fixed
    # observers' edges to non-window points must survive untouched.
    new_rows = jnp.where(valid_o & ~inliers, -1, obs_pt_g)          # [LX,F]
    has_row = wpos_all >= 0
    kf_obs = jnp.where(has_row[:, None], new_rows[jnp.clip(wpos_all, 0)],
                       m.kf_obs)

    return m._replace(kf_pose=kf_pose, pt_pos=pt_pos, kf_obs=kf_obs), chi2


@partial(jax.jit, static_argnames=("n_local", "n_fixed", "n_pts", "iters",
                                   "n_levels", "scale_factor", "n_obs"))
def local_ba_batched(ms: map_state.MapState, centers, K,
                     n_local: int = 16, n_fixed: int = 16, n_pts: int = 4096,
                     iters: int = 6, n_levels: int = 8,
                     scale_factor: float = 1.2, n_obs: int = 512, bf=None):
    """B concurrent covisibility-window BAs in ONE dispatch.

    `ms` is a MapState pytree stacked on a leading batch axis (one map per
    agent — `map_state.stack_maps`), `centers` [B] the per-map window
    centers. This is the production shape of the reference's per-agent
    `LocalMapping` threads (`System.cc:209` spawns one per process; N agents
    = N concurrent local BAs): batching amortizes the dispatch round-trip
    and fills the MXU, which is where the >=10x-vs-CPU headroom lives.

    Returns (ms', chi2 [B]) with every map updated independently."""
    f = lambda m, c: local_ba(
        m, c, K, n_local=n_local, n_fixed=n_fixed, n_pts=n_pts, iters=iters,
        n_levels=n_levels, scale_factor=scale_factor, n_obs=n_obs, bf=bf,
    )
    return jax.vmap(f)(ms, centers)


@partial(jax.jit, static_argnames=("n_kf_max", "n_pts", "iters", "n_levels", "scale_factor"))
def global_ba(m: map_state.MapState, K,
              n_kf_max: int | None = None, n_pts: int | None = None,
              iters: int = 10,
              n_levels: int = 8, scale_factor: float = 1.2, bf=None):
    """Global bundle adjustment (`Optimizer::GlobalBundleAdjustemnt`,
    `Optimizer.cc:48`; spawned after merges by
    `LoopClosing::RunGlobalBundleAdjustment`, `LoopClosing.cc:2267`).

    Covers the FULL keyframe/point capacity by default — the matrix-free
    Schur-PCG adjuster keeps memory at O(K*F), so no keyframe or point is
    silently truncated. `n_kf_max`/`n_pts` remain as explicit prefix caps
    for callers that want a bounded problem. Keyframe 0 is the gauge."""
    scales = jnp.asarray([scale_factor ** i for i in range(n_levels)], m.pt_pos.dtype)
    sigma2_lv = scales * scales
    P = m.pt_capacity
    n_kf_max = m.kf_capacity if n_kf_max is None else n_kf_max
    n_pts = P if n_pts is None else n_pts

    rows = jnp.arange(n_kf_max, dtype=jnp.int32)
    rmask = m.kf_valid[:n_kf_max]
    fixed = (rows == 0) | ~rmask
    if bf is None:
        # monocular full-map solve: one anchor leaves the Sim(3) scale
        # gauge free (see local_ba) — pin the second-oldest valid keyframe
        # too so the PCG solve cannot walk the whole map's scale
        ids = jnp.where(rmask & (rows != 0), rows, jnp.int32(2 ** 30))
        fixed = fixed | (rows == jnp.min(ids))

    if n_pts >= P:
        # full point table: observation rows index pt_pos directly
        obs_pt = jnp.where(
            rmask[:, None] & (m.kf_obs[rows] >= 0)
            & m.pt_valid[jnp.clip(m.kf_obs[rows], 0)],
            m.kf_obs[rows], -1,
        )
        pts0, pt_opt, sel, sel_ok = m.pt_pos, m.pt_valid, None, None
    else:
        nobs = map_state.point_observers(m)
        sel_score = jnp.where(m.pt_valid, nobs.astype(jnp.float32), 0.0)
        _, sel = jax.lax.top_k(sel_score, n_pts)
        sel_ok = m.pt_valid[sel]
        inv = jnp.full((P + 1,), -1, jnp.int32).at[jnp.where(sel_ok, sel, P)].set(
            jnp.arange(n_pts, dtype=jnp.int32)
        )[: P + 1]
        obs_pt_g = jnp.where(rmask[:, None], m.kf_obs[rows], -1)
        obs_pt = jnp.where(obs_pt_g >= 0, inv[jnp.clip(obs_pt_g, 0)], -1)
        pts0, pt_opt = m.pt_pos[sel], sel_ok

    # stereo/RGB-D maps: include the disparity residual rows — without them
    # the full-map solve is free to drift the metric scale (only KF 0 is
    # fixed), un-fixing supposedly scale-fixed maps on every global BA
    kf_ur = None if bf is None else jnp.where(rmask[:, None],
                                              m.kf_ur[rows], -1.0)
    new_poses, new_pts, chi2, inliers = ba.bundle_adjust_pcg(
        m.kf_pose[rows], fixed, m.kf_xy[rows], sigma2_lv[m.kf_level[rows]],
        obs_pt, pts0, pt_opt, K, kf_ur=kf_ur, bf=bf, lm_iters=iters,
    )
    upd = rmask & ~fixed
    kf_pose = m.kf_pose.at[rows].set(
        jnp.where(upd[:, None], new_poses, m.kf_pose[rows])
    )
    if sel is None:
        pt_pos = jnp.where(m.pt_valid[:, None], new_pts, m.pt_pos)
    else:
        ptgt = jnp.where(sel_ok, sel, P)
        ppad = jnp.concatenate([m.pt_pos, jnp.zeros((1, 3), m.pt_pos.dtype)])
        pt_pos = ppad.at[ptgt].set(jnp.where(sel_ok[:, None], new_pts, ppad[ptgt]))[:-1]
    return m._replace(kf_pose=kf_pose, pt_pos=pt_pos), chi2


@jax.jit
def apply_gba_correction(m: map_state.MapState, res_pose, res_pt,
                         n_kf_snap, n_pt_snap, anchor):
    """Fold an ASYNCHRONOUSLY computed global-BA result (run on a map
    snapshot) back into the live map, which may have grown since dispatch —
    the reference's GBA catch-up pass (`LoopClosing::RunGlobalBundleAdjustment`,
    `LoopClosing.cc:2267`: `mTcwGBA` overwrite for optimized keyframes,
    spanning-tree propagation for keyframes created while the GBA thread ran,
    ref-keyframe reprojection for map points).

    Keyframes in snapshot slots (< `n_kf_snap`) take their optimized poses;
    keyframes created since are corrected through the `anchor` keyframe:
    T' = T · T_anchor_live⁻¹ · T_anchor_gba (the spanning-tree child formula
    with the weld center as parent). Points in snapshot slots take their
    optimized positions; newer points re-project through their reference
    keyframe: x' = T_ref_new⁻¹ (T_ref_old x)."""
    from ..geometry import lie

    Kc = m.kf_capacity
    idx = jnp.arange(Kc, dtype=jnp.int32)
    old_kf = (idx < n_kf_snap) & m.kf_valid
    corr = lie.se3_mul(lie.se3_inv(m.kf_pose[anchor]), res_pose[anchor])
    prop = jax.vmap(lambda T: lie.se3_mul(T, corr))(m.kf_pose)
    kf_pose = jnp.where(old_kf[:, None], res_pose,
                        jnp.where(m.kf_valid[:, None], prop, m.kf_pose))

    Pc = m.pt_capacity
    pidxa = jnp.arange(Pc, dtype=jnp.int32)
    old_pt = (pidxa < n_pt_snap) & m.pt_valid
    ref = jnp.clip(m.pt_ref_kf, 0, Kc - 1)
    T_old = m.kf_pose[ref]
    T_new = kf_pose[ref]
    reproj = jax.vmap(
        lambda To, Tn, x: lie.se3_apply(lie.se3_inv(Tn), lie.se3_apply(To, x))
    )(T_old, T_new, m.pt_pos)
    pt_pos = jnp.where(old_pt[:, None], res_pt,
                       jnp.where(m.pt_valid[:, None], reproj, m.pt_pos))
    return m._replace(kf_pose=kf_pose, pt_pos=pt_pos)


# --------------------------------------------------------------------------
# host-side local mapper
# --------------------------------------------------------------------------

class LocalMapper:
    """Host driver for the mapping pipeline — the reference's LocalMapping
    thread (`LocalMapping.cc:78-300`) turned into synchronous (or
    caller-scheduled) batched device calls."""

    def __init__(self, n_neighbors=5, ba_local=16, ba_fixed=16, ba_pts=4096,
                 ba_iters=8, run_ba_every=1, imu_init_kfs=8,
                 imu_init_min_time=2.0, vi_window=10):
        self.n_neighbors = n_neighbors
        self.ba_local = ba_local
        self.ba_fixed = ba_fixed
        self.ba_pts = ba_pts
        self.ba_iters = ba_iters
        self.run_ba_every = run_ba_every
        self.imu_init_kfs = imu_init_kfs
        self.imu_init_min_time = imu_init_min_time
        self.vi_window = vi_window
        self._kfs_at_init = 0
        self._scale_refinements = 0
        self._kf_count = 0

    # ------------------------------------------------------------------
    # visual-inertial stages (`LocalMapping.cc:199-256,1174,1413`)
    # ------------------------------------------------------------------

    def _chain_arrays(self, tracker, slots):
        """Stack inertial states + preintegrations for a slot chain."""
        from ..geometry import lie
        from . import vi_ba

        m = tracker.map
        idx = jnp.asarray(slots, jnp.int32)
        T_cb_inv = lie.se3_inv(tracker.T_cb)
        T_bw = jax.vmap(lambda T: lie.se3_mul(T_cb_inv, T))(m.kf_pose[idx])
        v = jnp.asarray(np.stack([
            tracker.kf_vel.get(s, np.zeros(3, np.float32)) for s in slots
        ]))
        pres, valid = [], []
        for s in slots[1:]:
            pre = tracker.kf_preint.get(s)
            if pre is None:
                from ..geometry import imu as imu_mod
                pre = imu_mod.create_preintegrated()
                valid.append(False)
            else:
                valid.append(True)
            pres.append(pre)
        pres = jax.tree.map(lambda *x: jnp.stack(x), *pres)
        return T_bw, v, pres, jnp.asarray(valid)

    def initialize_imu(self, tracker):
        """`LocalMapping::InitializeIMU` (`LocalMapping.cc:1174`) +
        `ScaleRefinement` (`:1413`): gyro bias from rotation alignment,
        gravity direction + metric scale + velocities from the linear VI
        init, then re-base the whole map (ApplyScaledRotation) so gravity is
        canonical and the map is metric, and finish with a full-chain VI-BA
        (the VIBA1/VIBA2 role)."""
        from ..geometry import lie
        from ..loopclosing import merge as merge_mod
        from . import vi_ba

        slots = list(tracker.kf_chain)
        T_bw, v0, pres, pre_valid = self._chain_arrays(tracker, slots)
        if not bool(jnp.all(pre_valid)):
            return False
        bg = vi_ba.estimate_gyro_bias(T_bw, pres)
        s, g_w, vels = vi_ba.estimate_gravity_scale(T_bw, None, pres, bias_g=bg)
        s = float(s)
        if tracker.config.depth_sensor:
            # stereo/RGBD-inertial: the map is already metric — the linear
            # init must agree (the reference fixes scale for these sensors,
            # `LocalMapping.cc:1231` bFIBA with fixed scale); only gravity
            # direction + velocities + biases are taken
            if not (0.80 < s < 1.25) or not np.isfinite(np.asarray(g_w)).all():
                return False
            s = 1.0
        elif not (0.02 < s < 50.0) or not np.isfinite(np.asarray(g_w)).all():
            return False
        Rq = vi_ba.gravity_alignment_rotation(g_w)
        S = jnp.concatenate([Rq, jnp.zeros(3), jnp.asarray([s])])
        tracker.map = merge_mod.transform_map(tracker.map, S)
        tracker.apply_world_sim3(S)
        R_align = lie.quat_to_matrix(Rq)
        for i, sl in enumerate(slots):
            tracker.kf_vel[sl] = np.asarray(R_align @ vels[i], np.float32)
        tracker.bias_g = np.asarray(bg, np.float32)
        for sl in slots:  # chain keyframes now carry the estimated bias
            tracker.kf_bias[sl] = (tracker.bias_g.copy(),
                                   tracker.bias_a.copy())
        tracker.vel_w = tracker.kf_vel[slots[-1]]
        tracker.imu_initialized = True
        # VIBA over the whole chain (VIBA1/VIBA2, LocalMapping.cc:228-256)
        tracker.map = self._vi_local_ba(tracker, slots[-1],
                                        window=len(slots))
        tracker.last_pose = tracker.map.kf_pose[slots[-1]]
        return True

    def refine_scale(self, tracker):
        """`LocalMapping::ScaleRefinement` (`LocalMapping.cc:1413`):
        re-estimate the residual metric scale + gravity direction on the
        current keyframe chain and re-base the map by it when meaningful."""
        from ..geometry import lie
        from ..loopclosing import merge as merge_mod
        from . import vi_ba

        if tracker.config.depth_sensor:
            return False  # metric sensors never rescale (LocalMapping.cc:1416)
        slots = list(tracker.kf_chain)
        if len(slots) < 4 or not all(s in tracker.kf_preint for s in slots[1:]):
            return False
        T_bw, v0, pres, pre_valid = self._chain_arrays(tracker, slots)
        if not bool(jnp.all(pre_valid)):
            return False
        s, g_w, vels = vi_ba.estimate_gravity_scale(
            T_bw, None, pres, bias_g=tracker.bias_g)
        s = float(s)
        self._scale_refinements += 1
        if not (0.5 < s < 2.0) or not np.isfinite(np.asarray(g_w)).all():
            return False
        Rq = vi_ba.gravity_alignment_rotation(g_w)
        S = jnp.concatenate([Rq, jnp.zeros(3), jnp.asarray([s])])
        tracker.map = merge_mod.transform_map(tracker.map, S)
        tracker.apply_world_sim3(S)
        R_align = lie.quat_to_matrix(Rq)
        for i, sl in enumerate(slots):
            tracker.kf_vel[sl] = np.asarray(R_align @ vels[i], np.float32)
        tracker.vel_w = tracker.kf_vel[slots[-1]]
        return True

    def _vi_local_ba(self, tracker, center_slot, window=None):
        """`Optimizer::LocalInertialBA` (`Optimizer.cc:2214`): joint VI-BA
        over the most recent chain window; the oldest window pose is the
        gauge (its velocity/bias stay free, like the reference)."""
        from ..geometry import lie
        from . import vi_ba

        m = tracker.map
        fc = tracker.config.frontend
        window = window or self.vi_window
        slots = list(tracker.kf_chain)[-window:]
        if len(slots) < 2:
            return m
        T_bw, v0, pres, pre_valid = self._chain_arrays(tracker, slots)
        L = len(slots)
        bgt = jnp.asarray(np.tile(tracker.bias_g, (L, 1)))
        bat = jnp.asarray(np.tile(tracker.bias_a, (L, 1)))
        win = vi_ba.ViWindow(T_bw=T_bw, v=v0, bg=bgt, ba=bat)
        fixed = jnp.zeros(L, bool).at[0].set(True)
        idx = jnp.asarray(slots, jnp.int32)
        scales = jnp.asarray([fc.scale_factor ** i for i in range(fc.n_levels)])
        sigma2_lv = scales * scales
        obs_pt = jnp.where(
            (m.kf_obs[idx] >= 0) & m.pt_valid[jnp.clip(m.kf_obs[idx], 0)],
            m.kf_obs[idx], -1,
        )
        w2, pts2, chi2 = vi_ba.vi_bundle_adjust(
            win, fixed, m.kf_xy[idx], sigma2_lv[m.kf_level[idx]], obs_pt,
            m.pt_pos, m.pt_valid, tracker.K, tracker.T_cb, pres, pre_valid,
            iters=self.ba_iters,
        )
        T_cw_new = jax.vmap(lambda T: lie.se3_mul(tracker.T_cb, T))(w2.T_bw)
        kf_pose = m.kf_pose.at[idx].set(
            jnp.where(jnp.arange(L)[:, None] > 0, T_cw_new, m.kf_pose[idx])
        )
        pt_pos = jnp.where(m.pt_valid[:, None], pts2, m.pt_pos)
        v_np = np.asarray(w2.v)
        bg_np, ba_np = np.asarray(w2.bg), np.asarray(w2.ba)
        for i, sl in enumerate(slots):
            tracker.kf_vel[sl] = v_np[i]
            tracker.kf_bias[sl] = (bg_np[i].astype(np.float32),
                                   ba_np[i].astype(np.float32))
        tracker.vel_w = v_np[-1]
        tracker.bias_g = np.asarray(w2.bg[-1])
        tracker.bias_a = np.asarray(w2.ba[-1])
        return m._replace(kf_pose=kf_pose, pt_pos=pt_pos)

    def on_initial_map(self, tracker):
        if tracker.n_kf_host < 2:
            # depth-sensor bootstrap: one keyframe at identity with
            # true-scale points — nothing to optimize yet
            self._kfs_at_init = 1
            return
        fc = tracker.config.frontend
        m, _ = local_ba(
            tracker.map, jnp.int32(1), tracker.K,
            n_local=4, n_fixed=4, n_pts=self.ba_pts, iters=16,
            n_levels=fc.n_levels, scale_factor=fc.scale_factor,
        )
        tracker.map = map_state.update_point_stats(m, fc.n_levels, fc.scale_factor)

    def on_new_keyframe(self, tracker, slot: int):
        fc = tracker.config.frontend
        m = tracker.map
        c = jnp.int32(slot)
        self._kf_count += 1
        inertial_live = tracker.inertial and tracker.imu_initialized
        run_ba = self._kf_count % self.run_ba_every == 0
        if run_ba and inertial_live:
            # LocalInertialBA replaces the visual local BA once the IMU
            # is initialized (`LocalMapping.cc:167-175`)
            m = _mapper_step(
                m, c, tracker.K, n_neighbors=self.n_neighbors,
                n_levels=fc.n_levels, scale_factor=fc.scale_factor,
                run_ba=False,
            )
            tracker.map = m
            m = self._vi_local_ba(tracker, slot)
            m = map_state.update_point_stats(m, fc.n_levels, fc.scale_factor,
                                             with_desc=False)
        else:
            bf = (float(tracker.K[0]) * tracker.config.baseline
                  if tracker.config.depth_sensor else None)
            # the whole per-keyframe chain (cull -> triangulate -> fuse ->
            # stats [-> local BA -> stats]) is ONE fused dispatch
            m = _mapper_step(
                m, c, tracker.K, n_neighbors=self.n_neighbors,
                n_levels=fc.n_levels, scale_factor=fc.scale_factor,
                run_ba=run_ba, ba_local=self.ba_local,
                ba_fixed=self.ba_fixed, ba_pts=self.ba_pts,
                ba_iters=self.ba_iters, bf=bf,
            )
        tracker.map = m
        tracker.last_pose = m.kf_pose[slot]
        # IMU initialization schedule (`LocalMapping::InitializeIMU`,
        # `LocalMapping.cc:199-256,1174`): enough keyframes, or a smaller
        # chain already spanning >= 2 s (the reference's mTinit window)
        if tracker.inertial and not tracker.imu_initialized:
            chain = tracker.kf_chain
            span = 0.0
            if len(chain) >= 2:
                ts = tracker.kf_timestamps
                span = ts.get(chain[-1], 0.0) - ts.get(chain[0], 0.0)
            ready = (len(chain) >= self.imu_init_kfs
                     or (len(chain) >= 4 and span >= self.imu_init_min_time))
            if ready and all(s in tracker.kf_preint for s in chain[1:]):
                if self.initialize_imu(tracker):
                    self._kfs_at_init = len(tracker.kf_chain)
        elif tracker.inertial and tracker.imu_initialized:
            # `LocalMapping::ScaleRefinement` (`LocalMapping.cc:1413`): the
            # reference re-estimates scale/gravity at later checkpoints —
            # the first linear init uses few keyframes and its scale error
            # propagates to the whole trajectory otherwise
            grown = len(tracker.kf_chain) - getattr(self, "_kfs_at_init", 0)
            if self._scale_refinements < 3 and grown >= 4 * (self._scale_refinements + 1):
                self.refine_scale(tracker)

        # uuid assignment for newly created points is DEFERRED: pulling
        # `int(m.n_pt)` here would block the host on the whole dispatched
        # mapping chain (cull/triangulate/fuse/BA), serializing tracking
        # with mapping — the reference overlaps these via threads
        # (System.cc:209,226). The tracker flushes lazily when metadata is
        # actually consumed (protocol/serialization paths).
        tracker.meta_dirty = True


@partial(jax.jit, static_argnames=("n_neighbors", "n_levels", "scale_factor",
                                   "run_ba", "ba_local", "ba_fixed", "ba_pts",
                                   "ba_iters"))
def _mapper_step(m, c, K, n_neighbors: int, n_levels: int,
                 scale_factor: float, run_ba: bool,
                 ba_local: int = 12, ba_fixed: int = 8, ba_pts: int = 4096,
                 ba_iters: int = 6, bf=None):
    """The LocalMapper per-keyframe chain as ONE fused device dispatch:
    cull -> triangulate -> fuse -> stats (-> windowed BA -> stats). Under
    the axon relay each separate dispatch costs ~1.5-3 ms of round-trip
    after the first D2H of the process; fusing the 4-6 calls removes that
    multiple and lets XLA share intermediates across stages."""
    m = cull_points(m, c)
    m, _ = create_new_points(m, c, K, n_neighbors=n_neighbors,
                             n_levels=n_levels, scale_factor=scale_factor)
    m = fuse_duplicates(m, c, K, n_neighbors=n_neighbors,
                        n_levels=n_levels, scale_factor=scale_factor)
    m = map_state.update_point_stats(m, n_levels, scale_factor)
    if run_ba:
        m, _ = local_ba(m, c, K, n_local=ba_local, n_fixed=ba_fixed,
                        n_pts=ba_pts, iters=ba_iters, n_levels=n_levels,
                        scale_factor=scale_factor, bf=bf)
        # BA moved geometry but not observations: descriptor votes are
        # unchanged, so the post-BA refresh skips the [K,P,256] vote pass
        m = map_state.update_point_stats(m, n_levels, scale_factor,
                                         with_desc=False)
    return m


def _mapper_chain(m, c, K, *, n_neighbors: int, n_levels: int,
                  scale_factor: float, run_ba_traced,
                  ba_local: int, ba_fixed: int, ba_pts: int, ba_iters: int,
                  bf=None):
    """Traceable per-keyframe mapper chain for callers already inside jit
    (the device-autonomous tracker step): identical to `_mapper_step` but
    the BA cadence gate is a TRACED boolean resolved by `lax.cond`."""
    m = cull_points(m, c)
    m, _ = create_new_points(m, c, K, n_neighbors=n_neighbors,
                             n_levels=n_levels, scale_factor=scale_factor)
    m = fuse_duplicates(m, c, K, n_neighbors=n_neighbors,
                        n_levels=n_levels, scale_factor=scale_factor)
    m = map_state.update_point_stats(m, n_levels, scale_factor)

    def ba_branch(mm):
        mm, _ = local_ba(mm, c, K, n_local=ba_local, n_fixed=ba_fixed,
                         n_pts=ba_pts, iters=ba_iters, n_levels=n_levels,
                         scale_factor=scale_factor, bf=bf)
        # geometry-only refresh: BA does not change observations (see
        # _mapper_step) — the desc vote is the expensive half of the pass
        return map_state.update_point_stats(mm, n_levels, scale_factor,
                                            with_desc=False)

    return jax.lax.cond(run_ba_traced, ba_branch, lambda mm: mm, m)
