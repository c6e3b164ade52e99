"""Per-frame monocular tracking.

TPU-native `Tracking` (`orb_slam3/src/Tracking.cc`): the per-frame hot path is
ONE jitted program (`track_frame`) — project map points at the predicted pose,
masked MXU descriptor matching, pose-only optimization, then a second
tighter-radius pass (the reference's TrackWithMotionModel -> TrackLocalMap
two-stage refinement, `Tracking.cc:2584,2668`). The state machine
(NOT_INITIALIZED / OK / RECENTLY_LOST / LOST, `Tracking.cc:1620+`) and the
keyframe decision (`NeedNewKeyFrame`, `Tracking.cc:2770`) stay on the host.

Deviation by design: the reference matches stage 1 against the *last frame*'s
points and stage 2 against a covisibility-selected "local map" (a CPU-cache
economy). Here both stages project against the full point table — frustum,
distance-range and viewing-angle gates (`Frame::isInFrustum`) reduce it to
the same effective candidate set, and an MXU-sized matmul makes the full
table cheaper than building subsets.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend.extractor import Frame, FrontendConfig, make_frame
from ..geometry import cameras, lie, two_view
from ..mapping import map_state
from ..ops import matching
from . import pose_opt


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    frontend: FrontendConfig
    kf_cap: int = 512
    pt_cap: int = 8192
    fps: float = 20.0
    min_init_matches: int = 100   # Tracking.cc:2253
    min_track_inliers: int = 15   # lost below this
    kf_ref_ratio: float = 0.9     # Tracking.cc:2849 thRefRatio mono
    kf_min_inliers: int = 15
    camera_model: str = "pinhole"  # "pinhole" | "kb8" (rectified keypoints)
    # ---- stereo / RGB-D (`Frame.cc:149,265`) ----
    sensor: str = "monocular"     # "monocular" | "stereo" | "rgbd"
    baseline: float = 0.0         # stereo baseline / RGB-D virtual baseline, m
    th_depth_ratio: float = 40.0  # close-point depth = ratio * baseline
                                  # (mThDepth = mbf*ThDepth/fx, Tracking.cc:646)
    min_init_stereo_points: int = 200  # StereoInitialization gate (ref: 500)

    @property
    def max_frames_between_kf(self):
        return int(self.fps)

    @property
    def depth_sensor(self):
        return self.sensor in ("stereo", "rgbd")

    @property
    def th_depth(self):
        return self.th_depth_ratio * self.baseline


class TrackResult(NamedTuple):
    T_cw: jnp.ndarray      # [7] refined pose
    obs: jnp.ndarray       # [F] int32 point slot per frame feature (-1 none)
    n_inliers: jnp.ndarray  # [] int32
    n_stage1: jnp.ndarray   # [] int32
    visible: jnp.ndarray    # [P] bool points projected into the frustum
    found: jnp.ndarray      # [P] bool points matched as inliers


@partial(jax.jit, static_argnames=("config",))
def project_points(m: map_state.MapState, T_cw, K, config: TrackerConfig):
    """Frustum + scale-range + viewing-angle gating of all map points
    (`Frame::isInFrustum` semantics, `Frame.cc:575`).

    Returns (uv [P,2], vis [P] bool, level [P] i32, view_cos [P])."""
    fc = config.frontend
    pc = jax.vmap(lambda X: lie.se3_apply(T_cw, X))(m.pt_pos)
    uv, front = cameras.pinhole_project(K, pc)
    in_img = (
        (uv[:, 0] >= 0) & (uv[:, 0] < fc.width) & (uv[:, 1] >= 0) & (uv[:, 1] < fc.height)
    )
    center = lie.se3_t(lie.se3_inv(T_cw))
    rel = m.pt_pos - center[None, :]
    dist = jnp.linalg.norm(rel, axis=-1)
    in_range = (dist >= 0.8 * m.pt_min_dist) & (dist <= 1.2 * m.pt_max_dist)
    view_cos = jnp.sum(rel * m.pt_normal, axis=-1) / jnp.maximum(dist, 1e-9)
    level = map_state.predict_scale(dist, m.pt_max_dist, fc.n_levels, fc.scale_factor)
    vis = m.pt_valid & front & in_img & in_range & (view_cos > 0.5)
    return uv, vis, level, view_cos


def _match_and_assign(m, uv, vis, level, radii, frame: Frame, max_dist, ratio):
    """Match projected points (rows) to frame features, dedupe to 1-1.
    Returns per-point (feat_idx, ok)."""
    idx, dist, ok = matching.search_by_projection(
        uv, vis, m.pt_desc, level,
        frame.xy, frame.desc, frame.level, frame.valid,
        radii, max_dist=max_dist, ratio=ratio,
    )
    ok = matching.dedupe_matches(idx, ok, frame.capacity)
    return jnp.where(ok, idx, -1), ok


@partial(jax.jit, static_argnames=("config",))
def track_frame(m: map_state.MapState, frame: Frame, T_pred, K, config: TrackerConfig):
    """Two-stage match + pose-only BA. Returns TrackResult."""
    fc = config.frontend
    scales = jnp.asarray(fc.scales, m.pt_pos.dtype)
    sigma2 = jnp.asarray(fc.sigma2, m.pt_pos.dtype)

    # ---- stage 1: wide search at predicted pose (TrackWithMotionModel) ----
    uv, vis, level, view_cos = project_points(m, T_pred, K, config)
    radii1 = 15.0 * scales[level]
    feat1, ok1 = _match_and_assign(m, uv, vis, level, radii1, frame, matching.TH_HIGH, 0.9)
    # reference fallback: too few matches -> retry with doubled window
    # (`Tracking::TrackWithMotionModel` retries 2*th, then falls back to the
    # window-free reference-KF search; we fold both into one wide retry)
    def _retry(_):
        return _match_and_assign(m, uv, vis, level, radii1 * 4.0, frame,
                                 matching.TH_HIGH, 0.9)

    feat1, ok1 = jax.lax.cond(
        jnp.sum(ok1) < 20, _retry, lambda _: (feat1, ok1), operand=None
    )
    bf = None
    if frame.ur is not None and config.baseline > 0.0:
        bf = K[0] * config.baseline
    f1 = jnp.clip(feat1, 0)
    obs_uv = frame.xy[f1]
    obs_sig = sigma2[frame.level[f1]]
    ur1 = None if bf is None else jnp.where(ok1, frame.ur[f1], -1.0)
    T1, inl1, _ = pose_opt.pose_optimization(T_pred, m.pt_pos, obs_uv, obs_sig,
                                             ok1, K, ur=ur1, bf=bf)
    n1 = jnp.sum(inl1)

    # ---- stage 2: tight search at refined pose (TrackLocalMap) ----
    uv2, vis2, level2, view_cos2 = project_points(m, T1, K, config)
    base_r = jnp.where(view_cos2 > 0.998, 2.5, 4.0)
    radii2 = base_r * scales[level2]
    feat2, ok2 = _match_and_assign(m, uv2, vis2, level2, radii2, frame, matching.TH_HIGH, 0.8)
    # keep stage-1 inlier associations where stage 2 found nothing
    feat = jnp.where(ok2, feat2, jnp.where(inl1, feat1, -1))
    okc = feat >= 0
    okc = matching.dedupe_matches(feat, okc, frame.capacity)
    fc2 = jnp.clip(feat, 0)
    ur2 = None if bf is None else jnp.where(okc, frame.ur[fc2], -1.0)
    T2, inl2, _ = pose_opt.pose_optimization(
        T1, m.pt_pos, frame.xy[fc2], sigma2[frame.level[fc2]], okc, K,
        ur=ur2, bf=bf,
    )
    n2 = jnp.sum(inl2)

    # invert point->feature into feature->point
    P = m.pt_capacity
    final_ok = inl2
    fsel = jnp.where(final_ok, fc2, frame.capacity)
    obs = jnp.full((frame.capacity + 1,), -1, jnp.int32).at[fsel].set(
        jnp.arange(P, dtype=jnp.int32)
    )[: frame.capacity]

    return TrackResult(
        T_cw=T2, obs=obs, n_inliers=n2, n_stage1=n1,
        visible=vis2, found=final_ok,
    )


@partial(jax.jit, static_argnames=("n_levels", "scale_factor"))
def create_points_from_depth(m: map_state.MapState, slot, frame: Frame, K,
                             th_depth, n_levels: int = 8,
                             scale_factor: float = 1.2):
    """Unproject frame features with known depth (stereo/RGB-D) that have no
    map association yet into NEW map points, observed by keyframe `slot`
    (`Tracking::StereoInitialization` point creation, Tracking.cc:2231, and
    the close-point creation of `Tracking::CreateNewKeyFrame`,
    Tracking.cc:3015-3080). Returns (map, n_created)."""
    T_wc = lie.se3_inv(m.kf_pose[slot])
    z = frame.depth
    cand = frame.valid & (z > 0.0) & (z <= th_depth) & (m.kf_obs[slot] < 0)
    xn = cameras.pinhole_unproject(K, frame.xy)                  # [F,3] z=1
    Xw = jax.vmap(lambda p: lie.se3_apply(T_wc, p))(xn * z[:, None])
    n = frame.capacity
    m, slots = map_state.add_points(
        m,
        pos=Xw,
        desc=frame.desc,
        normal=jnp.zeros((n, 3), jnp.float32),
        min_dist=jnp.zeros((n,), jnp.float32),
        max_dist=jnp.full((n,), 1e9, jnp.float32),
        ref_kf=slot,
        valid=cand,
    )
    obs_new = jnp.where(slots >= 0, slots, m.kf_obs[slot])
    m = m._replace(kf_obs=m.kf_obs.at[slot].set(obs_new))
    m = map_state.update_point_stats(m, n_levels, scale_factor)
    return m, jnp.sum(slots >= 0)


@partial(jax.jit, static_argnames=("config",))
def make_and_track(img, m: map_state.MapState, T_pred, K, dist,
                   config: TrackerConfig):
    """Fused per-frame step: ORB extraction + two-stage tracking in ONE
    device dispatch. On the axon tunnel each dispatch carries ~1.5-3 ms of
    relay round-trip once any D2H has happened in the process; fusing the
    two per-frame calls halves that fixed cost (and lets XLA share the
    image pyramid layout with the matcher's reads)."""
    from ..frontend.extractor import make_frame

    frame = make_frame(img, K, dist, config.frontend,
                       camera_model=config.camera_model)
    res = track_frame(m, frame, T_pred, K, config)
    # visibility counters folded in (gated device-side on a good track), so
    # the host applies them as a zero-dispatch pytree swap
    good = res.n_inliers >= config.min_track_inliers
    pt_visible = m.pt_visible + (res.visible & good).astype(jnp.int32)
    pt_found = m.pt_found + (res.found & good).astype(jnp.int32)
    return frame, res, pt_visible, pt_found


class AutoState(NamedTuple):
    """Device-resident tracker continuation for the autonomous step."""

    T_cw: jnp.ndarray        # [7] last pose
    velocity: jnp.ndarray    # [7] motion model
    frames_since_kf: jnp.ndarray  # [] int32
    ref_tracked: jnp.ndarray      # [] int32 inliers at last keyframe
    kf_count: jnp.ndarray         # [] int32 keyframes created (device)


class AutoFlags(NamedTuple):
    """Per-frame outcome flags (read back asynchronously, frames late)."""

    n_inliers: jnp.ndarray   # [] int32
    made_kf: jnp.ndarray     # [] bool
    good: jnp.ndarray        # [] bool


@partial(jax.jit, static_argnames=("config", "mapper_cfg"))
def autonomous_step(img, m: map_state.MapState, st: AutoState, K, dist,
                    config: TrackerConfig, mapper_cfg: tuple):
    """One FULLY device-side SLAM frame: extract + track + visibility +
    keyframe decision + (conditional) keyframe insertion with the whole
    mapper chain — zero host round-trips.

    This is the TPU-native form of the reference's tracking/local-mapping
    thread overlap (`System.cc:209,226`): instead of a mapping thread, the
    keyframe branch runs under `lax.cond` inside the same dispatch, so the
    host can stream frames without ever blocking on a decision. Outcome
    flags are read back asynchronously several frames late, which only
    delays host-side bookkeeping (timestamps/uuids/state machine), never
    the map itself.

    mapper_cfg: (n_neighbors, n_levels, scale_factor, ba_local, ba_fixed,
    ba_pts, ba_iters, run_ba_every).
    """
    from ..mapping.local_mapping import _mapper_chain

    (n_neighbors, n_levels, scale_factor,
     ba_local, ba_fixed, ba_pts, ba_iters, run_ba_every) = mapper_cfg
    from ..frontend.extractor import make_frame

    frame = make_frame(img, K, dist, config.frontend,
                       camera_model=config.camera_model)
    T_pred = lie.se3_mul(st.velocity, st.T_cw)
    res = track_frame(m, frame, T_pred, K, config)
    good = res.n_inliers >= config.min_track_inliers
    # motion model / pose chain (identity reset on a bad frame, like the
    # host state machine's RECENTLY_LOST handling)
    T2 = jnp.where(good, res.T_cw, st.T_cw)
    vel2 = jnp.where(good, lie.se3_mul(res.T_cw, lie.se3_inv(st.T_cw)),
                     lie.se3_identity())
    m = m._replace(
        pt_visible=m.pt_visible + (res.visible & good).astype(jnp.int32),
        pt_found=m.pt_found + (res.found & good).astype(jnp.int32),
    )
    fsk = jnp.where(good, st.frames_since_kf + 1, st.frames_since_kf)

    ratio = 0.75 if config.depth_sensor else config.kf_ref_ratio
    need_kf = (
        good
        & ((fsk >= config.max_frames_between_kf)
           | (res.n_inliers < jnp.int32(jnp.maximum(
               ratio * st.ref_tracked.astype(jnp.float32), 1.0))))
        & (res.n_inliers > config.kf_min_inliers)
        & (m.n_kf < config.kf_cap - 1)
    )

    def kf_branch(mm):
        mm, slot = map_state.add_keyframe(
            mm, res.T_cw, frame.xy, frame.level, frame.angle, frame.desc,
            frame.valid, res.obs,
            ur=frame.ur if config.depth_sensor else None,
        )
        run_ba = (st.kf_count + 1) % run_ba_every == 0
        bf = (K[0] * config.baseline) if config.depth_sensor else None
        return _mapper_chain(
            mm, slot, K, n_neighbors=n_neighbors, n_levels=n_levels,
            scale_factor=scale_factor, run_ba_traced=run_ba,
            ba_local=ba_local, ba_fixed=ba_fixed, ba_pts=ba_pts,
            ba_iters=ba_iters, bf=bf,
        )

    m = jax.lax.cond(need_kf, kf_branch, lambda mm: mm, m)
    st2 = AutoState(
        T_cw=T2, velocity=vel2,
        frames_since_kf=jnp.where(need_kf, 0, fsk).astype(jnp.int32),
        ref_tracked=jnp.where(need_kf, res.n_inliers, st.ref_tracked),
        kf_count=st.kf_count + need_kf.astype(jnp.int32),
    )
    return m, st2, AutoFlags(n_inliers=res.n_inliers, made_kf=need_kf,
                             good=good)


def _pack_outcome(st: AutoState, flags: AutoFlags):
    """Pose + outcome flags as ONE [10] f32 row: a retire then costs a
    single host readback instead of four (each separate small array pays
    its own relay round trip on the tunnel)."""
    return jnp.concatenate([
        st.T_cw,
        jnp.stack([flags.made_kf.astype(jnp.float32),
                   flags.good.astype(jnp.float32),
                   flags.n_inliers.astype(jnp.float32)]),
    ])


@partial(jax.jit, static_argnames=("config", "mapper_cfg"))
def autonomous_step_packed(img, m: map_state.MapState, st: AutoState, K,
                           dist, config: TrackerConfig, mapper_cfg: tuple):
    """`autonomous_step` returning the packed [1,10] outcome row."""
    m, st, flags = autonomous_step(img, m, st, K, dist, config, mapper_cfg)
    return m, st, _pack_outcome(st, flags)[None]


@partial(jax.jit, static_argnames=("config", "mapper_cfg"))
def autonomous_step_batch(imgs, m: map_state.MapState, st: AutoState, K, dist,
                          config: TrackerConfig, mapper_cfg: tuple):
    """B autonomous frames in ONE dispatch (`lax.scan` over the device
    step, carrying AutoState + the map). Depth-pipelining alone bottoms out
    at the per-dispatch relay round-trip (~2.5 ms -> ~33 fps); batching B
    frames per dispatch divides that fixed cost by B. Outcomes come back as
    ONE packed [B,10] array (pose 7 | made_kf | good | n_inliers) for the
    host to retire asynchronously with a single readback.

    Returns (map, state, packed [B,10])."""
    def body(carry, img):
        mm, ss = carry
        mm, ss, flags = autonomous_step(img, mm, ss, K, dist, config,
                                        mapper_cfg)
        return (mm, ss), _pack_outcome(ss, flags)

    (m, st), packed = jax.lax.scan(body, (m, st), imgs)
    return m, st, packed


@jax.jit
def update_visibility(m: map_state.MapState, visible, found):
    """`MapPoint::IncreaseVisible/IncreaseFound` counters for culling."""
    return m._replace(
        pt_visible=m.pt_visible + visible.astype(jnp.int32),
        pt_found=m.pt_found + found.astype(jnp.int32),
    )


# --------------------------------------------------------------------------
# host-side tracker (the "Tracking thread")
# --------------------------------------------------------------------------

NOT_INITIALIZED = "NOT_INITIALIZED"
OK = "OK"
RECENTLY_LOST = "RECENTLY_LOST"
LOST = "LOST"


class MonocularTracker:
    """Host state machine wrapping the jitted tracking step.

    Mirrors `Tracking::Track` (`Tracking.cc:1620`) minus IMU and stereo:
    monocular initialization via two-view reconstruction, motion-model
    prediction, lost handling, keyframe decision.
    """

    def __init__(self, config: TrackerConfig, K, dist, local_mapper=None,
                 rng_seed=0, relocalizer=None, inertial=False,
                 imu_calib=None, T_cb=None):
        self.config = config
        self.K = jnp.asarray(K, jnp.float32)
        self.dist = jnp.asarray(dist, jnp.float32)
        # ---- visual-inertial state (Tracking.cc IMU members) ----
        self.inertial = inertial
        self.imu_calib = imu_calib
        self.T_cb = (lie.se3_identity() if T_cb is None
                     else jnp.asarray(T_cb, jnp.float32))  # camera-from-body
        self.imu_initialized = False
        self.vel_w = np.zeros(3, np.float32)    # body velocity (world)
        self.bias_g = np.zeros(3, np.float32)
        self.bias_a = np.zeros(3, np.float32)
        self._imu_frame = []   # (acc,gyro,dts) chunks since last frame
        self._imu_kf = []      # chunks since last keyframe
        self._imu_seq = 0      # total chunks ever grabbed (monotonic)
        self.kf_chain = []     # keyframe slots in creation order
        self.kf_preint = {}    # slot -> Preintegrated from previous chain KF
        self.kf_vel = {}       # slot -> body velocity [3] np
        self.kf_bias = {}      # slot -> (bias_g, bias_a) np at creation
        self._last_good_ts = None
        self.map = map_state.create(config.kf_cap, config.pt_cap, config.frontend.capacity)
        self.meta = map_state.MapMeta.create(config.kf_cap, config.pt_cap, agent_id=0)
        self.state = NOT_INITIALIZED
        self.velocity = lie.se3_identity()
        self.last_pose = lie.se3_identity()
        self.init_frame = None
        self.frames_since_kf = 0
        self.ref_kf_tracked = 0
        self.last_kf_slot = -1
        self.local_mapper = local_mapper
        self.relocalizer = relocalizer  # callable (map, frame) -> (ok, T, n)
        self.atlas = None               # optional mapping.atlas.Atlas
        self.n_frames = 0
        self._lost_frames = 0
        self.key = jax.random.PRNGKey(rng_seed)
        self.trajectory = []  # (timestamp, T_cw np[7], state)
        self.kf_timestamps = {}  # kf slot -> frame timestamp
        self._cur_ts = None
        self._init_ts = None
        self.meta_dirty = False  # new points exist whose uuids are unassigned
        self.n_kf_host = 0       # host mirror of map.n_kf (KFs are append-only)
        # structural-map-change epoch: bumped whenever kf slots are rebuilt
        # or revalidated wholesale (atlas stash/merge-back, agent merge/
        # splice/frame-change/GBA-fold). Consumers that mirror per-slot kf
        # state on the host (SlamAgent._host_kf_valid) refresh on a bump and
        # otherwise never touch the device — KF slots are append-only valid
        # on the normal path, so a per-frame kf_valid readback (which would
        # serialize the whole in-flight autonomous chain behind a blocking
        # D2H) carries no information between epochs.
        self.map_epoch = 0
        # --- pipelined mode (async_depth > 0): the per-frame readback of
        # n_inliers is overlapped with the next frames' dispatches; state-
        # machine decisions run `async_depth` frames behind. This is the
        # TPU-native answer to the reference's tracking/mapping thread
        # overlap (System.cc:209,226): device work streams without the host
        # round-trip on every frame. Visual-only (IMU mode stays sync).
        self.async_depth = 0
        self._pipeline = []      # [(timestamp, frame, res)] pending frames
        # --- pipelined VI chains (async_depth > 0 with inertial=True):
        # velocity and bias ride the device-future chain like last_pose;
        # host mirrors (vel_w/bias_g/bias_a) catch up at retire time and
        # seed preintegration (first-order bias Jacobians inside the
        # refine absorb the depth-frames lag, like the reference's
        # last-keyframe bias anchor). None = re-seed from mirrors.
        self._vel_dev = None
        self._bias_g_dev = None
        self._bias_a_dev = None
        # bumped by apply_world_sim3: a retire that triggers a world rebase
        # (IMU init / VIBA scale / merge-back) must drop in-flight records.
        # _pending_rebase_S accumulates the composed Sim3 so the retire can
        # transport the chain head into the new world frame (folding the
        # scale into translation composes cleanly: fold(fold(X)∘Y)=fold(X∘Y))
        self._rebase_gen = 0
        self._pending_rebase_S = None
        # --- device-autonomous mode (enter_autonomous): keyframe decision
        # and mapper chain run on-device; flags retire async_depth late
        self.autonomous = False
        self._auto_state = None
        self._auto_flags = []
        # auto_mode: PRODUCTION switch — (re)enter autonomous whenever the
        # visual tracker is OK (the reference always overlaps its tracking/
        # mapping/loop threads, System.cc:209,226,245; this is the TPU
        # equivalent, on by default via SystemSettings/SlamAgent). The host
        # state machine keeps handling init/reloc/atlas/protocol work at
        # retire time or while autonomous is suspended.
        self.auto_mode = False
        # auto_batch: frames per autonomous dispatch (lax.scan over the
        # device step). The axon-tunnel relay charges ~2.5 ms per dispatch;
        # B frames per dispatch divides that fixed cost by B, which is the
        # lever that takes e2e past camera rate.
        self.auto_batch = 1
        self._auto_imgs = []     # buffered (img, ts) awaiting a full batch
        self._atlas_check_pending = False

    def flush_meta(self):
        """Assign uuids to points the (asynchronously dispatched) mapper
        created since the last flush. Called lazily by every consumer of
        `meta` so the mapping chain never blocks the tracking loop.

        NOTE: this lazy flush is the SOLE guard for pt_uuid freshness — no
        per-frame flush exists. Every consumer of `meta.pt_uuid` /
        `meta.pt_creator` (codec extract, scale alignment, merge paths)
        must call it first; a new consumer that forgets reads zero uuids
        for freshly-triangulated points."""
        if not self.meta_dirty:
            return
        npts = int(self.map.n_pt)  # syncs with the dispatched mapping chain
        fresh = self.meta.pt_uuid[:npts].sum(axis=1) == 0
        nf = int(fresh.sum())
        if nf:
            self.meta.pt_uuid[:npts][fresh] = self.meta.new_uuids(nf)
            self.meta.pt_creator[:npts][fresh] = self.meta.agent_id
        self.meta_dirty = False

    # -- public API ---------------------------------------------------------

    def process_image(self, img, timestamp: float):
        """`System::TrackMonocular` equivalent: grayscale [H,W] in (uint8 or
        float32, 0..255), camera pose out (None until initialized).
        Initialized visual frames take the fused extract+track dispatch
        (`make_and_track`). Upload keeps the CALLER's dtype — a uint8
        camera frame crosses the host->device link at 1/4 the bytes (the
        axon tunnel moves ~40 MB/s; 1.4 MB float32 frames alone cap the
        pipeline below 30 fps) and is cast to float32 on device inside the
        jitted front end."""
        img = jnp.asarray(img)
        if self.state == NOT_INITIALIZED:
            frame = make_frame(img, self.K, self.dist, self.config.frontend,
                               camera_model=self.config.camera_model)
            return self.process_frame(frame, timestamp)
        self.n_frames += 1
        self._cur_ts = timestamp
        # production overlap: (re)enter the device-autonomous fast lane
        # whenever tracking is healthy (auto_mode is the System/SlamAgent
        # default for visual modes); the host state machine takes over again
        # on loss, for reloc/atlas, and resumes here once OK
        if (self.auto_mode and not self.autonomous and self.state == OK):
            self.enter_autonomous()
        if getattr(self, "autonomous", False):
            return self._process_autonomous(img, timestamp)
        # visual RECENTLY_LOST/LOST: relocalize FIRST (`Tracking.cc:
        # 1780-1812`) — the motion model is stale after a loss and a wide
        # search from it can "recover" onto a biased pose
        if (self.state in (RECENTLY_LOST, LOST)
                and self.relocalizer is not None
                and not (self.inertial and self.imu_initialized)):
            frame_r = make_frame(img, self.K, self.dist, self.config.frontend,
                                 camera_model=self.config.camera_model)
            pose = self._try_relocalize(frame_r, timestamp)
            if pose is not None:
                self.trajectory.append((timestamp, pose, self.state))
                return pose
            # reloc failed: reuse the already-extracted frame — falling
            # through to make_and_track would re-run the whole front end
            # (pyramid+FAST+descriptors) on the identical image, doubling
            # per-frame cost for every frame of an extended lost span
            T_pred, v_pred = self._predict_pose()
            res = track_frame(self.map, frame_r, T_pred, self.K, self.config)
            if self.async_depth > 0 and not self.inertial:
                pose = self._pipeline_push(frame_r, timestamp, res)
            else:
                pose = self._track_resolve(frame_r, timestamp, T_pred,
                                           v_pred, res)
            if pose is not None:
                self.trajectory.append((timestamp, pose, self.state))
            return pose
        if self._vi_pipeline_active(timestamp):
            # pipelined VI: the IMU-predicted pose is part of the device
            # chain, so extraction runs as its own dispatch here
            frame = make_frame(img, self.K, self.dist, self.config.frontend,
                               camera_model=self.config.camera_model)
            pose = self._track_pipelined_vi(frame, timestamp)
            if pose is not None:
                self.trajectory.append((timestamp, pose, self.state))
            return pose
        T_pred, v_pred = self._predict_pose()
        frame, res, pv, pf = make_and_track(img, self.map, T_pred, self.K,
                                            self.dist, self.config)
        if self.async_depth > 0 and not self.inertial:
            # NOTE: the (pv, pf) snapshot is only valid when a single frame
            # is in flight; the pipelined retire path applies incremental
            # visibility updates instead (see _retire_pipelined)
            pose = self._pipeline_push(frame, timestamp, res)
        else:
            pose = self._track_resolve(frame, timestamp, T_pred, v_pred, res,
                                       vis=(pv, pf))
        if pose is not None:
            self.trajectory.append((timestamp, pose, self.state))
        return pose

    def process_stereo_pair(self, img_l, img_r, timestamp: float):
        """`System::TrackStereo` equivalent (rectified pair)."""
        from ..frontend.extractor import make_frame_stereo

        frame = make_frame_stereo(
            jnp.asarray(img_l, jnp.float32), jnp.asarray(img_r, jnp.float32),
            self.K, self.dist, self.config.frontend,
            jnp.float32(self.config.baseline),
        )
        return self.process_frame(frame, timestamp)

    def process_stereo_inertial(self, img_l, img_r, timestamp: float,
                                acc, gyro, dts):
        """Stereo frames + queued IMU (the IMU_STEREO sensor mode)."""
        self.grab_imu(acc, gyro, dts)
        return self.process_stereo_pair(img_l, img_r, timestamp)

    def process_rgbd_inertial(self, img, depth_map, timestamp: float,
                              acc, gyro, dts):
        """RGB-D frames + queued IMU (the IMU_RGBD sensor mode)."""
        self.grab_imu(acc, gyro, dts)
        return self.process_rgbd(img, depth_map, timestamp)

    def process_rgbd(self, img, depth_map, timestamp: float):
        """`System::TrackRGBD` equivalent: registered depth in meters (apply
        the sensor's depth factor before calling, or pass depth_factor via
        the frontend helper)."""
        from ..frontend.extractor import make_frame_rgbd

        bf = float(self.K[0]) * self.config.baseline
        frame = make_frame_rgbd(
            jnp.asarray(img, jnp.float32), jnp.asarray(depth_map, jnp.float32),
            self.K, self.dist, self.config.frontend, jnp.float32(bf),
        )
        return self.process_frame(frame, timestamp)

    # -- visual-inertial input (Tracking::GrabImuData equivalent) -----------

    def grab_imu(self, acc, gyro, dts):
        """Queue raw IMU samples (acc [M,3] m/s^2, gyro [M,3] rad/s, dts [M]
        s) covering the span since the previous camera frame."""
        acc = np.asarray(acc, np.float32).reshape(-1, 3)
        if len(acc) == 0:
            return
        chunk = (acc, np.asarray(gyro, np.float32).reshape(-1, 3),
                 np.asarray(dts, np.float32).reshape(-1))
        self._imu_frame.append(chunk)
        self._imu_kf.append(chunk)
        self._imu_seq += 1  # monotonic: anchors pipelined-VI window splits

    def process_image_inertial(self, img, timestamp, acc, gyro, dts):
        """`System::TrackMonocular` with IMU measurements (the inertial
        grab path, `Tracking.cc:1459`)."""
        self.grab_imu(acc, gyro, dts)
        return self.process_image(img, timestamp)

    def _cat_imu(self, chunks):
        from ..geometry import imu as imu_mod
        acc = np.concatenate([c[0] for c in chunks])
        gyr = np.concatenate([c[1] for c in chunks])
        dts = np.concatenate([c[2] for c in chunks])
        # padded: the anchor-KF window grows every frame; unpadded, each
        # length is a fresh XLA compile of the scan
        return imu_mod.preintegrate_padded(self.imu_calib, acc, gyr, dts,
                                           bias_g=self.bias_g,
                                           bias_a=self.bias_a)

    def _body_state(self, T_cw):
        """T_cw -> (R_wb [3,3], p_w [3]) through the body-camera extrinsic."""
        T_bw = lie.se3_mul(lie.se3_inv(self.T_cb), jnp.asarray(T_cw))
        R_bw = lie.quat_to_matrix(lie.se3_q(T_bw))
        R_wb = R_bw.T
        p_w = -(R_wb @ lie.se3_t(T_bw))
        return R_wb, p_w

    def _imu_predict(self):
        """`Tracking::PredictStateIMU` (`Tracking.cc:1564`): dead-reckon the
        last camera pose through the preintegrated samples since that frame.
        Returns (T_cw_pred [7], v_pred [3] np) or None when no samples."""
        if not self._imu_frame:
            return None
        from ..geometry import imu as imu_mod
        pre = self._cat_imu(self._imu_frame)
        R_wb, p_w = self._body_state(self.last_pose)
        R2, v2, p2 = imu_mod.predict_state(
            pre, R_wb, jnp.asarray(self.vel_w), p_w,
            bias_g=jnp.asarray(self.bias_g), bias_a=jnp.asarray(self.bias_a),
            gravity=jnp.asarray(imu_mod.GRAVITY),
        )
        q_bw = lie.quat_from_matrix(R2.T)
        T_bw = lie.se3(q_bw, -(R2.T @ p2))
        T_pred = lie.se3_mul(self.T_cb, T_bw)
        return T_pred, np.asarray(v2)

    def process_frame(self, frame: Frame, timestamp: float):
        self.n_frames += 1
        self._cur_ts = timestamp
        if self.state == NOT_INITIALIZED:
            if self.config.depth_sensor and frame.depth is not None:
                pose = self._try_initialize_depth(frame)
            else:
                pose = self._try_initialize(frame)
        elif self.async_depth > 0 and not self.inertial:
            pose = self._track_pipelined(frame, timestamp)
        elif self._vi_pipeline_active(timestamp):
            pose = self._track_pipelined_vi(frame, timestamp)
        else:
            pose = self._track(frame, timestamp)
        if pose is not None:
            # device array kept as-is: materializing here would force a
            # host sync per frame; consumers (save_trajectory, rebase)
            # materialize lazily
            self.trajectory.append((timestamp, pose, self.state))
        return pose

    # -- pipelined tracking (dispatch-only; decisions run depth frames late)

    def _track_pipelined(self, frame: Frame, timestamp: float):
        # dispatch this frame against the freshest device-side pose chain
        T_pred = lie.se3_mul(self.velocity, self.last_pose)
        res = track_frame(self.map, frame, T_pred, self.K, self.config)
        return self._pipeline_push(frame, timestamp, res)

    def _pipeline_push(self, frame: Frame, timestamp: float, res, vis=None):
        res.n_inliers.copy_to_host_async()  # overlap the D2H readback
        # device-future chain: prediction stays per-frame fresh even though
        # the host decision lags
        self.velocity = lie.se3_mul(res.T_cw, lie.se3_inv(self.last_pose))
        self.last_pose = res.T_cw
        self._pipeline.append((timestamp, frame, res, vis))
        if len(self._pipeline) > self.async_depth:
            self._retire_pipelined()
        return res.T_cw

    def _retire_pipelined(self):
        """Resolve the oldest in-flight frame and run its host-side state
        machine (lost handling, visibility counters, keyframe decision)."""
        if len(self._pipeline[0]) == 5:  # VI record
            return self._retire_vi(*self._pipeline.pop(0))
        ts, frame, res, vis = self._pipeline.pop(0)
        n_inl = int(res.n_inliers)  # readback started at dispatch time
        if n_inl < self.config.min_track_inliers:
            self.state = RECENTLY_LOST if self.state == OK else LOST
            self._lost_frames += 1
            # drop the poisoned device chain: restart prediction from the
            # last retired-good pose
            if self._pipeline:
                self._pipeline.clear()
            self.velocity = lie.se3_identity()
            return
        self._lost_frames = 0
        self.state = OK
        self._last_good_ts = ts
        # always apply the incremental visibility update: with async_depth
        # frames in flight, a dispatch-time full-array snapshot would drop
        # the other in-flight frames' increments (each retire would overwrite
        # the counters with a stale snapshot)
        self.map = update_visibility(self.map, res.visible, res.found)
        self.frames_since_kf += 1
        if self._need_new_keyframe(n_inl):
            # stamp the retired frame's timestamp, not the newest dispatched
            # one (_cur_ts runs up to async_depth frames ahead of the retire)
            self._cur_ts = ts
            self._create_keyframe(frame, res)

    def flush_pipeline(self):
        """Drain all in-flight frames (sequence end / before map export)."""
        while self._pipeline:
            self._retire_pipelined()

    # -- pipelined visual-inertial tracking ---------------------------------
    #
    # The reference overlaps its tracking/mapping threads in ALL sensor
    # modes (System.cc:209,226); the sync VI path here pays two blocking
    # device round-trips per frame (inlier gate + bias readback). This lane
    # removes both: pose, velocity, and bias ride the device-future chain,
    # the per-frame pose-inertial refinement runs unconditionally with a
    # traced inlier gate selecting its outputs, and the host state machine
    # retires records `async_depth` frames later from ONE packed async
    # readback ([10]: n_inliers | v | bg | ba).

    def _vi_pipeline_active(self, timestamp: float) -> bool:
        """Route a frame to the pipelined VI lane? OK frames always; an
        IMU-initialized RECENTLY_LOST span stays in the lane too — the
        dispatch chain dead-reckons through it on device, and dropping to
        the sync path mid-span would interleave out-of-order with records
        still in flight."""
        if not (self.async_depth > 0 and self.inertial):
            return False
        if self.state == OK:
            return True
        return (self.state == RECENTLY_LOST and self.imu_initialized
                and self._last_good_ts is not None
                and timestamp - self._last_good_ts < 5.0)

    def _track_pipelined_vi(self, frame: Frame, timestamp: float):
        from ..geometry import imu as imu_mod

        if self._vel_dev is None:  # (re-)seed the device chain from mirrors
            self._vel_dev = jnp.asarray(self.vel_w)
            self._bias_g_dev = jnp.asarray(self.bias_g)
            self._bias_a_dev = jnp.asarray(self.bias_a)
        # -- prediction: dead-reckon the chained (in-flight) state ----------
        T_pred, v_pred = None, None
        if self.imu_initialized and self._imu_frame:
            pre_f = self._cat_imu(self._imu_frame)
            R_wb, p_w = self._body_state(self.last_pose)
            R2, v2, p2 = imu_mod.predict_state(
                pre_f, R_wb, self._vel_dev, p_w,
                bias_g=self._bias_g_dev, bias_a=self._bias_a_dev,
                gravity=jnp.asarray(imu_mod.GRAVITY),
            )
            q_bw = lie.quat_from_matrix(R2.T)
            T_pred = lie.se3_mul(self.T_cb, lie.se3(q_bw, -(R2.T @ p2)))
            v_pred = v2
        if T_pred is None:
            T_pred = lie.se3_mul(self.velocity, self.last_pose)
        self._imu_frame = []

        res = track_frame(self.map, frame, T_pred, self.K, self.config)
        ok = res.n_inliers >= self.config.min_track_inliers
        v_chain = self._vel_dev if v_pred is None else v_pred
        bg_chain, ba_chain = self._bias_g_dev, self._bias_a_dev
        # bad frame -> the chain dead-reckons through it (RECENTLY_LOST
        # continuation is built into the dispatch, `Tracking.cc:1784-1812`)
        T_sel = jnp.where(ok, res.T_cw, T_pred)

        s = self.last_kf_slot
        if (self.imu_initialized and self._imu_kf
                and s is not None and s >= 0):
            # Optimizer::PoseInertialOptimizationLastKeyFrame (:4181) with
            # the gate traced: always dispatched, outputs selected below
            pre = self._cat_imu(self._imu_kf)
            T_cb_inv = lie.se3_inv(self.T_cb)
            T_bw0 = lie.se3_mul(T_cb_inv, res.T_cw)
            T_bw_a = lie.se3_mul(T_cb_inv, self.map.kf_pose[s])
            v_a = jnp.asarray(self.kf_vel.get(s, np.zeros(3, np.float32)))
            # bias random walk anchored at the KEYFRAME's bias (stable
            # between keyframes, `Optimizer.cc:4181`) — anchoring at the
            # rolling mirror would 2-cycle through the retire lag
            bg_a, ba_a = self.kf_bias.get(s, (self.bias_g, self.bias_a))
            valid = res.obs >= 0
            pts = self.map.pt_pos[jnp.clip(res.obs, 0)]
            sigma2 = jnp.asarray(self.config.frontend.sigma2,
                                 jnp.float32)[frame.level]
            T_bw, v, bg2, ba2, inl, _ = pose_opt.pose_inertial_optimization(
                T_bw0, v_chain, bg_chain, ba_chain,
                T_bw_a, v_a, jnp.asarray(bg_a), jnp.asarray(ba_a), pre,
                pts, frame.xy, sigma2, valid, self.K, self.T_cb,
                jnp.asarray(imu_mod.GRAVITY),
            )
            # the inertial refinement's role is robustness when the VISUAL
            # solve is weak (few inliers — low texture, motion blur); on a
            # well-tracked frame the visual solution is the better estimate
            # and the anchored inertial prior only drags it (the sync mono
            # path equivalently tracks visually and dead-reckons the VI
            # state). Select the refined output only for weak frames.
            weak = res.n_inliers < 4 * self.config.min_track_inliers
            use_ref = ok & weak
            T_sel = jnp.where(
                use_ref, lie.se3_mul(self.T_cb, T_bw), T_sel)
            res = res._replace(
                T_cw=T_sel,
                obs=jnp.where(use_ref & ~inl, -1, res.obs),
                n_inliers=jnp.where(use_ref, jnp.sum(inl), res.n_inliers),
            )
            v_chain = jnp.where(use_ref, v, v_chain)
            bg_chain = jnp.where(use_ref, bg2, bg_chain)
            ba_chain = jnp.where(use_ref, ba2, ba_chain)
        else:
            res = res._replace(T_cw=T_sel)

        packed = jnp.concatenate([
            res.n_inliers.astype(jnp.float32)[None],
            v_chain, bg_chain, ba_chain,
        ])
        packed.copy_to_host_async()  # ONE async D2H per frame
        self.velocity = lie.se3_mul(res.T_cw, lie.se3_inv(self.last_pose))
        self.last_pose = res.T_cw
        self._vel_dev = v_chain
        self._bias_g_dev, self._bias_a_dev = bg_chain, ba_chain
        self._pipeline.append((timestamp, frame, res, packed,
                               self._imu_seq))
        # retire eagerly once a record's packed readback has landed (same
        # policy as the autonomous lane): the state machine stays ~1 frame
        # behind instead of async_depth, with the depth bound as backstop
        while (self._pipeline
               and ((len(self._pipeline) >= 2
                     and self._record_ready((None, self._pipeline[0][3])))
                    or len(self._pipeline) > self.async_depth)):
            self._retire_pipelined()
        return res.T_cw

    def _retire_vi(self, ts, frame, res, packed, imu_seq):
        """Retire one in-flight VI frame: fold the packed readback into the
        host mirrors and run the state machine (loss handling, visibility,
        keyframe decision with correct IMU-window attribution)."""
        rec = np.asarray(packed)  # readback started at dispatch time
        n_inl = int(rec[0])
        v_host = rec[1:4].astype(np.float32)
        bg_host = rec[4:7].astype(np.float32)
        ba_host = rec[7:10].astype(np.float32)
        if n_inl < self.config.min_track_inliers:
            if (self.imu_initialized and self._last_good_ts is not None
                    and ts - self._last_good_ts < 5.0):
                # the dispatch chain already dead-reckoned through this
                # frame (T_pred selected on device); keep streaming
                self.state = RECENTLY_LOST
                self.vel_w, self.bias_g, self.bias_a = (
                    v_host, bg_host, ba_host)
                self.frames_since_kf += 1
                return
            self.state = RECENTLY_LOST if self.state == OK else LOST
            self._lost_frames += 1
            self._pipeline.clear()
            self.velocity = lie.se3_identity()
            self._vel_dev = None  # re-seed from mirrors on re-entry
            if (self.atlas is not None and self.state == LOST
                    and self._lost_frames >= 5 and int(self.map.n_kf) >= 10):
                self._new_map_in_atlas()
            return
        self._lost_frames = 0
        self.state = OK
        self._last_good_ts = ts
        self.vel_w, self.bias_g, self.bias_a = v_host, bg_host, ba_host
        self.map = update_visibility(self.map, res.visible, res.found)
        self.frames_since_kf += 1
        self._cur_ts = ts  # the decision + keyframe stamp use THIS frame
        if self._need_new_keyframe(n_inl):
            # the keyframe's IMU window ends at THIS frame, not at the
            # newest dispatched one. The split point is recovered from the
            # monotonic grab counter — an absolute list index would go
            # stale the moment an EARLIER retire created a keyframe and
            # truncated _imu_kf (mis-sliced windows corrupt kf_preint and
            # with it the whole IMU initialization)
            n_after = self._imu_seq - imu_seq  # chunks grabbed since dispatch
            cut = max(0, len(self._imu_kf) - n_after)
            tail = self._imu_kf[cut:]
            self._imu_kf = self._imu_kf[:cut]
            gen0 = self._rebase_gen
            self._pending_rebase_S = None
            chain = (self.last_pose, self._vel_dev,
                     self._bias_g_dev, self._bias_a_dev)
            self._create_keyframe(frame,
                                  res._replace(n_inliers=np.int32(n_inl)))
            self._imu_kf = tail
            if self._rebase_gen != gen0:
                # the keyframe triggered a world rebase (IMU init / VIBA
                # scale / atlas merge): in-flight records hold old-frame
                # poses — drop them. The chain head (newest dispatched
                # pose) is transported into the new frame with the
                # accumulated Sim3 so the next prediction does not jump
                # back to the (older) keyframe pose; velocity/bias re-seed
                # from the mirrors the init/VIBA routine just wrote.
                self._pipeline.clear()
                self.velocity = lie.se3_identity()
                self._vel_dev = None
                if self._pending_rebase_S is not None:
                    S = self._pending_rebase_S
                    Sc = lie.sim3_mul(lie.sim3_from_se3(chain[0]),
                                      lie.sim3_inv(S))
                    self.last_pose = lie.se3(
                        lie.sim3_q(Sc),
                        lie.sim3_t(Sc)
                        / jnp.maximum(lie.sim3_s(Sc), 1e-12))
                self._pending_rebase_S = None
                if self.imu_initialized and tail:
                    # the mirror velocity is valid at the KEYFRAME frame;
                    # the chain head is len(tail) frames ahead. Propagate
                    # it through the leftover IMU window — seeding the next
                    # refine with a frames-stale velocity makes its
                    # inertial prior drag the pose off the visual solution
                    from ..geometry import imu as imu_mod
                    pre_t = self._cat_imu(tail)
                    s_kf = self.last_kf_slot
                    R_wb, p_w = self._body_state(self.map.kf_pose[s_kf])
                    _, v_head, _ = imu_mod.predict_state(
                        pre_t, R_wb, jnp.asarray(self.vel_w), p_w,
                        bias_g=jnp.asarray(self.bias_g),
                        bias_a=jnp.asarray(self.bias_a),
                        gravity=jnp.asarray(imu_mod.GRAVITY),
                    )
                    self._vel_dev = v_head
                    self._bias_g_dev = jnp.asarray(self.bias_g)
                    self._bias_a_dev = jnp.asarray(self.bias_a)
            else:
                # keep the newest-dispatched chain, but TRANSPORT the
                # mapper's BA correction onto it: the keyframe moved from
                # res.T_cw (as tracked) to map.kf_pose[s] (BA-refined);
                # apply the same world-side delta to the chain pose so
                # predictions keep following the refined map instead of
                # drifting off it (sync mode gets this for free because
                # on_new_keyframe resets last_pose to the refined pose)
                s = self.last_kf_slot
                delta = lie.se3_mul(lie.se3_inv(res.T_cw),
                                    self.map.kf_pose[s])
                self.last_pose = lie.se3_mul(chain[0], delta)
                (self._vel_dev,
                 self._bias_g_dev, self._bias_a_dev) = chain[1:]

    # -- device-autonomous mode (zero per-frame host syncs) -----------------

    def enter_autonomous(self):
        """Switch steady-state tracking to the fully device-side step
        (`autonomous_step`): keyframe decision + mapper chain run under
        `lax.cond` inside the per-frame dispatch, host bookkeeping catches
        up from async flag readbacks `async_depth` frames later. Requires
        an initialized visual (non-inertial) tracker."""
        if self.state != OK or self.inertial or self.local_mapper is None:
            return False
        # drain any in-flight pipelined frames first: a record left in
        # _pipeline would otherwise retire much later against a map whose
        # slots the autonomous chain has since renumbered, replaying a
        # stale state machine (spurious loss / keyframe on an ancient frame)
        self.flush_pipeline()
        if self.state != OK:
            return False
        fc = self.config.frontend
        mc = self.local_mapper
        self._auto_cfg = (
            mc.n_neighbors, fc.n_levels, fc.scale_factor,
            mc.ba_local, mc.ba_fixed, mc.ba_pts, mc.ba_iters,
            mc.run_ba_every,
        )
        self._auto_state = AutoState(
            T_cw=jnp.asarray(self.last_pose),
            velocity=jnp.asarray(self.velocity),
            frames_since_kf=jnp.int32(self.frames_since_kf),
            ref_tracked=jnp.int32(max(self.ref_kf_tracked, 1)),
            kf_count=jnp.int32(mc._kf_count),
        )
        self._auto_flags = []
        self._auto_imgs = []
        self.autonomous = True
        return True

    def _process_autonomous(self, img, timestamp: float):
        B = max(int(self.auto_batch), 1)
        if B <= 1:
            m, st, packed = autonomous_step_packed(
                img, self.map, self._auto_state,
                self.K, self.dist, self.config, self._auto_cfg,
            )
            self._push_auto_record(m, st, [timestamp], packed)
        else:
            # upload NOW (async H2D) rather than at dispatch: the transfer
            # overlaps the in-flight batch's device compute instead of
            # serializing in front of the next dispatch (~350 KB/frame is
            # ~9 ms on the tunnel — half a 60 fps budget)
            self._auto_imgs.append((jnp.asarray(img), timestamp))
            if len(self._auto_imgs) >= B:
                imgs = jnp.stack([im for im, _ in self._auto_imgs])
                tss = [t for _, t in self._auto_imgs]
                self._auto_imgs = []
                m, st, packed = autonomous_step_batch(
                    imgs, self.map, self._auto_state,
                    self.K, self.dist, self.config, self._auto_cfg,
                )
                self._push_auto_record(m, st, tss, packed)
        # retire eagerly once a record's flags are device-ready AND a newer
        # record has been dispatched since (its async host copy has then had
        # a full batch of wall time to land — reading an in-flight copy
        # costs a relay round trip, ~80 ms on the tunnel; a settled one is
        # free). Keeps the host mirrors ~one batch behind for the protocol
        # loop, with the depth bound as the blocking backstop.
        while (self.autonomous and self._auto_flags
               and ((len(self._auto_flags) >= 2
                     and self._record_ready(self._auto_flags[0]))
                    or self._pending_auto_frames() > max(self.async_depth, 1))):
            if self._retire_auto_record():
                # the record ended lost: fold every remaining in-flight
                # record first (their device effects already live in the
                # map — discarding them would delete their trajectory rows
                # and keyframe metadata), then hand control plus any
                # buffered-but-undispatched frames back to the host state
                # machine (reloc/atlas)
                while self._auto_flags:
                    self._retire_auto_record()
                pending = self._auto_imgs
                self._auto_imgs = []
                self.exit_autonomous(drain=False)
                pose = self._auto_state.T_cw
                for im, t in pending:
                    self.n_frames -= 1  # counted at first submission
                    p = self.process_image(im, t)
                    pose = p if p is not None else pose
                return pose
        if self._atlas_check_pending and self.autonomous:
            self._atlas_check_pending = False
            self.drain_auto()
            if self.autonomous:
                self._atlas_merge_back()
        return self._auto_state.T_cw

    def _push_auto_record(self, m, st, tss, packed):
        self.map = m
        self._auto_state = st
        packed.copy_to_host_async()  # ONE async D2H for the whole record
        self._auto_flags.append((tss, packed, len(tss)))

    def _pending_auto_frames(self):
        return sum(rec[2] for rec in self._auto_flags)

    @staticmethod
    def _record_ready(rec):
        """Non-blocking: True when a dispatched record's packed outcome has
        landed on the host (its retire will not stall the pipeline)."""
        try:
            return rec[1].is_ready()
        except AttributeError:  # backend without is_ready: treat as done
            return True

    def _retire_auto_record(self):
        """Fold one dispatched record (1..B frames) back into the host
        mirrors: trajectory rows, keyframe metadata, state machine.
        Returns True when the host must leave autonomous mode (the record
        ends with a lost frame and the device chain did not recover)."""
        tss, packed, n = self._auto_flags.pop(0)
        rec = np.atleast_2d(np.asarray(packed))  # [B,10]: pose7|kf|good|inl
        poses_np = rec[:, :7]
        made = rec[:, 7] > 0.5
        good = rec[:, 8] > 0.5
        ninl = rec[:, 9]
        for i in range(n):
            ts = tss[i]
            # record only tracked frames (host-path parity: a lost frame
            # returns None and leaves no trajectory row — the device chain
            # holds the last pose on bad frames, and recording that frozen
            # pose would poison the evaluated trajectory)
            if good[i] and i < poses_np.shape[0]:
                self.trajectory.append((ts, poses_np[i], OK))
            if made[i]:
                s = self.n_kf_host
                self.n_kf_host += 1
                self.meta.kf_uuid[s] = self.meta.new_uuids(1)[0]
                self.meta.kf_creator[s] = self.meta.agent_id
                self.last_kf_slot = s
                self.kf_timestamps[s] = ts
                self.ref_kf_tracked = int(ninl[i])
                self.meta_dirty = True
                if self.local_mapper is not None:
                    self.local_mapper._kf_count += 1
                if self.atlas is not None and self.atlas.inactive:
                    self._atlas_check_pending = True
            if not good[i]:
                self._lost_frames += 1
                self.state = RECENTLY_LOST if self.state == OK else LOST
            else:
                self._lost_frames = 0
                self.state = OK
                self._last_good_ts = ts
        # exit only when the record ENDS lost: a mid-batch bad frame the
        # device chain recovered from (it holds pose + resets the motion
        # model, mirroring RECENTLY_LOST) does not need host intervention
        return not bool(good[-1])

    def drain_auto(self):
        """Retire every pending record — autonomous flags AND pipelined
        (visual or VI) in-flight frames — so the host mirrors are current,
        WITHOUT leaving autonomous mode unless a frame was lost. Call
        before any host-side map surgery (merge / splice / rebase /
        serialization)."""
        self.flush_pipeline()
        if not getattr(self, "autonomous", False):
            return
        self._flush_auto_buffer()
        while self._auto_flags and self.autonomous:
            if self._retire_auto_record():
                self.exit_autonomous(drain=False)
        if self.autonomous:
            # sync the host pose mirrors for consumers (save/merge paths)
            st = self._auto_state
            self.last_pose = st.T_cw
            self.velocity = st.velocity
            self.frames_since_kf = int(st.frames_since_kf)

    def _flush_auto_buffer(self):
        """Dispatch frames buffered for a partial batch one at a time."""
        for img, ts in self._auto_imgs:
            m, st, packed = autonomous_step_packed(
                img, self.map, self._auto_state,
                self.K, self.dist, self.config, self._auto_cfg,
            )
            self._push_auto_record(m, st, [ts], packed)
        self._auto_imgs = []

    def exit_autonomous(self, drain: bool = True):
        """Leave autonomous mode, folding device state back into the host
        mirrors. With drain=True all pending flags retire first."""
        if not getattr(self, "autonomous", False):
            return
        self.autonomous = False
        if drain:
            self._flush_auto_buffer()
            while self._auto_flags:
                self._retire_auto_record()
        else:
            self._auto_flags = []
            self._auto_imgs = []
        st = self._auto_state
        self.last_pose = st.T_cw
        self.velocity = st.velocity
        self.frames_since_kf = int(st.frames_since_kf)
        # the device map is the source of truth for the KF count: pending
        # flags dropped by drain=False may have carried made_kf=True, and
        # the device chain already appended those keyframes. Resync the host
        # mirror (one readback when leaving autonomous is fine) and stamp
        # metadata for any slots the flag retire never covered — otherwise
        # every later host keyframe operation addresses the wrong slot.
        dev_n = int(self.map.n_kf)
        ts_fallback = self._last_good_ts if self._last_good_ts is not None \
            else self._cur_ts
        while self.n_kf_host < dev_n:
            s = self.n_kf_host
            self.n_kf_host += 1
            self.meta.kf_uuid[s] = self.meta.new_uuids(1)[0]
            self.meta.kf_creator[s] = self.meta.agent_id
            self.last_kf_slot = s
            self.kf_timestamps[s] = ts_fallback
            self.meta_dirty = True
            if self.local_mapper is not None:
                self.local_mapper._kf_count += 1

    # -- initialization -----------------------------------------------------

    def _try_initialize_depth(self, frame: Frame):
        """`Tracking::StereoInitialization` (`Tracking.cc:2194`): one frame
        with enough valid depth bootstraps the map at true scale — keyframe
        at identity, points unprojected from the depth channel."""
        n_depth = int(np.asarray((frame.depth > 0) & frame.valid).sum())
        if n_depth < self.config.min_init_stereo_points:
            return None
        T1 = lie.se3_identity()
        m, _ = map_state.add_keyframe(
            self.map, T1, frame.xy, frame.level, frame.angle, frame.desc,
            frame.valid, jnp.full((frame.capacity,), -1, jnp.int32),
            ur=frame.ur,
        )
        m, _ = create_points_from_depth(
            m, jnp.int32(0), frame, self.K, jnp.float32(1e9),
            self.config.frontend.n_levels, self.config.frontend.scale_factor,
        )
        self.map = m
        self.n_kf_host = 1
        self.meta.kf_uuid[0] = self.meta.new_uuids(1)[0]
        self.meta.kf_creator[0] = self.meta.agent_id
        self.meta_dirty = True
        self.flush_meta()
        self.last_pose = T1
        self.velocity = lie.se3_identity()
        self.last_kf_slot = 0
        self.kf_timestamps[0] = self._cur_ts
        self.ref_kf_tracked = n_depth
        self.frames_since_kf = 0
        self.state = OK
        self._last_good_ts = self._cur_ts
        if self.inertial:
            # stereo/RGBD-inertial: the map is metric from frame one; the
            # IMU init later estimates gravity/velocities at FIXED scale
            self.kf_chain = [0]
            self.kf_vel = {0: np.zeros(3, np.float32)}
            self.kf_preint = {}
            self._imu_kf = []
            self._imu_frame = []
        if self.local_mapper is not None:
            self.local_mapper.on_initial_map(self)
        return T1

    def _try_initialize(self, frame: Frame):
        if self.init_frame is None or int(frame.valid.sum()) <= self.config.min_init_matches:
            if int(frame.valid.sum()) > self.config.min_init_matches:
                self.init_frame = frame
                self._init_ts = self._cur_ts
                self._imu_kf = []  # preintegration starts at the init frame
            return None
        f1, f2 = self.init_frame, frame
        idx, ok = matching.search_for_initialization(
            f1.xy, f1.desc, f1.angle, f1.valid,
            f2.xy, f2.desc, f2.angle, f2.valid,
        )
        n_matches = int(ok.sum())
        if n_matches < self.config.min_init_matches:
            # reference resets the initializer when matches are too few
            self.init_frame = frame
            self._init_ts = self._cur_ts
            self._imu_kf = []
            return None

        xn1 = cameras.pinhole_unproject(self.K, f1.xy)
        xn2 = cameras.pinhole_unproject(self.K, f2.xy[jnp.clip(idx, 0)])
        self.key, sub = jax.random.split(self.key)
        res = two_view.reconstruct_two_views(
            sub, xn1, xn2, ok, focal=self.K[0],
            min_triangulated=50,
        )
        if not bool(res.ok):
            return None
        self._create_initial_map(f1, f2, idx, res)
        self.state = OK
        return self.last_pose

    def _create_initial_map(self, f1: Frame, f2: Frame, idx, res: two_view.TwoViewResult):
        """`Tracking::CreateInitialMapMonocular` (`Tracking.cc:2279`): two
        keyframes, triangulated points, median-depth scale normalization."""
        good = np.asarray(res.good)
        pts = np.asarray(res.points)
        depths = pts[good, 2]
        med = float(np.median(depths)) if good.any() else 1.0
        pts = pts / med
        T21 = np.array(res.T21)
        T21[4:7] /= med
        T1 = lie.se3_identity()
        T2 = jnp.asarray(T21)

        Fcap = f1.capacity
        # point slots assigned in feature order of frame 1
        m = self.map
        n = Fcap
        gmask = jnp.asarray(good)
        m, slots = map_state.add_points(
            m,
            pos=jnp.asarray(pts),
            desc=f1.desc,
            normal=jnp.zeros((n, 3), jnp.float32),
            min_dist=jnp.zeros((n,), jnp.float32),
            max_dist=jnp.full((n,), 1e9, jnp.float32),
            ref_kf=jnp.int32(0),
            valid=gmask,
        )
        obs1 = jnp.where(gmask, slots, -1)
        # frame2 feature j = idx[i] observes the same slot; route rows
        # without a valid match to a sacrificial slot (Fcap)
        write = gmask & (idx >= 0)
        tgt = jnp.where(write, idx, Fcap)
        obs2 = jnp.full((Fcap + 1,), -1, jnp.int32).at[tgt].set(
            jnp.where(write, slots, -1)
        )[:Fcap]
        m, s1 = map_state.add_keyframe(m, T1, f1.xy, f1.level, f1.angle, f1.desc, f1.valid, obs1)
        m, s2 = map_state.add_keyframe(m, T2, f2.xy, f2.level, f2.angle, f2.desc, f2.valid, obs2)
        m = map_state.update_point_stats(
            m, self.config.frontend.n_levels, self.config.frontend.scale_factor
        )
        self.map = m
        self.meta.kf_uuid[0:2] = self.meta.new_uuids(2)
        self.meta.kf_creator[0:2] = self.meta.agent_id
        npts = int(m.n_pt)
        self.meta.pt_uuid[:npts] = self.meta.new_uuids(npts)
        self.meta.pt_creator[:npts] = self.meta.agent_id

        self.last_pose = T2
        self.velocity = lie.se3_identity()
        self.last_kf_slot = 1
        self.n_kf_host = 2
        if self.inertial:
            # preintegration between the two bootstrap keyframes
            self.kf_chain = [0, 1]
            self.kf_vel = {0: np.zeros(3, np.float32), 1: np.zeros(3, np.float32)}
            if self._imu_kf:
                self.kf_preint = {1: self._cat_imu(self._imu_kf)}
            self._imu_kf = []
            self._imu_frame = []
            self._last_good_ts = self._cur_ts
        self.kf_timestamps[0] = self._init_ts
        self.kf_timestamps[1] = self._cur_ts
        self.ref_kf_tracked = int(gmask.sum())
        self.frames_since_kf = 0
        if self.local_mapper is not None:
            self.local_mapper.on_initial_map(self)

    # -- steady-state tracking ----------------------------------------------

    def _predict_pose(self):
        """Motion-model or IMU pose prediction for the next frame."""
        v_pred = None
        T_pred = None
        if self.inertial and self.imu_initialized:
            out = self._imu_predict()
            if out is not None:
                T_pred, v_pred = out
        if T_pred is None:
            T_pred = lie.se3_mul(self.velocity, self.last_pose)
        return T_pred, v_pred

    def _track(self, frame: Frame, timestamp: float):
        # visual RECENTLY_LOST/LOST: relocalize FIRST (`Tracking.cc:
        # 1780-1812` — the motion model is stale after a loss, and a wide
        # search from it can "recover" onto a biased pose; inertial mode
        # instead keeps dead-reckoning via _predict_pose below)
        if (self.state in (RECENTLY_LOST, LOST)
                and self.relocalizer is not None
                and not (self.inertial and self.imu_initialized)):
            pose = self._try_relocalize(frame, timestamp)
            if pose is not None:
                return pose
        T_pred, v_pred = self._predict_pose()
        res = track_frame(self.map, frame, T_pred, self.K, self.config)
        # once the IMU is initialized the per-frame pose solve includes the
        # preintegration factor + bias random walks
        # (Optimizer::PoseInertialOptimizationLastKeyFrame role) — the
        # visual-only solve above seeds it with matches + initial pose
        if (self.inertial and self.imu_initialized and self._imu_kf
                and self.last_kf_slot is not None
                and int(res.n_inliers) >= self.config.min_track_inliers):
            res, v_ref = self._pose_inertial_refine(frame, res, v_pred)
            if v_ref is not None:
                v_pred = v_ref
        return self._track_resolve(frame, timestamp, T_pred, v_pred, res)

    def _pose_inertial_refine(self, frame: Frame, res: TrackResult, v_pred):
        """15-dof per-frame refinement against the last keyframe's state:
        `Optimizer::PoseInertialOptimizationLastKeyFrame` (Optimizer.cc:4181;
        the LastFrame variant `:4545` is the same problem anchored one frame
        back). Updates pose, velocity, and the running bias estimate."""
        from ..geometry import imu as imu_mod

        s = self.last_kf_slot
        pre = self._cat_imu(self._imu_kf)
        if pre is None:
            return res, None
        T_cb_inv = lie.se3_inv(self.T_cb)
        T_bw0 = lie.se3_mul(T_cb_inv, res.T_cw)
        T_bw_a = lie.se3_mul(T_cb_inv, self.map.kf_pose[s])
        v0 = jnp.asarray(self.vel_w if v_pred is None else v_pred,
                         jnp.float32)
        v_a = jnp.asarray(self.kf_vel.get(s, np.zeros(3, np.float32)))
        bg = jnp.asarray(self.bias_g)
        ba = jnp.asarray(self.bias_a)
        valid = res.obs >= 0
        pts = self.map.pt_pos[jnp.clip(res.obs, 0)]
        sigma2 = jnp.asarray(self.config.frontend.sigma2,
                             jnp.float32)[frame.level]
        T_bw, v, bg2, ba2, inl, _ = pose_opt.pose_inertial_optimization(
            T_bw0, v0, bg, ba, T_bw_a, v_a, bg, ba, pre,
            pts, frame.xy, sigma2, valid, self.K, self.T_cb,
            jnp.asarray(imu_mod.GRAVITY),
        )
        self.bias_g = np.asarray(bg2, np.float32)
        self.bias_a = np.asarray(ba2, np.float32)
        res = res._replace(
            T_cw=lie.se3_mul(self.T_cb, T_bw),
            obs=jnp.where(inl, res.obs, -1),
            n_inliers=jnp.sum(inl),
        )
        return res, np.asarray(v, np.float32)

    def _try_relocalize(self, frame: Frame, timestamp: float):
        """`Tracking::Relocalization` (Tracking.cc:3276): BoW candidates +
        PnP, then projection re-matching + re-optimization against the
        local map (the reference's SearchByProjection tail — track_frame is
        exactly that two-stage refinement). Returns the pose or None."""
        ok, T, n = self.relocalizer(self.map, frame)
        if not ok:
            return None
        res2 = track_frame(self.map, frame, T, self.K, self.config)
        if int(res2.n_inliers) >= self.config.min_track_inliers:
            self.map = update_visibility(self.map, res2.visible, res2.found)
            T = res2.T_cw
        self.state = OK
        self._lost_frames = 0
        self.velocity = lie.se3_identity()
        self.last_pose = T
        self._imu_frame = []
        self._last_good_ts = timestamp
        self.frames_since_kf += 1
        return T

    def _track_resolve(self, frame: Frame, timestamp: float, T_pred, v_pred,
                       res: TrackResult, vis=None):
        n_inl = int(res.n_inliers)

        if n_inl < self.config.min_track_inliers:
            # RECENTLY_LOST with IMU: trust dead reckoning for up to 5 s
            # before declaring LOST (`Tracking.cc:1784-1812` mState ==
            # RECENTLY_LOST + PredictStateIMU) — this is what survives
            # textureless spans
            if (self.inertial and self.imu_initialized
                    and v_pred is not None
                    and self._last_good_ts is not None
                    and timestamp - self._last_good_ts < 5.0):
                self.state = RECENTLY_LOST
                self.last_pose = T_pred
                self.vel_w = v_pred
                self._imu_frame = []
                self.frames_since_kf += 1
                return T_pred
            # `Tracking::Relocalization` path (Tracking.cc:1784-1812,3276)
            if self.relocalizer is not None:
                pose = self._try_relocalize(frame, timestamp)
                if pose is not None:
                    return pose
            self.state = RECENTLY_LOST if self.state == OK else LOST
            self.velocity = lie.se3_identity()
            self._lost_frames += 1
            # `Tracking::CreateMapInAtlas` (Tracking.cc:2409): persistent LOST
            # with a mature map -> stash it and start a fresh submap
            if (
                self.atlas is not None and self.state == LOST
                and self._lost_frames >= 5 and int(self.map.n_kf) >= 10
            ):
                self._new_map_in_atlas()
            return None

        self._lost_frames = 0
        self.state = OK
        self._last_good_ts = timestamp
        if vis is not None:
            self.map = self.map._replace(pt_visible=vis[0], pt_found=vis[1])
        else:
            self.map = update_visibility(self.map, res.visible, res.found)
        self.velocity = lie.se3_mul(res.T_cw, lie.se3_inv(self.last_pose))
        if self.inertial and v_pred is not None:
            self.vel_w = v_pred  # IMU-propagated velocity at the new pose
        self.last_pose = res.T_cw
        self._imu_frame = []
        self.frames_since_kf += 1

        if self._need_new_keyframe(n_inl):
            self._create_keyframe(frame, res)
            # keyframe creation may have re-based the world (IMU init /
            # scale refinement / atlas merge-back): last_pose carries the
            # post-rebase pose — returning the stale res.T_cw would emit
            # one pose in the old frame
            return self.last_pose
        return res.T_cw

    def apply_world_sim3(self, S):
        """Re-base the tracker's continuation state by a world-level Sim3
        (gravity/scale alignment at IMU init, frame changes after merges):
        current pose composes like keyframe poses; the motion model resets."""
        self._rebase_gen += 1
        Sj = jnp.asarray(S)
        self._pending_rebase_S = (
            Sj if self._pending_rebase_S is None
            else lie.sim3_mul(Sj, self._pending_rebase_S))
        Sc = lie.sim3_mul(lie.sim3_from_se3(self.last_pose), lie.sim3_inv(Sj))
        self.last_pose = lie.se3(
            lie.sim3_q(Sc), lie.sim3_t(Sc) / jnp.maximum(lie.sim3_s(Sc), 1e-12)
        )
        self.velocity = lie.se3_identity()
        self.rebase_history(Sj)

    def rebase_history(self, S):
        """Re-base the recorded trajectory by a world-level Sim3 (applied when
        the agent's coordinate frame changes after a merge or a scale
        alignment, so the history stays in ONE frame — the reference instead
        tags each pose with its frame id and filters at evaluation time)."""
        Sj = jnp.asarray(S)
        Sinv = lie.sim3_inv(Sj)
        out = []
        for ts, T, state in self.trajectory:
            Sc = lie.sim3_mul(lie.sim3_from_se3(jnp.asarray(T)), Sinv)
            T2 = lie.se3(
                lie.sim3_q(Sc),
                lie.sim3_t(Sc) / jnp.maximum(lie.sim3_s(Sc), 1e-12),
            )
            out.append((ts, np.asarray(T2), state))
        self.trajectory = out

    def _new_map_in_atlas(self):
        """Stash the active map and restart on a fresh submap
        (`Tracking::CreateMapInAtlas`, `Tracking.cc:2409`)."""
        self.flush_meta()
        self.atlas.stash_active(self.map, self.meta, self.kf_timestamps)
        cfg = self.config
        self.map = map_state.create(cfg.kf_cap, cfg.pt_cap, cfg.frontend.capacity)
        self.meta = map_state.MapMeta.create(cfg.kf_cap, cfg.pt_cap,
                                             agent_id=self.meta.agent_id)
        self.map_epoch += 1
        self.state = NOT_INITIALIZED
        self.init_frame = None
        self.velocity = lie.se3_identity()
        self.last_pose = lie.se3_identity()
        self.kf_timestamps = {}
        self.frames_since_kf = 0
        self.ref_kf_tracked = 0
        self.last_kf_slot = -1
        self._lost_frames = 0
        self.n_kf_host = 0
        self._pipeline = []
        self.imu_initialized = False
        self.kf_chain = []
        self.kf_preint = {}
        self.kf_vel = {}
        self._imu_kf = []
        self._imu_frame = []
        if self.local_mapper is not None:
            self.local_mapper._kf_count = 0
        if self.relocalizer is not None and hasattr(self.relocalizer, "reset"):
            self.relocalizer.reset(cfg.kf_cap)

    def _need_new_keyframe(self, n_inliers: int):
        """`Tracking::NeedNewKeyFrame` gates (`Tracking.cc:2770`); thRefRatio
        is 0.9 mono / 0.75 with a depth sensor (`Tracking.cc:2845`)."""
        if self.n_kf_host >= self.config.kf_cap - 1:
            return False
        ratio = 0.75 if self.config.depth_sensor else self.config.kf_ref_ratio
        c1 = self.frames_since_kf >= self.config.max_frames_between_kf
        # IMU modes insert keyframes at >=4 Hz once initialized
        # (`Tracking.cc:2859` mSensor==IMU_* && dt>=0.25): the inertial BA
        # chain needs short preintegration spans, and VIBA/scale refinement
        # only runs on keyframe insertion
        if (self.inertial and self.imu_initialized
                and self._cur_ts is not None
                and self.last_kf_slot in self.kf_timestamps
                and self._cur_ts - self.kf_timestamps[self.last_kf_slot]
                >= 0.25):
            c1 = True
        c2 = n_inliers < ratio * max(self.ref_kf_tracked, 1)
        c3 = n_inliers > self.config.kf_min_inliers
        return (c1 or c2) and c3

    def _create_keyframe(self, frame: Frame, res: TrackResult):
        m, slot = map_state.add_keyframe(
            self.map, res.T_cw, frame.xy, frame.level, frame.angle,
            frame.desc, frame.valid, res.obs,
            ur=frame.ur if self.config.depth_sensor else None,
        )
        if self.config.depth_sensor and frame.depth is not None:
            # close-point creation from the depth channel (Tracking.cc:3015)
            m, _ = create_points_from_depth(
                m, jnp.int32(self.n_kf_host), frame, self.K,
                jnp.float32(self.config.th_depth),
                self.config.frontend.n_levels,
                self.config.frontend.scale_factor,
            )
            self.meta_dirty = True
        self.map = m
        # keyframes are append-only: the slot is known host-side without a
        # device readback (n_kf_host is resynced on merge/splice paths)
        s = self.n_kf_host
        self.n_kf_host += 1
        self.meta.kf_uuid[s] = self.meta.new_uuids(1)[0]
        self.meta.kf_creator[s] = self.meta.agent_id
        self.last_kf_slot = s
        self.kf_timestamps[s] = self._cur_ts
        self.frames_since_kf = 0
        self.ref_kf_tracked = int(res.n_inliers)
        if self.inertial:
            if self.kf_chain and self._imu_kf:
                self.kf_preint[s] = self._cat_imu(self._imu_kf)
            self.kf_chain.append(s)
            self.kf_vel[s] = np.asarray(self.vel_w, np.float32)
            self.kf_bias[s] = (self.bias_g.copy(), self.bias_a.copy())
            self._imu_kf = []
        if self.local_mapper is not None:
            self.local_mapper.on_new_keyframe(self, s)
        self._atlas_merge_back()

    def _atlas_merge_back(self):
        """Atlas merge-back: weld the fresh submap into a stored one when
        place recognition + Sim3 verification succeed (LoopClosing's
        active-to-stored map merge). Called after every new keyframe on the
        host path, and (drained) after autonomous-created keyframes."""
        if self.atlas is None or not self.atlas.inactive:
            return
        self.flush_meta()
        out = self.atlas.try_merge_back(self.map, self.meta, self.last_kf_slot)
        if out is not None:
            merged, meta, kf_map, S_ab, stored_ts = out
            self.map = merged
            self.meta = meta
            self.n_kf_host = int(merged.n_kf)
            self.map_epoch += 1
            Sj = jnp.asarray(S_ab)
            Sc = lie.sim3_mul(lie.sim3_from_se3(self.last_pose), lie.sim3_inv(Sj))
            self.last_pose = lie.se3(
                lie.sim3_q(Sc),
                lie.sim3_t(Sc) / jnp.maximum(lie.sim3_s(Sc), 1e-12),
            )
            self.velocity = lie.se3_identity()
            new_ts = dict(stored_ts)
            for slot, t in self.kf_timestamps.items():
                ns = int(kf_map[slot])
                if ns >= 0:
                    new_ts[ns] = t
            self.kf_timestamps = new_ts
            ns = int(kf_map[self.last_kf_slot])
            if ns < 0:
                # capacity overflow dropped the query keyframe from the weld:
                # fall back to the newest valid slot rather than silently
                # indexing -1 (Python negative indexing = the LAST slot)
                ns = int(merged.n_kf) - 1
            self.last_kf_slot = ns
            if self.relocalizer is not None and hasattr(self.relocalizer, "reset"):
                self.relocalizer.reset(self.config.kf_cap)  # slots changed
            if self.autonomous:
                # slot renumbering invalidated the device continuation
                self._auto_state = self._auto_state._replace(
                    T_cw=jnp.asarray(self.last_pose),
                    velocity=jnp.asarray(self.velocity),
                )
