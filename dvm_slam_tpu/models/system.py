"""System facade — the `ORB_SLAM3::System` API surface
(`orb_slam3/include/System.h:99-227`) for single-agent use, plus the atlas
checkpoint/resume path (`System::SaveAtlas/LoadAtlas`, `System.h:222-227`,
md5-checksummed like the reference).

The multi-agent runtime (`multiagent.agent.SlamAgent`) composes the same
pieces with the peer protocol on top; this facade is the drop-in entry point
for a reference user's single-agent workflow:

    sys = System(settings=..., agent_id=1)
    for ts, img in sequence:
        T_cw = sys.track_monocular(img, ts)
    sys.save_trajectory_tum("traj.txt")
    sys.save_atlas("atlas.dvm")
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..io import config as config_mod
from ..io import trajectory as traj_mod
from ..mapping import local_mapping, map_state
from ..multiagent import codec
from ..multiagent import wirecodec
from ..placerec import vocabulary
from ..tracking import tracker as trk

MONOCULAR = "monocular"
IMU_MONOCULAR = "imu-monocular"
STEREO = "stereo"
RGBD = "rgbd"
IMU_STEREO = "imu-stereo"
IMU_RGBD = "imu-rgbd"
_SENSORS = (MONOCULAR, IMU_MONOCULAR, STEREO, RGBD, IMU_STEREO, IMU_RGBD)


class System:
    def __init__(self, settings: "config_mod.SystemSettings | str",
                 sensor: str = MONOCULAR, agent_id: int = 0,
                 vocabulary_file: Optional[str] = None,
                 use_viewer: bool = False):
        if sensor not in _SENSORS:
            raise NotImplementedError(
                f"unknown sensor mode {sensor!r}; supported: {_SENSORS}"
            )
        if isinstance(settings, str):
            settings = config_mod.load_settings(settings)
        self.settings = settings
        self.sensor = sensor
        self.agent_id = agent_id
        self.voc = (vocabulary.load(vocabulary_file)
                    if vocabulary_file else None)
        cfg = settings.tracker_config()
        if sensor in (STEREO, RGBD, IMU_STEREO, IMU_RGBD):
            import dataclasses as _dc

            if settings.camera.baseline <= 0.0:
                raise ValueError(
                    "stereo/rgbd sensor needs camera.baseline (or the "
                    "reference's Camera.bf) in the settings"
                )
            cfg = _dc.replace(
                cfg, sensor="stereo" if sensor in (STEREO, IMU_STEREO)
                else "rgbd")
        self.mapper = local_mapping.LocalMapper()
        inertial = sensor in (IMU_MONOCULAR, IMU_STEREO, IMU_RGBD)
        self.tracker = trk.MonocularTracker(
            cfg, settings.camera.K(),
            np.asarray(settings.camera.dist, np.float32),
            local_mapper=self.mapper, rng_seed=agent_id,
            inertial=inertial,
            imu_calib=settings.imu.calib() if inertial else None,
            T_cb=np.asarray(settings.imu.T_cb, np.float32) if inertial else None,
        )
        self.tracker.meta.agent_id = agent_id
        self.use_viewer = use_viewer
        self.viewer = None
        self._viewer_every = 10
        if use_viewer:
            # `Viewer`/`MapDrawer`/`FrameDrawer` role: live window when a
            # display exists, PNG frame dumps otherwise (io.viz.LiveViewer)
            from ..io.viz import LiveViewer

            interactive = bool(os.environ.get("DISPLAY"))
            self.viewer = LiveViewer(
                out_dir=None if interactive else "viewer_frames",
                interactive=interactive,
            )
        if self.voc is not None:
            # with a vocabulary, enable relocalization and the multi-submap
            # atlas (new map on persistent LOST + merge-back)
            from ..mapping.atlas import Atlas
            from ..tracking.relocalization import RelocalizationService

            fc = settings.frontend_config()
            self.tracker.relocalizer = RelocalizationService(
                self.voc, settings.camera.K(), fc.sigma2,
                kf_cap=settings.kf_capacity,
            )
            self.tracker.atlas = Atlas(self.voc, settings.camera.K(), fc,
                                       agent_id=agent_id,
                                       fix_scale=cfg.depth_sensor or inertial)
        if settings.load_atlas_from_file:
            self.load_atlas(settings.load_atlas_from_file)
        # production overlap: device-autonomous tracking for visual modes
        # (the reference's always-on thread overlap, System.cc:209,226,245);
        # the tracker enters the fast lane itself once initialization is OK
        if getattr(settings, "autonomous", True) and not inertial:
            self.tracker.auto_mode = True
            self.tracker.auto_batch = int(getattr(settings, "auto_batch", 4))
            self.tracker.async_depth = int(getattr(settings, "async_depth", 8))
        elif getattr(settings, "autonomous", True) and inertial:
            # inertial modes overlap through the pipelined VI lane: pose/
            # velocity/bias ride the device-future chain, the state machine
            # retires async_depth frames later (tracker._track_pipelined_vi)
            self.tracker.async_depth = int(getattr(settings, "async_depth", 8))

    # -- tracking -------------------------------------------------------

    def track_monocular(self, img, timestamp: float):
        """`System::TrackMonocular` (`System.h:118`): grayscale (or RGB,
        converted) image in, world->camera SE3 [7] out (None before init)."""
        img = np.asarray(img)
        if img.ndim == 3:
            img = img.mean(-1)
        c = self.settings.camera
        if (c.new_width, c.new_height) != (None, None) and img.shape != (c.out_height, c.out_width):
            import jax
            img = np.asarray(jax.image.resize(
                jnp.asarray(img, jnp.float32), (c.out_height, c.out_width), "linear"
            ))
        pose = self.tracker.process_image(img.astype(np.float32), timestamp)
        self._maybe_draw(img)
        return pose

    def _maybe_draw(self, img=None):
        if self.viewer is None:
            return
        if self.tracker.n_frames % self._viewer_every:
            return
        self.viewer.update(self.tracker.map,
                           trajectory=self.tracker.trajectory[-200:],
                           img=img)

    def track_stereo(self, img_left, img_right, timestamp: float):
        """`System::TrackStereo` (`System.h:124`): rectified grayscale pair
        in, world->camera SE3 [7] out."""
        img_left = self._prep(img_left)
        img_right = self._prep(img_right)
        return self.tracker.process_stereo_pair(img_left, img_right, timestamp)

    def track_rgbd(self, img, depth_map, timestamp: float):
        """`System::TrackRGBD` (`System.h:131`): grayscale + registered depth
        (sensor units; scaled by camera.depth_map_factor)."""
        img = self._prep(img)
        depth = np.asarray(depth_map, np.float32) * self.settings.camera.depth_map_factor
        return self.tracker.process_rgbd(img, depth, timestamp)

    def _prep(self, img):
        img = np.asarray(img)
        if img.ndim == 3:
            img = img.mean(-1)
        c = self.settings.camera
        if (c.new_width, c.new_height) != (None, None) and img.shape != (c.out_height, c.out_width):
            import jax
            img = np.asarray(jax.image.resize(
                jnp.asarray(img, jnp.float32), (c.out_height, c.out_width), "linear"
            ))
        return img.astype(np.float32)

    def track_monocular_inertial(self, img, timestamp: float,
                                 acc, gyro, dts):
        """`System::TrackMonocular` with queued IMU samples (the
        IMU_MONOCULAR sensor mode): acc [M,3] m/s^2, gyro [M,3] rad/s,
        dts [M] s since the previous frame."""
        self.tracker.grab_imu(acc, gyro, dts)
        return self.track_monocular(img, timestamp)

    def track_stereo_inertial(self, img_left, img_right, timestamp: float,
                              acc, gyro, dts):
        """`System::TrackStereo` with queued IMU (IMU_STEREO): the map is
        metric from the stereo depth; IMU init estimates gravity/velocity/
        bias at FIXED scale."""
        self.tracker.grab_imu(acc, gyro, dts)
        return self.track_stereo(img_left, img_right, timestamp)

    def track_rgbd_inertial(self, img, depth_map, timestamp: float,
                            acc, gyro, dts):
        """`System::TrackRGBD` with queued IMU (IMU_RGBD)."""
        self.tracker.grab_imu(acc, gyro, dts)
        return self.track_rgbd(img, depth_map, timestamp)

    def is_imu_initialized(self):
        return self.tracker.imu_initialized

    def get_tracking_state(self):
        return self.tracker.state

    def get_agent_id(self):
        return self.agent_id

    @property
    def map(self):
        return self.tracker.map

    # -- map exchange (System.cc:1382-1426 equivalents) ------------------

    def serialize_map(self, own_only: bool = False) -> bytes:
        self.tracker.drain_auto()
        self.tracker.flush_meta()
        n = int(self.map.n_kf)
        mask = np.asarray(self.map.kf_valid).copy()
        mask[n:] = False
        if own_only:
            mask &= self.tracker.meta.kf_creator == self.agent_id
        return codec.extract_submap(self.map, self.tracker.meta, mask).to_bytes()

    # -- trajectory export -----------------------------------------------

    def save_trajectory_tum(self, path: str):
        self.tracker.drain_auto()
        traj_mod.save_tum(path, self.tracker.trajectory)

    def save_trajectory_euroc(self, path: str):
        self.tracker.drain_auto()
        traj_mod.save_euroc(path, self.tracker.trajectory)

    def save_trajectory_kitti(self, path: str):
        self.tracker.drain_auto()
        traj_mod.save_kitti(path, self.tracker.trajectory)

    def save_keyframe_trajectory_tum(self, path: str):
        """`System::SaveKeyFrameTrajectoryTUM`: keyframe poses only."""
        self.tracker.drain_auto()
        m = self.map
        rows = []
        for slot, ts in sorted(self.tracker.kf_timestamps.items(),
                               key=lambda kv: kv[1]):
            if slot < int(m.n_kf) and bool(m.kf_valid[slot]):
                rows.append((ts, np.asarray(m.kf_pose[slot]), "KF"))
        traj_mod.save_tum(path, rows)

    # -- checkpoint / resume ----------------------------------------------

    def save_atlas(self, path: str):
        """Atlas checkpoint (`System::SaveAtlas`): map packet + tracker
        continuation state + identity metadata, serialized with the typed
        `wirecodec` (never pickle — a checkpoint must be data, not code).
        The md5 prefix detects corruption only; it is not authentication."""
        blob = self.serialize_map(own_only=False)
        state = {
            "map": blob,
            "last_pose": np.asarray(self.tracker.last_pose),
            "velocity": np.asarray(self.tracker.velocity),
            "state": self.tracker.state,
            "kf_timestamps": self.tracker.kf_timestamps,
            "agent_id": self.agent_id,
            "trajectory": [(t, np.asarray(p), st)
                           for t, p, st in self.tracker.trajectory],
        }
        payload = wirecodec.dumps(state)
        digest = hashlib.md5(payload).hexdigest().encode()
        with open(path, "wb") as f:
            f.write(digest + b"\n")
            f.write(payload)

    def load_atlas(self, path: str):
        with open(path, "rb") as f:
            digest = f.readline().strip()
            payload = f.read()
        if hashlib.md5(payload).hexdigest().encode() != digest:
            raise IOError(f"atlas checksum mismatch: {path}")
        state = wirecodec.loads(payload)
        packet = codec.MapPacket.from_bytes(state["map"])
        fc = self.settings.frontend_config()
        mB, metaB = codec.materialize(packet, fc.capacity)
        # splice into the (empty) tracker map to respect its capacities
        from ..loopclosing import merge as merge_mod
        from ..geometry import lie

        merged, meta, kf_map, pt_map = merge_mod.merge_maps(
            self.tracker.map, self.tracker.meta, mB, metaB, lie.sim3_identity()
        )
        merged = map_state.update_point_stats(merged, fc.n_levels, fc.scale_factor)
        self.tracker.map = merged
        self.tracker.meta = meta
        self.tracker.n_kf_host = int(merged.n_kf)
        self.tracker.last_pose = jnp.asarray(state["last_pose"])
        self.tracker.velocity = jnp.asarray(state["velocity"])
        self.tracker.state = state["state"]
        self.tracker.kf_timestamps = {
            (int(kf_map[k]) if int(kf_map[k]) >= 0 else k): v
            for k, v in state["kf_timestamps"].items()
        }
        self.tracker.trajectory = state["trajectory"]
        self.tracker.last_kf_slot = int(merged.n_kf) - 1
        self.tracker.ref_kf_tracked = 30

    def shutdown(self):
        if self.settings.save_atlas_to_file:
            self.save_atlas(self.settings.save_atlas_to_file)
