"""Relocalization, own-map loop detection + optional correction, global BA."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dvm_slam_tpu.frontend.extractor import FrontendConfig, make_frame
from dvm_slam_tpu.io import synthetic
from dvm_slam_tpu.mapping import local_mapping, map_state
from dvm_slam_tpu.placerec import vocabulary
from dvm_slam_tpu.tracking import tracker, relocalization
from dvm_slam_tpu.loopclosing import loop_detector as ld
from dvm_slam_tpu.geometry import lie
from dvm_slam_tpu.eval import metrics

pytestmark = pytest.mark.slow  # heavy e2e; deselect with -m 'not slow'

H, W = 240, 320
K = np.array([260.0, 260.0, 160.0, 120.0], np.float32)


@pytest.fixture(scope="module")
def world():
    return synthetic.PlaneWorld(seed=3, tex_size=1024, plane_z=6.0, extent=30.0)


def make_voc(world, cfg, n=5):
    imgs = []
    traj = synthetic.smooth_trajectory(20, lateral=2.0, forward=0.5)
    for i in range(0, 20, 4):
        imgs.append(np.asarray(world.render(jnp.asarray(traj[i]), jnp.asarray(K), H, W)))
    descs = []
    for im in imgs:
        f = make_frame(jnp.asarray(im), jnp.asarray(K), jnp.zeros(4), cfg.frontend)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    return vocabulary.train(np.concatenate(descs)[:5000], branch=8, depth=2, seed=0)


class TestRelocalization:
    def test_recover_after_blackout(self, world):
        cfg = tracker.TrackerConfig(
            frontend=FrontendConfig(height=H, width=W, n_features=600),
            kf_cap=64, pt_cap=4096, fps=5.0,
        )
        voc = make_voc(world, cfg)
        reloc = relocalization.RelocalizationService(
            voc, K, cfg.frontend.sigma2, kf_cap=cfg.kf_cap
        )
        mapper = local_mapping.LocalMapper(n_neighbors=4, ba_local=8, ba_fixed=8,
                                           ba_pts=2048, ba_iters=6)
        t = tracker.MonocularTracker(cfg, K, np.zeros(4, np.float32),
                                     local_mapper=mapper, relocalizer=reloc)
        traj = synthetic.smooth_trajectory(40, lateral=2.0, forward=0.5, yaw=0.08)
        est_by_ts = {}
        for i in range(30):
            img = world.render(jnp.asarray(traj[i]), jnp.asarray(K), H, W)
            p = t.process_image(np.asarray(img), i * 0.1)
            if p is not None:
                est_by_ts[i] = np.asarray(p)
        assert t.state == tracker.OK
        # blackout: tracking fails, velocity resets
        black = np.zeros((H, W), np.float32)
        for j in range(3):
            t.process_image(black, 10.0 + j * 0.1)
        assert t.state in (tracker.RECENTLY_LOST, tracker.LOST)
        # revisit a previously mapped view: relocalization must recover
        img = world.render(jnp.asarray(traj[15]), jnp.asarray(K), H, W)
        pose = t.process_image(np.asarray(img), 20.0)
        assert t.state == tracker.OK, "relocalization failed"
        assert pose is not None
        # compare against the tracker's own pre-blackout estimate of the SAME
        # view (monocular map gauge is arbitrary; ground truth is not)
        ref = est_by_ts[15]
        err = np.linalg.norm(
            np.asarray(lie.se3_t(lie.se3_inv(jnp.asarray(pose))))
            - np.asarray(lie.se3_t(lie.se3_inv(jnp.asarray(ref))))
        )
        assert err < 0.1, f"relocalized pose off by {err:.3f} map units"


class TestLoopDetector:
    def test_triggers_on_drifted_revisit(self, world):
        """A loop situation = same place seen in two covisibility-disconnected
        epochs with accumulated drift. Build it by duplicating a real tracked
        map's keyframes+points as a second epoch with a Sim3 drift applied;
        the detector must match the new epoch's keyframes against the old
        ones and record a trigger after 3 consistent detections."""
        cfg = tracker.TrackerConfig(
            frontend=FrontendConfig(height=H, width=W, n_features=600),
            kf_cap=96, pt_cap=8192, fps=4.0,
        )
        voc = make_voc(world, cfg)
        mapper = local_mapping.LocalMapper(n_neighbors=4, ba_local=8, ba_fixed=8,
                                           ba_pts=2048, ba_iters=6)
        t = tracker.MonocularTracker(cfg, K, np.zeros(4, np.float32),
                                     local_mapper=mapper)
        traj = synthetic.smooth_trajectory(40, lateral=2.0, forward=0.5, yaw=0.08)
        for i, T_cw in enumerate(traj):
            img = world.render(jnp.asarray(T_cw), jnp.asarray(K), H, W)
            t.process_image(np.asarray(img), i * 0.1)
        assert t.state == tracker.OK
        m = t.map
        n_kf = int(m.n_kf)
        n_pt = int(m.n_pt)
        assert n_kf >= 4

        # duplicate as a drifted second epoch (disjoint points -> zero
        # cross-epoch covisibility)
        from dvm_slam_tpu.loopclosing import merge as merge_mod
        drift = jnp.concatenate([
            lie.so3_exp(jnp.asarray([0.0, 0.03, 0.0])),
            jnp.asarray([0.15, -0.05, 0.1, 1.06]),
        ])
        obs2 = jnp.where(m.kf_obs[:n_kf] >= 0, m.kf_obs[:n_kf] + n_pt, -1)
        m2 = m._replace(
            kf_pose=m.kf_pose.at[n_kf:2 * n_kf].set(
                np.asarray(merge_mod.transform_map(m, drift).kf_pose[:n_kf])
            ),
            kf_valid=m.kf_valid.at[n_kf:2 * n_kf].set(m.kf_valid[:n_kf]),
            kf_xy=m.kf_xy.at[n_kf:2 * n_kf].set(m.kf_xy[:n_kf]),
            kf_level=m.kf_level.at[n_kf:2 * n_kf].set(m.kf_level[:n_kf]),
            kf_angle=m.kf_angle.at[n_kf:2 * n_kf].set(m.kf_angle[:n_kf]),
            kf_desc=m.kf_desc.at[n_kf:2 * n_kf].set(m.kf_desc[:n_kf]),
            kf_feat_valid=m.kf_feat_valid.at[n_kf:2 * n_kf].set(m.kf_feat_valid[:n_kf]),
            kf_obs=m.kf_obs.at[n_kf:2 * n_kf].set(obs2),
            pt_pos=m.pt_pos.at[n_pt:2 * n_pt].set(
                lie.sim3_apply(drift[None], m.pt_pos[:n_pt])
            ),
            pt_valid=m.pt_valid.at[n_pt:2 * n_pt].set(m.pt_valid[:n_pt]),
            pt_desc=m.pt_desc.at[n_pt:2 * n_pt].set(m.pt_desc[:n_pt]),
            pt_ref_kf=m.pt_ref_kf.at[n_pt:2 * n_pt].set(
                jnp.where(m.pt_ref_kf[:n_pt] >= 0, m.pt_ref_kf[:n_pt] + n_kf, -1)
            ),
            n_kf=jnp.int32(2 * n_kf), n_pt=jnp.int32(2 * n_pt),
        )
        meta = t.meta
        meta.kf_uuid[n_kf:2 * n_kf] = meta.new_uuids(n_kf)
        meta.pt_uuid[n_pt:2 * n_pt] = meta.new_uuids(n_pt)
        meta.kf_creator[n_kf:2 * n_kf] = meta.kf_creator[:n_kf]

        # register epoch-1 bows, then run the detector over epoch-2 KFs
        from dvm_slam_tpu.placerec import database
        db = database.create(cfg.kf_cap, voc.n_words)
        levels, idf = voc.device_arrays()
        for slot in range(n_kf):
            bow = vocabulary.bow_vector(
                levels, idf, m2.kf_desc[slot], m2.kf_feat_valid[slot],
                voc.branch, voc.n_words,
            )
            db = database.add(db, jnp.int32(slot), bow)
        det = ld.LoopDetector(voc, K)
        fired = []
        for slot in range(n_kf, 2 * n_kf):
            bow = vocabulary.bow_vector(
                levels, idf, m2.kf_desc[slot], m2.kf_feat_valid[slot],
                voc.branch, voc.n_words,
            )
            db = database.add(db, jnp.int32(slot), bow)
            found, info = det.on_keyframe(m2, meta, db, slot)
            if found:
                fired.append((slot, info["match"]))
        assert len(det.triggers) > 0, "no loop trigger recorded"
        slot, match = fired[0]
        assert match < n_kf  # matched into the old epoch
        # the geometric verification must hold for the fired pair
        import jax as _jax
        res = merge_mod.compute_sim3_between(
            _jax.random.PRNGKey(5), m2, jnp.int32(slot), m2, jnp.int32(match),
            jnp.asarray(K),
        )
        assert bool(res.ok)


class TestGlobalBA:
    def test_reduces_drifted_map_error(self, rng):
        # synthetic consistent map, then perturb later poses+points
        from tests.test_mapping import make_ba_problem, K4

        poses, X, uv, obs_pt, sigma2 = make_ba_problem(rng, n_cams=6, n_pts=200,
                                                       noise_px=0.2)
        m = map_state.create(8, 256, 200)
        m = m._replace(
            kf_pose=m.kf_pose.at[:6].set(poses),
            kf_valid=m.kf_valid.at[:6].set(True),
            kf_xy=m.kf_xy.at[:6, :200].set(uv),
            kf_feat_valid=m.kf_feat_valid.at[:6, :200].set(True),
            kf_obs=m.kf_obs.at[:6, :200].set(obs_pt),
            pt_pos=m.pt_pos.at[:200].set(X),
            pt_valid=m.pt_valid.at[:200].set(True),
            n_kf=jnp.int32(6), n_pt=jnp.int32(200),
        )
        pert = jnp.zeros((8, 6)).at[3:6, :].set(
            jnp.asarray(rng.randn(3, 6).astype(np.float32)) * 0.03
        )
        m_bad = m._replace(
            kf_pose=jax.vmap(lie.se3_retract)(m.kf_pose, pert),
            pt_pos=m.pt_pos + jnp.asarray(rng.randn(256, 3).astype(np.float32)) * 0.03,
        )
        m_fix, chi2 = local_mapping.global_ba(m_bad, K4, n_kf_max=8, n_pts=256,
                                              iters=12)
        err_before = np.abs(np.asarray(lie.se3_t(m_bad.kf_pose[:6]))
                            - np.asarray(lie.se3_t(poses))).max()
        err_after = np.abs(np.asarray(lie.se3_t(m_fix.kf_pose[:6]))
                           - np.asarray(lie.se3_t(poses))).max()
        assert err_after < err_before * 0.5
        assert float(chi2) < 1e4
