"""Frame bag record/replay + map invariant checking + verbose logging."""

import numpy as np
import jax.numpy as jnp

from dvm_slam_tpu.io.recording import FrameRecorder, FrameReplay
from dvm_slam_tpu.mapping import map_state
from dvm_slam_tpu.utils import verbose


class TestRecording:
    def test_roundtrip_and_rate(self, tmp_path, rng):
        rec = FrameRecorder()
        for i in range(5):
            rec.add(10.0 + i * 0.1, rng.rand(8, 10), gt_pose=np.arange(7) + i)
        p = str(tmp_path / "run.npz")
        rec.save(p)
        rep = FrameReplay(p, rate=2.0)
        assert len(rep) == 5
        rows = list(rep)
        assert abs(rows[1][0] - rows[0][0] - 0.05) < 1e-9  # 2x rate
        np.testing.assert_allclose(rows[3][2], np.arange(7) + 3)
        rep2 = FrameReplay(p, start=1, stop=3)
        assert len(rep2) == 2

    def test_missing_gt(self, tmp_path, rng):
        rec = FrameRecorder()
        rec.add(0.0, rng.rand(4, 4))
        p = str(tmp_path / "nogt.npz")
        rec.save(p)
        assert list(FrameReplay(p))[0][2] is None


class TestInvariants:
    def test_healthy_map(self, rng):
        m = map_state.create(8, 64, 16)
        m, slots = map_state.add_points(
            m, jnp.asarray(rng.randn(5, 3).astype(np.float32)),
            jnp.zeros((5, 256), jnp.uint8), jnp.zeros((5, 3)),
            jnp.zeros(5), jnp.ones(5), jnp.int32(0), jnp.ones(5, bool),
        )
        obs = jnp.full((16,), -1, jnp.int32).at[:5].set(slots[:5])
        m, _ = map_state.add_keyframe(
            m, jnp.asarray([1.0, 0, 0, 0, 0, 0, 0]), jnp.zeros((16, 2)),
            jnp.zeros(16, jnp.int32), jnp.zeros(16),
            jnp.zeros((16, 256), jnp.uint8), jnp.ones(16, bool), obs,
        )
        m = m._replace(pt_ref_kf=m.pt_ref_kf.at[:5].set(0))
        assert map_state.check_invariants(m) == []

    def test_detects_dangling_observation(self, rng):
        m = map_state.create(8, 64, 16)
        obs = jnp.full((16,), -1, jnp.int32).at[0].set(7)  # point 7 invalid
        m, _ = map_state.add_keyframe(
            m, jnp.asarray([1.0, 0, 0, 0, 0, 0, 0]), jnp.zeros((16, 2)),
            jnp.zeros(16, jnp.int32), jnp.zeros(16),
            jnp.zeros((16, 256), jnp.uint8), jnp.ones(16, bool), obs,
        )
        errs = map_state.check_invariants(m)
        assert any("invalid points" in e for e in errs)

    def test_detects_nonfinite_pose(self):
        m = map_state.create(4, 8, 4)
        m = m._replace(
            kf_valid=m.kf_valid.at[0].set(True),
            kf_pose=m.kf_pose.at[0, 4].set(jnp.nan),
            n_kf=jnp.int32(1),
        )
        errs = map_state.check_invariants(m)
        assert any("non-finite keyframe" in e for e in errs)


class TestVerbose:
    def test_levels(self, capsys):
        verbose.set_verbosity(verbose.NORMAL)
        verbose.print_mess("shown", verbose.NORMAL)
        verbose.print_mess("hidden", verbose.DEBUG)
        out = capsys.readouterr().out
        assert "shown" in out and "hidden" not in out
        verbose.set_verbosity(verbose.DEBUG)
        verbose.print_mess("now shown", verbose.DEBUG)
        assert "now shown" in capsys.readouterr().out
        verbose.set_verbosity(verbose.NORMAL)
