"""Motion controllers, simulation harness, viz export, profiling."""

import json
import os

import numpy as np
import jax.numpy as jnp

from dvm_slam_tpu.control import driver as drv
from dvm_slam_tpu.control.follow import FollowTheLeader
from dvm_slam_tpu.control.nmpc import NmpcController
from dvm_slam_tpu.io import sim, synthetic, viz
from dvm_slam_tpu.utils.profiling import StageTimer


class TestNmpc:
    def test_drives_to_goal(self):
        c = NmpcController(robot_radius=0.5, vmax=1.0, seed=0)
        c.set_goal((3.0, 0.0))
        pos = np.array([0.0, 0.0])
        for t in range(120):
            v = c.step(pos, np.zeros((0, 2)), now=t * 0.1)
            pos = pos + np.asarray(v) * c.timestep
        assert np.linalg.norm(pos - [3.0, 0.0]) < 0.3

    def test_avoids_head_on_collision(self):
        cA = NmpcController(robot_radius=0.5, vmax=1.0, seed=1)
        cB = NmpcController(robot_radius=0.5, vmax=1.0, seed=2)
        cA.set_goal((4.0, 0.0))
        cB.set_goal((0.0, 0.0))
        pA, pB = np.array([0.0, 0.0]), np.array([4.0, 0.0])
        min_d = 1e9
        for t in range(200):
            vA = cA.step(pA, pB[None], now=t * 0.1)
            vB = cB.step(pB, pA[None], now=t * 0.1)
            pA = pA + np.asarray(vA) * cA.timestep
            pB = pB + np.asarray(vB) * cB.timestep
            min_d = min(min_d, float(np.linalg.norm(pA - pB)))
        assert min_d > 0.55, f"agents got {min_d:.2f} m apart"  # reference demo threshold
        assert np.linalg.norm(pA - [4.0, 0.0]) < 0.6
        assert np.linalg.norm(pB - [0.0, 0.0]) < 0.6

    def test_static_obstacle_respected(self):
        c = NmpcController(robot_radius=0.4, vmax=1.0, seed=3)
        c.set_goal((3.0, 0.0))
        c.set_static_obstacles([(1.5, -2.0, 1.5, 2.0)])  # wall across the path
        pos = np.array([0.0, 0.0])
        min_d = 1e9
        for t in range(100):
            v = c.step(pos, np.zeros((0, 2)), now=t * 0.1)
            pos = pos + np.asarray(v) * c.timestep
            min_d = min(min_d, float(c._segment_distances(pos[None])[0]))
        assert min_d > 0.15


class TestFollowDriver:
    def test_follow_converges_to_offset(self):
        f = FollowTheLeader(position_offset=(0.0, -1.0), rotation_offset=0.0)
        my = np.array([3.0, 3.0])
        yaw = 0.0
        for _ in range(100):
            v, w = f.step(my, yaw, leader_xy=(0.0, 0.0), leader_yaw=0.0)
            my = my + v * 0.1
            yaw += w * 0.1
        np.testing.assert_allclose(my, [0.0, -1.0], atol=0.05)

    def test_driver_robomaster_sign_flips(self):
        d = drv.Driver(robot_type=drv.ROBOMASTER)
        cmd = d.drive([0.5, 0.2], 0.3)
        assert cmd.linear_x == 0.5 and cmd.linear_y == -0.2 and cmd.angular_z == -0.3
        d2 = drv.Driver(robot_type=drv.SIM)
        cmd2 = d2.drive([0.5, 0.2], 0.3)
        assert cmd2.linear_y == 0.2 and cmd2.angular_z == 0.3

    def test_driver_speed_clamp(self):
        d = drv.Driver(robot_type=drv.SIM, max_linear_speed=1.0)
        cmd = d.drive([3.0, 4.0])
        assert abs(np.hypot(cmd.linear_x, cmd.linear_y) - 1.0) < 1e-6


class TestSim:
    def test_robot_moves_and_renders(self):
        world = synthetic.PlaneWorld(seed=1, tex_size=256, plane_z=6.0, extent=20.0)
        K = np.array([100.0, 100.0, 64.0, 48.0], np.float32)
        r = sim.SimRobot(world, K, 96, 128, start_xy=(0.0, 0.0), dt=0.1)
        r.set_cmd_vel(1.0, 0.0)
        t, img, pose = r.step()
        assert img.shape == (96, 128)
        assert abs(r.x - 0.1) < 1e-6
        srv = sim.SimulationServer(world, K, 96, 128,
                                   starts=[((0, 0), 0.0), ((1, 0), 0.0)])
        srv.set_cmd_vel(2, 0.0, 0.5)
        out = srv.step_all()
        assert set(out) == {1, 2}
        assert srv.positions()[2][1] != 0.0


class TestVizProfiling:
    def test_pointcloud_and_markers(self, tmp_path, rng):
        from dvm_slam_tpu.mapping import map_state

        m = map_state.create(4, 32, 8)
        m, _ = map_state.add_points(
            m, jnp.asarray(rng.randn(5, 3).astype(np.float32)),
            jnp.zeros((5, 256), jnp.uint8), jnp.zeros((5, 3)),
            jnp.zeros(5), jnp.ones(5), jnp.int32(0), jnp.ones(5, bool),
        )
        p = str(tmp_path / "cloud.ply")
        viz.export_pointcloud_ply(p, m)
        lines = open(p).read().splitlines()
        assert lines[0] == "ply" and "element vertex 5" in lines[2]
        wf = viz.camera_wireframe(np.asarray([1, 0, 0, 0, 0, 0, 0], np.float32))
        assert wf.shape == (5, 3)
        mk = viz.keyframe_markers(m)
        assert mk["keyframes"] == [] and mk["edges"] == []

    def test_stage_timer(self):
        slow = []
        t = StageTimer(slow_threshold_ms=0.0, on_slow=lambda n, ms: slow.append(n))
        with t.span("stage_a"):
            sum(range(1000))
        rep = t.report()
        assert "stage_a" in rep and rep["stage_a"]["n"] == 1
        assert slow == ["stage_a"]


class TestFrameDrawer:
    def test_draw_frame_overlay(self, rng):
        import jax.numpy as jnp
        from dvm_slam_tpu.frontend.extractor import FrontendConfig, extract

        img = (rng.rand(96, 128) * 255).astype(np.float32)
        cfg = FrontendConfig(height=96, width=128, n_features=100, n_levels=3)
        f = extract(jnp.asarray(img), cfg)
        obs = np.full(f.capacity, -1, np.int32)
        obs[:5] = 1  # pretend first 5 features track map points
        rgb = viz.draw_frame(img, f, obs)
        assert rgb.shape == (96, 128, 3) and rgb.dtype == np.uint8
        assert (rgb[..., 1] == 220).any() or (rgb[..., 2] == 255).any()
