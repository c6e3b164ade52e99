"""Inertial factors: residual zero at ground truth, and inertial-only
optimization recovering velocities + biases from pose priors + IMU."""

import numpy as np
import jax
import jax.numpy as jnp

from dvm_slam_tpu.geometry import imu, lie
from dvm_slam_tpu.mapping import inertial


def make_vi_problem(rng, n_kf=6, n_samples=40, dt=0.005, bias_g=None,
                    bias_a=None, assumed_bg=None, assumed_ba=None):
    """Simulate a body flying through n_kf keyframes with known states and
    IMU measurements (gravity included in the accelerometer). Measurements
    carry `bias_g/bias_a`; preintegration runs under `assumed_*` (defaults:
    the true biases, giving unbiased deltas)."""
    g = np.asarray(imu.GRAVITY)
    bias_g = np.zeros(3, np.float32) if bias_g is None else bias_g
    bias_a = np.zeros(3, np.float32) if bias_a is None else bias_a
    assumed_bg = bias_g if assumed_bg is None else assumed_bg
    assumed_ba = bias_a if assumed_ba is None else assumed_ba
    R = np.eye(3)
    p = np.zeros(3)
    v = np.array([0.5, 0.1, 0.0])
    states = [(R.copy(), p.copy(), v.copy())]
    pres = []
    calib = imu.ImuCalib.create()
    t = 0.0
    for k in range(n_kf - 1):
        accs, gyrs, dts = [], [], []
        for i in range(n_samples):
            w_true = np.array([0.3 * np.sin(t * 2), 0.2 * np.cos(t * 3), 0.1])
            a_true_w = np.array([0.4 * np.cos(t), 0.3 * np.sin(t * 2), 0.2 * np.sin(t)])
            # accelerometer measures specific force in body frame
            a_meas = R.T @ (a_true_w - g) + bias_a
            w_meas = w_true + bias_g
            accs.append(a_meas)
            gyrs.append(w_meas)
            dts.append(dt)
            # propagate truth
            p = p + v * dt + 0.5 * a_true_w * dt * dt
            v = v + a_true_w * dt
            R = R @ np.asarray(lie.quat_to_matrix(lie.so3_exp(jnp.asarray(w_true * dt))))
            t += dt
        pre = imu.preintegrate(
            calib, np.asarray(accs, np.float32), np.asarray(gyrs, np.float32),
            np.asarray(dts, np.float32),
            bias_g=jnp.asarray(assumed_bg), bias_a=jnp.asarray(assumed_ba),
        )
        pres.append(pre)
        states.append((R.copy(), p.copy(), v.copy()))
    pres_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)
    qs = np.stack([np.asarray(lie.quat_from_matrix(jnp.asarray(Rk))) for Rk, _, _ in states])
    ps = np.stack([pk for _, pk, _ in states])
    vs = np.stack([vk for _, _, vk in states])
    return qs.astype(np.float32), ps.astype(np.float32), vs.astype(np.float32), pres_stacked


class TestInertialResidual:
    def test_zero_at_ground_truth(self, rng):
        qs, ps, vs, pres = make_vi_problem(rng)
        for k in range(qs.shape[0] - 1):
            r = inertial.inertial_residual(
                jnp.asarray(qs[k]), jnp.asarray(ps[k]), jnp.asarray(vs[k]),
                jnp.zeros(3), jnp.zeros(3),
                jnp.asarray(qs[k + 1]), jnp.asarray(ps[k + 1]), jnp.asarray(vs[k + 1]),
                jax.tree.map(lambda x: x[k], pres),
            )
            assert float(jnp.abs(r).max()) < 2e-3, f"edge {k}: {np.asarray(r)}"

    def test_nonzero_with_wrong_bias(self, rng):
        qs, ps, vs, pres = make_vi_problem(rng)
        r = inertial.inertial_residual(
            jnp.asarray(qs[0]), jnp.asarray(ps[0]), jnp.asarray(vs[0]),
            jnp.asarray([0.05, 0.0, 0.0]), jnp.zeros(3),
            jnp.asarray(qs[1]), jnp.asarray(ps[1]), jnp.asarray(vs[1]),
            jax.tree.map(lambda x: x[0], pres),
        )
        assert float(jnp.abs(r).max()) > 1e-3


class TestInertialOptimization:
    def test_recovers_velocities_and_biases(self, rng):
        true_bg = np.array([0.01, -0.005, 0.008], np.float32)
        true_ba = np.array([0.05, 0.02, -0.03], np.float32)
        zero = np.zeros(3, np.float32)
        # measurements carry the true biases, preintegration assumes zero —
        # the optimizer must discover bg/ba (= the truth) via the Jacobians
        qs, ps, vs, pres = make_vi_problem(
            rng, n_kf=8, bias_g=true_bg, bias_a=true_ba,
            assumed_bg=zero, assumed_ba=zero,
        )
        n = qs.shape[0]
        state0 = inertial.ImuState(
            q=jnp.asarray(qs),
            p=jnp.asarray(ps),
            v=jnp.zeros_like(jnp.asarray(vs)),          # velocities unknown
            bg=jnp.zeros((n, 3)),
            ba=jnp.zeros((n, 3)),
        )
        fixed = jnp.zeros((n,), bool).at[0].set(True)
        out, cost = inertial.inertial_optimization(
            state0, pres, jnp.asarray(qs), jnp.asarray(ps), fixed, iters=25,
        )
        v_err = np.abs(np.asarray(out.v[1:]) - vs[1:]).max()
        assert v_err < 0.05, f"velocity error {v_err}"
        bg_err = np.abs(np.asarray(out.bg[1:]) - true_bg).max()
        assert bg_err < 5e-3, f"gyro bias error {bg_err} (est {np.asarray(out.bg[-1])})"


class TestPoseInertialOptimization:
    """Per-frame pose-inertial solve (`Optimizer.cc:4181` role): with weak
    texture (few visual observations) and a noisy predicted pose, the
    preintegration factor must hold the pose where visual-only drifts."""

    def test_inertial_factor_holds_pose_under_weak_texture(self, rng):
        from dvm_slam_tpu.geometry import imu, lie
        from dvm_slam_tpu.tracking import pose_opt

        dt_total = 0.25
        n_imu = 50
        dts = np.full(n_imu, dt_total / n_imu, np.float32)
        v0 = np.array([0.3, -0.1, 0.2], np.float32)
        a_w = np.array([0.5, 0.2, -0.3], np.float32)
        g = np.asarray(imu.GRAVITY)
        acc_body = np.tile(a_w - g, (n_imu, 1)).astype(np.float32)
        gyro = np.zeros((n_imu, 3), np.float32)
        calib = imu.ImuCalib.create()
        pre = imu.preintegrate(calib, jnp.asarray(acc_body),
                               jnp.asarray(gyro), jnp.asarray(dts))

        p1 = v0 * dt_total + 0.5 * a_w * dt_total ** 2
        v1 = v0 + a_w * dt_total
        T_bw_true = lie.se3(lie.quat_identity(), jnp.asarray(-p1))

        K = jnp.asarray([260.0, 260.0, 160.0, 120.0])
        N = 24
        pts = rng.randn(N, 3).astype(np.float32) * 2 + [0, 0, 6]
        pc = pts - p1
        uv = np.stack([260 * pc[:, 0] / pc[:, 2] + 160,
                       260 * pc[:, 1] / pc[:, 2] + 120], -1).astype(np.float32)
        uv += rng.randn(N, 2).astype(np.float32) * 0.3
        valid = np.zeros(N, bool)
        valid[:6] = True  # 5-frame-low-texture-span class: 6 usable features
        sigma2 = np.ones(N, np.float32)

        T_bw0 = lie.se3_retract(
            T_bw_true, jnp.asarray([0.05, -0.04, 0.06, 0.01, -0.02, 0.015]))
        v_init = jnp.asarray(v1 + rng.randn(3).astype(np.float32) * 0.1)

        Tv, _, _ = pose_opt.pose_optimization(
            T_bw0, jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(sigma2),
            jnp.asarray(valid), K)
        T_bw, v, bg, ba, inl, _ = pose_opt.pose_inertial_optimization(
            T_bw0, v_init, jnp.zeros(3), jnp.zeros(3),
            lie.se3_identity(), jnp.asarray(v0), jnp.zeros(3), jnp.zeros(3),
            pre, jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(sigma2),
            jnp.asarray(valid), K, lie.se3_identity(), jnp.asarray(g))

        err_v = float(jnp.linalg.norm(lie.se3_t(Tv) - lie.se3_t(T_bw_true)))
        err_i = float(jnp.linalg.norm(lie.se3_t(T_bw) - lie.se3_t(T_bw_true)))
        assert err_i < 1e-3, f"inertial pose error {err_i}"
        assert err_i < err_v / 5, (
            f"inertial ({err_i}) must beat visual-only ({err_v})")
        assert float(jnp.linalg.norm(v - jnp.asarray(v1))) < 5e-3
        assert int(jnp.sum(inl)) == 6
