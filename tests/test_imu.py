"""IMU preintegration vs direct numerical integration + bias-correction
first-order consistency."""

import numpy as np
import jax.numpy as jnp

from dvm_slam_tpu.geometry import imu, lie


def simulate(rng, n=100, dt=0.005):
    """Smooth synthetic body motion: returns per-sample (acc_body, gyro_body)
    and ground-truth (R, v, p) integrated in the first body frame WITHOUT
    gravity (preintegration deltas exclude gravity by definition when the
    measured specific force equals true acceleration)."""
    ts = np.arange(n) * dt
    gyro = np.stack([
        0.4 * np.sin(2 * ts), 0.3 * np.cos(3 * ts), 0.2 * np.sin(ts + 1)
    ], -1).astype(np.float32)
    acc = np.stack([
        0.8 * np.cos(ts), 0.5 * np.sin(2 * ts), 0.3 + 0.2 * np.sin(3 * ts)
    ], -1).astype(np.float32)
    # ground truth by fine RK-ish integration (matching the preintegration's
    # first-order discretization at small dt)
    R = np.eye(3)
    v = np.zeros(3)
    p = np.zeros(3)
    for i in range(n):
        a_w = R @ acc[i]
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        R = R @ np.asarray(lie.quat_to_matrix(lie.so3_exp(jnp.asarray(gyro[i] * dt))))
    return acc, gyro, np.full(n, dt, np.float32), (R, v, p)


class TestPreintegration:
    def test_matches_numerical_integration(self, rng):
        acc, gyro, dts, (R, v, p) = simulate(rng)
        calib = imu.ImuCalib.create()
        pre = imu.preintegrate(calib, acc, gyro, dts)
        np.testing.assert_allclose(np.asarray(pre.dR), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(pre.dV), v, atol=1e-4)
        np.testing.assert_allclose(np.asarray(pre.dP), p, atol=1e-4)
        assert abs(float(pre.dT) - len(acc) * 0.005) < 1e-6

    def test_covariance_grows_and_is_psd(self, rng):
        acc, gyro, dts, _ = simulate(rng, n=50)
        calib = imu.ImuCalib.create()
        pre = imu.preintegrate(calib, acc, gyro, dts)
        C = np.asarray(pre.C)
        assert np.all(np.isfinite(C))
        w = np.linalg.eigvalsh(0.5 * (C + C.T))
        assert w.min() > -1e-10
        assert np.trace(C[:9, :9]) > 0

    def test_bias_jacobians_first_order(self, rng):
        """delta getters with a shifted bias must match re-integration with
        that bias to first order."""
        acc, gyro, dts, _ = simulate(rng, n=80)
        calib = imu.ImuCalib.create()
        pre0 = imu.preintegrate(calib, acc, gyro, dts)
        dbg = np.array([0.002, -0.001, 0.0015], np.float32)
        dba = np.array([-0.01, 0.005, 0.008], np.float32)
        pre1 = imu.preintegrate(calib, acc, gyro, dts, bias_g=dbg, bias_a=dba)
        dR_corr = np.asarray(imu.delta_rotation(pre0, dbg))
        dV_corr = np.asarray(imu.delta_velocity(pre0, dbg, dba))
        dP_corr = np.asarray(imu.delta_position(pre0, dbg, dba))
        np.testing.assert_allclose(dR_corr, np.asarray(pre1.dR), atol=5e-4)
        np.testing.assert_allclose(dV_corr, np.asarray(pre1.dV), atol=2e-3)
        np.testing.assert_allclose(dP_corr, np.asarray(pre1.dP), atol=2e-3)

    def test_predict_state_adds_gravity(self, rng):
        acc, gyro, dts, (R, v, p) = simulate(rng, n=40)
        calib = imu.ImuCalib.create()
        pre = imu.preintegrate(calib, acc, gyro, dts)
        R0 = jnp.eye(3)
        v0 = jnp.zeros(3)
        t0 = jnp.zeros(3)
        R2, v2, t2 = imu.predict_state(pre, R0, v0, t0)
        T = float(pre.dT)
        g = np.asarray(imu.GRAVITY)
        np.testing.assert_allclose(np.asarray(v2), v + g * T, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t2), p + 0.5 * g * T * T, atol=1e-4)


class TestPaddedPreintegration:
    def test_padding_is_exact(self, rng):
        """dt=0 samples are identity steps: the bucket-padded preintegration
        (one XLA compile per bucket instead of per window length) must be
        BIT-equal to the unpadded scan on every field, including the
        covariance and the bias Jacobians."""
        calib = imu.ImuCalib.create()
        for n in (3, 16, 17, 63, 100):
            acc, gyro, dts, _ = simulate(rng, n=n)
            ref = imu.preintegrate(calib, acc, gyro, dts)
            pad = imu.preintegrate_padded(calib, acc, gyro, dts,
                                          bias_g=np.full(3, 0.01, np.float32),
                                          bias_a=np.full(3, -0.02, np.float32))
            ref = imu.preintegrate(calib, acc, gyro, dts,
                                   bias_g=np.full(3, 0.01, np.float32),
                                   bias_a=np.full(3, -0.02, np.float32))
            for f, a, b in zip(ref._fields, ref, pad):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), err_msg=f"{f} @ n={n}")

    def test_oversize_window_falls_back(self, rng):
        calib = imu.ImuCalib.create()
        n = imu.PAD_BUCKETS[-1] + 5
        acc, gyro, dts, _ = simulate(rng, n=n)
        pre = imu.preintegrate_padded(calib, acc, gyro, dts)
        assert abs(float(pre.dT) - n * 0.005) < 1e-3  # fp32 accumulation
