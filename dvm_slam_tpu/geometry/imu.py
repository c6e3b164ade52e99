"""IMU types and preintegration.

TPU-native `ImuTypes` (`orb_slam3/src/ImuTypes.cc` / `include/ImuTypes.h`):
gyro/accel bias, calibration (noise densities + walk), and the preintegrated
delta between two keyframes — `IntegrateNewMeasurement` (`ImuTypes.cc:178`)
with first-order bias Jacobians and discrete noise-covariance propagation,
plus bias-corrected delta getters and the re-integration path used when a
bias estimate changes (`:258-260`).

Functional formulation: a `Preintegrated` namedtuple pytree and a pure
`integrate_measurement` update, batched-scan friendly (`preintegrate` runs a
whole IMU window under `lax.scan` in one fused program) — the foundation of
the visual-inertial mode (inertial BA edges consume dR/dV/dP + covariance).

Conventions follow Forster et al. (on-manifold preintegration), which the
reference implements: deltas expressed in the body frame of the first
keyframe, gravity handled by the consumer.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import lie

GRAVITY = np.asarray([0.0, 0.0, -9.81], dtype=np.float32)


class ImuCalib(NamedTuple):
    """`IMU::Calib`: per-sample noise (already discretized) and bias walk."""

    gyro_noise2: jnp.ndarray   # [] rad^2/s^2 * s  (sigma^2 * freq terms folded)
    acc_noise2: jnp.ndarray
    gyro_walk2: jnp.ndarray
    acc_walk2: jnp.ndarray

    @staticmethod
    def create(gyro_noise=1.7e-4, acc_noise=2e-3, gyro_walk=1.9e-5,
               acc_walk=3e-3, freq=200.0):
        f = jnp.sqrt(freq)
        return ImuCalib(
            gyro_noise2=jnp.asarray((gyro_noise * f) ** 2),
            acc_noise2=jnp.asarray((acc_noise * f) ** 2),
            gyro_walk2=jnp.asarray(gyro_walk ** 2),
            acc_walk2=jnp.asarray(acc_walk ** 2),
        )


class Preintegrated(NamedTuple):
    """`IMU::Preintegrated` state (all in the first body frame)."""

    dT: jnp.ndarray      # [] total time
    dR: jnp.ndarray      # [3,3] delta rotation
    dV: jnp.ndarray      # [3] delta velocity
    dP: jnp.ndarray      # [3] delta position
    # first-order bias Jacobians (ImuTypes.h: JRg, JVg, JVa, JPg, JPa)
    JRg: jnp.ndarray     # [3,3]
    JVg: jnp.ndarray
    JVa: jnp.ndarray
    JPg: jnp.ndarray
    JPa: jnp.ndarray
    C: jnp.ndarray       # [15,15] covariance (rot, vel, pos, bg walk, ba walk)
    bias_g: jnp.ndarray  # [3] gyro bias used during integration
    bias_a: jnp.ndarray  # [3] accel bias


def create_preintegrated(bias_g=None, bias_a=None, dtype=jnp.float32):
    z3 = jnp.zeros(3, dtype)
    I = jnp.eye(3, dtype=dtype)
    return Preintegrated(
        dT=jnp.zeros((), dtype), dR=I, dV=z3, dP=z3,
        JRg=jnp.zeros((3, 3), dtype), JVg=jnp.zeros((3, 3), dtype),
        JVa=jnp.zeros((3, 3), dtype), JPg=jnp.zeros((3, 3), dtype),
        JPa=jnp.zeros((3, 3), dtype),
        C=jnp.zeros((15, 15), dtype),
        bias_g=z3 if bias_g is None else jnp.asarray(bias_g, dtype),
        bias_a=z3 if bias_a is None else jnp.asarray(bias_a, dtype),
    )


def _right_jacobian(phi):
    """SO(3) right Jacobian Jr(phi) (ImuTypes' RightJacobianSO3)."""
    theta2 = jnp.sum(phi * phi)
    small = theta2 < 1e-10
    th = jnp.sqrt(jnp.where(small, 1.0, theta2))
    K = lie.hat(phi)
    A = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(th)) / (th * th))
    B = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (th - jnp.sin(th)) / th ** 3)
    return jnp.eye(3, dtype=phi.dtype) - A * K + B * (K @ K)


def integrate_measurement(p: Preintegrated, calib: ImuCalib, acc, gyro, dt):
    """One IMU sample (`IMU::Preintegrated::IntegrateNewMeasurement`,
    `ImuTypes.cc:178`): position/velocity first (using the current dR), then
    rotation, bias Jacobians, and covariance propagation."""
    a = jnp.asarray(acc) - p.bias_a
    w = jnp.asarray(gyro) - p.bias_g
    dR, dV, dP = p.dR, p.dV, p.dP

    # position & velocity with the pre-update rotation
    dP_new = dP + dV * dt + 0.5 * dR @ a * dt * dt
    dV_new = dV + dR @ a * dt

    # bias Jacobians (before rotation update, mirroring the reference order)
    a_hat = lie.hat(a)
    JPa_new = p.JPa + p.JVa * dt - 0.5 * dR * dt * dt
    JPg_new = p.JPg + p.JVg * dt - 0.5 * dt * dt * (dR @ a_hat @ p.JRg)
    JVa_new = p.JVa - dR * dt
    JVg_new = p.JVg - dt * (dR @ a_hat @ p.JRg)

    # rotation update
    phi = w * dt
    dRi = lie.quat_to_matrix(lie.so3_exp(phi))
    Jr = _right_jacobian(phi)
    dR_new = dR @ dRi
    JRg_new = dRi.T @ p.JRg - Jr * dt

    # covariance propagation: x = [dphi, dv, dp], A [9,9], B [9,6]
    I3 = jnp.eye(3, dtype=dR.dtype)
    Z3 = jnp.zeros((3, 3), dR.dtype)
    A = jnp.block([
        [dRi.T, Z3, Z3],
        [-dR @ a_hat * dt, I3, Z3],
        [-0.5 * dR @ a_hat * dt * dt, I3 * dt, I3],
    ])
    B = jnp.block([
        [Jr * dt, Z3],
        [Z3, dR * dt],
        [Z3, 0.5 * dR * dt * dt],
    ])
    Nga = jnp.block([
        [I3 * calib.gyro_noise2, Z3],
        [Z3, I3 * calib.acc_noise2],
    ])
    C9 = A @ p.C[:9, :9] @ A.T + B @ Nga @ B.T
    C = p.C.at[:9, :9].set(C9)
    # bias random-walk block (ImuTypes.cc tail of IntegrateNewMeasurement)
    C = C.at[9:12, 9:12].add(jnp.eye(3, dtype=dR.dtype) * calib.gyro_walk2 * dt)
    C = C.at[12:15, 12:15].add(jnp.eye(3, dtype=dR.dtype) * calib.acc_walk2 * dt)

    return p._replace(
        dT=p.dT + dt, dR=dR_new, dV=dV_new, dP=dP_new,
        JRg=JRg_new, JVg=JVg_new, JVa=JVa_new, JPg=JPg_new, JPa=JPa_new,
        C=C,
    )


@partial(jax.jit, static_argnames=())
def preintegrate(calib: ImuCalib, acc, gyro, dts, bias_g=None, bias_a=None):
    """Integrate a whole window: acc/gyro [N,3], dts [N] -> Preintegrated.
    One `lax.scan`, fused."""
    p0 = create_preintegrated(bias_g, bias_a, dtype=jnp.asarray(acc).dtype)

    def step(p, x):
        a, w, dt = x
        return integrate_measurement(p, calib, a, w, dt), None

    p, _ = jax.lax.scan(step, p0, (jnp.asarray(acc), jnp.asarray(gyro),
                                   jnp.asarray(dts)))
    return p


# Window lengths are padded up to one of these before `preintegrate`, so the
# jitted scan compiles once per bucket instead of once per length (the
# anchor-keyframe window grows every frame — unpadded, that is a fresh XLA
# compile per tracked frame).
PAD_BUCKETS = (16, 64, 256, 1024)


def preintegrate_padded(calib: ImuCalib, acc, gyro, dts,
                        bias_g=None, bias_a=None):
    """`preintegrate` with the sample count padded to a fixed bucket.

    Exact: a dt=0 sample is an identity step through the whole update —
    dP/dV/dR unchanged (every term scales by dt), bias Jacobians unchanged,
    A becomes I and B becomes 0 so the covariance and its random-walk tail
    add zero, and dT += 0. Windows longer than the largest bucket fall back
    to the unpadded (per-length-compiled) path."""
    acc = np.asarray(acc, np.float32).reshape(-1, 3)
    gyro = np.asarray(gyro, np.float32).reshape(-1, 3)
    dts = np.asarray(dts, np.float32).reshape(-1)
    n = dts.shape[0]
    cap = next((b for b in PAD_BUCKETS if b >= n), None)
    if cap is not None and cap != n:
        pad = cap - n
        acc = np.concatenate([acc, np.zeros((pad, 3), np.float32)])
        gyro = np.concatenate([gyro, np.zeros((pad, 3), np.float32)])
        dts = np.concatenate([dts, np.zeros((pad,), np.float32)])
    return preintegrate(calib, acc, gyro, dts, bias_g=bias_g, bias_a=bias_a)


# -- bias-corrected getters (ImuTypes.cc GetDeltaRotation/Velocity/Position) --

def delta_rotation(p: Preintegrated, new_bias_g):
    db = jnp.asarray(new_bias_g) - p.bias_g
    corr = lie.quat_to_matrix(lie.so3_exp(p.JRg @ db))
    return p.dR @ corr


def delta_velocity(p: Preintegrated, new_bias_g, new_bias_a):
    dbg = jnp.asarray(new_bias_g) - p.bias_g
    dba = jnp.asarray(new_bias_a) - p.bias_a
    return p.dV + p.JVg @ dbg + p.JVa @ dba


def delta_position(p: Preintegrated, new_bias_g, new_bias_a):
    dbg = jnp.asarray(new_bias_g) - p.bias_g
    dba = jnp.asarray(new_bias_a) - p.bias_a
    return p.dP + p.JPg @ dbg + p.JPa @ dba


def predict_state(p: Preintegrated, R_wb, v_w, t_w, bias_g=None, bias_a=None,
                  gravity=GRAVITY):
    """Dead-reckon keyframe state through the preintegrated delta (the IMU
    prediction used by `Tracking::PredictStateIMU`)."""
    bg = p.bias_g if bias_g is None else bias_g
    ba = p.bias_a if bias_a is None else bias_a
    dR = delta_rotation(p, bg)
    dV = delta_velocity(p, bg, ba)
    dP = delta_position(p, bg, ba)
    R2 = R_wb @ dR
    v2 = v_w + gravity * p.dT + R_wb @ dV
    t2 = t_w + v_w * p.dT + 0.5 * gravity * p.dT ** 2 + R_wb @ dP
    return R2, v2, t2
