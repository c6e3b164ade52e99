"""Trajectory export in TUM / EuRoC / KITTI formats.

`System::SaveTrajectoryTUM / SaveTrajectoryEuRoC / SaveTrajectoryKITTI`
(`orb_slam3/include/System.h:145-167`) equivalents, operating on the
tracker's per-frame (timestamp, T_cw) log."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..geometry import lie


def _to_twc(T_cw):
    T = lie.se3_inv(jnp.asarray(T_cw, jnp.float32))
    q = np.asarray(lie.se3_q(T))  # wxyz
    t = np.asarray(lie.se3_t(T))
    return q, t


def save_tum(path: str, trajectory):
    """Lines: `ts tx ty tz qx qy qz qw` (camera->world)."""
    with open(path, "w") as f:
        for ts, T_cw, *_ in trajectory:
            q, t = _to_twc(T_cw)
            f.write(f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n")


def save_euroc(path: str, trajectory):
    """Lines: `ts_ns,tx,ty,tz,qw,qx,qy,qz` (EuRoC csv convention)."""
    with open(path, "w") as f:
        for ts, T_cw, *_ in trajectory:
            q, t = _to_twc(T_cw)
            f.write(f"{int(ts * 1e9)},{t[0]:.7f},{t[1]:.7f},{t[2]:.7f},"
                    f"{q[0]:.7f},{q[1]:.7f},{q[2]:.7f},{q[3]:.7f}\n")


def save_kitti(path: str, trajectory):
    """Per line: row-major 3x4 camera-to-world matrix."""
    with open(path, "w") as f:
        for ts, T_cw, *_ in trajectory:
            T = lie.se3_inv(jnp.asarray(T_cw, jnp.float32))
            M = np.asarray(lie.se3_matrix(T))[:3, :]
            f.write(" ".join(f"{v:.7e}" for v in M.reshape(-1)) + "\n")


def load_tum(path: str):
    """Returns list of (ts, T_cw [7])."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            ts, tx, ty, tz, qx, qy, qz, qw = [float(v) for v in line.split()[:8]]
            T_wc = jnp.asarray([qw, qx, qy, qz, tx, ty, tz], jnp.float32)
            out.append((ts, np.asarray(lie.se3_inv(T_wc))))
    return out
