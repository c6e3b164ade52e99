"""SO(3) / SE(3) / Sim(3) Lie groups as pure JAX functions.

TPU-native replacement for the reference's vendored Sophus
(`orb_slam3/Thirdparty/Sophus/sophus/{so3,se3,sim3,rxso3}.hpp`): quaternion
based, fully batched (every function broadcasts over leading dims), jit/vmap/
grad compatible, and branch-free (small-angle handling via `jnp.where` with
guarded denominators so gradients stay finite).

Storage conventions
-------------------
* quaternion: `[..., 4]` scalar-first `(w, x, y, z)`, unit norm.
* SE3:  `[..., 7]`  = `(qw, qx, qy, qz, tx, ty, tz)`.
* Sim3: `[..., 8]`  = `(qw, qx, qy, qz, tx, ty, tz, s)` with scale `s > 0`
  stored directly (not log-scale), matching the wire format of the reference's
  `Sim3Transform.msg` (`src/interfaces/msg/Sim3Transform.msg`).
* tangents: so3 `[...,3]` (rotvec), se3 `[...,6]` = `(v, omega)`
  (translation part first, like Sophus), sim3 `[...,7]` = `(v, omega, sigma)`.

Group action: `T ⊗ p = s · R p + t` (for SE3, `s = 1`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# --------------------------------------------------------------------------
# quaternion primitives
# --------------------------------------------------------------------------

def quat_identity(shape=(), dtype=jnp.float32):
    q = jnp.zeros(shape + (4,), dtype)
    return q.at[..., 0].set(1.0)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_mul(a, b):
    """Hamilton product, scalar-first."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q, p):
    """Rotate points `p [...,3]` by unit quaternion `q [...,4]`.

    Uses the 2-cross-product form (15 mul) rather than q·p·q*.
    """
    v = q[..., 1:4]
    w = q[..., 0:1]
    c = 2.0 * jnp.cross(v, p)
    return p + w * c + jnp.cross(v, c)


def quat_to_matrix(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_matrix(R):
    """Rotation matrix [...,3,3] -> unit quaternion, branch-free.

    Builds the four Shepperd candidates (one per dominant component) and
    selects the numerically best one with a gather.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def cand(tval, nums, slot):
        s2 = jnp.maximum(1.0 + tval, _EPS)
        s = jnp.sqrt(s2)
        q = jnp.stack([n / (2.0 * s) for n in nums], axis=-1)
        return q.at[..., slot].set(0.5 * s)

    qw = cand(tr, [tr, m21 - m12, m02 - m20, m10 - m01], 0)
    qx = cand(m00 - m11 - m22, [m21 - m12, tr, m01 + m10, m02 + m20], 1)
    qy = cand(m11 - m00 - m22, [m02 - m20, m01 + m10, tr, m12 + m21], 2)
    qz = cand(m22 - m00 - m11, [m10 - m01, m02 + m20, m12 + m21, tr], 3)

    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [...,4,4]
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    take = jnp.broadcast_to(idx[..., None, None], idx.shape + (1, 4)).astype(jnp.int32)
    q = jnp.take_along_axis(cands, take, axis=-2)[..., 0, :]
    q = jnp.where(q[..., 0:1] < 0, -q, q)  # canonical sign: w >= 0
    return quat_normalize(q)


# --------------------------------------------------------------------------
# so(3)
# --------------------------------------------------------------------------

def hat(phi):
    """so(3) hat operator: [...,3] -> [...,3,3] skew matrix."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(phi.shape[:-1] + (3, 3))


def so3_exp(phi):
    """Rotation vector [...,3] -> unit quaternion [...,4].

    Gradient-safe at phi = 0: the sqrt is taken on a guarded argument so the
    untaken `where` branch never produces non-finite cotangents.
    """
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta2 < 1e-8
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    half = 0.5 * theta
    # sin(theta/2)/theta: series 1/2 - theta^2/48
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * phi], axis=-1)


def so3_log(q):
    """Unit quaternion [...,4] -> rotation vector [...,3] with |phi| <= pi."""
    # force w >= 0 so angle in [0, pi]
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    w = q[..., 0:1]
    v = q[..., 1:4]
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = n2 < 1e-12
    n = jnp.sqrt(jnp.where(small, 1.0, n2))
    angle = 2.0 * jnp.arctan2(n, w)
    # angle/n, series for small n: 2/w * (1 - n^2/(3 w^2))
    ws = jnp.maximum(w, _EPS)
    k = jnp.where(small, 2.0 / ws * (1.0 - n2 / (3.0 * ws * ws)), angle / n)
    return k * v


def so3_left_jacobian(phi):
    """V(phi): the SO(3) left Jacobian, used by se3_exp. [...,3] -> [...,3,3]."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < 1e-8
    safe = jnp.sqrt(jnp.where(small, 1.0, theta2))
    A = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe))
    B = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (safe - jnp.sin(safe)) / (safe ** 3))
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I + A[..., None, None] * K + B[..., None, None] * (K @ K)


def so3_left_jacobian_inv(phi):
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < 1e-8
    safe = jnp.sqrt(jnp.where(small, 1.0, theta2))
    half = 0.5 * safe
    cot = half * jnp.cos(half) / jnp.sin(half)
    C = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - cot) / (safe * safe))
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I - 0.5 * K + C[..., None, None] * (K @ K)


# --------------------------------------------------------------------------
# SE(3)
# --------------------------------------------------------------------------

def se3_identity(shape=(), dtype=jnp.float32):
    T = jnp.zeros(shape + (7,), dtype)
    return T.at[..., 0].set(1.0)


def se3(q, t):
    return jnp.concatenate([q, t], axis=-1)


def se3_q(T):
    return T[..., 0:4]


def se3_t(T):
    return T[..., 4:7]


def se3_exp(xi):
    """se3 tangent [...,6] = (v, omega) -> SE3 [...,7]."""
    v, omega = xi[..., 0:3], xi[..., 3:6]
    q = so3_exp(omega)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(omega), v)
    return se3(q, t)


def se3_log(T):
    omega = so3_log(se3_q(T))
    v = jnp.einsum("...ij,...j->...i", so3_left_jacobian_inv(omega), se3_t(T))
    return jnp.concatenate([v, omega], axis=-1)


def se3_mul(a, b):
    q = quat_mul(se3_q(a), se3_q(b))
    t = quat_rotate(se3_q(a), se3_t(b)) + se3_t(a)
    return se3(quat_normalize(q), t)


def se3_inv(T):
    qi = quat_conj(se3_q(T))
    return se3(qi, -quat_rotate(qi, se3_t(T)))


def se3_apply(T, p):
    return quat_rotate(se3_q(T), p) + se3_t(T)


def se3_matrix(T):
    """[...,7] -> homogeneous [...,4,4]."""
    R = quat_to_matrix(se3_q(T))
    t = se3_t(T)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], T.dtype), T.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(M):
    return se3(quat_from_matrix(M[..., :3, :3]), M[..., :3, 3])


def se3_retract(T, xi):
    """Left-multiplicative retraction: exp(xi) * T (optimizer update rule)."""
    return se3_mul(se3_exp(xi), T)


# --------------------------------------------------------------------------
# Sim(3)
# --------------------------------------------------------------------------

def sim3_identity(shape=(), dtype=jnp.float32):
    S = jnp.zeros(shape + (8,), dtype)
    return S.at[..., 0].set(1.0).at[..., 7].set(1.0)


def sim3(q, t, s):
    return jnp.concatenate([q, t, s[..., None] if s.ndim == q.ndim - 1 else s], axis=-1)


def sim3_q(S):
    return S[..., 0:4]


def sim3_t(S):
    return S[..., 4:7]


def sim3_s(S):
    return S[..., 7]


def sim3_from_se3(T, s=None):
    s = jnp.ones(T.shape[:-1] + (1,), T.dtype) if s is None else jnp.asarray(s, T.dtype).reshape(T.shape[:-1] + (1,))
    return jnp.concatenate([T, s], axis=-1)


def sim3_to_se3(S):
    """Drop scale (keep rotation+translation)."""
    return S[..., 0:7]


def sim3_mul(a, b):
    q = quat_normalize(quat_mul(sim3_q(a), sim3_q(b)))
    t = sim3_s(a)[..., None] * quat_rotate(sim3_q(a), sim3_t(b)) + sim3_t(a)
    s = sim3_s(a) * sim3_s(b)
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


def sim3_inv(S):
    qi = quat_conj(sim3_q(S))
    si = 1.0 / sim3_s(S)
    ti = -si[..., None] * quat_rotate(qi, sim3_t(S))
    return jnp.concatenate([qi, ti, si[..., None]], axis=-1)


def sim3_apply(S, p):
    return sim3_s(S)[..., None] * quat_rotate(sim3_q(S), p) + sim3_t(S)


def _sim3_W(omega, sigma):
    """The Sim(3) 'W' matrix so that t = W(omega, sigma) @ v in sim3_exp.

    Closed forms follow Strasdat's thesis / Sophus `sim3.hpp` (public
    formulas), implemented branch-free over 4 regimes.
    """
    dtype = omega.dtype
    theta2 = jnp.sum(omega * omega, axis=-1)
    s_theta = theta2 < 1e-8
    s_sigma = jnp.abs(sigma) < 1e-4
    th = jnp.sqrt(jnp.where(s_theta, 1.0, theta2))
    sg = jnp.where(s_sigma, 1.0, sigma)
    es = jnp.exp(sigma)

    # C = (e^sigma - 1)/sigma
    C = jnp.where(s_sigma, 1.0 + 0.5 * sigma + sigma * sigma / 6.0, (es - 1.0) / sg)

    # regime 1: theta small, sigma small — first-order series in sigma:
    # A = 1/2 + sigma/3 + O(s^2), B = 1/6 + sigma/8 + O(s^2)
    A11 = 0.5 + sigma / 3.0
    B11 = 1.0 / 6.0 + sigma / 8.0
    # regime 2: theta small, sigma not small
    A10 = ((sg - 1.0) * es + 1.0) / (sg * sg)
    B10 = ((0.5 * sg * sg - sg + 1.0) * es - 1.0) / (sg ** 3)
    # regime 3: theta not small, sigma small
    A01 = (1.0 - jnp.cos(th)) / (th * th)
    B01 = (th - jnp.sin(th)) / (th ** 3)
    # regime 4: general
    a = es * jnp.sin(th)
    b = es * jnp.cos(th)
    c = theta2 + sigma * sigma
    csafe = jnp.where(c < _EPS, 1.0, c)
    A00 = (a * sg + (1.0 - b) * th) / (th * csafe)
    B00 = (C - ((b - 1.0) * sg + a * th) / csafe) / (th * th)

    A = jnp.where(s_theta, jnp.where(s_sigma, A11, A10), jnp.where(s_sigma, A01, A00))
    B = jnp.where(s_theta, jnp.where(s_sigma, B11, B10), jnp.where(s_sigma, B01, B00))

    K = hat(omega)
    I = jnp.broadcast_to(jnp.eye(3, dtype=dtype), K.shape)
    return C[..., None, None] * I + A[..., None, None] * K + B[..., None, None] * (K @ K)


def sim3_exp(xi):
    """sim3 tangent [...,7] = (v, omega, sigma) -> Sim3 [...,8]."""
    v, omega, sigma = xi[..., 0:3], xi[..., 3:6], xi[..., 6]
    q = so3_exp(omega)
    W = _sim3_W(omega, sigma)
    t = jnp.einsum("...ij,...j->...i", W, v)
    s = jnp.exp(sigma)
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


def sim3_log(S):
    omega = so3_log(sim3_q(S))
    sigma = jnp.log(jnp.maximum(sim3_s(S), _EPS))
    W = _sim3_W(omega, sigma)
    v = jnp.linalg.solve(W, sim3_t(S)[..., :, None])[..., 0]
    return jnp.concatenate([v, omega, sigma[..., None]], axis=-1)


def sim3_retract(S, xi):
    return sim3_mul(sim3_exp(xi), S)
