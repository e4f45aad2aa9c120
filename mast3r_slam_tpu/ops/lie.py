"""Sim(3) / SE(3) Lie-group operations in pure JAX.

This is the framework's single source of truth for pose math, replacing the
reference's three parallel implementations (the ``lietorch`` CUDA extension,
the torch tracker math, and the CUDA device functions in
mast3r_slam/backend/src/gn_kernels.cu:177-413).

Conventions (shared with the reference so trajectories are interchangeable):

- Sim(3) elements are stored as ``(..., 8)`` arrays ``[tx ty tz, qx qy qz qw, s]``
  (quaternion is xyzw with the scalar last; ``s`` is the scale itself, not log-scale).
- SE(3) elements are ``(..., 7)`` arrays ``[tx ty tz, qx qy qz qw]``.
- Group action: ``T * X = s * R @ X + t``.
- Tangent vectors are ``(..., 7)`` ordered ``[tau(3), phi(3), sigma]``
  (translational, rotational, scale parts).
- Retraction is LEFT-multiplicative: ``retr(T, xi) = exp(xi) ∘ T`` — matching the
  reference solvers (gn_kernels.cu:392-413 composes the update from the left).

All functions broadcast over leading dimensions and are jit/vmap-safe (branchless
small-angle handling via ``jnp.where`` on safe operands).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8  # small-angle / small-log-scale series switch


# ---------------------------------------------------------------------------
# Quaternion primitives (xyzw layout)
# ---------------------------------------------------------------------------

def quat_mul(q1, q2):
    """Hamilton product ``q1 * q2`` for xyzw quaternions."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_inv(q):
    """Conjugate of a unit quaternion."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_act(q, v):
    """Rotate vectors ``v (..., 3)`` by unit quaternions ``q (..., 4)``."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, v)
    return v + qw * uv + jnp.cross(qv, uv)


def quat_to_matrix(q):
    """Unit quaternion → rotation matrix ``(..., 3, 3)``."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
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


def matrix_to_quat(R):
    """Rotation matrix → unit quaternion (xyzw), branchless Shepperd's method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best.
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, 1e-12)) / 2.0
    q0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw0 * qw0], -1) / (
        4.0 * qw0[..., None]
    )
    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12)) / 2.0
    q1 = jnp.stack(
        [4.0 * qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], -1
    ) / (4.0 * qx1[..., None])
    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12)) / 2.0
    q2 = jnp.stack(
        [(m01 + m10), 4.0 * qy2 * qy2, (m12 + m21), (m02 - m20)], -1
    ) / (4.0 * qy2[..., None])
    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12)) / 2.0
    q3 = jnp.stack(
        [(m02 + m20), (m12 + m21), 4.0 * qz3 * qz3, (m10 - m01)], -1
    ) / (4.0 * qz3[..., None])

    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], -1)
    best = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def skew(v):
    """``(..., 3) → (..., 3, 3)`` cross-product matrix."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# SO(3) exp/log
# ---------------------------------------------------------------------------

def so3_exp_quat(phi):
    """so(3) vector → unit quaternion (xyzw) with Taylor fallback near 0."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    small = theta_sq < _EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    # exact
    imag_e = jnp.sin(0.5 * theta) / theta
    real_e = jnp.cos(0.5 * theta)
    # series
    t4 = theta_sq * theta_sq
    imag_s = 0.5 - theta_sq / 48.0 + t4 / 3840.0
    real_s = 1.0 - theta_sq / 8.0 + t4 / 384.0
    imag = jnp.where(small, imag_s, imag_e)
    real = jnp.where(small, real_s, real_e)
    return jnp.concatenate([imag[..., None] * phi, real[..., None]], axis=-1)


def so3_log(q):
    """Unit quaternion → so(3) vector (angle in (-pi, pi])."""
    qv = q[..., :3]
    qw = q[..., 3]
    nv_sq = jnp.sum(qv * qv, axis=-1)
    small = nv_sq < _EPS
    nv = jnp.sqrt(jnp.where(small, 1.0, nv_sq))
    # exact: theta = 2 atan2(|qv|, qw); factor = theta / |qv|
    theta = 2.0 * jnp.arctan2(nv, qw)
    factor_e = theta / nv
    # series: qw ~ +-1 → factor ≈ 2/qw (sign handled by qw)
    factor_s = 2.0 / jnp.where(jnp.abs(qw) < 1e-12, 1.0, qw)
    factor = jnp.where(small, factor_s, factor_e)
    return factor[..., None] * qv


# ---------------------------------------------------------------------------
# Sim(3)
# ---------------------------------------------------------------------------

def identity(shape=(), dtype=jnp.float32):
    """Identity Sim(3) element(s) of batch shape ``shape``."""
    base = jnp.asarray([0, 0, 0, 0, 0, 0, 1, 1], dtype=dtype)
    return jnp.broadcast_to(base, tuple(shape) + (8,))


def translation(T):
    return T[..., 0:3]


def quaternion(T):
    return T[..., 3:7]


def scale(T):
    return T[..., 7:8]


def act(T, X):
    """Apply Sim(3) ``T (..., 8)`` to points ``X (..., 3)``.

    Broadcasts T's batch dims against X's; to act on a pointcloud with a single
    pose pass ``T`` shaped ``(8,)`` or ``(1, 8)`` and ``X`` shaped ``(N, 3)``.
    """
    return scale(T) * quat_act(quaternion(T), X) + translation(T)


def _unit(q):
    """Renormalize a quaternion (rsqrt of its squared norm)."""
    return q * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), 1e-30))


def compose(Ta, Tb):
    """Group composition ``Ta ∘ Tb``.

    The product quaternion is RENORMALIZED. This is not optional hygiene:
    ``quat_inv`` is the conjugate, which inverts only UNIT quaternions, and
    ``quat_act``/``act`` scale points by |q|² — so through the tracker's
    per-frame chain ``T_new = T_k ∘ solve(init = T_k⁻¹ ∘ T_prev)`` any norm
    error ε amplifies as (1+ε) → (1+ε)³ per frame and EXPLODES after ~33
    frames (|q| ~ 1e11 observed on the oracle-scene harness; the ray
    residuals are |q|-invariant and Huber clamps the dist channel, so the
    solver itself never notices). lietorch stores unit quaternions and
    renormalizes in its operations; one rsqrt here buys the same guarantee.
    """
    q = _unit(quat_mul(quaternion(Ta), quaternion(Tb)))
    t = act(Ta, translation(Tb))
    s = scale(Ta) * scale(Tb)
    return jnp.concatenate([t, q, s], axis=-1)


def inv(T):
    """Group inverse: ``(R, t, s)^-1 = (R^T, -(1/s) R^T t, 1/s)``.

    Renormalizes the conjugate (see :func:`compose` — conj inverts only
    unit quaternions)."""
    qi = _unit(quat_inv(quaternion(T)))
    s_inv = 1.0 / scale(T)
    t_inv = -s_inv * quat_act(qi, translation(T))
    return jnp.concatenate([t_inv, qi, s_inv], axis=-1)


# Below this magnitude of (theta, sigma) the closed-form W coefficients suffer
# catastrophic f32 cancellation (their guards in Sophus/lietorch assume f64),
# so we switch to the exact Taylor series of W = sum_n M^n/(n+1)!,
# M = sigma*I + Phi, evaluated by the {I, Phi, Phi^2} coefficient recurrence
# (Phi^3 = -theta^2 Phi). 12 terms give truncation < 1e-12 for |M| < 0.3,
# while all closed-form denominators are then >= 0.3 — f32-safe on both sides.
_W_SERIES_THRESH_SQ = 0.3 ** 2
_W_SERIES_TERMS = 12


def _w_series(theta_sq, sigma):
    """(C, A, B) by the M^n/(n+1)! recurrence in the {I, Phi, Phi^2} basis."""
    cI = jnp.ones_like(sigma)
    cP = jnp.zeros_like(sigma)
    cP2 = jnp.zeros_like(sigma)
    C = jnp.zeros_like(sigma)
    A = jnp.zeros_like(sigma)
    B = jnp.zeros_like(sigma)
    fact = 1.0
    for n in range(_W_SERIES_TERMS):
        fact *= n + 1  # (n+1)!
        inv = 1.0 / fact
        C = C + cI * inv
        A = A + cP * inv
        B = B + cP2 * inv
        cI, cP, cP2 = (
            sigma * cI,
            cI + sigma * cP - theta_sq * cP2,
            cP + sigma * cP2,
        )
    return C, A, B


def _sim3_W_coeffs(theta_sq, sigma):
    """Coefficients (C, A, B) of ``W = C I + A Phi + B Phi^2`` for the Sim(3) exp.

    ``t = W tau`` where ``W = ∫_0^1 exp(sigma s) R(theta s) ds``. Closed form
    for large arguments; f32-stable Taylor series near zero (see above).
    Branchless via ``jnp.where`` on guarded operands.
    """
    t_small = theta_sq < _W_SERIES_THRESH_SQ
    s_small = sigma * sigma < _W_SERIES_THRESH_SQ
    series = t_small & s_small  # box selector: every other branch divides by a
    #                             quantity that is then >= 0.3 — f32-safe.

    C_s, A_s, B_s = _w_series(theta_sq, sigma)

    # --- closed forms with guarded denominators ---
    theta_sq_l = jnp.where(t_small, 1.0, theta_sq)   # used when theta large
    theta_l = jnp.sqrt(theta_sq_l)
    sigma_l = jnp.where(s_small, 1.0, sigma)         # used when sigma large
    scale_f = jnp.exp(sigma)

    C_e = (scale_f - 1.0) / sigma_l
    C = jnp.where(s_small, C_s, C_e)

    # theta small, sigma large (c = sigma^2 + theta^2 >= 0.09 here): Taylor in
    # theta with EXACT sigma dependence, from W = ∫ e^{sigma s} R(theta s) ds —
    # the sin/cos integrals expanded to theta^4 (truncation < 1e-6 at 0.3).
    c_ts = sigma * sigma + theta_sq
    c_ts_safe = jnp.where(series, 1.0, c_ts)
    A_ls = (
        scale_f * (sigma - 1.0) + 1.0
        + theta_sq * scale_f * (0.5 - sigma / 6.0)
        + theta_sq * theta_sq * scale_f * (sigma / 120.0 - 1.0 / 24.0)
    ) / c_ts_safe
    B_ls = (
        C - scale_f * (1.0 - 0.5 * sigma)
        + theta_sq * scale_f * (1.0 / 6.0 - sigma / 24.0)
        + theta_sq * theta_sq * scale_f * (sigma / 720.0 - 1.0 / 120.0)
    ) / c_ts_safe
    # theta large (any sigma):
    a = scale_f * jnp.sin(theta_l)
    b = scale_f * jnp.cos(theta_l)
    c = theta_sq_l + sigma * sigma
    A_ll = (a * sigma + (1.0 - b) * theta_l) / (theta_l * c)
    B_ll = (C - ((b - 1.0) * sigma + a * theta_l) / c) / theta_sq_l

    A = jnp.where(series, A_s, jnp.where(t_small, A_ls, A_ll))
    B = jnp.where(series, B_s, jnp.where(t_small, B_ls, B_ll))
    return C, A, B


def exp(xi):
    """Sim(3) exponential map: tangent ``(..., 7)`` → group element ``(..., 8)``."""
    tau = xi[..., 0:3]
    phi = xi[..., 3:6]
    sigma = xi[..., 6]

    q = so3_exp_quat(phi)
    s = jnp.exp(sigma)[..., None]

    theta_sq = jnp.sum(phi * phi, axis=-1)
    C, A, B = _sim3_W_coeffs(theta_sq, sigma)
    phi_x_tau = jnp.cross(phi, tau)
    phi_x2_tau = jnp.cross(phi, phi_x_tau)
    t = C[..., None] * tau + A[..., None] * phi_x_tau + B[..., None] * phi_x2_tau
    return jnp.concatenate([t, q, s], axis=-1)


def log(T):
    """Sim(3) logarithm: group element ``(..., 8)`` → tangent ``(..., 7)``.

    Inverse of :func:`exp`; solves ``t = W tau`` for ``tau`` with a 3x3 solve.
    """
    phi = so3_log(quaternion(T))
    sigma = jnp.log(scale(T)[..., 0])
    theta_sq = jnp.sum(phi * phi, axis=-1)
    C, A, B = _sim3_W_coeffs(theta_sq, sigma)
    Phi = skew(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), Phi.shape)
    W = C[..., None, None] * eye + A[..., None, None] * Phi + B[
        ..., None, None
    ] * (Phi @ Phi)
    tau = jnp.linalg.solve(W, translation(T)[..., None])[..., 0]
    return jnp.concatenate([tau, phi, sigma[..., None]], axis=-1)


def retr(T, xi):
    """Left-multiplicative retraction ``exp(xi) ∘ T``."""
    return compose(exp(xi), T)


def matrix(T):
    """Sim(3) → ``(..., 4, 4)`` homogeneous matrix with ``sR`` upper-left block."""
    R = quat_to_matrix(quaternion(T))
    sR = scale(T)[..., None] * R
    t = translation(T)[..., None]
    top = jnp.concatenate([sR, t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=T.dtype),
        T.shape[:-1] + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def adjoint(T):
    """Sim(3) adjoint ``(..., 7, 7)`` in [tau, phi, sigma] ordering.

    ``Adj(T) = [[sR, [t]x R, -t], [0, R, 0], [0, 0, 1]]`` such that
    ``T exp(xi) T^-1 = exp(Adj(T) xi)``.
    """
    R = quat_to_matrix(quaternion(T))
    t = translation(T)
    s = scale(T)[..., None]
    batch = T.shape[:-1]
    Z33 = jnp.zeros(batch + (3, 3), dtype=T.dtype)
    Z31 = jnp.zeros(batch + (3, 1), dtype=T.dtype)
    row0 = jnp.concatenate([s * R, skew(t) @ R, -t[..., None]], axis=-1)
    row1 = jnp.concatenate([Z33, R, Z31], axis=-1)
    row2 = jnp.concatenate(
        [
            jnp.zeros(batch + (1, 6), dtype=T.dtype),
            jnp.ones(batch + (1, 1), dtype=T.dtype),
        ],
        axis=-1,
    )
    return jnp.concatenate([row0, row1, row2], axis=-2)


def normalize(T):
    """Re-normalize the quaternion part (defends against drift after many composes)."""
    q = quaternion(T)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.concatenate([translation(T), q, scale(T)], axis=-1)


# ---------------------------------------------------------------------------
# SE(3) (used for trajectory export; reference: lietorch_utils.py:6-13)
# ---------------------------------------------------------------------------

def se3_identity(shape=(), dtype=jnp.float32):
    base = jnp.asarray([0, 0, 0, 0, 0, 0, 1], dtype=dtype)
    return jnp.broadcast_to(base, tuple(shape) + (7,))


def se3_act(T, X):
    return quat_act(T[..., 3:7], X) + T[..., 0:3]


def se3_compose(Ta, Tb):
    q = _unit(quat_mul(Ta[..., 3:7], Tb[..., 3:7]))
    t = se3_act(Ta, Tb[..., 0:3])
    return jnp.concatenate([t, q], axis=-1)


def se3_inv(T):
    qi = _unit(quat_inv(T[..., 3:7]))
    return jnp.concatenate([-quat_act(qi, T[..., 0:3]), qi], axis=-1)


def sim3_to_se3(T):
    """Drop the scale: Sim(3) ``[t q s]`` → SE(3) ``[t q]``.

    Matches the reference's ``as_SE3`` used for TUM-format trajectory export.
    """
    return T[..., 0:7]
