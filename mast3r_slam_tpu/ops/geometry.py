"""Projective / ray geometry with analytic Jacobians (pure JAX).

Capability parity with the reference geometry layer (reference:
mast3r_slam/geometry.py), rebuilt for fixed-shape jit: validity is returned as
masks instead of boolean indexing, and Jacobians are computed in batched
closed form so the tracker/BA can contract them on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp

from mast3r_slam_tpu.ops import lie


def point_to_dist(X):
    """Euclidean norm of points, keepdims. ``(..., 3) → (..., 1)``."""
    return jnp.linalg.norm(X, axis=-1, keepdims=True)


def point_to_ray_dist(X, jacobian: bool = False):
    """Points → unit-ray + distance residual space ``[r(3), d(1)]``.

    With ``jacobian=True`` also returns ``d(rd)/dX (..., 4, 3)``:
    ``dr/dX = (I - r r^T) / d`` and ``dd/dX = r^T``.
    """
    d = point_to_dist(X)
    d_inv = 1.0 / d
    r = d_inv * X
    rd = jnp.concatenate([r, d], axis=-1)
    if not jacobian:
        return rd
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), X.shape[:-1] + (3, 3))
    rrT = r[..., :, None] * r[..., None, :]
    dr_dX = d_inv[..., None] * (eye - rrT)
    dd_dX = r[..., None, :]
    return rd, jnp.concatenate([dr_dX, dd_dX], axis=-2)


def act_Sim3(T, X, jacobian: bool = False):
    """Apply Sim(3) to points; optionally return the left-perturbation Jacobian.

    ``d(exp(eps) ∘ T ∘ X)/d eps = [I | -skew(X') | X']`` with ``X' = T ∘ X``,
    tangent ordering [tau, phi, sigma] → shape ``(..., 3, 7)``.
    """
    Xw = lie.act(T, X)
    if not jacobian:
        return Xw
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), Xw.shape[:-1] + (3, 3))
    J = jnp.concatenate([eye, -lie.skew(Xw), Xw[..., :, None]], axis=-1)
    return Xw, J


def decompose_K(K):
    return K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]


def project_calib(P, K, img_size, jacobian: bool = False, border: float = 0,
                  z_eps: float = 0.0):
    """Pinhole projection to ``[u, v, log z]`` with border/depth validity masks.

    ``img_size`` is ``(H, W)``. Negative ``border`` allows projections that
    fall outside the image by up to ``|border|`` pixels (reference semantics,
    config tracking.pixel_border).
    Returns ``(pz, valid)`` or ``(pz, dpz_dP, valid)`` with
    ``dpz_dP (..., 3, 3)``.
    """
    fx, fy, cx, cy = decompose_K(K)
    x = P[..., 0]
    y = P[..., 1]
    z = P[..., 2]
    H, W = img_size

    valid_z = z > z_eps
    z_safe = jnp.where(valid_z, z, 1.0)
    z_inv = 1.0 / z_safe

    u = fx * x * z_inv + cx
    v = fy * y * z_inv + cy

    valid_u = (u > border) & (u < W - 1 - border)
    valid_v = (v > border) & (v < H - 1 - border)
    valid = (valid_u & valid_v & valid_z)[..., None]

    logz = jnp.where(valid_z, jnp.log(z_safe), 0.0)
    pz = jnp.stack([u, v, logz], axis=-1)

    if not jacobian:
        return pz, valid

    zero = jnp.zeros_like(z_inv)
    # Rows: du/dP, dv/dP, dlogz/dP
    row_u = jnp.stack([fx * z_inv, zero, -fx * x * z_inv * z_inv], axis=-1)
    row_v = jnp.stack([zero, fy * z_inv, -fy * y * z_inv * z_inv], axis=-1)
    row_z = jnp.stack([zero, zero, z_inv], axis=-1)
    dpz_dP = jnp.stack([row_u, row_v, row_z], axis=-2)
    return pz, dpz_dP, valid


def backproject(p, z, K):
    """Pixels ``p (..., 2)`` + depths ``z (..., 1)`` → camera-frame points."""
    x = (p[..., 0] - K[0, 2]) / K[0, 0]
    y = (p[..., 1] - K[1, 2]) / K[1, 1]
    dirs = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return z * dirs


def get_pixel_coords(img_size, dtype=jnp.float32):
    """Dense pixel grid ``(H*W, 2)`` in (u, v) order, row-major over v then u."""
    H, W = img_size
    u = jnp.arange(W, dtype=dtype)
    v = jnp.arange(H, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    return jnp.stack([uu, vv], axis=-1).reshape(-1, 2)


# ---------------------------------------------------------------------------
# Channels-first ("structure-of-arrays") Jacobian helpers.
#
# The Gauss-Newton solvers (tracker + backend BA) keep residual/Jacobian
# CHANNELS as separate lane-parallel vectors instead of (N, D, 7) arrays —
# the array-of-structs layout puts the 7-dim tangent in TPU lanes at 5%
# utilization (measured 13x slower). These helpers are the shared channel-
# list building blocks.
# ---------------------------------------------------------------------------

def point_jac_channels(Xw):
    """Local Sim3 point Jacobian ``[I | -skew(X') | X']`` as a 3x7 nested
    list of channel vectors (leading dims of ``Xw (..., 3)`` preserved)."""
    x, y, z = Xw[..., 0], Xw[..., 1], Xw[..., 2]
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    return [
        [one, zero, zero, zero, z, -y, x],
        [zero, one, zero, -z, zero, x, y],
        [zero, zero, one, y, -x, zero, z],
    ]


def compose_jac_channels(d_res, d_pt, negate=False):
    """(D x 3) ∘ (3 x 7) channel-list composition → D x 7 channel lists."""
    out = []
    for i in range(len(d_res)):
        row = []
        for k in range(7):
            s = (d_res[i][0] * d_pt[0][k] + d_res[i][1] * d_pt[1][k]
                 + d_res[i][2] * d_pt[2][k])
            row.append(-s if negate else s)
        out.append(row)
    return out


def estimate_focal(X, img_size, min_ratio=0.05):
    """Median-based pinhole focal estimate from a canonical pointmap.

    MASt3R pointmaps are in the camera frame with the principal point at the
    image center; the focal that best explains pixel u for point (x, y, z) is
    ``(u - cx) / (x / z)``. The median over pixels with a significant ray
    slope is a robust single-scalar estimate, used only to warm-start the
    backend matcher by projection (ops/matching.py inits — approximation
    errors cost LM iterations, never correctness). ``X (..., H*W, 3)``.
    """
    H, W = img_size
    uv = get_pixel_coords(img_size, dtype=X.dtype)
    z = jnp.maximum(X[..., 2], 1e-8)
    rx = X[..., 0] / z
    ry = X[..., 1] / z
    du = uv[..., 0] - (W - 1) / 2.0
    dv = uv[..., 1] - (H - 1) / 2.0
    # combine both axes into one sample set; gate shallow slopes
    r = jnp.concatenate([rx, ry], axis=-1)
    d = jnp.concatenate([du, dv], axis=-1)
    ok = jnp.abs(r) > min_ratio
    f = jnp.where(ok, d / jnp.where(ok, r, 1.0), jnp.nan)
    return jnp.nanmedian(f, axis=-1)


def project_to_index(X_src, T_src, T_dst, focal, img_size):
    """Project source-frame points into the destination keyframe's pixel
    GRID INDEX — the geometric warm start for the backend matcher.

    ``X_src (..., N, 3)`` points in src camera frame; ``T_src/T_dst (..., 8)``
    Sim3 world-from-camera poses; ``focal``: dst pinhole focal (scalar per
    batch element; from :func:`estimate_focal` or a calibrated K). Returns
    int32 flat indices ``(..., N)`` clipped to the image. Matches the init
    semantics of the reference matching_kernels.cu:119-275 (any init is
    legal; good inits converge in fewer LM iterations).
    """
    from mast3r_slam_tpu.ops import lie

    H, W = img_size
    T_rel = lie.compose(lie.inv(T_dst), T_src)
    P = lie.act(T_rel[..., None, :] if T_rel.ndim == X_src.ndim - 1
                else T_rel, X_src)
    z = jnp.maximum(P[..., 2], 1e-8)
    u = focal[..., None] * (P[..., 0] / z) + (W - 1) / 2.0
    v = focal[..., None] * (P[..., 1] / z) + (H - 1) / 2.0
    ui = jnp.clip(jnp.round(u), 0, W - 1).astype(jnp.int32)
    vi = jnp.clip(jnp.round(v), 0, H - 1).astype(jnp.int32)
    return vi * W + ui


def constrain_points_to_ray(img_size, Xs, K):
    """Snap pointmap entries onto the camera rays through their own pixels.

    Keeps each point's z but replaces x, y with the pinhole ray — used in
    calibrated mode so residuals are purely along known rays.
    ``Xs (..., H*W, 3)``.
    """
    uv = get_pixel_coords(img_size, dtype=Xs.dtype)
    uv = jnp.broadcast_to(uv, Xs.shape[:-1] + (2,))
    return backproject(uv, Xs[..., 2:3], K)
