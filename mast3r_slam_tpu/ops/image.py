"""Image-space operators (pure JAX, NHWC layout for TPU-friendly convs).

Parity with reference mast3r_slam/image.py (Scharr-like 3x3 gradients with
reflect padding), plus bilinear sampling used by the matcher.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Scharr-like kernels, normalized by 1/32 (same stencil as the reference).
_GX = jnp.asarray(
    [[-3.0, 0.0, 3.0], [-10.0, 0.0, 10.0], [-3.0, 0.0, 3.0]], dtype=jnp.float32
) / 32.0
_GY = _GX.T


def img_gradient(img):
    """Per-channel x/y gradients of ``img (B, H, W, C)`` with reflect padding.

    Returns ``(gx, gy)`` each ``(B, H, W, C)``.
    """
    b, h, w, c = img.shape
    x = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    # Depthwise conv: feature_group_count=C with (3, 3, 1, C)-shaped kernels.
    kx = jnp.tile(_GX.astype(img.dtype)[:, :, None, None], (1, 1, 1, c))
    ky = jnp.tile(_GY.astype(img.dtype)[:, :, None, None], (1, 1, 1, c))
    dn = lax.conv_dimension_numbers(x.shape, kx.shape, ("NHWC", "HWIO", "NHWC"))
    gx = lax.conv_general_dilated(x, kx, (1, 1), "VALID", dimension_numbers=dn,
                                  feature_group_count=c)
    gy = lax.conv_general_dilated(x, ky, (1, 1), "VALID", dimension_numbers=dn,
                                  feature_group_count=c)
    return gx, gy


def bilinear_sample(img, uv):
    """Sample ``img (H, W, C)`` at continuous pixel coords ``uv (..., 2)`` (u, v).

    Matches the corner convention of the reference matcher kernel
    (matching_kernels.cu:154-183): the four neighbors of (u, v) are
    (floor u, floor v) .. (+1, +1) and weights are the opposing-area products.
    Coordinates are expected pre-clamped to [1, W-2] x [1, H-2].
    """
    h, w, _ = img.shape
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = (u - u0.astype(u.dtype))[..., None]
    dv = (v - v0.astype(v.dtype))[..., None]
    u1 = jnp.clip(u0 + 1, 0, w - 1)
    v1 = jnp.clip(v0 + 1, 0, h - 1)
    u0 = jnp.clip(u0, 0, w - 1)
    v0 = jnp.clip(v0, 0, h - 1)
    p00 = img[v0, u0]
    p01 = img[v0, u1]
    p10 = img[v1, u0]
    p11 = img[v1, u1]
    top = p00 * (1.0 - du) + p01 * du
    bot = p10 * (1.0 - du) + p11 * du
    return top * (1.0 - dv) + bot * dv
