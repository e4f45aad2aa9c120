"""Neural-net primitives as pure functions over parameter pytrees.

No flax/haiku — parameters are nested dicts of jnp arrays so the whole model
is a transparent pytree that jits, shards, and donates cleanly. Weight layout
conventions (chosen for MXU-friendly contraction, converter transposes torch):

- Linear: ``w (in, out)``, ``b (out,)`` → ``y = x @ w + b``.
- Conv2d: NHWC activations, HWIO kernels.
- LayerNorm: eps 1e-6 (CroCo convention — reference croco.py:33).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def xavier_uniform(key, shape, dtype=jnp.float32, fan_in=None, fan_out=None):
    if fan_in is None:
        fan_in = shape[0] if len(shape) == 2 else math.prod(shape[:-1])
    if fan_out is None:
        fan_out = shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def init_linear(key, d_in, d_out, bias=True, dtype=jnp.float32):
    p = {"w": xavier_uniform(key, (d_in, d_out), dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def init_layernorm(dim, dtype=jnp.float32):
    return {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def init_conv(key, kh, kw, c_in, c_out, bias=True, dtype=jnp.float32):
    p = {"w": xavier_uniform(key, (kh, kw, c_in, c_out), dtype,
                             fan_in=kh * kw * c_in, fan_out=c_out)}
    if bias:
        p["b"] = jnp.zeros((c_out,), dtype)
    return p


# ---------------------------------------------------------------------------
# Forward primitives
# ---------------------------------------------------------------------------

def linear(p, x):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layernorm(p, x, eps=1e-6):
    # Accumulate moments in f32 regardless of activation dtype.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * p["g"] + p["b"]
    return y.astype(x.dtype)


def gelu(x):
    # torch.nn.GELU default is the exact erf formulation.
    return jax.nn.gelu(x, approximate=False)


def mlp(p, x):
    """Transformer MLP: fc1 → GELU → fc2."""
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))


def conv2d(p, x, stride=1, padding="SAME"):
    """NHWC conv with HWIO weights."""
    if isinstance(stride, int):
        stride = (stride, stride)
    dn = lax.conv_dimension_numbers(x.shape, p["w"].shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), stride, padding, dimension_numbers=dn
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv2d_transpose(p, x, stride):
    """NHWC transposed conv, kernel HWIO ``(kh, kw, c_in, c_out)``; VALID padding
    with ``kh == stride`` (the DPT upsamplers use k=s so output is exactly s*H).

    With ``k == s`` the output blocks of different input pixels never
    overlap, so torch ``ConvTranspose2d`` semantics
    (``out[i·s+di, j·s+dj] += x[i,j,ci]·W[di,dj,ci,co]``) reduce EXACTLY to
    one per-pixel matmul to a ``k·k·c_out`` block followed by a pixel
    shuffle — a clean MXU contraction instead of ``lax.conv_transpose``'s
    grad-conv lowering. The general ``k != s`` case keeps the conv_transpose
    path (kernel spatially flipped, since lax treats it as a forward-conv
    kernel). Both verified against torch in tests/test_model_parity.py."""
    if isinstance(stride, int):
        stride = (stride, stride)
    kh, kw, cin, cout = p["w"].shape
    if (kh, kw) == tuple(stride):
        b, h, w_, _ = x.shape
        wmat = p["w"].transpose(2, 0, 1, 3).reshape(cin, kh * kw * cout)
        y = x.reshape(b, h * w_, cin) @ wmat.astype(x.dtype)
        y = y.reshape(b, h, w_, kh, kw, cout)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * kh, w_ * kw, cout)
    else:
        w = p["w"][::-1, ::-1].astype(x.dtype)
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_transpose(x, w, stride, "VALID", dimension_numbers=dn)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def interpolate_bilinear(x, out_hw, align_corners=True):
    """Bilinear resize of NHWC ``x`` to ``out_hw`` (torch align_corners=True)."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    if align_corners and oh > 1 and ow > 1:
        ys = jnp.linspace(0.0, h - 1.0, oh)
        xs = jnp.linspace(0.0, w - 1.0, ow)
    else:
        ys = (jnp.arange(oh) + 0.5) * (h / oh) - 0.5
        xs = (jnp.arange(ow) + 0.5) * (w / ow) - 0.5
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0).astype(x.dtype)
    wx = jnp.clip(xs - x0, 0.0, 1.0).astype(x.dtype)

    top = x[:, y0][:, :, x0] * (1 - wx[None, None, :, None]) + x[:, y0][:, :, x1] * wx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - wx[None, None, :, None]) + x[:, y1][:, :, x1] * wx[None, None, :, None]
    return top * (1 - wy[None, :, None, None]) + bot * wy[None, :, None, None]


def pixel_shuffle(x, r):
    """NHWC pixel shuffle: ``(B, H, W, C*r*r) → (B, H*r, W*r, C)``.

    Channel index interpreted as ``c * r * r + dy * r + dx`` (torch layout) so
    converted torch weights produce identical outputs.
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, dy, w, dx, c
    return x.reshape(b, h * r, w * r, c)
