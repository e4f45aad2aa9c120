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


def _conv3x3_pallas_enabled():
    import os

    return os.environ.get("MAST3R_TPU_CONV3X3", "1") == "1"


def conv2d(p, x, stride=1, padding="SAME"):
    """NHWC conv with HWIO weights.

    Stride-1 1x1 convs lower to a plain (H·W, Cin) x (Cin, Cout) matmul
    (bit-identical; avoids lax.conv's layout choice). Lane-aligned stride-1
    3x3 SAME convs take the Pallas stencil kernel (ops/conv3x3.py): one HBM
    pad, halo tiles in VMEM, 9 accumulated MXU dots — vs ``lax.conv``'s
    ~19% MXU lowering (round-4 trace). An XLA shifted-matmul lowering was
    tried and rejected round 4 (9 in-program pad+slice materializations,
    model stage 19.1 → 25.7 ms); the kernel keeps those shifts in VMEM.
    Other shapes stay on ``lax.conv``.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    kh, kw, cin, cout = p["w"].shape
    if (kh, kw) == (3, 3) and _conv3x3_pallas_enabled():
        from mast3r_slam_tpu.ops import conv3x3 as C3

        if C3.supports_pallas() and C3.conv3x3_qualifies(
                x.shape, p["w"].shape, stride, padding,
                itemsize=x.dtype.itemsize):
            return C3.conv3x3(x, p["w"], p.get("b"))
    if stride == (1, 1) and (kh, kw) == (1, 1):
        b, h, w, _ = x.shape
        acc = lax.dot_general(
            x.reshape(b, h * w, cin), p["w"].astype(x.dtype)[0, 0],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = acc.astype(x.dtype).reshape(b, h, w, cout)
    else:
        dn = lax.conv_dimension_numbers(x.shape, p["w"].shape,
                                        ("NHWC", "HWIO", "NHWC"))
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


def _interp_matrix(n_in, n_out, align_corners):
    """(n_out, n_in) row-stochastic linear-interpolation matrix (≤2 nonzeros
    per row) — bilinear resize as two MXU contractions instead of four
    full-tensor gathers (the gather form measured 2.6 ms/frame in the DPT
    head; the matmul form is FLOP-trivial and reads the input once)."""
    import numpy as np

    if align_corners and n_out > 1 and n_in > 1:
        pos = np.linspace(0.0, n_in - 1.0, n_out)
    else:
        pos = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 1)
    i1 = np.clip(i0 + 1, 0, n_in - 1)
    w1 = np.clip(pos - i0, 0.0, 1.0).astype(np.float32)
    M = np.zeros((n_out, n_in), np.float32)
    np.add.at(M, (np.arange(n_out), i0), 1.0 - w1)
    np.add.at(M, (np.arange(n_out), i1), w1)
    return M


def interpolate_bilinear(x, out_hw, align_corners=True):
    """Bilinear resize of NHWC ``x`` to ``out_hw`` (torch align_corners=True).

    Expressed as two separable interpolation matmuls (H then W): the same
    two-tap linear combination per output sample as torch's kernel, with
    f32 accumulation on the MXU.
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    My = jnp.asarray(_interp_matrix(h, oh, align_corners), x.dtype)
    Mx = jnp.asarray(_interp_matrix(w, ow, align_corners), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", My, x,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,bowc->bopc", Mx, y.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


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
