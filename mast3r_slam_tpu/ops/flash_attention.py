"""Flash attention as a Pallas TPU kernel.

Online-softmax blocked attention for the ViT encoder / cross-decoder
(replaces the reference's naive ``softmax(q kᵀ) v`` torch attention,
croco/models/blocks.py:94-112, and subsumes the cuRoPE2D pipeline position —
RoPE is applied to q/k before this kernel). At SLAM's 768-token sequences a
single (q-block × kv-stream) pass keeps everything in VMEM; the payoff grows
with the backend's batched keyframe-pair decodes where B·heads fills the
grid.

Falls back to plain XLA attention off-TPU (Pallas CPU only supports
interpret mode, which is far slower than XLA).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _rope_rotate(t, cos, sin):
    """Apply the 2D-RoPE rotation given precomputed full-width tables.

    ``t (R, D)`` f32; ``cos/sin (R, D)`` f32 laid out as
    ``[cos_y, cos_y, cos_x, cos_x]`` over D/4-quarters (see
    :func:`rope_tables`). The rotate-half pairing is within each D/2 half:
    quarter 2 pairs with 1 and quarter 4 with 3 — exactly the reference
    RoPE2D convention (croco/models/pos_embed.py:112-159, and
    models/mast3r.py::rope_2d outside the kernel)."""
    d = t.shape[-1]
    qt = d // 4
    t1 = t[:, 0 * qt:1 * qt]
    t2 = t[:, 1 * qt:2 * qt]
    t3 = t[:, 2 * qt:3 * qt]
    t4 = t[:, 3 * qt:4 * qt]
    rot = jnp.concatenate([-t2, t1, -t4, t3], axis=-1)
    return t * cos + rot * sin


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, sm_scale: float):
    """One (batch*head, q-block) program: stream kv blocks with online softmax.

    Block shapes carry a leading singleton (batch*head) dim:
    q_ref (1, BQ, D); k_ref/v_ref (1, N, D); o_ref (1, BQ, D).
    """
    q = q_ref[0].astype(jnp.float32) * sm_scale
    n_kv = k_ref.shape[1]
    bq, d = q.shape

    def body(i, carry):
        o, m, l = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # (BQ, BK)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        o_new = alpha * o + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return o_new, m_new, l_new

    o0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    o, m, l = jax.lax.fori_loop(0, n_kv // block_k, body, (o0, m0, l0))
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_rope_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                       o_ref, *, block_k: int, sm_scale: float):
    """Flash kernel with RoPE folded in: q/k arrive UN-rotated; the rotation
    happens in VMEM against small cos/sin tables. This removes the per-frame
    HBM round-trips of materializing rotated q/k (the rotation was ~2 ms of
    un-fusable elementwise passes per frame once attention moved off the XLA
    einsums — round-5 trace). Block shapes: q_ref (1, BQ, D);
    k_ref/v_ref (1, N, D); cq/sq (1, BQ, D); ck/sk (1, N, D)."""
    q = _rope_rotate(q_ref[0].astype(jnp.float32),
                     cq_ref[0], sq_ref[0]) * sm_scale
    n_kv = k_ref.shape[1]
    bq, d = q.shape

    def body(i, carry):
        o, m, l = carry
        k = _rope_rotate(
            k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32),
            ck_ref[0, pl.ds(i * block_k, block_k), :],
            sk_ref[0, pl.ds(i * block_k, block_k), :])
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        o_new = alpha * o + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return o_new, m_new, l_new

    o0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    o, m, l = jax.lax.fori_loop(0, n_kv // block_k, body, (o0, m0, l0))
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def rope_tables(pos, d, base=100.0):
    """Full-width 2D-RoPE cos/sin tables for :func:`_flash_rope_kernel`.

    ``pos (B, N, 2)`` integer (y, x) patch coordinates → ``(cos, sin)`` each
    ``(B, N, D)`` f32, quarters ``[y, y, x, x]``. Identical math to the
    out-of-kernel rope (models/mast3r.py::rope_2d one_axis): the first D/2
    channels rotate by y, the last by x; within each half the cos/sin of the
    D/4 frequencies are repeated twice. All attention calls at one
    resolution share pos, so XLA CSEs these tables across the frame program.
    """
    half = d // 2
    quarter = half // 2
    inv_freq = 1.0 / (base ** (
        jnp.arange(0, quarter, dtype=jnp.float32) * 2.0 / half))
    fy = pos[..., 0:1].astype(jnp.float32) * inv_freq       # (B, N, q)
    fx = pos[..., 1:2].astype(jnp.float32) * inv_freq
    cos = jnp.concatenate([jnp.cos(fy), jnp.cos(fy),
                           jnp.cos(fx), jnp.cos(fx)], axis=-1)
    sin = jnp.concatenate([jnp.sin(fy), jnp.sin(fy),
                           jnp.sin(fx), jnp.sin(fx)], axis=-1)
    return cos, sin


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "n_heads"))
def flash_attention_rope(q, k, v, cos_q, sin_q, cos_k, sin_k, n_heads,
                         block_q: int = 128, block_k: int = 128):
    """Flash attention with in-kernel RoPE.

    ``q (B, H, Nq, D)`` / ``k, v (B, H, Nk, D)`` UN-rotated;
    ``cos_q/sin_q (B, Nq, D)``, ``cos_k/sin_k (B, Nk, D)`` from
    :func:`rope_tables` (shared across heads). ``n_heads`` must equal H
    (static, used to map the flattened batch*head grid back to table rows).
    """
    b, h, nq, d = q.shape
    assert h == n_heads
    nk = k.shape[2]
    assert nq % block_q == 0 and nk % block_k == 0, (nq, nk)
    sm_scale = 1.0 / math.sqrt(d)

    qf = q.reshape(b * h, nq, d)
    kf = k.reshape(b * h, nk, d)
    vf = v.reshape(b * h, nk, d)

    grid = (b * h, nq // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_rope_kernel, block_k=block_k,
                          sm_scale=sm_scale),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, d),
                             lambda i, j, _h=n_heads: (i // _h, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, d),
                             lambda i, j, _h=n_heads: (i // _h, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk, d),
                             lambda i, j, _h=n_heads: (i // _h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk, d),
                             lambda i, j, _h=n_heads: (i // _h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(qf, kf, vf, cos_q, sin_q, cos_k, sin_k)
    return out.reshape(b, h, nq, d)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(q, k, v, block_q: int = 128, block_k: int = 128):
    """``q (B, H, Nq, D)``, ``k/v (B, H, Nk, D)`` → ``(B, H, Nq, D)``.

    Nq must be a multiple of ``block_q`` and Nk of ``block_k`` (the SLAM
    token counts are multiples of 128 by construction: 512/16 * 384/16 = 768).
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    assert nq % block_q == 0 and nk % block_k == 0, (nq, nk)
    sm_scale = 1.0 / math.sqrt(d)

    qf = q.reshape(b * h, nq, d)
    kf = k.reshape(b * h, nk, d)
    vf = v.reshape(b * h, nk, d)

    grid = (b * h, nq // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, sm_scale=sm_scale),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, nq, d)


def attention_reference(q, k, v):
    """Plain XLA attention (used off-TPU and as the test oracle)."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (1.0 / math.sqrt(d))
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def supports_pallas() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
