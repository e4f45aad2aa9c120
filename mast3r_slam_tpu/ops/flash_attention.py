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
