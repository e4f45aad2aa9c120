"""Flash-attention kernel vs the plain XLA oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
from unittest import mock

from mast3r_slam_tpu.ops import flash_attention as FA

RNG = np.random.default_rng(17)


def _run_interpreted(q, k, v, **kw):
    """Force the pallas_call interpreter so the kernel logic runs on CPU."""
    with mock.patch("jax.experimental.pallas.pallas_call",
                    wraps=jax.experimental.pallas.pallas_call) as _:
        pass
    # jax provides a global interpret switch for TPU pallas:
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return FA.flash_attention(q, k, v, **kw)


def test_flash_matches_reference_f32():
    b, h, n, d = 2, 3, 256, 64
    q = jnp.asarray(RNG.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(RNG.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(RNG.normal(size=(b, h, n, d)), jnp.float32)
    want = FA.attention_reference(q, k, v)
    got = _run_interpreted(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_matches_reference_bf16():
    b, h, n, d = 1, 2, 128, 64
    q = jnp.asarray(RNG.normal(size=(b, h, n, d)), jnp.bfloat16)
    k = jnp.asarray(RNG.normal(size=(b, h, n, d)), jnp.bfloat16)
    v = jnp.asarray(RNG.normal(size=(b, h, n, d)), jnp.bfloat16)
    want = FA.attention_reference(q, k, v).astype(jnp.float32)
    got = _run_interpreted(q, k, v).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_flash_cross_attention_shapes():
    """Nq != Nk (decoder cross-attention)."""
    q = jnp.asarray(RNG.normal(size=(1, 2, 128, 64)), jnp.float32)
    k = jnp.asarray(RNG.normal(size=(1, 2, 384, 64)), jnp.float32)
    v = jnp.asarray(RNG.normal(size=(1, 2, 384, 64)), jnp.float32)
    want = FA.attention_reference(q, k, v)
    got = _run_interpreted(q, k, v)
    assert got.shape == (1, 2, 128, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_model_attention_dispatch_cpu_fallback():
    """On CPU the model uses the XLA path (identical numerics by definition)."""
    from mast3r_slam_tpu.models.mast3r import attention

    q = jnp.asarray(RNG.normal(size=(1, 2, 64, 32)), jnp.float32)
    out = attention(q, q, q)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(FA.attention_reference(q, q, q)),
        rtol=1e-6, atol=1e-6,
    )


def test_flash_single_block_config():
    """The small-batch single-block config (block_q=nq, block_k=nk): one grid
    step per head, whole-sequence softmax in VMEM — must match the reference
    exactly (single kv block => online softmax degenerates to plain softmax)."""
    b, h, n, d = 1, 2, 256, 64
    q = jnp.asarray(RNG.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(RNG.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(RNG.normal(size=(b, h, n, d)), jnp.float32)
    want = FA.attention_reference(q, k, v)
    got = _run_interpreted(q, k, v, block_q=n, block_k=n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_rope_matches_unfused():
    """In-kernel RoPE (rope_tables + _flash_rope_kernel) must equal applying
    rope_2d outside and running reference attention."""
    from mast3r_slam_tpu.models.mast3r import rope_2d, patch_positions

    b, h, n, d = 2, 2, 256, 64
    base = 100.0
    pos = patch_positions(16, 16, b)  # (b, 256, 2)
    q = jnp.asarray(RNG.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(RNG.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(RNG.normal(size=(b, h, n, d)), jnp.float32)
    want = FA.attention_reference(rope_2d(q, pos, base),
                                  rope_2d(k, pos, base), v)
    cos, sin = FA.rope_tables(pos, d, base)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = FA.flash_attention_rope(q, k, v, cos, sin, cos, sin, h)
        got_single = FA.flash_attention_rope(q, k, v, cos, sin, cos, sin, h,
                                             block_q=n, block_k=n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_single), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_rope_tables_match_rope_2d():
    """rope_tables quarters layout reproduces rope_2d exactly on raw tokens."""
    from mast3r_slam_tpu.models.mast3r import rope_2d, patch_positions

    b, h, n, d = 1, 3, 64, 32
    base = 100.0
    pos = patch_positions(8, 8, b)
    t = jnp.asarray(RNG.normal(size=(b, h, n, d)), jnp.float32)
    want = rope_2d(t, pos, base)
    cos, sin = FA.rope_tables(pos, d, base)
    got = FA._rope_rotate(t.reshape(b * h * n, d),
                          jnp.tile(cos[0], (h, 1)),
                          jnp.tile(sin[0], (h, 1))).reshape(b, h, n, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
