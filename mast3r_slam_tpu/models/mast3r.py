"""MASt3R two-view 3D-reconstruction transformer, TPU-native JAX.

From-scratch implementation of the architecture used by the reference SLAM
system (reference: thirdparty/mast3r + dust3r + croco; see SURVEY.md §2.4):

- ViT-Large encoder: 16x16 patchify → 24 pre-LN blocks (dim 1024, 16 heads)
  with 2D rotary position embedding (RoPE, base 100) on q/k, final LN.
- Two cross-attention decoders (12 blocks each, dim 768, 12 heads): each block
  is self-attn → cross-attn to the *other* image's tokens → MLP; the two
  streams run interleaved, and all intermediate outputs feed the heads.
- Heads (per view): a DPT pyramid over decoder hooks [0, 6, 9, 12] producing
  pts3d+conf, plus an MLP over concat(enc, dec) tokens pixel-shuffled to
  per-pixel 24-dim descriptors + descriptor confidence.
- Postprocess: pts3d ``exp`` mode (unit direction * expm1(norm)), confidences
  ``1 + exp(x)``, descriptors L2-normalized.

Everything is a pure function over a parameter pytree; ``two_view_infer`` is
the jittable flagship entry point. RoPE replaces the reference's cuRoPE2D CUDA
kernel (thirdparty/.../curope) with a few fused elementwise ops.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from mast3r_slam_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class MASt3RConfig:
    # ViT-Large encoder / base decoder — the released MASt3R checkpoint config.
    patch_size: int = 16
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    mlp_ratio: int = 4
    rope_base: float = 100.0
    desc_dim: int = 24
    two_confs: bool = True
    # DPT head
    dpt_feature_dim: int = 256
    dpt_last_dim: int = 128
    dpt_layer_dims: tuple = (96, 192, 384, 768)
    # compute dtype for the transformer trunk
    dtype: str = "bfloat16"
    # compute dtype for the DPT + catMLP heads. The reference pins its heads
    # to f32 (mast3r_utils.py decoder(): autocast disabled); "bfloat16"
    # halves the heads' 551 GFLOP / 3.7 GB-traffic cost on the MXU.
    # Intermediate activations only — the final regression outputs and the
    # whole postprocess stay f32. Default f32 = strict reference numerics
    # (parity tests); production config opts into bf16 (config/base.yaml,
    # deviation quantified in tests/test_model.py).
    head_dtype: str = "float32"

    @property
    def dpt_hooks(self):
        d = self.dec_depth
        return (0, d * 2 // 4, d * 3 // 4, d)

    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def tiny_config(**kw) -> MASt3RConfig:
    """A small config for tests (same topology, tiny dims)."""
    defaults = dict(
        enc_embed_dim=64, enc_depth=2, enc_num_heads=2,
        dec_embed_dim=48, dec_depth=4, dec_num_heads=2,
        dpt_feature_dim=32, dpt_last_dim=16, dpt_layer_dims=(8, 12, 16, 24),
        desc_dim=8, dtype="float32",
    )
    defaults.update(kw)
    return MASt3RConfig(**defaults)


# ---------------------------------------------------------------------------
# RoPE 2D
# ---------------------------------------------------------------------------

def rope_2d(tokens, positions, base=100.0):
    """Apply 2D rotary embedding to per-head tokens.

    ``tokens (B, H, N, D)`` with D divisible by 4; ``positions (B, N, 2)``
    holding integer (y, x) patch coordinates. The first D/2 channels rotate by
    the y coordinate, the last D/2 by x; within each half, rotate-half pairing
    is between the first and second quarters (reference:
    croco/models/pos_embed.py:112-159).
    """
    b, h, n, d = tokens.shape
    half = d // 2
    quarter = half // 2
    inv_freq = 1.0 / (base ** (jnp.arange(0, quarter, dtype=jnp.float32) * 2.0 / half))

    def one_axis(tok, pos1d):
        # tok (B, H, N, half); pos1d (B, N)
        freqs = pos1d[:, None, :, None].astype(jnp.float32) * inv_freq  # (B,1,N,q)
        cos = jnp.cos(freqs).astype(tok.dtype)
        sin = jnp.sin(freqs).astype(tok.dtype)
        cos2 = jnp.concatenate([cos, cos], axis=-1)
        sin2 = jnp.concatenate([sin, sin], axis=-1)
        t1 = tok[..., :quarter]
        t2 = tok[..., quarter:]
        rot = jnp.concatenate([-t2, t1], axis=-1)
        return tok * cos2 + rot * sin2

    ty = one_axis(tokens[..., :half], positions[..., 0])
    tx = one_axis(tokens[..., half:], positions[..., 1])
    return jnp.concatenate([ty, tx], axis=-1)


# ---------------------------------------------------------------------------
# Attention blocks
# ---------------------------------------------------------------------------

def _split_heads(x, n_heads):
    b, n, d = x.shape
    return x.reshape(b, n, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, n, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * dh)


def attention(q, k, v):
    """Attention dispatch: Pallas flash kernel on TPU for BATCHED decodes
    (backend keyframe pairs), plain XLA softmax attention otherwise.

    Measured on v5e at 768 tokens: flash is 5x faster standalone at b*h=32,
    but at the tracker's b=1 the 128-blocked flash grid (b·h × nq/128 tiny
    sequential steps) loses to per-step overhead — XLA attention won there
    until round 5. The small-batch regime now takes a SINGLE-BLOCK variant
    (block_q=nq, block_k=nk → one grid step per head, the whole 768-token
    softmax in VMEM, exact math): it removes the f32 logits HBM round-trip
    that made the XLA path bandwidth-bound (~6.7 ms/frame of materialized
    (bh, 768, 768) logits traffic) while amortizing kernel overhead over one
    big step per head. The b*h >= 32 regime keeps the measured-good 128-block
    config. VMEM bound for the single-block path: s (nq, nk) f32 must fit,
    so it is gated at nq*nk <= 1024*1024 (SLAM shapes are 768x768)."""
    from mast3r_slam_tpu.ops import flash_attention as FA

    b, h, nq, _ = q.shape
    nk = k.shape[2]
    if not (FA.supports_pallas() and nq % 128 == 0 and nk % 128 == 0):
        return FA.attention_reference(q, k, v)
    if b * h >= _flash_min_bh():
        return FA.flash_attention(q, k, v)
    if _flash_single_block() and nq * nk <= 1024 * 1024:
        return FA.flash_attention(q, k, v, block_q=nq, block_k=nk)
    return FA.attention_reference(q, k, v)


def attention_rope(q, k, v, qpos, kpos, rope_base):
    """RoPE + attention, fused when the Pallas path is taken.

    ``q/k/v (B, H, N, D)`` UN-rotated; ``qpos/kpos (B, N, 2)``. On the
    kernel paths the rotation happens in VMEM against shared cos/sin tables
    (one table set per resolution, CSE'd across the frame program) —
    removing ~2 ms/frame of un-fusable rotated-q/k HBM materialization
    (round-5 trace). The XLA fallback applies :func:`rope_2d` as before and
    lets XLA fuse it into the attention einsums."""
    from mast3r_slam_tpu.ops import flash_attention as FA

    b, h, nq, d = q.shape
    nk = k.shape[2]
    kernel_ok = FA.supports_pallas() and nq % 128 == 0 and nk % 128 == 0
    if kernel_ok and (b * h >= _flash_min_bh()
                      or (_flash_single_block()
                          and nq * nk <= 1024 * 1024)):
        cos_q, sin_q = FA.rope_tables(qpos, d, rope_base)
        if kpos is qpos:
            cos_k, sin_k = cos_q, sin_q
        else:
            cos_k, sin_k = FA.rope_tables(kpos, d, rope_base)
        if b * h >= _flash_min_bh():
            bq, bk = 128, 128
        else:
            bq, bk = nq, nk
        return FA.flash_attention_rope(q, k, v, cos_q, sin_q, cos_k, sin_k,
                                       h, block_q=bq, block_k=bk)
    q = rope_2d(q, qpos, rope_base)
    k = rope_2d(k, kpos, rope_base)
    return FA.attention_reference(q, k, v)


def _flash_min_bh():
    """Flash-attention crossover gate (b*h), env-overridable for A/Bs."""
    import os

    return int(os.environ.get("MAST3R_TPU_FLASH_MIN_BH", "32"))


def _flash_single_block():
    """Single-block flash path for the small-batch regime (A/B toggle)."""
    import os

    return os.environ.get("MAST3R_TPU_FLASH_SINGLE", "1") == "1"


def self_attn(p, x, pos, n_heads, rope_base):
    qkv = L.linear(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = _split_heads(q, n_heads)
    k = _split_heads(k, n_heads)
    v = _split_heads(v, n_heads)
    out = _merge_heads(attention_rope(q, k, v, pos, pos, rope_base))
    return L.linear(p["proj"], out)


def cross_attn(p, x, mem, xpos, mpos, n_heads, rope_base):
    q = _split_heads(L.linear(p["q"], x), n_heads)
    k = _split_heads(L.linear(p["k"], mem), n_heads)
    v = _split_heads(L.linear(p["v"], mem), n_heads)
    out = _merge_heads(attention_rope(q, k, v, xpos, mpos, rope_base))
    return L.linear(p["proj"], out)


def encoder_block(p, x, pos, n_heads, rope_base):
    x = x + self_attn(p["attn"], L.layernorm(p["norm1"], x), pos, n_heads, rope_base)
    x = x + L.mlp(p["mlp"], L.layernorm(p["norm2"], x))
    return x


# ---------------------------------------------------------------------------
# Stacked dual-decoder: both streams as one batched chain
# ---------------------------------------------------------------------------
# The dual decoder applies TWO weight sets (dec_blocks / dec_blocks2) to two
# token streams that swap roles as cross-attention memory. Running them as
# two b-sized chains leaves the MXU half-fed at the tracker's b=1; stacking
# the streams into a (2, b, n, c) chain with (2, ...) weight leaves turns
# every pair of matmuls into ONE batched contraction and halves the op count
# of the decode. Per-stream math is untouched (batched matmuls are
# independent per batch entry), so results match the sequential path
# bit-for-bit — pinned by tests/test_model.py.

def _linear_s(p, x):
    """Per-stream linear: ``x (2, B, N, C)``, ``w (2, C, D)``.

    Unrolled into two flat matmuls rather than one batched einsum
    ("sbnc,scd->sbnd"): XLA's batched matmul ran the decoder's linears at
    ~28% MXU (3.1 ms/frame, round-5 trace) while the identical flat matmuls
    reach the plain-linear efficiency. Bit-identical — batch entries of a
    batched matmul are independent."""
    w = p["w"].astype(x.dtype)
    y = jnp.stack([x[0] @ w[0], x[1] @ w[1]])
    if "b" in p:
        y = y + p["b"][:, None, None, :].astype(x.dtype)
    return y


def _layernorm_s(p, x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * p["g"][:, None, None, :] + p["b"][:, None, None, :]
    return y.astype(x.dtype)


def _mlp_s(p, x):
    return _linear_s(p["fc2"], L.gelu(_linear_s(p["fc1"], x)))


def _heads_s(x, n_heads):
    """(2, B, N, D) → (2B, H, N, Dh) head layout (un-rotated)."""
    s, b, n, d = x.shape
    return _split_heads(x.reshape(s * b, n, d), n_heads)


def self_attn_s(p, x, pos, n_heads, rope_base):
    s, b, n, d = x.shape
    qkv = _linear_s(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = _heads_s(q, n_heads)
    k = _heads_s(k, n_heads)
    v = _heads_s(v, n_heads)
    pos_f = pos.reshape(s * b, n, 2)
    out = _merge_heads(
        attention_rope(q, k, v, pos_f, pos_f, rope_base)).reshape(s, b, n, d)
    return _linear_s(p["proj"], out)


def cross_attn_s(p, x, mem, xpos, mpos, n_heads, rope_base):
    s, b, n, d = x.shape
    q = _heads_s(_linear_s(p["q"], x), n_heads)
    k = _heads_s(_linear_s(p["k"], mem), n_heads)
    v = _heads_s(_linear_s(p["v"], mem), n_heads)
    out = _merge_heads(
        attention_rope(q, k, v, xpos.reshape(s * b, n, 2),
                       mpos.reshape(s * b, n, 2), rope_base)
    ).reshape(s, b, n, d)
    return _linear_s(p["proj"], out)


def decoder_block_s(p, x, mem, xpos, mpos, n_heads, rope_base):
    x = x + self_attn_s(p["attn"], _layernorm_s(p["norm1"], x), xpos,
                        n_heads, rope_base)
    mem_n = _layernorm_s(p["norm_y"], mem)
    x = x + cross_attn_s(p["cross"], _layernorm_s(p["norm2"], x), mem_n,
                         xpos, mpos, n_heads, rope_base)
    x = x + _mlp_s(p["mlp"], _layernorm_s(p["norm3"], x))
    return x


def stack_decoder_params(params):
    """Stack ``dec_blocks[i]`` + ``dec_blocks2[i]`` leaves into (2, ...) —
    done ONCE at load time (``prepare_params``): stacking per call would
    copy the ~450 MB of decoder weights every frame."""
    return [
        jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), b1, b2)
        for b1, b2 in zip(params["dec_blocks"], params["dec_blocks2"])
    ]


def prepare_params(params, cfg: MASt3RConfig):
    """Load-time parameter prep: compute-dtype weight cast + stacked
    dual-decoder views. Returns a NEW dict; the original stays
    checkpoint-shaped. ``dec_stacked`` routes :func:`decode_pair` to the
    batched two-stream chain; the per-stream ``dec_blocks``/``dec_blocks2``
    subtrees are DROPPED from the prepared dict (keeping both would hold
    ~450 MB of duplicate decoder weights in HBM). Heads are NOT stacked —
    see the A/B note below."""
    p = cast_params_for_compute(params, cfg)
    p["dec_stacked"] = stack_decoder_params(p)
    del p["dec_blocks"], p["dec_blocks2"]
    # NOTE round-5 A/B: stacking head1/head2 the same way and vmapping the
    # DPT+catMLP pass REGRESSED (device 34.4 → 44.1 ms/frame): XLA lowers
    # the batched-weight convs to batch_group_count=2 grouped convs whose
    # output layout forces a materialized transpose on every bias add
    # (10.4 ms of copies). The heads stay per-head sequential.
    return p


def head_params(params, which):
    """Per-head parameter tree. ``which``: 0 = head1 (view-1 / self),
    1 = head2. Only the mono-inference INIT/RELOC path uses this — the
    per-frame paths go through :func:`downstream_heads`."""
    return params["head1" if which == 0 else "head2"]


def decoder_block(p, x, mem, xpos, mpos, n_heads, rope_base):
    x = x + self_attn(p["attn"], L.layernorm(p["norm1"], x), xpos, n_heads, rope_base)
    mem_n = L.layernorm(p["norm_y"], mem)
    x = x + cross_attn(
        p["cross"], L.layernorm(p["norm2"], x), mem_n, xpos, mpos, n_heads, rope_base
    )
    x = x + L.mlp(p["mlp"], L.layernorm(p["norm3"], x))
    return x


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def _init_attn(key, dim):
    k1, k2 = jax.random.split(key)
    return {"qkv": L.init_linear(k1, dim, 3 * dim), "proj": L.init_linear(k2, dim, dim)}


def _init_cross(key, dim):
    ks = jax.random.split(key, 4)
    return {
        "q": L.init_linear(ks[0], dim, dim),
        "k": L.init_linear(ks[1], dim, dim),
        "v": L.init_linear(ks[2], dim, dim),
        "proj": L.init_linear(ks[3], dim, dim),
    }


def _init_mlp(key, dim, hidden):
    k1, k2 = jax.random.split(key)
    return {"fc1": L.init_linear(k1, dim, hidden), "fc2": L.init_linear(k2, hidden, dim)}


def _init_enc_block(key, dim, mlp_ratio):
    k1, k2 = jax.random.split(key)
    return {
        "norm1": L.init_layernorm(dim),
        "attn": _init_attn(k1, dim),
        "norm2": L.init_layernorm(dim),
        "mlp": _init_mlp(k2, dim, dim * mlp_ratio),
    }


def _init_dec_block(key, dim, mlp_ratio):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "norm1": L.init_layernorm(dim),
        "attn": _init_attn(k1, dim),
        "norm2": L.init_layernorm(dim),
        "norm_y": L.init_layernorm(dim),
        "cross": _init_cross(k2, dim),
        "norm3": L.init_layernorm(dim),
        "mlp": _init_mlp(k3, dim, dim * mlp_ratio),
    }


def _init_dpt(key, cfg: MASt3RConfig, num_channels: int):
    """DPT pyramid params (hook adapters + fusion + regression head)."""
    ks = iter(jax.random.split(key, 40))
    ld = cfg.dpt_layer_dims
    fd = cfg.dpt_feature_dim
    hook_dims = (cfg.enc_embed_dim,) + (cfg.dec_embed_dim,) * 3
    p = {}
    # act_postprocess: per-hook projection (+ resize conv)
    p["act0_conv"] = L.init_conv(next(ks), 1, 1, hook_dims[0], ld[0])
    p["act0_up"] = L.init_conv(next(ks), 4, 4, ld[0], ld[0])  # convT k4 s4
    p["act1_conv"] = L.init_conv(next(ks), 1, 1, hook_dims[1], ld[1])
    p["act1_up"] = L.init_conv(next(ks), 2, 2, ld[1], ld[1])  # convT k2 s2
    p["act2_conv"] = L.init_conv(next(ks), 1, 1, hook_dims[2], ld[2])
    p["act3_conv"] = L.init_conv(next(ks), 1, 1, hook_dims[3], ld[3])
    p["act3_down"] = L.init_conv(next(ks), 3, 3, ld[3], ld[3])  # conv s2
    # layer_rn: 3x3 no-bias projections to feature_dim
    for i in range(4):
        p[f"rn{i}"] = L.init_conv(next(ks), 3, 3, ld[i], fd, bias=False)
    # refinenets 1..4, each: rcu1 (2 convs), rcu2 (2 convs), out_conv 1x1
    for i in range(1, 5):
        p[f"ref{i}"] = {
            "rcu1_c1": L.init_conv(next(ks), 3, 3, fd, fd),
            "rcu1_c2": L.init_conv(next(ks), 3, 3, fd, fd),
            "rcu2_c1": L.init_conv(next(ks), 3, 3, fd, fd),
            "rcu2_c2": L.init_conv(next(ks), 3, 3, fd, fd),
            "out": L.init_conv(next(ks), 1, 1, fd, fd),
        }
    # regression head: conv3 → (x2 bilinear) → conv3 → relu → conv1
    p["head_c1"] = L.init_conv(next(ks), 3, 3, fd, fd // 2)
    p["head_c2"] = L.init_conv(next(ks), 3, 3, fd // 2, cfg.dpt_last_dim)
    p["head_c3"] = L.init_conv(next(ks), 1, 1, cfg.dpt_last_dim, num_channels)
    # Random-init runs only (real weights come from models/convert.py):
    # damp the regression output so postprocess()'s expm1(|xyz|) yields
    # O(1) pointmaps instead of exploding (a unit-variance final conv puts
    # |xyz| at ~5-20, i.e. pts3d up to ~1e8, which overflows the Sim(3)
    # tracking solve in f32 and sends every smoke/dryrun frame to RELOC).
    # Bounded-but-varying geometry keeps the initial GN system full-rank
    # for ANY seed.
    p["head_c3"]["w"] = p["head_c3"]["w"] * 0.05
    return p


def init_params(key, cfg: MASt3RConfig):
    """Random-init full parameter pytree (shapes match the converted checkpoint)."""
    ks = iter(jax.random.split(key, 16))
    params = {
        "patch_embed": L.init_conv(
            next(ks), cfg.patch_size, cfg.patch_size, 3, cfg.enc_embed_dim
        ),
        "enc_blocks": [
            _init_enc_block(k, cfg.enc_embed_dim, cfg.mlp_ratio)
            for k in jax.random.split(next(ks), cfg.enc_depth)
        ],
        "enc_norm": L.init_layernorm(cfg.enc_embed_dim),
        "decoder_embed": L.init_linear(next(ks), cfg.enc_embed_dim, cfg.dec_embed_dim),
        "dec_blocks": [
            _init_dec_block(k, cfg.dec_embed_dim, cfg.mlp_ratio)
            for k in jax.random.split(next(ks), cfg.dec_depth)
        ],
        "dec_blocks2": [
            _init_dec_block(k, cfg.dec_embed_dim, cfg.mlp_ratio)
            for k in jax.random.split(next(ks), cfg.dec_depth)
        ],
        "dec_norm": L.init_layernorm(cfg.dec_embed_dim),
    }
    idim = cfg.enc_embed_dim + cfg.dec_embed_dim
    out_feats = (cfg.desc_dim + int(cfg.two_confs)) * cfg.patch_size**2
    for h in ("head1", "head2"):
        params[h] = {
            "dpt": _init_dpt(next(ks), cfg, num_channels=4),
            "local_feat": _init_mlp(next(ks), idim, 4 * idim),
        }
        # local-features MLP output layer has a distinct out dim
        k_out = next(ks)
        params[h]["local_feat"]["fc2"] = L.init_linear(k_out, 4 * idim, out_feats)
        # same random-init damping as _init_dpt's head_c3: desc_conf is
        # exp(x), so an O(10) random logit means Q weights of ~1e4..1e17
        # that overflow the f32 tracking/matching solves in smoke runs
        params[h]["local_feat"]["fc2"]["w"] = (
            params[h]["local_feat"]["fc2"]["w"] * 0.05)
    return params


def cast_params_for_compute(params, cfg: MASt3RConfig):
    """Pre-cast matmul/conv weights to their compute dtype ONCE at load time.

    ``L.linear``/``L.conv2d`` cast weights to the activation dtype at every
    use anyway, so this is numerically IDENTICAL — but with f32 storage XLA
    re-reads double the bytes from HBM on every frame (~2.6 GB of weight
    traffic for a ViT-L forward; the convert is fused into the matmul but
    the read is not halved). LayerNorm scales/biases stay f32 (they
    participate in f32 math inside ``L.layernorm``), the trunk follows
    ``cfg.dtype``, and the heads follow ``cfg.head_dtype`` (eval configs pin
    f32 heads → no-op there). Pinned by tests/test_model.py.
    """
    trunk_dt = cfg.compute_dtype()
    head_dt = jnp.dtype(cfg.head_dtype)

    def cast_tree(tree, dt):
        return jax.tree_util.tree_map(lambda a: a.astype(dt), tree)

    def cast_block(blk, dt):
        out = dict(blk)
        for k in ("attn", "cross", "mlp"):
            if k in out:
                out[k] = cast_tree(out[k], dt)
        return out

    p = dict(params)
    if trunk_dt != jnp.float32:
        p["patch_embed"] = cast_tree(p["patch_embed"], trunk_dt)
        p["decoder_embed"] = cast_tree(p["decoder_embed"], trunk_dt)
        p["enc_blocks"] = [cast_block(b, trunk_dt) for b in p["enc_blocks"]]
        p["dec_blocks"] = [cast_block(b, trunk_dt) for b in p["dec_blocks"]]
        p["dec_blocks2"] = [cast_block(b, trunk_dt) for b in p["dec_blocks2"]]
    if head_dt != jnp.float32:
        for h in ("head1", "head2"):
            if h in p:
                p[h] = cast_tree(p[h], head_dt)
    return p


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------

def patch_positions(hp, wp, batch):
    """Integer (y, x) coordinates for an hp x wp patch grid → (B, N, 2)."""
    y = jnp.arange(hp, dtype=jnp.int32)
    x = jnp.arange(wp, dtype=jnp.int32)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    pos = jnp.stack([yy, xx], axis=-1).reshape(1, hp * wp, 2)
    return jnp.broadcast_to(pos, (batch, hp * wp, 2))


def encode_image(params, cfg: MASt3RConfig, img):
    """Encode ``img (B, H, W, 3)`` (ImgNorm'd to [-1, 1]) → (feat (B,N,C), pos).

    Equivalent of the reference ``model._encode_image`` (dust3r/model.py:127-139).
    """
    dt = cfg.compute_dtype()
    b, h, w, _ = img.shape
    x = L.conv2d(params["patch_embed"], img.astype(dt), stride=cfg.patch_size,
                 padding="VALID")
    hp, wp = h // cfg.patch_size, w // cfg.patch_size
    x = x.reshape(b, hp * wp, cfg.enc_embed_dim)
    pos = patch_positions(hp, wp, b)
    for blk in params["enc_blocks"]:
        x = encoder_block(blk, x, pos, cfg.enc_num_heads, cfg.rope_base)
    x = L.layernorm(params["enc_norm"], x)
    return x.astype(jnp.float32), pos


def decode_pair(params, cfg: MASt3RConfig, feat1, pos1, feat2, pos2):
    """Run the interleaved dual-decoder; returns per-stream hook activations.

    Output: two lists of ``len(dpt_hooks)`` token tensors (f32) — entry 0 is
    the encoder output, later entries are decoder blocks at the hook depths,
    with the final entry LayerNorm'd (reference dust3r/model.py:171-190).
    """
    dt = cfg.compute_dtype()
    hooks = set(cfg.dpt_hooks)
    f1 = L.linear(params["decoder_embed"], feat1.astype(dt))
    f2 = L.linear(params["decoder_embed"], feat2.astype(dt))
    out1 = [feat1]
    out2 = [feat2]
    depth = cfg.dec_depth

    stacked = params.get("dec_stacked")
    if stacked is not None:
        # both streams as ONE batched chain over the (2, ...) weight stack —
        # bit-identical to the sequential loop below (see decoder_block_s)
        x = jnp.stack([f1, f2])                       # (2, B, N, C)
        xpos = jnp.stack([pos1, pos2])
        mpos = jnp.stack([pos2, pos1])
        for i, blk in enumerate(stacked):
            x = decoder_block_s(blk, x, x[::-1], xpos, mpos,
                                cfg.dec_num_heads, cfg.rope_base)
            if (i + 1) in hooks or (i + 1) == depth:
                if (i + 1) == depth:
                    xn = _layernorm_s(
                        {"g": jnp.stack([params["dec_norm"]["g"]] * 2),
                         "b": jnp.stack([params["dec_norm"]["b"]] * 2)},
                        x).astype(jnp.float32)
                    out1.append(xn[0])
                    out2.append(xn[1])
                else:
                    out1.append(x[0].astype(jnp.float32))
                    out2.append(x[1].astype(jnp.float32))
        return out1, out2

    for i, (b1, b2) in enumerate(zip(params["dec_blocks"], params["dec_blocks2"])):
        f1n = decoder_block(b1, f1, f2, pos1, pos2, cfg.dec_num_heads, cfg.rope_base)
        f2n = decoder_block(b2, f2, f1, pos2, pos1, cfg.dec_num_heads, cfg.rope_base)
        f1, f2 = f1n, f2n
        if (i + 1) in hooks or (i + 1) == depth:
            if (i + 1) == depth:
                out1.append(L.layernorm(params["dec_norm"], f1).astype(jnp.float32))
                out2.append(L.layernorm(params["dec_norm"], f2).astype(jnp.float32))
            else:
                out1.append(f1.astype(jnp.float32))
                out2.append(f2.astype(jnp.float32))
    return out1, out2


def _residual_conv_unit(p1, p2, x):
    y = L.conv2d(p1, jax.nn.relu(x))
    y = L.conv2d(p2, jax.nn.relu(y))
    return x + y


def _fusion_block(p, x, skip=None):
    if skip is not None:
        x = x + _residual_conv_unit(p["rcu1_c1"], p["rcu1_c2"], skip)
    x = _residual_conv_unit(p["rcu2_c1"], p["rcu2_c2"], x)
    b, h, w, c = x.shape
    x = L.interpolate_bilinear(x, (2 * h, 2 * w), align_corners=True)
    return L.conv2d(p["out"], x)


def dpt_head(p, hook_feats, img_hw, patch_size):
    """DPT multi-scale fusion over the 4 hook activations → (B, H, W, 4)."""
    H, W = img_hw
    nh, nw = H // patch_size, W // patch_size
    t0, t1, t2, t3 = [
        t.reshape(t.shape[0], nh, nw, t.shape[-1]) for t in hook_feats
    ]
    l0 = L.conv2d_transpose(p["act0_up"], L.conv2d(p["act0_conv"], t0), 4)
    l1 = L.conv2d_transpose(p["act1_up"], L.conv2d(p["act1_conv"], t1), 2)
    l2 = L.conv2d(p["act2_conv"], t2)
    # stride-2 k3 needs explicit (1, 1) padding to match torch (SAME would pad
    # asymmetrically at even sizes and shift the result)
    l3 = L.conv2d(
        p["act3_down"], L.conv2d(p["act3_conv"], t3), stride=2, padding=[(1, 1), (1, 1)]
    )
    l0 = L.conv2d(p["rn0"], l0)
    l1 = L.conv2d(p["rn1"], l1)
    l2 = L.conv2d(p["rn2"], l2)
    l3 = L.conv2d(p["rn3"], l3)
    path4 = _fusion_block(p["ref4"], l3)[:, : l2.shape[1], : l2.shape[2]]
    path3 = _fusion_block(p["ref3"], path4, l2)
    path2 = _fusion_block(p["ref2"], path3, l1)
    path1 = _fusion_block(p["ref1"], path2, l0)
    x = L.conv2d(p["head_c1"], path1)
    b, h, w, c = x.shape
    x = L.interpolate_bilinear(x, (2 * h, 2 * w), align_corners=True)
    x = jax.nn.relu(L.conv2d(p["head_c2"], x))
    return L.conv2d(p["head_c3"], x)


def downstream_head(p, cfg: MASt3RConfig, dec_out, img_hw):
    """Full per-view head: DPT pts3d+conf, MLP descriptors, postprocess.

    ``dec_out``: hook activations from :func:`decode_pair` (f32).
    Returns dict with ``pts3d (B,H,W,3)``, ``conf (B,H,W)``, ``desc (B,H,W,D)``,
    ``desc_conf (B,H,W)``.
    """
    H, W = img_hw
    ps = cfg.patch_size
    hd = jnp.dtype(cfg.head_dtype)
    dec_h = [t.astype(hd) for t in dec_out]
    raw = dpt_head(p["dpt"], dec_h, img_hw, ps).astype(jnp.float32)

    cat = jnp.concatenate([dec_h[0], dec_h[-1]], axis=-1)
    local = L.mlp(p["local_feat"], cat)  # (B, N, (D+1)*ps²), head dtype
    b, n, _ = local.shape
    local = local.reshape(b, H // ps, W // ps, -1)
    # shuffle in the head dtype, cast after: the cast commutes exactly with
    # reshape/transpose, and the full-res (B, H, W, 25) transpose copy is the
    # head's hottest non-MXU op — half traffic in bf16 mode (bit-identical)
    local = L.pixel_shuffle(local, ps).astype(jnp.float32)

    out = jnp.concatenate([raw, local], axis=-1)
    return postprocess(out, cfg.desc_dim, cfg.two_confs)


def postprocess(fmap, desc_dim, two_confs):
    """Regression-head activations (reference dust3r heads/postprocess.py:22-58,
    mast3r/catmlp_dpt_head.py:17-39): exp-mode depth, conf = 1+exp
    (conf_mode=('exp',1,inf)), desc_conf = exp (the released metric
    checkpoint's desc_conf_mode=('exp',0,inf)), L2-normalized descriptors.
    Pinned end-to-end by tests/test_full_forward_parity.py."""
    xyz = fmap[..., 0:3]
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    pts3d = xyz / jnp.clip(d, 1e-8) * jnp.expm1(d)
    conf = 1.0 + jnp.exp(jnp.clip(fmap[..., 3], -50.0, 50.0))
    desc = fmap[..., 4 : 4 + desc_dim]
    desc = desc / jnp.clip(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    if two_confs:
        desc_conf = jnp.exp(jnp.clip(fmap[..., 4 + desc_dim], -50.0, 50.0))
    else:
        desc_conf = conf
    return {"pts3d": pts3d, "conf": conf, "desc": desc, "desc_conf": desc_conf}


def downstream_heads(params, cfg: MASt3RConfig, d1, d2, img_hw):
    """Both per-view heads for a decoded pair → (res1, res2).

    Kept sequential on purpose: a vmapped stacked-weight variant was A/B'd
    in round 5 and lost (see prepare_params) — XLA's grouped-conv lowering
    costs more in layout copies than the 2x-batched MXU work saves."""
    return (downstream_head(params["head1"], cfg, d1, img_hw),
            downstream_head(params["head2"], cfg, d2, img_hw))


# ---------------------------------------------------------------------------
# Two-view inference APIs (functional equivalents of mast3r_utils.py wrappers)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "img_hw"))
def decode_heads(params, cfg: MASt3RConfig, feat1, pos1, feat2, pos2, img_hw):
    """Decoder + both heads for an (i, j) feature pair → (res1, res2)."""
    d1, d2 = decode_pair(params, cfg, feat1, pos1, feat2, pos2)
    return downstream_heads(params, cfg, d1, d2, img_hw)


@partial(jax.jit, static_argnames=("cfg",))
def encode(params, cfg: MASt3RConfig, img):
    return encode_image(params, cfg, img)


def two_view_infer(params, cfg: MASt3RConfig, img1, img2):
    """Flagship convenience entry: encode both images + one decode pass.

    Returns (res1, res2) in view 1's frame — the asymmetric inference used by
    frame-to-keyframe tracking.
    """
    feat1, pos1 = encode(params, cfg, img1)
    feat2, pos2 = encode(params, cfg, img2)
    img_hw = (img1.shape[1], img1.shape[2])
    return decode_heads(params, cfg, feat1, pos1, feat2, pos2, img_hw)
