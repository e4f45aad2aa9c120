"""Checkpoint-converter tests: key naming, shape mapping, npz round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from mast3r_slam_tpu.models import mast3r as M
from mast3r_slam_tpu.models.convert import (
    convert_state_dict,
    load_params_npz,
    save_params_npz,
)

RNG = np.random.default_rng(23)


def synthetic_torch_state_dict(cfg: M.MASt3RConfig) -> dict:
    """Build a state dict with the reference checkpoint's key names/layouts."""
    sd = {}

    def lin(prefix, din, dout, bias=True):
        sd[f"{prefix}.weight"] = RNG.normal(size=(dout, din)).astype(np.float32)
        if bias:
            sd[f"{prefix}.bias"] = RNG.normal(size=dout).astype(np.float32)

    def conv(prefix, cin, cout, k, bias=True):
        sd[f"{prefix}.weight"] = RNG.normal(size=(cout, cin, k, k)).astype(
            np.float32)
        if bias:
            sd[f"{prefix}.bias"] = RNG.normal(size=cout).astype(np.float32)

    def convT(prefix, cin, cout, k):
        sd[f"{prefix}.weight"] = RNG.normal(size=(cin, cout, k, k)).astype(
            np.float32)
        sd[f"{prefix}.bias"] = RNG.normal(size=cout).astype(np.float32)

    def ln(prefix, d):
        sd[f"{prefix}.weight"] = np.ones(d, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(d, np.float32)

    e, d = cfg.enc_embed_dim, cfg.dec_embed_dim
    conv("patch_embed.proj", 3, e, cfg.patch_size)
    for i in range(cfg.enc_depth):
        p = f"enc_blocks.{i}"
        ln(f"{p}.norm1", e)
        lin(f"{p}.attn.qkv", e, 3 * e)
        lin(f"{p}.attn.proj", e, e)
        ln(f"{p}.norm2", e)
        lin(f"{p}.mlp.fc1", e, e * cfg.mlp_ratio)
        lin(f"{p}.mlp.fc2", e * cfg.mlp_ratio, e)
    ln("enc_norm", e)
    lin("decoder_embed", e, d)
    for blocks in ("dec_blocks", "dec_blocks2"):
        for i in range(cfg.dec_depth):
            p = f"{blocks}.{i}"
            ln(f"{p}.norm1", d)
            lin(f"{p}.attn.qkv", d, 3 * d)
            lin(f"{p}.attn.proj", d, d)
            ln(f"{p}.norm2", d)
            ln(f"{p}.norm_y", d)
            lin(f"{p}.cross_attn.projq", d, d)
            lin(f"{p}.cross_attn.projk", d, d)
            lin(f"{p}.cross_attn.projv", d, d)
            lin(f"{p}.cross_attn.proj", d, d)
            ln(f"{p}.norm3", d)
            lin(f"{p}.mlp.fc1", d, d * cfg.mlp_ratio)
            lin(f"{p}.mlp.fc2", d * cfg.mlp_ratio, d)
    ln("dec_norm", d)
    ld = cfg.dpt_layer_dims
    fd = cfg.dpt_feature_dim
    hooks = (e, d, d, d)
    for n in (1, 2):
        p = f"downstream_head{n}.dpt"
        conv(f"{p}.act_postprocess.0.0", hooks[0], ld[0], 1)
        convT(f"{p}.act_postprocess.0.1", ld[0], ld[0], 4)
        conv(f"{p}.act_postprocess.1.0", hooks[1], ld[1], 1)
        convT(f"{p}.act_postprocess.1.1", ld[1], ld[1], 2)
        conv(f"{p}.act_postprocess.2.0", hooks[2], ld[2], 1)
        conv(f"{p}.act_postprocess.3.0", hooks[3], ld[3], 1)
        conv(f"{p}.act_postprocess.3.1", ld[3], ld[3], 3)
        for i in range(4):
            conv(f"{p}.scratch.layer{i + 1}_rn", ld[i], fd, 3, bias=False)
        for i in range(1, 5):
            rp = f"{p}.scratch.refinenet{i}"
            conv(f"{rp}.resConfUnit1.conv1", fd, fd, 3)
            conv(f"{rp}.resConfUnit1.conv2", fd, fd, 3)
            conv(f"{rp}.resConfUnit2.conv1", fd, fd, 3)
            conv(f"{rp}.resConfUnit2.conv2", fd, fd, 3)
            conv(f"{rp}.out_conv", fd, fd, 1)
        conv(f"{p}.head.0", fd, fd // 2, 3)
        conv(f"{p}.head.2", fd // 2, cfg.dpt_last_dim, 3)
        conv(f"{p}.head.4", cfg.dpt_last_dim, 4, 1)
        idim = e + d
        out_feats = (cfg.desc_dim + 1) * cfg.patch_size ** 2
        lin(f"downstream_head{n}.head_local_features.fc1", idim, 4 * idim)
        lin(f"downstream_head{n}.head_local_features.fc2", 4 * idim, out_feats)
    return sd


def test_convert_matches_init_shapes():
    """Converted pytree is structurally identical to init_params' pytree."""
    cfg = M.tiny_config()
    sd = synthetic_torch_state_dict(cfg)
    converted = convert_state_dict(sd, cfg.enc_depth, cfg.dec_depth)
    reference = M.init_params(jax.random.PRNGKey(0), cfg)

    ref_shapes = jax.tree.map(lambda a: tuple(a.shape), reference)
    got_shapes = jax.tree.map(lambda a: tuple(a.shape), converted)
    assert jax.tree.structure(ref_shapes) == jax.tree.structure(got_shapes)
    mismatches = [
        (p, r, g) for (p, r), g in zip(
            jax.tree_util.tree_flatten_with_path(ref_shapes)[0],
            jax.tree.leaves(got_shapes),
        ) if r != g
    ]
    assert not mismatches, mismatches[:5]

    # the converted params must actually run through the model
    img = jnp.zeros((1, 32, 48, 3))
    converted = jax.tree.map(jnp.asarray, converted)
    feat, pos = M.encode_image(converted, cfg, img)
    res1, res2 = M.decode_heads(converted, cfg, feat, pos, feat, pos, (32, 48))
    assert res1["pts3d"].shape == (1, 32, 48, 3)
    assert np.isfinite(np.asarray(res1["conf"])).all()


def test_convert_shared_dec_blocks():
    """Checkpoints without dec_blocks2 duplicate dec_blocks (shared weights)."""
    cfg = M.tiny_config()
    sd = synthetic_torch_state_dict(cfg)
    sd = {k: v for k, v in sd.items() if not k.startswith("dec_blocks2")}
    converted = convert_state_dict(sd, cfg.enc_depth, cfg.dec_depth)
    np.testing.assert_array_equal(
        converted["dec_blocks"][0]["attn"]["qkv"]["w"],
        converted["dec_blocks2"][0]["attn"]["qkv"]["w"],
    )


def test_npz_roundtrip(tmp_path):
    cfg = M.tiny_config()
    params = M.init_params(jax.random.PRNGKey(1), cfg)
    path = tmp_path / "p.npz"
    save_params_npz(params, path)
    loaded = load_params_npz(path)
    for (pa, a), b in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree.leaves(loaded),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))
