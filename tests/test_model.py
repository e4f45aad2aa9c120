"""Model structure tests at a tiny config: shapes, finiteness, head invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.models import mast3r as M

CFG = M.tiny_config()
H, W = 64, 96  # 4x6 patches


def _params():
    return M.init_params(jax.random.PRNGKey(0), CFG)


def test_encode_shapes():
    params = _params()
    img = jnp.zeros((1, H, W, 3))
    feat, pos = M.encode_image(params, CFG, img)
    n = (H // 16) * (W // 16)
    assert feat.shape == (1, n, CFG.enc_embed_dim)
    assert pos.shape == (1, n, 2)
    # positions are (y, x) in row-major order
    np.testing.assert_array_equal(np.asarray(pos[0, 0]), [0, 0])
    np.testing.assert_array_equal(np.asarray(pos[0, 1]), [0, 1])
    np.testing.assert_array_equal(np.asarray(pos[0, W // 16]), [1, 0])


def test_two_view_infer_outputs():
    params = _params()
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32) * 0.2)
    img2 = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32) * 0.2)
    res1, res2 = M.two_view_infer(params, CFG, img1, img2)
    for res in (res1, res2):
        assert res["pts3d"].shape == (1, H, W, 3)
        assert res["conf"].shape == (1, H, W)
        assert res["desc"].shape == (1, H, W, CFG.desc_dim)
        assert res["desc_conf"].shape == (1, H, W)
        assert bool(jnp.all(jnp.isfinite(res["pts3d"])))
        # conf is 1 + exp(x) > 1; desc_conf is exp(x) > 0 (the metric
        # checkpoint's desc_conf_mode=('exp', 0, inf))
        assert float(jnp.min(res["conf"])) >= 1.0
        assert float(jnp.min(res["desc_conf"])) > 0.0
        # descriptors are unit-normalized
        norms = jnp.linalg.norm(res["desc"], axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-3)


def test_asymmetry_of_decoders():
    """Swapping the image order must produce different (view-dependent) outputs."""
    params = _params()
    rng = np.random.default_rng(1)
    img1 = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32) * 0.2)
    img2 = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32) * 0.2)
    res1, _ = M.two_view_infer(params, CFG, img1, img2)
    res1_swap, _ = M.two_view_infer(params, CFG, img2, img1)
    assert not np.allclose(
        np.asarray(res1["pts3d"]), np.asarray(res1_swap["pts3d"]), atol=1e-4
    )


def test_convert_roundtrip_shapes():
    """A synthetic torch-layout state dict converts onto the init pytree exactly."""
    from mast3r_slam_tpu.models.convert import convert_state_dict

    params = _params()

    # Build a fake torch state dict with the right shapes from our own pytree.
    sd = {}

    def put_lin(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["w"]).T
        if "b" in p:
            sd[prefix + ".bias"] = np.asarray(p["b"])

    def put_conv(prefix, p):
        sd[prefix + ".weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
        if "b" in p:
            sd[prefix + ".bias"] = np.asarray(p["b"])

    def put_convT(prefix, p):
        sd[prefix + ".weight"] = np.transpose(np.asarray(p["w"]), (2, 3, 0, 1))
        if "b" in p:
            sd[prefix + ".bias"] = np.asarray(p["b"])

    def put_ln(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["g"])
        sd[prefix + ".bias"] = np.asarray(p["b"])

    put_conv("patch_embed.proj", params["patch_embed"])
    put_ln("enc_norm", params["enc_norm"])
    put_ln("dec_norm", params["dec_norm"])
    put_lin("decoder_embed", params["decoder_embed"])
    for i, blk in enumerate(params["enc_blocks"]):
        pre = f"enc_blocks.{i}"
        put_ln(pre + ".norm1", blk["norm1"])
        put_ln(pre + ".norm2", blk["norm2"])
        put_lin(pre + ".attn.qkv", blk["attn"]["qkv"])
        put_lin(pre + ".attn.proj", blk["attn"]["proj"])
        put_lin(pre + ".mlp.fc1", blk["mlp"]["fc1"])
        put_lin(pre + ".mlp.fc2", blk["mlp"]["fc2"])
    for name in ("dec_blocks", "dec_blocks2"):
        for i, blk in enumerate(params[name]):
            pre = f"{name}.{i}"
            for ln in ("norm1", "norm2", "norm3", "norm_y"):
                put_ln(pre + "." + ln, blk[ln])
            put_lin(pre + ".attn.qkv", blk["attn"]["qkv"])
            put_lin(pre + ".attn.proj", blk["attn"]["proj"])
            put_lin(pre + ".cross_attn.projq", blk["cross"]["q"])
            put_lin(pre + ".cross_attn.projk", blk["cross"]["k"])
            put_lin(pre + ".cross_attn.projv", blk["cross"]["v"])
            put_lin(pre + ".cross_attn.proj", blk["cross"]["proj"])
            put_lin(pre + ".mlp.fc1", blk["mlp"]["fc1"])
            put_lin(pre + ".mlp.fc2", blk["mlp"]["fc2"])
    for n in (1, 2):
        hp = params[f"head{n}"]
        pre = f"downstream_head{n}"
        put_lin(pre + ".head_local_features.fc1", hp["local_feat"]["fc1"])
        put_lin(pre + ".head_local_features.fc2", hp["local_feat"]["fc2"])
        d = hp["dpt"]
        put_conv(pre + ".dpt.act_postprocess.0.0", d["act0_conv"])
        put_convT(pre + ".dpt.act_postprocess.0.1", d["act0_up"])
        put_conv(pre + ".dpt.act_postprocess.1.0", d["act1_conv"])
        put_convT(pre + ".dpt.act_postprocess.1.1", d["act1_up"])
        put_conv(pre + ".dpt.act_postprocess.2.0", d["act2_conv"])
        put_conv(pre + ".dpt.act_postprocess.3.0", d["act3_conv"])
        put_conv(pre + ".dpt.act_postprocess.3.1", d["act3_down"])
        for i in range(4):
            put_conv(pre + f".dpt.scratch.layer{i + 1}_rn", d[f"rn{i}"])
        for i in range(1, 5):
            rpre = pre + f".dpt.scratch.refinenet{i}"
            put_conv(rpre + ".resConfUnit1.conv1", d[f"ref{i}"]["rcu1_c1"])
            put_conv(rpre + ".resConfUnit1.conv2", d[f"ref{i}"]["rcu1_c2"])
            put_conv(rpre + ".resConfUnit2.conv1", d[f"ref{i}"]["rcu2_c1"])
            put_conv(rpre + ".resConfUnit2.conv2", d[f"ref{i}"]["rcu2_c2"])
            put_conv(rpre + ".out_conv", d[f"ref{i}"]["out"])
        put_conv(pre + ".dpt.head.0", d["head_c1"])
        put_conv(pre + ".dpt.head.2", d["head_c2"])
        put_conv(pre + ".dpt.head.4", d["head_c3"])

    converted = convert_state_dict(sd, enc_depth=CFG.enc_depth, dec_depth=CFG.dec_depth)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(converted))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), atol=1e-6,
            err_msg=str(path),
        )


def test_match_symmetric_per_row_agrees_with_batched():
    """Single-chip match_symmetric runs the matcher per direction (B=1
    calls); its results must agree with one batched call — they can differ
    only through the vmapped while_loop running every row to the slowest
    row's LM iteration count (extra accepted steps), which on a smooth
    workload moves almost no correspondences."""
    import numpy as np

    from mast3r_slam_tpu.models.inference import MASt3RInference
    from mast3r_slam_tpu.ops import matching

    cfg = M.tiny_config()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    H, W = 32, 48
    n_tok = (H // 16) * (W // 16)
    B = 1
    key = jax.random.PRNGKey(5)
    feat_i = jax.random.normal(key, (B, n_tok, cfg.enc_embed_dim))
    feat_j = jax.random.normal(jax.random.fold_in(key, 1), feat_i.shape)
    pos = M.patch_positions(H // 16, W // 16, B)

    model = MASt3RInference(params, cfg, {"radius": 1, "dilation_max": 2})
    idx_i2j, idx_j2i, valid_j, valid_i, *_ = model.match_symmetric(
        feat_i, pos, feat_j, pos, (H, W))
    assert idx_i2j.shape == (B, H * W)

    # reference batched result over the same decode outputs
    X, C, D, Q = model.decode_symmetric_batch(feat_i, pos, feat_j, pos,
                                              (H, W))
    X11 = jnp.concatenate([X[0], X[2]], axis=0)
    X21 = jnp.concatenate([X[1], X[3]], axis=0)
    D11 = jnp.concatenate([D[0], D[2]], axis=0)
    D21 = jnp.concatenate([D[1], D[3]], axis=0)
    idx_b, valid_b = matching.match(X11, X21, D11, D21, **model._match_kw())

    got = np.concatenate([np.asarray(idx_i2j), np.asarray(idx_j2i)])
    agree = (got == np.asarray(idx_b)).mean()
    assert agree > 0.95, agree
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(valid_j), np.asarray(valid_i)]),
        np.asarray(valid_b))


def test_head_dtype_bf16_deviation_bounded():
    """config-gated bf16 head intermediates (production default;
    eval configs pin float32): outputs must stay close to the f32 head —
    this quantifies the deviation behind model.head_dtype."""
    import dataclasses

    import numpy as np

    cfg32 = M.tiny_config()
    cfg16 = dataclasses.replace(cfg32, head_dtype="bfloat16")
    params = M.init_params(jax.random.PRNGKey(0), cfg32)
    H, W = 32, 48
    n_tok = (H // 16) * (W // 16)
    key = jax.random.PRNGKey(2)
    feat1 = jax.random.normal(key, (1, n_tok, cfg32.enc_embed_dim))
    feat2 = jax.random.normal(jax.random.fold_in(key, 1), feat1.shape)
    pos = M.patch_positions(H // 16, W // 16, 1)
    d1, _ = M.decode_pair(params, cfg32, feat1, pos, feat2, pos)

    r32 = M.downstream_head(params["head1"], cfg32, d1, (H, W))
    r16 = M.downstream_head(params["head1"], cfg16, d1, (H, W))
    # descriptors are L2-normalized (bounded): tight absolute agreement.
    np.testing.assert_allclose(np.asarray(r16["desc"]),
                               np.asarray(r32["desc"]), atol=0.05)
    # geometry passes through expm1(|xyz|): compare relative, bounded by the
    # bf16 activation noise of the conv stack. Random tiny-scale weights
    # amplify relative noise (unnormalized activations, near-zero outputs);
    # measured median ~0.06 here vs ~1e-2-scale expected with trained
    # full-size weights. The bound pins "same field, bf16-noisy", not parity
    # (eval configs pin head_dtype: float32 for strict numerics).
    p32 = np.asarray(r32["pts3d"])
    p16 = np.asarray(r16["pts3d"])
    rel = np.abs(p16 - p32) / (np.abs(p32) + 1e-2)
    assert np.median(rel) < 0.12, np.median(rel)


def test_stacked_decoder_matches_sequential():
    """prepare_params' stacked dual-decoder (both streams as one batched
    chain over (2, ...) weight leaves) must reproduce the sequential
    two-chain decode exactly — batched matmuls are independent per batch
    entry, so the math is unchanged; only the op schedule is."""
    import numpy as np

    for dtype in ("float32", "bfloat16"):
        cfg = M.tiny_config(dtype=dtype)
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        prepped = M.prepare_params(params, cfg)
        assert "dec_stacked" in prepped

        H, W = 32, 48
        n_tok = (H // 16) * (W // 16)
        key = jax.random.PRNGKey(5)
        feat1 = jax.random.normal(key, (2, n_tok, cfg.enc_embed_dim))
        feat2 = jax.random.normal(jax.random.fold_in(key, 1), feat1.shape)
        pos = M.patch_positions(H // 16, W // 16, 2)

        a1, a2 = M.decode_pair(params, cfg, feat1, pos, feat2, pos)
        b1, b2 = M.decode_pair(prepped, cfg, feat1, pos, feat2, pos)
        assert len(a1) == len(b1) == len(cfg.dpt_hooks)
        for i, (a, b) in enumerate(list(zip(a1, b1)) + list(zip(a2, b2))):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=0,
                err_msg=f"hook {i} dtype {dtype}")


def test_downstream_heads_dispatch_bit_exact():
    """downstream_heads (the shared call-site helper) must be bit-exact vs
    the two direct per-head passes, on both checkpoint-shaped and prepared
    params, and head_params must slice identically. (A vmapped stacked-head
    variant was A/B'd in round 5 and REJECTED on TPU perf — XLA lowers the
    batched-weight convs to grouped convs whose output layout forces a
    10 ms/frame transpose; see models/mast3r.py prepare_params — so all
    paths here are the same sequential math.)"""
    import numpy as np

    cfg = M.tiny_config()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    H, W = 32, 48
    img1 = jax.random.uniform(jax.random.PRNGKey(3), (1, H, W, 3),
                              jnp.float32, -1, 1)
    img2 = jnp.roll(img1, 4, axis=2)
    f1, p1 = M.encode_image(params, cfg, img1)
    f2, p2 = M.encode_image(params, cfg, img2)
    d1, d2 = M.decode_pair(params, cfg, f1, p1, f2, p2)

    r1a = M.downstream_head(params["head1"], cfg, d1, (H, W))
    r2a = M.downstream_head(params["head2"], cfg, d2, (H, W))
    prepped = M.prepare_params(params, cfg)
    for src in (params, prepped):
        r1b, r2b = M.downstream_heads(src, cfg, d1, d2, (H, W))
        for a, b in ((r1a, r1b), (r2a, r2b)):
            for k in a:
                np.testing.assert_array_equal(
                    np.asarray(a[k]), np.asarray(b[k]), err_msg=k)
    rm = M.downstream_head(M.head_params(prepped, 0), cfg, d1, (H, W))
    for k in r1a:
        np.testing.assert_array_equal(np.asarray(r1a[k]), np.asarray(rm[k]),
                                      err_msg=k)


def test_cast_params_for_compute_is_numerics_neutral():
    """cast_params_for_compute pre-casts matmul/conv weights to the compute
    dtype at LOAD time; linear/conv cast per-use anyway, so a bf16-trunk
    forward must be bit-identical with cast vs uncast params (the only
    change is WHEN the convert happens), and layernorm params must stay f32."""
    import dataclasses

    import numpy as np

    cfg = M.tiny_config(dtype="bfloat16")
    cfg = dataclasses.replace(cfg, head_dtype="bfloat16")
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    cast = M.cast_params_for_compute(params, cfg)

    assert cast["enc_blocks"][0]["attn"]["qkv"]["w"].dtype == jnp.bfloat16
    assert cast["dec_blocks"][0]["cross"]["q"]["w"].dtype == jnp.bfloat16
    assert cast["head1"]["dpt"]["rn0"]["w"].dtype == jnp.bfloat16
    # layernorm params participate in f32 math — must not be cast
    assert cast["enc_blocks"][0]["norm1"]["g"].dtype == jnp.float32
    assert cast["enc_norm"]["g"].dtype == jnp.float32
    assert cast["dec_norm"]["g"].dtype == jnp.float32

    H, W = 32, 48
    img1 = jax.random.uniform(jax.random.PRNGKey(3), (1, H, W, 3),
                              jnp.float32, -1, 1)
    img2 = jnp.roll(img1, 4, axis=2)
    r1a, r2a = M.two_view_infer(params, cfg, img1, img2)
    r1b, r2b = M.two_view_infer(cast, cfg, img1, img2)
    for a, b in ((r1a, r1b), (r2a, r2b)):
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=k)

    # f32 trunk + f32 heads (eval config): cast is a no-op
    cfg32 = M.tiny_config()
    cast32 = M.cast_params_for_compute(
        M.init_params(jax.random.PRNGKey(1), cfg32), cfg32)
    assert cast32["enc_blocks"][0]["attn"]["qkv"]["w"].dtype == jnp.float32
    assert cast32["head1"]["dpt"]["rn0"]["w"].dtype == jnp.float32


def test_inference_downsample_decimates_working_outputs():
    """downsample=2 decimates every inference path's per-pixel outputs by
    stride 2 in H and W (reference mast3r_utils.py:43-52 applied at each
    decode site), bit-exactly equal to slicing the full-resolution outputs.
    The model itself still runs at the full crop."""
    from mast3r_slam_tpu.models.inference import MASt3RInference
    from mast3r_slam_tpu.slam.pipeline import create_frame

    cfg = M.tiny_config()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    H, W = 32, 48
    n_tok = (H // 16) * (W // 16)
    key = jax.random.PRNGKey(6)
    feat_i = jax.random.normal(key, (1, n_tok, cfg.enc_embed_dim))
    feat_j = jax.random.normal(jax.random.fold_in(key, 1), feat_i.shape)
    pos = M.patch_positions(H // 16, W // 16, 1)

    m1 = MASt3RInference(params, cfg, {"radius": 1, "dilation_max": 1})
    m2 = MASt3RInference(params, cfg, {"radius": 1, "dilation_max": 1},
                         downsample=2)

    # symmetric decode: stacked (4, B, H, W, ·) images decimated
    full = m1.decode_symmetric_batch(feat_i, pos, feat_j, pos, (H, W))
    half = m2.decode_symmetric_batch(feat_i, pos, feat_j, pos, (H, W))
    for a_full, a_half in zip(full, half):
        np.testing.assert_array_equal(
            np.asarray(a_full)[:, :, ::2, ::2], np.asarray(a_half))

    # symmetric match: working-n index space
    n_work = (H // 2) * (W // 2)
    idx_i2j, idx_j2i, valid_j, valid_i, Qii, *_ = m2.match_symmetric(
        feat_i, pos, feat_j, pos, (H, W))
    assert idx_i2j.shape == (1, n_work)
    assert Qii.shape == (1, n_work, 1)
    assert int(np.max(idx_i2j)) < n_work

    # mono path: flattened decimated pointmap
    img = np.zeros((H, W, 3), np.float32)
    fr1 = create_frame(0, (img * 255).astype(np.uint8), img_size=max(H, W))
    fr2 = create_frame(0, (img * 255).astype(np.uint8), img_size=max(H, W))
    X1, C1 = m1.inference_mono(fr1)
    X2, C2 = m2.inference_mono(fr2)
    hw1 = fr1.img_true_shape
    Xg = np.asarray(X1).reshape(1, hw1[0], hw1[1], 3)[:, ::2, ::2]
    np.testing.assert_array_equal(Xg.reshape(1, -1, 3), np.asarray(X2))


def test_add_factors_reuse_hint_matches_full_symmetric():
    """A 5-tuple keyframe-match hint (tracker-reused j→i direction +
    match_oneway for i→j) builds the same edge as the full symmetric
    decode+match path — the reused direction is the identical computation,
    so only decode-batch reduction order can differ."""
    from mast3r_slam_tpu.models.inference import MASt3RInference
    from mast3r_slam_tpu.slam.factor_graph import FactorGraph
    from mast3r_slam_tpu.slam.frame import Frame, KeyframeBuffer
    from mast3r_slam_tpu.ops import lie

    cfg = M.tiny_config()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    H, W = 32, 48
    n = H * W
    n_tok = (H // 16) * (W // 16)
    model = MASt3RInference(params, cfg, {"radius": 1, "dilation_max": 2})

    kfs = KeyframeBuffer(H, W, capacity=4, feat_dim=cfg.enc_embed_dim)
    key = jax.random.PRNGKey(3)
    feats = [jax.random.normal(jax.random.fold_in(key, i),
                               (1, n_tok, cfg.enc_embed_dim))
             for i in range(2)]
    pos = M.patch_positions(H // 16, W // 16, 1)
    for i in range(2):
        fr = Frame(frame_id=i, img=jnp.zeros((H, W, 3)), img_shape=(H, W),
                   img_true_shape=(H, W),
                   uimg=np.zeros((H, W, 3), np.float32))
        fr.X_canon = jnp.asarray(
            np.random.default_rng(i).random((n, 3)) + [0, 0, 2.0],
            jnp.float32)
        fr.C = jnp.ones((n, 1))
        fr.feat = feats[i]
        fr.pos = pos
        fr.N = 1
        fr.T_WC = lie.identity()
        kfs.append(fr)

    local_cfg = {"local_opt": {
        "min_match_frac": 0.0, "Q_conf": 0.0, "C_conf": 0.0, "pin": 1,
        "max_iters": 2, "sigma_ray": 0.003, "sigma_dist": 10.0,
        "sigma_pixel": 1.0, "sigma_depth": 10.0, "delta_norm": 1e-8,
        "pixel_border": 3, "depth_eps": 1e-6, "warm_start_geo": False,
    }}

    g_full = FactorGraph(model, kfs, local_cfg)
    assert g_full.add_factors([0], [1], 0.0)

    # simulate the tracker's stored match: decode (j=1, i=0) + match = the
    # j→i direction, fused Q exactly as track_core computes Qk
    idx_j2i, valid_i, Qjj, Qij = model.match_oneway(
        feats[1], pos, feats[0], pos, (H, W))
    Qi = jnp.sqrt(Qjj[0][idx_j2i[0]] * Qij[0])[:, None]

    g_hint = FactorGraph(model, kfs, local_cfg)
    assert g_hint.add_factors(
        [0], [1], 0.0,
        init_hint=(0, 1, idx_j2i[0], valid_i[0], Qi))

    # hint data passes through VERBATIM (the production tracker's match)
    np.testing.assert_array_equal(np.asarray(g_hint.idx_jj2ii[0]),
                                  np.asarray(idx_j2i[0]))
    np.testing.assert_array_equal(np.asarray(g_hint.valid_match_i[0]),
                                  np.asarray(valid_i[0]))
    np.testing.assert_allclose(np.asarray(g_hint.Q_jj2ii[0]),
                               np.asarray(Qi), rtol=1e-6)
    # vs the full symmetric path: identical computations at a different
    # decode batch size (B=1 like the tracker/reference vs the fused B=2
    # batch) — only bf16 reduction order can move a correspondence
    for a, b in ((g_hint.idx_jj2ii, g_full.idx_jj2ii),
                 (g_hint.idx_ii2jj, g_full.idx_ii2jj)):
        agree = (np.asarray(a) == np.asarray(b)).mean()
        assert agree > 0.97, agree
    for qa, qb, ia, ib in (
        (g_hint.Q_jj2ii, g_full.Q_jj2ii, g_hint.idx_jj2ii, g_full.idx_jj2ii),
        (g_hint.Q_ii2jj, g_full.Q_ii2jj, g_hint.idx_ii2jj, g_full.idx_ii2jj),
    ):
        same = (np.asarray(ia) == np.asarray(ib))[..., None]
        np.testing.assert_allclose(np.asarray(qa)[same], np.asarray(qb)[same],
                                   rtol=0.05, atol=0.05)
