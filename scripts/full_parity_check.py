"""Full-size ViT-L forward parity check vs the reference torch architecture.

One-shot validation (too heavy for the pytest suite on this 1-core box):
random-init the COMPLETE reference AsymmetricMASt3R at released-checkpoint
size (ViT-L/16 enc 24x1024, dec 12x768, catmlp+dpt heads, desc24, metric
modes — reference thirdparty/mast3r/mast3r/model.py:40-68), convert its
state_dict with models/convert.py, and compare all four head outputs at
384x512 between torch-CPU and our JAX forward.

Run:  JAX_PLATFORMS=cpu python scripts/full_parity_check.py
(CPU keeps both sides in the same f32 arithmetic; results recorded in
docs/PERFORMANCE.md / PARITY.md.)
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REF_ROOT = "/root/reference/thirdparty/mast3r"
for _p in (REF_ROOT, f"{REF_ROOT}/dust3r", f"{REF_ROOT}/dust3r/croco"):
    if _p not in sys.path:
        sys.path.insert(0, _p)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from mast3r_slam_tpu.models import mast3r as M  # noqa: E402
from mast3r_slam_tpu.models.convert import convert_state_dict  # noqa: E402

H, W = 384, 512


def main():
    global H, W
    import argparse

    from mast3r.model import AsymmetricMASt3R

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="",
                    help="real .pth checkpoint: load via the reference's "
                    "from_pretrained (exercises ckpt-args eval + "
                    "landscape_only=False wrapper, mast3r/model.py:21-37) "
                    "instead of random-init")
    ap.add_argument("--save-npz", default="",
                    help="also save the converted params as .npz")
    args = ap.parse_args()

    inf = float("inf")
    torch.manual_seed(0)
    t0 = time.time()
    if args.ckpt:
        # the REAL loading path, quirks included (reference
        # mast3r_utils.py:14-21 → model.py load_model: eval of
        # ckpt['args'].model with landscape_only forced False). torch>=2.6
        # defaults torch.load to weights_only=True, which rejects the
        # checkpoint's args namespace — allow-list it (the reference loader
        # itself predates that default).
        import argparse as _ns
        import types as _types

        torch.serialization.add_safe_globals(
            [_ns.Namespace, _types.SimpleNamespace])
        net = AsymmetricMASt3R.from_pretrained(args.ckpt).eval()
        print(f"[{time.time()-t0:6.1f}s] checkpoint loaded: {args.ckpt}")
    else:
        net = AsymmetricMASt3R(
            output_mode="pts3d+desc24", head_type="catmlp+dpt",
            depth_mode=("exp", -inf, inf), conf_mode=("exp", 1, inf),
            desc_conf_mode=("exp", 0, inf), two_confs=True,
            landscape_only=False, patch_embed_cls="PatchEmbedDust3R",
            img_size=(H, W), patch_size=16,
            enc_embed_dim=1024, enc_depth=24, enc_num_heads=16,
            dec_embed_dim=768, dec_depth=12, dec_num_heads=12,
            mlp_ratio=4, pos_embed="RoPE100",
        ).eval()
    print(f"[{time.time()-t0:6.1f}s] reference net built "
          f"({sum(p.numel() for p in net.parameters())/1e6:.0f}M params)")

    # derive OUR config from the instantiated net (so --ckpt works at any
    # size, incl. tiny smoke-test checkpoints — tests/test_validate_real.py)
    enc_depth, dec_depth = len(net.enc_blocks), len(net.dec_blocks)
    cfg = M.MASt3RConfig(
        enc_embed_dim=net.enc_blocks[0].attn.qkv.in_features,
        enc_depth=enc_depth,
        enc_num_heads=net.enc_blocks[0].attn.num_heads,
        dec_embed_dim=net.dec_blocks[0].attn.qkv.in_features,
        dec_depth=dec_depth,
        dec_num_heads=net.dec_blocks[0].attn.num_heads,
        desc_dim=int(net.output_mode.split("desc")[-1]),
        dtype="float32",
    )
    img_size = getattr(net.patch_embed, "img_size", (H, W))
    H, W = int(img_size[0]), int(img_size[1])

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    unused = []
    params = convert_state_dict(sd, enc_depth=enc_depth, dec_depth=dec_depth,
                                unused_out=unused)
    if unused:
        print(f"WARNING: {len(unused)} checkpoint keys not consumed "
              f"(weights would be dropped): {unused[:10]}...")
    print(f"[{time.time()-t0:6.1f}s] converted"
          + (" (all inference keys consumed)" if not unused else ""))
    if args.save_npz:
        from mast3r_slam_tpu.models.convert import save_params_npz

        save_params_npz(params, args.save_npz)
        print(f"[{time.time()-t0:6.1f}s] saved converted params → "
              f"{args.save_npz}")

    rng = np.random.default_rng(7)
    img1 = rng.uniform(-1.0, 1.0, size=(1, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(-1.0, 1.0, size=(1, H, W, 3)).astype(np.float32)

    t1 = torch.from_numpy(np.transpose(img1, (0, 3, 1, 2)))
    t2 = torch.from_numpy(np.transpose(img2, (0, 3, 1, 2)))
    shape = torch.tensor([[H, W]])
    with torch.no_grad():
        feat1_t, pos1_t, _ = net._encode_image(t1, shape)
        feat2_t, pos2_t, _ = net._encode_image(t2, shape)
        dec1, dec2 = net._decoder(feat1_t, pos1_t, feat2_t, pos2_t)
        res1_t = net._downstream_head(1, [t.float() for t in dec1], shape)
        res2_t = net._downstream_head(2, [t.float() for t in dec2], shape)
    print(f"[{time.time()-t0:6.1f}s] torch forward done")

    feat1, pos1 = M.encode_image(params, cfg, jnp.asarray(img1))
    feat2, pos2 = M.encode_image(params, cfg, jnp.asarray(img2))
    d1, d2 = M.decode_pair(params, cfg, feat1, pos1, feat2, pos2)
    res1_j = M.downstream_head(params["head1"], cfg, d1, (H, W))
    res2_j = M.downstream_head(params["head2"], cfg, d2, (H, W))
    jax.block_until_ready(res1_j["pts3d"])
    print(f"[{time.time()-t0:6.1f}s] jax forward done")

    enc_err = float(jnp.max(jnp.abs(feat1 - feat1_t.numpy())))
    print(f"encoder max abs err: {enc_err:.3e}")

    ok = True
    for name, res_t, res_j in (("view1", res1_t, res1_j),
                               ("view2", res2_t, res2_j)):
        for key in ("pts3d", "conf", "desc", "desc_conf"):
            ref = res_t[key].numpy()
            got = np.asarray(res_j[key]).reshape(ref.shape)
            abs_err = np.max(np.abs(got - ref))
            denom = np.maximum(np.abs(ref), 1e-3)
            rel_err = np.max(np.abs(got - ref) / denom)
            line_ok = abs_err < 2e-2 and rel_err < 5e-3
            ok &= line_ok
            print(f"{name}/{key:9s} max_abs={abs_err:.3e} "
                  f"max_rel={rel_err:.3e} {'OK' if line_ok else 'FAIL'}")
    print("FULL-SIZE PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
