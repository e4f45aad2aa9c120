"""Smoke test of the turn-key real-weight runway (scripts/validate_real.sh).

Builds a TINY checkpoint ``.pth`` with the released checkpoint's exact
container quirks — ``ckpt['args'].model`` holding a constructor string that
the reference loader ``eval``s (with the ``ManyAR_PatchEmbed`` →
``PatchEmbedDust3R`` substitution and the ``landscape_only=False`` rewrite,
reference mast3r/model.py:21-37), weights under ``ckpt['model']`` — then runs
steps 1+2 of validate_real.sh (``scripts/full_parity_check.py --ckpt ...
--save-npz ...``) as a subprocess and asserts parity PASSes and the
converted ``.npz`` round-trips.
"""

import os
import subprocess
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference/thirdparty/mast3r"
for _p in (REF_ROOT, f"{REF_ROOT}/dust3r", f"{REF_ROOT}/dust3r/croco"):
    if _p not in sys.path:
        sys.path.insert(0, _p)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# tiny but reference-legal (head factory needs dec_depth > 9)
ARGS_STR = (
    "AsymmetricMASt3R(output_mode='pts3d+desc8', head_type='catmlp+dpt', "
    "depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf), "
    "desc_conf_mode=('exp', 0, inf), two_confs=True, "
    "patch_embed_cls='ManyAR_PatchEmbed', img_size=(64, 96), patch_size=16, "
    "enc_embed_dim=64, enc_depth=2, enc_num_heads=2, dec_embed_dim=48, "
    "dec_depth=12, dec_num_heads=2, mlp_ratio=4, pos_embed='RoPE100')"
)


def _make_tiny_ckpt(path):
    from mast3r.model import AsymmetricMASt3R, inf  # noqa: F401

    torch.manual_seed(3)
    ctor = (ARGS_STR.replace("ManyAR_PatchEmbed", "PatchEmbedDust3R")[:-1]
            + ", landscape_only=False)")
    net = eval(ctor).eval()
    # the released checkpoint stores args as a namespace with a .model
    # constructor string (WITHOUT landscape_only — the loader appends it)
    ckpt = {"args": types.SimpleNamespace(model=ARGS_STR),
            "model": net.state_dict()}
    torch.save(ckpt, path)


def test_validate_real_convert_and_parity(tmp_path):
    ckpt_path = tmp_path / "tiny_metric.pth"
    npz_path = tmp_path / "tiny_metric.npz"
    _make_tiny_ckpt(str(ckpt_path))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "full_parity_check.py"),
         "--ckpt", str(ckpt_path), "--save-npz", str(npz_path)],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    out = r.stdout + r.stderr
    assert r.returncode == 0, f"parity check failed:\n{out[-3000:]}"
    assert "FULL-SIZE PARITY: PASS" in out, out[-3000:]
    assert "all inference keys consumed" in out, out[-2000:]

    from mast3r_slam_tpu.models.convert import load_params_npz

    params = load_params_npz(str(npz_path))
    assert len(params["enc_blocks"]) == 2
    assert len(params["dec_blocks"]) == 12
    assert params["patch_embed"]["w"].shape == (16, 16, 3, 64)
    assert np.isfinite(np.asarray(params["decoder_embed"]["w"])).all()
