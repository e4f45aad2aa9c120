"""Convert a MASt3R PyTorch checkpoint into this framework's parameter pytree.

The released checkpoint (``MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth``,
reference: mast3r_slam/mast3r_utils.py:14-21) stores a torch ``state_dict``.
This module maps it onto the pytree produced by
:func:`mast3r_slam_tpu.models.mast3r.init_params`:

- ``nn.Linear``  weight (out, in)            → ``w (in, out)`` (transposed)
- ``nn.Conv2d``  weight (out, in, kh, kw)    → ``w (kh, kw, in, out)``
- ``nn.ConvTranspose2d`` weight (in, out, kh, kw) → ``w (kh, kw, in, out)``
  (used with ``lax.conv_transpose(..., transpose_kernel=True)`` semantics —
  see ``layers.conv2d_transpose``; parity covered by tests/test_model_parity.py)
- ``nn.LayerNorm`` weight/bias → ``g``/``b``.
"""

from __future__ import annotations

import numpy as np


def _lin(sd, prefix):
    p = {"w": np.ascontiguousarray(sd[prefix + ".weight"].T)}
    if prefix + ".bias" in sd:
        p["b"] = np.asarray(sd[prefix + ".bias"])
    return p


def _conv(sd, prefix):
    p = {"w": np.ascontiguousarray(np.transpose(sd[prefix + ".weight"], (2, 3, 1, 0)))}
    if prefix + ".bias" in sd:
        p["b"] = np.asarray(sd[prefix + ".bias"])
    return p


def _convT(sd, prefix):
    # torch ConvTranspose2d weight is (in, out, kh, kw) → (kh, kw, in, out)
    p = {"w": np.ascontiguousarray(np.transpose(sd[prefix + ".weight"], (2, 3, 0, 1)))}
    if prefix + ".bias" in sd:
        p["b"] = np.asarray(sd[prefix + ".bias"])
    return p


def _ln(sd, prefix):
    return {"g": np.asarray(sd[prefix + ".weight"]), "b": np.asarray(sd[prefix + ".bias"])}


def _enc_block(sd, pre):
    return {
        "norm1": _ln(sd, pre + ".norm1"),
        "attn": {"qkv": _lin(sd, pre + ".attn.qkv"), "proj": _lin(sd, pre + ".attn.proj")},
        "norm2": _ln(sd, pre + ".norm2"),
        "mlp": {"fc1": _lin(sd, pre + ".mlp.fc1"), "fc2": _lin(sd, pre + ".mlp.fc2")},
    }


def _dec_block(sd, pre):
    return {
        "norm1": _ln(sd, pre + ".norm1"),
        "attn": {"qkv": _lin(sd, pre + ".attn.qkv"), "proj": _lin(sd, pre + ".attn.proj")},
        "norm2": _ln(sd, pre + ".norm2"),
        "norm_y": _ln(sd, pre + ".norm_y"),
        "cross": {
            "q": _lin(sd, pre + ".cross_attn.projq"),
            "k": _lin(sd, pre + ".cross_attn.projk"),
            "v": _lin(sd, pre + ".cross_attn.projv"),
            "proj": _lin(sd, pre + ".cross_attn.proj"),
        },
        "norm3": _ln(sd, pre + ".norm3"),
        "mlp": {"fc1": _lin(sd, pre + ".mlp.fc1"), "fc2": _lin(sd, pre + ".mlp.fc2")},
    }


def _dpt(sd, pre):
    p = {
        "act0_conv": _conv(sd, pre + ".act_postprocess.0.0"),
        "act0_up": _convT(sd, pre + ".act_postprocess.0.1"),
        "act1_conv": _conv(sd, pre + ".act_postprocess.1.0"),
        "act1_up": _convT(sd, pre + ".act_postprocess.1.1"),
        "act2_conv": _conv(sd, pre + ".act_postprocess.2.0"),
        "act3_conv": _conv(sd, pre + ".act_postprocess.3.0"),
        "act3_down": _conv(sd, pre + ".act_postprocess.3.1"),
        "head_c1": _conv(sd, pre + ".head.0"),
        "head_c2": _conv(sd, pre + ".head.2"),
        "head_c3": _conv(sd, pre + ".head.4"),
    }
    for i in range(4):
        p[f"rn{i}"] = _conv(sd, pre + f".scratch.layer{i + 1}_rn")
    for i in range(1, 5):
        rpre = pre + f".scratch.refinenet{i}"
        p[f"ref{i}"] = {
            "rcu1_c1": _conv(sd, rpre + ".resConfUnit1.conv1"),
            "rcu1_c2": _conv(sd, rpre + ".resConfUnit1.conv2"),
            "rcu2_c1": _conv(sd, rpre + ".resConfUnit2.conv1"),
            "rcu2_c2": _conv(sd, rpre + ".resConfUnit2.conv2"),
            "out": _conv(sd, rpre + ".out_conv"),
        }
    return p


def convert_state_dict(sd, enc_depth=24, dec_depth=12):
    """Torch state-dict (mapping name → array-like) → parameter pytree (numpy)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    # The checkpoint may lack dec_blocks2 (shared weights) — duplicate dec_blocks.
    if not any(k.startswith("dec_blocks2") for k in sd):
        for k in list(sd):
            if k.startswith("dec_blocks."):
                sd[k.replace("dec_blocks.", "dec_blocks2.", 1)] = sd[k]
    params = {
        "patch_embed": _conv(sd, "patch_embed.proj"),
        "enc_blocks": [_enc_block(sd, f"enc_blocks.{i}") for i in range(enc_depth)],
        "enc_norm": _ln(sd, "enc_norm"),
        "decoder_embed": _lin(sd, "decoder_embed"),
        "dec_blocks": [_dec_block(sd, f"dec_blocks.{i}") for i in range(dec_depth)],
        "dec_blocks2": [_dec_block(sd, f"dec_blocks2.{i}") for i in range(dec_depth)],
        "dec_norm": _ln(sd, "dec_norm"),
    }
    for n in (1, 2):
        params[f"head{n}"] = {
            "dpt": _dpt(sd, f"downstream_head{n}.dpt"),
            "local_feat": {
                "fc1": _lin(sd, f"downstream_head{n}.head_local_features.fc1"),
                "fc2": _lin(sd, f"downstream_head{n}.head_local_features.fc2"),
            },
        }
    return params


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    root: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def save_params_npz(params, path):
    """Persist a parameter pytree as a flat .npz archive."""
    np.savez(path, **_flatten(params))


def load_params_npz(path):
    """Load a pytree saved by :func:`save_params_npz`."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten(flat)


def load_checkpoint(path, enc_depth=24, dec_depth=12):
    """Load a ``.pth`` checkpoint (requires torch) and convert to a pytree."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    sd = {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return convert_state_dict(sd, enc_depth, dec_depth)


def convert_retrieval_state_dict(sd):
    """Retrieval-head checkpoint (``..._retrieval_trainingfree.pth``) →
    ``head_params`` for slam/retrieval.py::select_local_features.

    The reference head (thirdparty/mast3r/retrieval/model.py:88-140) is
    prewhiten (mean + PCA matrix) → projector MLP (+residual) → attention =
    L2 norm → postwhiten. Whitening layers are stored as Linear(weight, bias)
    where x' = (x - mean) @ P == x @ W.T + b with W = P.T, mean = -b @ inv(P).
    We keep (m, P) form directly from weight/bias.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def whiten(prefix):
        W = sd[f"{prefix}.weight"]          # (out, in)
        b = sd.get(f"{prefix}.bias")
        P = np.ascontiguousarray(W.T)
        if b is None:
            m = np.zeros(P.shape[0], np.float32)
        else:
            # x @ P + b == (x - m) @ P with m = -b @ pinv(P)
            m = -np.linalg.pinv(P) @ b if P.shape[0] == P.shape[1] else (
                -b @ np.linalg.pinv(P)
            )
        return m.astype(np.float32), P.astype(np.float32)

    pre_m, pre_P = whiten("prewhiten")
    post_m, post_P = whiten("postwhiten")
    projector = []
    i = 0
    while f"projector.{i}.weight" in sd:
        lyr = {"w": np.ascontiguousarray(sd[f"projector.{i}.weight"].T),
               "b": sd.get(f"projector.{i}.bias",
                           np.zeros(sd[f"projector.{i}.weight"].shape[0]))}
        # torch Sequential interleaves Linear/ReLU; ReLU has no params, so a
        # gap of 2 in indices means the previous layer is followed by ReLU.
        if f"projector.{i + 2}.weight" in sd:
            lyr["relu"] = True
        projector.append(lyr)
        i += 2 if f"projector.{i + 2}.weight" in sd else 1
        if i > 32:
            break
    return {
        "prewhiten_m": pre_m, "prewhiten_P": pre_P,
        "postwhiten_m": post_m, "postwhiten_P": post_P,
        "projector": projector,
        "residual": True,
    }
