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


# checkpoint keys that are REAL in the released model but carry no inference
# weight: ``mask_token`` is croco's masked-pretraining token (only used when
# decoding with masks, croco/models/croco.py:182 — SLAM inference never
# masks), and ``scratch.layer_rn.{i}`` are duplicate registrations of the
# same modules as ``scratch.layer{i+1}_rn`` (dust3r/croco/models/
# dpt_block.py:70-74 aliases them in an nn.ModuleList)
_KNOWN_UNUSED = ("mask_token", ".dpt.scratch.layer_rn.")


class _TrackingDict(dict):
    """Records key reads so conversion can report silently-dropped weights."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return dict.__getitem__(self, k)

    def __contains__(self, k):
        self.read.add(k)  # membership probes (optional biases) count
        return dict.__contains__(self, k)


def convert_state_dict(sd, enc_depth=24, dec_depth=12, unused_out=None):
    """Torch state-dict (mapping name → array-like) → parameter pytree (numpy).

    ``unused_out``: optional list; receives the checkpoint keys the
    conversion never consumed (beyond the known-unused inference-irrelevant
    ones) — a non-empty result means weights would be silently dropped.
    """
    sd = _TrackingDict({k: np.asarray(v) for k, v in sd.items()})
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
    if unused_out is not None:
        unused_out.extend(sorted(
            k for k in set(sd) - sd.read
            if not any(pat in k for pat in _KNOWN_UNUSED)))
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


def convert_retrieval_state_dict(sd, *, residual=False, dim=1024):
    """Retrieval-head checkpoint (``..._retrieval_trainingfree.pth``) →
    ``head_params`` for slam/retrieval.py::select_local_features.

    The reference head (thirdparty/mast3r/retrieval/model.py:55-157, applied
    at retrieval_database.py:25-41) is prewhiten → projector → attention =
    L2 norm → postwhiten, where:

    - whiteners are ``Whitener`` modules storing ``m (1, D)`` and ``P (D, D)``
      directly (``x' = (x - m) @ P``, model.py:55-75) — float64 in the
      checkpoint, cast to float32 here;
    - the projector is a ``nn.Sequential`` of [Linear, LayerNorm, GELU] per
      hidden layer plus a final Linear (model.py:144-157), so parameterized
      module indices are Linear at 0, 3, 6, … and LayerNorm at 1, 4, 7, …;
      either may be absent entirely (``hdims=[]`` → Identity);
    - ``residual`` comes from the checkpoint's args, not the state dict.

    Missing whiteners (``prewhiten=None`` → nn.Identity) convert to the
    identity transform so the jitted head stays structurally uniform.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()
          if not k.startswith("backbone")}

    def whiten(prefix, d):
        if f"{prefix}.m" not in sd:
            return np.zeros((d,), np.float32), np.eye(d, dtype=np.float32)
        m = sd[f"{prefix}.m"].reshape(-1).astype(np.float32)
        P = sd[f"{prefix}.p"].astype(np.float32)
        return m, P

    proj_idx = sorted({int(k.split(".")[1]) for k in sd
                       if k.startswith("projector.") and k.endswith(".weight")})
    projector = []
    for i in proj_idx:  # paramless GELU indices simply don't appear here
        W = sd[f"projector.{i}.weight"]
        if W.ndim == 2:  # Linear(out, in)
            projector.append({
                "w": np.ascontiguousarray(W.T.astype(np.float32)),
                "b": sd.get(f"projector.{i}.bias",
                            np.zeros(W.shape[0])).astype(np.float32),
            })
            dim = W.shape[0]
        else:  # LayerNorm(weight, bias) — 1-D params
            projector.append({
                "g": W.astype(np.float32),
                "b": sd[f"projector.{i}.bias"].astype(np.float32),
            })
            # GELU follows every LayerNorm; zero-size marker leaf (not an
            # empty dict) so save/load_params_npz round-trips the structure
            projector.append({"gelu": np.zeros((0,), np.float32)})

    in_dim = (projector[0]["w"].shape[0] if projector
              and "w" in projector[0] else dim)
    pre_m, pre_P = whiten("prewhiten", in_dim)
    post_m, post_P = whiten("postwhiten", dim)
    return {
        "prewhiten_m": pre_m, "prewhiten_P": pre_P,
        "postwhiten_m": post_m, "postwhiten_P": post_P,
        "projector": projector,
        "residual": bool(residual),
    }


def load_retrieval_checkpoint(path):
    """Load the reference retrieval checkpoint (torch ``.pth``) and return
    ``(head_params, nfeat)``. Mirrors the reference's load at
    mast3r_slam/mast3r_utils.py:24-31 + retrieval/processor.py:66-84."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    sd = {k: v.double().numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    args = ckpt.get("args")
    residual = bool(getattr(args, "residual", False)) if args else False
    nfeat = int(getattr(args, "nfeat", 300)) if args else 300
    return convert_retrieval_state_dict(sd, residual=residual), nfeat


def load_retrieval_codebook(path):
    """ASMK codebook → centroid array ``(K, D)``.

    Accepts the reference's pickled ``Codebook.state_dict()``
    (asmk/codebook.py:120-131: ``{"state": {"centroids": ...}}``), a raw
    pickled array, or ``.npy``/``.npz`` (key ``centroids``).
    """
    p = str(path)
    if p.endswith(".npy"):
        return np.load(p)
    if p.endswith(".npz"):
        with np.load(p) as z:
            return z["centroids"] if "centroids" in z.files else z[z.files[0]]
    import pickle

    with open(p, "rb") as fh:
        obj = pickle.load(fh)
    if isinstance(obj, dict) and "state" in obj:
        return np.asarray(obj["state"]["centroids"])
    return np.asarray(obj)
