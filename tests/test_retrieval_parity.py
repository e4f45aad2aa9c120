"""Retrieval-head parity vs the reference torch implementation.

Instantiates the reference ``RetrievalModel`` head (reference:
thirdparty/mast3r/mast3r/retrieval/model.py:55-157) with random whitener /
projector weights, reproduces the exact feature path the reference database
runs per keyframe (retrieval_database.py:25-41: prewhiten → projector
[+residual] → attention → postwhiten → how_select_local), and asserts our
``select_local_features`` + ``convert_retrieval_state_dict`` pipeline emits
the same top-``nfeat`` descriptors. Also covers the ``.pth`` checkpoint and
codebook ``.pkl`` loaders end to end (CLI flags --retrieval-weights /
--retrieval-codebook).
"""

import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference/thirdparty/mast3r"
for _p in (REF_ROOT, f"{REF_ROOT}/dust3r", f"{REF_ROOT}/dust3r/croco"):
    if _p not in sys.path:
        sys.path.insert(0, _p)

# torchvision isn't in this environment; the reference model module imports
# it transitively (dust3r/utils/image.py) but the head math never touches it.
for _mod in ("torchvision", "torchvision.transforms"):
    sys.modules.setdefault(_mod, types.ModuleType(_mod))
_tvf = sys.modules["torchvision.transforms"]
_tvf.Compose = lambda *a, **k: None
_tvf.ToTensor = lambda *a, **k: None
_tvf.Normalize = lambda *a, **k: None
sys.modules["torchvision"].transforms = _tvf

from mast3r.retrieval.model import RetrievalModel, how_select_local  # noqa: E402

from mast3r_slam_tpu.models.convert import (  # noqa: E402
    convert_retrieval_state_dict,
    load_params_npz,
    load_retrieval_checkpoint,
    load_retrieval_codebook,
    save_params_npz,
)
from mast3r_slam_tpu.slam.retrieval import (  # noqa: E402
    RetrievalDatabase,
    select_local_features,
)

RNG = np.random.default_rng(5)
DIM = 32
NTOK = 80
NFEAT = 24


class _DummyBackbone(torch.nn.Module):
    enc_embed_dim = DIM


def _make_reference_head(residual=True, hdims=None):
    torch.manual_seed(3)
    model = RetrievalModel(
        _DummyBackbone(), freeze_backbone=1, prewhiten=1,
        hdims=[DIM] if hdims is None else hdims, residual=residual,
        postwhiten=1, featweights="l2norm", nfeat=NFEAT,
    )
    # randomize the whiteners (they init to identity, which would mask
    # transpose/ordering bugs)
    with torch.no_grad():
        for wh in (model.prewhiten, model.postwhiten):
            wh.m.copy_(torch.randn_like(wh.m) * 0.3)
            wh.p.copy_(torch.randn_like(wh.p) * 0.5)
    return model


def _reference_topk(model, feat_t):
    """The exact per-keyframe feature path of the reference database
    (retrieval_database.py:25-41)."""
    with torch.no_grad():
        pre = model.prewhiten(feat_t)
        proj = model.projector(pre) + (pre if model.residual else 0.0)
        attention = model.attention(proj)
        whitened = model.postwhiten(proj)
        topk, _, _ = how_select_local(whitened, attention, model.nfeat)
        topk = torch.nn.functional.normalize(topk, dim=-1)
    return topk[0].numpy()


def _ours_topk(model, feat):
    hp = convert_retrieval_state_dict(
        {k: v.double().numpy() for k, v in model.state_dict().items()},
        residual=model.residual,
    )
    residual = hp.pop("residual")
    return np.asarray(
        select_local_features(feat, hp, NFEAT, residual)
    )


def test_head_parity_residual_projector():
    feat = RNG.normal(size=(NTOK, DIM)).astype(np.float32)
    model = _make_reference_head(residual=True)
    ref = _reference_topk(model, torch.from_numpy(feat)[None])
    ours = _ours_topk(model, feat)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_head_parity_deep_projector_no_residual():
    """Two hidden layers exercise the Linear→LayerNorm→GELU interleave."""
    feat = RNG.normal(size=(NTOK, DIM)).astype(np.float32)
    model = _make_reference_head(residual=False, hdims=[48, 48, DIM])
    ref = _reference_topk(model, torch.from_numpy(feat)[None])
    ours = _ours_topk(model, feat)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_checkpoint_and_codebook_loaders(tmp_path):
    """.pth + .pkl round trip through the CLI loaders; .npz re-export."""
    model = _make_reference_head(residual=True)
    ckpt = {
        "model": model.state_dict(),
        "args": types.SimpleNamespace(residual=True, nfeat=NFEAT),
    }
    pth = tmp_path / "head.pth"
    torch.save(ckpt, pth)
    head_params, nfeat = load_retrieval_checkpoint(str(pth))
    assert nfeat == NFEAT
    assert head_params["residual"] is True

    # converted head == direct conversion
    feat = RNG.normal(size=(NTOK, DIM)).astype(np.float32)
    hp = dict(head_params)
    res = hp.pop("residual")
    ours = np.asarray(select_local_features(feat, hp, NFEAT, res))
    ref = _reference_topk(model, torch.from_numpy(feat)[None])
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    # .npz round trip preserves the projector structure (incl. GELU markers)
    npz = tmp_path / "head.npz"
    save_params_npz(head_params, npz)
    hp2 = load_params_npz(npz)
    assert bool(hp2.pop("residual"))
    ours2 = np.asarray(select_local_features(feat, hp2, NFEAT, True))
    np.testing.assert_allclose(ours2, ours, rtol=1e-6, atol=1e-7)

    # codebook: reference Codebook.state_dict() pickle layout
    # (asmk/codebook.py:120-131)
    centroids = RNG.normal(size=(64, DIM)).astype(np.float32)
    pkl = tmp_path / "codebook.pkl"
    with open(pkl, "wb") as fh:
        pickle.dump({"type": "Codebook", "params": {"size": 64},
                     "state": {"centroids": centroids}}, fh)
    got = load_retrieval_codebook(str(pkl))
    np.testing.assert_array_equal(got, centroids)


def test_recall_with_pretrained_head_and_codebook(tmp_path):
    """End-to-end converted-head path: places revisited under a pretrained
    head + codebook must be retrieved (the reference deployment mode)."""
    import dataclasses

    import jax.numpy as jnp

    @dataclasses.dataclass
    class FakeFrame:
        feat: jnp.ndarray

    model = _make_reference_head(residual=True)
    head_params, nfeat = (
        convert_retrieval_state_dict(
            {k: v.double().numpy() for k, v in model.state_dict().items()},
            residual=True,
        ),
        NFEAT,
    )

    centers = RNG.normal(size=(6, DIM)).astype(np.float32) * 3.0
    frames, labels = [], []
    for i in range(12):
        lbl = i % 3
        mix = centers[[lbl, (lbl + 3) % 6]]
        toks = mix[RNG.integers(0, 2, NTOK)] + 0.1 * RNG.normal(
            size=(NTOK, DIM)).astype(np.float32)
        frames.append(FakeFrame(feat=jnp.asarray(toks)[None]))
        labels.append(lbl)

    # pretrained codebook: train it on head outputs of held-out noise frames
    pool = []
    for _ in range(8):
        toks = centers[RNG.integers(0, 6, NTOK)] + 0.1 * RNG.normal(
            size=(NTOK, DIM)).astype(np.float32)
        hp = dict(head_params)
        r = hp.pop("residual")
        pool.append(np.asarray(select_local_features(
            jnp.asarray(toks), hp, NFEAT, r)))
    pool = np.concatenate(pool)
    cb = pool[RNG.choice(pool.shape[0], 48, replace=False)]

    db = RetrievalDatabase({}, nfeat=nfeat, desc_dim=DIM,
                           head_params=head_params)
    db.set_codebook(cb)
    assert db.codebook is not None  # no bootstrap needed

    hits, total = 0, 0
    for i, (fr, lbl) in enumerate(zip(frames, labels)):
        top = db.update(fr, add_after_query=True, k=2, min_thresh=0.0)
        if i >= 6 and top:
            total += 1
            if any(labels[t] == lbl for t in top):
                hits += 1
    assert total > 0
    assert hits / total > 0.7, f"recall {hits}/{total}"
