"""Retrieval recall on a synthetic loop trajectory through the real encoder.

Builds a camera path over a textured world that goes out and comes back
(frames in the second half revisit first-half viewpoints, with small pixel
jitter + noise so revisits are near- but not exact duplicates), encodes every
frame with the tiny MASt3R encoder, and measures loop-closure recall@k of
:class:`RetrievalDatabase` — the de-facto metric for the component the
reference gets from ASMK/faiss (retrieval_database.py:43-72).

Paths compared: online-bootstrap codebook (production default) and a
projector-head path (random-weight head of the pretrained shape). Also
sweeps ``min_thresh`` so its default can be picked from data (the score an
edge must clear to become a loop-closure candidate).

Run: ``JAX_PLATFORMS=cpu python scripts/retrieval_recall.py``
Results recorded in docs/PERFORMANCE.md (retrieval section); the regression
threshold lives in tests/test_retrieval.py::test_trajectory_loop_recall.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _make_world(H, W, rng):
    """Smooth world texture: random field blurred by separable box passes."""
    world = rng.random((H * 3, W * 8, 3)).astype(np.float32)
    for _ in range(8):
        world = 0.25 * (np.roll(world, 1, 0) + np.roll(world, -1, 0)
                        + np.roll(world, 1, 1) + np.roll(world, -1, 1))
    return (world - world.min()) / (np.ptp(world) + 1e-9) * 2.0 - 1.0


def build_loop_frames(n_half=12, H=64, W=96, seed=0, jitter=2,
                      shift_frac=0.0, gain=1.0, bias=0.0, noise=0.02,
                      n_distractors=0):
    """Crops from a smooth textured world along an out-and-back path.

    Returns (images (2*n_half [+ distractors], H, W, 3) float32 in [-1, 1],
    revisit_of: for second-half frame i, the first-half index it revisits).

    Stress knobs (VERDICT r4 item 8 — perturbation families beyond
    same-trajectory pixel jitter):
    - ``shift_frac``: revisit crops shifted horizontally by this fraction of
      W (viewpoint change → partial overlap with the mapped view);
    - ``gain``/``bias``: photometric drift applied to revisit crops
      (appearance change: lighting/exposure);
    - ``noise``: additive noise sigma on revisit crops;
    - ``n_distractors``: frames from a DIFFERENT world inserted into the
      database between the legs (hard negatives that must not outrank the
      true revisit).
    """
    rng = np.random.default_rng(seed)
    world = _make_world(H, W, rng)
    shift_px = int(shift_frac * W)

    xs = np.linspace(0, world.shape[1] - W - jitter - shift_px - 1,
                     n_half).astype(int)
    ys = (H + (H * np.sin(np.linspace(0, np.pi, n_half))).astype(int) // 2)
    imgs, revisit_of = [], []
    for i in range(n_half):
        imgs.append(world[ys[i]: ys[i] + H, xs[i]: xs[i] + W].copy())
    if n_distractors:
        other = _make_world(H, W, np.random.default_rng(seed + 1000))
        dxs = np.linspace(0, other.shape[1] - W - 1,
                          n_distractors).astype(int)
        for x in dxs:
            imgs.append(other[H: 2 * H, x: x + W].copy())
    for i in range(n_half - 1, -1, -1):
        dx = rng.integers(0, jitter + 1) + shift_px
        dy = rng.integers(0, jitter + 1)
        crop = world[ys[i] + dy: ys[i] + dy + H,
                     xs[i] + dx: xs[i] + dx + W].copy()
        crop = np.clip(gain * crop + bias, -1.0, 1.0)
        crop += noise * rng.standard_normal(crop.shape).astype(np.float32)
        revisit_of.append(i)
        imgs.append(crop)
    return np.stack(imgs), revisit_of


def encode_frames(imgs):
    import jax
    import jax.numpy as jnp

    from mast3r_slam_tpu.models import mast3r as M

    cfg = M.tiny_config()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    enc = jax.jit(lambda img: M.encode_image(params, cfg, img))
    feats = []
    for im in imgs:
        feat, _ = enc(jnp.asarray(im)[None])
        feats.append(feat)
    return feats, cfg


def measure_recall(feats, revisit_of, n_half, head_params=None, k=3,
                   min_thresh=0.0, desc_dim=None):
    import dataclasses

    import jax.numpy as jnp

    from mast3r_slam_tpu.slam.retrieval import RetrievalDatabase

    @dataclasses.dataclass
    class F:
        feat: object

    db = RetrievalDatabase({}, codebook_size=64, nfeat=64,
                           desc_dim=desc_dim, head_params=head_params)
    hits = {kk: 0 for kk in range(1, k + 1)}
    total = 0
    # layout: [first leg (n_half)][optional distractors][revisit leg];
    # the revisit leg is always the LAST len(revisit_of) frames
    revisit_start = len(feats) - len(revisit_of)
    for i, feat in enumerate(feats):
        top = db.update(F(feat=feat), add_after_query=True, k=k,
                        min_thresh=min_thresh)
        if i >= revisit_start:  # second leg: ground-truth revisit known
            gt = revisit_of[i - revisit_start]
            # accept any first-leg frame within 1 path step of the revisit
            good = {gt - 1, gt, gt + 1}
            total += 1
            for kk in range(1, k + 1):
                if any(t in good for t in top[:kk]):
                    hits[kk] += 1
    return {kk: hits[kk] / max(total, 1) for kk in hits}, total


def main():
    n_half = 12
    imgs, revisit_of = build_loop_frames(n_half=n_half)
    feats, cfg = encode_frames(imgs)
    print(f"encoded {len(feats)} frames (tiny encoder, {imgs.shape[1]}x"
          f"{imgs.shape[2]})")

    rec, total = measure_recall(feats, revisit_of, n_half,
                                desc_dim=cfg.enc_embed_dim)
    print(f"bootstrap codebook: recall@k over {total} revisits: "
          + ", ".join(f"@{k}={v:.2f}" for k, v in rec.items()))

    # projector-head path (random weights, pretrained SHAPE): whiteners +
    # 1-hidden-layer projector as models/convert.py emits them
    import numpy as np

    rng = np.random.default_rng(1)
    d = cfg.enc_embed_dim
    head = {
        "prewhiten_m": np.zeros((1, d), np.float32),
        "prewhiten_P": np.eye(d, dtype=np.float32),
        "projector": [
            {"w": (rng.standard_normal((d, d)) / np.sqrt(d)).astype(
                np.float32),
             "b": np.zeros(d, np.float32)},
        ],
        "postwhiten_m": np.zeros((1, d), np.float32),
        "postwhiten_P": np.eye(d, dtype=np.float32),
        "residual": False,
    }
    rec_h, _ = measure_recall(feats, revisit_of, n_half, head_params=head,
                              desc_dim=cfg.enc_embed_dim)
    print("projector-head path:  recall@k: "
          + ", ".join(f"@{k}={v:.2f}" for k, v in rec_h.items()))

    for mt in (0.0, 1e-3, 5e-3, 2e-2, 5e-2):
        rec_t, _ = measure_recall(feats, revisit_of, n_half, min_thresh=mt,
                                  desc_dim=cfg.enc_embed_dim)
        print(f"min_thresh={mt:g}: recall@1={rec_t[1]:.2f} "
              f"recall@3={rec_t[3]:.2f}")


def stress():
    """Perturbation-family stress table (VERDICT r4 item 8): recall of the
    bootstrap-codebook stack under viewpoint shift, photometric drift, and
    distractor-scene injection, at 3 severities each. Measures how far the
    online codebook degrades against harder negatives BEFORE real data can.
    Results recorded in docs/PERFORMANCE.md."""
    n_half = 12
    fams = {
        "viewpoint shift (frac of W)": [
            ("0.12", dict(shift_frac=0.12)),
            ("0.25", dict(shift_frac=0.25)),
            ("0.40", dict(shift_frac=0.40)),
        ],
        "photometric drift (gain/bias)": [
            ("0.9/+0.05", dict(gain=0.9, bias=0.05)),
            ("0.75/+0.15", dict(gain=0.75, bias=0.15)),
            ("0.6/-0.25", dict(gain=0.6, bias=-0.25)),
        ],
        "descriptor noise (sigma)": [
            ("0.05", dict(noise=0.05)),
            ("0.10", dict(noise=0.10)),
            ("0.20", dict(noise=0.20)),
        ],
        "distractor scenes (count)": [
            ("6", dict(n_distractors=6)),
            ("12", dict(n_distractors=12)),
            ("24", dict(n_distractors=24)),
        ],
    }
    print(f"stress table ({n_half} revisits per cell, tiny encoder):")
    for fam, cells in fams.items():
        row = []
        for label, kw in cells:
            imgs, revisit_of = build_loop_frames(n_half=n_half, **kw)
            feats, cfg = encode_frames(imgs)
            rec, _ = measure_recall(feats, revisit_of, n_half,
                                    desc_dim=cfg.enc_embed_dim)
            row.append(f"{label}: @1={rec[1]:.2f} @3={rec[3]:.2f}")
        print(f"  {fam:32s} " + " | ".join(row), flush=True)


if __name__ == "__main__":
    if "--stress" in sys.argv:
        stress()
    else:
        main()
