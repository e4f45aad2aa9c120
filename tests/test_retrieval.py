"""Retrieval database: self-similarity recall on synthetic keyframe features."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.slam.retrieval import (
    RetrievalDatabase,
    aggregate_binarize,
    lloyd_step,
    select_local_features,
)

RNG = np.random.default_rng(3)


@dataclasses.dataclass
class FakeFrame:
    feat: jnp.ndarray


def make_frames(n_frames=12, n_tok=128, dim=64, n_clusters=6):
    """Frames drawn from cluster mixtures; frames with the same mixture are
    'the same place'."""
    centers = RNG.normal(size=(n_clusters, dim)).astype(np.float32) * 3.0
    frames = []
    labels = []
    for i in range(n_frames):
        lbl = i % 3  # 3 distinct places revisited cyclically
        mix = centers[[lbl, (lbl + 3) % n_clusters]]
        toks = mix[RNG.integers(0, 2, n_tok)] + 0.1 * RNG.normal(
            size=(n_tok, dim)
        ).astype(np.float32)
        frames.append(FakeFrame(feat=jnp.asarray(toks)[None]))
        labels.append(lbl)
    return frames, labels


def test_select_local_features_shapes_and_norm():
    feat = jnp.asarray(RNG.normal(size=(1, 100, 32)).astype(np.float32))
    sel = select_local_features(feat[0], None, 16)
    assert sel.shape == (16, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(sel), axis=-1), 1.0, atol=1e-5
    )


def test_aggregate_binarize_words():
    desc = jnp.asarray(RNG.normal(size=(50, 16)).astype(np.float32))
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)
    cb = jnp.asarray(RNG.normal(size=(8, 16)).astype(np.float32))
    cb = cb / jnp.linalg.norm(cb, axis=-1, keepdims=True)
    sign, mask = aggregate_binarize(desc, cb)
    assert sign.shape == (8, 16)
    assert bool(mask.any())
    vals = np.unique(np.asarray(sign))
    assert set(vals.tolist()) <= {-1.0, 0.0, 1.0}


def test_lloyd_step_reduces_distortion():
    pts = np.concatenate(
        [RNG.normal(size=(100, 8)) + c for c in (np.zeros(8), np.ones(8) * 4)]
    ).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    cb = jnp.asarray(pts[RNG.choice(200, 4, replace=False)])

    def distortion(cb):
        sims = pts @ np.asarray(cb).T
        return float(np.mean(1.0 - sims.max(1)))

    d0 = distortion(cb)
    cb2 = lloyd_step(jnp.asarray(pts), cb)
    assert distortion(cb2) <= d0 + 1e-6


def test_retrieval_recall_on_revisits():
    """Revisited places should be retrieved above unrelated ones."""
    frames, labels = make_frames()
    db = RetrievalDatabase({}, codebook_size=64, nfeat=64, desc_dim=64)
    hits, total = 0, 0
    for i, (fr, lbl) in enumerate(zip(frames, labels)):
        top = db.update(fr, add_after_query=True, k=2, min_thresh=0.0)
        # after the first full cycle, same-label frames exist in the db
        if i >= 6 and db.codebook is not None and top:
            total += 1
            if any(labels[t] == lbl for t in top):
                hits += 1
    assert total > 0, "retrieval never returned candidates"
    assert hits / total > 0.7, f"recall {hits}/{total}"


def test_reloc_query_does_not_insert():
    frames, _ = make_frames()
    db = RetrievalDatabase({}, codebook_size=32, nfeat=32, desc_dim=64)
    for fr in frames[:9]:
        db.update(fr, add_after_query=True, k=1)
    n = db.kf_counter
    db.update(frames[9], add_after_query=False, k=1)
    assert db.kf_counter == n


def test_early_keyframes_indexed_retroactively():
    """Keyframes inserted before the codebook bootstrap must still be
    retrievable afterwards (loop closures to the trajectory start)."""
    frames, labels = make_frames(n_frames=14)
    db = RetrievalDatabase({}, codebook_size=64, nfeat=64, desc_dim=64)
    for i, fr in enumerate(frames[:10]):
        db.update(fr, add_after_query=True, k=2, kf_idx=i)
    assert db.codebook is not None
    assert db.kf_counter == 10, "pending keyframes were not flushed"
    # querying with a same-place frame must be able to return an EARLY index
    hits = db.update(frames[12], add_after_query=False, k=10, min_thresh=-1.0)
    assert any(h < 8 for h in hits), f"early keyframes unreachable: {hits}"


def test_id_to_kf_mapping_with_offset_indices():
    """Buffer indices offset from insertion order (the --resume scenario)."""
    frames, _ = make_frames(n_frames=12)
    db = RetrievalDatabase({}, codebook_size=32, nfeat=64, desc_dim=64)
    OFFSET = 37
    for i, fr in enumerate(frames):
        db.update(fr, add_after_query=True, k=3, kf_idx=OFFSET + i)
    hits = db.update(frames[0], add_after_query=False, k=3, min_thresh=-1.0)
    assert hits and all(h >= OFFSET for h in hits), hits


def test_trajectory_loop_recall():
    """Loop-closure recall on a rendered out-and-back trajectory through the
    REAL (tiny) encoder — revisited viewpoints (jittered + noised crops of a
    textured world) must be retrieved from the first pass. Pins the
    end-to-end machinery (encoder tokens → feature selection → codebook
    bootstrap → IVF scoring) that synthetic-descriptor tests bypass; the
    fuller sweep lives in scripts/retrieval_recall.py (results in
    docs/PERFORMANCE.md)."""
    import sys
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from scripts.retrieval_recall import (build_loop_frames, encode_frames,
                                          measure_recall)

    n_half = 8
    imgs, revisit_of = build_loop_frames(n_half=n_half)
    feats, cfg = encode_frames(imgs)
    rec, total = measure_recall(feats, revisit_of, n_half,
                                desc_dim=cfg.enc_embed_dim,
                                min_thresh=5e-3)  # production default
    assert total == n_half
    assert rec[2] >= 0.6, f"loop recall@2 regressed: {rec}"
