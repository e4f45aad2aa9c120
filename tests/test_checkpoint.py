"""Checkpoint/resume round-trip on a populated keyframe buffer + graph."""

import numpy as np
import jax.numpy as jnp

from mast3r_slam_tpu.utils.checkpoint import load_state, save_state


def _populated(n_kf=4, h=16, w=24):
    from mast3r_slam_tpu.ops import lie
    from mast3r_slam_tpu.slam.frame import Frame, KeyframeBuffer

    rng = np.random.default_rng(9)
    kfs = KeyframeBuffer(h, w, capacity=8, feat_dim=8)
    n = h * w
    for i in range(n_kf):
        fr = Frame(frame_id=i * 3, img=jnp.asarray(rng.random((h, w, 3)),
                                                   jnp.float32),
                   img_shape=(h, w), img_true_shape=(h, w),
                   uimg=rng.random((h, w, 3)).astype(np.float32))
        fr.X_canon = jnp.asarray(rng.random((n, 3)), jnp.float32)
        fr.C = jnp.asarray(rng.random((n, 1)), jnp.float32)
        fr.feat = jnp.asarray(rng.random((1, kfs.num_patches, 8)), jnp.float32)
        fr.pos = jnp.zeros((1, kfs.num_patches, 2), jnp.int32)
        fr.N = 2
        fr.T_WC = lie.exp(jnp.asarray(rng.normal(size=7) * 0.1, jnp.float32))
        kfs.append(fr)
    kfs.version[:] = np.arange(8)
    return kfs


def test_checkpoint_roundtrip(tmp_path):
    kfs = _populated()
    path = tmp_path / "state.npz"
    save_state(path, kfs, frame_idx=42)

    kfs2 = _populated(n_kf=0)  # empty buffer, same geometry
    frame_idx = load_state(path, kfs2)
    assert frame_idx == 42
    assert len(kfs2) == len(kfs) == 4
    np.testing.assert_allclose(np.asarray(kfs2.T_WC[:4]),
                               np.asarray(kfs.T_WC[:4]))
    np.testing.assert_allclose(np.asarray(kfs2.X[:4]), np.asarray(kfs.X[:4]))
    np.testing.assert_allclose(np.asarray(kfs2.feat[:4]),
                               np.asarray(kfs.feat[:4]))
    assert kfs2.frame_id_to_index == {0: 0, 3: 1, 6: 2, 9: 3}
    np.testing.assert_allclose(kfs2.uimg[2], kfs.uimg[2])


def test_checkpoint_resolution_mismatch(tmp_path):
    kfs = _populated()
    path = tmp_path / "state.npz"
    save_state(path, kfs, frame_idx=1)
    from mast3r_slam_tpu.slam.frame import KeyframeBuffer

    other = KeyframeBuffer(8, 8, capacity=4, feat_dim=8)
    try:
        load_state(path, other)
        raise RuntimeError("expected mismatch assertion")
    except AssertionError:
        pass
