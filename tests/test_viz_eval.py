"""Headless renderer + PLY writer + save_traj round-trip tests."""

import numpy as np
import jax.numpy as jnp

from mast3r_slam_tpu import evaluation as ev
from mast3r_slam_tpu.ops import lie
from mast3r_slam_tpu.slam.frame import Frame, KeyframeBuffer, States
from mast3r_slam_tpu.viz.render import look_at, render_state

RNG = np.random.default_rng(7)


def make_buffer(n_kf=3, h=16, w=24):
    kfs = KeyframeBuffer(h, w, capacity=8, feat_dim=8)
    n = h * w
    for i in range(n_kf):
        fr = Frame(frame_id=i, img=jnp.zeros((h, w, 3)), img_shape=(h, w),
                   img_true_shape=(h, w),
                   uimg=RNG.random((h, w, 3)).astype(np.float32))
        fr.X_canon = jnp.asarray(
            RNG.random((n, 3)).astype(np.float32) + [0, 0, 2.0]
        )
        fr.C = jnp.ones((n, 1))
        fr.feat = jnp.zeros((1, kfs.num_patches, 8))
        fr.pos = jnp.zeros((1, kfs.num_patches, 2), jnp.int32)
        fr.N = 1
        fr.T_WC = lie.exp(jnp.asarray([0.3 * i, 0, 0, 0, 0, 0, 0.0]))
        kfs.append(fr)
    return kfs


def test_render_state_draws_content():
    kfs = make_buffer()
    states = States()
    states.set_edges([0, 1], [1, 2])
    img = render_state(kfs, states, img_hw=(120, 160))
    assert img.shape == (120, 160, 3) and img.dtype == np.uint8
    assert (img > 0).any(), "rendered image is empty"


def test_render_empty_buffer():
    kfs = KeyframeBuffer(8, 8, capacity=2, feat_dim=4)
    img = render_state(kfs, None, img_hw=(32, 32))
    assert img.sum() == 0


def test_look_at_projects_target_to_center():
    R, t = look_at(np.array([0, 0, -2.0]), np.zeros(3))
    p = R @ np.zeros(3) + t
    assert p[2] > 0  # target in front of camera
    np.testing.assert_allclose(p[:2], 0.0, atol=1e-6)


def test_write_ply_roundtrip(tmp_path):
    xyz = RNG.random((100, 3)).astype(np.float32)
    rgb = (RNG.random((100, 3)) * 255).astype(np.uint8)
    path = tmp_path / "test.ply"
    ev.write_ply(path, xyz, rgb, {"priority": RNG.random(100).astype(np.float32),
                                  "class_id": np.arange(100)})
    data = path.read_bytes()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode()
    assert "element vertex 100" in header
    assert "property uchar red" in header
    assert "property int class_id" in header
    rec = np.frombuffer(data[header_end:], dtype=[
        ("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
        ("red", "u1"), ("green", "u1"), ("blue", "u1"),
        ("priority", "<f4"), ("class_id", "<i4"),
    ])
    np.testing.assert_allclose(rec["x"], xyz[:, 0])
    np.testing.assert_array_equal(rec["class_id"], np.arange(100))


def test_save_traj_format(tmp_path):
    kfs = make_buffer()
    ts = [0.0, 0.1, 0.2]
    path = ev.save_traj(tmp_path, "traj.txt", ts, kfs)
    tss, t, q = ev.load_tum_traj(path)
    assert len(tss) == 3
    np.testing.assert_allclose(t[:, 0], [0.0, 0.3, 0.6], atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-5)


def test_render_with_current_frame():
    """Current-frame depth-colored splats render alongside keyframes."""
    kfs = make_buffer()
    states = States()
    h, w = 16, 24
    fr = Frame(frame_id=9, img=jnp.zeros((h, w, 3)), img_shape=(h, w),
               img_true_shape=(h, w),
               uimg=RNG.random((h, w, 3)).astype(np.float32))
    fr.X_canon = jnp.asarray(RNG.random((h * w, 3)).astype(np.float32)
                             + [0, 0, 2.0])
    states.set_frame(fr)
    img = render_state(kfs, states, img_hw=(100, 140))
    assert (img > 0).any()
