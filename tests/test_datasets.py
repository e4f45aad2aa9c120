"""Dataset adapter tests on synthetic fixtures (no real datasets needed)."""

import numpy as np
import pytest
import yaml

cv2 = pytest.importorskip("cv2")

from mast3r_slam_tpu.data import Intrinsics, load_dataset
from mast3r_slam_tpu.data.datasets import (
    EurocDataset,
    MP4Dataset,
    RGBFiles,
    SevenScenesDataset,
    TUMDataset,
    natsorted,
)
from mast3r_slam_tpu.data.image_ops import resize_img

RNG = np.random.default_rng(21)


def _img(h=48, w=64):
    return (RNG.random((h, w, 3)) * 255).astype(np.uint8)


@pytest.fixture()
def tum_dir(tmp_path):
    d = tmp_path / "rgbd_dataset_freiburg2_desk"
    (d / "rgb").mkdir(parents=True)
    rows = []
    for i in range(5):
        cv2.imwrite(str(d / "rgb" / f"{i}.png"), _img(480, 640))
        rows.append(f"{100.0 + i / 30:.6f} rgb/{i}.png")
    (d / "rgb.txt").write_text("# header\n# header2\n" + "\n".join(rows) + "\n")
    return d


def test_natsorted():
    names = ["f10.png", "f2.png", "f1.png"]
    assert [str(p) for p in natsorted(names)] == ["f1.png", "f2.png", "f10.png"]


def test_tum_parse_and_dispatch(tum_dir):
    ds = load_dataset(str(tum_dir))
    assert isinstance(ds, TUMDataset)
    assert len(ds) == 5
    ts, img = ds[2]
    assert abs(ts - (100.0 + 2 / 30)) < 1e-6
    assert img.shape == (480, 640, 3) and img.dtype == np.float32
    # freiburg2 calibration was recognized
    assert ds.camera_intrinsics is not None
    assert abs(ds.camera_intrinsics.K_orig[0, 0] - 520.9) < 1e-3


def test_euroc_layout(tmp_path):
    d = tmp_path / "euroc_MH01"
    cam = d / "mav0" / "cam0"
    (cam / "data").mkdir(parents=True)
    for i in range(3):
        cv2.imwrite(str(cam / "data" / f"{int(1e18) + i * int(5e7)}.png"),
                    (RNG.random((48, 64)) * 255).astype(np.uint8))
    (cam / "sensor.yaml").write_text(yaml.safe_dump({
        "intrinsics": [458.6, 457.3, 367.2, 248.4],
        "distortion_coefficients": [-0.28, 0.07, 2e-5, 1.8e-5],
        "resolution": [64, 48],
    }))
    ds = load_dataset(str(d))
    assert isinstance(ds, EurocDataset)
    assert ds.use_calibration  # EuRoC always undistorts
    ts, img = ds[0]
    assert img.shape == (48, 64, 3)
    assert abs(ds.timestamps[1] - ds.timestamps[0] - 0.05) < 1e-6


def test_seven_scenes(tmp_path):
    d = tmp_path / "7scenes_chess"
    (d / "seq-01").mkdir(parents=True)
    for i in range(4):
        cv2.imwrite(str(d / "seq-01" / f"frame-{i:06d}.color.png"), _img())
    ds = load_dataset(str(d))
    assert isinstance(ds, SevenScenesDataset)
    assert len(ds) == 4
    assert ds.camera_intrinsics.K_orig[0, 0] == 585


def test_rgb_files_and_mp4(tmp_path):
    d = tmp_path / "frames"
    d.mkdir()
    for i in range(3):
        cv2.imwrite(str(d / f"img{i}.png"), _img())
    ds = load_dataset(str(d))
    assert isinstance(ds, RGBFiles) and len(ds) == 3

    vid = tmp_path / "clip.mp4"
    wr = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30,
                         (64, 48))
    for i in range(6):
        wr.write(_img())
    wr.release()
    ds2 = load_dataset(str(vid))
    assert isinstance(ds2, MP4Dataset)
    assert len(ds2) == 6
    ts, img = ds2[3]
    assert img.shape == (48, 64, 3)


def test_intrinsics_rescale_no_distortion():
    from mast3r_slam_tpu.utils.config import config

    config.setdefault("dataset", {})["img_size"] = 512  # guard global state
    intr = Intrinsics(640, 480, 500.0, 500.0, 320.0, 240.0)
    # 640x480 → 512x384 model crop: scale 0.8
    np.testing.assert_allclose(intr.K_frame[0, 0], 400.0, rtol=1e-3)
    np.testing.assert_allclose(intr.K_frame[0, 2], 256.0, atol=1.0)
    np.testing.assert_allclose(intr.K_frame[1, 2], 192.0, atol=1.0)


def test_intrinsics_undistort_identity_when_no_distortion():
    intr = Intrinsics(64, 48, 100, 100, 32, 24)
    img = RNG.random((48, 64, 3)).astype(np.float32)
    np.testing.assert_array_equal(intr.remap(img), img)
