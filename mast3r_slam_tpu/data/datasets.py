"""Dataset adapters (host-side IO) — capability parity with the reference
loader zoo (reference: mast3r_slam/dataloader.py:22-541, 9 dataset classes +
``Intrinsics`` + path-token dispatch).

All adapters yield ``(timestamp, img)`` with ``img (H, W, 3) float32 RGB`` in
[0, 1] at ORIGINAL resolution; undistortion happens on read when calibration
is in use. Model-resolution resizing is done by ``create_frame`` via
``image_ops.resize_img`` so the device pipeline sees fixed shapes.

TPU note: these stay host/numpy by design — dataset IO is the one part of the
system that belongs on the host; frames are staged to device asynchronously
by the frontend (see slam/pipeline.py).
"""

from __future__ import annotations

import json
import os
import pathlib
import re

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from mast3r_slam_tpu.data.image_ops import resize_img
from mast3r_slam_tpu.utils.config import config


def natsorted(paths):
    """Natural-order sort (replacement for the natsort dependency)."""

    def key(p):
        s = str(p)
        return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]

    return sorted(paths, key=key)


# ---------------------------------------------------------------------------
# Intrinsics
# ---------------------------------------------------------------------------

class Intrinsics:
    """Camera calibration: undistortion maps + intrinsics rescaled to the crop.

    Mirrors the reference ``Intrinsics`` (dataloader.py:476-516): given the
    9-param calibration (fx fy cx cy + 5 distortion) at source resolution,
    computes cv2 undistort/rectify maps and the ``K_frame`` matrix valid for
    the 512-long-edge model crop produced by ``resize_img``.
    """

    def __init__(self, W, H, fx, fy, cx, cy, distortion=None):
        self.W, self.H = int(W), int(H)
        self.K_orig = np.array(
            [[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float32
        )
        self.distortion = (
            np.zeros(5, np.float32) if distortion is None
            else np.asarray(distortion, np.float32)
        )
        self.has_distortion = bool(np.abs(self.distortion).sum() > 0)
        self.mapx = self.mapy = None
        self.K_undist = self.K_orig.copy()
        if self.has_distortion and cv2 is not None:
            new_K, _ = cv2.getOptimalNewCameraMatrix(
                self.K_orig, self.distortion, (self.W, self.H), 0,
                (self.W, self.H)
            )
            if bool(config.get("dataset", {}).get("center_principle_point", True)):
                new_K[0, 2] = self.W / 2.0
                new_K[1, 2] = self.H / 2.0
            self.K_undist = new_K.astype(np.float32)
            self.mapx, self.mapy = cv2.initUndistortRectifyMap(
                self.K_orig, self.distortion, None, self.K_undist,
                (self.W, self.H), cv2.CV_32FC1,
            )
        self.K_frame = self._rescale_to_crop(self.K_undist)

    def _rescale_to_crop(self, K):
        """Map intrinsics through the resize+crop of ``resize_img`` at the
        configured model resolution (dataset.img_size, default 512)."""
        img_size = int(config.get("dataset", {}).get("img_size", 512))
        probe = np.zeros((self.H, self.W, 3), np.float32)
        _, (scale_w, scale_h, half_w, half_h) = resize_img(
            probe, img_size, return_transformation=True
        )
        K2 = K.copy().astype(np.float32)
        K2[0, 0] /= scale_w
        K2[1, 1] /= scale_h
        K2[0, 2] = K2[0, 2] / scale_w - half_w
        K2[1, 2] = K2[1, 2] / scale_h - half_h
        return K2

    def remap(self, img):
        if self.mapx is None:
            return img
        return cv2.remap(img, self.mapx, self.mapy, cv2.INTER_LINEAR)


# ---------------------------------------------------------------------------
# Base class
# ---------------------------------------------------------------------------

class MonocularDataset:
    """Base adapter: index → (timestamp, float32 RGB [0,1]), undistorted."""

    dtype = np.float32

    def __init__(self):
        self.timestamps: list | np.ndarray = []
        self.use_calibration = False
        self.camera_intrinsics: Intrinsics | None = None
        self.save_results = True
        self.subsample = int(config.get("dataset", {}).get("subsample", 1))

    def read_img(self, idx):  # pragma: no cover - abstract
        raise NotImplementedError

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, idx):
        img = self.read_img(idx)
        if img.dtype == np.uint8:
            img = img.astype(self.dtype) / 255.0
        if self.use_calibration and self.camera_intrinsics is not None:
            img = self.camera_intrinsics.remap(img)
        ts = self.timestamps[idx] if idx < len(self.timestamps) else float(idx)
        return float(ts), img

    def get_img_shape(self, img_size: int = 0):
        """(display_shape, true_shape) of the model crop for frame 0."""
        if not img_size:
            img_size = int(config.get("dataset", {}).get("img_size", 512))
        _, img = self[0]
        res = resize_img(img, img_size)
        hw = tuple(int(v) for v in res["true_shape"][0])
        return hw, hw

    def set_calibration(self, intr: Intrinsics):
        self.camera_intrinsics = intr
        self.use_calibration = True

    def has_calib(self):
        return self.use_calibration and self.camera_intrinsics is not None


def _imread_rgb(path) -> np.ndarray:
    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"failed to read image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


# ---------------------------------------------------------------------------
# TUM RGB-D
# ---------------------------------------------------------------------------

# Standard TUM freiburg camera parameters (fx fy cx cy k1 k2 p1 p2 k3).
_TUM_CALIB = {
    "freiburg1": (517.3, 516.5, 318.6, 255.3,
                  (0.2624, -0.9531, -0.0054, 0.0026, 1.1633)),
    "freiburg2": (520.9, 521.0, 325.1, 249.7,
                  (0.2312, -0.7849, -0.0033, -0.0001, 0.9172)),
    "freiburg3": (535.4, 539.2, 320.1, 247.6, None),
}


class TUMDataset(MonocularDataset):
    """TUM RGB sequences: ``rgb.txt`` index + per-freiburg fixed calibration
    (reference dataloader.py:69-91)."""

    def __init__(self, path):
        super().__init__()
        self.path = pathlib.Path(path)
        rows = []
        with open(self.path / "rgb.txt") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ts, rel = line.split()[:2]
                rows.append((float(ts), rel))
        rows = rows[:: self.subsample]
        self.timestamps = np.asarray([r[0] for r in rows], np.float64)
        self.files = [self.path / r[1] for r in rows]

        seq = str(self.path).lower()
        for token, (fx, fy, cx, cy, dist) in _TUM_CALIB.items():
            if token in seq:
                self.camera_intrinsics = Intrinsics(640, 480, fx, fy, cx, cy, dist)
                self.use_calibration = bool(config.get("use_calib", False))
                break

    def __len__(self):
        return len(self.files)

    def read_img(self, idx):
        return _imread_rgb(self.files[idx])


# ---------------------------------------------------------------------------
# EuRoC MAV
# ---------------------------------------------------------------------------

class EurocDataset(MonocularDataset):
    """EuRoC cam0 grayscale stream; ALWAYS undistorted (reference
    dataloader.py:94-118)."""

    def __init__(self, path):
        super().__init__()
        self.path = pathlib.Path(path)
        cam = self.path / "mav0" / "cam0"
        files = natsorted((cam / "data").glob("*.png"))
        files = files[:: self.subsample]
        self.files = files
        self.timestamps = np.asarray(
            [float(f.stem) * 1e-9 for f in files], np.float64
        )
        fx, fy, cx, cy, dist, (w, h) = self._read_sensor_yaml(cam / "sensor.yaml")
        self.camera_intrinsics = Intrinsics(w, h, fx, fy, cx, cy, dist)
        # EuRoC images are heavily distorted: undistort regardless of use_calib.
        self.use_calibration = True

    @staticmethod
    def _read_sensor_yaml(path):
        import yaml

        with open(path) as f:
            d = yaml.safe_load(f)
        fx, fy, cx, cy = d["intrinsics"]
        k1, k2, p1, p2 = d["distortion_coefficients"]
        w, h = d["resolution"]
        return fx, fy, cx, cy, (k1, k2, p1, p2, 0.0), (w, h)

    def __len__(self):
        return len(self.files)

    def read_img(self, idx):
        g = cv2.imread(str(self.files[idx]), cv2.IMREAD_GRAYSCALE)
        if g is None:
            raise FileNotFoundError(self.files[idx])
        return cv2.cvtColor(g, cv2.COLOR_GRAY2RGB)


# ---------------------------------------------------------------------------
# ETH3D
# ---------------------------------------------------------------------------

class ETH3DDataset(MonocularDataset):
    """ETH3D SLAM sequences: rgb.txt + calibration.txt (reference
    dataloader.py:121-136)."""

    def __init__(self, path):
        super().__init__()
        self.path = pathlib.Path(path)
        rows = []
        with open(self.path / "rgb.txt") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ts, rel = line.split()[:2]
                rows.append((float(ts), rel))
        rows = rows[:: self.subsample]
        self.timestamps = np.asarray([r[0] for r in rows], np.float64)
        self.files = [self.path / r[1] for r in rows]

        calib_file = self.path / "calibration.txt"
        if calib_file.exists():
            fx, fy, cx, cy = np.loadtxt(calib_file).reshape(-1)[:4]
            img0 = _imread_rgb(self.files[0])
            h, w = img0.shape[:2]
            self.camera_intrinsics = Intrinsics(w, h, fx, fy, cx, cy, None)
            self.use_calibration = bool(config.get("use_calib", False))

    def __len__(self):
        return len(self.files)

    def read_img(self, idx):
        return _imread_rgb(self.files[idx])


# ---------------------------------------------------------------------------
# 7-Scenes
# ---------------------------------------------------------------------------

class SevenScenesDataset(MonocularDataset):
    """7-Scenes seq-01 color PNGs with the dataset's fixed 585/585/320/240
    intrinsics (reference dataloader.py:139-150)."""

    def __init__(self, path):
        super().__init__()
        self.path = pathlib.Path(path)
        seq = self.path / "seq-01" if (self.path / "seq-01").exists() else self.path
        self.files = natsorted(seq.glob("*.color.png"))[:: self.subsample]
        self.timestamps = np.arange(len(self.files), dtype=np.float64) / 30.0
        self.camera_intrinsics = Intrinsics(640, 480, 585, 585, 320, 240, None)
        self.use_calibration = bool(config.get("use_calib", False))

    def __len__(self):
        return len(self.files)

    def read_img(self, idx):
        return _imread_rgb(self.files[idx])


# ---------------------------------------------------------------------------
# Replica (fork addition)
# ---------------------------------------------------------------------------

class ReplicaDataset(MonocularDataset):
    """Replica renders: results/frame*.jpg + traj.txt timestamps +
    cam_params.json in any of 3 layouts (reference dataloader.py:279-472)."""

    def __init__(self, path):
        super().__init__()
        self.path = pathlib.Path(path)
        frames_dir = self.path / "results"
        if not frames_dir.exists():
            frames_dir = self.path
        self.files = natsorted(
            list(frames_dir.glob("frame*.jpg")) + list(frames_dir.glob("frame*.png"))
        )[:: self.subsample]
        n = len(self.files)
        traj = self.path / "traj.txt"
        if traj.exists():
            self.timestamps = np.arange(n, dtype=np.float64) / 30.0
        else:
            self.timestamps = np.arange(n, dtype=np.float64) / 30.0

        cam = self._find_cam_params()
        if cam is not None:
            w, h, fx, fy, cx, cy = cam
            self.camera_intrinsics = Intrinsics(w, h, fx, fy, cx, cy, None)
            self.use_calibration = bool(config.get("use_calib", False))

    def _find_cam_params(self):
        for cand in (
            self.path / "cam_params.json",
            self.path.parent / "cam_params.json",
            self.path.parent.parent / "cam_params.json",
        ):
            if cand.exists():
                with open(cand) as f:
                    d = json.load(f)
                # Accept {"camera": {...}}, flat {...}, or {"params": {...}}.
                cam = d.get("camera", d.get("params", d))
                try:
                    return (cam["w"], cam["h"], cam["fx"], cam["fy"],
                            cam["cx"], cam["cy"])
                except KeyError:
                    continue
        return None

    def __len__(self):
        return len(self.files)

    def read_img(self, idx):
        return _imread_rgb(self.files[idx])


# ---------------------------------------------------------------------------
# Video / image-folder / live sources
# ---------------------------------------------------------------------------

class MP4Dataset(MonocularDataset):
    """Any cv2-decodable video file (reference dataloader.py:233-267)."""

    def __init__(self, path):
        super().__init__()
        self.path = str(path)
        self.cap = cv2.VideoCapture(self.path)
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.total_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.stride = self.subsample
        self.timestamps = (
            np.arange(self.total_frames // self.stride, dtype=np.float64)
            * self.stride / self.fps
        )
        self._next = 0

    def __len__(self):
        return self.total_frames // self.stride

    def read_img(self, idx):
        target = idx * self.stride
        if target != self._next:
            self.cap.set(cv2.CAP_PROP_POS_FRAMES, target)
        ok, img = self.cap.read()
        self._next = target + 1
        if not ok:
            raise ValueError(f"failed to decode frame {target} of {self.path}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class RGBFiles(MonocularDataset):
    """Folder of PNG frames at an assumed 30 FPS (reference
    dataloader.py:270-276)."""

    def __init__(self, path):
        super().__init__()
        self.path = pathlib.Path(path)
        self.files = natsorted(self.path.glob("*.png"))[:: self.subsample]
        self.timestamps = np.arange(len(self.files), dtype=np.float64) / 30.0

    def __len__(self):
        return len(self.files)

    def read_img(self, idx):
        return _imread_rgb(self.files[idx])


class Webcam(MonocularDataset):
    """Live webcam stream — infinite length (reference dataloader.py:208-230)."""

    def __init__(self, device=0):
        super().__init__()
        self.cap = cv2.VideoCapture(int(device))
        if not self.cap.isOpened():
            raise RuntimeError("webcam not available")
        self.save_results = False
        self._t0 = None
        self.timestamps = []

    def __len__(self):
        return 999999999

    def read_img(self, idx):
        import time

        ok, img = self.cap.read()
        if not ok:
            raise RuntimeError("webcam read failed")
        now = time.time()
        if self._t0 is None:
            self._t0 = now
        self.timestamps.append(now - self._t0)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def __getitem__(self, idx):
        img = self.read_img(idx).astype(self.dtype) / 255.0
        return self.timestamps[-1], img


class RealsenseDataset(MonocularDataset):
    """Intel RealSense live stream (gated on pyrealsense2; reference
    dataloader.py:153-205)."""

    def __init__(self):
        super().__init__()
        try:
            import pyrealsense2 as rs
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "pyrealsense2 is not installed; RealSense capture unavailable"
            ) from e
        self.rs = rs
        self.pipeline = rs.pipeline()
        cfg = rs.config()
        cfg.enable_stream(rs.stream.color, 640, 480, rs.format.rgb8, 30)
        profile = self.pipeline.start(cfg)
        intr = (
            profile.get_stream(rs.stream.color)
            .as_video_stream_profile()
            .get_intrinsics()
        )
        self.camera_intrinsics = Intrinsics(
            intr.width, intr.height, intr.fx, intr.fy, intr.ppx, intr.ppy,
            tuple(intr.coeffs),
        )
        self.use_calibration = True
        self.save_results = False
        self._t0 = None
        self.timestamps = []

    def __len__(self):
        return 999999999

    def read_img(self, idx):
        frames = self.pipeline.wait_for_frames()
        color = frames.get_color_frame()
        ts = color.get_timestamp() / 1000.0
        if self._t0 is None:
            self._t0 = ts
        self.timestamps.append(ts - self._t0)
        return np.asanyarray(color.get_data())

    def __getitem__(self, idx):
        img = self.read_img(idx).astype(self.dtype) / 255.0
        if self.camera_intrinsics is not None:
            img = self.camera_intrinsics.remap(img)
        return self.timestamps[-1], img


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def load_dataset(path: str) -> MonocularDataset:
    """Path-token dispatch (reference dataloader.py:519-541)."""
    p = str(path).lower()
    if p in ("realsense", "rs"):
        return RealsenseDataset()
    if p in ("webcam", "cam") or p.startswith("webcam:"):
        dev = int(p.split(":")[1]) if ":" in p else 0
        return Webcam(dev)
    if p.endswith((".mp4", ".avi", ".mov", ".mkv")):
        return MP4Dataset(path)
    if "tum" in p or "freiburg" in p:
        return TUMDataset(path)
    if "euroc" in p or os.path.exists(os.path.join(path, "mav0")):
        return EurocDataset(path)
    if "7-scenes" in p or "7scenes" in p:
        return SevenScenesDataset(path)
    if "eth3d" in p:
        return ETH3DDataset(path)
    if "replica" in p or os.path.exists(os.path.join(path, "results")):
        return ReplicaDataset(path)
    if os.path.isdir(path):
        if list(pathlib.Path(path).glob("*.color.png")):
            return SevenScenesDataset(path)
        if os.path.exists(os.path.join(path, "rgb.txt")):
            return TUMDataset(path)
        return RGBFiles(path)
    raise ValueError(f"unrecognized dataset path: {path}")
