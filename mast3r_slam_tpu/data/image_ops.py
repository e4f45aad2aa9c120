"""Host-side image preprocessing for model ingestion.

Functional equivalent of the reference's ``resize_img`` pipeline (reference:
mast3r_slam/mast3r_utils.py:236-278): resize so the long edge is 512 (or the
short edge 224 with a square center-crop), then center-crop height/width to
multiples of 16 so the ViT patchifier tiles exactly. Implemented with cv2
area/lanczos interpolation on numpy arrays (no PIL round-trip), returning both
the ImgNorm'd model input ([-1, 1]) and the display image ([0, 1]).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the target image
    cv2 = None


def _resize_long_edge(img: np.ndarray, target: int) -> np.ndarray:
    h, w = img.shape[:2]
    s = target / max(h, w)
    interp = cv2.INTER_AREA if s < 1.0 else cv2.INTER_LANCZOS4
    return cv2.resize(img, (round(w * s), round(h * s)), interpolation=interp)


def _resize_short_to(img: np.ndarray, target: int) -> np.ndarray:
    h, w = img.shape[:2]
    long_edge = round(target * max(w / h, h / w))
    return _resize_long_edge(img, long_edge)


def resize_img(img: np.ndarray, size: int = 512, square_ok: bool = False,
               return_transformation: bool = False):
    """``img (H, W, 3) float32 [0, 1]`` → dict(img, true_shape, unnormalized_img).

    ``img`` out is ``(1, H', W', 3)`` normalized to [-1, 1] (mean .5, std .5);
    ``true_shape`` is ``[[H', W']]``; ``unnormalized_img`` is uint8.
    With ``return_transformation``, also returns
    ``(scale_w, scale_h, half_crop_w, half_crop_h)`` mapping original pixel
    coords to crop coords (used to rescale calibration intrinsics).
    """
    # 224 = square mode (short-edge resize + square crop); any other size is
    # long-edge mode (512 in production; smaller values for fast CPU tests).
    h1, w1 = img.shape[:2]
    if size == 224:
        r = _resize_short_to(img, size)
    else:
        r = _resize_long_edge(img, size)
    h, w = r.shape[:2]
    cx, cy = w // 2, h // 2
    if size == 224:
        half = min(cx, cy)
        crop = r[cy - half: cy + half, cx - half: cx + half]
    else:
        halfw = (w // 16) * 8
        halfh = (h // 16) * 8
        if not square_ok and w == h:
            halfh = int(3 * halfw / 4)
        crop = r[cy - halfh: cy + halfh, cx - halfw: cx + halfw]

    ch, cw = crop.shape[:2]
    out = {
        "img": (crop.astype(np.float32) * 2.0 - 1.0)[None],
        "true_shape": np.asarray([[ch, cw]], np.int32),
        "unnormalized_img": np.clip(crop * 255.0, 0, 255).astype(np.uint8),
    }
    if return_transformation:
        scale_w = w1 / w
        scale_h = h1 / h
        half_crop_w = (w - cw) / 2
        half_crop_h = (h - ch) / 2
        return out, (scale_w, scale_h, half_crop_w, half_crop_h)
    return out
