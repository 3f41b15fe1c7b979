"""Real raster kernels, pure numpy: resize / normalize / tensorize /
channel fixups over decoded (h, w, 3) uint8 arrays.

These are the M1-M3 / M10-M11 preprocessing semantics of the
reference (resize + normalize + tensorize before the CRAFT forward,
reference std-detection/imgproc.py; BGR/RGB channel fixups,
std-detection/file_utils.py) implemented as actual array math — no
PIL/cv2 needed — so the multimodal stages run real compute on any
raster the decoders produce (e.g. functions/ppm_ocr.py P6 payloads).
"""

from __future__ import annotations

import numpy as np


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index sampling (exact, branch-free)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) + 0.5) * h / out_h, h - 1).astype(np.int64)
    xs = np.minimum((np.arange(out_w) + 0.5) * w / out_w, w - 1).astype(np.int64)
    return img[ys[:, None], xs[None, :]]


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize (align_corners=False convention, the cv2/PIL
    default): fractional source coords, 4-tap weighted blend."""
    h, w = img.shape[:2]
    fy = np.clip((np.arange(out_h) + 0.5) * h / out_h - 0.5, 0, h - 1)
    fx = np.clip((np.arange(out_w) + 0.5) * w / out_w - 0.5, 0, w - 1)
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (fy - y0)[:, None, None]
    wx = (fx - x0)[None, :, None]
    a = img[y0[:, None], x0[None, :]].astype(np.float64)
    b = img[y0[:, None], x1[None, :]].astype(np.float64)
    c = img[y1[:, None], x0[None, :]].astype(np.float64)
    d = img[y1[:, None], x1[None, :]].astype(np.float64)
    out = a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ImageNet-style defaults — what the reference normalizes with before
# the CRAFT forward (std-detection/imgproc.py normalizeMeanVariance)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize_tensor(
    img: np.ndarray,
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
) -> np.ndarray:
    """uint8 HWC -> float32 CHW in [(x/255 - mean) / std] — the
    model-input tensorize step (M3)."""
    x = img.astype(np.float32) / 255.0
    x = (x - mean) / std
    return np.ascontiguousarray(x.transpose(2, 0, 1))


def rgb_to_bgr(img: np.ndarray) -> np.ndarray:
    """Channel-order fixup (M10): cv2-world consumers expect BGR."""
    return img[:, :, ::-1]


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma — the STR recognizer's grayscale input (M6
    analog, str-recognition model takes 1-channel input)."""
    w = np.array([0.299, 0.587, 0.114], dtype=np.float32)
    return np.clip(np.rint(img.astype(np.float32) @ w), 0, 255).astype(np.uint8)
