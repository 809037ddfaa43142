"""ControlNet control-image annotators.

Behavior contract: reference `modules/cremage/control_net/
annotator_wrapper.py:68-221` uniform API (generate_canny / generate_hed /
generate_depth_map / generate_normal_map / generate_open_pose /
generate_scribble / generate_mlsd / generate_seg), each mapping an input
RGB image to a control image.

Implementation strategy on TPU/this environment:
- canny: OpenCV (reference `modules/annotator/canny` is also cv2) — full
  parity;
- scribble: reference derives it from HED + threshold; here derived from
  soft edges (cv2) with the same binarize step;
- hed / depth / normal / openpose / mlsd / seg are neural annotators in
  the reference (vendored torch models with downloaded weights). They are
  registered behind the same API and raise a clear WeightsUnavailable
  error until their Flax ports + weights land — the reference also
  downloads these weights at first use, so "no weights yet" is an
  existing product state, not a regression.

All functions take/return HWC uint8 RGB numpy arrays (reference
convention) with the input padded to a multiple of 64 by the caller.
"""
from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from cremage_tpu.core.registry import ANNOTATORS


class WeightsUnavailable(RuntimeError):
    def __init__(self, name: str):
        super().__init__(
            f"annotator {name!r} needs model weights; download them into the "
            f"models directory (the reference downloads these lazily too)"
        )


def _to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    return img


@ANNOTATORS.register("canny")
def generate_canny(img: np.ndarray, low_threshold: int = 100,
                   high_threshold: int = 200) -> np.ndarray:
    import cv2

    img = _to_uint8(img)
    edges = cv2.Canny(img, low_threshold, high_threshold)
    return np.stack([edges] * 3, axis=-1)


@ANNOTATORS.register("scribble")
def generate_scribble(img: np.ndarray, threshold: int = 32) -> np.ndarray:
    """Reference pipeline: soft edge map -> binarize (annotator_wrapper
    generate_scribble: hed > threshold -> 255)."""
    import cv2

    img = _to_uint8(img)
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    gx = cv2.Sobel(gray, cv2.CV_32F, 1, 0, ksize=3)
    gy = cv2.Sobel(gray, cv2.CV_32F, 0, 1, ksize=3)
    mag = np.sqrt(gx**2 + gy**2)
    mag = (mag / (mag.max() + 1e-8) * 255).astype(np.uint8)
    out = np.zeros_like(mag)
    out[mag > threshold] = 255
    return np.stack([out] * 3, axis=-1)


@ANNOTATORS.register("hed")
def generate_hed(img: np.ndarray, weights_path: str | None = None) -> np.ndarray:
    """HED soft edges via the Flax net (models/hed.py); weights from
    HED_MODEL_PATH or the explicit argument (runtime download in the
    reference too)."""
    import os

    from cremage_tpu.models.hed import hed_annotate

    weights_path = weights_path or os.environ.get("HED_MODEL_PATH", "")
    if not weights_path or not os.path.exists(weights_path):
        raise WeightsUnavailable("hed")
    img01 = _to_uint8(img).astype(np.float32) / 255.0
    return hed_annotate(img01, weights_path)


def _needs_weights(name: str) -> Callable:
    def fn(img: np.ndarray, **kw):
        raise WeightsUnavailable(name)

    fn.__name__ = f"generate_{name}"
    return fn


for _name in ("depth", "normal", "openpose", "mlsd", "seg"):
    if _name not in ANNOTATORS:
        ANNOTATORS.register(_name, _needs_weights(_name))


def annotate(name: str, img: np.ndarray, **kwargs) -> np.ndarray:
    return ANNOTATORS.get(name)(img, **kwargs)
