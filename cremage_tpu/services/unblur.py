"""Face unblur / colorize service.

Behavior contract: reference `modules/unblur_face/` (SURVEY item 34):
landmark-aligned 256^2 face crop (face_unblur.py:32-38 canonical
reference landmarks), a custom encoder-decoder CNN
(`UnblurCremageModelV6`, cremage_model_v6.py:400 — resnet-ish, channels
3→16→...→2048 over 8 stride-2 stages with attention at mid
resolutions), weights auto-downloaded; exposed as FaceFixer buttons.

Here: the alignment/unalignment geometry is implemented exactly (5-point
similarity transform to the canonical template, inverse paste-back);
the restoration net is the full CremageModelV6 port
(models/unblur_v6.py) with its torch weight converter, loaded from
UNBLUR_MODEL_PATH / COLORIZE_MODEL_PATH.
"""
from __future__ import annotations

import logging
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

# canonical 5-point face template (arcface 112 layout scaled to 256)
_TEMPLATE_112 = np.array([
    [38.2946, 51.6963], [73.5318, 51.5014], [56.0252, 71.7366],
    [41.5493, 92.3655], [70.7299, 92.2041],
], np.float32)
CANONICAL_LANDMARKS_256 = _TEMPLATE_112 * (256.0 / 112.0)


def align_face_256(
    image01: np.ndarray, landmarks: Sequence[Tuple[float, float]]
) -> Tuple[np.ndarray, np.ndarray]:
    """Similarity-align a face to the 256^2 canonical frame.

    Returns (aligned (256,256,3), M (2,3) transform for unalignment)."""
    import cv2

    src = np.asarray(landmarks, np.float32)
    M, _ = cv2.estimateAffinePartial2D(src, CANONICAL_LANDMARKS_256,
                                       method=cv2.LMEDS)
    aligned = cv2.warpAffine(np.asarray(image01, np.float32), M, (256, 256),
                             flags=cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_REFLECT)
    return aligned, M


def paste_back_aligned(
    base01: np.ndarray, face256: np.ndarray, M: np.ndarray
) -> np.ndarray:
    """Inverse-warp the processed 256^2 face back into the base image."""
    import cv2

    h, w = base01.shape[:2]
    Minv = cv2.invertAffineTransform(M)
    warped = cv2.warpAffine(np.asarray(face256, np.float32), Minv, (w, h),
                            flags=cv2.INTER_LINEAR)
    mask = cv2.warpAffine(np.ones((256, 256), np.float32), Minv, (w, h))
    mask = cv2.GaussianBlur(mask, (15, 15), 0)[..., None]
    return np.clip(base01 * (1 - mask) + warped * mask, 0, 1)


_net_cache = {}


def unblur_face_image(
    image01: np.ndarray,
    landmarks: Sequence[Tuple[float, float]],
    weights_path: Optional[str] = None,
    cfg=None,
) -> np.ndarray:
    """Align -> CremageModelV6 restore -> paste back (face_unblur.py
    semantics; weights via UNBLUR_MODEL_PATH or the argument — a
    runtime download in the reference)."""
    import os

    weights_path = weights_path or os.environ.get("UNBLUR_MODEL_PATH", "")
    if not weights_path or not os.path.exists(weights_path):
        raise RuntimeError(
            "unblur weights unavailable; set UNBLUR_MODEL_PATH (the "
            "reference auto-downloads its UnblurCremageModelV6 weights)")
    aligned, M = align_face_256(image01, landmarks)
    if weights_path not in _net_cache:
        from cremage_tpu.models.unblur_v6 import load_unblur_model

        _net_cache[weights_path] = load_unblur_model(weights_path, cfg)
    out = _net_cache[weights_path](aligned)
    return paste_back_aligned(image01, out, M)


def colorize_face_image(image01, landmarks, weights_path=None, cfg=None):
    """Colorize variant (reference exposes both buttons on FaceFixer;
    same CremageModelV6 architecture, different weights —
    COLORIZE_MODEL_PATH)."""
    import os

    weights_path = weights_path or os.environ.get("COLORIZE_MODEL_PATH", "")
    return unblur_face_image(image01, landmarks, weights_path, cfg)
