"""Image geometry utilities shared by tools and annotators.

Behavior contracts from the reference `modules/cremage/utils/
image_utils.py`:
- `bbox_for_multiple_of_64` (:228): round edges UP to the next multiple
  of 64 (annotator/control-image padding target); 0 stays 0.
- `resize_with_padding` (:257): aspect-preserving Lanczos resize onto a
  solid-color canvas; the leftover padding splits evenly with the extra
  odd pixel going to the left (width-limited case) or top
  (height-limited case), exactly as the reference computes it. Returns
  the composed image and optionally the unpadded bbox.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def bbox_for_multiple_of_64(width: int, height: int) -> Tuple[int, int]:
    def compute(edge_len: int) -> int:
        target = 64 * (edge_len // 64)
        if edge_len % 64 > 0:
            target += 64
        return target

    return compute(width), compute(height)


def resize_with_padding(
    image,
    *,
    target_width: int,
    target_height: int,
    color: str = "#ffffff",
    return_bbox: bool = False,
):
    """image: PIL Image (or HWC uint8 array). Matches the reference's
    ratio/odd-pad arithmetic exactly."""
    from PIL import Image

    if isinstance(image, np.ndarray):
        image = Image.fromarray(image)
    w, h = image.size
    if w == target_width and h == target_height:
        return (image, (0, 0, w, h)) if return_bbox else image

    base = Image.new("RGBA", (target_width, target_height), color)
    ratio_1 = target_width / w
    new_h = int(h * ratio_1)
    if new_h > target_height:          # height-limited: pad width
        ratio_2 = target_height / h
        new_w = int(w * ratio_2)
        new_h = target_height
        padding_w = target_width - new_w
        odd = 1 if padding_w % 2 else 0
        padding_x = padding_w // 2 + odd
        padding_y = 0
    else:                              # width-limited: pad height
        new_w = target_width
        padding_h = target_height - new_h
        odd = 1 if padding_h % 2 else 0
        padding_x = 0
        padding_y = padding_h // 2 + odd

    resized = image.resize((int(new_w), int(new_h)), resample=Image.LANCZOS)
    base.paste(resized, (padding_x, padding_y))
    if return_bbox:
        return base, (padding_x, padding_y, padding_x + new_w,
                      padding_y + new_h)
    return base


def pad_image_to_multiple_of_64(img: np.ndarray) -> Tuple[np.ndarray,
                                                          Tuple[int, int]]:
    """Edge-pad an HWC array to the 64-multiple bbox; returns the padded
    array and the original (h, w) for cropping back."""
    h, w = img.shape[:2]
    tw, th = bbox_for_multiple_of_64(w, h)
    ph, pw = th - h, tw - w
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)) + ((0, 0),) * (img.ndim - 2),
                     mode="edge")
    return img, (h, w)


_QUANT_JIT = None


def device_to_img01(imgs) -> np.ndarray:
    """Device [-1,1] decode output -> host float01, quantized to uint8
    ON DEVICE before the pull: the serving path ships 8-bit PNG pixels
    anyway (io/metadata.image_from_array) and pulling fp32 costs 4x the
    bytes (measured ~0.5 s per 512^2 batch-4 on the 23 MB/s tunnel
    link).  /255 restores the [0,1] float API for the downstream
    consumers (safety / face fix / watermark) at PNG-identical
    precision: image_from_array's (a*255).round() reproduces the same
    uint8 exactly.

    The quantize chain is ONE jitted program, not eager ops: each
    eager op is its own device dispatch, and dispatches through the
    axon tunnel are expensive enough (measured: the eager 6-op chain
    doubled warm pipeline jobs 4.6 s -> 9.0 s) to erase the transfer
    win."""
    global _QUANT_JIT
    import jax
    import jax.numpy as jnp

    if _QUANT_JIT is None:
        _QUANT_JIT = jax.jit(lambda x: jnp.clip(
            (x.astype(jnp.float32) + 1.0) * 127.5 + 0.5,
            0, 255).astype(jnp.uint8))
    return np.asarray(_QUANT_JIT(imgs)).astype(np.float32) / 255.0
