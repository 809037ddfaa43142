"""PNG generation-metadata round-trip.

Behavior contract (reference `sd/image_generator.py:1204-1212` save +
`modules/cremage/ui/generate_handler.py:274-279` "Use generation info"):
every generated image embeds its full generation-parameter dict as JSON
in the PNG tEXt key ``generation_data``, and any past image's metadata
can be replayed as the options for a new job (core/config.py
override_options)."""
from __future__ import annotations

import json
from typing import Any, Dict, Optional

import numpy as np
from PIL import Image
from PIL.PngImagePlugin import PngInfo

GENERATION_DATA_KEY = "generation_data"


def image_from_array(arr: np.ndarray) -> Image.Image:
    """float [-1,1] or [0,1] NHWC/HWC array -> PIL RGB image."""
    a = np.asarray(arr)
    if a.ndim == 4:
        a = a[0]
    a = a.astype(np.float32)
    if a.min() < -0.01:  # [-1,1] convention
        a = (a + 1.0) / 2.0
    a = np.clip(a, 0.0, 1.0)
    return Image.fromarray((a * 255).round().astype(np.uint8))


def array_from_image(img: Image.Image, signed: bool = True) -> np.ndarray:
    """PIL image -> float32 HWC in [-1,1] (signed) or [0,1]."""
    a = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return a * 2.0 - 1.0 if signed else a


def save_png_with_metadata(
    img: Image.Image, path: str, generation_data: Dict[str, Any] | str
) -> None:
    if not isinstance(generation_data, str):
        generation_data = json.dumps(generation_data)
    info = PngInfo()
    info.add_text(GENERATION_DATA_KEY, generation_data)
    img.save(path, pnginfo=info)


def read_generation_data(path: str) -> Optional[Dict[str, Any]]:
    with Image.open(path) as im:
        raw = im.info.get(GENERATION_DATA_KEY)
    if raw is None:
        return None
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        return None
