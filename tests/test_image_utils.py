"""Image geometry utils vs the reference's own unit tests
(test/cremage/utils/image_utils_test.py goldens)."""
import numpy as np
from PIL import Image

from cremage_tpu.utils.image import (
    bbox_for_multiple_of_64, pad_image_to_multiple_of_64,
    resize_with_padding,
)


def test_bbox_for_multiple_of_64_reference_goldens():
    assert bbox_for_multiple_of_64(0, 0) == (0, 0)
    assert bbox_for_multiple_of_64(0, 1) == (0, 64)
    assert bbox_for_multiple_of_64(1, 0) == (64, 0)
    assert bbox_for_multiple_of_64(1, 1) == (64, 64)
    assert bbox_for_multiple_of_64(63, 63) == (64, 64)
    assert bbox_for_multiple_of_64(64, 64) == (64, 64)
    assert bbox_for_multiple_of_64(65, 65) == (128, 128)


def test_resize_with_padding_reference_goldens():
    rng = np.random.RandomState(0)
    for (h, w, tw, th) in [(240, 120, 768, 120), (241, 120, 768, 120),
                           (240, 121, 768, 120), (240, 121, 125, 240)]:
        img = Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8))
        out = resize_with_padding(img, target_width=tw, target_height=th)
        assert out.size == (tw, th)
    # bbox marks the unpadded area
    img = Image.fromarray((rng.rand(100, 50, 3) * 255).astype(np.uint8))
    out, bbox = resize_with_padding(img, target_width=100, target_height=100,
                                    return_bbox=True)
    x1, y1, x2, y2 = bbox
    assert out.size == (100, 100)
    assert (x2 - x1) == 50 and (y2 - y1) == 100


def test_pad_image_to_multiple_of_64():
    img = np.zeros((70, 100, 3), np.float32)
    padded, (h, w) = pad_image_to_multiple_of_64(img)
    assert padded.shape == (128, 128, 3) and (h, w) == (70, 100)
    same, _ = pad_image_to_multiple_of_64(np.zeros((64, 64, 3)))
    assert same.shape == (64, 64, 3)
