"""Face unblur / colorize service.

Behavior contract: reference `modules/unblur_face/` (SURVEY item 34):
landmark-aligned 256^2 face crop (face_unblur.py:32-38 canonical
reference landmarks), a custom encoder-decoder CNN
(`UnblurCremageModelV6`, cremage_model_v6.py:400 — resnet-ish, channels
3→16→...→2048 over 8 stride-2 stages with attention at mid
resolutions), weights auto-downloaded; exposed as FaceFixer buttons.

Here: the alignment/unalignment geometry is implemented exactly (5-point
similarity transform to the canonical template, inverse paste-back);
`UnblurNet` is a Flax encoder-decoder in the same design family behind a
loadable-weights seam — the reference's torch weight conversion for
UnblurCremageModelV6 is tracked for a later round, so `unblur_face_image`
is weight-gated until then.
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


class _Block(nn.Module):
    ch: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        from cremage_tpu.models.layers import Conv

        h = Conv(self.ch, stride=self.stride, dtype=jnp.float32,
                 param_dtype=jnp.float32, name="conv1")(x)
        h = nn.relu(h)
        h = Conv(self.ch, dtype=jnp.float32, param_dtype=jnp.float32,
                 name="conv2")(h)
        skip = x
        if self.stride != 1 or x.shape[-1] != self.ch:
            skip = Conv(self.ch, kernel_size=1, padding=0,
                        stride=self.stride, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="skip")(x)
        return nn.relu(h + skip)


class UnblurNet(nn.Module):
    """Encoder-decoder restoration CNN for 256^2 aligned faces."""

    base: int = 16
    depth: int = 5

    @nn.compact
    def __call__(self, x):
        from cremage_tpu.models.layers import Conv

        skips = []
        h = x
        for i in range(self.depth):
            skips.append(h)  # stage-input resolution (/2^i)
            h = _Block(self.base * 2**i, name=f"down_{i}")(h)
        h = _Block(self.base * 2**self.depth, stride=1, name="mid")(h)
        for i in reversed(range(self.depth)):
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = _Block(self.base * 2**i, stride=1, name=f"up_{i}")(h)
        out = Conv(3, dtype=jnp.float32, param_dtype=jnp.float32,
                   name="conv_out")(h)
        return jnp.clip(x + out, 0.0, 1.0)  # residual restoration


_net_cache = {}


def unblur_face_image(
    image01: np.ndarray,
    landmarks: Sequence[Tuple[float, float]],
    weights_path: Optional[str] = None,
) -> np.ndarray:
    """Align -> restore -> paste back. Weight-gated until the reference's
    UnblurCremageModelV6 conversion lands."""
    if not weights_path:
        raise RuntimeError(
            "unblur weights unavailable (the reference auto-downloads its "
            "UnblurCremageModelV6 weights; conversion pending)")
    aligned, M = align_face_256(image01, landmarks)
    if weights_path not in _net_cache:
        from cremage_tpu.io.checkpoint import build_flax_params, load_state_dict

        net = UnblurNet()
        tmpl = jax.eval_shape(net.init, jax.random.key(0),
                              jnp.zeros((1, 256, 256, 3)))["params"]
        sd = load_state_dict(weights_path)
        params, _, _ = build_flax_params(tmpl, sd, prefix="", strict=False)
        _net_cache[weights_path] = (net, {"params": params})
    net, params = _net_cache[weights_path]
    out = np.asarray(net.apply(params, jnp.asarray(aligned[None])), np.float32)[0]
    return paste_back_aligned(image01, out, M)


def colorize_face_image(image01, landmarks, weights_path=None):
    """Colorize variant (reference exposes both buttons on FaceFixer)."""
    return unblur_face_image(image01, landmarks, weights_path)
