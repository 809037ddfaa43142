"""Invisible watermark (DWT-DCT style, from scratch).

Behavior contract (reference `sd/image_generator.py:500 put_watermark`,
payload "StableDiffusionV1"; SDXL uses "Cremage",
`sdxl_image_generator.py:398`): generated images carry an invisible
payload recoverable by the matching decoder.

Implementation: quantization-index-modulation of mid-frequency DCT
coefficients of 8x8 blocks in the blue channel (scipy.fft.dctn) — a
self-contained equivalent of the `invisible-watermark` dependency (not
bit-compatible with it; that package is not in this environment).
Payload bits repeat cyclically over blocks and decode by majority vote,
so the mark survives mild quantization.
"""
from __future__ import annotations

import numpy as np
from scipy.fft import dctn, idctn

_DELTA = 36.0          # quantization step (invisible at 8-bit scale)
_COEF = (3, 2)         # mid-frequency DCT coefficient per 8x8 block
_BLOCK = 8

DEFAULT_PAYLOAD_SD15 = "StableDiffusionV1"
DEFAULT_PAYLOAD = "Cremage"


def _payload_bits(payload: str) -> np.ndarray:
    data = payload.encode("utf-8")
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    return bits


def embed_watermark(image: np.ndarray, payload: str = DEFAULT_PAYLOAD) -> np.ndarray:
    """image: HWC uint8 (or float [0,1]); returns same dtype."""
    as_float = np.issubdtype(image.dtype, np.floating)
    img = (image * 255.0) if as_float else image.astype(np.float64)
    img = np.asarray(img, np.float64).copy()
    chan = img[..., 2]  # blue
    h, w = chan.shape
    bits = _payload_bits(payload)
    nby, nbx = h // _BLOCK, w // _BLOCK
    bi = 0
    for by in range(nby):
        for bx in range(nbx):
            ys, xs = by * _BLOCK, bx * _BLOCK
            block = chan[ys:ys + _BLOCK, xs:xs + _BLOCK]
            d = dctn(block, norm="ortho")
            bit = bits[bi % len(bits)]
            c = d[_COEF]
            q = np.round(c / _DELTA)
            # QIM: even multiples encode 0, odd encode 1
            if int(q) % 2 != bit:
                q += 1 if c >= q * _DELTA else -1
            d[_COEF] = q * _DELTA
            chan[ys:ys + _BLOCK, xs:xs + _BLOCK] = idctn(d, norm="ortho")
            bi += 1
    img[..., 2] = np.clip(chan, 0, 255)
    if as_float:
        return (img / 255.0).astype(image.dtype)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def decode_watermark(image: np.ndarray, payload_len_bytes: int) -> bytes:
    as_float = np.issubdtype(image.dtype, np.floating)
    img = (image * 255.0) if as_float else image.astype(np.float64)
    chan = np.asarray(img, np.float64)[..., 2]
    h, w = chan.shape
    n_bits = payload_len_bytes * 8
    votes = np.zeros((n_bits, 2), np.int64)
    bi = 0
    for by in range(h // _BLOCK):
        for bx in range(w // _BLOCK):
            block = chan[by * _BLOCK:(by + 1) * _BLOCK,
                         bx * _BLOCK:(bx + 1) * _BLOCK]
            d = dctn(block, norm="ortho")
            bit = int(np.round(d[_COEF] / _DELTA)) % 2
            votes[bi % n_bits, bit] += 1
            bi += 1
    bits = (votes[:, 1] > votes[:, 0]).astype(np.uint8)
    return np.packbits(bits).tobytes()


def put_watermark_pil(img, payload: str = DEFAULT_PAYLOAD):
    """PIL convenience wrapper (reference put_watermark signature)."""
    from PIL import Image

    arr = np.asarray(img.convert("RGB"))
    return Image.fromarray(embed_watermark(arr, payload))
