"""HED (holistically-nested edge detection) network in Flax.

Behavior contract: reference `modules/annotator/hed/` (96 LoC torch):
VGG16 convolutional trunk, five side-output 1x1 score heads upsampled to
input size, sigmoid-fused mean — the standard ControlNet HED annotator.
Weights are a runtime download in the reference (ControlNet annotator
ckpt "network-bsds500.pth"); `load_hed` maps them mechanically.
"""
from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 stage layout: (convs per stage, channels)
_STAGES = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]


class HED(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [0,1] -> (B, H, W) soft edges in [0,1]."""
        from cremage_tpu.models.layers import Conv

        b, H, W, _ = x.shape
        # BGR mean subtraction (caffe-lineage weights)
        mean = jnp.asarray([0.485, 0.456, 0.406]) * 255.0
        h = x * 255.0 - mean
        sides: List[jnp.ndarray] = []
        for si, (n_convs, ch) in enumerate(_STAGES):
            for ci in range(n_convs):
                h = Conv(ch, name=f"stage{si+1}_conv{ci+1}", dtype=jnp.float32,
                         param_dtype=jnp.float32)(h)
                h = nn.relu(h)
            score = Conv(1, kernel_size=1, padding=0,
                         name=f"score{si+1}", dtype=jnp.float32,
                         param_dtype=jnp.float32)(h)
            score = jax.image.resize(score, (b, H, W, 1), "bilinear")
            sides.append(score)
            if si < len(_STAGES) - 1:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        fused = Conv(1, kernel_size=1, padding=0, name="fuse",
                     dtype=jnp.float32, param_dtype=jnp.float32)(
            jnp.concatenate(sides, axis=-1))
        return nn.sigmoid(fused)[..., 0]


_hed_cache = {}


def load_hed(weights_path: str):
    """Load converted HED weights (torch .pth with netVggOne..netScore*
    naming or our flattened naming) -> (model, params)."""
    import os

    if not os.path.exists(weights_path):
        raise FileNotFoundError(weights_path)
    if weights_path in _hed_cache:
        return _hed_cache[weights_path]
    from cremage_tpu.io.checkpoint import build_flax_params, load_state_dict

    sd = load_state_dict(weights_path)
    model = HED()
    tmpl = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.zeros((1, 64, 64, 3)))["params"]
    params, missing, _ = build_flax_params(tmpl, sd, prefix="", strict=False)
    _hed_cache[weights_path] = (model, {"params": params})
    return _hed_cache[weights_path]


def hed_annotate(image01: np.ndarray, weights_path: str) -> np.ndarray:
    """HWC [0,1] -> HWC uint8 edge map (annotator API contract)."""
    model, params = load_hed(weights_path)
    h, w = image01.shape[:2]
    # pad to /16 for the 4 pools
    ph, pw = -h % 16, -w % 16
    x = np.pad(image01, ((0, ph), (0, pw), (0, 0)), mode="edge")
    out = np.asarray(model.apply(params, jnp.asarray(x[None], jnp.float32)))
    edges = np.clip(out[0][:h, :w], 0, 1)
    return np.stack([np.uint8(edges * 255)] * 3, axis=-1)
