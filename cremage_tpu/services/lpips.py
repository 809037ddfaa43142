"""LPIPS perceptual distance (v0.1 semantics) in Flax.

Implements the Learned Perceptual Image Patch Similarity metric used by
the real-checkpoint parity harness (tools/parity_lpips.py): a frozen
classification trunk (AlexNet or VGG16, torchvision layouts), per-tap
channel unit-normalization, squared feature differences, and the
calibrated 1x1 "lin" heads of the official lpips v0.1 release, spatially
averaged and summed over taps.

Weight layout (torch -> flax via io/checkpoint.build_flax_params):
  trunk  torchvision keys   features.{idx}.weight/.bias  -> net.features_{idx}.*
  heads  lpips v0.1 keys    lin{i}.model.1.weight        -> lin{i}_model_1_weight
A combined state dict with "net."-prefixed trunk keys is also accepted.
The fixed input scaling constants (scaling_layer.shift/.scale buffers in
the lpips checkpoints) are hardcoded; those buffer keys are ignored.

The reference repo has no LPIPS of its own (it relies on eyeballing);
this module exists to hold our ports to the judged LPIPS<=0.01 parity
bar against CUDA-reference renders.
"""
from __future__ import annotations

import os
from typing import Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.layers import Conv

# lpips v0.1 ScalingLayer constants (identical across alex/vgg/squeeze).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_EPS = 1e-10


def _max_pool(x, window, stride):
    return nn.max_pool(x, (window, window), strides=(stride, stride))


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet .features trunk, returning the 5 ReLU taps
    (relu1..relu5) used by lpips. NHWC activations, float32 compute."""

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        dd = dict(dtype=jnp.float32, param_dtype=jnp.float32)
        taps = []
        x = Conv(64, kernel_size=11, stride=4, padding=2,
                 name="features_0", **dd)(x)
        x = nn.relu(x); taps.append(x)
        x = _max_pool(x, 3, 2)
        x = Conv(192, kernel_size=5, padding=2, name="features_3", **dd)(x)
        x = nn.relu(x); taps.append(x)
        x = _max_pool(x, 3, 2)
        x = Conv(384, kernel_size=3, padding=1, name="features_6", **dd)(x)
        x = nn.relu(x); taps.append(x)
        x = Conv(256, kernel_size=3, padding=1, name="features_8", **dd)(x)
        x = nn.relu(x); taps.append(x)
        x = Conv(256, kernel_size=3, padding=1, name="features_10", **dd)(x)
        x = nn.relu(x); taps.append(x)
        return tuple(taps)


class VGG16Features(nn.Module):
    """torchvision VGG16 .features trunk, returning taps at
    relu1_2/relu2_2/relu3_3/relu4_3/relu5_3 (lpips 'vgg')."""

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        dd = dict(dtype=jnp.float32, param_dtype=jnp.float32)
        # (conv feature sizes, torchvision features indices)
        plan = [  # per stage: [(out_ch, idx), ...] then pool except last tap
            [(64, 0), (64, 2)],
            [(128, 5), (128, 7)],
            [(256, 10), (256, 12), (256, 14)],
            [(512, 17), (512, 19), (512, 21)],
            [(512, 24), (512, 26), (512, 28)],
        ]
        taps = []
        for s, stage in enumerate(plan):
            if s > 0:
                x = _max_pool(x, 2, 2)
            for ch, idx in stage:
                x = Conv(ch, kernel_size=3, padding=1,
                         name=f"features_{idx}", **dd)(x)
                x = nn.relu(x)
            taps.append(x)
        return tuple(taps)


_TAP_CHANNELS = {
    "alex": (64, 192, 384, 256, 256),
    "vgg": (64, 128, 256, 512, 512),
}


def _unit_normalize(x):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + _EPS)


class LPIPSModel(nn.Module):
    """LPIPS distance head. Inputs are NHWC RGB in [-1, 1]."""

    net: str = "alex"  # "alex" | "vgg"

    @nn.compact
    def __call__(self, x0, x1) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        trunk = (AlexNetFeatures if self.net == "alex"
                 else VGG16Features)(name="net")
        f0 = trunk((x0.astype(jnp.float32) - shift) / scale)
        f1 = trunk((x1.astype(jnp.float32) - shift) / scale)
        total = jnp.zeros((x0.shape[0],), jnp.float32)
        for i, (a, b) in enumerate(zip(f0, f1)):
            d = jnp.square(_unit_normalize(a) - _unit_normalize(b))
            w = self.param(
                f"lin{i}_model_1_weight",
                nn.initializers.ones,
                (1, 1, d.shape[-1], 1),
                jnp.float32,
            )
            # 1x1 conv == channel-weighted sum; then spatial average.
            total = total + jnp.mean(
                jnp.einsum("bhwc,c->bhw", d, w[0, 0, :, 0]), axis=(1, 2)
            )
        return total


def merge_lpips_state_dict(
    trunk_sd: Optional[Mapping[str, np.ndarray]] = None,
    lin_sd: Optional[Mapping[str, np.ndarray]] = None,
) -> Dict[str, np.ndarray]:
    """Normalize the two torch checkpoints into one state dict keyed the
    way LPIPSModel's params flatten: trunk keys gain the 'net.' scope,
    already-combined dicts pass through, scaling buffers are dropped."""
    out: Dict[str, np.ndarray] = {}
    for sd in (trunk_sd or {}, lin_sd or {}):
        for k, v in sd.items():
            if k.startswith("scaling_layer."):
                continue
            if k.startswith("lin") or k.startswith("net."):
                out[k] = v
            elif k.startswith("features."):
                out["net." + k] = v
            # torchvision classifier.* heads are unused by lpips
    return out


class LPIPS:
    """Callable metric. Build from torch checkpoints (load()) or random
    params (random() — differential tests / smoke runs)."""

    def __init__(self, model: LPIPSModel, params):
        self.model = model
        self.params = params
        self._fn = jax.jit(model.apply)

    @classmethod
    def load(cls, trunk_path: Optional[str] = None,
             lin_path: Optional[str] = None, net: str = "alex") -> "LPIPS":
        from cremage_tpu.io import checkpoint as CK

        trunk_path = trunk_path or os.environ.get("LPIPS_TRUNK_PATH")
        lin_path = lin_path or os.environ.get("LPIPS_LIN_PATH")
        if not trunk_path:
            raise FileNotFoundError(
                "LPIPS trunk weights not provided (LPIPS_TRUNK_PATH)")
        trunk_sd = CK.load_state_dict(trunk_path)
        lin_sd = CK.load_state_dict(lin_path) if lin_path else {}
        sd = merge_lpips_state_dict(trunk_sd, lin_sd)
        model = LPIPSModel(net=net)
        tmpl = jax.eval_shape(
            model.init, jax.random.key(0),
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
        )["params"]
        strict_lin = any(k.startswith("lin") for k in sd)
        params, missing, _ = CK.build_flax_params(
            tmpl, sd, prefix="", strict=strict_lin)
        if missing:  # uncalibrated heads default to uniform weights
            for m in missing:
                params[m] = jnp.ones(tmpl[m].shape, jnp.float32)
        return cls(model, {"params": params})

    @classmethod
    def random(cls, net: str = "alex", seed: int = 0) -> "LPIPS":
        model = LPIPSModel(net=net)
        params = model.init(
            jax.random.key(seed),
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
        )
        return cls(model, params)

    def __call__(self, img0: np.ndarray, img1: np.ndarray) -> np.ndarray:
        """img*: (H,W,3) or (B,H,W,3), float in [0,1] or uint8.
        Returns per-image LPIPS distances, shape (B,)."""
        def prep(im):
            im = np.asarray(im)
            if im.dtype == np.uint8:
                im = im.astype(np.float32) / 255.0
            im = im.astype(np.float32) * 2.0 - 1.0
            if im.ndim == 3:
                im = im[None]
            return im

        return np.asarray(self._fn(self.params, prep(img0), prep(img1)))
