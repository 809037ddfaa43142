"""M-LSD line-segment detector (Flax) + host line decoding.

Behavior contract: reference `modules/annotator/mlsd/` (navervision
M-LSD, mlsd_large_512_fp32.pth):
- backbone (`models/mbv2_mlsd_large.py MobileNetV2`): 4-channel input
  (RGB + ones plane, all scaled x/127.5-1), truncated MobileNetV2
  (t,c,n,s rows (1,16,1,1),(6,24,2,2),(6,32,3,2),(6,64,4,2),(6,96,3,1)),
  ReLU6 ConvBNReLU with TFLite stride-2 padding (pad (0,1,0,1), VALID),
  FPN taps at features [1,3,6,10,13];
- head: BlockTypeA (1x1 conv+BN+ReLU on both inputs, x2 bilinear
  align_corners upsample of the deep path, concat), BlockTypeB
  (3x3 conv+BN+ReLU residual then projection), BlockTypeC (dilated-5
  3x3, 3x3, 1x1) -> 16ch tpMap, keep channels 7: -> 9ch at /2;
- decoding (`utils.py deccode_output_score_and_ptss` + `pred_lines`):
  sigmoid center channel, k-size max-pool NMS, top-200 peaks,
  displacement channels 1:5 give segment endpoints, thresholds on
  score and length, segments x2 then rescaled to the image;
- rendering (`__init__.py MLSDdetector.__call__`): 1px white lines on
  a black canvas.

BatchNorm running stats are loaded as parameters (inference only), so
module names flatten to the torch checkpoint keys mechanically.
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.dpt import PlainConv, upsample2x_align_corners


@dataclasses.dataclass(frozen=True)
class MLSDConfig:
    input_channel: int = 32
    # (expand_ratio t, out_ch c, repeats n, stride s)
    setting: Tuple[Tuple[int, int, int, int], ...] = (
        (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1))
    fpn_selected: Tuple[int, ...] = (1, 3, 6, 10, 13)
    head_dim: int = 64
    out_ch: int = 16
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32


class TorchBatchNorm(nn.Module):
    """Inference-mode BatchNorm with running stats as params (matches
    the torch state-dict keys weight/bias/running_mean/running_var)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("running_mean", nn.initializers.zeros, (c,),
                          jnp.float32)
        var = self.param("running_var", nn.initializers.ones, (c,),
                         jnp.float32)
        orig = x.dtype
        xf = x.astype(jnp.float32)
        return ((xf - mean) / jnp.sqrt(var + self.epsilon) * w + b).astype(
            orig)


class ConvBNReLU6(nn.Module):
    """ConvBNReLU: TFLite stride-2 padding, ReLU6.  name_prefix yields
    keys <prefix>.0 (conv), <prefix>.1 (bn)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    cfg: MLSDConfig = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        dd = dict(dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)
        if self.stride == 2:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = 0
        else:
            pad = (k - 1) // 2
        if self.groups == 1:
            h = PlainConv(self.features, k, self.stride, pad,
                          use_bias=False, name="0", **dd)(x)
        else:
            w = self.param("0_weight", nn.initializers.lecun_normal(),
                           (k, k, x.shape[-1] // self.groups, self.features),
                           self.cfg.param_dtype)
            h = lax.conv_general_dilated(
                x.astype(self.cfg.dtype), w.astype(self.cfg.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(pad, pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
                preferred_element_type=jnp.float32,
            ).astype(self.cfg.dtype)
        h = TorchBatchNorm(name="1")(h)
        return jnp.clip(h, 0.0, 6.0)


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int
    expand: int
    cfg: MLSDConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand))
        h = x
        i = 0
        if self.expand != 1:
            h = ConvBNReLU6(hidden, 1, 1, cfg=cfg, name=f"conv_{i}")(h)
            i += 1
        h = ConvBNReLU6(hidden, 3, self.stride, groups=hidden, cfg=cfg,
                        name=f"conv_{i}")(h)
        h = PlainConv(self.out_ch, 1, 1, 0, use_bias=False,
                      name=f"conv_{i + 1}", **dd)(h)
        h = TorchBatchNorm(name=f"conv_{i + 2}")(h)
        if self.stride == 1 and inp == self.out_ch:
            return x + h
        return h


class BlockTypeA(nn.Module):
    out_c1: int
    out_c2: int
    upscale: bool
    cfg: MLSDConfig

    @nn.compact
    def __call__(self, a, b):
        dd = dict(dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)

        def branch(x, out, name):
            h = PlainConv(out, 1, 1, 0, name=f"{name}_0", **dd)(x)
            return jax.nn.relu(TorchBatchNorm(name=f"{name}_1")(h))

        b = branch(b, self.out_c2, "conv1")
        a = branch(a, self.out_c1, "conv2")
        if self.upscale:
            b = upsample2x_align_corners(b)
        return jnp.concatenate([a, b], axis=-1)


class BlockTypeB(nn.Module):
    out_c: int
    cfg: MLSDConfig

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)
        h = PlainConv(x.shape[-1], 3, 1, 1, name="conv1_0", **dd)(x)
        h = jax.nn.relu(TorchBatchNorm(name="conv1_1")(h))
        x = h + x
        h = PlainConv(self.out_c, 3, 1, 1, name="conv2_0", **dd)(x)
        return jax.nn.relu(TorchBatchNorm(name="conv2_1")(h))


class BlockTypeC(nn.Module):
    out_c: int
    cfg: MLSDConfig

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)
        c = x.shape[-1]
        w = self.param("conv1_0_weight", nn.initializers.lecun_normal(),
                       (3, 3, c, c), self.cfg.param_dtype)
        wb = self.param("conv1_0_bias", nn.initializers.zeros, (c,),
                        self.cfg.param_dtype)
        h = lax.conv_general_dilated(
            x.astype(self.cfg.dtype), w.astype(self.cfg.dtype), (1, 1),
            padding=[(5, 5)] * 2, rhs_dilation=(5, 5),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(self.cfg.dtype)
        h = h + wb.astype(self.cfg.dtype)
        h = jax.nn.relu(TorchBatchNorm(name="conv1_1")(h))
        h = PlainConv(c, 3, 1, 1, name="conv2_0", **dd)(h)
        h = jax.nn.relu(TorchBatchNorm(name="conv2_1")(h))
        return PlainConv(self.out_c, 1, 1, 0, name="conv3", **dd)(h)


class MobileV2MLSDLarge(nn.Module):
    """(B, H, W, 4) -> (B, H/2, W/2, 9) tpMap (center + 4 displacement
    + 4 aux channels already sliced: output keeps channels 7:)."""

    cfg: MLSDConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        feats = {}
        h = ConvBNReLU6(cfg.input_channel, 3, 2, cfg=cfg,
                        name="backbone_features_0")(x.astype(cfg.dtype))
        idx = 1
        for t, c, n, s in cfg.setting:
            for i in range(n):
                h = InvertedResidual(c, s if i == 0 else 1, t, cfg,
                                     name=f"backbone_features_{idx}")(h)
                if idx in cfg.fpn_selected:
                    feats[idx] = h
                idx += 1
        c1, c2, c3, c4, c5 = (feats[i] for i in cfg.fpn_selected)

        d = cfg.head_dim
        h = BlockTypeA(d, d, False, cfg, name="block15")(c4, c5)
        h = BlockTypeB(d, cfg, name="block16")(h)
        h = BlockTypeA(d, d, True, cfg, name="block17")(c3, h)
        h = BlockTypeB(d, cfg, name="block18")(h)
        h = BlockTypeA(d, d, True, cfg, name="block19")(c2, h)
        h = BlockTypeB(d, cfg, name="block20")(h)
        h = BlockTypeA(d, d, True, cfg, name="block21")(c1, h)
        h = BlockTypeB(d, cfg, name="block22")(h)
        h = BlockTypeC(cfg.out_ch, cfg, name="block23")(h)
        return h[..., 7:]


# ---------------------------------------------------------------------------
# host decoding (utils.py pred_lines semantics)
# ---------------------------------------------------------------------------

def decode_lines(tpmap: np.ndarray, score_thr: float = 0.10,
                 dist_thr: float = 20.0, topk: int = 200,
                 ksize: int = 3) -> np.ndarray:
    """(h, w, 9) tpMap -> (N, 4) segments in tpMap pixel coords."""
    import cv2

    center = tpmap[:, :, 0]
    disp = tpmap[:, :, 1:5]
    heat = 1.0 / (1.0 + np.exp(-center.astype(np.float64)))
    hmax = cv2.dilate(heat, np.ones((ksize, ksize)))
    keep = (hmax == heat)
    flat = np.where(keep, heat, 0.0).reshape(-1)
    order = np.argsort(-flat)[:topk]
    w = tpmap.shape[1]
    segs = []
    start = disp[:, :, :2]
    end = disp[:, :, 2:]
    dist = np.sqrt(((start - end) ** 2).sum(-1))
    for idx in order:
        y, x = divmod(int(idx), w)
        if flat[idx] > score_thr and dist[y, x] > dist_thr:
            dx0, dy0, dx1, dy1 = disp[y, x]
            segs.append([x + dx0, y + dy0, x + dx1, y + dy1])
    return np.asarray(segs, np.float64).reshape(-1, 4)


class MLSDDetector:
    """Full MLSDdetector chain: resize 512, +ones channel, net, decode,
    draw 1px white lines on black (returns HWC uint8 RGB)."""

    def __init__(self, params, cfg: MLSDConfig = MLSDConfig(),
                 input_size: int = 512):
        model = MobileV2MLSDLarge(cfg)
        self._apply = jax.jit(lambda p, x: model.apply({"params": p}, x))
        self.params = params
        self.input_size = input_size

    def __call__(self, rgb_uint8: np.ndarray, thr_v: float = 0.1,
                 thr_d: float = 20.0) -> np.ndarray:
        import cv2

        h, w = rgb_uint8.shape[:2]
        s = self.input_size
        resized = cv2.resize(rgb_uint8, (s, s), interpolation=cv2.INTER_AREA)
        x = np.concatenate([resized.astype(np.float64),
                            np.ones((s, s, 1))], axis=-1)
        x = (x / 127.5) - 1.0
        tpmap = np.asarray(
            self._apply(self.params, jnp.asarray(x[None], jnp.float32)),
            np.float32)[0]
        segs = decode_lines(tpmap, thr_v, thr_d)
        out = np.zeros_like(rgb_uint8)
        lines = 2.0 * segs
        lines[:, 0] *= w / s
        lines[:, 2] *= w / s
        lines[:, 1] *= h / s
        lines[:, 3] *= h / s
        for x0, y0, x1, y1 in lines:
            cv2.line(out, (int(x0), int(y0)), (int(x1), int(y1)),
                     [255, 255, 255], 1)
        return out
