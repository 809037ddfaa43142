"""SegFormer semantic segmentation (Flax, HF key layout).

Role: the documented substitute for the reference's vendored Uniformer
`seg` ControlNet annotator (`modules/annotator/uniformer/`, 43k LoC of
mmseg — SURVEY.md calls out substitution) AND the Segformer
clothes-parser behind the segmentation-inpainting tool
(`tools/image_segmenter.py:32,90` loads
mattmdjaga/segformer_b2_clothes via transformers).

Architecture (HF transformers SegformerForSemanticSegmentation):
hierarchical MiT encoder — overlapping patch embeddings (k7s4 then
k3s2), efficient self-attention with spatial-reduction conv at ratios
(8,4,2,1), Mix-FFN (dense -> 3x3 depthwise conv -> GELU -> dense),
per-stage LayerNorm — and the all-MLP decode head: per-stage linear
projections, bilinear upsample to the /4 grid, concat (deep->shallow),
1x1 fuse conv + BN + ReLU, classifier conv.

Module names flatten to the HF checkpoint keys (segformer.encoder.*,
decode_head.*).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.dpt import PlainConv
from cremage_tpu.models.layers import Dense, LayerNorm
from cremage_tpu.models.mlsd import TorchBatchNorm


@dataclasses.dataclass(frozen=True)
class SegformerConfig:
    dims: Tuple[int, ...] = (64, 128, 320, 512)      # mit-b2
    heads: Tuple[int, ...] = (1, 2, 5, 8)
    blocks: Tuple[int, ...] = (3, 4, 6, 3)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    mlp_ratio: int = 4
    decoder_dim: int = 768
    num_classes: int = 18                             # clothes parser
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32


def segformer_b2_clothes_config(**kw) -> SegformerConfig:
    return SegformerConfig(**kw)


def segformer_b0_config(num_classes: int = 150, **kw) -> SegformerConfig:
    return SegformerConfig(dims=(32, 64, 160, 256), blocks=(2, 2, 2, 2),
                           decoder_dim=256, num_classes=num_classes, **kw)


class EfficientAttention(nn.Module):
    cfg: SegformerConfig
    dim: int
    heads: int
    sr: int

    @nn.compact
    def __call__(self, x, h, w):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, n, c = x.shape
        hd = c // self.heads
        q = Dense(c, name="self_query", **dd)(x)
        kv_in = x
        if self.sr > 1:
            spatial = x.reshape(b, h, w, c)
            spatial = PlainConv(c, self.sr, self.sr, 0,
                                name="self_sr", **dd)(spatial)
            kv_in = spatial.reshape(b, -1, c)
            kv_in = LayerNorm(name="self_layer_norm")(kv_in)
        k = Dense(c, name="self_key", **dd)(kv_in)
        v = Dense(c, name="self_value", **dd)(kv_in)
        m = kv_in.shape[1]
        q = q.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, self.heads, hd).transpose(0, 2, 1, 3)
        a = jax.nn.softmax(
            (q @ k.transpose(0, 1, 3, 2)).astype(jnp.float32)
            / math.sqrt(hd), axis=-1).astype(v.dtype)
        o = (a @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
        return Dense(c, name="output_dense", **dd)(o)


class MixFFN(nn.Module):
    cfg: SegformerConfig
    dim: int

    @nn.compact
    def __call__(self, x, h, w):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, n, c = x.shape
        hidden = c * cfg.mlp_ratio
        y = Dense(hidden, name="dense1", **dd)(x)
        sp = y.reshape(b, h, w, hidden)
        wk = self.param("dwconv_dwconv_weight",
                        nn.initializers.lecun_normal(),
                        (3, 3, 1, hidden), cfg.param_dtype)
        bk = self.param("dwconv_dwconv_bias", nn.initializers.zeros,
                        (hidden,), cfg.param_dtype)
        sp = lax.conv_general_dilated(
            sp.astype(cfg.dtype), wk.astype(cfg.dtype), (1, 1),
            padding=[(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=hidden,
            preferred_element_type=jnp.float32,
        ).astype(cfg.dtype) + bk.astype(cfg.dtype)
        y = nn.gelu(sp.reshape(b, n, hidden), approximate=False)
        return Dense(c, name="dense2", **dd)(y)


class SegformerBlock(nn.Module):
    cfg: SegformerConfig
    dim: int
    heads: int
    sr: int

    @nn.compact
    def __call__(self, x, h, w):
        a = EfficientAttention(self.cfg, self.dim, self.heads, self.sr,
                               name="attention")(
            LayerNorm(name="layer_norm_1")(x), h, w)
        x = x + a
        m = MixFFN(self.cfg, self.dim, name="mlp")(
            LayerNorm(name="layer_norm_2")(x), h, w)
        return x + m


class SegformerModel(nn.Module):
    """(B, H, W, 3) normalized image -> logits (B, H/4, W/4, classes)."""

    cfg: SegformerConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b = x.shape[0]
        E = "segformer_encoder_"
        feats = []
        h = x.astype(cfg.dtype)
        for s in range(4):
            k = 7 if s == 0 else 3
            stride = 4 if s == 0 else 2
            h = PlainConv(cfg.dims[s], k, stride, k // 2,
                          name=f"{E}patch_embeddings_{s}_proj", **dd)(h)
            hh, ww = h.shape[1], h.shape[2]
            t = h.reshape(b, hh * ww, cfg.dims[s])
            t = LayerNorm(name=f"{E}patch_embeddings_{s}_layer_norm")(t)
            for j in range(cfg.blocks[s]):
                t = SegformerBlock(cfg, cfg.dims[s], cfg.heads[s],
                                   cfg.sr_ratios[s],
                                   name=f"{E}block_{s}_{j}")(t, hh, ww)
            t = LayerNorm(name=f"{E}layer_norm_{s}")(t)
            h = t.reshape(b, hh, ww, cfg.dims[s])
            feats.append(h)

        # decode head: project, upsample to /4, concat deep->shallow
        target = feats[0].shape[1:3]
        proj = []
        for s, f in enumerate(feats):
            p = Dense(cfg.decoder_dim, name=f"decode_head_linear_c_{s}_proj",
                      **dd)(f)
            if p.shape[1:3] != target:
                p = jax.image.resize(
                    p.astype(jnp.float32),
                    (b, target[0], target[1], cfg.decoder_dim),
                    method="bilinear").astype(cfg.dtype)
            proj.append(p)
        h = jnp.concatenate(proj[::-1], axis=-1)
        h = PlainConv(cfg.decoder_dim, 1, 1, 0, use_bias=False,
                      name="decode_head_linear_fuse", **dd)(h)
        h = TorchBatchNorm(name="decode_head_batch_norm")(h)
        h = jax.nn.relu(h)
        return PlainConv(cfg.num_classes, 1, 1, 0,
                         name="decode_head_classifier", **dd)(h)


# ADE20K-style palette for the seg control image
# The published ADE20K palette (mmseg ADE20KDataset.PALETTE — what the
# reference's Uniformer seg annotator paints with and what ControlNet-seg
# checkpoints were trained on; reference
# modules/annotator/uniformer/mmseg/datasets/ade.py:40).  Flat RGB
# triplets for classes 0..149 ("wall" first: reduce_zero_label space).
_ADE20K_PALETTE = (
    120, 120, 120, 180, 120, 120, 6, 230, 230, 80, 50, 50, 4, 200, 3, 120, 120, 80,
    140, 140, 140, 204, 5, 255, 230, 230, 230, 4, 250, 7, 224, 5, 255, 235, 255, 7,
    150, 5, 61, 120, 120, 70, 8, 255, 51, 255, 6, 82, 143, 255, 140, 204, 255, 4,
    255, 51, 7, 204, 70, 3, 0, 102, 200, 61, 230, 250, 255, 6, 51, 11, 102, 255,
    255, 7, 71, 255, 9, 224, 9, 7, 230, 220, 220, 220, 255, 9, 92, 112, 9, 255,
    8, 255, 214, 7, 255, 224, 255, 184, 6, 10, 255, 71, 255, 41, 10, 7, 255, 255,
    224, 255, 8, 102, 8, 255, 255, 61, 6, 255, 194, 7, 255, 122, 8, 0, 255, 20,
    255, 8, 41, 255, 5, 153, 6, 51, 255, 235, 12, 255, 160, 150, 20, 0, 163, 255,
    140, 140, 140, 250, 10, 15, 20, 255, 0, 31, 255, 0, 255, 31, 0, 255, 224, 0,
    153, 255, 0, 0, 0, 255, 255, 71, 0, 0, 235, 255, 0, 173, 255, 31, 0, 255,
    11, 200, 200, 255, 82, 0, 0, 255, 245, 0, 61, 255, 0, 255, 112, 0, 255, 133,
    255, 0, 0, 255, 163, 0, 255, 102, 0, 194, 255, 0, 0, 143, 255, 51, 255, 0,
    0, 82, 255, 0, 255, 41, 0, 255, 173, 10, 0, 255, 173, 255, 0, 0, 255, 153,
    255, 92, 0, 255, 0, 255, 255, 0, 245, 255, 0, 102, 255, 173, 0, 255, 0, 20,
    255, 184, 184, 0, 31, 255, 0, 255, 61, 0, 71, 255, 255, 0, 204, 0, 255, 194,
    0, 255, 82, 0, 10, 255, 0, 112, 255, 51, 0, 255, 0, 194, 255, 0, 122, 255,
    0, 255, 163, 255, 153, 0, 0, 255, 10, 255, 112, 0, 143, 255, 0, 82, 0, 255,
    163, 255, 0, 255, 235, 0, 8, 184, 170, 133, 0, 255, 0, 255, 92, 184, 0, 255,
    255, 0, 31, 0, 184, 255, 0, 214, 255, 255, 0, 112, 92, 255, 0, 0, 224, 255,
    112, 224, 255, 70, 184, 160, 163, 0, 255, 153, 0, 255, 71, 255, 0, 255, 0, 163,
    255, 204, 0, 255, 0, 143, 0, 255, 235, 133, 255, 0, 255, 0, 235, 245, 0, 255,
    255, 0, 122, 255, 245, 0, 10, 190, 212, 214, 255, 0, 0, 204, 255, 20, 0, 255,
    255, 255, 0, 0, 153, 255, 0, 41, 255, 0, 255, 204, 41, 0, 255, 41, 255, 0,
    173, 0, 255, 0, 245, 255, 71, 0, 255, 122, 0, 255, 0, 255, 184, 0, 92, 255,
    184, 255, 0, 0, 133, 255, 255, 214, 0, 25, 194, 194, 102, 255, 0, 92, 0, 255,
)


def ade_palette() -> np.ndarray:
    """(256, 3) uint8: ADE20K colors for classes 0..149; deterministic
    filler colors above 149 (for non-ADE heads, e.g. the 18-class
    clothes parser, only used for display)."""
    pal = np.zeros((256, 3), np.uint8)
    pal[:150] = np.asarray(_ADE20K_PALETTE, np.uint8).reshape(150, 3)
    rng = np.random.RandomState(42)
    pal[150:] = rng.randint(0, 255, (106, 3), np.uint8)
    return pal


class SegformerSegmenter:
    """argmax class map upsampled to image size; returns (seg_rgb,
    class_map).  Normalization matches HF SegformerImageProcessor
    defaults (imagenet mean/std)."""

    MEAN = np.array([0.485, 0.456, 0.406], np.float32)
    STD = np.array([0.229, 0.224, 0.225], np.float32)

    def __init__(self, params, cfg: SegformerConfig):
        model = SegformerModel(cfg)
        self._apply = jax.jit(lambda p, x: model.apply({"params": p}, x))
        self.params = params
        self.cfg = cfg

    def logits(self, rgb_uint8: np.ndarray, size: int = 512) -> np.ndarray:
        import cv2

        h, w = rgb_uint8.shape[:2]
        img = cv2.resize(rgb_uint8, (size, size),
                         interpolation=cv2.INTER_LINEAR)
        x = (img.astype(np.float32) / 255.0 - self.MEAN) / self.STD
        out = np.asarray(self._apply(self.params, jnp.asarray(x[None])),
                         np.float32)[0]
        # bilinear logits upsample (mmseg/HF semantics); cv2.resize caps
        # the channel count, so chunk wide heads (e.g. ADE's 150)
        chunks = [cv2.resize(np.ascontiguousarray(out[..., i:i + 64]),
                             (w, h), interpolation=cv2.INTER_LINEAR)
                  for i in range(0, out.shape[-1], 64)]
        chunks = [c if c.ndim == 3 else c[..., None] for c in chunks]
        return np.concatenate(chunks, axis=-1)

    def class_map(self, rgb_uint8: np.ndarray, size: int = 512) -> np.ndarray:
        return self.logits(rgb_uint8, size).argmax(-1).astype(np.int32)

    def __call__(self, rgb_uint8: np.ndarray) -> np.ndarray:
        cls = self.class_map(rgb_uint8)
        return ade_palette()[cls % 256]
