"""DPT-Hybrid (MiDaS) monocular depth estimator in Flax.

Architecture contract: reference `modules/annotator/midas/` (isl-org
MiDaS `dpt_hybrid` as used by MidasDetector, `midas/__init__.py:15`):
timm `vit_base_resnet50_384` hybrid backbone — a BiT ResNetV2 stem
(weight-standardized SAME-padding convs + GroupNorm32/ReLU, stages
(3,4,9)) feeding 16x16-patch embeddings into a 12-layer ViT-B — with
DPT reassemble/fusion (`midas/vit.py`, `midas/blocks.py`,
`midas/dpt_depth.py`):
- hooks: resnet stage0 (/4), stage1 (/8), ViT blocks 8 and 11;
- token hooks go through a "project" readout (cat cls token ->
  Linear(2d, d) + GELU), unflatten to /16, 1x1 conv to 768 (+ 3x3
  stride-2 conv for the /32 path);
- scratch: bias-free 3x3 convs to `features`, 4 fusion refinenets
  (ResidualConvUnit pairs + x2 bilinear align_corners upsample), head
  conv 256->128 -> x2 up -> conv 128->32 -> ReLU -> 1x1 -> ReLU.

Module names flatten to the ISL checkpoint keys (`pretrained.model.*`,
`scratch.*` in dpt_hybrid-midas-501f0c75.pt) so loading is the repo's
mechanical name transform.  Position embeddings are bilinear-resized
for non-384 inputs (forward_flex semantics); shapes stay static under
jit per resolution bucket.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.layers import Dense, LayerNorm


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    stem_ch: int = 64
    stage_blocks: Tuple[int, ...] = (3, 4, 9)
    vit_dim: int = 768
    vit_layers: int = 12
    vit_heads: int = 12
    vit_mlp_ratio: int = 4
    hooks: Tuple[int, int] = (8, 11)   # ViT block taps
    features: int = 256                 # scratch width
    patch_grid: int = 24                # pos-embed grid (384/16)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @property
    def stage_out(self) -> Tuple[int, ...]:
        # BiT widths: stage i outputs stem_ch * 4 * 2^i
        return tuple(self.stem_ch * 4 * (2 ** i)
                     for i in range(len(self.stage_blocks)))


def dpt_hybrid_config(**kw) -> DPTConfig:
    return DPTConfig(**kw)


class StdConvSame(nn.Module):
    """Weight-standardized conv with TF SAME padding (timm
    StdConv2dSame: per-filter (w-mean)/sqrt(var+eps), eps=1e-6,
    biased variance)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (k, k, x.shape[-1], self.features), self.param_dtype)
        wf = w.astype(jnp.float32)
        mean = wf.mean(axis=(0, 1, 2), keepdims=True)
        var = wf.var(axis=(0, 1, 2), keepdims=True)
        wf = (wf - mean) / jnp.sqrt(var + 1e-6)
        return lax.conv_general_dilated(
            x.astype(self.dtype), wf.astype(self.dtype),
            window_strides=(self.stride, self.stride), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)


class GroupNormAct(nn.Module):
    """GroupNorm(32) + optional ReLU (timm GroupNormAct)."""

    groups: int = 32
    apply_act: bool = True
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = min(self.groups, c)
        scale = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        orig = x.dtype
        xf = x.astype(jnp.float32)
        b, h, w, _ = xf.shape
        xg = xf.reshape(b, h, w, g, c // g)
        mean = xg.mean(axis=(1, 2, 4), keepdims=True)
        var = xg.var(axis=(1, 2, 4), keepdims=True)
        xg = (xg - mean) / jnp.sqrt(var + self.epsilon)
        xf = xg.reshape(b, h, w, c) * scale + bias
        if self.apply_act:
            xf = jax.nn.relu(xf)
        return xf.astype(orig)


class PlainConv(nn.Module):
    """Plain torch-padding conv (weight/bias names)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (k, k, x.shape[-1], self.features), self.param_dtype)
        y = lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), self.param_dtype)
            y = y + b.astype(self.dtype)
        return y


class Bottleneck(nn.Module):
    """timm ResNetV2 non-preact bottleneck (StdConv + GroupNormAct)."""

    out_ch: int
    stride: int = 1
    cfg: DPTConfig = None

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)
        mid = self.out_ch // 4
        shortcut = x
        if x.shape[-1] != self.out_ch or self.stride != 1:
            s = StdConvSame(self.out_ch, 1, self.stride,
                            name="downsample_conv", **dd)(x)
            shortcut = GroupNormAct(apply_act=False,
                                    name="downsample_norm")(s)
        h = StdConvSame(mid, 1, 1, name="conv1", **dd)(x)
        h = GroupNormAct(name="norm1")(h)
        h = StdConvSame(mid, 3, self.stride, name="conv2", **dd)(h)
        h = GroupNormAct(name="norm2")(h)
        h = StdConvSame(self.out_ch, 1, 1, name="conv3", **dd)(h)
        h = GroupNormAct(apply_act=False, name="norm3")(h)
        return jax.nn.relu(h + shortcut)


class ViTBlock(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        c = cfg.vit_dim
        h = LayerNorm(name="norm1")(x)
        b, n, _ = h.shape
        qkv = Dense(3 * c, name="attn_qkv", **dd)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        nh = cfg.vit_heads
        hd = c // nh
        q = q.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        a = jax.nn.softmax(
            (q @ k.transpose(0, 1, 3, 2)).astype(jnp.float32)
            / math.sqrt(hd), axis=-1).astype(v.dtype)
        o = (a @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
        x = x + Dense(c, name="attn_proj", **dd)(o)
        h = LayerNorm(name="norm2")(x)
        h = Dense(c * cfg.vit_mlp_ratio, name="mlp_fc1", **dd)(h)
        h = nn.gelu(h, approximate=False)
        h = Dense(c, name="mlp_fc2", **dd)(h)
        return x + h


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """x2 bilinear upsample with align_corners=True (torch interpolate
    semantics used by the DPT fusion blocks and head)."""
    b, h, w, c = x.shape
    return _resize_align_corners(x, 2 * h, 2 * w)


def _resize_align_corners(x, out_h, out_w):
    b, h, w, c = x.shape

    def axis_weights(n_in, n_out):
        if n_in == 1:
            return np.zeros(n_out, np.int32), np.zeros(n_out, np.int32), \
                np.zeros(n_out, np.float32)
        pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
        lo = np.floor(pos).astype(np.int32)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = (pos - lo).astype(np.float32)
        return lo, hi, frac

    lo_h, hi_h, fh = axis_weights(h, out_h)
    lo_w, hi_w, fw = axis_weights(w, out_w)
    xf = x.astype(jnp.float32)
    top = xf[:, lo_h][:, :, lo_w] * (1 - fw[None, None, :, None]) + \
        xf[:, lo_h][:, :, hi_w] * fw[None, None, :, None]
    bot = xf[:, hi_h][:, :, lo_w] * (1 - fw[None, None, :, None]) + \
        xf[:, hi_h][:, :, hi_w] * fw[None, None, :, None]
    out = top * (1 - fh[None, :, None, None]) + bot * fh[None, :, None, None]
    return out.astype(x.dtype)


class ResidualConvUnit(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)
        f = x.shape[-1]
        h = jax.nn.relu(x)
        h = PlainConv(f, 3, 1, 1, name="conv1", **dd)(h)
        h = jax.nn.relu(h)
        h = PlainConv(f, 3, 1, 1, name="conv2", **dd)(h)
        return h + x


class FeatureFusionBlock(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x, res=None):
        dd = dict(dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)
        f = x.shape[-1]
        if res is not None:
            x = x + ResidualConvUnit(self.cfg, name="resConfUnit1")(res)
        else:
            # refinenet4 takes a single input but the checkpoint still
            # carries its resConfUnit1 params; register them (XLA DCEs
            # the dead compute)
            _ = ResidualConvUnit(self.cfg, name="resConfUnit1")(
                jnp.zeros_like(x))
        x = ResidualConvUnit(self.cfg, name="resConfUnit2")(x)
        x = upsample2x_align_corners(x)
        return PlainConv(f, 1, 1, 0, name="out_conv", **dd)(x)


class ProjectReadout(nn.Module):
    """cat(tokens, cls) -> Linear(2d, d) + GELU  (vit.py ProjectReadout)."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, tokens):
        cls = tokens[:, :1]
        feats = tokens[:, 1:]
        h = jnp.concatenate(
            [feats, jnp.broadcast_to(cls, feats.shape)], axis=-1)
        h = Dense(self.cfg.vit_dim, name="project_0", dtype=self.cfg.dtype,
                  param_dtype=self.cfg.param_dtype)(h)
        return nn.gelu(h, approximate=False)


class DPTDepthModel(nn.Module):
    """(B, H, W, 3) in [-1, 1] -> (B, H, W) non-negative inverse depth.

    H, W must be multiples of 32 (the reference resizes inputs so)."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, H, W, _ = x.shape
        P = "pretrained_model_"

        # ---- ResNetV2 stem + stages (hooks at stage 0 and 1) ----
        h = StdConvSame(cfg.stem_ch, 7, 2,
                        name=P + "patch_embed_backbone_stem_conv", **dd)(x)
        h = GroupNormAct(name=P + "patch_embed_backbone_stem_norm")(h)
        # MaxPool2dSame(3, stride=2)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        stage_feats = []
        for si, n_blocks in enumerate(cfg.stage_blocks):
            out_ch = cfg.stage_out[si]
            for bi in range(n_blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                h = Bottleneck(
                    out_ch, stride, cfg,
                    name=P + f"patch_embed_backbone_stages_{si}_blocks_{bi}",
                )(h)
            stage_feats.append(h)
        layer_1, layer_2 = stage_feats[0], stage_feats[1]

        # ---- patch embed + ViT ----
        h = PlainConv(cfg.vit_dim, 1, 1, 0,
                      name=P + "patch_embed_proj", **dd)(h)
        gh, gw = h.shape[1], h.shape[2]
        tokens = h.reshape(b, gh * gw, cfg.vit_dim)
        cls_token = self.param(P + "cls_token", nn.initializers.zeros,
                               (1, 1, cfg.vit_dim), cfg.param_dtype)
        pos_embed = self.param(
            P + "pos_embed", nn.initializers.normal(0.02),
            (1, 1 + cfg.patch_grid * cfg.patch_grid, cfg.vit_dim),
            cfg.param_dtype)
        # forward_flex: bilinear-resize the grid part of pos_embed
        pe_tok = pos_embed[:, :1].astype(cfg.dtype)
        g = cfg.patch_grid
        pe_grid = pos_embed[0, 1:].reshape(g, g, cfg.vit_dim)
        if (gh, gw) != (g, g):
            pe_grid = jax.image.resize(
                pe_grid.astype(jnp.float32), (gh, gw, cfg.vit_dim),
                method="bilinear")
        pe_grid = pe_grid.reshape(1, gh * gw, cfg.vit_dim).astype(cfg.dtype)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(cfg.dtype),
                              (b, 1, cfg.vit_dim)), tokens], axis=1)
        tokens = tokens + jnp.concatenate([pe_tok, pe_grid], axis=1)

        hook3 = hook4 = None
        for i in range(cfg.vit_layers):
            tokens = ViTBlock(cfg, name=P + f"blocks_{i}")(tokens)
            if i == cfg.hooks[0]:
                hook3 = tokens
            if i == cfg.hooks[1]:
                hook4 = tokens
        # (final norm applies only to the global path, which DPT discards;
        # the params still exist in the checkpoint)
        _ = LayerNorm(name=P + "norm")(tokens)

        # ---- reassemble hooked tokens ----
        def unflatten(t):
            return t.reshape(b, gh, gw, cfg.vit_dim)

        l3 = ProjectReadout(cfg, name="pretrained_act_postprocess3_0")(hook3)
        l3 = PlainConv(cfg.vit_dim, 1, 1, 0,
                       name="pretrained_act_postprocess3_3", **dd)(
            unflatten(l3))
        l4 = ProjectReadout(cfg, name="pretrained_act_postprocess4_0")(hook4)
        l4 = PlainConv(cfg.vit_dim, 1, 1, 0,
                       name="pretrained_act_postprocess4_3", **dd)(
            unflatten(l4))
        l4 = PlainConv(cfg.vit_dim, 3, 2, 1,
                       name="pretrained_act_postprocess4_4", **dd)(l4)

        # ---- scratch + fusion ----
        f = cfg.features
        r1 = PlainConv(f, 3, 1, 1, use_bias=False,
                       name="scratch_layer1_rn", **dd)(layer_1)
        r2 = PlainConv(f, 3, 1, 1, use_bias=False,
                       name="scratch_layer2_rn", **dd)(layer_2)
        r3 = PlainConv(f, 3, 1, 1, use_bias=False,
                       name="scratch_layer3_rn", **dd)(l3)
        r4 = PlainConv(f, 3, 1, 1, use_bias=False,
                       name="scratch_layer4_rn", **dd)(l4)

        p4 = FeatureFusionBlock(cfg, name="scratch_refinenet4")(r4)
        p3 = FeatureFusionBlock(cfg, name="scratch_refinenet3")(p4, r3)
        p2 = FeatureFusionBlock(cfg, name="scratch_refinenet2")(p3, r2)
        p1 = FeatureFusionBlock(cfg, name="scratch_refinenet1")(p2, r1)

        # ---- head ----
        h = PlainConv(f // 2, 3, 1, 1, name="scratch_output_conv_0", **dd)(p1)
        h = upsample2x_align_corners(h)
        h = PlainConv(32, 3, 1, 1, name="scratch_output_conv_2", **dd)(h)
        h = jax.nn.relu(h)
        h = PlainConv(1, 1, 1, 0, name="scratch_output_conv_4", **dd)(h)
        h = jax.nn.relu(h)
        return h[..., 0]
