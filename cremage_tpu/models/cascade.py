"""Stable Cascade (Würstchen v3) stage cores.

Behavior contract: reference `modules/stable_cascade/txt2img.py` —
diffusers StableCascadePriorPipeline (Stage C) + StableCascadeDecoder
Pipeline (Stage B). The Würstchen block anatomy differs from the SD
UNet entirely; this module implements it TPU-native (NHWC, bf16
compute, fp32 norms):

- **ResBlock**: affine-free channel LayerNorm -> 3x3 depthwise conv ->
  per-pixel channelwise MLP (Linear c->4c, GELU, GlobalResponseNorm,
  Linear 4c->c), residual add. Depthwise conv + channelwise MLP is the
  ConvNeXt split the Würstchen stages use.
- **TimestepBlock**: a 2-coefficient gate per block, x*(1+a)+b, with a
  and b projected from the concatenated [t; extra-cond] sinusoid
  embeddings (mapper / mapper_<cond>).
- **AttnBlock**: affine-free norm, kv_mapper (SiLU+Linear) projecting
  the conditioning tokens, then attention of spatial tokens over
  [cond tokens; spatial tokens] (self_attn=True layout).

Stage C stacks (ResBlock, TimestepBlock, AttnBlock) groups at two
channel widths with a stride-2 conv between; Stage B mixes the same
blocks at 4 widths. The exact official block counts/widths are config
values; key-map leaf verification against real Würstchen weights is
tracked in COVERAGE.md (no downloads in this environment).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp

from cremage_tpu.models.layers import Conv, Dense, silu, timestep_embedding
from cremage_tpu.ops.attention import attention


def _channel_ln(x, eps: float = 1e-6):
    """Affine-free LayerNorm over the channel axis (SDCascadeLayerNorm
    with elementwise_affine=False), fp32 statistics."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    return ((xf - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


class GlobalResponseNorm(nn.Module):
    """GRN (ConvNeXt-v2): per-channel response normalized by the spatial
    L2 energy; gamma/beta learned."""

    dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros,
                           (1, 1, 1, self.dim), self.param_dtype)
        beta = self.param("beta", nn.initializers.zeros,
                          (1, 1, 1, self.dim), self.param_dtype)
        xf = x.astype(jnp.float32)
        gx = jnp.sqrt((xf ** 2).sum(axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
        out = gamma * (xf * nx) + beta + xf
        return out.astype(x.dtype)


class CascadeResBlock(nn.Module):
    channels: int
    skip_channels: int = 0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        c = self.channels
        res = x
        h = _channel_ln(x)
        # depthwise 3x3 (feature_group_count = channels)
        kernel = self.param("depthwise_weight", nn.initializers.lecun_normal(),
                            (3, 3, 1, c), self.param_dtype)
        bias = self.param("depthwise_bias", nn.initializers.zeros,
                          (c,), self.param_dtype)
        h = lax.conv_general_dilated(
            h.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        ) + bias.astype(self.dtype)
        if skip is not None:
            h = jnp.concatenate([h, skip.astype(self.dtype)], axis=-1)
        h = Dense(4 * c, name="channelwise_0", **dd)(h)
        h = nn.gelu(h, approximate=False)
        h = GlobalResponseNorm(4 * c, name="channelwise_2",
                               param_dtype=self.param_dtype)(h)
        h = Dense(c, name="channelwise_4", **dd)(h)
        return res + h


class CascadeTimestepBlock(nn.Module):
    channels: int
    c_r: int = 64
    conds: Tuple[str, ...] = ("sca", "crp")
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, r_embed):
        """r_embed: (B, c_r*(1+len(conds))) — [t; cond sinusoids]."""
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        c = self.channels
        chunks = jnp.split(r_embed.astype(self.dtype),
                           1 + len(self.conds), axis=-1)
        ab = Dense(2 * c, name="mapper", **dd)(chunks[0])
        for i, cname in enumerate(self.conds):
            ab = ab + Dense(2 * c, name=f"mapper_{cname}", **dd)(chunks[1 + i])
        a, b = jnp.split(ab[:, None, None, :], 2, axis=-1)
        return x * (1 + a) + b


class CascadeAttnBlock(nn.Module):
    channels: int
    cond_dim: int
    num_heads: int
    self_attn: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        c = self.channels
        bsz, hh, ww, _ = x.shape
        d = c // self.num_heads
        kv = Dense(c, name="kv_mapper_1", **dd)(silu(cond.astype(self.dtype)))
        tokens = _channel_ln(x).reshape(bsz, hh * ww, c).astype(self.dtype)
        if self.self_attn:
            kv = jnp.concatenate([kv, tokens], axis=1)
        q = Dense(c, name="attention_to_q", **dd)(tokens)
        k = Dense(c, name="attention_to_k", **dd)(kv)
        v = Dense(c, name="attention_to_v", **dd)(kv)
        m = kv.shape[1]
        a = attention(
            q.reshape(bsz, hh * ww, self.num_heads, d),
            k.reshape(bsz, m, self.num_heads, d),
            v.reshape(bsz, m, self.num_heads, d),
        ).reshape(bsz, hh * ww, c)
        out = Dense(c, name="attention_to_out_0", **dd)(a)
        return x + out.reshape(bsz, hh, ww, c)


@dataclasses.dataclass(frozen=True)
class StageCConfig:
    in_channels: int = 16
    out_channels: int = 16
    c_hidden: Tuple[int, ...] = (2048, 2048)
    blocks: Tuple[int, ...] = (8, 24)          # groups per level (down)
    num_heads: int = 32
    c_cond: int = 2048
    clip_text_dim: int = 1280
    clip_text_pooled_dim: int = 1280
    clip_img_dim: int = 768
    c_r: int = 64
    conds: Tuple[str, ...] = ("sca", "crp")
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32


class StageC(nn.Module):
    """Würstchen Stage C: diffuses the 16-ch 'effnet' latent from CLIP
    text (tokens + pooled) and optional CLIP image embeddings."""

    cfg: StageCConfig

    def _r_embed(self, r, cond_values):
        cfg = self.cfg
        parts = [timestep_embedding(r, cfg.c_r)]
        for cv in cond_values:
            parts.append(timestep_embedding(cv, cfg.c_r))
        return jnp.concatenate(parts, axis=-1)

    @nn.compact
    def __call__(self, x, r, clip_text, clip_text_pooled, clip_img=None,
                 sca=None, crp=None):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b = x.shape[0]

        # conditioning stream: [text tokens; 4 pooled tokens; 4 img tokens]
        txt = Dense(cfg.c_cond, name="clip_txt_mapper", **dd)(
            clip_text.astype(cfg.dtype))
        pooled = Dense(4 * cfg.c_cond, name="clip_txt_pooled_mapper", **dd)(
            clip_text_pooled.astype(cfg.dtype)).reshape(b, 4, cfg.c_cond)
        streams = [txt, pooled]
        if clip_img is not None:
            img = Dense(4 * cfg.c_cond, name="clip_img_mapper", **dd)(
                clip_img.astype(cfg.dtype)).reshape(b, 4, cfg.c_cond)
            streams.append(img)
        cond = _channel_ln(jnp.concatenate(streams, axis=1))

        zeros = jnp.zeros_like(r)
        cond_values = [sca if sca is not None else zeros
                       if c == "sca" else (crp if crp is not None else zeros)
                       for c in cfg.conds]
        r_embed = self._r_embed(r, cond_values)

        h = Conv(cfg.c_hidden[0], kernel_size=1, padding=0,
                 name="embedding_1", **dd)(x.astype(cfg.dtype))
        h = _channel_ln(h)

        skips = []
        n_levels = len(cfg.c_hidden)
        for lv in range(n_levels):
            c = cfg.c_hidden[lv]
            if lv > 0:
                h = Conv(c, kernel_size=2, stride=2, padding=0,
                         name=f"downscalers_{lv}_1", **dd)(_channel_ln(h))
            for i in range(cfg.blocks[lv]):
                pre = f"down_blocks_{lv}_{i}"
                h = CascadeResBlock(c, name=pre + "_res", dtype=cfg.dtype,
                                    param_dtype=cfg.param_dtype)(h)
                h = CascadeTimestepBlock(
                    c, cfg.c_r, cfg.conds, name=pre + "_time",
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype)(h, r_embed)
                h = CascadeAttnBlock(
                    c, cfg.c_cond, cfg.num_heads, name=pre + "_attn",
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype)(h, cond)
            skips.append(h)

        for pos, lv in enumerate(reversed(range(n_levels))):
            c = cfg.c_hidden[lv]
            skip = skips[lv] if pos > 0 else None
            for i in range(cfg.blocks[::-1][pos]):
                pre = f"up_blocks_{pos}_{i}"
                h = CascadeResBlock(
                    c, skip_channels=c if (skip is not None and i == 0) else 0,
                    name=pre + "_res", dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype,
                )(h, skip if i == 0 else None)
                h = CascadeTimestepBlock(
                    c, cfg.c_r, cfg.conds, name=pre + "_time",
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype)(h, r_embed)
                h = CascadeAttnBlock(
                    c, cfg.c_cond, cfg.num_heads, name=pre + "_attn",
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype)(h, cond)
            if lv > 0:
                h = Conv(cfg.c_hidden[lv - 1], kernel_size=1, padding=0,
                         name=f"upscalers_{pos}_1", **dd)(_channel_ln(h))
                bb, hh2, ww2, cc = h.shape
                h = jnp.broadcast_to(
                    h[:, :, None, :, None, :], (bb, hh2, 2, ww2, 2, cc)
                ).reshape(bb, hh2 * 2, ww2 * 2, cc)

        out = Conv(cfg.out_channels, kernel_size=1, padding=0,
                   name="clf_1", dtype=jnp.float32,
                   param_dtype=cfg.param_dtype)(_channel_ln(h))
        return out


@dataclasses.dataclass(frozen=True)
class StageBConfig:
    in_channels: int = 4               # VQ latent
    effnet_channels: int = 16          # Stage C latent (cond)
    out_channels: int = 4
    c_hidden: Tuple[int, ...] = (320, 640, 1280, 1280)
    blocks: Tuple[int, ...] = (2, 6, 28, 6)
    num_heads: int = 20
    c_cond: int = 1280
    clip_text_pooled_dim: int = 1280
    c_r: int = 64
    conds: Tuple[str, ...] = ("sca",)
    # attention only at the widest levels (Würstchen B puts attention
    # where tokens are few)
    attn_levels: Tuple[int, ...] = (2, 3)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32


class StageB(nn.Module):
    """Würstchen Stage B: diffuses the 4-ch VQ latent conditioned on the
    (upsampled) Stage C latent and pooled CLIP text."""

    cfg: StageBConfig

    @nn.compact
    def __call__(self, x, r, effnet, clip_text_pooled, sca=None):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b = x.shape[0]

        pooled = Dense(4 * cfg.c_cond, name="clip_txt_pooled_mapper", **dd)(
            clip_text_pooled.astype(cfg.dtype)).reshape(b, 4, cfg.c_cond)
        cond = _channel_ln(pooled)

        zeros = jnp.zeros_like(r)
        parts = [timestep_embedding(r, cfg.c_r)]
        for c in cfg.conds:
            parts.append(timestep_embedding(
                sca if (c == "sca" and sca is not None) else zeros, cfg.c_r))
        r_embed = jnp.concatenate(parts, axis=-1)

        # effnet conditioning enters as channels at the input resolution
        eff = jnp.asarray(effnet).astype(cfg.dtype)
        if eff.shape[1] != x.shape[1]:
            scale = x.shape[1] // eff.shape[1]
            bb, eh, ew, ec = eff.shape
            eff = jnp.broadcast_to(
                eff[:, :, None, :, None, :], (bb, eh, scale, ew, scale, ec)
            ).reshape(bb, eh * scale, ew * scale, ec)
        h = jnp.concatenate([x.astype(cfg.dtype), eff], axis=-1)
        h = Conv(cfg.c_hidden[0], kernel_size=1, padding=0,
                 name="embedding_1", **dd)(h)
        h = _channel_ln(h)

        skips = []
        n_levels = len(cfg.c_hidden)
        for lv in range(n_levels):
            c = cfg.c_hidden[lv]
            if lv > 0:
                h = Conv(c, kernel_size=2, stride=2, padding=0,
                         name=f"downscalers_{lv}_1", **dd)(_channel_ln(h))
            for i in range(cfg.blocks[lv]):
                pre = f"down_blocks_{lv}_{i}"
                h = CascadeResBlock(c, name=pre + "_res", dtype=cfg.dtype,
                                    param_dtype=cfg.param_dtype)(h)
                h = CascadeTimestepBlock(
                    c, cfg.c_r, cfg.conds, name=pre + "_time",
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype)(h, r_embed)
                if lv in cfg.attn_levels:
                    h = CascadeAttnBlock(
                        c, cfg.c_cond, cfg.num_heads, name=pre + "_attn",
                        dtype=cfg.dtype, param_dtype=cfg.param_dtype)(h, cond)
            skips.append(h)

        for pos, lv in enumerate(reversed(range(n_levels))):
            c = cfg.c_hidden[lv]
            skip = skips[lv] if pos > 0 else None
            for i in range(cfg.blocks[::-1][pos]):
                pre = f"up_blocks_{pos}_{i}"
                h = CascadeResBlock(
                    c, skip_channels=c if (skip is not None and i == 0) else 0,
                    name=pre + "_res", dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype,
                )(h, skip if i == 0 else None)
                h = CascadeTimestepBlock(
                    c, cfg.c_r, cfg.conds, name=pre + "_time",
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype)(h, r_embed)
                if lv in cfg.attn_levels:
                    h = CascadeAttnBlock(
                        c, cfg.c_cond, cfg.num_heads, name=pre + "_attn",
                        dtype=cfg.dtype, param_dtype=cfg.param_dtype)(h, cond)
            if lv > 0:
                h = Conv(cfg.c_hidden[lv - 1], kernel_size=1, padding=0,
                         name=f"upscalers_{pos}_1", **dd)(_channel_ln(h))
                bb, hh2, ww2, cc = h.shape
                h = jnp.broadcast_to(
                    h[:, :, None, :, None, :], (bb, hh2, 2, ww2, 2, cc)
                ).reshape(bb, hh2 * 2, ww2 * 2, cc)

        out = Conv(cfg.out_channels, kernel_size=1, padding=0,
                   name="clf_1", dtype=jnp.float32,
                   param_dtype=cfg.param_dtype)(_channel_ln(h))
        return out
