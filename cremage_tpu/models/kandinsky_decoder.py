"""Kandinsky 2.2 decoder UNet (unCLIP-style simple-attention UNet).

Behavior contract: the diffusers UNet the reference's Kandinsky decoder
pipelines download (reference `modules/kandinsky/txt2img.py:26,66`,
`img2img.py`, `inpaint.py`). That UNet differs from the SD UNet in three
structural ways, all implemented here TPU-native (NHWC, bf16 compute,
fp32 norms):

- resnet blocks use **scale-shift** time conditioning
  (time_emb_proj -> 2*C, h = norm2(h)*(1+scale)+shift);
- up/downsampling happens **inside resnets** (avg-pool / nearest-up on
  both branches before conv1) instead of dedicated conv samplers;
- attention is **added-KV "simple" attention**: q/k/v from the
  group-normed spatial stream plus add_k/add_v projections of the image
  -embedding context tokens, concatenated along the key axis (one fused
  attention per block, no transformer stack).

Module names deliberately flatten to the diffusers checkpoint key
strings (down_blocks.N.resnets.M.conv1 ...), so loading is the same
mechanical name-join used everywhere else (io/checkpoint.py); the
add_embedding / encoder_hid_proj heads live in
models/kandinsky.py::KandinskyImageConditioner and the y argument here
receives the conditioner's time vector (already time_embed_dim wide).
"""
from __future__ import annotations

import dataclasses
import zlib
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cremage_tpu.models.layers import (
    Conv, Dense, GroupNorm, silu, timestep_embedding,
)
from cremage_tpu.ops import tome
from cremage_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class KandinskyUNetConfig:
    in_channels: int = 4              # 9 for the inpaint decoder
    out_channels: int = 8             # eps + learned variance
    block_out_channels: Tuple[int, ...] = (384, 768, 1152, 1536)
    layers_per_block: int = 3
    context_dim: int = 768            # conditioner token width
    attention_head_dim: int = 64
    # which down blocks carry attention (diffusers layout: the first is
    # a plain ResnetDownsampleBlock2D, the rest SimpleCrossAttn)
    first_block_plain: bool = True
    # Token merging (ToMe, ops/tome.py — opt-in speed feature, same knob
    # as models/unet.py): merge int(N*ratio) spatial tokens around each
    # highest-resolution added-KV attention; tome_max_downsample widens
    # application to deeper levels (1 = only the widest attention level)
    tome_ratio: float = 0.0
    tome_max_downsample: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


def _avg_pool2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def _nearest_up2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class ScaleShiftResBlock(nn.Module):
    """diffusers ResnetBlock2D with time_embedding_norm='scale_shift' and
    optional in-block up/downsampling (use_conv=False samplers)."""

    out_channels: int
    sample: Optional[str] = None      # None | "down" | "up"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        cin = x.shape[-1]
        h = silu(GroupNorm(32, name="norm1")(x))
        if self.sample == "down":
            h, x = _avg_pool2(h), _avg_pool2(x)
        elif self.sample == "up":
            h, x = _nearest_up2(h), _nearest_up2(x)
        h = Conv(self.out_channels, kernel_size=3, name="conv1", **dd)(h)
        ts = Dense(2 * self.out_channels, name="time_emb_proj", **dd)(
            silu(emb))
        scale, shift = jnp.split(ts[:, None, None, :], 2, axis=-1)
        h = GroupNorm(32, name="norm2")(h)
        h = h * (1 + scale) + shift
        h = Conv(self.out_channels, kernel_size=3, name="conv2", **dd)(
            silu(h))
        if cin != self.out_channels:
            x = Conv(self.out_channels, kernel_size=1, padding=0,
                     name="conv_shortcut", **dd)(x)
        return x + h


class AddedKVAttention(nn.Module):
    """diffusers Attention + AttnAddedKVProcessor: spatial self-attention
    with the context tokens' add_k/add_v concatenated onto the key axis."""

    heads: int
    # ToMe (ops/tome.py): ratio > 0 merges spatial tokens before the
    # fused attention (q and the self part of k/v both see the reduced
    # stream; the ctx add_k/add_v prefix stays full) and unmerges the
    # projected output before the residual add — the same shape the
    # UNet's BasicTransformerBlock uses around attn1.
    tome_ratio: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, tome_offset=None):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, hh, ww, c = x.shape
        d = c // self.heads
        h = GroupNorm(32, name="group_norm")(x).reshape(b, hh * ww, c)
        h = h.astype(self.dtype)
        ctx = ctx.astype(self.dtype)
        plan = None
        if self.tome_ratio > 0 and hh % 2 == 0 and ww % 2 == 0:
            r = min(int(hh * ww * self.tome_ratio), (hh * ww * 3) // 4)
            if r > 0:
                off = ((0 if tome_offset is None else tome_offset)
                       + (zlib.crc32(str(self.name).encode()) & 0xFFFF))
                plan = tome.build_plan(h, hh, ww, r, off)
                h = tome.merge(plan, h)
        q = Dense(c, name="to_q", **dd)(h)
        k_self = Dense(c, name="to_k", **dd)(h)
        v_self = Dense(c, name="to_v", **dd)(h)
        k_ctx = Dense(c, name="add_k_proj", **dd)(ctx)
        v_ctx = Dense(c, name="add_v_proj", **dd)(ctx)
        k = jnp.concatenate([k_ctx, k_self], axis=1)
        v = jnp.concatenate([v_ctx, v_self], axis=1)
        n, m = q.shape[1], k.shape[1]
        a = attention(
            q.reshape(b, n, self.heads, d), k.reshape(b, m, self.heads, d),
            v.reshape(b, m, self.heads, d),
        ).reshape(b, n, c)
        out = Dense(c, name="to_out_0", **dd)(a)
        if plan is not None:
            out = tome.unmerge(plan, out)
        return x + out.reshape(b, hh, ww, c)


class KandinskyUNet(nn.Module):
    """in: latents (B,H,W,in_ch), t (B,), context tokens (B,M,ctx_dim),
    y = image time vector (B, time_embed_dim) from the conditioner."""

    cfg: KandinskyUNetConfig

    @nn.compact
    def __call__(self, x, timesteps, context, y=None,
                 mode: str = "full", deep=None, cache_levels: int = 1):
        """Deep-cache modes follow models/unet.py's contract exactly:
        "capture" additionally returns the hidden state entering up
        level cache_levels-1 (after the deep upsample); "shallow" reruns
        only resolution levels < cache_levels and splices that cached
        tensor back in (samplers/deepcache.py)."""
        cfg = self.cfg
        n_levels = len(cfg.block_out_channels)
        assert mode in ("full", "capture", "shallow"), mode
        if mode != "full":
            assert 1 <= cache_levels < n_levels, (
                f"cache_levels must be in [1, {n_levels - 1}]")
        if mode == "shallow":
            assert deep is not None, "shallow mode needs the cached tensor"
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        boc = cfg.block_out_channels
        ted = cfg.time_embed_dim

        t_emb = timestep_embedding(timesteps, boc[0]).astype(cfg.dtype)
        emb = Dense(ted, name="time_embedding_linear_1", **dd)(t_emb)
        emb = Dense(ted, name="time_embedding_linear_2", **dd)(silu(emb))
        if y is not None:
            emb = emb + y.astype(cfg.dtype)

        x = x.astype(cfg.dtype)
        h = Conv(boc[0], kernel_size=3, name="conv_in", **dd)(x)
        rdd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)

        # ToMe eligibility mirrors models/unet.py: only attention levels
        # within tome_max_downsample of the widest attention grid merge;
        # the dst-grid offset derives from the timestep (fp32 bitcast so
        # fractional sigmas still vary it)
        tome_off = None
        min_attn_lv = 1 if cfg.first_block_plain else 0
        if cfg.tome_ratio > 0:
            tome_off = jax.lax.bitcast_convert_type(
                jnp.reshape(timesteps, (-1,))[0].astype(jnp.float32),
                jnp.int32) & 0x7FFF

        def _tome_ratio(lv):
            if cfg.tome_ratio <= 0:
                return 0.0
            eligible = (1 << lv) <= (1 << min_attn_lv) * \
                cfg.tome_max_downsample
            return cfg.tome_ratio if eligible else 0.0

        # ---- down ----
        hs = [h]
        n_blocks = len(boc)
        down_levels = (range(cache_levels) if mode == "shallow"
                       else range(n_blocks))
        for lv in down_levels:
            plain = cfg.first_block_plain and lv == 0
            for i in range(cfg.layers_per_block):
                h = ScaleShiftResBlock(
                    boc[lv], name=f"down_blocks_{lv}_resnets_{i}",
                    **rdd)(h, emb)
                if not plain:
                    h = AddedKVAttention(
                        heads=boc[lv] // cfg.attention_head_dim,
                        tome_ratio=_tome_ratio(lv),
                        name=f"down_blocks_{lv}_attentions_{i}", **rdd,
                    )(h, context, tome_offset=tome_off)
                hs.append(h)
            if lv != n_blocks - 1:
                # the downsampler ending level cache_levels-1 feeds the
                # cached deep path; its skip is consumed by a deep up
                # block, so shallow mode needs neither
                if mode != "shallow" or lv < cache_levels - 1:
                    h = ScaleShiftResBlock(
                        boc[lv], sample="down",
                        name=f"down_blocks_{lv}_downsamplers_0",
                        **rdd)(h, emb)
                    hs.append(h)

        # ---- mid (resnet, attention, resnet); skipped in shallow ----
        if mode != "shallow":
            h = ScaleShiftResBlock(boc[-1], name="mid_block_resnets_0",
                                   **rdd)(h, emb)
            h = AddedKVAttention(heads=boc[-1] // cfg.attention_head_dim,
                                 tome_ratio=_tome_ratio(n_blocks - 1),
                                 name="mid_block_attentions_0",
                                 **rdd)(h, context, tome_offset=tome_off)
            h = ScaleShiftResBlock(boc[-1], name="mid_block_resnets_1",
                                   **rdd)(h, emb)

        # ---- up ----
        deep_out = None
        up_levels = (range(cache_levels - 1, -1, -1) if mode == "shallow"
                     else range(n_blocks - 1, -1, -1))
        if mode == "shallow":
            h = deep.astype(cfg.dtype)
        for lv in up_levels:
            pos = n_blocks - 1 - lv
            if mode == "capture" and lv == cache_levels - 1:
                deep_out = h
            plain = cfg.first_block_plain and lv == 0
            for i in range(cfg.layers_per_block + 1):
                skip = hs.pop()
                h = ScaleShiftResBlock(
                    boc[lv], name=f"up_blocks_{pos}_resnets_{i}", **rdd,
                )(jnp.concatenate([h, skip], axis=-1), emb)
                if not plain:
                    h = AddedKVAttention(
                        heads=boc[lv] // cfg.attention_head_dim,
                        tome_ratio=_tome_ratio(lv),
                        name=f"up_blocks_{pos}_attentions_{i}", **rdd,
                    )(h, context, tome_offset=tome_off)
            if lv != 0:
                h = ScaleShiftResBlock(
                    boc[lv], sample="up",
                    name=f"up_blocks_{pos}_upsamplers_0", **rdd)(h, emb)

        h = silu(GroupNorm(32, name="conv_norm_out")(h))
        h = Conv(cfg.out_channels, kernel_size=3, name="conv_out",
                 dtype=jnp.float32, param_dtype=cfg.param_dtype)(h)
        return (h, deep_out) if mode == "capture" else h


def kandinsky_decoder_eps(out):
    """The decoder predicts [eps, variance] along channels; samplers use
    the eps half (diffusers KandinskyV22 pipeline split)."""
    return out[..., : out.shape[-1] // 2]
