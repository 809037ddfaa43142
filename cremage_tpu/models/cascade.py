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

Structure follows the published StableCascadeUNet layout exactly
(checkpoint-key parity is pinned by tests/test_keylist_golden.py):
per level, a flat run of (Res, Timestep[, Attn]) groups; stride-2
k2 conv downscalers and k2s2 *transposed*-conv upscalers between
levels (affine-free LN before each); optional repeat-mappers (1x1
convs) that re-run a level's blocks with the skip re-applied
(Stage B's up path repeats (3,3,2,2)); Stage B additionally
pixel-unshuffles its 4-ch VQ latent (patch 2) and injects the Stage C
latent and an optional pixels image through separate 2-conv GELU
mappers with bilinear align-corners resizing.
"""
from __future__ import annotations

import dataclasses
import zlib
from typing import Optional, Tuple

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp

from cremage_tpu.models.layers import Conv, Dense, silu, timestep_embedding
from cremage_tpu.ops import tome
from cremage_tpu.ops.attention import attention


def _channel_ln(x, eps: float = 1e-6):
    """Affine-free LayerNorm over the channel axis (SDCascadeLayerNorm
    with elementwise_affine=False), fp32 statistics."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    return ((xf - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


def _pixel_unshuffle(x, r: int):
    """NHWC pixel-unshuffle with torch channel order c*r*r + di*r + dj."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // r, w // r,
                                                 c * r * r)


def _pixel_shuffle(x, r: int):
    """Inverse of _pixel_unshuffle (torch PixelShuffle semantics)."""
    b, h, w, cr2 = x.shape
    c = cr2 // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    return x.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * r, w * r, c)


def _resize_bilinear_ac(x, out_h: int, out_w: int):
    """Bilinear resize with torch align_corners=True sampling (the mode
    Stage B uses for effnet/pixels injection)."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    xf = x.astype(jnp.float32)

    def grid(n_in, n_out):
        if n_out == 1 or n_in == 1:
            pos = jnp.zeros((n_out,), jnp.float32)
        else:
            pos = jnp.linspace(0.0, float(n_in - 1), n_out)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
        i1 = jnp.minimum(i0 + 1, n_in - 1)
        t = pos - i0.astype(jnp.float32)
        return i0, i1, t

    y0, y1, ty = grid(h, out_h)
    x0, x1, tx = grid(w, out_w)
    top = xf[:, y0]
    bot = xf[:, y1]
    rows = top * (1 - ty)[None, :, None, None] + bot * ty[None, :, None, None]
    left = rows[:, :, x0]
    right = rows[:, :, x1]
    out = (left * (1 - tx)[None, None, :, None]
           + right * tx[None, None, :, None])
    return out.astype(x.dtype)


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


class ConvTranspose2x2(nn.Module):
    """k=2 s=2 transposed conv (the Würstchen level upscaler). Weight is
    stored (2, 2, out, in) — exactly what the shape-directed converter
    produces from torch ConvTranspose2d's (in, out, 2, 2)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (2, 2, self.features, in_ch), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        y = jnp.einsum(
            "bhwc,kloc->bhkwlo",
            x.astype(self.dtype), w.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        b, h, _, wdim, _, o = y.shape
        return y.reshape(b, h * 2, wdim * 2, o) + bias.astype(self.dtype)


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
    # ToMe (ops/tome.py): ratio > 0 merges the SPATIAL tokens before the
    # fused attention (q and the self part of kv see the reduced stream;
    # the cond-token prefix stays full) and unmerges the projected
    # output before the residual add — same shape as the UNet attn1
    # integration in models/unet.py.
    tome_ratio: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, tome_offset=None):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        c = self.channels
        bsz, hh, ww, _ = x.shape
        d = c // self.num_heads
        kv = Dense(c, name="kv_mapper_1", **dd)(silu(cond.astype(self.dtype)))
        tokens = _channel_ln(x).reshape(bsz, hh * ww, c).astype(self.dtype)
        plan = None
        if self.tome_ratio > 0 and hh % 2 == 0 and ww % 2 == 0:
            r = min(int(hh * ww * self.tome_ratio), (hh * ww * 3) // 4)
            if r > 0:
                off = ((0 if tome_offset is None else tome_offset)
                       + (zlib.crc32(str(self.name).encode()) & 0xFFFF))
                plan = tome.build_plan(tokens, hh, ww, r, off)
                tokens = tome.merge(plan, tokens)
        if self.self_attn:
            kv = jnp.concatenate([kv, tokens], axis=1)
        q = Dense(c, name="attention_to_q", **dd)(tokens)
        k = Dense(c, name="attention_to_k", **dd)(kv)
        v = Dense(c, name="attention_to_v", **dd)(kv)
        m = kv.shape[1]
        n = tokens.shape[1]
        a = attention(
            q.reshape(bsz, n, self.num_heads, d),
            k.reshape(bsz, m, self.num_heads, d),
            v.reshape(bsz, m, self.num_heads, d),
        ).reshape(bsz, n, c)
        out = Dense(c, name="attention_to_out_0", **dd)(a)
        if plan is not None:
            out = tome.unmerge(plan, out)
        return x + out.reshape(bsz, hh, ww, c)


def _run_trunk(h, r_embed, cond, *, c_hidden, blocks, num_heads, c_cond,
               c_r, conds, attn_levels, down_repeats, up_repeats, dtype,
               param_dtype, mode="full", deep=None, cache_levels=1,
               tome_ratio=0.0, tome_max_downsample=1, tome_offset=None):
    """Shared down/up trunk: flat (Res, Time[, Attn]) groups per level,
    LN+conv scalers between levels, repeat-mappers re-running a level.
    Plain helper (NOT a Module): must run inside the caller's compact
    scope so params land at the root, matching checkpoint keys.

    Deep-cache modes follow models/unet.py's contract: "capture"
    returns (h, deep) with `deep` the hidden state entering up level
    cache_levels-1 (after the deep upscaler); "shallow" reruns only
    levels < cache_levels and splices `deep` back in.  Returns (h, None)
    otherwise so callers unpack uniformly."""
    dd = dict(dtype=dtype, param_dtype=param_dtype)
    n_levels_all = len(c_hidden)
    assert mode in ("full", "capture", "shallow"), mode
    if mode != "full":
        assert 1 <= cache_levels < n_levels_all, (
            f"cache_levels must be in [1, {n_levels_all - 1}]")
    if mode == "shallow":
        assert deep is not None, "shallow mode needs the cached tensor"

    # ToMe eligibility mirrors models/unet.py: only attention levels
    # within tome_max_downsample of the widest attention grid merge
    min_attn_lv = min(attn_levels) if attn_levels else 0

    def _tome_ratio(lv):
        if tome_ratio <= 0:
            return 0.0
        eligible = (1 << lv) <= (1 << min_attn_lv) * tome_max_downsample
        return tome_ratio if eligible else 0.0

    def group(pre, c, skip_channels, with_attn, lv):
        res = CascadeResBlock(c, skip_channels=skip_channels,
                              name=pre + "_res", **dd)
        tim = CascadeTimestepBlock(c, c_r, conds, name=pre + "_time", **dd)
        att = (CascadeAttnBlock(c, c_cond, num_heads, name=pre + "_attn",
                                tome_ratio=_tome_ratio(lv), **dd)
               if with_attn else None)
        return res, tim, att

    n_levels = len(c_hidden)
    skips = []
    down_levels = (range(cache_levels) if mode == "shallow"
                   else range(n_levels))
    for lv in down_levels:
        c = c_hidden[lv]
        if lv > 0:
            h = Conv(c, kernel_size=2, stride=2, padding=0,
                     name=f"downscalers_{lv}_1", **dd)(_channel_ln(h))
        groups = [
            group(f"down_blocks_{lv}_{i}", c, 0, lv in attn_levels, lv)
            for i in range(blocks[lv])
        ]
        reps = down_repeats[lv]
        mappers = [
            Conv(c, kernel_size=1, padding=0,
                 name=f"down_repeat_mappers_{lv}_{j}", **dd)
            for j in range(reps - 1)
        ]
        for j in range(reps):
            for res, tim, att in groups:
                h = res(h)
                h = tim(h, r_embed)
                if att is not None:
                    h = att(h, cond, tome_offset=tome_offset)
            if j < reps - 1:
                h = mappers[j](h)
        skips.append(h)

    deep_out = None
    up_levels = (range(cache_levels - 1, -1, -1) if mode == "shallow"
                 else range(n_levels - 1, -1, -1))
    if mode == "shallow":
        h = deep.astype(dtype)
    for lv in up_levels:
        pos = n_levels - 1 - lv
        if mode == "capture" and lv == cache_levels - 1:
            deep_out = h
        c = c_hidden[lv]
        skip = skips[lv] if pos > 0 else None
        groups = [
            group(f"up_blocks_{pos}_{i}", c,
                  c if (skip is not None and i == 0) else 0,
                  lv in attn_levels, lv)
            for i in range(blocks[::-1][pos])
        ]
        reps = up_repeats[pos]
        mappers = [
            Conv(c, kernel_size=1, padding=0,
                 name=f"up_repeat_mappers_{pos}_{j}", **dd)
            for j in range(reps - 1)
        ]
        for j in range(reps):
            for i, (res, tim, att) in enumerate(groups):
                # the first res block re-concats the skip on EVERY
                # repeat (StableCascade _up_decode semantics)
                h = res(h, skip if i == 0 else None)
                h = tim(h, r_embed)
                if att is not None:
                    h = att(h, cond, tome_offset=tome_offset)
            if j < reps - 1:
                h = mappers[j](h)
        if lv > 0:
            h = ConvTranspose2x2(c_hidden[lv - 1],
                                 name=f"upscalers_{pos}_1",
                                 **dd)(_channel_ln(h))
    return h, deep_out


@dataclasses.dataclass(frozen=True)
class StageCConfig:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 1
    c_hidden: Tuple[int, ...] = (2048, 2048)
    blocks: Tuple[int, ...] = (8, 24)          # groups per level (down)
    down_repeats: Tuple[int, ...] = (1, 1)
    up_repeats: Tuple[int, ...] = (1, 1)       # per up position
    num_heads: int = 32
    c_cond: int = 2048
    clip_text_dim: int = 1280
    clip_text_pooled_dim: int = 1280
    clip_img_dim: int = 768
    c_r: int = 64
    conds: Tuple[str, ...] = ("sca", "crp")
    # ToMe (ops/tome.py, same knob as models/unet.py): merge int(N*r)
    # spatial tokens around the widest attention level(s)
    tome_ratio: float = 0.0
    tome_max_downsample: int = 1
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
                 sca=None, crp=None, mode: str = "full", deep=None,
                 cache_levels: int = 1):
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

        tome_off = None
        if cfg.tome_ratio > 0:
            # fp32 bitcast, not int truncation: fractional sigmas must
            # still vary the dst-grid offset (models/unet.py rationale)
            tome_off = lax.bitcast_convert_type(
                jnp.reshape(r, (-1,))[0].astype(jnp.float32),
                jnp.int32) & 0x7FFF

        p = cfg.patch_size
        h = x.astype(cfg.dtype)
        if p > 1:
            h = _pixel_unshuffle(h, p)
        h = Conv(cfg.c_hidden[0], kernel_size=1, padding=0,
                 name="embedding_1", **dd)(h)
        h = _channel_ln(h)

        h, deep_out = _run_trunk(
            h, r_embed, cond,
            c_hidden=cfg.c_hidden, blocks=cfg.blocks,
            num_heads=cfg.num_heads, c_cond=cfg.c_cond, c_r=cfg.c_r,
            conds=cfg.conds, attn_levels=tuple(range(len(cfg.c_hidden))),
            down_repeats=cfg.down_repeats, up_repeats=cfg.up_repeats,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            mode=mode, deep=deep, cache_levels=cache_levels,
            tome_ratio=cfg.tome_ratio,
            tome_max_downsample=cfg.tome_max_downsample,
            tome_offset=tome_off,
        )

        out = Conv(cfg.out_channels * p * p, kernel_size=1, padding=0,
                   name="clf_1", dtype=jnp.float32,
                   param_dtype=cfg.param_dtype)(_channel_ln(h))
        if p > 1:
            out = _pixel_shuffle(out, p)
        return (out, deep_out) if mode == "capture" else out


@dataclasses.dataclass(frozen=True)
class StageBConfig:
    in_channels: int = 4               # VQ latent
    effnet_channels: int = 16          # Stage C latent (cond)
    pixels_channels: int = 3           # optional low-res pixel guidance
    out_channels: int = 4
    patch_size: int = 2
    c_hidden: Tuple[int, ...] = (320, 640, 1280, 1280)
    blocks: Tuple[int, ...] = (2, 6, 28, 6)
    down_repeats: Tuple[int, ...] = (1, 1, 1, 1)
    up_repeats: Tuple[int, ...] = (3, 3, 2, 2)  # per up position
    num_heads: int = 20
    c_cond: int = 1280
    clip_text_pooled_dim: int = 1280
    c_r: int = 64
    conds: Tuple[str, ...] = ("sca",)
    # attention only at the widest levels (Würstchen B puts attention
    # where tokens are few)
    attn_levels: Tuple[int, ...] = (2, 3)
    # ToMe (ops/tome.py, same knob as models/unet.py)
    tome_ratio: float = 0.0
    tome_max_downsample: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32


class StageB(nn.Module):
    """Würstchen Stage B: diffuses the 4-ch VQ latent (pixel-unshuffled,
    patch 2) conditioned on the Stage C latent (effnet_mapper), pooled
    CLIP text, and an optional pixels image (pixels_mapper)."""

    cfg: StageBConfig

    @nn.compact
    def __call__(self, x, r, effnet, clip_text_pooled, sca=None,
                 pixels=None, mode: str = "full", deep=None,
                 cache_levels: int = 1):
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

        tome_off = None
        if cfg.tome_ratio > 0:
            # fp32 bitcast, not int truncation: fractional sigmas must
            # still vary the dst-grid offset (models/unet.py rationale)
            tome_off = lax.bitcast_convert_type(
                jnp.reshape(r, (-1,))[0].astype(jnp.float32),
                jnp.int32) & 0x7FFF

        p = cfg.patch_size
        h = _pixel_unshuffle(x.astype(cfg.dtype), p)
        h = Conv(cfg.c_hidden[0], kernel_size=1, padding=0,
                 name="embedding_1", **dd)(h)
        h = _channel_ln(h)
        hh, ww = h.shape[1], h.shape[2]

        # Stage C latent injected through a 2-conv GELU mapper at the
        # trunk resolution (bilinear align-corners resize, as upstream)
        eff = _resize_bilinear_ac(jnp.asarray(effnet).astype(cfg.dtype),
                                  hh, ww)
        eff = Conv(4 * cfg.c_hidden[0], kernel_size=1, padding=0,
                   name="effnet_mapper_0", **dd)(eff)
        eff = nn.gelu(eff, approximate=False)
        eff = Conv(cfg.c_hidden[0], kernel_size=1, padding=0,
                   name="effnet_mapper_2", **dd)(eff)
        h = h + _channel_ln(eff)

        if pixels is None:
            pixels = jnp.zeros((b, 8, 8, cfg.pixels_channels), cfg.dtype)
        px = Conv(4 * cfg.c_hidden[0], kernel_size=1, padding=0,
                  name="pixels_mapper_0", **dd)(pixels.astype(cfg.dtype))
        px = nn.gelu(px, approximate=False)
        px = Conv(cfg.c_hidden[0], kernel_size=1, padding=0,
                  name="pixels_mapper_2", **dd)(px)
        h = h + _resize_bilinear_ac(_channel_ln(px), hh, ww)

        h, deep_out = _run_trunk(
            h, r_embed, cond,
            c_hidden=cfg.c_hidden, blocks=cfg.blocks,
            num_heads=cfg.num_heads, c_cond=cfg.c_cond, c_r=cfg.c_r,
            conds=cfg.conds, attn_levels=cfg.attn_levels,
            down_repeats=cfg.down_repeats, up_repeats=cfg.up_repeats,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            mode=mode, deep=deep, cache_levels=cache_levels,
            tome_ratio=cfg.tome_ratio,
            tome_max_downsample=cfg.tome_max_downsample,
            tome_offset=tome_off,
        )

        out = Conv(cfg.out_channels * p * p, kernel_size=1, padding=0,
                   name="clf_1", dtype=jnp.float32,
                   param_dtype=cfg.param_dtype)(_channel_ln(h))
        out = _pixel_shuffle(out, p)
        return (out, deep_out) if mode == "capture" else out
