"""SVD Video UNet (temporal-mixing UNet) in Flax.

Architecture contract: sgm VideoUNet (reference `modules/sdxl/sgm/
modules/diffusionmodules/video_model.py`, `video_attention.py`,
AlphaBlender in `diffusionmodules/util.py:350`; config
`configs/inference/svd.yaml`):
- every ResBlock is a VideoResBlock: spatial ResBlock + a temporal
  ResBlock (3D conv, kernel (3,1,1) over (T,H,W)) blended by a learned
  sigmoid AlphaBlender with image_only_indicator override;
- every SpatialTransformer is a SpatialVideoTransformer: after each
  spatial transformer block, a VideoTransformerBlock attends over the
  frame axis (per-pixel token sequences of length T) with a sinusoidal
  frame-position embedding and its own AlphaBlender;
- in_channels 8 (latent 4 + concat-conditioned first frame 4),
  context_dim 1024 (CLIP-H image embedding), adm 768 (fps_id /
  motion_bucket_id / cond_aug Fourier vectors).

Activations are (B*T, H, W, C) like the reference's (b t) packing; the
temporal ops reshape to (B, T, ...) internally with T static under jit.
"""
from __future__ import annotations

import zlib
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.lax as lax
import jax.numpy as jnp

from cremage_tpu.models.layers import (
    Conv, Dense, GroupNorm, LayerNorm, silu, timestep_embedding,
)
from cremage_tpu.models.unet import (
    BasicTransformerBlock, CrossAttention, Downsample, FeedForward, ResBlock,
    SpatialTransformer, Upsample, UNetConfig, _heads_for,
)


def svd_unet_config(**kw) -> UNetConfig:
    """configs/inference/svd.yaml network_config."""
    return UNetConfig(
        in_channels=8, out_channels=4, model_channels=320,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4),
        num_head_channels=64, num_heads=-1,
        transformer_depth=(1, 1, 1, 1), transformer_depth_middle=1,
        context_dim=1024, adm_in_channels=768,
        use_linear_in_transformer=True, **kw,
    )


class AlphaBlender(nn.Module):
    """learned-with-images sigmoid blend of spatial/temporal branches."""

    merge_strategy: str = "learned_with_images"
    init_alpha: float = 0.5

    @nn.compact
    def __call__(self, x_spatial, x_temporal, image_only):
        if self.merge_strategy == "fixed":
            alpha = jnp.float32(self.init_alpha)
        else:
            mix = self.param("mix_factor", lambda k: jnp.full(
                (1,), self.init_alpha, jnp.float32))
            alpha = nn.sigmoid(mix)[0]
        if self.merge_strategy == "learned_with_images" and image_only is not None:
            # image_only: (B, T) bool; broadcast over the tail dims
            a = jnp.where(image_only, 1.0, alpha)
            a = a.reshape(a.shape + (1,) * (x_spatial.ndim - a.ndim))
        else:
            a = alpha
        return (a * x_spatial.astype(jnp.float32)
                + (1.0 - a) * x_temporal.astype(jnp.float32)).astype(
                    x_spatial.dtype)


class TemporalResBlock(nn.Module):
    """ResBlock with (3,1,1) 3D convs over (T,H,W) — `time_stack`."""

    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        """x: (B, T, H, W, C); emb: (B, T, E)."""
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, t, hh, ww, c = x.shape

        def conv3(name, inp):
            kernel = self.param(
                name + "_weight", nn.initializers.lecun_normal(),
                (3, 1, 1, inp.shape[-1], self.out_channels), self.param_dtype)
            bias = self.param(name + "_bias", nn.initializers.zeros,
                              (self.out_channels,), self.param_dtype)
            y = lax.conv_general_dilated(
                inp.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(1, 1, 1),
                padding=[(1, 1), (0, 0), (0, 0)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
            return y + bias.astype(self.dtype)

        h = x.reshape(b * t, hh, ww, c)
        h = GroupNorm(num_groups=32, fuse_silu=True, name="in_layers_0")(h)
        h = h.reshape(b, t, hh, ww, c)
        h = conv3("in_layers_2", h)
        emb_out = Dense(self.out_channels, name="emb_layers_1", **dd)(silu(emb))
        h = h + emb_out[:, :, None, None, :]
        h2 = h.reshape(b * t, hh, ww, self.out_channels)
        h2 = GroupNorm(num_groups=32, fuse_silu=True, name="out_layers_0")(h2)
        h2 = h2.reshape(b, t, hh, ww, self.out_channels)
        h2 = conv3("out_layers_3", h2)
        if c != self.out_channels:
            x = Conv(self.out_channels, kernel_size=1, padding=0,
                     name="skip_connection", **dd)(
                x.reshape(b * t, hh, ww, c)).reshape(
                b, t, hh, ww, self.out_channels)
        return x + h2


class VideoResBlock(nn.Module):
    out_channels: int
    num_frames: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, image_only=None):
        """x: (B*T, H, W, C)."""
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        out_ch = self.out_channels
        t = self.num_frames

        # spatial ResBlock layers at this module's own scope (reference:
        # VideoResBlock *extends* ResBlock, so keys sit directly here)
        h = GroupNorm(num_groups=32, fuse_silu=True, name="in_layers_0")(x)
        h = Conv(out_ch, name="in_layers_2", **dd)(h)
        emb_out = Dense(out_ch, name="emb_layers_1", **dd)(silu(emb))
        h = h + emb_out[:, None, None, :]
        h = GroupNorm(num_groups=32, fuse_silu=True, name="out_layers_0")(h)
        h = Conv(out_ch, name="out_layers_3", **dd)(h)
        if x.shape[-1] != out_ch:
            x = Conv(out_ch, kernel_size=1, padding=0,
                     name="skip_connection", **dd)(x)
        x = x + h

        bt, hh, ww, c = x.shape
        b = bt // t
        x_bt = x.reshape(b, t, hh, ww, c)
        emb_bt = emb.reshape(b, t, -1)
        x_temp = TemporalResBlock(out_ch, name="time_stack", **dd)(
            x_bt, emb_bt)
        mixed = AlphaBlender(name="time_mixer")(x_bt, x_temp, image_only)
        return mixed.reshape(bt, hh, ww, c)


class TemporalSelfAttention(nn.Module):
    """Self-attention over the frame axis without materializing the
    (B*S, T, C) layout: q/k/v are projected in the native (B*T, S, C)
    layout and the frame axis is contracted via einsum batch dims, so the
    two full-tensor transposes that used to bracket every temporal block
    become dot_general dimension numbers XLA folds into the (tiny, T x T)
    attention dots. Param tree matches CrossAttention (to_q/to_k/to_v/
    to_out_0) so checkpoint mapping is unchanged."""

    heads: int
    dim_head: int
    num_frames: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B*T, S, C), attends over T per (batch, pixel)."""
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        inner = self.heads * self.dim_head
        bt, s, c = x.shape
        t = self.num_frames
        b = bt // t
        q = Dense(inner, use_bias=False, name="to_q", **dd)(x)
        k = Dense(inner, use_bias=False, name="to_k", **dd)(x)
        v = Dense(inner, use_bias=False, name="to_v", **dd)(x)
        q = q.reshape(b, t, s, self.heads, self.dim_head)
        k = k.reshape(b, t, s, self.heads, self.dim_head)
        v = v.reshape(b, t, s, self.heads, self.dim_head)
        logits = jnp.einsum(
            "btshd,bushd->bshtu", q, k, preferred_element_type=jnp.float32
        ) * (self.dim_head ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bshtu,bushd->btshd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = out.reshape(bt, s, inner)
        return Dense(c, name="to_out_0", **dd)(out)


class VideoTransformerBlock(nn.Module):
    """Temporal attention block over the frame axis (video_attention.py
    VideoTransformerBlock with ff_in).

    All per-token ops (norms, GEGLU ffs, projections) are layout
    independent, so the whole block runs in the native (B*T, S, C)
    layout; only attn1 mixes frames, handled transpose-free by
    TemporalSelfAttention. attn2's context is per-batch, repeated per
    frame (T copies) instead of per pixel (S copies)."""

    heads: int
    dim_head: int
    num_frames: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_context):
        """x: (B*T, HW, C); per-pixel frame sequences attend over T."""
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bt, s, c = x.shape
        t = self.num_frames

        h = LayerNorm(name="norm_in")(x)
        x = x + FeedForward(name="ff_in", **dd)(h)
        h = LayerNorm(name="norm1")(x)
        x = x + TemporalSelfAttention(
            self.heads, self.dim_head, t, name="attn1", **dd)(h)
        if time_context is not None:
            tc = jnp.repeat(time_context, t, axis=0)
            h = LayerNorm(name="norm2")(x)
            x = x + CrossAttention(self.heads, self.dim_head, name="attn2",
                                   **dd)(h, tc)
        h = LayerNorm(name="norm3")(x)
        x = x + FeedForward(name="ff", **dd)(h)
        return x


class SpatialVideoTransformer(nn.Module):
    heads: int
    dim_head: int
    num_frames: int
    depth: int = 1
    use_linear: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    tome_ratio: float = 0.0      # ToMe on the spatial attn1 (per-frame
    #   token grids — the batch axis is B*T, so merging is frame-local)

    @nn.compact
    def __call__(self, x, context, time_context, image_only=None,
                 tome_offset=None):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bt, hh, ww, c = x.shape
        t = self.num_frames
        tome_r = 0
        if self.tome_ratio > 0 and hh % 2 == 0 and ww % 2 == 0:
            tome_r = min(int(hh * ww * self.tome_ratio), (hh * ww * 3) // 4)
        salt = zlib.crc32(str(self.name).encode()) & 0xFFFF
        residual = x
        h = GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        h = h.reshape(bt, hh * ww, c)
        if self.use_linear:
            h = Dense(c, name="proj_in", **dd)(h)

        # frame-position embedding added once (time_pos_embed MLP)
        frames = jnp.arange(t, dtype=jnp.float32)
        emb = timestep_embedding(frames, c).astype(self.dtype)
        emb = Dense(c * 4, name="time_pos_embed_0", **dd)(emb)
        emb = Dense(c, name="time_pos_embed_2", **dd)(silu(emb))
        b = bt // t
        pos = jnp.tile(emb[None], (b, 1, 1)).reshape(bt, 1, c)

        for d in range(self.depth):
            h = BasicTransformerBlock(
                self.heads, self.dim_head, name=f"transformer_blocks_{d}",
                tome_r=tome_r, tome_hw=(hh, ww), tome_salt=salt + d, **dd
            )(h, context, tome_offset=tome_offset)
            h_mix = h + pos
            h_mix = VideoTransformerBlock(
                self.heads, self.dim_head, t, name=f"time_stack_{d}", **dd
            )(h_mix, time_context)
            # blend per (B,T) with image_only override
            hb = h.reshape(b, t, hh * ww, c)
            hm = h_mix.reshape(b, t, hh * ww, c)
            h = AlphaBlender(name="time_mixer")(hb, hm, image_only)
            h = h.reshape(bt, hh * ww, c)

        if self.use_linear:
            h = Dense(c, name="proj_out", **dd)(h)
        h = h.reshape(bt, hh, ww, c)
        return h + residual


class VideoUNet(nn.Module):
    """forward(x (B*T,H,W,8), t (B*T,), context (B*T,1,1024),
    y (B*T,768), num_frames)."""

    cfg: UNetConfig
    num_frames: int = 14

    @nn.compact
    def __call__(self, x, timesteps, context, y=None, image_only=None, *,
                 mode: str = "full", deep=None, cache_levels: int = 1):
        # mode/deep/cache_levels: DeepCache capture/shallow split — same
        # contract as models/unet.py UNetModel (see its docstring and
        # samplers/deepcache.py).
        cfg = self.cfg
        t_frames = self.num_frames
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        mc = cfg.model_channels
        time_embed_dim = mc * 4

        assert mode in ("full", "capture", "shallow"), mode
        n_levels = len(cfg.channel_mult)
        if mode != "full":
            assert 1 <= cache_levels < n_levels, (
                f"cache_levels must be in [1, {n_levels - 1}]")
        if mode == "shallow":
            assert deep is not None, "shallow mode needs the cached deep tensor"

        t_emb = timestep_embedding(timesteps, mc).astype(cfg.dtype)
        emb = Dense(time_embed_dim, name="time_embed_0", **dd)(t_emb)
        emb = Dense(time_embed_dim, name="time_embed_2", **dd)(silu(emb))
        if cfg.adm_in_channels:
            y_emb = Dense(time_embed_dim, name="label_emb_0_0", **dd)(
                y.astype(cfg.dtype))
            y_emb = Dense(time_embed_dim, name="label_emb_0_2", **dd)(silu(y_emb))
            emb = emb + y_emb

        x = x.astype(cfg.dtype)
        context = context.astype(cfg.dtype)
        time_context = context[::t_frames]  # first-frame context per batch

        depths = cfg.transformer_depth
        if isinstance(depths, int):
            depths = (depths,) * len(cfg.channel_mult)

        # ToMe gating (same rule as UNetModel — see models/unet.py)
        tome_ds_limit = 0
        tome_off = None
        if cfg.tome_ratio > 0:
            tome_ds_limit = min(cfg.attention_resolutions) * \
                cfg.tome_max_downsample
            # bitcast, not truncation: EDM-style conditioners pass
            # fractional c_noise values whose int cast would freeze the
            # offset; the fp32 bit pattern varies with any change in t
            tome_off = jax.lax.bitcast_convert_type(
                jnp.reshape(timesteps, (-1,))[0].astype(jnp.float32),
                jnp.int32) & 0x7FFF


        def _tome_ratio(ds):
            return cfg.tome_ratio if 0 < ds <= tome_ds_limit else 0.0

        in_levels = (range(cache_levels) if mode == "shallow"
                     else range(n_levels))
        hs = []
        h = Conv(mc, name="input_blocks_0_0", **dd)(x)
        hs.append(h)
        block_idx = 1
        ds = 1
        ch = mc
        for level in in_levels:
            out_ch = mc * cfg.channel_mult[level]
            for _ in range(cfg.num_res_blocks):
                h = VideoResBlock(out_ch, t_frames,
                                  name=f"input_blocks_{block_idx}_0", **dd)(
                    h, emb, image_only)
                ch = out_ch
                if ds in cfg.attention_resolutions:
                    heads, dim_head = _heads_for(ch, cfg)
                    h = SpatialVideoTransformer(
                        heads, dim_head, t_frames, depth=depths[level],
                        name=f"input_blocks_{block_idx}_1",
                        tome_ratio=_tome_ratio(ds), **dd,
                    )(h, context, time_context, image_only,
                      tome_offset=tome_off)
                hs.append(h)
                block_idx += 1
            if level != n_levels - 1:
                if mode != "shallow" or level < cache_levels - 1:
                    h = Downsample(ch, name=f"input_blocks_{block_idx}_0",
                                   **dd)(h)
                    hs.append(h)
                block_idx += 1
                ds *= 2

        if mode != "shallow":
            heads, dim_head = _heads_for(ch, cfg)
            h = VideoResBlock(ch, t_frames, name="middle_block_0", **dd)(
                h, emb, image_only)
            h = SpatialVideoTransformer(
                heads, dim_head, t_frames, depth=cfg.transformer_depth_middle,
                name="middle_block_1", **dd)(h, context, time_context,
                                             image_only)
            h = VideoResBlock(ch, t_frames, name="middle_block_2", **dd)(
                h, emb, image_only)

        out_levels = (range(cache_levels - 1, -1, -1) if mode == "shallow"
                      else range(n_levels - 1, -1, -1))
        deep_out = None
        if mode == "shallow":
            h = deep.astype(cfg.dtype)
        for level in out_levels:
            if mode == "capture" and level == cache_levels - 1:
                deep_out = h
            out_ch = mc * cfg.channel_mult[level]
            ds = 2 ** level
            block_idx = (n_levels - 1 - level) * (cfg.num_res_blocks + 1)
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                h = VideoResBlock(out_ch, t_frames,
                                  name=f"output_blocks_{block_idx}_0", **dd)(
                    h, emb, image_only)
                ch = out_ch
                sub = 1
                if ds in cfg.attention_resolutions:
                    heads, dim_head = _heads_for(ch, cfg)
                    h = SpatialVideoTransformer(
                        heads, dim_head, t_frames, depth=depths[level],
                        name=f"output_blocks_{block_idx}_1",
                        tome_ratio=_tome_ratio(ds), **dd,
                    )(h, context, time_context, image_only,
                      tome_offset=tome_off)
                    sub = 2
                if level > 0 and i == cfg.num_res_blocks:
                    h = Upsample(ch, name=f"output_blocks_{block_idx}_{sub}",
                                 **dd)(h)
                block_idx += 1

        h = GroupNorm(num_groups=32, fuse_silu=True, name="out_0")(h)
        h = Conv(cfg.out_channels, name="out_2", **dd)(h)
        if mode == "capture":
            return h, deep_out
        return h
