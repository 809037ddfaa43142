"""Stable Diffusion UNet (SD1.5 / SD2 / SDXL base+refiner / inpaint / ControlNet
host) as a Flax module, NHWC, bf16 compute / fp32 norms.

Architecture contract follows the CompVis/sgm `UNetModel`
(reference `modules/ldm/modules/diffusionmodules/openaimodel.py` and
`modules/sdxl/sgm/modules/diffusionmodules/openaimodel.py`; configs
`configs/ldm/configs/stable-diffusion/v1-inference.yaml` and
`modules/sdxl/configs/inference/sd_xl_base.yaml`) — re-implemented
TPU-first: NHWC convs, fp32-softmax attention behind ops/attention.py
(Pallas flash path), no CPU-offload staging, LoRA/IPA as load-time
weight transforms instead of module surgery.

Module names flatten (joined with "_") to the torch checkpoint key
strings, e.g. params["input_blocks_1_0"]["in_layers_0"]["weight"] <->
ckpt "model.diffusion_model.input_blocks.1.0.in_layers.0.weight", making
weight loading a mechanical string transform (io/checkpoint.py).
"""
from __future__ import annotations

import dataclasses
import zlib
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cremage_tpu.models.layers import (
    Conv, Dense, GroupNorm, LayerNorm, silu, timestep_embedding,
)
from cremage_tpu.ops import tome
from cremage_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8                 # used when num_head_channels == -1
    num_head_channels: int = -1
    transformer_depth: Tuple[int, ...] = (1, 1, 1, 1)  # per level
    transformer_depth_middle: int = 1
    context_dim: int = 768
    adm_in_channels: int = 0           # 0 = no vector conditioning
    adm_identity: bool = False         # y is already a time_embed_dim vector
    #   (added to emb with no label MLP — the Kandinsky 2.2 decoder
    #   computes its image-time vector in an external head; see
    #   models/kandinsky.py KandinskyImageConditioner)
    use_linear_in_transformer: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    # IP-Adapter-FaceID extra-attention branch (set when FaceID active)
    ipa_num_tokens: int = 0
    ipa_scale: float = 0.0

    # Token merging (ToMe, ops/tome.py — opt-in speed feature beyond
    # reference parity). tome_ratio r>0 merges int(N*r) tokens before
    # each self-attention at the highest-resolution attention level(s);
    # tome_max_downsample widens application to deeper levels (1 = only
    # the first attention level, ToMeSD's default).
    tome_ratio: float = 0.0
    tome_max_downsample: int = 1


def sd15_unet_config(in_channels: int = 4, **kw) -> UNetConfig:
    """v1-inference.yaml / inpainting.yaml (in_channels=9)."""
    return UNetConfig(in_channels=in_channels, **kw)


def sdxl_base_unet_config(**kw) -> UNetConfig:
    """sd_xl_base.yaml network_config."""
    return UNetConfig(
        in_channels=4,
        out_channels=4,
        model_channels=320,
        attention_resolutions=(4, 2),
        channel_mult=(1, 2, 4),
        num_head_channels=64,
        num_heads=-1,
        transformer_depth=(1, 2, 10),
        transformer_depth_middle=10,
        context_dim=2048,
        adm_in_channels=2816,
        use_linear_in_transformer=True,
        **kw,
    )


def sdxl_refiner_unet_config(**kw) -> UNetConfig:
    """sd_xl_refiner.yaml network_config."""
    return UNetConfig(
        in_channels=4,
        out_channels=4,
        model_channels=384,
        attention_resolutions=(4, 2),
        channel_mult=(1, 2, 4, 4),
        num_head_channels=64,
        num_heads=-1,
        transformer_depth=(4, 4, 4, 4),
        transformer_depth_middle=4,
        context_dim=1280,
        adm_in_channels=2560,
        use_linear_in_transformer=True,
        **kw,
    )


class CrossAttention(nn.Module):
    """Self/cross attention; optional IP-Adapter extra-kv branch
    (reference `modules/ldm/modules/attention.py:265-356` CrossAttention
    with to_k_ipa/to_v_ipa; LoRA deltas are merged into weights at load)."""

    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    ipa_num_tokens: int = 0
    ipa_scale: float = 0.0

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        is_self = context is None
        ctx = x if is_self else context

        ipa_ctx = None
        if (not is_self) and self.ipa_num_tokens > 0:
            # context layout: [text tokens ..., ipa tokens] appended by the
            # pipeline (reference sd/image_generator.py:810-814)
            ipa_ctx = ctx[:, -self.ipa_num_tokens:, :]
            ctx = ctx[:, : ctx.shape[1] - self.ipa_num_tokens, :]

        if (not is_self) and ipa_ctx is None and ctx.shape[1] == 1:
            # Single-kv-token cross attention (SVD: the 1-token CLIP image
            # embedding is the whole context): softmax over one logit is
            # identically 1, so out = to_out(to_v(ctx)) broadcast over the
            # query tokens — q/k never influence the output. Computing the
            # projections on one token instead of all N removes two full
            # N x C x C matmuls per block. to_q/to_k params are still
            # registered (on a 1-token slice; XLA dead-code-eliminates the
            # unused dots) so checkpoint key mapping is unchanged.
            _ = Dense(inner, use_bias=False, name="to_q", **dd)(x[:, :1])
            _ = Dense(inner, use_bias=False, name="to_k", **dd)(ctx)
            v1 = Dense(inner, use_bias=False, name="to_v", **dd)(ctx)
            out1 = Dense(x.shape[-1], name="to_out_0", **dd)(v1)
            return jnp.broadcast_to(out1, x.shape)

        q = Dense(inner, use_bias=False, name="to_q", **dd)(x)
        k = Dense(inner, use_bias=False, name="to_k", **dd)(ctx)
        v = Dense(inner, use_bias=False, name="to_v", **dd)(ctx)

        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, m, self.heads, self.dim_head)
        v = v.reshape(b, m, self.heads, self.dim_head)
        out = attention(q, k, v)

        if ipa_ctx is not None:
            k_ipa = Dense(inner, use_bias=False, name="to_k_ipa", **dd)(ipa_ctx)
            v_ipa = Dense(inner, use_bias=False, name="to_v_ipa", **dd)(ipa_ctx)
            k_ipa = k_ipa.reshape(b, self.ipa_num_tokens, self.heads, self.dim_head)
            v_ipa = v_ipa.reshape(b, self.ipa_num_tokens, self.heads, self.dim_head)
            out = out + self.ipa_scale * attention(q, k_ipa, v_ipa)

        out = out.reshape(b, n, inner)
        return Dense(x.shape[-1], name="to_out_0", **dd)(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward (attention.py GEGLU + FeedForward semantics)."""

    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = dim * self.mult
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = Dense(inner * 2, name="net_0_proj", **dd)(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # GEGLU activation: exact (erf) gelu in fp32 for bit-level torch
        # parity; tanh approximation under bf16 compute, where its error
        # (<4e-4 absolute) is below bf16 rounding and the erf epilogue
        # otherwise doubles the ff dot-chain time on the VPU (measured
        # v5e, 129k x 320 GEGLU pair: erf 4.02 ms vs tanh 2.07 ms —
        # SVD's temporal ff_in/ff was 37% of video-UNet time).
        exact = jnp.dtype(self.dtype) != jnp.bfloat16
        h = h * nn.gelu(gate, approximate=not exact)
        return Dense(dim, name="net_2", **dd)(h)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    ipa_num_tokens: int = 0
    ipa_scale: float = 0.0
    # ToMe (ops/tome.py): merge tome_r tokens around attn1 when > 0.
    # tome_hw is the 2D token grid; tome_salt decorrelates the dst-grid
    # offset across blocks (mixed with the timestep-derived offset).
    tome_r: int = 0
    tome_hw: Tuple[int, int] = (0, 0)
    tome_salt: int = 0

    @nn.compact
    def __call__(self, x, context, tome_offset=None):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        attn1 = CrossAttention(self.heads, self.dim_head, name="attn1", **dd)
        if self.tome_r > 0:
            # metric = the block input itself (ToMeSD §4.1); plan is
            # recomputed per block on its own input
            off = (0 if tome_offset is None else tome_offset) + self.tome_salt
            plan = tome.build_plan(x, self.tome_hw[0], self.tome_hw[1],
                                   self.tome_r, off)
            a = attn1(tome.merge(plan, LayerNorm(name="norm1")(x)))
            x = x + tome.unmerge(plan, a)
        else:
            x = x + attn1(LayerNorm(name="norm1")(x))
        x = x + CrossAttention(
            self.heads, self.dim_head, name="attn2",
            ipa_num_tokens=self.ipa_num_tokens, ipa_scale=self.ipa_scale, **dd
        )(LayerNorm(name="norm2")(x), context)
        x = x + FeedForward(name="ff", **dd)(LayerNorm(name="norm3")(x))
        return x


class SpatialTransformer(nn.Module):
    heads: int
    dim_head: int
    depth: int = 1
    use_linear: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    ipa_num_tokens: int = 0
    ipa_scale: float = 0.0
    tome_ratio: float = 0.0

    @nn.compact
    def __call__(self, x, context, tome_offset=None):
        b, h, w, c = x.shape
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # ToMe applies only when the grid tiles into 2x2 windows and the
        # requested ratio removes at least one token (static checks)
        tome_r = 0
        if self.tome_ratio > 0 and h % 2 == 0 and w % 2 == 0:
            tome_r = min(int(h * w * self.tome_ratio), (h * w * 3) // 4)
        salt = zlib.crc32(str(self.name).encode()) & 0xFFFF
        residual = x
        x = GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        if self.use_linear:
            x = x.reshape(b, h * w, c)
            x = Dense(c, name="proj_in", **dd)(x)
        else:
            x = Conv(c, kernel_size=1, padding=0, name="proj_in", **dd)(x)
            x = x.reshape(b, h * w, c)
        for d in range(self.depth):
            x = BasicTransformerBlock(
                self.heads, self.dim_head, name=f"transformer_blocks_{d}",
                ipa_num_tokens=self.ipa_num_tokens, ipa_scale=self.ipa_scale,
                tome_r=tome_r, tome_hw=(h, w), tome_salt=salt + d, **dd
            )(x, context, tome_offset=tome_offset)
        if self.use_linear:
            x = Dense(c, name="proj_out", **dd)(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, c)
            x = Conv(c, kernel_size=1, padding=0, name="proj_out", **dd)(x)
        return x + residual


class ResBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = GroupNorm(num_groups=32, fuse_silu=True, name="in_layers_0")(x)
        h = Conv(self.out_channels, name="in_layers_2", **dd)(h)
        emb_out = Dense(self.out_channels, name="emb_layers_1", **dd)(silu(emb))
        h = h + emb_out[:, None, None, :]
        h = GroupNorm(num_groups=32, fuse_silu=True, name="out_layers_0")(h)
        h = Conv(self.out_channels, name="out_layers_3", **dd)(h)
        if x.shape[-1] != self.out_channels:
            x = Conv(self.out_channels, kernel_size=1, padding=0,
                     name="skip_connection", **dd)(x)
        return x + h


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Conv(self.channels, stride=2, name="op",
                    dtype=self.dtype, param_dtype=self.param_dtype)(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
        return Conv(self.channels, name="conv",
                    dtype=self.dtype, param_dtype=self.param_dtype)(x)


def _heads_for(ch: int, cfg: UNetConfig) -> Tuple[int, int]:
    if cfg.num_head_channels == -1:
        return cfg.num_heads, ch // cfg.num_heads
    return ch // cfg.num_head_channels, cfg.num_head_channels


class UNetModel(nn.Module):
    """The denoising UNet. forward(x NHWC, t (B,), context (B,L,D), y, control).

    Deep-feature caching (DeepCache, Ma et al. 2023 — an opt-in speed
    feature beyond reference parity; the reference has no equivalent):
    - mode="full" (default): the normal forward; returns the output.
    - mode="capture": same compute as "full" but returns
      (out, deep) where `deep` is the hidden state entering the first
      output block of level cache_levels-1 (i.e. the result of all
      levels >= cache_levels plus the middle block, after the final
      deep upsample).
    - mode="shallow": takes that `deep` tensor from a previous step and
      recomputes ONLY levels < cache_levels (input conv, shallow input
      blocks, shallow output blocks) — the deep 80-90% of the graph is
      skipped. Unused deep params in the passed pytree are ignored by
      Flax, so the same param tree serves both modes.
    """

    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, timesteps, context, y=None, control=None, *,
                 mode: str = "full", deep=None, cache_levels: int = 1):
        cfg = self.cfg
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
            assert control is None, (
                "deep-cache shallow steps do not support ControlNet "
                "(control residuals target the cached deep blocks)")

        t_emb = timestep_embedding(timesteps, mc).astype(cfg.dtype)
        emb = Dense(time_embed_dim, name="time_embed_0", **dd)(t_emb)
        emb = Dense(time_embed_dim, name="time_embed_2", **dd)(silu(emb))

        if cfg.adm_identity:
            assert y is not None, "this UNet expects vector conditioning y"
            emb = emb + y.astype(cfg.dtype)
        elif cfg.adm_in_channels:
            assert y is not None, "this UNet expects vector conditioning y"
            y_emb = Dense(time_embed_dim, name="label_emb_0_0", **dd)(
                y.astype(cfg.dtype)
            )
            y_emb = Dense(time_embed_dim, name="label_emb_0_2", **dd)(silu(y_emb))
            emb = emb + y_emb

        x = x.astype(cfg.dtype)
        context = context.astype(cfg.dtype) if context is not None else None

        depths = cfg.transformer_depth
        if isinstance(depths, int):
            depths = (depths,) * len(cfg.channel_mult)

        # ToMe: eligible at attention levels with ds <= (first attention
        # ds) * tome_max_downsample; the dst-grid offset varies with the
        # sampler timestep so the merge pattern never sits still
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

        # ---- input blocks ----
        # In shallow mode only levels < cache_levels are built; the
        # Downsample ending level cache_levels-1 feeds the (cached) deep
        # path and its skip is consumed by a deep output block, so it is
        # skipped too.  Earlier downsamples' skips ARE consumed by
        # shallow output blocks and are built.
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
                h = ResBlock(out_ch, name=f"input_blocks_{block_idx}_0", **dd)(h, emb)
                ch = out_ch
                if ds in cfg.attention_resolutions:
                    heads, dim_head = _heads_for(ch, cfg)
                    h = SpatialTransformer(
                        heads, dim_head, depth=depths[level],
                        use_linear=cfg.use_linear_in_transformer,
                        name=f"input_blocks_{block_idx}_1",
                        ipa_num_tokens=cfg.ipa_num_tokens, ipa_scale=cfg.ipa_scale,
                        tome_ratio=_tome_ratio(ds),
                        **dd,
                    )(h, context, tome_offset=tome_off)
                hs.append(h)
                block_idx += 1
            if level != n_levels - 1:
                needed = mode != "shallow" or level < cache_levels - 1
                if needed:
                    h = Downsample(ch, name=f"input_blocks_{block_idx}_0", **dd)(h)
                    hs.append(h)
                block_idx += 1
                ds *= 2

        # ---- middle (deep; skipped in shallow mode) ----
        if mode != "shallow":
            heads, dim_head = _heads_for(ch, cfg)
            h = ResBlock(ch, name="middle_block_0", **dd)(h, emb)
            h = SpatialTransformer(
                heads, dim_head, depth=cfg.transformer_depth_middle,
                use_linear=cfg.use_linear_in_transformer, name="middle_block_1",
                ipa_num_tokens=cfg.ipa_num_tokens, ipa_scale=cfg.ipa_scale, **dd,
            )(h, context)
            h = ResBlock(ch, name="middle_block_2", **dd)(h, emb)

        if control is not None:
            input_res, middle_res = control
            h = h + middle_res.astype(h.dtype)
            hs = [
                hi + ri.astype(hi.dtype) for hi, ri in zip(hs, input_res)
            ]

        # ---- output blocks ----
        # Level l's output blocks run at ds = 2**l and occupy block
        # indices (n_levels-1-l)*(num_res_blocks+1) ...; computing both
        # explicitly lets shallow mode name its (last) blocks correctly.
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
                h = ResBlock(out_ch, name=f"output_blocks_{block_idx}_0", **dd)(h, emb)
                ch = out_ch
                sub = 1
                if ds in cfg.attention_resolutions:
                    heads, dim_head = _heads_for(ch, cfg)
                    h = SpatialTransformer(
                        heads, dim_head, depth=depths[level],
                        use_linear=cfg.use_linear_in_transformer,
                        name=f"output_blocks_{block_idx}_1",
                        ipa_num_tokens=cfg.ipa_num_tokens, ipa_scale=cfg.ipa_scale,
                        tome_ratio=_tome_ratio(ds),
                        **dd,
                    )(h, context, tome_offset=tome_off)
                    sub = 2
                if level > 0 and i == cfg.num_res_blocks:
                    h = Upsample(ch, name=f"output_blocks_{block_idx}_{sub}", **dd)(h)
                block_idx += 1

        h = GroupNorm(num_groups=32, fuse_silu=True, name="out_0")(h)
        h = Conv(cfg.out_channels, name="out_2", **dd)(h)
        if mode == "capture":
            return h, deep_out
        return h
