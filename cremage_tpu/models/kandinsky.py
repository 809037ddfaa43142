"""Kandinsky 2.2 model cores (prior transformer + image-embed decoder).

Behavior contract: reference `modules/kandinsky/{txt2img,img2img,
inpaint}.py` — diffusers AutoPipeline prior+decoder. Kandinsky 2.2 is a
two-stage unCLIP design:
- the *prior* is a causal transformer that diffuses a CLIP image
  embedding (1280-d, ViT-bigG) conditioned on CLIP text embeddings;
- the *decoder* is a UNet conditioned on that image embedding (no text
  cross-attention; the embedding joins the time embedding), with a MoVQ
  first stage.

This module provides TPU-native cores for both stages with the same
tensor contracts (text tokens + pooled -> image embed; image embed +
latents -> eps). The diffusers checkpoint key mapping for these stages
is tracked for a later round; shapes/conditioning flow and the pipeline
behavior (modes, schedules, negative priors) follow the reference.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from cremage_tpu.models.layers import Dense, LayerNorm, timestep_embedding
from cremage_tpu.models.unet import UNetConfig
from cremage_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class PriorConfig:
    image_embed_dim: int = 1280
    text_embed_dim: int = 1280
    hidden: int = 2048
    num_layers: int = 20
    num_heads: int = 32
    text_tokens: int = 77
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32


class PriorBlock(nn.Module):
    cfg: PriorConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, n, c = x.shape
        h = cfg.num_heads
        d = c // h
        y = LayerNorm(name="ln_1")(x)
        q = Dense(c, name="q_proj", **dd)(y).reshape(b, n, h, d)
        k = Dense(c, name="k_proj", **dd)(y).reshape(b, n, h, d)
        v = Dense(c, name="v_proj", **dd)(y).reshape(b, n, h, d)
        a = attention(q, k, v, mask=mask).reshape(b, n, c)
        x = x + Dense(c, name="out_proj", **dd)(a)
        y = LayerNorm(name="ln_2")(x)
        y = Dense(4 * c, name="mlp_fc", **dd)(y)
        y = nn.gelu(y, approximate=False)
        return x + Dense(c, name="mlp_proj", **dd)(y)


class DiffusionPrior(nn.Module):
    """Token stream: [text tokens, text pooled, time, noisy image embed,
    learned query]; output read from the final query position (unCLIP
    prior layout)."""

    cfg: PriorConfig

    @nn.compact
    def __call__(self, noisy_image_embed, t, text_tokens, text_pooled):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b = noisy_image_embed.shape[0]
        c = cfg.hidden

        txt = Dense(c, name="text_proj", **dd)(text_tokens.astype(cfg.dtype))
        pool = Dense(c, name="pooled_proj", **dd)(
            text_pooled.astype(cfg.dtype))[:, None]
        # 2-layer time MLP over an inner-dim sinusoid (cos-first ==
        # diffusers Timesteps flip_sin_to_cos=True), matching the
        # PriorTransformer time_proj + time_embedding structure so the
        # diffusers checkpoint maps 1:1 (io/diffusers_keys.py).
        temb = Dense(c, name="time_embedding_linear_1", **dd)(
            timestep_embedding(t, c).astype(cfg.dtype))
        temb = Dense(c, name="time_embedding_linear_2", **dd)(
            nn.silu(temb))[:, None]
        img = Dense(c, name="image_embed_proj", **dd)(
            noisy_image_embed.astype(cfg.dtype))[:, None]
        query = self.param("prd_embedding", nn.initializers.normal(0.02),
                           (1, 1, c), cfg.param_dtype)
        query = jnp.broadcast_to(query.astype(cfg.dtype), (b, 1, c))
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.text_tokens + 4, c), cfg.param_dtype)
        x = jnp.concatenate([txt, pool, temb, img, query], axis=1)
        x = x + pos[: x.shape[1]].astype(cfg.dtype)

        n = x.shape[1]
        mask = jnp.tril(jnp.ones((n, n), bool))[None, None]
        for i in range(cfg.num_layers):
            x = PriorBlock(cfg, name=f"blocks_{i}")(x, mask)
        x = LayerNorm(name="final_ln")(x)
        return Dense(cfg.image_embed_dim, name="out_proj", **dd)(x[:, -1])


class KandinskyImageConditioner(nn.Module):
    """Decoder-side image-embed heads (structure of the diffusers
    UNet2DConditionModel the reference's Kandinsky decoder pipeline
    downloads, `modules/kandinsky/txt2img.py:26,66` — config
    addition_embed_type="image" + encoder_hid_dim_type="image_proj"):

    - time head: Linear(image_embed_dim -> time_embed_dim) + LayerNorm;
      the result is ADDED to the UNet time embedding (checkpoint keys
      add_embedding.image_proj / add_embedding.image_norm);
    - context head: Linear(image_embed_dim -> num_tokens*cross_dim) +
      LayerNorm, producing the cross-attention token sequence
      (checkpoint keys encoder_hid_proj.image_embeds /
      encoder_hid_proj.norm).

    Keeping these heads OUTSIDE the UNet lets the UNet body load through
    the generic sd_unet_from_diffusers mapping unchanged; the decoder
    UNet itself runs with adm_identity=True.
    """

    time_embed_dim: int
    cross_dim: int
    num_tokens: int = 10
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embed):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b = image_embed.shape[0]
        x = image_embed.astype(self.dtype)
        tvec = Dense(self.time_embed_dim, name="image_proj", **dd)(x)
        tvec = LayerNorm(name="image_norm")(tvec)
        ctx = Dense(self.num_tokens * self.cross_dim,
                    name="context_proj", **dd)(x)
        ctx = ctx.reshape(b, self.num_tokens, self.cross_dim)
        ctx = LayerNorm(name="context_norm")(ctx)
        return tvec, ctx


def kandinsky_decoder_config(image_embed_dim: int = 1280,
                             cross_dim: int = 768, **kw) -> UNetConfig:
    """Decoder UNet: image-time vector enters via adm_identity (computed
    by KandinskyImageConditioner's time head); cross-attention runs over
    the conditioner's projected image tokens. No text conditioning in
    the decoder (unCLIP design)."""
    base = dict(
        in_channels=4, out_channels=4, model_channels=128,
        num_res_blocks=2, attention_resolutions=(4, 2),
        channel_mult=(1, 2, 4, 4), num_heads=8,
        transformer_depth=(1, 1, 1, 1), transformer_depth_middle=1,
        context_dim=cross_dim, adm_identity=True,
    )
    base.update(kw)
    return UNetConfig(**base)
