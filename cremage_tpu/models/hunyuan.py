"""Hunyuan-DiT core (U-shaped DiT with dual bilingual text context).

Behavior contract: reference `modules/hunyuan_dit/txt2img.py` —
diffusers HunyuanDiTPipeline (bilingual CLIP 77x1024 + mT5 256x2048 text
towers, optional quantized T5), v-prediction DiT.

Core structure implemented here (per the public HunyuanDiT design):
patchified latents, timestep modulation, N blocks of
self-attn (RoPE 2D, qk-norm) + cross-attn over the concatenated
[CLIP; mT5-projected] text tokens + MLP, with U-ViT long skip
connections (second half of the blocks concatenates the mirrored first-
half activations through a skip linear). Tencent checkpoint key mapping
is tracked for a later round.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.layers import Conv, Dense, LayerNorm, silu, timestep_embedding
from cremage_tpu.models.flux import apply_rope, rope_freqs
from cremage_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class HunyuanConfig:
    patch_size: int = 2
    in_channels: int = 4
    out_channels: int = 8            # v + learned sigma
    hidden_size: int = 1408
    depth: int = 40
    num_heads: int = 16
    clip_dim: int = 1024
    mt5_dim: int = 2048
    mlp_ratio: float = 4.3
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32


class HunyuanBlock(nn.Module):
    cfg: HunyuanConfig
    skip: bool = False

    @nn.compact
    def __call__(self, x, text, t_vec, freqs, skip_x=None):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        c = cfg.hidden_size
        h = cfg.num_heads
        d = c // h
        b, n, _ = x.shape

        if self.skip and skip_x is not None:
            x = Dense(c, name="skip_linear", **dd)(
                LayerNorm(name="skip_norm")(
                    jnp.concatenate([x, skip_x], axis=-1)))

        # per-block timestep modulation (HunyuanDiT default_modulation:
        # SiLU -> Linear, shift added after norm1)
        t_mod = Dense(c, name="default_modulation_1", **dd)(silu(t_vec))
        y = LayerNorm(name="norm1")(x) + t_mod[:, None]
        qkv = Dense(3 * c, name="attn1_qkv", **dd)(y).reshape(b, n, 3, h, d)
        q = LayerNorm(name="attn1_q_norm")(qkv[:, :, 0])  # per-head qk-norm
        k = LayerNorm(name="attn1_k_norm")(qkv[:, :, 1])
        q = apply_rope(q.astype(cfg.dtype), freqs)
        k = apply_rope(k.astype(cfg.dtype), freqs)
        a = attention(q, k, qkv[:, :, 2]).reshape(b, n, c)
        x = x + Dense(c, name="attn1_proj", **dd)(a)

        y = LayerNorm(name="norm2")(x)
        q = Dense(c, name="attn2_q", **dd)(y).reshape(b, n, h, d)
        kv = Dense(2 * c, name="attn2_kv", **dd)(text)
        m = text.shape[1]
        kv = kv.reshape(b, m, 2, h, d)
        q = LayerNorm(name="attn2_q_norm")(q).astype(cfg.dtype)
        k = LayerNorm(name="attn2_k_norm")(kv[:, :, 0]).astype(cfg.dtype)
        a = attention(q, k, kv[:, :, 1]).reshape(b, n, c)
        x = x + Dense(c, name="attn2_proj", **dd)(a)

        y = LayerNorm(name="norm3")(x)
        mlp_dim = int(c * cfg.mlp_ratio)
        y = Dense(mlp_dim, name="mlp_fc1", **dd)(y)
        y = nn.gelu(y, approximate=True)
        return x + Dense(c, name="mlp_fc2", **dd)(y)


class HunyuanDiT(nn.Module):
    cfg: HunyuanConfig

    @nn.compact
    def __call__(self, x, t, clip_text, mt5_text):
        """x: (B,H,W,4); t: (B,); clip_text: (B,77,clip_dim);
        mt5_text: (B,L,mt5_dim)."""
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        p = cfg.patch_size
        b, hh, ww, _ = x.shape
        hp, wp = hh // p, ww // p
        c = cfg.hidden_size

        tokens = Conv(c, kernel_size=p, stride=p, padding=0,
                      name="x_embedder_proj", **dd)(x.astype(cfg.dtype))
        tokens = tokens.reshape(b, hp * wp, c)

        # 2D RoPE ids
        ys, xs = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
        ids = np.stack([np.zeros_like(ys), ys, xs], -1).reshape(-1, 3)
        d_head = c // cfg.num_heads
        freqs = jnp.asarray(rope_freqs(
            ids, (d_head - 2 * (d_head // 4), d_head // 4, d_head // 4),
            10000.0))

        t_emb = timestep_embedding(t, 256).astype(cfg.dtype)
        t_vec = Dense(c, name="t_embedder_mlp_0", **dd)(t_emb)
        t_vec = Dense(c, name="t_embedder_mlp_2", **dd)(silu(t_vec))

        # Extra conditioning (HunyuanDiT v1.2 combined-embedding flow:
        # attention-pooled mT5 summary -> 2-layer extra embedder, added
        # to the timestep vector; size/style conds were dropped in v1.2).
        ph = 8
        pd = cfg.mt5_dim // ph
        bq = self.param("pooler_query", nn.initializers.normal(0.02),
                        (1, 1, cfg.mt5_dim), cfg.param_dtype)
        pq = jnp.broadcast_to(bq.astype(cfg.dtype), (b, 1, cfg.mt5_dim))
        pk = Dense(cfg.mt5_dim, name="pooler_k_proj", **dd)(
            mt5_text.astype(cfg.dtype))
        pv = Dense(cfg.mt5_dim, name="pooler_v_proj", **dd)(
            mt5_text.astype(cfg.dtype))
        lm = mt5_text.shape[1]
        pooled = attention(
            Dense(cfg.mt5_dim, name="pooler_q_proj", **dd)(pq)
            .reshape(b, 1, ph, pd),
            pk.reshape(b, lm, ph, pd), pv.reshape(b, lm, ph, pd),
        ).reshape(b, cfg.mt5_dim)
        pooled = Dense(1024, name="pooler_c_proj", **dd)(pooled)
        extra = Dense(4 * c, name="extra_embedder_fc1", **dd)(pooled)
        extra = Dense(c, name="extra_embedder_fc2", **dd)(
            nn.silu(extra))
        t_vec = t_vec + extra

        text = jnp.concatenate([
            Dense(c, name="clip_proj", **dd)(clip_text.astype(cfg.dtype)),
            Dense(c, name="mt5_proj", **dd)(mt5_text.astype(cfg.dtype)),
        ], axis=1)

        skips = []
        half = cfg.depth // 2
        for i in range(cfg.depth):
            if i < half:
                tokens = HunyuanBlock(cfg, name=f"blocks_{i}")(
                    tokens, text, t_vec, freqs)
                skips.append(tokens)
            else:
                tokens = HunyuanBlock(cfg, skip=True, name=f"blocks_{i}")(
                    tokens, text, t_vec, freqs, skips.pop())

        # final adaLN (HunyuanDiT final_layer.adaLN_modulation: SiLU ->
        # Linear -> shift/scale on the final norm)
        mod = Dense(2 * c, name="final_adaLN_1", **dd)(silu(t_vec))
        shift, scale = jnp.split(mod, 2, axis=-1)
        out = LayerNorm(name="final_norm")(tokens)
        out = out * (1 + scale[:, None]) + shift[:, None]
        out = Dense(p * p * cfg.out_channels, name="final_linear", **dd)(out)
        out = out.reshape(b, hp, wp, p, p, cfg.out_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, cfg.out_channels)
        return out
