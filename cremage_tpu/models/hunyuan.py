"""Hunyuan-DiT core (U-shaped DiT with dual bilingual text context).

Behavior contract: reference `modules/hunyuan_dit/txt2img.py` —
diffusers HunyuanDiTPipeline (bilingual CLIP 77x1024 + mT5 256x2048 text
towers), v-prediction DiT.

Structure follows the diffusers HunyuanDiT2DModel the reference
downloads, so the checkpoint maps mechanically
(io/diffusers_keys.py::hunyuan_from_diffusers):
- patchified latents (pos_embed.proj), 2D RoPE on head-dim halves;
- per-block AdaLayerNormShift (SiLU -> Linear shift after norm1),
  self-attention with per-head qk layer-norm, cross-attention over the
  joint [CLIP; text_embedder(mT5)] 1024-wide token stream, gelu MLP;
- U-ViT long skips (skip_norm + skip_linear on the decoder half);
- time conditioning = timestep embedding + extra_embedder(attention-
  pooled mT5 summary) (v1.2 flow: no size/style conds);
- final AdaLayerNormContinuous (scale/shift, affine-free norm) +
  linear projection to patch outputs.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.layers import Conv, Dense, LayerNorm, silu, timestep_embedding
from cremage_tpu.models.flux import apply_rope, rope_freqs
from cremage_tpu.ops import tome
from cremage_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class HunyuanConfig:
    patch_size: int = 2
    in_channels: int = 4
    out_channels: int = 8            # v + learned sigma
    hidden_size: int = 1408
    depth: int = 40
    num_heads: int = 16
    clip_dim: int = 1024             # joint text-token width (cross dim)
    mt5_dim: int = 2048
    pooled_dim: int = 1024           # attention-pool output width
    pooler_heads: int = 8
    mlp_ratio: float = 4.3
    text_len: int = 77               # CLIP token count (for padding param)
    text_len_t5: int = 256           # mT5 token count (for padding param)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    # Set (to a mesh axis name) ONLY inside a shard_map body with the
    # latent patch-row axis sharded over that axis: self-attention runs
    # the ring schedule; cross-attention stays local (its kv is the
    # replicated joint text stream).  parallel/sequence.py
    # hunyuan_sp_apply is the entry point.
    sp_axis: Optional[str] = None
    # Token merging (ToMe, ops/tome.py — opt-in speed feature beyond
    # reference parity): one merge of int(N*ratio) tokens after the
    # patch embed, the whole block stack (incl. the per-token U-ViT
    # skips) runs reduced with gathered RoPE rows, the final projection
    # output is unmerged.  Composes with deep_cache (the Δ-cache is
    # stored in full-token space); not with sp_axis.
    tome_ratio: float = 0.0


def _silu_fp32(x, dtype):
    return nn.silu(x.astype(jnp.float32)).astype(dtype)


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

        # AdaLayerNormShift: per-block timestep shift after norm1
        # (diffusers blocks.N.norm1.linear / norm1.norm)
        t_mod = Dense(c, name="default_modulation_1", **dd)(silu(t_vec))
        y = LayerNorm(name="norm1")(x) + t_mod[:, None]
        qkv = Dense(3 * c, name="attn1_qkv", **dd)(y).reshape(b, n, 3, h, d)
        q = LayerNorm(name="attn1_q_norm")(qkv[:, :, 0])  # per-head qk-norm
        k = LayerNorm(name="attn1_k_norm")(qkv[:, :, 1])
        q = apply_rope(q.astype(cfg.dtype), freqs)
        k = apply_rope(k.astype(cfg.dtype), freqs)
        if cfg.sp_axis is not None:
            from cremage_tpu.parallel.sequence import ring_attention_body

            a = ring_attention_body(q, k, qkv[:, :, 2],
                                    axis_name=cfg.sp_axis).reshape(b, n, c)
        else:
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
    def __call__(self, x, t, clip_text, mt5_text,
                 freqs: Optional[jnp.ndarray] = None,
                 mode: str = "full", deep=None, cache_depth: int = 1):
        """x: (B,H,W,4); t: (B,); clip_text: (B,77,clip_dim);
        mt5_text: (B,L,mt5_dim).

        `freqs` ((N, d_head/2, 2) traced) overrides the host-computed
        2D RoPE table — the sequence-parallel path passes each shard
        its band of the GLOBAL grid (the host computation inside a
        shard_map body would see only the local hp).

        Deep-cache modes (samplers/deepcache.py, Δ-cache over the back
        blocks — see models/mmdit.py for the full contract): "capture"
        returns (out, delta) with delta = tokens_final - tokens_after_
        front (fp32); "shallow" runs only the front `cache_depth`
        blocks and splices the cached delta back in.  cache_depth must
        stay within the encoder half (the U-ViT long skips from the
        front blocks are consumed only by the cached back half, so a
        shallow prefix never needs them)."""
        cfg = self.cfg
        assert mode in ("full", "capture", "shallow"), mode
        if mode != "full":
            assert 1 <= cache_depth <= cfg.depth // 2, (
                f"cache_depth must be in [1, {cfg.depth // 2}]")
        if mode == "shallow":
            assert deep is not None, "shallow mode needs the cached delta"
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        p = cfg.patch_size
        b, hh, ww, _ = x.shape
        hp, wp = hh // p, ww // p
        c = cfg.hidden_size

        tokens = Conv(c, kernel_size=p, stride=p, padding=0,
                      name="x_embedder_proj", **dd)(x.astype(cfg.dtype))
        tokens = tokens.reshape(b, hp * wp, c)

        # 2D RoPE: head dim split into (y, x) halves (diffusers
        # get_2d_rotary_pos_embed semantics, flux rotation convention)
        d_head = c // cfg.num_heads
        if freqs is None:
            ys, xs = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
            ids = np.stack([ys, xs], -1).reshape(-1, 2)
            freqs = jnp.asarray(rope_freqs(
                ids, (d_head - d_head // 2, d_head // 2), 10000.0))

        plan = None
        if cfg.tome_ratio > 0:
            assert cfg.sp_axis is None, (
                "tome_ratio does not compose with sequence parallelism")
            plan = tome.plan_for_grid(tokens, hp, wp, cfg.tome_ratio, t)
            if plan is not None:
                tokens = tome.merge(plan, tokens)
                freqs = tome.select(plan, jnp.broadcast_to(
                    freqs[None], (b,) + freqs.shape))

        t_emb = timestep_embedding(t, 256).astype(cfg.dtype)
        t_vec = Dense(c, name="t_embedder_mlp_0", **dd)(t_emb)
        t_vec = Dense(c, name="t_embedder_mlp_2", **dd)(silu(t_vec))

        # Extra conditioning: attention-pooled mT5 summary (diffusers
        # HunyuanDiTAttentionPool: mean token prepended, learned
        # positional embedding, q from the mean token) -> extra_embedder
        # (v1.2: no size/style conds).
        ph = cfg.pooler_heads
        pd = cfg.mt5_dim // ph
        lm = mt5_text.shape[1]
        mt5 = mt5_text.astype(cfg.dtype)
        pooled_in = jnp.concatenate([mt5.mean(axis=1, keepdims=True), mt5],
                                    axis=1)
        pool_pos = self.param(
            "pooler_positional_embedding",
            nn.initializers.normal(cfg.mt5_dim ** -0.5),
            (cfg.text_len_t5 + 1, cfg.mt5_dim), cfg.param_dtype)
        pooled_in = pooled_in + pool_pos[: lm + 1].astype(cfg.dtype)
        pq = Dense(cfg.mt5_dim, name="pooler_q_proj", **dd)(
            pooled_in[:, :1]).reshape(b, 1, ph, pd)
        pk = Dense(cfg.mt5_dim, name="pooler_k_proj", **dd)(
            pooled_in).reshape(b, lm + 1, ph, pd)
        pv = Dense(cfg.mt5_dim, name="pooler_v_proj", **dd)(
            pooled_in).reshape(b, lm + 1, ph, pd)
        pooled = attention(pq, pk, pv).reshape(b, cfg.mt5_dim)
        pooled = Dense(cfg.pooled_dim, name="pooler_c_proj", **dd)(pooled)
        extra = Dense(4 * c, name="extra_embedder_fc1", **dd)(pooled)
        extra = Dense(c, name="extra_embedder_fc2", **dd)(
            _silu_fp32(extra, cfg.dtype))
        t_vec = t_vec + extra

        # Joint text stream: CLIP tokens pass through at clip_dim width;
        # mT5 tokens projected by the text_embedder MLP (silu_fp32).
        mt5_proj = Dense(4 * cfg.mt5_dim, name="text_embedder_linear_1",
                         **dd)(mt5)
        mt5_proj = Dense(cfg.clip_dim, name="text_embedder_linear_2", **dd)(
            _silu_fp32(mt5_proj, cfg.dtype))
        text = jnp.concatenate([clip_text.astype(cfg.dtype), mt5_proj],
                               axis=1)
        # learned padding rows (diffusers replaces masked-out token
        # positions with these; with dense upstream conditioning the
        # parameter is carried for checkpoint parity)
        self.param("text_embedding_padding",
                   nn.initializers.normal(0.02),
                   (cfg.text_len + cfg.text_len_t5, cfg.clip_dim),
                   cfg.param_dtype)

        skips = []
        half = cfg.depth // 2
        n_blocks = cache_depth if mode == "shallow" else cfg.depth
        front = None
        for i in range(n_blocks):
            if i < half:
                tokens = HunyuanBlock(cfg, name=f"blocks_{i}")(
                    tokens, text, t_vec, freqs)
                skips.append(tokens)
            else:
                tokens = HunyuanBlock(cfg, skip=True, name=f"blocks_{i}")(
                    tokens, text, t_vec, freqs, skips.pop())
            if mode == "capture" and i == cache_depth - 1:
                front = tokens
        # The Δ-cache lives in FULL-token space so ToMe composes: capture
        # unmerges the reduced delta, shallow re-merges it under the
        # current step's plan (group-averaging constituent deltas).
        if mode == "shallow":
            deep_r = tome.merge(plan, deep) if plan is not None else deep
            tokens = (tokens.astype(jnp.float32) + deep_r).astype(cfg.dtype)
        delta = None
        if mode == "capture":
            delta = tokens.astype(jnp.float32) - front.astype(jnp.float32)
            if plan is not None:
                delta = tome.unmerge(plan, delta)

        # final AdaLayerNormContinuous: affine-free LN, scale/shift from
        # t_vec (diffusers norm_out.linear; chunk order [scale, shift])
        mod = Dense(2 * c, name="final_adaLN_1", **dd)(silu(t_vec))
        scale, shift = jnp.split(mod, 2, axis=-1)
        tf32 = tokens.astype(jnp.float32)
        mean = tf32.mean(axis=-1, keepdims=True)
        var = tf32.var(axis=-1, keepdims=True)
        out = ((tf32 - mean) / jnp.sqrt(var + 1e-6)).astype(cfg.dtype)
        out = out * (1 + scale[:, None]) + shift[:, None]
        out = Dense(p * p * cfg.out_channels, name="final_linear", **dd)(out)
        if plan is not None:
            out = tome.unmerge(plan, out)   # per-token final proj: unmerge last
        out = out.reshape(b, hp, wp, p, p, cfg.out_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, cfg.out_channels)
        return (out, delta) if mode == "capture" else out
