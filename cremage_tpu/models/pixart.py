"""PixArt-Σ DiT (cross-attention transformer, adaLN-single) in Flax.

Architecture contract: PixArt-Σ as consumed by the reference through
diffusers `PixArtSigmaPipeline` (`modules/pixart_sigma/txt2img.py:31`):
patchified 4-ch SD-VAE latents, T5 caption tokens via a 2-layer
projection, adaLN-single (one shared 6*hidden modulation from t plus a
per-block learned scale_shift_table), blocks = self-attn (fused qkv) +
cross-attn (q / fused kv) + GELU MLP, eps prediction with learned sigma
(out_channels 8, eps = first 4).

Keys (PixArt repo layout): x_embedder.proj, t_embedder.mlp.{0,2},
t_block.1, y_embedder.y_proj.fc1/fc2, blocks.{i}.{scale_shift_table,
attn.{qkv,proj}, cross_attn.{q_linear,kv_linear,proj}, mlp.{fc1,fc2}},
final_layer.{scale_shift_table, linear}. 2D sincos pos-embed computed at
runtime (not a parameter).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.layers import Conv, Dense, silu, timestep_embedding
from cremage_tpu.ops import tome
from cremage_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class PixArtConfig:
    patch_size: int = 2
    in_channels: int = 4
    out_channels: int = 8            # eps + learned sigma
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    context_dim: int = 4096          # T5
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    # Set (to a mesh axis name) ONLY inside a shard_map body with the
    # latent patch-row axis sharded over that axis: x is the local
    # band, y (text) is replicated — self-attention runs the ring
    # schedule; cross-attention stays local (its kv is the replicated
    # text).  parallel/sequence.py pixart_sp_apply is the entry point.
    sp_axis: Optional[str] = None
    # Token merging (ToMe, ops/tome.py — opt-in speed feature beyond
    # reference parity): one merge of int(N*ratio) tokens after the
    # pos-embed add, the whole block stack runs reduced, the final
    # projection output is unmerged.  Composes with deep_cache (the
    # Δ-cache is stored in full-token space); not with sp_axis.
    tome_ratio: float = 0.0


def pixart_sigma_xl_config(**kw) -> PixArtConfig:
    return PixArtConfig(**kw)


def sincos_2d(embed_dim: int, h: int, w: int) -> np.ndarray:
    """2D sincos position embedding (DiT/PixArt convention)."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = np.arange(h, dtype=np.float64)
    gw = np.arange(w, dtype=np.float64)
    gw, gh = np.meshgrid(gw, gh)
    emb_h = _1d(embed_dim // 2, gh)
    emb_w = _1d(embed_dim // 2, gw)
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


def _ln(x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    m = x32.mean(-1, keepdims=True)
    v = x32.var(-1, keepdims=True)
    return ((x32 - m) / jnp.sqrt(v + eps)).astype(x.dtype)


class PixArtBlock(nn.Module):
    cfg: PixArtConfig

    @nn.compact
    def __call__(self, x, y, t6):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        h = cfg.num_heads
        d = cfg.hidden_size // h
        table = self.param("scale_shift_table", nn.initializers.normal(0.02),
                           (6, cfg.hidden_size), cfg.param_dtype)
        mods = table[None].astype(jnp.float32) + t6  # (B, 6, hidden)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            mods[:, i][:, None, :].astype(x.dtype) for i in range(6)
        ]

        b, n, _ = x.shape
        xm = _ln(x) * (1 + scale_msa) + shift_msa
        qkv = Dense(3 * cfg.hidden_size, name="attn_qkv", **dd)(xm)
        qkv = qkv.reshape(b, n, 3, h, d)
        if cfg.sp_axis is not None:
            from cremage_tpu.parallel.sequence import ring_attention_body

            att = ring_attention_body(qkv[:, :, 0], qkv[:, :, 1],
                                      qkv[:, :, 2], axis_name=cfg.sp_axis)
        else:
            att = attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        att = att.reshape(b, n, cfg.hidden_size)
        x = x + gate_msa * Dense(cfg.hidden_size, name="attn_proj", **dd)(att)

        # cross attention, unmodulated (PixArt convention)
        q = Dense(cfg.hidden_size, name="cross_attn_q_linear", **dd)(x)
        kv = Dense(2 * cfg.hidden_size, name="cross_attn_kv_linear", **dd)(y)
        m = y.shape[1]
        q = q.reshape(b, n, h, d)
        kv = kv.reshape(b, m, 2, h, d)
        catt = attention(q, kv[:, :, 0], kv[:, :, 1]).reshape(b, n, cfg.hidden_size)
        x = x + Dense(cfg.hidden_size, name="cross_attn_proj", **dd)(catt)

        xm = _ln(x) * (1 + scale_mlp) + shift_mlp
        mm = Dense(cfg.hidden_size * cfg.mlp_ratio, name="mlp_fc1", **dd)(xm)
        mm = nn.gelu(mm, approximate=True)
        x = x + gate_mlp * Dense(cfg.hidden_size, name="mlp_fc2", **dd)(mm)
        return x


class PixArt(nn.Module):
    cfg: PixArtConfig

    @nn.compact
    def __call__(self, x, t, y, pos: Optional[jnp.ndarray] = None,
                 mode: str = "full", deep=None, cache_depth: int = 1):
        """x: (B,H,W,4) latents; t: (B,) DDPM timesteps; y: (B, L, 4096).

        `pos` ((N, hidden) traced) overrides the host-computed sincos
        table — the sequence-parallel path passes each shard its band
        of the GLOBAL grid (the host computation inside a shard_map
        body would see only the local hp and produce wrong rows).

        Deep-cache modes (samplers/deepcache.py, Δ-cache over the back
        blocks — see models/mmdit.py for the full contract): "capture"
        returns (out, delta) with delta = tokens_final - tokens_after_
        front (fp32); "shallow" runs only the front `cache_depth`
        blocks and splices the cached delta back in."""
        cfg = self.cfg
        assert mode in ("full", "capture", "shallow"), mode
        if mode != "full":
            assert 1 <= cache_depth < cfg.depth, (
                f"cache_depth must be in [1, {cfg.depth - 1}]")
        if mode == "shallow":
            assert deep is not None, "shallow mode needs the cached delta"
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        p = cfg.patch_size
        b, hh, ww, _ = x.shape
        hp, wp = hh // p, ww // p

        tokens = Conv(cfg.hidden_size, kernel_size=p, stride=p, padding=0,
                      name="x_embedder_proj", **dd)(x.astype(cfg.dtype))
        tokens = tokens.reshape(b, hp * wp, cfg.hidden_size)
        if pos is None:
            pos = jnp.asarray(sincos_2d(cfg.hidden_size, hp, wp))
        tokens = tokens + pos[None].astype(cfg.dtype)

        plan = None
        if cfg.tome_ratio > 0:
            assert cfg.sp_axis is None, (
                "tome_ratio does not compose with sequence parallelism")
            plan = tome.plan_for_grid(tokens, hp, wp, cfg.tome_ratio, t)
            if plan is not None:
                tokens = tome.merge(plan, tokens)

        t_emb = timestep_embedding(t, 256).astype(cfg.dtype)
        t_vec = Dense(cfg.hidden_size, name="t_embedder_mlp_0", **dd)(t_emb)
        t_vec = Dense(cfg.hidden_size, name="t_embedder_mlp_2", **dd)(silu(t_vec))
        t6 = Dense(6 * cfg.hidden_size, name="t_block_1", **dd)(silu(t_vec))
        t6 = t6.reshape(b, 6, cfg.hidden_size).astype(jnp.float32)

        y = Dense(cfg.hidden_size, name="y_embedder_y_proj_fc1", **dd)(
            y.astype(cfg.dtype))
        y = nn.gelu(y, approximate=True)
        y = Dense(cfg.hidden_size, name="y_embedder_y_proj_fc2", **dd)(y)

        n_blocks = cache_depth if mode == "shallow" else cfg.depth
        front = None
        for i in range(n_blocks):
            tokens = PixArtBlock(cfg, name=f"blocks_{i}")(tokens, y, t6)
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

        table = self.param("final_layer_scale_shift_table",
                           nn.initializers.normal(0.02),
                           (2, cfg.hidden_size), cfg.param_dtype)
        t2 = table[None].astype(jnp.float32) + jnp.stack(
            [t_vec.astype(jnp.float32)] * 2, axis=1)
        shift, scale = t2[:, 0][:, None], t2[:, 1][:, None]
        out = _ln(tokens) * (1 + scale.astype(tokens.dtype)) + shift.astype(
            tokens.dtype)
        out = Dense(p * p * cfg.out_channels, name="final_layer_linear", **dd)(out)
        if plan is not None:
            out = tome.unmerge(plan, out)   # per-token final proj: unmerge last
        out = out.reshape(b, hp, wp, p, p, cfg.out_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, cfg.out_channels)
        return (out, delta) if mode == "capture" else out
