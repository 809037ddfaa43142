"""MMDiT (SD3-style joint-attention diffusion transformer) in Flax.

Architecture contract: Stability's SD3 "MMDiT" as consumed by the
reference through diffusers `StableDiffusion3Pipeline`
(`modules/sd3/txt2img.py:21`): patchified 16-ch latents + pooled-text
adaLN conditioning + joint attention over [context; latent] token
streams, velocity prediction under rectified flow.

Checkpoint keys (sd3 medium, prefix model.diffusion_model.):
x_embedder.proj (2x2 s2 conv), pos_embed (1, 192*192, D) center-cropped
per resolution, t_embedder.mlp.{0,2}, y_embedder.mlp.{0,2},
context_embedder, joint_blocks.{i}.{context_block,x_block}.
{adaLN_modulation.1, attn.{qkv,proj}, mlp.{fc1,fc2}}, final_layer.
{adaLN_modulation.1, linear}. Pre-norms are affine-free LayerNorms
(modulation supplies scale/shift), qkv is fused.

TPU-first: everything is dense matmul + one fused joint attention per
block (ops/attention dispatch -> Pallas flash at big latents).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cremage_tpu.models.layers import Conv, Dense, silu, timestep_embedding
from cremage_tpu.ops import tome
from cremage_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    patch_size: int = 2
    in_channels: int = 16
    depth: int = 24
    hidden_size: int = 1536          # 64 * depth for SD3-medium
    num_heads: int = 24
    context_dim: int = 4096          # T5 width (CLIP concat zero-padded)
    pooled_dim: int = 2048           # CLIP-L + bigG pooled
    pos_embed_max_size: int = 192
    mlp_ratio: int = 4
    qk_norm: bool = False            # SD3.5 uses RMS qk-norm
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    # Set (to a mesh axis name) ONLY inside a shard_map body with the
    # latent patch-row axis sharded over that axis: x is the local band,
    # context/pooled are replicated, and joint attention runs the ring
    # schedule with the context kv folded as a replicated prefix
    # (parallel/sequence.py mmdit_sp_apply is the entry point).
    sp_axis: Optional[str] = None
    # Token merging (ToMe, ops/tome.py — opt-in speed feature beyond
    # reference parity): one merge of int(N*ratio) latent tokens after
    # the pos-embed add, the whole joint-block stack runs on the
    # reduced latent stream (context stream untouched), the final
    # projection output is unmerged.  Composes with deep_cache (the
    # Δ-cache is stored in full-token space); not with sp_axis.
    tome_ratio: float = 0.0


def sd3_medium_config(**kw) -> MMDiTConfig:
    return MMDiTConfig(**kw)


def _no_affine_ln(x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


def _modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class _RMS(nn.Module):
    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones,
                           (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        x32 = x32 / jnp.sqrt(jnp.mean(x32 * x32, -1, keepdims=True) + 1e-6)
        return (x32 * scale).astype(x.dtype)


class JointBlock(nn.Module):
    cfg: MMDiTConfig
    final: bool = False

    @nn.compact
    def __call__(self, ctx, x, vec):
        cfg = self.cfg
        h = cfg.num_heads
        d = cfg.hidden_size // h
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)

        def mods_of(block_name, n_mod):
            m = Dense(n_mod * cfg.hidden_size,
                      name=f"{block_name}_adaLN_modulation_1", **dd)(silu(vec))
            return jnp.split(m, n_mod, axis=-1)

        ctx_mods = mods_of("context_block", 2 if self.final else 6)
        x_mods = mods_of("x_block", 6)

        def qkv_of(block_name, inp, shift, scale):
            normed = _modulate(_no_affine_ln(inp), shift, scale)
            qkv = Dense(3 * cfg.hidden_size, name=f"{block_name}_attn_qkv",
                        **dd)(normed)
            b, n, _ = qkv.shape
            qkv = qkv.reshape(b, n, 3, h, d)
            if cfg.qk_norm:
                q = _RMS(name=f"{block_name}_attn_ln_q")(qkv[:, :, 0])
                k = _RMS(name=f"{block_name}_attn_ln_k")(qkv[:, :, 1])
                qkv = qkv.at[:, :, 0].set(q).at[:, :, 1].set(k)
            return qkv

        cqkv = qkv_of("context_block", ctx, ctx_mods[0], ctx_mods[1])
        xqkv = qkv_of("x_block", x, x_mods[0], x_mods[1])

        nc = ctx.shape[1]
        q = jnp.concatenate([cqkv[:, :, 0], xqkv[:, :, 0]], axis=1)
        if cfg.sp_axis is not None:
            # latent tokens sharded over sp_axis (inside shard_map):
            # ctx q rows are replicated and ride the same ring — every
            # shard folds the full (replicated) context kv once as a
            # prefix, then streams the other shards' latent kv chunks.
            from cremage_tpu.parallel.sequence import ring_attention_body

            att = ring_attention_body(
                q, xqkv[:, :, 1], xqkv[:, :, 2], axis_name=cfg.sp_axis,
                k_prefix=cqkv[:, :, 1], v_prefix=cqkv[:, :, 2])
        else:
            k = jnp.concatenate([cqkv[:, :, 1], xqkv[:, :, 1]], axis=1)
            v = jnp.concatenate([cqkv[:, :, 2], xqkv[:, :, 2]], axis=1)
            att = attention(q, k, v)
        b = att.shape[0]
        att = att.reshape(b, att.shape[1], cfg.hidden_size)
        catt, xatt = att[:, :nc], att[:, nc:]

        def apply_out(block_name, inp, attended, mods):
            (_, _, gate_msa, shift_mlp, scale_mlp, gate_mlp) = mods
            out = Dense(cfg.hidden_size, name=f"{block_name}_attn_proj",
                        **dd)(attended)
            y = inp + gate_msa[:, None, :] * out
            normed2 = _modulate(_no_affine_ln(y), shift_mlp, scale_mlp)
            m = Dense(cfg.hidden_size * cfg.mlp_ratio,
                      name=f"{block_name}_mlp_fc1", **dd)(normed2)
            m = nn.gelu(m, approximate=True)
            m = Dense(cfg.hidden_size, name=f"{block_name}_mlp_fc2", **dd)(m)
            return y + gate_mlp[:, None, :] * m

        x = apply_out("x_block", x, xatt, x_mods)
        ctx = None if self.final else apply_out("context_block", ctx, catt,
                                                ctx_mods)
        return ctx, x


class MMDiT(nn.Module):
    cfg: MMDiTConfig

    @nn.compact
    def __call__(self, x, t, context, pooled, mode: str = "full",
                 deep=None, cache_depth: int = 1):
        """x: (B, H, W, C) latents NHWC; t: (B,) timestep in [0,1000];
        context: (B, L, context_dim); pooled: (B, pooled_dim).

        Deep-cache modes (samplers/deepcache.py; the DiT analog of the
        UNet's capture/shallow split — "Δ-cache" over the back blocks):
        - mode="full" (default): the normal forward.
        - mode="capture": same compute as "full" but returns
          (out, delta) where `delta` (fp32) is the residual the back
          blocks (cache_depth..depth-1) added to the latent token
          stream: tokens_final - tokens_after_front.
        - mode="shallow": recomputes only the embedders and the front
          `cache_depth` joint blocks, then splices the cached delta
          back in (tokens = tokens_front + deep) and runs the final
          layer.  Unused deep params in the passed pytree are ignored
          by Flax, so one param tree serves all modes."""
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

        xe = Conv(cfg.hidden_size, kernel_size=p, stride=p, padding=0,
                  name="x_embedder_proj", **dd)(x.astype(cfg.dtype))
        tokens = xe.reshape(b, hp * wp, cfg.hidden_size)

        pos = self.param(
            "pos_embed", nn.initializers.normal(0.01),
            (1, cfg.pos_embed_max_size * cfg.pos_embed_max_size,
             cfg.hidden_size),
            cfg.param_dtype,
        )
        grid = pos.reshape(cfg.pos_embed_max_size, cfg.pos_embed_max_size,
                           cfg.hidden_size)
        left = (cfg.pos_embed_max_size - wp) // 2
        if cfg.sp_axis is not None:
            # x is this shard's row band: hp is LOCAL; the crop offset
            # is the global centering plus this shard's band position.
            n_sh = jax.lax.psum(1, cfg.sp_axis)
            top = ((cfg.pos_embed_max_size - hp * n_sh) // 2
                   + jax.lax.axis_index(cfg.sp_axis) * hp)
            cropped = jax.lax.dynamic_slice(
                grid, (top, left, 0), (hp, wp, cfg.hidden_size))
        else:
            top = (cfg.pos_embed_max_size - hp) // 2
            cropped = grid[top:top + hp, left:left + wp]
        cropped = cropped.reshape(1, hp * wp, cfg.hidden_size)
        tokens = tokens + cropped.astype(cfg.dtype)

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
        y_vec = Dense(cfg.hidden_size, name="y_embedder_mlp_0", **dd)(
            pooled.astype(cfg.dtype))
        y_vec = Dense(cfg.hidden_size, name="y_embedder_mlp_2", **dd)(silu(y_vec))
        vec = t_vec + y_vec

        ctx = Dense(cfg.hidden_size, name="context_embedder", **dd)(
            context.astype(cfg.dtype))

        n_blocks = cache_depth if mode == "shallow" else cfg.depth
        front = None
        for i in range(n_blocks):
            ctx, tokens = JointBlock(
                cfg, final=(i == cfg.depth - 1), name=f"joint_blocks_{i}"
            )(ctx, tokens, vec)
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

        shift, scale = jnp.split(
            Dense(2 * cfg.hidden_size, name="final_layer_adaLN_modulation_1",
                  **dd)(silu(vec)), 2, axis=-1)
        out = _modulate(_no_affine_ln(tokens), shift, scale)
        out = Dense(p * p * cfg.in_channels, name="final_layer_linear", **dd)(out)
        if plan is not None:
            out = tome.unmerge(plan, out)   # per-token final proj: unmerge last
        out = out.reshape(b, hp, wp, p, p, cfg.in_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, cfg.in_channels)
        return (out, delta) if mode == "capture" else out
