"""IP-Adapter-FaceID projection models (Flax).

Behavior contract: reference `modules/ip_adapter/ip_adapter_faceid.py`:
- MLPProjModel (:106-124): id_embed (512) -> Linear(512,1024) -> GELU ->
  Linear(1024, 768*4) -> reshape (4,768) -> LayerNorm => 4 extra context
  tokens appended to the CLIP conditioning
  (`sd/image_generator.py:810-814`);
- ProjPlusModel (:127-180, the "Plus"/"Plus-v2" variant — the default
  face model `const/const.py:15 ip-adapter-faceid-plusv2_sd15.bin`)
  additionally mixes the CLIP-vision penultimate hidden states of the
  aligned 224^2 face crop through a FacePerceiverResampler
  (`ip_adapter_faceid.py:54-105`, `resampler.py:42-97`); with
  `shortcut=True` (v2) the output is `x + scale * resampler(x, clip)`.

Checkpoint keys ("image_proj" dict): proj.0.weight/bias, proj.2.*,
norm.weight/bias; Plus additionally perceiver_resampler.{proj_in,
proj_out,norm_out}.* and perceiver_resampler.layers.N.{0,1}.* (0 =
PerceiverAttention: norm1/norm2/to_q/to_kv/to_out; 1 = FeedForward
Sequential: 0=LayerNorm, 1=Linear, 3=Linear).  Module names below are
chosen so `io.checkpoint.build_flax_params` maps the torch keys 1:1.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from cremage_tpu.models.layers import Dense, LayerNorm


@dataclasses.dataclass(frozen=True)
class FaceIDProjConfig:
    cross_attention_dim: int = 768
    id_embeddings_dim: int = 512
    num_tokens: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32


class MLPProjModel(nn.Module):
    cfg: FaceIDProjConfig

    @nn.compact
    def __call__(self, id_embeds: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        x = Dense(cfg.id_embeddings_dim * 2, name="proj_0", **dd)(id_embeds)
        x = nn.gelu(x, approximate=False)
        x = Dense(cfg.cross_attention_dim * cfg.num_tokens, name="proj_2", **dd)(x)
        x = x.reshape(-1, cfg.num_tokens, cfg.cross_attention_dim)
        return LayerNorm(name="norm")(x)


class _FacePerceiverAttention(nn.Module):
    """One PerceiverAttention block (reference resampler.py:42-97):
    q from latents, k/v from concat(x, latents); both q and k scaled by
    dim_head**-0.25 before the dot (f16-stable form); f32 softmax."""

    dim: int
    dim_head: int = 64
    heads: int = 16
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, latents: jnp.ndarray) -> jnp.ndarray:
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        inner = self.dim_head * self.heads
        x = LayerNorm(name="norm1")(x)
        latents = LayerNorm(name="norm2")(latents)
        b, l, _ = latents.shape
        q = Dense(inner, use_bias=False, name="to_q", **dd)(latents)
        kv_input = jnp.concatenate([x, latents], axis=-2)
        kv = Dense(inner * 2, use_bias=False, name="to_kv", **dd)(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            return t.reshape(b, t.shape[1], self.heads, self.dim_head
                             ).transpose(0, 2, 1, 3)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        scale = self.dim_head ** -0.25
        w = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale,
                       preferred_element_type=jnp.float32)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        return Dense(self.dim, use_bias=False, name="to_out", **dd)(out)


class FacePerceiverResampler(nn.Module):
    """Mixes ArcFace id tokens (latents) with CLIP-vision hidden states
    (reference ip_adapter_faceid.py:54-105: proj_in, 4x [attn, ff] with
    residuals, proj_out, norm_out)."""

    dim: int = 768
    depth: int = 4
    dim_head: int = 64
    heads: int = 16
    embedding_dim: int = 1280
    output_dim: int = 768
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = Dense(self.dim, name="proj_in", **dd)(x)
        for i in range(self.depth):
            attn = _FacePerceiverAttention(
                dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                name=f"layers_{i}_0", **dd)
            latents = attn(x, latents) + latents
            h = LayerNorm(name=f"layers_{i}_1_0")(latents)
            h = Dense(self.dim * self.ff_mult, use_bias=False,
                      name=f"layers_{i}_1_1", **dd)(h)
            h = nn.gelu(h, approximate=False)
            h = Dense(self.dim, use_bias=False,
                      name=f"layers_{i}_1_3", **dd)(h)
            latents = h + latents
        latents = Dense(self.output_dim, name="proj_out", **dd)(latents)
        return LayerNorm(name="norm_out")(latents)


@dataclasses.dataclass(frozen=True)
class FaceIDProjPlusConfig:
    cross_attention_dim: int = 768
    id_embeddings_dim: int = 512
    clip_embeddings_dim: int = 1280
    num_tokens: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32


class ProjPlusModel(nn.Module):
    """Plus(-v2) projection (reference ip_adapter_faceid.py:127-180):
    id MLP tokens resampled against the CLIP-vision penultimate hidden
    states of the aligned face crop; `shortcut=True` is the v2 mixing
    (`generate_face_embedding_from_image` :738 passes shortcut=True)."""

    cfg: FaceIDProjPlusConfig

    @nn.compact
    def __call__(self, id_embeds: jnp.ndarray, clip_embeds: jnp.ndarray,
                 shortcut: bool = True, scale: float = 1.0) -> jnp.ndarray:
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        x = Dense(cfg.id_embeddings_dim * 2, name="proj_0", **dd)(id_embeds)
        x = nn.gelu(x, approximate=False)
        x = Dense(cfg.cross_attention_dim * cfg.num_tokens,
                  name="proj_2", **dd)(x)
        x = x.reshape(-1, cfg.num_tokens, cfg.cross_attention_dim)
        x = LayerNorm(name="norm")(x)
        out = FacePerceiverResampler(
            dim=cfg.cross_attention_dim, depth=4, dim_head=64,
            heads=cfg.cross_attention_dim // 64,
            embedding_dim=cfg.clip_embeddings_dim,
            output_dim=cfg.cross_attention_dim, ff_mult=4,
            name="perceiver_resampler", **dd)(x, clip_embeds)
        if shortcut:
            out = x + scale * out
        return out
