"""OpenCLIP text tower (ViT-bigG-14) in Flax — SDXL's second text encoder.

Architecture contract: the reference's vendored LoRA fork of OpenCLIP
(`modules/open_clip/`, consumed by sgm `FrozenOpenCLIPEmbedder2`,
`modules/sdxl/sgm/modules/encoders/modules.py`): width 1280, 32 layers,
20 heads, mlp ratio 4, gelu, pre-LN transformer, causal mask, ln_final,
text_projection; "penultimate" layer output feeds crossattn, pooled
output = ln_final(last)[eos] @ text_projection.

Checkpoint keys (conditioner.embedders.1.model.*): token_embedding,
positional_embedding (bare param), transformer.resblocks.{i}.{ln_1,
attn.in_proj_weight/in_proj_bias (fused qkv — split by the loader),
attn.out_proj, ln_2, mlp.c_fc, mlp.c_proj}, ln_final, text_projection.
Module names flatten to the *split* form (attn.q_proj/k_proj/v_proj);
io/sdxl_keys.py handles the in_proj split.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cremage_tpu.models.layers import Dense, LayerNorm
from cremage_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class OpenCLIPTextConfig:
    vocab_size: int = 49408
    width: int = 1280
    num_layers: int = 32
    num_heads: int = 20
    max_positions: int = 77
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32


class ResBlock(nn.Module):
    cfg: OpenCLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, n, c = x.shape
        h = LayerNorm(name="ln_1")(x)
        hd = cfg.width // cfg.num_heads
        q = Dense(c, name="attn_q_proj", **dd)(h).reshape(b, n, cfg.num_heads, hd)
        k = Dense(c, name="attn_k_proj", **dd)(h).reshape(b, n, cfg.num_heads, hd)
        v = Dense(c, name="attn_v_proj", **dd)(h).reshape(b, n, cfg.num_heads, hd)
        a = attention(q, k, v, mask=mask).reshape(b, n, c)
        x = x + Dense(c, name="attn_out_proj", **dd)(a)
        h = LayerNorm(name="ln_2")(x)
        h = Dense(c * cfg.mlp_ratio, name="mlp_c_fc", **dd)(h)
        h = nn.gelu(h, approximate=False)
        h = Dense(c, name="mlp_c_proj", **dd)(h)
        return x + h


class OpenCLIPTextModel(nn.Module):
    """Returns (hidden_states list, final_ln_out).

    hidden_states[i] = output of resblock i-1 (index 0 = embeddings);
    "penultimate" == hidden_states[num_layers - 1]."""

    cfg: OpenCLIPTextConfig

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
    ):
        cfg = self.cfg
        token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.width), cfg.param_dtype,
        )
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.max_positions, cfg.width), cfg.param_dtype,
        )
        # registered here so it lives in params; used by project_pooled
        self.param(
            "text_projection", nn.initializers.normal(0.02),
            (cfg.width, cfg.width), cfg.param_dtype,
        )
        if inputs_embeds is None:
            assert input_ids is not None
            inputs_embeds = jnp.take(token_embedding, input_ids, axis=0)
        n = inputs_embeds.shape[1]
        x = inputs_embeds.astype(cfg.dtype) + positional_embedding[:n].astype(
            cfg.dtype
        )
        mask = jnp.tril(jnp.ones((n, n), dtype=bool))[None, None]
        hidden = [x]
        for i in range(cfg.num_layers):
            x = ResBlock(cfg, name=f"transformer_resblocks_{i}")(x, mask)
            hidden.append(x)
        final = LayerNorm(name="ln_final")(x)
        return hidden, final

    def project_pooled(self, final_ln: jnp.ndarray, eos_index: jnp.ndarray):
        """pooled = ln_final(last)[eos] @ text_projection (per batch)."""
        text_projection = self.get_variable("params", "text_projection")
        pooled = jnp.take_along_axis(
            final_ln, eos_index[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        return jnp.dot(
            pooled.astype(self.cfg.dtype),
            text_projection.astype(self.cfg.dtype),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32)

    def embed_tokens(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        token_embedding = self.get_variable("params", "token_embedding")
        return jnp.take(token_embedding, token_ids, axis=0)


def openclip_bigg_config(**kw) -> OpenCLIPTextConfig:
    return OpenCLIPTextConfig(**kw)
