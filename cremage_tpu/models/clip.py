"""CLIP text encoder (ViT-L/14 text tower) in Flax.

Architecture contract: HF transformers CLIPTextModel as vendored/patched
by the reference (`modules/clip/modeling_clip.py`, consumed by
`FrozenCLIPEmbedder`, `modules/ldm/modules/encoders/modules.py:176`).
Key behaviors preserved:
- forward from *pre-computed input embeddings* (the prompt-weighting
  pipeline multiplies token embeddings by per-word scores and assembles
  77-token chunks before the transformer; position embeddings are added
  inside — see prompt/chunking.py);
- all 13 hidden states exposed so clip_skip can tap block 13 - clip_skip
  (reference encoders/modules.py:314);
- causal mask, quick_gelu activation, final LayerNorm.

Module names flatten to `text_model.*` HF checkpoint keys
(cond_stage_model.transformer.text_model.* inside SD checkpoints).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cremage_tpu.models.layers import Dense, LayerNorm, quick_gelu
from cremage_tpu.ops.attention import attention

CLIP_BOS = 49406
CLIP_EOS = 49407
CLIP_PAD = 49407
MAX_CLIP_SEQ_LEN = 77


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    intermediate_size: int = 3072
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32


# SDXL's second text tower uses OpenCLIP bigG — see models/open_clip.py.


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, n, c = x.shape
        h = cfg.num_heads
        d = c // h
        q = Dense(c, name="q_proj", **dd)(x).reshape(b, n, h, d)
        k = Dense(c, name="k_proj", **dd)(x).reshape(b, n, h, d)
        v = Dense(c, name="v_proj", **dd)(x).reshape(b, n, h, d)
        out = attention(q, k, v, mask=mask).reshape(b, n, c)
        return Dense(c, name="out_proj", **dd)(out)


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        h = LayerNorm(name="layer_norm1")(x)
        x = x + CLIPAttention(cfg, name="self_attn")(h, mask)
        h = LayerNorm(name="layer_norm2")(x)
        h = Dense(cfg.intermediate_size, name="mlp_fc1", **dd)(h)
        h = quick_gelu(h)
        h = Dense(cfg.hidden_size, name="mlp_fc2", **dd)(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (last_hidden_state, all_hidden_states, pooled).

    hidden_states[0] is the embedding output; hidden_states[i] the output
    of layer i; len == num_layers + 1 == 13 for ViT-L. clip_skip k taps
    hidden_states[13 - k] (reference contract)."""

    cfg: CLIPTextConfig

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        position_offset: int = 0,
    ):
        cfg = self.cfg
        token_embedding = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.hidden_size),
            cfg.param_dtype,
        )
        position_embedding = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.max_positions, cfg.hidden_size),
            cfg.param_dtype,
        )
        if inputs_embeds is None:
            assert input_ids is not None
            inputs_embeds = jnp.take(token_embedding, input_ids, axis=0)
        n = inputs_embeds.shape[1]
        x = inputs_embeds.astype(cfg.dtype) + position_embedding[
            position_offset : position_offset + n
        ].astype(cfg.dtype)

        causal = jnp.tril(jnp.ones((n, n), dtype=bool))[None, None]
        hidden_states = [x]
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg, name=f"layers_{i}")(x, causal)
            hidden_states.append(x)
        last = LayerNorm(name="final_layer_norm")(x)

        # pooled = final-LN state at the (argmax == last) EOS position when
        # ids are given; callers using inputs_embeds pass eos index later.
        pooled = None
        if input_ids is not None:
            eos_idx = jnp.argmax((input_ids == CLIP_EOS).astype(jnp.int32), axis=-1)
            pooled = jnp.take_along_axis(last, eos_idx[:, None, None], axis=1)[:, 0]
        return last, hidden_states, pooled

    def embed_tokens(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """Raw token-embedding lookup (pre-position); used by the
        prompt-weighting chunker."""
        token_embedding = self.get_variable("params", "token_embedding")
        return jnp.take(token_embedding, token_ids, axis=0)


def hidden_state_for_clip_skip(hidden_states: List[jnp.ndarray], clip_skip: int,
                               final_ln=None) -> jnp.ndarray:
    """Reference mapping: transformer_block_index = 13 - clip_skip
    (encoders/modules.py:314). clip_skip=1 -> hidden_states[12].
    NOTE: the reference feeds the *raw* hidden state (no final LN) for
    any clip_skip, matching its `output_hidden_states` indexing."""
    idx = len(hidden_states) - clip_skip
    return hidden_states[idx]
