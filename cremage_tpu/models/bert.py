"""BERT encoder (Flax) — native text tower for two reference features:

- the text-prompt safety classifier (`modules/text_prompt_safety_checker/
  bert_model_v2.py`: google-bert/bert-base-uncased + binary head);
- Hunyuan-DiT's first text branch (diffusers HunyuanDiTPipeline
  text_encoder is a Chinese-CLIP BertModel, consumed by the reference
  via `modules/hunyuan_dit/txt2img.py:32`).

Module/param names flatten to the HF `bert.*` checkpoint keys (dots ->
underscores, io/checkpoint.py `normalize_key`): embeddings.
{word,position,token_type}_embeddings.weight, embeddings.LayerNorm,
encoder.layer.{i}.attention.self.{query,key,value},
attention.output.{dense,LayerNorm}, intermediate.dense,
output.{dense,LayerNorm}, pooler.dense.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from cremage_tpu.models.layers import Dense, LayerNorm
from cremage_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32


def bert_base_config(**kw) -> BertConfig:
    return BertConfig(**kw)


def hunyuan_clip_config(**kw) -> BertConfig:
    """Hunyuan-DiT text_encoder: Chinese-CLIP BertModel, hidden 1024."""
    return BertConfig(vocab_size=47020, hidden_size=1024, num_layers=24,
                      num_heads=16, intermediate_size=4096,
                      type_vocab_size=2, **kw)


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, n, c = x.shape
        h = cfg.num_heads
        d = c // h
        q = Dense(c, name="self_query", **dd)(x).reshape(b, n, h, d)
        k = Dense(c, name="self_key", **dd)(x).reshape(b, n, h, d)
        v = Dense(c, name="self_value", **dd)(x).reshape(b, n, h, d)
        out = attention(q, k, v, mask=mask).reshape(b, n, c)
        return Dense(c, name="output_dense", **dd)(out)


class BertLayer(nn.Module):
    """Post-LN transformer block (original BERT residual order)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        a = BertSelfAttention(cfg, name="attention")(x, mask)
        x = LayerNorm(epsilon=cfg.layer_norm_eps,
                      name="attention_output_LayerNorm")(x + a)
        h = Dense(cfg.intermediate_size, name="intermediate_dense", **dd)(x)
        h = nn.gelu(h, approximate=False)
        h = Dense(cfg.hidden_size, name="output_dense", **dd)(h)
        return LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="output_LayerNorm")(x + h)


class BertModel(nn.Module):
    """Returns (last_hidden_state, pooled).  pooled is tanh(W·CLS)."""

    cfg: BertConfig
    add_pooler: bool = True

    @nn.compact
    def __call__(self, input_ids, attention_mask: Optional[jnp.ndarray] = None,
                 token_type_ids: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        b, n = input_ids.shape
        word = self.param("embeddings_word_embeddings_weight",
                          nn.initializers.normal(0.02),
                          (cfg.vocab_size, cfg.hidden_size), cfg.param_dtype)
        pos = self.param("embeddings_position_embeddings_weight",
                         nn.initializers.normal(0.02),
                         (cfg.max_positions, cfg.hidden_size),
                         cfg.param_dtype)
        typ = self.param("embeddings_token_type_embeddings_weight",
                         nn.initializers.normal(0.02),
                         (cfg.type_vocab_size, cfg.hidden_size),
                         cfg.param_dtype)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = (jnp.take(word, input_ids, axis=0)
             + pos[None, :n]
             + jnp.take(typ, token_type_ids, axis=0)).astype(cfg.dtype)
        x = LayerNorm(epsilon=cfg.layer_norm_eps,
                      name="embeddings_LayerNorm")(x)

        mask = None
        if attention_mask is not None:
            mask = attention_mask[:, None, None, :].astype(bool)
        for i in range(cfg.num_layers):
            x = BertLayer(cfg, name=f"encoder_layer_{i}")(x, mask)

        if not self.add_pooler:
            return x, x[:, 0]
        pooled = jnp.tanh(
            Dense(cfg.hidden_size, name="pooler_dense",
                  dtype=cfg.dtype, param_dtype=cfg.param_dtype)(x[:, 0]))
        return x, pooled


class BertClassifier(nn.Module):
    """BertModel + linear head — the text-prompt safety checker
    (`text_prompt_safety_checker/bert_model_v2.py`: BertForSequence-
    Classification layout, keys bert.* + classifier.*)."""

    cfg: BertConfig
    num_labels: int = 2

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        _, pooled = BertModel(self.cfg, name="bert")(
            input_ids, attention_mask, token_type_ids)
        return Dense(self.num_labels, name="classifier",
                     dtype=self.cfg.dtype,
                     param_dtype=self.cfg.param_dtype)(pooled)
