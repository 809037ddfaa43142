"""T5 v1.1 encoder (Flax) — text tower for SD3 / FLUX / PixArt-Σ.

Architecture: relative-position-bucket attention bias (layer 0 owns the
bias table, shared by all layers), RMSNorm, gated-GELU feed-forward, no
biases anywhere (google/t5-v1_1 family; the reference consumes it via HF
transformers' T5EncoderModel inside diffusers pipelines, e.g.
`modules/flux/txt2img.py:85-120`).

Checkpoint keys (HF): encoder.block.{i}.layer.0.SelfAttention.{q,k,v,o}.
weight, ...relative_attention_bias.weight (block 0), layer.0.layer_norm,
layer.1.DenseReluDense.{wi_0,wi_1,wo}, layer.1.layer_norm,
encoder.final_layer_norm, shared.weight (token embedding).

Tokenization note: T5 uses SentencePiece; the vocab file is a runtime
download in the reference as well. `T5Tokenizer` here loads from a local
HF cache path when available, and pipelines accept precomputed ids.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.layers import Dense


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    num_heads: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32


def t5_xxl_config(**kw) -> T5Config:
    return T5Config(**kw)


def t5_large_config(**kw) -> T5Config:  # PixArt small variants / tests
    return T5Config(d_model=1024, num_heads=16, d_ff=2816, num_layers=24, **kw)


def mt5_xl_config(**kw) -> T5Config:
    """Hunyuan-DiT text_encoder_2: mT5-XL encoder (multilingual vocab,
    same gated-gelu v1.1 block anatomy the T5Encoder implements)."""
    return T5Config(vocab_size=250112, d_model=2048, num_heads=32,
                    d_ff=5120, num_layers=24, **kw)


class RMSNorm(nn.Module):
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        x = x.astype(jnp.float32)
        scale = self.param("weight", nn.initializers.ones,
                           (x.shape[-1],), jnp.float32)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        return (x / jnp.sqrt(var + self.epsilon) * scale).astype(orig)


def relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """T5 bidirectional relative position bucketing (host numpy)."""
    rp = np.asarray(relative_position)
    num_buckets //= 2
    ret = (rp > 0).astype(np.int64) * num_buckets
    n = np.abs(rp)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_bias_table: bool = False

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype, use_bias=False)
        b, n, _ = x.shape
        inner = cfg.num_heads * cfg.d_kv
        q = Dense(inner, name="q", **dd)(x).reshape(b, n, cfg.num_heads, cfg.d_kv)
        k = Dense(inner, name="k", **dd)(x).reshape(b, n, cfg.num_heads, cfg.d_kv)
        v = Dense(inner, name="v", **dd)(x).reshape(b, n, cfg.num_heads, cfg.d_kv)
        # T5 does NOT scale by sqrt(d); bias added pre-softmax
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + position_bias
        probs = nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).reshape(b, n, inner)
        return Dense(cfg.d_model, name="o", **dd)(out)


class T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype, use_bias=False)
        h = RMSNorm(cfg.layer_norm_epsilon, name="layer_0_layer_norm")(x)
        x = x + T5Attention(cfg, name="layer_0_SelfAttention")(h, position_bias)
        h = RMSNorm(cfg.layer_norm_epsilon, name="layer_1_layer_norm")(x)
        wi0 = Dense(cfg.d_ff, name="layer_1_DenseReluDense_wi_0", **dd)(h)
        wi1 = Dense(cfg.d_ff, name="layer_1_DenseReluDense_wi_1", **dd)(h)
        h = nn.gelu(wi0, approximate=True) * wi1
        h = Dense(cfg.d_model, name="layer_1_DenseReluDense_wo", **dd)(h)
        return x + h


class T5Encoder(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        shared = self.param("shared", nn.initializers.normal(1.0),
                            (cfg.vocab_size, cfg.d_model), cfg.param_dtype)
        x = jnp.take(shared, input_ids, axis=0).astype(cfg.dtype)
        n = x.shape[1]

        bias_table = self.param(
            "relative_attention_bias", nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
            cfg.param_dtype,
        )
        pos = np.arange(n)
        rel = pos[None, :] - pos[:, None]
        buckets = relative_position_bucket(
            rel, cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance,
        )
        position_bias = jnp.take(
            bias_table.astype(jnp.float32), jnp.asarray(buckets), axis=0
        )  # (n, n, heads)
        position_bias = jnp.transpose(position_bias, (2, 0, 1))[None]
        if attention_mask is not None:
            neg = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9
            position_bias = position_bias + neg

        for i in range(cfg.num_layers):
            x = T5Block(cfg, name=f"block_{i}")(x, position_bias)
        return RMSNorm(cfg.layer_norm_epsilon, name="final_layer_norm")(x)
