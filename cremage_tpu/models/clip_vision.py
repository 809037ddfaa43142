"""OpenCLIP ViT vision tower (Flax) — SVD's image conditioner.

Architecture contract: open_clip VisualTransformer as vendored in the
reference (`modules/open_clip_full/`, used by sgm
`modules/encoders/modules_svd.py` FrozenOpenCLIPImageEmbedder): patch
conv (no bias), class token, learned positional embedding, pre-LN
transformer (same ResBlock layout as the text tower), ln_post on the
class token, linear projection. ViT-H/14: width 1280, 32 layers, 16
heads, patch 14, 224^2 input, proj -> 1024.

Keys (conditioner.embedders.0.open_clip.model.visual.*): conv1.weight,
class_embedding, positional_embedding, ln_pre, transformer.resblocks.N.*,
ln_post, proj.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.layers import LayerNorm
from cremage_tpu.models.open_clip import OpenCLIPTextConfig, ResBlock

# CLIP image normalization (open_clip OPENAI_DATASET_MEAN/STD)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    output_dim: int = 1024
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32


def vit_h14_config(**kw) -> CLIPVisionConfig:
    return CLIPVisionConfig(**kw)


class CLIPVisionModel(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, images01: jnp.ndarray,
                 penultimate: bool = False) -> jnp.ndarray:
        """images01: (B, S, S, 3) in [0,1] -> (B, output_dim) embedding.

        penultimate=True returns the hidden states entering the LAST
        transformer block, shape (B, 1+S/p*S/p, width) — HF
        `hidden_states[-2]`, what IP-Adapter-FaceID-Plus conditions on
        (reference ip_adapter_faceid.py:432-447).  Initialize with
        penultimate=False so all params (incl. final block/ln_post/proj)
        are created."""
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        x = (images01 - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
        kernel = self.param(
            "conv1_weight", nn.initializers.lecun_normal(),
            (cfg.patch_size, cfg.patch_size, 3, cfg.width), cfg.param_dtype)
        x = lax.conv_general_dilated(
            x.astype(cfg.dtype), kernel.astype(cfg.dtype),
            window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(cfg.dtype)
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, cfg.width)

        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.width,), cfg.param_dtype)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (gh * gw + 1, cfg.width), cfg.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype), (b, 1, cfg.width)), x],
            axis=1)
        x = x + pos.astype(cfg.dtype)
        x = LayerNorm(name="ln_pre")(x)

        tcfg = OpenCLIPTextConfig(width=cfg.width, num_layers=cfg.num_layers,
                                  num_heads=cfg.num_heads, dtype=cfg.dtype,
                                  param_dtype=cfg.param_dtype)
        mask = None
        for i in range(cfg.num_layers):
            if penultimate and i == cfg.num_layers - 1:
                return x.astype(jnp.float32)
            x = ResBlock(tcfg, name=f"transformer_resblocks_{i}")(x, mask)

        pooled = LayerNorm(name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (cfg.width, cfg.output_dim), cfg.param_dtype)
        return jnp.dot(pooled.astype(cfg.dtype), proj.astype(cfg.dtype),
                       preferred_element_type=jnp.float32).astype(jnp.float32)
