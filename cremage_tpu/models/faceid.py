"""IP-Adapter-FaceID projection models (Flax).

Behavior contract: reference `modules/ip_adapter/ip_adapter_faceid.py`:
- MLPProjModel (:106-124): id_embed (512) -> Linear(512,1024) -> GELU ->
  Linear(1024, 768*4) -> reshape (4,768) -> LayerNorm => 4 extra context
  tokens appended to the CLIP conditioning
  (`sd/image_generator.py:810-814`);
- ProjPlusModel (:127-180, the "Plus" variant) additionally mixes CLIP
  vision embeddings through a FacePerceiverResampler; it requires a CLIP
  image tower and is gated until that lands.

Checkpoint keys ("image_proj" dict): proj.0.weight/bias, proj.2.*,
norm.weight/bias.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
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
