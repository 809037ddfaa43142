"""Vector quantizer (taming/VQGAN first-stage parity).

Behavior contract: reference `modules/taming/` vendored VQGAN provides
the VQ first stage used by ldm configs (SURVEY item 24) and Kandinsky's
MoVQ / Cascade's Stage A are VQ decoders. This module provides the
quantizer: nearest-codebook lookup with straight-through estimator and
the standard (n_embed, embed_dim) codebook layout (`quantize.embedding.
weight` checkpoint key).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VQConfig:
    n_embed: int = 16384
    embed_dim: int = 4
    beta: float = 0.25
    param_dtype: jnp.dtype = jnp.float32


class VectorQuantizer(nn.Module):
    cfg: VQConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray):
        """z: (B, H, W, C) -> (z_q, indices). Straight-through gradients."""
        cfg = self.cfg
        codebook = self.param(
            "embedding", nn.initializers.uniform(1.0 / cfg.n_embed),
            (cfg.n_embed, cfg.embed_dim), cfg.param_dtype,
        )
        flat = z.reshape(-1, cfg.embed_dim).astype(jnp.float32)
        cb = codebook.astype(jnp.float32)
        # squared distances via (a-b)^2 = a^2 - 2ab + b^2
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * flat @ cb.T
            + jnp.sum(cb**2, axis=1)[None, :]
        )
        idx = jnp.argmin(d, axis=1)
        z_q = jnp.take(cb, idx, axis=0).reshape(z.shape)
        # straight-through
        z_q = z.astype(jnp.float32) + jax_stop_grad(z_q - z.astype(jnp.float32))
        return z_q.astype(z.dtype), idx.reshape(z.shape[:-1])

    def lookup(self, indices: jnp.ndarray) -> jnp.ndarray:
        codebook = self.get_variable("params", "embedding")
        return jnp.take(codebook, indices, axis=0)


def jax_stop_grad(x):
    import jax

    return jax.lax.stop_gradient(x)
