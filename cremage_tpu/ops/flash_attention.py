"""Pallas flash attention for TPU (placeholder dispatch for now).

The real blockwise kernel lands in the kernels milestone; this module
keeps the dispatch seam stable: `flash_attention_or_fallback` routes to
the XLA einsum path until the Pallas kernel is enabled, then becomes the
fast path for long latent-token sequences (SDXL 1024^2 => 4096 tokens).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def flash_attention_or_fallback(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    force: bool = False,
) -> jnp.ndarray:
    from cremage_tpu.ops.attention import dot_product_attention_xla

    return dot_product_attention_xla(q, k, v, scale=scale)
