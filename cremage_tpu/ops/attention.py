"""Attention ops — the hot kernel of every diffusion model here.

Two implementations behind one interface:
- "xla": einsum attention with fp32 softmax; XLA fuses this well and it
  is the correctness reference.
- "flash": Pallas blockwise flash-attention for TPU (ops/flash_attention.py),
  used automatically for long latent-token sequences on TPU.

Shapes follow (B, N, H, D) — batch, tokens, heads, head_dim. Softmax is
always computed in float32 regardless of compute dtype; bf16 softmax
visibly damages CFG'd eps predictions over 20+ sampler steps.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dot_product_attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference einsum attention. q,k,v: (B, N, H, D).

    mask: optional bool (..., Nq, Nk), True = attend.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e9))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention dispatch. q,k,v: (B, N, H, D)."""
    if mask is None and impl in ("auto", "flash"):
        from cremage_tpu.ops.flash_attention import flash_attention_or_fallback

        return flash_attention_or_fallback(q, k, v, scale=scale, force=impl == "flash")
    if impl in ("xla", "auto"):
        return dot_product_attention_xla(q, k, v, scale=scale, mask=mask)
    raise ValueError(f"unknown attention impl {impl!r}")
