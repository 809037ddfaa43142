"""Fused GroupNorm(+SiLU) Pallas kernel.

GroupNorm is HBM-bandwidth-bound: the unfused form reads the activation
three times (stats, normalize, activation). This kernel does one pass
per batch row — stats, normalize, affine and SiLU fused in VMEM — the
"fused GroupNorm+SiLU epilogue" called for by SURVEY.md §7 kernels/.

Mosaic note: lane-dim reshapes like (HW, C) -> (HW, G, C/G) don't lower
when C/G isn't lane-aligned (SD channels are 320/640), so group
statistics are computed with matmuls against a 0/1 group-membership
matrix M (C, G): per-group sums = colsum(x @ M), broadcast back with
M^T. Everything stays MXU/VPU-shaped.

Falls back to the XLA path when a row doesn't fit VMEM or off-TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# keep one (HW, C) fp32 row + bf16 in/out comfortably under ~16MB VMEM
_VMEM_ROW_LIMIT = 2 * 1024 * 1024  # elements


@functools.lru_cache(maxsize=32)
def _group_matrix(c: int, groups: int) -> np.ndarray:
    m = np.zeros((c, groups), np.float32)
    cg = c // groups
    for g in range(groups):
        m[g * cg:(g + 1) * cg, g] = 1.0
    return m


def _gn_kernel(x_ref, m_ref, w_ref, b_ref, o_ref, *, eps: float, silu: bool,
               count: float):
    x = x_ref[0].astype(jnp.float32)          # (HW, C)
    m = m_ref[...]                             # (C, G)
    sum_g = jnp.sum(
        jax.lax.dot_general(x, m, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32),
        axis=0, keepdims=True)                 # (1, G)
    sumsq_g = jnp.sum(
        jax.lax.dot_general(x * x, m, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32),
        axis=0, keepdims=True)
    mean_g = sum_g / count
    var_g = sumsq_g / count - mean_g * mean_g
    inv_g = 1.0 / jnp.sqrt(var_g + eps)
    # broadcast group stats back to channels: (1,G) @ (G,C)
    mt = m.T
    mean_c = jax.lax.dot_general(mean_g, mt, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot_general(inv_g, mt, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    y = (x - mean_c) * inv_c * w_ref[...] + b_ref[...]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "silu"))
def _gn_pallas(x2d, w, b, groups: int, eps: float, silu: bool):
    bsz, hw, c = x2d.shape
    m = jnp.asarray(_group_matrix(c, groups))
    count = float(hw * (c // groups))
    kernel = functools.partial(_gn_kernel, eps=eps, silu=silu, count=count)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, groups), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, hw, c), x2d.dtype),
    )(x2d, m, w, b)


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _pallas_enabled() -> bool:
    """Opt-in gate (CREMAGE_TPU_GN_PALLAS=1), default OFF.

    Device findings on v5e (re-checked this round): the matmul-stat
    kernel now COMPILES on current libtpu (~38 s Mosaic compile) and
    runs correctly, but at ~62 us/op it loses to the rewritten XLA path
    below (matmul group stats + bf16 fused epilogue, ~15 us in-graph),
    so XLA stays the production path and the kernel remains the
    interpret-mode-tested reference."""
    import os

    return os.environ.get("CREMAGE_TPU_GN_PALLAS", "0").lower() in (
        "1", "true", "yes")


def group_norm_silu(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
    groups: int = 32, eps: float = 1e-5, silu: bool = True,
    force_pallas: bool = False,
) -> jnp.ndarray:
    """x: (B, H, W, C) or (B, N, C). Returns same shape/dtype."""
    shape = x.shape
    c = shape[-1]
    x2d = x.reshape(shape[0], -1, c)
    hw = x2d.shape[1]
    use_pallas = force_pallas or (
        _pallas_enabled() and _is_tpu() and hw * c <= _VMEM_ROW_LIMIT
        and c % groups == 0
    )
    if use_pallas:
        out = _gn_pallas(
            x2d, weight.astype(jnp.float32), bias.astype(jnp.float32),
            groups, eps, silu,
        )
        return out.reshape(shape)
    # XLA path: group statistics via matmul against the 0/1 membership
    # matrix M (C, G) — measured ~1.5 ms per GN on v5e with the naive
    # (B, HW, G, C/G) reshape (C/G = 10 lanes forces relayouts); the
    # matmul form keeps everything (8,128)-tiled and lets XLA fuse the
    # normalize+affine+SiLU epilogue into one pass. fp32 stats, bf16 data.
    # NEVER materialize x in fp32 (at VAE 512^2 shapes that alone cost
    # ~115 ms/decode): sums run as bf16-product einsums with f32
    # accumulation — a bf16*bf16 product is exactly representable in
    # f32, so the f32-accumulated statistics are exact for bf16 inputs.
    m = jnp.asarray(_group_matrix(c, groups)).astype(x2d.dtype)  # (C, G) 0/1
    count = float(hw * (c // groups))
    sum_g = jnp.einsum("bnc,cg->bg", x2d, m,
                       preferred_element_type=jnp.float32)
    sumsq_g = jnp.einsum("bnc,bnc->bc", x2d, x2d,
                         preferred_element_type=jnp.float32) @ \
        m.astype(jnp.float32)                          # (B, G)
    mean_g = sum_g / count
    # one-pass moments can cancel to small negatives when |mean| >> std
    # (saw NaNs via rsqrt on random-init test models) — clamp at 0
    var_g = jnp.maximum(sumsq_g / count - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)                 # (B, G)
    # per-channel affine folded with the group stats: one fused epilogue
    mt = m.astype(jnp.float32).T
    mean_c = mean_g @ mt                               # (B, C)
    inv_c = inv_g @ mt
    w32 = weight.astype(jnp.float32)
    b32 = bias.astype(jnp.float32)
    scale_c = (inv_c * w32)[:, None, :]                # (B, 1, C)
    shift_c = (b32 - mean_c * inv_c * w32)[:, None, :]
    # epilogue in the INPUT dtype: an x.astype(f32) here materializes a
    # separate convert op on TPU (measured 52 ms per VAE decode at 512^2
    # — a quarter of the whole decode). Stats above stay exact f32; the
    # per-element normalize/SiLU rounds at bf16 like the reference's
    # model.half() GroupNorm does on CUDA. fp32 inputs keep fp32 math.
    y = x2d * scale_c.astype(x2d.dtype) + shift_c.astype(x2d.dtype)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype).reshape(shape)
