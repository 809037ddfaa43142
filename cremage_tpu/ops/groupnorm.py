"""Fused GroupNorm(+SiLU) Pallas kernel.

GroupNorm is HBM-bandwidth-bound: the unfused form reads the activation
three times (stats, normalize, activation). This kernel does one pass
per batch row — stats, normalize, affine and SiLU fused in VMEM — the
"fused GroupNorm+SiLU epilogue" called for by SURVEY.md §7 kernels/.

Used for spatial activations (B, H, W, C) with C % groups == 0. Falls
back to the XLA path when the row doesn't fit VMEM or off-TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# keep one (HW, C) fp32 row + bf16 in/out comfortably under ~16MB VMEM
_VMEM_ROW_LIMIT = 2 * 1024 * 1024  # elements


def _gn_kernel(x_ref, w_ref, b_ref, o_ref, *, groups: int, eps: float,
               silu: bool):
    x = x_ref[0].astype(jnp.float32)          # (HW, C)
    hw, c = x.shape
    cg = c // groups
    xg = x.reshape(hw, groups, cg)
    mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=(0, 2), keepdims=True)
    y = (xg - mean) / jnp.sqrt(var + eps)
    y = y.reshape(hw, c) * w_ref[...] + b_ref[...]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "silu"))
def _gn_pallas(x2d, w, b, groups: int, eps: float, silu: bool):
    bsz, hw, c = x2d.shape
    kernel = functools.partial(_gn_kernel, groups=groups, eps=eps, silu=silu)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, hw, c), x2d.dtype),
    )(x2d, w, b)


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


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
        _is_tpu() and hw * c <= _VMEM_ROW_LIMIT and c % groups == 0
        and c % 128 == 0
    )
    if use_pallas:
        out = _gn_pallas(
            x2d, weight.astype(jnp.float32), bias.astype(jnp.float32),
            groups, eps, silu,
        )
        return out.reshape(shape)
    # XLA fallback (identical math, fp32 stats)
    xf = x2d.astype(jnp.float32)
    xg = xf.reshape(shape[0], hw, groups, c // groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    y = ((xg - mean) / jnp.sqrt(var + eps)).reshape(shape[0], hw, c)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype).reshape(shape)
