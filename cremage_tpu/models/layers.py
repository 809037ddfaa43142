"""Shared Flax building blocks for the diffusion model graphs.

Conventions:
- activations are NHWC (TPU-native conv layout); checkpoint conv kernels
  (torch OIHW) are transposed to HWIO at load time (io/checkpoint.py).
- module names flatten to the torch checkpoint key strings (dots ->
  underscores), so weight loading is a mechanical string transform; see
  io/checkpoint.py `normalize_key`.
- GroupNorm/LayerNorm statistics run in float32 even under bf16 compute.
"""
from __future__ import annotations

import math
import os

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp


def _matmul_accum_dtype(compute_dtype):
    """preferred_element_type for convs/matmuls. Default f32 (exact MXU
    accumulation surfaced to XLA). CREMAGE_TPU_ACCUM=bf16 emits bf16
    output buffers instead — halves the write+convert traffic of every
    conv at the cost of bf16 partial-sum rounding when XLA splits the
    contraction; only safe for inference, measured on the VAE/UNet
    before being made a default anywhere."""
    if os.environ.get("CREMAGE_TPU_ACCUM", "f32").lower() in ("bf16",
                                                              "bfloat16"):
        return compute_dtype
    return jnp.float32


def _dynamic_int8(x, axes):
    """Dynamic symmetric int8 activation quantization for the w8a8
    path: max-abs over `axes` (per token for matmuls, per image for
    convs — the conv window spans neighbor pixels so one scale must
    cover every contributing input).  The reduce runs on the INPUT
    dtype (abs/max are exact in any float dtype — no fp32-materialized
    copy of x); fp32 appears only inside the divide/round/cast chain,
    which XLA fuses into one bf16-in/int8-out elementwise kernel.
    Returns (int8 codes, fp32 scale)."""
    a_scale = jnp.maximum(
        jnp.max(jnp.abs(x), axis=axes, keepdims=True).astype(jnp.float32)
        / 127.0, 1e-12)
    xq = jnp.round(x.astype(jnp.float32) / a_scale).astype(jnp.int8)
    return xq, a_scale


def _weight_scale(module):
    """The per-output-channel dequantization scale an 8-bit kernel was
    stored with (io/quantize.py). int8 kernels are unusable without it
    — fail with the real cause instead of `y * None`."""
    if not module.has_variable("params", "weight_scale"):
        raise ValueError(
            f"{module.name or type(module).__name__}: int8 kernel has "
            "no weight_scale sibling — the tree was not produced by "
            "io/quantize.py quantize_params_8bit/quantized_zeros")
    return module.get_variable("params", "weight_scale")


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, CompVis convention
    (semantics of ldm/modules/diffusionmodules/util.py timestep_embedding:
    half-dim exp-decayed freqs, [cos, sin] order)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics; matches torch GroupNorm semantics.

    fuse_silu=True fuses the following SiLU into the same pass (Pallas
    kernel on TPU, one HBM round-trip instead of three — ops/groupnorm)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    fuse_silu: bool = False

    @nn.compact
    def __call__(self, x):
        from cremage_tpu.ops.groupnorm import group_norm_silu

        c = x.shape[-1]
        scale = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_silu(
            x, scale, bias, groups=self.num_groups, eps=self.epsilon,
            silu=self.fuse_silu,
        )


class Conv(nn.Module):
    """Conv2D with torch-compatible param names (weight/bias), NHWC/HWIO.

    int8 kernels (io/quantize.py quantize_params_8bit with
    include_convs=True) switch to the w8a8 path: activations are
    dynamically quantized per batch
    element (the 3x3 window spans neighbor pixels, so the scale must
    cover every contributing input — per-image max-abs is the finest
    exact granularity), the conv runs s8 x s8 -> s32 on the MXU's
    native int8 mode (2x bf16 peak on v5e), and the output is rescaled
    by (image scale) x (output-channel weight scale)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "weight",
            nn.initializers.lecun_normal(),
            (k, k, in_ch, self.features),
            self.param_dtype,
        )
        pad = [(self.padding, self.padding)] * 2
        if kernel.dtype == jnp.int8:
            xq, a_scale = _dynamic_int8(x, axes=(1, 2, 3))
            acc = lax.conv_general_dilated(
                xq, kernel,
                window_strides=(self.stride, self.stride),
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * a_scale
            y = (y * _weight_scale(self)).astype(self.dtype)
        else:
            y = lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=_matmul_accum_dtype(self.dtype),
            ).astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


class Dense(nn.Module):
    """Linear with torch-compatible param names; kernel stored (in, out).

    8-bit weight storage (io/quantize.py): when the loader has replaced
    the kernel with a float8 tensor plus a per-output-channel
    `weight_scale` leaf (quanto-qfloat8-style, reference
    modules/flux/txt2img.py:56-68), the scale is applied to the matmul
    output — exact column rescaling, one (features,) multiply.  The
    leaf is read with has_variable/get_variable so unquantized trees
    (and init) are untouched.

    int8 kernels (io/quantize.py "int8") switch to the w8a8 path:
    activations are dynamically quantized per token (row max-abs
    symmetric, exact 127-level code), the contraction runs as an
    s8 x s8 -> s32 dot — the MXU's native int8 mode, 2x the bf16 peak
    on v5e — and the output is rescaled by (row activation scale) x
    (column weight scale)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "weight",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            self.param_dtype,
        )
        if kernel.dtype == jnp.int8:
            xq, a_scale = _dynamic_int8(x, axes=-1)
            acc = lax.dot_general(
                xq, kernel,
                (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * a_scale
            y = y * _weight_scale(self)
        else:
            y = jnp.dot(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                preferred_element_type=_matmul_accum_dtype(self.dtype),
            )
            if self.has_variable("params", "weight_scale"):
                y = y * self.get_variable(
                    "params", "weight_scale").astype(y.dtype)
        y = y.astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


class LayerNorm(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        x = x.astype(jnp.float32)
        c = x.shape[-1]
        scale = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + self.epsilon)
        return (x * scale + bias).astype(orig)


def silu(x):
    return nn.silu(x)


def quick_gelu(x):
    """OpenAI CLIP activation: x * sigmoid(1.702 x)."""
    return x * nn.sigmoid(1.702 * x)
