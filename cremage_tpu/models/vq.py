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
import jax
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


# ---------------------------------------------------------------------------
# MoVQ decoder (Kandinsky 2.2's VQ image decoder)
# ---------------------------------------------------------------------------

class SpatialNorm(nn.Module):
    """MoVQ spatially-modulated normalization (diffusers SpatialNorm):
    GroupNorm(f) * conv_y(resize(zq)) + conv_b(resize(zq)) — the decoder
    re-injects the quantized latent at every norm site."""

    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f, zq):
        from cremage_tpu.models.layers import Conv, GroupNorm

        b, h, w, _ = f.shape
        zh = zq.shape[1]
        if zh != h:
            scale = h // zh
            bb, eh, ew, ec = zq.shape
            zq = jnp.broadcast_to(
                zq[:, :, None, :, None, :], (bb, eh, scale, ew, scale, ec)
            ).reshape(bb, eh * scale, ew * scale, ec)
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        normed = GroupNorm(32, name="norm_layer")(f)
        y = Conv(f.shape[-1], kernel_size=1, padding=0, name="conv_y",
                 **dd)(zq.astype(self.dtype))
        bconv = Conv(f.shape[-1], kernel_size=1, padding=0, name="conv_b",
                     **dd)(zq.astype(self.dtype))
        return normed.astype(self.dtype) * y + bconv


class _MoVQResBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, zq):
        from cremage_tpu.models.layers import Conv, silu

        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        cin = x.shape[-1]
        h = SpatialNorm(name="norm1", **dd)(x, zq)
        h = Conv(self.out_channels, kernel_size=3, name="conv1", **dd)(
            silu(h))
        h = SpatialNorm(name="norm2", **dd)(h, zq)
        h = Conv(self.out_channels, kernel_size=3, name="conv2", **dd)(
            silu(h))
        if cin != self.out_channels:
            x = Conv(self.out_channels, kernel_size=1, padding=0,
                     name="conv_shortcut", **dd)(x)
        return x + h


class _MoVQAttn(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, zq):
        from cremage_tpu.models.layers import Dense
        from cremage_tpu.ops.attention import attention

        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, hh, ww, c = x.shape
        h = SpatialNorm(name="spatial_norm", **dd)(x, zq)
        t = h.reshape(b, hh * ww, c)
        q = Dense(c, name="to_q", **dd)(t).reshape(b, hh * ww, 1, c)
        k = Dense(c, name="to_k", **dd)(t).reshape(b, hh * ww, 1, c)
        v = Dense(c, name="to_v", **dd)(t).reshape(b, hh * ww, 1, c)
        a = attention(q, k, v).reshape(b, hh * ww, c)
        out = Dense(c, name="to_out_0", **dd)(a)
        return x + out.reshape(b, hh, ww, c)


@dataclasses.dataclass(frozen=True)
class MoVQConfig:
    latent_channels: int = 4
    out_channels: int = 3
    block_out_channels: tuple = (128, 256, 256, 512)
    layers_per_block: int = 2
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32


class MoVQDecoder(nn.Module):
    """Kandinsky 2.2 MoVQ decoder (diffusers VQModel with
    norm_type='spatial'); module names flatten to the diffusers
    decoder.* key strings (reference downloads this inside the
    kandinsky decoder pipeline, modules/kandinsky/txt2img.py)."""

    cfg: MoVQConfig

    @nn.compact
    def __call__(self, zq, x=None):
        """zq: the (un-projected) latent conditioning every SpatialNorm;
        x: the decoder INPUT — diffusers VQModel.decode runs
        `decoder(post_quant_conv(quant), zq=quant)`, so the loader's
        decode wrapper passes the 1x1-projected latent here.  Defaults
        to zq for the projection-free path (tests, codebook-free use)."""
        from cremage_tpu.models.layers import Conv, silu

        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        boc = cfg.block_out_channels
        if x is None:
            x = zq
        h = Conv(boc[-1], kernel_size=3, name="conv_in", **dd)(
            x.astype(cfg.dtype))
        h = _MoVQResBlock(boc[-1], name="mid_block_resnets_0", **dd)(h, zq)
        h = _MoVQAttn(name="mid_block_attentions_0", **dd)(h, zq)
        h = _MoVQResBlock(boc[-1], name="mid_block_resnets_1", **dd)(h, zq)
        n = len(boc)
        for pos, lv in enumerate(reversed(range(n))):
            for i in range(cfg.layers_per_block + 1):
                h = _MoVQResBlock(
                    boc[lv], name=f"up_blocks_{pos}_resnets_{i}", **dd,
                )(h, zq)
            if lv != 0:
                bb, hh2, ww2, cc = h.shape
                h = jnp.broadcast_to(
                    h[:, :, None, :, None, :], (bb, hh2, 2, ww2, 2, cc)
                ).reshape(bb, hh2 * 2, ww2 * 2, cc)
                h = Conv(cc, kernel_size=3,
                         name=f"up_blocks_{pos}_upsamplers_0_conv", **dd)(h)
        h = SpatialNorm(name="conv_norm_out", **dd)(h, zq)
        h = Conv(cfg.out_channels, kernel_size=3, name="conv_out",
                 dtype=jnp.float32, param_dtype=cfg.param_dtype)(silu(h))
        return h


# ---------------------------------------------------------------------------
# Stable Cascade Stage A (Paella VQGAN, decoder path)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PaellaVQConfig:
    """diffusers PaellaVQModel geometry (wuerstchen/modeling_paella_
    vq_model.py; the reference decodes Stage B latents through it inside
    StableCascadeDecoderPipeline, modules/stable_cascade/txt2img.py).
    c_levels = [embed_dim / 2^i for i in reversed(range(levels))]."""

    out_channels: int = 3
    up_down_scale_factor: int = 2
    levels: int = 2
    bottleneck_blocks: int = 12
    embed_dim: int = 384
    latent_channels: int = 4
    scale_factor: float = 0.3764     # pipeline multiplies latents by this
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32


class MixingResidualBlock(nn.Module):
    """Paella VQGAN block: affine-free channel LN modulated by 6 learned
    gammas, depthwise 3x3 (replication pad) + Linear-GELU-Linear."""

    dim: int
    embed_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from cremage_tpu.models.cascade import _channel_ln
        from cremage_tpu.models.layers import Dense

        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        g = self.param("gammas", nn.initializers.zeros, (6,), jnp.float32)
        g = g.astype(self.dtype)

        t = _channel_ln(x) * (1 + g[0]) + g[1]
        t = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        dw = self.param("depthwise_1_weight",
                        nn.initializers.lecun_normal(),
                        (3, 3, 1, self.dim), self.param_dtype)
        dwb = self.param("depthwise_1_bias", nn.initializers.zeros,
                         (self.dim,), self.param_dtype)
        conv = jax.lax.conv_general_dilated(
            t.astype(self.dtype), dw.astype(self.dtype), (1, 1),
            [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.dim,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype) + dwb.astype(self.dtype)
        x = x + conv * g[2]

        t = _channel_ln(x) * (1 + g[3]) + g[4]
        t = Dense(self.embed_dim, name="channelwise_0", **dd)(t)
        t = nn.gelu(t, approximate=False)
        t = Dense(self.dim, name="channelwise_2", **dd)(t)
        return x + t * g[5]


class ConvTranspose4x4s2(nn.Module):
    """torch ConvTranspose2d(k=4, s=2, p=1) (the Paella VQGAN level
    upscaler): input-dilated conv with the spatially flipped kernel and
    k-1-p = 2 padding.  Weight stored (4, 4, out, in) — what the
    shape-directed converter produces from torch's (in, out, 4, 4)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (4, 4, self.features, in_ch), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), self.param_dtype)
        wk = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)  # HWIO
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), wk.astype(self.dtype),
            window_strides=(1, 1), padding=[(2, 2), (2, 2)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        return y + b.astype(self.dtype)


class PaellaVQDecoder(nn.Module):
    """Decode (force_not_quantize) path of PaellaVQModel: module names
    flatten to the diffusers up_blocks/out_block key strings.  The
    caller pre-multiplies latents by cfg.scale_factor
    (StableCascadeDecoderPipeline semantics)."""

    cfg: PaellaVQConfig

    @nn.compact
    def __call__(self, z):
        from cremage_tpu.models.cascade import _pixel_shuffle
        from cremage_tpu.models.layers import Conv

        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        c_levels = [cfg.embed_dim // (2 ** i)
                    for i in reversed(range(cfg.levels))]
        h = Conv(c_levels[-1], kernel_size=1, padding=0,
                 name="up_blocks_0_0", **dd)(z.astype(cfg.dtype))
        idx = 1
        for i in range(cfg.levels):
            c = c_levels[cfg.levels - 1 - i]
            for _ in range(cfg.bottleneck_blocks if i == 0 else 1):
                h = MixingResidualBlock(c, c * 4, name=f"up_blocks_{idx}",
                                        **dd)(h)
                idx += 1
            if i < cfg.levels - 1:
                h = ConvTranspose4x4s2(
                    c_levels[cfg.levels - 2 - i],
                    name=f"up_blocks_{idx}", **dd)(h)
                idx += 1
        r = cfg.up_down_scale_factor
        h = Conv(cfg.out_channels * r * r, kernel_size=1, padding=0,
                 name="out_block_0", dtype=jnp.float32,
                 param_dtype=cfg.param_dtype)(h)
        return _pixel_shuffle(h, r)
