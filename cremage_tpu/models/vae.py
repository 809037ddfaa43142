"""KL autoencoder (SD first stage) in Flax, NHWC.

Architecture contract: CompVis AutoencoderKL
(reference `modules/ldm/models/autoencoder.py` +
`modules/ldm/modules/diffusionmodules/model.py` Encoder/Decoder; config
v1-inference.yaml first_stage_config: ch=128, ch_mult=(1,2,4,4),
num_res_blocks=2, z=4, no attn except mid). Module names flatten to the
`first_stage_model.*` checkpoint keys.

TPU notes: decode is HBM-bound at 1024^2; all convs NHWC, GroupNorm fp32,
single-head mid attention via the shared attention op.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.lax as lax
import jax.numpy as jnp

from cremage_tpu.models.layers import Conv, GroupNorm, silu
from cremage_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    in_channels: int = 3
    out_ch: int = 3
    scale_factor: float = 0.18215
    shift_factor: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32


def sdxl_vae_config(**kw) -> VAEConfig:
    return VAEConfig(scale_factor=0.13025, **kw)


def sd3_vae_config(**kw) -> VAEConfig:
    """16-channel VAE (SD3): z=(x-shift)*scale."""
    return VAEConfig(z_channels=16, embed_dim=16, scale_factor=1.5305,
                     shift_factor=0.0609, **kw)


def flux_vae_config(**kw) -> VAEConfig:
    return VAEConfig(z_channels=16, embed_dim=16, scale_factor=0.3611,
                     shift_factor=0.1159, **kw)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = GroupNorm(num_groups=32, epsilon=1e-6, fuse_silu=True, name="norm1")(x)
        h = Conv(self.out_channels, name="conv1", **dd)(h)
        h = GroupNorm(num_groups=32, epsilon=1e-6, fuse_silu=True, name="norm2")(h)
        h = Conv(self.out_channels, name="conv2", **dd)(h)
        if x.shape[-1] != self.out_channels:
            x = Conv(self.out_channels, kernel_size=1, padding=0,
                     name="nin_shortcut", **dd)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over spatial tokens (mid block)."""

    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        q = Conv(c, kernel_size=1, padding=0, name="q", **dd)(h)
        k = Conv(c, kernel_size=1, padding=0, name="k", **dd)(h)
        v = Conv(c, kernel_size=1, padding=0, name="v", **dd)(h)
        n = hh * ww
        q = q.reshape(b, n, 1, c)
        k = k.reshape(b, n, 1, c)
        v = v.reshape(b, n, 1, c)
        h = attention(q, k, v).reshape(b, hh, ww, c)
        h = Conv(c, kernel_size=1, padding=0, name="proj_out", **dd)(h)
        return x + h


class DownsampleVAE(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch pads (0,1,0,1) asymmetric before stride-2 conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return Conv(self.channels, stride=2, padding=0, name="conv",
                    dtype=self.dtype, param_dtype=self.param_dtype)(x)


class UpsampleVAE(nn.Module):
    """Nearest-2x upsample + 3x3 conv, folded into one 2x2-phase conv.

    nearest-repeat followed by a 3x3 stride-1 conv touches each source
    pixel through at most 2 taps per dimension, so the pair is EXACTLY
    a 2x2 conv per output phase with kernels built by summing the 3x3
    taps that share a source pixel — 2.25x fewer MXU FLOPs and no
    materialized 4x repeat (the repeat broadcast alone cost ~10 ms per
    512^2 VAE decode). Params stay in the checkpoint's 3x3 layout; the
    fold happens in-graph (bit-exact vs the unfused form, tested)."""

    channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    class _Params(nn.Module):
        features: int
        in_ch: int
        param_dtype: jnp.dtype

        @nn.compact
        def __call__(self):
            w = self.param("weight", nn.initializers.lecun_normal(),
                           (3, 3, self.in_ch, self.features),
                           self.param_dtype)
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), self.param_dtype)
            return w, b

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # params live under the checkpoint's conv.{weight,bias} names
        w, b = UpsampleVAE._Params(self.channels, in_ch, self.param_dtype,
                                   name="conv")()
        # per-dim tap folding: phase 0 reads (m-1, m) with coeffs
        # (w0, w1+w2); phase 1 reads (m, m+1) with (w0+w1, w2)
        def fold(wk, axis):
            w0, w1, w2 = jnp.split(wk, 3, axis=axis)
            p0 = jnp.concatenate([w0, w1 + w2], axis=axis)
            p1 = jnp.concatenate([w0 + w1, w2], axis=axis)
            return p0, p1
        r0, r1 = fold(w, 0)
        k = []
        for rw in (r0, r1):
            c0, c1 = fold(rw, 1)
            k.extend([c0, c1])
        # one conv producing all 4 phases: kernel (2, 2, in, 4*out)
        kern = jnp.concatenate(k, axis=-1)
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
        o = lax.conv_general_dilated(
            xp, kern.astype(self.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)                  # (B, H+1, W+1, 4*out)
        bsz, hp, wp, _ = o.shape
        h, wd = hp - 1, wp - 1
        c = self.channels
        ph = [o[:, r:r + h, s:s + wd, i * c:(i + 1) * c]
              for i, (r, s) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1)))]
        y = jnp.stack(ph, axis=3)             # (B, H, W, 4, C)
        y = y.reshape(bsz, h, wd, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(bsz, h * 2, wd * 2, c)
        return y + b.astype(self.dtype)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        x = x.astype(cfg.dtype)
        h = Conv(cfg.ch, name="conv_in", **dd)(x)
        for level, mult in enumerate(cfg.ch_mult):
            out_ch = cfg.ch * mult
            for b in range(cfg.num_res_blocks):
                h = ResnetBlock(out_ch, name=f"down_{level}_block_{b}", **dd)(h)
            if level != len(cfg.ch_mult) - 1:
                h = DownsampleVAE(out_ch, name=f"down_{level}_downsample", **dd)(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_1", **dd)(h)
        h = AttnBlock(name="mid_attn_1", **dd)(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_2", **dd)(h)
        h = GroupNorm(num_groups=32, epsilon=1e-6, fuse_silu=True, name="norm_out")(h)
        return Conv(2 * cfg.z_channels, name="conv_out", **dd)(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        z = z.astype(cfg.dtype)
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = Conv(block_in, name="conv_in", **dd)(z)
        h = ResnetBlock(block_in, name="mid_block_1", **dd)(h)
        h = AttnBlock(name="mid_attn_1", **dd)(h)
        h = ResnetBlock(block_in, name="mid_block_2", **dd)(h)
        for level in reversed(range(len(cfg.ch_mult))):
            out_ch = cfg.ch * cfg.ch_mult[level]
            for b in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(out_ch, name=f"up_{level}_block_{b}", **dd)(h)
            if level != 0:
                h = UpsampleVAE(out_ch, name=f"up_{level}_upsample", **dd)(h)
        h = GroupNorm(num_groups=32, epsilon=1e-6, fuse_silu=True, name="norm_out")(h)
        return Conv(cfg.out_ch, name="conv_out", **dd)(h)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar); decode(z). Keys: encoder.*, decoder.*,
    quant_conv, post_quant_conv (flattened with underscores)."""

    cfg: VAEConfig

    def setup(self):
        dd = dict(dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        self.quant_conv = Conv(
            2 * self.cfg.embed_dim, kernel_size=1, padding=0,
            name="quant_conv", **dd)
        self.post_quant_conv = Conv(
            self.cfg.z_channels, kernel_size=1, padding=0,
            name="post_quant_conv", **dd)

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key=None, sample: bool = False):
        mean, logvar = self.encode(x)
        if sample:
            assert key is not None
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape, dtype=jnp.float32
            ).astype(mean.dtype)
        else:
            z = mean
        return self.decode(z)


def encode_to_latent(vae: AutoencoderKL, params, x, key=None, sample=False):
    """Image [-1,1] NHWC -> scaled latent z = (mean - shift) * scale.
    One cached jitted program per (vae, sampling?) — an eager VAE
    forward costs seconds of dispatch time on the tunneled TPU backend
    (core/jitcache.py)."""
    from cremage_tpu.core.jitcache import jit_fn

    do_sample = bool(sample and key is not None)

    def build():
        def run(p, xx, kk):
            mean, logvar = vae.apply(p, xx, method=AutoencoderKL.encode)
            z = mean
            if do_sample:
                z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                    kk, mean.shape, dtype=jnp.float32
                ).astype(mean.dtype)
            return (z - vae.cfg.shift_factor) * vae.cfg.scale_factor
        return run

    fn = jit_fn(vae, build, f"encode_to_latent:{do_sample}")
    return fn(params, x, key if key is not None else jax.random.key(0))


def decode_from_latent(vae: AutoencoderKL, params, z):
    """Scaled latent -> image [-1,1] NHWC (reference decode_first_stage
    divides by scale_factor; SD3/FLUX add the shift back).  One cached
    jitted program per vae (core/jitcache.py)."""
    from cremage_tpu.core.jitcache import jit_fn

    def build():
        def run(p, zz):
            zz = zz / vae.cfg.scale_factor + vae.cfg.shift_factor
            return vae.apply(p, zz, method=AutoencoderKL.decode)
        return run

    return jit_fn(vae, build, "decode_from_latent")(params, z)
