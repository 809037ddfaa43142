"""UnblurCremageModelV6 (Flax) — the face unblur/colorize network.

Behavior contract: reference `modules/unblur_face/cremage_model_v6.py:
400` + `mha.py`: a 256^2 encoder-decoder —
- 7 ResnetBlocks (num_blocks GroupNorm+SiLU residual pairs each, with
  one multi-head self-attention at mid resolutions) halving 256->2 and
  widening 16->2048, then a k2 ConvAct to 1x1;
- mid: 1x1 ConvAct 2048->4096, MHA(4096, 8 heads), 1x1 back to 2048;
- 9 up blocks: ConvTransposeAct, 7 ResnetTransposeBlocks (k4 s2 p1
  transpose conv on the widening pair + U-Net skip concats with the
  reversed encoder states), and a final plain 3x3 conv to RGB;
- input/output RGB in [0, 1], output clamped by the caller
  (face_unblur.py:106-117 loads sd['model_state_dict'], x/255).

Module names flatten to the torch checkpoint keys; transpose-conv
kernels (torch IOHW) are pre-flipped/permuted to HWIO by
`convert_unblur_state_dict`.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.dpt import PlainConv
from cremage_tpu.models.layers import Dense, silu


@dataclasses.dataclass(frozen=True)
class UnblurV6Config:
    base: int = 16            # stage-0 width; doubles per stage to base<<7
    num_blocks: int = 6       # residual pairs per Resnet(Transpose)Block
    heads: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @property
    def down_channels(self) -> Tuple[int, ...]:
        return tuple(self.base << i for i in range(8))


def unblur_v6_config(**kw) -> UnblurV6Config:
    return UnblurV6Config(**kw)


def _gn_groups(ch: int) -> int:
    g = min(32, ch)
    while ch % g:
        g -= 1  # reference special-cases 112 -> 28; this generalizes it
    return g


class GN(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        g = _gn_groups(self.ch)
        w = self.param("weight", nn.initializers.ones, (self.ch,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.ch,),
                       jnp.float32)
        orig = x.dtype
        xf = x.astype(jnp.float32)
        bb, h, ww, c = xf.shape
        xg = xf.reshape(bb, h, ww, g, c // g)
        mean = xg.mean(axis=(1, 2, 4), keepdims=True)
        var = xg.var(axis=(1, 2, 4), keepdims=True)
        xf = ((xg - mean) / jnp.sqrt(var + 1e-5)).reshape(bb, h, ww, c)
        return (xf * w + b).astype(orig)


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d(k=4, s=2, p=1) equivalent; kernel stored HWIO
    pre-flipped (convert_unblur_state_dict does the torch->flax flip)."""

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (k, k, x.shape[-1], self.features), self.param_dtype)
        y = lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (1, 1),
            padding=[(k - 1 - p, k - 1 - p)] * 2, lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), self.param_dtype)
            y = y + b.astype(self.dtype)
        return y


class MHA(nn.Module):
    """mha.py MultiHeadSelfAttention: q/k/v Linear (no bias) + out."""

    embed: int
    heads: int
    cfg: UnblurV6Config

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)
        b, n, c = x.shape
        hd = c // self.heads
        q = Dense(c, use_bias=False, name="queries", **dd)(x)
        k = Dense(c, use_bias=False, name="keys", **dd)(x)
        v = Dense(c, use_bias=False, name="values", **dd)(x)
        q = q.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        a = jax.nn.softmax(
            (q @ k.transpose(0, 1, 3, 2)).astype(jnp.float32)
            / math.sqrt(hd), axis=-1).astype(v.dtype)
        o = (a @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
        return Dense(c, name="out", **dd)(o)


def _spatial_mha(x, mha):
    b, h, w, c = x.shape
    t = mha(x.reshape(b, h * w, c))
    return t.reshape(b, h, w, c)


class ResnetSingle(nn.Module):
    out_ch: int
    stride: int
    transpose: bool
    cfg: UnblurV6Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        skip = x
        if self.transpose:
            if x.shape[-1] > self.out_ch:
                skip = TorchConvTranspose(self.out_ch, use_bias=False,
                                          name="conv_skip", **dd)(x)
                h = TorchConvTranspose(self.out_ch, use_bias=False,
                                       name="conv1", **dd)(x)
            else:
                h = PlainConv(self.out_ch, 3, 1, 1, use_bias=False,
                              name="conv1", **dd)(x)
        else:
            if self.stride == 2 or x.shape[-1] != self.out_ch:
                skip = PlainConv(self.out_ch, 1, self.stride, 0,
                                 use_bias=False, name="conv_skip", **dd)(x)
            h = PlainConv(self.out_ch, 3, self.stride, 1, use_bias=False,
                          name="conv1", **dd)(x)
        h = silu(GN(self.out_ch, name="gn1")(h))
        h = PlainConv(self.out_ch, 3, 1, 1, use_bias=False,
                      name="conv2", **dd)(h)
        h = GN(self.out_ch, name="gn2")(h)
        return silu(h + skip)


class ResnetStage(nn.Module):
    out_ch: int
    stride: int
    heads: int
    transpose: bool
    cfg: UnblurV6Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = ResnetSingle(self.out_ch, self.stride, self.transpose, cfg,
                         name="blocks_0")(x)
        for j in range(1, cfg.num_blocks):
            x = ResnetSingle(self.out_ch, 1, self.transpose, cfg,
                             name=f"blocks_{j}")(x)
        if self.heads > 0:
            x = _spatial_mha(x, MHA(self.out_ch, self.heads, cfg,
                                    name="attentions_0"))
        return x


class UnblurCremageModelV6(nn.Module):
    """(B, 256, 256, 3) [0,1] -> (B, 256, 256, 3) (clamp by caller)."""

    cfg: UnblurV6Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        d = cfg.down_channels
        heads_down = (0, 0, 0, cfg.heads, cfg.heads, cfg.heads, cfg.heads)
        x = x.astype(cfg.dtype)
        hs: List[jnp.ndarray] = []
        for i in range(7):
            x = ResnetStage(d[i], 2, heads_down[i], False, cfg,
                            name=f"down_blocks_{i}")(x)
            hs.append(x)
        # down block 7: ConvAct k2 s1 p0 -> 1x1
        x = PlainConv(d[7], 2, 1, 0, name="down_blocks_7_conv", **dd)(x)
        x = silu(x)
        hs.append(x)

        # mid
        x = silu(PlainConv(2 * d[7], 1, 1, 0,
                           name="mid_blocks_0_conv", **dd)(x))
        x = _spatial_mha(x, MHA(2 * d[7], cfg.heads, cfg,
                                name="mid_blocks_1"))
        x = silu(PlainConv(d[7], 1, 1, 0, name="mid_blocks_2_conv", **dd)(x))

        hr = hs[::-1]
        heads_up = (0, cfg.heads, cfg.heads, cfg.heads, cfg.heads,
                    0, 0, 0, 0)
        out_ch = d[7] // 2
        x = silu(TorchConvTranspose(out_ch, name="up_blocks_0_conv",
                                    **dd)(x))
        for i in range(1, 8):
            x = jnp.concatenate([x, hr[i]], axis=-1)
            out_ch = x.shape[-1] // 2
            x = ResnetStage(out_ch, 2, heads_up[i], True, cfg,
                            name=f"up_blocks_{i}")(x)
        return PlainConv(3, 3, 1, 1, name="up_blocks_8", **dd)(x)


def convert_unblur_state_dict(sd: Dict[str, np.ndarray]
                              ) -> Dict[str, np.ndarray]:
    """Pre-flip transpose-conv kernels (torch IOHW -> flax HWIO with
    spatial flip) for the known ConvTranspose2d sites."""
    tkeys = {"up_blocks.0.conv.weight"}
    for i in range(1, 8):
        tkeys.add(f"up_blocks.{i}.blocks.0.conv_skip.weight")
        tkeys.add(f"up_blocks.{i}.blocks.0.conv1.weight")
    out = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        v = np.asarray(v)
        if k in tkeys:
            v = np.flip(v, (2, 3)).transpose(2, 3, 0, 1).copy()
        out[k] = v
    return out


def load_unblur_model(weights_path: str, cfg: UnblurV6Config = None):
    """sd['model_state_dict'] container (face_unblur.py:106) or a bare
    state dict -> jitted infer(img01 (256,256,3)) -> (256,256,3)."""
    from cremage_tpu.io import checkpoint as CK

    cfg = cfg or UnblurV6Config()
    sd = CK.load_state_dict(weights_path)
    if "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    sd = convert_unblur_state_dict(sd)
    model = UnblurCremageModelV6(cfg)
    tmpl = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.zeros((1, 256, 256, 3)))["params"]
    params, missing, _ = CK.build_flax_params(tmpl, sd, prefix="",
                                              strict=False)
    if missing:
        raise KeyError(f"unblur ckpt missing {missing[:5]} ...")
    apply = jax.jit(lambda p, x: model.apply({"params": p}, x))

    def infer(img01: np.ndarray) -> np.ndarray:
        y = np.asarray(apply(params, jnp.asarray(
            img01[None], np.float32)), np.float32)[0]
        return np.clip(y, 0.0, 1.0)

    return infer
