"""GFPGAN v1.2-1.4 face restoration (GFPGANv1Clean, Flax).

Behavior contract: reference `tools/gfpgan_wrapper.py:46-78` —
model_selector picks GFPGANv1.{2,3,4}.pth (arch "clean") and
gfp_wrapper runs GFPGANer.enhance: detect + FFHQ-align each face to
512^2, restore with the generator, paste back (background optionally
RealESRGAN-upscaled).  The gfpgan package itself is a pip dependency
of the reference (not vendored), so this port follows the published
GFPGANv1Clean/StyleGAN2GeneratorCSFT(clean) architecture:

- degradation-removal U-Net: 1x1 conv in, bilinear-resize ResBlocks
  down to 4^2, final 3x3 conv, Linear -> per-layer W+ style codes
  (different_w), ResUpBlocks producing per-resolution SFT scale/shift
  condition pairs (sft_half: conditions modulate half the channels);
- StyleGAN2 "clean" decoder: constant 4^2 input, modulated 3x3 convs
  (style modulation Linear, demodulation, x sqrt(2), per-layer noise +
  bias, LeakyReLU 0.2), bilinear up-sampling, 1x1 to-RGB skips with
  bilinear skip upsampling; input_is_latent (the style MLP exists in
  checkpoints but is bypassed).

Module names flatten to the GFPGAN checkpoint keys (params_ema);
5-D modulated-conv weights (1, out, in, k, k) are reshaped by
`convert_gfpgan_state_dict`.  Validation against the published v1.4
weights is pending real weights in this environment (COVERAGE.md).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.dpt import PlainConv
from cremage_tpu.models.layers import Dense

# facexlib FFHQ 512 alignment template (5 points)
FFHQ_512_TEMPLATE = np.array(
    [[192.98138, 239.94708], [318.90277, 240.1936],
     [256.63416, 314.01935], [201.26117, 371.41043],
     [313.08905, 371.15118]], np.float32)


@dataclasses.dataclass(frozen=True)
class GFPGANConfig:
    out_size: int = 512
    num_style_feat: int = 512
    channel_multiplier: int = 2
    narrow: float = 1.0
    sft_half: bool = True
    base: int = 512            # cap width (512 in the real model)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @property
    def log_size(self) -> int:
        return int(math.log2(self.out_size))

    def channels(self, res: int) -> int:
        table = {4: self.base, 8: self.base, 16: self.base, 32: self.base,
                 64: self.base // 2 * self.channel_multiplier,
                 128: self.base // 4 * self.channel_multiplier,
                 256: self.base // 8 * self.channel_multiplier,
                 512: self.base // 16 * self.channel_multiplier,
                 1024: self.base // 32 * self.channel_multiplier}
        return int(table[res] * self.narrow)

    @property
    def num_latent(self) -> int:
        return self.log_size * 2 - 2


def gfpgan_v14_config(**kw) -> GFPGANConfig:
    return GFPGANConfig(**kw)


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _resize(x, scale: float):
    """torch F.interpolate(bilinear, align_corners=False) semantics —
    NO antialiasing on downscale (jax.image.resize antialiases)."""
    b, h, w, c = x.shape
    out_h, out_w = int(h * scale), int(w * scale)

    def axis(n_in, n_out):
        pos = (np.arange(n_out, dtype=np.float64) + 0.5) * n_in / n_out - 0.5
        pos = np.clip(pos, 0, n_in - 1)
        lo = np.floor(pos).astype(np.int32)
        hi = np.minimum(lo + 1, n_in - 1)
        return lo, hi, (pos - lo).astype(np.float32)

    lo_h, hi_h, fh = axis(h, out_h)
    lo_w, hi_w, fw = axis(w, out_w)
    xf = x.astype(jnp.float32)
    top = xf[:, lo_h][:, :, lo_w] * (1 - fw[None, None, :, None]) + \
        xf[:, lo_h][:, :, hi_w] * fw[None, None, :, None]
    bot = xf[:, hi_h][:, :, lo_w] * (1 - fw[None, None, :, None]) + \
        xf[:, hi_h][:, :, hi_w] * fw[None, None, :, None]
    out = top * (1 - fh[None, :, None, None]) + bot * fh[None, :, None, None]
    return out.astype(x.dtype)


class CleanResBlock(nn.Module):
    """gfpgan clean ResBlock: conv1 -> lrelu -> resize -> conv2 -> lrelu
    plus resized 1x1 skip."""

    out_ch: int
    scale: float
    cfg: GFPGANConfig

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)
        h = _lrelu(PlainConv(x.shape[-1], 3, 1, 1, name="conv1", **dd)(x))
        h = _resize(h, self.scale)
        h = _lrelu(PlainConv(self.out_ch, 3, 1, 1, name="conv2", **dd)(h))
        skip = PlainConv(self.out_ch, 1, 1, 0, use_bias=False,
                         name="skip", **dd)(_resize(x, self.scale))
        return h + skip


class ModulatedConv(nn.Module):
    """StyleGAN2 clean modulated conv; weight param (out, in, k, k)
    (checkpoint 5-D weight squeezed by the converter)."""

    out_ch: int
    kernel_size: int
    demodulate: bool = True
    sample_mode: Optional[str] = None
    cfg: GFPGANConfig = None

    @nn.compact
    def __call__(self, x, style):
        cfg = self.cfg
        k = self.kernel_size
        cin = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (self.out_ch, cin, k, k), cfg.param_dtype)
        s = Dense(cin, name="modulation", dtype=cfg.dtype,
                  param_dtype=cfg.param_dtype)(style)  # (B, cin)
        b = x.shape[0]
        wf = w.astype(jnp.float32)[None] * s.astype(jnp.float32)[
            :, None, :, None, None]                    # (B, out, in, k, k)
        if self.demodulate:
            demod = jax.lax.rsqrt((wf ** 2).sum((2, 3, 4)) + 1e-8)
            wf = wf * demod[:, :, None, None, None]
        if self.sample_mode == "upsample":
            x = _resize(x, 2.0)
        elif self.sample_mode == "downsample":
            x = _resize(x, 0.5)
        # grouped-conv batch trick: (1, H, W, B*Cin) x (k,k,cin,B*out)
        bh, hh, ww, _ = x.shape
        xg = x.astype(cfg.dtype).transpose(1, 2, 0, 3).reshape(
            1, hh, ww, b * cin)
        wg = wf.astype(cfg.dtype).transpose(3, 4, 2, 0, 1).reshape(
            k, k, cin, b * self.out_ch)
        y = lax.conv_general_dilated(
            xg, wg, (1, 1), padding=[(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=b,
            preferred_element_type=jnp.float32).astype(cfg.dtype)
        return y.reshape(hh, ww, b, self.out_ch).transpose(2, 0, 1, 3)


class StyleConv(nn.Module):
    out_ch: int
    sample_mode: Optional[str] = None
    cfg: GFPGANConfig = None

    @nn.compact
    def __call__(self, x, style, noise=None):
        out = ModulatedConv(self.out_ch, 3, True, self.sample_mode,
                            self.cfg, name="modulated_conv")(x, style)
        out = out * (2 ** 0.5)
        strength = self.param("weight", nn.initializers.zeros, (1,),
                              self.cfg.param_dtype)
        if noise is None:
            noise = jnp.zeros(out.shape[:3] + (1,), out.dtype)
        out = out + strength.astype(out.dtype) * noise
        bias = self.param("bias", nn.initializers.zeros,
                          (1, self.out_ch, 1, 1), self.cfg.param_dtype)
        out = out + bias.astype(out.dtype).transpose(0, 2, 3, 1)
        return _lrelu(out)


class ToRGB(nn.Module):
    cfg: GFPGANConfig

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv(3, 1, False, None, self.cfg,
                            name="modulated_conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (1, 3, 1, 1),
                          self.cfg.param_dtype)
        out = out + bias.astype(out.dtype).transpose(0, 2, 3, 1)
        if skip is not None:
            out = out + _resize(skip, 2.0)
        return out


class GFPGANv1Clean(nn.Module):
    """(B, 512, 512, 3) in [-1, 1] -> restored (B, 512, 512, 3)."""

    cfg: GFPGANConfig

    @nn.compact
    def __call__(self, x, noises: Optional[List] = None):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        ls = cfg.log_size
        ch = cfg.channels

        # ---- degradation-removal U-Net ----
        feat = _lrelu(PlainConv(ch(2 ** ls), 1, 1, 0,
                                name="conv_body_first", **dd)(
            x.astype(cfg.dtype)))
        skips = []
        for idx, i in enumerate(range(ls, 2, -1)):
            feat = CleanResBlock(ch(2 ** (i - 1)), 0.5, cfg,
                                 name=f"conv_body_down_{idx}")(feat)
            skips.insert(0, feat)
        feat = _lrelu(PlainConv(ch(4), 3, 1, 1, name="final_conv",
                                **dd)(feat))
        b = feat.shape[0]
        # torch NCHW flatten order
        flat = feat.transpose(0, 3, 1, 2).reshape(b, -1)
        style_code = Dense(cfg.num_latent * cfg.num_style_feat,
                           name="final_linear", **dd)(flat)
        latent = style_code.reshape(b, cfg.num_latent, cfg.num_style_feat)

        conditions = []
        for idx, i in enumerate(range(3, ls + 1)):
            feat = feat + skips[idx]
            feat = CleanResBlock(ch(2 ** i), 2.0, cfg,
                                 name=f"conv_body_up_{idx}")(feat)
            sft_ch = ch(2 ** i) // 2 if cfg.sft_half else ch(2 ** i)
            sc = PlainConv(ch(2 ** i), 3, 1, 1,
                           name=f"condition_scale_{idx}_0", **dd)(feat)
            sc = PlainConv(sft_ch, 3, 1, 1,
                           name=f"condition_scale_{idx}_2", **dd)(_lrelu(sc))
            sh = PlainConv(ch(2 ** i), 3, 1, 1,
                           name=f"condition_shift_{idx}_0", **dd)(feat)
            sh = PlainConv(sft_ch, 3, 1, 1,
                           name=f"condition_shift_{idx}_2", **dd)(_lrelu(sh))
            conditions.extend([sc, sh])

        # ---- StyleGAN2 clean decoder with CSFT ----
        D = "stylegan_decoder_"
        const = self.param(D + "constant_input_weight",
                           nn.initializers.normal(1.0),
                           (1, ch(4), 4, 4), cfg.param_dtype)
        out = jnp.broadcast_to(const.astype(cfg.dtype),
                               (b,) + const.shape[1:]).transpose(0, 2, 3, 1)
        n_noise = cfg.num_latent - 1          # noise per style conv

        def noise_at(j, ref):
            if noises is not None:
                return noises[j]
            return jnp.zeros(ref.shape[:3] + (1,), ref.dtype)

        out = StyleConv(ch(4), None, cfg, name=D + "style_conv1")(
            out, latent[:, 0], noise_at(0, out))
        skip = ToRGB(cfg, name=D + "to_rgb1")(out, latent[:, 1])

        i = 1
        conv_idx = 0
        noise_idx = 1
        for res_i in range(3, ls + 1):
            cc = ch(2 ** res_i)
            up = StyleConv(cc, "upsample", cfg,
                           name=D + f"style_convs_{conv_idx}")
            out = up(out, latent[:, i],
                     noise_at(noise_idx, _resize(out, 2.0)))
            # CSFT modulation from the U-Net conditions
            if i < len(conditions):
                if cfg.sft_half:
                    half = out.shape[-1] // 2
                    same, sft = out[..., :half], out[..., half:]
                    sft = sft * conditions[i - 1] + conditions[i]
                    out = jnp.concatenate([same, sft], axis=-1)
                else:
                    out = out * conditions[i - 1] + conditions[i]
            out = StyleConv(cc, None, cfg,
                            name=D + f"style_convs_{conv_idx + 1}")(
                out, latent[:, i + 1], noise_at(noise_idx + 1, out))
            skip = ToRGB(cfg, name=D + f"to_rgbs_{conv_idx // 2}")(
                out, latent[:, i + 2], skip)
            conv_idx += 2
            noise_idx += 2
            i += 2
        return skip


def convert_gfpgan_state_dict(sd: Dict[str, np.ndarray]
                              ) -> Dict[str, np.ndarray]:
    """GFPGAN ckpt (params_ema container) -> loader-ready dict:
    5-D modulated-conv weights squeezed; the (bypassed) style MLP and
    stored noises dropped."""
    if "params_ema" in sd:
        sd = sd["params_ema"]
    elif "params" in sd and isinstance(sd["params"], dict):
        sd = sd["params"]
    out = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if ".style_mlp." in k or ".noises." in k or k.startswith("noises."):
            continue  # input_is_latent bypasses the MLP; noise is fed live
        if v.ndim == 5 and v.shape[0] == 1:
            v = v[0]  # modulated conv (1, out, in, k, k)
        out[k] = v
    return out


class GFPRestorer:
    """gfp_wrapper-equivalent: detect faces (YuNet), FFHQ-align to
    512^2, restore, paste back; background via the caller's upscaler."""

    def __init__(self, params, cfg: GFPGANConfig = GFPGANConfig(),
                 yunet_path: Optional[str] = None):
        model = GFPGANv1Clean(cfg)
        self.cfg = cfg
        self._apply = jax.jit(
            lambda p, x: model.apply({"params": p}, x))
        self.params = params
        self.yunet_path = yunet_path

    def restore_aligned(self, face01: np.ndarray) -> np.ndarray:
        """(512,512,3) [0,1] aligned face -> restored [0,1]."""
        x = face01[None] * 2.0 - 1.0
        y = np.asarray(self._apply(self.params, jnp.asarray(
            x, np.float32)), np.float32)[0]
        return np.clip((y + 1.0) / 2.0, 0.0, 1.0)

    def __call__(self, rgb01: np.ndarray) -> np.ndarray:
        import cv2

        from cremage_tpu.models.arcface import (
            detect_faces_with_landmarks, umeyama_similarity,
        )

        faces = detect_faces_with_landmarks(rgb01, self.yunet_path)
        out = np.asarray(rgb01, np.float32).copy()
        size = self.cfg.out_size
        tmpl = FFHQ_512_TEMPLATE * (size / 512.0)
        for _, landmarks, _ in faces:
            M = umeyama_similarity(landmarks, tmpl)
            aligned = cv2.warpAffine(out, M, (size, size))
            restored = self.restore_aligned(aligned)
            Minv = cv2.invertAffineTransform(M)
            h, w = out.shape[:2]
            back = cv2.warpAffine(restored, Minv, (w, h))
            mask = cv2.warpAffine(np.ones((size, size), np.float32),
                                  Minv, (w, h))
            mask = cv2.erode(mask, np.ones((5, 5)))
            mask = cv2.GaussianBlur(mask, (21, 21), 0)[..., None]
            out = out * (1 - mask) + back * mask
        return np.clip(out, 0.0, 1.0)


def load_gfp_restorer(weights_path: str,
                      cfg: Optional[GFPGANConfig] = None,
                      yunet_path: Optional[str] = None) -> GFPRestorer:
    from cremage_tpu.io import checkpoint as CK

    cfg = cfg or GFPGANConfig()
    sd = convert_gfpgan_state_dict(CK.load_state_dict(weights_path))
    model = GFPGANv1Clean(cfg)
    tmpl = jax.eval_shape(
        model.init, jax.random.key(0),
        jnp.zeros((1, cfg.out_size, cfg.out_size, 3)))["params"]
    params, missing, _ = CK.build_flax_params(tmpl, sd, prefix="",
                                              strict=False)
    if missing:
        raise KeyError(f"gfpgan ckpt missing {missing[:5]} ...")
    return GFPRestorer(params, cfg, yunet_path)
