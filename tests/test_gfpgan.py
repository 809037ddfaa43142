"""GFPGANv1Clean differential test: torch oracle of the published
clean architecture (the reference consumes it via the gfpgan pip
package, tools/gfpgan_wrapper.py) in the checkpoint key layout,
random-weight parity, and load_gfp_restorer end to end.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.models.gfpgan import (
    GFPGANConfig, GFPGANv1Clean, convert_gfpgan_state_dict,
    load_gfp_restorer,
)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def up2(x):
    return F.interpolate(x, scale_factor=2, mode="bilinear",
                         align_corners=False)


class OResBlock(nn.Module):
    def __init__(self, cin, cout, scale):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cin, 3, 1, 1)
        self.conv2 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.skip = nn.Conv2d(cin, cout, 1, bias=False)
        self.scale = scale

    def forward(self, x):
        out = F.leaky_relu(self.conv1(x), 0.2)
        out = F.interpolate(out, scale_factor=self.scale, mode="bilinear",
                            align_corners=False)
        out = F.leaky_relu(self.conv2(out), 0.2)
        x = F.interpolate(x, scale_factor=self.scale, mode="bilinear",
                          align_corners=False)
        return out + self.skip(x)


class OModConv(nn.Module):
    def __init__(self, cin, cout, k, style_feat, demod=True, mode=None):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(1, cout, cin, k, k))
        self.modulation = nn.Linear(style_feat, cin)
        self.demod = demod
        self.mode = mode
        self.k = k

    def forward(self, x, style):
        b, c, h, w = x.shape
        cout = self.weight.shape[1]
        s = self.modulation(style).view(b, 1, c, 1, 1)
        weight = self.weight * s
        if self.demod:
            d = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
            weight = weight * d.view(b, cout, 1, 1, 1)
        weight = weight.view(b * cout, c, self.k, self.k)
        if self.mode == "upsample":
            x = up2(x)
        elif self.mode == "downsample":
            x = F.interpolate(x, scale_factor=0.5, mode="bilinear",
                              align_corners=False)
        b, c, h, w = x.shape
        x = x.reshape(1, b * c, h, w)
        out = F.conv2d(x, weight, padding=self.k // 2, groups=b)
        return out.view(b, cout, h, w)


class OStyleConv(nn.Module):
    def __init__(self, cin, cout, style_feat, mode=None):
        super().__init__()
        self.modulated_conv = OModConv(cin, cout, 3, style_feat, True, mode)
        self.weight = nn.Parameter(torch.zeros(1))
        self.bias = nn.Parameter(torch.zeros(1, cout, 1, 1))

    def forward(self, x, style, noise):
        out = self.modulated_conv(x, style) * 2 ** 0.5
        out = out + self.weight * noise + self.bias
        return F.leaky_relu(out, 0.2)


class OToRGB(nn.Module):
    def __init__(self, cin, style_feat):
        super().__init__()
        self.modulated_conv = OModConv(cin, 3, 1, style_feat, False)
        self.bias = nn.Parameter(torch.zeros(1, 3, 1, 1))

    def forward(self, x, style, skip=None):
        out = self.modulated_conv(x, style) + self.bias
        if skip is not None:
            out = out + up2(skip)
        return out


class OracleGFPGAN(nn.Module):
    def __init__(self, cfg: GFPGANConfig):
        super().__init__()
        self.cfg = cfg
        ls = cfg.log_size
        ch = cfg.channels
        nf = cfg.num_style_feat
        self.conv_body_first = nn.Conv2d(3, ch(2 ** ls), 1)
        self.conv_body_down = nn.ModuleList(
            [OResBlock(ch(2 ** i), ch(2 ** (i - 1)), 0.5)
             for i in range(ls, 2, -1)])
        self.final_conv = nn.Conv2d(ch(4), ch(4), 3, 1, 1)
        self.final_linear = nn.Linear(ch(4) * 16, cfg.num_latent * nf)
        self.conv_body_up = nn.ModuleList(
            [OResBlock(ch(2 ** (i - 1)), ch(2 ** i), 2)
             for i in range(3, ls + 1)])
        self.condition_scale = nn.ModuleList()
        self.condition_shift = nn.ModuleList()
        for i in range(3, ls + 1):
            c = ch(2 ** i)
            sft = c // 2 if cfg.sft_half else c
            for lst in (self.condition_scale, self.condition_shift):
                lst.append(nn.Sequential(
                    nn.Conv2d(c, c, 3, 1, 1), nn.LeakyReLU(0.2, True),
                    nn.Conv2d(c, sft, 3, 1, 1)))
        dec = nn.Module()
        dec.constant_input = nn.Module()
        dec.constant_input.weight = nn.Parameter(torch.randn(1, ch(4), 4, 4))
        dec.style_conv1 = OStyleConv(ch(4), ch(4), nf)
        dec.to_rgb1 = OToRGB(ch(4), nf)
        convs, rgbs = [], []
        cin = ch(4)
        for i in range(3, ls + 1):
            c = ch(2 ** i)
            convs.append(OStyleConv(cin, c, nf, "upsample"))
            convs.append(OStyleConv(c, c, nf))
            rgbs.append(OToRGB(c, nf))
            cin = c
        dec.style_convs = nn.ModuleList(convs)
        dec.to_rgbs = nn.ModuleList(rgbs)
        self.stylegan_decoder = dec

    def forward(self, x, noises):
        cfg = self.cfg
        ls = cfg.log_size
        feat = F.leaky_relu(self.conv_body_first(x), 0.2)
        skips = []
        for blk in self.conv_body_down:
            feat = blk(feat)
            skips.insert(0, feat)
        feat = F.leaky_relu(self.final_conv(feat), 0.2)
        style = self.final_linear(feat.reshape(feat.size(0), -1))
        latent = style.view(style.size(0), -1, cfg.num_style_feat)
        conditions = []
        for idx in range(ls - 2):
            feat = feat + skips[idx]
            feat = self.conv_body_up[idx](feat)
            conditions.append(self.condition_scale[idx](feat))
            conditions.append(self.condition_shift[idx](feat))
        dec = self.stylegan_decoder
        out = dec.constant_input.weight.expand(x.size(0), -1, -1, -1)
        out = dec.style_conv1(out, latent[:, 0], noises[0])
        skip = dec.to_rgb1(out, latent[:, 1])
        i = 1
        ni = 1
        for conv1, conv2, rgb in zip(dec.style_convs[::2],
                                     dec.style_convs[1::2], dec.to_rgbs):
            out = conv1(out, latent[:, i], noises[ni])
            if i < len(conditions):
                if self.cfg.sft_half:
                    half = out.size(1) // 2
                    same, sft = torch.split(out, half, dim=1)
                    sft = sft * conditions[i - 1] + conditions[i]
                    out = torch.cat([same, sft], dim=1)
                else:
                    out = out * conditions[i - 1] + conditions[i]
            out = conv2(out, latent[:, i + 1], noises[ni + 1])
            skip = rgb(out, latent[:, i + 2], skip)
            i += 2
            ni += 2
        return skip


TINY = GFPGANConfig(out_size=32, num_style_feat=16, channel_multiplier=2,
                    base=16)


def test_gfpgan_parity():
    torch.manual_seed(0)
    oracle = OracleGFPGAN(TINY).eval()
    sd = convert_gfpgan_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()})

    model = GFPGANv1Clean(TINY)
    tmpl = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.zeros((1, 32, 32, 3)))["params"]
    params, missing, unused = CK.build_flax_params(tmpl, sd, prefix="")
    assert not missing, missing
    assert not unused, unused

    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    # per-layer noise (B, H, W, 1); resolutions [4, 8, 8, 16, 16, ...]
    n_layers = TINY.num_latent - 1
    sizes = [4]
    r = 4
    while len(sizes) < n_layers:
        r *= 2
        sizes.extend([r, r])
    noises = [rng.normal(size=(2, s, s, 1)).astype(np.float32)
              for s in sizes[:n_layers]]

    with torch.no_grad():
        want = oracle(torch.tensor(x.transpose(0, 3, 1, 2)),
                      [torch.tensor(n.transpose(0, 3, 1, 2))
                       for n in noises]).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(x),
        noises=[jnp.asarray(n) for n in noises]))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_gfp_restorer_aligned(tmp_path):
    torch.manual_seed(2)
    oracle = OracleGFPGAN(TINY).eval()
    path = str(tmp_path / "GFPGANv1.4.pth")
    torch.save({"params_ema": oracle.state_dict()}, path)
    restorer = load_gfp_restorer(path, TINY)
    rng = np.random.RandomState(3)
    face = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    out = restorer.restore_aligned(face)
    assert out.shape == (32, 32, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
