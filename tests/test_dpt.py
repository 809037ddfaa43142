"""DPT-Hybrid (MiDaS) differential test.

Oracle: a torch reimplementation WRITTEN HERE of the reference's
documented dpt_hybrid semantics (modules/annotator/midas/midas/
{vit,blocks,dpt_depth}.py + timm vit_base_resnet50_384 backbone),
whose state-dict keys are exactly the ISL checkpoint layout — so one
random-weight state dict drives both sides: it documents the expected
checkpoint structure, validates the mechanical converter, and checks
the Flax numerics end to end.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.models.dpt import DPTConfig, DPTDepthModel

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


# ---------------------------------------------------------------------------
# torch oracle (ISL key layout)
# ---------------------------------------------------------------------------

def pad_same(x, k, s):
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


class StdConvSame(nn.Conv2d):
    def forward(self, x):
        w = self.weight
        v, m = torch.var_mean(w, dim=[1, 2, 3], keepdim=True, unbiased=False)
        w = (w - m) / torch.sqrt(v + 1e-6)
        x = pad_same(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, w, self.bias, self.stride, 0)


class OBottleneck(nn.Module):
    def __init__(self, in_ch, out_ch, stride):
        super().__init__()
        mid = out_ch // 4
        self.conv1 = StdConvSame(in_ch, mid, 1, bias=False)
        self.norm1 = GNActP(mid)
        self.conv2 = StdConvSame(mid, mid, 3, stride=stride, bias=False)
        self.norm2 = GNActP(mid)
        self.conv3 = StdConvSame(mid, out_ch, 1, bias=False)
        self.norm3 = GNActP(out_ch, act=False)
        if in_ch != out_ch or stride != 1:
            self.downsample = nn.Module()
            self.downsample.conv = StdConvSame(in_ch, out_ch, 1,
                                               stride=stride, bias=False)
            self.downsample.norm = GNActP(out_ch, act=False)
        else:
            self.downsample = None

    def forward(self, x):
        sc = x
        if self.downsample is not None:
            sc = self.downsample.norm(self.downsample.conv(x))
        x = self.norm1(self.conv1(x))
        x = self.norm2(self.conv2(x))
        x = self.norm3(self.conv3(x))
        return F.relu(x + sc)


class GNActP(nn.GroupNorm):
    """GroupNorm with weight/bias as own params (ISL key layout) +
    optional relu."""

    def __init__(self, ch, act=True):
        super().__init__(min(32, ch), ch)
        self._act = act

    def forward(self, x):
        x = super().forward(x)
        return F.relu(x) if self._act else x


class OViTBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * mlp_ratio)
        self.mlp.fc2 = nn.Linear(dim * mlp_ratio, dim)
        self.heads = heads

    def forward(self, x):
        b, n, c = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(b, n, 3, self.heads, c // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        a = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(c // self.heads),
                          dim=-1)
        o = (a @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.attn.proj(o)
        h = self.norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(h)))


class OProjectReadout(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.project = nn.Sequential(nn.Linear(2 * dim, dim), nn.GELU())

    def forward(self, tokens):
        cls = tokens[:, :1].expand_as(tokens[:, 1:])
        return self.project(torch.cat([tokens[:, 1:], cls], dim=-1))


class ORCU(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = nn.Conv2d(f, f, 3, padding=1)
        self.conv2 = nn.Conv2d(f, f, 3, padding=1)

    def forward(self, x):
        h = self.conv2(F.relu(self.conv1(F.relu(x))))
        return h + x


class OFusion(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.out_conv = nn.Conv2d(f, f, 1)
        self.resConfUnit1 = ORCU(f)
        self.resConfUnit2 = ORCU(f)

    def forward(self, x, res=None):
        if res is not None:
            x = x + self.resConfUnit1(res)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        return self.out_conv(x)


class OracleDPT(nn.Module):
    def __init__(self, cfg: DPTConfig):
        super().__init__()
        self.cfg = cfg
        pm = nn.Module()
        backbone = nn.Module()
        stem = nn.Module()
        stem.conv = StdConvSame(3, cfg.stem_ch, 7, stride=2, bias=False)
        stem.norm = GNActP(cfg.stem_ch)
        backbone.stem = stem
        stages = nn.ModuleList()
        in_ch = cfg.stem_ch
        for si, nb in enumerate(cfg.stage_blocks):
            out_ch = cfg.stage_out[si]
            blocks = nn.ModuleList()
            for bi in range(nb):
                blocks.append(OBottleneck(in_ch, out_ch,
                                          2 if (si > 0 and bi == 0) else 1))
                in_ch = out_ch
            stage = nn.Module()
            stage.blocks = blocks
            stages.append(stage)
        backbone.stages = stages
        patch_embed = nn.Module()
        patch_embed.backbone = backbone
        patch_embed.proj = nn.Conv2d(cfg.stage_out[-1], cfg.vit_dim, 1)
        pm.patch_embed = patch_embed
        pm.cls_token = nn.Parameter(torch.zeros(1, 1, cfg.vit_dim))
        pm.pos_embed = nn.Parameter(
            torch.randn(1, 1 + cfg.patch_grid ** 2, cfg.vit_dim) * 0.02)
        pm.blocks = nn.ModuleList(
            OViTBlock(cfg.vit_dim, cfg.vit_heads, cfg.vit_mlp_ratio)
            for _ in range(cfg.vit_layers))
        pm.norm = nn.LayerNorm(cfg.vit_dim)
        pretrained = nn.Module()
        pretrained.model = pm
        pretrained.act_postprocess3 = nn.Sequential(
            OProjectReadout(cfg.vit_dim), nn.Identity(), nn.Identity(),
            nn.Conv2d(cfg.vit_dim, cfg.vit_dim, 1))
        pretrained.act_postprocess4 = nn.Sequential(
            OProjectReadout(cfg.vit_dim), nn.Identity(), nn.Identity(),
            nn.Conv2d(cfg.vit_dim, cfg.vit_dim, 1),
            nn.Conv2d(cfg.vit_dim, cfg.vit_dim, 3, stride=2, padding=1))
        self.pretrained = pretrained

        f = cfg.features
        scratch = nn.Module()
        scratch.layer1_rn = nn.Conv2d(cfg.stage_out[0], f, 3, padding=1,
                                      bias=False)
        scratch.layer2_rn = nn.Conv2d(cfg.stage_out[1], f, 3, padding=1,
                                      bias=False)
        scratch.layer3_rn = nn.Conv2d(cfg.vit_dim, f, 3, padding=1,
                                      bias=False)
        scratch.layer4_rn = nn.Conv2d(cfg.vit_dim, f, 3, padding=1,
                                      bias=False)
        scratch.refinenet1 = OFusion(f)
        scratch.refinenet2 = OFusion(f)
        scratch.refinenet3 = OFusion(f)
        scratch.refinenet4 = OFusion(f)
        scratch.output_conv = nn.Sequential(
            nn.Conv2d(f, f // 2, 3, padding=1), nn.Identity(),
            nn.Conv2d(f // 2, 32, 3, padding=1), nn.ReLU(),
            nn.Conv2d(32, 1, 1), nn.ReLU(), nn.Identity())
        self.scratch = scratch

    def forward(self, x):
        cfg = self.cfg
        pm = self.pretrained.model
        h = pm.patch_embed.backbone.stem.norm(
            pm.patch_embed.backbone.stem.conv(x))
        h = F.max_pool2d(pad_same(h, 3, 2), 3, stride=2)
        feats = []
        for stage in pm.patch_embed.backbone.stages:
            for blk in stage.blocks:
                h = blk(h)
            feats.append(h)
        layer_1, layer_2 = feats[0], feats[1]

        b = x.shape[0]
        h = pm.patch_embed.proj(h)
        gh, gw = h.shape[-2:]
        tokens = h.flatten(2).transpose(1, 2)
        tokens = torch.cat([pm.cls_token.expand(b, -1, -1), tokens], dim=1)
        pe_tok = pm.pos_embed[:, :1]
        g = cfg.patch_grid
        pe_grid = pm.pos_embed[0, 1:].reshape(1, g, g, -1).permute(0, 3, 1, 2)
        if (gh, gw) != (g, g):
            pe_grid = F.interpolate(pe_grid, size=(gh, gw), mode="bilinear")
        pe_grid = pe_grid.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
        tokens = tokens + torch.cat([pe_tok, pe_grid], dim=1)

        hook3 = hook4 = None
        for i, blk in enumerate(pm.blocks):
            tokens = blk(tokens)
            if i == cfg.hooks[0]:
                hook3 = tokens
            if i == cfg.hooks[1]:
                hook4 = tokens

        def unflat(t):
            return t.transpose(1, 2).reshape(b, cfg.vit_dim, gh, gw)

        l3 = self.pretrained.act_postprocess3[3](
            unflat(self.pretrained.act_postprocess3[0](hook3)))
        l4 = self.pretrained.act_postprocess4[0](hook4)
        l4 = self.pretrained.act_postprocess4[3](unflat(l4))
        l4 = self.pretrained.act_postprocess4[4](l4)

        s = self.scratch
        r1, r2 = s.layer1_rn(layer_1), s.layer2_rn(layer_2)
        r3, r4 = s.layer3_rn(l3), s.layer4_rn(l4)
        p = s.refinenet4(r4)
        p = s.refinenet3(p, r3)
        p = s.refinenet2(p, r2)
        p = s.refinenet1(p, r1)
        out = s.output_conv[0](p)
        out = F.interpolate(out, scale_factor=2, mode="bilinear",
                            align_corners=True)
        out = s.output_conv[4](F.relu(s.output_conv[2](out)))
        return F.relu(out).squeeze(1)


TINY = DPTConfig(stem_ch=8, stage_blocks=(1, 1, 1), vit_dim=32,
                 vit_layers=3, vit_heads=4, vit_mlp_ratio=2, hooks=(1, 2),
                 features=16, patch_grid=4)  # grid 4 = 64px/16


@pytest.mark.slow
@pytest.mark.parametrize("hw", [(64, 64), (96, 64)])
def test_dpt_hybrid_parity(hw):
    torch.manual_seed(0)
    oracle = OracleDPT(TINY).eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

    model = DPTDepthModel(TINY)
    H, W = hw
    tmpl = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.zeros((1, 64, 64, 3)))["params"]
    params, missing, unused = CK.build_flax_params(tmpl, sd, prefix="")
    assert not missing, missing
    assert not unused, unused

    rng = np.random.RandomState(1)
    img = rng.uniform(-1, 1, (1, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.tensor(img.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(img)))
    assert got.shape == want.shape == (1, H, W)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_depth_normal_annotators_end_to_end(tmp_path):
    """ISL-layout .pt ckpt -> annotate('depth'/'normal') uint8 maps,
    matching the reference post-processing on the oracle's raw depth."""
    import cv2

    from cremage_tpu.services.annotators import annotate

    torch.manual_seed(2)
    oracle = OracleDPT(TINY).eval()
    path = str(tmp_path / "dpt_tiny.pt")
    torch.save(oracle.state_dict(), path)

    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (70, 50, 3), np.uint8)  # pads to 96x64
    dep = annotate("depth", img, weights_path=path, cfg=TINY)
    assert dep.shape == (70, 50, 3) and dep.dtype == np.uint8
    nor = annotate("normal", img, weights_path=path, cfg=TINY)
    assert nor.shape == (70, 50, 3) and nor.dtype == np.uint8

    # reference-oracle post-processing on the torch depth
    x = np.pad(img.astype(np.float32) / 127.5 - 1.0,
               ((0, 26), (0, 14), (0, 0)), mode="reflect")
    with torch.no_grad():
        want_depth = oracle(
            torch.tensor(x.transpose(2, 0, 1)[None])).numpy()[0][:70, :50]
    d = want_depth - want_depth.min()
    d /= max(d.max(), 1e-8)
    np.testing.assert_allclose(dep[..., 0],
                               (d * 255).clip(0, 255).astype(np.uint8),
                               atol=1)
