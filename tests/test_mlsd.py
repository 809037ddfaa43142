"""M-LSD tests: torch oracle in the mlsd_large checkpoint key layout
(reference modules/annotator/mlsd/models/mbv2_mlsd_large.py semantics)
drives a random-weight differential test; decode_lines is checked on a
synthetic tpMap with known segments; annotator end-to-end from a .pth.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.models.mlsd import (
    MLSDConfig, MLSDDetector, MobileV2MLSDLarge, decode_lines,
)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


class OConvBNReLU(nn.Sequential):
    def __init__(self, cin, cout, k=3, stride=1, groups=1):
        self.stride = stride
        pad = 0 if stride == 2 else (k - 1) // 2
        super().__init__(
            nn.Conv2d(cin, cout, k, stride, pad, groups=groups, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU6(inplace=True))

    def forward(self, x):
        if self.stride == 2:
            x = F.pad(x, (0, 1, 0, 1))
        for m in self:
            x = m(x)
        return x


class OInvRes(nn.Module):
    def __init__(self, inp, oup, stride, t):
        super().__init__()
        hidden = int(round(inp * t))
        self.res = stride == 1 and inp == oup
        layers = []
        if t != 1:
            layers.append(OConvBNReLU(inp, hidden, 1))
        layers += [OConvBNReLU(hidden, hidden, 3, stride, groups=hidden),
                   nn.Conv2d(hidden, oup, 1, bias=False),
                   nn.BatchNorm2d(oup)]
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.res else self.conv(x)


class OBlockA(nn.Module):
    def __init__(self, in1, in2, out1, out2, upscale=True):
        super().__init__()
        self.conv1 = nn.Sequential(nn.Conv2d(in2, out2, 1),
                                   nn.BatchNorm2d(out2), nn.ReLU())
        self.conv2 = nn.Sequential(nn.Conv2d(in1, out1, 1),
                                   nn.BatchNorm2d(out1), nn.ReLU())
        self.up = upscale

    def forward(self, a, b):
        b = self.conv1(b)
        a = self.conv2(a)
        if self.up:
            b = F.interpolate(b, scale_factor=2.0, mode="bilinear",
                              align_corners=True)
        return torch.cat((a, b), 1)


class OBlockB(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Sequential(nn.Conv2d(cin, cin, 3, padding=1),
                                   nn.BatchNorm2d(cin), nn.ReLU())
        self.conv2 = nn.Sequential(nn.Conv2d(cin, cout, 3, padding=1),
                                   nn.BatchNorm2d(cout), nn.ReLU())

    def forward(self, x):
        return self.conv2(self.conv1(x) + x)


class OBlockC(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(cin, cin, 3, padding=5, dilation=5),
            nn.BatchNorm2d(cin), nn.ReLU())
        self.conv2 = nn.Sequential(nn.Conv2d(cin, cin, 3, padding=1),
                                   nn.BatchNorm2d(cin), nn.ReLU())
        self.conv3 = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        return self.conv3(self.conv2(self.conv1(x)))


class OracleMLSD(nn.Module):
    def __init__(self, cfg: MLSDConfig):
        super().__init__()
        self.cfg = cfg
        backbone = nn.Module()
        feats = [OConvBNReLU(4, cfg.input_channel, 3, stride=2)]
        cin = cfg.input_channel
        for t, c, n, s in cfg.setting:
            for i in range(n):
                feats.append(OInvRes(cin, c, s if i == 0 else 1, t))
                cin = c
        backbone.features = nn.Sequential(*feats)
        self.backbone = backbone
        chs = [cfg.input_channel] + [c for t, c, n, s in cfg.setting
                                     for _ in range(n)]
        c1, c2, c3, c4, c5 = (chs[i] for i in cfg.fpn_selected)
        d = cfg.head_dim
        self.block15 = OBlockA(c4, c5, d, d, upscale=False)
        self.block16 = OBlockB(2 * d, d)
        self.block17 = OBlockA(c3, d, d, d)
        self.block18 = OBlockB(2 * d, d)
        self.block19 = OBlockA(c2, d, d, d)
        self.block20 = OBlockB(2 * d, d)
        self.block21 = OBlockA(c1, d, d, d)
        self.block22 = OBlockB(2 * d, d)
        self.block23 = OBlockC(d, cfg.out_ch)

    def forward(self, x):
        feats = {}
        for i, f in enumerate(self.backbone.features):
            x = f(x)
            if i in self.cfg.fpn_selected:
                feats[i] = x
        c1, c2, c3, c4, c5 = (feats[i] for i in self.cfg.fpn_selected)
        x = self.block16(self.block15(c4, c5))
        x = self.block18(self.block17(c3, x))
        x = self.block20(self.block19(c2, x))
        x = self.block22(self.block21(c1, x))
        x = self.block23(x)
        return x[:, 7:]


TINY = MLSDConfig(input_channel=8,
                  setting=((1, 8, 1, 1), (6, 8, 2, 2), (6, 8, 3, 2),
                           (6, 16, 4, 2), (6, 16, 3, 1)),
                  head_dim=8)


def _strip_bn_tracking(sd):
    return {k: v for k, v in sd.items()
            if not k.endswith("num_batches_tracked")}


def test_mlsd_net_parity():
    torch.manual_seed(0)
    oracle = OracleMLSD(TINY).eval()
    # randomize BN stats so the BN path is actually exercised
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    sd = _strip_bn_tracking(
        {k: v.numpy() for k, v in oracle.state_dict().items()})

    model = MobileV2MLSDLarge(TINY)
    tmpl = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.zeros((1, 64, 64, 4)))["params"]
    params, missing, unused = CK.build_flax_params(tmpl, sd, prefix="")
    assert not missing, missing
    assert not unused, unused

    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (1, 64, 64, 4)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == (1, 32, 32, 9)
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               atol=5e-5, rtol=5e-5)


def test_decode_lines_synthetic():
    h = w = 64
    tp = np.zeros((h, w, 9), np.float32)
    tp[:, :, 0] = -10.0  # sigmoid ~ 0
    # one strong center at (y=20, x=30) with a 30px-long segment
    tp[20, 30, 0] = 10.0
    tp[20, 30, 1:5] = [-12.0, -5.0, 12.0, 5.0]
    segs = decode_lines(tp, score_thr=0.1, dist_thr=20.0)
    assert segs.shape == (1, 4)
    np.testing.assert_allclose(segs[0], [18.0, 15.0, 42.0, 25.0])
    # below distance threshold -> dropped
    tp[20, 30, 1:5] = [-2.0, 0.0, 2.0, 0.0]
    assert decode_lines(tp, 0.1, 20.0).shape == (0, 4)


def test_mlsd_annotator_end_to_end(tmp_path):
    from cremage_tpu.services.annotators import annotate

    torch.manual_seed(2)
    oracle = OracleMLSD(TINY).eval()
    path = str(tmp_path / "mlsd_large_512_fp32.pth")
    torch.save(oracle.state_dict(), path)
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (100, 80, 3), np.uint8)
    out = annotate("mlsd", img, weights_path=path, cfg=TINY, input_size=64)
    assert out.shape == (100, 80, 3) and out.dtype == np.uint8
