"""CremageModelV6 differential test: compact torch oracle of the
reference unblur net (modules/unblur_face/cremage_model_v6.py + mha.py)
in the exact checkpoint key layout, random-weight parity vs the Flax
port, and load_unblur_model end to end from a saved container ckpt.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.models.unblur_v6 import (
    UnblurCremageModelV6, UnblurV6Config, _gn_groups,
    convert_unblur_state_dict, load_unblur_model,
)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


class OMHA(nn.Module):
    def __init__(self, embed, heads):
        super().__init__()
        self.h = heads
        self.queries = nn.Linear(embed, embed, bias=False)
        self.keys = nn.Linear(embed, embed, bias=False)
        self.values = nn.Linear(embed, embed, bias=False)
        self.out = nn.Linear(embed, embed)

    def forward(self, x):
        b, n, c = x.shape
        hd = c // self.h
        def split(t):
            return t.reshape(b, n, self.h, hd).transpose(1, 2)
        q, k, v = split(self.queries(x)), split(self.keys(x)), \
            split(self.values(x))
        a = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(hd), -1)
        o = (a @ v).transpose(1, 2).reshape(b, n, c)
        return self.out(o)


def spatial_mha(x, mha):
    b, c, h, w = x.shape
    t = mha(x.reshape(b, c, -1).transpose(1, 2))
    return t.transpose(1, 2).reshape(b, c, h, w)


class OSingle(nn.Module):
    def __init__(self, cin, cout, stride, transpose):
        super().__init__()
        self.transpose = transpose
        if transpose:
            if cin > cout:
                self.conv_skip = nn.ConvTranspose2d(cin, cout, 4, 2, 1,
                                                    bias=False)
                self.conv1 = nn.ConvTranspose2d(cin, cout, 4, 2, 1,
                                                bias=False)
            else:
                self.conv_skip = None
                self.conv1 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        else:
            self.conv_skip = (nn.Conv2d(cin, cout, 1, stride, bias=False)
                              if stride == 2 or cin != cout else None)
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        g = _gn_groups(cout)
        self.gn1 = nn.GroupNorm(g, cout)
        self.gn2 = nn.GroupNorm(g, cout)

    def forward(self, x):
        skip = x if self.conv_skip is None else self.conv_skip(x)
        h = F.silu(self.gn1(self.conv1(x)))
        h = self.gn2(self.conv2(h))
        return F.silu(h + skip)


class OStage(nn.Module):
    def __init__(self, cin, cout, stride, heads, transpose, num_blocks):
        super().__init__()
        blocks = [OSingle(cin, cout, stride, transpose)]
        for _ in range(num_blocks - 1):
            blocks.append(OSingle(cout, cout, 1, transpose))
        self.blocks = nn.ModuleList(blocks)
        self.attentions = nn.ModuleList(
            [OMHA(cout, heads)] if heads > 0 else [])

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        if self.attentions:
            x = spatial_mha(x, self.attentions[0])
        return x


class CAct(nn.Module):
    def __init__(self, cin, cout, k, s=1, p=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, p)

    def forward(self, x):
        return F.silu(self.conv(x))


class CTAct(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.ConvTranspose2d(cin, cout, 4, 2, 1)

    def forward(self, x):
        return F.silu(self.conv(x))


class OracleV6(nn.Module):
    def __init__(self, cfg: UnblurV6Config):
        super().__init__()
        d = cfg.down_channels
        hh = cfg.heads
        heads_down = (0, 0, 0, hh, hh, hh, hh)
        down = []
        cin = 3
        for i in range(7):
            down.append(OStage(cin, d[i], 2, heads_down[i], False,
                               cfg.num_blocks))
            cin = d[i]
        down.append(CAct(d[6], d[7], 2))
        self.down_blocks = nn.ModuleList(down)
        self.mid_blocks = nn.ModuleList([
            CAct(d[7], 2 * d[7], 1), OMHA(2 * d[7], hh),
            CAct(2 * d[7], d[7], 1)])
        hr = list(d[::-1])
        up = [CTAct(d[7], d[7] // 2)]
        prev = d[7] // 2
        heads_up = (0, hh, hh, hh, hh, 0, 0, 0)
        for i in range(1, 8):
            cin = prev + hr[i]
            cout = cin // 2
            up.append(OStage(cin, cout, 2, heads_up[i], True,
                             cfg.num_blocks))
            prev = cout
        up.append(nn.Conv2d(prev, 3, 3, 1, 1))
        self.up_blocks = nn.ModuleList(up)

    def forward(self, x):
        hs = []
        for b in self.down_blocks:
            x = b(x)
            hs.append(x)
        x = self.mid_blocks[0](x)
        x = spatial_mha(x, self.mid_blocks[1])
        x = self.mid_blocks[2](x)
        hr = hs[::-1]
        for i, b in enumerate(self.up_blocks):
            if 0 < i < len(self.up_blocks) - 1:
                x = torch.cat([x, hr[i]], 1)
            x = b(x)
        return x


TINY = UnblurV6Config(base=4, num_blocks=2, heads=2)


def test_unblur_v6_parity():
    torch.manual_seed(0)
    oracle = OracleV6(TINY).eval()
    sd = convert_unblur_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()})

    model = UnblurCremageModelV6(TINY)
    tmpl = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.zeros((1, 256, 256, 3)))["params"]
    params, missing, unused = CK.build_flax_params(tmpl, sd, prefix="")
    assert not missing, missing
    assert not unused, unused

    rng = np.random.RandomState(1)
    x = rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.tensor(x.transpose(0, 3, 1, 2))
                      ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_load_unblur_model_container(tmp_path):
    torch.manual_seed(2)
    oracle = OracleV6(TINY).eval()
    path = str(tmp_path / "unblur_v6.pt")
    torch.save({"model_state_dict": oracle.state_dict(),
                "epoch": 1}, path)
    infer = load_unblur_model(path, TINY)
    rng = np.random.RandomState(3)
    img = rng.uniform(0, 1, (256, 256, 3)).astype(np.float32)
    out = infer(img)
    assert out.shape == (256, 256, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
