"""FILM net differential test: a compact torch oracle of the reference
semantics (modules/frame_interpolation_pytorch/: cascaded extractor,
shared+specialized residual flow, fusion decoder) in the exact torch
export key layout drives random-weight parity, and the pair
interpolator is checked end to end from a saved .pt.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.services.film_net import (
    FilmConfig, FilmNet, FilmPairInterpolator, load_film_interpolator, warp,
)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def oconv(cin, cout, size, act=True):
    conv = nn.Conv2d(cin, cout, size,
                     padding=size // 2 if size % 2 else 0)
    seq = nn.Sequential(conv)
    seq._size = size
    seq._act = act
    return seq


def run_oconv(seq, x):
    if seq._size % 2 == 0:
        x = F.pad(x, (0, 1, 0, 1))
    y = seq[0](x)
    return F.leaky_relu(y, 0.2) if seq._act else y


def owarp(image, flow):
    # out[y, x] = bilinear(image, y + flow[:,1], x + flow[:,0]), border
    b, c, h, w = image.shape
    gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                            torch.arange(w, dtype=torch.float32),
                            indexing="ij")
    xs = gx[None] + flow[:, 0]
    ys = gy[None] + flow[:, 1]
    grid = torch.stack([(xs + 0.5) / w * 2 - 1, (ys + 0.5) / h * 2 - 1], -1)
    return F.grid_sample(image, grid, mode="bilinear",
                         padding_mode="border", align_corners=False)


class OFlowEstimator(nn.Module):
    def __init__(self, cin, num_convs, num_filters):
        super().__init__()
        convs = []
        for _ in range(num_convs):
            convs.append(oconv(cin, num_filters, 3))
            cin = num_filters
        convs.append(oconv(cin, num_filters // 2, 1))
        convs.append(oconv(num_filters // 2, 2, 1, act=False))
        self._convs = nn.ModuleList(convs)

    def forward(self, a, b):
        net = torch.cat([a, b], 1)
        for c in self._convs:
            net = run_oconv(c, net)
        return net


class OracleFilm(nn.Module):
    def __init__(self, cfg: FilmConfig):
        super().__init__()
        self.cfg = cfg
        f = cfg.filters
        # extractor: shared subtree convs
        ext = nn.Module()
        sub = nn.Module()
        convs = []
        cin = 3
        for i in range(cfg.sub_levels):
            pair = nn.Sequential(oconv(cin, f << i, 3),
                                 oconv(f << i, f << i, 3))
            convs.append(pair)
            cin = f << i
        sub.convs = nn.ModuleList(convs)
        ext.extract_sublevels = sub
        self.extract = ext
        # flow predictors
        n = len(cfg.flow_convs)
        cin = f << 1
        preds = []
        for i in range(n):
            preds.append(OFlowEstimator(cin, cfg.flow_convs[i],
                                        cfg.flow_filters[i]))
            cin += f << (i + 2)
        pf = nn.Module()
        pf._predictor = preds[-1]
        pf._predictors = nn.ModuleList(preds[:-1][::-1])
        self.predict_flow = pf
        # fusion
        def ch_at(level):
            return (sum(f << i for i in range(level)) + 3 + 2) * 2

        fuse = nn.Module()
        cin = ch_at(cfg.sub_levels)
        increase = 0
        fconvs = []
        for i in range(cfg.sub_levels)[::-1]:
            nf = (f << i) if i < cfg.specialized_levels else \
                (f << cfg.specialized_levels)
            fconvs.append(nn.ModuleList([
                oconv(cin, nf, 2, act=False),
                oconv(cin + (increase or nf), nf, 3),
                oconv(nf, nf, 3)]))
            cin = nf
            increase = ch_at(i) - nf // 2
        fuse.convs = nn.ModuleList(fconvs)
        fuse.output_conv = nn.Conv2d(cfg.filters, 3, 1)
        self.fuse = fuse

    def extract_features(self, pyramid):
        cfg = self.cfg
        subs = []
        for i, img in enumerate(pyramid):
            n = min(len(pyramid) - i, cfg.sub_levels)
            head = img
            sp = []
            for j, pair in enumerate(self.extract.extract_sublevels.convs):
                if j >= n:
                    break
                head = run_oconv(pair[1], run_oconv(pair[0], head))
                sp.append(head)
                if j < n - 1:
                    head = F.avg_pool2d(head, 2, 2)
            subs.append(sp)
        feats = []
        for i in range(len(pyramid)):
            x = subs[i][0]
            for j in range(1, cfg.sub_levels):
                if j <= i:
                    x = torch.cat([x, subs[i - j][j]], 1)
            feats.append(x)
        return feats

    def residual_flows(self, fa, fb):
        pf = self.predict_flow
        levels = len(fa)
        nsp = len(pf._predictors)
        v = pf._predictor(fa[-1], fb[-1])
        residuals = [v]
        for i in range(levels - 2, nsp - 1, -1):
            v = F.interpolate(2 * v, size=fa[i].shape[2:4], mode="bilinear")
            vr = pf._predictor(fa[i], owarp(fb[i], v))
            residuals.insert(0, vr)
            v = vr + v
        for k, pred in enumerate(pf._predictors):
            i = nsp - 1 - k
            v = F.interpolate(2 * v, size=fa[i].shape[2:4], mode="bilinear")
            vr = pred(fa[i], owarp(fb[i], v))
            residuals.insert(0, vr)
            v = vr + v
        return residuals

    def forward(self, x0, x1, t):
        cfg = self.cfg
        def pyr(img):
            p = [img]
            for _ in range(cfg.pyramid_levels - 1):
                p.append(F.avg_pool2d(p[-1], 2, 2))
            return p

        p0, p1 = pyr(x0), pyr(x1)
        f0 = self.extract_features(p0)
        f1 = self.extract_features(p1)

        def synth(res):
            flow = res[-1]
            flows = [flow]
            for r in res[:-1][::-1]:
                flow = r + F.interpolate(2 * flow, size=r.shape[2:4],
                                         mode="bilinear")
                flows.insert(0, flow)
            return flows[: cfg.fusion_pyramid_levels]

        fwd = synth(self.residual_flows(f0, f1))
        bwd = synth(self.residual_flows(f1, f0))
        bwd = [f * t for f in bwd]
        fwd = [f * (1 - t) for f in fwd]
        k = cfg.fusion_pyramid_levels
        w0 = [torch.cat([p0[i], f0[i]], 1) for i in range(k)]
        w1 = [torch.cat([p1[i], f1[i]], 1) for i in range(k)]
        fw = [owarp(w0[i], bwd[i]) for i in range(k)]
        bw = [owarp(w1[i], fwd[i]) for i in range(k)]
        aligned = [torch.cat([fw[i], bw[i], bwd[i], fwd[i]], 1)
                   for i in range(k)]
        net = aligned[-1]
        for kk, layers in enumerate(self.fuse.convs):
            i = len(self.fuse.convs) - 1 - kk
            net = F.interpolate(net, size=aligned[i].shape[2:4],
                                mode="nearest")
            net = run_oconv(layers[0], net)
            net = torch.cat([aligned[i], net], 1)
            net = run_oconv(layers[2], run_oconv(layers[1], net))
        return self.fuse.output_conv(net)


# fusion_pyramid_levels must equal sub_levels + 1 (reference invariant:
# Fusion(n_layers=sub_levels) decodes fusion_pyramid_levels-1 levels)
TINY = FilmConfig(pyramid_levels=6, fusion_pyramid_levels=5,
                  specialized_levels=3, sub_levels=4, filters=4,
                  flow_convs=(2, 2, 2, 2), flow_filters=(4, 8, 8, 16))


def test_warp_matches_grid_sample():
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 1, (2, 8, 10, 3)).astype(np.float32)
    flow = rng.uniform(-2, 2, (2, 8, 10, 2)).astype(np.float32)
    got = np.asarray(warp(jnp.asarray(img), jnp.asarray(flow)))
    want = owarp(torch.tensor(img.transpose(0, 3, 1, 2)),
                 torch.tensor(flow.transpose(0, 3, 1, 2))
                 ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_film_net_parity():
    torch.manual_seed(0)
    oracle = OracleFilm(TINY).eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

    model = FilmNet(TINY)
    x = jnp.zeros((1, 64, 64, 3))
    tmpl = jax.eval_shape(model.init, jax.random.key(0), x, x, 0.5)["params"]
    params, missing, unused = CK.build_flax_params(tmpl, sd, prefix="")
    assert not missing, missing
    assert not unused, unused

    rng = np.random.RandomState(1)
    a = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    for t in (0.5, 0.25):
        with torch.no_grad():
            want = oracle(torch.tensor(a.transpose(0, 3, 1, 2)),
                          torch.tensor(b.transpose(0, 3, 1, 2)),
                          t).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(model.apply({"params": params}, jnp.asarray(a),
                                     jnp.asarray(b), t))
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)


def test_pair_interpolator_end_to_end(tmp_path):
    torch.manual_seed(2)
    oracle = OracleFilm(TINY).eval()
    path = str(tmp_path / "film_net.pt")
    torch.save(oracle.state_dict(), path)
    interp = load_film_interpolator(path, TINY)
    rng = np.random.RandomState(3)
    f0 = rng.uniform(0, 1, (40, 52, 3)).astype(np.float32)  # pads to /16
    f1 = rng.uniform(0, 1, (40, 52, 3)).astype(np.float32)
    mid = interp(f0, f1, 0.5)
    assert mid.shape == (40, 52, 3)
    assert mid.min() >= 0.0 and mid.max() <= 1.0
