"""LPIPS metric: differential parity vs an inline torch reference
implementation of lpips v0.1 math (random weights), plus behavioral
sanity. The torch reference mirrors the official lpips package
(richzhang/PerceptualSimilarity lpips/lpips.py) computation exactly:
scaling layer, trunk taps, channel unit-normalize, squared diff,
1x1 lin heads, spatial average, sum."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.services.lpips import (
    LPIPS, LPIPSModel, merge_lpips_state_dict,
)

SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def torch_alex_features():
    # torchvision AlexNet .features (indices match torchvision keys)
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(),            # 0,1
        tnn.MaxPool2d(3, 2),                                 # 2
        tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(),            # 3,4
        tnn.MaxPool2d(3, 2),                                 # 5
        tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(),           # 6,7
        tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(),           # 8,9
        tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(),           # 10,11
        tnn.MaxPool2d(3, 2),                                 # 12
    )


VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]


def torch_vgg_features():
    layers, in_ch = [], 3
    for v in VGG_CFG:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_ch, v, 3, 1, 1), tnn.ReLU()]
            in_ch = v
    return tnn.Sequential(*layers)


TAPS = {"alex": (1, 4, 7, 9, 11), "vgg": (3, 8, 15, 22, 29)}
CHANS = {"alex": (64, 192, 384, 256, 256), "vgg": (64, 128, 256, 512, 512)}


def torch_lpips(features, taps, lins, x0, x1):
    def run(x):
        x = (x - SHIFT) / SCALE
        outs = []
        for i, layer in enumerate(features):
            x = layer(x)
            if i in taps:
                outs.append(x)
        return outs

    def unit(x):
        return x / (x.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)

    total = 0.0
    for (a, b), lin in zip(zip(run(x0), run(x1)), lins):
        d = (unit(a) - unit(b)).pow(2)
        total = total + lin(d).mean(dim=(2, 3))
    return total[:, 0]


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_lpips_matches_torch_reference(net):
    torch.manual_seed(0)
    features = (torch_alex_features if net == "alex"
                else torch_vgg_features)()
    lins = [tnn.Conv2d(c, 1, 1, bias=False) for c in CHANS[net]]
    for lin in lins:
        with torch.no_grad():
            lin.weight.abs_()

    x0 = torch.rand(2, 3, 64, 64) * 2 - 1
    x1 = torch.rand(2, 3, 64, 64) * 2 - 1
    with torch.no_grad():
        want = torch_lpips(features, TAPS[net], lins, x0, x1).numpy()

    trunk_sd = {f"features.{k}": v.numpy()
                for k, v in features.state_dict().items()}
    lin_sd = {f"lin{i}.model.1.weight": lin.weight.detach().numpy()
              for i, lin in enumerate(lins)}
    sd = merge_lpips_state_dict(trunk_sd, lin_sd)

    import jax
    import jax.numpy as jnp
    model = LPIPSModel(net=net)
    tmpl = jax.eval_shape(
        model.init, jax.random.key(0),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
    )["params"]
    params, missing, unused = CK.build_flax_params(tmpl, sd, prefix="")
    assert not missing and not unused

    got = LPIPSModel(net=net).apply(
        {"params": params},
        jnp.asarray(x0.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(x1.permute(0, 2, 3, 1).numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_lpips_zero_for_identical_and_monotone_in_noise():
    m = LPIPS.random(net="alex", seed=1)
    rng = np.random.default_rng(0)
    img = rng.random((48, 48, 3)).astype(np.float32)
    d_same = m(img, img)[0]
    assert d_same < 1e-6
    d_small = m(img, np.clip(img + 0.05 * rng.standard_normal(img.shape), 0, 1))[0]
    d_big = m(img, np.clip(img + 0.5 * rng.standard_normal(img.shape), 0, 1))[0]
    assert d_same <= d_small <= d_big


def test_lpips_load_from_files(tmp_path):
    torch.manual_seed(1)
    features = torch_alex_features()
    trunk_sd = {f"features.{k}": v.numpy().astype(np.float32)
                for k, v in features.state_dict().items()}
    trunk_p = str(tmp_path / "trunk.safetensors")
    CK.save_safetensors(trunk_p, trunk_sd)
    m = LPIPS.load(trunk_path=trunk_p, net="alex")  # uncalibrated heads
    rng = np.random.default_rng(2)
    a = rng.random((32, 32, 3)).astype(np.float32)
    b = rng.random((32, 32, 3)).astype(np.float32)
    assert m(a, b)[0] > 0
    assert m(a, a)[0] < 1e-6
