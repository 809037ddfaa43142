"""ArcFace IResNet tests: torch oracle (iresnet50 layout) differential
parity, Umeyama alignment sanity, ONNX initializer reader round-trip,
and the FaceEmbedder aligned-embedding path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.models.arcface import (
    ARCFACE_DST, FaceEmbedder, IResNet, IResNetConfig, align_face_112,
    arcface_state_dict_from_onnx, load_onnx_initializers,
    umeyama_similarity,
)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


class OIBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.prelu = nn.PReLU(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, stride, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = self.bn3(self.conv2(self.prelu(self.bn2(self.conv1(
            self.bn1(x))))))
        return h + idt


class OIResNet(nn.Module):
    def __init__(self, cfg: IResNetConfig):
        super().__init__()
        self.conv1 = nn.Conv2d(3, cfg.channels[0], 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cfg.channels[0])
        self.prelu = nn.PReLU(cfg.channels[0])
        cin = cfg.channels[0]
        for si, (n, c) in enumerate(zip(cfg.layers, cfg.channels)):
            blocks = []
            for bi in range(n):
                blocks.append(OIBasicBlock(cin, c, 2 if bi == 0 else 1))
                cin = c
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))
        self.bn2 = nn.BatchNorm2d(cin)
        self.fc = nn.Linear(cin * cfg.fc_hw * cfg.fc_hw, cfg.num_features)
        self.features = nn.BatchNorm1d(cfg.num_features)

    def forward(self, x):
        h = self.prelu(self.bn1(self.conv1(x)))
        for si in range(1, 5):
            h = getattr(self, f"layer{si}")(h)
        h = self.bn2(h)
        h = torch.flatten(h, 1)
        return self.features(self.fc(h))


TINY = IResNetConfig(layers=(1, 1, 1, 1), channels=(8, 8, 16, 16),
                     num_features=32, fc_hw=7)


def _randomized(oracle):
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
    return oracle


def test_iresnet_parity():
    torch.manual_seed(0)
    oracle = _randomized(OIResNet(TINY)).eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()
          if not k.endswith("num_batches_tracked")}

    model = IResNet(TINY)
    tmpl = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.zeros((1, 112, 112, 3)))["params"]
    params, missing, unused = CK.build_flax_params(tmpl, sd, prefix="")
    assert not missing, missing
    assert not unused, unused

    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)


def test_umeyama_alignment():
    # landmarks that ARE the template scaled+rotated+shifted must map back
    rng = np.random.RandomState(0)
    theta = 0.3
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    src = ARCFACE_DST @ R.T * 2.1 + np.array([40.0, 25.0])
    M = umeyama_similarity(src, ARCFACE_DST)
    mapped = src @ M[:, :2].T + M[:, 2]
    np.testing.assert_allclose(mapped, ARCFACE_DST, atol=1e-4)
    # warp runs and produces the right shape
    img = rng.uniform(0, 1, (256, 256, 3)).astype(np.float32)
    out = align_face_112(img, src)
    assert out.shape == (112, 112, 3)


def test_onnx_initializer_reader(tmp_path):
    from tests.test_sentencepiece import _field, _len_field, _varint

    def tensor(name, arr):
        arr = np.asarray(arr, np.float32)
        msg = b""
        for d in arr.shape:
            msg += _field(1, 0, _varint(d))
        msg += _field(2, 0, _varint(1))             # FLOAT
        msg += _len_field(8, name.encode())
        msg += _len_field(9, arr.tobytes())
        return _len_field(5, msg)                   # graph.initializer

    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.array([1.5, -2.5], np.float32)
    graph = tensor("conv1.weight", a) + tensor("bn1.bias", b)
    model = _len_field(7, graph)                    # model.graph
    path = tmp_path / "tiny.onnx"
    path.write_bytes(model)

    init = load_onnx_initializers(str(path))
    np.testing.assert_array_equal(init["conv1.weight"], a)
    np.testing.assert_array_equal(init["bn1.bias"], b)
    # torch-style names pass through arcface_state_dict_from_onnx
    sd = arcface_state_dict_from_onnx(str(path))
    assert "conv1.weight" in sd


def test_face_embedder_aligned_path():
    torch.manual_seed(2)
    oracle = _randomized(OIResNet(TINY)).eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    model = IResNet(TINY)
    tmpl = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.zeros((1, 112, 112, 3)))["params"]
    params, _, _ = CK.build_flax_params(tmpl, sd, prefix="")
    emb = FaceEmbedder(params, TINY)
    rng = np.random.RandomState(3)
    aligned = rng.uniform(0, 1, (112, 112, 3)).astype(np.float32)
    e = emb.embed_aligned(aligned)
    assert e.shape == (32,)
    np.testing.assert_allclose(np.linalg.norm(e), 1.0, atol=1e-5)
    # matches the torch oracle (normalized)
    with torch.no_grad():
        w = oracle(torch.tensor(
            (aligned[None] * 2 - 1).transpose(0, 3, 1, 2))).numpy()[0]
    w = w / np.linalg.norm(w)
    np.testing.assert_allclose(e, w, atol=5e-4)
