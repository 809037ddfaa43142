"""OpenPose tests.

Net: torch oracle in the flat caffe-transfer key layout (reference
modules/annotator/openpose/model.py geometry) drives a random-weight
differential test. Post-processing: synthetic heatmaps/PAFs with a
known two-person skeleton must reconstruct the right connections.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.models.openpose import (
    BodyConfig, BodyEstimator, BodyPoseModel, assemble_limbs, draw_bodypose,
    find_peaks,
)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


class OracleBody(nn.Module):
    """Flat-key torch oracle of bodypose_model (no branch prefixes,
    matching the checkpoint layout after util.transfer)."""

    def __init__(self, c0=64, paf=38, heat=19, stages=6):
        super().__init__()
        self.stages = stages
        specs = [("conv1_1", 3, c0, 3), ("conv1_2", c0, c0, 3),
                 ("conv2_1", c0, 2 * c0, 3), ("conv2_2", 2 * c0, 2 * c0, 3),
                 ("conv3_1", 2 * c0, 4 * c0, 3), ("conv3_2", 4 * c0, 4 * c0, 3),
                 ("conv3_3", 4 * c0, 4 * c0, 3), ("conv3_4", 4 * c0, 4 * c0, 3),
                 ("conv4_1", 4 * c0, 8 * c0, 3), ("conv4_2", 8 * c0, 8 * c0, 3),
                 ("conv4_3_CPM", 8 * c0, 4 * c0, 3),
                 ("conv4_4_CPM", 4 * c0, 2 * c0, 3)]
        for br, out in ((1, paf), (2, heat)):
            for i in range(1, 4):
                specs.append((f"conv5_{i}_CPM_L{br}", 2 * c0, 2 * c0, 3))
            specs.append((f"conv5_4_CPM_L{br}", 2 * c0, 8 * c0, 1))
            specs.append((f"conv5_5_CPM_L{br}", 8 * c0, out, 1))
        for s in range(2, stages + 1):
            for br, out in ((1, paf), (2, heat)):
                cin = paf + heat + 2 * c0
                for i in range(1, 6):
                    specs.append((f"Mconv{i}_stage{s}_L{br}", cin, 2 * c0, 7))
                    cin = 2 * c0
                specs.append((f"Mconv6_stage{s}_L{br}", 2 * c0, 2 * c0, 1))
                specs.append((f"Mconv7_stage{s}_L{br}", 2 * c0, out, 1))
        for name, cin, cout, k in specs:
            setattr(self, name, nn.Conv2d(cin, cout, k, padding=k // 2))

    def forward(self, x):
        r = F.relu

        def c(name, h, relu=True):
            h = getattr(self, name)(h)
            return r(h) if relu else h

        h = c("conv1_2", c("conv1_1", x))
        h = F.max_pool2d(h, 2)
        h = c("conv2_2", c("conv2_1", h))
        h = F.max_pool2d(h, 2)
        for i in range(1, 5):
            h = c(f"conv3_{i}", h)
        h = F.max_pool2d(h, 2)
        h = c("conv4_2", c("conv4_1", h))
        trunk = c("conv4_4_CPM", c("conv4_3_CPM", h))

        outs = []
        for br in (1, 2):
            h = trunk
            for i in range(1, 4):
                h = c(f"conv5_{i}_CPM_L{br}", h)
            h = c(f"conv5_4_CPM_L{br}", h)
            outs.append(c(f"conv5_5_CPM_L{br}", h, relu=False))
        paf, heat = outs
        for s in range(2, self.stages + 1):
            inp = torch.cat([paf, heat, trunk], 1)
            outs = []
            for br in (1, 2):
                h = inp
                for i in range(1, 6):
                    h = c(f"Mconv{i}_stage{s}_L{br}", h)
                h = c(f"Mconv6_stage{s}_L{br}", h)
                outs.append(c(f"Mconv7_stage{s}_L{br}", h, relu=False))
            paf, heat = outs
        return paf, heat


TINY = BodyConfig(c0=8, stages=3)


def test_bodypose_net_parity():
    torch.manual_seed(0)
    oracle = OracleBody(c0=8, stages=3).eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

    model = BodyPoseModel(TINY)
    tmpl = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.zeros((1, 32, 32, 3)))["params"]
    params, missing, unused = CK.build_flax_params(tmpl, sd, prefix="")
    assert not missing, missing
    assert not unused, unused

    rng = np.random.RandomState(1)
    x = rng.uniform(-0.5, 0.5, (1, 48, 32, 3)).astype(np.float32)
    with torch.no_grad():
        wp, wh = oracle(torch.tensor(x.transpose(0, 3, 1, 2)))
    gp, gh = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gp),
                               wp.numpy().transpose(0, 2, 3, 1),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(gh),
                               wh.numpy().transpose(0, 2, 3, 1),
                               atol=3e-5, rtol=3e-5)


def _synthetic_person(h, w, joints):
    """Build heatmaps/PAFs that encode a stick figure at the given
    18-joint coordinates (x, y)."""
    from cremage_tpu.models.openpose import LIMB_SEQ, MAP_IDX

    heat = np.zeros((h, w, 19), np.float32)
    paf = np.zeros((h, w, 38), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for part, (x, y) in enumerate(joints):
        if x is None:
            continue
        heat[:, :, part] += np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / 18.0)
    for k, (a, b) in enumerate(LIMB_SEQ):
        pa, pb = joints[a - 1], joints[b - 1]
        if pa[0] is None or pb[0] is None:
            continue
        vec = np.array([pb[0] - pa[0], pb[1] - pa[1]], np.float32)
        n = max(1e-3, math.hypot(*vec))
        vec = vec / n
        # paint the PAF along the limb segment (thick band)
        for t in np.linspace(0, 1, 32):
            cx = int(round(pa[0] + t * (pb[0] - pa[0])))
            cy = int(round(pa[1] + t * (pb[1] - pa[1])))
            sl = (slice(max(0, cy - 3), cy + 4), slice(max(0, cx - 3), cx + 4))
            paf[sl[0], sl[1], MAP_IDX[k][0] - 19] = vec[0]
            paf[sl[0], sl[1], MAP_IDX[k][1] - 19] = vec[1]
    return heat, paf


def test_postprocessing_reconstructs_skeleton():
    h = w = 128
    joints = [(64, 20), (64, 34), (48, 34), (40, 56), (36, 76), (80, 34),
              (88, 56), (92, 76), (54, 72), (52, 96), (52, 116), (74, 72),
              (76, 96), (76, 116), (60, 14), (68, 14), (54, 16), (74, 16)]
    heat, paf = _synthetic_person(h, w, joints)
    peaks = find_peaks(heat)
    n_peaks = sum(len(p) for p in peaks)
    assert n_peaks == 18
    candidate, subset = assemble_limbs(peaks, paf, h)
    assert len(subset) == 1                      # one person found
    assert subset[0][-1] >= 16                   # nearly all parts linked
    canvas = draw_bodypose(np.zeros((h, w, 3), np.uint8), candidate, subset)
    assert canvas.any()
    # joints drawn at the right places: neck circle near (64, 34)
    assert canvas[34, 64].any()


def test_openpose_annotator_end_to_end(tmp_path):
    from cremage_tpu.services.annotators import annotate

    torch.manual_seed(2)
    oracle = OracleBody(c0=8, stages=3).eval()
    path = str(tmp_path / "body_pose_model.pth")
    torch.save(oracle.state_dict(), path)
    # patch the cache to build the tiny config (c0 inferred from ckpt)
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (96, 80, 3), np.uint8)
    out = annotate("openpose", img, weights_path=path)
    assert out.shape == (96, 80, 3) and out.dtype == np.uint8
