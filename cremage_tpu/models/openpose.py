"""OpenPose body-pose annotator (Flax net + host post-processing).

Behavior contract: reference `modules/annotator/openpose/` (CMU
body_pose_model as repacked by ControlNet):
- net (`model.py bodypose_model`): VGG-style trunk (block0) then six
  two-branch stages — L1 regresses 38 part-affinity-field channels, L2
  19 keypoint heatmaps; each stage >=2 consumes cat(L1, L2, trunk);
- inference (`body.py Body.__call__`): BGR input scaled to
  0.5*368/H, right/down padded to /8 with value 128, x/256-0.5;
  stage-6 maps bicubic-resized back to image size; peaks from
  sigma-3 gaussian-smoothed heatmaps (4-neighbour argmax > 0.1); limb
  scoring by PAF line integrals (10 samples, threshold 0.05 on 80% of
  samples + distance prior); greedy connection + subset assembly with
  merge, dropping subsets with <4 parts or score/parts < 0.4;
- rendering (`util.py draw_bodypose`): stick figures (ellipse polys,
  0.6 alpha) + keypoint circles in the canonical 18-color palette on a
  black canvas.

Checkpoint keys are the flat caffe-transfer names (`util.py transfer`
strips the branch prefix: conv1_1.weight ... Mconv7_stage6_L2.bias),
and the Flax module names match them directly.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.dpt import PlainConv


@dataclasses.dataclass(frozen=True)
class BodyConfig:
    c0: int = 64          # VGG base width
    paf_ch: int = 38
    heat_ch: int = 19
    stages: int = 6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32


class BodyPoseModel(nn.Module):
    """(B, H, W, 3) (x/256 - 0.5, BGR) -> (paf (B,h,w,38), heat (B,h,w,19))
    at stride 8."""

    cfg: BodyConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        c0 = cfg.c0

        def conv(name, ch, k=3, relu=True):
            def run(h):
                h = PlainConv(ch, k, 1, k // 2, name=name, **dd)(h)
                return jax.nn.relu(h) if relu else h
            return run

        def pool(h):
            return nn.max_pool(h, (2, 2), strides=(2, 2))

        h = conv("conv1_1", c0)(x.astype(cfg.dtype))
        h = conv("conv1_2", c0)(h)
        h = pool(h)
        h = conv("conv2_1", 2 * c0)(h)
        h = conv("conv2_2", 2 * c0)(h)
        h = pool(h)
        for i in range(1, 5):
            h = conv(f"conv3_{i}", 4 * c0)(h)
        h = pool(h)
        h = conv("conv4_1", 8 * c0)(h)
        h = conv("conv4_2", 8 * c0)(h)
        h = conv("conv4_3_CPM", 4 * c0)(h)
        trunk = conv("conv4_4_CPM", 2 * c0)(h)

        # stage 1
        def stage1(branch, out_ch):
            h = trunk
            for i in range(1, 4):
                h = conv(f"conv5_{i}_CPM_L{branch}", 2 * c0)(h)
            h = conv(f"conv5_4_CPM_L{branch}", 8 * c0, k=1)(h)
            return conv(f"conv5_5_CPM_L{branch}", out_ch, k=1, relu=False)(h)

        paf = stage1(1, cfg.paf_ch)
        heat = stage1(2, cfg.heat_ch)

        for s in range(2, cfg.stages + 1):
            inp = jnp.concatenate([paf, heat, trunk], axis=-1)

            def stage_n(branch, out_ch):
                h = inp
                for i in range(1, 6):
                    h = conv(f"Mconv{i}_stage{s}_L{branch}", 2 * c0, k=7)(h)
                h = conv(f"Mconv6_stage{s}_L{branch}", 2 * c0, k=1)(h)
                return conv(f"Mconv7_stage{s}_L{branch}", out_ch, k=1,
                            relu=False)(h)

            paf = stage_n(1, cfg.paf_ch)
            heat = stage_n(2, cfg.heat_ch)
        return paf, heat


# ---------------------------------------------------------------------------
# host post-processing (Body.__call__ semantics)
# ---------------------------------------------------------------------------

LIMB_SEQ = [[2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
            [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
            [1, 16], [16, 18], [3, 17], [6, 18]]
MAP_IDX = [[31, 32], [39, 40], [33, 34], [35, 36], [41, 42], [43, 44],
           [19, 20], [21, 22], [23, 24], [25, 26], [27, 28], [29, 30],
           [47, 48], [49, 50], [53, 54], [51, 52], [55, 56], [37, 38],
           [45, 46]]
COLORS = [[255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0],
          [170, 255, 0], [85, 255, 0], [0, 255, 0], [0, 255, 85],
          [0, 255, 170], [0, 255, 255], [0, 170, 255], [0, 85, 255],
          [0, 0, 255], [85, 0, 255], [170, 0, 255], [255, 0, 255],
          [255, 0, 170], [255, 0, 85]]


def find_peaks(heatmap_avg: np.ndarray, thre1: float = 0.1) -> List[List]:
    """Per-part peak lists [(x, y, score, id), ...] from (H, W, 19)."""
    from scipy.ndimage import gaussian_filter

    all_peaks = []
    peak_counter = 0
    for part in range(18):
        map_ori = heatmap_avg[:, :, part]
        one = gaussian_filter(map_ori, sigma=3)
        left = np.zeros_like(one)
        left[1:, :] = one[:-1, :]
        right = np.zeros_like(one)
        right[:-1, :] = one[1:, :]
        up = np.zeros_like(one)
        up[:, 1:] = one[:, :-1]
        down = np.zeros_like(one)
        down[:, :-1] = one[:, 1:]
        binary = np.logical_and.reduce(
            (one >= left, one >= right, one >= up, one >= down, one > thre1))
        peaks = list(zip(np.nonzero(binary)[1], np.nonzero(binary)[0]))
        with_score = [x + (map_ori[x[1], x[0]],) for x in peaks]
        ids = range(peak_counter, peak_counter + len(peaks))
        all_peaks.append([with_score[i] + (ids[i],)
                          for i in range(len(with_score))])
        peak_counter += len(peaks)
    return all_peaks


def assemble_limbs(all_peaks, paf_avg: np.ndarray, img_h: int,
                   thre2: float = 0.05):
    """PAF line-integral limb scoring + greedy subset assembly.
    Returns (candidate (N,4), subset (M,20))."""
    connection_all = []
    special_k = []
    mid_num = 10
    for k in range(len(MAP_IDX)):
        score_mid = paf_avg[:, :, [x - 19 for x in MAP_IDX[k]]]
        candA = all_peaks[LIMB_SEQ[k][0] - 1]
        candB = all_peaks[LIMB_SEQ[k][1] - 1]
        if not candA or not candB:
            special_k.append(k)
            connection_all.append([])
            continue
        cand = []
        for i, a in enumerate(candA):
            for j, b in enumerate(candB):
                vec = np.subtract(b[:2], a[:2]).astype(np.float64)
                norm = max(0.001, math.hypot(vec[0], vec[1]))
                vec = vec / norm
                pts = list(zip(np.linspace(a[0], b[0], num=mid_num),
                               np.linspace(a[1], b[1], num=mid_num)))
                vx = np.array([score_mid[int(round(p[1])), int(round(p[0])), 0]
                               for p in pts])
                vy = np.array([score_mid[int(round(p[1])), int(round(p[0])), 1]
                               for p in pts])
                mids = vx * vec[0] + vy * vec[1]
                score = mids.sum() / len(mids) + min(
                    0.5 * img_h / norm - 1, 0)
                if (np.count_nonzero(mids > thre2) > 0.8 * len(mids)
                        and score > 0):
                    cand.append([i, j, score, score + a[2] + b[2]])
        cand.sort(key=lambda x: x[2], reverse=True)
        connection = np.zeros((0, 5))
        for i, j, s, _ in cand:
            if i not in connection[:, 3] and j not in connection[:, 4]:
                connection = np.vstack(
                    [connection, [candA[i][3], candB[j][3], s, i, j]])
                if len(connection) >= min(len(candA), len(candB)):
                    break
        connection_all.append(connection)

    subset = -1 * np.ones((0, 20))
    candidate = np.array([p for peaks in all_peaks for p in peaks])
    for k in range(len(MAP_IDX)):
        if k in special_k:
            continue
        partAs = connection_all[k][:, 0]
        partBs = connection_all[k][:, 1]
        indexA, indexB = np.array(LIMB_SEQ[k]) - 1
        for i in range(len(connection_all[k])):
            found = 0
            subset_idx = [-1, -1]
            for j in range(len(subset)):
                if subset[j][indexA] == partAs[i] or \
                        subset[j][indexB] == partBs[i]:
                    subset_idx[found] = j
                    found += 1
            if found == 1:
                j = subset_idx[0]
                if subset[j][indexB] != partBs[i]:
                    subset[j][indexB] = partBs[i]
                    subset[j][-1] += 1
                    subset[j][-2] += (candidate[partBs[i].astype(int), 2]
                                      + connection_all[k][i][2])
            elif found == 2:
                j1, j2 = subset_idx
                membership = ((subset[j1] >= 0).astype(int)
                              + (subset[j2] >= 0).astype(int))[:-2]
                if not np.count_nonzero(membership == 2):
                    subset[j1][:-2] += subset[j2][:-2] + 1
                    subset[j1][-2:] += subset[j2][-2:]
                    subset[j1][-2] += connection_all[k][i][2]
                    subset = np.delete(subset, j2, 0)
                else:
                    subset[j1][indexB] = partBs[i]
                    subset[j1][-1] += 1
                    subset[j1][-2] += (candidate[partBs[i].astype(int), 2]
                                      + connection_all[k][i][2])
            elif not found and k < 17:
                row = -1 * np.ones(20)
                row[indexA] = partAs[i]
                row[indexB] = partBs[i]
                row[-1] = 2
                row[-2] = (sum(candidate[
                    connection_all[k][i, :2].astype(int), 2])
                    + connection_all[k][i][2])
                subset = np.vstack([subset, row])
    keep = [i for i in range(len(subset))
            if subset[i][-1] >= 4 and subset[i][-2] / subset[i][-1] >= 0.4]
    return candidate, subset[keep]


def draw_bodypose(canvas: np.ndarray, candidate, subset) -> np.ndarray:
    """Skeleton rendering (util.py draw_bodypose semantics)."""
    import cv2

    stickwidth = 4
    for i in range(17):
        for n in range(len(subset)):
            index = subset[n][np.array(LIMB_SEQ[i]) - 1]
            if -1 in index:
                continue
            cur = canvas.copy()
            Y = candidate[index.astype(int), 0]
            X = candidate[index.astype(int), 1]
            mX, mY = np.mean(X), np.mean(Y)
            length = math.hypot(X[0] - X[1], Y[0] - Y[1])
            angle = math.degrees(math.atan2(X[0] - X[1], Y[0] - Y[1]))
            poly = cv2.ellipse2Poly((int(mY), int(mX)),
                                    (int(length / 2), stickwidth),
                                    int(angle), 0, 360, 1)
            cv2.fillConvexPoly(cur, poly, COLORS[i])
            canvas = cv2.addWeighted(canvas, 0.4, cur, 0.6, 0)
    for i in range(18):
        for n in range(len(subset)):
            index = int(subset[n][i])
            if index == -1:
                continue
            x, y = candidate[index][0:2]
            cv2.circle(canvas, (int(x), int(y)), 4, COLORS[i], thickness=-1)
    return canvas


class BodyEstimator:
    """Full Body.__call__ chain on top of the Flax net."""

    def __init__(self, params, cfg: BodyConfig = BodyConfig()):
        self.cfg = cfg
        model = BodyPoseModel(cfg)
        self._apply = jax.jit(
            lambda p, x: model.apply({"params": p}, x))
        self.params = params

    def heatmaps(self, rgb_uint8: np.ndarray,
                 scale_search=(0.5,), boxsize: int = 368):
        """(H, W, 3) RGB uint8 -> (heatmap_avg (H,W,19), paf_avg (H,W,38))."""
        import cv2

        ori = rgb_uint8[:, :, ::-1].copy()  # net consumes BGR
        stride, pad_value = 8, 128
        heat_avg = np.zeros(ori.shape[:2] + (19,), np.float32)
        paf_avg = np.zeros(ori.shape[:2] + (38,), np.float32)
        mult = [s * boxsize / ori.shape[0] for s in scale_search]
        for scale in mult:
            img = cv2.resize(ori, (0, 0), fx=scale, fy=scale,
                             interpolation=cv2.INTER_CUBIC)
            h, w = img.shape[:2]
            pd = (stride - h % stride) % stride
            pr = (stride - w % stride) % stride
            padded = np.full((h + pd, w + pr, 3), pad_value, img.dtype)
            padded[:h, :w] = img
            x = padded.astype(np.float32) / 256.0 - 0.5
            paf, heat = self._apply(self.params, jnp.asarray(x[None]))
            paf = np.asarray(paf, np.float32)[0]
            heat = np.asarray(heat, np.float32)[0]

            def up(m):
                m = cv2.resize(m, (0, 0), fx=stride, fy=stride,
                               interpolation=cv2.INTER_CUBIC)
                m = m[:h, :w]
                return cv2.resize(m, (ori.shape[1], ori.shape[0]),
                                  interpolation=cv2.INTER_CUBIC)

            heat_avg += up(heat) / len(mult)
            paf_avg += up(paf) / len(mult)
        return heat_avg, paf_avg

    def __call__(self, rgb_uint8: np.ndarray) -> np.ndarray:
        heat, paf = self.heatmaps(rgb_uint8)
        peaks = find_peaks(heat)
        candidate, subset = assemble_limbs(peaks, paf, rgb_uint8.shape[0])
        canvas = np.zeros_like(rgb_uint8)
        return draw_bodypose(canvas, candidate, subset)
