"""Model mixer: weighted checkpoint merge.

Reference: `tools/model_mixer.py` (NUM_MODELS=5, weighted ckpt merge) —
here a pure state-dict lerp: out[k] = sum_i w_i * sd_i[k] over keys
present in all inputs, with weights normalized when requested."""
from __future__ import annotations

from typing import Dict, List, Mapping, Sequence

import numpy as np


def mix_state_dicts(
    sds: Sequence[Mapping[str, np.ndarray]],
    weights: Sequence[float],
    normalize: bool = True,
) -> Dict[str, np.ndarray]:
    if len(sds) != len(weights) or not sds:
        raise ValueError("need equal, nonzero numbers of models and weights")
    w = np.asarray(weights, dtype=np.float64)
    if normalize:
        if w.sum() == 0:
            raise ValueError("weights sum to zero")
        w = w / w.sum()
    common = set(sds[0])
    for sd in sds[1:]:
        common &= set(sd)
    out = {}
    for k in common:
        shapes = {tuple(np.shape(sd[k])) for sd in sds}
        if len(shapes) > 1:
            # differing shapes (e.g. inpaint vs std conv_in): keep first
            out[k] = np.asarray(sds[0][k])
            continue
        acc = np.zeros_like(np.asarray(sds[0][k], dtype=np.float32))
        for wi, sd in zip(w, sds):
            acc += np.float32(wi) * np.asarray(sd[k], dtype=np.float32)
        out[k] = acc
    return out
