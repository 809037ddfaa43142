"""Textual-inversion embedding loader.

Reference: `modules/cremage/utils/ml_utils.py:346 load_embedding` —
supports .pt (A1111 {'string_to_param': {'*': tensor}}), .bin
(diffusers {name: tensor}), and .safetensors; SDXL embeddings are dicts
with 'clip_l'/'clip_g' entries (generate_clip_embeddings_from_tokens.py
:100-104 picks 'clip_l')."""
from __future__ import annotations

from typing import Dict, Union

import numpy as np

from cremage_tpu.io.checkpoint import load_safetensors


def load_embedding(path: str) -> Union[np.ndarray, Dict[str, np.ndarray]]:
    """Returns (n_tokens, dim) float32 array, or a dict of them for SDXL
    dual-tower embeddings."""
    if path.endswith(".safetensors"):
        tensors = load_safetensors(path)
        return _normalize(tensors)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    return _normalize(obj)


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().float().numpy()
    arr = np.asarray(t, dtype=np.float32)
    if arr.ndim == 1:
        arr = arr[None, :]
    return arr


def _normalize(obj):
    if hasattr(obj, "detach") or isinstance(obj, np.ndarray):
        return _to_np(obj)
    if isinstance(obj, dict):
        # A1111 format
        if "string_to_param" in obj:
            params = obj["string_to_param"]
            key = "*" if "*" in params else next(iter(params))
            return _to_np(params[key])
        # SDXL dual-tower format
        lowered = {k.lower(): k for k in obj}
        if "clip_l" in lowered or "clip_g" in lowered:
            return {
                k.lower(): _to_np(v)
                for k, v in obj.items()
                if k.lower() in ("clip_l", "clip_g")
            }
        if "emb_params" in obj:
            return _to_np(obj["emb_params"])
        # diffusers .bin: single {placeholder: tensor}
        tensors = {k: v for k, v in obj.items()
                   if hasattr(v, "shape") and k != "name"}
        if len(tensors) == 1:
            return _to_np(next(iter(tensors.values())))
    raise ValueError(f"unrecognized embedding format: {type(obj)}")
