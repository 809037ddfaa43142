"""Export Flax params back to ldm-format torch checkpoints.

The inverse of io/checkpoint.build_flax_params: walks a Flax param tree,
reconstructs the dotted ldm key for each leaf (module names were chosen
to flatten to the checkpoint key strings — see models/layers.py header),
and inverts the shape-directed tensor conversion (HWIO -> OIHW, Dense
(in,out) -> torch (out,in)).

Used by:
- the real-checkpoint parity harness (tools/parity_lpips.py) test path,
  which round-trips a random tiny model through a real safetensors file;
- "save merged checkpoint" (reference: LoRA/TI merges are runtime-only;
  exporting the merged weights to a single ldm .safetensors is the
  portable equivalent — usable by A1111/diffusers converters).
"""
from __future__ import annotations

import re
from typing import Dict, Mapping, Optional

import numpy as np

from cremage_tpu.io import checkpoint as CK

# taming VQ/KL VAE mid-block names keep their underscored digits
# (first_stage_model.decoder.mid.block_1.*), unlike every other _N.
_MID = re.compile(r"^mid_(block_[12]|attn_1)$")
_DIGIT = re.compile(r"_(\d+)(?=[._]|$)")
_AFTER_DIGIT = re.compile(r"(?<=\d)_(?=[A-Za-z])")


def _component_to_dotted(c: str) -> str:
    """torch Sequential indices act as dotted separators on both sides:
    net_0_proj -> net.0.proj, input_blocks_1_1 -> input_blocks.1.1.
    Word-internal digits (norm1, attn2, fc1) are untouched."""
    m = _MID.match(c)
    if m:
        return "mid." + m.group(1)
    return _AFTER_DIGIT.sub(".", _DIGIT.sub(r".\1", c))


def invert_tensor(arr: np.ndarray, key: str) -> np.ndarray:
    """Flax layout -> torch checkpoint layout (inverse of
    checkpoint.convert_tensor for the same final ckpt key)."""
    arr = np.asarray(arr)
    if arr.ndim == 4:  # HWIO -> OIHW
        return arr.transpose(3, 2, 0, 1)
    if arr.ndim == 2:
        if any(m in key for m in CK._NO_TRANSPOSE_MARKERS):
            return arr
        return arr.T
    return arr


def export_params(
    params: Mapping, prefix: str = "", dtype=np.float32
) -> Dict[str, np.ndarray]:
    """Generic tree -> state dict with reconstructed dotted keys."""
    out: Dict[str, np.ndarray] = {}
    for path, leaf in CK._flatten_params(params):
        key = prefix + ".".join(_component_to_dotted(c) for c in path)
        # safetensors serializes raw memory: transposed views must be
        # made C-contiguous or the bytes land in the original order.
        out[key] = np.ascontiguousarray(
            invert_tensor(np.asarray(leaf), key).astype(dtype))
    return out


_CLIP_RENAMES = [
    ("mlp_fc1.", "mlp.fc1."),
    ("mlp_fc2.", "mlp.fc2."),
]


def _clip_ldm_key(path, prefix: str) -> str:
    key = ".".join(_component_to_dotted(c) for c in path)
    if key == "token_embedding":
        key = "embeddings.token_embedding.weight"
    elif key == "position_embedding":
        key = "embeddings.position_embedding.weight"
    elif key.startswith("layers."):
        key = "encoder." + key
    for a, b in _CLIP_RENAMES:
        key = key.replace(a, b)
    return prefix + key


def export_keys(template, prefix: str = "") -> list:
    """The ldm key universe export_params would emit, computed from a
    template tree alone (ShapeDtypeStruct leaves fine — nothing is
    materialized).  Diffed against the reference's canonical
    SD15_WEIGHT_LIST in tests/test_reference_keylists.py."""
    return [prefix + ".".join(_component_to_dotted(c) for c in path)
            for path, _ in CK._flatten_params(template)]


def export_clip_text_keys(template, prefix: str = CK.PREFIX_CLIP_SD15) -> list:
    """Key universe of export_clip_text from a template tree alone."""
    return [_clip_ldm_key(path, prefix)
            for path, _ in CK._flatten_params(template)]


def export_clip_text(
    params: Mapping, prefix: str = CK.PREFIX_CLIP_SD15, dtype=np.float32
) -> Dict[str, np.ndarray]:
    """CLIPTextModel params -> HF-style ldm keys (inverse of
    checkpoint.clip_text_subdict)."""
    out: Dict[str, np.ndarray] = {}
    for path, leaf in CK._flatten_params(params):
        key = _clip_ldm_key(path, prefix)
        out[key] = np.ascontiguousarray(
            invert_tensor(np.asarray(leaf), key).astype(dtype))
    return out


def _unwrap(p):
    return p.get("params", p) if isinstance(p, Mapping) else p


def export_sd15_state_dict(
    unet_params: Mapping,
    vae_params: Optional[Mapping] = None,
    clip_params: Optional[Mapping] = None,
    dtype=np.float32,
) -> Dict[str, np.ndarray]:
    """Assemble a full ldm-format SD1.5 state dict (the layout
    `load_sd15_bundle` reads: model.diffusion_model. / first_stage_model.
    / cond_stage_model.transformer.text_model. prefixes)."""
    sd = export_params(_unwrap(unet_params), CK.PREFIX_UNET, dtype)
    if vae_params is not None:
        sd.update(export_params(_unwrap(vae_params), CK.PREFIX_VAE, dtype))
    if clip_params is not None:
        sd.update(export_clip_text(_unwrap(clip_params),
                                   CK.PREFIX_CLIP_SD15, dtype))
    return sd


def save_sd15_checkpoint(
    path: str,
    unet_params: Mapping,
    vae_params: Optional[Mapping] = None,
    clip_params: Optional[Mapping] = None,
    dtype=np.float32,
    metadata: Optional[Dict[str, str]] = None,
) -> None:
    sd = export_sd15_state_dict(unet_params, vae_params, clip_params, dtype)
    CK.save_safetensors(path, sd, metadata=metadata)
