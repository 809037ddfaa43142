"""Checkpoint -> Flax pytree loading.

Replaces the reference's module-surgery loading
(`modules/cremage/utils/ml_utils.py:333 load_model`,
`modules/sd/image_generator.py:250-494` overlay chain) with functional
pytree construction:

- `load_state_dict(path)` reads .safetensors or torch .ckpt/.pt, with the
  reference's A1111 flat-dict tolerance (image_generator.py:264-271: use
  the top-level dict when there is no 'state_dict' key);
- `build_flax_params(template, sd, prefix)` maps torch keys onto a Flax
  param template by a *mechanical* normalized-name match (module names in
  cremage_tpu.models flatten to the torch key strings), transposing
  conv OIHW->HWIO and linear (out,in)->(in,out);
- `overlay(sd_base, sd_extra)` implements the reference overlay order
  base -> controlnet -> custom -> vae -> lora -> faceid
  (image_generator.py:330-485) as plain dict updates.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Dict, Iterable, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

# keys whose rank-2 tensors are (num, dim) tables, not linear layers
_NO_TRANSPOSE_MARKERS = (
    "token_embedding",
    "position_embedding",
    "positional_embedding",
    "pos_embed",
    "text_projection",   # stored (d, d) already in (in, out) by open_clip
    "logit_scale",
)


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def save_safetensors(path: str, tensors: Mapping[str, np.ndarray],
                     metadata: Optional[Dict[str, str]] = None) -> None:
    from safetensors.numpy import save_file

    save_file(dict(tensors), path, metadata=metadata)


def load_torch_ckpt(path: str) -> Dict[str, np.ndarray]:
    """Load a torch-pickle checkpoint to numpy (torch cpu is available)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)

    def _tensor_dict(v):
        return (isinstance(v, dict) and v
                and all(hasattr(x, "numpy") for x in v.values()))

    # container unwrapping, guarded: only descend when the candidate is
    # itself a flat dict of tensors (ldm 'state_dict', the unblur
    # CremageModelV6 'model_state_dict' (face_unblur.py:106), GFPGAN/
    # RealESRGAN 'params_ema'/'params') — a checkpoint that merely
    # happens to carry one of these names next to real tensors is left
    # alone
    for key in ("state_dict", "model_state_dict", "params_ema", "params"):
        if isinstance(obj, dict) and _tensor_dict(obj.get(key)):
            obj = obj[key]
            break
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k] = v.to(torch.float32).numpy() if v.dtype in (
                torch.float16, torch.bfloat16
            ) else v.numpy()
        else:
            logger.debug("skipping non-tensor key %s", k)
    return out


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Unified ckpt/safetensors reader (ml_utils.py:333 semantics)."""
    if path.endswith(".safetensors"):
        sd = load_safetensors(path)
    else:
        sd = load_torch_ckpt(path)
    # A1111 flat-dict tolerance: some checkpoints nest under state_dict
    if "state_dict" in sd and not any(k.startswith("model.") for k in sd):
        sd = sd["state_dict"]  # pragma: no cover - rare container format
    return sd


def normalize_key(key: str) -> str:
    """torch dotted key -> flattened underscore name."""
    return key.replace(".", "_")


def _flatten_params(tree, path=()) -> Iterable[Tuple[Tuple[str, ...], Any]]:
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            yield from _flatten_params(v, path + (str(k),))
    else:
        yield path, tree


def _set_in(tree: dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_tensor(
    t: np.ndarray, target_shape: Tuple[int, ...], key: str
) -> np.ndarray:
    """Shape-directed torch->flax tensor conversion."""
    t = np.asarray(t)
    if t.shape == tuple(target_shape) and not (
        t.ndim == 2
        and t.shape[0] == t.shape[1]
        and not any(m in key for m in _NO_TRANSPOSE_MARKERS)
    ):
        return t
    if t.ndim == 4:
        t2 = t.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if t2.shape == tuple(target_shape):
            return t2
    if t.ndim == 2:
        if any(m in key for m in _NO_TRANSPOSE_MARKERS):
            if t.shape == tuple(target_shape):
                return t
        t2 = t.T
        if t2.shape == tuple(target_shape):
            return t2
    if t.shape == tuple(target_shape):
        return t
    raise ValueError(
        f"cannot convert {key}: ckpt shape {t.shape} -> target {target_shape}"
    )


def build_flax_params(
    template,
    state_dict: Mapping[str, np.ndarray],
    prefix: str = "",
    dtype=None,
    strict: bool = True,
) -> Tuple[dict, list, list]:
    """Fill a Flax param template ('params' subtree) from a torch state
    dict. Returns (params, missing_keys, unused_ckpt_keys)."""
    flat = dict(_flatten_params(template))
    want = {"_".join(path): path for path, _ in flat.items()}

    available = {}
    for k, v in state_dict.items():
        if prefix and not k.startswith(prefix):
            continue
        available[normalize_key(k[len(prefix):])] = (k, v)

    out: dict = {}
    missing = []
    used = set()
    for norm, path in want.items():
        target = flat[path]
        if norm in available:
            orig_key, tensor = available[norm]
            arr = convert_tensor(tensor, tuple(target.shape), orig_key)
            if dtype is not None:
                arr = arr.astype(dtype)
            else:
                arr = arr.astype(np.dtype(target.dtype))
            _set_in(out, path, jnp.asarray(arr))
            used.add(norm)
        else:
            missing.append("_".join(path))

    unused = [available[k][0] for k in available if k not in used]
    if strict and missing:
        raise KeyError(
            f"missing {len(missing)} params (first 10): {missing[:10]}"
        )
    return out, missing, unused


def overlay(
    base: Dict[str, np.ndarray], extra: Mapping[str, np.ndarray],
    key_filter: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """Overlay extra weights onto base (reference overlay chain;
    e.g. VAE override filters 'first_stage_model.' keys)."""
    out = dict(base)
    for k, v in extra.items():
        if key_filter is None or k.startswith(key_filter):
            out[k] = v
    return out


# Standard SD checkpoint prefixes for our model components.
PREFIX_UNET = "model.diffusion_model."
PREFIX_VAE = "first_stage_model."
PREFIX_CLIP_SD15 = "cond_stage_model.transformer.text_model."
PREFIX_CLIP_SDXL = "conditioner.embedders.0.transformer.text_model."
PREFIX_OPENCLIP_SDXL = "conditioner.embedders.1.model."


def clip_text_subdict(
    sd: Mapping[str, np.ndarray], prefix: str = PREFIX_CLIP_SD15
) -> Dict[str, np.ndarray]:
    """HF CLIPTextModel keys -> our module naming (token/position
    embeddings are bare params; encoder. level dropped)."""
    out = {}
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        k2 = k[len(prefix):]
        k2 = k2.replace("embeddings.token_embedding.weight", "token_embedding")
        k2 = k2.replace("embeddings.position_embedding.weight",
                        "position_embedding")
        if k2.startswith("encoder.layers."):
            k2 = k2[len("encoder."):]
        if k2 == "embeddings.position_ids":
            continue
        out[k2] = v
    return out


def openclip_text_subdict(
    sd: Mapping[str, np.ndarray], prefix: str = PREFIX_OPENCLIP_SDXL
) -> Dict[str, np.ndarray]:
    """OpenCLIP text-tower keys -> our module naming: fused
    attn.in_proj_{weight,bias} split into q/k/v (row order [q;k;v]),
    token_embedding.weight -> bare param; logit_scale/attn_mask dropped."""
    out = {}
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        k2 = k[len(prefix):]
        if k2 in ("logit_scale", "attn_mask") or k2.startswith("visual."):
            continue
        if k2.endswith("attn.in_proj_weight"):
            base = k2[: -len("in_proj_weight")]
            q, kk, vv = np.split(np.asarray(v), 3, axis=0)
            out[base + "q_proj.weight"] = q
            out[base + "k_proj.weight"] = kk
            out[base + "v_proj.weight"] = vv
            continue
        if k2.endswith("attn.in_proj_bias"):
            base = k2[: -len("in_proj_bias")]
            q, kk, vv = np.split(np.asarray(v), 3, axis=0)
            out[base + "q_proj.bias"] = q
            out[base + "k_proj.bias"] = kk
            out[base + "v_proj.bias"] = vv
            continue
        k2 = k2.replace("token_embedding.weight", "token_embedding")
        out[k2] = v
    return out


def hf_clip_text_to_openclip_subdict(
    sd: Mapping[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    """HF transformers CLIPTextModel(WithProjection) keys -> our
    open_clip text tower naming (models/open_clip.py). Used for
    differential parity testing and for loading HF-format secondary
    towers; text_projection is a Linear (out,in) in HF while open_clip
    stores (in,out)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k == "text_projection.weight":
            out["text_projection"] = np.asarray(v).T
            continue
        if not k.startswith("text_model."):
            continue
        k2 = k[len("text_model."):]
        if k2 == "embeddings.token_embedding.weight":
            out["token_embedding"] = np.asarray(v)
        elif k2 == "embeddings.position_embedding.weight":
            out["positional_embedding"] = np.asarray(v)
        elif k2.startswith("encoder.layers."):
            rest = k2[len("encoder.layers."):]
            i, sub = rest.split(".", 1)
            sub = (sub.replace("self_attn.", "attn.")
                      .replace("layer_norm1.", "ln_1.")
                      .replace("layer_norm2.", "ln_2.")
                      .replace("mlp.fc1.", "mlp.c_fc.")
                      .replace("mlp.fc2.", "mlp.c_proj."))
            out[f"transformer.resblocks.{i}.{sub}"] = np.asarray(v)
        elif k2.startswith("final_layer_norm."):
            out["ln_final." + k2[len("final_layer_norm."):]] = np.asarray(v)
    return out


def hf_clip_vision_subdict(
    sd: Mapping[str, np.ndarray], prefix: str = "vision_model."
) -> Dict[str, np.ndarray]:
    """HF transformers CLIPVisionModel(WithProjection) keys -> our
    open_clip-style vision tower naming (models/clip_vision.py).

    Same math, different bookkeeping: HF keeps q/k/v separate (as we
    do), names the blocks encoder.layers.N and the norms layer_norm1/2,
    and spells pre_layrnorm with its historical typo. visual_projection
    is a Linear (out,in) while open_clip's proj is stored (in,out)."""
    out: Dict[str, np.ndarray] = {}
    renames = [
        ("embeddings.patch_embedding.weight", "conv1_weight"),
        ("embeddings.class_embedding", "class_embedding"),
        ("embeddings.position_embedding.weight", "positional_embedding"),
        ("pre_layrnorm.", "ln_pre."),
        ("pre_layernorm.", "ln_pre."),
        ("post_layernorm.", "ln_post."),
    ]
    for k, v in sd.items():
        if k == "visual_projection.weight":
            out["proj"] = np.asarray(v).T
            continue
        if not k.startswith(prefix):
            continue
        k2 = k[len(prefix):]
        if k2.startswith("encoder.layers."):
            rest = k2[len("encoder.layers."):]
            i, sub = rest.split(".", 1)
            sub = (sub.replace("self_attn.", "attn.")
                      .replace("layer_norm1.", "ln_1.")
                      .replace("layer_norm2.", "ln_2.")
                      .replace("mlp.fc1.", "mlp.c_fc.")
                      .replace("mlp.fc2.", "mlp.c_proj."))
            out[f"transformer.resblocks.{i}.{sub}"] = np.asarray(v)
            continue
        if k2.startswith("embeddings.position_ids"):
            continue
        for a, b2 in renames:
            if k2.startswith(a):
                out[b2 + k2[len(a):]] = np.asarray(v)
                break
    return out


def vae_state_dict_from_standalone(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Standalone VAE checkpoints store keys without the first_stage_model
    prefix; normalize to prefixed form for overlay."""
    if any(k.startswith(PREFIX_VAE) for k in sd):
        return {k: v for k, v in sd.items() if k.startswith(PREFIX_VAE)}
    return {PREFIX_VAE + k: v for k, v in sd.items()
            if k.startswith(("encoder.", "decoder.", "quant_conv", "post_quant_conv"))}
