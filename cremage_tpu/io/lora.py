"""LoRA: kohya-format key grammar + load-time weight merge.

The reference applies LoRA by runtime module surgery — patched attention
modules hold per-LoRA down/up projections evaluated every forward pass
(`modules/ldm/modules/attention.py` CrossAttention lora branches;
name grammar `modules/cremage/utils/lora_utils.py:47-375`;
canonical key list `sd15_lora_weight_list.py`).

TPU-first design: LoRA is merged into the base weights **at load time**
    W' = W + weight * (alpha / rank) * up @ down
— identical numerics (LoRA is linear), zero per-step cost, and the merged
pytree jits exactly like the base model. Multiple LoRAs merge additively
in sequence, mirroring the reference's multi-LoRA sum.

Kohya module name grammar (examples from the reference's canonical list):
  lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q
  lora_unet_mid_block_attentions_0_proj_in
  lora_unet_up_blocks_1_attentions_2_transformer_blocks_0_ff_net_2
  lora_te_text_model_encoder_layers_8_self_attn_v_proj
  lora_te_text_model_encoder_layers_9_mlp_fc1
with suffixes .lora_down.weight / .lora_up.weight / .alpha.
"""
from __future__ import annotations

import logging
import re
from typing import Dict, Mapping, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.unet import UNetConfig

logger = logging.getLogger(__name__)


def unet_attention_tables(cfg: UNetConfig):
    """Simulate the UNet block layout to map diffusers/kohya
    (down|mid|up)_blocks_{b}_attentions_{a} onto our
    input/middle/output block module names."""
    down: Dict[Tuple[int, int], str] = {}
    up: Dict[Tuple[int, int], str] = {}
    idx = 1
    ds = 1
    for level in range(len(cfg.channel_mult)):
        for b in range(cfg.num_res_blocks):
            if ds in cfg.attention_resolutions:
                down[(level, b)] = f"input_blocks_{idx}_1"
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            idx += 1
            ds *= 2
    mid = "middle_block_1"
    idx = 0
    for pos, level in enumerate(reversed(range(len(cfg.channel_mult)))):
        for i in range(cfg.num_res_blocks + 1):
            if ds in cfg.attention_resolutions:
                up[(pos, i)] = f"output_blocks_{idx}_1"
            idx += 1
        if level > 0:
            ds //= 2
    return down, mid, up


_TE_RE = re.compile(
    r"^lora_te(\d*)_text_model_encoder_layers_(\d+)_(self_attn_(?:q|k|v|out)_proj|mlp_fc1|mlp_fc2)$"
)
_UNET_ATT_RE = re.compile(
    r"^lora_unet_(down|mid|up)_blocks?_(?:(\d+)_)?attentions_(\d+)_(.+)$"
)
# non-standard SDXL LoRAs name modules by the SD-native block layout
# (reference lora_non_standard_sdxl_lora_map_test.py):
#   lora_unet_input_blocks_4_1_transformer_blocks_0_attn1_to_k
#   lora_unet_middle_block_1_proj_in
_UNET_NATIVE_RE = re.compile(
    r"^lora_unet_(input|output|middle)_blocks?_(\d+)(?:_1)?_(.+)$"
)


def kohya_module_to_flax_path(
    module: str, cfg: UNetConfig
) -> Optional[Tuple[str, Tuple[str, ...]]]:
    """kohya module name -> ('unet'|'te', flax param path to the layer).

    Returns None for unsupported modules (caller warns + skips)."""
    m = _TE_RE.match(module)
    if m:
        te_idx, layer, rest = m.groups()
        if te_idx == "2":
            # SDXL second text encoder: kohya exports the OpenCLIP bigG
            # tower under HF CLIP naming; map onto our OpenCLIPTextModel
            # module names (models/open_clip.py ResBlock)
            oc = {"self_attn_q_proj": "attn_q_proj",
                  "self_attn_k_proj": "attn_k_proj",
                  "self_attn_v_proj": "attn_v_proj",
                  "self_attn_out_proj": "attn_out_proj",
                  "mlp_fc1": "mlp_c_fc", "mlp_fc2": "mlp_c_proj"}
            return "te2", (f"transformer_resblocks_{layer}", oc[rest])
        if rest.startswith("self_attn_"):
            proj = rest[len("self_attn_"):]
            return "te", (f"layers_{layer}", "self_attn", proj)
        return "te", (f"layers_{layer}", rest)

    def _inner_path(st: str, rest: str):
        if rest in ("proj_in", "proj_out"):
            return "unet", (st, rest)
        tm = re.match(r"^transformer_blocks_(\d+)_(.+)$", rest)
        if not tm:
            return None
        d, inner = tm.groups()
        tb = f"transformer_blocks_{d}"
        if inner.startswith(("attn1_", "attn2_")):
            attn, target = inner.split("_", 1)
            if target in ("to_out_0", "to_q", "to_k", "to_v"):
                return "unet", (st, tb, attn, target)
            return None
        if inner == "ff_net_0_proj":
            return "unet", (st, tb, "ff", "net_0_proj")
        if inner == "ff_net_2":
            return "unet", (st, tb, "ff", "net_2")
        return None

    m = _UNET_ATT_RE.match(module)
    if m:
        where, b, a, rest = m.groups()
        down_tbl, mid_name, up_tbl = unet_attention_tables(cfg)
        if where == "down":
            st = down_tbl.get((int(b), int(a)))
        elif where == "up":
            st = up_tbl.get((int(b), int(a)))
        else:
            st = mid_name
        if st is None:
            return None
        return _inner_path(st, rest)

    m = _UNET_NATIVE_RE.match(module)
    if m:
        where, b, rest = m.groups()
        if where == "middle":
            st = "middle_block_1"
        else:
            st = f"{where}_blocks_{b}_1"
        return _inner_path(st, rest)
    return None


def group_lora_modules(lora_sd: Mapping[str, np.ndarray]):
    """Group a kohya LoRA state dict by module name ->
    {'down':..., 'up':..., 'alpha':...}."""
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in lora_sd.items():
        if k.endswith(".lora_down.weight"):
            groups.setdefault(k[: -len(".lora_down.weight")], {})["down"] = v
        elif k.endswith(".lora_up.weight"):
            groups.setdefault(k[: -len(".lora_up.weight")], {})["up"] = v
        elif k.endswith(".alpha"):
            groups.setdefault(k[: -len(".alpha")], {})["alpha"] = v
    return groups


def _lora_delta(down: np.ndarray, up: np.ndarray) -> np.ndarray:
    """up @ down in torch orientation -> delta with torch layout."""
    down = np.asarray(down, np.float32)
    up = np.asarray(up, np.float32)
    if down.ndim == 2:
        return up @ down  # (out, r) @ (r, in) -> (out, in)
    # conv LoRA: up (out, r, 1, 1), down (r, in, kh, kw)
    return np.einsum("orab,rihw->oihw", up, down)


def _get_leaf(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set_leaf(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def merge_lora(
    unet_params: dict,
    te_params: Optional[dict],
    lora_sd: Mapping[str, np.ndarray],
    weight: float,
    cfg: UNetConfig,
    te2_params: Optional[dict] = None,
) -> Tuple[int, int]:
    """Merge one LoRA into (mutable) unet/te/te2 param trees in place.

    te2_params is the SDXL second text encoder (OpenCLIP bigG) tree —
    kohya lora_te2_* modules merge there.  Returns
    (merged_count, skipped_count)."""
    merged = skipped = 0
    for module, parts in group_lora_modules(lora_sd).items():
        if "down" not in parts or "up" not in parts:
            skipped += 1
            continue
        dest = kohya_module_to_flax_path(module, cfg)
        if dest is None:
            logger.warning("LoRA module not mapped, skipping: %s", module)
            skipped += 1
            continue
        which, path = dest
        tree = {"unet": unet_params, "te": te_params,
                "te2": te2_params}[which]
        if tree is None:
            skipped += 1
            continue
        try:
            layer = _get_leaf(tree, path)
        except KeyError:
            logger.warning("LoRA target missing in params: %s", path)
            skipped += 1
            continue
        rank = parts["down"].shape[0]
        alpha = float(np.asarray(parts.get("alpha", rank)))
        scale = weight * alpha / rank
        delta = _lora_delta(parts["down"], parts["up"]) * scale
        w = layer["weight"]
        if delta.ndim == 2:
            delta_flax = delta.T  # (out,in) -> (in,out)
        else:
            delta_flax = delta.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            if w.ndim == 2:
                # target stored as linear (use_linear_in_transformer)
                delta_flax = delta_flax.reshape(delta.shape[1], delta.shape[0])
        if delta_flax.shape != tuple(w.shape):
            logger.warning(
                "LoRA shape mismatch for %s: %s vs %s", module,
                delta_flax.shape, w.shape,
            )
            skipped += 1
            continue
        layer["weight"] = (
            w.astype(jnp.float32) + jnp.asarray(delta_flax)
        ).astype(w.dtype)
        merged += 1
    return merged, skipped


def parse_lora_option_string(models: str, weights: str):
    """Reference option format: comma-separated path and weight lists
    (sd/options.py lora_models/lora_weights)."""
    paths = [p.strip() for p in models.split(",") if p.strip() and p.strip() != "None"] \
        if models else []
    ws = [float(w) for w in weights.split(",") if w.strip()] if weights else []
    ws = ws[: len(paths)] + [1.0] * (len(paths) - len(ws))
    return list(zip(paths, ws))
