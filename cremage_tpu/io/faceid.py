"""IP-Adapter-FaceID weight surgery as load-time pytree transforms.

Behavior contract: reference FaceID index mapping
(`modules/cremage/utils/ml_utils.py:73
face_id_model_weight_to_sd_15_model_weight`): the checkpoint's
"ip_adapter" dict is keyed by a sequential attention-processor index
0..31 laid out (attn1, attn2) pairs over

    input_blocks  [1,2,4,5,7,8]   -> indices 0..11
    output_blocks [3..11]         -> indices 12..29
    middle_block  [1]             -> indices 30..31

Each slot carries rank-128 LoRA for to_q/to_k/to_v/to_out.0 (merged into
the base weights, like io/lora.py) and, on attn2 slots, extra to_k_ip /
to_v_ip projections that become the UNet's to_k_ipa/to_v_ipa params
(reference `modules/ldm/modules/attention.py:338-339,448-450`).
"""
from __future__ import annotations

import logging
from typing import Dict, List, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.unet import UNetConfig

logger = logging.getLogger(__name__)

FACEID_LORA_RANK = 128
FACEID_NUM_TOKENS = 4


def faceid_attention_slots(cfg: UNetConfig) -> List[Tuple[Tuple[str, ...], str]]:
    """Ordered (spatial-transformer path, attn name) pairs matching the
    FaceID sequential index: one entry per index 0..2*num_attn-1."""
    # enumerate attention-bearing blocks in reference order
    st_names: List[str] = []
    idx = 1
    ds = 1
    for level in range(len(cfg.channel_mult)):
        for _ in range(cfg.num_res_blocks):
            if ds in cfg.attention_resolutions:
                st_names.append(f"input_blocks_{idx}_1")
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            idx += 1
            ds *= 2
    out_start = len(st_names)
    idx = 0
    for level in reversed(range(len(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            if ds in cfg.attention_resolutions:
                st_names.append(f"output_blocks_{idx}_1")
            idx += 1
        if level > 0:
            ds //= 2
    st_names.append("middle_block_1")

    slots: List[Tuple[Tuple[str, ...], str]] = []
    for st in st_names:
        for attn in ("attn1", "attn2"):
            slots.append(((st, "transformer_blocks_0", attn), attn))
    return slots


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def merge_faceid(
    unet_params: dict,
    ip_adapter_sd: Mapping[str, np.ndarray],
    cfg: UNetConfig,
    weight: float = 1.0,
) -> Tuple[int, int]:
    """Merge FaceID LoRA deltas + install to_k_ipa/to_v_ipa projections.

    `weight` is the UI face_strength (scales the LoRA deltas; the extra-
    attention branch strength is the UNet's ipa_scale at build time).
    Returns (merged_lora_layers, installed_ipa_projs)."""
    slots = faceid_attention_slots(cfg)
    merged = installed = 0
    for idx, (path, attn) in enumerate(slots):
        try:
            node = _get(unet_params, path)
        except KeyError:
            logger.warning("FaceID slot %d missing in params: %s", idx, path)
            continue
        for proj, target in (("to_q_lora", "to_q"), ("to_k_lora", "to_k"),
                             ("to_v_lora", "to_v"), ("to_out_lora", "to_out_0")):
            kd = f"{idx}.{proj}.down.weight"
            ku = f"{idx}.{proj}.up.weight"
            if kd not in ip_adapter_sd or ku not in ip_adapter_sd:
                continue
            down = np.asarray(ip_adapter_sd[kd], np.float32)
            up = np.asarray(ip_adapter_sd[ku], np.float32)
            delta = (up @ down).T * weight  # torch (out,in) -> flax (in,out)
            layer = node[target]
            w = layer["weight"]
            layer["weight"] = (
                w.astype(jnp.float32) + jnp.asarray(delta)
            ).astype(w.dtype)
            merged += 1
        if attn == "attn2":
            for src, dst in (("to_k_ip", "to_k_ipa"), ("to_v_ip", "to_v_ipa")):
                k = f"{idx}.{src}.weight"
                if k not in ip_adapter_sd:
                    continue
                wt = np.asarray(ip_adapter_sd[k], np.float32).T  # (in,out)
                node[dst] = {"weight": jnp.asarray(wt)}
                installed += 1
    return merged, installed


def load_faceid_checkpoint(path: str) -> Tuple[Dict, Dict]:
    """FaceID .bin/.safetensors -> (image_proj sd, ip_adapter sd)
    (reference ip_adapter_faceid.py:431-455 load_ip_adapter)."""
    if path.endswith(".safetensors"):
        from cremage_tpu.io.checkpoint import load_state_dict

        flat = load_state_dict(path)
        proj = {k[len("image_proj."):]: np.asarray(v, np.float32)
                for k, v in flat.items() if k.startswith("image_proj.")}
        ip = {k[len("ip_adapter."):]: np.asarray(v, np.float32)
              for k, v in flat.items() if k.startswith("ip_adapter.")}
        return proj, ip
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    def to_np(d):
        return {k: v.float().numpy() for k, v in d.items()}
    return to_np(obj["image_proj"]), to_np(obj["ip_adapter"])


def faceid_layout(proj_sd: Mapping[str, np.ndarray]) -> str:
    """'plus' (ProjPlusModel: the default plusv2 checkpoints) or 'mlp'
    (non-Plus MLPProjModel), from the image_proj key shape
    (reference: Plus ckpts carry perceiver_resampler.* keys)."""
    if any(k.startswith("perceiver_resampler.") for k in proj_sd):
        return "plus"
    return "mlp"


def proj_module_from_params(proj_params: Mapping):
    """Rebuild the right projection module (MLP vs Plus) from a cached
    Flax param tree — dims recovered from the stored shapes."""
    from cremage_tpu.models.faceid import (
        FaceIDProjConfig, FaceIDProjPlusConfig, MLPProjModel, ProjPlusModel,
    )

    xattn = int(np.asarray(proj_params["norm"]["weight"]).shape[0])
    id_dim = int(np.asarray(proj_params["proj_0"]["weight"]).shape[0])
    ntok = int(np.asarray(
        proj_params["proj_2"]["weight"]).shape[1]) // xattn
    if "perceiver_resampler" in proj_params:
        clip_dim = int(np.asarray(
            proj_params["perceiver_resampler"]["proj_in"]["weight"]
        ).shape[0])
        cfg = FaceIDProjPlusConfig(
            cross_attention_dim=xattn, id_embeddings_dim=id_dim,
            clip_embeddings_dim=clip_dim, num_tokens=ntok)
        return ProjPlusModel(cfg), "plus"
    cfg = FaceIDProjConfig(cross_attention_dim=xattn,
                           id_embeddings_dim=id_dim, num_tokens=ntok)
    return MLPProjModel(cfg), "mlp"


def build_faceid_proj(proj_sd: Mapping[str, np.ndarray], dtype=None):
    """image_proj state dict -> (flax module, {'params': ...}, kind).

    Picks MLPProjModel vs ProjPlusModel from the checkpoint layout so
    the reference's default `ip-adapter-faceid-plusv2_sd15.bin`
    (const/const.py:15) loads without the caller knowing the variant."""
    import jax

    from cremage_tpu.io import checkpoint as CK
    from cremage_tpu.models.faceid import (
        FaceIDProjConfig, FaceIDProjPlusConfig, MLPProjModel, ProjPlusModel,
    )

    kind = faceid_layout(proj_sd)
    if kind == "plus":
        clip_dim = int(np.asarray(
            proj_sd["perceiver_resampler.proj_in.weight"]).shape[1])
        xattn = int(np.asarray(proj_sd["norm.weight"]).shape[0])
        id_dim = int(np.asarray(proj_sd["proj.0.weight"]).shape[1])
        ntok = int(np.asarray(
            proj_sd["proj.2.weight"]).shape[0]) // xattn
        cfg = FaceIDProjPlusConfig(
            cross_attention_dim=xattn, id_embeddings_dim=id_dim,
            clip_embeddings_dim=clip_dim, num_tokens=ntok)
        proj = ProjPlusModel(cfg)
        tmpl = jax.eval_shape(
            lambda: proj.init(
                jax.random.PRNGKey(0), jnp.zeros((1, id_dim)),
                jnp.zeros((1, 257, clip_dim))))["params"]
    else:
        xattn = int(np.asarray(proj_sd["norm.weight"]).shape[0])
        id_dim = int(np.asarray(proj_sd["proj.0.weight"]).shape[1])
        ntok = int(np.asarray(proj_sd["proj.2.weight"]).shape[0]) // xattn
        cfg = FaceIDProjConfig(cross_attention_dim=xattn,
                               id_embeddings_dim=id_dim, num_tokens=ntok)
        proj = MLPProjModel(cfg)
        tmpl = jax.eval_shape(
            lambda: proj.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, id_dim))))["params"]
    params, missing, unused = CK.build_flax_params(
        tmpl, proj_sd, prefix="", dtype=dtype)
    if unused:
        logger.warning("FaceID image_proj: %d unused ckpt keys (first 5: %s)",
                       len(unused), unused[:5])
    return proj, {"params": params}, kind
