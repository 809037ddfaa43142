"""Bundle loading: checkpoint files -> SD15Bundle with the reference
overlay order base -> controlnet -> vae -> lora -> faceid
(`sd/image_generator.py:330-485`), plus the module-level bundle cache
keyed on the model combination (`image_generator.py:652-668`)."""
from __future__ import annotations

import logging
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from cremage_tpu.core.dtypes import DEFAULT_POLICY, DTypePolicy
from cremage_tpu.io import checkpoint as CK
from cremage_tpu.io.lora import merge_lora
from cremage_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from cremage_tpu.models.unet import UNetModel, sd15_unet_config
from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
from cremage_tpu.pipelines.conditioning import TextEncoder
from cremage_tpu.pipelines.sd15 import SD15Bundle
from cremage_tpu.prompt.tokenizer import default_tokenizer
from cremage_tpu.samplers import schedules as S

logger = logging.getLogger(__name__)

_bundle_cache: dict = {}


def _template(model, *args):
    shapes = jax.eval_shape(model.init, jax.random.key(0), *args)
    return shapes["params"]


def load_sd15_bundle(
    ckpt: str,
    vae_ckpt: Optional[str] = None,
    loras: Sequence[Tuple[str, float]] = (),
    embedding_dir: Optional[str] = None,
    inpainting: bool = False,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_cache: bool = True,
) -> SD15Bundle:
    cache_key = (ckpt, vae_ckpt, tuple(loras), embedding_dir, inpainting,
                 str(policy.param_dtype))
    if use_cache and cache_key in _bundle_cache:
        logger.info("bundle cache hit for %s", ckpt)
        return _bundle_cache[cache_key]

    sd = CK.load_state_dict(ckpt)
    if vae_ckpt:
        vae_sd = CK.vae_state_dict_from_standalone(CK.load_state_dict(vae_ckpt))
        sd = CK.overlay(sd, vae_sd, key_filter=CK.PREFIX_VAE)

    dd = dict(dtype=policy.compute_dtype, param_dtype=policy.param_dtype)
    unet_cfg = sd15_unet_config(in_channels=9 if inpainting else 4, **dd)
    unet = UNetModel(unet_cfg)
    x = jnp.zeros((1, 8, 8, unet_cfg.in_channels), policy.compute_dtype)
    unet_tmpl = _template(unet, x, jnp.zeros((1,)), jnp.zeros((1, 77, 768)))
    unet_params, miss, _ = CK.build_flax_params(
        unet_tmpl, sd, CK.PREFIX_UNET, dtype=policy.param_dtype
    )

    vae = AutoencoderKL(VAEConfig(**dd))
    vae_tmpl = _template(vae, jnp.zeros((1, 64, 64, 3), policy.compute_dtype))
    vae_params, _, _ = CK.build_flax_params(
        vae_tmpl, sd, CK.PREFIX_VAE, dtype=policy.param_dtype
    )

    clip = CLIPTextModel(CLIPTextConfig(**dd))
    clip_tmpl = _template(clip, jnp.zeros((1, 77), jnp.int32))
    clip_params, _, _ = CK.build_flax_params(
        clip_tmpl, sd, CK.PREFIX_CLIP_SD15, dtype=policy.param_dtype,
        strict=False,
    )

    # LoRA merge (load-time weight transform)
    for path, weight in loras:
        lora_sd = CK.load_state_dict(path)
        merged, skipped = merge_lora(unet_params, clip_params, lora_sd,
                                     weight, unet_cfg)
        logger.info("LoRA %s: merged %d modules, skipped %d", path, merged, skipped)

    text = TextEncoder(clip, {"params": clip_params}, default_tokenizer(),
                       embedding_dir)
    bundle = SD15Bundle(
        unet=unet,
        unet_params={"params": unet_params},
        text=text,
        vae=vae,
        vae_params={"params": vae_params},
        schedule=S.default_sd_schedule(),
        inpaint=inpainting,
    )
    if use_cache:
        _bundle_cache.clear()  # hold one combination, like the reference
        _bundle_cache[cache_key] = bundle
    return bundle
