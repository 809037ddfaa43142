"""Bundle loading: checkpoint files -> SD15Bundle with the reference
overlay order base -> controlnet -> vae -> lora -> faceid
(`sd/image_generator.py:330-485`), plus the module-level bundle cache
keyed on the model combination (`image_generator.py:652-668`)."""
from __future__ import annotations

import logging
import re
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
    control_ckpt: Optional[str] = None,
    faceid_ckpt: Optional[str] = None,
    face_strength: float = 1.0,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_cache: bool = True,
    unet_cfg_override=None,
    vae_cfg_override=None,
    clip_cfg_override=None,
    quantize_unet: Optional[str] = None,
    quantize_min_size: int = 65536,
) -> SD15Bundle:
    """Config overrides load non-standard (e.g. tiny test) checkpoints
    through the full real conversion path; they bypass the caches.

    quantize_unet: optional 8-bit UNet weight storage ("int8" = the
    w8a8 MXU path incl. convs, "float8_e4m3" = weight-only matmuls;
    io/quantize.py).  Applied AFTER every overlay/LoRA/FaceID merge —
    merges need float weights — and after the disk params cache, so
    the cached tree stays full-precision and reusable."""
    if unet_cfg_override or vae_cfg_override or clip_cfg_override:
        use_cache = False
    cache_key = (ckpt, vae_ckpt, tuple(loras), embedding_dir, inpainting,
                 control_ckpt, faceid_ckpt, face_strength,
                 str(policy.param_dtype), quantize_unet)
    if use_cache and cache_key in _bundle_cache:
        logger.info("bundle cache hit for %s", ckpt)
        return _bundle_cache[cache_key]

    # cross-process converted-params cache (orbax): skips the multi-GB
    # torch->jax conversion + overlay chain on repeat loads
    from cremage_tpu.core.cache import load_params_cache, save_params_cache

    disk_extra = repr((vae_ckpt, tuple(loras), inpainting, control_ckpt,
                       faceid_ckpt, face_strength, str(policy.param_dtype)))
    cached = load_params_cache(ckpt, extra=disk_extra) if use_cache else None

    sd = {} if cached else CK.load_state_dict(ckpt)
    if vae_ckpt and not cached:
        vae_sd = CK.vae_state_dict_from_standalone(CK.load_state_dict(vae_ckpt))
        sd = CK.overlay(sd, vae_sd, key_filter=CK.PREFIX_VAE)

    import dataclasses as _dc

    dd = dict(dtype=policy.compute_dtype, param_dtype=policy.param_dtype)
    num_ipa = 4 if faceid_ckpt else 0
    vae_cfg = (_dc.replace(vae_cfg_override, **dd)
               if vae_cfg_override is not None else VAEConfig(**dd))
    clip_cfg = (_dc.replace(clip_cfg_override, **dd)
                if clip_cfg_override is not None else CLIPTextConfig(**dd))
    if unet_cfg_override is not None:
        unet_cfg = _dc.replace(
            unet_cfg_override,
            in_channels=9 if inpainting else unet_cfg_override.in_channels,
            ipa_num_tokens=num_ipa,
            ipa_scale=1.0 if faceid_ckpt else 0.0, **dd,
        )
    else:
        unet_cfg = sd15_unet_config(
            in_channels=9 if inpainting else 4,
            ipa_num_tokens=num_ipa,
            ipa_scale=1.0 if faceid_ckpt else 0.0, **dd,
        )
    unet = UNetModel(unet_cfg)
    proj_params = None
    if cached is not None:
        unet_params = cached["unet"]
        vae_params = cached["vae"]
        clip_params = cached["clip"]
        proj_params = cached.get("faceid_proj")
        vae = AutoencoderKL(vae_cfg)
        clip = CLIPTextModel(clip_cfg)
        logger.info("params cache hit for %s", ckpt)
    else:
        x = jnp.zeros((1, 8, 8, unet_cfg.in_channels), policy.compute_dtype)
        unet_tmpl = _template(
            unet, x, jnp.zeros((1,)),
            jnp.zeros((1, 77 + num_ipa, unet_cfg.context_dim)))
        unet_params, miss, _ = CK.build_flax_params(
            unet_tmpl, sd, CK.PREFIX_UNET, dtype=policy.param_dtype,
            strict=not faceid_ckpt,  # to_k_ipa/to_v_ipa: FaceID ckpt
        )

        vae = AutoencoderKL(vae_cfg)
        vae_tmpl = _template(vae, jnp.zeros((1, 64, 64, 3),
                                            policy.compute_dtype))
        vae_params, _, _ = CK.build_flax_params(
            vae_tmpl, sd, CK.PREFIX_VAE, dtype=policy.param_dtype
        )

        clip = CLIPTextModel(clip_cfg)
        clip_tmpl = _template(clip, jnp.zeros((1, 77), jnp.int32))
        clip_sd = CK.clip_text_subdict(sd, CK.PREFIX_CLIP_SD15)
        clip_params, _, _ = CK.build_flax_params(
            clip_tmpl, clip_sd, prefix="", dtype=policy.param_dtype,
            strict=False,
        )

        # LoRA merge (load-time weight transform)
        for path, weight in loras:
            lora_sd = CK.load_state_dict(path)
            merged, skipped = merge_lora(unet_params, clip_params, lora_sd,
                                         weight, unet_cfg)
            logger.info("LoRA %s: merged %d modules, skipped %d", path,
                        merged, skipped)

        if faceid_ckpt:
            from cremage_tpu.io.faceid import (
                build_faceid_proj, load_faceid_checkpoint, merge_faceid,
            )

            proj_sd, ip_sd = load_faceid_checkpoint(faceid_ckpt)
            merged, installed = merge_faceid(unet_params, ip_sd, unet_cfg,
                                             weight=face_strength)
            logger.info("FaceID: merged %d lora layers, %d ipa projections",
                        merged, installed)
            _, proj_vars, kind = build_faceid_proj(
                proj_sd, dtype=policy.param_dtype)
            logger.info("FaceID image_proj layout: %s", kind)
            proj_params = proj_vars["params"]
        if use_cache:
            try:
                payload = {"unet": unet_params, "vae": vae_params,
                           "clip": clip_params}
                if proj_params is not None:
                    payload["faceid_proj"] = proj_params
                save_params_cache(ckpt, payload, extra=disk_extra)
            except Exception as e:  # cache is best-effort
                logger.warning("params cache save failed: %s", e)

    if quantize_unet and quantize_unet != "none":
        from cremage_tpu.io.quantize import quantize_params_8bit

        unet_params, qrep = quantize_params_8bit(
            unet_params, dtype=quantize_unet,
            min_size=quantize_min_size,
            include_convs=(quantize_unet == "int8"))
        logger.info("UNet quantized to %s: %d tensors, %.0f MB -> %.0f MB",
                    quantize_unet, qrep["tensors"],
                    qrep["bytes_before"] / 2**20,
                    qrep["bytes_after"] / 2**20)

    faceid_proj = None
    faceid_kind = "mlp"
    if faceid_ckpt and proj_params is not None:
        from cremage_tpu.io.faceid import proj_module_from_params

        proj, faceid_kind = proj_module_from_params(proj_params)
        faceid_proj = (proj, {"params": proj_params})

    controlnet = None
    if control_ckpt:
        from cremage_tpu.models.controlnet import ControlNet, PREFIX_CONTROLNET

        cn_sd = CK.load_state_dict(control_ckpt)
        cn = ControlNet(unet_cfg)
        cn_tmpl = _template(
            cn, jnp.zeros((1, 8, 8, 4), policy.compute_dtype),
            jnp.zeros((1, 64, 64, 3), policy.compute_dtype),
            jnp.zeros((1,)), jnp.zeros((1, 77, 768)),
        )
        cn_params, _, _ = CK.build_flax_params(
            cn_tmpl, cn_sd, PREFIX_CONTROLNET, dtype=policy.param_dtype
        )
        controlnet = (cn, {"params": cn_params})

    text = TextEncoder(clip, {"params": clip_params}, default_tokenizer(),
                       embedding_dir)
    bundle = SD15Bundle(
        unet=unet,
        unet_params={"params": unet_params},
        text=text,
        vae=vae,
        vae_params={"params": vae_params},
        schedule=S.default_sd_schedule(),
        controlnet=controlnet,
        inpaint=inpainting,
        faceid_proj=faceid_proj,
        faceid_num_tokens=num_ipa,
        faceid_kind=faceid_kind,
    )
    if use_cache:
        _bundle_cache.clear()  # hold one combination, like the reference
        _bundle_cache[cache_key] = bundle
    return bundle


def load_sdxl_bundle(
    ckpt: str,
    vae_ckpt: Optional[str] = None,
    refiner_ckpt: Optional[str] = None,
    loras: Sequence[Tuple[str, float]] = (),
    embedding_dir: Optional[str] = None,
    inpainting: bool = False,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_cache: bool = True,
    quantize_unet: Optional[str] = None,
    quantize_min_size: int = 65536,
):
    """SDXL base (+ optional refiner) bundle; overlay + LoRA merge as in
    `sdxl_image_generator.py:438-477` / `init_st`.

    quantize_unet: optional 8-bit weight storage for the base (and
    refiner) UNet — see load_sd15_bundle; applied after LoRA merges."""
    from cremage_tpu.models.open_clip import OpenCLIPTextModel, openclip_bigg_config
    from cremage_tpu.models.unet import sdxl_base_unet_config, sdxl_refiner_unet_config
    from cremage_tpu.models.vae import sdxl_vae_config
    from cremage_tpu.pipelines.sdxl import SDXLBundle, SDXLConditioner

    cache_key = ("sdxl", ckpt, vae_ckpt, refiner_ckpt, tuple(loras),
                 embedding_dir, inpainting, str(policy.param_dtype),
                 quantize_unet)
    if use_cache and cache_key in _bundle_cache:
        return _bundle_cache[cache_key]

    sd = CK.load_state_dict(ckpt)
    if vae_ckpt:
        vae_sd = CK.vae_state_dict_from_standalone(CK.load_state_dict(vae_ckpt))
        sd = CK.overlay(sd, vae_sd, key_filter=CK.PREFIX_VAE)

    dd = dict(dtype=policy.compute_dtype, param_dtype=policy.param_dtype)
    # inpainting=True expects the dedicated 9-channel SDXL inpaint UNet
    # (diffusers stable-diffusion-xl-1.0-inpainting-0.1)
    unet_cfg = sdxl_base_unet_config(**dd)
    if inpainting:
        import dataclasses as _dc
        unet_cfg = _dc.replace(unet_cfg, in_channels=9)
    unet = UNetModel(unet_cfg)
    unet_tmpl = _template(
        unet, jnp.zeros((1, 8, 8, unet_cfg.in_channels),
                        policy.compute_dtype), jnp.zeros((1,)),
        jnp.zeros((1, 77, 2048)), jnp.zeros((1, 2816)),
    )
    unet_params, _, _ = CK.build_flax_params(
        unet_tmpl, sd, CK.PREFIX_UNET, dtype=policy.param_dtype
    )

    vae = AutoencoderKL(sdxl_vae_config(**dd))
    vae_tmpl = _template(vae, jnp.zeros((1, 64, 64, 3), policy.compute_dtype))
    vae_params, _, _ = CK.build_flax_params(
        vae_tmpl, sd, CK.PREFIX_VAE, dtype=policy.param_dtype
    )

    clip = CLIPTextModel(CLIPTextConfig(**dd))
    clip_tmpl = _template(clip, jnp.zeros((1, 77), jnp.int32))
    clip_params, _, _ = CK.build_flax_params(
        clip_tmpl, CK.clip_text_subdict(sd, CK.PREFIX_CLIP_SDXL), prefix="",
        dtype=policy.param_dtype, strict=False,
    )

    oc = OpenCLIPTextModel(openclip_bigg_config(**dd))
    oc_tmpl = _template(oc, jnp.zeros((1, 77), jnp.int32))
    oc_params, _, _ = CK.build_flax_params(
        oc_tmpl, CK.openclip_text_subdict(sd, CK.PREFIX_OPENCLIP_SDXL),
        prefix="", dtype=policy.param_dtype, strict=False,
    )

    for path, weight in loras:
        lora_sd = CK.load_state_dict(path)
        merged, skipped = merge_lora(unet_params, clip_params, lora_sd,
                                     weight, unet_cfg,
                                     te2_params=oc_params)
        logger.info("LoRA %s: merged %d, skipped %d", path, merged, skipped)

    if quantize_unet and quantize_unet != "none":
        from cremage_tpu.io.quantize import quantize_params_8bit

        unet_params, qrep = quantize_params_8bit(
            unet_params, dtype=quantize_unet,
            min_size=quantize_min_size,
            include_convs=(quantize_unet == "int8"))
        logger.info("SDXL UNet quantized to %s: %d tensors, "
                    "%.0f MB -> %.0f MB", quantize_unet, qrep["tensors"],
                    qrep["bytes_before"] / 2**20,
                    qrep["bytes_after"] / 2**20)

    tok = default_tokenizer()
    conditioner = SDXLConditioner(
        (clip, {"params": clip_params}), (oc, {"params": oc_params}), tok,
        embedding_dir,
    )

    refiner_unet = refiner_params = refiner_cond = None
    if refiner_ckpt:
        rsd = CK.load_state_dict(refiner_ckpt)
        r_cfg = sdxl_refiner_unet_config(**dd)
        refiner_unet = UNetModel(r_cfg)
        r_tmpl = _template(
            refiner_unet, jnp.zeros((1, 8, 8, 4), policy.compute_dtype),
            jnp.zeros((1,)), jnp.zeros((1, 77, 1280)), jnp.zeros((1, 2560)),
        )
        rp, _, _ = CK.build_flax_params(r_tmpl, rsd, CK.PREFIX_UNET,
                                        dtype=policy.param_dtype)
        if quantize_unet and quantize_unet != "none":
            from cremage_tpu.io.quantize import quantize_params_8bit

            rp, _ = quantize_params_8bit(
                rp, dtype=quantize_unet,
                min_size=quantize_min_size,
                include_convs=(quantize_unet == "int8"))
        refiner_params = {"params": rp}
        roc = OpenCLIPTextModel(openclip_bigg_config(**dd))
        roc_params, _, _ = CK.build_flax_params(
            oc_tmpl, CK.openclip_text_subdict(
                rsd, "conditioner.embedders.0.model."),
            prefix="", dtype=policy.param_dtype, strict=False,
        )
        refiner_cond = SDXLConditioner(
            None, (roc, {"params": roc_params}), tok, embedding_dir,
            refiner_mode=True,
        )

    bundle = SDXLBundle(
        unet=unet, unet_params={"params": unet_params},
        conditioner=conditioner, vae=vae, vae_params={"params": vae_params},
        refiner_unet=refiner_unet, refiner_params=refiner_params,
        refiner_conditioner=refiner_cond, inpaint=inpainting,
    )
    if use_cache:
        _bundle_cache.clear()
        _bundle_cache[cache_key] = bundle
    return bundle


# SD3 single-file checkpoint prefixes
PREFIX_SD3_CLIP_L = "text_encoders.clip_l.transformer.text_model."
PREFIX_SD3_CLIP_G = "text_encoders.clip_g.transformer.text_model."
PREFIX_SD3_T5 = "text_encoders.t5xxl.transformer.encoder."


def _quantize_tree(params, dtype, label, min_size=65536):
    """8-bit storage for a transformer param tree (io/quantize.py) —
    the same load-time transform the reference applies to FLUX via
    optimum-quanto (flux/txt2img.py:125-135), offered uniformly on the
    big DiT families here.  int8 selects the w8a8 MXU path (convs
    included); float8_e4m3 is weight-only."""
    from cremage_tpu.io.quantize import quantize_params_8bit

    q, rep = quantize_params_8bit(params, dtype=dtype, min_size=min_size,
                                  include_convs=(dtype == "int8"))
    logger.info("%s quantized to %s: %d tensors, %.1f -> %.1f GB",
                label, dtype, rep["tensors"], rep["bytes_before"] / 1e9,
                rep["bytes_after"] / 1e9)
    return q


def load_sd3_bundle(
    ckpt: str,
    include_t5: bool = True,
    t5_tokenize=None,
    embedding_dir: Optional[str] = None,
    policy: DTypePolicy = DEFAULT_POLICY,
    quantize_t5: Optional[str] = None,
    quantize_dit: Optional[str] = None,
    quantize_min_size: int = 65536,
):
    """SD3-medium single-file checkpoint -> SD3Bundle
    (reference `modules/sd3/txt2img.py` loads the same single file via
    diffusers from_single_file).

    quantize_t5: optional 8-bit storage ("float8_e4m3") for the 4.7B
    T5-XXL tower kernels via io/quantize.py — the full SD3 bundle (DiT
    + bigG + CLIP-L + T5) does not fit a 16 GB chip at full precision.
    The reference's answer is dropping T5 (its UI exposes that choice,
    mapped here to include_t5); 8-bit T5 keeps the tower at ~1/4 the
    bytes instead — a capability beyond the reference, default off."""
    from cremage_tpu.models.mmdit import MMDiT, sd3_medium_config
    from cremage_tpu.models.open_clip import OpenCLIPTextModel, openclip_bigg_config
    from cremage_tpu.models.t5 import T5Encoder, t5_xxl_config
    from cremage_tpu.models.vae import sd3_vae_config
    from cremage_tpu.pipelines.sd3 import SD3Bundle, SD3Conditioner

    sd = CK.load_state_dict(ckpt)
    dd = dict(dtype=policy.compute_dtype, param_dtype=policy.param_dtype)

    mmdit = MMDiT(sd3_medium_config(**dd))
    m_tmpl = _template(
        mmdit, jnp.zeros((1, 16, 16, 16), policy.compute_dtype),
        jnp.zeros((1,)), jnp.zeros((1, 154, 4096)), jnp.zeros((1, 2048)),
    )
    m_params, _, _ = CK.build_flax_params(
        m_tmpl, sd, CK.PREFIX_UNET, dtype=policy.param_dtype, strict=False
    )
    if quantize_dit and quantize_dit != "none":
        m_params = _quantize_tree(m_params, quantize_dit, "SD3 MMDiT",
                                  min_size=quantize_min_size)

    vae = AutoencoderKL(sd3_vae_config(**dd))
    v_tmpl = _template(vae, jnp.zeros((1, 64, 64, 3), policy.compute_dtype))
    v_params, _, _ = CK.build_flax_params(
        v_tmpl, sd, CK.PREFIX_VAE, dtype=policy.param_dtype, strict=False
    )

    clip = CLIPTextModel(CLIPTextConfig(**dd))
    c_tmpl = _template(clip, jnp.zeros((1, 77), jnp.int32))
    c_params, _, _ = CK.build_flax_params(
        c_tmpl, CK.clip_text_subdict(sd, PREFIX_SD3_CLIP_L), prefix="",
        dtype=policy.param_dtype, strict=False,
    )

    from cremage_tpu.models.open_clip import OpenCLIPTextModel

    oc = OpenCLIPTextModel(openclip_bigg_config(**dd))
    oc_tmpl = _template(oc, jnp.zeros((1, 77), jnp.int32))
    # SD3 stores clip_g in HF layout under text_encoders.clip_g
    oc_params, _, _ = CK.build_flax_params(
        oc_tmpl, CK.openclip_text_subdict(sd, "text_encoders.clip_g.model."),
        prefix="", dtype=policy.param_dtype, strict=False,
    )

    t5_pair = None
    if include_t5 and any(k.startswith(PREFIX_SD3_T5) for k in sd):
        t5 = T5Encoder(t5_xxl_config(**dd))
        t5_tmpl = _template(t5, jnp.zeros((1, 8), jnp.int32))
        t5_sd = {}
        for k, v in sd.items():
            if not k.startswith(PREFIX_SD3_T5):
                continue
            k2 = k[len(PREFIX_SD3_T5):]
            k2 = k2.replace(
                "block.0.layer.0.SelfAttention.relative_attention_bias.weight",
                "relative_attention_bias")
            t5_sd[k2] = v
        for k, v in sd.items():
            if k.endswith("t5xxl.transformer.shared.weight"):
                t5_sd["shared"] = v
        t5_params, _, _ = CK.build_flax_params(
            t5_tmpl, t5_sd, prefix="", dtype=policy.param_dtype, strict=False
        )
        if quantize_t5 and quantize_t5 != "none":
            from cremage_tpu.io.quantize import quantize_params_8bit

            t5_params, qrep = quantize_params_8bit(t5_params,
                                                   dtype=quantize_t5)
            logger.info("Quantized T5 to 8 bits: %d tensors, %.1f -> %.1f GB",
                        qrep["tensors"], qrep["bytes_before"] / 1e9,
                        qrep["bytes_after"] / 1e9)
        t5_pair = (t5, {"params": t5_params})

    cond = SD3Conditioner(
        (clip, {"params": c_params}), (oc, {"params": oc_params}),
        default_tokenizer(), t5=t5_pair, t5_tokenize=t5_tokenize,
        embedding_dir=embedding_dir,
    )
    return SD3Bundle(mmdit=mmdit, mmdit_params={"params": m_params},
                     conditioner=cond, vae=vae,
                     vae_params={"params": v_params})


def load_pixart_bundle(
    transformer_ckpt: str,
    vae_ckpt: Optional[str] = None,
    t5_tokenize=None,
    t5_len: int = 120,
    policy: DTypePolicy = DEFAULT_POLICY,
    quantize_dit: Optional[str] = None,
    quantize_min_size: int = 65536,
):
    """PixArt-Σ diffusers transformer file -> PixArtBundle (the reference
    downloads diffusers model ids, `modules/pixart_sigma/txt2img.py:84`)."""
    from cremage_tpu.io.diffusers_keys import pixart_from_diffusers
    from cremage_tpu.models.pixart import PixArt, pixart_sigma_xl_config
    from cremage_tpu.pipelines.pixart import PixArtBundle

    dd = dict(dtype=policy.compute_dtype, param_dtype=policy.param_dtype)
    sd = pixart_from_diffusers(CK.load_state_dict(transformer_ckpt))
    dit = PixArt(pixart_sigma_xl_config(**dd))
    tmpl = _template(
        dit, jnp.zeros((1, 16, 16, 4), policy.compute_dtype),
        jnp.zeros((1,)), jnp.zeros((1, t5_len, 4096)),
    )
    params, _, _ = CK.build_flax_params(tmpl, sd, prefix="",
                                        dtype=policy.param_dtype,
                                        strict=False)
    if quantize_dit and quantize_dit != "none":
        params = _quantize_tree(params, quantize_dit, "PixArt DiT",
                                min_size=quantize_min_size)
    vae = AutoencoderKL(VAEConfig(**dd))
    v_tmpl = _template(vae, jnp.zeros((1, 64, 64, 3), policy.compute_dtype))
    if vae_ckpt:
        vsd = CK.vae_state_dict_from_standalone(CK.load_state_dict(vae_ckpt))
        v_params, _, _ = CK.build_flax_params(
            v_tmpl, vsd, CK.PREFIX_VAE, dtype=policy.param_dtype,
            strict=False)
    else:
        v_params = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), v_tmpl)
    return PixArtBundle(
        dit=dit, dit_params={"params": params}, t5=None,
        t5_tokenize=t5_tokenize, t5_len=t5_len, vae=vae,
        vae_params={"params": v_params},
    )


def load_svd_bundle(
    ckpt: str,
    num_frames: int = 14,
    policy: DTypePolicy = DEFAULT_POLICY,
    quantize_unet: Optional[str] = None,
    quantize_min_size: int = 65536,
):
    """SVD checkpoint -> SVDBundle (reference svd_video_generator
    load_video_model :338: sgm VideoUNet + open_clip_full image embedder
    + KL VAE, all inside one safetensors).

    quantize_unet: opt-in 8-bit video-UNet weight storage, uniform with
    the other families (int8 = w8a8 incl. convs — the video UNet is
    conv-bound; float8_e4m3 = weight-only matmuls)."""
    from cremage_tpu.models.clip_vision import CLIPVisionModel, vit_h14_config
    from cremage_tpu.models.video_unet import VideoUNet, svd_unet_config
    from cremage_tpu.pipelines.svd import SVDBundle

    dd = dict(dtype=policy.compute_dtype, param_dtype=policy.param_dtype)
    sd = CK.load_state_dict(ckpt)

    cfg = svd_unet_config(**dd)
    unet = VideoUNet(cfg, num_frames=num_frames)
    tmpl = _template(
        unet, jnp.zeros((num_frames, 8, 8, 8), policy.compute_dtype),
        jnp.zeros((num_frames,)), jnp.zeros((num_frames, 1, 1024)),
        jnp.zeros((num_frames, 768)),
    )
    params, _, _ = CK.build_flax_params(
        tmpl, sd, CK.PREFIX_UNET, dtype=policy.param_dtype, strict=False
    )
    if quantize_unet and quantize_unet != "none":
        params = _quantize_tree(params, quantize_unet, "SVD video UNet",
                                min_size=quantize_min_size)

    vae = AutoencoderKL(VAEConfig(**dd))
    v_tmpl = _template(vae, jnp.zeros((1, 64, 64, 3), policy.compute_dtype))
    v_params, _, _ = CK.build_flax_params(
        v_tmpl, sd, CK.PREFIX_VAE, dtype=policy.param_dtype, strict=False
    )

    clip_vision = None
    vis_prefix = "conditioner.embedders.0.open_clip.model.visual."
    if any(k.startswith(vis_prefix) for k in sd):
        cv = CLIPVisionModel(vit_h14_config(**dd))
        cv_tmpl = _template(cv, jnp.zeros((1, 224, 224, 3),
                                          policy.compute_dtype))
        vis_sd = {}
        for k, v in sd.items():
            if not k.startswith(vis_prefix):
                continue
            k2 = k[len(vis_prefix):]
            k2 = k2.replace("conv1.weight", "conv1_weight")
            vis_sd[k2] = v
        cv_params, _, _ = CK.build_flax_params(
            cv_tmpl, vis_sd, prefix="", dtype=policy.param_dtype,
            strict=False)
        clip_vision = (cv, {"params": cv_params})

    return SVDBundle(unet=unet, unet_params={"params": params}, vae=vae,
                     vae_params={"params": v_params},
                     clip_vision=clip_vision)


def load_flux_bundle(
    ckpt: str,
    vae_ckpt: str,
    clip_ckpt: Optional[str] = None,
    t5_ckpt: Optional[str] = None,
    t5_tokenize=None,
    guidance_embed: bool = False,
    policy: DTypePolicy = DEFAULT_POLICY,
    quantize: Optional[str] = "float8_e4m3",
):
    """FLUX.1 (BFL layout: bare double_blocks/single_blocks keys; VAE and
    text towers ship as separate files — reference
    `modules/flux/txt2img.py:85-120` assembles the same four parts).

    quantize: 8-bit storage dtype for the 12B transformer + T5-XXL
    kernels (the same two modules the reference qfloat8-quantizes,
    `txt2img.py:125-135`); None/"none" keeps full precision (needs a
    >24 GB-HBM chip or a sharded mesh).  CLIP and the VAE stay at full
    precision in both stacks."""
    from cremage_tpu.models.flux import FluxModel, flux_dev_config, flux_schnell_config
    from cremage_tpu.models.flux import make_position_ids
    from cremage_tpu.models.t5 import T5Encoder, t5_xxl_config
    from cremage_tpu.models.vae import flux_vae_config
    from cremage_tpu.pipelines.flux import FluxBundle, FluxConditioner

    dd = dict(dtype=policy.compute_dtype, param_dtype=policy.param_dtype)
    sd = CK.load_state_dict(ckpt)
    cfg = flux_dev_config(**dd) if guidance_embed else flux_schnell_config(**dd)
    model = FluxModel(cfg)
    txt_ids, img_ids = make_position_ids(4, 4, 8)
    # position ids are host numpy consumed with np.asarray inside the
    # model — close over them so eval_shape does not abstract them
    tmpl = jax.eval_shape(
        lambda rng: model.init(
            rng, jnp.zeros((1, 16, 64), policy.compute_dtype),
            jnp.zeros((1, 8, 4096), policy.compute_dtype), jnp.zeros((1,)),
            jnp.zeros((1, 768)), img_ids, txt_ids,
            jnp.zeros((1,)) if cfg.guidance_embed else None,
        ),
        jax.random.key(0),
    )["params"]
    prefix = "model.diffusion_model." if any(
        k.startswith("model.diffusion_model.") for k in sd) else ""
    params, _, _ = CK.build_flax_params(tmpl, sd, prefix,
                                        dtype=policy.param_dtype,
                                        strict=False)
    if quantize and quantize != "none":
        from cremage_tpu.io.quantize import quantize_params_8bit

        params, qrep = quantize_params_8bit(params, dtype=quantize)
        logger.info(
            "Quantized FLUX transformer to 8 bits: %d tensors, %.1f -> %.1f GB",
            qrep["tensors"], qrep["bytes_before"] / 1e9,
            qrep["bytes_after"] / 1e9)

    vsd = CK.load_state_dict(vae_ckpt)
    vae = AutoencoderKL(flux_vae_config(**dd))
    v_tmpl = _template(vae, jnp.zeros((1, 64, 64, 3), policy.compute_dtype))
    vprefix = CK.PREFIX_VAE if any(
        k.startswith(CK.PREFIX_VAE) for k in vsd) else ""
    v_params, _, _ = CK.build_flax_params(v_tmpl, vsd, vprefix,
                                          dtype=policy.param_dtype,
                                          strict=False)

    clip = CLIPTextModel(CLIPTextConfig(**dd))
    c_tmpl = _template(clip, jnp.zeros((1, 77), jnp.int32))
    c_params = None
    if clip_ckpt:
        csd = CK.load_state_dict(clip_ckpt)
        c_params, _, _ = CK.build_flax_params(
            c_tmpl, CK.clip_text_subdict(csd, "text_model."), prefix="",
            dtype=policy.param_dtype, strict=False,
        )
    t5_pair = None
    if t5_ckpt:
        tsd = CK.load_state_dict(t5_ckpt)
        t5 = T5Encoder(t5_xxl_config(**dd))
        t5_tmpl = _template(t5, jnp.zeros((1, 8), jnp.int32))
        t5_sd = {k[len("encoder."):] if k.startswith("encoder.") else k: v
                 for k, v in tsd.items()}
        t5_sd = {k.replace(
            "block.0.layer.0.SelfAttention.relative_attention_bias.weight",
            "relative_attention_bias").replace("shared.weight", "shared"): v
            for k, v in t5_sd.items()}
        t5_params, _, _ = CK.build_flax_params(
            t5_tmpl, t5_sd, prefix="", dtype=policy.param_dtype, strict=False
        )
        if quantize and quantize != "none":
            from cremage_tpu.io.quantize import quantize_params_8bit

            t5_params, qrep = quantize_params_8bit(t5_params, dtype=quantize)
            logger.info("Quantized T5 to 8 bits: %d tensors, %.1f -> %.1f GB",
                        qrep["tensors"], qrep["bytes_before"] / 1e9,
                        qrep["bytes_after"] / 1e9)
        t5_pair = (t5, {"params": t5_params})

    cond = FluxConditioner(
        (clip, {"params": c_params} if c_params else clip.init(
            jax.random.key(0), jnp.zeros((1, 77), jnp.int32))),
        default_tokenizer(), t5=t5_pair, t5_tokenize=t5_tokenize,
    )
    return FluxBundle(model=model, params={"params": params},
                      conditioner=cond, vae=vae,
                      vae_params={"params": v_params})


def load_cascade_bundle(
    stage_c_ckpt: str,
    stage_b_ckpt: str,
    text_encoder_ckpt: str,
    vqgan_ckpt: Optional[str] = None,
    policy: DTypePolicy = DEFAULT_POLICY,
    stage_c_cfg=None,
    stage_b_cfg=None,
    vq_cfg=None,
):
    """Assemble the full Stable Cascade stack (reference
    modules/stable_cascade/txt2img.py: StableCascadePriorPipeline +
    StableCascadeDecoderPipeline = Stage C prior + Stage B decoder +
    Paella VQGAN Stage A, all conditioned on the bigG text tower).
    Text tokens follow the diffusers contract (hidden_states[-1], i.e.
    pre-final-LN) with the projected pooled embedding.  The *_cfg
    overrides load tiny synthetic checkpoints through the full real
    conversion path (tests)."""
    from cremage_tpu.pipelines.cascade import CascadeBundle

    sc, scp = load_cascade_stage_c(stage_c_ckpt, policy, cfg=stage_c_cfg)
    sb, sbp = load_cascade_stage_b(stage_b_ckpt, policy, cfg=stage_b_cfg)
    _, _, text_encode = load_hf_clip_text_tower(text_encoder_ckpt, policy,
                                                pre_final_ln=True)

    decode_latent = None
    if vqgan_ckpt:
        from cremage_tpu.io.diffusers_keys import (
            paella_vq_decoder_from_diffusers,
        )
        from cremage_tpu.models.vq import PaellaVQConfig, PaellaVQDecoder

        cfgv = vq_cfg or PaellaVQConfig(dtype=policy.compute_dtype,
                                        param_dtype=policy.param_dtype)
        dec = PaellaVQDecoder(cfgv)
        vsd = paella_vq_decoder_from_diffusers(CK.load_state_dict(vqgan_ckpt))
        v_tmpl = _template(dec, jnp.zeros((1, 8, 8, cfgv.latent_channels),
                                          policy.compute_dtype))
        v_params, _, _ = CK.build_flax_params(v_tmpl, vsd, prefix="",
                                              dtype=policy.param_dtype,
                                              strict=False)

        def decode_latent(lat):
            # StableCascadeDecoderPipeline: latents *= scale_factor
            # (cached jitted call — eager forwards cost seconds of
            # dispatch on the tunneled TPU backend, core/jitcache.py)
            from cremage_tpu.core.jitcache import jit_apply

            z = jnp.asarray(lat, policy.compute_dtype) * cfgv.scale_factor
            img = jit_apply(dec)({"params": v_params}, z)
            return np.asarray(img, np.float32)     # [-1,1]

    return CascadeBundle(
        stage_c=sc, stage_c_params=scp, stage_b=sb, stage_b_params=sbp,
        vqgan=None, vqgan_params=None, text_encode=text_encode,
        decode_latent=decode_latent,
    )


def load_kandinsky_prior(
    prior_ckpt: str,
    policy: DTypePolicy = DEFAULT_POLICY,
    cfg=None,
):
    """Kandinsky 2.2 diffusers PriorTransformer file -> (DiffusionPrior,
    params, clip_mean, clip_std). The reference downloads this stage via
    AutoPipeline (`modules/kandinsky/txt2img.py:26,66`); clip stats are
    the prior's output unnormalization buffers (KandinskyBundle.clip_*)."""
    from cremage_tpu.io.diffusers_keys import kandinsky_prior_from_diffusers
    from cremage_tpu.models.kandinsky import DiffusionPrior, PriorConfig

    sd = kandinsky_prior_from_diffusers(CK.load_state_dict(prior_ckpt))
    clip_mean = sd.pop("clip_mean", None)
    clip_std = sd.pop("clip_std", None)
    if cfg is None:
        cfg = PriorConfig(dtype=policy.compute_dtype,
                          param_dtype=policy.param_dtype)
    prior = DiffusionPrior(cfg)
    ied, ted = cfg.image_embed_dim, cfg.text_embed_dim
    tmpl = _template(
        prior, jnp.zeros((1, ied), policy.compute_dtype), jnp.zeros((1,)),
        jnp.zeros((1, cfg.text_tokens, ted), policy.compute_dtype),
        jnp.zeros((1, ted), policy.compute_dtype),
    )
    params, _, _ = CK.build_flax_params(tmpl, sd, prefix="",
                                        dtype=policy.param_dtype,
                                        strict=False)
    if clip_mean is not None:
        clip_mean = clip_mean.reshape(-1)
    if clip_std is not None:
        clip_std = clip_std.reshape(-1)
    return prior, {"params": params}, clip_mean, clip_std


def load_kandinsky_decoder(
    unet_ckpt: str,
    in_channels: int = 4,
    policy: DTypePolicy = DEFAULT_POLICY,
    unet_cfg=None,
):
    """Kandinsky 2.2 diffusers decoder-UNet file -> (KandinskyUNet,
    params, KandinskyImageConditioner, cond_params). Conditioner dims
    (time_embed_dim / cross_dim / num_tokens) are derived from the head
    tensor shapes so both decoder and inpaint-decoder files load."""
    from cremage_tpu.io.diffusers_keys import kandinsky_decoder_from_diffusers
    from cremage_tpu.models.kandinsky import KandinskyImageConditioner
    from cremage_tpu.models.kandinsky_decoder import (
        KandinskyUNet, KandinskyUNetConfig,
    )

    raw = CK.load_state_dict(unet_ckpt)
    body, cond_sd = kandinsky_decoder_from_diffusers(raw)

    embed_dim = cond_sd["image_proj.weight"].shape[1]
    ted = cond_sd["image_proj.weight"].shape[0]
    cross_dim = cond_sd["context_norm.weight"].shape[0]
    num_tokens = cond_sd["context_proj.weight"].shape[0] // cross_dim

    if unet_cfg is not None:
        import dataclasses as _dc

        cfg = _dc.replace(
            unet_cfg, in_channels=in_channels, context_dim=cross_dim,
            dtype=policy.compute_dtype, param_dtype=policy.param_dtype,
        )
    else:
        cfg = KandinskyUNetConfig(
            in_channels=in_channels, context_dim=cross_dim,
            dtype=policy.compute_dtype, param_dtype=policy.param_dtype,
        )
    model = KandinskyUNet(cfg)
    tmpl = _template(
        model, jnp.zeros((1, 8, 8, in_channels), policy.compute_dtype),
        jnp.zeros((1,)),
        jnp.zeros((1, num_tokens, cross_dim), policy.compute_dtype),
        jnp.zeros((1, cfg.time_embed_dim), policy.compute_dtype),
    )
    params, _, _ = CK.build_flax_params(tmpl, body, prefix="",
                                        dtype=policy.param_dtype,
                                        strict=False)
    cond = KandinskyImageConditioner(
        time_embed_dim=ted, cross_dim=cross_dim, num_tokens=num_tokens,
        dtype=policy.compute_dtype, param_dtype=policy.param_dtype)
    c_tmpl = _template(cond, jnp.zeros((1, embed_dim), policy.compute_dtype))
    c_params, _, _ = CK.build_flax_params(c_tmpl, cond_sd, prefix="",
                                          dtype=policy.param_dtype,
                                          strict=False)
    return (model, {"params": params}, cond, {"params": c_params})


def load_hunyuan_dit(
    dit_ckpt: str,
    policy: DTypePolicy = DEFAULT_POLICY,
    cfg=None,
):
    """Hunyuan-DiT diffusers transformer file -> (HunyuanDiT, params)
    (the reference downloads the diffusers HunyuanDiTPipeline,
    modules/hunyuan_dit/txt2img.py)."""
    from cremage_tpu.io.diffusers_keys import hunyuan_from_diffusers
    from cremage_tpu.models.hunyuan import HunyuanConfig, HunyuanDiT

    sd = hunyuan_from_diffusers(CK.load_state_dict(dit_ckpt))
    if cfg is None:
        cfg = HunyuanConfig(dtype=policy.compute_dtype,
                            param_dtype=policy.param_dtype)
    model = HunyuanDiT(cfg)
    tmpl = _template(
        model,
        jnp.zeros((1, 16, 16, cfg.in_channels), policy.compute_dtype),
        jnp.zeros((1,)),
        jnp.zeros((1, cfg.text_len, cfg.clip_dim), policy.compute_dtype),
        jnp.zeros((1, cfg.text_len_t5, cfg.mt5_dim), policy.compute_dtype),
    )
    params, _, _ = CK.build_flax_params(tmpl, sd, prefix="",
                                        dtype=policy.param_dtype,
                                        strict=False)
    return model, {"params": params}


def load_hunyuan_bundle(
    dit_ckpt: str,
    vae_ckpt: Optional[str] = None,
    clip_ckpt: Optional[str] = None,
    clip_vocab: Optional[str] = None,
    mt5_ckpt: Optional[str] = None,
    mt5_tokenize=None,
    policy: DTypePolicy = DEFAULT_POLICY,
    dit_cfg=None,
    clip_cfg=None,
    mt5_cfg=None,
    vae_cfg=None,
    quantize_dit: Optional[str] = None,
    quantize_min_size: int = 65536,
):
    """Assemble the full Hunyuan-DiT stack (reference
    modules/hunyuan_dit/txt2img.py: diffusers HunyuanDiTPipeline =
    bilingual Chinese-CLIP BertModel + mT5-XL + depth-40 DiT + the SDXL
    KL VAE).  clip_ckpt/clip_vocab feed the BertModel branch (HF
    BertModel layout + vocab.txt); mt5_ckpt/mt5_tokenize the mT5 branch
    (T5EncoderModel layout + spiece.model path or callable).  Either
    branch may be omitted — the conditioner zero-fills it (weights are
    runtime downloads in the reference too).  The *_cfg overrides load
    tiny synthetic checkpoints through the full real conversion path
    (tests)."""
    from cremage_tpu.models.bert import BertModel, hunyuan_clip_config
    from cremage_tpu.models.t5 import T5Encoder, mt5_xl_config
    from cremage_tpu.models.vae import sdxl_vae_config
    from cremage_tpu.pipelines.hunyuan import (
        HunyuanBundle, make_hunyuan_text_encode,
    )

    dit, dit_params = load_hunyuan_dit(dit_ckpt, policy, cfg=dit_cfg)
    if quantize_dit and quantize_dit != "none":
        dit_params = {"params": _quantize_tree(
            dit_params["params"], quantize_dit, "Hunyuan DiT",
            min_size=quantize_min_size)}
    dcfg = dit.cfg

    import dataclasses as _dc

    dd = dict(dtype=policy.compute_dtype, param_dtype=policy.param_dtype)
    vcfg = (_dc.replace(vae_cfg, **dd) if vae_cfg is not None
            else sdxl_vae_config(**dd))
    vae = AutoencoderKL(vcfg)
    v_tmpl = _template(vae, jnp.zeros((1, 64, 64, 3), policy.compute_dtype))
    if vae_ckpt:
        vsd = CK.vae_state_dict_from_standalone(CK.load_state_dict(vae_ckpt))
        v_params, _, _ = CK.build_flax_params(
            v_tmpl, vsd, CK.PREFIX_VAE, dtype=policy.param_dtype,
            strict=False)
    else:
        v_params = jax.tree.map(lambda t: jnp.zeros(t.shape, t.dtype),
                                v_tmpl)

    clip_pair = None
    if clip_ckpt:
        bcfg = (_dc.replace(clip_cfg, **dd) if clip_cfg is not None
                else hunyuan_clip_config(**dd))
        bert = BertModel(bcfg)
        b_tmpl = _template(bert, jnp.zeros((1, 8), jnp.int32))
        bsd = CK.load_state_dict(clip_ckpt)
        # plain BertModel layout; tolerate a bert. prefix
        if any(k.startswith("bert.") for k in bsd):
            bsd = {k[len("bert."):]: v for k, v in bsd.items()
                   if k.startswith("bert.")}
        b_params, _, _ = CK.build_flax_params(b_tmpl, bsd, prefix="",
                                              dtype=policy.param_dtype,
                                              strict=False)
        clip_pair = (bert, {"params": b_params})

    mt5_pair = None
    if mt5_ckpt:
        tcfg = (_dc.replace(mt5_cfg, **dd) if mt5_cfg is not None
                else mt5_xl_config(**dd))
        t5 = T5Encoder(tcfg)
        t5_tmpl = _template(t5, jnp.zeros((1, 8), jnp.int32))
        tsd = CK.load_state_dict(mt5_ckpt)
        t5_sd = {k[len("encoder."):] if k.startswith("encoder.") else k: v
                 for k, v in tsd.items()}
        t5_sd = {k.replace(
            "block.0.layer.0.SelfAttention.relative_attention_bias.weight",
            "relative_attention_bias").replace("shared.weight", "shared"): v
            for k, v in t5_sd.items()}
        t5_params, _, _ = CK.build_flax_params(
            t5_tmpl, t5_sd, prefix="", dtype=policy.param_dtype,
            strict=False)
        mt5_pair = (t5, {"params": t5_params})

    if clip_pair is not None and clip_vocab:
        text_encode = make_hunyuan_text_encode(
            clip_pair, clip_vocab, mt5_pair=mt5_pair,
            mt5_spiece=mt5_tokenize, clip_len=dcfg.text_len,
            mt5_len=dcfg.text_len_t5, mt5_dim=dcfg.mt5_dim)
    else:
        def text_encode(prompt: str):
            return (np.zeros((dcfg.text_len, dcfg.clip_dim), np.float32),
                    np.zeros((dcfg.text_len_t5, dcfg.mt5_dim), np.float32))

    return HunyuanBundle(dit=dit, dit_params=dit_params, vae=vae,
                         vae_params={"params": v_params},
                         text_encode=text_encode)


def load_movq_decoder(
    movq_ckpt: str,
    policy: DTypePolicy = DEFAULT_POLICY,
    cfg=None,
):
    """Kandinsky 2.2 MoVQ file -> (MoVQDecoder, params, codebook,
    post_quant_conv (w, b) numpy pair or None).
    The codebook ('quantize.embedding') is returned for index-decoding;
    diffusers VQModel.decode runs decoder(post_quant_conv(z), zq=z), so
    callers apply the returned 1x1 before the decoder input while the
    raw z conditions the spatial norms."""
    from cremage_tpu.io.diffusers_keys import movq_decoder_from_diffusers
    from cremage_tpu.models.vq import MoVQConfig, MoVQDecoder

    sd = movq_decoder_from_diffusers(CK.load_state_dict(movq_ckpt))
    codebook = sd.pop("quantize.embedding", None)
    pq_w = sd.pop("post_quant_conv.weight", None)
    pq_b = sd.pop("post_quant_conv.bias", None)
    post_quant = None
    if pq_w is not None:
        post_quant = (np.asarray(pq_w), np.asarray(pq_b))
    if cfg is None:
        cfg = MoVQConfig(dtype=policy.compute_dtype,
                         param_dtype=policy.param_dtype)
    dec = MoVQDecoder(cfg)
    tmpl = _template(dec, jnp.zeros((1, 8, 8, cfg.latent_channels),
                                    policy.compute_dtype))
    params, _, _ = CK.build_flax_params(tmpl, sd, prefix="",
                                        dtype=policy.param_dtype,
                                        strict=False)
    return dec, {"params": params}, codebook, post_quant


def load_hf_clip_text_tower(
    text_ckpt: str,
    policy: DTypePolicy = DEFAULT_POLICY,
    pre_final_ln: bool = False,
):
    """HF CLIPTextModelWithProjection file -> (OpenCLIPTextModel, params,
    text_encode).  Kandinsky 2.2's prior and Stable Cascade's prior both
    condition on this bigG-class tower shipped in HF layout (the
    reference downloads it inside the diffusers pipelines,
    modules/kandinsky/txt2img.py:26 / modules/stable_cascade/txt2img.py);
    dims are derived from the tensors so tiny synthetic checkpoints load
    the same way the 1280-wide release files do.

    text_encode(prompt) -> (last_hidden (77, width) fp32,
    projected-pooled (width,) fp32) — diffusers' last_hidden_state +
    text_embeds pair, pooled at the first EOS like
    CLIPTextModelWithProjection.  pre_final_ln=True returns
    hidden_states[-1] (the last block output BEFORE the final LN)
    instead — Stable Cascade's prompt_embeds contract
    (StableCascadePriorPipeline passes output_hidden_states=True and
    takes hidden_states[-1]).  Divergence note: HF masks pad tokens
    in downstream attention via attention_mask; our towers follow the
    SD convention of EOS-padded unmasked context.
    """
    from cremage_tpu.models.open_clip import (
        OpenCLIPTextConfig, OpenCLIPTextModel,
    )

    mapped = CK.hf_clip_text_to_openclip_subdict(CK.load_state_dict(text_ckpt))
    vocab, width = mapped["token_embedding"].shape
    layers = 1 + max(
        int(re.match(r"transformer\.resblocks\.(\d+)\.", k).group(1))
        for k in mapped if k.startswith("transformer.resblocks."))
    mlp_ratio = mapped["transformer.resblocks.0.mlp.c_fc.weight"
                       ].shape[0] // width
    max_pos = mapped["positional_embedding"].shape[0]
    cfg = OpenCLIPTextConfig(
        vocab_size=vocab, width=width, num_layers=layers,
        num_heads=max(1, width // 64), mlp_ratio=mlp_ratio,
        max_positions=max_pos, dtype=policy.compute_dtype,
        param_dtype=policy.param_dtype)
    tower = OpenCLIPTextModel(cfg)
    tmpl = _template(tower, jnp.zeros((1, max_pos), jnp.int32))
    params, _, _ = CK.build_flax_params(tmpl, mapped, prefix="",
                                        dtype=policy.param_dtype,
                                        strict=False)
    tok = default_tokenizer()

    def text_encode(prompt: str):
        ids = tok.encode_with_specials(prompt, max_len=max_pos)
        eos_pos = min(len(tok.encode(prompt)), max_pos - 2) + 1
        from cremage_tpu.core.jitcache import jit_apply

        hidden, final = jit_apply(tower)({"params": params},
                                         jnp.asarray([ids], jnp.int32))
        pooled = jit_apply(tower, OpenCLIPTextModel.project_pooled)(
            {"params": params}, final, jnp.asarray([eos_pos]))
        toks = hidden[-1] if pre_final_ln else final
        return (np.asarray(toks[0], np.float32),
                np.asarray(pooled[0], np.float32))

    return tower, params, text_encode


def load_kandinsky_bundle(
    prior_ckpt: str,
    decoder_ckpt: str,
    text_encoder_ckpt: str,
    movq_ckpt: Optional[str] = None,
    policy: DTypePolicy = DEFAULT_POLICY,
    prior_cfg=None,
    movq_cfg=None,
    decoder_cfg=None,
):
    """Assemble the full Kandinsky 2.2 stack (reference
    modules/kandinsky/txt2img.py:26,66: AutoPipeline = prior
    (PriorTransformer + bigG text tower) -> decoder UNet conditioned on
    the diffused image embedding -> MoVQ decode).  Paths point at the
    individual diffusers component files; movq_ckpt may be omitted to
    fall back to index-free KL-style decode via a caller-provided vae.
    The *_cfg overrides load tiny synthetic checkpoints through the full
    real conversion path (tests)."""
    from cremage_tpu.pipelines.kandinsky import KandinskyBundle

    prior, prior_params, clip_mean, clip_std = load_kandinsky_prior(
        prior_ckpt, policy, cfg=prior_cfg)
    decoder, dec_params, cond, cond_params = load_kandinsky_decoder(
        decoder_ckpt, policy=policy, unet_cfg=decoder_cfg)
    _, _, text_encode = load_hf_clip_text_tower(text_encoder_ckpt, policy)

    decode_latent = None
    if movq_ckpt:
        movq, movq_params, _codebook, post_quant = load_movq_decoder(
            movq_ckpt, policy, cfg=movq_cfg)

        def decode_latent(lat):
            z = jnp.asarray(lat, policy.compute_dtype)
            x = z
            if post_quant is not None:
                w, b = post_quant            # torch 1x1 conv (O, I, 1, 1)
                x = jnp.einsum(
                    "bhwi,oi->bhwo", z,
                    jnp.asarray(w[:, :, 0, 0], policy.compute_dtype),
                ) + jnp.asarray(b, policy.compute_dtype)
            from cremage_tpu.core.jitcache import jit_apply

            img = jit_apply(movq)(movq_params, z, x)
            return np.asarray(img, np.float32)   # [-1,1]

    return KandinskyBundle(
        prior=prior, prior_params=prior_params,
        decoder=decoder, decoder_params=dec_params,
        vae=None, vae_params=None, text_encode=text_encode,
        image_cond=cond, image_cond_params=cond_params,
        clip_mean=clip_mean, clip_std=clip_std,
        decode_latent=decode_latent,
    )


def load_cascade_stage_b(
    ckpt: str,
    policy: DTypePolicy = DEFAULT_POLICY,
    cfg=None,
):
    """Stable Cascade Stage B diffusers file -> (StageB, params)
    (reference modules/stable_cascade/txt2img.py
    StableCascadeDecoderPipeline)."""
    from cremage_tpu.io.diffusers_keys import cascade_unet_from_diffusers
    from cremage_tpu.models.cascade import StageB, StageBConfig

    sd = cascade_unet_from_diffusers(CK.load_state_dict(ckpt))
    if cfg is None:
        cfg = StageBConfig(dtype=policy.compute_dtype,
                           param_dtype=policy.param_dtype)
    model = StageB(cfg)
    tmpl = _template(
        model, jnp.zeros((1, 16, 16, cfg.in_channels), policy.compute_dtype),
        jnp.zeros((1,)),
        jnp.zeros((1, 4, 4, cfg.effnet_channels), policy.compute_dtype),
        jnp.zeros((1, cfg.clip_text_pooled_dim), policy.compute_dtype),
    )
    params, _, _ = CK.build_flax_params(tmpl, sd, prefix="",
                                        dtype=policy.param_dtype,
                                        strict=False)
    return model, {"params": params}


def load_cascade_stage_c(
    ckpt: str,
    policy: DTypePolicy = DEFAULT_POLICY,
    cfg=None,
):
    """Stable Cascade Stage C diffusers file -> (StageC, params)
    (reference modules/stable_cascade/txt2img.py StableCascadePrior
    Pipeline)."""
    from cremage_tpu.io.diffusers_keys import cascade_unet_from_diffusers
    from cremage_tpu.models.cascade import StageC, StageCConfig

    sd = cascade_unet_from_diffusers(CK.load_state_dict(ckpt))
    if cfg is None:
        cfg = StageCConfig(dtype=policy.compute_dtype,
                           param_dtype=policy.param_dtype)
    model = StageC(cfg)
    tmpl = _template(
        model, jnp.zeros((1, 24, 24, cfg.in_channels), policy.compute_dtype),
        jnp.zeros((1,)),
        jnp.zeros((1, 77, cfg.clip_text_dim), policy.compute_dtype),
        jnp.zeros((1, cfg.clip_text_pooled_dim), policy.compute_dtype),
    )
    params, _, _ = CK.build_flax_params(tmpl, sd, prefix="",
                                        dtype=policy.param_dtype,
                                        strict=False)
    return model, {"params": params}
