"""User preferences + per-job generation options.

Mirrors the reference's three-tier config system
(`modules/cremage/configs/preferences.py:10-118` Config dataclass +
default-creating loader :119-236; per-backend argparse namespaces,
`modules/sd/options.py`) with plain dataclasses + PyYAML — no OmegaConf.

`Preferences` is the persistent app config (config.yaml in the app root,
created with defaults on first load, unknown keys preserved).
`GenerationOptions` is the per-job options namespace that crosses the job
queue and is serialized into PNG `generation_data` metadata.
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import yaml

# Generator model types (reference modules/cremage/const/const.py:17-24).
GMT_SD_1_5 = "SD 1.5"
GMT_SDXL = "SDXL"
GMT_SD_3 = "SD 3"
GMT_STABLE_CASCADE = "Stable Cascade"
GMT_PIXART_SIGMA = "PixArt-Sigma"
GMT_KANDINSKY_2_2 = "Kandinsky 2.2"
GMT_HUNYUAN_DIT = "Hunyuan DiT"
GMT_FLUX_1_SCHNELL = "FLUX.1-schnell"
GMT_SVD = "SVD"
GENERATOR_MODEL_TYPES = [
    GMT_SD_1_5, GMT_SDXL, GMT_SD_3, GMT_STABLE_CASCADE, GMT_PIXART_SIGMA,
    GMT_KANDINSKY_2_2, GMT_HUNYUAN_DIT, GMT_FLUX_1_SCHNELL, GMT_SVD,
]

# Generation modes (const.py:4-6).
MODE_TEXT_TO_IMAGE = "text_to_image"
MODE_IMAGE_TO_IMAGE = "image_to_image"
MODE_INPAINTING = "inpainting"
# the spot inpainter tool routed as a job mode (tools/spot_inpainter.py)
MODE_SPOT_INPAINTING = "spot_inpainting"
# the standalone face-fix tool routed as a job mode: detect (or take
# user-marked) face boxes, img2img-repair each crop, paste back
# (tools/face_detector.py + face_detector_engine.py:432)
MODE_FACE_FIX = "face_fix"

# Face detection methods (const.py:37-40).
FACE_DETECTION_METHODS = ["InsightFace", "OpenCV"]


@dataclass
class Preferences:
    """Persistent app preferences; field set mirrors the reference Config
    (`preferences.py:10-118`), defaults mirror :123-232."""

    safety_check: bool = True
    watermark: bool = False
    image_width: int = 512
    image_height: int = 512
    clip_skip: int = 1
    denoising_strength: float = 0.7
    batch_size: int = 1
    number_of_batches: int = 1
    ldm_model_path: str = "models/ldm"
    ldm_model: str = "v1-5-pruned.safetensors"
    ldm_inpaint_model: str = "sd-v1-5-inpainting.safetensors"
    vae_model_path: str = "models/vae"
    vae_model: str = "vae-ft-mse-840000-ema-pruned.safetensors"
    control_model_path: str = "models/control_net"
    control_model: str = "None"
    sdxl_ldm_model_path: str = "models/ldm"
    sdxl_ldm_model: str = "None"
    refiner_sdxl_ldm_model: str = "None"
    sdxl_ldm_inpaint_model: str = "None"
    sdxl_vae_model_path: str = "models/vae"
    sdxl_vae_model: str = "None"
    refiner_sdxl_vae_model: str = "None"
    svd_model_path: str = "models/svd"
    discretization: str = "LegacyDDPMDiscretization"
    discretization_sigma_min: float = 0.0292
    discretization_sigma_max: float = 14.6146
    discretization_rho: float = 3.0
    sampler: str = "DDIM"
    sdxl_sampler: str = "DPMPP2M"
    sampler_s_churn: float = 0.0
    sampler_s_tmin: float = 0.0
    sampler_s_tmax: float = 999.0
    sampler_s_noise: float = 1.0
    sampler_eta: float = 1.0
    sampler_order: int = 4
    sampling_steps: int = 50
    cfg: float = 7.5
    guider: str = "VanillaCFG"
    linear_prediction_guider_min_scale: float = 1.0
    linear_prediction_guider_max_scale: float = 1.5
    triangle_prediction_guider_min_scale: float = 1.0
    triangle_prediction_guider_max_scale: float = 2.5
    lora_model_path: str = "models/loras"
    lora_model_1: str = "None"
    lora_model_2: str = "None"
    lora_model_3: str = "None"
    lora_model_4: str = "None"
    lora_model_5: str = "None"
    lora_weight_1: float = 1.0
    lora_weight_2: float = 1.0
    lora_weight_3: float = 1.0
    lora_weight_4: float = 1.0
    lora_weight_5: float = 1.0
    sdxl_lora_model_path: str = "models/loras"
    sdxl_lora_model_1: str = "None"
    sdxl_lora_model_2: str = "None"
    sdxl_lora_model_3: str = "None"
    sdxl_lora_model_4: str = "None"
    sdxl_lora_model_5: str = "None"
    sdxl_lora_weight_1: float = 1.0
    sdxl_lora_weight_2: float = 1.0
    sdxl_lora_weight_3: float = 1.0
    sdxl_lora_weight_4: float = 1.0
    sdxl_lora_weight_5: float = 1.0
    sdxl_use_refiner: bool = False
    sdxl_refiner_strength: float = 0.0
    refiner_sdxl_lora_model_1: str = "None"
    refiner_sdxl_lora_model_2: str = "None"
    refiner_sdxl_lora_model_3: str = "None"
    refiner_sdxl_lora_model_4: str = "None"
    refiner_sdxl_lora_model_5: str = "None"
    refiner_sdxl_lora_weight_1: float = 1.0
    refiner_sdxl_lora_weight_2: float = 1.0
    refiner_sdxl_lora_weight_3: float = 1.0
    refiner_sdxl_lora_weight_4: float = 1.0
    refiner_sdxl_lora_weight_5: float = 1.0
    embedding_path: str = "models/embeddings"
    sdxl_embedding_path: str = "models/embeddings_sdxl"
    positive_prompt_pre_expansion: str = (
        "score_9, score_8_up, score_7_up, score_6_up, score_4_up, "
        "rating_safe, source_anime, "
    )
    negative_prompt_pre_expansion: str = "score_4, score_5, score_6, "
    enable_positive_prompt_pre_expansion: bool = False
    enable_negative_prompt_pre_expansion: bool = False
    positive_prompt_expansion: str = (
        ", highly detailed, photorealistic, 4k, 8k, uhd, highres, "
        "raw photo, best quality, masterpiece"
    )
    negative_prompt_expansion: str = ", worst quality, low quality, lowres"
    enable_positive_prompt_expansion: bool = True
    enable_negative_prompt_expansion: bool = True
    enable_hf_internet_connection: bool = True
    seed: int = -1
    hires_fix_upscaler: str = "None"
    hires_fix_scale_factor: float = 1.5
    auto_face_fix: bool = False
    hide_k_diffusion_samplers: bool = True
    face_strength: float = 1.0
    generator_model_type: str = GMT_SD_1_5
    wildcards_path: str = "data/wildcards"
    inpaint_max_edge_len: int = 512
    sd3_ldm_model_path: str = "models/sd3_ldm"
    sd3_ldm_model: str = "None"
    pixart_sigma_ldm_model_path: str = "models/pixart_sigma_ldm"
    pixart_sigma_ldm_model: str = "None"
    pixart_sigma_model_id: str = "None"
    auto_face_fix_strength: float = 0.3
    auto_face_fix_prompt: str = ""
    auto_face_fix_face_detection_method: str = "InsightFace"
    low_mem: bool = True
    keep_instance: bool = False

    # --- TPU-specific additions (not in the reference) ---
    mesh_data_axis: int = -1     # -1 = all devices
    mesh_model_axis: int = 1
    compute_dtype: str = "bfloat16"

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


_FIELD_NAMES = {f.name for f in dataclasses.fields(Preferences)}


def load_preferences(path: str) -> Preferences:
    """Load config.yaml, creating it with defaults on first run
    (reference `load_user_config` preferences.py:119)."""
    if not os.path.exists(path):
        prefs = Preferences()
        save_preferences(prefs, path)
        return prefs
    with open(path, "r") as f:
        data = yaml.safe_load(f) or {}
    known = {k: v for k, v in data.items() if k in _FIELD_NAMES}
    return dataclasses.replace(Preferences(), **known)


def save_preferences(prefs: Preferences, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(prefs.to_dict(), f, sort_keys=False)


@dataclass
class GenerationOptions:
    """Per-job options namespace — the equivalent of the reference's
    argparse namespaces (`modules/sd/options.py` ~50 flags). This is what
    crosses the job queue and round-trips through PNG metadata."""

    # Core prompt/sampling options
    prompt: str = ""
    negative_prompt: str = ""
    H: int = 512
    W: int = 512
    C: int = 4                   # latent channels
    f: int = 8                   # VAE downsampling factor
    sampling_steps: int = 50
    sampler: str = "DDIM"
    scale: float = 7.5           # CFG scale
    ddim_eta: float = 0.0
    n_samples: int = 1
    n_iter: int = 1
    seed: int = -1
    clip_skip: int = 1
    # Model selection
    ckpt: str = ""
    vae_ckpt: str = ""
    control_net: str = ""
    inpaint_ckpt: str = ""
    refiner_ckpt: str = ""
    refiner_strength: float = 0.0
    lora_models: str = ""        # comma-separated paths (reference format)
    lora_weights: str = ""       # comma-separated floats
    embedding_path: str = ""
    # Mode inputs
    mode: str = MODE_TEXT_TO_IMAGE
    init_img: str = ""
    mask_img: str = ""
    strength: float = 0.75       # img2img denoising strength
    # Feature toggles
    safety_check: bool = True
    watermark: bool = False
    use_hires_fix: bool = False
    hires_fix_upscaler: str = "Latent"
    hires_fix_scale_factor: float = 1.5
    auto_face_fix: bool = False
    auto_face_fix_strength: float = 0.3
    auto_face_fix_prompt: str = ""
    auto_face_fix_face_detection_method: str = "InsightFace"
    # FaceID
    face_input_img: str = ""
    face_model: str = ""
    face_strength: float = 1.0
    # SDXL / EDM extras
    discretization: str = "LegacyDDPMDiscretization"
    discretization_sigma_min: float = 0.0292
    discretization_sigma_max: float = 14.6146
    discretization_rho: float = 3.0
    guider: str = "VanillaCFG"
    linear_prediction_guider_min_scale: float = 1.0
    linear_prediction_guider_max_scale: float = 1.5
    triangle_prediction_guider_min_scale: float = 1.0
    triangle_prediction_guider_max_scale: float = 2.5
    sampler_s_churn: float = 0.0
    sampler_s_tmin: float = 0.0
    sampler_s_tmax: float = 999.0
    sampler_s_noise: float = 1.0
    sampler_eta: float = 1.0
    sampler_order: int = 4
    # Speed features beyond reference parity (cremage has no equivalent)
    deep_cache: int = 1          # DeepCache interval: full model every
    #   N-th step, shallow-only in between (samplers/deepcache.py).
    #   1 = off (bit-exact default). UNet families (SD1.5/SDXL/SVD):
    #   Euler / Euler A / DPM++ 2M samplers; DiT families
    #   (SD3/FLUX/PixArt/Hunyuan): flow-Euler or any DC k-diffusion name.
    deep_cache_branch: int = 1   # shallow compute on cached steps: UNet
    #   resolution levels recomputed, or DiT front transformer blocks
    #   recomputed (the back blocks' residual delta is the cache)
    tome_ratio: float = 0.0      # Token merging (ToMe, ops/tome.py):
    #   merge this fraction of latent tokens. 0 = off (bit-exact
    #   default); 0.5 is the paper's near-lossless setting.  UNets
    #   (SD1.5/SDXL/SVD spatial): around each highest-resolution
    #   self-attention; composes with deep_cache.  DiTs (SD3/FLUX/
    #   PixArt/Hunyuan): ONE merge for the whole block stack (attention
    #   + MLPs); excludes deep_cache and use_mesh_sp there.
    ada_cache: float = 0.0       # Adaptive step caching (TeaCache
    #   family, Liu et al. 2024; samplers/adacache.py): skip the ENTIRE
    #   denoiser on steps where the accumulated relative change of the
    #   model input stays below this threshold, reusing the previous
    #   noise prediction (k-space) or velocity (flow).  0 = off
    #   (bit-exact default); ~0.1-0.3 trades quality for speed — the
    #   skip schedule is decided at runtime per trajectory (lax.cond in
    #   the scanned sampler), unlike deep_cache's fixed interval.
    #   Same sampler menu as deep_cache and the same all-nine-family
    #   coverage (SVD takes it via SVDOptions.ada_cache); excludes
    #   deep_cache itself (one step-cache at a time) and use_mesh_pp;
    #   composes with tome_ratio, cfg_interval, ControlNet and
    #   use_mesh_sp.
    cfg_interval_low: float = 0.0   # Guidance interval (Kynkäänniemi et
    cfg_interval_high: float = 0.0  # al. 2024): apply CFG only at noise
    #   levels low <= sigma <= high; elsewhere run the conditional model
    #   alone (the uncond half of the doubled batch is skipped via
    #   lax.cond). Off when high <= low (default — bit-exact CFG at
    #   every step). Units are the sampler's sigma space: k-sigmas for
    #   SD1.5/PixArt/Hunyuan/Kandinsky/Cascade (SD1.5 range ~0.03-14.6),
    #   EDM sigmas for SDXL, flow time in (0, 1] for SD3.  Supported on
    #   the sigma-space samplers (k-diffusion + EDM menus and flow
    #   Euler); t-driven samplers (DDIM/PLMS/DPM Solver/LCM) reject it
    #   with actionable errors.  Composes with deep_cache (the windowed
    #   carry denoiser, samplers/deepcache.py) and tome_ratio; excludes
    #   use_mesh_pp.  Measured v5e at [0.28, 5.42]: SD1.5 2.93->3.18
    #   img/s alone, 3.63 with ToMe 0.5.
    # Output
    outdir: str = "outputs"
    generator_model_type: str = GMT_SD_1_5
    wildcards_path: str = ""
    # Misc passthroughs
    extra: Dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "GenerationOptions":
        return cls.from_dict(json.loads(s))

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "GenerationOptions":
        names = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in d.items() if k in names}
        unknown = {k: v for k, v in d.items() if k not in names}
        opts = cls(**known)
        if unknown:
            opts.extra.update(unknown)
        return opts


def apply_prompt_expansions(
    opts: "GenerationOptions", prefs: "Preferences"
) -> "GenerationOptions":
    """Apply the preferences' pre/post prompt expansions (reference
    `generate_handler.py:61-75`: pre-expansion prepended, expansion
    appended, per positive/negative toggles)."""
    pos = opts.prompt
    neg = opts.negative_prompt
    if prefs.enable_positive_prompt_pre_expansion:
        pos = prefs.positive_prompt_pre_expansion + pos
    if prefs.enable_positive_prompt_expansion:
        pos = pos + prefs.positive_prompt_expansion
    if prefs.enable_negative_prompt_pre_expansion:
        neg = prefs.negative_prompt_pre_expansion + neg
    if prefs.enable_negative_prompt_expansion:
        neg = neg + prefs.negative_prompt_expansion
    return dataclasses.replace(opts, prompt=pos, negative_prompt=neg)


def override_options(
    opts: GenerationOptions,
    generation_data: str | Dict[str, Any],
    preserve: Optional[list[str]] = None,
) -> GenerationOptions:
    """Replay options from a past image's `generation_data` metadata,
    optionally preserving some current fields — the reference's
    "Use generation info" behavior (`utils/misc_utils.py:157
    override_options`, `ui/generate_handler.py:274-279`)."""
    if isinstance(generation_data, str):
        try:
            generation_data = json.loads(generation_data)
        except json.JSONDecodeError:
            return opts
    merged = dataclasses.asdict(opts)
    keep = {k: merged[k] for k in (preserve or []) if k in merged}
    merged.update(generation_data)
    merged.update(keep)
    return GenerationOptions.from_dict(merged)
