"""CLI mirroring the reference's per-backend option namespaces
(`modules/sd/options.py` flags; `modules/sdxl/sdxl_pipeline/options.py`
EDM extras). Entry point:

    python -m cremage_tpu.app.cli --prompt "a cat" --ckpt model.safetensors

Modes: txt2img by default, img2img with --init_img, inpaint with
--init_img + --mask_img (+ --inpaint_ckpt).
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("cremage-tpu", description=__doc__)
    # reference sd/options.py flags (names preserved)
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--embedding_path", type=str, default="")
    p.add_argument("--wildcards_path", type=str, default="")
    p.add_argument("--clip_skip", type=int, default=1)
    p.add_argument("--outdir", type=str, default="outputs")
    p.add_argument("--skip_save", action="store_true")
    p.add_argument("--sampler", type=str, default="DDIM")
    p.add_argument("--sampling_steps", type=int, default=50)
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--n_iter", type=int, default=1)
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--C", type=int, default=4)
    p.add_argument("--f", type=int, default=8)
    p.add_argument("--n_samples", type=int, default=1)
    p.add_argument("--scale", type=float, default=7.5)
    p.add_argument("--strength", type=float, default=0.75)
    p.add_argument("--ckpt", type=str, default="",
                   help="model checkpoint (required for single-file "
                        "families; component-path families use --param")
    p.add_argument("--inpaint_ckpt", type=str, default="")
    p.add_argument("--vae_ckpt", type=str, default="")
    p.add_argument("--lora_models", type=str, default="")
    p.add_argument("--lora_weights", type=str, default="")
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--safety_check", action="store_true", default=False)
    p.add_argument("--watermark", action="store_true", default=False)
    p.add_argument("--hires_fix_upscaler", type=str, default="None")
    p.add_argument("--hires_fix_scale_factor", type=float, default=1.5)
    p.add_argument("--auto_face_fix", action="store_true")
    p.add_argument("--auto_face_fix_strength", type=float, default=0.3)
    p.add_argument("--auto_face_fix_prompt", type=str, default="")
    p.add_argument("--auto_face_fix_face_detection_method", type=str,
                   default="InsightFace")
    # FaceID (reference flags; face_input_img may be a .npy with a
    # precomputed 512-d InsightFace embedding in this environment)
    p.add_argument("--face_input_img", type=str, default="")
    p.add_argument("--face_model", type=str, default="")
    p.add_argument("--face_strength", type=float, default=1.0)
    # mode inputs
    p.add_argument("--init_img", type=str, default="")
    p.add_argument("--mask_img", type=str, default="")
    # sdxl/EDM extras (options.py)
    p.add_argument("--sampler_s_churn", type=float, default=0.0)
    p.add_argument("--sampler_s_tmin", type=float, default=0.0)
    p.add_argument("--sampler_s_tmax", type=float, default=999.0)
    p.add_argument("--sampler_s_noise", type=float, default=1.0)
    p.add_argument("--sampler_eta", type=float, default=1.0)
    p.add_argument("--sampler_order", type=int, default=4)
    p.add_argument("--deep_cache", type=int, default=1,
                   help="DeepCache interval: run the full model every Nth "
                        "step, recompute only the shallow part in between "
                        "(~1.5-2x faster, approximate). 1 = off (exact). "
                        "UNet families: Euler/Euler A/DPM++ 2M samplers; "
                        "DiT families: flow-Euler or any DC k-diffusion "
                        "name.")
    p.add_argument("--deep_cache_branch", type=int, default=1,
                   help="shallow compute on DeepCache steps: UNet levels "
                        "or DiT front blocks recomputed")
    p.add_argument("--tome_ratio", type=float, default=0.0,
                   help="Token merging (ToMe): merge this fraction of "
                        "latent tokens. UNets (SD1.5/SDXL): around each "
                        "highest-res self-attention, composes with "
                        "--deep_cache. DiTs (SD3/FLUX/PixArt/Hunyuan): "
                        "one merge for the whole block stack (excludes "
                        "--deep_cache/SP there). 0.5 = the paper's "
                        "near-lossless setting; 0 = off (exact).")
    p.add_argument("--ada_cache", type=float, default=0.0,
                   help="adaptive step caching (TeaCache family): skip "
                        "the whole denoiser on steps where the "
                        "accumulated relative input change stays below "
                        "this threshold, reusing the previous noise "
                        "prediction (~0.1-0.3 typical; schedule decided "
                        "at runtime per trajectory). 0 = off (exact). "
                        "Same sampler menu as --deep_cache; excludes "
                        "--deep_cache itself.")
    p.add_argument("--cfg_interval_low", type=float, default=0.0,
                   help="guidance interval (Kynkäänniemi 2024): apply CFG "
                        "only at noise levels low <= sigma <= high; the "
                        "uncond half of the batch is skipped elsewhere "
                        "(measured v5e at [0.28, 5.42]: sd15 +8%%, sdxl "
                        "+10%%; composes with deep_cache/tome_ratio). "
                        "Off when high <= low. Sigma space: k-sigmas "
                        "(SD1.5 ~0.03-14.6), EDM sigmas (SDXL), flow "
                        "time (SD3). k-diffusion/EDM/flow samplers only.")
    p.add_argument("--cfg_interval_high", type=float, default=0.0)
    p.add_argument("--discretization", type=str,
                   default="LegacyDDPMDiscretization")
    p.add_argument("--guider", type=str, default="VanillaCFG")
    p.add_argument("--refiner_sdxl_ckpt", type=str, default="")
    p.add_argument("--refiner_strength", type=float, default=0.0)
    p.add_argument("--generator_model_type", type=str, default="SD 1.5")
    p.add_argument("--param", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="extra job parameter, repeatable — e.g. the "
                        "component checkpoint paths of Kandinsky "
                        "(prior_ckpt=...), Stable Cascade "
                        "(stage_c_ckpt=...), Hunyuan (clip_ckpt=...), "
                        "flux_quantize=none, unet_quantize=int8, or "
                        "dit_quantize=int8 (SD3/PixArt/Hunyuan)")
    # replay options from a past image's metadata (the UI's
    # "Use generation info" checkbox, generate_handler.py:274-279)
    p.add_argument("--use_generation_info", type=str, default="",
                   help="path to a PNG whose generation_data replaces "
                        "the current options (prompt flags still win "
                        "when explicitly given)")
    # app preferences file: when present, pre/post prompt expansions are
    # applied per its toggles (reference config.yaml behavior)
    p.add_argument("--config_yaml", type=str, default="")
    return p


def main(argv=None) -> int:
    from cremage_tpu.core.config import (
        GenerationOptions, MODE_IMAGE_TO_IMAGE, MODE_INPAINTING,
        MODE_TEXT_TO_IMAGE,
    )
    from cremage_tpu.io.lora import parse_lora_option_string
    from cremage_tpu.io.metadata import (
        array_from_image, image_from_array, save_png_with_metadata,
    )
    from cremage_tpu.pipelines.loader import load_sd15_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline
    from PIL import Image

    from cremage_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    mode = MODE_TEXT_TO_IMAGE
    init_image = mask_image = None
    if args.init_img:
        init_image = array_from_image(Image.open(args.init_img))
        mode = MODE_IMAGE_TO_IMAGE
    if args.mask_img:
        import numpy as np

        mask_image = (
            np.asarray(Image.open(args.mask_img).convert("L"), dtype="float32")
            / 255.0
        )
        mode = MODE_INPAINTING

    opts = GenerationOptions(
        prompt=args.prompt, negative_prompt=args.negative_prompt,
        H=args.H, W=args.W, C=args.C, f=args.f,
        sampling_steps=args.sampling_steps, sampler=args.sampler,
        scale=args.scale, ddim_eta=args.ddim_eta,
        n_samples=args.n_samples, n_iter=args.n_iter, seed=args.seed,
        clip_skip=args.clip_skip, ckpt=args.ckpt, vae_ckpt=args.vae_ckpt,
        lora_models=args.lora_models, lora_weights=args.lora_weights,
        embedding_path=args.embedding_path, mode=mode,
        strength=args.strength, safety_check=args.safety_check,
        watermark=args.watermark,
        use_hires_fix=args.hires_fix_upscaler not in ("", "None"),
        hires_fix_upscaler=args.hires_fix_upscaler,
        hires_fix_scale_factor=args.hires_fix_scale_factor,
        auto_face_fix=args.auto_face_fix,
        auto_face_fix_strength=args.auto_face_fix_strength,
        auto_face_fix_prompt=args.auto_face_fix_prompt,
        outdir=args.outdir, wildcards_path=args.wildcards_path,
        sampler_s_churn=args.sampler_s_churn,
        sampler_s_tmin=args.sampler_s_tmin,
        sampler_s_tmax=args.sampler_s_tmax,
        sampler_s_noise=args.sampler_s_noise,
        sampler_eta=args.sampler_eta, sampler_order=args.sampler_order,
        face_input_img=args.face_input_img, face_model=args.face_model,
        face_strength=args.face_strength,
        deep_cache=args.deep_cache, deep_cache_branch=args.deep_cache_branch,
        tome_ratio=args.tome_ratio, ada_cache=args.ada_cache,
        cfg_interval_low=args.cfg_interval_low,
        cfg_interval_high=args.cfg_interval_high,
    )

    if args.use_generation_info:
        from cremage_tpu.core.config import override_options
        from cremage_tpu.io.metadata import read_generation_data

        past = read_generation_data(args.use_generation_info)
        if past:
            opts = override_options(opts, past)

    if args.config_yaml:
        from cremage_tpu.core.config import apply_prompt_expansions, load_preferences

        opts = apply_prompt_expansions(opts, load_preferences(args.config_yaml))

    face_embedding = None
    if args.face_input_img and args.face_input_img.endswith(".npy"):
        # precomputed 512-d embedding fast path
        import numpy as np

        face_embedding = np.load(args.face_input_img)

    if args.generator_model_type != "SD 1.5":
        # every other family routes through the worker backend registry
        # — the same dispatch the HTTP server uses (reference
        # mp.py:46-121 family table), sharing the resident instance
        # cache and each family's component-path parameters
        import dataclasses

        import numpy as np

        from cremage_tpu.app.backends import register_default_backends
        from cremage_tpu.app.worker import EngineWorker
        from cremage_tpu.core.config import Preferences, load_preferences

        prefs = (load_preferences(args.config_yaml) if args.config_yaml
                 else Preferences())
        w = EngineWorker()
        register_default_backends(w, prefs)
        params = dataclasses.asdict(opts)
        params.pop("extra", None)
        params["generator_model_type"] = args.generator_model_type
        if args.init_img:
            params["init_img"] = args.init_img
        if args.mask_img:
            params["mask_img"] = args.mask_img
        for kv in args.param:
            if "=" not in kv:
                raise SystemExit(f"--param needs KEY=VALUE, got {kv!r}")
            k, v = kv.split("=", 1)
            params[k] = v

        os.makedirs(args.outdir, exist_ok=True)
        saved = []

        def result_cb(img01, meta):
            base = int(time.time())
            path = os.path.join(args.outdir,
                                f"{base}_{len(saved):05}.png")
            if not args.skip_save:
                save_png_with_metadata(
                    image_from_array(np.asarray(img01)), path, meta)
                print(path)
            saved.append(path)

        t0 = time.perf_counter()
        backend = w._backend_for(args.generator_model_type)
        backend(params, lambda m: print(m, file=sys.stderr), result_cb)
        dt = time.perf_counter() - t0
        print(f"{len(saved)} images in {dt:.1f}s", file=sys.stderr)
        return 0

    if not args.ckpt:
        raise SystemExit("--ckpt is required for SD 1.5")
    ckpt = args.inpaint_ckpt if mode == MODE_INPAINTING and args.inpaint_ckpt \
        else args.ckpt
    extra = dict(kv.split("=", 1) for kv in args.param if "=" in kv)
    bundle = load_sd15_bundle(
        ckpt,
        vae_ckpt=args.vae_ckpt or None,
        loras=parse_lora_option_string(args.lora_models, args.lora_weights),
        embedding_dir=args.embedding_path or None,
        inpainting=(mode == MODE_INPAINTING),
        faceid_ckpt=args.face_model or None,
        face_strength=args.face_strength,
        quantize_unet=extra.get("unet_quantize") or None,
    )
    pipe = SD15Pipeline(bundle)

    if face_embedding is None and args.face_input_img:
        # FaceID from a photo: the same ArcFace (+CLIP-vision for Plus)
        # path the worker backend uses (reference
        # ip_adapter_faceid.py:680-745)
        from cremage_tpu.app.backends import _face_embedding_for

        face_embedding = _face_embedding_for(
            extra, opts, lambda m: print(m, file=sys.stderr),
            plus=(getattr(bundle, "faceid_kind", None) == "plus"))

    os.makedirs(args.outdir, exist_ok=True)
    t0 = time.perf_counter()
    results = pipe.generate(
        opts, status_cb=lambda m: print(m, file=sys.stderr),
        init_image=init_image, mask_image=mask_image,
        face_embedding=face_embedding,
    )
    dt = time.perf_counter() - t0
    print(f"{len(results)} images in {dt:.1f}s "
          f"({len(results)/dt:.3f} img/s)", file=sys.stderr)

    if not args.skip_save:
        base = int(time.time())
        for i, (img, meta) in enumerate(results):
            path = os.path.join(args.outdir, f"{base}_{i:05}.png")
            save_png_with_metadata(image_from_array(img), path, meta)
            print(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
