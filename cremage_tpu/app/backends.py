"""Backend registry: generator_model_type -> generate() callables.

The ML-process dispatch table of the reference (`modules/cremage/mp/
mp.py:46-121`, 9 families x modes, lazy imports) as worker factories:
`register_default_backends(worker, prefs)` wires every GMT_* type; each
backend parses the job `parameters` dict into GenerationOptions, builds
its bundle from the preferences' model paths (lazily, on first job) and
streams progress + results back on the status channel.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Callable, Optional

import numpy as np

from cremage_tpu.core.config import (
    GMT_FLUX_1_SCHNELL, GMT_HUNYUAN_DIT, GMT_KANDINSKY_2_2, GMT_PIXART_SIGMA,
    GMT_SD_1_5, GMT_SD_3, GMT_SDXL, GMT_STABLE_CASCADE, GMT_SVD,
    GenerationOptions, MODE_FACE_FIX, MODE_INPAINTING, MODE_SPOT_INPAINTING,
    Preferences,
)
from cremage_tpu.app.worker import EngineWorker

logger = logging.getLogger(__name__)


def _opts_from_params(params: dict) -> GenerationOptions:
    return GenerationOptions.from_dict(params)


def _load_image(params: dict, key: str) -> Optional[np.ndarray]:
    from PIL import Image

    from cremage_tpu.io.metadata import array_from_image

    p = params.get(key)
    if not p or not os.path.exists(p):
        return None
    if key == "mask_img":
        return np.asarray(Image.open(p).convert("L"),
                          np.float32) / 255.0
    return array_from_image(Image.open(p))


def _model_path(prefs: Preferences, path_attr: str, name_attr: str) -> str:
    name = getattr(prefs, name_attr)
    if not name or name == "None":
        raise FileNotFoundError(
            f"preferences.{name_attr} is not set; configure a model file")
    return os.path.join(getattr(prefs, path_attr), name)


# One resident pipeline instance, keyed on every load-relevant option —
# the reference's keep_instance behavior (flux/txt2img.py:74,125: the
# assembled pipe survives across generations) generalized to all
# families.  Reusing the pipeline object is the serving win: its jitted
# program cache carries across jobs, so only the FIRST job at a given
# (size, steps, sampler) bucket pays a compile.  A single global slot
# (not per-family) mirrors the one-active-model reality of a 16 GB
# chip; swapping models frees the old params before the new load.
_instance_key: Optional[tuple] = None
_instance = None


def cached_instance(key: tuple, build: Callable):
    global _instance_key, _instance
    if _instance_key == key and _instance is not None:
        return _instance
    if _instance is not None:
        logger.info("evicting resident model instance %s", _instance_key[0])
        _instance = None
        _instance_key = None
        import gc

        gc.collect()
    inst = build()
    _instance_key, _instance = key, inst
    return inst


def clear_instance_cache() -> None:
    global _instance_key, _instance
    _instance = None
    _instance_key = None


def sd15_factory(prefs: Preferences) -> Callable:
    from cremage_tpu.pipelines.loader import load_sd15_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline
    from cremage_tpu.io.lora import parse_lora_option_string

    def _pipe_for(params, opts):
        # spot inpainting runs the inpaint model family on a cropped
        # working region (reference tools/spot_inpainter.py:100 — the
        # tool window pairs with the ldm_inpaint_model menu)
        inpaint = opts.mode in (MODE_INPAINTING, MODE_SPOT_INPAINTING)
        ckpt = opts.ckpt or _model_path(
            prefs, "ldm_model_path",
            "ldm_inpaint_model" if inpaint else "ldm_model")
        loras = parse_lora_option_string(opts.lora_models, opts.lora_weights)
        embedding_dir = (opts.embedding_path or prefs.embedding_path
                         or None)
        # opt-in 8-bit UNet weight storage ("int8" w8a8 / "float8_e4m3")
        quantize = params.get("unet_quantize") or None
        key = ("sd15", ckpt, opts.vae_ckpt or None,
               tuple(tuple(x) for x in loras), embedding_dir, inpaint,
               opts.control_net or None, opts.face_model or None,
               opts.face_strength, quantize)
        return cached_instance(key, lambda: SD15Pipeline(load_sd15_bundle(
            ckpt,
            vae_ckpt=opts.vae_ckpt or None,
            loras=loras,
            embedding_dir=embedding_dir,
            inpainting=inpaint,
            control_ckpt=opts.control_net or None,
            faceid_ckpt=opts.face_model or None,
            face_strength=opts.face_strength,
            quantize_unet=quantize,
        )))

    def generate(params, status_cb, result_cb):
        opts = _opts_from_params(params)
        pipe = _pipe_for(params, opts)
        # per-job state on the cached instance: set OR clear
        pipe.face_fixer = None
        if opts.auto_face_fix:
            from cremage_tpu.services.facefix import auto_face_fixer

            pipe.face_fixer = auto_face_fixer(
                pipe,
                detection_method=opts.auto_face_fix_face_detection_method,
                target_size=512,
            )
        if opts.mode == MODE_FACE_FIX:
            # standalone face-fix tool routed as a job (reference
            # tools/face_detector.py: detect or take user-marked boxes,
            # img2img-repair each crop, seamless paste-back)
            import dataclasses

            from cremage_tpu.services.facefix import (
                FaceBox, pipeline_face_fixer,
            )

            image = _load_image(params, "init_img")      # [-1,1]
            if image is None:
                raise ValueError("face fix needs init_img")
            boxes = None
            if params.get("face_boxes"):
                boxes = [FaceBox(int(b["x"]), int(b["y"]), int(b["w"]),
                                 int(b["h"]), float(b.get("score", 1.0)))
                         for b in params["face_boxes"]]
            fixer = pipeline_face_fixer(
                pipe,
                detection_method=opts.auto_face_fix_face_detection_method,
                target_size=512)
            status_cb("face fix")
            out01 = fixer.fix(
                (image + 1.0) * 0.5,
                prompt=opts.auto_face_fix_prompt or opts.prompt,
                strength=opts.auto_face_fix_strength,
                seed=int(opts.seed or 0), boxes=boxes)
            meta = dataclasses.asdict(opts)
            meta.pop("extra", None)
            result_cb(out01, meta)
            return
        if opts.mode == MODE_SPOT_INPAINTING:
            import dataclasses

            from cremage_tpu.app.tools import spot_inpaint
            from cremage_tpu.io.metadata import array_from_image

            image = _load_image(params, "init_img")      # [-1,1]
            mask = _load_image(params, "mask_img")       # (H,W) [0,1]
            if image is None or mask is None:
                raise ValueError(
                    "spot inpainting needs init_img and mask_img")
            status_cb("spot inpainting")
            out = spot_inpaint(
                pipe, image, mask, opts,
                max_edge_len=int(getattr(prefs, "inpaint_max_edge_len",
                                         512) or 512))
            meta = dataclasses.asdict(opts)
            meta.pop("extra", None)
            result_cb((out + 1.0) * 0.5, meta)
            return
        pipe.generate(
            opts, status_cb=status_cb, result_cb=result_cb,
            init_image=_load_image(params, "init_img"),
            mask_image=_load_image(params, "mask_img"),
            control_image=_load_image(params, "control_image_path"),
            face_embedding=_face_embedding_for(
                params, opts, status_cb,
                plus=(getattr(pipe.bundle, "faceid_kind", None) == "plus")),
        )

    def generate_batch(params_list, status_cb, result_cbs):
        # coalesce_key equality guarantees the load-relevant options
        # match, so the first job's pipe serves the whole group
        from cremage_tpu.app.batching import run_sd15_batch

        opts = _opts_from_params(params_list[0])
        pipe = _pipe_for(params_list[0], opts)
        pipe.face_fixer = None  # coalesce_key rejects auto_face_fix jobs
        run_sd15_batch(pipe, params_list, status_cb, result_cbs)

    from cremage_tpu.app.batching import sd15_coalesce_key

    generate.generate_batch = generate_batch
    generate.coalesce_key = sd15_coalesce_key
    return generate


_FACE_EMBEDDER_CACHE: dict = {}


def _face_embedding_for(params: dict, opts, status_cb, plus: bool = False):
    """FaceID-from-a-photo: embed opts.face_input_img with the ArcFace
    path (reference ip_adapter_faceid.py:680-745 InsightFace
    normed_embedding).  Precomputed params['face_embedding'] wins.

    plus=True (Plus/plusv2 checkpoints) additionally CLIP-embeds the
    aligned 224^2 crop (reference get_image_embeds :432-460) and
    returns the dict SD15Pipeline's Plus conditioning expects."""
    if params.get("face_embedding") is not None:
        fe = params["face_embedding"]
        if isinstance(fe, dict):
            return fe
        return np.asarray(fe, np.float32)
    face_img = getattr(opts, "face_input_img", "")
    if not (face_img and os.path.exists(face_img) and opts.face_model):
        return None
    arc = params.get("arcface_model") or os.environ.get(
        "ARCFACE_MODEL_PATH", "")
    if not arc or not os.path.exists(arc):
        raise FileNotFoundError(
            "FaceID needs the ArcFace recognition weights (w600k_r50.onnx "
            "or torch iresnet50); set ARCFACE_MODEL_PATH")
    if arc not in _FACE_EMBEDDER_CACHE:
        from cremage_tpu.models.arcface import load_face_embedder

        _FACE_EMBEDDER_CACHE[arc] = load_face_embedder(arc)
    status_cb("extracting face embedding")
    from PIL import Image

    img01 = np.asarray(Image.open(face_img).convert("RGB"),
                       np.float32) / 255.0
    got = _FACE_EMBEDDER_CACHE[arc].embed_and_crop(img01)
    if got is None:
        raise ValueError("no face detected in face_input_img "
                         "(after the 200px-border retry)")
    emb, crop = got
    if not plus:
        return emb
    from cremage_tpu.services.faceid_plus import clip_face_embeds

    status_cb("embedding face crop with CLIP vision")
    ce, uce = clip_face_embeds(crop,
                               params.get("faceid_clip_vision") or None)
    return {"id": emb, "clip_embeds": ce, "uncond_clip_embeds": uce,
            "shortcut": True, "s_scale": 1.0}


def sdxl_factory(prefs: Preferences) -> Callable:
    from cremage_tpu.pipelines.loader import load_sdxl_bundle
    from cremage_tpu.pipelines.sdxl import SDXLPipeline
    from cremage_tpu.io.lora import parse_lora_option_string

    def generate(params, status_cb, result_cb):
        opts = _opts_from_params(params)
        # dedicated 9-ch inpaint UNet when an SDXL inpaint model is
        # configured (reference sdxl_inpaint.py AutoPipelineForInpainting);
        # otherwise the base model with latent-mask blending
        inpaint = (opts.mode == MODE_INPAINTING
                   and prefs.sdxl_ldm_inpaint_model not in ("", "None"))
        ckpt = opts.ckpt or _model_path(
            prefs, "sdxl_ldm_model_path",
            "sdxl_ldm_inpaint_model" if inpaint else "sdxl_ldm_model")
        loras = parse_lora_option_string(opts.lora_models, opts.lora_weights)
        embedding_dir = (opts.embedding_path or prefs.sdxl_embedding_path
                         or None)
        quantize = params.get("unet_quantize") or None
        key = ("sdxl", ckpt, opts.vae_ckpt or None,
               opts.refiner_ckpt or None,
               tuple(tuple(x) for x in loras), embedding_dir, inpaint,
               quantize)
        pipe = cached_instance(key, lambda: SDXLPipeline(load_sdxl_bundle(
            ckpt,
            vae_ckpt=opts.vae_ckpt or None,
            refiner_ckpt=opts.refiner_ckpt or None,
            loras=loras,
            embedding_dir=embedding_dir,
            inpainting=inpaint,
            quantize_unet=quantize,
        )))
        pipe.face_fixer = None
        if opts.auto_face_fix:
            from cremage_tpu.services.facefix import auto_face_fixer

            pipe.face_fixer = auto_face_fixer(
                pipe,
                detection_method=opts.auto_face_fix_face_detection_method,
                target_size=1024,  # SDXL native face size (reference :138-209)
            )
        pipe.generate(
            opts, status_cb=status_cb, result_cb=result_cb,
            init_image=_load_image(params, "init_img"),
            mask_image=_load_image(params, "mask_img"),
        )

    return generate


def sd3_factory(prefs: Preferences) -> Callable:
    from cremage_tpu.pipelines.loader import load_sd3_bundle
    from cremage_tpu.pipelines.sd3 import SD3Pipeline

    def generate(params, status_cb, result_cb):
        opts = _opts_from_params(params)
        ckpt = opts.ckpt or _model_path(prefs, "sd3_ldm_model_path",
                                        "sd3_ldm_model")
        include_t5 = params.get("include_t5", True)
        quantize_t5 = params.get("sd3_quantize_t5")
        quantize_dit = params.get("dit_quantize") or None
        pipe = cached_instance(
            ("sd3", ckpt, include_t5, quantize_t5, quantize_dit),
            lambda: SD3Pipeline(load_sd3_bundle(
                ckpt, include_t5=include_t5, quantize_t5=quantize_t5,
                quantize_dit=quantize_dit)))
        pipe.generate(opts, status_cb=status_cb, result_cb=result_cb)

    return generate


def flux_factory(prefs: Preferences) -> Callable:
    from cremage_tpu.pipelines.loader import load_flux_bundle
    from cremage_tpu.pipelines.flux import FluxPipeline

    def generate(params, status_cb, result_cb):
        opts = _opts_from_params(params)
        if not opts.ckpt or not os.path.exists(opts.ckpt):
            raise FileNotFoundError(
                "FLUX needs local weight files: pass 'ckpt' (the BFL "
                "transformer .safetensors) plus vae_ckpt/clip_ckpt/"
                "t5_ckpt. The reference pulls black-forest-labs/"
                "FLUX.1-schnell from HuggingFace (flux/txt2img.py "
                "MODEL_ID); io/downloader.py can fetch the same files "
                "when internet access is enabled.")
        # 8-bit weight storage is the TPU "low_mem": the reference
        # qfloat8-quantizes this transformer + T5 (flux/txt2img.py:125)
        # and 12B bf16 params would not fit a 16 GB chip anyway.
        # flux_quantize="none" opts out on big-HBM/multi-chip setups.
        quantize = params.get("flux_quantize", "float8_e4m3")
        key = ("flux", opts.ckpt, opts.vae_ckpt,
               params.get("clip_ckpt"), params.get("t5_ckpt"), quantize)
        pipe = cached_instance(key, lambda: FluxPipeline(load_flux_bundle(
            opts.ckpt, vae_ckpt=opts.vae_ckpt,
            clip_ckpt=params.get("clip_ckpt"),
            t5_ckpt=params.get("t5_ckpt"),
            quantize=quantize,
        )))
        pipe.generate(opts, status_cb=status_cb, result_cb=result_cb)

    return generate


def svd_factory(prefs: Preferences) -> Callable:
    """img2vid job: parameters carry init_img + SVD knobs; frames are
    written to the outdir and the chain optionally runs FILM
    interpolation + mp4 (reference tools/video_generator.py:427-478)."""
    from cremage_tpu.pipelines.loader import load_svd_bundle
    from cremage_tpu.pipelines.svd import SVDOptions, SVDPipeline

    def generate(params, status_cb, result_cb):
        init = _load_image(params, "init_img")
        if init is None:
            raise FileNotFoundError("SVD requires init_img")
        ckpt = params.get("ckpt")
        if not ckpt and params.get("svd_model"):
            ckpt = os.path.join(prefs.svd_model_path, params["svd_model"])
        if not ckpt:
            raise FileNotFoundError(
                "SVD checkpoint path not provided (ckpt or svd_model)")
        opts = SVDOptions(
            num_frames=int(params.get("num_frames", 14)),
            num_steps=int(params.get("sampling_steps", 25)),
            fps_id=int(params.get("fps_id", 6)),
            motion_bucket_id=int(params.get("motion_bucket_id", 127)),
            cond_aug=float(params.get("cond_aug", 0.02)),
            seed=int(params.get("seed", -1)),
            deep_cache=int(params.get("deep_cache", 1)),
            deep_cache_branch=int(params.get("deep_cache_branch", 1)),
            tome_ratio=float(params.get("tome_ratio", 0.0)),
            ada_cache=float(params.get("ada_cache", 0.0)),
        )
        quantize = params.get("unet_quantize") or None
        pipe = cached_instance(
            ("svd", ckpt, opts.num_frames, quantize),
            lambda: SVDPipeline(load_svd_bundle(
                ckpt, num_frames=opts.num_frames,
                quantize_unet=quantize)))
        frames = pipe.sample((init + 1) / 2, opts, status_cb=status_cb,
                             output_dir=params.get("outdir"))
        passes = int(params.get("interpolation_frames", 0))
        meta = {k: v for k, v in params.items()
                if isinstance(v, (int, float, str))}
        if passes:
            from cremage_tpu.services.film import (
                interpolate_recursively, write_mp4,
            )

            frames = interpolate_recursively(
                list(frames), passes,
                progress_cb=lambda k, n: status_cb(
                    f"interpolating (pass {k} / {n})"))
            mp4_path = params.get("output_mp4")
            if not mp4_path and params.get("make_mp4"):
                # one-click chain (reference video_generator.py:427-478):
                # the mp4 lands in the outputs library so the browser
                # client can stream it over GET /v1/images/file
                import time as _time

                from cremage_tpu.app import dirs as D

                mp4_path = os.path.join(
                    D.first_init(), "outputs",
                    "video_%s.mp4" % _time.strftime("%Y%m%d-%H%M%S"))
            if mp4_path:
                status_cb("writing mp4")
                write_mp4(frames, mp4_path, fps=25)
                status_cb({"video_path": mp4_path,
                           "generation_parameters": json.dumps(meta)})
        for i, f in enumerate(frames):
            result_cb(f, {"frame": i, **meta})

    return generate


def register_default_backends(worker: EngineWorker,
                              prefs: Optional[Preferences] = None) -> None:
    prefs = prefs or Preferences()
    worker.register_backend(GMT_SD_1_5, lambda: sd15_factory(prefs))
    worker.register_backend(GMT_SDXL, lambda: sdxl_factory(prefs))
    worker.register_backend(GMT_SD_3, lambda: sd3_factory(prefs))
    worker.register_backend(GMT_FLUX_1_SCHNELL, lambda: flux_factory(prefs))
    worker.register_backend(GMT_SVD, lambda: svd_factory(prefs))

    def pixart_backend():
        from cremage_tpu.pipelines.loader import load_pixart_bundle
        from cremage_tpu.pipelines.pixart import PixArtPipeline

        def generate(params, status_cb, result_cb):
            opts = _opts_from_params(params)
            ckpt = opts.ckpt or _model_path(
                prefs, "pixart_sigma_ldm_model_path", "pixart_sigma_ldm_model")
            # opt-in 8-bit DiT storage, uniform with flux_quantize
            quantize = params.get("dit_quantize") or None
            pipe = cached_instance(
                ("pixart", ckpt, opts.vae_ckpt or None, quantize),
                lambda: PixArtPipeline(load_pixart_bundle(
                    ckpt, vae_ckpt=opts.vae_ckpt or None,
                    quantize_dit=quantize)))
            pipe.generate(opts, status_cb=status_cb, result_cb=result_cb)

        return generate

    worker.register_backend(GMT_PIXART_SIGMA, pixart_backend)

    def kandinsky_backend():
        from cremage_tpu.pipelines.kandinsky import KandinskyPipeline
        from cremage_tpu.pipelines.loader import load_kandinsky_bundle

        def generate(params, status_cb, result_cb):
            opts = _opts_from_params(params)
            # the reference pulls kandinsky-community/kandinsky-2-2-
            # prior + -decoder via AutoPipeline (kandinsky/txt2img.py:
            # 26,66); headless deployments point at the local component
            # files, either individually or via a directory of the
            # standard names
            base = params.get("kandinsky_dir")
            def pick(key, fname):
                p = params.get(key)
                if p:
                    return p
                if base:
                    cand = os.path.join(base, fname)
                    if os.path.exists(cand):
                        return cand
                return None
            prior = pick("prior_ckpt", "prior.safetensors")
            dec = pick("decoder_ckpt", "decoder.safetensors")
            text = pick("text_encoder_ckpt", "text_encoder.safetensors")
            movq = pick("movq_ckpt", "movq.safetensors")
            if not (prior and dec and text):
                raise FileNotFoundError(
                    "Kandinsky 2.2 needs the diffusers component files: "
                    "pass prior_ckpt + decoder_ckpt + text_encoder_ckpt "
                    "(+ optional movq_ckpt), or kandinsky_dir containing "
                    "prior/decoder/text_encoder[/movq].safetensors "
                    "(kandinsky-community/kandinsky-2-2-{prior,decoder})")
            pipe = cached_instance(
                ("kandinsky", prior, dec, text, movq),
                lambda: KandinskyPipeline(load_kandinsky_bundle(
                    prior, dec, text, movq_ckpt=movq)))
            pipe.generate(opts, status_cb=status_cb, result_cb=result_cb,
                          init_image=_load_image(params, "init_img"),
                          mask_image=_load_image(params, "mask_img"))

        return generate

    worker.register_backend(GMT_KANDINSKY_2_2, kandinsky_backend)

    def cascade_backend():
        from cremage_tpu.pipelines.cascade import CascadePipeline
        from cremage_tpu.pipelines.loader import load_cascade_bundle

        def generate(params, status_cb, result_cb):
            opts = _opts_from_params(params)
            # reference: stabilityai/stable-cascade prior + decoder via
            # diffusers (stable_cascade/txt2img.py); headless
            # deployments point at the local component files
            base = params.get("cascade_dir")
            def pick(key, fname):
                p = params.get(key)
                if p:
                    return p
                if base:
                    cand = os.path.join(base, fname)
                    if os.path.exists(cand):
                        return cand
                return None
            sc = pick("stage_c_ckpt", "stage_c.safetensors")
            sb = pick("stage_b_ckpt", "stage_b.safetensors")
            text = pick("text_encoder_ckpt", "text_encoder.safetensors")
            vq = pick("vqgan_ckpt", "vqgan.safetensors")
            if not (sc and sb and text):
                raise FileNotFoundError(
                    "Stable Cascade needs the diffusers component files: "
                    "pass stage_c_ckpt + stage_b_ckpt + text_encoder_ckpt "
                    "(+ optional vqgan_ckpt for Stage A), or cascade_dir "
                    "containing stage_c/stage_b/text_encoder[/vqgan]"
                    ".safetensors (stabilityai/stable-cascade)")
            pipe = cached_instance(
                ("cascade", sc, sb, text, vq),
                lambda: CascadePipeline(load_cascade_bundle(
                    sc, sb, text, vqgan_ckpt=vq)))
            pipe.generate(opts, status_cb=status_cb, result_cb=result_cb)

        return generate

    worker.register_backend(GMT_STABLE_CASCADE, cascade_backend)

    def hunyuan_backend():
        from cremage_tpu.pipelines.hunyuan import HunyuanPipeline
        from cremage_tpu.pipelines.loader import load_hunyuan_bundle

        def generate(params, status_cb, result_cb):
            opts = _opts_from_params(params)
            # reference: Tencent-Hunyuan/HunyuanDiT-Diffusers via
            # diffusers (hunyuan_dit/txt2img.py); headless deployments
            # point at the local component files
            base = params.get("hunyuan_dir")
            def pick(key, fname):
                p = params.get(key)
                if p:
                    return p
                if base:
                    cand = os.path.join(base, fname)
                    if os.path.exists(cand):
                        return cand
                return None
            dit = opts.ckpt or pick("dit_ckpt", "transformer.safetensors")
            if not dit:
                raise FileNotFoundError(
                    "Hunyuan-DiT needs the diffusers component files: "
                    "pass ckpt/dit_ckpt (+ vae_ckpt, clip_ckpt + "
                    "clip_vocab for the BertModel branch, mt5_ckpt + "
                    "mt5_spiece for the mT5 branch), or hunyuan_dir "
                    "with transformer/vae/clip/mt5.safetensors + "
                    "vocab.txt + spiece.model "
                    "(Tencent-Hunyuan/HunyuanDiT-Diffusers)")
            vae = opts.vae_ckpt or pick("_", "vae.safetensors")
            clip = pick("clip_ckpt", "clip.safetensors")
            vocab = pick("clip_vocab", "vocab.txt")
            mt5 = pick("mt5_ckpt", "mt5.safetensors")
            spiece = pick("mt5_spiece", "spiece.model")
            quantize = params.get("dit_quantize") or None
            key = ("hunyuan", dit, vae, clip, vocab, mt5, spiece, quantize)
            pipe = cached_instance(
                key, lambda: HunyuanPipeline(load_hunyuan_bundle(
                    dit, vae_ckpt=vae, clip_ckpt=clip, clip_vocab=vocab,
                    mt5_ckpt=mt5, mt5_tokenize=spiece,
                    quantize_dit=quantize)))
            pipe.generate(opts, status_cb=status_cb, result_cb=result_cb)

        return generate

    worker.register_backend(GMT_HUNYUAN_DIT, hunyuan_backend)
