"""Hunyuan-DiT txt2img pipeline.

Behavior contract: reference `modules/hunyuan_dit/txt2img.py` —
diffusers HunyuanDiTPipeline, txt2img, v-prediction DDPM with the
scaled-linear table, dual bilingual text conditioning."""
from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.core.config import GenerationOptions
from cremage_tpu.core.rng import key_for_image, noise_like, resolve_seed
from cremage_tpu.models.hunyuan import HunyuanDiT
from cremage_tpu.models.vae import AutoencoderKL, decode_from_latent
from cremage_tpu.samplers import kdiffusion as K
from cremage_tpu.samplers import schedules as S
from cremage_tpu.samplers.denoiser import VDenoiser, cfg_denoiser
from cremage_tpu.core.registry import SAMPLERS
from cremage_tpu.services.safety import ImageSafetyChecker
from cremage_tpu.services.watermark import embed_watermark

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class HunyuanBundle:
    dit: HunyuanDiT
    dit_params: Any
    vae: AutoencoderKL
    vae_params: Any
    text_encode: Callable[[str], Tuple[np.ndarray, np.ndarray]]
    # text_encode(prompt) -> (clip tokens (77, clip_dim), mt5 (L, mt5_dim))
    schedule: S.DiscreteSchedule = dataclasses.field(
        default_factory=S.default_sd_schedule)


def _noop(msg):
    pass


class HunyuanPipeline:
    def __init__(self, bundle: HunyuanBundle,
                 safety: Optional[ImageSafetyChecker] = None):
        self.bundle = bundle
        self.safety = safety or ImageSafetyChecker()
        self._cache: Dict[Tuple, Callable] = {}
        self._current_status: Callable = _noop

    def _program(self, opts, shape, dims):
        b = self.bundle
        sched = b.schedule
        steps = opts.sampling_steps
        name = opts.sampler if opts.sampler in K.SAMPLER_SCHEDULE else "DPM++ 2M"
        kind = K.SAMPLER_SCHEDULE[name]
        sigmas = (sched.get_sigmas(steps) if kind == "model"
                  else S.get_sigmas_karras(steps, sched.sigma_min,
                                           sched.sigma_max))
        scale = float(opts.scale)
        sampler_fn = SAMPLERS.get(name)

        def progress(i):
            self._current_status(f"{int(i) + 1} / {steps}")

        def run(params, x, c_clip, uc_clip, c_t5, uc_t5, key):
            def v_model(xx, tt, cond):
                clip_t, mt5_t = cond
                out = b.dit.apply(params, xx, tt, clip_t, mt5_t)
                return out[..., : xx.shape[-1]]

            denoise = VDenoiser(v_model, sched)
            den = cfg_denoiser(denoise, (c_clip, c_t5), (uc_clip, uc_t5), scale)
            return sampler_fn(den, x, sigmas, key=key, progress_cb=progress)

        bucket = ("hunyuan", name, steps, tuple(shape), dims, scale)
        fn = self._cache.get(bucket)
        if fn is None:
            fn = jax.jit(run)
            self._cache[bucket] = fn
        return fn, sigmas

    def generate(self, opts: GenerationOptions, status_cb=_noop,
                 result_cb=None) -> List[Tuple[np.ndarray, Dict[str, Any]]]:
        b = self.bundle
        base_seed = resolve_seed(opts.seed)
        self._current_status = status_cb
        results = []
        img_index = 0
        for it in range(opts.n_iter):
            bsz = opts.n_samples
            key = key_for_image(base_seed, img_index)
            status_cb("encoding prompt")
            clip_c, mt5_c = b.text_encode(opts.prompt)
            clip_u, mt5_u = b.text_encode(opts.negative_prompt)

            def tile(a):
                return jnp.asarray(np.broadcast_to(a[None], (bsz,) + a.shape))

            h, w = opts.H // 8, opts.W // 8
            fn, sigmas = self._program(
                opts, (bsz, h, w, 4), (clip_c.shape, mt5_c.shape))
            x = noise_like(key, (bsz, h, w, 4)) * float(sigmas[0])
            lat = fn(b.dit_params, x, tile(clip_c), tile(clip_u),
                     tile(mt5_c), tile(mt5_u), key)
            status_cb("decoding")
            imgs = decode_from_latent(b.vae, b.vae_params,
                                      lat.astype(jnp.bfloat16))
            imgs = np.clip((np.asarray(imgs, np.float32) + 1) / 2, 0, 1)
            if opts.safety_check:
                imgs, _ = self.safety.check(imgs)
            for i in range(bsz):
                img = imgs[i]
                if opts.watermark:
                    img = embed_watermark(img)
                meta = dataclasses.asdict(opts)
                meta["seed"] = base_seed + img_index
                meta.pop("extra", None)
                results.append((img, meta))
                if result_cb:
                    result_cb(img, meta)
                img_index += 1
        return results
