"""Kandinsky 2.2 pipeline: prior -> decoder, txt2img / img2img / inpaint.

Behavior contract: reference `modules/kandinsky/txt2img.py` (:26,66
AutoPipelineForText2Image), `img2img.py`, `inpaint.py` — the three
diffusers auto-pipelines over the prior+decoder pair. Schedules: prior
uses a squaredcos DDPM table; decoder uses DDPM with the same table via
the shared EpsDenoiser + k-diffusion samplers.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.core.config import (
    GenerationOptions, MODE_IMAGE_TO_IMAGE, MODE_INPAINTING, MODE_TEXT_TO_IMAGE,
)
from cremage_tpu.utils.image import device_to_img01
from cremage_tpu.core.rng import key_for_image, noise_like, resolve_seed
from cremage_tpu.models.kandinsky import DiffusionPrior
from cremage_tpu.models.unet import UNetModel
from cremage_tpu.models.vae import AutoencoderKL, decode_from_latent, encode_to_latent
from cremage_tpu.samplers import adacache as AC
from cremage_tpu.samplers import chunked as CH
from cremage_tpu.samplers import deepcache as DC
from cremage_tpu.samplers import kdiffusion as K
from cremage_tpu.samplers import schedules as S
from cremage_tpu.samplers.deepcache import max_cache_levels as _max_cache_levels
from cremage_tpu.samplers.denoiser import (EpsDenoiser, cfg_denoiser,
                                           cfg_interval_of)
from cremage_tpu.core.registry import SAMPLERS
from cremage_tpu.services.safety import ImageSafetyChecker, default_image_safety
from cremage_tpu.services.watermark import embed_watermark

logger = logging.getLogger(__name__)


def kandinsky_schedule() -> S.DiscreteSchedule:
    acp = S.alphas_cumprod_from_betas(S.make_betas_squaredcos())
    return S.DiscreteSchedule(S.sigmas_from_alphas_cumprod(acp))


@dataclasses.dataclass
class KandinskyBundle:
    prior: DiffusionPrior
    prior_params: Any
    decoder: UNetModel
    decoder_params: Any
    vae: AutoencoderKL              # MoVQ stand-in (KL interface)
    vae_params: Any
    text_encode: Callable[[str], Tuple[np.ndarray, np.ndarray]]
    # text_encode(prompt) -> (tokens (L, D_text), pooled (D_text,))
    schedule: S.DiscreteSchedule = dataclasses.field(
        default_factory=kandinsky_schedule)
    prior_steps: int = 25
    # Real-checkpoint extras (None on the random-weight path):
    # image_cond: KandinskyImageConditioner projecting the prior's image
    # embedding into (time-embed add, cross-attn tokens) — see
    # models/kandinsky.py. clip_mean/std: the prior diffuses in
    # normalized CLIP space; outputs are unnormalized emb*std+mean
    # (PriorTransformer post_process_latents semantics).
    image_cond: Any = None
    image_cond_params: Any = None
    clip_mean: Optional[np.ndarray] = None
    clip_std: Optional[np.ndarray] = None
    # Real-checkpoint decode/encode through the MoVQ VQ-VAE instead of
    # the KL stand-in: decode_latent(lat (B,h,w,4)) -> [-1,1] images;
    # encode_latent(img [-1,1] (B,H,W,3)) -> latents (img2img).  When
    # set they take precedence over (vae, vae_params).
    decode_latent: Optional[Callable] = None
    encode_latent: Optional[Callable] = None


def _noop(msg):
    pass


class KandinskyPipeline:
    def __init__(self, bundle: KandinskyBundle,
                 safety: Optional[ImageSafetyChecker] = None):
        self.bundle = bundle
        self.safety = safety or default_image_safety()
        self._cache: Dict[Tuple, Callable] = {}
        self._current_status: Callable = _noop
        self.pp_devices = None
        self.pp_n_stages: Optional[int] = None
        self.pp_microbatch: Optional[int] = None
        self._pp_cache: Dict[Tuple, Any] = {}

    def use_mesh_pp(self, devices, n_stages: Optional[int] = None,
                    microbatch: Optional[int] = None):
        """Pipeline-parallel decoder deployment (parallel/pipeline.py
        KandinskyPP): the flattened decoder UNet partitioned into
        FLOP-balanced contiguous stages on committed devices.  The
        prior (~3% of wall time) stays single-device.  Sampling is
        host-stepped, so only the deterministic Euler sampler is
        supported; excludes tome_ratio / deep_cache."""
        if hasattr(devices, "devices"):  # a Mesh
            devices = list(np.asarray(devices.devices).flat)
        self.pp_devices = list(devices)
        self.pp_n_stages = n_stages
        self.pp_microbatch = microbatch
        self._cache.clear()
        self._pp_cache.clear()
        return self

    # ---------------- prior ----------------

    def run_prior(self, prompt: str, negative_prompt: str, scale: float,
                  key) -> Tuple[np.ndarray, np.ndarray]:
        """Diffuse a CLIP image embedding from text (prior stage)."""
        b = self.bundle
        tokens, pooled = b.text_encode(prompt)
        n_tokens, n_pooled = b.text_encode(negative_prompt)
        sched = b.schedule
        sigmas = sched.get_sigmas(b.prior_steps)

        tok = jnp.asarray(tokens[None])
        ntok = jnp.asarray(n_tokens[None])
        pl = jnp.asarray(pooled[None])
        npl = jnp.asarray(n_pooled[None])

        def eps_model(x, t, cond):
            toks, pools = cond
            return b.prior.apply(b.prior_params, x, t, toks, pools)

        denoise = EpsDenoiser(eps_model, sched)
        den = cfg_denoiser(denoise, (tok, pl), (ntok, npl), scale)
        dim = b.prior.cfg.image_embed_dim
        x = noise_like(key, (1, dim)) * float(sigmas[0])
        emb = K.sample_euler_ancestral(den, x, sigmas, key=key)
        emb = np.asarray(emb[0], np.float32)
        if b.clip_mean is not None:
            emb = emb * np.asarray(b.clip_std, np.float32) + \
                np.asarray(b.clip_mean, np.float32)
        neg_emb = np.zeros((dim,), np.float32)
        if b.clip_mean is not None:
            # zeroed-embedding negative lives in unnormalized CLIP space
            neg_emb = np.asarray(b.clip_mean, np.float32).reshape(-1)
        return emb, neg_emb

    # ---------------- decoder ----------------

    def _decoder_program(self, opts, shape, dim):
        b = self.bundle
        name = opts.sampler if opts.sampler in K.SAMPLER_SCHEDULE else "Euler A"
        kind = K.SAMPLER_SCHEDULE[name]
        sched = b.schedule
        steps = opts.sampling_steps
        sigmas = (sched.get_sigmas(steps) if kind == "model"
                  else S.get_sigmas_karras(steps, sched.sigma_min,
                                           sched.sigma_max))
        scale = float(opts.scale)
        sampler_fn = SAMPLERS.get(name)
        dc = int(opts.deep_cache)
        dcb = max(1, min(int(opts.deep_cache_branch),
                         _max_cache_levels(b.decoder)))
        use_dc = dc >= 2
        if use_dc and name not in DC.DC_SAMPLERS:
            raise ValueError(
                "deep_cache requires a supported sampler "
                f"({', '.join(sorted(n for n in DC.DC_SAMPLERS if 'Sampler' not in n))}), "
                f"got {name!r}")
        ada = float(getattr(opts, "ada_cache", 0.0))
        ada_resc = (AC.load_calibration("kandinsky")
                    if ada > 0.0 else None)
        use_ada = ada > 0.0
        if use_ada:
            if use_dc:
                raise ValueError(
                    "ada_cache and deep_cache are both step caches — "
                    "enable at most one")
            if name not in DC.DC_SAMPLERS:
                raise ValueError(
                    "ada_cache requires a supported sampler "
                    f"({', '.join(sorted(n for n in DC.DC_SAMPLERS if 'Sampler' not in n))}), "
                    f"got {name!r}")
            if self.pp_devices is not None:
                raise ValueError(
                    "ada_cache does not compose with use_mesh_pp (the "
                    "cache rides the jitted sampler scan carry)")
        # ToMe: config-swapped decoder on the same param tree; the prior
        # diffuses a single embedding vector (no spatial tokens to merge)
        tr = float(opts.tome_ratio)
        decoder = b.decoder
        if tr > 0:
            decoder = type(decoder)(dataclasses.replace(
                decoder.cfg, tome_ratio=tr))
        # guidance interval applies to the decoder stage (the prior is
        # ~3% of wall time and keeps full CFG)
        cfgi = cfg_interval_of(opts)
        if cfgi is not None:
            if self.pp_devices is not None:
                raise ValueError(
                    "cfg_interval does not compose with use_mesh_pp (the "
                    "microbatch stream is sized by the doubled CFG batch)")

        def progress(i):
            self._current_status(f"{int(i) + 1} / {steps}")

        if self.pp_devices is not None:
            if use_dc:
                raise ValueError(
                    "deep_cache does not compose with use_mesh_pp (the "
                    "cache boundary is stage-local)")
            if tr > 0:
                raise ValueError(
                    "tome_ratio does not compose with use_mesh_pp (the "
                    "merge plan is stage-local)")
            if name != "Euler":
                raise ValueError(
                    "use_mesh_pp sampling is host-stepped and supports "
                    f"the Euler sampler only, got {name!r}")
            from cremage_tpu.models.kandinsky_decoder import KandinskyUNet
            from cremage_tpu.parallel.pipeline import KandinskyPP, UNetPP

            geom = (int(shape[1]), int(shape[2]))
            pp = self._pp_cache.get(geom)
            if pp is None:
                # the production decoder is a KandinskyUNet
                # (loader.py:830); UNetModel stand-ins (tests / custom
                # bundles) take the generic UNet staging
                cls = (KandinskyPP if isinstance(b.decoder, KandinskyUNet)
                       else UNetPP)
                pp = cls(b.decoder, b.decoder_params,
                         self.pp_devices, h=geom[0], w=geom[1],
                         n_stages=self.pp_n_stages)
                self._pp_cache[geom] = pp
            mb = self.pp_microbatch
            sig = np.asarray(sigmas, np.float64)

            def run_pp(params, x, img_embed, neg_embed, key):
                def eps_model(xx, tt, cond):
                    if b.image_cond is not None:
                        tvec, ctx = b.image_cond.apply(
                            b.image_cond_params, cond)
                    else:
                        ctx, tvec = cond[:, None, :], cond
                    out = pp(xx, tt, ctx, y=tvec, microbatch=mb)
                    return out[..., : xx.shape[-1]]   # eps half

                den = cfg_denoiser(EpsDenoiser(eps_model, sched),
                                   img_embed, neg_embed, scale)
                xx = jax.device_put(jnp.asarray(x, jnp.float32),
                                    pp.out_device)
                for i in range(len(sig) - 1):
                    d_i = den(xx, jnp.asarray(float(sig[i]), jnp.float32))
                    d = (xx - d_i.astype(jnp.float32)) / float(sig[i])
                    xx = xx + d * float(sig[i + 1] - sig[i])
                    progress(i)
                return xx

            return run_pp, sigmas

        def run(params, x, img_embed, neg_embed, key):
            def eps_model(xx, tt, cond, **mk):
                if b.image_cond is not None:
                    tvec, ctx = b.image_cond.apply(b.image_cond_params, cond)
                    out = decoder.apply(params, xx, tt, ctx, tvec, **mk)
                else:
                    ctx = cond[:, None, :]   # single image-embed token
                    out = decoder.apply(params, xx, tt, ctx, cond, **mk)
                aux = None
                if isinstance(out, tuple):
                    out, aux = out
                # the real decoder predicts [eps, variance]; samplers use eps
                out = out[..., : xx.shape[-1]]
                return out if aux is None else (out, aux)

            denoise = EpsDenoiser(eps_model, sched)
            # under DeepCache the guidance interval is handled by the
            # windowed carry denoiser (host-static step flags)
            den = cfg_denoiser(denoise, img_embed, neg_embed, scale,
                               interval=None if use_dc else cfgi)
            if use_dc:
                den_cap = lambda xx, ss: den(xx, ss, mode="capture",
                                             cache_levels=dcb)
                den_sh = lambda xx, ss, deep: den(
                    xx, ss, mode="shallow", cache_levels=dcb, deep=deep)
                _, deep_sd = jax.eval_shape(
                    den_cap, x, jnp.asarray(1.0, jnp.float32))
                cache0 = jnp.zeros(deep_sd.shape, deep_sd.dtype)
                if cfgi is not None:
                    den_c = cfg_denoiser(denoise, img_embed, None, scale)
                    c_cap = lambda xx, ss: den_c(xx, ss, mode="capture",
                                                 cache_levels=dcb)
                    c_sh = lambda xx, ss, deep: den_c(
                        xx, ss, mode="shallow", cache_levels=dcb,
                        deep=deep)
                    carry = DC.make_dc_denoise_windowed(
                        den_cap, den_sh, c_cap, c_sh, dc,
                        DC.window_flags(sigmas, cfgi), x.shape[0])
                else:
                    carry = DC.make_dc_denoise(den_cap, den_sh, dc)
                return DC.DC_SAMPLERS[name](carry, cache0, x, sigmas,
                                            key=key, progress_cb=progress)
            if use_ada:
                carry = AC.make_ada_denoise(
                    den, ada, len(sigmas) - 1, kind="den",
                    sigma_data=denoise.sigma_data,
                    rescale=ada_resc)
                return DC.DC_SAMPLERS[name](carry, AC.ada_cache0(x), x,
                                            sigmas, key=key,
                                            progress_cb=progress)
            return sampler_fn(den, x, sigmas, key=key, progress_cb=progress)

        bucket = ("kandinsky", name, steps, tuple(shape), dim, scale,
                  dc if use_dc else 0, dcb, tr, cfgi, ada, ada_resc)

        # Segmented execution for per-step progress where in-scan
        # io_callback cannot compile (samplers/chunked.py)
        if (CH.chunked_progress_active(self._current_status, _noop)
                and not use_dc and not use_ada
                and name in K.CHUNKABLE_PLANS):
            plan = K.CHUNKABLE_PLANS[name](sigmas)

            def make_den_cfg(params, img_embed, neg_embed):
                def eps_model(xx, tt, cond):
                    if b.image_cond is not None:
                        tvec, ctx = b.image_cond.apply(
                            b.image_cond_params, cond)
                        out = decoder.apply(params, xx, tt, ctx, tvec)
                    else:
                        ctx = cond[:, None, :]
                        out = decoder.apply(params, xx, tt, ctx, cond)
                    return out[..., : xx.shape[-1]]
                return cfg_denoiser(EpsDenoiser(eps_model, sched),
                                    img_embed, neg_embed, scale,
                                    interval=cfgi)

            def get_program(role, build):
                fn = self._cache.get(bucket + (role,))
                if fn is None:
                    fn = jax.jit(build())
                    self._cache[bucket + (role,)] = fn
                return fn

            def chunked_fn(params, x, img_embed, neg_embed, key):
                return CH.run_chunked(
                    plan, get_program=get_program,
                    make_denoise=make_den_cfg,
                    args=(params, img_embed, neg_embed), x=x, key=key,
                    progress=progress, segments=CH.default_segments())

            return chunked_fn, sigmas

        fn = self._cache.get(bucket)
        if fn is None:
            fn = jax.jit(run)
            self._cache[bucket] = fn
        return fn, sigmas

    def generate(self, opts: GenerationOptions, status_cb=_noop,
                 result_cb=None, init_image=None, mask_image=None
                 ) -> List[Tuple[np.ndarray, Dict[str, Any]]]:
        base_seed = resolve_seed(opts.seed)
        self._current_status = status_cb
        results = []
        img_index = 0
        for it in range(opts.n_iter):
            bsz = opts.n_samples
            key = key_for_image(base_seed, img_index)
            status_cb("prior")
            emb, neg = self.run_prior(opts.prompt, opts.negative_prompt,
                                      opts.scale, jax.random.fold_in(key, 1))
            emb_b = jnp.asarray(np.broadcast_to(emb[None], (bsz, len(emb))))
            neg_b = jnp.asarray(np.broadcast_to(neg[None], (bsz, len(neg))))
            h, w = opts.H // 8, opts.W // 8
            fn, sigmas = self._decoder_program(opts, (bsz, h, w, 4), len(emb))

            status_cb("decoder")
            if opts.mode == MODE_IMAGE_TO_IMAGE and init_image is not None:
                if self.bundle.encode_latent is not None:
                    lat0 = jnp.asarray(self.bundle.encode_latent(
                        np.asarray(init_image)[None]))
                elif self.bundle.vae is None:
                    raise RuntimeError(
                        "Kandinsky img2img needs a latent encoder: load "
                        "the MoVQ checkpoint with its encoder, or supply "
                        "a KL vae stand-in")
                else:
                    lat0 = encode_to_latent(
                        self.bundle.vae, self.bundle.vae_params,
                        jnp.asarray(init_image)[None].astype(jnp.bfloat16))
                lat0 = jnp.broadcast_to(lat0, (bsz,) + lat0.shape[1:])
                t_enc = max(1, int(opts.strength * opts.sampling_steps))
                trunc = S.truncate_for_img2img(sigmas, t_enc)
                x = lat0.astype(jnp.float32) + noise_like(
                    key, lat0.shape) * float(trunc[0])
                # run with truncated program
                fn_t, _ = self._decoder_program(
                    dataclasses.replace(opts, sampling_steps=t_enc),
                    (bsz, h, w, 4), len(emb))
                lat = fn_t(self.bundle.decoder_params, x, emb_b, neg_b, key)
            else:
                x = noise_like(key, (bsz, h, w, 4)) * float(sigmas[0])
                lat = fn(self.bundle.decoder_params, x, emb_b, neg_b, key)

            if self.bundle.decode_latent is not None:
                imgs = self.bundle.decode_latent(lat)
            else:
                imgs = decode_from_latent(self.bundle.vae,
                                          self.bundle.vae_params,
                                          lat.astype(jnp.bfloat16))
            imgs = device_to_img01(imgs)
            if opts.mode == MODE_INPAINTING and mask_image is not None \
                    and init_image is not None:
                m = (np.asarray(mask_image) >= 0.5).astype(np.float32)[..., None]
                init01 = (np.asarray(init_image, np.float32) + 1) / 2
                imgs = imgs * m[None] + init01[None] * (1 - m[None])
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
