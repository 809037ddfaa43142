"""SVD img2vid pipeline.

Behavior contract: reference `modules/sdxl/sdxl_pipeline/
svd_video_generator.py` (SURVEY.md §3.4): input image -> 14/25 latent
frames via the temporal VideoUNet, EulerEDM sampling (EDM sigmas
sigma_max=700) with LinearPredictionGuider (min 1.0 / max 2.5 across
frames), conditioning =
- crossattn: CLIP-H image embedding of the (resized 224^2) input frame,
  one token, replicated per frame;
- vector: Fourier embeddings of fps_id, motion_bucket_id, cond_aug;
- concat: VAE-encoded (image + cond_aug * noise), replicated per frame
  (channels 4 -> UNet in_channels 8);
frames decoded per-frame through the VAE and written as PNGs (the
reference writes ~/.cremage/tmp/svd/frames then runs FILM; see
services/film.py).

v-prediction denoiser with EDM c_noise = 0.25 log sigma
(sgm VScalingWithEDMcNoise + plain Denoiser).
"""
from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.core.rng import key_for_image, noise_like, resolve_seed
from cremage_tpu.models.clip_vision import CLIPVisionModel
from cremage_tpu.models.vae import AutoencoderKL, decode_from_latent
from cremage_tpu.models.video_unet import VideoUNet
from cremage_tpu.pipelines.sdxl import fourier_vector_embedding
from cremage_tpu.samplers import adacache as AC
from cremage_tpu.samplers import chunked as CH
from cremage_tpu.samplers import deepcache as DC
from cremage_tpu.samplers import edm as EDM
from cremage_tpu.samplers import kdiffusion as K

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class SVDOptions:
    """Mirrors the reference tool's parameters (video_generator.py)."""

    num_frames: int = 14
    num_steps: int = 25
    fps_id: int = 6
    motion_bucket_id: int = 127
    cond_aug: float = 0.02
    min_guidance_scale: float = 1.0
    max_guidance_scale: float = 2.5
    sigma_min: float = 0.002
    sigma_max: float = 700.0
    rho: float = 7.0
    seed: int = -1
    decoding_t: int = 1   # frames decoded per VAE call
    deep_cache: int = 1   # DeepCache interval (samplers/deepcache.py);
    #   1 = off (exact). Full video-UNet every Nth step, shallow between.
    deep_cache_branch: int = 1
    tome_ratio: float = 0.0   # Token merging on the spatial attn1
    #   (ops/tome.py; per-frame token grids). 0 = off (exact).
    ada_cache: float = 0.0    # Adaptive step caching (samplers/
    #   adacache.py, TeaCache family): skip the whole video UNet on
    #   steps whose accumulated input change stays below the threshold.
    #   0 = off (exact); excludes deep_cache.


@dataclasses.dataclass
class SVDBundle:
    unet: VideoUNet
    unet_params: Any
    vae: AutoencoderKL
    vae_params: Any
    clip_vision: Optional[Tuple[CLIPVisionModel, Any]] = None


def _noop(msg):
    pass


class SVDPipeline:
    def __init__(self, bundle: SVDBundle):
        self.bundle = bundle
        self._cache: Dict[Tuple, Callable] = {}
        self.pp_devices = None
        self.pp_n_stages: Optional[int] = None
        self.pp_microbatch: Optional[int] = None
        self._pp_cache: Dict[Tuple, Any] = {}

    def use_mesh_pp(self, devices, n_stages: Optional[int] = None,
                    microbatch: Optional[int] = None):
        """Pipeline-parallel deployment (parallel/pipeline.py
        VideoUNetPP): the flattened video UNet partitioned into
        FLOP-balanced contiguous stages on committed devices; the frame
        axis is the batch, so microbatches align to num_frames (the
        guider's [uc; c] doubling gives two frame-groups to stream).
        Host-stepped deterministic EulerEDM; excludes tome_ratio /
        deep_cache."""
        if hasattr(devices, "devices"):  # a Mesh
            devices = list(np.asarray(devices.devices).flat)
        self.pp_devices = list(devices)
        self.pp_n_stages = n_stages
        self.pp_microbatch = microbatch
        self._cache.clear()
        self._pp_cache.clear()
        return self
        self._current_status: Callable = _noop

    def _image_embedding(self, image01: np.ndarray) -> np.ndarray:
        """(H,W,3) [0,1] -> (1, 1024) CLIP-H embedding (or zeros when the
        vision tower isn't loaded — conditioning still exercises the
        crossattn path)."""
        if self.bundle.clip_vision is None:
            dim = self.bundle.unet.cfg.context_dim
            return np.zeros((1, dim), np.float32)
        from cremage_tpu.core.jitcache import jit_apply

        model, params = self.bundle.clip_vision
        import cv2

        img = cv2.resize(np.asarray(image01, np.float32),
                         (model.cfg.image_size, model.cfg.image_size),
                         interpolation=cv2.INTER_AREA)
        emb = jit_apply(model)(params, jnp.asarray(img[None]))
        return np.asarray(emb, np.float32)

    def _program(self, opts: SVDOptions, shape, ctx_dim):
        t_frames = opts.num_frames
        unet = self.bundle.unet
        tr = float(opts.tome_ratio)
        if not 0.0 <= tr < 0.75:
            raise ValueError(
                f"tome_ratio must be in [0, 0.75), got {tr}")
        if tr > 0.0:
            # ToMe has no params — config-swapped module, same tree
            unet = VideoUNet(
                dataclasses.replace(unet.cfg, tome_ratio=tr),
                num_frames=unet.num_frames)
        sigmas = EDM.EDMDiscretization(opts.sigma_min, opts.sigma_max,
                                       opts.rho)(opts.num_steps)

        def progress(i):
            self._current_status(f"Sampling {int(i) + 1} / {opts.num_steps}")

        dc = int(opts.deep_cache)
        dcb = int(opts.deep_cache_branch)
        ada = float(opts.ada_cache)
        ada_resc = (AC.load_calibration("svd")
                    if ada > 0.0 else None)
        if ada > 0.0:
            if dc >= 2:
                raise ValueError(
                    "ada_cache and deep_cache are both step caches — "
                    "enable at most one")
            if self.pp_devices is not None:
                raise ValueError(
                    "ada_cache does not compose with use_mesh_pp (the "
                    "cache rides the jitted sampler scan carry)")

        if self.pp_devices is not None:
            if dc >= 2:
                raise ValueError(
                    "deep_cache does not compose with use_mesh_pp (the "
                    "cache boundary is stage-local)")
            if tr > 0:
                raise ValueError(
                    "tome_ratio does not compose with use_mesh_pp (the "
                    "merge plan is stage-local)")
            from cremage_tpu.parallel.pipeline import VideoUNetPP

            pp_unet = unet
            if pp_unet.num_frames != t_frames:
                pp_unet = VideoUNet(pp_unet.cfg, num_frames=t_frames)
            geom = (int(shape[1]), int(shape[2]), t_frames)
            pp = self._pp_cache.get(geom)
            if pp is None:
                pp = VideoUNetPP(pp_unet, self.bundle.unet_params,
                                 self.pp_devices, h=geom[0], w=geom[1],
                                 n_stages=self.pp_n_stages)
                self._pp_cache[geom] = pp
            mb = self.pp_microbatch
            sig = np.asarray(sigmas, np.float64)

            def run_pp(params, x, ctx, vector, concat, key):
                def network(xx, c_noise, cond):
                    xin = jnp.concatenate(
                        [xx, cond["concat"].astype(xx.dtype)], axis=-1)
                    return pp(xin, c_noise, cond["crossattn"],
                              y=cond["vector"], microbatch=mb)

                def denoiser(xx, sigma, cond):
                    sigma = jnp.broadcast_to(
                        jnp.asarray(sigma, jnp.float32), (xx.shape[0],))
                    s = sigma.reshape(-1, 1, 1, 1)
                    c_skip = 1.0 / (s**2 + 1.0)
                    c_out = -s / jnp.sqrt(s**2 + 1.0)
                    c_in = 1.0 / jnp.sqrt(s**2 + 1.0)
                    c_noise = 0.25 * jnp.log(sigma)
                    v = network(xx * c_in, c_noise, cond)
                    return v.astype(jnp.float32) * c_out + xx * c_skip

                c = {"crossattn": ctx, "vector": vector, "concat": concat}
                uc = {"crossattn": jnp.zeros_like(ctx), "vector": vector,
                      "concat": jnp.zeros_like(concat)}
                denoise = EDM.linear_prediction_guider(
                    denoiser, c, uc, scale=opts.max_guidance_scale,
                    num_frames=t_frames,
                    min_scale=opts.min_guidance_scale,
                    max_scale=opts.max_guidance_scale,
                )
                # run_sgm_sampler's prepare_sampling_loop scaling + the
                # s_churn=0 Euler body, host-stepped
                xx = jnp.asarray(x, jnp.float32) * float(
                    np.sqrt(1.0 + sig[0] ** 2))
                xx = jax.device_put(xx, pp.out_device)
                for i in range(len(sig) - 1):
                    den = denoise(xx, jnp.asarray(float(sig[i]),
                                                  jnp.float32))
                    d = (xx - den.astype(jnp.float32)) / float(sig[i])
                    xx = xx + d * float(sig[i + 1] - sig[i])
                    progress(i)
                return xx

            return run_pp

        def run(params, x, ctx, vector, concat, key):
            def network(xx, c_noise, cond, **uk):
                xin = jnp.concatenate(
                    [xx, cond["concat"].astype(xx.dtype)], axis=-1)
                return unet.apply(params, xin, c_noise, cond["crossattn"],
                                  cond["vector"], **uk)

            def denoiser(xx, sigma, cond, **uk):
                sigma = jnp.broadcast_to(
                    jnp.asarray(sigma, jnp.float32), (xx.shape[0],))
                s = sigma.reshape(-1, 1, 1, 1)
                c_skip = 1.0 / (s**2 + 1.0)
                c_out = -s / jnp.sqrt(s**2 + 1.0)
                c_in = 1.0 / jnp.sqrt(s**2 + 1.0)
                c_noise = 0.25 * jnp.log(sigma)
                v = network(xx * c_in, c_noise, cond, **uk)
                aux = None
                if isinstance(v, tuple):  # deep-cache capture aux
                    v, aux = v
                den = v.astype(jnp.float32) * c_out + xx * c_skip
                return den if aux is None else (den, aux)

            c = {"crossattn": ctx, "vector": vector, "concat": concat}
            uc = {"crossattn": jnp.zeros_like(ctx), "vector": vector,
                  "concat": jnp.zeros_like(concat)}
            denoise = EDM.linear_prediction_guider(
                denoiser, c, uc, scale=opts.max_guidance_scale,
                num_frames=t_frames, min_scale=opts.min_guidance_scale,
                max_scale=opts.max_guidance_scale,
            )
            if dc >= 2:
                sig = np.asarray(sigmas, np.float64)
                x0 = x.astype(jnp.float32) * float(
                    np.sqrt(1.0 + sig[0] ** 2))
                den_cap = lambda xx, ss: denoise(
                    xx, ss, mode="capture", cache_levels=dcb)
                den_sh = lambda xx, ss, deep: denoise(
                    xx, ss, mode="shallow", cache_levels=dcb, deep=deep)
                _, dsd = jax.eval_shape(
                    den_cap, x0, jnp.asarray(1.0, jnp.float32))
                carry_den = DC.make_dc_denoise(den_cap, den_sh, dc)
                return DC.sample_euler_dc(
                    carry_den, jnp.zeros(dsd.shape, dsd.dtype), x0, sig,
                    key=key, progress_cb=progress)
            if ada > 0.0:
                sig = np.asarray(sigmas, np.float64)
                x0 = x.astype(jnp.float32) * float(
                    np.sqrt(1.0 + sig[0] ** 2))
                # the inline SVD denoiser's c_in=1/sqrt(s^2+1)
                # (sigma_data 1.0) — keep the indicator matched
                carry_den = AC.make_ada_denoise(
                    denoise, ada, len(sig) - 1, kind="den",
                    sigma_data=1.0, rescale=ada_resc)
                return DC.sample_euler_dc(
                    carry_den, AC.ada_cache0(x0), x0, sig,
                    key=key, progress_cb=progress)
            return EDM.run_sgm_sampler(
                "EulerEDMSampler", denoise, x, sigmas, key=key,
                progress_cb=progress,
            )

        bucket = ("svd", opts.num_steps, t_frames, tuple(shape), ctx_dim,
                  dc, dcb, tr, ada, ada_resc)

        # Segmented EDM-Euler for per-step progress where in-scan
        # io_callback cannot compile (samplers/chunked.py)
        if (CH.chunked_progress_active(self._current_status, _noop)
                and dc < 2 and ada <= 0.0):
            plan = K.plan_euler(sigmas)
            sig0 = float(np.asarray(sigmas, np.float64)[0])

            def make_denoise(params, ctx, vector, concat):
                def network(xx, c_noise, cond):
                    xin = jnp.concatenate(
                        [xx, cond["concat"].astype(xx.dtype)], axis=-1)
                    return unet.apply(params, xin, c_noise,
                                      cond["crossattn"], cond["vector"])

                def denoiser(xx, sigma, cond):
                    sigma = jnp.broadcast_to(
                        jnp.asarray(sigma, jnp.float32), (xx.shape[0],))
                    s = sigma.reshape(-1, 1, 1, 1)
                    c_skip = 1.0 / (s**2 + 1.0)
                    c_out = -s / jnp.sqrt(s**2 + 1.0)
                    c_in = 1.0 / jnp.sqrt(s**2 + 1.0)
                    c_noise = 0.25 * jnp.log(sigma)
                    v = network(xx * c_in, c_noise, cond)
                    return v.astype(jnp.float32) * c_out + xx * c_skip

                c = {"crossattn": ctx, "vector": vector, "concat": concat}
                uc = {"crossattn": jnp.zeros_like(ctx), "vector": vector,
                      "concat": jnp.zeros_like(concat)}
                return EDM.linear_prediction_guider(
                    denoiser, c, uc, scale=opts.max_guidance_scale,
                    num_frames=t_frames,
                    min_scale=opts.min_guidance_scale,
                    max_scale=opts.max_guidance_scale,
                )

            def prologue(xx, kk):
                # run_sgm_sampler's prepare_sampling_loop scaling
                return (xx.astype(jnp.float32)
                        * float(np.sqrt(1.0 + sig0 ** 2)))

            def get_program(role, build):
                fn = self._cache.get(bucket + (role,))
                if fn is None:
                    fn = jax.jit(build())
                    self._cache[bucket + (role,)] = fn
                return fn

            def chunked_fn(params, x, ctx, vector, concat, key):
                return CH.run_chunked(
                    plan, get_program=get_program,
                    make_denoise=make_denoise,
                    args=(params, ctx, vector, concat), x=x, key=key,
                    prologue=prologue, progress=progress,
                    segments=CH.default_segments())

            return chunked_fn

        fn = self._cache.get(bucket)
        if fn is None:
            fn = jax.jit(run)
            self._cache[bucket] = fn
        return fn

    def sample(
        self,
        image01: np.ndarray,
        opts: SVDOptions,
        status_cb=_noop,
        output_dir: Optional[str] = None,
    ) -> np.ndarray:
        """input image [0,1] (H,W,3) -> (T, H, W, 3) frames in [0,1].

        H/W must be multiples of 64 (reference warns/resizes; caller pads)."""
        self._current_status = status_cb
        seed = resolve_seed(opts.seed)
        key = key_for_image(seed)
        t = opts.num_frames
        h8, w8 = image01.shape[0] // 8, image01.shape[1] // 8

        status_cb("conditioning")
        emb = self._image_embedding(image01)           # (1, ctx)
        ctx = jnp.asarray(np.broadcast_to(emb[None], (t, 1, emb.shape[-1])))
        vector = np.concatenate([
            fourier_vector_embedding([opts.fps_id]),
            fourier_vector_embedding([opts.motion_bucket_id]),
            fourier_vector_embedding([opts.cond_aug]),
        ])
        vector = jnp.asarray(np.broadcast_to(vector[None], (t, len(vector))))

        img = jnp.asarray(image01, jnp.float32)[None] * 2.0 - 1.0
        aug = noise_like(jax.random.fold_in(key, 3), img.shape) * opts.cond_aug
        from cremage_tpu.core.jitcache import jit_apply

        mean, _ = jit_apply(self.bundle.vae, AutoencoderKL.encode)(
            self.bundle.vae_params, (img + aug).astype(jnp.bfloat16))
        concat = jnp.broadcast_to(mean.astype(jnp.float32),
                                  (t,) + mean.shape[1:])

        x = noise_like(key, (t, h8, w8, 4))
        fn = self._program(opts, x.shape, emb.shape[-1])
        status_cb("sampling")
        lat = fn(self.bundle.unet_params, x, ctx, vector, concat, key)

        status_cb("decoding frames")
        from cremage_tpu.utils.image import device_to_img01

        frames = []
        for i in range(0, t, max(1, opts.decoding_t)):
            chunk = lat[i:i + max(1, opts.decoding_t)]
            dec = decode_from_latent(self.bundle.vae, self.bundle.vae_params,
                                     chunk.astype(jnp.bfloat16))
            # uint8 on device before the pull (14 frames of 576x1024
            # fp32 = 99 MB over the 23 MB/s tunnel; uint8 is 25 MB)
            frames.append(device_to_img01(dec))
        frames = np.concatenate(frames, axis=0)

        if output_dir:
            from cremage_tpu.io.metadata import image_from_array

            os.makedirs(output_dir, exist_ok=True)
            for i, f in enumerate(frames):
                image_from_array(f * 2 - 1).save(
                    os.path.join(output_dir, f"frame_{i:05}.png"))
        return frames
