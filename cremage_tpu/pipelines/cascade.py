"""Stable Cascade pipeline: StageC prior -> StageB decoder -> output.

Behavior contract: reference `modules/stable_cascade/txt2img.py`
(:29,99-103) — diffusers StableCascadePriorPipeline +
StableCascadeDecoderPipeline, txt2img only:
- Stage C diffuses a 16-ch latent at 1/42 resolution ("effnet" space)
  from CLIP-bigG text conditioning (pooled + tokens);
- Stage B diffuses the 4-ch VQ latent at 1/4 resolution conditioned on
  the Stage C latent;
- Stage A (VQGAN) decodes to pixels.

Cores here are Würstchen-style conv+attention stages built from our
UNet blocks with the cascade conditioning flow (text -> C; C-latent ->
B). Wuerstchen checkpoint key mapping is tracked for a later round.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.core.config import GenerationOptions
from cremage_tpu.utils.image import device_to_img01
from cremage_tpu.core.rng import key_for_image, noise_like, resolve_seed
from cremage_tpu.models.unet import UNetConfig, UNetModel
from cremage_tpu.models.vae import AutoencoderKL, decode_from_latent
from cremage_tpu.samplers import adacache as AC
from cremage_tpu.samplers import chunked as CH
from cremage_tpu.samplers import deepcache as DC
from cremage_tpu.samplers import kdiffusion as K
from cremage_tpu.samplers import schedules as S
from cremage_tpu.samplers.deepcache import max_cache_levels as _max_cache_levels
from cremage_tpu.samplers.denoiser import (EpsDenoiser, cfg_denoiser,
                                           cfg_interval_of)
from cremage_tpu.services.safety import ImageSafetyChecker, default_image_safety
from cremage_tpu.services.watermark import embed_watermark

logger = logging.getLogger(__name__)


def stage_c_config(text_dim: int = 1280, **kw) -> UNetConfig:
    base = dict(
        in_channels=16, out_channels=16, model_channels=128,
        num_res_blocks=2, attention_resolutions=(1, 2),
        channel_mult=(1, 2), num_heads=8, transformer_depth=(1, 1),
        transformer_depth_middle=1, context_dim=text_dim,
        adm_in_channels=text_dim,
    )
    base.update(kw)
    return UNetConfig(**base)


def stage_b_config(c_latent_channels: int = 16, **kw) -> UNetConfig:
    # Stage B sees its own noisy 4-ch latent + the (upsampled) C latent
    base = dict(
        in_channels=4 + c_latent_channels, out_channels=4,
        model_channels=128, num_res_blocks=2, attention_resolutions=(2,),
        channel_mult=(1, 2, 4), num_heads=8, transformer_depth=(1, 1, 1),
        transformer_depth_middle=1, context_dim=1280,
    )
    base.update(kw)
    return UNetConfig(**base)


@dataclasses.dataclass
class CascadeBundle:
    # real cores: models/cascade.py StageC/StageB (Würstchen block
    # anatomy); a UNet stand-in is also accepted (channel-concat path)
    stage_c: Any
    stage_c_params: Any
    stage_b: Any
    stage_b_params: Any
    vqgan: AutoencoderKL          # Stage A (KL interface stand-in for VQ)
    vqgan_params: Any
    text_encode: Callable[[str], Tuple[np.ndarray, np.ndarray]]
    # (tokens (77, D), pooled (D,))
    c_compression: int = 32
    b_compression: int = 4
    schedule: S.DiscreteSchedule = dataclasses.field(
        default_factory=S.default_sd_schedule)
    # Real-checkpoint Stage A decode (Paella VQGAN) — takes precedence
    # over the KL-interface (vqgan, vqgan_params) stand-in when set:
    # decode_latent(lat (B,h,w,4)) -> [-1,1] images
    decode_latent: Optional[Callable] = None


def _noop(msg):
    pass


class CascadePipeline:
    def __init__(self, bundle: CascadeBundle,
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
        """Pipeline-parallel deployment (parallel/pipeline.py
        StageCPP/StageBPP): both Würstchen trunks partitioned into
        FLOP-balanced contiguous stages on committed devices (repeat-
        mapper levels stay atomic).  Sampling is host-stepped Euler
        Ancestral with the SAME per-step key schedule as the jitted
        sampler; requires the real StageB/StageC cores; excludes
        tome_ratio / deep_cache."""
        if hasattr(devices, "devices"):  # a Mesh
            devices = list(np.asarray(devices.devices).flat)
        self.pp_devices = list(devices)
        self.pp_n_stages = n_stages
        self.pp_microbatch = microbatch
        self._cache.clear()
        self._pp_cache.clear()
        return self

    def _stage_program(self, tag, model, opts, steps, shape, extra_sig):
        sched = self.bundle.schedule
        sigmas = sched.get_sigmas(steps)
        scale = float(opts.scale)
        dc = int(opts.deep_cache)
        # the two stages have different level counts (C: 2, B: 4);
        # clamp the shared knob per stage
        dcb = max(1, min(int(opts.deep_cache_branch),
                         _max_cache_levels(model)))
        use_dc = dc >= 2
        ada = float(getattr(opts, "ada_cache", 0.0))
        ada_resc = (AC.load_calibration("cascade")
                    if ada > 0.0 else None)
        use_ada = ada > 0.0
        if use_ada:
            if use_dc:
                raise ValueError(
                    "ada_cache and deep_cache are both step caches — "
                    "enable at most one")
            if self.pp_devices is not None:
                raise ValueError(
                    "ada_cache does not compose with use_mesh_pp (the "
                    "cache rides the jitted sampler scan carry)")
        # ToMe: config-swapped module on the same param tree (ops/tome.py).
        # Stage C is excluded: measured a wash on v5e (0.99x — its 24x24
        # latents leave too few tokens for the plan build + unmerge to pay
        # off; tools/bench_dit_tome.py). The knob still buys 1.39x via
        # Stage B, the wall-clock-dominant stage.
        tr = 0.0 if tag == "StageC" else float(opts.tome_ratio)
        if tr > 0:
            model = type(model)(dataclasses.replace(
                model.cfg, tome_ratio=tr))
        cfgi = cfg_interval_of(opts)
        if cfgi is not None:
            if self.pp_devices is not None:
                raise ValueError(
                    "cfg_interval does not compose with use_mesh_pp (the "
                    "microbatch stream is sized by the doubled CFG batch)")

        def progress(i):
            self._current_status(f"{tag} {int(i) + 1} / {steps}")

        from cremage_tpu.models.cascade import StageB as _StageB

        if self.pp_devices is not None:
            if use_dc:
                raise ValueError(
                    "deep_cache does not compose with use_mesh_pp (the "
                    "cache boundary is stage-local)")
            if float(opts.tome_ratio) > 0:
                raise ValueError(
                    "tome_ratio does not compose with use_mesh_pp (the "
                    "merge plan is stage-local)")
            from cremage_tpu.models.cascade import StageC as _StageC
            from cremage_tpu.parallel.pipeline import StageBPP, StageCPP

            if isinstance(model, _StageC):
                cls = StageCPP
            elif isinstance(model, _StageB):
                cls = StageBPP
            else:
                raise ValueError(
                    "use_mesh_pp needs the real Würstchen StageB/StageC "
                    "cores (UNet stand-ins: use the single-device path)")
            geom = (tag, int(shape[1]), int(shape[2]))
            pp = self._pp_cache.get(geom)
            if pp is None:
                pp = cls(model, (self.bundle.stage_c_params
                                 if cls is StageCPP
                                 else self.bundle.stage_b_params),
                         self.pp_devices, h=int(shape[1]), w=int(shape[2]),
                         n_stages=self.pp_n_stages)
                self._pp_cache[geom] = pp
            mb = self.pp_microbatch
            sig = np.asarray(sigmas, np.float64)
            n_steps = len(sig) - 1
            downs, ups = zip(*[K._ancestral_step_np(sig[i], sig[i + 1], 1.0)
                               for i in range(n_steps)])

            def run_pp(params, x, c_ctx, uc_ctx, c_vec, uc_vec, concat,
                       key):
                def eps_model(xx, tt, cond):
                    ctx, vec = cond
                    cc = concat
                    if cc is not None and cc.shape[0] != xx.shape[0]:
                        cc = jnp.concatenate(
                            [cc] * (xx.shape[0] // cc.shape[0]))
                    if isinstance(pp, StageBPP):
                        return pp(xx, tt, cc, vec, microbatch=mb)
                    return pp(xx, tt, ctx, vec, microbatch=mb)

                den = cfg_denoiser(EpsDenoiser(eps_model, sched),
                                   (c_ctx, c_vec), (uc_ctx, uc_vec), scale)
                # host-stepped mirror of K.sample_euler_ancestral
                # (same _keys schedule and eta=1 down/up split)
                keys = K._keys(key, n_steps)
                xx = jax.device_put(jnp.asarray(x, jnp.float32),
                                    pp.out_device)
                for i in range(n_steps):
                    d_i = den(xx, jnp.asarray(float(sig[i]), jnp.float32))
                    d = (xx - d_i.astype(jnp.float32)) / float(sig[i])
                    xx = xx + d * float(downs[i] - sig[i])
                    xx = xx + K._noise(keys[i][0], xx) * float(ups[i])
                    progress(i)
                return xx

            return run_pp, sigmas

        def run(params, x, c_ctx, uc_ctx, c_vec, uc_vec, concat, key):
            def eps_model(xx, tt, cond, **mk):
                ctx, vec = cond
                cc = concat
                if cc is not None and cc.shape[0] != xx.shape[0]:
                    cc = jnp.concatenate([cc] * (xx.shape[0] // cc.shape[0]))
                if isinstance(model, _StageB):
                    # real Würstchen Stage B: effnet latent + pooled text
                    return model.apply(params, xx, tt, cc, vec, **mk)
                if cc is not None:   # UNet stand-in: channel concat
                    xx = jnp.concatenate([xx, cc.astype(xx.dtype)], axis=-1)
                return model.apply(params, xx, tt, ctx, vec, **mk)

            denoise = EpsDenoiser(eps_model, sched)
            # under DeepCache the guidance interval is handled by the
            # windowed carry denoiser (host-static step flags)
            den = cfg_denoiser(denoise, (c_ctx, c_vec), (uc_ctx, uc_vec),
                               scale, interval=None if use_dc else cfgi)
            if use_dc:
                den_cap = lambda xx, ss: den(xx, ss, mode="capture",
                                             cache_levels=dcb)
                den_sh = lambda xx, ss, deep: den(
                    xx, ss, mode="shallow", cache_levels=dcb, deep=deep)
                _, deep_sd = jax.eval_shape(
                    den_cap, x, jnp.asarray(1.0, jnp.float32))
                cache0 = jnp.zeros(deep_sd.shape, deep_sd.dtype)
                if cfgi is not None:
                    den_c = cfg_denoiser(denoise, (c_ctx, c_vec), None,
                                         scale)
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
                return DC.sample_euler_ancestral_dc(
                    carry, cache0, x, sigmas, key=key, progress_cb=progress)
            if use_ada:
                carry = AC.make_ada_denoise(
                    den, ada, len(sigmas) - 1, kind="den",
                    sigma_data=denoise.sigma_data,
                    rescale=ada_resc)
                return DC.sample_euler_ancestral_dc(
                    carry, AC.ada_cache0(x), x, sigmas, key=key,
                    progress_cb=progress)
            return K.sample_euler_ancestral(den, x, sigmas, key=key,
                                            progress_cb=progress)

        bucket = (tag, steps, tuple(shape), extra_sig, scale,
                  dc if use_dc else 0, dcb, tr, cfgi, ada, ada_resc)

        # Segmented execution for per-step progress where in-scan
        # io_callback cannot compile (samplers/chunked.py)
        if (CH.chunked_progress_active(self._current_status, _noop)
                and not use_dc and not use_ada):
            plan = K.plan_euler_ancestral(sigmas)

            def make_den_cfg(params, c_ctx, uc_ctx, c_vec, uc_vec,
                             concat):
                def eps_model(xx, tt, cond):
                    ctx, vec = cond
                    cc = concat
                    if cc is not None and cc.shape[0] != xx.shape[0]:
                        cc = jnp.concatenate(
                            [cc] * (xx.shape[0] // cc.shape[0]))
                    if isinstance(model, _StageB):
                        return model.apply(params, xx, tt, cc, vec)
                    if cc is not None:
                        xx = jnp.concatenate([xx, cc.astype(xx.dtype)],
                                             axis=-1)
                    return model.apply(params, xx, tt, ctx, vec)
                return cfg_denoiser(EpsDenoiser(eps_model, sched),
                                    (c_ctx, c_vec), (uc_ctx, uc_vec),
                                    scale, interval=cfgi)

            def get_program(role, build):
                fn = self._cache.get(bucket + (role,))
                if fn is None:
                    fn = jax.jit(build())
                    self._cache[bucket + (role,)] = fn
                return fn

            def chunked_fn(params, x, c_ctx, uc_ctx, c_vec, uc_vec,
                           concat, key):
                return CH.run_chunked(
                    plan, get_program=get_program,
                    make_denoise=make_den_cfg,
                    args=(params, c_ctx, uc_ctx, c_vec, uc_vec, concat),
                    x=x, key=key, progress=progress,
                    segments=CH.default_segments())

            return chunked_fn, sigmas

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
            tokens, pooled = b.text_encode(opts.prompt)
            n_tokens, n_pooled = b.text_encode(opts.negative_prompt)

            def tile(a):
                return jnp.asarray(np.broadcast_to(a[None], (bsz,) + a.shape))

            ctx, nctx = tile(tokens), tile(n_tokens)
            vec, nvec = tile(pooled), tile(n_pooled)

            # Stage C: prior latents at 1/c_compression
            hc = opts.H // b.c_compression
            wc = opts.W // b.c_compression
            fn_c, sig_c = self._stage_program(
                "StageC", b.stage_c, opts, opts.sampling_steps,
                (bsz, hc, wc, 16), 0)
            x = noise_like(key, (bsz, hc, wc, 16)) * float(sig_c[0])
            status_cb("Stage C")
            c_lat = fn_c(b.stage_c_params, x, ctx, nctx, vec, nvec, None, key)

            # Stage B: decoder latents at 1/b_compression, conditioned on
            # the upsampled C latent
            hb = opts.H // b.b_compression
            wb = opts.W // b.b_compression
            c_up = jax.image.resize(c_lat, (bsz, hb, wb, 16), "nearest")
            fn_b, sig_b = self._stage_program(
                "StageB", b.stage_b, opts, max(10, opts.sampling_steps // 2),
                (bsz, hb, wb, 4), 16)
            x = noise_like(jax.random.fold_in(key, 2),
                           (bsz, hb, wb, 4)) * float(sig_b[0])
            status_cb("Stage B")
            b_lat = fn_b(b.stage_b_params, x, ctx, nctx, vec, nvec, c_up,
                         jax.random.fold_in(key, 2))

            status_cb("Stage A decode")
            if b.decode_latent is not None:
                imgs = b.decode_latent(b_lat)
            else:
                imgs = decode_from_latent(b.vqgan, b.vqgan_params,
                                          b_lat.astype(jnp.bfloat16))
            imgs = device_to_img01(imgs)
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
