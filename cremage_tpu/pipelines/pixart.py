"""PixArt-Σ txt2img pipeline.

Behavior contract: reference `modules/pixart_sigma/txt2img.py` —
diffusers PixArtSigmaPipeline, txt2img only, selectable model ids. T5
conditioning; eps-prediction DiT on the SD VAE with a true-linear DDPM
schedule; sampler: any k-diffusion entry (reference default DPM-solver
class) driven through the shared EpsDenoiser."""
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
from cremage_tpu.models.pixart import PixArt
from cremage_tpu.models.t5 import T5Encoder
from cremage_tpu.models.vae import AutoencoderKL, decode_from_latent
from cremage_tpu.ops.tome import check_dit_options as _check_dit_tome
from cremage_tpu.samplers import adacache as AC
from cremage_tpu.samplers import chunked as CH
from cremage_tpu.samplers import deepcache as DC
from cremage_tpu.samplers import kdiffusion as K
from cremage_tpu.samplers import schedules as S
from cremage_tpu.samplers.denoiser import (EpsDenoiser, cfg_denoiser,
                                           cfg_interval_of)
from cremage_tpu.core.registry import SAMPLERS
from cremage_tpu.services.safety import ImageSafetyChecker, default_image_safety
from cremage_tpu.services.watermark import embed_watermark

logger = logging.getLogger(__name__)


def pixart_schedule() -> S.DiscreteSchedule:
    """PixArt trains on the true-linear (0.0001, 0.02) DDPM table."""
    acp = S.alphas_cumprod_from_betas(S.make_betas_plain_linear())
    return S.DiscreteSchedule(S.sigmas_from_alphas_cumprod(acp))


@dataclasses.dataclass
class PixArtBundle:
    dit: PixArt
    dit_params: Any
    t5: Optional[Tuple[T5Encoder, Any]]
    t5_tokenize: Optional[Callable[[str], np.ndarray]]
    t5_len: int
    vae: AutoencoderKL
    vae_params: Any
    schedule: S.DiscreteSchedule = dataclasses.field(
        default_factory=pixart_schedule)
    t5_dim: int = 4096


def _noop(msg):
    pass


class PixArtPipeline:
    def __init__(self, bundle: PixArtBundle,
                 safety: Optional[ImageSafetyChecker] = None):
        from cremage_tpu.prompt.sentencepiece import as_t5_tokenize

        bundle.t5_tokenize = as_t5_tokenize(bundle.t5_tokenize, bundle.t5_len)
        self.bundle = bundle
        self.safety = safety or default_image_safety()
        self._cache: Dict[Tuple, Callable] = {}
        self._current_status: Callable = _noop
        self.sp_mesh = None
        self.sp_axis = "data"
        self.pp_devices = None
        self.pp_n_stages = None
        self.pp_microbatch = None
        self._pp_cache: Dict[Tuple, Any] = {}

    def use_mesh_pp(self, devices, n_stages: Optional[int] = None,
                    microbatch: Optional[int] = None):
        """Pipeline-parallel deployment (parallel/pipeline.py PixArtPP):
        the block chain partitioned into contiguous stages on committed
        devices, microbatches streamed through the stage jits.  Sampling
        is host-stepped (the staged forward cannot live inside one jit
        program), so only the deterministic Euler sampler is supported;
        excludes use_mesh_sp / tome_ratio / deep_cache."""
        if self.sp_mesh is not None:
            raise ValueError("choose one of use_mesh_sp / use_mesh_pp")
        if hasattr(devices, "devices"):  # a Mesh
            devices = list(np.asarray(devices.devices).flat)
        self.pp_devices = list(devices)
        self.pp_n_stages = n_stages
        self.pp_microbatch = microbatch
        self._cache.clear()
        self._pp_cache.clear()

    def use_mesh_sp(self, mesh, axis: str = "data"):
        if self.pp_devices is not None:
            raise ValueError("choose one of use_mesh_sp / use_mesh_pp")
        """Sequence-parallel deployment: params replicated over `mesh`,
        latent patch rows of every DiT forward sharded over `mesh[axis]`
        (parallel/sequence.py pixart_sp_apply) — the batch=1 latency
        axis."""
        from cremage_tpu.core.mesh import replicate_params

        self.bundle.dit_params = replicate_params(mesh,
                                                  self.bundle.dit_params)
        self.sp_mesh = mesh
        self.sp_axis = axis
        self._cache.clear()

    def _encode_text(self, prompt: str) -> np.ndarray:
        b = self.bundle
        if b.t5 is not None and b.t5_tokenize is not None:
            ids = np.asarray(b.t5_tokenize(prompt), np.int64)[: b.t5_len]
            ids = np.pad(ids, (0, b.t5_len - len(ids)))
            from cremage_tpu.core.jitcache import jit_apply

            return np.asarray(jit_apply(b.t5[0])(
                b.t5[1], jnp.asarray(ids[None])), np.float32)[0]
        return np.zeros((b.t5_len, b.t5_dim), np.float32)

    def _program(self, opts, shape, cond_shape):
        steps = opts.sampling_steps
        name = opts.sampler if opts.sampler in K.SAMPLER_SCHEDULE else "DPM++ 2M"
        kind = K.SAMPLER_SCHEDULE[name]
        sched = self.bundle.schedule
        sigmas = (sched.get_sigmas(steps) if kind == "model"
                  else S.get_sigmas_karras(steps, sched.sigma_min,
                                           sched.sigma_max))
        scale = float(opts.scale)
        dit = self.bundle.dit
        sampler_fn = SAMPLERS.get(name)
        dc = int(opts.deep_cache)
        dcb = int(opts.deep_cache_branch)
        use_dc = dc >= 2
        if use_dc and name not in DC.DC_SAMPLERS:
            raise ValueError(
                "deep_cache requires a supported sampler "
                f"({', '.join(sorted(n for n in DC.DC_SAMPLERS if 'Sampler' not in n))}), "
                f"got {name!r}")
        ada = float(getattr(opts, "ada_cache", 0.0))
        ada_resc = (AC.load_calibration("pixart")
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
        sp_mesh, sp_axis = self.sp_mesh, self.sp_axis
        tr = float(opts.tome_ratio)
        if tr > 0:
            _check_dit_tome(sp_mesh)
            # ToMe has no params — a config-swapped module runs on the
            # same param tree (ops/tome.py)
            dit = type(dit)(dataclasses.replace(dit.cfg, tome_ratio=tr))
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
                    "Δ-cache boundary is stage-local)")
            if tr > 0:
                raise ValueError(
                    "tome_ratio does not compose with use_mesh_pp (the "
                    "merge plan is stage-0-local)")
            if name != "Euler":
                raise ValueError(
                    "use_mesh_pp sampling is host-stepped and supports "
                    f"the Euler sampler only, got {name!r}")
            from cremage_tpu.parallel.pipeline import PixArtPP

            p = dit.cfg.patch_size
            geom = (shape[1] // p, shape[2] // p)
            pp = self._pp_cache.get(geom)
            if pp is None:
                pp = PixArtPP(dit, self.bundle.dit_params, self.pp_devices,
                              hp=geom[0], wp=geom[1],
                              n_stages=self.pp_n_stages)
                self._pp_cache[geom] = pp
            mb = self.pp_microbatch
            sig = np.asarray(sigmas, np.float64)

            def run_pp(params, x, c, uc, key):
                # EpsDenoiser/cfg_denoiser are plain jax functions — they
                # wrap the staged forward eagerly; the Euler update is
                # host-stepped (exact: s_churn=0 k-diffusion Euler).
                def eps_model(xx, tt, cond):
                    out = pp(xx, tt, cond, microbatch=mb)
                    return out[..., : xx.shape[-1]]   # learned-sigma half

                den_cfg = cfg_denoiser(EpsDenoiser(eps_model, sched),
                                       c, uc, scale)
                xx = jax.device_put(x.astype(jnp.float32), pp.out_device)
                for i in range(len(sig) - 1):
                    den = den_cfg(xx, jnp.asarray(float(sig[i]),
                                                  jnp.float32))
                    d = (xx - den.astype(jnp.float32)) / float(sig[i])
                    xx = xx + d * float(sig[i + 1] - sig[i])
                    progress(i)
                return xx

            return run_pp, sigmas

        def run(params, x, c, uc, key):
            def eps_model(xx, tt, cond, **mk):
                if sp_mesh is not None:
                    from cremage_tpu.parallel.sequence import pixart_sp_apply

                    # DeepCache composes: the Δ-cache is per-token,
                    # so capture/shallow ride through token-sharded
                    out = pixart_sp_apply(dit, params, sp_mesh, xx, tt, cond,
                                          axis=sp_axis, **mk)
                else:
                    out = dit.apply(params, xx, tt, cond, **mk)
                aux = None
                if isinstance(out, tuple):
                    out, aux = out
                out = out[..., : xx.shape[-1]]  # learned-sigma half dropped
                return out if aux is None else (out, aux)

            denoise = EpsDenoiser(eps_model, sched)
            # under DeepCache the guidance interval is handled by the
            # windowed carry denoiser (host-static step flags)
            den_cfg = cfg_denoiser(denoise, c, uc, scale,
                                   interval=None if use_dc else cfgi)
            if use_dc:
                den_cap = lambda xx, ss: den_cfg(xx, ss, mode="capture",
                                                 cache_depth=dcb)
                den_sh = lambda xx, ss, deep: den_cfg(
                    xx, ss, mode="shallow", cache_depth=dcb, deep=deep)
                _, deep_sd = jax.eval_shape(
                    den_cap, x, jnp.asarray(1.0, jnp.float32))
                cache0 = jnp.zeros(deep_sd.shape, deep_sd.dtype)
                if cfgi is not None:
                    den_c = cfg_denoiser(denoise, c, None, scale)
                    c_cap = lambda xx, ss: den_c(xx, ss, mode="capture",
                                                 cache_depth=dcb)
                    c_sh = lambda xx, ss, deep: den_c(
                        xx, ss, mode="shallow", cache_depth=dcb, deep=deep)
                    carry = DC.make_dc_denoise_windowed(
                        den_cap, den_sh, c_cap, c_sh, dc,
                        DC.window_flags(sigmas, cfgi), x.shape[0])
                else:
                    carry = DC.make_dc_denoise(den_cap, den_sh, dc)
                return DC.DC_SAMPLERS[name](carry, cache0, x, sigmas,
                                            key=key, progress_cb=progress)
            if use_ada:
                carry = AC.make_ada_denoise(
                    den_cfg, ada, len(sigmas) - 1, kind="den",
                    rescale=ada_resc)
                return DC.DC_SAMPLERS[name](carry, AC.ada_cache0(x), x,
                                            sigmas, key=key,
                                            progress_cb=progress)
            return sampler_fn(den_cfg, x, sigmas, key=key,
                              progress_cb=progress)

        bucket = ("pixart", name, steps, tuple(shape), tuple(cond_shape),
                  scale, sp_mesh is not None, dc if use_dc else 0, dcb, tr,
                  cfgi, ada, ada_resc)

        # Segmented execution for per-step progress where in-scan
        # io_callback cannot compile (samplers/chunked.py)
        if (CH.chunked_progress_active(self._current_status, _noop)
                and not use_dc and not use_ada
                and name in K.CHUNKABLE_PLANS):
            plan = K.CHUNKABLE_PLANS[name](sigmas)

            def make_den_cfg(params, cc, ucc):
                def eps_model(xx, tt, cond):
                    if sp_mesh is not None:
                        from cremage_tpu.parallel.sequence import \
                            pixart_sp_apply

                        out = pixart_sp_apply(dit, params, sp_mesh, xx,
                                              tt, cond, axis=sp_axis)
                    else:
                        out = dit.apply(params, xx, tt, cond)
                    return out[..., : xx.shape[-1]]
                return cfg_denoiser(EpsDenoiser(eps_model, sched),
                                    cc, ucc, scale, interval=cfgi)

            def get_program(role, build):
                fn = self._cache.get(bucket + (role,))
                if fn is None:
                    fn = jax.jit(build())
                    self._cache[bucket + (role,)] = fn
                return fn

            def chunked_fn(params, x, c, uc, key):
                return CH.run_chunked(
                    plan, get_program=get_program,
                    make_denoise=make_den_cfg, args=(params, c, uc),
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
        base_seed = resolve_seed(opts.seed)
        self._current_status = status_cb
        results = []
        img_index = 0
        for it in range(opts.n_iter):
            b = opts.n_samples
            status_cb("encoding prompt")
            c = self._encode_text(opts.prompt)
            uc = self._encode_text(opts.negative_prompt)
            c_b = jnp.asarray(np.broadcast_to(c[None], (b,) + c.shape))
            uc_b = jnp.asarray(np.broadcast_to(uc[None], (b,) + uc.shape))
            key = key_for_image(base_seed, img_index)
            h, w = opts.H // 8, opts.W // 8
            fn, sigmas = self._program(opts, (b, h, w, 4),
                                       c_b.shape)
            x = noise_like(key, (b, h, w, 4)) * float(sigmas[0])
            lat = fn(self.bundle.dit_params, x, c_b, uc_b, key)
            status_cb("decoding")
            imgs = decode_from_latent(self.bundle.vae, self.bundle.vae_params,
                                      lat.astype(jnp.bfloat16))
            imgs = device_to_img01(imgs)
            if opts.safety_check:
                imgs, _ = self.safety.check(imgs)
            for i in range(b):
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
