"""SD1.5 generation pipeline: txt2img / img2img / inpaint.

Behavior contract: reference `modules/sd/image_generator.py:569 generate`
call stack (SURVEY.md §3.2) — prompt weighting + chunking + filler-pad,
clip_skip, sampler menu dispatch (DDIM + 11 k-diffusion), CFG, hires fix,
batch loop with per-image seed = seed+i, wildcards re-resolved per batch,
safety filter, watermark, PNG `generation_data` metadata. Inpainting uses
the 9-channel UNet with [mask, masked-latent] concat conditioning
(`modules/sd/inpaint.py:45-120` make_batch_sd + generate).

TPU-first design: the whole denoising loop is one jitted lax.scan program
per (batch, H, W, sampler, steps, cfg-on) bucket, cached; conditioning is
precomputed host-side; models never move between devices (no low_vram
staging); batch-axis sharding over a ('data','model') mesh happens by
placing inputs with data_sharding before calling the jitted program.
"""
from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.core.config import (
    GenerationOptions, MODE_IMAGE_TO_IMAGE, MODE_INPAINTING, MODE_TEXT_TO_IMAGE,
)
from cremage_tpu.utils.image import device_to_img01
from cremage_tpu.core.rng import key_for_image, noise_like, resolve_seed
from cremage_tpu.models.unet import UNetModel
from cremage_tpu.models.vae import AutoencoderKL, decode_from_latent, encode_to_latent
from cremage_tpu.pipelines.conditioning import TextEncoder, tile_batch
from cremage_tpu.samplers import chunked as CH
from cremage_tpu.samplers import ddim as DDIM
from cremage_tpu.samplers import adacache as AC
from cremage_tpu.samplers import deepcache as DC
from cremage_tpu.samplers import kdiffusion as K
from cremage_tpu.samplers import ldm_extra as LDMX
from cremage_tpu.samplers import lcm as LCM
from cremage_tpu.samplers import schedules as S
from cremage_tpu.samplers.denoiser import (EpsDenoiser, cfg_denoiser,
                                           cfg_interval_of)
from cremage_tpu.core.registry import SAMPLERS
from cremage_tpu.prompt.wildcards import resolve_wildcards
from cremage_tpu.services.safety import ImageSafetyChecker, default_image_safety
from cremage_tpu.services.watermark import embed_watermark

logger = logging.getLogger(__name__)

StatusCb = Callable[[str], None]

# samplers driven by ddpm timestep t (not sigma): noise init is N(0, I)
# and dispatch goes through the ldm-style schedule builders. DDIM is the
# reference's menu entry; PLMS / DPM Solver are its two vendored
# non-menu samplers (ldm/models/diffusion/{plms.py,dpm_solver/}),
# exposed here via /v1/meta "extra_samplers".  LCM (samplers/lcm.py,
# beyond reference parity) pairs with LCM-LoRA weights merged through
# io/lora.py for 4-8-step sampling; its noise init uses the LCM grid's
# own top sigma (see _sigma0).
T_DRIVEN_SAMPLERS = ("DDIM", "PLMS", "DPM Solver", "LCM")


@dataclasses.dataclass
class SD15Bundle:
    """All loaded model state for one (ckpt, vae, loras, ...) combination."""

    unet: UNetModel
    unet_params: Any
    text: TextEncoder
    vae: AutoencoderKL
    vae_params: Any
    schedule: S.DiscreteSchedule
    controlnet: Optional[Tuple[Any, Any]] = None  # (model, params)
    inpaint: bool = False
    faceid_proj: Optional[Tuple[Any, Any]] = None  # (proj module, params)
    faceid_num_tokens: int = 0
    faceid_kind: str = "mlp"  # "mlp" | "plus" (ProjPlusModel, plusv2)

    @property
    def latent_channels(self) -> int:
        return 4


def _noop_status(msg: str) -> None:
    pass


class SD15Pipeline:
    def __init__(
        self,
        bundle: SD15Bundle,
        safety: Optional[ImageSafetyChecker] = None,
        face_fixer: Optional[Callable] = None,
        mesh=None,
    ):
        self.bundle = bundle
        self.safety = safety or default_image_safety()
        self.face_fixer = face_fixer
        self.mesh = None
        self._gen_cache: Dict[Tuple, Callable] = {}
        self.pp_devices = None
        self.pp_n_stages: Optional[int] = None
        self.pp_microbatch: Optional[int] = None
        self._pp_cache: Dict[Tuple, Any] = {}
        if mesh is not None:
            self.use_mesh(mesh)

    # ---------------- multi-chip ----------------

    def use_mesh(self, mesh, tensor_parallel: bool = False):
        """Adopt a ('data','model') mesh: params replicated (or
        TP-sharded over 'model'), activations batch-sharded over 'data'
        at each jitted-program boundary.  XLA/GSPMD inserts the ICI
        collectives — the sampler/UNet code is unchanged (SURVEY §5
        distributed backend; the reference is single-GPU)."""
        if self.pp_devices is not None:
            raise ValueError("choose one of use_mesh / use_mesh_pp")
        from cremage_tpu.core.mesh import replicate_params

        if tensor_parallel:
            from cremage_tpu.parallel.sharding import shard_params_tp

            self.bundle.unet_params = shard_params_tp(
                mesh, self.bundle.unet_params)
        else:
            self.bundle.unet_params = replicate_params(
                mesh, self.bundle.unet_params)
        self.bundle.vae_params = replicate_params(mesh,
                                                  self.bundle.vae_params)
        if self.bundle.controlnet is not None:
            cn, cn_params = self.bundle.controlnet
            self.bundle.controlnet = (cn, replicate_params(mesh, cn_params))
        self.mesh = mesh
        self._gen_cache.clear()
        return self

    def use_mesh_pp(self, devices, n_stages: Optional[int] = None,
                    microbatch: Optional[int] = None):
        """Pipeline-parallel deployment (parallel/pipeline.py UNetPP):
        the flattened UNet chain partitioned into FLOP-balanced
        contiguous stages on committed devices, skips riding the pipe,
        microbatches streamed through the stage jits.  Sampling is
        host-stepped (the staged forward cannot live inside one jit
        program), so only the deterministic Euler sampler is supported;
        excludes use_mesh / tome_ratio / deep_cache / ControlNet."""
        if self.mesh is not None:
            raise ValueError("choose one of use_mesh / use_mesh_pp")
        import numpy as _np
        if hasattr(devices, "devices"):  # a Mesh
            devices = list(_np.asarray(devices.devices).flat)
        self.pp_devices = list(devices)
        self.pp_n_stages = n_stages
        self.pp_microbatch = microbatch
        self._gen_cache.clear()
        self._pp_cache.clear()
        return self

    def _shard_batch_args(self, *arrays):
        """data_sharding for batch-carrying sampler inputs when a mesh
        is active; batch sizes that don't divide the data axis fall back
        to the default placement (replicated compute, still correct)."""
        if self.mesh is None:
            return arrays
        from cremage_tpu.core.mesh import DATA_AXIS, data_sharding

        dsize = self.mesh.shape[DATA_AXIS]
        out = []
        for a in arrays:
            if (a is not None and hasattr(a, "ndim") and a.ndim >= 1
                    and a.shape[0] % dsize == 0 and a.shape[0] >= dsize):
                a = jax.device_put(jnp.asarray(a),
                                   data_sharding(self.mesh, a.ndim))
            out.append(a)
        return tuple(out)

    # ---------------- conditioning ----------------

    def _conditioning(self, opts: GenerationOptions, batch: int,
                      face_embedding: Optional[np.ndarray] = None):
        c, uc = self.bundle.text.encode_pair(
            opts.prompt, opts.negative_prompt, opts.clip_skip
        )
        if self.bundle.faceid_proj is not None and face_embedding is not None:
            # 4 FaceID tokens appended after the 77n text tokens; uncond
            # side gets tokens from a zero id-embedding (reference
            # ip_adapter get_image_embeds + image_generator.py:810-814)
            proj, proj_params = self.bundle.faceid_proj
            if self.bundle.faceid_kind == "plus":
                # Plus(-v2): mix id tokens with the CLIP-vision embeds
                # of the aligned crop; the uncond side runs a zero id
                # embedding against the mean-image CLIP embeds
                # (reference ip_adapter_faceid.py:432-460, shortcut=True
                # == v2 per generate_face_embedding_from_image :738)
                fd = face_embedding if isinstance(face_embedding, dict) \
                    else {}
                if not {"id", "clip_embeds", "uncond_clip_embeds"} <= set(fd):
                    raise ValueError(
                        "FaceID Plus conditioning needs {'id', "
                        "'clip_embeds', 'uncond_clip_embeds'}; pass the "
                        "face photo so the backend can build them")
                emb = np.asarray(fd["id"], np.float32).reshape(1, -1)
                ce = jnp.asarray(fd["clip_embeds"],
                                 jnp.float32)[None]
                uce = jnp.asarray(fd["uncond_clip_embeds"],
                                  jnp.float32)[None]
                scale = float(fd.get("s_scale", 1.0))
                shortcut = bool(fd.get("shortcut", True))
                tok_c = np.asarray(
                    proj.apply(proj_params, jnp.asarray(emb), ce,
                               shortcut=shortcut, scale=scale),
                    np.float32)[0]
                tok_uc = np.asarray(
                    proj.apply(proj_params,
                               jnp.zeros_like(jnp.asarray(emb)), uce,
                               shortcut=shortcut, scale=scale),
                    np.float32)[0]
            else:
                emb = np.asarray(face_embedding, np.float32).reshape(1, -1)
                tok_c = np.asarray(proj.apply(proj_params, jnp.asarray(emb)),
                                   np.float32)[0]
                tok_uc = np.asarray(
                    proj.apply(proj_params, jnp.zeros_like(jnp.asarray(emb))),
                    np.float32)[0]
            c = np.concatenate([c, tok_c], axis=0)
            uc = np.concatenate([uc, tok_uc], axis=0)
        return tile_batch(c, batch), tile_batch(uc, batch)

    # ---------------- model fns ----------------

    def _eps_model(self, params, extra_channels: Optional[jnp.ndarray] = None,
                   cn_params=None, hint: Optional[jnp.ndarray] = None,
                   control_weight: float = 1.0, tome_ratio: float = 0.0):
        unet = self.bundle.unet
        if tome_ratio > 0.0:
            # ToMe has no params — a config-swapped module runs on the
            # same param tree (ops/tome.py)
            unet = UNetModel(dataclasses.replace(
                unet.cfg, tome_ratio=float(tome_ratio)))
        cn_model = self.bundle.controlnet[0] if self.bundle.controlnet else None

        def _tile(arr, b):
            if arr.shape[0] != b:
                reps = b // arr.shape[0]
                arr = jnp.concatenate([arr] * reps, axis=0)
            return arr

        def eps(x, t, cond, **unet_kwargs):
            # unet_kwargs: deep-cache mode/deep/cache_levels ride through
            # the denoiser/CFG wrappers (samplers/deepcache.py)
            control = None
            if cn_model is not None and hint is not None:
                h = _tile(hint, x.shape[0])
                res_in, res_mid = cn_model.apply(cn_params, x, h, t, cond)
                control = ([r * control_weight for r in res_in],
                           res_mid * control_weight)
            if extra_channels is not None:
                ec = _tile(extra_channels, x.shape[0])
                x = jnp.concatenate([x, ec.astype(x.dtype)], axis=-1)
            return unet.apply(params, x, t, cond, None, control, **unet_kwargs)

        return eps

    # ---------------- sampling ----------------
    #
    # NOTE on jit structure: the whole sampler run is one jitted program
    # with the 860M-param pytree passed as an *argument*. Closing over
    # device arrays would embed them as multi-GB HLO constants (XLA
    # lowering captures closed-over arrays by value), which makes compiles
    # through the TPU tunnel pathologically slow. Runner programs are
    # cached per (sampler, steps, shapes, scale-on, ...) bucket.

    def _runner(self, bucket, build):
        fn = self._gen_cache.get(bucket)
        if fn is None:
            fn = jax.jit(build())
            self._gen_cache[bucket] = fn
        return fn

    def _sample(
        self,
        opts: GenerationOptions,
        x_init: Optional[jnp.ndarray],
        c: jnp.ndarray,
        uc: jnp.ndarray,
        key: jax.Array,
        steps: int,
        t_enc: Optional[int] = None,
        init_latent: Optional[jnp.ndarray] = None,
        extra_channels: Optional[jnp.ndarray] = None,
        hint: Optional[jnp.ndarray] = None,
        control_weight: float = 1.0,
        status_cb: StatusCb = _noop_status,
    ) -> jnp.ndarray:
        """Run the selected sampler as one cached jitted program. If
        t_enc is given, does partial denoising from init_latent (img2img)."""
        name = opts.sampler
        total = t_enc if t_enc is not None else steps
        scale = float(opts.scale)
        has_extra = extra_channels is not None
        shape = (x_init if x_init is not None else init_latent).shape

        # indirection so cached jitted programs always call the *current*
        # job's status callback, not the one captured at compile time
        self._current_status = status_cb

        def progress(i):
            self._current_status(f"{int(i) + 1} / {total}")

        churn = (opts.sampler_s_churn, opts.sampler_s_tmin,
                 opts.sampler_s_tmax, opts.sampler_s_noise)
        tr = float(opts.tome_ratio)
        if not 0.0 <= tr < 0.75:
            raise ValueError(
                f"tome_ratio must be in [0, 0.75), got {tr} (a 2x2 dst "
                "grid leaves only 3N/4 mergeable src tokens)")
        cfgi = cfg_interval_of(opts)
        ada = float(getattr(opts, "ada_cache", 0.0))
        ada_resc = (AC.load_calibration("sd15")
                    if ada > 0.0 else None)
        use_ada = ada > 0.0
        bucket = (name, steps, t_enc, tuple(shape), tuple(c.shape), scale,
                  has_extra, float(opts.ddim_eta), churn,
                  hint is not None, float(control_weight),
                  int(opts.deep_cache), int(opts.deep_cache_branch), tr,
                  cfgi, ada, ada_resc)

        dc = int(opts.deep_cache)
        dcb = int(opts.deep_cache_branch)
        use_dc = dc >= 2
        if use_ada:
            if use_dc:
                raise ValueError(
                    "ada_cache and deep_cache are both step caches — "
                    "enable at most one")
            if name not in DC.DC_SAMPLERS:
                # list only names this pipeline's own registry accepts
                # (DC_SAMPLERS also carries EDM-menu names SDXL uses)
                ok = sorted(set(DC.DC_SAMPLERS) & set(SAMPLERS.names())
                            - set(T_DRIVEN_SAMPLERS))
                raise ValueError(
                    "ada_cache requires a supported sampler "
                    f"({', '.join(n for n in ok if 'Sampler' not in n)}), "
                    f"got {name!r}")
            if self.pp_devices is not None:
                raise ValueError(
                    "ada_cache does not compose with use_mesh_pp (the "
                    "cache rides the jitted sampler scan carry)")
        if cfgi is not None:
            if name in T_DRIVEN_SAMPLERS:
                raise ValueError(
                    "cfg_interval is defined in sigma space and supports "
                    "the k-diffusion sampler menu only, got "
                    f"{name!r} (t-driven)")
            if self.pp_devices is not None:
                raise ValueError(
                    "cfg_interval does not compose with use_mesh_pp (the "
                    "microbatch stream is sized by the doubled CFG batch)")
        if use_dc and name not in DC.DC_SAMPLERS:
            raise ValueError(
                "deep_cache requires a supported sampler "
                f"({', '.join(sorted(set(DC.DC_SAMPLERS) & set(SAMPLERS.names())))}), "
                f"got {name!r}")
        if use_dc and hint is not None:
            raise ValueError("deep_cache cannot be combined with ControlNet "
                             "(control residuals target the cached deep blocks)")

        # Segmented execution restores per-step-ish progress where the
        # in-scan io_callback cannot compile (the axon TPU tunnel):
        # supported for the exact sampling paths of the chunk-planned
        # samplers; DC/ada carry denoisers and the T-driven extras fall
        # back to the coarse worker statuses there (samplers/chunked.py)
        use_chunked = (
            CH.chunked_progress_active(status_cb, _noop_status)
            and not use_dc and not use_ada
            and self.pp_devices is None
            and (name in K.CHUNKABLE_PLANS or name == "DDIM"))

        if self.pp_devices is not None:
            if use_dc:
                raise ValueError(
                    "deep_cache does not compose with use_mesh_pp (the "
                    "cache boundary is stage-local)")
            if tr > 0:
                raise ValueError(
                    "tome_ratio does not compose with use_mesh_pp (the "
                    "merge plan is stage-local)")
            if hint is not None:
                raise ValueError(
                    "ControlNet does not compose with use_mesh_pp "
                    "(control residuals target blocks on every stage)")
            if name != "Euler":
                raise ValueError(
                    "use_mesh_pp sampling is host-stepped and supports "
                    f"the Euler sampler only, got {name!r}")
            if opts.sampler_s_churn:
                raise ValueError(
                    "use_mesh_pp runs the deterministic s_churn=0 Euler")
            from cremage_tpu.parallel.pipeline import UNetPP

            sigmas = self.bundle.schedule.get_sigmas(steps)
            if t_enc is not None:
                sigmas = S.truncate_for_img2img(sigmas, t_enc)
            geom = (int(shape[1]), int(shape[2]))
            pp = self._pp_cache.get(geom)
            if pp is None:
                pp = UNetPP(self.bundle.unet, self.bundle.unet_params,
                            self.pp_devices, h=geom[0], w=geom[1],
                            n_stages=self.pp_n_stages)
                self._pp_cache[geom] = pp
            mb = self.pp_microbatch

            def eps_model(xx, tt, cond):
                if extra_channels is not None:
                    ec = extra_channels
                    if ec.shape[0] != xx.shape[0]:
                        ec = jnp.concatenate(
                            [ec] * (xx.shape[0] // ec.shape[0]), axis=0)
                    xx = jnp.concatenate([xx, ec.astype(xx.dtype)], axis=-1)
                return pp(xx, tt, cond, microbatch=mb)

            den_cfg = cfg_denoiser(
                EpsDenoiser(eps_model, self.bundle.schedule), c, uc, scale)
            x = init_latent if t_enc is not None else x_init
            xx = jnp.asarray(x, jnp.float32)
            if t_enc is not None:
                # k-space stochastic encode, same as the jitted path
                xx = xx + noise_like(key, xx.shape) * float(sigmas[0])
            xx = jax.device_put(xx, pp.out_device)
            sig = np.asarray(sigmas, np.float64)
            for i in range(len(sig) - 1):
                den = den_cfg(xx, jnp.asarray(float(sig[i]), jnp.float32))
                d = (xx - den.astype(jnp.float32)) / float(sig[i])
                xx = xx + d * float(sig[i + 1] - sig[i])
                progress(i)
            return xx

        if name in T_DRIVEN_SAMPLERS:
            # recover the model's alphas_cumprod from its sigma table
            # (sigma = sqrt((1-a)/a)  =>  a = 1/(1+sigma^2))
            acp = 1.0 / (1.0 + self.bundle.schedule.sigmas**2)
            if name == "DPM Solver":
                if t_enc is not None:
                    raise ValueError(
                        "DPM Solver supports txt2img only (the reference "
                        "exposes it for full sampling runs only)")
                dsched = LDMX.make_dpm_solver_schedule(acp, steps)

                def build():
                    def run(params, x, c, uc, key, extra, cn_params, hint_arr):
                        eps = self._eps_model(params, extra, cn_params,
                                              hint_arr, control_weight,
                                              tome_ratio=tr)
                        eps_cfg = cfg_denoiser(eps, c, uc, scale)
                        return LDMX.sample_dpm_solver(eps_cfg, x, dsched,
                                                      progress_cb=progress)
                    return run
            elif name == "LCM":
                # LCM-LoRA sampling (samplers/lcm.py): consistency
                # boundary scalings on the k-space denoiser; img2img
                # maps t_enc to diffusers' strength-truncated origin
                # grid (strength = t_enc/steps, t_enc steps run)
                n_lcm = steps if t_enc is None else t_enc
                strength = 1.0 if t_enc is None else t_enc / steps
                lsched = LCM.make_lcm_schedule(acp, n_lcm,
                                               strength=strength)

                def build():
                    def run(params, x, c, uc, key, extra, cn_params, hint_arr):
                        eps = self._eps_model(params, extra, cn_params,
                                              hint_arr, control_weight,
                                              tome_ratio=tr)
                        den = EpsDenoiser(eps, self.bundle.schedule)
                        den_cfg = cfg_denoiser(den, c, uc, scale)
                        if t_enc is not None:
                            # k-space stochastic encode to the truncated
                            # grid's top sigma (same as the k-sampler
                            # img2img path)
                            x0 = x.astype(jnp.float32) + noise_like(
                                key, x.shape) * float(lsched.sigmas[0])
                        else:
                            x0 = x
                        return LCM.sample_lcm(den_cfg, x0, lsched, key=key,
                                              progress_cb=progress)
                    return run
            elif name == "PLMS":
                sched = DDIM.make_ddim_schedule(acp, steps, eta=0.0)

                def build():
                    def run(params, x, c, uc, key, extra, cn_params, hint_arr):
                        eps = self._eps_model(params, extra, cn_params,
                                              hint_arr, control_weight,
                                              tome_ratio=tr)
                        eps_cfg = cfg_denoiser(eps, c, uc, scale)
                        if t_enc is not None:
                            noise = noise_like(key, x.shape)
                            xt = DDIM.stochastic_encode(x, sched, t_enc - 1,
                                                        noise)
                            return LDMX.sample_plms(eps_cfg, xt, sched,
                                                    t_start=t_enc,
                                                    progress_cb=progress)
                        return LDMX.sample_plms(eps_cfg, x, sched,
                                                progress_cb=progress)
                    return run
            else:  # DDIM
                sched = DDIM.make_ddim_schedule(acp, steps, eta=opts.ddim_eta)
                if use_chunked:
                    plan = DDIM.plan_ddim(sched, t_enc)
                    cn_params = (self.bundle.controlnet[1]
                                 if self.bundle.controlnet else None)

                    def make_eps_cfg(params, cc, ucc, extra, cnp, hint_arr):
                        eps = self._eps_model(params, extra, cnp, hint_arr,
                                              control_weight, tome_ratio=tr)
                        return cfg_denoiser(eps, cc, ucc, scale)

                    prologue = None
                    if t_enc is not None:
                        def prologue(xx, kk):
                            return DDIM.stochastic_encode(
                                xx, sched, t_enc - 1,
                                noise_like(kk, xx.shape))
                    x = init_latent if t_enc is not None else x_init
                    x, c, uc = self._shard_batch_args(x, c, uc)
                    return CH.run_chunked(
                        plan,
                        get_program=lambda role, build: self._runner(
                            bucket + (role,), build),
                        make_denoise=make_eps_cfg,
                        args=(self.bundle.unet_params, c, uc,
                              extra_channels, cn_params, hint),
                        x=x, key=key, prologue=prologue,
                        progress=progress,
                        segments=CH.default_segments())

                def build():
                    def run(params, x, c, uc, key, extra, cn_params, hint_arr):
                        eps = self._eps_model(params, extra, cn_params,
                                              hint_arr, control_weight,
                                              tome_ratio=tr)
                        eps_cfg = cfg_denoiser(eps, c, uc, scale)
                        if t_enc is not None:
                            noise = noise_like(key, x.shape)
                            xt = DDIM.stochastic_encode(x, sched, t_enc - 1,
                                                        noise)
                            return DDIM.decode(eps_cfg, xt, sched, t_enc,
                                               key=key, progress_cb=progress)
                        return DDIM.sample(eps_cfg, x, sched, key=key,
                                           progress_cb=progress)
                    return run

            fn = self._runner(bucket, build)
            x = init_latent if t_enc is not None else x_init
            cn_params = self.bundle.controlnet[1] if self.bundle.controlnet else None
            x, c, uc = self._shard_batch_args(x, c, uc)
            return fn(self.bundle.unet_params, x, c, uc, key, extra_channels,
                      cn_params, hint)

        if name not in SAMPLERS:
            raise ValueError(f"Unsupported sampler: {name}")
        kind = K.SAMPLER_SCHEDULE[name]
        if kind == "model":
            sigmas = self.bundle.schedule.get_sigmas(steps)
        else:
            sigmas = S.get_sigmas_karras(
                steps, self.bundle.schedule.sigma_min, self.bundle.schedule.sigma_max
            )
        if t_enc is not None:
            sigmas = S.truncate_for_img2img(sigmas, t_enc)
        sampler_fn = SAMPLERS.get(name)
        kwargs = {}
        if name in ("Euler", "Heun", "DPM2"):
            kwargs = dict(
                s_churn=opts.sampler_s_churn, s_tmin=opts.sampler_s_tmin,
                s_tmax=opts.sampler_s_tmax, s_noise=opts.sampler_s_noise,
            )

        if use_chunked and name in K.CHUNKABLE_PLANS:
            plan = K.CHUNKABLE_PLANS[name](sigmas, **kwargs)
            cn_params = (self.bundle.controlnet[1]
                         if self.bundle.controlnet else None)

            def make_den_cfg(params, cc, ucc, extra, cnp, hint_arr):
                eps = self._eps_model(params, extra, cnp, hint_arr,
                                      control_weight, tome_ratio=tr)
                den = EpsDenoiser(eps, self.bundle.schedule)
                return cfg_denoiser(den, cc, ucc, scale, interval=cfgi)

            prologue = None
            if t_enc is not None:
                sig0 = float(sigmas[0])

                def prologue(xx, kk):
                    # k-space stochastic encode, same as the jitted path
                    return (xx.astype(jnp.float32)
                            + noise_like(kk, xx.shape) * sig0)
            x = init_latent if t_enc is not None else x_init
            x, c, uc = self._shard_batch_args(x, c, uc)
            return CH.run_chunked(
                plan,
                get_program=lambda role, build: self._runner(
                    bucket + (role,), build),
                make_denoise=make_den_cfg,
                args=(self.bundle.unet_params, c, uc, extra_channels,
                      cn_params, hint),
                x=x, key=key, prologue=prologue, progress=progress,
                segments=CH.default_segments())

        def build():
            def run(params, x, c, uc, key, extra, cn_params, hint_arr):
                eps = self._eps_model(params, extra, cn_params, hint_arr,
                                      control_weight, tome_ratio=tr)
                denoise = EpsDenoiser(eps, self.bundle.schedule)
                # under DeepCache the guidance interval is handled by
                # the windowed carry denoiser (host-static step flags),
                # not the per-call lax.cond wrapper
                den_cfg = cfg_denoiser(denoise, c, uc, scale,
                                       interval=None if use_dc else cfgi)
                if t_enc is not None:
                    x0 = x.astype(jnp.float32) + noise_like(
                        key, x.shape
                    ) * float(sigmas[0])
                else:
                    x0 = x
                if use_dc:
                    den_cap = lambda xx, ss: den_cfg(
                        xx, ss, mode="capture", cache_levels=dcb)
                    den_sh = lambda xx, ss, deep: den_cfg(
                        xx, ss, mode="shallow", cache_levels=dcb, deep=deep)
                    _, deep_sd = jax.eval_shape(
                        den_cap, x0, jnp.asarray(1.0, jnp.float32))
                    cache0 = jnp.zeros(deep_sd.shape, deep_sd.dtype)
                    if cfgi is not None:
                        den_c = cfg_denoiser(denoise, c, None, scale)
                        c_cap = lambda xx, ss: den_c(
                            xx, ss, mode="capture", cache_levels=dcb)
                        c_sh = lambda xx, ss, deep: den_c(
                            xx, ss, mode="shallow", cache_levels=dcb,
                            deep=deep)
                        carry_den = DC.make_dc_denoise_windowed(
                            den_cap, den_sh, c_cap, c_sh, dc,
                            DC.window_flags(sigmas, cfgi), x0.shape[0])
                    else:
                        carry_den = DC.make_dc_denoise(den_cap, den_sh, dc)
                    return DC.DC_SAMPLERS[name](
                        carry_den, cache0, x0, sigmas, key=key,
                        progress_cb=progress, **kwargs)
                if use_ada:
                    carry_den = AC.make_ada_denoise(
                        den_cfg, ada, len(sigmas) - 1, kind="den",
                        sigma_data=denoise.sigma_data,
                        rescale=ada_resc)
                    return DC.DC_SAMPLERS[name](
                        carry_den, AC.ada_cache0(x0), x0, sigmas, key=key,
                        progress_cb=progress, **kwargs)
                return sampler_fn(den_cfg, x0, sigmas, key=key,
                                  progress_cb=progress, **kwargs)
            return run

        fn = self._runner(bucket, build)
        x = init_latent if t_enc is not None else x_init
        cn_params = self.bundle.controlnet[1] if self.bundle.controlnet else None
        x, c, uc = self._shard_batch_args(x, c, uc)
        return fn(self.bundle.unet_params, x, c, uc, key, extra_channels,
                  cn_params, hint)

    # ---------------- high-level modes ----------------

    def _sigma0(self, opts) -> float:
        """Initial-noise scale for the selected sampler: k-diffusion
        convention x = N(0,1)*sigma_max; t-driven DDPM-space samplers
        start from unit noise; LCM starts at its own grid's top sigma."""
        name = opts.sampler
        if name == "LCM":
            acp = 1.0 / (1.0 + self.bundle.schedule.sigmas**2)
            return float(LCM.make_lcm_schedule(
                acp, opts.sampling_steps).sigmas[0])
        if name in T_DRIVEN_SAMPLERS:
            return 1.0
        kind = K.SAMPLER_SCHEDULE.get(name, "model")
        return float(self.bundle.schedule.get_sigmas(opts.sampling_steps)[0]
                     if kind == "model" else self.bundle.schedule.sigma_max)

    def txt2img_latents(self, opts, c, uc, key, status_cb=_noop_status,
                        hint=None, control_weight=1.0):
        h, w = opts.H // opts.f, opts.W // opts.f
        b = c.shape[0]
        x = noise_like(key, (b, h, w, self.bundle.latent_channels)) * \
            self._sigma0(opts)
        lat = self._sample(opts, x, c, uc, key, opts.sampling_steps,
                           hint=hint, control_weight=control_weight,
                           status_cb=status_cb)
        if opts.use_hires_fix and opts.hires_fix_scale_factor > 1.0:
            lat = self._hires_fix(opts, lat, c, uc, key, status_cb)
        return lat

    def _hires_fix(self, opts, lat, c, uc, key, status_cb):
        """Latent or pixel upscale + img2img (reference
        image_generator.py:889-999 'Latent'/'Lanczos' paths)."""
        f = opts.hires_fix_scale_factor
        b, h, w, ch = lat.shape
        nh, nw = int(h * f) // 8 * 8 or 8, int(w * f) // 8 * 8 or 8
        # keep latent dims multiple of 8 so decoded image is multiple of 64
        nh, nw = max(nh, 8), max(nw, 8)
        if opts.hires_fix_upscaler.lower() == "lanczos":
            img = decode_from_latent(self.bundle.vae, self.bundle.vae_params, lat)
            img = jax.image.resize(img, (b, nh * 8, nw * 8, 3), "lanczos3")
            up = encode_to_latent(self.bundle.vae, self.bundle.vae_params,
                                  img.astype(jnp.bfloat16))
        else:  # "Latent"
            up = jax.image.resize(lat, (b, nh, nw, ch), "nearest")
        t_enc = max(1, int(opts.strength * opts.sampling_steps))
        key2 = jax.random.fold_in(key, 1)
        return self._sample(opts, None, c, uc, key2, opts.sampling_steps,
                            t_enc=t_enc, init_latent=up, status_cb=status_cb)

    def img2img_latents(self, opts, init_image: np.ndarray, c, uc, key,
                        status_cb=_noop_status):
        """init_image: (H,W,3) float [-1,1]."""
        b = c.shape[0]
        img = jnp.asarray(init_image)[None].astype(jnp.bfloat16)
        lat = encode_to_latent(self.bundle.vae, self.bundle.vae_params, img,
                               key=jax.random.fold_in(key, 7), sample=True)
        lat = jnp.broadcast_to(lat, (b,) + lat.shape[1:]).astype(jnp.float32)
        t_enc = max(1, int(opts.strength * opts.sampling_steps))
        return self._sample(opts, None, c, uc, key, opts.sampling_steps,
                            t_enc=t_enc, init_latent=lat, status_cb=status_cb)

    def inpaint_latents(self, opts, init_image: np.ndarray, mask: np.ndarray,
                        c, uc, key, status_cb=_noop_status):
        """9-channel inpaint: UNet sees [x, mask_lat, masked_img_latent].

        init_image (H,W,3) [-1,1]; mask (H,W) float — 1 where to inpaint
        (reference make_batch_sd binarizes at 0.5)."""
        assert self.bundle.inpaint, "bundle was not built with the inpaint UNet"
        b = c.shape[0]
        mask_b = (np.asarray(mask) >= 0.5).astype(np.float32)
        masked = np.asarray(init_image) * (1.0 - mask_b[..., None])
        img = jnp.asarray(masked)[None].astype(jnp.bfloat16)
        masked_lat = encode_to_latent(self.bundle.vae, self.bundle.vae_params, img)
        h8, w8 = masked_lat.shape[1:3]
        mask_lat = jax.image.resize(
            jnp.asarray(mask_b)[None, :, :, None], (1, h8, w8, 1), "nearest"
        )
        extra = jnp.concatenate(
            [mask_lat.astype(jnp.float32), masked_lat.astype(jnp.float32)], axis=-1
        )
        extra = jnp.broadcast_to(extra, (b,) + extra.shape[1:])
        x = noise_like(key, (b, h8, w8, self.bundle.latent_channels)) * \
            self._sigma0(opts)
        lat = self._sample(opts, x, c, uc, key, opts.sampling_steps,
                           extra_channels=extra, status_cb=status_cb)
        return lat, mask_b

    # ---------------- full generate() ----------------

    def generate(
        self,
        opts: GenerationOptions,
        status_cb: StatusCb = _noop_status,
        result_cb: Optional[Callable[[np.ndarray, Dict[str, Any]], None]] = None,
        init_image: Optional[np.ndarray] = None,
        mask_image: Optional[np.ndarray] = None,
        control_image: Optional[np.ndarray] = None,
        control_weight: float = 1.0,
        face_embedding: Optional[np.ndarray] = None,
    ) -> List[Tuple[np.ndarray, Dict[str, Any]]]:
        """Run the full job: n_iter batches x n_samples images.

        Returns [(image_01 (H,W,3) float, generation_parameters dict)].
        The reference behaviors preserved: per-image seed = seed + index,
        wildcards re-resolved per batch, safety + watermark + metadata.
        """
        base_seed = resolve_seed(opts.seed)
        results = []
        img_index = 0
        for it in range(opts.n_iter):
            job = dataclasses.replace(opts)
            if opts.wildcards_path and os.path.isdir(opts.wildcards_path):
                job.prompt = resolve_wildcards(
                    opts.prompt, opts.wildcards_path, rng=base_seed + img_index
                )
                job.negative_prompt = resolve_wildcards(
                    opts.negative_prompt, opts.wildcards_path,
                    rng=base_seed + img_index + 1,
                )
            b = opts.n_samples
            status_cb(f"batch {it + 1}/{opts.n_iter}: encoding prompt")
            c, uc = self._conditioning(job, b, face_embedding)
            key = key_for_image(base_seed, img_index)

            hint = None
            if control_image is not None and self.bundle.controlnet is not None:
                # control image in [0,1], NHWC (reference cldm hint range)
                hint = jnp.asarray(control_image, jnp.float32)
                if hint.ndim == 3:
                    hint = hint[None]

            t0 = time.perf_counter()
            if job.mode == MODE_TEXT_TO_IMAGE:
                lat = self.txt2img_latents(job, c, uc, key, status_cb,
                                           hint=hint,
                                           control_weight=control_weight)
                mask_b = None
            elif job.mode == MODE_IMAGE_TO_IMAGE:
                assert init_image is not None
                lat = self.img2img_latents(job, init_image, c, uc, key, status_cb)
                mask_b = None
            elif job.mode == MODE_INPAINTING:
                assert init_image is not None and mask_image is not None
                lat, mask_b = self.inpaint_latents(
                    job, init_image, mask_image, c, uc, key, status_cb
                )
            else:
                raise ValueError(f"unknown mode {job.mode}")

            status_cb("decoding")
            imgs = decode_from_latent(
                self.bundle.vae, self.bundle.vae_params, lat.astype(jnp.bfloat16)
            )
            imgs = device_to_img01(imgs)
            if mask_b is not None and init_image is not None:
                # composite inpainted region over the original
                init01 = (np.asarray(init_image, np.float32) + 1.0) / 2.0
                m = mask_b[None, :, :, None]
                imgs = imgs * m + init01[None] * (1.0 - m)
            logger.info("sampling+decode took %.2fs", time.perf_counter() - t0)

            if job.safety_check:
                imgs, flags = self.safety.check(imgs)

            if self.face_fixer is not None and job.auto_face_fix:
                imgs = np.stack([self.face_fixer(im, job) for im in imgs])

            for i in range(b):
                img = imgs[i]
                if job.watermark:
                    img = embed_watermark(img)
                meta = dataclasses.asdict(job)
                meta["seed"] = base_seed + img_index
                meta.pop("extra", None)
                results.append((img, meta))
                if result_cb is not None:
                    result_cb(img, meta)
                img_index += 1
        return results
