"""SDXL generation pipeline: base txt2img/img2img + refiner.

Behavior contract (reference `modules/sdxl/sdxl_pipeline/
sdxl_image_generator.py` + `sdxl_image_generator_utils.py`, SURVEY.md
§3.3):
- GeneralConditioner: crossattn = concat(CLIP-L hidden_states[11] chunks,
  OpenCLIP-bigG penultimate chunks) -> (B, 77n, 2048); vector = concat(
  bigG pooled (mean over 77-token chunks, EOS-position, ln_final +
  text_projection), 256-d Fourier embeddings of original_size (H,W),
  crop_coords (top,left), target_size (H,W)) -> (B, 2816); the refiner
  conditioner swaps target_size for aesthetic_score -> (B, 2560);
- EDM sampler menu (EulerEDM/HeunEDM/EulerAncestral/DPMPP2SAncestral/
  DPMPP2M/LinearMultistep), guiders (VanillaCFG/Identity/Linear/Triangle),
  discretizations (LegacyDDPM/EDM), s_churn/s_tmin/s_tmax/s_noise/eta/
  order options;
- refiner: second DiffusionEngine applied img2img-style on the base
  latents with `sdxl_refiner_strength` leftover noise
  (`apply_refiner` sdxl_image_generator.py:307, do_img2img);
- sgm input scaling x0 = N(0,1)*sqrt(1+sigma0^2).

Same jit discipline as SD1.5: one cached scanned program per bucket with
params passed as arguments.
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
from cremage_tpu.io.ti import load_embedding
from cremage_tpu.models.clip import CLIPTextModel
from cremage_tpu.models.layers import timestep_embedding
from cremage_tpu.models.open_clip import OpenCLIPTextModel
from cremage_tpu.models.unet import UNetModel
from cremage_tpu.models.vae import AutoencoderKL, decode_from_latent, encode_to_latent
from cremage_tpu.prompt.chunking import generate_weighted_chunks, make_ti_fetch
from cremage_tpu.prompt.parser import compute_prompt_score
from cremage_tpu.prompt.tokenizer import CLIPTokenizer
from cremage_tpu.samplers import adacache as AC
from cremage_tpu.samplers import chunked as CH
from cremage_tpu.samplers import deepcache as DC
from cremage_tpu.samplers import edm as EDM
from cremage_tpu.samplers import kdiffusion as K
from cremage_tpu.samplers import lcm as LCM
from cremage_tpu.samplers import schedules as S
from cremage_tpu.samplers.denoiser import cfg_interval_of
from cremage_tpu.core.registry import GUIDERS
from cremage_tpu.services.safety import ImageSafetyChecker, default_image_safety
from cremage_tpu.services.watermark import embed_watermark

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# conditioner
# ---------------------------------------------------------------------------

def fourier_vector_embedding(values: np.ndarray, outdim: int = 256) -> np.ndarray:
    """ConcatTimestepEmbedderND semantics: each scalar -> timestep_embedding
    (outdim), flattened (sgm encoders ConcatTimestepEmbedderND)."""
    vals = np.asarray(values, np.float32).reshape(-1)
    emb = timestep_embedding(jnp.asarray(vals), outdim)
    return np.asarray(emb, np.float32).reshape(-1)


class SDXLConditioner:
    """Dual text tower + size/crop vector conditioning."""

    def __init__(
        self,
        clip_l: Optional[Tuple[CLIPTextModel, Any]],
        open_clip: Tuple[OpenCLIPTextModel, Any],
        tokenizer: CLIPTokenizer,
        embedding_dir: Optional[str] = None,
        refiner_mode: bool = False,
    ):
        self.clip_l = clip_l
        self.open_clip = open_clip
        self.tokenizer = tokenizer
        self.embedding_dir = embedding_dir
        self.refiner_mode = refiner_mode
        # memoized tower encodes per prompt (bounded FIFO): serving
        # repeats prompts across seeds, and each tower pass costs real
        # host time on the tunneled backend; dies with the conditioner
        # so checkpoint/LoRA reloads can never serve stale states
        self._l_cache: Dict[str, np.ndarray] = {}
        self._g_cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}

    # --- per-tower embedding helpers ---

    def _embed_l(self, ids):
        # cached jitted tower calls throughout this conditioner — an
        # eager forward is seconds of per-op dispatch on the tunneled
        # TPU backend (core/jitcache.py)
        from cremage_tpu.core.jitcache import jit_apply

        model, params = self.clip_l
        return np.asarray(jit_apply(model, CLIPTextModel.embed_tokens)(
            params, jnp.asarray(np.asarray(ids, np.int32))), np.float32)

    def _embed_g(self, ids):
        from cremage_tpu.core.jitcache import jit_apply

        model, params = self.open_clip
        return np.asarray(jit_apply(model, OpenCLIPTextModel.embed_tokens)(
            params, jnp.asarray(np.asarray(ids, np.int32))), np.float32)

    def _chunks(self, prompt: str, tower: str):
        pairs = compute_prompt_score(prompt)
        ti = make_ti_fetch(self.embedding_dir, load_embedding,
                           tower_key="clip_l" if tower == "l" else "clip_g")
        embed = self._embed_l if tower == "l" else self._embed_g
        return generate_weighted_chunks(self.tokenizer, embed, pairs, ti_fetch=ti)

    def _encode_l(self, prompt: str) -> np.ndarray:
        """CLIP-L penultimate hidden state per chunk (reference config
        layer='hidden', layer_idx=11 == num_layers-1 for ViT-L)."""
        from cremage_tpu.core.jitcache import jit_apply

        cacheable = "<" not in prompt   # TI tags resolve at encode time
        hit = self._l_cache.get(prompt) if cacheable else None
        if hit is not None:
            return hit
        model, params = self.clip_l
        chunks, _ = self._chunks(prompt, "l")
        outs = []
        idx = model.cfg.num_layers - 1
        fwd = jit_apply(model)
        for ch in chunks:
            _, hidden, _ = fwd(params, inputs_embeds=jnp.asarray(ch[None]))
            outs.append(np.asarray(hidden[idx][0], np.float32))
        out = np.concatenate(outs, axis=0)
        if not cacheable:
            return out
        if len(self._l_cache) >= 32:
            self._l_cache.pop(next(iter(self._l_cache)))
        self._l_cache[prompt] = out
        return out

    def _encode_g(self, prompt: str) -> Tuple[np.ndarray, np.ndarray]:
        """bigG penultimate chunks + mean pooled (ln_final[eos] @ proj)."""
        from cremage_tpu.core.jitcache import jit_apply

        cacheable = "<" not in prompt   # TI tags resolve at encode time
        hit = self._g_cache.get(prompt) if cacheable else None
        if hit is not None:
            return hit
        model, params = self.open_clip
        chunks, eos_list = self._chunks(prompt, "g")
        outs, pooled = [], []
        fwd = jit_apply(model)
        proj = jit_apply(model, OpenCLIPTextModel.project_pooled)
        for ch, eos in zip(chunks, eos_list):
            hidden, final = fwd(params, inputs_embeds=jnp.asarray(ch[None]))
            outs.append(np.asarray(hidden[model.cfg.num_layers - 1][0], np.float32))
            p = proj(params, final, jnp.asarray([eos]))
            pooled.append(np.asarray(p[0], np.float32))
        out = (np.concatenate(outs, axis=0), np.stack(pooled).mean(axis=0))
        if not cacheable:
            return out
        if len(self._g_cache) >= 32:
            self._g_cache.pop(next(iter(self._g_cache)))
        self._g_cache[prompt] = out
        return out

    def encode_cond(
        self,
        prompt: str,
        *,
        orig_size: Tuple[int, int],
        crop_coords: Tuple[int, int] = (0, 0),
        target_size: Optional[Tuple[int, int]] = None,
        aesthetic_score: float = 6.0,
        zero_text: bool = False,
    ) -> Dict[str, np.ndarray]:
        g_cross, pooled = self._encode_g(prompt)
        if self.refiner_mode:
            cross = g_cross
        else:
            l_cross = self._encode_l(prompt)
            # align chunk counts (long prompts tokenize differently per
            # tower); pad the shorter with its own empty-prompt chunk
            while l_cross.shape[0] < g_cross.shape[0]:
                l_cross = np.concatenate([l_cross, self._encode_l("")], axis=0)
            while g_cross.shape[0] < l_cross.shape[0]:
                g_pad, _ = self._encode_g("")
                g_cross = np.concatenate([g_cross, g_pad], axis=0)
            cross = np.concatenate([l_cross, g_cross], axis=-1)
        if zero_text:
            cross = np.zeros_like(cross)
            pooled = np.zeros_like(pooled)

        vec_parts = [pooled,
                     fourier_vector_embedding(orig_size),
                     fourier_vector_embedding(crop_coords)]
        if self.refiner_mode:
            vec_parts.append(fourier_vector_embedding([aesthetic_score]))
        else:
            vec_parts.append(fourier_vector_embedding(target_size or orig_size))
        vector = np.concatenate(vec_parts, axis=0)
        return {"crossattn": cross, "vector": vector}

    def encode_pair(
        self, opts: GenerationOptions, batch: int,
        aesthetic_pos: float = 6.0, aesthetic_neg: float = 2.5,
        force_uc_zero: bool = False,
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        size = (opts.H, opts.W)
        c = self.encode_cond(opts.prompt, orig_size=size,
                             aesthetic_score=aesthetic_pos)
        uc = self.encode_cond(opts.negative_prompt, orig_size=size,
                              aesthetic_score=aesthetic_neg,
                              zero_text=force_uc_zero)
        # filler-pad crossattn to equal multiple-of-77 length
        # (reference sdxl_image_generator_utils.py:621-650)
        while c["crossattn"].shape[0] < uc["crossattn"].shape[0]:
            c["crossattn"] = np.concatenate(
                [c["crossattn"],
                 self.encode_cond("", orig_size=size)["crossattn"]], axis=0)
        while uc["crossattn"].shape[0] < c["crossattn"].shape[0]:
            uc["crossattn"] = np.concatenate(
                [uc["crossattn"],
                 self.encode_cond("", orig_size=size)["crossattn"]], axis=0)

        def tile(d):
            return {
                "crossattn": jnp.asarray(
                    np.broadcast_to(d["crossattn"][None],
                                    (batch,) + d["crossattn"].shape)),
                "vector": jnp.asarray(
                    np.broadcast_to(d["vector"][None],
                                    (batch,) + d["vector"].shape)),
            }

        return tile(c), tile(uc)


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SDXLBundle:
    unet: UNetModel
    unet_params: Any
    conditioner: SDXLConditioner
    vae: AutoencoderKL
    vae_params: Any
    refiner_unet: Optional[UNetModel] = None
    refiner_params: Any = None
    refiner_conditioner: Optional[SDXLConditioner] = None
    inpaint: bool = False          # 9-channel dedicated inpaint UNet


def _noop_status(msg: str) -> None:
    pass


class SDXLPipeline:
    def __init__(self, bundle: SDXLBundle,
                 safety: Optional[ImageSafetyChecker] = None,
                 face_fixer: Optional[Callable] = None):
        self.bundle = bundle
        self.safety = safety or default_image_safety()
        self.face_fixer = face_fixer
        self._cache: Dict[Tuple, Callable] = {}
        self._current_status: Callable = _noop_status
        self.mesh = None
        self.pp_devices = None
        self.pp_n_stages: Optional[int] = None
        self.pp_microbatch: Optional[int] = None
        self._pp_cache: Dict[Tuple, Any] = {}

    def use_mesh(self, mesh, tensor_parallel: bool = False):
        """Adopt a ('data','model') mesh: params replicated (or
        TP-sharded over 'model' with the conv/attention rules of
        parallel/sharding.py), activations batch-sharded over 'data' at
        each jitted-program boundary — the deployment behind the
        north-star ≥2 img/s on v5e-8 (8 × the per-chip exact lane).
        XLA/GSPMD inserts the ICI collectives; sampler/UNet code is
        unchanged (same design as SD15Pipeline.use_mesh)."""
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
        if self.bundle.refiner_unet is not None:
            self.bundle.refiner_params = replicate_params(
                mesh, self.bundle.refiner_params)
        self.mesh = mesh
        self._cache.clear()
        return self

    def _shard_batch_args(self, x, c, uc):
        """data_sharding for the batch-carrying sampler inputs (latent +
        both conditioning dicts) when a DP/TP mesh is active; batch
        sizes that don't divide the data axis fall back to the default
        placement (replicated compute, still correct)."""
        if self.mesh is None:
            return x, c, uc
        from cremage_tpu.core.mesh import DATA_AXIS, data_sharding

        dsize = self.mesh.shape[DATA_AXIS]

        def sh(a):
            if (a is not None and hasattr(a, "ndim") and a.ndim >= 1
                    and a.shape[0] % dsize == 0 and a.shape[0] >= dsize):
                return jax.device_put(jnp.asarray(a),
                                      data_sharding(self.mesh, a.ndim))
            return a

        def shd(d):
            return None if d is None else {k: sh(v) for k, v in d.items()}

        return sh(x), shd(c), shd(uc)

    def use_mesh_pp(self, devices, n_stages: Optional[int] = None,
                    microbatch: Optional[int] = None):
        """Pipeline-parallel deployment (parallel/pipeline.py UNetPP):
        the flattened UNet chain partitioned into FLOP-balanced
        contiguous stages on committed devices — the base (and refiner,
        if used) 2.6B-param SDXL UNet spans chips without quantization.
        Sampling is host-stepped, so only the deterministic
        EulerEDMSampler + VanillaCFG combination is supported; excludes
        tome_ratio / deep_cache / LCM."""
        if self.mesh is not None:
            raise ValueError("choose one of use_mesh / use_mesh_pp")
        if hasattr(devices, "devices"):  # a Mesh
            devices = list(np.asarray(devices.devices).flat)
        self.pp_devices = list(devices)
        self.pp_n_stages = n_stages
        self.pp_microbatch = microbatch
        self._cache.clear()
        self._pp_cache.clear()
        return self

    def _sampler_program(
        self, unet: UNetModel, opts: GenerationOptions, shape, cond_shape,
        t_enc: Optional[int], num_frames: int = 1,
    ):
        steps = opts.sampling_steps
        disc = EDM.make_discretization(
            opts.discretization,
            sigma_min=opts.discretization_sigma_min,
            sigma_max=opts.discretization_sigma_max,
            rho=opts.discretization_rho,
        )
        sigmas = disc(steps)
        if t_enc is not None:
            sigmas = S.truncate_for_img2img(sigmas, t_enc)
        guider_kwargs = dict(
            scale=opts.scale,
            min_scale=opts.linear_prediction_guider_min_scale,
            max_scale=(opts.linear_prediction_guider_max_scale
                       if opts.guider == "LinearPredictionGuider"
                       else opts.triangle_prediction_guider_max_scale),
            num_frames=num_frames,
        )
        guider = GUIDERS.get(opts.guider)
        sampler_name = opts.sampler
        cfgi = cfg_interval_of(opts)
        if cfgi is not None:
            if opts.guider != "VanillaCFG":
                raise ValueError(
                    "cfg_interval supports the VanillaCFG guider only, "
                    f"got {opts.guider!r}")
            if sampler_name == "LCM":
                raise ValueError(
                    "cfg_interval is not supported with the LCM sampler "
                    "(consistency steps are guidance-distilled)")
            guider_kwargs["interval"] = cfgi

        unet_key = id(unet)
        tr = float(opts.tome_ratio)
        if not 0.0 <= tr < 0.75:
            raise ValueError(
                f"tome_ratio must be in [0, 0.75), got {tr} (a 2x2 dst "
                "grid leaves only 3N/4 mergeable src tokens)")
        if tr > 0.0:
            # ToMe has no params — a config-swapped module runs on the
            # same param tree (ops/tome.py); program cache keys on the
            # original module identity + ratio
            unet = UNetModel(dataclasses.replace(
                unet.cfg, tome_ratio=tr))

        dc = int(opts.deep_cache)
        dcb = int(opts.deep_cache_branch)
        use_dc = dc >= 2
        if use_dc and sampler_name not in DC.DC_SAMPLERS:
            raise ValueError(
                "deep_cache requires EulerEDMSampler, "
                "EulerAncestralSampler or DPMPP2MSampler, got "
                f"{sampler_name!r}")
        if use_dc and opts.guider != "VanillaCFG":
            raise ValueError(
                "deep_cache supports the VanillaCFG guider only, got "
                f"{opts.guider!r}")
        if use_dc and cfgi is not None:
            # composed via the windowed carry denoiser (host-static step
            # flags) rather than the guider's per-call lax.cond
            guider_kwargs.pop("interval", None)
        ada = float(getattr(opts, "ada_cache", 0.0))
        ada_resc = (AC.load_calibration("sdxl")
                    if ada > 0.0 else None)
        use_ada = ada > 0.0
        if use_ada:
            if use_dc:
                raise ValueError(
                    "ada_cache and deep_cache are both step caches — "
                    "enable at most one")
            if sampler_name not in DC.DC_SAMPLERS:
                raise ValueError(
                    "ada_cache requires EulerEDMSampler, "
                    "EulerAncestralSampler or DPMPP2MSampler, got "
                    f"{sampler_name!r}")
            if opts.guider != "VanillaCFG":
                raise ValueError(
                    "ada_cache supports the VanillaCFG guider only, got "
                    f"{opts.guider!r}")
            if self.pp_devices is not None:
                raise ValueError(
                    "ada_cache does not compose with use_mesh_pp (the "
                    "cache rides the jitted sampler scan carry)")

        # LCM (samplers/lcm.py): pairs with SDXL LCM-LoRA weights
        # merged through the normal loader; the grid/boundary math runs
        # on the model's 1000-step DDPM table, not the EDM menu
        lsched = None
        if sampler_name == "LCM":
            if opts.guider != "VanillaCFG":
                raise ValueError(
                    "the LCM sampler supports the VanillaCFG guider "
                    f"only, got {opts.guider!r}")
            # img2img maps t_enc to diffusers' strength-truncated origin
            # grid (strength = t_enc/steps, t_enc steps run) — same
            # contract as the SD1.5 pipeline's LCM
            n_lcm = steps if t_enc is None else t_enc
            lcm_strength = 1.0 if t_enc is None else t_enc / steps
            lsched = LCM.make_lcm_schedule(
                EDM.LegacyDDPMDiscretization().alphas_cumprod, n_lcm,
                strength=lcm_strength)
            if t_enc is not None:
                # the img2img caller does x0 = lat + noise*sigmas[0]
                # (k-space stochastic encode == diffusers add_noise at
                # the grid's top timestep) — hand it the LCM sigmas
                sigmas = lsched.sigmas

        def progress(i):
            total = (len(lsched.sigmas) if lsched is not None
                     else len(sigmas) - 1)
            self._current_status(f"Sampling {int(i) + 1} / {total}")

        if self.pp_devices is not None:
            if use_dc:
                raise ValueError(
                    "deep_cache does not compose with use_mesh_pp (the "
                    "cache boundary is stage-local)")
            if tr > 0:
                raise ValueError(
                    "tome_ratio does not compose with use_mesh_pp (the "
                    "merge plan is stage-local)")
            if sampler_name != "EulerEDMSampler":
                raise ValueError(
                    "use_mesh_pp sampling is host-stepped and supports "
                    f"EulerEDMSampler only, got {sampler_name!r}")
            if opts.guider != "VanillaCFG":
                raise ValueError(
                    "use_mesh_pp supports the VanillaCFG guider only, "
                    f"got {opts.guider!r}")
            if opts.sampler_s_churn:
                raise ValueError(
                    "use_mesh_pp runs the deterministic s_churn=0 Euler")
            if cfgi is not None:
                raise ValueError(
                    "cfg_interval does not compose with use_mesh_pp (the "
                    "microbatch stream is sized by the doubled CFG batch)")
            from cremage_tpu.parallel.pipeline import UNetPP

            if unet is self.bundle.unet:
                pp_params = self.bundle.unet_params
            elif unet is self.bundle.refiner_unet:
                pp_params = self.bundle.refiner_params
            else:
                raise ValueError("use_mesh_pp needs the bundle's UNet")
            geom = (int(shape[1]), int(shape[2]))
            ck = (unet_key, geom)
            pp = self._pp_cache.get(ck)
            if pp is None:
                pp = UNetPP(unet, pp_params, self.pp_devices,
                            h=geom[0], w=geom[1],
                            n_stages=self.pp_n_stages)
                self._pp_cache[ck] = pp
            mb = self.pp_microbatch
            sig = np.asarray(sigmas, np.float64)

            def run_pp(params, x, c, uc, key, extra=None):
                def network(xx, tt, cond):
                    if extra is not None:
                        ee = extra
                        if ee.shape[0] != xx.shape[0]:
                            ee = jnp.concatenate(
                                [ee] * (xx.shape[0] // ee.shape[0]))
                        xx = jnp.concatenate([xx, ee.astype(xx.dtype)],
                                             axis=-1)
                    return pp(xx, tt, cond["crossattn"], y=cond["vector"],
                              microbatch=mb)

                denoiser = EDM.DiscreteDenoiserSGM(
                    network,
                    EDM.LegacyDDPMDiscretization()(1000,
                                                   do_append_zero=False),
                )
                denoise = guider(denoiser, c, uc, **guider_kwargs)
                # mirror run_sgm_sampler's prepare_sampling_loop scaling
                # + the s_churn=0 k-diffusion Euler body, host-stepped
                xx = jnp.asarray(x, jnp.float32)
                if t_enc is None:
                    xx = xx * float(np.sqrt(1.0 + sig[0] ** 2))
                xx = jax.device_put(xx, pp.out_device)
                for i in range(len(sig) - 1):
                    den = denoise(xx, jnp.asarray(float(sig[i]),
                                                  jnp.float32))
                    d = (xx - den.astype(jnp.float32)) / float(sig[i])
                    xx = xx + d * float(sig[i + 1] - sig[i])
                    progress(i)
                return xx

            return run_pp, sigmas

        def run(params, x, c, uc, key, extra=None):
            def network(xx, tt, cond, **unet_kwargs):
                if extra is not None:
                    ee = extra
                    if ee.shape[0] != xx.shape[0]:   # CFG-doubled batch
                        ee = jnp.concatenate(
                            [ee] * (xx.shape[0] // ee.shape[0]))
                    xx = jnp.concatenate([xx, ee.astype(xx.dtype)], axis=-1)
                return unet.apply(params, xx, tt,
                                  cond["crossattn"], cond["vector"],
                                  **unet_kwargs)

            denoiser = EDM.DiscreteDenoiserSGM(
                network,
                EDM.LegacyDDPMDiscretization()(1000, do_append_zero=False),
            )
            denoise = guider(denoiser, c, uc, **guider_kwargs)
            if lsched is not None:
                x0 = x.astype(jnp.float32)
                if t_enc is None:
                    # diffusers' DDPM-space unit-noise init is exactly
                    # the sgm prepare_sampling_loop scaling in k-space
                    x0 = x0 * float(np.sqrt(1.0 + lsched.sigmas[0] ** 2))
                return LCM.sample_lcm(denoise, x0, lsched, key=key,
                                      progress_cb=progress)
            if use_dc:
                # mirror run_sgm_sampler's prepare_sampling_loop scaling
                sig = np.asarray(sigmas, np.float64)
                x0 = x.astype(jnp.float32)
                if t_enc is None:
                    x0 = x0 * float(np.sqrt(1.0 + sig[0] ** 2))
                den_cap = lambda xx, ss: denoise(
                    xx, ss, mode="capture", cache_levels=dcb)
                den_sh = lambda xx, ss, deep: denoise(
                    xx, ss, mode="shallow", cache_levels=dcb, deep=deep)
                _, deep_sd = jax.eval_shape(
                    den_cap, x0, jnp.asarray(1.0, jnp.float32))
                cache0 = jnp.zeros(deep_sd.shape, deep_sd.dtype)
                if cfgi is not None:
                    den_c = EDM.identity_guider(denoiser, c, uc)
                    c_cap = lambda xx, ss: den_c(
                        xx, ss, mode="capture", cache_levels=dcb)
                    c_sh = lambda xx, ss, deep: den_c(
                        xx, ss, mode="shallow", cache_levels=dcb,
                        deep=deep)
                    carry_den = DC.make_dc_denoise_windowed(
                        den_cap, den_sh, c_cap, c_sh, dc,
                        DC.window_flags(sig, cfgi), x0.shape[0])
                else:
                    carry_den = DC.make_dc_denoise(den_cap, den_sh, dc)
                if sampler_name == "EulerEDMSampler":
                    kw = dict(s_churn=opts.sampler_s_churn,
                              s_tmin=opts.sampler_s_tmin,
                              s_tmax=opts.sampler_s_tmax,
                              s_noise=opts.sampler_s_noise)
                elif sampler_name == "DPMPP2MSampler":
                    kw = {}           # deterministic multistep: no churn/eta
                else:
                    kw = dict(eta=opts.sampler_eta,
                              s_noise=opts.sampler_s_noise)
                return DC.DC_SAMPLERS[sampler_name](
                    carry_den, cache0, x0, sig, key=key,
                    progress_cb=progress, **kw)
            if use_ada:
                sig = np.asarray(sigmas, np.float64)
                x0 = x.astype(jnp.float32)
                if t_enc is None:
                    x0 = x0 * float(np.sqrt(1.0 + sig[0] ** 2))
                # DiscreteDenoiserSGM EpsScaling: c_in=1/sqrt(s^2+1),
                # i.e. sigma_data 1.0 — keep the indicator's c_in matched
                carry_den = AC.make_ada_denoise(
                    denoise, ada, len(sig) - 1, kind="den",
                    sigma_data=1.0, rescale=ada_resc)
                if sampler_name == "EulerEDMSampler":
                    kw = dict(s_churn=opts.sampler_s_churn,
                              s_tmin=opts.sampler_s_tmin,
                              s_tmax=opts.sampler_s_tmax,
                              s_noise=opts.sampler_s_noise)
                elif sampler_name == "DPMPP2MSampler":
                    kw = {}           # deterministic multistep: no churn/eta
                else:
                    kw = dict(eta=opts.sampler_eta,
                              s_noise=opts.sampler_s_noise)
                return DC.DC_SAMPLERS[sampler_name](
                    carry_den, AC.ada_cache0(x0), x0, sig, key=key,
                    progress_cb=progress, **kw)
            return EDM.run_sgm_sampler(
                sampler_name, denoise, x, sigmas, key=key,
                s_churn=opts.sampler_s_churn, s_tmin=opts.sampler_s_tmin,
                s_tmax=opts.sampler_s_tmax, s_noise=opts.sampler_s_noise,
                eta=opts.sampler_eta, order=opts.sampler_order,
                scale_input=(t_enc is None), progress_cb=progress,
            )

        bucket = ("sdxl", unet_key, sampler_name, steps, t_enc, tuple(shape),
                  tuple(cond_shape), float(opts.scale), opts.guider,
                  opts.discretization, float(opts.sampler_eta),
                  float(opts.sampler_s_churn), num_frames,
                  self.bundle.inpaint, dc, dcb, tr, cfgi, ada, ada_resc)

        # Segmented execution for per-step-ish progress where in-scan
        # io_callback cannot compile (samplers/chunked.py); the sgm EDM
        # menu reuses the kdiffusion scan plans
        sgm_to_plan = {"EulerEDMSampler": "Euler",
                       "EulerAncestralSampler": "Euler A",
                       "DPMPP2MSampler": "DPM++ 2M"}
        if (CH.chunked_progress_active(self._current_status, _noop_status)
                and not use_dc and not use_ada and lsched is None
                and self.pp_devices is None
                and sampler_name in sgm_to_plan):
            if sampler_name == "EulerEDMSampler":
                kw = dict(s_churn=opts.sampler_s_churn,
                          s_tmin=opts.sampler_s_tmin,
                          s_tmax=opts.sampler_s_tmax,
                          s_noise=opts.sampler_s_noise)
            elif sampler_name == "DPMPP2MSampler":
                kw = {}
            else:
                kw = dict(eta=opts.sampler_eta,
                          s_noise=opts.sampler_s_noise)
            plan = K.CHUNKABLE_PLANS[sgm_to_plan[sampler_name]](sigmas,
                                                                **kw)
            sig0 = float(np.asarray(sigmas, np.float64)[0])

            def make_denoise(params, cc, ucc, extra):
                def network(xx, tt, cond, **unet_kwargs):
                    if extra is not None:
                        ee = extra
                        if ee.shape[0] != xx.shape[0]:
                            ee = jnp.concatenate(
                                [ee] * (xx.shape[0] // ee.shape[0]))
                        xx = jnp.concatenate(
                            [xx, ee.astype(xx.dtype)], axis=-1)
                    return unet.apply(params, xx, tt,
                                      cond["crossattn"], cond["vector"],
                                      **unet_kwargs)

                denoiser = EDM.DiscreteDenoiserSGM(
                    network,
                    EDM.LegacyDDPMDiscretization()(1000,
                                                   do_append_zero=False),
                )
                return guider(denoiser, cc, ucc, **guider_kwargs)

            prologue = None
            if t_enc is None:
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

            def chunked_fn(params, x, c, uc, key, extra=None):
                return CH.run_chunked(
                    plan, get_program=get_program,
                    make_denoise=make_denoise,
                    args=(params, c, uc, extra),
                    x=x, key=key, prologue=prologue,
                    progress=progress,
                    segments=CH.default_segments())

            return chunked_fn, sigmas

        fn = self._cache.get(bucket)
        if fn is None:
            fn = jax.jit(run)
            self._cache[bucket] = fn
        return fn, sigmas

    def txt2img_latents(self, opts, c, uc, key, status_cb=_noop_status):
        self._current_status = status_cb
        b = c["crossattn"].shape[0]
        h, w = opts.H // 8, opts.W // 8
        x = noise_like(key, (b, h, w, 4))
        fn, _ = self._sampler_program(
            self.bundle.unet, opts, x.shape, c["crossattn"].shape, None
        )
        x, c, uc = self._shard_batch_args(x, c, uc)
        return fn(self.bundle.unet_params, x, c, uc, key)

    def inpaint_latents(self, opts, init_image, mask, c, uc, key,
                        status_cb=_noop_status):
        """Dedicated 9-channel SDXL inpaint (diffusers
        stable-diffusion-xl-1.0-inpainting-0.1 layout): the UNet sees
        [x, mask_lat, masked_image_latent] — same concat contract as the
        SD1.5 inpaint UNet (`modules/sd/inpaint.py:45-120`); the
        reference reaches it through AutoPipelineForInpainting
        (`modules/sdxl/sdxl_pipeline/sdxl_inpaint.py:71`)."""
        assert self.bundle.inpaint, "bundle was not built with inpaint UNet"
        self._current_status = status_cb
        b = c["crossattn"].shape[0]
        mask_b = (np.asarray(mask) >= 0.5).astype(np.float32)
        masked = np.asarray(init_image) * (1.0 - mask_b[..., None])
        img = jnp.asarray(masked)[None].astype(jnp.bfloat16)
        masked_lat = encode_to_latent(self.bundle.vae,
                                      self.bundle.vae_params, img)
        h8, w8 = masked_lat.shape[1:3]
        mask_lat = jax.image.resize(
            jnp.asarray(mask_b)[None, :, :, None], (1, h8, w8, 1), "nearest")
        extra = jnp.concatenate(
            [mask_lat.astype(jnp.float32), masked_lat.astype(jnp.float32)],
            axis=-1)
        extra = jnp.broadcast_to(extra, (b,) + extra.shape[1:])
        x = noise_like(key, (b, h8, w8, 4))
        fn, _ = self._sampler_program(
            self.bundle.unet, opts, x.shape, c["crossattn"].shape, None)
        x, c, uc = self._shard_batch_args(x, c, uc)
        return fn(self.bundle.unet_params, x, c, uc, key, extra), mask_b

    def refine_latents(self, opts, lat, key, status_cb=_noop_status):
        """Refiner pass (apply_refiner): img2img on base latents with
        refiner_strength leftover noise."""
        self._current_status = status_cb
        rcond = self.bundle.refiner_conditioner
        assert rcond is not None and self.bundle.refiner_unet is not None
        b = lat.shape[0]
        ropts = dataclasses.replace(opts)
        c, uc = rcond.encode_pair(ropts, b)
        t_enc = max(1, int(opts.refiner_strength * opts.sampling_steps))
        fn, sigmas = self._sampler_program(
            self.bundle.refiner_unet, ropts, lat.shape, c["crossattn"].shape,
            t_enc,
        )
        noisy = lat.astype(jnp.float32) + noise_like(key, lat.shape) * float(
            sigmas[0]
        )
        noisy, c, uc = self._shard_batch_args(noisy, c, uc)
        return fn(self.bundle.refiner_params, noisy, c, uc, key)

    def generate(
        self,
        opts: GenerationOptions,
        status_cb=_noop_status,
        result_cb=None,
        init_image: Optional[np.ndarray] = None,
        mask_image: Optional[np.ndarray] = None,
    ) -> List[Tuple[np.ndarray, Dict[str, Any]]]:
        """mask_image (H,W) with 1 = repaint. Two inpaint paths, matching
        the reference's AutoPipelineForInpainting behavior
        (`modules/sdxl/sdxl_pipeline/sdxl_inpaint.py:71`): a dedicated
        9-channel inpaint UNet (bundle.inpaint — load_sdxl_bundle
        inpainting=True) sees [x, mask, masked-latent]; otherwise the
        latent-masking technique runs on the base model, and every result
        is composited back over the original outside the mask."""
        base_seed = resolve_seed(opts.seed)
        results = []
        img_index = 0
        for it in range(opts.n_iter):
            b = opts.n_samples
            status_cb(f"batch {it + 1}/{opts.n_iter}: encoding prompt")
            c, uc = self.bundle.conditioner.encode_pair(opts, b)
            key = key_for_image(base_seed, img_index)

            if (init_image is not None and mask_image is not None
                    and self.bundle.inpaint):
                lat, _ = self.inpaint_latents(opts, init_image, mask_image,
                                              c, uc, key, status_cb)
            elif init_image is not None:
                img = jnp.asarray(init_image)[None].astype(jnp.bfloat16)
                lat0 = encode_to_latent(self.bundle.vae, self.bundle.vae_params,
                                        img)
                lat0 = jnp.broadcast_to(lat0, (b,) + lat0.shape[1:])
                t_enc = max(1, int(opts.strength * opts.sampling_steps))
                fn, sigmas = self._sampler_program(
                    self.bundle.unet, opts, lat0.shape, c["crossattn"].shape,
                    t_enc,
                )
                self._current_status = status_cb
                noisy = lat0.astype(jnp.float32) + noise_like(
                    key, lat0.shape) * float(sigmas[0])
                noisy, c, uc = self._shard_batch_args(noisy, c, uc)
                lat = fn(self.bundle.unet_params, noisy, c, uc, key)
            else:
                lat = self.txt2img_latents(opts, c, uc, key, status_cb)

            if opts.refiner_strength > 0 and self.bundle.refiner_unet is not None:
                status_cb("refining")
                lat = self.refine_latents(opts, lat,
                                          jax.random.fold_in(key, 99), status_cb)

            status_cb("decoding")
            imgs = decode_from_latent(
                self.bundle.vae, self.bundle.vae_params, lat.astype(jnp.bfloat16)
            )
            imgs = device_to_img01(imgs)

            if mask_image is not None and init_image is not None:
                m = (np.asarray(mask_image) >= 0.5).astype(np.float32)[..., None]
                init01 = (np.asarray(init_image, np.float32) + 1) / 2
                imgs = imgs * m[None] + init01[None] * (1 - m[None])

            if opts.safety_check:
                imgs, _ = self.safety.check(imgs)
            if self.face_fixer is not None and opts.auto_face_fix:
                imgs = np.stack([self.face_fixer(im, opts) for im in imgs])

            for i in range(b):
                img = imgs[i]
                if opts.watermark:
                    img = embed_watermark(img)  # payload "Cremage"
                meta = dataclasses.asdict(opts)
                meta["seed"] = base_seed + img_index
                meta.pop("extra", None)
                results.append((img, meta))
                if result_cb is not None:
                    result_cb(img, meta)
                img_index += 1
        return results
