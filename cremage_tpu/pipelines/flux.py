"""FLUX.1 txt2img pipeline (packed-latent flow transformer).

Behavior contract: reference `modules/flux/txt2img.py` — FLUX.1-schnell
assembled from CLIP (pooled only) + T5 + transformer + VAE, txt2img, 4
default steps, no CFG for schnell (guidance_scale embedded for dev);
low_mem/keep_instance are CUDA memory knobs that do not apply on TPU
(the whole model stays resident).
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
from cremage_tpu.models.clip import CLIPTextModel
from cremage_tpu.models.flux import (
    FluxModel, make_position_ids, pack_latents, unpack_latents,
)
from cremage_tpu.models.t5 import T5Encoder
from cremage_tpu.models.vae import AutoencoderKL, decode_from_latent
from cremage_tpu.ops.tome import check_dit_options as _check_dit_tome
from cremage_tpu.prompt.sentencepiece import as_t5_tokenize
from cremage_tpu.prompt.tokenizer import CLIPTokenizer
from cremage_tpu.samplers import adacache as AC
from cremage_tpu.samplers import chunked as CH
from cremage_tpu.samplers import deepcache as DC
from cremage_tpu.samplers import flow as F
from cremage_tpu.samplers.denoiser import cfg_interval_of
from cremage_tpu.services.safety import ImageSafetyChecker, default_image_safety
from cremage_tpu.services.watermark import embed_watermark

logger = logging.getLogger(__name__)


class FluxConditioner:
    """CLIP pooled (768) + T5 context tokens."""

    def __init__(
        self,
        clip_l: Tuple[CLIPTextModel, Any],
        tokenizer: CLIPTokenizer,
        t5: Optional[Tuple[T5Encoder, Any]] = None,
        t5_tokenize: Optional[Callable[[str], np.ndarray]] = None,
        t5_len: int = 256,
    ):
        self.clip_l = clip_l
        self.tokenizer = tokenizer
        self.t5 = t5
        self.t5_tokenize = as_t5_tokenize(t5_tokenize, t5_len)
        self.t5_len = t5_len

    def encode(self, prompt: str) -> Dict[str, np.ndarray]:
        # cached jitted tower calls: eager forwards are seconds of
        # per-op dispatch on the tunneled TPU backend (core/jitcache.py)
        from cremage_tpu.core.jitcache import jit_apply

        model, params = self.clip_l
        ids = self.tokenizer.encode_with_specials(prompt)
        last, _, pooled = jit_apply(model)(params,
                                           jnp.asarray([ids], jnp.int32))
        pooled = np.asarray(pooled[0], np.float32)
        t5_dim = self.t5[0].cfg.d_model if self.t5 else 4096
        if self.t5 is not None and self.t5_tokenize is not None:
            tids = np.asarray(self.t5_tokenize(prompt), np.int64)[: self.t5_len]
            tids = np.pad(tids, (0, self.t5_len - len(tids)))
            txt = np.asarray(jit_apply(self.t5[0])(
                self.t5[1], jnp.asarray(tids[None])), np.float32)[0]
        else:
            txt = np.zeros((self.t5_len, t5_dim), np.float32)
        return {"txt": txt, "vec": pooled}


@dataclasses.dataclass
class FluxBundle:
    model: FluxModel
    params: Any
    conditioner: FluxConditioner
    vae: AutoencoderKL
    vae_params: Any


def _noop(msg):
    pass


class FluxPipeline:
    def __init__(self, bundle: FluxBundle,
                 safety: Optional[ImageSafetyChecker] = None):
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
        """Pipeline-parallel deployment (parallel/pipeline.py): the
        19-double/38-single block chain is partitioned into contiguous
        stages, each stage's params committed to its own device, and
        microbatches stream through the stage jits.  Weights are
        PARTITIONED (not replicated): this is the deployment that runs
        bf16 FLUX.1 (≈24 GB transformer) across 2+ chips whose
        individual HBM it does not fit.  Excludes use_mesh_sp /
        tome_ratio / deep_cache (stage-local caches don't span the
        partition; quantize to fp8/int8 instead if those knobs matter
        more than bf16 weights)."""
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
        the latent-token axis of every transformer forward sharded over
        `mesh[axis]` with ring attention (parallel/sequence.py).  The
        batch=1 latency axis — with one image in flight the data axis is
        idle and TP caps at the head count, but the 4096 tokens of a
        1024² image split over every chip."""
        from cremage_tpu.core.mesh import replicate_params

        self.bundle.params = replicate_params(mesh, self.bundle.params)
        self.sp_mesh = mesh
        self.sp_axis = axis
        self._cache.clear()

    def _program(self, opts, hp, wp, txt_len, b):
        model = self.bundle.model
        steps = opts.sampling_steps
        seq_len = hp * wp
        if model.cfg.guidance_embed:
            mu = F.flux_mu(seq_len)
            sigmas = F.flow_sigmas(steps, mu=mu)
        else:
            sigmas = F.flow_sigmas(steps)
        txt_ids, img_ids = make_position_ids(hp, wp, txt_len)
        guidance_scale = float(opts.scale)
        dc = int(opts.deep_cache)
        dcb = int(opts.deep_cache_branch)
        use_dc = dc >= 2
        ada = float(getattr(opts, "ada_cache", 0.0))
        ada_resc = (AC.load_calibration("flux")
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
        if cfg_interval_of(opts) is not None:
            raise ValueError(
                "cfg_interval does not apply to FLUX: guidance is "
                "distilled into the guidance embedding (no doubled CFG "
                "batch to skip)")
        tr = float(opts.tome_ratio)
        if tr > 0:
            _check_dit_tome(self.sp_mesh)
            # ToMe has no params — a config-swapped module runs on the
            # same param tree (ops/tome.py)
            model = type(model)(dataclasses.replace(
                model.cfg, tome_ratio=tr))

        def progress(i):
            self._current_status(f"{int(i) + 1} / {len(sigmas) - 1}")

        if self.pp_devices is not None:
            if use_dc:
                raise ValueError(
                    "deep_cache does not compose with use_mesh_pp (the "
                    "Δ-cache boundary is stage-local; drop deep_cache or "
                    "deploy without pp)")
            if tr > 0:
                raise ValueError(
                    "tome_ratio does not compose with use_mesh_pp (the "
                    "merge plan and its RoPE gather are stage-0-local)")
            from cremage_tpu.parallel.pipeline import FluxPP

            geom = (hp, wp, txt_len)
            pp = self._pp_cache.get(geom)
            if pp is None:
                pp = FluxPP(model, self.bundle.params, self.pp_devices,
                            hp=hp, wp=wp, txt_len=txt_len,
                            n_stages=self.pp_n_stages)
                self._pp_cache[geom] = pp
            mb = self.pp_microbatch

            def run_pp(params, x_tokens, txt, vec, key):
                # host-stepped flow Euler (samplers/flow.py semantics):
                # 4-8 schnell/dev steps make the host loop free, and the
                # staged forward cannot live inside one jit program.
                # x lives on the LAST stage's device (where v lands) so
                # the Euler update never mixes committed devices.
                x = jax.device_put(x_tokens.astype(jnp.float32),
                                   pp.out_device)
                for i in range(len(sigmas) - 1):
                    g = guidance_scale if model.cfg.guidance_embed else None
                    v = pp(x, txt, float(sigmas[i]), vec, guidance=g,
                           microbatch=mb)
                    x = x + float(sigmas[i + 1] - sigmas[i]) * v.astype(
                        jnp.float32)
                    progress(i)
                return x

            return run_pp

        sp_mesh, sp_axis = self.sp_mesh, self.sp_axis

        def run(params, x_tokens, txt, vec, key):
            def v_fn(xx, sigma, **mk):
                bsz = xx.shape[0]
                t = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (bsz,))
                guidance = (
                    jnp.full((bsz,), guidance_scale, jnp.float32)
                    if model.cfg.guidance_embed else None
                )
                if sp_mesh is not None:
                    from cremage_tpu.parallel.sequence import flux_sp_apply

                    # DeepCache composes: the Δ-cache is per-img-token,
                    # so capture/shallow ride through token-sharded
                    # (the scan carry keeps the delta distributed)
                    return flux_sp_apply(model, params, sp_mesh, xx, txt, t,
                                         vec, img_ids, txt_ids,
                                         guidance=guidance, axis=sp_axis,
                                         **mk)
                return model.apply(params, xx, txt, t, vec, img_ids, txt_ids,
                                   guidance, **mk)

            if use_dc:
                v_cap = lambda xx, ss: v_fn(xx, ss, mode="capture",
                                            cache_depth=dcb)
                v_sh = lambda xx, ss, deep: v_fn(xx, ss, mode="shallow",
                                                 cache_depth=dcb, deep=deep)
                _, deep_sd = jax.eval_shape(
                    v_cap, x_tokens, jnp.asarray(1.0, jnp.float32))
                cache0 = jnp.zeros(deep_sd.shape, deep_sd.dtype)
                carry = DC.make_dc_denoise(v_cap, v_sh, dc)
                return DC.sample_flow_euler_dc(
                    carry, cache0, x_tokens, sigmas, key=key,
                    progress_cb=progress)
            if use_ada:
                carry = AC.make_ada_denoise(
                    v_fn, ada, len(sigmas) - 1, kind="flow",
                    rescale=ada_resc)
                return DC.sample_flow_euler_dc(
                    carry, AC.ada_cache0(x_tokens), x_tokens, sigmas,
                    key=key, progress_cb=progress)
            return F.sample_flow_euler(v_fn, x_tokens, sigmas, key=key,
                                       progress_cb=progress)

        bucket = ("flux", steps, hp, wp, txt_len, b, guidance_scale,
                  sp_mesh is not None, dc if use_dc else 0, dcb, tr, ada, ada_resc)

        # Segmented flow-Euler for per-step progress where in-scan
        # io_callback cannot compile (samplers/chunked.py); composes
        # with SP (v_fn is the same code either way)
        if (CH.chunked_progress_active(self._current_status, _noop)
                and not use_dc and not use_ada):
            plan = F.plan_flow_euler(sigmas)

            def make_v(params, txt, vec):
                def v_fn(xx, sigma):
                    bsz = xx.shape[0]
                    t = jnp.broadcast_to(
                        jnp.asarray(sigma, jnp.float32), (bsz,))
                    guidance = (
                        jnp.full((bsz,), guidance_scale, jnp.float32)
                        if model.cfg.guidance_embed else None
                    )
                    if sp_mesh is not None:
                        from cremage_tpu.parallel.sequence import \
                            flux_sp_apply

                        return flux_sp_apply(
                            model, params, sp_mesh, xx, txt, t, vec,
                            img_ids, txt_ids, guidance=guidance,
                            axis=sp_axis)
                    return model.apply(params, xx, txt, t, vec, img_ids,
                                       txt_ids, guidance)
                return v_fn

            def get_program(role, build):
                fn = self._cache.get(bucket + (role,))
                if fn is None:
                    fn = jax.jit(build())
                    self._cache[bucket + (role,)] = fn
                return fn

            def chunked_fn(params, x_tokens, txt, vec, key):
                return CH.run_chunked(
                    plan, get_program=get_program, make_denoise=make_v,
                    args=(params, txt, vec), x=x_tokens, key=key,
                    progress=progress, segments=CH.default_segments())

            return chunked_fn

        fn = self._cache.get(bucket)
        if fn is None:
            fn = jax.jit(run)
            self._cache[bucket] = fn
        return fn

    def generate(self, opts: GenerationOptions, status_cb=_noop,
                 result_cb=None) -> List[Tuple[np.ndarray, Dict[str, Any]]]:
        base_seed = resolve_seed(opts.seed)
        self._current_status = status_cb
        results = []
        img_index = 0
        for it in range(opts.n_iter):
            b = opts.n_samples
            status_cb("encoding prompt")
            cond = self.bundle.conditioner.encode(opts.prompt)
            txt = jnp.asarray(np.broadcast_to(
                cond["txt"][None], (b,) + cond["txt"].shape))
            vec = jnp.asarray(np.broadcast_to(
                cond["vec"][None], (b,) + cond["vec"].shape))
            key = key_for_image(base_seed, img_index)
            h, w = opts.H // 8, opts.W // 8
            hp, wp = h // 2, w // 2
            lat = noise_like(key, (b, h, w, 16))
            x_tokens = pack_latents(lat)
            fn = self._program(opts, hp, wp, txt.shape[1], b)
            out_tokens = fn(self.bundle.params, x_tokens, txt, vec, key)
            lat = unpack_latents(out_tokens, h, w)
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
