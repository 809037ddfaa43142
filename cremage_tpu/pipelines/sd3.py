"""SD3 txt2img pipeline (MMDiT + rectified flow).

Behavior contract: reference `modules/sd3/txt2img.py` — diffusers
StableDiffusion3Pipeline from a single-file checkpoint, txt2img only,
optional T5 (the reference exposes quantize_t5; here T5 is optional and
its context slots are zeros when absent, diffusers' no-T5 mode).

Conditioning (SD3 contract):
- crossattn = [concat(CLIP-L penultimate (77,768), bigG penultimate
  (77,1280)) zero-padded to 4096 ; T5 tokens (77, 4096)] -> (154, 4096);
- pooled = concat(CLIP-L pooled (768), bigG pooled (1280)) -> (2048);
- CFG over velocity; FlowEuler with shift=3 sigmas.
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
from cremage_tpu.models.mmdit import MMDiT
from cremage_tpu.models.open_clip import OpenCLIPTextModel
from cremage_tpu.models.t5 import T5Encoder
from cremage_tpu.models.vae import AutoencoderKL, decode_from_latent
from cremage_tpu.ops.tome import check_dit_options as _check_dit_tome
from cremage_tpu.prompt.chunking import generate_weighted_chunks, make_ti_fetch
from cremage_tpu.prompt.parser import compute_prompt_score
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


class SD3Conditioner:
    """CLIP-L + bigG (+ optional T5) -> (crossattn (L,4096), pooled (2048))."""

    def __init__(
        self,
        clip_l: Tuple[CLIPTextModel, Any],
        open_clip: Tuple[OpenCLIPTextModel, Any],
        tokenizer: CLIPTokenizer,
        t5: Optional[Tuple[T5Encoder, Any]] = None,
        t5_tokenize: Optional[Callable[[str], np.ndarray]] = None,
        t5_len: int = 77,
        t5_dim: int = 4096,
        embedding_dir: Optional[str] = None,
    ):
        self.clip_l = clip_l
        self.open_clip = open_clip
        self.tokenizer = tokenizer
        self.t5 = t5
        self.t5_tokenize = as_t5_tokenize(t5_tokenize, t5_len)
        self.t5_len = t5_len
        self.t5_dim = t5[0].cfg.d_model if t5 else t5_dim
        self.embedding_dir = embedding_dir

    def _clip_parts(self, prompt: str):
        model_l, params_l = self.clip_l
        model_g, params_g = self.open_clip
        pairs = compute_prompt_score(prompt)
        ti_l = make_ti_fetch(self.embedding_dir, load_embedding, "clip_l")
        ti_g = make_ti_fetch(self.embedding_dir, load_embedding, "clip_g")

        from cremage_tpu.core.jitcache import jit_apply

        def embed_l(ids):
            return np.asarray(jit_apply(model_l, CLIPTextModel.embed_tokens)(
                params_l, jnp.asarray(np.asarray(ids, np.int32))), np.float32)

        def embed_g(ids):
            return np.asarray(jit_apply(model_g, OpenCLIPTextModel.embed_tokens)(
                params_g, jnp.asarray(np.asarray(ids, np.int32))), np.float32)

        cl, el = generate_weighted_chunks(self.tokenizer, embed_l, pairs, ti_l)
        cg, eg = generate_weighted_chunks(self.tokenizer, embed_g, pairs, ti_g)
        # first chunk only (SD3 uses 77 tokens per tower)
        last_l, hid_l, _ = jit_apply(model_l)(
            params_l, inputs_embeds=jnp.asarray(cl[0][None]))
        zl = np.asarray(hid_l[model_l.cfg.num_layers - 1][0], np.float32)
        # CLIP-L pooled: final-LN state at the EOS position
        pooled_l = np.asarray(last_l[0], np.float32)[el[0]]

        hid_g, final_g = jit_apply(model_g)(
            params_g, inputs_embeds=jnp.asarray(cg[0][None]))
        zg = np.asarray(hid_g[model_g.cfg.num_layers - 1][0], np.float32)
        pooled_g = np.asarray(jit_apply(
            model_g, OpenCLIPTextModel.project_pooled)(
            params_g, final_g, jnp.asarray([eg[0]]))[0], np.float32)
        return zl, pooled_l, zg, pooled_g

    def encode(self, prompt: str) -> Dict[str, np.ndarray]:
        zl, pooled_l, zg, pooled_g = self._clip_parts(prompt)
        clip_cross = np.concatenate([zl, zg], axis=-1)  # (77, 2048)
        t5_dim = self.t5_dim
        clip_cross = np.pad(
            clip_cross, ((0, 0), (0, t5_dim - clip_cross.shape[-1]))
        )
        if self.t5 is not None and self.t5_tokenize is not None:
            ids = np.asarray(self.t5_tokenize(prompt), np.int64)[: self.t5_len]
            ids = np.pad(ids, (0, self.t5_len - len(ids)))
            from cremage_tpu.core.jitcache import jit_apply as _ja
            t5_out = np.asarray(_ja(self.t5[0])(
                self.t5[1], jnp.asarray(ids[None])), np.float32)[0]
        else:
            t5_out = np.zeros((self.t5_len, t5_dim), np.float32)
        cross = np.concatenate([clip_cross, t5_out], axis=0)
        pooled = np.concatenate([pooled_l, pooled_g], axis=0)
        return {"crossattn": cross, "pooled": pooled}

    def encode_pair(self, opts: GenerationOptions, batch: int):
        c = self.encode(opts.prompt)
        uc = self.encode(opts.negative_prompt)

        def tile(d):
            return {
                k: jnp.asarray(np.broadcast_to(v[None], (batch,) + v.shape))
                for k, v in d.items()
            }

        return tile(c), tile(uc)


@dataclasses.dataclass
class SD3Bundle:
    mmdit: MMDiT
    mmdit_params: Any
    conditioner: SD3Conditioner
    vae: AutoencoderKL
    vae_params: Any
    shift: float = 3.0


def _noop(msg):
    pass


class SD3Pipeline:
    def __init__(self, bundle: SD3Bundle,
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
        """Pipeline-parallel deployment (parallel/pipeline.py MMDiTPP):
        the joint-block chain is partitioned into contiguous stages,
        each stage's params committed to its own device, and
        microbatches stream through the stage jits (CFG's doubled batch
        gives two chunks for free).  Weights are PARTITIONED, not
        replicated — the deployment for spanning chips whose individual
        HBM the transformer does not fit.  Excludes use_mesh_sp /
        tome_ratio / deep_cache (stage-local caches don't span the
        partition)."""
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
        latent patch rows of every MMDiT forward sharded over
        `mesh[axis]` with ring attention and the context stream folded
        as a replicated prefix (parallel/sequence.py mmdit_sp_apply) —
        the batch=1 latency axis."""
        from cremage_tpu.core.mesh import replicate_params

        self.bundle.mmdit_params = replicate_params(
            mesh, self.bundle.mmdit_params)
        self.sp_mesh = mesh
        self.sp_axis = axis
        self._cache.clear()

    def _program(self, opts: GenerationOptions, shape, cond_shapes):
        sigmas = F.sd3_sigmas(opts.sampling_steps, self.bundle.shift)
        scale = float(opts.scale)
        mmdit = self.bundle.mmdit
        sp_mesh, sp_axis = self.sp_mesh, self.sp_axis
        dc = int(opts.deep_cache)
        dcb = int(opts.deep_cache_branch)
        use_dc = dc >= 2
        ada = float(getattr(opts, "ada_cache", 0.0))
        ada_resc = (AC.load_calibration("sd3")
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
        tr = float(opts.tome_ratio)
        if tr > 0:
            _check_dit_tome(sp_mesh)
            # ToMe has no params — a config-swapped module runs on the
            # same param tree (ops/tome.py)
            mmdit = type(mmdit)(dataclasses.replace(
                mmdit.cfg, tome_ratio=tr))
        cfgi = cfg_interval_of(opts)
        if cfgi is not None:
            if self.pp_devices is not None:
                raise ValueError(
                    "cfg_interval does not compose with use_mesh_pp (the "
                    "microbatch stream is sized by the doubled CFG batch)")

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
                    "merge plan is stage-0-local)")
            from cremage_tpu.parallel.pipeline import MMDiTPP

            p = mmdit.cfg.patch_size
            geom = (shape[1] // p, shape[2] // p)
            pp = self._pp_cache.get(geom)
            if pp is None:
                pp = MMDiTPP(mmdit, self.bundle.mmdit_params,
                             self.pp_devices, hp=geom[0], wp=geom[1],
                             n_stages=self.pp_n_stages)
                self._pp_cache[geom] = pp
            mb = self.pp_microbatch
            sig = np.asarray(sigmas, np.float64)

            def run_pp(params, x, c, uc, key):
                # host-stepped flow Euler (samplers/flow.py semantics,
                # batched [uc, c] CFG like cfg_velocity): the staged
                # forward cannot live inside one jit program.  x lives
                # on the LAST stage's device (where v lands).
                xx = jax.device_put(x.astype(jnp.float32), pp.out_device)
                use_cfg = uc is not None and scale != 1.0
                if use_cfg:
                    ctx2 = jnp.concatenate(
                        [uc["crossattn"], c["crossattn"]], axis=0)
                    pool2 = jnp.concatenate(
                        [uc["pooled"], c["pooled"]], axis=0)
                for i in range(len(sig) - 1):
                    t_val = float(sig[i]) * 1000.0
                    if use_cfg:
                        bsz = xx.shape[0]
                        v2 = pp(jnp.concatenate([xx, xx], axis=0), t_val,
                                ctx2, pool2, microbatch=mb)
                        vu, vc = v2[:bsz], v2[bsz:]
                        v = vu + scale * (vc - vu)
                    else:
                        v = pp(xx, t_val, c["crossattn"], c["pooled"],
                               microbatch=mb)
                    xx = xx + float(sig[i + 1] - sig[i]) * v.astype(
                        jnp.float32)
                    progress(i)
                return xx

            return run_pp

        def run(params, x, c, uc, key):
            def v_model(xx, tt, cond, **mk):
                if sp_mesh is not None:
                    from cremage_tpu.parallel.sequence import mmdit_sp_apply

                    # DeepCache composes: the Δ-cache is per-token, so
                    # capture/shallow ride through token-sharded
                    return mmdit_sp_apply(mmdit, params, sp_mesh, xx,
                                          tt * 1000.0, cond["crossattn"],
                                          cond["pooled"], axis=sp_axis,
                                          **mk)
                return mmdit.apply(params, xx, tt * 1000.0,
                                   cond["crossattn"], cond["pooled"], **mk)

            # under DeepCache the guidance interval is handled by the
            # windowed carry denoiser (host-static step flags)
            v = F.cfg_velocity(v_model, c, uc, scale,
                               interval=None if use_dc else cfgi)
            if use_dc:
                v_cap = lambda xx, ss: v(xx, ss, mode="capture",
                                         cache_depth=dcb)
                v_sh = lambda xx, ss, deep: v(xx, ss, mode="shallow",
                                              cache_depth=dcb, deep=deep)
                _, deep_sd = jax.eval_shape(
                    v_cap, x, jnp.asarray(1.0, jnp.float32))
                cache0 = jnp.zeros(deep_sd.shape, deep_sd.dtype)
                if cfgi is not None:
                    v_c = F.cfg_velocity(v_model, c, None, scale)
                    c_cap = lambda xx, ss: v_c(xx, ss, mode="capture",
                                               cache_depth=dcb)
                    c_sh = lambda xx, ss, deep: v_c(
                        xx, ss, mode="shallow", cache_depth=dcb, deep=deep)
                    carry = DC.make_dc_denoise_windowed(
                        v_cap, v_sh, c_cap, c_sh, dc,
                        DC.window_flags(sigmas, cfgi), x.shape[0])
                else:
                    carry = DC.make_dc_denoise(v_cap, v_sh, dc)
                return DC.sample_flow_euler_dc(
                    carry, cache0, x, sigmas, key=key, progress_cb=progress)
            if use_ada:
                carry = AC.make_ada_denoise(
                    v, ada, len(sigmas) - 1, kind="flow",
                    rescale=ada_resc)
                return DC.sample_flow_euler_dc(
                    carry, AC.ada_cache0(x), x, sigmas, key=key,
                    progress_cb=progress)
            return F.sample_flow_euler(v, x, sigmas, key=key,
                                       progress_cb=progress)

        bucket = ("sd3", opts.sampling_steps, tuple(shape), cond_shapes,
                  scale, sp_mesh is not None, dc if use_dc else 0, dcb, tr,
                  cfgi, ada, ada_resc)

        # Segmented flow-Euler for per-step progress where in-scan
        # io_callback cannot compile (samplers/chunked.py)
        if (CH.chunked_progress_active(self._current_status, _noop)
                and not use_dc and not use_ada):
            plan = F.plan_flow_euler(sigmas)

            def make_v(params, cc, ucc):
                def v_model(xx, tt, cond):
                    if sp_mesh is not None:
                        from cremage_tpu.parallel.sequence import \
                            mmdit_sp_apply

                        return mmdit_sp_apply(
                            mmdit, params, sp_mesh, xx, tt * 1000.0,
                            cond["crossattn"], cond["pooled"],
                            axis=sp_axis)
                    return mmdit.apply(params, xx, tt * 1000.0,
                                       cond["crossattn"], cond["pooled"])
                return F.cfg_velocity(v_model, cc, ucc, scale,
                                      interval=cfgi)

            def get_program(role, build):
                fn = self._cache.get(bucket + (role,))
                if fn is None:
                    fn = jax.jit(build())
                    self._cache[bucket + (role,)] = fn
                return fn

            def chunked_fn(params, x, c, uc, key):
                return CH.run_chunked(
                    plan, get_program=get_program, make_denoise=make_v,
                    args=(params, c, uc), x=x, key=key,
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
            c, uc = self.bundle.conditioner.encode_pair(opts, b)
            key = key_for_image(base_seed, img_index)
            h, w = opts.H // 8, opts.W // 8
            x = noise_like(key, (b, h, w, 16))
            fn = self._program(
                opts, x.shape,
                (tuple(c["crossattn"].shape), tuple(c["pooled"].shape)),
            )
            lat = fn(self.bundle.mmdit_params, x, c, uc, key)
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
