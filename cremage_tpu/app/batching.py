"""Cross-request coalescing for serving — continuous batching, TPU-style.

The reference is a single-user desktop app; its ML loop runs one job at
a time (`modules/cremage/mp/mp.py:32-127`).  A serving deployment sees
many concurrent small requests instead, and a TPU chip is heavily
underutilized at batch 1 (the SD1.5 bench runs batch 4 at ~the same
step time as batch 1).  This module batches *compatible* queued jobs
into ONE device program invocation:

- `sd15_coalesce_key(params)` — the compatibility signature: every
  option that affects the compiled program or the loaded weights must
  match; prompt / negative_prompt / seed are free per request.
- `run_sd15_batch(pipe, params_list, ...)` — encodes each request's
  prompt separately (filler-padded to a common 77·n length, the same
  padding rule the reference applies between c and uc,
  `sd/image_generator.py:794-808`), stacks per-request x0 noise drawn
  from each request's OWN seed, runs one batched denoise + VAE decode,
  and splits the results back per request.

Exactness: for deterministic samplers (Euler s_churn=0, DPM++ 2M, LMS,
Heun, ...) each request's images are the same as a solo run with the
same seed — x0 noise comes from the per-request key and the trajectory
is noise-free.  Ancestral/SDE samplers draw their per-step noise from
the batch-level key, so results are quality-identical but not
bit-reproducible against a solo run (documented serving trade-off).

Worker integration: `EngineWorker(coalesce=N)` groups up to N adjacent
compatible jobs (app/worker.py); on any batch failure it falls back to
running the group serially so one poison request cannot fail its
neighbors.
"""
from __future__ import annotations

import dataclasses
import logging
import os
from typing import Callable, List, Optional, Sequence

import numpy as np

from cremage_tpu.core.config import GenerationOptions, MODE_TEXT_TO_IMAGE

logger = logging.getLogger(__name__)

# options that may differ between coalesced requests
_FREE_FIELDS = ("prompt", "negative_prompt", "seed", "extra")
# params-dict keys outside GenerationOptions that affect the loaded
# weights (sd15_factory reads them from the raw dict)
_EXTRA_LOAD_KEYS = ("unet_quantize",)


def sd15_coalesce_key(params: dict) -> Optional[tuple]:
    """Batch-compatibility signature for an SD1.5 job, or None if the
    job must run solo (modes with per-request image inputs, ControlNet
    hints, FaceID conditioning, or host-side re-entrant face fix)."""
    try:
        opts = GenerationOptions.from_dict(params)
    except Exception:
        return None
    if opts.mode != MODE_TEXT_TO_IMAGE or opts.n_iter != 1:
        return None
    if opts.control_net or params.get("control_image_path"):
        return None
    if opts.face_model or params.get("face_input_image_path"):
        return None
    if params.get("init_img") or params.get("mask_img"):
        return None
    if opts.auto_face_fix:
        return None
    d = dataclasses.asdict(opts)
    for k in _FREE_FIELDS:
        d.pop(k, None)
    items = tuple(sorted((k, repr(v)) for k, v in d.items()))
    extras = tuple((k, repr(params.get(k))) for k in _EXTRA_LOAD_KEYS)
    return items + extras


def _pad_conditioning(cs: Sequence[np.ndarray], filler: np.ndarray):
    """Filler-pad a list of (b, 77·n_i, D) conditionings to the max n."""
    import jax.numpy as jnp

    lmax = max(int(c.shape[1]) for c in cs)
    out = []
    for c in cs:
        while c.shape[1] < lmax:
            pad = jnp.broadcast_to(
                jnp.asarray(filler)[None],
                (c.shape[0],) + filler.shape).astype(c.dtype)
            c = jnp.concatenate([c, pad], axis=1)
        out.append(c)
    return out


def run_sd15_batch(
    pipe,
    params_list: Sequence[dict],
    status_cb: Callable[[str], None],
    result_cbs: Sequence[Callable],
) -> None:
    """Run N compatible txt2img requests as one device batch.

    Requires every params dict to share the same `sd15_coalesce_key`.
    Calls result_cbs[i](img01, meta) per image of request i.
    """
    import jax
    import jax.numpy as jnp

    from cremage_tpu.core.rng import key_for_image, noise_like, resolve_seed
    from cremage_tpu.models.vae import decode_from_latent
    from cremage_tpu.prompt.wildcards import resolve_wildcards
    from cremage_tpu.services.watermark import embed_watermark

    opts_list = [GenerationOptions.from_dict(p) for p in params_list]
    o0 = opts_list[0]
    seeds = [resolve_seed(o.seed) for o in opts_list]

    status_cb(f"coalesced x{len(opts_list)}: encoding prompts")
    conds = []
    for o, seed in zip(opts_list, seeds):
        job = dataclasses.replace(o)
        if o.wildcards_path and os.path.isdir(o.wildcards_path):
            job.prompt = resolve_wildcards(o.prompt, o.wildcards_path,
                                           rng=seed)
            job.negative_prompt = resolve_wildcards(
                o.negative_prompt, o.wildcards_path, rng=seed + 1)
        c, uc = pipe._conditioning(job, o.n_samples)
        conds.append((job, c, uc))

    filler = pipe.bundle.text.filler(o0.clip_skip)
    cs = _pad_conditioning([c for _, c, _ in conds], filler)
    ucs = _pad_conditioning([uc for _, _, uc in conds], filler)
    c = jnp.concatenate(cs, axis=0)
    uc = jnp.concatenate(ucs, axis=0)

    # per-request x0 noise from the request's own seed — identical to
    # what a solo run draws (sd15.py txt2img_latents)
    h, w = o0.H // o0.f, o0.W // o0.f
    ch = pipe.bundle.latent_channels
    sigma0 = pipe._sigma0(o0)
    keys = [key_for_image(seed, 0) for seed in seeds]
    x = jnp.concatenate(
        [noise_like(k, (o.n_samples, h, w, ch)) * sigma0
         for k, o in zip(keys, opts_list)], axis=0)

    lat = pipe._sample(o0, x, c, uc, keys[0], o0.sampling_steps,
                       status_cb=status_cb)
    if o0.use_hires_fix and o0.hires_fix_scale_factor > 1.0:
        lat = pipe._hires_fix(o0, lat, c, uc, keys[0], status_cb)

    status_cb("decoding")
    imgs = decode_from_latent(pipe.bundle.vae, pipe.bundle.vae_params,
                              lat.astype(jnp.bfloat16))
    imgs = np.clip((np.asarray(imgs, np.float32) + 1.0) / 2.0, 0.0, 1.0)

    # track coalescing for tests/metrics
    pipe._last_coalesced = len(opts_list)

    row = 0
    for (job, _, _), o, seed, result_cb in zip(conds, opts_list, seeds,
                                               result_cbs):
        batch = imgs[row:row + o.n_samples]
        row += o.n_samples
        if job.safety_check:
            batch, _ = pipe.safety.check(batch)
        for i in range(o.n_samples):
            img = batch[i]
            if job.watermark:
                img = embed_watermark(img)
            meta = dataclasses.asdict(job)
            meta["seed"] = seed + i
            meta.pop("extra", None)
            result_cb(img, meta)
