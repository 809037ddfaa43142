"""Benchmarks: one JSON line per lane, all lanes by default.

Lanes (BASELINE.json driver metric):
  sd15     SD1.5 512^2 20-step Euler-a txt2img      images/s/chip
  sdxl     SDXL 1024^2 30-step EulerEDM txt2img     images/s/chip
  svd      SVD 14-frame 576x1024 25-step img2vid    frames/s/chip
  flux     FLUX.1-schnell 1024^2 4-step, fp8 12B    images/s/chip
  sd15_e2e /v1/generate product path               images/s
  *_dc     DeepCache interval-2 variants (approximate quality grade:
           full UNet every 2nd step — samplers/deepcache.py; measured
           v5e: sd15 3.48 vs 2.99, sdxl 0.456 vs 0.286, svd 0.644 vs
           0.538)
  *_tome   Token-merging variants (ops/tome.py, ratio 0.5; measured
           v5e: sd15 3.31, sdxl 0.296, svd 0.571) — _dc_tome stacks
           both approximations (sd15 4.02 = +34% over exact, sdxl
           0.471, svd 0.729 = +35% over exact)
  *_cfgi   Guidance-interval variants (Kynkäänniemi 2024, window
           [0.28, 5.42]; measured v5e: sd15 3.18, sdxl 0.315) —
           _dc_tome_cfgi stacks all three (sd15 4.336 = +48% over
           exact, sdxl 0.548 = +92% over exact)

Each line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline anchors (BASELINE.md): the reference publishes no SD1.5/
SDXL/SVD throughput numbers; its only published rate is FLUX on a 4090
at ~0.125 img/s.  sd15/svd are anchored to that (the only published
number — apples-to-oranges, stated here for transparency); sdxl is
anchored to the north-star 0.25 img/s/chip (2 img/s on v5e-8).

Notes for the axon-tunneled chip: compiles are slow (~30s-8min each)
and block_until_ready does not reliably block, so params are built
host-side (no init compile) and timing forces device->host transfers
(np.asarray).  Select lanes with BENCH_LANES=sd15,sdxl,svd (also
accepts legacy BENCH_MODEL=sdxl).
"""
import json
import logging
import os
import time
import traceback

# The axon TPU plugin registers as experimental, and jax logs one
# "Platform 'axon' is experimental" WARNING per process — with one
# subprocess per lane that is ~15 warnings polluting the driver's
# tail capture of this run's output (the r04 artifact lost the four
# exact driver-metric lanes to exactly this scroll).  Filter it at the
# logger before backend init; real warnings still pass through.
logging.getLogger("jax._src.xla_bridge").addFilter(
    lambda rec: "is experimental and" not in rec.getMessage())

import numpy as np

import jax
import jax.numpy as jnp

FLUX_4090_ANCHOR = 0.125        # img/s — only published reference rate
SDXL_NORTH_STAR = 0.25          # img/s/chip — 2 img/s on v5e-8


def zeros_params(model, *example_args):
    shapes = jax.eval_shape(model.init, jax.random.key(0), *example_args)
    # MEASURED on v5e (round 3, sd15 lane, 6 rounds each): fp32 master
    # weights 2.804 img/s vs bf16 weights 2.774 img/s — bf16 weight
    # storage does NOT help (the lane is VPU/attention-bound, not
    # weight-HBM-bound at batch 4; the models already compute in bf16
    # with fp32 norm statistics either way).  Same result for SDXL
    # (0.2858 bf16 vs 0.2861 fp32 — conv weight reuse across the 1024^2
    # spatial extent hides the weight traffic).  Default stays fp32;
    # BENCH_PARAM_DTYPE=bf16 selects bf16 storage for comparison runs.
    # ONE jitted program materializes the whole zero tree: per-leaf
    # jnp.zeros costs a dispatch each through the tunnel (MEASURED on
    # the 1,680-leaf SDXL tree: 24.8 s tree.map vs 11.5 s jitted incl.
    # its compile — and the zeros program persists in the compile
    # cache, so later runs pay only the dispatch)
    if os.environ.get("BENCH_PARAM_DTYPE", "").lower() in ("bf16",
                                                           "bfloat16"):
        return jax.jit(lambda: jax.tree.map(
            lambda s: jnp.zeros(
                s.shape,
                jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
            shapes))()
    return jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))()


def timed_rounds(fn, n_rounds):
    """Dispatch every round asynchronously, then drain: device->host
    image pulls (the axon tunnel link moves ~23 MB/s) overlap the next
    round's compute, like a real serving loop. Returns elapsed seconds
    for all rounds."""
    t0 = time.perf_counter()
    outs = [fn(i) for i in range(n_rounds)]
    for o in outs:
        np.asarray(o)
    return time.perf_counter() - t0


def _emit(metric, value, unit, baseline):
    print(json.dumps({
        "metric": metric,
        "value": round(value, 4),
        "unit": unit,
        "vs_baseline": round(value / baseline, 2),
    }), flush=True)


def quantized_unet_zeros(model, *example_args):
    """All-zeros UNet params at int8 w8a8 storage (convs included) —
    the opt-in sd15_int8/sdxl_int8 lanes.  The UNet families are
    conv-bound (NOTES_r3 profiles: convs 54-64% of lane time), and the
    v5e MXU runs s8 x s8 -> s32 at 2x the bf16 peak.

    MEASURED on v5e (round 3): the hypothesis did NOT pay for the UNet
    families — sd15_int8 2.969 vs 2.99 bf16 img/s (wash; lane is
    attention/VPU-bound), sdxl_int8 0.180 vs 0.286 (the dynamic
    activation-quantize chain at 1024^2 extents swamps the conv win),
    svd_int8 0.513 vs 0.538 f/s.  int8 w8a8 only wins the
    matmul-bound DiT lanes (flux_int8 0.496 vs 0.396 fp8 = +25%);
    these UNet lanes stay opt-in for the memory savings only."""
    from cremage_tpu.io.quantize import quantized_zeros

    shapes = jax.eval_shape(model.init, jax.random.key(0), *example_args)
    # one jitted program for the whole tree (see zeros_params)
    return jax.jit(lambda: quantized_zeros(
        shapes, dtype="int8", include_convs=True))()


def _cfgi_env():
    """Guidance interval for the *_cfgi lanes: BENCH_CFGI="lo,hi"
    (default the Kynkäänniemi et al. 2024 interval, sigma in
    [0.28, 5.42] — 14/20 SD1.5 karras steps / 22/30 SDXL EDM steps
    run CFG; the rest run the conditional model alone)."""
    lo, hi = os.environ.get("BENCH_CFGI", "0.28,5.42").split(",")
    return (float(lo), float(hi))


def bench_sd15(quant_dtype=None, deep_cache=0, tome=0.0, cfgi=None):
    from cremage_tpu.models.unet import UNetModel, sd15_unet_config
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig, decode_from_latent
    from cremage_tpu.samplers import deepcache as DCmod
    from cremage_tpu.samplers import kdiffusion as K
    from cremage_tpu.samplers import schedules as S
    from cremage_tpu.samplers.denoiser import EpsDenoiser, cfg_denoiser

    # batch sweep (v5e, round 3): batch 8 = 2.95-3.09 img/s vs batch 4 =
    # 2.99 — equal within the ~4% tunnel run-to-run variance; 4 kept for
    # latency
    batch = int(os.environ.get("BENCH_BATCH", "4"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    h = w = 64  # 512/8

    unet = UNetModel(sd15_unet_config(tome_ratio=float(tome)))
    x1 = jnp.zeros((1, h, w, 4), jnp.bfloat16)
    t1 = jnp.zeros((1,), jnp.float32)
    c1 = jnp.zeros((1, 77, 768), jnp.bfloat16)
    if quant_dtype == "int8":
        params = quantized_unet_zeros(unet, x1, t1, c1)
    else:
        params = zeros_params(unet, x1, t1, c1)

    vae = AutoencoderKL(VAEConfig())
    vae_params = zeros_params(vae, jnp.zeros((1, 64, 64, 3), jnp.bfloat16))

    sched = S.default_sd_schedule()
    sigmas = sched.get_sigmas(steps)

    c = jax.random.normal(jax.random.key(2), (batch, 77, 768), jnp.bfloat16)
    uc = jnp.zeros_like(c)

    # params are jit ARGUMENTS — closing over them would embed ~3.6GB of
    # HLO constants and stall compilation through the device tunnel
    dc_branch = int(os.environ.get("BENCH_DC_BRANCH", "1"))

    @jax.jit
    def generate(params, vae_params, c, uc, key):
        def eps_model(xx, tt, cc, **uk):
            return unet.apply(params, xx, tt, cc, **uk)

        denoise = EpsDenoiser(eps_model, sched)
        cfg_fn = cfg_denoiser(denoise, c, uc, scale=7.5,
                              interval=None if deep_cache >= 2 else cfgi)
        x0 = jax.random.normal(key, (batch, h, w, 4), jnp.float32) * float(sigmas[0])
        if deep_cache >= 2:
            den_cap = lambda xx, ss: cfg_fn(
                xx, ss, mode="capture", cache_levels=dc_branch)
            den_sh = lambda xx, ss, deep: cfg_fn(
                xx, ss, mode="shallow", cache_levels=dc_branch, deep=deep)
            _, dsd = jax.eval_shape(den_cap, x0,
                                    jnp.asarray(1.0, jnp.float32))
            if cfgi is not None:
                den_c = cfg_denoiser(denoise, c, None, 7.5)
                c_cap = lambda xx, ss: den_c(
                    xx, ss, mode="capture", cache_levels=dc_branch)
                c_sh = lambda xx, ss, deep: den_c(
                    xx, ss, mode="shallow", cache_levels=dc_branch,
                    deep=deep)
                carry = DCmod.make_dc_denoise_windowed(
                    den_cap, den_sh, c_cap, c_sh, deep_cache,
                    DCmod.window_flags(sigmas, cfgi), batch)
            else:
                carry = DCmod.make_dc_denoise(den_cap, den_sh, deep_cache)
            lat = DCmod.sample_euler_ancestral_dc(
                carry, jnp.zeros(dsd.shape, dsd.dtype), x0, sigmas, key=key)
        else:
            lat = K.sample_euler_ancestral(cfg_fn, x0, sigmas, key=key)
        img = decode_from_latent(vae, vae_params, lat.astype(jnp.bfloat16))
        # quantize to uint8 ON DEVICE: the serving path ships 8-bit
        # images, and the measured device->host link moves ~23 MB/s, so
        # pulling fp32 pixels would bill ~200 ms/batch of pure transfer
        return jnp.clip((img.astype(jnp.float32) + 1.0) * 127.5 + 0.5,
                        0, 255).astype(jnp.uint8)

    # warmup/compile (force full execution via host transfer)
    np.asarray(generate(params, vae_params, c, uc, jax.random.key(0)))

    n_rounds = int(os.environ.get("BENCH_ROUNDS", "3"))
    dt = timed_rounds(
        lambda i: generate(params, vae_params, c, uc, jax.random.key(i + 1)),
        n_rounds)

    tag = "_int8" if quant_dtype == "int8" else ""
    if deep_cache >= 2:
        tag += f"_deepcache{deep_cache}"
    if tome > 0:
        tag += f"_tome{int(tome * 100)}"
    if cfgi is not None:
        tag += "_cfgi"
    _emit(f"sd15_txt2img_512_20step_euler_a{tag}_images_per_sec_per_chip",
          batch * n_rounds / dt, "images/s", FLUX_4090_ANCHOR)


def bench_sdxl(quant_dtype=None, deep_cache=0, tome=0.0, cfgi=None):
    """SDXL 1024^2 30-step EulerEDM with CFG + VAE decode — the
    BASELINE.json north-star configuration.  deep_cache >= 2 adds the
    DeepCache lane (full UNet every N-th step, shallow in between —
    samplers/deepcache.py; quality grade approximate)."""
    from cremage_tpu.models.unet import UNetModel, sdxl_base_unet_config
    from cremage_tpu.models.vae import (
        AutoencoderKL, decode_from_latent, sdxl_vae_config,
    )
    from cremage_tpu.samplers import deepcache as DCmod
    from cremage_tpu.samplers import edm as EDM

    # batch sweep (v5e, round 3): batch 2 = 0.2668 img/s vs batch 1 =
    # 0.2861 — strictly worse (activation pressure at 1024^2); keep 1
    batch = int(os.environ.get("BENCH_BATCH_SDXL", "1"))
    steps = int(os.environ.get("BENCH_STEPS_SDXL", "30"))
    h = w = 128  # 1024/8

    unet = UNetModel(sdxl_base_unet_config(tome_ratio=float(tome)))
    unet_example = (jnp.zeros((1, h, w, 4), jnp.bfloat16), jnp.zeros((1,)),
                    jnp.zeros((1, 77, 2048), jnp.bfloat16),
                    jnp.zeros((1, 2816)))
    if quant_dtype == "int8":
        params = quantized_unet_zeros(unet, *unet_example)
    else:
        params = zeros_params(unet, *unet_example)
    vae = AutoencoderKL(sdxl_vae_config())
    vae_params = zeros_params(vae, jnp.zeros((1, 512, 512, 3), jnp.bfloat16))

    sigmas = EDM.LegacyDDPMDiscretization()(steps)
    c = {"crossattn": jax.random.normal(jax.random.key(1),
                                        (batch, 77, 2048), jnp.bfloat16),
         "vector": jax.random.normal(jax.random.key(2), (batch, 2816),
                                     jnp.bfloat16)}
    uc = jax.tree.map(jnp.zeros_like, c)

    dc_branch = int(os.environ.get("BENCH_DC_BRANCH", "1"))

    @jax.jit
    def generate(params, vae_params, c, uc, key):
        def network(xx, tt, cond, **uk):
            return unet.apply(params, xx, tt, cond["crossattn"],
                              cond["vector"], **uk)

        denoiser = EDM.DiscreteDenoiserSGM(
            network, EDM.LegacyDDPMDiscretization()(1000, do_append_zero=False))
        denoise = EDM.vanilla_cfg(denoiser, c, uc, scale=7.0,
                                  interval=None if deep_cache >= 2 else cfgi)
        x = jax.random.normal(key, (batch, h, w, 4), jnp.float32)
        if deep_cache >= 2:
            sig = np.asarray(sigmas, np.float64)
            x0 = x.astype(jnp.float32) * float(np.sqrt(1.0 + sig[0] ** 2))
            den_cap = lambda xx, ss: denoise(
                xx, ss, mode="capture", cache_levels=dc_branch)
            den_sh = lambda xx, ss, deep: denoise(
                xx, ss, mode="shallow", cache_levels=dc_branch, deep=deep)
            _, dsd = jax.eval_shape(den_cap, x0,
                                    jnp.asarray(1.0, jnp.float32))
            if cfgi is not None:
                den_c = EDM.identity_guider(denoiser, c, uc)
                c_cap = lambda xx, ss: den_c(
                    xx, ss, mode="capture", cache_levels=dc_branch)
                c_sh = lambda xx, ss, deep: den_c(
                    xx, ss, mode="shallow", cache_levels=dc_branch,
                    deep=deep)
                carry = DCmod.make_dc_denoise_windowed(
                    den_cap, den_sh, c_cap, c_sh, deep_cache,
                    DCmod.window_flags(sig, cfgi), batch)
            else:
                carry = DCmod.make_dc_denoise(den_cap, den_sh, deep_cache)
            lat = DCmod.sample_euler_dc(
                carry, jnp.zeros(dsd.shape, dsd.dtype), x0, sig, key=key)
        else:
            lat = EDM.run_sgm_sampler("EulerEDMSampler", denoise, x, sigmas,
                                      key=key)
        img = decode_from_latent(vae, vae_params, lat.astype(jnp.bfloat16))
        return jnp.clip((img.astype(jnp.float32) + 1.0) * 127.5 + 0.5,
                        0, 255).astype(jnp.uint8)

    np.asarray(generate(params, vae_params, c, uc, jax.random.key(0)))
    n_rounds = int(os.environ.get("BENCH_ROUNDS_SDXL", "2"))
    dt = timed_rounds(
        lambda i: generate(params, vae_params, c, uc, jax.random.key(i + 1)),
        n_rounds)

    tag = "_int8" if quant_dtype == "int8" else ""
    if deep_cache >= 2:
        tag += f"_deepcache{deep_cache}"
    if tome > 0:
        tag += f"_tome{int(tome * 100)}"
    if cfgi is not None:
        tag += "_cfgi"
    _emit(f"sdxl_txt2img_1024_30step_euler_edm{tag}_images_per_sec_per_chip",
          batch * n_rounds / dt, "images/s", SDXL_NORTH_STAR)


def bench_svd(quant_dtype=None, deep_cache=0, tome=0.0):
    """SVD img2vid: 14 frames at 576x1024 (the model's native video
    resolution), 25-step EulerEDM with the LinearPredictionGuider —
    reference tool defaults (`tools/video_generator.py`)."""
    from cremage_tpu.models.video_unet import VideoUNet, svd_unet_config
    from cremage_tpu.models.vae import (
        AutoencoderKL, VAEConfig, decode_from_latent,
    )
    from cremage_tpu.samplers import deepcache as DCmod
    from cremage_tpu.samplers import edm as EDM

    frames = int(os.environ.get("BENCH_FRAMES", "14"))
    steps = int(os.environ.get("BENCH_STEPS_SVD", "25"))
    h, w = (int(s) for s in
            os.environ.get("BENCH_SVD_HW", "72x128").split("x"))  # 576x1024/8

    unet = VideoUNet(svd_unet_config(tome_ratio=float(tome)),
                     num_frames=frames)
    x1 = jnp.zeros((frames, h, w, 8), jnp.bfloat16)
    t1 = jnp.zeros((frames,), jnp.float32)
    c1 = jnp.zeros((frames, 1, 1024), jnp.bfloat16)
    v1 = jnp.zeros((frames, 768), jnp.float32)
    if quant_dtype == "int8":
        params = quantized_unet_zeros(unet, x1, t1, c1, v1)
    else:
        params = zeros_params(unet, x1, t1, c1, v1)
    vae = AutoencoderKL(VAEConfig())
    vae_params = zeros_params(vae, jnp.zeros((1, 64, 64, 3), jnp.bfloat16))

    sigmas = EDM.EDMDiscretization(0.002, 700.0, 7.0)(steps)
    ctx = jax.random.normal(jax.random.key(1), (frames, 1, 1024), jnp.bfloat16)
    vector = jax.random.normal(jax.random.key(2), (frames, 768), jnp.float32)
    concat = jax.random.normal(jax.random.key(3), (frames, h, w, 4),
                               jnp.float32)

    dc_branch = int(os.environ.get("BENCH_DC_BRANCH", "1"))

    @jax.jit
    def generate(params, vae_params, ctx, vector, concat, key):
        def network(xx, c_noise, cond, **uk):
            xin = jnp.concatenate([xx, cond["concat"].astype(xx.dtype)],
                                  axis=-1)
            return unet.apply(params, xin, c_noise, cond["crossattn"],
                              cond["vector"], **uk)

        def denoiser(xx, sigma, cond, **uk):
            sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32),
                                     (xx.shape[0],))
            s = sigma.reshape(-1, 1, 1, 1)
            c_skip = 1.0 / (s**2 + 1.0)
            c_out = -s / jnp.sqrt(s**2 + 1.0)
            c_in = 1.0 / jnp.sqrt(s**2 + 1.0)
            v = network(xx * c_in, 0.25 * jnp.log(sigma), cond, **uk)
            aux = None
            if isinstance(v, tuple):  # deep-cache capture aux
                v, aux = v
            den = v.astype(jnp.float32) * c_out + xx * c_skip
            return den if aux is None else (den, aux)

        c = {"crossattn": ctx, "vector": vector, "concat": concat}
        uc = {"crossattn": jnp.zeros_like(ctx), "vector": vector,
              "concat": jnp.zeros_like(concat)}
        denoise = EDM.linear_prediction_guider(
            denoiser, c, uc, scale=2.5, num_frames=frames,
            min_scale=1.0, max_scale=2.5)
        x = jax.random.normal(key, (frames, h, w, 4), jnp.float32)
        if deep_cache >= 2:
            sig = np.asarray(sigmas, np.float64)
            x0 = x.astype(jnp.float32) * float(np.sqrt(1.0 + sig[0] ** 2))
            den_cap = lambda xx, ss: denoise(
                xx, ss, mode="capture", cache_levels=dc_branch)
            den_sh = lambda xx, ss, deep: denoise(
                xx, ss, mode="shallow", cache_levels=dc_branch, deep=deep)
            _, dsd = jax.eval_shape(den_cap, x0,
                                    jnp.asarray(1.0, jnp.float32))
            carry = DCmod.make_dc_denoise(den_cap, den_sh, deep_cache)
            lat = DCmod.sample_euler_dc(
                carry, jnp.zeros(dsd.shape, dsd.dtype), x0, sig, key=key)
        else:
            lat = EDM.run_sgm_sampler("EulerEDMSampler", denoise,
                                      x * float(sigmas[0]), sigmas, key=key)

        # decode one frame per step (lax.map) — batch-14 1024x576 decode
        # would hold multi-GB activations
        def decode_one(z):
            img = decode_from_latent(vae, vae_params,
                                     z[None].astype(jnp.bfloat16))
            return jnp.clip((img[0].astype(jnp.float32) + 1.0) * 127.5 + 0.5,
                            0, 255).astype(jnp.uint8)

        return jax.lax.map(decode_one, lat)

    np.asarray(generate(params, vae_params, ctx, vector, concat,
                        jax.random.key(0)))
    n_rounds = int(os.environ.get("BENCH_ROUNDS_SVD", "1"))
    dt = timed_rounds(
        lambda i: generate(params, vae_params, ctx, vector, concat,
                           jax.random.key(i + 1)), n_rounds)

    tag = "_int8" if quant_dtype == "int8" else ""
    if deep_cache >= 2:
        tag += f"_deepcache{deep_cache}"
    if tome > 0:
        tag += f"_tome{int(tome * 100)}"
    _emit(f"svd_img2vid_576x1024_14frame_25step{tag}_frames_per_sec_per_chip",
          frames * n_rounds / dt, "frames/s", FLUX_4090_ANCHOR)


def bench_flux(quant_dtype="float8_e4m3", tome=0.0, deep_cache=0):
    """FLUX.1-schnell 1024^2 4-step txt2img with 8-bit transformer
    weights — the ONLY lane with a direct published reference number:
    the reference runs this exact model qfloat8-quantized at ~0.125
    img/s on an RTX 4090 (ug_flux.md:14-15, txt2img.py:56-68); here the
    12B transformer is stored float8_e4m3 + per-channel scales
    (io/quantize.py), which is also what fits it into 16 GB HBM.

    quant_dtype="int8" selects the w8a8 path instead (dynamic
    per-token activation quantization + s8 x s8 -> s32 MXU dots,
    models/layers.py Dense) — the 'flux_int8' lane.  MEASURED (v5e,
    round 3): 0.4959 img/s vs 0.3956 fp8 (+25%; the lane is
    matmul-bound and the big FLUX shapes hit ~200 TOP/s int8 vs
    ~130 TF/s bf16, tools/bench_int8.py), so flux_int8 is in the
    default lane set; fp8 weight-only stays the parity-grade product
    default (it is the reference's exact quanto-qfloat8 recipe)."""
    from cremage_tpu.io.quantize import quantized_zeros
    from cremage_tpu.models.flux import (
        FluxModel, flux_schnell_config, make_position_ids, pack_latents,
        unpack_latents,
    )
    from cremage_tpu.models.vae import (
        AutoencoderKL, decode_from_latent, flux_vae_config,
    )
    from cremage_tpu.samplers import flow as F

    # batch sweep (v5e, round 3): batch 2 = 0.3837 vs batch 1 = 0.3956
    # img/s — the 4096-token graph already saturates the chip, and the
    # reference anchor is single-image latency anyway; keep 1
    batch = int(os.environ.get("BENCH_BATCH_FLUX", "1"))
    steps = int(os.environ.get("BENCH_STEPS_FLUX", "4"))  # schnell default
    txt_len = 512    # diffusers FluxPipeline max_sequence_length default
    h = w = 128      # 1024/8 latents; packed 2x2 -> 64x64 = 4096 tokens
    hp = wp = h // 2

    cfg = flux_schnell_config()
    if tome > 0:
        # DiT ToMe: ONE merge for the whole block stack (ops/tome.py) —
        # every per-token matmul (attention + MLPs) runs on the
        # int(N*(1-r)) reduced stream
        import dataclasses as _dc

        cfg = _dc.replace(cfg, tome_ratio=float(tome))
    model = FluxModel(cfg)
    txt_ids, img_ids = make_position_ids(hp, wp, txt_len)
    shapes = jax.eval_shape(
        lambda rng: model.init(
            rng, jnp.zeros((1, 16, 64), jnp.bfloat16),
            jnp.zeros((1, 8, 4096), jnp.bfloat16), jnp.zeros((1,)),
            jnp.zeros((1, 768)), img_ids[:16], txt_ids[:8], None),
        jax.random.key(0))
    # 12B 8-bit kernels + fp32 scales/norms/biases (~12.3 GB total);
    # the fp32 tree would be 48 GB and never exists; one jitted program
    # builds the whole tree (see zeros_params)
    params = jax.jit(lambda: quantized_zeros(shapes, dtype=quant_dtype))()

    vae = AutoencoderKL(flux_vae_config())
    vae_params = zeros_params(vae, jnp.zeros((1, 256, 256, 3), jnp.bfloat16))

    sigmas = F.flow_sigmas(steps)
    txt = jax.random.normal(jax.random.key(1), (batch, txt_len, 4096),
                            jnp.bfloat16)
    vec = jax.random.normal(jax.random.key(2), (batch, 768), jnp.bfloat16)

    @jax.jit
    def generate(params, vae_params, txt, vec, key):
        lat = jax.random.normal(key, (batch, h, w, 16), jnp.float32)
        x_tokens = pack_latents(lat)

        def v_fn(xx, sigma, **mk):
            t = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32),
                                 (xx.shape[0],))
            return model.apply(params, xx, txt, t, vec, img_ids, txt_ids,
                               None, **mk)

        if deep_cache >= 2:
            from cremage_tpu.samplers import deepcache as DC

            v_cap = lambda xx, ss: v_fn(xx, ss, mode="capture")
            v_sh = lambda xx, ss, deep: v_fn(xx, ss, mode="shallow",
                                             deep=deep)
            _, deep_sd = jax.eval_shape(
                v_cap, x_tokens, jnp.asarray(1.0, jnp.float32))
            cache0 = jnp.zeros(deep_sd.shape, deep_sd.dtype)
            out = DC.sample_flow_euler_dc(
                DC.make_dc_denoise(v_cap, v_sh, deep_cache), cache0,
                x_tokens, sigmas, key=key)
        else:
            out = F.sample_flow_euler(v_fn, x_tokens, sigmas, key=key)
        lat = unpack_latents(out, h, w)
        img = decode_from_latent(vae, vae_params, lat.astype(jnp.bfloat16))
        return jnp.clip((img.astype(jnp.float32) + 1.0) * 127.5 + 0.5,
                        0, 255).astype(jnp.uint8)

    np.asarray(generate(params, vae_params, txt, vec, jax.random.key(0)))
    n_rounds = int(os.environ.get("BENCH_ROUNDS_FLUX", "2"))
    dt = timed_rounds(
        lambda i: generate(params, vae_params, txt, vec,
                           jax.random.key(i + 1)), n_rounds)

    tag = "int8" if quant_dtype == "int8" else "fp8"
    if tome > 0:
        tag += f"_tome{int(round(tome * 100)):02d}"
    if deep_cache >= 2:
        tag += f"_deepcache{deep_cache}"
    _emit(f"flux_schnell_txt2img_1024_4step_{tag}_images_per_sec_per_chip",
          batch * n_rounds / dt, "images/s", FLUX_4090_ANCHOR)


def bench_sd15_e2e():
    """End-to-end PRODUCT path: /v1/generate -> EngineWorker ->
    SD15Pipeline with real CLIP text encoding, sampler-program cache,
    status plumbing, PNG-ready uint8 results — everything a serving
    deployment runs, minus only the one-time checkpoint load (flagship
    configs, host-built params).  Reports wall-clock images/s so the
    pipeline overhead over the kernel-loop lane is a measured number
    (VERDICT r2 item 8)."""
    import base64
    import json as _json
    import queue as _queue

    from cremage_tpu.app.server import ApiServer
    from cremage_tpu.app.worker import EngineWorker
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from cremage_tpu.models.unet import UNetModel, sd15_unet_config
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from cremage_tpu.pipelines.conditioning import TextEncoder
    from cremage_tpu.pipelines.sd15 import SD15Bundle, SD15Pipeline
    from cremage_tpu.prompt.tokenizer import default_tokenizer
    from cremage_tpu.samplers import schedules as S

    batch = int(os.environ.get("BENCH_BATCH", "4"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))

    unet = UNetModel(sd15_unet_config())
    params = zeros_params(
        unet, jnp.zeros((1, 64, 64, 4), jnp.bfloat16), jnp.zeros((1,)),
        jnp.zeros((1, 77, 768), jnp.bfloat16))
    vae = AutoencoderKL(VAEConfig())
    vae_params = zeros_params(vae, jnp.zeros((1, 64, 64, 3), jnp.bfloat16))
    clip = CLIPTextModel(CLIPTextConfig())
    clip_params = zeros_params(clip, jnp.zeros((1, 77), jnp.int32))
    bundle = SD15Bundle(
        unet=unet, unet_params=params,
        text=TextEncoder(clip, clip_params, default_tokenizer()),
        vae=vae, vae_params=vae_params, schedule=S.default_sd_schedule())
    pipe = SD15Pipeline(bundle)

    worker = EngineWorker()

    def factory():
        def generate(p, status_cb, result_cb):
            opts = GenerationOptions.from_dict(p)
            pipe.generate(opts, status_cb=status_cb, result_cb=result_cb)
        return generate

    worker.register_backend("SD 1.5", factory)
    srv = ApiServer(worker=worker, port=0)
    srv.start()
    try:
        import urllib.parse
        import urllib.request

        url = f"http://127.0.0.1:{srv.port}"

        # "inline" posts b64 PNGs through /v1/status (lane definition of
        # rounds 2-4); "path" is the browser client's default since r5 —
        # the status channel carries file references and the client
        # pulls binary PNGs over GET (still billed here)
        delivery = os.environ.get("BENCH_E2E_DELIVERY", "inline")

        def submit(seed):
            body = _json.dumps({
                "generator_model_type": "SD 1.5",
                "mode": "text_to_image",
                "parameters": {
                    "prompt": "a photograph of an astronaut riding a horse",
                    "negative_prompt": "blurry, low quality",
                    "H": 512, "W": 512, "sampling_steps": steps,
                    "sampler": "Euler A", "seed": seed,
                    "n_samples": batch, "n_iter": 1,
                    "safety_check": False, "watermark": False,
                    "result_delivery": delivery,
                },
            }).encode()
            req = urllib.request.Request(
                url + "/v1/generate", data=body, method="POST",
                headers={"Content-Type": "application/json"})
            urllib.request.urlopen(req, timeout=30).read()

        def drain(n_jobs):
            """Poll until n_jobs job_done messages; count images and
            fetch path-delivered PNG bytes so transport is billed."""
            n_imgs, done = 0, 0
            end = time.time() + 1800
            while done < n_jobs and time.time() < end:
                msgs = _json.loads(urllib.request.urlopen(
                    url + "/v1/status", timeout=60).read())["messages"]
                for m in msgs:
                    if not isinstance(m, dict):
                        continue
                    if "image_b64" in m:
                        n_imgs += 1
                    elif "image_path" in m:
                        urllib.request.urlopen(
                            url + "/v1/images/file?path="
                            + urllib.parse.quote(m["image_path"]),
                            timeout=60).read()
                        n_imgs += 1
                    if "job_done" in m:
                        assert m["job_done"]["ok"], m["job_done"]
                        done += 1
                if not msgs:
                    time.sleep(0.05)
            return n_imgs

        submit(0)                 # warmup: compiles the sampler program
        assert drain(1) == batch
        n_rounds = int(os.environ.get("BENCH_ROUNDS", "3"))
        # all jobs queued up-front, as a loaded serving deployment sees
        # them: the worker samples job N+1 while job N's images encode
        # on the off-thread pool and transport to the client
        t0 = time.perf_counter()
        for i in range(n_rounds):
            submit(i + 1)
        total = drain(n_rounds)
        dt = time.perf_counter() - t0
        name = ("sd15_e2e_images_per_sec" if delivery == "inline"
                else "sd15_e2e_path_images_per_sec")
        _emit(name, total / dt, "images/s", FLUX_4090_ANCHOR)
    finally:
        srv.stop()


def bench_sd15_e2e_path():
    """The e2e lane under the browser client's default path delivery
    (binary GET transport instead of b64-in-JSON)."""
    os.environ["BENCH_E2E_DELIVERY"] = "path"
    bench_sd15_e2e()


LANES = {"sd15": bench_sd15, "sdxl": bench_sdxl, "svd": bench_svd,
         "flux": bench_flux, "sd15_e2e": bench_sd15_e2e,
         "sd15_e2e_path": bench_sd15_e2e_path,
         # w8a8 lanes (quality grade is weight+activation 8-bit).
         # flux_int8 is in the default set (+25% measured, see
         # bench_flux); the UNet-family int8 lanes measured at-or-below
         # their bf16 floors (see quantized_unet_zeros) and stay opt-in.
         "flux_int8": lambda: bench_flux(quant_dtype="int8"),
         "sd15_int8": lambda: bench_sd15(quant_dtype="int8"),
         "sdxl_int8": lambda: bench_sdxl(quant_dtype="int8"),
         "svd_int8": lambda: bench_svd(quant_dtype="int8"),
         # DeepCache lanes (quality grade: approximate — full UNet every
         # 2nd step, shallow levels recomputed in between; interval=1 is
         # bit-exact and is what the plain lanes measure).
         "sd15_dc": lambda: bench_sd15(deep_cache=int(
             os.environ.get("BENCH_DC_INTERVAL", "2"))),
         "sdxl_dc": lambda: bench_sdxl(deep_cache=int(
             os.environ.get("BENCH_DC_INTERVAL", "2"))),
         "svd_dc": lambda: bench_svd(deep_cache=int(
             os.environ.get("BENCH_DC_INTERVAL", "2"))),
         # ToMe lanes (quality grade: approximate — int(N*r) latent
         # tokens merged before each highest-res self-attention,
         # ops/tome.py; ratio 0.5 is the ToMeSD paper's near-lossless
         # setting). _dc_tome stacks both approximations.
         "sd15_tome": lambda: bench_sd15(tome=float(
             os.environ.get("BENCH_TOME_RATIO", "0.5"))),
         "sdxl_tome": lambda: bench_sdxl(tome=float(
             os.environ.get("BENCH_TOME_RATIO", "0.5"))),
         "sd15_dc_tome": lambda: bench_sd15(
             deep_cache=int(os.environ.get("BENCH_DC_INTERVAL", "2")),
             tome=float(os.environ.get("BENCH_TOME_RATIO", "0.5"))),
         "sdxl_dc_tome": lambda: bench_sdxl(
             deep_cache=int(os.environ.get("BENCH_DC_INTERVAL", "2")),
             tome=float(os.environ.get("BENCH_TOME_RATIO", "0.5"))),
         "svd_tome": lambda: bench_svd(tome=float(
             os.environ.get("BENCH_TOME_RATIO", "0.5"))),
         "svd_dc_tome": lambda: bench_svd(
             deep_cache=int(os.environ.get("BENCH_DC_INTERVAL", "2")),
             tome=float(os.environ.get("BENCH_TOME_RATIO", "0.5"))),
         # DiT ToMe lanes (quality grade: approximate — one merge for
         # the whole block stack, ops/tome.py; excludes deep_cache by
         # design there).  MEASURED (v5e, round 3, ratio 0.5):
         # flux fp8+tome 0.7497 img/s (= 6.0x the reference's published
         # 0.125 on a 4090), int8+tome 0.8953 (= 7.2x) — vs 0.3956 /
         # 0.4959 unmerged.  Both in the default lane set.
         # Guidance-interval lanes (quality grade: the paper argues the
         # limited interval IMPROVES FID — Kynkäänniemi et al. 2024;
         # sigma window from BENCH_CFGI, default [0.28, 5.42]; the
         # uncond half of the batch is skipped outside it).  MEASURED
         # (v5e, round 3): sd15 2.93->3.18 img/s, +tome 3.63; sdxl
         # 0.286->0.315, +tome 0.326.  Composes with ToMe AND DeepCache
         # (windowed carry denoiser): the full three-way stacks measure
         # sd15 4.336 img/s / sdxl 0.548 img/s (both in the default
         # lane set).
         "sd15_cfgi": lambda: bench_sd15(cfgi=_cfgi_env()),
         "sdxl_cfgi": lambda: bench_sdxl(cfgi=_cfgi_env()),
         "sd15_cfgi_tome": lambda: bench_sd15(
             cfgi=_cfgi_env(),
             tome=float(os.environ.get("BENCH_TOME_RATIO", "0.5"))),
         "sdxl_cfgi_tome": lambda: bench_sdxl(
             cfgi=_cfgi_env(),
             tome=float(os.environ.get("BENCH_TOME_RATIO", "0.5"))),
         "sd15_dc_tome_cfgi": lambda: bench_sd15(
             deep_cache=int(os.environ.get("BENCH_DC_INTERVAL", "2")),
             tome=float(os.environ.get("BENCH_TOME_RATIO", "0.5")),
             cfgi=_cfgi_env()),
         "sdxl_dc_tome_cfgi": lambda: bench_sdxl(
             deep_cache=int(os.environ.get("BENCH_DC_INTERVAL", "2")),
             tome=float(os.environ.get("BENCH_TOME_RATIO", "0.5")),
             cfgi=_cfgi_env()),
         "flux_tome": lambda: bench_flux(tome=float(
             os.environ.get("BENCH_TOME_RATIO", "0.5"))),
         "flux_int8_tome": lambda: bench_flux(
             quant_dtype="int8",
             tome=float(os.environ.get("BENCH_TOME_RATIO", "0.5"))),
         # opt-in: DC on a 4-step schnell schedule is an aggressive
         # quality trade (half the steps go shallow); measured for the
         # ceiling, not in the default set.  MEASURED (v5e, round 3):
         # 1.5991 img/s = 12.8x the reference's published 0.125
         "flux_int8_tome_dc": lambda: bench_flux(
             quant_dtype="int8",
             tome=float(os.environ.get("BENCH_TOME_RATIO", "0.5")),
             deep_cache=int(os.environ.get("BENCH_DC_INTERVAL", "2")))}


def main() -> int:
    # Default lanes in PRIORITY order: the driver-metric exact lanes
    # first (sd15/sdxl/svd + BOTH flux headlines), then the approximate
    # headline stacks, then the rest.  BENCH_BUDGET_S (default 1200 s —
    # sized to the driver's observed wall-clock window; the r03 run at
    # 2400 s was killed rc=124 mid lane 3) stops launching new lanes
    # once the budget is spent, and BENCH_LANE_TIMEOUT_S (default 900 s)
    # bounds any single lane so one pathological compile can never eat
    # the whole window.  Every lane subprocess runs with the persistent
    # XLA compilation cache (core/cache.py — measured 39.6 s -> 1.6 s
    # across processes on the axon tunnel), so a warm run completes the
    # full default set well inside the budget; only a fully cold cache
    # risks hitting the lane timeout, and then only for the slowest
    # compile.
    lanes = os.environ.get("BENCH_LANES",
                           os.environ.get(
                               "BENCH_MODEL",
                               "sd15,sdxl,svd,flux,flux_int8,"
                               "sd15_dc_tome_cfgi,sdxl_dc_tome_cfgi,"
                               "svd_dc_tome,flux_int8_tome,"
                               "sd15_e2e,sd15_e2e_path,sd15_dc_tome,"
                               "sdxl_dc,sd15_dc,svd_dc,flux_tome"))
    names = [s.strip().lower() for s in lanes.split(",") if s.strip()]
    if len(names) == 1:
        from cremage_tpu.core.cache import enable_compilation_cache

        enable_compilation_cache()
        try:
            LANES[names[0]]()
        except Exception:
            traceback.print_exc()
            return 1          # a crashed lane must NOT look like success
        return 0
    # one subprocess per lane: each model's params fill most of HBM, so
    # lanes must start from a clean device (and a crashing lane must not
    # take down the rest)
    import subprocess
    import sys

    budget = float(os.environ.get("BENCH_BUDGET_S", "1200"))
    lane_timeout = float(os.environ.get("BENCH_LANE_TIMEOUT_S", "900"))
    t0 = time.time()
    rc = 0
    # Each lane's stdout is CAPTURED and its metric JSON lines are
    # re-printed in one compact block as the very last output of the
    # run: the driver records only the tail of this process's output,
    # and for three consecutive rounds the exact driver-metric lanes
    # (printed early, as they finished) scrolled out of that tail
    # behind later lanes and per-subprocess warnings.  The final block
    # IS the artifact; the live per-lane prints are just progress.
    metric_lines = []
    skipped = []
    lanes_done = 0
    for i, name in enumerate(names):
        if i and time.time() - t0 > budget:
            print("bench: budget %.0fs spent, skipping lanes: %s"
                  % (budget, ",".join(names[i:])), file=sys.stderr)
            skipped.extend(names[i:])
            break
        env = dict(os.environ, BENCH_LANES=name)
        out = ""
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, timeout=lane_timeout,
                               capture_output=True, text=True)
            out = r.stdout or ""
            rc = rc or r.returncode
            if r.returncode and r.stderr:
                # surface the failing lane's traceback tail
                print("\n".join(r.stderr.splitlines()[-12:]),
                      file=sys.stderr)
        except subprocess.TimeoutExpired as e:
            # a timed-out lane is reported and skipped, NOT a run
            # failure: the artifact must keep the lanes already printed
            # and go on to the remaining ones
            print("bench: lane %s exceeded %.0fs, killed; continuing"
                  % (name, lane_timeout), file=sys.stderr)
            if e.stdout:
                out = e.stdout if isinstance(e.stdout, str) \
                    else e.stdout.decode("utf-8", "replace")
            skipped.append(name)
        lane_metrics = [ln for ln in out.splitlines()
                        if ln.startswith('{"metric"')]
        metric_lines.extend(lane_metrics)
        for ln in lane_metrics:          # live progress print
            print(ln, flush=True)
        if lane_metrics:
            lanes_done += 1
        elif name not in skipped:
            skipped.append(name)
    print("bench: ==== summary (all lanes, this run) ====", flush=True)
    for ln in metric_lines:
        print(ln, flush=True)
    print(json.dumps({"lanes_run": lanes_done,
                      "skipped": skipped,
                      "elapsed_s": round(time.time() - t0, 1)}),
          flush=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
