"""Benchmark: SD1.5 512x512 20-step Euler-a txt2img throughput per chip.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline anchor (BASELINE.md): the reference publishes no SD1.5/SDXL
throughput numbers; its best published single-image rate is FLUX on a
4090 at ~0.125 img/s. The driver metric is images/sec/chip; vs_baseline
is computed against 0.125 img/s until a measured CUDA reference lands.

Notes for the axon-tunneled chip: compiles are slow (~30-70s each) and
block_until_ready does not reliably block, so params are built host-side
(no init compile) and timing forces device->host transfers.
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_S = 0.125


def zeros_params(model, *example_args):
    shapes = jax.eval_shape(model.init, jax.random.key(0), *example_args)
    # BENCH_PARAM_DTYPE=bf16 stores weights in bfloat16 (halves weight
    # HBM traffic; norm statistics still compute in fp32 inside the
    # models). Default keeps the template dtype (fp32 master weights).
    if os.environ.get("BENCH_PARAM_DTYPE", "").lower() in ("bf16", "bfloat16"):
        return jax.tree.map(
            lambda s: jnp.zeros(
                s.shape,
                jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
            shapes,
        )
    return jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes,
    )


def bench_sdxl():
    """Optional SDXL 1024^2 lane (BENCH_MODEL=sdxl): 30-step EulerEDM with
    CFG + VAE decode — the BASELINE.json north-star configuration."""
    from cremage_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from cremage_tpu.models.unet import UNetModel, sdxl_base_unet_config
    from cremage_tpu.models.vae import (
        AutoencoderKL, decode_from_latent, sdxl_vae_config,
    )
    from cremage_tpu.samplers import edm as EDM

    batch = int(os.environ.get("BENCH_BATCH", "1"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    h = w = 128  # 1024/8

    unet = UNetModel(sdxl_base_unet_config())
    params = zeros_params(
        unet, jnp.zeros((1, h, w, 4), jnp.bfloat16), jnp.zeros((1,)),
        jnp.zeros((1, 77, 2048), jnp.bfloat16), jnp.zeros((1, 2816)),
    )
    vae = AutoencoderKL(sdxl_vae_config())
    vae_params = zeros_params(vae, jnp.zeros((1, 512, 512, 3), jnp.bfloat16))

    sigmas = EDM.LegacyDDPMDiscretization()(steps)
    c = {"crossattn": jax.random.normal(jax.random.key(1),
                                        (batch, 77, 2048), jnp.bfloat16),
         "vector": jax.random.normal(jax.random.key(2), (batch, 2816),
                                     jnp.bfloat16)}
    uc = jax.tree.map(jnp.zeros_like, c)

    @jax.jit
    def generate(params, vae_params, c, uc, key):
        def network(xx, tt, cond):
            return unet.apply(params, xx, tt, cond["crossattn"],
                              cond["vector"])

        denoiser = EDM.DiscreteDenoiserSGM(
            network, EDM.LegacyDDPMDiscretization()(1000, do_append_zero=False))
        denoise = EDM.vanilla_cfg(denoiser, c, uc, scale=7.0)
        x = jax.random.normal(key, (batch, h, w, 4), jnp.float32)
        lat = EDM.run_sgm_sampler("EulerEDMSampler", denoise, x, sigmas,
                                  key=key)
        img = decode_from_latent(vae, vae_params, lat.astype(jnp.bfloat16))
        # uint8 on device — see the SD1.5 lane note on tunnel transfer
        return jnp.clip((img.astype(jnp.float32) + 1.0) * 127.5 + 0.5,
                        0, 255).astype(jnp.uint8)

    t0 = time.perf_counter()
    np.asarray(generate(params, vae_params, c, uc, jax.random.key(0)))
    compile_s = time.perf_counter() - t0
    n_rounds = int(os.environ.get("BENCH_ROUNDS", "2"))
    t0 = time.perf_counter()
    for i in range(n_rounds):
        np.asarray(generate(params, vae_params, c, uc, jax.random.key(i + 1)))
    dt = time.perf_counter() - t0
    imgs_per_s = batch * n_rounds / dt
    print(json.dumps({
        "metric": "sdxl_txt2img_1024_30step_euler_edm_images_per_sec_per_chip",
        "value": round(imgs_per_s, 4),
        "unit": "images/s",
        "vs_baseline": round(imgs_per_s / BASELINE_IMG_PER_S, 2),
    }))


def main():
    if os.environ.get("BENCH_MODEL", "sd15").lower() == "sdxl":
        return bench_sdxl()
    from cremage_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    from cremage_tpu.models.unet import UNetModel, sd15_unet_config
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig, decode_from_latent
    from cremage_tpu.samplers import kdiffusion as K
    from cremage_tpu.samplers import schedules as S
    from cremage_tpu.samplers.denoiser import EpsDenoiser, cfg_denoiser

    batch = int(os.environ.get("BENCH_BATCH", "4"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    h = w = 64  # 512/8

    unet = UNetModel(sd15_unet_config())
    x1 = jnp.zeros((1, h, w, 4), jnp.bfloat16)
    t1 = jnp.zeros((1,), jnp.float32)
    c1 = jnp.zeros((1, 77, 768), jnp.bfloat16)
    params = zeros_params(unet, x1, t1, c1)

    vae = AutoencoderKL(VAEConfig())
    vae_params = zeros_params(vae, jnp.zeros((1, 64, 64, 3), jnp.bfloat16))

    sched = S.default_sd_schedule()
    sigmas = sched.get_sigmas(steps)

    c = jax.random.normal(jax.random.key(2), (batch, 77, 768), jnp.bfloat16)
    uc = jnp.zeros_like(c)

    # params are jit ARGUMENTS — closing over them would embed ~3.6GB of
    # HLO constants and stall compilation through the device tunnel
    @jax.jit
    def generate(params, vae_params, c, uc, key):
        def eps_model(xx, tt, cc):
            return unet.apply(params, xx, tt, cc)

        denoise = EpsDenoiser(eps_model, sched)
        cfg_fn = cfg_denoiser(denoise, c, uc, scale=7.5)
        x0 = jax.random.normal(key, (batch, h, w, 4), jnp.float32) * float(sigmas[0])
        lat = K.sample_euler_ancestral(cfg_fn, x0, sigmas, key=key)
        img = decode_from_latent(vae, vae_params, lat.astype(jnp.bfloat16))
        # quantize to uint8 ON DEVICE: the serving path ships 8-bit
        # images, and the measured device->host link moves ~23 MB/s, so
        # pulling fp32 pixels would bill ~200 ms/batch of pure transfer
        return jnp.clip((img.astype(jnp.float32) + 1.0) * 127.5 + 0.5,
                        0, 255).astype(jnp.uint8)

    # warmup/compile (force full execution via host transfer)
    t0 = time.perf_counter()
    np.asarray(generate(params, vae_params, c, uc, jax.random.key(0)))
    compile_s = time.perf_counter() - t0

    n_rounds = int(os.environ.get("BENCH_ROUNDS", "3"))
    t0 = time.perf_counter()
    for i in range(n_rounds):
        out = np.asarray(generate(params, vae_params, c, uc, jax.random.key(i + 1)))
    dt = time.perf_counter() - t0

    imgs_per_s = batch * n_rounds / dt
    print(json.dumps({
        "metric": "sd15_txt2img_512_20step_euler_a_images_per_sec_per_chip",
        "value": round(imgs_per_s, 4),
        "unit": "images/s",
        "vs_baseline": round(imgs_per_s / BASELINE_IMG_PER_S, 2),
    }))
    # extra context on stderr-ish (still stdout but second line is ignored
    # by the driver, which reads the first JSON line)


if __name__ == "__main__":
    main()
