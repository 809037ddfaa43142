"""Benchmark: SD1.5 512x512 20-step Euler-a txt2img throughput per chip.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline anchor (BASELINE.md): the reference's only published latency
numbers are FLUX on a 4090 (~0.125 img/s best case); the driver metric is
SD1.5/SDXL images/sec/chip. We report SD1.5 512^2 20-step Euler-a
images/sec on one chip; vs_baseline is computed against 0.125 img/s (the
reference's best published single-image rate) until a measured CUDA
reference number is available.
"""
import json
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_S = 0.125


def main():
    from cremage_tpu.models.unet import UNetModel, sd15_unet_config
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig, decode_from_latent
    from cremage_tpu.samplers import kdiffusion as K
    from cremage_tpu.samplers import schedules as S
    from cremage_tpu.samplers.denoiser import EpsDenoiser, cfg_denoiser

    batch = 4
    steps = 20
    h = w = 64  # 512/8

    unet = UNetModel(sd15_unet_config())
    x = jnp.zeros((batch, h, w, 4), jnp.float32)
    t = jnp.zeros((batch,), jnp.float32)
    ctx = jnp.zeros((batch, 77, 768), jnp.bfloat16)
    params = unet.init(jax.random.key(0), x[:1], t[:1], ctx[:1])

    vae = AutoencoderKL(VAEConfig())
    vae_params = vae.init(jax.random.key(1), jnp.zeros((1, 8 * h, 8 * w, 3)))

    sched = S.default_sd_schedule()
    sigmas = sched.get_sigmas(steps)

    def eps_model(xx, tt, cc):
        return unet.apply(params, xx, tt, cc)

    denoise = EpsDenoiser(eps_model, sched)
    c = jax.random.normal(jax.random.key(2), (batch, 77, 768), jnp.bfloat16)
    uc = jnp.zeros_like(c)
    cfg_fn = cfg_denoiser(denoise, c, uc, scale=7.5)

    @jax.jit
    def generate(key):
        x0 = jax.random.normal(key, (batch, h, w, 4), jnp.float32) * float(sigmas[0])
        lat = K.sample_euler_ancestral(cfg_fn, x0, sigmas, key=key)
        img = decode_from_latent(vae, vae_params, lat.astype(jnp.bfloat16))
        return img

    # warmup/compile
    generate(jax.random.key(0)).block_until_ready()

    n_rounds = 3
    t0 = time.perf_counter()
    for i in range(n_rounds):
        generate(jax.random.key(i)).block_until_ready()
    dt = time.perf_counter() - t0

    imgs_per_s = batch * n_rounds / dt
    print(json.dumps({
        "metric": "sd15_txt2img_512_20step_euler_a_images_per_sec_per_chip",
        "value": round(imgs_per_s, 4),
        "unit": "images/s",
        "vs_baseline": round(imgs_per_s / BASELINE_IMG_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
