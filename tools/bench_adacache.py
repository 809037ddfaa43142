#!/usr/bin/env python
"""Measure adaptive step caching (samplers/adacache.py) on the real chip.

Three sd15-lane variants at the bench's production config (512² 20-step
Euler A, CFG 7.5, batch 4, VAE decode, zeros bf16 params — bench.py's
sd15 lane exactly):

  plain      — no cache wrapper at all (the exact lane)
  ada0       — ada_cache threshold 0: never skips; measures the
               MACHINERY OVERHEAD of the indicator + lax.cond + carry
               (should be ~free)
  ada_ceiling— threshold 1e9: every unforced step skips (full model at
               step 0 and the last step only); measures the per-run
               FLOOR — sampler scan + 18 skip steps + VAE decode.

The realized speedup for a real checkpoint sits between plain and
ada_ceiling, set by the trajectory's skip rate at the chosen threshold
(data-dependent — that is the point of the feature); these two ends
bound it and prove the machinery costs nothing when it never fires.

Run: python tools/bench_adacache.py   (serialize with other TPU work)

RESULTS (v5e-1, 2026-08-20, BENCH_ROUNDS=3):
  plain        2.898 img/s
  ada0         2.882 img/s   (-0.6% — machinery is noise-level)
  ada_ceiling 19.81  img/s   (6.8x; 18/20 steps skipped, VAE dominates)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(variant):
    import jax
    import jax.numpy as jnp

    from cremage_tpu.models.unet import UNetModel, sd15_unet_config
    from cremage_tpu.models.vae import (AutoencoderKL, VAEConfig,
                                        decode_from_latent)
    from cremage_tpu.samplers import adacache as AC
    from cremage_tpu.samplers import deepcache as DC
    from cremage_tpu.samplers import kdiffusion as K
    from cremage_tpu.samplers import schedules as S
    from cremage_tpu.samplers.denoiser import EpsDenoiser, cfg_denoiser

    batch, steps, h = 4, 20, 64
    unet = UNetModel(sd15_unet_config())
    x1 = jnp.zeros((1, h, h, 4), jnp.bfloat16)
    params = jax.eval_shape(
        lambda: unet.init(jax.random.key(0), x1, jnp.zeros((1,)),
                          jnp.zeros((1, 77, 768), jnp.bfloat16)))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    vae = AutoencoderKL(VAEConfig())
    vp = jax.eval_shape(lambda: vae.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.bfloat16)))
    vp = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), vp)

    sched = S.default_sd_schedule()
    sigmas = sched.get_sigmas(steps)
    c = jax.random.normal(jax.random.key(2), (batch, 77, 768), jnp.bfloat16)
    uc = jnp.zeros_like(c)
    thresh = {"plain": None, "ada0": 0.0, "ada_ceiling": 1e9}[variant]

    @jax.jit
    def generate(params, vp, c, uc, key):
        def eps_model(xx, tt, cc, **uk):
            return unet.apply(params, xx, tt, cc, **uk)

        den = cfg_denoiser(EpsDenoiser(eps_model, sched), c, uc, 7.5)
        x0 = jax.random.normal(key, (batch, h, h, 4), jnp.float32) * \
            float(sigmas[0])
        if thresh is None:
            lat = K.sample_euler_ancestral(den, x0, sigmas, key=key)
        else:
            carry = AC.make_ada_denoise(den, thresh, len(sigmas) - 1,
                                        kind="den")
            lat = DC.sample_euler_ancestral_dc(
                carry, AC.ada_cache0(x0), x0, sigmas, key=key)
        img = decode_from_latent(vae, vp, lat.astype(jnp.bfloat16))
        return jnp.clip((img.astype(jnp.float32) + 1.0) * 127.5 + 0.5,
                        0, 255).astype(jnp.uint8)

    np.asarray(generate(params, vp, c, uc, jax.random.key(0)))  # compile
    n = int(os.environ.get("BENCH_ROUNDS", "3"))
    t0 = time.perf_counter()
    outs = [generate(params, vp, c, uc, jax.random.key(i + 1))
            for i in range(n)]
    for o in outs:
        np.asarray(o)
    dt = time.perf_counter() - t0
    print(f"{variant:12s} {batch * n / dt:7.3f} img/s  ({dt:.2f}s/{n} rounds)")


if __name__ == "__main__":
    import subprocess
    variants = sys.argv[1:] or ["plain", "ada0", "ada_ceiling"]
    if len(variants) == 1:
        run(variants[0])
    else:
        for v in variants:   # subprocess per variant: clean HBM
            subprocess.run([sys.executable, __file__, v], check=True)
