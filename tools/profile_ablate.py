#!/usr/bin/env python
"""Differential (ablation) profiling of the SD1.5 UNet step on device.

The axon tunnel has a ~30 ms fixed per-dispatch overhead, so per-op
microbenchmarks lie. Instead: run N chained UNet evals inside ONE
program, then re-run with one component ablated (GroupNorm -> SiLU only,
attention -> identity, transformers -> identity) and attribute the time
difference. Ablation via monkeypatching the op entry points before
trace."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.lax as lax
import jax.numpy as jnp

from cremage_tpu.core.cache import enable_compilation_cache

REPS = int(os.environ.get("PROF_REPS", "10"))
B = 8


def build(unet, params):
    x = jax.random.normal(jax.random.key(0), (B, 64, 64, 4), jnp.bfloat16)
    t = jnp.full((B,), 500.0)
    ctx = jax.random.normal(jax.random.key(1), (B, 77, 768), jnp.bfloat16)

    def run(params, x):
        def body(i, x):
            out = unet.apply(params, x, t, ctx)
            return (x + 0.01 * out.astype(x.dtype))  # chain
        return jnp.mean(lax.fori_loop(0, REPS, body, x).astype(jnp.float32))

    fn = jax.jit(run)
    np.asarray(fn(params, x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(params, x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    enable_compilation_cache()
    from cremage_tpu.models.unet import UNetModel, sd15_unet_config
    from cremage_tpu.ops import attention as A
    from cremage_tpu.ops import groupnorm as G
    import cremage_tpu.models.unet as U

    unet = UNetModel(sd15_unet_config())
    shapes = jax.eval_shape(
        unet.init, jax.random.key(0), jnp.zeros((1, 64, 64, 4), jnp.bfloat16),
        jnp.zeros((1,)), jnp.zeros((1, 77, 768), jnp.bfloat16))
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape,
                            jnp.bfloat16 if s.dtype == jnp.float32
                            else s.dtype), shapes)

    results = {}
    t_full = build(unet, params)
    results["full"] = t_full
    print(f"full          {t_full / REPS * 1e3:8.2f} ms/eval", flush=True)

    # ablate GroupNorm (affine+silu only, no stats)
    orig_gn = G.group_norm_silu

    def gn_off(x, w, b, groups=32, eps=1e-5, silu=True, force_pallas=False):
        y = x.astype(jnp.float32) * w + b
        if silu:
            y = y * jax.nn.sigmoid(y)
        return y.astype(x.dtype)

    G.group_norm_silu = gn_off
    t = build(unet, params)
    G.group_norm_silu = orig_gn
    results["no_gn_stats"] = t
    print(f"gn->affine    {t / REPS * 1e3:8.2f} ms/eval "
          f"(gn stats cost {(t_full - t) / REPS * 1e3:+.2f})", flush=True)

    # ablate attention (zeros shaped like q)
    orig_attn = U.attention
    U.attention = lambda q, k, v, **kw: jnp.zeros_like(q)
    t = build(unet, params)
    U.attention = orig_attn
    results["no_attn"] = t
    print(f"attn->0       {t / REPS * 1e3:8.2f} ms/eval "
          f"(attention cost {(t_full - t) / REPS * 1e3:+.2f})", flush=True)

    # ablate the whole SpatialTransformer stack (convs+resnets remain)
    orig_st = U.SpatialTransformer

    class _IdST:
        def __init__(self, *a, **kw):
            self._kw = kw
        def __call__(self, x, ctx):
            return x

    # SpatialTransformer is used as a Module; identity needs a real
    # module to keep param trees aligned — instead reuse full params but
    # skip calls via a flag is invasive. Simpler: ablate ff+attn inside
    # BasicTransformerBlock by zeroing attention AND patching GEGLU off
    # is enough signal; skip this variant.
    del orig_st

    # VAE decode ablations
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig, decode_from_latent

    vae = AutoencoderKL(VAEConfig())
    vs = jax.eval_shape(vae.init, jax.random.key(0),
                        jnp.zeros((1, 64, 64, 3), jnp.bfloat16))
    vp = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if s.dtype == jnp.float32 else s.dtype), vs)
    lat = jax.random.normal(jax.random.key(0), (4, 64, 64, 4), jnp.bfloat16)

    def vae_time():
        fn = jax.jit(lambda p, l: jnp.mean(
            decode_from_latent(vae, p, l).astype(jnp.float32)))
        np.asarray(fn(vp, lat))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(vp, lat))
            best = min(best, time.perf_counter() - t0)
        return best

    t_v = vae_time()
    print(f"vae full      {t_v * 1e3:8.2f} ms", flush=True)
    G.group_norm_silu = gn_off
    t = vae_time()
    G.group_norm_silu = orig_gn
    print(f"vae gn->aff   {t * 1e3:8.2f} ms (gn stats {(t_v - t) * 1e3:+.2f})",
          flush=True)
    import cremage_tpu.models.vae as V
    orig_vattn = V.attention
    V.attention = lambda q, k, v, **kw: jnp.zeros_like(q)
    t = vae_time()
    V.attention = orig_vattn
    print(f"vae attn->0   {t * 1e3:8.2f} ms (attn {(t_v - t) * 1e3:+.2f})",
          flush=True)


if __name__ == "__main__":
    main()
