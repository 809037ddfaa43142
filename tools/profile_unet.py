#!/usr/bin/env python
"""Per-op device microbenchmarks for the SD1.5 hot path.

Times the dominant shapes (dense matmul ceiling, the 3x3 convs at every
UNet level, GroupNorm+SiLU, flash vs XLA attention, the full UNet eval
and VAE decode) on the real chip and prints achieved TF/s / GB/s per
section, so optimization effort lands where the time actually goes.

Run serialized with other TPU jobs (one client at a time on the axon
tunnel). Timing forces device->host sync via tiny mean() transfers.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from cremage_tpu.core.cache import enable_compilation_cache

ROUNDS = int(os.environ.get("PROF_ROUNDS", "10"))


def timeit(fn, *args):
    # one tiny scalar back per call — sync without big transfers
    r = fn(*args)
    np.asarray(r)  # warmup + compile
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        r = fn(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / ROUNDS


def report(name, secs, flops=0, bytes_=0):
    tf = flops / secs / 1e12 if flops else 0
    gb = bytes_ / secs / 1e9 if bytes_ else 0
    print(f"{name:44s} {secs * 1e3:8.2f} ms   {tf:6.1f} TF/s  {gb:7.1f} GB/s",
          flush=True)


def main():
    enable_compilation_cache()
    key = jax.random.key(0)
    B = int(os.environ.get("PROF_BATCH", "8"))

    # 1. dense matmul ceiling
    a = jax.random.normal(key, (8192, 4096), jnp.bfloat16)
    b = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    f = jax.jit(lambda a, b: jnp.mean(jnp.dot(
        a, b, preferred_element_type=jnp.float32)))
    report("matmul 8192x4096x4096 bf16", timeit(f, a, b),
           flops=2 * 8192 * 4096 * 4096)

    # 2. the level convs (bf16, NHWC/HWIO)
    import jax.lax as lax

    def conv(x, w):
        return jnp.mean(lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32))

    cf = jax.jit(conv)
    for (hw, c_in, c_out) in [(64, 320, 320), (32, 640, 640),
                              (16, 1280, 1280), (8, 1280, 1280),
                              (64, 640, 320), (128, 320, 320)]:
        x = jax.random.normal(key, (B, hw, hw, c_in), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, c_in, c_out), jnp.bfloat16)
        fl = 2 * B * hw * hw * c_out * 9 * c_in
        report(f"conv {hw}x{hw}x{c_in}->{c_out} 3x3 b{B}",
               timeit(cf, x, w), flops=fl)

    # 3. GroupNorm+SiLU (XLA path)
    from cremage_tpu.ops.groupnorm import group_norm_silu

    for (hw, c) in [(64, 320), (32, 640), (16, 1280)]:
        x = jax.random.normal(key, (B, hw, hw, c), jnp.bfloat16)
        w = jnp.ones((c,), jnp.float32)
        bb = jnp.zeros((c,), jnp.float32)
        g = jax.jit(lambda x, w, bb: jnp.mean(
            group_norm_silu(x, w, bb, 32)))
        by = 2 * B * hw * hw * c * 2  # read+write bf16
        report(f"groupnorm+silu {hw}x{hw}x{c} b{B}", timeit(g, x, w, bb),
               bytes_=by)

    # 4. attention: XLA vs flash at level-0/1 shapes
    from cremage_tpu.ops.attention import dot_product_attention_xla
    from cremage_tpu.ops.flash_attention import flash_attention

    for (n, h, d) in [(4096, 8, 40), (1024, 8, 80), (4096, 10, 64)]:
        q = jax.random.normal(key, (B, n, h, d), jnp.bfloat16)
        fx = jax.jit(lambda q: jnp.mean(dot_product_attention_xla(q, q, q)))
        fl = 2 * 2 * B * h * n * n * d
        report(f"attn XLA n{n} h{h} d{d} b{B}", timeit(fx, q), flops=fl)
        fp = jax.jit(lambda q: jnp.mean(flash_attention(q, q, q)))
        report(f"attn flash n{n} h{h} d{d} b{B}", timeit(fp, q), flops=fl)

    # 5. full UNet eval + VAE decode
    from cremage_tpu.models.unet import UNetModel, sd15_unet_config
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig, decode_from_latent

    unet = UNetModel(sd15_unet_config())
    x1 = jnp.zeros((1, 64, 64, 4), jnp.bfloat16)
    t1 = jnp.zeros((1,), jnp.float32)
    c1 = jnp.zeros((1, 77, 768), jnp.bfloat16)
    shapes = jax.eval_shape(unet.init, jax.random.key(0), x1, t1, c1)
    pd = os.environ.get("PROF_PARAM_DTYPE", "bf16")
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if (pd == "bf16" and s.dtype == jnp.float32)
                            else s.dtype), shapes)
    x = jax.random.normal(key, (B, 64, 64, 4), jnp.bfloat16)
    t = jnp.full((B,), 500.0)
    ctx = jax.random.normal(key, (B, 77, 768), jnp.bfloat16)
    ufn = jax.jit(lambda p, x, t, c: jnp.mean(
        unet.apply(p, x, t, c).astype(jnp.float32)))
    # FLOPs from the jaxpr census: 1365 G at batch 2 -> scale by B/2
    report(f"UNet eval b{B} (params {pd})", timeit(ufn, params, x, t, ctx),
           flops=1365e9 * B / 2)

    vae = AutoencoderKL(VAEConfig())
    vshapes = jax.eval_shape(vae.init, jax.random.key(0),
                             jnp.zeros((1, 64, 64, 3), jnp.bfloat16))
    vparams = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), vshapes)
    lat = jax.random.normal(key, (4, 64, 64, 4), jnp.bfloat16)
    vfn = jax.jit(lambda p, l: jnp.mean(
        decode_from_latent(vae, p, l).astype(jnp.float32)))
    report("VAE decode 4x512x512", timeit(vfn, vparams, lat))


if __name__ == "__main__":
    main()
