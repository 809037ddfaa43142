#!/usr/bin/env python
"""Dispatch-free microbenchmarks: every op is iterated REPS times inside
one jitted program (chained on data), so the axon tunnel's ~30 ms
per-dispatch latency is amortized away. Prints achieved TF/s / GB/s.

CAVEAT: even chained, the fixed dispatch cost is divided by REPS — for
sub-ms ops prefer differential timing ((T(2N) - T(N)) / N) or the xprof
op-stats route in tools/profile_ablate.py, which is the ground truth."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.lax as lax
import jax.numpy as jnp

from cremage_tpu.core.cache import enable_compilation_cache

REPS = int(os.environ.get("PROF_REPS", "20"))


def timeit_once(fn, *args):
    r = fn(*args)
    np.asarray(r)          # compile+warm
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return (time.perf_counter() - t0) / REPS


def report(name, secs, flops=0, bytes_=0):
    tf = flops / secs / 1e12 if flops else 0
    gb = bytes_ / secs / 1e9 if bytes_ else 0
    print(f"{name:46s} {secs * 1e3:8.3f} ms  {tf:6.1f} TF/s {gb:7.1f} GB/s",
          flush=True)


def chained(op):
    """Run op REPS times inside one jit, data-dependent chaining."""
    def run(x, *rest):
        def body(i, x):
            return op(x, *rest)
        return jnp.mean(lax.fori_loop(0, REPS, body, x).astype(jnp.float32))
    return jax.jit(run)


def main():
    enable_compilation_cache()
    key = jax.random.key(0)
    B = 8

    # matmul ceiling (square, out dims == in dims so it chains)
    a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    b = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    f = chained(lambda x, w: jnp.dot(
        x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    report("matmul 4096^3 bf16", timeit_once(f, a, b),
           flops=2 * 4096**3)

    def conv_op(pad_same=True):
        def op(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return op

    for (hw, c) in [(64, 320), (32, 640), (16, 1280), (8, 1280),
                    (64, 512), (128, 128), (256, 128), (512, 128),
                    (128, 256), (256, 256)]:
        x = jax.random.normal(key, (B, hw, hw, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16)
        fl = 2 * B * hw * hw * c * 9 * c
        report(f"conv {hw}x{hw}x{c}->{c} 3x3 b{B}",
               timeit_once(chained(conv_op()), x, w), flops=fl)

    # GroupNorm+SiLU
    from cremage_tpu.ops.groupnorm import group_norm_silu

    for (hw, c) in [(64, 320), (32, 640), (16, 1280)]:
        x = jax.random.normal(key, (B, hw, hw, c), jnp.bfloat16)
        w = jnp.ones((c,), jnp.float32)
        bb = jnp.zeros((c,), jnp.float32)
        g = chained(lambda x, w, bb: group_norm_silu(x, w, bb, 32))
        by = 2 * B * hw * hw * c * 2
        report(f"gn+silu {hw}x{hw}x{c} b{B}", timeit_once(g, x, w, bb),
               bytes_=by)

    # attention
    from cremage_tpu.ops.attention import dot_product_attention_xla
    from cremage_tpu.ops.flash_attention import flash_attention

    for (n, h, d) in [(4096, 8, 40), (1024, 8, 80), (4096, 10, 64),
                      (256, 8, 160), (77, 8, 40)]:
        q = jax.random.normal(key, (B, n, h, d), jnp.bfloat16)
        fl = 2 * 2 * B * h * n * n * d
        fx = chained(lambda q: dot_product_attention_xla(q, q, q))
        report(f"attn XLA n{n} h{h} d{d} b{B}", timeit_once(fx, q), flops=fl)
        if n >= 1024:
            fp = chained(lambda q: flash_attention(q, q, q))
            report(f"attn flash n{n} h{h} d{d} b{B}", timeit_once(fp, q),
                   flops=fl)

    # VAE decoder stages at 512^2 output (batch 4): resnet at each
    # resolution + the upsample resize
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig

    def resize_op(x):
        bsz, hh, ww, c = x.shape
        y = jax.image.resize(x, (bsz, hh * 2, ww * 2, c), "nearest")
        return y[:, ::2, ::2, :]   # chainable (same shape)

    for (hw, c) in [(64, 512), (128, 512), (256, 256), (512, 128)]:
        x = jax.random.normal(key, (4, hw, hw, c), jnp.bfloat16)
        report(f"vae resize x2 {hw}x{hw}x{c} b4",
               timeit_once(chained(resize_op), x),
               bytes_=4 * hw * hw * c * 2 * 5)

    # full VAE decode (single dispatch, REPS=1 semantics)
    from cremage_tpu.models.vae import decode_from_latent
    vae = AutoencoderKL(VAEConfig())
    vshapes = jax.eval_shape(vae.init, jax.random.key(0),
                             jnp.zeros((1, 64, 64, 3), jnp.bfloat16))
    pd = os.environ.get("PROF_PARAM_DTYPE", "bf16")
    vparams = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16
                            if (pd == "bf16" and s.dtype == jnp.float32)
                            else s.dtype), vshapes)
    lat = jax.random.normal(key, (4, 64, 64, 4), jnp.bfloat16)
    vfn = jax.jit(lambda p, l: jnp.mean(
        decode_from_latent(vae, p, l).astype(jnp.float32)))
    np.asarray(vfn(vparams, lat))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(vfn(vparams, lat))
    report(f"VAE decode 4x512 (params {pd})", (time.perf_counter() - t0) / 3,
           flops=4 * 316e9)


if __name__ == "__main__":
    main()
