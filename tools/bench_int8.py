#!/usr/bin/env python
"""Probe the v5e int8 MXU path: does XLA emit native int8 matmuls
(394 TOPS peak, 2x bf16) for lax.dot_general with s8 inputs and an
s32 accumulator?  Times FLUX/SDXL hot matmul shapes, int8 vs bf16.

Chained-fori differential timing (tunnel adds ~30 ms/dispatch; see
memory tpu-tunnel-profiling).
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, jax.lax as lax
from cremage_tpu.core.cache import enable_compilation_cache

REPS = int(os.environ.get("PROF_REPS", "30"))

# (M, K, N): FLUX qkv/proj @ 1024^2 (seq 4608), FLUX MLP up, FLUX MLP down,
# SDXL mid-block attn dots batch2+cfg, SD15 ff
SHAPES = [
    (4608, 3072, 3072),
    (4608, 3072, 12288),
    (4608, 12288, 3072),
    (4096, 1280, 5120),
    (16384, 640, 2560),
]


def chained_bf16(m, k, n):
    def run(a, b):
        def body(i, a):
            o = lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            return o[:, :k].astype(jnp.bfloat16) if n >= k else jnp.pad(
                o, ((0, 0), (0, k - n))).astype(jnp.bfloat16)
        return jnp.mean(lax.fori_loop(0, REPS, body, a).astype(jnp.float32))
    return jax.jit(run)


def chained_int8(m, k, n):
    def run(a, b):
        def body(i, a):
            o = lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            o8 = (o >> 8).astype(jnp.int8)
            return o8[:, :k] if n >= k else jnp.pad(o8, ((0, 0), (0, k - n)))
        return jnp.sum(lax.fori_loop(0, REPS, body, a).astype(jnp.int32))
    return jax.jit(run)


def chained_int8_bf16out(m, k, n):
    """int8 x int8 -> s32 -> scale to bf16 (the real inference epilogue),
    then requantize for the chain."""
    def run(a, b, scale):
        def body(i, a):
            o = lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            f = o.astype(jnp.bfloat16) * scale
            o8 = f.astype(jnp.int8)
            return o8[:, :k] if n >= k else jnp.pad(o8, ((0, 0), (0, k - n)))
        return jnp.sum(lax.fori_loop(0, REPS, body, a).astype(jnp.int32))
    return jax.jit(run)


def time_fn(fn, *args):
    np.asarray(fn(*args))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def main():
    enable_compilation_cache()
    key = jax.random.key(0)
    for m, k, n in SHAPES:
        fl = 2 * m * k * n
        ab = jax.random.normal(key, (m, k), jnp.bfloat16)
        bb = jax.random.normal(jax.random.key(1), (k, n), jnp.bfloat16)
        t = time_fn(chained_bf16(m, k, n), ab, bb)
        print(f"M{m} K{k} N{n} bf16:      {t*1e3:7.3f} ms  "
              f"{fl/t/1e12:6.1f} TF/s", flush=True)
        ai = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
        bi = jax.random.randint(jax.random.key(1), (k, n), -127, 127,
                                jnp.int8)
        t = time_fn(chained_int8(m, k, n), ai, bi)
        print(f"M{m} K{k} N{n} int8:      {t*1e3:7.3f} ms  "
              f"{fl/t/1e12:6.1f} TOP/s", flush=True)
        sc = jnp.full((n,), 0.01, jnp.bfloat16)
        t = time_fn(chained_int8_bf16out(m, k, n), ai, bi, sc)
        print(f"M{m} K{k} N{n} int8+deq:  {t*1e3:7.3f} ms  "
              f"{fl/t/1e12:6.1f} TOP/s", flush=True)


if __name__ == "__main__":
    main()
