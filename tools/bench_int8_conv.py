#!/usr/bin/env python
"""Probe int8 convolution on the v5e MXU: does XLA lower
lax.conv_general_dilated with s8 operands + s32 accumulator to the
native int8 MXU path (2x bf16 peak)?  SDXL/SD1.5 are conv-bound
(NOTES_r3: convs 54-64% of those lanes), so a 2x conv rate would move
them where nothing else has.

Chained-fori differential timing; see memory tpu-tunnel-profiling.
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, jax.lax as lax
from cremage_tpu.core.cache import enable_compilation_cache

REPS = int(os.environ.get("PROF_REPS", "30"))

# NHWC (B,H,W,C) x HWIO (3,3,C,O): sd15 512^2 b8 down0, sdxl 1024^2
# b2 down1, sdxl mid
SHAPES = [
    (8, 64, 64, 320, 320),
    (2, 64, 64, 640, 640),
    (2, 32, 32, 1280, 1280),
]
DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def chained(dtype, accum):
    def run(x, w):
        def body(i, x):
            o = lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=accum)
            if dtype == jnp.int8:
                return (o >> 8).astype(jnp.int8)
            return o.astype(dtype)
        r = lax.fori_loop(0, REPS, body, x)
        return jnp.sum(r.astype(jnp.float32))
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
    for b, h, w, c, o in SHAPES:
        fl = 2 * b * h * w * 9 * c * o
        xb = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
        wb = jax.random.normal(jax.random.key(1), (3, 3, c, o),
                               jnp.bfloat16)
        t = time_fn(chained(jnp.bfloat16, jnp.float32), xb, wb)
        print(f"B{b} {h}x{w} C{c}->{o} bf16: {t*1e3:7.3f} ms  "
              f"{fl/t/1e12:6.1f} TF/s", flush=True)
        xi = jax.random.randint(key, (b, h, w, c), -127, 127, jnp.int8)
        wi = jax.random.randint(jax.random.key(1), (3, 3, c, o), -127,
                                127, jnp.int8)
        t = time_fn(chained(jnp.int8, jnp.int32), xi, wi)
        print(f"B{b} {h}x{w} C{c}->{o} int8: {t*1e3:7.3f} ms  "
              f"{fl/t/1e12:6.1f} TOP/s", flush=True)


if __name__ == "__main__":
    main()
