#!/usr/bin/env python
"""Does fusing GroupNorm-normalize+SiLU into the consuming 3x3 conv's
input slow the conv down? hlo_stats shows in_layers convs at ~94 TF/s vs
~174 for clean convs (SDXL 1024^2 shapes). Compares:
  conv            — conv alone (rate ceiling)
  gn+conv fused   — group_norm_silu -> conv, XLA free to fuse
  gn|barrier|conv — optimization_barrier between them (forces the
                    normalized tensor to materialize; conv runs clean)
Chained REPS times in one jit (tunnel: differential timing only).

RESULT (v5e-1, 2026-08-17): hypothesis refuted — fused == barrier ==
conv-alone within noise at every shape (32^2x1280: 2.05/2.06/2.07 ms;
64^2x1280->640: 2.48/2.50/2.48; 128^2x640->320: 2.80/2.65/2.65;
144^2x640->320 b14: 11.38/11.48/11.48).  The GN+SiLU epilogue is free;
the "94 vs 174 TF/s" spread in the SDXL profile is the conv shapes'
intrinsic rate (low spatial extent / channel ratios), not a fusion
pathology.  No code change warranted.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.lax as lax
import jax.numpy as jnp

from cremage_tpu.core.cache import enable_compilation_cache
from cremage_tpu.ops.groupnorm import group_norm_silu

REPS = int(os.environ.get("PROF_REPS", "20"))


def chained(op):
    def run(x, *rest):
        def body(i, x):
            return op(x, *rest).astype(x.dtype)
        return jnp.mean(lax.fori_loop(0, REPS, body, x).astype(jnp.float32))
    return jax.jit(run)


def timeit(fn, *args):
    np.asarray(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def main():
    enable_compilation_cache()
    key = jax.random.key(0)
    # (hw, cin, cout, b): SDXL/SVD in_layers hot shapes (concat-in convs
    # halve cin back to cout) + a clean square one
    shapes = [(32, 1280, 1280, 2), (64, 1280, 640, 2), (128, 640, 320, 2),
              (72 * 2, 640, 320, 14)]
    for hw, cin, cout, b in shapes:
        hh, ww = (hw, hw) if isinstance(hw, int) else hw
        x = jax.random.normal(key, (b, hh, ww, cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16)
        # chainable only when cin==cout; otherwise re-project with a 1x1
        proj = jax.random.normal(key, (1, 1, cout, cin), jnp.bfloat16)
        gw = jnp.ones((cin,), jnp.float32)
        gb = jnp.zeros((cin,), jnp.float32)

        def back(y):
            return lax.conv_general_dilated(
                y, proj, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        fl = 2 * b * hh * ww * cin * 9 * cout

        t = timeit(chained(lambda x, w: back(conv(x, w))), x, w)
        print(f"{hh}x{ww}x{cin}->{cout} b{b}  conv alone      "
              f"{t * 1e3:7.3f} ms {fl / t / 1e12:6.1f} TF/s", flush=True)

        t = timeit(chained(
            lambda x, w, gw, gb: back(conv(
                group_norm_silu(x, gw, gb, 32), w))), x, w, gw, gb)
        print(f"{'':>22s} gn+conv fused   {t * 1e3:7.3f} ms "
              f"{fl / t / 1e12:6.1f} TF/s", flush=True)

        t = timeit(chained(
            lambda x, w, gw, gb: back(conv(
                lax.optimization_barrier(
                    group_norm_silu(x, gw, gb, 32)), w))), x, w, gw, gb)
        print(f"{'':>22s} gn|barrier|conv {t * 1e3:7.3f} ms "
              f"{fl / t / 1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
