#!/usr/bin/env python
"""Time the Pallas flash-attention kernel at the product's hot shapes.
Chained-fori differential timing (tunnel adds ~30 ms/dispatch).

Used to evaluate kernel changes.  RESULTS (v5e-1, 2026-08-17), D40 lane
(B8 N4096 H8):
  baseline kernel                 5.780 ms  185.8 G exp/s
  scale folded into q             5.739 ms  (-0.7%, noise — the per-
      logit VPU mul is hidden under MXU/VPU overlap)
  + ones-column-in-v denominator  5.953 ms  (+3% SLOWER — the 41st
      lane column costs a full extra (8,128) tile in the p@v matmul,
      outweighing the removed sum lane-reduction)
Both reverted; the kernel is at its Mosaic scheduling floor, matching
NOTES_r2's conclusion (no op-count or layout change moves the
exp-bound d=40 lane).  Companion probe tools/bench_exp2.py: exp costs
~1.1x a mul on the VPU (854 vs 785 us per chained application) and
exp2 is 13% slower than exp, so exp2-via-folded-log2e is refuted
too."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, jax.lax as lax
from cremage_tpu.core.cache import enable_compilation_cache
from cremage_tpu.ops.flash_attention import flash_attention

REPS = int(os.environ.get("PROF_REPS", "20"))

# (B, N, H, D): sd15 512^2 batch4+cfg, sd15 down1, sdxl 1024^2 batch1+cfg,
# svd 14-frame 72x128 latents
SHAPES = [(8, 4096, 8, 40), (8, 1024, 8, 80), (2, 4096, 10, 64),
          (28, 2304, 5, 64)]

def chained(n, h, d):
    def run(q, k, v):
        def body(i, q):
            o = flash_attention(q, k, v)
            # feed output back as q so reps can't be hoisted
            return (o * jnp.bfloat16(0.999) +
                    q * jnp.bfloat16(0.001)).astype(q.dtype)
        return jnp.mean(lax.fori_loop(0, REPS, body, q).astype(jnp.float32))
    return jax.jit(run)

def main():
    enable_compilation_cache()
    key = jax.random.key(0)
    for b, n, h, d in SHAPES:
        q = jax.random.normal(key, (b, n, h, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (b, n, h, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, n, h, d), jnp.bfloat16)
        fn = chained(n, h, d)
        np.asarray(fn(q, k, v))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter(); np.asarray(fn(q, k, v))
            best = min(best, time.perf_counter() - t0)
        t = best / REPS
        fl = 4 * b * h * n * n * d  # 2 matmuls
        print(f"B{b} N{n} H{h} D{d}: {t*1e3:7.3f} ms  "
              f"{fl/t/1e12:6.1f} TF/s  {b*h*n*n/t/1e9:6.1f} G exp/s",
              flush=True)

if __name__ == "__main__":
    main()
