#!/usr/bin/env python
"""Is exp2 cheaper than exp on the v5e VPU?  Flash attention is
exp-bound at d=40 (~215 G exp/s measured, NOTES_r2); if exp2 has higher
throughput, the kernel can fold log2(e) into the q scale for free and
switch p = exp(s-m) -> exp2(s'-m').  Chained-fori differential timing
(tunnel: 30 ms/dispatch, never trust single-dispatch numbers)."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, jax.lax as lax
from cremage_tpu.core.cache import enable_compilation_cache

REPS = int(os.environ.get("PROF_REPS", "40"))
K = int(os.environ.get("PROF_K", "16"))

def chained(op):
    def run(x):
        def body(i, x):
            # K back-to-back transcendentals per memory pass: one fusion
            # reads x once and applies op K times, so the loop is
            # VPU-compute-bound, not HBM-bound (a single op per pass runs
            # at the mul-control rate ~18.5 Gop/s = memory).
            for _ in range(K):
                x = op(x - 0.5) * jnp.float32(0.98).astype(x.dtype)
            return x
        return jnp.mean(lax.fori_loop(0, REPS, body, x).astype(jnp.float32))
    return jax.jit(run)

def timeit(fn, x):
    np.asarray(fn(x)); best = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); np.asarray(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best / REPS

def main():
    enable_compilation_cache()
    key = jax.random.key(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jax.random.uniform(key, (4096, 4096), dtype) * -4.0
        n = x.size * K
        for name, op in [("exp", jnp.exp), ("exp2", jnp.exp2),
                         ("tanh", jnp.tanh),
                         ("mul(ctl)", lambda v: v * 1.0001)]:
            t = timeit(chained(op), x)
            print(f"{jnp.dtype(dtype).name:9s} {name:9s} {t*1e6:8.2f} us "
                  f"{n/t/1e9:7.1f} Gop/s", flush=True)

if __name__ == "__main__":
    main()
