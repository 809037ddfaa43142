#!/usr/bin/env python
"""Measure DiT ToMe on the real chip: full vs token-merged eval time at
PRODUCTION config (1024² latents -> 4096 tokens, patch 2).

The DiT integration (ops/tome.py) merges int(N*ratio) image tokens once
at the block-stack input, so EVERY per-token matmul (attention q/k/v/
proj, MLPs) runs on the reduced stream; the plan build (one (Ns x Nd)
similarity matmul + argsort) and the final unmerge gather are the
overhead being measured against.

Same harness as tools/bench_dit_deepcache.py (zeros bf16 params,
chained fori loop against the ~30 ms tunnel dispatch cost).

Run: python tools/bench_dit_tome.py [family ...]
Each family runs in a subprocess (clean HBM).

RESULTS (v5e-1, 2026-08-19, ratio 0.5, production configs):
  sd3       full 137.0  tome 48.8 (2.81x)  tome-shallow  8.8 -> tome+DC2 28.8 ms/step (4.76x)
  pixart    full  90.0  tome 29.6 (3.04x)  tome-shallow  8.3 -> tome+DC2 19.0 ms/step (4.75x)
  hunyuan   full 161.3  tome 56.8 (2.84x)  tome-shallow  8.3 -> tome+DC2 32.6 ms/step (4.95x)
  kandinsky full  20.3  tome 14.6 (1.40x)  tome-shallow  6.8 -> tome+DC2 10.7 ms/step (1.90x)
  cascade_b full  93.6  tome 67.4 (1.39x)  tome-shallow 10.4 -> tome+DC2 38.9 ms/step (2.41x)
  cascade_c full  23.7  tome 23.9 (0.99x)  tome-shallow 13.3 -> tome+DC2 18.6 ms/step (1.28x)
(cascade_c's ToMe is a wash — 24x24 latents put so few tokens through
its attentions that the plan build + unmerge cancel the matmul savings;
Stage B, the wall-clock-dominant Cascade stage, gets the real win and
stacks with the Δ-cache to 2.41x.  Leave tome_ratio at 0 for Stage C.)
(compare tools/bench_dit_deepcache.py interval-2 alone: 73.7/48.0/84.6
ms/step — whole-stack ToMe at 0.5 beats the Δ-cache on every DiT, and
the two STACK to ~4.8x per step since the Δ-cache is stored in
full-token space; the ToMe speedup exceeds the naive 2x because the
quadratic attention term shrinks 4x and the flash kernel's exp-bound
share goes with it.  Full-lane numbers for FLUX are in bench.py: fp8
0.396->0.750 img/s, int8 0.496->0.895 = 7.2x the reference's published
4090 number.)
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REPS = int(os.environ.get("SWEEP_REPS", "5"))
RATIO = float(os.environ.get("TOME_RATIO", "0.5"))


def run_family(name):
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    from cremage_tpu.core.cache import enable_compilation_cache
    from tools.bench_dit_deepcache import LEVEL_FAMILIES, build
    from tools.tpu_family_sweep import zeros_bf16

    enable_compilation_cache()
    model, args = build(name)
    x = args[0]
    # vary t across chained reps: the plan's dst offset derives from it,
    # so a constant t would let XLA hoist the plan out of the loop and
    # overstate the win
    params = zeros_bf16(model, *args)
    tome_model = type(model)(dataclasses.replace(
        model.cfg, tome_ratio=RATIO))

    def chained(mdl):
        @jax.jit
        def fwd(params, x, *rest):
            def body(i, xx):
                out = mdl.apply(params, xx, rest[0] + i, *rest[1:])
                return out[..., : xx.shape[-1]].astype(xx.dtype)
            return jnp.mean(lax.fori_loop(0, REPS, body, x)
                            .astype(jnp.float32))
        return fwd

    full = chained(model)
    merged = chained(tome_model)

    # DC x ToMe shallow arm: the Δ-cache is stored full-token-space, so
    # shallow re-merges it per step — measure that re-merge + front
    # block cost to get the combined interval-2 number
    cache_depth = int(os.environ.get("CACHE_DEPTH", "1"))
    if name in LEVEL_FAMILIES:   # skip-UNet families cache by res level
        from cremage_tpu.samplers.deepcache import max_cache_levels

        mk = {"cache_levels": min(cache_depth, max_cache_levels(model))}
    else:
        mk = {"cache_depth": cache_depth}
    _, deep_sd = jax.eval_shape(
        lambda p, *a: tome_model.apply(p, *a, mode="capture", **mk),
        params, *args)
    deep = jnp.zeros(deep_sd.shape, deep_sd.dtype)

    @jax.jit
    def shallow_tm(params, x, deep, *rest):
        def body(i, xx):
            out = tome_model.apply(params, xx, rest[0] + i, *rest[1:],
                                   mode="shallow", deep=deep, **mk)
            return out[..., : x.shape[-1]].astype(xx.dtype)
        return jnp.mean(lax.fori_loop(0, REPS, body, x)
                        .astype(jnp.float32))

    def timeit(fn, extra=()):
        t0 = time.perf_counter()
        np.asarray(fn(params, x, *extra, *args[1:]))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(params, x, *extra, *args[1:]))
            best = min(best, time.perf_counter() - t0)
        return best / REPS * 1e3, compile_s

    t_full, c1 = timeit(full)
    t_tm, c2 = timeit(merged)
    t_sh, c3 = timeit(shallow_tm, extra=(deep,))
    step2 = (t_tm + t_sh) / 2
    print(f"{name:9s} full {t_full:6.1f} ms  tome({RATIO}) {t_tm:6.1f} ms "
          f"(-> {t_full / t_tm:.2f}x)  tome-shallow {t_sh:6.1f} ms "
          f"-> tome+DC2 {step2:6.1f} ms/step ({t_full / step2:.2f}x)  "
          f"[compile {c1:.0f}s/{c2:.0f}s/{c3:.0f}s]",
          flush=True)


def main():
    families = sys.argv[1:] or ["sd3", "pixart", "hunyuan", "kandinsky",
                                "cascade_b", "cascade_c"]
    if len(families) == 1:
        run_family(families[0])
        return
    import subprocess

    rc = 0
    for f in families:
        r = subprocess.run([sys.executable, os.path.abspath(__file__), f])
        rc = rc or r.returncode
    sys.exit(rc)


if __name__ == "__main__":
    main()
