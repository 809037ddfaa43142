#!/usr/bin/env python
"""Measure the DeepCache split on the real chip: full vs shallow eval
time at PRODUCTION config, and the implied interval-2 per-step cost.

Families: the DiT Δ-cache (sd3 / pixart / hunyuan — shallow reruns the
embedders + `cache_depth` front blocks + final layer and adds the
cached fp32 delta) and the skip-UNet hidden-state cache (kandinsky /
cascade_b / cascade_c — shallow reruns resolution levels below
`cache_levels`).

Same harness as tools/tpu_family_sweep.py (zeros bf16 params, chained
fori loop against the ~30 ms tunnel dispatch cost).

Run: python tools/bench_dit_deepcache.py [family ...]
Each family runs in a subprocess (clean HBM).

RESULTS (v5e-1, 2026-08-18/19, depth=1, production configs):
  sd3       full 136.6 ms  shallow 10.9 ms  -> interval-2  73.7 ms/step (1.85x)
  pixart    full  88.1 ms  shallow  7.8 ms  -> interval-2  48.0 ms/step (1.84x)
  hunyuan   full 159.6 ms  shallow  9.7 ms  -> interval-2  84.6 ms/step (1.89x)
  kandinsky full  19.6 ms  shallow  6.3 ms  -> interval-2  13.0 ms/step (1.51x)
  cascade_b full  92.8 ms  shallow  9.6 ms  -> interval-2  51.2 ms/step (1.81x)
  cascade_c full  23.7 ms  shallow 13.6 ms  -> interval-2  18.7 ms/step (1.27x)
(cascade_c has only two trunk levels, so its shallow pass keeps level 0's
8 of 32 block groups — Stage B, the wall-clock-dominant stage, gets the
full UNet-style win.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REPS = int(os.environ.get("SWEEP_REPS", "5"))
CACHE_DEPTH = int(os.environ.get("CACHE_DEPTH", "1"))


def build(name):
    import jax.numpy as jnp

    bf = jnp.bfloat16
    if name == "sd3":
        from cremage_tpu.models.mmdit import MMDiT, sd3_medium_config

        model = MMDiT(sd3_medium_config())
        x = jnp.zeros((1, 128, 128, 16), bf)
        args = (x, jnp.zeros((1,)), jnp.zeros((1, 154, 4096), bf),
                jnp.zeros((1, 2048), bf))
    elif name == "pixart":
        from cremage_tpu.models.pixart import PixArt, pixart_sigma_xl_config

        model = PixArt(pixart_sigma_xl_config())
        x = jnp.zeros((1, 128, 128, 4), bf)
        args = (x, jnp.zeros((1,)), jnp.zeros((1, 120, 4096), bf))
    elif name == "hunyuan":
        from cremage_tpu.models.hunyuan import HunyuanConfig, HunyuanDiT

        model = HunyuanDiT(HunyuanConfig())
        x = jnp.zeros((1, 128, 128, 4), bf)
        args = (x, jnp.zeros((1,)), jnp.zeros((1, 77, 1024), bf),
                jnp.zeros((1, 256, 2048), bf))
    elif name == "kandinsky":
        from cremage_tpu.models.kandinsky_decoder import (
            KandinskyUNet, KandinskyUNetConfig,
        )

        cfg = KandinskyUNetConfig()
        model = KandinskyUNet(cfg)
        x = jnp.zeros((1, 64, 64, cfg.in_channels), bf)
        args = (x, jnp.zeros((1,)), jnp.zeros((1, 10, cfg.context_dim), bf),
                jnp.zeros((1, cfg.time_embed_dim), bf))
    elif name == "cascade_c":
        from cremage_tpu.models.cascade import StageC, StageCConfig

        model = StageC(StageCConfig())
        x = jnp.zeros((1, 24, 24, 16), bf)
        args = (x, jnp.zeros((1,)), jnp.zeros((1, 77, 1280), bf),
                jnp.zeros((1, 1280), bf))
    elif name == "cascade_b":
        from cremage_tpu.models.cascade import StageB, StageBConfig

        model = StageB(StageBConfig())
        x = jnp.zeros((1, 256, 256, 4), bf)
        args = (x, jnp.zeros((1,)), jnp.zeros((1, 24, 24, 16), bf),
                jnp.zeros((1, 1280), bf))
    else:
        raise SystemExit(f"unknown family {name!r}")
    return model, args


# skip-UNet families cache by resolution level (models/unet.py contract)
LEVEL_FAMILIES = {"kandinsky", "cascade_b", "cascade_c"}


def run_family(name):
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    from cremage_tpu.core.cache import enable_compilation_cache
    from tools.tpu_family_sweep import zeros_bf16

    enable_compilation_cache()
    model, args = build(name)
    x = args[0]
    params = zeros_bf16(model, *args)
    kw_name = "cache_levels" if name in LEVEL_FAMILIES else "cache_depth"
    if name in LEVEL_FAMILIES:
        from cremage_tpu.samplers.deepcache import max_cache_levels

        depth = min(CACHE_DEPTH, max_cache_levels(model))
    else:
        depth = CACHE_DEPTH
    mk = {kw_name: depth}

    _, deep_sd = jax.eval_shape(
        lambda p, *a: model.apply(p, *a, mode="capture", **mk),
        params, *args)
    deep = jnp.zeros(deep_sd.shape, deep_sd.dtype)

    def chained(apply_once):
        @jax.jit
        def fwd(params, x, deep, *rest):
            def body(i, xx):
                out = apply_once(params, xx, deep, *rest)
                return out[..., : xx.shape[-1]].astype(xx.dtype)
            return jnp.mean(lax.fori_loop(0, REPS, body, x)
                            .astype(jnp.float32))
        return fwd

    full = chained(lambda p, xx, dp, *rest: model.apply(p, xx, *rest))
    shallow = chained(lambda p, xx, dp, *rest: model.apply(
        p, xx, *rest, mode="shallow", deep=dp, **mk))

    def timeit(fn):
        t0 = time.perf_counter()
        np.asarray(fn(params, x, deep, *args[1:]))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(params, x, deep, *args[1:]))
            best = min(best, time.perf_counter() - t0)
        return best / REPS * 1e3, compile_s

    t_full, c1 = timeit(full)
    t_sh, c2 = timeit(shallow)
    step2 = (t_full + t_sh) / 2
    print(f"{name:9s} full {t_full:6.1f} ms  shallow {t_sh:6.1f} ms "
          f"({kw_name}={depth})  -> interval-2 {step2:6.1f} ms/step "
          f"({t_full / step2:.2f}x)  [compile {c1:.0f}s/{c2:.0f}s]",
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
