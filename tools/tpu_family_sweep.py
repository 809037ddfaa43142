#!/usr/bin/env python
"""Execute every DiT/UNet model family at PRODUCTION configuration and
resolution on the real TPU chip — one forward each, host-built zeros
params (bf16 storage), wall-clock per eval via a chained fori loop
(tunnel: ~30 ms/dispatch, differential-ish timing only).

Families beyond the benched four (sd15/sdxl/svd/flux) have full
random-weight CPU tests but had never executed at full size on TPU;
this sweep is the hardware-execution evidence for the whole zoo and
catches Mosaic/HBM issues tiny shapes cannot.

Run: python tools/tpu_family_sweep.py [family ...]
Families run in subprocesses by default so each starts from clean HBM
(like bench.py lanes) and one failure cannot wedge the rest.

RESULTS (v5e-1, 2026-08-17, all OK):
  sd3        2.08B params  143.5 ms/eval   (SD3-medium MMDiT @1024^2)
  pixart     0.61B          93.7 ms/eval   (PixArt-Sigma XL @1024^2)
  hunyuan    1.49B         165.4 ms/eval   (depth-40 DiT @1024^2)
  cascade_c  3.61B          29.5 ms/eval   (Stage C @24^2 effnet latent)
  cascade_b  1.56B         101.1 ms/eval   (Stage B @256^2 VQ latent)
  kandinsky  1.22B          25.9 ms/eval   (decoder UNet @512^2)
  prior      1.03B          13.6 ms/eval   (diffusion prior)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REPS = int(os.environ.get("SWEEP_REPS", "3"))


def zeros_bf16(model, *args):
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(model.init, jax.random.key(0), *args)
    return jax.tree.map(
        lambda s: jnp.zeros(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        shapes)


def run_family(name):
    import jax
    import jax.numpy as jnp
    import jax.lax as lax

    from cremage_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    bf = jnp.bfloat16

    if name == "sd3":
        # SD3-medium MMDiT at 1024^2 (loader shapes: loader.py:342-346)
        from cremage_tpu.models.mmdit import MMDiT, sd3_medium_config

        model = MMDiT(sd3_medium_config())
        x = jnp.zeros((1, 128, 128, 16), bf)
        args = (x, jnp.zeros((1,)), jnp.zeros((1, 154, 4096), bf),
                jnp.zeros((1, 2048), bf))
    elif name == "pixart":
        # PixArt-Sigma XL at 1024^2
        from cremage_tpu.models.pixart import PixArt, pixart_sigma_xl_config

        model = PixArt(pixart_sigma_xl_config())
        x = jnp.zeros((1, 128, 128, 4), bf)
        args = (x, jnp.zeros((1,)), jnp.zeros((1, 120, 4096), bf))
    elif name == "hunyuan":
        # Hunyuan-DiT depth-40 at 1024^2
        from cremage_tpu.models.hunyuan import HunyuanConfig, HunyuanDiT

        model = HunyuanDiT(HunyuanConfig())
        x = jnp.zeros((1, 128, 128, 4), bf)
        args = (x, jnp.zeros((1,)), jnp.zeros((1, 77, 1024), bf),
                jnp.zeros((1, 256, 2048), bf))
    elif name == "cascade_c":
        # Stage C prior at 1024^2 (24x24 effnet latent)
        from cremage_tpu.models.cascade import StageC, StageCConfig

        model = StageC(StageCConfig())
        x = jnp.zeros((1, 24, 24, 16), bf)
        args = (x, jnp.zeros((1,)), jnp.zeros((1, 77, 1280), bf),
                jnp.zeros((1, 1280), bf))
    elif name == "cascade_b":
        # Stage B decoder at 1024^2 (256^2 VQ latent)
        from cremage_tpu.models.cascade import StageB, StageBConfig

        model = StageB(StageBConfig())
        x = jnp.zeros((1, 256, 256, 4), bf)
        args = (x, jnp.zeros((1,)), jnp.zeros((1, 24, 24, 16), bf),
                jnp.zeros((1, 1280), bf))
    elif name == "kandinsky":
        # Kandinsky 2.2 decoder UNet at 512^2
        from cremage_tpu.models.kandinsky_decoder import (
            KandinskyUNet, KandinskyUNetConfig,
        )

        cfg = KandinskyUNetConfig()
        model = KandinskyUNet(cfg)
        x = jnp.zeros((1, 64, 64, cfg.in_channels), bf)
        args = (x, jnp.zeros((1,)),
                jnp.zeros((1, 10, cfg.context_dim), bf),
                jnp.zeros((1, cfg.time_embed_dim), bf))
    elif name == "prior":
        # Kandinsky 2.2 diffusion prior (text -> image embedding)
        from cremage_tpu.models.kandinsky import DiffusionPrior, PriorConfig

        model = DiffusionPrior(PriorConfig())
        x = jnp.zeros((1, 1280), bf)
        args = (x, jnp.zeros((1,)), jnp.zeros((1, 77, 1280), bf),
                jnp.zeros((1, 1280), bf))
    else:
        raise SystemExit(f"unknown family {name!r}")

    params = zeros_bf16(model, *args)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    @jax.jit
    def fwd(params, x, *rest):
        def body(i, xx):
            out = model.apply(params, xx, *rest)
            out = out[0] if isinstance(out, tuple) else out
            # feed back (slice/pad to x's channel count if they differ)
            c = xx.shape[-1]
            if out.shape[-1] > c:
                out = out[..., :c]
            elif out.shape[-1] < c:
                reps = -(-c // out.shape[-1])
                out = jnp.concatenate([out] * reps, axis=-1)[..., :c]
            return out.astype(xx.dtype)
        return jnp.mean(lax.fori_loop(0, REPS, body, x).astype(jnp.float32))

    t0 = time.perf_counter()
    np.asarray(fwd(params, *args))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fwd(params, *args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:10s} OK  {n_params/1e9:5.2f}B params  "
          f"{best/REPS*1e3:8.1f} ms/eval  (compile {compile_s:.0f}s)",
          flush=True)


def main():
    families = sys.argv[1:] or ["sd3", "pixart", "hunyuan", "cascade_c",
                                "cascade_b", "kandinsky", "prior"]
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
