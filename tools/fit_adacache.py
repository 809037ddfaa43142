#!/usr/bin/env python
"""Fit the ada_cache rescale polynomial for a checkpoint family.

The TeaCache-family indicator (samplers/adacache.py) accumulates the
relative L1 change of the model INPUT between steps; the paper maps that
input change to an estimate of the true OUTPUT change through a fitted
polynomial so the user threshold is in output-change units.  This tool
produces that fit from real weights:

  1. load the family bundle through the product converter stack,
  2. run the exact denoising trajectory for a prompt set (host-stepped
     Euler over the jitted CFG denoiser — calibration wants per-step
     visibility, so the scanned program is not used here),
  3. collect (rel_input_i, rel_output_i) pairs across steps and prompts,
  4. np.polyfit(degree 4, the paper's choice) and write the
     coefficients into the calibration registry JSON
     (~/.cremage_tpu/adacache_calib.json or $CREMAGE_ADACACHE_CALIB),
     where samplers/adacache.load_calibration picks them up for every
     subsequent ada_cache run of that family.

With the io/export.py dummy checkpoint this proves plumbing end to end
(tests/test_parity_harness.py); the numbers become meaningful when real
weights land (VERDICT r3 item 8).

Usage:
  python tools/fit_adacache.py --family sd15 --ckpt v1-5.safetensors
  python tools/fit_adacache.py --family sd15 --ckpt ... --dry-run  # no write
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional, Sequence

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_PROMPTS = (
    "a photograph of an astronaut riding a horse",
    "a vase of flowers on a wooden table, oil painting",
    "portrait of a woman, studio lighting, 85mm",
)


def registry_path(path: Optional[str] = None) -> str:
    return path or os.environ.get(
        "CREMAGE_ADACACHE_CALIB",
        os.path.join(os.path.expanduser("~"), ".cremage_tpu",
                     "adacache_calib.json"))


def collect_pairs_sd15(bundle, prompts: Sequence[str], steps: int,
                       size: int, scale: float, seed: int):
    """Exact Euler trajectories on the SD1.5 bundle; returns
    (rel_input, rel_output) sample arrays."""
    import jax
    import jax.numpy as jnp

    from cremage_tpu.core.rng import key_for_image, noise_like
    from cremage_tpu.samplers.denoiser import EpsDenoiser, cfg_denoiser

    h = w = size // 8
    sched = bundle.schedule
    sigmas = np.asarray(sched.get_sigmas(steps), np.float64)

    def eps(x, t, cond):
        return bundle.unet.apply(bundle.unet_params, x, t, cond)

    denoise = EpsDenoiser(eps, sched)

    @jax.jit
    def den_step(x, sigma, c, uc):
        return cfg_denoiser(denoise, c, uc, scale)(
            x, jnp.asarray(sigma, jnp.float32))

    rels_in, rels_out = [], []
    for pi, prompt in enumerate(prompts):
        c, uc = bundle.text.encode_pair(prompt, "")
        c = jnp.asarray(c)[None]
        uc = jnp.asarray(uc)[None]
        key = key_for_image(seed, pi)
        x = np.asarray(noise_like(key, (1, h, w, 4)),
                       np.float64) * sigmas[0]
        prev_u = prev_d = None
        for i in range(len(sigmas) - 1):
            sig = sigmas[i]
            u = x / np.sqrt(sig**2 + denoise.sigma_data**2)
            den = np.asarray(den_step(jnp.asarray(x, jnp.float32), sig,
                                      c, uc), np.float64)
            d = (x - den) / sig            # the cached quantity (eps dir)
            if prev_u is not None:
                rels_in.append(np.abs(u - prev_u).sum()
                               / (np.abs(prev_u).sum() + 1e-12))
                rels_out.append(np.abs(d - prev_d).sum()
                                / (np.abs(prev_d).sum() + 1e-12))
            prev_u, prev_d = u, d
            x = x + (x - den) / sig * (sigmas[i + 1] - sig)   # Euler
    return np.asarray(rels_in), np.asarray(rels_out)


def fit(family: str, ckpt: str, prompts: Sequence[str] = DEFAULT_PROMPTS,
        steps: int = 20, size: int = 512, scale: float = 7.5,
        seed: int = 42, degree: int = 4, registry: Optional[str] = None,
        write: bool = True, loader_kwargs: Optional[dict] = None) -> dict:
    from cremage_tpu.pipelines import loader as L

    if family != "sd15":
        raise SystemExit(
            f"fitting for {family!r} not wired yet — sd15 is the "
            "template; other families follow the same recipe once real "
            "weights justify it")
    bundle = L.load_sd15_bundle(ckpt, **(loader_kwargs or {}))
    rin, rout = collect_pairs_sd15(bundle, prompts, steps, size, scale,
                                   seed)
    coeffs = np.polyfit(rin, rout, degree)
    pred = np.polyval(coeffs, rin)
    ss_res = float(((rout - pred) ** 2).sum())
    ss_tot = float(((rout - rout.mean()) ** 2).sum())
    report = {
        "family": family, "ckpt": ckpt, "n_pairs": int(len(rin)),
        "degree": degree, "coeffs": [float(c) for c in coeffs],
        "r2": round(1.0 - ss_res / max(ss_tot, 1e-12), 4),
        "rel_input_range": [float(rin.min()), float(rin.max())],
        "rel_output_range": [float(rout.min()), float(rout.max())],
    }
    if write:
        path = registry_path(registry)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        data = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
        data[family] = report["coeffs"]
        with open(path, "w") as f:
            json.dump(data, f, indent=2)
        report["registry"] = path
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--family", default="sd15")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--scale", type=float, default=7.5)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--degree", type=int, default=4)
    ap.add_argument("--registry")
    ap.add_argument("--dry-run", action="store_true")
    a = ap.parse_args(argv)
    report = fit(a.family, a.ckpt, steps=a.steps, size=a.size,
                 scale=a.scale, seed=a.seed, degree=a.degree,
                 registry=a.registry, write=not a.dry_run)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
