#!/usr/bin/env python
"""Quality-delta harness for the approximation stack.

Renders the SAME checkpoint/prompt/seed grid exact and under each
approximation (ToMe, DeepCache, guidance interval, ada_cache, and the
full stack), then reports LPIPS (services/lpips.py; PSNR fallback when
the LPIPS trunk is unavailable) of each variant against the exact
render in ONE table.  This is the number that must accompany every
approximate-lane speedup claim (VERDICT r3 item 3): the reference has
no approximations — output fidelity is its product contract
(`/root/reference/modules/sd/image_generator.py:1204-1212` persists
full metadata so any image is reproducible) — so a framework that adds
approximate lanes owes the quality side of the trade.

With the dummy checkpoint from io/export.py (random weights) the
numbers prove PLUMBING only; they become meaningful the moment a real
checkpoint lands — same command, real --ckpt.

Usage:
  python tools/quality_delta.py --family sd15 --ckpt v1-5.safetensors
  python tools/quality_delta.py --family sdxl --ckpt sdxl.safetensors \
      --variants tome,dc2,cfgi,stack --steps 30 --size 1024
Output: a JSON report on stdout + an aligned text table on stderr;
renders under --out-dir/<variant>/.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, Optional, Sequence

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.parity_lpips import DEFAULT_PROMPTS, _metric, _save  # noqa: E402

# Named variants: GenerationOptions overrides vs the exact baseline.
# ada_cache excludes deep_cache (one step-cache at a time); the stack is
# the full three-way composition the *_dc_tome_cfgi bench lanes measure.
VARIANTS: Dict[str, dict] = {
    "tome": {"tome_ratio": 0.5},
    "dc2": {"deep_cache": 2},
    "cfgi": {"cfg_interval_low": 0.28, "cfg_interval_high": 5.42},
    "ada01": {"ada_cache": 0.1},
    "ada02": {"ada_cache": 0.2},
    "stack": {"deep_cache": 2, "tome_ratio": 0.5,
              "cfg_interval_low": 0.28, "cfg_interval_high": 5.42},
}


def build_pipe(family: str, ckpt: str, vae_ckpt: Optional[str] = None,
               loader_kwargs: Optional[dict] = None):
    from cremage_tpu.pipelines import loader as L

    loader_kwargs = loader_kwargs or {}
    if family == "sd15":
        from cremage_tpu.pipelines.sd15 import SD15Pipeline

        return SD15Pipeline(
            L.load_sd15_bundle(ckpt, vae_ckpt=vae_ckpt, **loader_kwargs))
    if family == "sdxl":
        from cremage_tpu.pipelines.sdxl import SDXLPipeline

        return SDXLPipeline(
            L.load_sdxl_bundle(ckpt, vae_ckpt=vae_ckpt, **loader_kwargs))
    raise ValueError(f"unknown family {family!r} (sd15|sdxl)")


def render_variant(pipe, overrides: dict, out_dir: str,
                   prompts: Sequence[str], seeds: Sequence[int],
                   steps: int, size: int, sampler: str, scale: float):
    from cremage_tpu.core.config import GenerationOptions

    os.makedirs(out_dir, exist_ok=True)
    out = []
    for pi, prompt in enumerate(prompts):
        for seed in seeds:
            opts = GenerationOptions(
                prompt=prompt, negative_prompt="", H=size, W=size,
                sampling_steps=steps, n_samples=1, n_iter=1, seed=seed,
                sampler=sampler, scale=scale, safety_check=False,
                **overrides)
            (img, _meta), = pipe.generate(opts)
            name = f"p{pi:02d}_s{seed}.png"
            img = np.asarray(img)
            _save(img, os.path.join(out_dir, name))
            out.append((name, img))
    return out


def run_quality_delta(
    family: str, ckpt: str, out_dir: str,
    variants: Sequence[str] = ("tome", "dc2", "cfgi", "ada01", "ada02",
                               "stack"),
    prompts: Sequence[str] = DEFAULT_PROMPTS[:2],
    seeds: Sequence[int] = (42,),
    steps: int = 20, size: int = 512, sampler: str = "Euler A",
    scale: float = 7.5, vae_ckpt: Optional[str] = None,
    loader_kwargs: Optional[dict] = None, dummy_weights: bool = False,
) -> dict:
    pipe = build_pipe(family, ckpt, vae_ckpt, loader_kwargs)
    kw = dict(prompts=prompts, seeds=seeds, steps=steps, size=size,
              sampler=sampler, scale=scale)

    exact = render_variant(pipe, {}, os.path.join(out_dir, "exact"), **kw)
    metric_name, metric = _metric()

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return -10.0 * np.log10(max(mse, 1e-12))

    rows = {}
    for v in variants:
        overrides = VARIANTS[v]
        renders = render_variant(pipe, overrides,
                                 os.path.join(out_dir, v), **kw)
        per_image = {}
        for (name, img), (_, ref) in zip(renders, exact):
            per_image[name] = {
                metric_name: round(metric(img, ref), 6),
                "psnr_db": round(psnr(img, ref), 2),
            }
        vals = [d[metric_name] for d in per_image.values()]
        ps = [d["psnr_db"] for d in per_image.values()]
        rows[v] = {
            "overrides": overrides, "per_image": per_image,
            "mean_" + metric_name: round(float(np.mean(vals)), 6),
            "worst_" + metric_name: round(
                float(max(vals) if metric_name == "lpips" else min(vals)),
                6),
            "mean_psnr_db": round(float(np.mean(ps)), 2),
        }

    report = {
        "family": family, "metric": metric_name, "steps": steps,
        "size": size, "sampler": sampler,
        "n_images": len(exact), "variants": rows,
        "weights": "dummy (plumbing only)" if dummy_weights else ckpt,
    }

    hdr = f"{'variant':<10} {'mean ' + metric_name:>16} " \
          f"{'worst ' + metric_name:>17} {'mean PSNR dB':>13}"
    print(hdr, file=sys.stderr)
    for v, r in rows.items():
        print(f"{v:<10} {r['mean_' + metric_name]:>16} "
              f"{r['worst_' + metric_name]:>17} {r['mean_psnr_db']:>13}",
              file=sys.stderr)
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--family", default="sd15", choices=["sd15", "sdxl"])
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--vae")
    ap.add_argument("--out-dir", default="quality_delta_out")
    ap.add_argument("--variants",
                    default="tome,dc2,cfgi,ada01,ada02,stack")
    ap.add_argument("--prompts", help="text file, one prompt per line")
    ap.add_argument("--seeds", default="42")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--sampler", default="Euler A")
    ap.add_argument("--scale", type=float, default=7.5)
    a = ap.parse_args(argv)

    prompts = list(DEFAULT_PROMPTS[:2])
    if a.prompts:
        with open(a.prompts) as f:
            prompts = [ln.strip() for ln in f if ln.strip()]

    report = run_quality_delta(
        a.family, a.ckpt, a.out_dir,
        variants=[v.strip() for v in a.variants.split(",") if v.strip()],
        prompts=prompts, seeds=[int(s) for s in a.seeds.split(",")],
        steps=a.steps, size=a.size, sampler=a.sampler, scale=a.scale,
        vae_ckpt=a.vae,
    )
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
