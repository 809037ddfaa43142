#!/usr/bin/env python
"""Real-checkpoint LPIPS parity harness.

Given an SD1.5/SDXL checkpoint (.safetensors/.ckpt), loads it through the
converter stack (pipelines/loader.py — the same overlay order the
reference uses, sd/image_generator.py:330-485), renders a fixed
prompt/seed grid, and either:

  --save-ref DIR   stores the renders as golden references, or
  --ref-dir DIR    compares renders against stored goldens (e.g. CUDA
                   renders from the reference implementation) with LPIPS
                   (services/lpips.py) and pass/fails against a
                   threshold (north star: LPIPS <= 0.01).

When LPIPS trunk weights are unavailable (LPIPS_TRUNK_PATH unset), falls
back to PSNR with an explicit "fallback" marker in the report — the run
still works end-to-end, the metric is just not perceptual.

Output: one JSON report on stdout; renders saved to --out-dir.

Examples:
  python tools/parity_lpips.py --family sd15 --ckpt v1-5-pruned.safetensors \
      --save-ref goldens/
  python tools/parity_lpips.py --family sd15 --ckpt v1-5-pruned.safetensors \
      --ref-dir goldens/ --threshold 0.01
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
    "a futuristic city skyline at dusk, ultra detailed",
)
DEFAULT_SEEDS = (42, 1234)


def _save(img01: np.ndarray, path: str) -> None:
    from PIL import Image

    Image.fromarray(
        (np.clip(img01, 0, 1) * 255).round().astype(np.uint8)
    ).save(path)


def _load01(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def _metric():
    """LPIPS if trunk weights are reachable, else PSNR fallback."""
    try:
        from cremage_tpu.services.lpips import LPIPS

        m = LPIPS.load(net=os.environ.get("LPIPS_NET", "alex"))

        def lpips(a, b):
            return float(m(a, b)[0])

        return "lpips", lpips
    except (FileNotFoundError, Exception) as e:  # noqa: BLE001
        if not isinstance(e, FileNotFoundError):
            print(f"# LPIPS unavailable ({e}); falling back to PSNR",
                  file=sys.stderr)

        def psnr(a, b):
            mse = float(np.mean((a - b) ** 2))
            return -10.0 * np.log10(max(mse, 1e-12))

        return "psnr_fallback", psnr


def render_grid(
    family: str,
    ckpt: str,
    out_dir: str,
    prompts: Sequence[str] = DEFAULT_PROMPTS,
    seeds: Sequence[int] = DEFAULT_SEEDS,
    steps: int = 20,
    size: int = 512,
    sampler: str = "Euler A",
    scale: float = 7.5,
    vae_ckpt: Optional[str] = None,
    loader_kwargs: Optional[dict] = None,
):
    """Render the prompt/seed grid; returns [(name, img01)] and saves
    PNGs into out_dir."""
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.pipelines import loader as L

    loader_kwargs = loader_kwargs or {}
    if family == "sd15":
        from cremage_tpu.pipelines.sd15 import SD15Pipeline

        bundle = L.load_sd15_bundle(ckpt, vae_ckpt=vae_ckpt, **loader_kwargs)
        pipe = SD15Pipeline(bundle)
    elif family == "sdxl":
        from cremage_tpu.pipelines.sdxl import SDXLPipeline

        bundle = L.load_sdxl_bundle(ckpt, vae_ckpt=vae_ckpt, **loader_kwargs)
        pipe = SDXLPipeline(bundle)
    else:
        raise ValueError(f"unknown family {family!r} (sd15|sdxl)")

    os.makedirs(out_dir, exist_ok=True)
    out = []
    for pi, prompt in enumerate(prompts):
        for seed in seeds:
            opts = GenerationOptions(
                prompt=prompt, negative_prompt="", H=size, W=size,
                sampling_steps=steps, n_samples=1, n_iter=1, seed=seed,
                sampler=sampler, scale=scale, safety_check=False,
            )
            (img, _meta), = pipe.generate(opts)
            name = f"p{pi:02d}_s{seed}.png"
            _save(np.asarray(img), os.path.join(out_dir, name))
            out.append((name, np.asarray(img)))
    return out


def run_parity(
    family: str,
    ckpt: str,
    out_dir: str,
    ref_dir: Optional[str] = None,
    save_ref: Optional[str] = None,
    threshold: float = 0.01,
    **render_kwargs,
) -> dict:
    renders = render_grid(family, ckpt, out_dir, **render_kwargs)

    if save_ref:
        os.makedirs(save_ref, exist_ok=True)
        for name, img in renders:
            _save(img, os.path.join(save_ref, name))
        return {"mode": "save_ref", "count": len(renders),
                "ref_dir": save_ref}

    if not ref_dir:
        return {"mode": "render_only", "count": len(renders),
                "out_dir": out_dir}

    metric_name, metric = _metric()
    per_image, missing = {}, []
    for name, img in renders:
        ref_path = os.path.join(ref_dir, name)
        if not os.path.exists(ref_path):
            missing.append(name)
            continue
        per_image[name] = round(metric(img, _load01(ref_path)), 6)

    values = list(per_image.values())
    if metric_name == "lpips":
        worst = max(values) if values else None
        passed = bool(values) and worst <= threshold and not missing
    else:  # PSNR: higher is better; >= 35 dB as a crude stand-in
        worst = min(values) if values else None
        passed = bool(values) and worst >= 35.0 and not missing
    return {
        "mode": "compare", "metric": metric_name, "threshold": threshold,
        "per_image": per_image, "worst": worst, "missing_refs": missing,
        "pass": passed,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--family", default="sd15", choices=["sd15", "sdxl"])
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--vae")
    ap.add_argument("--out-dir", default="parity_out")
    ap.add_argument("--ref-dir")
    ap.add_argument("--save-ref")
    ap.add_argument("--prompts", help="text file, one prompt per line")
    ap.add_argument("--seeds", default=",".join(map(str, DEFAULT_SEEDS)))
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--sampler", default="Euler A")
    ap.add_argument("--scale", type=float, default=7.5)
    ap.add_argument("--threshold", type=float, default=0.01)
    a = ap.parse_args(argv)

    prompts = DEFAULT_PROMPTS
    if a.prompts:
        with open(a.prompts) as f:
            prompts = [ln.strip() for ln in f if ln.strip()]

    report = run_parity(
        a.family, a.ckpt, a.out_dir, ref_dir=a.ref_dir, save_ref=a.save_ref,
        threshold=a.threshold, prompts=prompts,
        seeds=[int(s) for s in a.seeds.split(",")],
        steps=a.steps, size=a.size, sampler=a.sampler, scale=a.scale,
        vae_ckpt=a.vae,
    )
    print(json.dumps(report, indent=2))
    return 0 if report.get("pass", True) else 1


if __name__ == "__main__":
    sys.exit(main())
