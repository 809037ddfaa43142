"""Quickstart: SD1.5 txt2img from an A1111-style checkpoint.

Equivalent reference flow: cremage's main UI "Generate" button with an
SD1.5 ldm model selected (reference modules/sd/txt2img.py). Everything
the UI sets lives on GenerationOptions; PNG metadata round-trips the
same generation_data the reference embeds.

Usage:
  python examples/txt2img_sd15.py --ckpt /path/model.safetensors \
      --prompt "a watercolor fox, autumn forest" --steps 20 --out out.png
"""
import argparse

from cremage_tpu.core.cache import enable_compilation_cache
from cremage_tpu.core.config import GenerationOptions
from cremage_tpu.io.metadata import image_from_array, save_png_with_metadata
from cremage_tpu.pipelines.loader import load_sd15_bundle
from cremage_tpu.pipelines.sd15 import SD15Pipeline


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--prompt", default="a watercolor fox, autumn forest")
    ap.add_argument("--negative_prompt", default="low quality")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--sampler", default="Euler A")
    ap.add_argument("--scale", type=float, default=7.5)
    ap.add_argument("--seed", type=int, default=-1)
    ap.add_argument("--lora", action="append", default=[],
                    help="path:weight (repeatable)")
    ap.add_argument("--out", default="out.png")
    args = ap.parse_args()

    enable_compilation_cache()
    loras = []
    for spec in args.lora:
        path, _, w = spec.partition(":")
        loras.append((path, float(w or 1.0)))
    bundle = load_sd15_bundle(args.ckpt, loras=loras)
    pipe = SD15Pipeline(bundle)

    opts = GenerationOptions(
        prompt=args.prompt, negative_prompt=args.negative_prompt,
        sampling_steps=args.steps, sampler=args.sampler, scale=args.scale,
        seed=args.seed, H=512, W=512,
    )
    img, meta = pipe.generate(opts, status_cb=print)[0]
    save_png_with_metadata(image_from_array(img), args.out, meta)
    print("saved", args.out)


if __name__ == "__main__":
    main()
