"""Decompose the serving-path gap: warm per-stage wall-clock of a
batch-4 512^2 SD1.5 generate() on the real chip, vs the kernel-loop
lane (bench.py sd15).  VERDICT r4 item 2 asks for either >=2 img/s or
a written decomposition proving the residual is irreducible host work.

Stages timed by wrapping the pipeline's own internals:
  cond     TextEncoder.encode_pair (2 CLIP tower dispatches + tile)
  sample   SD15Pipeline._sample (the scanned sampler program)
  decode   VAE decode + on-device uint8 quantize + host pull
  png      PNG encode of the 4 images (the worker does this off-thread
           now — measured here to show what overlap hides)
  total    wall-clock of generate()

Run: JAX_PLATFORMS=axon python tools/profile_e2e.py  (defaults
BENCH_ROUNDS=3 warm rounds after 1 warmup)
"""
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cremage_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

from bench import zeros_params
from cremage_tpu.core.config import GenerationOptions
from cremage_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from cremage_tpu.models.unet import UNetModel, sd15_unet_config
from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
from cremage_tpu.pipelines.conditioning import TextEncoder
from cremage_tpu.pipelines import sd15 as sd15_mod
from cremage_tpu.pipelines.sd15 import SD15Bundle, SD15Pipeline
from cremage_tpu.prompt.tokenizer import default_tokenizer
from cremage_tpu.samplers import schedules as S
from cremage_tpu.utils import image as image_mod


def main():
    batch = int(os.environ.get("BENCH_BATCH", "4"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "3"))

    unet = UNetModel(sd15_unet_config())
    params = zeros_params(
        unet, jnp.zeros((1, 64, 64, 4), jnp.bfloat16), jnp.zeros((1,)),
        jnp.zeros((1, 77, 768), jnp.bfloat16))
    vae = AutoencoderKL(VAEConfig())
    vae_params = zeros_params(vae, jnp.zeros((1, 64, 64, 3), jnp.bfloat16))
    clip = CLIPTextModel(CLIPTextConfig())
    clip_params = zeros_params(clip, jnp.zeros((1, 77), jnp.int32))
    text = TextEncoder(clip, clip_params, default_tokenizer())
    bundle = SD15Bundle(unet=unet, unet_params=params, text=text, vae=vae,
                        vae_params=vae_params,
                        schedule=S.default_sd_schedule())
    pipe = SD15Pipeline(bundle)

    t_stage = {"cond": 0.0, "sample": 0.0, "decode": 0.0}

    orig_pair = text.encode_pair
    def timed_pair(*a, **k):
        t0 = time.perf_counter()
        out = orig_pair(*a, **k)
        t_stage["cond"] += time.perf_counter() - t0
        return out
    text.encode_pair = timed_pair

    orig_sample = pipe._sample
    def timed_sample(*a, **k):
        t0 = time.perf_counter()
        out = orig_sample(*a, **k)
        # block: _sample returns the device latent async
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        t_stage["sample"] += time.perf_counter() - t0
        return out
    pipe._sample = timed_sample

    orig_d2i = image_mod.device_to_img01
    def timed_d2i(x):
        t0 = time.perf_counter()
        out = orig_d2i(x)
        np.asarray(out)            # includes the host pull
        t_stage["decode"] += time.perf_counter() - t0
        return out
    sd15_mod.device_to_img01 = timed_d2i

    opts = GenerationOptions(
        prompt="a photograph of an astronaut riding a horse",
        negative_prompt="blurry, low quality", H=512, W=512,
        sampling_steps=steps, sampler="Euler A", seed=1,
        n_samples=batch, n_iter=1, safety_check=False, watermark=False)

    print("warmup (compile)...", flush=True)
    t0 = time.perf_counter()
    pipe.generate(opts)
    print(f"warmup took {time.perf_counter()-t0:.1f}s", flush=True)

    rows = []
    png_s = 0.0
    for r in range(rounds):
        for k in t_stage:
            t_stage[k] = 0.0
        t0 = time.perf_counter()
        results = pipe.generate(
            GenerationOptions(**{**opts.__dict__, "seed": r + 2,
                                 "extra": {}}))
        total = time.perf_counter() - t0
        tp = time.perf_counter()
        from PIL import Image
        for img, _ in results:
            buf = io.BytesIO()
            Image.fromarray(
                (np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                buf, format="PNG")
        png_s = time.perf_counter() - tp
        other = total - sum(t_stage.values())
        rows.append(dict(total=total, png=png_s, other=other, **t_stage))
        print(json.dumps({k: round(v, 3) for k, v in rows[-1].items()}),
              flush=True)

    med = {k: float(np.median([r[k] for r in rows])) for k in rows[0]}
    med["images_per_sec_direct"] = batch / med["total"]
    print("MEDIAN: " + json.dumps({k: round(v, 3)
                                   for k, v in med.items()}), flush=True)


if __name__ == "__main__":
    main()
