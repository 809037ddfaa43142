"""Multi-device execution of the REAL product graphs (VERDICT r2 item 3):

- the flagship SD1.5 UNet config through `SD15Pipeline.generate` under
  data parallelism on the 8-device CPU mesh, checked for equivalence
  against the single-device run;
- TP sharded-fraction reporting on the flagship param tree with the
  round-3 conv/VAE rules;
- the serve_multichip wiring booted headlessly end-to-end over HTTP.
"""
import json
import queue
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.core.mesh import make_mesh


class _StubText:
    """Flagship-shaped conditioning without the 123M CLIP tower."""

    def __init__(self, dim=768):
        rng = np.random.RandomState(11)
        self._c = rng.randn(77, dim).astype(np.float32) * 0.3
        self._uc = rng.randn(77, dim).astype(np.float32) * 0.3

    def encode_pair(self, prompt, negative, clip_skip=1):
        return self._c, self._uc


def _flagship_bundle():
    """Real sd15_unet_config + real VAE config, random params."""
    from cremage_tpu.models.unet import UNetModel, sd15_unet_config
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from cremage_tpu.pipelines.sd15 import SD15Bundle
    from cremage_tpu.samplers import schedules as S

    ucfg = sd15_unet_config(dtype=jnp.float32)
    unet = UNetModel(ucfg)
    unet_params = unet.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 768)))
    vcfg = VAEConfig(dtype=jnp.float32)
    vae = AutoencoderKL(vcfg)
    vae_params = vae.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))
    return SD15Bundle(
        unet=unet, unet_params=unet_params, text=_StubText(), vae=vae,
        vae_params=vae_params, schedule=S.default_sd_schedule())


@pytest.mark.slow
def test_flagship_pipeline_dp_equivalence(mesh8):
    """SD15Pipeline.generate with the FLAGSHIP UNet config (reduced
    resolution, 2 steps, batch 8) on the 8-device mesh matches the
    single-device run."""
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    bundle = _flagship_bundle()
    opts = GenerationOptions(
        prompt="a fox", negative_prompt="", H=128, W=128,
        sampling_steps=2, sampler="Euler", seed=7, n_samples=8, n_iter=1,
        safety_check=False, watermark=False, auto_face_fix=False)

    base = SD15Pipeline(bundle).generate(opts)
    imgs_base = np.stack([im for im, _ in base])

    pipe_dp = SD15Pipeline(bundle).use_mesh(mesh8)
    out = pipe_dp.generate(opts)
    imgs_dp = np.stack([im for im, _ in out])

    assert imgs_dp.shape == imgs_base.shape == (8, 128, 128, 3)
    assert np.isfinite(imgs_dp).all()
    # GSPMD may reorder fp32 reductions; outputs must agree tightly
    assert np.abs(imgs_dp - imgs_base).max() < 5e-2
    assert np.abs(imgs_dp - imgs_base).mean() < 5e-3


@pytest.mark.slow
def test_flagship_tp_sharded_fraction(mesh_4x2):
    """The round-3 conv rules materially raise the model-sharded param
    fraction on the FLAGSHIP UNet tree (was 44/208 rule-covered attn/MLP
    entries at tiny scale in round 2)."""
    from cremage_tpu.models.unet import UNetModel, sd15_unet_config
    from cremage_tpu.parallel.sharding import count_sharded, shard_params_tp

    ucfg = sd15_unet_config(dtype=jnp.float32)
    unet = UNetModel(ucfg)
    shapes = jax.eval_shape(
        unet.init, jax.random.key(0), jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 77, 768)))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    with mesh_4x2:
        p_tp = shard_params_tp(mesh_4x2, params)
        n_sh, n_tot = count_sharded(p_tp, mesh_4x2)
    frac = n_sh / n_tot
    print(f"flagship UNet: {n_sh}/{n_tot} params model-sharded "
          f"({frac:.1%})")
    # attention/MLP alone covered ~21% of entries; convs must add more
    assert frac > 0.35
    # the sharded tree still runs and matches the replicated run
    x = jax.random.normal(jax.random.key(2), (2, 16, 16, 4))
    t = jnp.full((2,), 500.0)
    ctx = jax.random.normal(jax.random.key(3), (2, 77, 768)) * 0.3
    with mesh_4x2:
        out_tp = np.asarray(jax.jit(unet.apply)(p_tp, x, t, ctx))
    out_ref = np.asarray(jax.jit(unet.apply)(params, x, t, ctx))
    np.testing.assert_allclose(out_tp, out_ref, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_serve_multichip_boots_and_serves(mesh8):
    """examples/serve_multichip.py wiring headlessly: mesh + sharded
    pipeline + worker + HTTP server answer a real generate request."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "examples"))
    import serve_multichip as SM

    from tests.test_pipeline_sd15 import make_bundle

    bundle = make_bundle()
    srv, pipe, mesh = SM.build_server("unused.safetensors", tp=1, port=0,
                                      bundle=bundle, mesh=mesh8)
    assert pipe.mesh is mesh8
    srv.start()
    try:
        url = f"http://127.0.0.1:{srv.port}"
        body = json.dumps({
            "generator_model_type": "SD 1.5", "mode": "text_to_image",
            "parameters": {"prompt": "a fox", "H": 64, "W": 64,
                           "sampling_steps": 2, "sampler": "Euler",
                           "seed": 3, "n_samples": 8,
                           "safety_check": False, "watermark": False},
        }).encode()
        req = urllib.request.Request(
            url + "/v1/generate", data=body, method="POST",
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req, timeout=30).read())
        assert out["job_id"] == 1
        imgs, done = [], False
        end = time.time() + 180
        while time.time() < end and not done:
            time.sleep(0.3)
            msgs = json.loads(urllib.request.urlopen(
                url + "/v1/status", timeout=30).read())["messages"]
            for m in msgs:
                if isinstance(m, dict) and "image_b64" in m:
                    imgs.append(m)
                if isinstance(m, dict) and "job_done" in m:
                    assert m["job_done"]["ok"], m["job_done"]
                    done = True
        assert done and len(imgs) == 8
    finally:
        srv.stop()


@pytest.mark.slow
def test_flux_pp_through_engine_worker_e2e(mesh8):
    """A DiT family's FULL generate() — CLIP text-encode -> scanned flow
    sampler -> VAE decode -> PNG bytes — under pipeline parallelism on
    the 8-device CPU mesh, driven through the EngineWorker + HTTP
    serving path, with parity against the single-device run (VERDICT r3
    item 4: multi-device E2E beyond the flagship conv family)."""
    import base64

    from PIL import Image

    from cremage_tpu.app.backends import _opts_from_params
    from cremage_tpu.app.server import ApiServer
    from cremage_tpu.app.worker import EngineWorker
    from cremage_tpu.core.config import GMT_FLUX_1_SCHNELL, GenerationOptions
    from cremage_tpu.io.metadata import image_from_array
    from tests.test_sd3_flux import make_flux_pipeline

    opts = GenerationOptions(
        prompt="a fox", negative_prompt="", H=64, W=64, sampling_steps=2,
        seed=3, n_samples=2, n_iter=1, safety_check=False, watermark=False)

    # single-device baseline (uint8, exactly the worker's PNG encoding)
    plain = make_flux_pipeline().generate(opts)
    base_u8 = [np.asarray(image_from_array(im)) for im, _ in plain]

    pipe = make_flux_pipeline()
    pipe.use_mesh_pp(jax.devices()[:2])

    worker = EngineWorker()

    def factory():
        def generate(params, status_cb, result_cb):
            pipe.generate(_opts_from_params(params), status_cb=status_cb,
                          result_cb=result_cb)
        return generate

    worker.register_backend(GMT_FLUX_1_SCHNELL, factory)
    srv = ApiServer(worker=worker, port=0)
    srv.start()
    try:
        url = f"http://127.0.0.1:{srv.port}"
        body = json.dumps({
            "generator_model_type": GMT_FLUX_1_SCHNELL,
            "mode": "text_to_image",
            "parameters": {"prompt": "a fox", "H": 64, "W": 64,
                           "sampling_steps": 2, "seed": 3, "n_samples": 2,
                           "safety_check": False, "watermark": False},
        }).encode()
        req = urllib.request.Request(
            url + "/v1/generate", data=body, method="POST",
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=30).read()
        imgs, done = [], False
        end = time.time() + 300
        while time.time() < end and not done:
            time.sleep(0.3)
            msgs = json.loads(urllib.request.urlopen(
                url + "/v1/status", timeout=30).read())["messages"]
            for m in msgs:
                if isinstance(m, dict) and "image_b64" in m:
                    import io as _io

                    png = base64.b64decode(m["image_b64"])
                    imgs.append(np.asarray(
                        Image.open(_io.BytesIO(png)).convert("RGB")))
                if isinstance(m, dict) and "job_done" in m:
                    assert m["job_done"]["ok"], m["job_done"]
                    done = True
        assert done and len(imgs) == 2
        # PP float parity is ~2e-5 (test_flux_pipeline_pp_matches_plain);
        # through uint8 PNG encoding that is at most one quantization step
        for got, want in zip(imgs, base_u8):
            assert got.shape == want.shape == (64, 64, 3)
            assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    finally:
        srv.stop()


@pytest.mark.slow
@pytest.mark.core
def test_sdxl_dp_equivalence(mesh8):
    """SDXLPipeline.use_mesh (batch-sharded DP over the 8-device mesh,
    the deployment behind the north-star ≥2 img/s = 8 x per-chip lane):
    dual-tower conditioning -> EDM sampler -> VAE decode matches the
    single-device run (VERDICT r4 item 4's DP leg)."""
    from tests.conftest import assert_img01_close
    from tests.test_edm_sdxl import make_sdxl_bundle, xl_opts
    from cremage_tpu.pipelines.sdxl import SDXLPipeline

    opts = xl_opts(n_samples=8)
    base = SDXLPipeline(make_sdxl_bundle()).generate(opts)
    imgs_base = np.stack([im for im, _ in base])

    pipe = SDXLPipeline(make_sdxl_bundle()).use_mesh(mesh8)
    out = pipe.generate(opts)
    imgs_dp = np.stack([im for im, _ in out])

    assert imgs_dp.shape == imgs_base.shape == (8, 64, 64, 3)
    # GSPMD may reorder fp32 reductions; uint8-quantized outputs must
    # agree within one quantization step + drift
    assert_img01_close(imgs_dp, imgs_base, float_tol=2e-3)


@pytest.mark.slow
@pytest.mark.core
def test_sdxl_pp_through_engine_worker_e2e(mesh8):
    """The NORTH-STAR family's FULL generate() — dual-tower (CLIP-L +
    OpenCLIP bigG) conditioning -> EulerEDM sampler -> VAE decode ->
    PNG bytes — under pipeline parallelism on the 8-device CPU mesh,
    driven through EngineWorker + HTTP, uint8 parity vs the
    single-device run (VERDICT r4 item 4, mirroring the FLUX leg)."""
    import base64
    import io as _io

    from PIL import Image

    from cremage_tpu.app.backends import _opts_from_params
    from cremage_tpu.app.server import ApiServer
    from cremage_tpu.app.worker import EngineWorker
    from cremage_tpu.core.config import GMT_SDXL
    from cremage_tpu.io.metadata import image_from_array
    from tests.test_edm_sdxl import make_sdxl_bundle, xl_opts

    from cremage_tpu.pipelines.sdxl import SDXLPipeline

    opts = xl_opts(n_samples=2)
    plain = SDXLPipeline(make_sdxl_bundle()).generate(opts)
    base_u8 = [np.asarray(image_from_array(im)) for im, _ in plain]

    pipe = SDXLPipeline(make_sdxl_bundle())
    pipe.use_mesh_pp(jax.devices()[:2])

    worker = EngineWorker()

    def factory():
        def generate(params, status_cb, result_cb):
            pipe.generate(_opts_from_params(params), status_cb=status_cb,
                          result_cb=result_cb)
        return generate

    worker.register_backend(GMT_SDXL, factory)
    srv = ApiServer(worker=worker, port=0)
    srv.start()
    try:
        url = f"http://127.0.0.1:{srv.port}"
        body = json.dumps({
            "generator_model_type": GMT_SDXL,
            "mode": "text_to_image",
            "parameters": {
                "prompt": "a dog", "negative_prompt": "ugly",
                "H": 64, "W": 64, "sampling_steps": 3, "seed": 11,
                "scale": 5.0, "sampler": "EulerEDMSampler",
                "guider": "VanillaCFG",
                "discretization": "LegacyDDPMDiscretization",
                "n_samples": 2, "safety_check": False,
                "watermark": False},
        }).encode()
        req = urllib.request.Request(
            url + "/v1/generate", data=body, method="POST",
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=30).read()
        imgs, done = [], False
        end = time.time() + 600
        while time.time() < end and not done:
            time.sleep(0.3)
            msgs = json.loads(urllib.request.urlopen(
                url + "/v1/status", timeout=30).read())["messages"]
            for m in msgs:
                if isinstance(m, dict) and "image_b64" in m:
                    png = base64.b64decode(m["image_b64"])
                    imgs.append(np.asarray(
                        Image.open(_io.BytesIO(png)).convert("RGB")))
                if isinstance(m, dict) and "job_done" in m:
                    assert m["job_done"]["ok"], m["job_done"]
                    done = True
        assert done and len(imgs) == 2
        # PP float parity ~2e-3 at tiny widths (see
        # test_sdxl_pipeline_pp_matches_plain); through uint8 PNG
        # encoding allow the same tolerance in 0-255 space
        for got, want in zip(imgs, base_u8):
            assert got.shape == want.shape == (64, 64, 3)
            assert np.abs(got.astype(int) - want.astype(int)).max() <= 2
    finally:
        srv.stop()
