"""Guidance interval (Kynkäänniemi et al. 2024, arXiv:2404.07724).

`cfg_interval_low/high` restricts CFG to noise levels lo <= sigma <= hi;
outside the interval the conditional model runs alone on the single
batch (the uncond half is skipped via `lax.cond`, not masked).

Invariants proven here:
1. Wrapper level (cfg_denoiser / cfg_velocity / vanilla_cfg): inside the
   interval the output equals the plain CFG combination; outside it
   equals the conditional-only model call — both checked against
   hand-computed expectations, and the skipped branch provably sees the
   single batch (a batch-recording model).
2. Pipeline level (SD1.5): an interval covering every sampled sigma
   reproduces the exact no-interval image (same math, cond-routed);
   an interval excluding every sigma reproduces the scale=1.0
   (uncond-free) image.
3. Composition rules: t-driven samplers (DDIM), use_mesh_pp and FLUX
   reject the option with actionable errors.  deep_cache COMPOSES via
   the windowed carry denoiser — covered in test_cfg_interval_dc.py.
4. The option round-trips the job-dict/metadata path like any other
   GenerationOptions field.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.core.config import GenerationOptions
from cremage_tpu.samplers.denoiser import cfg_denoiser, cfg_interval_of


# ---------------------------------------------------------------------------
# option parsing
# ---------------------------------------------------------------------------

def test_cfg_interval_of():
    assert cfg_interval_of(GenerationOptions()) is None
    assert cfg_interval_of(GenerationOptions(cfg_interval_high=0.0)) is None
    assert cfg_interval_of(
        GenerationOptions(cfg_interval_low=2.0, cfg_interval_high=1.0)) is None
    assert cfg_interval_of(
        GenerationOptions(cfg_interval_low=0.3, cfg_interval_high=6.0)
    ) == (0.3, 6.0)
    with pytest.raises(ValueError, match="cfg_interval_low"):
        cfg_interval_of(GenerationOptions(cfg_interval_low=-1.0,
                                          cfg_interval_high=6.0))


# ---------------------------------------------------------------------------
# wrapper level
# ---------------------------------------------------------------------------

def _toy_denoise():
    """denoise(x, sigma, cond) that depends on cond and records batch."""
    seen = []

    def denoise(x, sigma, cond):
        seen.append(x.shape[0])
        return x * 0.5 + cond[:, None, None, None] + sigma[:, None, None, None]

    return denoise, seen


def test_cfg_denoiser_interval_branches():
    denoise, seen = _toy_denoise()
    c = jnp.asarray([1.0])
    uc = jnp.asarray([-1.0])
    x = jnp.ones((1, 4, 4, 2), jnp.float32)
    scale = 7.0

    plain = cfg_denoiser(denoise, c, uc, scale)
    gated = cfg_denoiser(denoise, c, uc, scale, interval=(0.5, 2.0))

    # inside the interval: identical to plain CFG
    for s in (0.5, 1.0, 2.0):
        np.testing.assert_array_equal(
            np.asarray(gated(x, jnp.asarray(s))),
            np.asarray(plain(x, jnp.asarray(s))))

    # outside: equals the conditional-only call
    for s in (0.49, 2.01, 14.6):
        want = denoise(x, jnp.full((1,), s, jnp.float32), c)
        np.testing.assert_array_equal(np.asarray(gated(x, jnp.asarray(s))),
                                      np.asarray(want))


def test_cfg_denoiser_interval_skips_uncond_batch():
    """Under jit the skipped step executes the single-batch branch."""
    denoise, _ = _toy_denoise()
    c = jnp.asarray([1.0])
    uc = jnp.asarray([-1.0])
    gated = cfg_denoiser(denoise, c, uc, 7.0, interval=(0.5, 2.0))
    x = jnp.ones((1, 4, 4, 2), jnp.float32)

    fn = jax.jit(lambda xx, ss: gated(xx, ss))
    lo = np.asarray(fn(x, jnp.asarray(0.1)))
    hi = np.asarray(fn(x, jnp.asarray(1.0)))
    # cond-only at sigma=.1: .5 + 1 + .1; CFG at 1.0:
    # uc-side .5 - 1 + 1 = .5, c-side .5 + 1 + 1 = 2.5 -> .5 + 7*2 = 14.5
    np.testing.assert_allclose(lo, 1.6, atol=1e-6)
    np.testing.assert_allclose(hi, 14.5, atol=1e-6)


def test_cfg_velocity_interval():
    from cremage_tpu.samplers.flow import cfg_velocity

    def v_fn(x, sigma, cond):
        return x + cond[:, None, None]

    c = jnp.asarray([2.0])
    uc = jnp.asarray([0.5])
    x = jnp.ones((1, 3, 2), jnp.float32)
    plain = cfg_velocity(v_fn, c, uc, 4.0)
    gated = cfg_velocity(v_fn, c, uc, 4.0, interval=(0.4, 1.0))
    np.testing.assert_array_equal(np.asarray(gated(x, 0.7)),
                                  np.asarray(plain(x, 0.7)))
    want = v_fn(x, jnp.full((1,), 0.2), c)
    np.testing.assert_array_equal(np.asarray(gated(x, 0.2)),
                                  np.asarray(want))


def test_vanilla_cfg_interval():
    from cremage_tpu.samplers.edm import vanilla_cfg

    def denoiser(x, sigma, cond):
        return x * 0.1 + cond["vector"][:, :, None, None]

    c = {"vector": jnp.asarray([[1.0]]), "crossattn": jnp.zeros((1, 2, 3))}
    uc = {"vector": jnp.asarray([[-2.0]]), "crossattn": jnp.zeros((1, 2, 3))}
    x = jnp.ones((1, 4, 4, 1), jnp.float32)
    plain = vanilla_cfg(denoiser, c, uc, 3.0)
    gated = vanilla_cfg(denoiser, c, uc, 3.0, interval=(1.0, 8.0))
    np.testing.assert_array_equal(np.asarray(gated(x, 2.0)),
                                  np.asarray(plain(x, 2.0)))
    want = denoiser(x, jnp.full((1,), 0.1), c)
    np.testing.assert_array_equal(np.asarray(gated(x, 0.1)),
                                  np.asarray(want))


# ---------------------------------------------------------------------------
# pipeline level (SD1.5)
# ---------------------------------------------------------------------------

def test_sd15_interval_covering_equals_plain():
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    pipe = SD15Pipeline(make_bundle())
    (img0, _), = pipe.generate(base_opts(sampler="Euler"))
    # k-sigma range is ~[0.03, 14.6]: (0, 1000) covers every step
    (img1, meta), = pipe.generate(base_opts(
        sampler="Euler", cfg_interval_low=0.0, cfg_interval_high=1000.0))
    np.testing.assert_allclose(img1, img0, atol=2e-5)
    assert meta["cfg_interval_high"] == 1000.0


def test_sd15_interval_excluding_equals_uncond_free():
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    pipe = SD15Pipeline(make_bundle())
    (img0, _), = pipe.generate(base_opts(sampler="Euler", scale=1.0))
    # an interval below sigma_min: every step runs cond-only
    (img1, _), = pipe.generate(base_opts(
        sampler="Euler", scale=7.5,
        cfg_interval_low=1e-6, cfg_interval_high=1e-5))
    np.testing.assert_allclose(img1, img0, atol=2e-5)


def test_sd15_interval_mid_run_differs_and_is_deterministic():
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    pipe = SD15Pipeline(make_bundle())
    opts = base_opts(sampler="Euler", sampling_steps=4,
                     cfg_interval_low=0.5, cfg_interval_high=8.0)
    (img0, _), = pipe.generate(base_opts(sampler="Euler", sampling_steps=4))
    (img1, _), = pipe.generate(opts)
    (img2, _), = pipe.generate(opts)
    np.testing.assert_array_equal(img1, img2)
    assert np.abs(img1.astype(np.float32) - img0.astype(np.float32)).max() > 0


def test_sd15_interval_rejections():
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    pipe = SD15Pipeline(make_bundle())
    with pytest.raises(ValueError, match="t-driven"):
        pipe.generate(base_opts(sampler="DDIM", cfg_interval_low=0.5,
                                cfg_interval_high=8.0))


def test_flux_rejects_interval():
    from tests.test_sd3_flux import make_flux_pipeline

    pipe = make_flux_pipeline()
    opts = GenerationOptions(prompt="x", H=64, W=64, sampling_steps=2,
                             seed=1, safety_check=False,
                             cfg_interval_low=0.1, cfg_interval_high=0.9)
    with pytest.raises(ValueError, match="distilled"):
        pipe.generate(opts)


# ---------------------------------------------------------------------------
# SDXL pipeline level
# ---------------------------------------------------------------------------

def test_sdxl_interval_covering_equals_plain():
    from tests.test_edm_sdxl import make_sdxl_bundle, xl_opts
    from cremage_tpu.pipelines.sdxl import SDXLPipeline

    pipe = SDXLPipeline(make_sdxl_bundle())
    (img0, _), = pipe.generate(xl_opts())
    (img1, _), = pipe.generate(xl_opts(cfg_interval_low=0.0,
                                       cfg_interval_high=1000.0))
    np.testing.assert_allclose(img1, img0, atol=2e-5)


# ---------------------------------------------------------------------------
# end-to-end job path (HTTP-shaped dict -> worker -> backend -> PNG)
# ---------------------------------------------------------------------------

def test_cfg_interval_rides_the_job_path(monkeypatch):
    import io
    import json
    import queue
    import time

    from PIL import Image

    from cremage_tpu.app import backends as B
    from cremage_tpu.app.worker import (EngineWorker,
                                        MP_MESSAGE_TYPE_INFERENCE)
    from cremage_tpu.core.config import Preferences
    from tests.test_pipeline_sd15 import make_bundle

    bundle = make_bundle()
    monkeypatch.setattr(
        "cremage_tpu.pipelines.loader.load_sd15_bundle",
        lambda *a, **k: bundle,
    )
    w = EngineWorker()
    B.register_default_backends(w, Preferences())
    w.start()
    w.submit({
        "type": MP_MESSAGE_TYPE_INFERENCE,
        "generator_model_type": "SD 1.5",
        "mode": "text_to_image",
        "parameters": {
            "prompt": "a small cat", "H": 64, "W": 64,
            "sampling_steps": 2, "seed": 9, "sampler": "Euler",
            "ckpt": "tiny.safetensors", "safety_check": False,
            "cfg_interval_low": 0.5, "cfg_interval_high": 8.0,
        },
    })
    msgs = []
    end = time.time() + 240
    while time.time() < end:
        try:
            m = w.status_queue.get(timeout=1.0)
        except queue.Empty:
            continue
        msgs.append(m)
        if isinstance(m, dict) and "job_done" in m:
            break
    w.stop()
    done = [m for m in msgs if isinstance(m, dict) and "job_done" in m]
    assert done and done[0]["job_done"]["ok"], done
    results = [m for m in msgs if isinstance(m, dict) and "image" in m]
    assert len(results) == 1
    img = Image.open(io.BytesIO(results[0]["image"]))
    # the option round-trips into the PNG replay metadata
    meta = json.loads(img.info["generation_data"])
    assert meta["cfg_interval_low"] == 0.5
    assert meta["cfg_interval_high"] == 8.0


def test_sdxl_interval_rejections():
    from tests.test_edm_sdxl import make_sdxl_bundle, xl_opts
    from cremage_tpu.pipelines.sdxl import SDXLPipeline

    pipe = SDXLPipeline(make_sdxl_bundle())
    with pytest.raises(ValueError, match="VanillaCFG"):
        pipe.generate(xl_opts(guider="IdentityGuider",
                              cfg_interval_low=0.5, cfg_interval_high=8.0))
