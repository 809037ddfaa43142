"""DeepCache (samplers/deepcache.py + UNet capture/shallow modes).

Invariants proven here:
1. capture mode returns exactly the full-mode output (plus the deep
   tensor) for every legal cache boundary.
2. shallow mode fed the capture tensor from the SAME (x, t) reproduces
   the full output exactly — the split is lossless by construction.
3. the dc sampler scans with interval=1 are bit-identical to the plain
   kdiffusion scans (same keys, same step math).
4. the SD1.5 / SDXL pipelines run end-to-end with deep_cache=2 and
   reject unsupported combinations with actionable errors.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.models.unet import UNetConfig, UNetModel
from cremage_tpu.samplers import deepcache as DC
from cremage_tpu.samplers import kdiffusion as K


def tiny_unet(channel_mult=(1, 2, 4)):
    cfg = UNetConfig(
        model_channels=32, num_res_blocks=1, attention_resolutions=(1, 2),
        channel_mult=channel_mult, num_heads=4, context_dim=32,
        transformer_depth=(1,) * len(channel_mult),
        transformer_depth_middle=1, dtype=jnp.float32,
    )
    m = UNetModel(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 4))
    t = jnp.array([3.0, 7.0])
    ctx = jax.random.normal(jax.random.key(1), (2, 77, 32))
    params = m.init(jax.random.key(2), x, t, ctx)
    return m, params, x, t, ctx


@pytest.mark.parametrize("cache_levels", [1, 2])
def test_capture_and_shallow_are_exact(cache_levels):
    m, params, x, t, ctx = tiny_unet()
    full = m.apply(params, x, t, ctx)
    out_cap, deep = m.apply(params, x, t, ctx, mode="capture",
                            cache_levels=cache_levels)
    np.testing.assert_array_equal(np.asarray(out_cap), np.asarray(full))
    out_sh = m.apply(params, x, t, ctx, mode="shallow", deep=deep,
                     cache_levels=cache_levels)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(full),
                               atol=1e-6)


def test_shallow_requires_deep_and_valid_levels():
    m, params, x, t, ctx = tiny_unet()
    with pytest.raises(AssertionError):
        m.apply(params, x, t, ctx, mode="shallow", cache_levels=1)
    with pytest.raises(AssertionError):
        m.apply(params, x, t, ctx, mode="capture", cache_levels=3)


def test_shallow_differs_at_other_t():
    """At a different timestep the shallow output is an approximation —
    it must differ from the true full output (the deep path saw old t)
    but stay finite and same-shaped."""
    m, params, x, t, ctx = tiny_unet()
    _, deep = m.apply(params, x, t, ctx, mode="capture", cache_levels=1)
    t2 = t + 5.0
    full2 = m.apply(params, x, t2, ctx)
    sh2 = m.apply(params, x, t2, ctx, mode="shallow", deep=deep,
                  cache_levels=1)
    assert np.isfinite(np.asarray(sh2)).all()
    assert sh2.shape == full2.shape
    assert np.abs(np.asarray(sh2) - np.asarray(full2)).max() > 0


# ---------------------------------------------------------------------------
# sampler scans: interval=1 must be bit-identical to the plain samplers
# ---------------------------------------------------------------------------

def toy_denoisers():
    """A cheap analytic 'model': den = x * sigmoid(w) with a deep aux."""
    w = jnp.float32(0.3)

    def denoise(x, sigma):
        return x * jax.nn.sigmoid(w) / (1.0 + sigma * 0.01)

    def denoise_capture(x, sigma):
        return denoise(x, sigma), jnp.sum(x).reshape(1)

    def denoise_shallow(x, sigma, deep):
        return denoise(x, sigma) + 0.0 * deep.sum()

    return denoise, denoise_capture, denoise_shallow


@pytest.mark.parametrize("name", ["Euler", "Euler A", "DPM++ 2M"])
def test_dc_interval_one_bitexact(name):
    denoise, cap, sh = toy_denoisers()
    sigmas = np.array([10.0, 5.0, 2.0, 1.0, 0.0])
    x = jax.random.normal(jax.random.key(3), (2, 8, 8, 4)) * 10.0
    key = jax.random.key(9)
    plain_fn = {"Euler": K.sample_euler, "Euler A": K.sample_euler_ancestral,
                "DPM++ 2M": K.sample_dpmpp_2m}
    plain = plain_fn[name](denoise, x, sigmas, key=key)
    carry = DC.make_dc_denoise(cap, sh, interval=1)
    cache0 = jnp.zeros((1,), jnp.float32)
    dc = DC.DC_SAMPLERS[name](carry, cache0, x, sigmas, key=key)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(dc))


def test_dc_dpmpp_2m_interval_two_runs_shallow_branch():
    """interval=2 on the multistep sampler: step 0 (outside the scan)
    captures, odd steps take the biased shallow branch — the trajectory
    must move and stay finite (cache threads across all three phases)."""
    denoise, cap, _ = toy_denoisers()

    def shallow_biased(x, sigma, deep):
        return denoise(x, sigma) + 1.0

    sigmas = np.array([10.0, 6.0, 3.0, 1.5, 0.7, 0.0])
    x = jax.random.normal(jax.random.key(3), (1, 4, 4, 4)) * 10.0
    base = K.sample_dpmpp_2m(denoise, x, sigmas)
    carry = DC.make_dc_denoise(cap, shallow_biased, interval=2)
    out = DC.sample_dpmpp_2m_dc(carry, jnp.zeros((1,), jnp.float32), x,
                                sigmas)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-3


def test_dc_interval_two_runs_shallow_branch():
    """With interval=2 the shallow fn must actually be taken on odd
    steps: make it diverge measurably and check the trajectory moves."""
    denoise, cap, _ = toy_denoisers()

    def shallow_biased(x, sigma, deep):
        return denoise(x, sigma) + 1.0   # visible bias on cached steps

    sigmas = np.array([10.0, 5.0, 2.0, 1.0, 0.0])
    x = jax.random.normal(jax.random.key(3), (1, 4, 4, 4)) * 10.0
    key = jax.random.key(9)
    base = K.sample_euler(denoise, x, sigmas, key=key)
    carry = DC.make_dc_denoise(cap, shallow_biased, interval=2)
    out = DC.sample_euler_dc(carry, jnp.zeros((1,), jnp.float32), x, sigmas,
                             key=key)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-3


# ---------------------------------------------------------------------------
# pipelines
# ---------------------------------------------------------------------------

def test_sd15_pipeline_deep_cache(tmp_path):
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    pipe = SD15Pipeline(make_bundle())
    plain = pipe.generate(base_opts(sampling_steps=4))[0][0]
    dc = pipe.generate(base_opts(sampling_steps=4, deep_cache=2))[0][0]
    assert np.isfinite(dc).all()
    assert dc.shape == plain.shape
    # first step is always a full step; trajectories diverge after
    assert np.abs(dc - plain).max() > 0

    # reproducible under caching of the jitted program
    dc2 = pipe.generate(base_opts(sampling_steps=4, deep_cache=2))[0][0]
    np.testing.assert_allclose(dc, dc2)


def test_sd15_deep_cache_rejects_unsupported():
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    pipe = SD15Pipeline(make_bundle())
    with pytest.raises(ValueError, match="deep_cache requires"):
        pipe.generate(base_opts(sampler="DDIM", deep_cache=2))


def test_sdxl_pipeline_deep_cache():
    from tests.test_edm_sdxl import make_sdxl_bundle, xl_opts
    from cremage_tpu.pipelines.sdxl import SDXLPipeline

    pipe = SDXLPipeline(make_sdxl_bundle())
    plain = pipe.generate(xl_opts(sampling_steps=4))[0][0]
    dc = pipe.generate(xl_opts(sampling_steps=4, deep_cache=2))[0][0]
    assert np.isfinite(dc).all()
    assert dc.shape == plain.shape
    assert np.abs(dc - plain).max() > 0


def test_video_unet_capture_shallow_exact():
    from tests.test_svd import CTX, T, tiny_video_unet

    m, params = tiny_video_unet()
    x = jax.random.normal(jax.random.key(5), (T, 8, 8, 8))
    t = jnp.full((T,), 3.0)
    ctx = jax.random.normal(jax.random.key(6), (T, 1, CTX))
    y = jax.random.normal(jax.random.key(7), (T, 768))
    full = m.apply(params, x, t, ctx, y)
    out_cap, deep = m.apply(params, x, t, ctx, y, mode="capture",
                            cache_levels=1)
    np.testing.assert_array_equal(np.asarray(out_cap), np.asarray(full))
    out_sh = m.apply(params, x, t, ctx, y, mode="shallow", deep=deep,
                     cache_levels=1)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(full),
                               atol=1e-6)


def test_svd_pipeline_deep_cache(tmp_path):
    from tests.test_svd import T, tiny_video_unet
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from cremage_tpu.pipelines.svd import SVDBundle, SVDOptions, SVDPipeline

    m, params = tiny_video_unet()
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                  num_res_blocks=1, dtype=jnp.float32))
    vp = vae.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))
    pipe = SVDPipeline(SVDBundle(unet=m, unet_params=params, vae=vae,
                                 vae_params=vp))
    img = np.random.RandomState(0).uniform(
        0, 1, (64, 64, 3)).astype(np.float32)
    frames = pipe.sample(img, SVDOptions(num_frames=T, num_steps=3, seed=4,
                                         deep_cache=2))
    assert frames.shape == (T, 64, 64, 3)
    assert np.isfinite(frames).all()


def test_sdxl_deep_cache_rejects_unsupported():
    from tests.test_edm_sdxl import make_sdxl_bundle, xl_opts
    from cremage_tpu.pipelines.sdxl import SDXLPipeline

    pipe = SDXLPipeline(make_sdxl_bundle())
    with pytest.raises(ValueError, match="deep_cache requires"):
        pipe.generate(xl_opts(sampler="HeunEDMSampler", deep_cache=2))
    with pytest.raises(ValueError, match="VanillaCFG"):
        pipe.generate(xl_opts(guider="IdentityGuider", deep_cache=2))


def test_sd15_pipeline_deep_cache_dpmpp2m():
    """DeepCache through the product path on the multistep sampler."""
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    pipe = SD15Pipeline(make_bundle())
    plain = pipe.generate(base_opts(sampler="DPM++ 2M",
                                    sampling_steps=4))[0][0]
    dc = pipe.generate(base_opts(sampler="DPM++ 2M", sampling_steps=4,
                                 deep_cache=2))[0][0]
    assert np.isfinite(dc).all()
    assert dc.shape == plain.shape
    assert np.abs(dc - plain).max() > 0


def test_sdxl_pipeline_deep_cache_dpmpp2m():
    from tests.test_edm_sdxl import make_sdxl_bundle, xl_opts
    from cremage_tpu.pipelines.sdxl import SDXLPipeline

    pipe = SDXLPipeline(make_sdxl_bundle())
    plain = pipe.generate(xl_opts(sampler="DPMPP2MSampler",
                                  sampling_steps=4))[0][0]
    dc = pipe.generate(xl_opts(sampler="DPMPP2MSampler", sampling_steps=4,
                               deep_cache=2))[0][0]
    assert np.isfinite(dc).all()
    assert dc.shape == plain.shape
    assert np.abs(dc - plain).max() > 0


def test_sdxl_deep_cache_composes_with_refiner():
    """deep_cache applies to BOTH sampling stages: the base pass and the
    refiner's img2img pass go through the same _sampler_program, so the
    refiner UNet takes the capture/shallow split too (bucketed per UNet
    by id)."""
    from tests.test_edm_sdxl import make_sdxl_bundle, xl_opts
    from cremage_tpu.pipelines.sdxl import SDXLPipeline

    pipe = SDXLPipeline(make_sdxl_bundle(with_refiner=True))
    plain = pipe.generate(xl_opts(refiner_strength=0.3,
                                  sampling_steps=4))[0][0]
    dc = pipe.generate(xl_opts(refiner_strength=0.3, sampling_steps=4,
                               deep_cache=2))[0][0]
    assert np.isfinite(dc).all()
    assert dc.shape == plain.shape
    assert np.abs(dc - plain).max() > 0
