"""Adaptive step caching (samplers/adacache.py, TeaCache family).

Invariants proven here:
1. threshold=0 never skips — bit-identical to the plain kdiffusion /
   flow scans (same keys, same step math) through the DC cache-threading
   samplers.
2. the on-device accumulate/skip schedule matches a numpy oracle that
   replays the exact indicator math step by step (both kinds), for a
   threshold that produces a mixed full/skip schedule.
3. step 0 and the final step are always full (forced mask), even at an
   effectively-infinite threshold.
4. the pipelines run end-to-end with ada_cache>0, and reject the
   documented invalid combinations with actionable errors.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.core.config import GenerationOptions
from cremage_tpu.samplers import adacache as AC
from cremage_tpu.samplers import deepcache as DC
from cremage_tpu.samplers import kdiffusion as K


def toy_denoise(x, sigma):
    # cheap analytic "model" with nontrivial x- and sigma-dependence
    return x * jax.nn.sigmoid(jnp.float32(0.3)) / (1.0 + sigma * 0.01)


# ---------------------------------------------------------------------------
# 1. threshold=0 == plain sampler, bitwise
# ---------------------------------------------------------------------------

@pytest.mark.smoke
@pytest.mark.parametrize("name", ["Euler", "Euler A", "DPM++ 2M"])
def test_threshold_zero_bitexact(name):
    sigmas = np.array([10.0, 5.0, 2.0, 1.0, 0.0])
    x = jax.random.normal(jax.random.key(3), (2, 8, 8, 4)) * 10.0
    key = jax.random.key(9)
    plain_fn = {"Euler": K.sample_euler, "Euler A": K.sample_euler_ancestral,
                "DPM++ 2M": K.sample_dpmpp_2m}
    plain = plain_fn[name](toy_denoise, x, sigmas, key=key)
    carry = AC.make_ada_denoise(toy_denoise, 0.0, len(sigmas) - 1,
                                kind="den")
    out = DC.DC_SAMPLERS[name](carry, AC.ada_cache0(x), x, sigmas, key=key)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(out))


def test_threshold_zero_bitexact_flow():
    from cremage_tpu.samplers import flow as F

    def v_fn(x, sigma):
        return -x * (0.2 + 0.1 * sigma)

    sigmas = np.array([1.0, 0.7, 0.4, 0.2, 0.0])
    x = jax.random.normal(jax.random.key(4), (1, 16, 8))
    plain = F.sample_flow_euler(v_fn, x, sigmas)
    carry = AC.make_ada_denoise(v_fn, 0.0, len(sigmas) - 1, kind="flow")
    out = DC.sample_flow_euler_dc(carry, AC.ada_cache0(x), x, sigmas)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(out))


# ---------------------------------------------------------------------------
# 2. numpy oracle: the traced accumulate/skip schedule is exactly the
#    documented algorithm
# ---------------------------------------------------------------------------

def _euler_ada_oracle(x0, sigmas, threshold, kind):
    """float32 numpy replay of make_ada_denoise under the s_churn=0
    Euler body (sample_euler_dc with no churn)."""
    x = np.asarray(x0, np.float32)
    n = len(sigmas) - 1
    u_prev = np.zeros_like(x)
    acc = np.float32(0.0)
    d_prev = np.zeros_like(x)
    schedule = []
    for i in range(n):
        sig = np.float32(sigmas[i])
        if kind == "den":
            u = x / np.sqrt(sig * sig + np.float32(1.0), dtype=np.float32)
        else:
            u = x
        rel = np.float32(
            np.sum(np.abs(u - u_prev)) / (np.sum(np.abs(u_prev)) + 1e-12))
        acc2 = acc + rel
        forced = i == 0 or i == n - 1
        skip = bool(acc2 < threshold) and not forced
        if skip:
            den = x - sig * d_prev if kind == "den" else d_prev
            acc = acc2
        else:
            if kind == "den":
                den = np.asarray(
                    toy_denoise(jnp.asarray(x), jnp.float32(sig)),
                    np.float32)
                d_prev = (x - den) / sig
            else:
                den = -x * (np.float32(0.2) + np.float32(0.1) * sig)
                d_prev = den
            acc = np.float32(0.0)
        u_prev = u
        schedule.append("skip" if skip else "full")
        # Euler body (den kind) / flow Euler body (flow kind)
        if kind == "den":
            d = (x - den) / sig
            x = x + d * np.float32(sigmas[i + 1] - sigmas[i])
        else:
            x = x + np.float32(sigmas[i + 1] - sigmas[i]) * den
    return x, schedule


def test_oracle_mixed_schedule_den():
    sigmas = np.array([10.0, 7.0, 5.0, 3.5, 2.0, 1.0, 0.3, 0.0])
    x = jax.random.normal(jax.random.key(7), (1, 8, 8, 4)) * 10.0
    threshold = 0.25
    ref, schedule = _euler_ada_oracle(np.asarray(x), sigmas, threshold,
                                      "den")
    # the chosen threshold must exercise BOTH branches mid-run
    assert "skip" in schedule[1:-1] and "full" in schedule[1:-1], schedule
    carry = AC.make_ada_denoise(toy_denoise, threshold, len(sigmas) - 1,
                                kind="den")
    out = DC.sample_euler_dc(carry, AC.ada_cache0(x), x, sigmas)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_oracle_mixed_schedule_flow():
    def v_fn(x, sigma):
        return -x * (0.2 + 0.1 * sigma)

    sigmas = np.linspace(1.0, 0.0, 9)
    x = jax.random.normal(jax.random.key(8), (1, 24, 6)) * 2.0
    threshold = 0.08
    ref, schedule = _euler_ada_oracle(np.asarray(x), sigmas, threshold,
                                      "flow")
    assert "skip" in schedule[1:-1] and "full" in schedule[1:-1], schedule
    carry = AC.make_ada_denoise(v_fn, threshold, len(sigmas) - 1,
                                kind="flow")
    out = DC.sample_flow_euler_dc(carry, AC.ada_cache0(x), x, sigmas)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_forced_first_and_last_full_at_huge_threshold():
    """threshold=inf-ish: every unforced step skips — the run must equal
    the oracle whose schedule is [full, skip, ..., skip, full]."""
    sigmas = np.array([10.0, 6.0, 3.0, 1.5, 0.7, 0.0])
    x = jax.random.normal(jax.random.key(9), (1, 4, 4, 4)) * 10.0
    ref, schedule = _euler_ada_oracle(np.asarray(x), sigmas, 1e9, "den")
    assert schedule == ["full", "skip", "skip", "skip", "full"]
    carry = AC.make_ada_denoise(toy_denoise, 1e9, len(sigmas) - 1,
                                kind="den")
    out = DC.sample_euler_dc(carry, AC.ada_cache0(x), x, sigmas)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
    # and the skipping trajectory genuinely differs from never-skipping
    base = K.sample_euler(toy_denoise, x, sigmas)
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-4


def test_validation_errors():
    with pytest.raises(ValueError, match="kind"):
        AC.make_ada_denoise(toy_denoise, 0.1, 4, kind="eps")
    with pytest.raises(ValueError, match="threshold"):
        AC.make_ada_denoise(toy_denoise, -0.1, 4)


# ---------------------------------------------------------------------------
# 4. pipelines
# ---------------------------------------------------------------------------

def test_sd15_pipeline_ada_cache():
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    pipe = SD15Pipeline(make_bundle())
    plain = pipe.generate(base_opts(sampling_steps=5))[0][0]
    ada = pipe.generate(base_opts(sampling_steps=5, ada_cache=1e9))[0][0]
    assert np.isfinite(ada).all()
    assert ada.shape == plain.shape
    # mid steps skipped at an infinite threshold -> trajectories diverge
    assert np.abs(ada.astype(np.float32) - plain.astype(np.float32)).max() > 0
    # reproducible under caching of the jitted program
    ada2 = pipe.generate(base_opts(sampling_steps=5, ada_cache=1e9))[0][0]
    np.testing.assert_allclose(ada, ada2)


def test_sd15_ada_cache_rejections():
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    pipe = SD15Pipeline(make_bundle())
    with pytest.raises(ValueError, match="ada_cache requires"):
        pipe.generate(base_opts(sampler="DDIM", ada_cache=0.2))
    with pytest.raises(ValueError, match="at most one"):
        pipe.generate(base_opts(ada_cache=0.2, deep_cache=2))


def test_sdxl_pipeline_ada_cache():
    from tests.test_edm_sdxl import make_sdxl_bundle, xl_opts
    from cremage_tpu.pipelines.sdxl import SDXLPipeline

    pipe = SDXLPipeline(make_sdxl_bundle())
    plain = pipe.generate(xl_opts(sampling_steps=5))[0][0]
    ada = pipe.generate(xl_opts(sampling_steps=5, ada_cache=1e9))[0][0]
    assert np.isfinite(ada).all()
    assert ada.shape == plain.shape
    assert np.abs(ada.astype(np.float32) - plain.astype(np.float32)).max() > 0
    with pytest.raises(ValueError, match="ada_cache requires"):
        pipe.generate(xl_opts(sampler="HeunEDMSampler", ada_cache=0.2))
    with pytest.raises(ValueError, match="VanillaCFG"):
        pipe.generate(xl_opts(guider="IdentityGuider", ada_cache=0.2))


def _gen_opts(**kw):
    base = dict(prompt="a cat", negative_prompt="bad", H=64, W=64,
                sampling_steps=4, seed=5, scale=4.0, safety_check=False,
                watermark=False)
    base.update(kw)
    return GenerationOptions(**base)


def test_sd3_pipeline_ada_cache():
    from tests.test_sd3_flux import make_sd3_bundle
    from cremage_tpu.pipelines.sd3 import SD3Pipeline

    pipe = SD3Pipeline(make_sd3_bundle())
    plain = pipe.generate(_gen_opts())[0][0]
    ada = pipe.generate(_gen_opts(ada_cache=1e9))[0][0]
    assert np.isfinite(ada).all()
    assert np.abs(ada.astype(np.float32) - plain.astype(np.float32)).max() > 0
    with pytest.raises(ValueError, match="at most one"):
        pipe.generate(_gen_opts(ada_cache=0.2, deep_cache=2))


def test_svd_pipeline_ada_cache():
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
    frames = pipe.sample(img, SVDOptions(num_frames=T, num_steps=4, seed=4,
                                         ada_cache=1e9))
    assert frames.shape == (T, 64, 64, 3)
    assert np.isfinite(frames).all()
    with pytest.raises(ValueError, match="at most one"):
        pipe.sample(img, SVDOptions(num_frames=T, num_steps=4, seed=4,
                                    ada_cache=0.2, deep_cache=2))


def test_kandinsky_pipeline_ada_cache():
    from tests.test_family_pipelines import make_kandinsky, opts
    from cremage_tpu.pipelines.kandinsky import KandinskyPipeline

    pipe = KandinskyPipeline(make_kandinsky())
    o = dict(sampler="Euler A", sampling_steps=4)
    plain = pipe.generate(opts(**o))[0][0]
    ada = pipe.generate(opts(**o, ada_cache=1e9))[0][0]
    assert np.isfinite(ada).all()
    assert np.abs(ada.astype(np.float32) - plain.astype(np.float32)).max() > 0
    with pytest.raises(ValueError, match="at most one"):
        pipe.generate(opts(**o, ada_cache=0.2, deep_cache=2))


def test_cascade_pipeline_ada_cache():
    from tests.test_family_pipelines import (TD, fake_text_encode, opts,
                                             tiny_vae)
    from cremage_tpu.models.unet import UNetModel
    from cremage_tpu.pipelines.cascade import (
        CascadeBundle, CascadePipeline, stage_b_config, stage_c_config)

    ccfg = stage_c_config(text_dim=TD, dtype=jnp.float32, model_channels=32,
                          num_res_blocks=1, num_heads=4)
    sc = UNetModel(ccfg)
    scp = sc.init(jax.random.key(0), jnp.zeros((1, 2, 2, 16)),
                  jnp.zeros((1,)), jnp.zeros((1, 7, TD)), jnp.zeros((1, TD)))
    bcfg = stage_b_config(dtype=jnp.float32, model_channels=32,
                          num_res_blocks=1, num_heads=4,
                          attention_resolutions=(2,), channel_mult=(1, 2),
                          transformer_depth=(1, 1), context_dim=TD)
    sb = UNetModel(bcfg)
    sbp = sb.init(jax.random.key(1), jnp.zeros((1, 16, 16, 20)),
                  jnp.zeros((1,)), jnp.zeros((1, 7, TD)))
    vae, vp = tiny_vae()
    bundle = CascadeBundle(stage_c=sc, stage_c_params=scp, stage_b=sb,
                           stage_b_params=sbp, vqgan=vae, vqgan_params=vp,
                           text_encode=fake_text_encode,
                           c_compression=32, b_compression=8)
    pipe = CascadePipeline(bundle)
    plain = pipe.generate(opts(sampling_steps=4))[0][0]
    ada = pipe.generate(opts(sampling_steps=4, ada_cache=1e9))[0][0]
    assert np.isfinite(ada).all()
    assert np.abs(ada.astype(np.float32) - plain.astype(np.float32)).max() > 0
    with pytest.raises(ValueError, match="at most one"):
        pipe.generate(opts(sampling_steps=4, ada_cache=0.2, deep_cache=2))


def test_flux_pipeline_ada_cache():
    from tests.test_sd3_flux import make_flux_pipeline

    pipe = make_flux_pipeline()
    plain = pipe.generate(_gen_opts())[0][0]
    ada = pipe.generate(_gen_opts(ada_cache=1e9))[0][0]
    assert np.isfinite(ada).all()
    assert np.abs(ada.astype(np.float32) - plain.astype(np.float32)).max() > 0


def test_pixart_pipeline_ada_cache():
    from tests.test_pixart import tiny_pixart, T5D
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from cremage_tpu.pipelines.pixart import PixArtBundle, PixArtPipeline

    m, params = tiny_pixart()
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                  num_res_blocks=1, dtype=jnp.float32))
    vp = vae.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))
    bundle = PixArtBundle(dit=m, dit_params=params, t5=None,
                          t5_tokenize=None, t5_len=10, vae=vae,
                          vae_params=vp, t5_dim=T5D)
    pipe = PixArtPipeline(bundle)
    plain = pipe.generate(_gen_opts(sampler="DPM++ 2M"))[0][0]
    ada = pipe.generate(_gen_opts(sampler="DPM++ 2M", ada_cache=1e9))[0][0]
    assert np.isfinite(ada).all()
    assert np.abs(ada.astype(np.float32) - plain.astype(np.float32)).max() > 0
    with pytest.raises(ValueError, match="ada_cache requires"):
        pipe.generate(_gen_opts(sampler="DPM++ 2S A", ada_cache=0.2))


def test_hunyuan_pipeline_ada_cache():
    from tests.test_family_pipelines import tiny_vae
    from cremage_tpu.models.hunyuan import HunyuanConfig, HunyuanDiT
    from cremage_tpu.pipelines.hunyuan import HunyuanBundle, HunyuanPipeline

    cfg = HunyuanConfig(hidden_size=32, depth=4, num_heads=4, clip_dim=24,
                        mt5_dim=24, mlp_ratio=2.0, dtype=jnp.float32)
    dit = HunyuanDiT(cfg)
    dp = dit.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
                  jnp.zeros((1,)), jnp.zeros((1, 7, 24)),
                  jnp.zeros((1, 7, 24)))

    def text_encode(prompt):
        rng = np.random.RandomState(abs(hash(prompt)) % (2**31))
        return (rng.randn(7, 24).astype(np.float32),
                rng.randn(7, 24).astype(np.float32))

    vae, vp = tiny_vae()
    bundle = HunyuanBundle(dit=dit, dit_params=dp, vae=vae, vae_params=vp,
                           text_encode=text_encode)
    pipe = HunyuanPipeline(bundle)
    plain = pipe.generate(_gen_opts(sampler="Euler"))[0][0]
    ada = pipe.generate(_gen_opts(sampler="Euler", ada_cache=1e9))[0][0]
    assert np.isfinite(ada).all()
    assert np.abs(ada.astype(np.float32) - plain.astype(np.float32)).max() > 0
    with pytest.raises(ValueError, match="at most one"):
        pipe.generate(_gen_opts(ada_cache=0.2, deep_cache=2))


# ---------------------------------------------------------------------------
# 5. calibrated rescale polynomial (tools/fit_adacache.py registry)
# ---------------------------------------------------------------------------

def test_rescale_identity_matches_uncalibrated():
    """rescale=(1, 0) is the identity polynomial — bit-identical to the
    uncalibrated indicator."""
    sigmas = np.array([10.0, 5.0, 2.0, 1.0, 0.0])
    x = jax.random.normal(jax.random.key(3), (2, 8, 8, 4)) * 10.0
    key = jax.random.key(9)
    a = AC.make_ada_denoise(toy_denoise, 0.25, len(sigmas) - 1, kind="den")
    b = AC.make_ada_denoise(toy_denoise, 0.25, len(sigmas) - 1, kind="den",
                            rescale=(1.0, 0.0))
    out_a = DC.DC_SAMPLERS["Euler"](a, AC.ada_cache0(x), x, sigmas, key=key)
    out_b = DC.DC_SAMPLERS["Euler"](b, AC.ada_cache0(x), x, sigmas, key=key)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_rescale_zero_maps_to_max_skipping():
    """A polynomial that maps every input change to 0 keeps the
    accumulator at 0, so only the forced (first/last) steps run the full
    model — must equal the effectively-infinite-threshold run."""
    sigmas = np.array([10.0, 5.0, 2.0, 1.0, 0.0])
    x = jax.random.normal(jax.random.key(5), (1, 8, 8, 4)) * 10.0
    key = jax.random.key(11)
    zero = AC.make_ada_denoise(toy_denoise, 0.1, len(sigmas) - 1,
                               kind="den", rescale=(0.0,))
    inf = AC.make_ada_denoise(toy_denoise, 1e9, len(sigmas) - 1,
                              kind="den")
    out_z = DC.DC_SAMPLERS["Euler"](zero, AC.ada_cache0(x), x, sigmas,
                                    key=key)
    out_i = DC.DC_SAMPLERS["Euler"](inf, AC.ada_cache0(x), x, sigmas,
                                    key=key)
    np.testing.assert_array_equal(np.asarray(out_z), np.asarray(out_i))


def test_load_calibration_registry(tmp_path, monkeypatch):
    import json

    p = tmp_path / "calib.json"
    p.write_text(json.dumps({"sd15": [0.1, 0.9, 0.0]}))
    monkeypatch.setenv("CREMAGE_ADACACHE_CALIB", str(p))
    assert AC.load_calibration("sd15") == (0.1, 0.9, 0.0)
    assert AC.load_calibration("sdxl") is None
    monkeypatch.setenv("CREMAGE_ADACACHE_CALIB",
                       str(tmp_path / "missing.json"))
    assert AC.load_calibration("sd15") is None
