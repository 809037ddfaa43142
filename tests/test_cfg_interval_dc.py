"""Guidance interval × DeepCache composition (the windowed carry
denoiser, samplers/deepcache.py::make_dc_denoise_windowed).

Semantics proven here:
1. window_flags: host-static membership from the sigma schedule.
2. Branch selection + cache halves at the unit level: a hand-stepped
   run over a mixed window checks, per step, that the right one of the
   four branches ran (encoded in output values), that a cond-only
   capture refreshes ONLY the cond half of the 2B cache, and that the
   first in-window step is forced to a full 2B capture (so an in-window
   shallow step never reads a stale uncond half).
3. An all-covering window is bit-identical to plain DeepCache (the
   forced-capture schedule degenerates to i % interval == 0).
4. Pipeline level: SD1.5 / SDXL / SD3 generate() with deep_cache=2 and
   a covering interval reproduce the DC-only image; a mid-run interval
   runs, is deterministic, and differs from DC-only.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.samplers import deepcache as DC


# ---------------------------------------------------------------------------
# window_flags
# ---------------------------------------------------------------------------

def test_window_flags():
    sig = [14.6, 8.0, 4.0, 1.0, 0.1, 0.0]   # 5 steps + trailing zero
    np.testing.assert_array_equal(
        DC.window_flags(sig, (0.5, 8.0)), [False, True, True, True, False])
    np.testing.assert_array_equal(
        DC.window_flags(sig, (0.0, 1000.0)), [True] * 5)
    np.testing.assert_array_equal(
        DC.window_flags(sig, (1e-6, 1e-5)), [False] * 5)


# ---------------------------------------------------------------------------
# unit level: branch selection and cache coherence
# ---------------------------------------------------------------------------

def _toy_closures():
    """Four closures whose outputs encode which branch ran and which
    cache values were read.  Batch B=1; the 2B cache is shape (2,):
    [uncond_slot, cond_slot]."""

    def cap2(x, s):       # full CFG capture: refreshes both halves
        return jnp.full_like(x, 100.0 + s), jnp.stack([s + 0.5, s])

    def sh2(x, s, deep):  # full CFG shallow: reads both halves
        return jnp.full_like(x, 300.0 + 1000.0 * deep[0] + deep[1])

    def cap1(x, s):       # cond-only capture: cond half only
        return jnp.full_like(x, 200.0 + s), jnp.full((1,), s)

    def sh1(x, s, deep):  # cond-only shallow: reads the cond half
        assert deep.shape == (1,)
        return jnp.full_like(x, 400.0 + deep[0])

    return cap2, sh2, cap1, sh1


def test_windowed_branch_schedule_and_cache_halves():
    cap2, sh2, cap1, sh1 = _toy_closures()
    # 6 steps, interval 2, window covers steps 2-4 (entered at 2):
    #   i=0 out cap  -> cond capture   (cache cond half <- s0)
    #   i=1 out sh   -> cond shallow   (reads cond half s0)
    #   i=2 in  cap  -> FULL capture   (i%2==0 AND forced entry)
    #   i=3 in  sh   -> full shallow   (reads both halves from s2)
    #   i=4 in  cap  -> full capture
    #   i=5 out sh   -> cond shallow   (reads cond half from s4)
    window = np.array([False, False, True, True, True, False])
    carry = DC.make_dc_denoise_windowed(cap2, sh2, cap1, sh1, 2, window,
                                        batch=1)
    sigmas = [10.0, 9.0, 8.0, 7.0, 6.0, 5.0]
    x = jnp.zeros((1, 2), jnp.float32)
    cache = jnp.zeros((2,), jnp.float32)

    outs = []
    for i, s in enumerate(sigmas):
        den, cache = carry(x, jnp.asarray(s, jnp.float32), cache,
                           jnp.asarray(i))
        outs.append(float(den[0, 0]))

    assert outs[0] == pytest.approx(200.0 + 10.0)          # cond capture
    assert outs[1] == pytest.approx(400.0 + 10.0)          # cond shallow(s0)
    assert outs[2] == pytest.approx(100.0 + 8.0)           # FULL capture
    # full shallow reads [s2+0.5, s2] = [8.5, 8.0]
    assert outs[3] == pytest.approx(300.0 + 1000.0 * 8.5 + 8.0)
    assert outs[4] == pytest.approx(100.0 + 6.0)           # full capture
    assert outs[5] == pytest.approx(400.0 + 6.0)           # cond shallow(s4)
    # final cache: full capture at i=4 wrote [6.5, 6.0]
    np.testing.assert_allclose(np.asarray(cache), [6.5, 6.0])


def test_windowed_entry_forces_capture_even_off_interval():
    """Window entry on an odd step (not an i % interval == 0 step) must
    still run a FULL capture, refreshing the stale uncond half."""
    cap2, sh2, cap1, sh1 = _toy_closures()
    window = np.array([False, True, True, False])
    carry = DC.make_dc_denoise_windowed(cap2, sh2, cap1, sh1, 2, window,
                                        batch=1)
    x = jnp.zeros((1, 1), jnp.float32)
    cache = jnp.zeros((2,), jnp.float32)
    den0, cache = carry(x, jnp.asarray(9.0), cache, jnp.asarray(0))
    den1, cache = carry(x, jnp.asarray(7.0), cache, jnp.asarray(1))
    assert float(den1[0, 0]) == pytest.approx(100.0 + 7.0)  # forced FULL
    np.testing.assert_allclose(np.asarray(cache), [7.5, 7.0])
    # i=2 is an interval step -> full capture as usual
    den2, cache = carry(x, jnp.asarray(5.0), cache, jnp.asarray(2))
    assert float(den2[0, 0]) == pytest.approx(100.0 + 5.0)
    # i=3 out-of-window shallow reads the cond half written at i=2
    den3, cache = carry(x, jnp.asarray(3.0), cache, jnp.asarray(3))
    assert float(den3[0, 0]) == pytest.approx(400.0 + 5.0)


def test_covering_window_equals_plain_dc():
    cap2, sh2, cap1, sh1 = _toy_closures()
    n = 7
    window = np.ones(n, bool)
    gated = DC.make_dc_denoise_windowed(cap2, sh2, cap1, sh1, 3, window,
                                        batch=1)
    plain = DC.make_dc_denoise(cap2, sh2, 3)
    x = jnp.zeros((1, 2), jnp.float32)
    cache_g = cache_p = jnp.zeros((2,), jnp.float32)
    for i in range(n):
        s = jnp.asarray(10.0 - i, jnp.float32)
        dg, cache_g = gated(x, s, cache_g, jnp.asarray(i))
        dp, cache_p = plain(x, s, cache_p, jnp.asarray(i))
        np.testing.assert_array_equal(np.asarray(dg), np.asarray(dp))
    np.testing.assert_array_equal(np.asarray(cache_g), np.asarray(cache_p))


# ---------------------------------------------------------------------------
# pipeline level
# ---------------------------------------------------------------------------

def test_sd15_dc_covering_interval_equals_dc():
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    pipe = SD15Pipeline(make_bundle())
    o = dict(sampler="Euler", sampling_steps=4, deep_cache=2)
    (img0, _), = pipe.generate(base_opts(**o))
    (img1, _), = pipe.generate(base_opts(
        **o, cfg_interval_low=0.0, cfg_interval_high=1000.0))
    np.testing.assert_allclose(img1, img0, atol=2e-5)


def test_sd15_dc_mid_interval_runs_and_differs():
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    pipe = SD15Pipeline(make_bundle())
    o = dict(sampler="Euler", sampling_steps=4, deep_cache=2,
             cfg_interval_low=0.5, cfg_interval_high=8.0)
    (img0, _), = pipe.generate(base_opts(sampler="Euler", sampling_steps=4,
                                         deep_cache=2))
    (img1, meta), = pipe.generate(base_opts(**o))
    (img2, _), = pipe.generate(base_opts(**o))
    np.testing.assert_array_equal(img1, img2)
    assert np.abs(img1.astype(np.float32) - img0.astype(np.float32)).max() > 0
    assert meta["deep_cache"] == 2 and meta["cfg_interval_high"] == 8.0


def test_sd15_dc_tome_cfgi_stack_runs():
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    pipe = SD15Pipeline(make_bundle())
    (img, _), = pipe.generate(base_opts(
        sampler="Euler A", sampling_steps=4, deep_cache=2, tome_ratio=0.5,
        cfg_interval_low=0.5, cfg_interval_high=8.0))
    assert img.shape == (64, 64, 3)


def test_sdxl_dc_covering_interval_equals_dc():
    from tests.test_edm_sdxl import make_sdxl_bundle, xl_opts
    from cremage_tpu.pipelines.sdxl import SDXLPipeline

    pipe = SDXLPipeline(make_sdxl_bundle())
    (img0, _), = pipe.generate(xl_opts(deep_cache=2))
    (img1, _), = pipe.generate(xl_opts(deep_cache=2, cfg_interval_low=0.0,
                                       cfg_interval_high=1000.0))
    np.testing.assert_allclose(img1, img0, atol=2e-5)


def test_sdxl_dc_mid_interval_runs(tmp_path):
    from tests.test_edm_sdxl import make_sdxl_bundle, xl_opts
    from cremage_tpu.pipelines.sdxl import SDXLPipeline

    pipe = SDXLPipeline(make_sdxl_bundle())
    (img0, _), = pipe.generate(xl_opts(deep_cache=2))
    (img1, _), = pipe.generate(xl_opts(deep_cache=2, cfg_interval_low=0.5,
                                       cfg_interval_high=8.0))
    assert np.abs(img1.astype(np.float32) - img0.astype(np.float32)).max() > 0


def test_pixart_dc_covering_interval_equals_dc_and_plain_interval():
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from cremage_tpu.pipelines.pixart import PixArtBundle, PixArtPipeline
    from tests.test_pixart import tiny_pixart, T5D

    m, params = tiny_pixart()
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                  num_res_blocks=1, dtype=jnp.float32))
    vp = vae.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))
    pipe = PixArtPipeline(PixArtBundle(
        dit=m, dit_params=params, t5=None, t5_tokenize=None, t5_len=10,
        vae=vae, vae_params=vp, t5_dim=T5D))

    # the t5-less bundle encodes every prompt to zeros, making CFG a
    # no-op (cond == uncond) — substitute distinct fake encodings so
    # the guidance interval has something to gate
    def fake_encode(prompt):
        rng = np.random.RandomState(abs(hash(prompt)) % (2**31))
        return rng.randn(10, T5D).astype(np.float32)

    pipe._encode_text = fake_encode

    def opts(**kw):
        d = dict(prompt="a cat", negative_prompt="bad", H=64, W=64,
                 sampling_steps=4, seed=5, scale=4.0, safety_check=False,
                 watermark=False, sampler="Euler A")
        d.update(kw)
        return GenerationOptions(**d)

    # non-DC: covering interval == plain CFG
    (img0, _), = pipe.generate(opts())
    (img1, _), = pipe.generate(opts(cfg_interval_low=0.0,
                                    cfg_interval_high=1000.0))
    np.testing.assert_allclose(img1, img0, atol=2e-5)
    # DC: covering interval == DC-only
    (dc0, _), = pipe.generate(opts(deep_cache=2))
    (dc1, _), = pipe.generate(opts(deep_cache=2, cfg_interval_low=0.0,
                                   cfg_interval_high=1000.0))
    np.testing.assert_allclose(dc1, dc0, atol=2e-5)
    # mid-run interval with DC runs and differs
    (dc2, _), = pipe.generate(opts(deep_cache=2, cfg_interval_low=0.5,
                                   cfg_interval_high=8.0))
    assert np.isfinite(dc2).all()
    assert np.abs(dc2.astype(np.float32) - dc0.astype(np.float32)).max() > 0


def test_hunyuan_dc_covering_interval_equals_dc():
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.models.hunyuan import HunyuanConfig, HunyuanDiT
    from cremage_tpu.pipelines.hunyuan import HunyuanBundle, HunyuanPipeline
    from tests.test_family_pipelines import tiny_vae

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
    pipe = HunyuanPipeline(HunyuanBundle(dit=dit, dit_params=dp, vae=vae,
                                         vae_params=vp,
                                         text_encode=text_encode))

    def opts(**kw):
        d = dict(prompt="a cat", negative_prompt="bad", H=64, W=64,
                 sampling_steps=4, seed=5, scale=4.0, safety_check=False,
                 watermark=False, sampler="Euler A", deep_cache=2,
                 deep_cache_branch=2)
        d.update(kw)
        return GenerationOptions(**d)

    (img0, _), = pipe.generate(opts())
    (img1, _), = pipe.generate(opts(cfg_interval_low=0.0,
                                    cfg_interval_high=1000.0))
    np.testing.assert_allclose(img1, img0, atol=2e-5)


def test_kandinsky_dc_covering_interval_equals_dc():
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.pipelines.kandinsky import KandinskyPipeline
    from tests.test_family_pipelines import make_kandinsky

    pipe = KandinskyPipeline(make_kandinsky())

    def opts(**kw):
        d = dict(prompt="a cat", negative_prompt="bad", H=64, W=64,
                 sampling_steps=4, n_samples=1, seed=7, scale=4.0,
                 sampler="Euler A", safety_check=False, watermark=False,
                 deep_cache=2, deep_cache_branch=2)
        d.update(kw)
        return GenerationOptions(**d)

    # the kandinsky decoder's squaredcos schedule tops out at sigma
    # ~2e4, so "covering" needs a much higher bound than the SD ranges
    (img0, _), = pipe.generate(opts())
    (img1, _), = pipe.generate(opts(cfg_interval_low=0.0,
                                    cfg_interval_high=1e9))
    np.testing.assert_allclose(img1, img0, atol=2e-5)
    # non-DC covering interval == plain as well
    (p0, _), = pipe.generate(opts(deep_cache=1))
    (p1, _), = pipe.generate(opts(deep_cache=1, cfg_interval_low=0.0,
                                  cfg_interval_high=1e9))
    np.testing.assert_allclose(p1, p0, atol=2e-5)
    # and a window excluding the huge first sigma genuinely differs
    (m0, _), = pipe.generate(opts(cfg_interval_low=0.0,
                                  cfg_interval_high=1000.0))
    assert np.abs(m0.astype(np.float32) - img0.astype(np.float32)).max() > 0


def test_cascade_dc_covering_interval_equals_dc():
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.models.cascade import (
        StageB, StageBConfig, StageC, StageCConfig,
    )
    from cremage_tpu.pipelines.cascade import CascadeBundle, CascadePipeline
    from tests.test_family_pipelines import tiny_vae

    TD = 24
    sc = StageC(StageCConfig(c_hidden=(32, 64), blocks=(1, 1), num_heads=4,
                             c_cond=32, clip_text_dim=TD,
                             clip_text_pooled_dim=TD, dtype=jnp.float32))
    scp = sc.init(jax.random.key(0), jnp.zeros((1, 2, 2, 16)),
                  jnp.zeros((1,)), jnp.zeros((1, 7, TD)), jnp.zeros((1, TD)))
    sb = StageB(StageBConfig(c_hidden=(16, 32), blocks=(1, 1), num_heads=4,
                             c_cond=32, clip_text_pooled_dim=TD,
                             attn_levels=(1,), down_repeats=(1, 1),
                             up_repeats=(1, 1), dtype=jnp.float32))
    sbp = sb.init(jax.random.key(1), jnp.zeros((1, 8, 8, 4)),
                  jnp.zeros((1,)), jnp.zeros((1, 8, 8, 16)),
                  jnp.zeros((1, TD)))
    vae, vp = tiny_vae()

    def text_encode(prompt):
        rng = np.random.RandomState(abs(hash(prompt)) % (2**31))
        return (rng.randn(7, TD).astype(np.float32),
                rng.randn(TD).astype(np.float32))

    pipe = CascadePipeline(CascadeBundle(
        stage_c=sc, stage_c_params=scp, stage_b=sb, stage_b_params=sbp,
        vqgan=vae, vqgan_params=vp, text_encode=text_encode,
        c_compression=32, b_compression=8))

    def opts(**kw):
        d = dict(prompt="a cat", negative_prompt="bad", H=64, W=64,
                 sampling_steps=4, n_samples=1, seed=7, scale=4.0,
                 sampler="Euler A", safety_check=False, watermark=False,
                 deep_cache=2, deep_cache_branch=2)
        d.update(kw)
        return GenerationOptions(**d)

    (img0, _), = pipe.generate(opts())
    (img1, _), = pipe.generate(opts(cfg_interval_low=0.0,
                                    cfg_interval_high=1000.0))
    np.testing.assert_allclose(img1, img0, atol=2e-5)


def test_sd3_dc_covering_interval_equals_dc():
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.pipelines.sd3 import SD3Pipeline
    from tests.test_sd3_flux import make_sd3_bundle

    pipe = SD3Pipeline(make_sd3_bundle())

    def opts(**kw):
        d = dict(prompt="a cat", negative_prompt="bad", H=64, W=64,
                 sampling_steps=4, seed=5, scale=4.0, safety_check=False,
                 deep_cache=2)
        d.update(kw)
        return GenerationOptions(**d)

    (img0, _), = pipe.generate(opts())
    # flow time lives in (0, 1]: (0, 1000) covers every step
    (img1, _), = pipe.generate(opts(cfg_interval_low=0.0,
                                    cfg_interval_high=1000.0))
    np.testing.assert_allclose(img1, img0, atol=2e-5)
