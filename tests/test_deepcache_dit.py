"""DeepCache for the DiT families (Δ-cache over the back blocks).

The UNet DeepCache (tests/test_deepcache.py) splices a cached deep
hidden state back into the skip-connected decoder; a sequential DiT has
no skips, so the cached quantity is the residual DELTA the back blocks
add to the token stream (mode="capture" returns it, mode="shallow"
recomputes only the front `cache_depth` blocks and adds it back).

Contracts proven here, per family (MMDiT/SD3, PixArt-Σ, Hunyuan-DiT,
FLUX):
- capture mode is bit-identical to the full forward (same compute);
- splicing the captured delta at the same input reproduces the full
  output (float-assoc tolerance only);
- the flow-Euler DC sampler at interval=1 is bit-identical to the
  plain sampler;
- the product pipelines accept deep_cache and take the shallow branch;
- unsupported combinations (sampler without a DC scan, use_mesh_sp)
  are rejected with actionable errors.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.core.config import GenerationOptions
from cremage_tpu.samplers import deepcache as DC
from cremage_tpu.samplers import flow as F


# ---------------- model-level capture/shallow contracts --------------------


def _mmdit_case():
    from tests.test_sd3_flux import tiny_mmdit, T5_HID, L_HID, G_HID

    m, params = tiny_mmdit()
    k = jax.random.split(jax.random.key(7), 3)
    args = (jax.random.normal(k[0], (2, 8, 8, 16)), jnp.full((2,), 500.0),
            jax.random.normal(k[1], (2, 154, T5_HID)),
            jax.random.normal(k[2], (2, L_HID + G_HID)))
    return m, params, args, 1


def _pixart_case():
    from tests.test_pixart import tiny_pixart, T5D

    m, params = tiny_pixart()
    k = jax.random.split(jax.random.key(8), 2)
    args = (jax.random.normal(k[0], (2, 8, 8, 4)), jnp.full((2,), 400.0),
            jax.random.normal(k[1], (2, 10, T5D)))
    return m, params, args, 1


def _hunyuan_case():
    from cremage_tpu.models.hunyuan import HunyuanConfig, HunyuanDiT

    cfg = HunyuanConfig(hidden_size=32, depth=4, num_heads=4, clip_dim=24,
                        mt5_dim=24, mlp_ratio=2.0, dtype=jnp.float32)
    m = HunyuanDiT(cfg)
    k = jax.random.split(jax.random.key(9), 3)
    args = (jax.random.normal(k[0], (2, 8, 8, 4)), jnp.full((2,), 300.0),
            jax.random.normal(k[1], (2, 7, 24)),
            jax.random.normal(k[2], (2, 7, 24)))
    params = m.init(jax.random.key(0), *args)
    return m, params, args, 2


def _flux_case():
    from tests.test_sequence_parallel import _tiny_flux

    m, params, args = _tiny_flux()  # depth_double=2: cache_depth<=2
    return m, params, args, 1


CASES = {"mmdit": _mmdit_case, "pixart": _pixart_case,
         "hunyuan": _hunyuan_case, "flux": _flux_case}


@pytest.mark.parametrize("family", sorted(CASES))
def test_dit_capture_is_full_and_shallow_splices(family):
    m, params, args, depth = CASES[family]()
    full = np.asarray(m.apply(params, *args))
    cap, delta = m.apply(params, *args, mode="capture", cache_depth=depth)
    # capture does the same compute as full — bitwise identical output
    np.testing.assert_array_equal(np.asarray(cap), full)
    assert delta.dtype == jnp.float32
    # splicing the delta at the same input reproduces the full output
    sh = m.apply(params, *args, mode="shallow", deep=delta,
                 cache_depth=depth)
    np.testing.assert_allclose(np.asarray(sh), full, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("family", sorted(CASES))
def test_dit_shallow_depends_on_delta(family):
    """The shallow forward must actually use the cache: zero delta must
    move the output (guards against the splice being optimized away)."""
    m, params, args, depth = CASES[family]()
    full = np.asarray(m.apply(params, *args))
    _, delta = m.apply(params, *args, mode="capture", cache_depth=depth)
    sh0 = m.apply(params, *args, mode="shallow",
                  deep=jnp.zeros_like(delta), cache_depth=depth)
    assert np.abs(np.asarray(sh0) - full).max() > 1e-4


def test_dit_cache_depth_validated():
    m, params, args, _ = CASES["mmdit"]()
    with pytest.raises(AssertionError, match="cache_depth"):
        m.apply(params, *args, mode="capture", cache_depth=2)  # depth==2
    m, params, args, _ = CASES["hunyuan"]()
    with pytest.raises(AssertionError, match="cache_depth"):
        m.apply(params, *args, mode="capture", cache_depth=3)  # half==2


# ---------------- flow-Euler DC sampler ------------------------------------


def _toy_velocity():
    w = jax.random.normal(jax.random.key(1), (4, 4)) * 0.2

    def v(x, sigma):
        return jnp.tanh(x @ w) + sigma * 0.1

    def v_cap(x, sigma):
        return v(x, sigma), (x.sum() * 0.0 + sigma)[None]

    def v_sh(x, sigma, deep):
        return v(x, sigma) + 0.0 * deep[0]

    return v, v_cap, v_sh


def test_flow_euler_dc_interval_one_bitexact():
    v, v_cap, v_sh = _toy_velocity()
    sig = F.flow_sigmas(5, shift=3.0)
    x = jax.random.normal(jax.random.key(2), (2, 8, 4)) * 2.0
    plain = F.sample_flow_euler(v, x, sig)
    carry = DC.make_dc_denoise(v_cap, v_sh, interval=1)
    dc = DC.sample_flow_euler_dc(carry, jnp.zeros((1,), jnp.float32), x, sig)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(dc))


def test_flow_euler_dc_interval_two_takes_shallow():
    v, v_cap, _ = _toy_velocity()

    def v_sh_biased(x, sigma, deep):
        return v(x, sigma) + 1.0

    sig = F.flow_sigmas(6, shift=3.0)
    x = jax.random.normal(jax.random.key(2), (1, 4, 4))
    plain = F.sample_flow_euler(v, x, sig)
    carry = DC.make_dc_denoise(v_cap, v_sh_biased, interval=2)
    dc = DC.sample_flow_euler_dc(carry, jnp.zeros((1,), jnp.float32), x, sig)
    out = np.asarray(dc)
    assert np.isfinite(out).all()
    assert np.abs(out - np.asarray(plain)).max() > 1e-3


# ---------------- product pipelines -----------------------------------------


def _gen_opts(**kw):
    base = dict(prompt="a cat", negative_prompt="bad", H=64, W=64,
                sampling_steps=4, seed=5, scale=4.0, safety_check=False,
                watermark=False)
    base.update(kw)
    return GenerationOptions(**base)


def test_sd3_pipeline_deep_cache():
    from tests.test_sd3_flux import make_sd3_bundle
    from cremage_tpu.pipelines.sd3 import SD3Pipeline

    pipe = SD3Pipeline(make_sd3_bundle())
    plain = pipe.generate(_gen_opts())[0][0]
    dc = pipe.generate(_gen_opts(deep_cache=2))[0][0]
    assert np.isfinite(dc).all()
    assert dc.shape == plain.shape
    assert np.abs(dc - plain).max() > 0


def test_flux_pipeline_deep_cache():
    from tests.test_sd3_flux import make_flux_pipeline

    pipe = make_flux_pipeline()
    plain = pipe.generate(_gen_opts())[0][0]
    dc = pipe.generate(_gen_opts(deep_cache=2))[0][0]
    assert np.isfinite(dc).all()
    assert np.abs(dc - plain).max() > 0


def test_pixart_pipeline_deep_cache():
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
    dc = pipe.generate(_gen_opts(sampler="DPM++ 2M", deep_cache=2))[0][0]
    assert np.isfinite(dc).all()
    assert np.abs(dc - plain).max() > 0
    # sampler without a DC scan is rejected, not silently exact
    with pytest.raises(ValueError, match="deep_cache requires"):
        pipe.generate(_gen_opts(sampler="DPM++ 2S A", deep_cache=2))


def test_hunyuan_pipeline_deep_cache():
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
    plain = pipe.generate(_gen_opts(sampler="DPM++ 2M"))[0][0]
    dc = pipe.generate(_gen_opts(sampler="DPM++ 2M", deep_cache=2,
                                 deep_cache_branch=2))[0][0]
    assert np.isfinite(dc).all()
    assert np.abs(dc - plain).max() > 0


# deep_cache + use_mesh_sp COMPOSE since the Δ-cache rides token-sharded
# (the former rejection test lived here; the composition is proven by
# tests/test_sequence_parallel.py's SP+DC parity tests for all four
# DiT families).
