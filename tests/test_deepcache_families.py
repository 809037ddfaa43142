"""DeepCache for the last two families: Kandinsky decoder and Stable
Cascade (Stage B + Stage C).

Both are skip-UNets, so they take models/unet.py's capture/shallow
split (cached DEEP HIDDEN STATE, not the DiT delta): "capture" also
returns the hidden state entering up level cache_levels-1, "shallow"
reruns only resolution levels < cache_levels and splices it back in.
With this, every one of the nine model families supports `deep_cache`.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.core.config import GenerationOptions


def _kandinsky_unet():
    from cremage_tpu.models.kandinsky_decoder import (
        KandinskyUNet, KandinskyUNetConfig,
    )

    cfg = KandinskyUNetConfig(block_out_channels=(32, 64, 96),
                              layers_per_block=1, context_dim=16,
                              attention_head_dim=16, dtype=jnp.float32)
    m = KandinskyUNet(cfg)
    k = jax.random.split(jax.random.key(3), 3)
    args = (jax.random.normal(k[0], (2, 16, 16, 4)), jnp.array([3.0, 9.0]),
            jax.random.normal(k[1], (2, 3, 16)),
            jax.random.normal(k[2], (2, cfg.time_embed_dim)))
    params = m.init(jax.random.key(0), *args)
    return m, params, args, 2


def _stage_c():
    from cremage_tpu.models.cascade import StageC, StageCConfig

    m = StageC(StageCConfig(c_hidden=(32, 64), blocks=(1, 1), num_heads=4,
                            c_cond=32, clip_text_dim=24,
                            clip_text_pooled_dim=24, dtype=jnp.float32))
    k = jax.random.split(jax.random.key(4), 3)
    args = (jax.random.normal(k[0], (2, 4, 4, 16)), jnp.array([0.3, 0.7]),
            jax.random.normal(k[1], (2, 7, 24)),
            jax.random.normal(k[2], (2, 24)))
    params = m.init(jax.random.key(0), *args)
    return m, params, args, 1


def _stage_b():
    from cremage_tpu.models.cascade import StageB, StageBConfig

    m = StageB(StageBConfig(c_hidden=(16, 32), blocks=(1, 1), num_heads=4,
                            c_cond=32, clip_text_pooled_dim=24,
                            attn_levels=(1,), down_repeats=(1, 1),
                            up_repeats=(1, 1), dtype=jnp.float32))
    k = jax.random.split(jax.random.key(5), 3)
    args = (jax.random.normal(k[0], (2, 8, 8, 4)), jnp.array([0.2, 0.8]),
            jax.random.normal(k[1], (2, 8, 8, 16)),
            jax.random.normal(k[2], (2, 24)))
    params = m.init(jax.random.key(0), *args)
    return m, params, args, 1


CASES = {"kandinsky": _kandinsky_unet, "stage_c": _stage_c,
         "stage_b": _stage_b}


@pytest.mark.parametrize("family", sorted(CASES))
def test_capture_and_shallow_are_exact(family):
    m, params, args, depth = CASES[family]()
    full = np.asarray(m.apply(params, *args))
    cap, deep = m.apply(params, *args, mode="capture", cache_levels=depth)
    np.testing.assert_array_equal(np.asarray(cap), full)
    sh = m.apply(params, *args, mode="shallow", deep=deep,
                 cache_levels=depth)
    np.testing.assert_allclose(np.asarray(sh), full, atol=1e-5)


@pytest.mark.parametrize("family", sorted(CASES))
def test_shallow_depends_on_deep(family):
    m, params, args, depth = CASES[family]()
    full = np.asarray(m.apply(params, *args))
    _, deep = m.apply(params, *args, mode="capture", cache_levels=depth)
    sh0 = m.apply(params, *args, mode="shallow",
                  deep=jnp.zeros_like(deep), cache_levels=depth)
    assert np.abs(np.asarray(sh0) - full).max() > 1e-4


def test_cache_levels_validated():
    m, params, args, _ = CASES["stage_c"]()
    with pytest.raises(AssertionError, match="cache_levels"):
        m.apply(params, *args, mode="capture", cache_levels=2)


def _gen_opts(**kw):
    d = dict(prompt="a cat", negative_prompt="bad", H=64, W=64,
             sampling_steps=4, n_samples=1, seed=7, scale=4.0,
             sampler="Euler A", safety_check=False, watermark=False)
    d.update(kw)
    return GenerationOptions(**d)


def test_kandinsky_pipeline_deep_cache():
    from tests.test_family_pipelines import make_kandinsky
    from cremage_tpu.pipelines.kandinsky import KandinskyPipeline

    pipe = KandinskyPipeline(make_kandinsky())
    plain = pipe.generate(_gen_opts())[0][0]
    # deep_cache_branch=3 exceeds the stand-in decoder's 2 levels and
    # must clamp, not crash
    dc = pipe.generate(_gen_opts(deep_cache=2, deep_cache_branch=3))[0][0]
    assert np.isfinite(dc).all()
    assert np.abs(dc - plain).max() > 0
    with pytest.raises(ValueError, match="deep_cache requires"):
        pipe.generate(_gen_opts(sampler="DPM++ 2S A", deep_cache=2))


def test_cascade_pipeline_deep_cache():
    from tests.test_family_pipelines import fake_text_encode, tiny_vae
    from cremage_tpu.models.cascade import (
        StageB, StageBConfig, StageC, StageCConfig,
    )
    from cremage_tpu.pipelines.cascade import CascadeBundle, CascadePipeline

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

    bundle = CascadeBundle(stage_c=sc, stage_c_params=scp, stage_b=sb,
                           stage_b_params=sbp, vqgan=vae, vqgan_params=vp,
                           text_encode=text_encode,
                           c_compression=32, b_compression=8)
    pipe = CascadePipeline(bundle)
    plain = pipe.generate(_gen_opts())[0][0]
    dc = pipe.generate(_gen_opts(deep_cache=2, deep_cache_branch=2))[0][0]
    assert np.isfinite(dc).all()
    assert dc.shape == plain.shape
    assert np.abs(dc - plain).max() > 0
