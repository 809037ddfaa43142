"""ToMe for the DiT families (one merge at the block-stack input).

The UNet integration (tests/test_tome.py) merges around attn1 only; a
DiT's FLOPs are dominated by per-token matmuls (MLPs, projections), so
the DiT integration merges ONCE after the patch/pos embedding, runs the
WHOLE block stack on the reduced stream, and unmerges the final
per-token projection output (ops/tome.py module docstring).

Contracts proven here:
- `select` (per-token side-data gather in merge slot order, used for
  RoPE tables) matches a numpy oracle;
- `apply_rope` accepts per-batch-row freq tables (the ToMe path) and
  matches the shared-table form when rows are tiled;
- PixArt/Hunyuan (self-attn over img tokens only): constant-input
  forward with ToMe is lossless — identical v rows make attention
  count-independent, so any deviation is a plumbing bug;
- FLUX/MMDiT (joint attention — count-dependent, so no losslessness):
  structural check instead: every merged src position receives exactly
  its dst token's output, so the unmerged output has exactly
  kept-many unique rows;
- a ratio that rounds to r=0 is bit-identical to the plain forward;
- the Δ-cache COMPOSES: it is stored in full-token space (capture
  unmerges the reduced delta, shallow re-merges it under the current
  step's plan), proven by a merge∘unmerge round-trip oracle, a
  capture/shallow splice contract, and a pipeline tome+deep_cache
  drive;
- product pipelines accept tome_ratio and reject the use_mesh_sp
  combination with an actionable error.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.core.config import GenerationOptions
from cremage_tpu.ops import tome


# ---------------- select / apply_rope oracles --------------------------------


def test_select_matches_numpy_oracle():
    k = jax.random.split(jax.random.key(0), 2)
    x = jax.random.normal(k[0], (2, 16, 6))
    metric = jax.random.normal(k[1], (2, 16, 6))
    plan = tome.build_plan(metric, 4, 4, r=5, offset=2)
    got = np.asarray(tome.select(plan, x))

    xs = np.asarray(x)
    src_idx = np.asarray(plan.src_idx)
    dst_idx = np.asarray(plan.dst_idx)
    unm_sel = np.asarray(plan.unm_sel)
    for b in range(2):
        want = np.concatenate(
            [xs[b][src_idx][unm_sel[b]], xs[b][dst_idx]], axis=0)
        np.testing.assert_array_equal(got[b], want)


def test_select_keeps_trailing_dims():
    x = jax.random.normal(jax.random.key(1), (1, 16, 3, 2))
    plan = tome.build_plan(x.reshape(1, 16, 6), 4, 4, r=4, offset=0)
    out = tome.select(plan, x)
    assert out.shape == (1, 12, 3, 2)


def test_apply_rope_batched_matches_unbatched():
    from cremage_tpu.models.flux import apply_rope, rope_freqs

    ids = np.stack([np.zeros(10), np.arange(10), np.arange(10) % 3], -1)
    freqs = jnp.asarray(rope_freqs(ids, (4, 6, 6), 10000.0))
    x = jax.random.normal(jax.random.key(2), (3, 10, 2, 16))
    a = apply_rope(x, freqs)
    b = apply_rope(x, jnp.broadcast_to(freqs[None], (3,) + freqs.shape))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------- model-level: lossless where provable ----------------------


def _tome_swap(m, ratio):
    return type(m)(dataclasses.replace(m.cfg, tome_ratio=ratio))


def test_pixart_tome_constant_input_lossless():
    from tests.test_pixart import tiny_pixart, T5D

    m, params = tiny_pixart()
    x = jnp.full((2, 8, 8, 4), 0.3)
    t = jnp.full((2,), 400.0)
    y = jax.random.normal(jax.random.key(3), (2, 10, T5D))
    # zero pos override keeps the token stream constant end to end
    pos = jnp.zeros((16, 64))
    full = m.apply(params, x, t, y, pos=pos)
    tm = _tome_swap(m, 0.5).apply(params, x, t, y, pos=pos)
    np.testing.assert_allclose(np.asarray(tm), np.asarray(full),
                               rtol=0, atol=1e-5)


def test_hunyuan_tome_constant_input_lossless():
    from cremage_tpu.models.hunyuan import HunyuanConfig, HunyuanDiT

    cfg = HunyuanConfig(hidden_size=32, depth=4, num_heads=4, clip_dim=24,
                        mt5_dim=24, mlp_ratio=2.0, dtype=jnp.float32)
    m = HunyuanDiT(cfg)
    k = jax.random.split(jax.random.key(4), 2)
    x = jnp.full((2, 8, 8, 4), -0.2)
    t = jnp.full((2,), 300.0)
    clip_t = jax.random.normal(k[0], (2, 7, 24))
    mt5_t = jax.random.normal(k[1], (2, 7, 24))
    params = m.init(jax.random.key(0), x, t, clip_t, mt5_t)
    full = m.apply(params, x, t, clip_t, mt5_t)
    # RoPE rotates only q/k; constant v rows keep self-attention exact
    tm = _tome_swap(m, 0.5).apply(params, x, t, clip_t, mt5_t)
    np.testing.assert_allclose(np.asarray(tm), np.asarray(full),
                               rtol=0, atol=1e-5)


# ---------------- model-level: structural where joint-attn ------------------


def _unique_rows(a):
    return np.unique(np.asarray(a), axis=0).shape[0]


def test_flux_tome_kept_many_unique_outputs():
    from tests.test_sequence_parallel import _tiny_flux

    m, params, args = _tiny_flux()          # 4x4 img grid, 16 tokens
    full = m.apply(params, *args)
    tm = _tome_swap(m, 0.5).apply(params, *args)   # r = 8, kept = 8
    assert tm.shape == full.shape
    assert np.isfinite(np.asarray(tm)).all()
    assert np.abs(np.asarray(tm) - np.asarray(full)).max() > 0
    # merged src positions receive exactly their dst's output row
    assert _unique_rows(np.asarray(tm)[0]) == 8
    assert _unique_rows(np.asarray(full)[0]) == 16


def test_mmdit_tome_kept_many_unique_outputs():
    from tests.test_sd3_flux import tiny_mmdit, T5_HID, L_HID, G_HID

    m, params = tiny_mmdit()
    k = jax.random.split(jax.random.key(7), 3)
    args = (jax.random.normal(k[0], (1, 8, 8, 16)), jnp.full((1,), 500.0),
            jax.random.normal(k[1], (1, 154, T5_HID)),
            jax.random.normal(k[2], (1, L_HID + G_HID)))
    full = m.apply(params, *args)
    tm = _tome_swap(m, 0.5).apply(params, *args)   # 16 tokens, r=8
    assert tm.shape == full.shape
    # output is (B, 8, 8, 16) unpatchified: re-patchify to token rows
    tok = np.asarray(tm).reshape(1, 4, 2, 4, 2, 16).transpose(
        0, 1, 3, 2, 4, 5).reshape(1, 16, 64)
    assert _unique_rows(tok[0]) == 8


def test_dit_tome_zero_r_is_bit_identical():
    from tests.test_sequence_parallel import _tiny_flux

    m, params, args = _tiny_flux()
    full = m.apply(params, *args)
    # int(16 * 0.01) == 0 -> plan None -> the exact plain program
    tm = _tome_swap(m, 0.01).apply(params, *args)
    np.testing.assert_array_equal(np.asarray(tm), np.asarray(full))


def test_merge_unmerge_roundtrip():
    # merge(plan, unmerge(plan, y)) == y: the full-token-space Δ-cache
    # round-trip is exact up to the group-mean of identical values
    k = jax.random.split(jax.random.key(5), 2)
    metric = jax.random.normal(k[0], (2, 16, 6))
    plan = tome.build_plan(metric, 4, 4, r=6, offset=1)
    y = jax.random.normal(k[1], (2, 10, 8))      # reduced stream
    back = tome.merge(plan, tome.unmerge(plan, y))
    np.testing.assert_allclose(np.asarray(back), np.asarray(y),
                               rtol=0, atol=1e-6)


def test_dit_tome_capture_shallow_contract():
    """ToMe composes with the Δ-cache: capture (with tome) matches the
    full tome forward bitwise, the stored delta is FULL-token-space,
    and splicing it back at the same input reproduces the output."""
    from tests.test_pixart import tiny_pixart, T5D

    m, params = tiny_pixart()
    k = jax.random.split(jax.random.key(8), 2)
    args = (jax.random.normal(k[0], (2, 8, 8, 4)), jnp.full((2,), 400.0),
            jax.random.normal(k[1], (2, 10, T5D)))
    tm = _tome_swap(m, 0.5)
    full = tm.apply(params, *args)
    cap, delta = tm.apply(params, *args, mode="capture", cache_depth=1)
    np.testing.assert_array_equal(np.asarray(cap), np.asarray(full))
    assert delta.shape[1] == 16          # full token count, not reduced
    sh = tm.apply(params, *args, mode="shallow", deep=delta,
                  cache_depth=1)
    np.testing.assert_allclose(np.asarray(sh), np.asarray(full),
                               rtol=0, atol=2e-4)


# ---------------- product pipelines -----------------------------------------


def _gen_opts(**kw):
    base = dict(prompt="a cat", negative_prompt="bad", H=64, W=64,
                sampling_steps=4, seed=5, scale=4.0, safety_check=False,
                watermark=False)
    base.update(kw)
    return GenerationOptions(**base)


def test_flux_pipeline_tome():
    from tests.test_sd3_flux import make_flux_pipeline

    pipe = make_flux_pipeline()
    plain = pipe.generate(_gen_opts())[0][0]
    tm = pipe.generate(_gen_opts(tome_ratio=0.5))[0][0]
    assert np.isfinite(tm).all()
    assert np.abs(tm - plain).max() > 0
    # a ratio that rounds to r=0 must reproduce the plain lane exactly
    zero = pipe.generate(_gen_opts(tome_ratio=0.01))[0][0]
    np.testing.assert_array_equal(zero, plain)


def test_sd3_pipeline_tome():
    from tests.test_sd3_flux import make_sd3_bundle
    from cremage_tpu.pipelines.sd3 import SD3Pipeline

    pipe = SD3Pipeline(make_sd3_bundle())
    plain = pipe.generate(_gen_opts())[0][0]
    tm = pipe.generate(_gen_opts(tome_ratio=0.5))[0][0]
    assert np.isfinite(tm).all()
    assert tm.shape == plain.shape
    assert np.abs(tm - plain).max() > 0


def test_pixart_pipeline_tome():
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
    tm = pipe.generate(_gen_opts(sampler="DPM++ 2M", tome_ratio=0.5))[0][0]
    assert np.isfinite(tm).all()
    assert np.abs(tm - plain).max() > 0


def test_hunyuan_pipeline_tome():
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
    tm = pipe.generate(_gen_opts(sampler="DPM++ 2M", tome_ratio=0.5))[0][0]
    assert np.isfinite(tm).all()
    assert np.abs(tm - plain).max() > 0


def test_flux_pipeline_tome_deep_cache_composes():
    from tests.test_sd3_flux import make_flux_pipeline

    pipe = make_flux_pipeline()
    plain = pipe.generate(_gen_opts())[0][0]
    both = pipe.generate(_gen_opts(tome_ratio=0.5, deep_cache=2))[0][0]
    assert np.isfinite(both).all()
    assert np.abs(both - plain).max() > 0


def test_dit_tome_rejects_sequence_parallel():
    from tests.test_sd3_flux import make_sd3_bundle
    from cremage_tpu.pipelines.sd3 import SD3Pipeline
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    pipe = SD3Pipeline(make_sd3_bundle())
    pipe.use_mesh_sp(mesh)
    with pytest.raises(ValueError, match="use_mesh_sp"):
        pipe.generate(_gen_opts(tome_ratio=0.5))
