"""Sequence-parallel attention (parallel/sequence.py) on the 8-device
CPU mesh: both schedules must match the single-device oracle exactly
(fp32), and the output must keep the token sharding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import assert_img01_close

from cremage_tpu.core.mesh import make_mesh
from cremage_tpu.parallel.sequence import (
    _reference_attention, sp_attention, token_sharding,
)


def _qkv(b=2, n=64, h=4, d=16, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(0), 3)
    mk = lambda k: jax.random.normal(k, (b, n, h, d), dtype)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(jax.devices()[:8], data=8, model=1)


@pytest.mark.parametrize("schedule", ["ring", "all_gather_kv"])
def test_sp_matches_oracle(mesh8, schedule):
    q, k, v = _qkv()
    want = np.asarray(_reference_attention(q, k, v))
    sh = token_sharding(mesh8)
    qs, ks, vs = (jax.device_put(a, sh) for a in (q, k, v))
    with mesh8:
        got = sp_attention(qs, ks, vs, mesh8, schedule=schedule)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)
    # token axis stays sharded — no silent gather of the output
    assert "data" in str(got.sharding.spec)


@pytest.mark.parametrize("schedule", ["ring", "all_gather_kv"])
def test_sp_under_jit(mesh8, schedule):
    """The schedules must compose with jit (how models would call it)."""
    q, k, v = _qkv(n=32)
    want = np.asarray(_reference_attention(q, k, v))
    sh = token_sharding(mesh8)
    qs, ks, vs = (jax.device_put(a, sh) for a in (q, k, v))
    with mesh8:
        fn = jax.jit(lambda a, b, c: sp_attention(
            a, b, c, mesh8, schedule=schedule))
        got = fn(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def test_sp_bf16_inputs(mesh8):
    """bf16 q/k/v: fp32 softmax statistics inside, bf16 out (the flash
    kernel contract)."""
    q, k, v = _qkv(dtype=jnp.bfloat16)
    want = np.asarray(_reference_attention(q, k, v), np.float32)
    sh = token_sharding(mesh8)
    qs, ks, vs = (jax.device_put(a, sh) for a in (q, k, v))
    with mesh8:
        got = sp_attention(qs, ks, vs, mesh8)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=2e-2, rtol=2e-2)


def test_sp_validates(mesh8):
    q, k, v = _qkv(n=60)  # 60 % 8 != 0
    with pytest.raises(ValueError, match="divide"):
        sp_attention(q, k, v, mesh8)
    q, k, v = _qkv(n=16)
    with pytest.raises(ValueError, match="schedule"):
        sp_attention(q, k, v, mesh8, schedule="nope")


# ---------------- FLUX under sequence parallelism --------------------------


def _tiny_flux(guidance_embed=False, txt_n=8, hw=4):
    from cremage_tpu.models.flux import (
        FluxConfig, FluxModel, make_position_ids,
    )

    cfg = FluxConfig(
        hidden_size=64, num_heads=2, head_dim=32, depth_double=2,
        depth_single=2, context_dim=32, vec_dim=32, axes_dim=(8, 12, 12),
        in_channels=16, dtype=jnp.float32, guidance_embed=guidance_embed,
    )
    model = FluxModel(cfg)
    txt_ids, img_ids = make_position_ids(hw, hw, txt_n)
    ks = jax.random.split(jax.random.key(3), 3)
    guidance = jnp.asarray([3.5]) if guidance_embed else None
    args = (
        jax.random.normal(ks[0], (1, hw * hw, 16)),
        jax.random.normal(ks[1], (1, txt_n, 32)),
        jnp.asarray([0.4]),
        jax.random.normal(ks[2], (1, 32)),
        img_ids, txt_ids, guidance,
    )
    params = model.init(jax.random.key(0), *args)
    return model, params, args


@pytest.mark.parametrize("guidance_embed", [False, True])
def test_flux_sp_matches_single_device(mesh8, guidance_embed):
    """flux_sp_apply (token axis over 8 shards, ring attention) must
    match the plain single-device forward: per-token ops see only a
    local slice and attention streams kv around the ring, so agreement
    checks the whole decomposition (RoPE slab slicing, txt/img local
    ordering, online-softmax accumulation)."""
    from cremage_tpu.parallel.sequence import flux_sp_apply

    model, params, args = _tiny_flux(guidance_embed=guidance_embed)
    img_t, txt_t, t, vec, img_ids, txt_ids, guidance = args
    want = np.asarray(model.apply(params, *args), np.float32)

    with mesh8:
        got = flux_sp_apply(model, params, mesh8, img_t, txt_t, t, vec,
                            img_ids, txt_ids, guidance=guidance)
    assert "data" in str(got.sharding.spec)  # output stays token-sharded
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=3e-5, rtol=3e-5)


def test_flux_sp_under_jit(mesh8):
    from cremage_tpu.parallel.sequence import flux_sp_apply, token_sharding

    model, params, args = _tiny_flux()
    img_t, txt_t, t, vec, img_ids, txt_ids, _ = args
    want = np.asarray(model.apply(params, *args), np.float32)
    tok3 = jax.NamedSharding(mesh8, jax.sharding.PartitionSpec(
        None, "data", None))
    img_s = jax.device_put(img_t, tok3)
    txt_s = jax.device_put(txt_t, tok3)
    with mesh8:
        fn = jax.jit(lambda p, a, b, c, d: flux_sp_apply(
            model, p, mesh8, a, b, c, d, img_ids, txt_ids))
        got = fn(params, img_s, txt_s, t, vec)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=3e-5, rtol=3e-5)


def test_flux_sp_validates_divisibility(mesh8):
    from cremage_tpu.parallel.sequence import flux_sp_apply

    model, params, args = _tiny_flux(txt_n=9)  # 9 % 8 != 0
    img_t, txt_t, t, vec, img_ids, txt_ids, _ = args
    with pytest.raises(ValueError, match="divide"):
        flux_sp_apply(model, params, mesh8, img_t, txt_t, t, vec,
                      img_ids, txt_ids)


def test_flux_pipeline_sp_matches_plain(mesh8):
    """FluxPipeline.use_mesh_sp: the whole product path (pipeline scan
    program + VAE decode) under token sharding must match the plain
    single-device generation."""
    from tests.test_sd3_flux import make_flux_pipeline
    from cremage_tpu.core.config import GenerationOptions

    opts = GenerationOptions(prompt="a fox", H=64, W=64, sampling_steps=2,
                             seed=3, safety_check=False, watermark=False)
    plain = make_flux_pipeline().generate(opts)[0][0]

    pipe = make_flux_pipeline()
    pipe.use_mesh_sp(mesh8)
    with mesh8:
        sp = pipe.generate(opts)[0][0]
    assert_img01_close(sp, plain)


def test_flux_sp_deepcache_modes_match_single_device(mesh8):
    """DeepCache capture/shallow compose with sequence parallelism: the
    Δ-cache is per-img-token, so it stays token-sharded end to end.
    capture must reproduce the single-device (out, delta) pair; shallow
    fed the SHARDED delta at a different t must match the single-device
    shallow."""
    from cremage_tpu.parallel.sequence import flux_sp_apply

    model, params, args = _tiny_flux()
    img_t, txt_t, t, vec, img_ids, txt_ids, _ = args
    want_out, want_delta = model.apply(params, img_t, txt_t, t, vec,
                                       img_ids, txt_ids, mode="capture",
                                       cache_depth=1)
    with mesh8:
        got_out, got_delta = flux_sp_apply(
            model, params, mesh8, img_t, txt_t, t, vec, img_ids, txt_ids,
            mode="capture", cache_depth=1)
    assert "data" in str(got_delta.sharding.spec)  # delta stays sharded
    np.testing.assert_allclose(np.asarray(got_out, np.float32),
                               np.asarray(want_out, np.float32),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(got_delta, np.float32),
                               np.asarray(want_delta, np.float32),
                               atol=3e-5, rtol=3e-5)

    t2 = t + 0.2
    want_sh = model.apply(params, img_t, txt_t, t2, vec, img_ids, txt_ids,
                          mode="shallow", deep=want_delta, cache_depth=1)
    with mesh8:
        got_sh = flux_sp_apply(
            model, params, mesh8, img_t, txt_t, t2, vec, img_ids, txt_ids,
            mode="shallow", deep=got_delta, cache_depth=1)
    np.testing.assert_allclose(np.asarray(got_sh, np.float32),
                               np.asarray(want_sh, np.float32),
                               atol=3e-5, rtol=3e-5)


def test_flux_pipeline_sp_deepcache_matches_plain(mesh8):
    """use_mesh_sp + deep_cache=2 runs the DC scan with the delta carry
    token-sharded and must match the plain single-device DC run."""
    from tests.test_sd3_flux import make_flux_pipeline
    from cremage_tpu.core.config import GenerationOptions

    opts = GenerationOptions(prompt="a fox", H=64, W=64, sampling_steps=3,
                             seed=3, safety_check=False, watermark=False,
                             deep_cache=2)
    plain = make_flux_pipeline().generate(opts)[0][0]

    pipe = make_flux_pipeline()
    pipe.use_mesh_sp(mesh8)
    with mesh8:
        sp = pipe.generate(opts)[0][0]
    assert_img01_close(sp, plain)


# ---------------- MMDiT (SD3) under sequence parallelism -------------------


def _tiny_mmdit(h=32, w=8):
    from cremage_tpu.models.mmdit import MMDiT, MMDiTConfig

    cfg = MMDiTConfig(depth=2, hidden_size=64, num_heads=4,
                      context_dim=96, pooled_dim=80,
                      pos_embed_max_size=16, dtype=jnp.float32)
    m = MMDiT(cfg)
    ks = jax.random.split(jax.random.key(7), 4)
    args = (
        jax.random.normal(ks[0], (1, h, w, 16)),
        jnp.full((1,), 500.0),
        jax.random.normal(ks[1], (1, 154, 96)),  # 154 % 8 != 0: prefix case
        jax.random.normal(ks[2], (1, 80)),
    )
    params = m.init(jax.random.key(0), *args)
    return m, params, args


def test_mmdit_sp_matches_single_device(mesh8):
    """mmdit_sp_apply (patch rows over 8 shards; 154 context tokens
    replicated and folded as a ring prefix) must match the plain
    forward — checks band patchify, per-shard pos-embed slice, the
    prefix fold, and the replicated context residual stream."""
    from cremage_tpu.parallel.sequence import mmdit_sp_apply

    model, params, args = _tiny_mmdit()
    want = np.asarray(model.apply(params, *args), np.float32)
    with mesh8:
        got = mmdit_sp_apply(model, params, mesh8, *args)
    assert "data" in str(got.sharding.spec)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=3e-5, rtol=3e-5)


def test_mmdit_sp_under_jit(mesh8):
    from cremage_tpu.parallel.sequence import mmdit_sp_apply

    model, params, args = _tiny_mmdit()
    want = np.asarray(model.apply(params, *args), np.float32)
    with mesh8:
        fn = jax.jit(lambda p, *a: mmdit_sp_apply(model, p, mesh8, *a))
        got = fn(params, *args)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=3e-5, rtol=3e-5)


def test_mmdit_sp_validates_bands(mesh8):
    from cremage_tpu.parallel.sequence import mmdit_sp_apply

    model, params, args = _tiny_mmdit(h=8)   # 8 rows / 8 shards = 1, not
    with pytest.raises(ValueError, match="patch-aligned"):  # patch-aligned
        mmdit_sp_apply(model, params, mesh8, *args)


def test_sd3_pipeline_sp_matches_plain(mesh8):
    """SD3Pipeline.use_mesh_sp: full product path (CFG sampler + VAE
    decode) with MMDiT patch rows sharded over 8 devices must match
    plain single-device generation.  H=256 -> 32 latent rows -> 4-row
    patch-aligned bands per shard."""
    from tests.test_sd3_flux import make_sd3_bundle
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.pipelines.sd3 import SD3Pipeline

    opts = GenerationOptions(prompt="a cat", negative_prompt="bad",
                             H=256, W=64, sampling_steps=2, seed=5,
                             scale=4.0, safety_check=False, watermark=False)
    plain = SD3Pipeline(make_sd3_bundle()).generate(opts)[0][0]

    pipe = SD3Pipeline(make_sd3_bundle())
    pipe.use_mesh_sp(mesh8)
    with mesh8:
        sp = pipe.generate(opts)[0][0]
    assert_img01_close(sp, plain)


# ---------------- PixArt-Σ / Hunyuan-DiT under sequence parallelism --------


def test_pixart_sp_matches_single_device(mesh8):
    """pixart_sp_apply: ring self-attention + local cross-attention
    over replicated text; the global sincos table rides in as a
    token-sharded operand."""
    from cremage_tpu.models.pixart import PixArt, PixArtConfig
    from cremage_tpu.parallel.sequence import pixart_sp_apply

    cfg = PixArtConfig(hidden_size=64, depth=2, num_heads=4,
                       context_dim=32, dtype=jnp.float32)
    m = PixArt(cfg)
    ks = jax.random.split(jax.random.key(11), 3)
    args = (jax.random.normal(ks[0], (1, 32, 8, 4)),
            jnp.full((1,), 500.0),
            jax.random.normal(ks[1], (1, 20, 32)))
    params = m.init(jax.random.key(0), *args)
    want = np.asarray(m.apply(params, *args), np.float32)
    with mesh8:
        got = pixart_sp_apply(m, params, mesh8, *args)
    assert "data" in str(got.sharding.spec)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=3e-5, rtol=3e-5)


def test_hunyuan_sp_matches_single_device(mesh8):
    """hunyuan_sp_apply: ring self-attention with sharded global RoPE
    bands, local cross-attention over the replicated joint text stream,
    band-local U-ViT skips."""
    from cremage_tpu.models.hunyuan import HunyuanConfig, HunyuanDiT
    from cremage_tpu.parallel.sequence import hunyuan_sp_apply

    cfg = HunyuanConfig(hidden_size=64, depth=4, num_heads=4,
                        clip_dim=32, mt5_dim=64, pooled_dim=32,
                        pooler_heads=4, text_len=7, text_len_t5=12,
                        dtype=jnp.float32)
    m = HunyuanDiT(cfg)
    ks = jax.random.split(jax.random.key(13), 4)
    args = (jax.random.normal(ks[0], (1, 32, 8, 4)),
            jnp.full((1,), 500.0),
            jax.random.normal(ks[1], (1, 7, 32)),
            jax.random.normal(ks[2], (1, 12, 64)))
    params = m.init(jax.random.key(0), *args)
    want = np.asarray(m.apply(params, *args), np.float32)
    with mesh8:
        got = hunyuan_sp_apply(m, params, mesh8, *args)
    assert "data" in str(got.sharding.spec)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=3e-5, rtol=3e-5)


def test_pixart_pipeline_sp_matches_plain(mesh8):
    """PixArtPipeline.use_mesh_sp: full product path parity vs single
    device (H=256 -> 32 latent rows -> patch-aligned 4-row bands)."""
    from tests.test_pixart import T5D, tiny_pixart
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from cremage_tpu.pipelines.pixart import PixArtBundle, PixArtPipeline

    def build():
        m, params = tiny_pixart()
        vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                      num_res_blocks=1, dtype=jnp.float32))
        vp = vae.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))
        bundle = PixArtBundle(dit=m, dit_params=params, t5=None,
                              t5_tokenize=None, t5_len=10, vae=vae,
                              vae_params=vp, t5_dim=T5D)
        return PixArtPipeline(bundle)

    opts = GenerationOptions(prompt="a bird", H=256, W=64, sampling_steps=2,
                             seed=2, sampler="DPM++ 2M", scale=4.5,
                             safety_check=False, watermark=False)
    plain = build().generate(opts)[0][0]
    pipe = build()
    pipe.use_mesh_sp(mesh8)
    with mesh8:
        sp = pipe.generate(opts)[0][0]
    assert_img01_close(sp, plain)


def test_hunyuan_pipeline_sp_matches_plain(mesh8):
    """HunyuanPipeline.use_mesh_sp: full product path parity vs single
    device (v-prediction CFG sampler + U-ViT skips under SP)."""
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.models.hunyuan import HunyuanConfig, HunyuanDiT
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from cremage_tpu.pipelines.hunyuan import HunyuanBundle, HunyuanPipeline

    cfg = HunyuanConfig(hidden_size=64, depth=2, num_heads=4, clip_dim=32,
                        mt5_dim=64, pooled_dim=32, pooler_heads=4,
                        text_len=7, text_len_t5=12, dtype=jnp.float32)
    m = HunyuanDiT(cfg)
    params = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
                    jnp.zeros((1,)), jnp.zeros((1, 7, 32)),
                    jnp.zeros((1, 12, 64)))
    rng = np.random.default_rng(5)
    clip_t = rng.normal(size=(7, 32)).astype(np.float32)
    mt5_t = rng.normal(size=(12, 64)).astype(np.float32)

    def build():
        vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                      num_res_blocks=1, dtype=jnp.float32))
        vp = vae.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))
        bundle = HunyuanBundle(dit=m, dit_params=params, vae=vae,
                               vae_params=vp,
                               text_encode=lambda p: (clip_t, mt5_t))
        return HunyuanPipeline(bundle)

    opts = GenerationOptions(prompt="a bird", negative_prompt="bad",
                             H=256, W=64, sampling_steps=2, seed=2,
                             sampler="DPM++ 2M", scale=4.5,
                             safety_check=False, watermark=False)
    plain = build().generate(opts)[0][0]
    pipe = build()
    pipe.use_mesh_sp(mesh8)
    with mesh8:
        sp = pipe.generate(opts)[0][0]
    assert_img01_close(sp, plain)


# ---------------- DeepCache under sequence parallelism ---------------------
#
# The DiT Δ-cache is the per-token residual the back blocks add, so it
# composes with token sharding: the capture/shallow forwards run inside
# the shard_map and the cached delta rides the scan carry token-sharded.
# (The FLUX variants live above with the FLUX SP tests.)


def test_sd3_pipeline_sp_deepcache_matches_plain(mesh8):
    from tests.test_sd3_flux import make_sd3_bundle
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.pipelines.sd3 import SD3Pipeline

    opts = GenerationOptions(prompt="a cat", negative_prompt="bad",
                             H=256, W=64, sampling_steps=3, seed=5,
                             scale=4.0, safety_check=False, watermark=False,
                             deep_cache=2)
    plain = SD3Pipeline(make_sd3_bundle()).generate(opts)[0][0]

    pipe = SD3Pipeline(make_sd3_bundle())
    pipe.use_mesh_sp(mesh8)
    with mesh8:
        sp = pipe.generate(opts)[0][0]
    assert_img01_close(sp, plain)


def test_pixart_pipeline_sp_deepcache_matches_plain(mesh8):
    from tests.test_pixart import T5D, tiny_pixart
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from cremage_tpu.pipelines.pixart import PixArtBundle, PixArtPipeline

    def build():
        m, params = tiny_pixart()
        vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                      num_res_blocks=1, dtype=jnp.float32))
        vp = vae.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))
        bundle = PixArtBundle(dit=m, dit_params=params, t5=None,
                              t5_tokenize=None, t5_len=10, vae=vae,
                              vae_params=vp, t5_dim=T5D)
        return PixArtPipeline(bundle)

    opts = GenerationOptions(prompt="a bird", H=256, W=64, sampling_steps=3,
                             seed=2, sampler="DPM++ 2M", scale=4.5,
                             safety_check=False, watermark=False,
                             deep_cache=2)
    plain = build().generate(opts)[0][0]
    pipe = build()
    pipe.use_mesh_sp(mesh8)
    with mesh8:
        sp = pipe.generate(opts)[0][0]
    assert_img01_close(sp, plain)


def test_hunyuan_pipeline_sp_deepcache_matches_plain(mesh8):
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.models.hunyuan import HunyuanConfig, HunyuanDiT
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from cremage_tpu.pipelines.hunyuan import HunyuanBundle, HunyuanPipeline

    cfg = HunyuanConfig(hidden_size=64, depth=2, num_heads=4, clip_dim=32,
                        mt5_dim=64, pooled_dim=32, pooler_heads=4,
                        text_len=7, text_len_t5=12, dtype=jnp.float32)
    m = HunyuanDiT(cfg)
    params = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
                    jnp.zeros((1,)), jnp.zeros((1, 7, 32)),
                    jnp.zeros((1, 12, 64)))
    rng = np.random.default_rng(5)
    clip_t = rng.normal(size=(7, 32)).astype(np.float32)
    mt5_t = rng.normal(size=(12, 64)).astype(np.float32)

    def build():
        vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                      num_res_blocks=1, dtype=jnp.float32))
        vp = vae.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))
        bundle = HunyuanBundle(dit=m, dit_params=params, vae=vae,
                               vae_params=vp,
                               text_encode=lambda p: (clip_t, mt5_t))
        return HunyuanPipeline(bundle)

    opts = GenerationOptions(prompt="a bird", negative_prompt="bad",
                             H=256, W=64, sampling_steps=3, seed=2,
                             sampler="DPM++ 2M", scale=4.5,
                             safety_check=False, watermark=False,
                             deep_cache=2)
    plain = build().generate(opts)[0][0]
    pipe = build()
    pipe.use_mesh_sp(mesh8)
    with mesh8:
        sp = pipe.generate(opts)[0][0]
    assert_img01_close(sp, plain)
