"""Pipeline parallelism (parallel/pipeline.py): stage plan, parity vs
the single-device FluxModel forward, microbatch streaming, validation.

The reference has no distributed runtime (SURVEY §2.2) — PP is
TPU-native scaling design; these tests prove the stage decomposition is
exact on the 8-device CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import assert_img01_close

from cremage_tpu.models.flux import FluxConfig
from cremage_tpu.parallel.pipeline import FluxPP, flux_pp_plan

from tests.test_sequence_parallel import _tiny_flux


def _cfg(nd, ns):
    return FluxConfig(hidden_size=64, num_heads=2, head_dim=32,
                      depth_double=nd, depth_single=ns, context_dim=32,
                      vec_dim=32, axes_dim=(8, 12, 12), in_channels=16,
                      dtype=jnp.float32)


def test_plan_covers_chain_balanced():
    cfg = _cfg(19, 38)  # production FLUX depths
    for n_stages in (1, 2, 3, 4, 8):
        specs = flux_pp_plan(cfg, n_stages)
        assert len(specs) == n_stages
        # contiguous, complete cover: doubles then singles, no gaps
        d_pos = s_pos = 0
        for sp in specs:
            assert sp.d_lo == d_pos and sp.s_lo == s_pos
            assert sp.d_hi >= sp.d_lo and sp.s_hi >= sp.s_lo
            assert sp.units > 0
            if sp.s_hi > sp.s_lo:  # singles only after all doubles
                assert sp.d_hi == 19
            d_pos, s_pos = sp.d_hi, sp.s_hi
        assert d_pos == 19 and s_pos == 38
        # balance: no stage more than ~2x the ideal share
        ideal = (2 * 19 + 38) / n_stages
        assert max(sp.units for sp in specs) <= ideal + 2


def test_plan_rejects_bad_stage_count():
    cfg = _cfg(2, 2)
    with pytest.raises(ValueError, match="n_stages"):
        flux_pp_plan(cfg, 5)
    with pytest.raises(ValueError, match="n_stages"):
        flux_pp_plan(cfg, 0)


@pytest.mark.parametrize("guidance_embed", [False, True])
@pytest.mark.parametrize("n_stages", [2, 3, 4])
def test_flux_pp_matches_single_device(mesh8, guidance_embed, n_stages):
    """Stage decomposition over distinct devices must reproduce the
    monolithic forward: embedder placement, the double->single concat
    inside whichever stage holds the boundary, the final layer on the
    last stage, and cross-device activation hops."""
    model, params, args = _tiny_flux(guidance_embed=guidance_embed)
    img_t, txt_t, t, vec, img_ids, txt_ids, guidance = args
    want = np.asarray(model.apply(params, *args), np.float32)

    pp = FluxPP(model, params, jax.devices()[:n_stages], hp=4, wp=4,
                txt_len=txt_t.shape[1], n_stages=n_stages)
    got = pp(img_t, txt_t, t, vec, guidance=guidance)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=3e-5, rtol=3e-5)


def test_flux_pp_microbatch_streams_match_full_batch(mesh8):
    """Batch 4 streamed as 4x1 and 2x2 microbatches equals the
    full-batch result (per-sample math is batch-invariant)."""
    model, params, args = _tiny_flux()
    _, txt_t1, _, _, img_ids, txt_ids, _ = args
    ks = jax.random.split(jax.random.key(7), 3)
    b = 4
    img_t = jax.random.normal(ks[0], (b, 16, 16))
    txt_t = jax.random.normal(ks[1], (b, txt_t1.shape[1], 32))
    vec = jax.random.normal(ks[2], (b, 32))
    t = jnp.full((b,), 0.6)
    want = np.asarray(model.apply(params, img_t, txt_t, t, vec,
                                  img_ids, txt_ids, None), np.float32)

    pp = FluxPP(model, params, jax.devices()[:2], hp=4, wp=4,
                txt_len=txt_t.shape[1], n_stages=2)
    for mb in (1, 2, 4):
        got = pp(img_t, txt_t, t, vec, microbatch=mb)
        np.testing.assert_allclose(np.asarray(got, np.float32), want,
                                   atol=3e-5, rtol=3e-5)


def test_flux_pp_validates(mesh8):
    import dataclasses as dc

    model, params, args = _tiny_flux()
    img_t, txt_t, t, vec, *_ = args
    pp = FluxPP(model, params, jax.devices()[:2], hp=4, wp=4,
                txt_len=txt_t.shape[1])
    with pytest.raises(ValueError, match="divide"):
        pp(jnp.tile(img_t, (3, 1, 1)), jnp.tile(txt_t, (3, 1, 1)),
           jnp.tile(t, 3), jnp.tile(vec, (3, 1)), microbatch=2)
    with pytest.raises(ValueError, match="stages"):
        FluxPP(model, params, jax.devices()[:1], hp=4, wp=4,
               txt_len=8, n_stages=2)
    tome_model = type(model)(dc.replace(model.cfg, tome_ratio=0.5))
    with pytest.raises(ValueError, match="tome"):
        FluxPP(tome_model, params, jax.devices()[:2], hp=4, wp=4,
               txt_len=8)


def test_flux_pipeline_pp_matches_plain(mesh8):
    """FluxPipeline.use_mesh_pp: the product path (host-stepped flow
    Euler + staged transformer + VAE decode) must match the plain
    single-device generation."""
    from tests.test_sd3_flux import make_flux_pipeline
    from cremage_tpu.core.config import GenerationOptions

    opts = GenerationOptions(prompt="a fox", H=64, W=64, sampling_steps=2,
                             seed=3, safety_check=False, watermark=False)
    plain = make_flux_pipeline().generate(opts)[0][0]

    pipe = make_flux_pipeline()
    pipe.use_mesh_pp(jax.devices()[:2])
    pp = pipe.generate(opts)[0][0]
    assert_img01_close(pp, plain)


def test_flux_pipeline_pp_rejects_compositions(mesh8):
    from tests.test_sd3_flux import make_flux_pipeline
    from cremage_tpu.core.config import GenerationOptions

    pipe = make_flux_pipeline()
    pipe.use_mesh_pp(jax.devices()[:2])
    for bad in (dict(deep_cache=2), dict(tome_ratio=0.5)):
        opts = GenerationOptions(prompt="x", H=64, W=64, sampling_steps=2,
                                 safety_check=False, watermark=False, **bad)
        with pytest.raises(ValueError):
            pipe.generate(opts)
    with pytest.raises(ValueError, match="one of"):
        pipe.use_mesh_sp(None)


# ---------------- MMDiT (SD3) pipeline parallelism ----------------


def test_uniform_plan_covers_chain():
    from cremage_tpu.parallel.pipeline import uniform_pp_plan

    for depth, n_stages in ((24, 5), (24, 1), (24, 24), (2, 2), (38, 8)):
        plan = uniform_pp_plan(depth, n_stages)
        assert len(plan) == n_stages
        assert plan[0][0] == 0 and plan[-1][1] == depth
        sizes = [hi - lo for lo, hi in plan]
        assert all(s > 0 for s in sizes)
        assert max(sizes) - min(sizes) <= 1          # balanced
        assert all(a[1] == b[0] for a, b in zip(plan, plan[1:]))
    with pytest.raises(ValueError, match="n_stages"):
        uniform_pp_plan(4, 5)
    with pytest.raises(ValueError, match="n_stages"):
        uniform_pp_plan(4, 0)


@pytest.mark.parametrize("n_stages", [1, 2])
def test_mmdit_pp_matches_single_device(mesh8, n_stages):
    """Stage decomposition (embedders + pos-embed crop on the first
    stage, joint blocks across stages, final layer + unpatchify on the
    last) must reproduce the monolithic MMDiT forward."""
    from tests.test_sequence_parallel import _tiny_mmdit
    from cremage_tpu.parallel.pipeline import MMDiTPP

    model, params, args = _tiny_mmdit()
    x, t, ctx, pooled = args
    want = np.asarray(model.apply(params, *args), np.float32)
    p = model.cfg.patch_size
    pp = MMDiTPP(model, params, jax.devices()[:n_stages],
                 hp=x.shape[1] // p, wp=x.shape[2] // p, n_stages=n_stages)
    got = pp(x, t, ctx, pooled)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=3e-5, rtol=3e-5)


def test_mmdit_pp_microbatch_and_validation(mesh8):
    import dataclasses as dc

    from tests.test_sequence_parallel import _tiny_mmdit
    from cremage_tpu.parallel.pipeline import MMDiTPP

    model, params, args = _tiny_mmdit()
    x1, _, ctx1, pooled1 = args
    ks = jax.random.split(jax.random.key(11), 3)
    b = 4
    x = jax.random.normal(ks[0], (b,) + x1.shape[1:])
    ctx = jax.random.normal(ks[1], (b,) + ctx1.shape[1:])
    pooled = jax.random.normal(ks[2], (b,) + pooled1.shape[1:])
    t = jnp.full((b,), 500.0)
    want = np.asarray(model.apply(params, x, t, ctx, pooled), np.float32)
    p = model.cfg.patch_size
    pp = MMDiTPP(model, params, jax.devices()[:2],
                 hp=x.shape[1] // p, wp=x.shape[2] // p, n_stages=2)
    for mb in (1, 2, 4):
        got = pp(x, t, ctx, pooled, microbatch=mb)
        np.testing.assert_allclose(np.asarray(got, np.float32), want,
                                   atol=3e-5, rtol=3e-5)
    with pytest.raises(ValueError, match="divide"):
        pp(x, t, ctx, pooled, microbatch=3)
    with pytest.raises(ValueError, match="stages"):
        MMDiTPP(model, params, jax.devices()[:1], hp=4, wp=4, n_stages=2)
    tome_model = type(model)(dc.replace(model.cfg, tome_ratio=0.5))
    with pytest.raises(ValueError, match="tome"):
        MMDiTPP(tome_model, params, jax.devices()[:2], hp=4, wp=4)


def test_sd3_pipeline_pp_matches_plain(mesh8):
    """SD3Pipeline.use_mesh_pp: host-stepped flow Euler with batched
    [uc, c] CFG over the staged MMDiT + VAE decode must match plain
    single-device generation."""
    from tests.test_sd3_flux import make_sd3_bundle
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.pipelines.sd3 import SD3Pipeline

    opts = GenerationOptions(prompt="a cat", negative_prompt="bad",
                             H=64, W=64, sampling_steps=2, seed=5,
                             scale=4.0, safety_check=False, watermark=False)
    plain = SD3Pipeline(make_sd3_bundle()).generate(opts)[0][0]

    pipe = SD3Pipeline(make_sd3_bundle())
    pipe.use_mesh_pp(jax.devices()[:2])
    pp = pipe.generate(opts)[0][0]
    assert_img01_close(pp, plain)


def test_sd3_pipeline_pp_rejects_compositions(mesh8):
    from tests.test_sd3_flux import make_sd3_bundle
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.pipelines.sd3 import SD3Pipeline

    pipe = SD3Pipeline(make_sd3_bundle())
    pipe.use_mesh_pp(jax.devices()[:2])
    for bad in (dict(deep_cache=2), dict(tome_ratio=0.5)):
        opts = GenerationOptions(prompt="x", H=64, W=64, sampling_steps=2,
                                 safety_check=False, watermark=False, **bad)
        with pytest.raises(ValueError):
            pipe.generate(opts)
    with pytest.raises(ValueError, match="use_mesh_sp / use_mesh_pp"):
        pipe.use_mesh_sp(mesh8)


# ---------------- PixArt-Σ pipeline parallelism ----------------


@pytest.mark.parametrize("n_stages", [2, 3])
def test_pixart_pp_matches_single_device(mesh8, n_stages):
    """Stage decomposition (patch/t/y embedders + sincos on the first
    stage, blocks across stages, final table layer + unpatchify on the
    last, with (y, t6, t_vec) riding the carry) must reproduce the
    monolithic PixArt forward, under microbatch streaming too."""
    from cremage_tpu.models.pixart import PixArt, PixArtConfig
    from cremage_tpu.parallel.pipeline import PixArtPP

    cfg = PixArtConfig(hidden_size=64, depth=3, num_heads=4,
                       context_dim=32, dtype=jnp.float32)
    m = PixArt(cfg)
    ks = jax.random.split(jax.random.key(11), 3)
    args = (jax.random.normal(ks[0], (2, 32, 8, 4)),
            jnp.full((2,), 500.0),
            jax.random.normal(ks[1], (2, 20, 32)))
    params = m.init(jax.random.key(0), *args)
    want = np.asarray(m.apply(params, *args), np.float32)
    pp = PixArtPP(m, params, jax.devices()[:n_stages], hp=16, wp=4,
                  n_stages=n_stages)
    for mb in (1, 2):
        got = pp(*args, microbatch=mb)
        np.testing.assert_allclose(np.asarray(got, np.float32), want,
                                   atol=3e-5, rtol=3e-5)


def test_pixart_pipeline_pp_matches_plain(mesh8):
    """PixArtPipeline.use_mesh_pp: host-stepped Euler around the
    eagerly-wrapped EpsDenoiser/cfg_denoiser over the staged forward
    must match the plain single-device scanned-Euler generation."""
    from tests.test_pixart import T5D, tiny_pixart
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from cremage_tpu.pipelines.pixart import PixArtBundle, PixArtPipeline

    def make_pipe():
        m, params = tiny_pixart()
        vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                      num_res_blocks=1, dtype=jnp.float32))
        vp = vae.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))
        return PixArtPipeline(PixArtBundle(
            dit=m, dit_params=params, t5=None, t5_tokenize=None,
            t5_len=10, vae=vae, vae_params=vp, t5_dim=T5D))

    opts = GenerationOptions(prompt="a bird", H=64, W=64, sampling_steps=3,
                             seed=2, sampler="Euler", scale=4.5,
                             safety_check=False, watermark=False)
    plain = make_pipe().generate(opts)[0][0]

    pipe = make_pipe()
    pipe.use_mesh_pp(jax.devices()[:2])
    pp = pipe.generate(opts)[0][0]
    assert_img01_close(pp, plain)


def test_pixart_pipeline_pp_rejects(mesh8):
    from tests.test_pixart import T5D, tiny_pixart
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from cremage_tpu.pipelines.pixart import PixArtBundle, PixArtPipeline

    m, params = tiny_pixart()
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                  num_res_blocks=1, dtype=jnp.float32))
    vp = vae.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))
    pipe = PixArtPipeline(PixArtBundle(
        dit=m, dit_params=params, t5=None, t5_tokenize=None,
        t5_len=10, vae=vae, vae_params=vp, t5_dim=T5D))
    pipe.use_mesh_pp(jax.devices()[:2])
    base = dict(prompt="x", H=64, W=64, sampling_steps=2,
                safety_check=False, watermark=False)
    for bad in (dict(deep_cache=2), dict(tome_ratio=0.5),
                dict(sampler="DPM++ 2M")):
        with pytest.raises(ValueError):
            pipe.generate(GenerationOptions(**base, **bad))
    with pytest.raises(ValueError, match="use_mesh_sp / use_mesh_pp"):
        pipe.use_mesh_sp(mesh8)


# ---------------- Hunyuan-DiT pipeline parallelism ----------------


@pytest.mark.parametrize("n_stages", [2, 3, 4])
def test_hunyuan_pp_matches_single_device(mesh8, n_stages):
    """The U-ViT twist: encoder block i's output is consumed by decoder
    block depth-1-i, so the not-yet-consumed skip stack must ride the
    stage boundaries.  depth=4 with 3/4 stages places boundaries inside
    both halves and at the midline (largest stack)."""
    from cremage_tpu.models.hunyuan import HunyuanConfig, HunyuanDiT
    from cremage_tpu.parallel.pipeline import HunyuanPP

    cfg = HunyuanConfig(hidden_size=64, depth=4, num_heads=4,
                        clip_dim=32, mt5_dim=64, pooled_dim=32,
                        pooler_heads=4, text_len=7, text_len_t5=12,
                        dtype=jnp.float32)
    m = HunyuanDiT(cfg)
    ks = jax.random.split(jax.random.key(13), 4)
    args = (jax.random.normal(ks[0], (2, 32, 8, 4)),
            jnp.full((2,), 500.0),
            jax.random.normal(ks[1], (2, 7, 32)),
            jax.random.normal(ks[2], (2, 12, 64)))
    params = m.init(jax.random.key(0), *args)
    want = np.asarray(m.apply(params, *args), np.float32)
    pp = HunyuanPP(m, params, jax.devices()[:n_stages], hp=16, wp=4,
                   n_stages=n_stages)
    for mb in (1, 2):
        got = pp(*args, microbatch=mb)
        np.testing.assert_allclose(np.asarray(got, np.float32), want,
                                   atol=3e-5, rtol=3e-5)


def _make_hunyuan_pipe():
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
    return HunyuanPipeline(HunyuanBundle(
        dit=dit, dit_params=dp, vae=vae, vae_params=vp,
        text_encode=text_encode))


def test_hunyuan_pipeline_pp_matches_plain(mesh8):
    """HunyuanPipeline.use_mesh_pp: host-stepped Euler around the
    eagerly-wrapped VDenoiser/cfg_denoiser over the staged forward must
    match the plain single-device scanned-Euler generation."""
    from cremage_tpu.core.config import GenerationOptions

    opts = GenerationOptions(prompt="a crane", H=64, W=64,
                             sampling_steps=3, seed=4, sampler="Euler",
                             scale=4.0, safety_check=False,
                             watermark=False)
    plain = _make_hunyuan_pipe().generate(opts)[0][0]

    pipe = _make_hunyuan_pipe()
    pipe.use_mesh_pp(jax.devices()[:2])
    pp = pipe.generate(opts)[0][0]
    assert_img01_close(pp, plain)


def test_hunyuan_pipeline_pp_rejects(mesh8):
    from cremage_tpu.core.config import GenerationOptions

    pipe = _make_hunyuan_pipe()
    pipe.use_mesh_pp(jax.devices()[:2])
    base = dict(prompt="x", H=64, W=64, sampling_steps=2,
                safety_check=False, watermark=False)
    for bad in (dict(deep_cache=2, deep_cache_branch=2),
                dict(tome_ratio=0.5), dict(sampler="DPM++ 2M")):
        with pytest.raises(ValueError):
            pipe.generate(GenerationOptions(**base, **bad))
    with pytest.raises(ValueError, match="use_mesh_sp / use_mesh_pp"):
        pipe.use_mesh_sp(mesh8)


def test_mmdit_pp_composes_with_quantized_tree(mesh8):
    """Stage params are top-level slices of the full tree, so the
    (code, weight_scale) tuple leaves of an 8-bit-quantized tree ride
    along unchanged — PP output must match the monolithic forward on
    the SAME quantized params (the FLUX PP memory story, on SD3)."""
    from tests.test_sequence_parallel import _tiny_mmdit
    from cremage_tpu.io.quantize import quantize_params_8bit
    from cremage_tpu.parallel.pipeline import MMDiTPP

    model, params, args = _tiny_mmdit()
    x, t, ctx, pooled = args
    qparams, rep = quantize_params_8bit(params, dtype="float8_e4m3",
                                        min_size=0)
    assert rep["tensors"] > 0
    want = np.asarray(model.apply(qparams, *args), np.float32)
    p = model.cfg.patch_size
    pp = MMDiTPP(model, qparams, jax.devices()[:2],
                 hp=x.shape[1] // p, wp=x.shape[2] // p, n_stages=2)
    got = pp(x, t, ctx, pooled)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=3e-5, rtol=3e-5)


# ---------------- UNet (SD1.5 / SDXL) pipeline parallelism ----------------


def _tiny_unet_cfg(kind="sd15"):
    from cremage_tpu.models.unet import UNetConfig

    if kind == "sd15":
        return UNetConfig(
            in_channels=4, out_channels=4, model_channels=32,
            num_res_blocks=2, attention_resolutions=(4, 2, 1),
            channel_mult=(1, 2, 4, 4), num_heads=4,
            transformer_depth=(1, 1, 1, 1), transformer_depth_middle=1,
            context_dim=24, dtype=jnp.float32)
    return UNetConfig(          # sdxl-shaped: adm vector + linear-in-tf
        in_channels=4, out_channels=4, model_channels=32,
        num_res_blocks=2, attention_resolutions=(4, 2),
        channel_mult=(1, 2, 4), num_head_channels=8, num_heads=-1,
        transformer_depth=(1, 2, 3), transformer_depth_middle=3,
        context_dim=24, adm_in_channels=16,
        use_linear_in_transformer=True, dtype=jnp.float32)


def _tiny_unet(kind="sd15"):
    from cremage_tpu.models.unet import UNetModel

    cfg = _tiny_unet_cfg(kind)
    model = UNetModel(cfg)
    b, h, w = 2, 16, 16
    x = jax.random.normal(jax.random.key(0), (b, h, w, cfg.in_channels))
    t = jnp.array([3.0, 7.0])
    ctx = jax.random.normal(jax.random.key(1), (b, 7, cfg.context_dim))
    y = (jax.random.normal(jax.random.key(2), (b, cfg.adm_in_channels))
         if cfg.adm_in_channels else None)
    params = model.init(jax.random.key(3), x, t, ctx, y)
    return model, params, (x, t, ctx, y)


def test_unet_plan_covers_chain_weighted():
    """The flattened unit list covers the chain exactly (skips pushed ==
    skips popped, in0 first, mid between the halves) and the plan is
    contiguous, complete and FLOP-balanced — NOT unit-count-balanced
    (a 64x64x320 res block costs ~10x a 8x8x1280 one)."""
    from cremage_tpu.models.unet import sd15_unet_config
    from cremage_tpu.parallel.pipeline import (
        _unet_unit_weight, unet_pp_plan, unet_unit_list,
    )

    cfg = sd15_unet_config()   # production SD1.5 geometry
    units = unet_unit_list(cfg)
    pushes = sum(1 for u in units if u.kind in ("in0", "in", "down"))
    pops = sum(1 for u in units if u.kind == "out")
    assert pushes == pops
    assert units[0].kind == "in0"
    kinds = [u.kind for u in units]
    assert kinds.index("mid") == kinds.index("out") - 1
    weights = [_unet_unit_weight(u, 64, 64) for u in units]
    total = sum(weights)
    for n_stages in (1, 2, 4, 8):
        plan = unet_pp_plan(cfg, 64, 64, n_stages)
        assert len(plan) == n_stages
        assert plan[0][0] == 0 and plan[-1][1] == len(units)
        for (a, b_), (c, d) in zip(plan, plan[1:]):
            assert b_ == c
        # balance: no stage above ~2.2x the ideal FLOP share (the
        # high-res units are indivisible, so perfect balance is
        # impossible at high stage counts)
        shares = [sum(weights[lo:hi]) for lo, hi in plan]
        assert max(shares) <= 2.2 * total / n_stages + max(weights)
    with pytest.raises(ValueError, match="n_stages"):
        unet_pp_plan(cfg, 64, 64, len(units) + 1)


@pytest.mark.parametrize("kind", ["sd15", "sdxl"])
@pytest.mark.parametrize("n_stages", [2, 3, 5])
def test_unet_pp_matches_single_device(mesh8, kind, n_stages):
    """Stage decomposition over distinct devices must reproduce the
    monolithic UNet forward: time/label embedders on stage 0, skips
    riding the pipe as a tuple of per-level shapes, LIFO consumption
    across stage boundaries, out head on the last stage."""
    from cremage_tpu.parallel.pipeline import UNetPP

    model, params, (x, t, ctx, y) = _tiny_unet(kind)
    want = np.asarray(model.apply(params, x, t, ctx, y), np.float32)
    pp = UNetPP(model, params, jax.devices()[:n_stages],
                h=x.shape[1], w=x.shape[2], n_stages=n_stages)
    got = pp(x, t, ctx, y=y)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=3e-5, rtol=3e-5)


def test_unet_pp_microbatch_and_validation(mesh8):
    from cremage_tpu.parallel.pipeline import UNetPP

    model, params, (x, t, ctx, y) = _tiny_unet("sd15")
    want = np.asarray(model.apply(params, x, t, ctx, y), np.float32)
    pp = UNetPP(model, params, jax.devices()[:2],
                h=x.shape[1], w=x.shape[2], n_stages=2)
    got = pp(x, t, ctx, microbatch=1)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=3e-5, rtol=3e-5)
    with pytest.raises(ValueError, match="divide"):
        pp(x, t, ctx, microbatch=3)
    with pytest.raises(ValueError, match="stages"):
        UNetPP(model, params, jax.devices()[:1], h=16, w=16, n_stages=2)
    import dataclasses as dc

    tome_model = type(model)(dc.replace(model.cfg, tome_ratio=0.5))
    with pytest.raises(ValueError, match="tome"):
        UNetPP(tome_model, params, jax.devices()[:2], h=16, w=16)
    sdxl_model, sdxl_params, (x2, t2, ctx2, y2) = _tiny_unet("sdxl")
    pp2 = UNetPP(sdxl_model, sdxl_params, jax.devices()[:2], h=16, w=16)
    with pytest.raises(ValueError, match="vector conditioning"):
        pp2(x2, t2, ctx2)


def test_unet_pp_composes_with_quantized_tree(mesh8):
    """Stage params are top-level slices of the full tree, so the
    (code, weight_scale) tuple leaves of an 8-bit-quantized tree ride
    along unchanged — PP output must match the monolithic forward on
    the SAME quantized params (the FLUX PP memory story, on the UNet)."""
    from cremage_tpu.io.quantize import quantize_params_8bit
    from cremage_tpu.parallel.pipeline import UNetPP

    model, params, (x, t, ctx, y) = _tiny_unet("sd15")
    qparams, rep = quantize_params_8bit(params, dtype="float8_e4m3",
                                        min_size=0)
    assert rep["tensors"] > 0
    want = np.asarray(model.apply(qparams, x, t, ctx, y), np.float32)
    pp = UNetPP(model, qparams, jax.devices()[:2],
                h=x.shape[1], w=x.shape[2], n_stages=2)
    got = pp(x, t, ctx)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=3e-5, rtol=3e-5)


def test_sd15_pipeline_pp_matches_plain(mesh8):
    """SD15Pipeline.use_mesh_pp: host-stepped Euler + staged UNet + VAE
    decode must match the plain single-device generate, txt2img and
    img2img (stochastic encode uses the same per-image key)."""
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.core.config import MODE_IMAGE_TO_IMAGE
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    bundle = make_bundle()
    opts = base_opts(sampler="Euler", sampling_steps=3)
    plain = SD15Pipeline(bundle).generate(opts)[0][0]
    pipe = SD15Pipeline(bundle).use_mesh_pp(jax.devices()[:3], n_stages=3)
    got = pipe.generate(opts)[0][0]
    assert_img01_close(got, plain, float_tol=2e-3)

    img = np.random.default_rng(0).random((64, 64, 3)).astype(np.float32)
    o2 = base_opts(sampler="Euler", sampling_steps=4,
                   mode=MODE_IMAGE_TO_IMAGE, strength=0.6)
    plain2 = SD15Pipeline(bundle).generate(o2, init_image=img)[0][0]
    got2 = pipe.generate(o2, init_image=img)[0][0]
    assert_img01_close(got2, plain2, float_tol=2e-3)


def test_sd15_pipeline_pp_rejects(mesh8):
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    bundle = make_bundle()
    pipe = SD15Pipeline(bundle).use_mesh_pp(jax.devices()[:2])
    for bad in (dict(deep_cache=2, sampler="Euler"),
                dict(tome_ratio=0.5, sampler="Euler"),
                dict(sampler="DDIM"),
                dict(sampler="Euler", sampler_s_churn=1.0)):
        with pytest.raises(ValueError):
            pipe.generate(base_opts(**bad))
    with pytest.raises(ValueError, match="one of"):
        pipe.use_mesh(None)
    pipe2 = SD15Pipeline(bundle)
    pipe2.mesh = object()   # any active DP/TP mesh
    with pytest.raises(ValueError, match="one of"):
        pipe2.use_mesh_pp(jax.devices()[:2])


def test_sdxl_pipeline_pp_matches_plain(mesh8):
    """SDXLPipeline.use_mesh_pp: host-stepped EulerEDM + VanillaCFG +
    staged UNet must match plain generate; the refiner leg builds its
    own UNetPP from the refiner params."""
    from tests.test_edm_sdxl import make_sdxl_bundle, xl_opts
    from cremage_tpu.pipelines.sdxl import SDXLPipeline

    bundle = make_sdxl_bundle(with_refiner=True)
    opts = xl_opts(sampling_steps=3)
    plain = SDXLPipeline(bundle).generate(opts)[0][0]
    pipe = SDXLPipeline(bundle).use_mesh_pp(jax.devices()[:3], n_stages=3)
    got = pipe.generate(opts)[0][0]
    assert_img01_close(got, plain, float_tol=2e-3)

    o2 = xl_opts(refiner_strength=0.3, sampling_steps=4)
    plain2 = SDXLPipeline(bundle).generate(o2)[0][0]
    got2 = pipe.generate(o2)[0][0]
    assert_img01_close(got2, plain2, float_tol=2e-3)


def test_sdxl_pipeline_pp_rejects(mesh8):
    from tests.test_edm_sdxl import make_sdxl_bundle, xl_opts
    from cremage_tpu.pipelines.sdxl import SDXLPipeline

    pipe = SDXLPipeline(make_sdxl_bundle()).use_mesh_pp(jax.devices()[:2])
    for bad in (dict(deep_cache=2), dict(tome_ratio=0.5),
                dict(sampler="DPMPP2MSampler"),
                dict(guider="IdentityGuider"),
                dict(sampler_s_churn=1.0)):
        with pytest.raises(ValueError):
            pipe.generate(xl_opts(**bad))


# ---------- Kandinsky decoder + SVD video UNet pipeline parallelism ----------


def _tiny_kandinsky_unet():
    from cremage_tpu.models.kandinsky_decoder import (
        KandinskyUNet, KandinskyUNetConfig,
    )

    cfg = KandinskyUNetConfig(in_channels=4, out_channels=8,
                              block_out_channels=(32, 64, 96, 128),
                              layers_per_block=2, context_dim=24,
                              attention_head_dim=16, dtype=jnp.float32)
    model = KandinskyUNet(cfg)
    b, h, w = 2, 16, 16
    x = jax.random.normal(jax.random.key(0), (b, h, w, 4))
    t = jnp.array([3.0, 7.0])
    ctx = jax.random.normal(jax.random.key(1), (b, 5, 24))
    y = jax.random.normal(jax.random.key(2), (b, cfg.time_embed_dim))
    params = model.init(jax.random.key(3), x, t, ctx, y)
    return model, params, (x, t, ctx, y)


@pytest.mark.parametrize("n_stages", [2, 3, 5])
def test_kandinsky_pp_matches_single_device(mesh8, n_stages):
    """KandinskyPP over the real decoder anatomy (ScaleShiftResBlocks
    with in-block up/down sampling, AddedKVAttention, plain first
    level): staged forward == monolithic."""
    from cremage_tpu.parallel.pipeline import KandinskyPP

    model, params, (x, t, ctx, y) = _tiny_kandinsky_unet()
    want = np.asarray(model.apply(params, x, t, ctx, y), np.float32)
    pp = KandinskyPP(model, params, jax.devices()[:n_stages],
                     h=x.shape[1], w=x.shape[2], n_stages=n_stages)
    got = pp(x, t, ctx, y=y, microbatch=1 if n_stages == 2 else None)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=3e-5, rtol=3e-5)


def test_kandinsky_pipeline_pp_matches_plain(mesh8):
    """KandinskyPipeline.use_mesh_pp (UNetModel stand-in decoder routes
    through UNetPP; the production KandinskyUNet through KandinskyPP):
    host-stepped Euler == plain generate, txt2img + img2img."""
    from tests.test_family_pipelines import make_kandinsky, opts
    from cremage_tpu.core.config import MODE_IMAGE_TO_IMAGE
    from cremage_tpu.pipelines.kandinsky import KandinskyPipeline

    o = opts(sampler="Euler", sampling_steps=3)
    plain = KandinskyPipeline(make_kandinsky()).generate(o)[0][0]
    pipe = KandinskyPipeline(make_kandinsky()).use_mesh_pp(
        jax.devices()[:2], n_stages=2)
    got = pipe.generate(o)[0][0]
    assert_img01_close(got, plain, float_tol=2e-3)

    init = np.random.RandomState(0).uniform(
        -1, 1, (64, 64, 3)).astype(np.float32)
    o2 = opts(sampler="Euler", sampling_steps=4,
              mode=MODE_IMAGE_TO_IMAGE, strength=0.5)
    p2 = KandinskyPipeline(make_kandinsky()).generate(
        o2, init_image=init)[0][0]
    g2 = pipe.generate(o2, init_image=init)[0][0]
    assert_img01_close(g2, p2, float_tol=2e-3)


def test_kandinsky_pipeline_pp_rejects(mesh8):
    from tests.test_family_pipelines import make_kandinsky, opts
    from cremage_tpu.pipelines.kandinsky import KandinskyPipeline

    pipe = KandinskyPipeline(make_kandinsky()).use_mesh_pp(
        jax.devices()[:2])
    for bad in (dict(deep_cache=2, sampler="Euler"),
                dict(tome_ratio=0.5, sampler="Euler"),
                dict(sampler="Euler A")):
        with pytest.raises(ValueError):
            pipe.generate(opts(**bad))


def test_video_unet_pp_matches_single_device(mesh8):
    """VideoUNetPP: the staged video UNet must reproduce the monolithic
    forward including temporal attention whose frame groups ride whole
    inside each microbatch."""
    from tests.test_svd import T, tiny_video_unet
    from cremage_tpu.parallel.pipeline import VideoUNetPP

    model, params = tiny_video_unet()
    bt = 2 * T
    ks = jax.random.split(jax.random.key(5), 4)
    x = jax.random.normal(ks[0], (bt, 8, 8, 8))
    t = jnp.full((bt,), 0.4)
    ctx = jax.random.normal(ks[1], (bt, 1, model.cfg.context_dim))
    y = jax.random.normal(ks[2], (bt, model.cfg.adm_in_channels))
    want = np.asarray(model.apply(params, x, t, ctx, y), np.float32)
    for n_stages, mb in ((2, None), (3, T)):
        pp = VideoUNetPP(model, params, jax.devices()[:n_stages],
                         h=8, w=8, n_stages=n_stages)
        got = pp(x, t, ctx, y=y, microbatch=mb)
        np.testing.assert_allclose(np.asarray(got, np.float32), want,
                                   atol=3e-5, rtol=3e-5)
    pp = VideoUNetPP(model, params, jax.devices()[:2], h=8, w=8)
    with pytest.raises(ValueError, match="num_frames"):
        pp(x, t, ctx, y=y, microbatch=2)   # T=3: breaks a frame group


def test_svd_pipeline_pp_matches_plain(mesh8, tmp_path):
    """SVDPipeline.use_mesh_pp: host-stepped EulerEDM + frame-axis
    microbatching == plain sample()."""
    from tests.test_svd import T, tiny_video_unet
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from cremage_tpu.pipelines.svd import SVDBundle, SVDOptions, SVDPipeline

    m, params = tiny_video_unet()
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                  num_res_blocks=1, dtype=jnp.float32))
    vp = vae.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))
    bundle = SVDBundle(unet=m, unet_params=params, vae=vae, vae_params=vp)
    img = np.random.RandomState(0).uniform(
        0, 1, (64, 64, 3)).astype(np.float32)
    so = SVDOptions(num_frames=T, num_steps=2, seed=4)
    plain = SVDPipeline(bundle).sample(img, so)
    pipe = SVDPipeline(bundle).use_mesh_pp(jax.devices()[:2], n_stages=2,
                                           microbatch=T)
    got = pipe.sample(img, so)
    assert_img01_close(got, plain, float_tol=2e-3)
    for bad in (dict(deep_cache=2), dict(tome_ratio=0.5)):
        with pytest.raises(ValueError):
            pipe.sample(img, SVDOptions(num_frames=T, num_steps=2,
                                        seed=4, **bad))


# ---------------- Stable Cascade (Würstchen B/C) pipeline parallelism --------


def _tiny_stage_c():
    from cremage_tpu.models.cascade import StageC, StageCConfig

    cfg = StageCConfig(c_hidden=(32, 64), blocks=(2, 3), num_heads=4,
                       c_cond=32, clip_text_dim=24,
                       clip_text_pooled_dim=24, dtype=jnp.float32)
    sc = StageC(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16))
    r = jnp.array([0.3, 0.7])
    ct = jax.random.normal(jax.random.key(1), (2, 7, 24))
    cp = jax.random.normal(jax.random.key(2), (2, 24))
    ci = jax.random.normal(jax.random.key(3), (2, cfg.clip_img_dim))
    params = sc.init(jax.random.key(4), x, r, ct, cp, ci)
    return sc, params, (x, r, ct, cp, ci)


@pytest.mark.parametrize("n_stages", [2, 3])
def test_stage_c_pp_matches_single_device(mesh8, n_stages):
    """StageCPP: group-granular staging of the Würstchen trunk (one
    skip per level consumed by index, conditioning stream riding the
    carry) == monolithic, with and without the CLIP image stream."""
    from cremage_tpu.parallel.pipeline import StageCPP

    sc, params, (x, r, ct, cp, ci) = _tiny_stage_c()
    want = np.asarray(sc.apply(params, x, r, ct, cp, ci), np.float32)
    pp = StageCPP(sc, params, jax.devices()[:n_stages], h=8, w=8,
                  n_stages=n_stages)
    got = pp(x, r, ct, cp, clip_img=ci)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=3e-5, rtol=3e-5)
    want2 = np.asarray(sc.apply(params, x, r, ct, cp), np.float32)
    got2 = pp(x, r, ct, cp, microbatch=1)
    np.testing.assert_allclose(np.asarray(got2, np.float32), want2,
                               atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("n_stages", [2, 4])
def test_stage_b_pp_matches_single_device(mesh8, n_stages):
    """StageBPP: repeat-mapper up levels stay atomic (the skip re-concats
    on every repeat), effnet/pixels mappers on stage 0, patch-2
    unshuffle/shuffle on the first/last stages."""
    from cremage_tpu.models.cascade import StageB, StageBConfig
    from cremage_tpu.parallel.pipeline import StageBPP

    cfg = StageBConfig(c_hidden=(16, 32, 48), blocks=(1, 2, 3),
                       down_repeats=(1, 1, 1), up_repeats=(2, 2, 1),
                       num_heads=4, c_cond=32, clip_text_pooled_dim=24,
                       attn_levels=(1, 2), dtype=jnp.float32)
    sb = StageB(cfg)
    x = jax.random.normal(jax.random.key(5), (2, 16, 16, 4))
    r = jnp.array([0.3, 0.7])
    eff = jax.random.normal(jax.random.key(6), (2, 8, 8, 16))
    cp = jax.random.normal(jax.random.key(2), (2, 24))
    params = sb.init(jax.random.key(7), x, r, eff, cp)
    want = np.asarray(sb.apply(params, x, r, eff, cp,
                               sca=jnp.array([0.2, 0.2])), np.float32)
    pp = StageBPP(sb, params, jax.devices()[:n_stages], h=16, w=16,
                  n_stages=n_stages)
    got = pp(x, r, eff, cp, sca=0.2, microbatch=1)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=3e-5, rtol=3e-5)


def test_cascade_pipeline_pp_matches_plain(mesh8):
    """CascadePipeline.use_mesh_pp: BOTH trunks staged; the host-stepped
    Euler Ancestral uses the jitted sampler's exact key schedule, so
    the full C -> B -> decode chain is reproduced."""
    from tests.test_family_pipelines import fake_text_encode, opts, tiny_vae
    from cremage_tpu.models.cascade import (
        StageB, StageBConfig, StageC, StageCConfig,
    )
    from cremage_tpu.pipelines.cascade import CascadeBundle, CascadePipeline

    TD = 32
    sc = StageC(StageCConfig(c_hidden=(32, 64), blocks=(1, 1), num_heads=4,
                             c_cond=32, clip_text_dim=TD,
                             clip_text_pooled_dim=TD, dtype=jnp.float32))
    scp = sc.init(jax.random.key(0), jnp.zeros((1, 2, 2, 16)),
                  jnp.zeros((1,)), jnp.zeros((1, 7, TD)),
                  jnp.zeros((1, TD)))
    sb = StageB(StageBConfig(c_hidden=(16, 32), blocks=(1, 1), num_heads=4,
                             c_cond=32, clip_text_pooled_dim=TD,
                             attn_levels=(1,), down_repeats=(1, 1),
                             up_repeats=(1, 1), dtype=jnp.float32))
    sbp = sb.init(jax.random.key(1), jnp.zeros((1, 8, 8, 4)),
                  jnp.zeros((1,)), jnp.zeros((1, 8, 8, 16)),
                  jnp.zeros((1, TD)))
    vae, vp = tiny_vae()
    bundle = CascadeBundle(stage_c=sc, stage_c_params=scp, stage_b=sb,
                           stage_b_params=sbp, vqgan=vae, vqgan_params=vp,
                           text_encode=fake_text_encode,
                           c_compression=32, b_compression=8)
    o = opts(sampling_steps=2)
    plain = CascadePipeline(bundle).generate(o)[0][0]
    pipe = CascadePipeline(bundle).use_mesh_pp(jax.devices()[:2],
                                               n_stages=2)
    got = pipe.generate(o)[0][0]
    assert_img01_close(got, plain, float_tol=2e-3)
    for bad in (dict(deep_cache=2), dict(tome_ratio=0.5)):
        with pytest.raises(ValueError):
            pipe.generate(opts(sampling_steps=2, **bad))


def test_cascade_pipeline_pp_rejects_standin(mesh8):
    """UNet stand-in cores have no Würstchen staging — actionable error,
    not a key mismatch."""
    from tests.test_family_pipelines import (
        TD, fake_text_encode, opts, tiny_vae,
    )
    from cremage_tpu.models.unet import UNetModel
    from cremage_tpu.pipelines.cascade import (
        CascadeBundle, CascadePipeline, stage_b_config, stage_c_config,
    )

    ccfg = stage_c_config(text_dim=TD, dtype=jnp.float32,
                          model_channels=32, num_res_blocks=1, num_heads=4)
    sc = UNetModel(ccfg)
    scp = sc.init(jax.random.key(0), jnp.zeros((1, 2, 2, 16)),
                  jnp.zeros((1,)), jnp.zeros((1, 7, TD)),
                  jnp.zeros((1, TD)))
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
    pipe = CascadePipeline(bundle).use_mesh_pp(jax.devices()[:2])
    with pytest.raises(ValueError, match="StageB/StageC"):
        pipe.generate(opts(sampling_steps=2))
