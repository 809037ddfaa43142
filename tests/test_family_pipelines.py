"""Kandinsky 2.2 / Stable Cascade / Hunyuan-DiT pipelines on tiny cores."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.core.config import (
    GenerationOptions, MODE_IMAGE_TO_IMAGE, MODE_INPAINTING,
)
from cremage_tpu.models.hunyuan import HunyuanConfig, HunyuanDiT
from cremage_tpu.models.kandinsky import DiffusionPrior, PriorConfig
from cremage_tpu.models.unet import UNetConfig, UNetModel
from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
from cremage_tpu.pipelines.cascade import (
    CascadeBundle, CascadePipeline, stage_b_config, stage_c_config,
)
from cremage_tpu.pipelines.hunyuan import HunyuanBundle, HunyuanPipeline
from cremage_tpu.pipelines.kandinsky import KandinskyBundle, KandinskyPipeline

TD = 32  # tiny text dim
IED = 24  # tiny image-embed dim


def fake_text_encode(prompt):
    rng = np.random.RandomState(abs(hash(prompt)) % (2**31))
    return (rng.randn(7, TD).astype(np.float32),
            rng.randn(TD).astype(np.float32))


def tiny_vae(z=4, scale=0.18215):
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                  num_res_blocks=1, z_channels=z,
                                  embed_dim=z, scale_factor=scale,
                                  dtype=jnp.float32))
    vp = vae.init(jax.random.key(9), jnp.zeros((1, 64, 64, 3)))
    return vae, vp


def opts(**kw):
    d = dict(prompt="a cat", negative_prompt="bad", H=64, W=64,
             sampling_steps=2, n_samples=1, seed=7, scale=4.0,
             sampler="Euler A", safety_check=False)
    d.update(kw)
    return GenerationOptions(**d)


# ---------------- Kandinsky --------------------------------------------------

def make_kandinsky():
    pcfg = PriorConfig(image_embed_dim=IED, text_embed_dim=TD, hidden=32,
                       num_layers=2, num_heads=4, text_tokens=7,
                       dtype=jnp.float32)
    prior = DiffusionPrior(pcfg)
    pp = prior.init(jax.random.key(0), jnp.zeros((1, IED)), jnp.zeros((1,)),
                    jnp.zeros((1, 7, TD)), jnp.zeros((1, TD)))
    dcfg = UNetConfig(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=4,
        transformer_depth=(1, 1), transformer_depth_middle=1,
        context_dim=IED, adm_in_channels=IED, dtype=jnp.float32)
    dec = UNetModel(dcfg)
    dp = dec.init(jax.random.key(1), jnp.zeros((1, 8, 8, 4)),
                  jnp.zeros((1,)), jnp.zeros((1, 1, IED)),
                  jnp.zeros((1, IED)))
    vae, vp = tiny_vae()
    return KandinskyBundle(prior=prior, prior_params=pp, decoder=dec,
                           decoder_params=dp, vae=vae, vae_params=vp,
                           text_encode=fake_text_encode, prior_steps=2)


def test_kandinsky_prior_shapes():
    b = make_kandinsky()
    pipe = KandinskyPipeline(b)
    emb, neg = pipe.run_prior("a cat", "bad", 4.0, jax.random.key(0))
    assert emb.shape == (IED,) and np.isfinite(emb).all()


def test_kandinsky_txt2img():
    pipe = KandinskyPipeline(make_kandinsky())
    img, meta = pipe.generate(opts())[0]
    assert img.shape == (64, 64, 3) and np.isfinite(img).all()


def test_kandinsky_img2img_and_inpaint():
    pipe = KandinskyPipeline(make_kandinsky())
    init = np.random.RandomState(0).uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    img, _ = pipe.generate(opts(mode=MODE_IMAGE_TO_IMAGE, strength=0.5,
                                sampling_steps=4), init_image=init)[0]
    assert np.isfinite(img).all()
    mask = np.zeros((64, 64), np.float32)
    mask[20:40, 20:40] = 1.0
    img2, _ = pipe.generate(opts(mode=MODE_INPAINTING), init_image=init,
                            mask_image=mask)[0]
    init01 = (init + 1) / 2
    np.testing.assert_allclose(img2[:8, :8], init01[:8, :8], atol=1e-5)


def test_kandinsky_with_image_conditioner_and_clip_stats():
    """Real-checkpoint decoder flow: adm_identity UNet + external image
    conditioner heads + clip mean/std unnormalization of prior output."""
    import dataclasses as DC

    from cremage_tpu.models.kandinsky import KandinskyImageConditioner

    b = make_kandinsky()
    mc = 32
    dcfg = UNetConfig(
        in_channels=4, out_channels=4, model_channels=mc, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=4,
        transformer_depth=(1, 1), transformer_depth_middle=1,
        context_dim=16, adm_identity=True, dtype=jnp.float32)
    dec = UNetModel(dcfg)
    dp = dec.init(jax.random.key(3), jnp.zeros((1, 8, 8, 4)),
                  jnp.zeros((1,)), jnp.zeros((1, 3, 16)),
                  jnp.zeros((1, 4 * mc)))
    cond = KandinskyImageConditioner(time_embed_dim=4 * mc, cross_dim=16,
                                     num_tokens=3, dtype=jnp.float32)
    cp = cond.init(jax.random.key(4), jnp.zeros((1, IED)))
    rng = np.random.RandomState(5)
    b = DC.replace(b, decoder=dec, decoder_params=dp, image_cond=cond,
                   image_cond_params=cp,
                   clip_mean=rng.randn(IED).astype(np.float32),
                   clip_std=(1 + rng.rand(IED)).astype(np.float32))
    pipe = KandinskyPipeline(b)
    img, _ = pipe.generate(opts())[0]
    assert img.shape == (64, 64, 3) and np.isfinite(img).all()


def test_kandinsky_real_decoder_architecture_end_to_end():
    """Full pipeline through the unCLIP-style KandinskyUNet (scale-shift
    resnets, added-KV attention, eps+variance output)."""
    import dataclasses as DC

    from cremage_tpu.models.kandinsky import KandinskyImageConditioner
    from cremage_tpu.models.kandinsky_decoder import (
        KandinskyUNet, KandinskyUNetConfig,
    )

    b = make_kandinsky()
    cfg = KandinskyUNetConfig(block_out_channels=(32, 64),
                              layers_per_block=1, context_dim=16,
                              attention_head_dim=16, dtype=jnp.float32)
    dec = KandinskyUNet(cfg)
    dp = dec.init(jax.random.key(6), jnp.zeros((1, 8, 8, 4)),
                  jnp.zeros((1,)), jnp.zeros((1, 3, 16)),
                  jnp.zeros((1, cfg.time_embed_dim)))
    cond = KandinskyImageConditioner(time_embed_dim=cfg.time_embed_dim,
                                     cross_dim=16, num_tokens=3,
                                     dtype=jnp.float32)
    cp = cond.init(jax.random.key(7), jnp.zeros((1, IED)))
    b = DC.replace(b, decoder=dec, decoder_params=dp, image_cond=cond,
                   image_cond_params=cp)
    pipe = KandinskyPipeline(b)
    img, _ = pipe.generate(opts())[0]
    assert img.shape == (64, 64, 3) and np.isfinite(img).all()


# ---------------- Cascade ----------------------------------------------------

@pytest.mark.slow
def make_cascade():
    ccfg = stage_c_config(text_dim=TD, dtype=jnp.float32, model_channels=32,
                          num_res_blocks=1, num_heads=4)
    sc = UNetModel(ccfg)
    scp = sc.init(jax.random.key(0), jnp.zeros((1, 2, 2, 16)),
                  jnp.zeros((1,)), jnp.zeros((1, 7, TD)), jnp.zeros((1, TD)))
    bcfg = stage_b_config(dtype=jnp.float32, model_channels=32,
                          num_res_blocks=1, num_heads=4,
                          attention_resolutions=(2,), channel_mult=(1, 2),
                          transformer_depth=(1, 1),
                          context_dim=TD)
    sb = UNetModel(bcfg)
    sbp = sb.init(jax.random.key(1), jnp.zeros((1, 16, 16, 20)),
                  jnp.zeros((1,)), jnp.zeros((1, 7, TD)))
    vae, vp = tiny_vae()
    # tiny VAE is 8x; treat b_compression=8 for the test
    return CascadeBundle(stage_c=sc, stage_c_params=scp, stage_b=sb,
                         stage_b_params=sbp, vqgan=vae, vqgan_params=vp,
                         text_encode=fake_text_encode,
                         c_compression=32, b_compression=8)


def test_cascade_txt2img():
    pipe = CascadePipeline(make_cascade())
    img, meta = pipe.generate(opts())[0]
    assert img.shape == (64, 64, 3) and np.isfinite(img).all()


@pytest.mark.slow
def test_cascade_real_wuerstchen_cores_end_to_end():
    """Full pipeline through the real Würstchen block anatomy (depthwise
    ResBlock + GRN, timestep gates, added-KV attention)."""
    from cremage_tpu.models.cascade import (
        StageB, StageBConfig, StageC, StageCConfig,
    )

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
    bundle = CascadeBundle(stage_c=sc, stage_c_params=scp, stage_b=sb,
                           stage_b_params=sbp, vqgan=vae, vqgan_params=vp,
                           text_encode=fake_text_encode,
                           c_compression=32, b_compression=8)
    pipe = CascadePipeline(bundle)
    img, _ = pipe.generate(opts())[0]
    assert img.shape == (64, 64, 3) and np.isfinite(img).all()


# ---------------- Hunyuan ----------------------------------------------------

@pytest.mark.slow
def make_hunyuan():
    hcfg = HunyuanConfig(hidden_size=32, depth=4, num_heads=4, clip_dim=TD,
                         mt5_dim=TD, mlp_ratio=2.0, dtype=jnp.float32)
    dit = HunyuanDiT(hcfg)
    dp = dit.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
                  jnp.zeros((1,)), jnp.zeros((1, 7, TD)),
                  jnp.zeros((1, 7, TD)))

    def text_encode(prompt):
        rng = np.random.RandomState(abs(hash(prompt)) % (2**31))
        return (rng.randn(7, TD).astype(np.float32),
                rng.randn(7, TD).astype(np.float32))

    vae, vp = tiny_vae()
    return HunyuanBundle(dit=dit, dit_params=dp, vae=vae, vae_params=vp,
                         text_encode=text_encode)


def test_hunyuan_txt2img():
    pipe = HunyuanPipeline(make_hunyuan())
    img, meta = pipe.generate(opts(sampler="DPM++ 2M"))[0]
    assert img.shape == (64, 64, 3) and np.isfinite(img).all()


def test_hunyuan_skip_connections_exist():
    hcfg = HunyuanConfig(hidden_size=32, depth=4, num_heads=4, clip_dim=TD,
                         mt5_dim=TD, mlp_ratio=2.0, dtype=jnp.float32)
    dit = HunyuanDiT(hcfg)
    params = dit.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
                      jnp.zeros((1,)), jnp.zeros((1, 7, TD)),
                      jnp.zeros((1, 7, TD)))
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"_".join(str(p.key) for p in path) for path, _ in flat}
    assert any("blocks_2_skip_linear" in n for n in names)
    assert not any("blocks_0_skip_linear" in n for n in names)
