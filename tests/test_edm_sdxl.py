"""EDM sampling stack + SDXL pipeline tests (tiny models)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.core.config import GenerationOptions
from cremage_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from cremage_tpu.models.open_clip import OpenCLIPTextConfig, OpenCLIPTextModel
from cremage_tpu.models.unet import UNetConfig, UNetModel
from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
from cremage_tpu.pipelines.sdxl import (
    SDXLBundle, SDXLConditioner, SDXLPipeline, fourier_vector_embedding,
)
from cremage_tpu.prompt.tokenizer import default_tokenizer
from cremage_tpu.samplers import edm as E

L_HID = 32
G_HID = 64


def test_legacy_ddpm_discretization():
    d = E.LegacyDDPMDiscretization()
    s20 = d(20)
    assert s20.shape == (21,)
    assert s20[-1] == 0 and np.all(np.diff(s20) < 0)
    s_full = d(1000, do_append_zero=False)
    assert s_full.shape == (1000,)
    # the max sigma equals the table's largest value
    assert abs(s_full[0] - np.sqrt((1 - d.alphas_cumprod[-1]) / d.alphas_cumprod[-1])) < 1e-9


def test_edm_discretization():
    d = E.EDMDiscretization()
    s = d(10)
    assert abs(s[0] - 80.0) < 1e-9 and abs(s[-2] - 0.002) < 1e-9 and s[-1] == 0


def test_discrete_denoiser_quantization():
    table = E.LegacyDDPMDiscretization()(1000, do_append_zero=False)  # desc
    seen = {}

    def network(x, t, cond):
        seen["t"] = np.asarray(t)
        return jnp.zeros_like(x)

    den = E.DiscreteDenoiserSGM(network, np.asarray(table)[::-1].copy())
    x = jnp.ones((2, 4, 4, 4), jnp.float32)
    sigma_exact = float(table[500])
    out = den(x, sigma_exact, None)
    # c_noise is the index into the DESC table
    assert seen["t"].shape == (2,)
    assert int(seen["t"][0]) == 500
    # eps=0 => denoised = x * c_skip = x
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5)


def test_vanilla_cfg_guider():
    def denoiser(x, sigma, cond):
        return x * 0 + cond["vector"][:, 0, None, None, None]

    c = {"crossattn": jnp.ones((1, 77, 8)), "vector": jnp.full((1, 4), 3.0)}
    uc = {"crossattn": jnp.ones((1, 77, 8)), "vector": jnp.full((1, 4), 1.0)}
    fn = E.vanilla_cfg(denoiser, c, uc, scale=2.0)
    out = fn(jnp.zeros((1, 2, 2, 4)), 1.0)
    np.testing.assert_allclose(np.asarray(out), 1 + 2 * (3 - 1), rtol=1e-6)


def test_linear_prediction_guider_per_frame():
    num_frames = 4

    def denoiser(x, sigma, cond):
        b = x.shape[0]
        # uncond half returns 0, cond half returns 1
        return jnp.concatenate(
            [jnp.zeros((b // 2,) + x.shape[1:]), jnp.ones((b // 2,) + x.shape[1:])]
        )

    c = {"crossattn": jnp.ones((num_frames, 1, 1)), "vector": jnp.ones((num_frames, 1))}
    uc = c
    fn = E.linear_prediction_guider(denoiser, c, uc, scale=3.0,
                                    num_frames=num_frames, min_scale=1.0)
    out = np.asarray(fn(jnp.zeros((num_frames, 2, 2, 1)), 1.0))
    expected = np.linspace(1.0, 3.0, num_frames)
    np.testing.assert_allclose(out[:, 0, 0, 0], expected, rtol=1e-5)


def test_run_sgm_sampler_input_scaling():
    sigmas = E.EDMDiscretization(sigma_min=0.05, sigma_max=10.0)(20)
    gauss = lambda x, s: x / (1 + np.float32(1.0) * s**2)
    x = jax.random.normal(jax.random.key(0), (1, 4, 4, 4), jnp.float32)
    out = E.run_sgm_sampler("HeunEDMSampler", gauss, x, sigmas,
                            key=jax.random.key(1))
    # exact ODE solution from x*sqrt(1+s0^2): x*sqrt(1+s0^2)/sqrt(1+s0^2)=x
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=0.1)


@pytest.mark.parametrize("name", E.SGM_SAMPLER_NAMES)
def test_all_sgm_samplers_run(name):
    sigmas = E.LegacyDDPMDiscretization()(4)
    gauss = lambda x, s: x / (1 + s**2)
    x = jax.random.normal(jax.random.key(0), (1, 4, 4, 4), jnp.float32)
    out = E.run_sgm_sampler(name, gauss, x, sigmas, key=jax.random.key(1))
    assert np.isfinite(np.asarray(out)).all()


# ---------------- conditioner + pipeline ------------------------------------

def make_sdxl_bundle(with_refiner=False, inpaint=False):
    adm = G_HID + 3 * 512
    unet_cfg = UNetConfig(
        in_channels=9 if inpaint else 4,
        out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
        transformer_depth=(1, 1), transformer_depth_middle=1,
        context_dim=L_HID + G_HID, adm_in_channels=adm,
        use_linear_in_transformer=True, dtype=jnp.float32,
    )
    unet = UNetModel(unet_cfg)
    unet_params = unet.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, unet_cfg.in_channels)),
        jnp.zeros((1,)),
        jnp.zeros((1, 77, L_HID + G_HID)), jnp.zeros((1, adm)),
    )
    clip = CLIPTextModel(CLIPTextConfig(
        hidden_size=L_HID, num_layers=2, num_heads=4, intermediate_size=64,
        dtype=jnp.float32))
    clip_params = clip.init(jax.random.key(1), jnp.zeros((1, 77), jnp.int32))
    oc = OpenCLIPTextModel(OpenCLIPTextConfig(
        width=G_HID, num_layers=2, num_heads=4, dtype=jnp.float32))
    oc_params = oc.init(jax.random.key(2), jnp.zeros((1, 77), jnp.int32))
    tok = default_tokenizer()
    cond = SDXLConditioner((clip, clip_params), (oc, oc_params), tok)

    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                  num_res_blocks=1, scale_factor=0.13025,
                                  dtype=jnp.float32))
    vae_params = vae.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))

    refiner_unet = refiner_params = refiner_cond = None
    if with_refiner:
        r_adm = G_HID + 2 * 512 + 256
        r_cfg = dataclasses.replace(unet_cfg, context_dim=G_HID,
                                    adm_in_channels=r_adm)
        refiner_unet = UNetModel(r_cfg)
        refiner_params = refiner_unet.init(
            jax.random.key(4), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 77, G_HID)), jnp.zeros((1, r_adm)),
        )
        refiner_cond = SDXLConditioner(None, (oc, oc_params), tok,
                                       refiner_mode=True)
    return SDXLBundle(
        unet=unet, unet_params=unet_params, conditioner=cond,
        vae=vae, vae_params=vae_params,
        refiner_unet=refiner_unet, refiner_params=refiner_params,
        refiner_conditioner=refiner_cond, inpaint=inpaint,
    )


@pytest.fixture(scope="module")
def sdxl_bundle():
    return make_sdxl_bundle(with_refiner=True)


def xl_opts(**kw):
    d = dict(prompt="a dog", negative_prompt="ugly", H=64, W=64,
             sampling_steps=3, n_samples=1, seed=11, scale=5.0,
             sampler="EulerEDMSampler", guider="VanillaCFG",
             discretization="LegacyDDPMDiscretization", safety_check=False)
    d.update(kw)
    return GenerationOptions(**d)


def test_fourier_vector_embedding_shape():
    v = fourier_vector_embedding((512, 512))
    assert v.shape == (512,)
    v1 = fourier_vector_embedding([6.0])
    assert v1.shape == (256,)


def test_conditioner_shapes(sdxl_bundle):
    c, uc = sdxl_bundle.conditioner.encode_pair(xl_opts(), 2)
    assert c["crossattn"].shape == (2, 77, L_HID + G_HID)
    assert c["vector"].shape == (2, G_HID + 3 * 512)
    assert uc["crossattn"].shape == c["crossattn"].shape


def test_refiner_conditioner_shapes(sdxl_bundle):
    c, uc = sdxl_bundle.refiner_conditioner.encode_pair(xl_opts(), 1)
    assert c["crossattn"].shape == (1, 77, G_HID)
    assert c["vector"].shape == (1, G_HID + 2 * 512 + 256)


def test_sdxl_txt2img_end_to_end(sdxl_bundle):
    pipe = SDXLPipeline(sdxl_bundle)
    msgs = []
    results = pipe.generate(xl_opts(), status_cb=msgs.append)
    img, meta = results[0]
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert meta["seed"] == 11
    assert any("Sampling 1 / 3" in m for m in msgs)


@pytest.mark.slow
def test_sdxl_with_refiner(sdxl_bundle):
    pipe = SDXLPipeline(sdxl_bundle)
    results = pipe.generate(xl_opts(refiner_strength=0.3, sampling_steps=4))
    assert np.isfinite(results[0][0]).all()


def test_sdxl_img2img(sdxl_bundle):
    pipe = SDXLPipeline(sdxl_bundle)
    init = np.random.RandomState(0).uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    results = pipe.generate(xl_opts(strength=0.5, sampling_steps=4),
                            init_image=init)
    assert np.isfinite(results[0][0]).all()


@pytest.mark.parametrize("sampler", ["DPMPP2MSampler", "EulerAncestralSampler"])
def test_sdxl_sampler_menu(sdxl_bundle, sampler):
    pipe = SDXLPipeline(sdxl_bundle)
    results = pipe.generate(xl_opts(sampler=sampler))
    assert np.isfinite(results[0][0]).all()


def test_sdxl_lcm_sampler(sdxl_bundle):
    # LCM-LoRA sampling on SDXL (samplers/lcm.py): 4-step txt2img
    pipe = SDXLPipeline(sdxl_bundle)
    msgs = []
    results = pipe.generate(xl_opts(sampler="LCM", sampling_steps=4,
                                    scale=1.5), status_cb=msgs.append)
    assert np.isfinite(results[0][0]).all()
    assert any("Sampling 4 / 4" in m for m in msgs)
    # img2img: strength maps to the truncated origin grid and runs
    # t_enc = int(strength*steps) LCM steps (k-space stochastic encode
    # to the truncated grid's top sigma, same contract as SD1.5 LCM)
    init = np.zeros((64, 64, 3), np.float32)
    msgs = []
    results = pipe.generate(xl_opts(sampler="LCM", strength=0.5,
                                    sampling_steps=8, scale=1.5),
                            init_image=init, status_cb=msgs.append)
    assert np.isfinite(results[0][0]).all()
    assert any("Sampling 4 / 4" in m for m in msgs)
    # non-CFG guiders are rejected with actionable errors
    with pytest.raises(ValueError, match="VanillaCFG"):
        pipe.generate(xl_opts(sampler="LCM", guider="IdentityGuider"))


def test_sdxl_edm_discretization_option(sdxl_bundle):
    pipe = SDXLPipeline(sdxl_bundle)
    results = pipe.generate(xl_opts(discretization="EDMDiscretization"))
    assert np.isfinite(results[0][0]).all()


def _inpaint_fixture_args():
    rng = np.random.RandomState(3)
    init = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    return init, mask


def test_sdxl_inpaint_dedicated_9ch_unet():
    """Dedicated SDXL inpaint UNet: [x, mask, masked-latent] concat
    (diffusers stable-diffusion-xl-1.0-inpainting-0.1 layout, reached in
    the reference via sdxl_inpaint.py:71 AutoPipelineForInpainting)."""
    bundle = make_sdxl_bundle(inpaint=True)
    pipe = SDXLPipeline(bundle)
    init, mask = _inpaint_fixture_args()
    results = pipe.generate(xl_opts(sampling_steps=3), init_image=init,
                            mask_image=mask)
    img = results[0][0]
    assert img.shape == (64, 64, 3) and np.isfinite(img).all()
    # outside the mask the composite restores the original exactly
    init01 = (init + 1) / 2
    outside = mask < 0.5
    np.testing.assert_allclose(img[outside], init01[outside], atol=1e-5)
    # inside the mask the model repainted (should differ from source)
    assert np.abs(img[~outside] - init01[~outside]).mean() > 1e-3


def test_sdxl_inpaint_latent_blend_fallback(sdxl_bundle):
    """Non-inpaint checkpoint: latent-mask technique, composited back
    over the original outside the mask (documented divergence pin)."""
    pipe = SDXLPipeline(sdxl_bundle)
    init, mask = _inpaint_fixture_args()
    results = pipe.generate(xl_opts(strength=0.6, sampling_steps=3),
                            init_image=init, mask_image=mask)
    img = results[0][0]
    init01 = (init + 1) / 2
    outside = mask < 0.5
    np.testing.assert_allclose(img[outside], init01[outside], atol=1e-5)


def test_openclip_key_splitting():
    from cremage_tpu.io.checkpoint import openclip_text_subdict

    sd = {
        "conditioner.embedders.1.model.transformer.resblocks.0.attn.in_proj_weight":
            np.arange(3 * 4 * 4).reshape(12, 4).astype(np.float32),
        "conditioner.embedders.1.model.transformer.resblocks.0.attn.in_proj_bias":
            np.arange(12).astype(np.float32),
        "conditioner.embedders.1.model.token_embedding.weight":
            np.zeros((10, 4), np.float32),
        "conditioner.embedders.1.model.logit_scale": np.float32(1.0),
    }
    out = openclip_text_subdict(sd)
    assert "transformer.resblocks.0.attn.q_proj.weight" in out
    assert out["transformer.resblocks.0.attn.k_proj.weight"].shape == (4, 4)
    np.testing.assert_allclose(
        out["transformer.resblocks.0.attn.v_proj.bias"], [8, 9, 10, 11]
    )
    assert "token_embedding" in out and "logit_scale" not in out
