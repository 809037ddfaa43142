"""End-to-end SD1.5 pipeline tests on tiny random-weight models."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.core.config import (
    GenerationOptions, MODE_IMAGE_TO_IMAGE, MODE_INPAINTING,
)
from cremage_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from cremage_tpu.models.unet import UNetConfig, UNetModel
from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
from cremage_tpu.pipelines.conditioning import TextEncoder
from cremage_tpu.pipelines.sd15 import SD15Bundle, SD15Pipeline
from cremage_tpu.prompt.tokenizer import default_tokenizer
from cremage_tpu.samplers import schedules as S

HID = 32


def make_bundle(inpaint=False):
    unet_cfg = UNetConfig(
        in_channels=9 if inpaint else 4, out_channels=4, model_channels=32,
        num_res_blocks=1, attention_resolutions=(1,), channel_mult=(1, 2),
        num_heads=4, transformer_depth=(1, 1), transformer_depth_middle=1,
        context_dim=HID, dtype=jnp.float32,
    )
    unet = UNetModel(unet_cfg)
    unet_params = unet.init(
        jax.random.key(0),
        jnp.zeros((1, 8, 8, unet_cfg.in_channels)), jnp.zeros((1,)),
        jnp.zeros((1, 77, HID)),
    )
    vae_cfg = VAEConfig(ch=32, ch_mult=(1, 1, 1, 1), num_res_blocks=1,
                        dtype=jnp.float32)
    vae = AutoencoderKL(vae_cfg)
    vae_params = vae.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))
    clip_cfg = CLIPTextConfig(hidden_size=HID, num_layers=2, num_heads=4,
                              intermediate_size=64, dtype=jnp.float32)
    clip = CLIPTextModel(clip_cfg)
    clip_params = clip.init(jax.random.key(2), jnp.zeros((1, 77), jnp.int32))
    text = TextEncoder(clip, clip_params, default_tokenizer())
    return SD15Bundle(
        unet=unet, unet_params=unet_params, text=text, vae=vae,
        vae_params=vae_params, schedule=S.default_sd_schedule(),
        inpaint=inpaint,
    )


@pytest.fixture(scope="module")
def bundle():
    return make_bundle()


@pytest.fixture(scope="module")
def inpaint_bundle():
    return make_bundle(inpaint=True)


def base_opts(**kw):
    d = dict(prompt="a cat", negative_prompt="bad", H=64, W=64,
             sampling_steps=3, n_samples=1, n_iter=1, seed=42,
             sampler="Euler A", scale=7.5, safety_check=False)
    d.update(kw)
    return GenerationOptions(**d)


def test_txt2img_end_to_end(bundle):
    pipe = SD15Pipeline(bundle)
    msgs = []
    results = pipe.generate(base_opts(), status_cb=msgs.append)
    assert len(results) == 1
    img, meta = results[0]
    assert img.shape == (64, 64, 3)
    assert img.min() >= 0 and img.max() <= 1
    assert np.isfinite(img).all()
    assert meta["seed"] == 42 and meta["prompt"] == "a cat"
    assert any("1 / 3" in m for m in msgs)
    assert any("3 / 3" in m for m in msgs)


def test_txt2img_seed_reproducible(bundle):
    pipe = SD15Pipeline(bundle)
    a = pipe.generate(base_opts())[0][0]
    b = pipe.generate(base_opts())[0][0]
    c = pipe.generate(base_opts(seed=43))[0][0]
    np.testing.assert_allclose(a, b)
    assert np.abs(a - c).max() > 1e-4


@pytest.mark.slow
def test_txt2img_batch_and_iter(bundle):
    pipe = SD15Pipeline(bundle)
    results = pipe.generate(base_opts(n_samples=2, n_iter=2))
    assert len(results) == 4
    seeds = [m["seed"] for _, m in results]
    assert seeds == [42, 43, 44, 45]


@pytest.mark.parametrize("sampler", ["DDIM", "Euler", "DPM++ 2M", "LMS"])
def test_txt2img_sampler_menu(bundle, sampler):
    pipe = SD15Pipeline(bundle)
    results = pipe.generate(base_opts(sampler=sampler))
    assert np.isfinite(results[0][0]).all()


@pytest.mark.parametrize("sampler", ["PLMS", "DPM Solver", "LCM"])
def test_txt2img_extra_samplers(bundle, sampler):
    # the reference's two vendored non-menu samplers
    # (image_generator.py:42-43) plus LCM (samplers/lcm.py, pairs with
    # LCM-LoRA weights; beyond reference parity)
    pipe = SD15Pipeline(bundle)
    results = pipe.generate(base_opts(sampler=sampler))
    assert np.isfinite(results[0][0]).all()


def test_img2img_lcm(bundle):
    # LCM img2img: t_enc maps to diffusers' strength-truncated grid
    pipe = SD15Pipeline(bundle)
    init = np.zeros((64, 64, 3), np.float32)
    opts = base_opts(mode=MODE_IMAGE_TO_IMAGE, sampler="LCM", strength=0.5,
                     sampling_steps=4)
    results = pipe.generate(opts, init_image=init)
    assert np.isfinite(results[0][0]).all()


def test_img2img_plms(bundle):
    pipe = SD15Pipeline(bundle)
    init = np.zeros((64, 64, 3), np.float32)
    opts = base_opts(mode=MODE_IMAGE_TO_IMAGE, sampler="PLMS", strength=0.5,
                     sampling_steps=4)
    results = pipe.generate(opts, init_image=init)
    assert np.isfinite(results[0][0]).all()


def test_img2img_dpm_solver_rejected(bundle):
    pipe = SD15Pipeline(bundle)
    init = np.zeros((64, 64, 3), np.float32)
    opts = base_opts(mode=MODE_IMAGE_TO_IMAGE, sampler="DPM Solver",
                     strength=0.5, sampling_steps=4)
    with pytest.raises(ValueError, match="txt2img"):
        pipe.generate(opts, init_image=init)


def test_txt2img_cfg_scale_one(bundle):
    pipe = SD15Pipeline(bundle)
    results = pipe.generate(base_opts(scale=1.0))
    assert np.isfinite(results[0][0]).all()


def test_img2img(bundle):
    pipe = SD15Pipeline(bundle)
    init = np.random.RandomState(0).uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    opts = base_opts(mode=MODE_IMAGE_TO_IMAGE, strength=0.6, sampling_steps=4)
    results = pipe.generate(opts, init_image=init)
    img, meta = results[0]
    assert img.shape == (64, 64, 3) and np.isfinite(img).all()


def test_img2img_ddim(bundle):
    pipe = SD15Pipeline(bundle)
    init = np.zeros((64, 64, 3), np.float32)
    opts = base_opts(mode=MODE_IMAGE_TO_IMAGE, sampler="DDIM", strength=0.5,
                     sampling_steps=4)
    results = pipe.generate(opts, init_image=init)
    assert np.isfinite(results[0][0]).all()


def test_inpaint(inpaint_bundle):
    pipe = SD15Pipeline(inpaint_bundle)
    init = np.random.RandomState(1).uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    opts = base_opts(mode=MODE_INPAINTING)
    results = pipe.generate(opts, init_image=init, mask_image=mask)
    img, _ = results[0]
    assert np.isfinite(img).all()
    # outside the mask, the original image must be preserved exactly
    init01 = (init + 1) / 2
    np.testing.assert_allclose(img[:8, :8], init01[:8, :8], atol=1e-5)
    # inside the mask, the image must differ from the original
    assert np.abs(img[24:40, 24:40] - init01[24:40, 24:40]).max() > 0.01


@pytest.mark.slow
def test_hires_fix_latent(bundle):
    pipe = SD15Pipeline(bundle)
    opts = base_opts(use_hires_fix=True, hires_fix_scale_factor=2.0,
                     hires_fix_upscaler="Latent", strength=0.5)
    results = pipe.generate(opts)
    img, _ = results[0]
    assert img.shape == (128, 128, 3)
    assert np.isfinite(img).all()


def test_watermark_roundtrip_through_pipeline(bundle):
    from cremage_tpu.services.watermark import DEFAULT_PAYLOAD, decode_watermark

    pipe = SD15Pipeline(bundle)
    opts = base_opts(watermark=True, H=128, W=128)
    img, _ = pipe.generate(opts)[0]
    decoded = decode_watermark(img, len(DEFAULT_PAYLOAD.encode()))
    assert decoded.decode("utf-8", errors="replace") == DEFAULT_PAYLOAD


def test_wildcards_in_pipeline(bundle, tmp_path):
    (tmp_path / "animal.txt").write_text("cat")
    pipe = SD15Pipeline(bundle)
    opts = base_opts(prompt="a __animal__", wildcards_path=str(tmp_path))
    seen = {}

    orig = bundle.text.encode_pair

    def spy(p, n, cs):
        seen["prompt"] = p
        return orig(p, n, cs)

    bundle.text.encode_pair = spy
    try:
        pipe.generate(opts)
    finally:
        bundle.text.encode_pair = orig
    assert seen["prompt"] == "a cat"


def test_generation_metadata_roundtrip(bundle, tmp_path):
    from cremage_tpu.core.config import override_options
    from cremage_tpu.io.metadata import (
        image_from_array, read_generation_data, save_png_with_metadata,
    )

    pipe = SD15Pipeline(bundle)
    img, meta = pipe.generate(base_opts())[0]
    p = str(tmp_path / "out.png")
    save_png_with_metadata(image_from_array(img), p, meta)
    back = read_generation_data(p)
    assert back["prompt"] == "a cat" and back["seed"] == 42
    replayed = override_options(GenerationOptions(prompt="other"), back)
    assert replayed.prompt == "a cat" and replayed.seed == 42


@pytest.mark.parametrize("sampler", ["Euler", "DPM++ 2M", "DPM++ 2M SDE",
                                     "LMS", "Heun"])
@pytest.mark.slow
def test_img2img_sampler_sweep(bundle, sampler):
    """img2img sigma-truncation path across sampler families (scan
    peeling at small truncated step counts is the risky code)."""
    pipe = SD15Pipeline(bundle)
    init = np.random.RandomState(3).uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    for strength in (0.3, 0.9):
        opts = base_opts(mode=MODE_IMAGE_TO_IMAGE, sampler=sampler,
                         strength=strength, sampling_steps=5)
        img, _ = pipe.generate(opts, init_image=init)[0]
        assert np.isfinite(img).all(), (sampler, strength)


def test_img2img_low_strength_stays_close(bundle):
    """Low denoising strength must stay closer to the init image than
    high strength (the core img2img contract).

    With random VAE weights the decoded output is far from the raw init
    image at ANY strength (reconstruction error dominates), so the
    reference point is the VAE roundtrip decode(encode(init)) — low
    strength keeps the latent near encode(init), so the decoded result
    must land nearer the roundtrip image than high strength does."""
    pipe = SD15Pipeline(bundle)
    init = np.random.RandomState(4).uniform(-0.5, 0.5, (64, 64, 3)).astype(np.float32)

    from cremage_tpu.models.vae import decode_from_latent, encode_to_latent
    z = encode_to_latent(bundle.vae, bundle.vae_params,
                         jnp.asarray(init)[None], jax.random.key(0),
                         sample=False)
    rt = np.asarray(decode_from_latent(bundle.vae, bundle.vae_params, z))[0]
    rt01 = np.clip((rt + 1) / 2, 0, 1)

    def dist(strength):
        opts = base_opts(mode=MODE_IMAGE_TO_IMAGE, sampler="Euler",
                         strength=strength, sampling_steps=8, scale=1.0)
        img, _ = pipe.generate(opts, init_image=init)[0]
        return np.abs(img - rt01).mean()

    assert dist(0.2) < dist(0.95)


def test_hires_fix_lanczos_upscaler(bundle):
    """Hires fix with the image-space Lanczos upscaler (the reference's
    non-latent upscaler menu entry): base render -> lanczos upscale ->
    img2img refinement at the target size."""
    pipe = SD15Pipeline(bundle)
    opts = base_opts(use_hires_fix=True, hires_fix_scale_factor=2.0,
                     hires_fix_upscaler="Lanczos", strength=0.4)
    img, _ = pipe.generate(opts)[0]
    assert img.shape == (128, 128, 3)
    assert np.isfinite(img).all()


def test_clip_skip_changes_generation(bundle):
    """clip_skip must reach the text encoder and change the image."""
    pipe = SD15Pipeline(bundle)
    a = pipe.generate(base_opts(clip_skip=1))[0][0]
    b = pipe.generate(base_opts(clip_skip=2))[0][0]
    assert np.abs(a - b).max() > 1e-5


def test_textual_inversion_end_to_end(tmp_path):
    """<embedding:file> in the prompt must load the TI vector from
    embedding_dir and change the conditioning (reference A1111-style
    embeddings through the chunking layer)."""
    from safetensors.numpy import save_file

    b = make_bundle()
    vec = np.random.RandomState(9).randn(2, HID).astype(np.float32)
    save_file({"emb_params": vec}, str(tmp_path / "myti.safetensors"))

    te = TextEncoder(b.text.model, b.text.params, b.text.tokenizer,
                     embedding_dir=str(tmp_path))
    b2 = dataclasses.replace(b, text=te)
    pipe_ti = SD15Pipeline(b2)
    pipe_plain = SD15Pipeline(b)

    a = pipe_ti.generate(base_opts(
        prompt="a <embedding:myti.safetensors> cat"))[0][0]
    c = pipe_plain.generate(base_opts(prompt="a cat"))[0][0]
    assert np.isfinite(a).all()
    assert np.abs(a - c).max() > 1e-5
