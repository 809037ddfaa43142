"""Pipeline-level chunked progress: with in-scan callbacks unavailable
(CREMAGE_PROGRESS_CALLBACKS=0 simulates the axon TPU tunnel), generate()
routes sampling through samplers/chunked.run_chunked and still posts
per-step "N / M" progress, with image parity vs the monolithic path."""
import numpy as np
import pytest

from cremage_tpu.core.config import GenerationOptions, MODE_IMAGE_TO_IMAGE
from cremage_tpu.pipelines.sd15 import SD15Pipeline

from tests.conftest import assert_img01_close
from tests.test_pipeline_sd15 import base_opts, bundle, make_bundle  # noqa: F401


def steps_of(msgs, total):
    return [m for m in msgs if m.endswith(f"/ {total}")]


@pytest.mark.parametrize("sampler", ["Euler A", "DDIM", "DPM++ 2M", "Euler"])
def test_chunked_progress_parity_txt2img(bundle, sampler, monkeypatch):
    opts = base_opts(sampler=sampler, sampling_steps=4)
    want = SD15Pipeline(bundle).generate(opts)[0][0]

    monkeypatch.setenv("CREMAGE_PROGRESS_CALLBACKS", "0")
    msgs = []
    got = SD15Pipeline(bundle).generate(opts, status_cb=msgs.append)[0][0]
    assert_img01_close(got, want)
    # per-step-ish progress: several distinct "N / 4" strings, ending
    # at the full count (reference generation_status_updater.py:9-16)
    prog = steps_of(msgs, 4)
    assert len(prog) >= 2, msgs
    assert prog[-1] == "4 / 4"


def test_chunked_progress_parity_img2img(bundle, monkeypatch):
    init = np.full((64, 64, 3), 0.5, np.float32)
    opts = base_opts(mode=MODE_IMAGE_TO_IMAGE,
                     strength=0.75, sampler="Euler A", sampling_steps=4)
    want = SD15Pipeline(bundle).generate(opts, init_image=init)[0][0]

    monkeypatch.setenv("CREMAGE_PROGRESS_CALLBACKS", "0")
    msgs = []
    got = SD15Pipeline(bundle).generate(opts, init_image=init,
                                        status_cb=msgs.append)[0][0]
    assert_img01_close(got, want)
    assert steps_of(msgs, 3), msgs   # t_enc = 3 of 4 at strength 0.75


def test_chunked_off_without_status_cb(bundle, monkeypatch):
    """No status callback -> no segmentation (single monolithic
    dispatch), and the output is unchanged."""
    monkeypatch.setenv("CREMAGE_PROGRESS_CALLBACKS", "0")
    opts = base_opts(sampler="Euler A", sampling_steps=4)
    a = SD15Pipeline(bundle).generate(opts)[0][0]
    monkeypatch.delenv("CREMAGE_PROGRESS_CALLBACKS")
    b = SD15Pipeline(bundle).generate(opts)[0][0]
    assert_img01_close(a, b)


@pytest.mark.parametrize("sampler", ["EulerEDMSampler", "DPMPP2MSampler",
                                     "EulerAncestralSampler"])
def test_chunked_progress_parity_sdxl(sampler, monkeypatch):
    from cremage_tpu.pipelines.sdxl import SDXLPipeline
    from tests.test_edm_sdxl import make_sdxl_bundle, xl_opts

    b = make_sdxl_bundle()
    opts = xl_opts(sampler=sampler)
    want = SDXLPipeline(b).generate(opts)[0][0]
    monkeypatch.setenv("CREMAGE_PROGRESS_CALLBACKS", "0")
    msgs = []
    got = SDXLPipeline(b).generate(opts, status_cb=msgs.append)[0][0]
    assert_img01_close(got, want)
    assert any(m.endswith("3 / 3") for m in msgs), msgs


def test_chunked_progress_parity_flux(monkeypatch):
    from cremage_tpu.core.config import GenerationOptions
    from tests.test_sd3_flux import make_flux_pipeline

    opts = GenerationOptions(prompt="a fox", H=64, W=64, sampling_steps=2,
                             seed=3, safety_check=False)
    want = make_flux_pipeline().generate(opts)[0][0]
    monkeypatch.setenv("CREMAGE_PROGRESS_CALLBACKS", "0")
    msgs = []
    got = make_flux_pipeline().generate(opts,
                                        status_cb=msgs.append)[0][0]
    assert_img01_close(got, want)
    assert any(m.endswith("2 / 2") for m in msgs), msgs


def test_chunked_progress_parity_sd3(monkeypatch):
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.pipelines.sd3 import SD3Pipeline
    from tests.test_sd3_flux import make_sd3_bundle

    opts = GenerationOptions(prompt="a cat", negative_prompt="bad",
                             H=64, W=64, sampling_steps=3, seed=5,
                             scale=4.0, safety_check=False)
    want = SD3Pipeline(make_sd3_bundle()).generate(opts)[0][0]
    monkeypatch.setenv("CREMAGE_PROGRESS_CALLBACKS", "0")
    msgs = []
    got = SD3Pipeline(make_sd3_bundle()).generate(
        opts, status_cb=msgs.append)[0][0]
    assert_img01_close(got, want)
    assert any(m.endswith("3 / 3") for m in msgs), msgs


def test_chunked_progress_parity_families(monkeypatch):
    """Kandinsky + Cascade + Hunyuan: chunked parity + progress."""
    from cremage_tpu.pipelines.cascade import CascadePipeline
    from cremage_tpu.pipelines.hunyuan import HunyuanPipeline
    from cremage_tpu.pipelines.kandinsky import KandinskyPipeline
    from tests.test_family_pipelines import (
        make_cascade, make_hunyuan, make_kandinsky, opts as fam_opts)

    for make, cls, total in ((make_kandinsky, KandinskyPipeline, "2 / 2"),
                             (make_cascade, CascadePipeline, "2 / 2"),
                             (make_hunyuan, HunyuanPipeline, "2 / 2")):
        o = fam_opts()
        want = cls(make()).generate(o)[0][0]
        monkeypatch.setenv("CREMAGE_PROGRESS_CALLBACKS", "0")
        msgs = []
        got = cls(make()).generate(o, status_cb=msgs.append)[0][0]
        monkeypatch.delenv("CREMAGE_PROGRESS_CALLBACKS")
        assert_img01_close(got, want)
        assert any(m.endswith(total) for m in msgs), (cls.__name__, msgs)


def test_chunked_progress_parity_svd(monkeypatch, tmp_path):
    from cremage_tpu.pipelines.svd import SVDBundle, SVDOptions, SVDPipeline
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from tests.test_svd import T, tiny_video_unet
    import jax
    import jax.numpy as jnp

    m, params = tiny_video_unet()
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                  num_res_blocks=1, dtype=jnp.float32))
    vp = vae.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))
    img = np.random.RandomState(0).uniform(
        0, 1, (64, 64, 3)).astype(np.float32)
    o = SVDOptions(num_frames=T, num_steps=2, seed=4)
    want = SVDPipeline(SVDBundle(unet=m, unet_params=params, vae=vae,
                                 vae_params=vp)).sample(img, o)
    monkeypatch.setenv("CREMAGE_PROGRESS_CALLBACKS", "0")
    msgs = []
    got = SVDPipeline(SVDBundle(unet=m, unet_params=params, vae=vae,
                                vae_params=vp)).sample(
        img, o, status_cb=msgs.append)
    assert_img01_close(got, want)
    assert any(m.endswith("2 / 2") for m in msgs), msgs


def test_chunked_progress_parity_pixart(monkeypatch):
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from cremage_tpu.pipelines.pixart import PixArtBundle, PixArtPipeline
    from tests.test_pixart import T5D, tiny_pixart
    import jax
    import jax.numpy as jnp

    m, params = tiny_pixart()
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                  num_res_blocks=1, dtype=jnp.float32))
    vp = vae.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))
    bundle = PixArtBundle(dit=m, dit_params=params, t5=None,
                          t5_tokenize=None, t5_len=10, vae=vae,
                          vae_params=vp, t5_dim=T5D)
    o = GenerationOptions(prompt="a bird", H=64, W=64, sampling_steps=3,
                          seed=2, sampler="DPM++ 2M", scale=4.5,
                          safety_check=False)
    want = PixArtPipeline(bundle).generate(o)[0][0]
    monkeypatch.setenv("CREMAGE_PROGRESS_CALLBACKS", "0")
    msgs = []
    got = PixArtPipeline(bundle).generate(o, status_cb=msgs.append)[0][0]
    assert_img01_close(got, want)
    assert any(m.endswith("3 / 3") for m in msgs), msgs


def test_chunked_unsupported_sampler_falls_back(bundle, monkeypatch):
    """PLMS has no chunk plan: generate() must still work (coarse
    statuses only)."""
    monkeypatch.setenv("CREMAGE_PROGRESS_CALLBACKS", "0")
    msgs = []
    opts = base_opts(sampler="PLMS", sampling_steps=4)
    img = SD15Pipeline(bundle).generate(opts, status_cb=msgs.append)[0][0]
    assert np.isfinite(img).all()
    assert not steps_of(msgs, 4)     # no fake per-step claims
