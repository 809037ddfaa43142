"""Real-checkpoint parity harness, end-to-end on a dummy checkpoint:

tiny random SD1.5 params -> io/export.py (ldm-format safetensors) ->
load_sd15_bundle (the real conversion path) -> tools/parity_lpips.py
render + compare. Proves the whole harness runs before any real
weights are available (VERDICT round-1 item 5)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.io import export as EX
from cremage_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from cremage_tpu.models.unet import UNetConfig, UNetModel
from cremage_tpu.models.vae import AutoencoderKL, VAEConfig

HID = 32

UNET_CFG = UNetConfig(
    in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
    attention_resolutions=(1,), channel_mult=(1, 2), num_heads=4,
    transformer_depth=(1, 1), transformer_depth_middle=1, context_dim=HID,
    dtype=jnp.float32,
)
VAE_CFG = VAEConfig(ch=32, ch_mult=(1, 1, 1, 1), num_res_blocks=1,
                    dtype=jnp.float32)
CLIP_CFG = CLIPTextConfig(hidden_size=HID, num_layers=2, num_heads=4,
                          intermediate_size=64, dtype=jnp.float32)


def _tiny_params():
    unet = UNetModel(UNET_CFG)
    unet_p = unet.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, HID)))["params"]
    vae = AutoencoderKL(VAE_CFG)
    vae_p = vae.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))["params"]
    clip = CLIPTextModel(CLIP_CFG)
    clip_p = clip.init(jax.random.key(2),
                       jnp.zeros((1, 77), jnp.int32))["params"]
    return unet_p, vae_p, clip_p


@pytest.fixture(scope="module")
def dummy_ckpt(tmp_path_factory):
    unet_p, vae_p, clip_p = _tiny_params()
    path = str(tmp_path_factory.mktemp("ckpt") / "tiny_sd15.safetensors")
    EX.save_sd15_checkpoint(path, unet_p, vae_p, clip_p)
    return path, (unet_p, vae_p, clip_p)


def test_export_emits_real_ldm_keys(dummy_ckpt):
    path, _ = dummy_ckpt
    sd = CK.load_safetensors(path)
    # spot-check exact published SD1.5 key spellings
    assert "model.diffusion_model.input_blocks.0.0.weight" in sd
    assert ("model.diffusion_model.input_blocks.1.1."
            "transformer_blocks.0.attn1.to_q.weight") in sd
    assert ("model.diffusion_model.input_blocks.1.1."
            "transformer_blocks.0.ff.net.0.proj.weight") in sd
    assert "first_stage_model.decoder.mid.block_1.norm1.weight" in sd
    assert ("cond_stage_model.transformer.text_model."
            "encoder.layers.0.self_attn.q_proj.weight") in sd
    assert ("cond_stage_model.transformer.text_model."
            "embeddings.token_embedding.weight") in sd
    # torch layouts: conv OIHW, Linear (out, in)
    w = sd["model.diffusion_model.input_blocks.0.0.weight"]
    assert w.shape == (32, 4, 3, 3)
    q = sd["cond_stage_model.transformer.text_model."
           "encoder.layers.0.self_attn.q_proj.weight"]
    assert q.shape == (HID, HID)


def test_loader_quantize_unet_int8_generates(dummy_ckpt):
    """quantize_unet="int8" through the REAL conversion path: UNet conv
    AND matmul kernels land as int8 with scale siblings (applied after
    all merges), and the pipeline still generates an image."""
    from cremage_tpu.core.dtypes import FP32_POLICY
    from cremage_tpu.pipelines.loader import load_sd15_bundle
    from cremage_tpu.pipelines.sd15 import GenerationOptions, SD15Pipeline

    path, _ = dummy_ckpt
    bundle = load_sd15_bundle(
        path, unet_cfg_override=UNET_CFG, vae_cfg_override=VAE_CFG,
        clip_cfg_override=CLIP_CFG, use_cache=False, policy=FP32_POLICY,
        quantize_unet="int8", quantize_min_size=256,
    )
    leaves = jax.tree.leaves(bundle.unet_params["params"])
    n2 = sum(1 for x in leaves if x.dtype == jnp.int8 and x.ndim == 2)
    n4 = sum(1 for x in leaves if x.dtype == jnp.int8 and x.ndim == 4)
    assert n2 > 0 and n4 > 0  # matmuls AND convs quantized
    # VAE / CLIP untouched
    assert all(x.dtype != jnp.int8
               for x in jax.tree.leaves(bundle.vae_params))

    pipe = SD15Pipeline(bundle)
    results = pipe.generate(GenerationOptions(
        prompt="a cat", negative_prompt="bad", H=64, W=64,
        sampling_steps=2, n_samples=1, n_iter=1, seed=7,
        sampler="Euler A", scale=7.5, safety_check=False))
    arr = np.asarray(results[0][0])
    assert arr.shape == (64, 64, 3)
    assert np.isfinite(arr).all()


def test_roundtrip_through_loader_is_exact(dummy_ckpt):
    from cremage_tpu.core.dtypes import FP32_POLICY
    from cremage_tpu.pipelines.loader import load_sd15_bundle

    path, (unet_p, vae_p, clip_p) = dummy_ckpt
    bundle = load_sd15_bundle(
        path, unet_cfg_override=UNET_CFG, vae_cfg_override=VAE_CFG,
        clip_cfg_override=CLIP_CFG, use_cache=False, policy=FP32_POLICY,
    )
    for orig, loaded in [
        (unet_p, bundle.unet_params["params"]),
        (vae_p, bundle.vae_params["params"]),
        (clip_p, bundle.text.params["params"]),
    ]:
        flat_o = dict(CK._flatten_params(orig))
        flat_l = dict(CK._flatten_params(loaded))
        assert set(flat_o) == set(flat_l)
        for k in flat_o:
            np.testing.assert_array_equal(
                np.asarray(flat_o[k], np.float32), np.asarray(flat_l[k]),
                err_msg=str(k))


@pytest.mark.slow
def test_harness_end_to_end_self_parity(dummy_ckpt, tmp_path):
    """Render goldens from the dummy ckpt, re-run in compare mode: the
    same seeds must reproduce exactly (PSNR fallback path, no LPIPS
    weights in CI)."""
    from tools.parity_lpips import run_parity

    path, _ = dummy_ckpt
    kw = dict(
        prompts=("a cat",), seeds=(7,), steps=2, size=64,
        loader_kwargs=dict(unet_cfg_override=UNET_CFG,
                           vae_cfg_override=VAE_CFG,
                           clip_cfg_override=CLIP_CFG),
    )
    rep = run_parity("sd15", path, str(tmp_path / "out1"),
                     save_ref=str(tmp_path / "gold"), **kw)
    assert rep["mode"] == "save_ref" and rep["count"] == 1

    rep2 = run_parity("sd15", path, str(tmp_path / "out2"),
                      ref_dir=str(tmp_path / "gold"), **kw)
    assert rep2["mode"] == "compare"
    assert not rep2["missing_refs"]
    assert rep2["pass"], rep2


@pytest.mark.slow
def test_quality_delta_harness_plumbing(dummy_ckpt, tmp_path):
    """tools/quality_delta.py end-to-end on the dummy checkpoint: every
    approximation variant renders through the REAL pipeline knobs and
    lands in one exact-vs-approx metric table (VERDICT r3 item 3 —
    numbers become meaningful when real weights land; this proves the
    command works today)."""
    from tools.quality_delta import run_quality_delta

    path, _ = dummy_ckpt
    rep = run_quality_delta(
        "sd15", path, str(tmp_path / "qd"),
        variants=("tome", "dc2", "cfgi", "ada01", "stack"),
        prompts=("a cat",), seeds=(7,), steps=4, size=64,
        loader_kwargs=dict(unet_cfg_override=UNET_CFG,
                           vae_cfg_override=VAE_CFG,
                           clip_cfg_override=CLIP_CFG),
        dummy_weights=True,
    )
    assert rep["weights"].startswith("dummy")
    assert set(rep["variants"]) == {"tome", "dc2", "cfgi", "ada01",
                                    "stack"}
    for v, row in rep["variants"].items():
        m = row["mean_" + rep["metric"]]
        assert np.isfinite(m), (v, row)
        assert row["per_image"], v
        assert os.path.exists(str(tmp_path / "qd" / v / "p00_s7.png"))
    # exact renders saved too
    assert os.path.exists(str(tmp_path / "qd" / "exact" / "p00_s7.png"))


@pytest.mark.slow
def test_fit_adacache_plumbing(dummy_ckpt, tmp_path, monkeypatch):
    """tools/fit_adacache.py end to end on the dummy checkpoint: exact
    trajectories -> (input-change, output-change) pairs -> polyfit ->
    calibration registry JSON -> a subsequent ada_cache generate() picks
    the coefficients up through samplers/adacache.load_calibration."""
    from tools.fit_adacache import fit

    from cremage_tpu.core.dtypes import FP32_POLICY
    from cremage_tpu.pipelines.loader import load_sd15_bundle
    from cremage_tpu.pipelines.sd15 import GenerationOptions, SD15Pipeline
    from cremage_tpu.samplers import adacache as AC

    path, _ = dummy_ckpt
    reg = tmp_path / "calib.json"
    lk = dict(unet_cfg_override=UNET_CFG, vae_cfg_override=VAE_CFG,
              clip_cfg_override=CLIP_CFG, use_cache=False,
              policy=FP32_POLICY)
    rep = fit("sd15", path, prompts=("a cat",), steps=4, size=64,
              registry=str(reg), loader_kwargs=lk)
    assert rep["n_pairs"] == 3            # 4 model evals -> 3 pairs
    assert len(rep["coeffs"]) == 5        # degree 4
    assert rep["registry"] == str(reg)
    assert all(np.isfinite(rep["coeffs"]))

    monkeypatch.setenv("CREMAGE_ADACACHE_CALIB", str(reg))
    assert AC.load_calibration("sd15") == tuple(rep["coeffs"])

    bundle = load_sd15_bundle(path, **lk)
    pipe = SD15Pipeline(bundle)
    (img, _meta), = pipe.generate(GenerationOptions(
        prompt="a cat", negative_prompt="", H=64, W=64, sampling_steps=4,
        n_samples=1, n_iter=1, seed=7, sampler="Euler", scale=7.5,
        safety_check=False, ada_cache=0.2))
    assert np.isfinite(np.asarray(img)).all()
