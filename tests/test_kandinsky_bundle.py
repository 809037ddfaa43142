"""Kandinsky 2.2 full-bundle assembly (pipelines/loader.py
load_kandinsky_bundle): tiny synthetic diffusers-layout component files
through the REAL conversion path -> prior -> decoder -> MoVQ decode,
plus transformers parity for the HF text-tower loader.

Reference stack: modules/kandinsky/txt2img.py:26,66 (AutoPipeline =
prior + decoder; text tower = CLIPTextModelWithProjection)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.core.config import GenerationOptions
from cremage_tpu.core.dtypes import DTypePolicy
from cremage_tpu.io import checkpoint as CK

from tests.test_diffusers_keys import (
    PRI_C, PRI_E, PRI_T, PRI_TOK,
    synth_diffusers_kandinsky_unet, synth_diffusers_movq,
    synth_diffusers_prior,
)

F32 = DTypePolicy(compute_dtype=jnp.float32, param_dtype=jnp.float32)


def tiny_hf_text_model():
    import torch
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModelWithProjection

    cfg = HFCfg(vocab_size=49408, hidden_size=PRI_T, intermediate_size=2 * PRI_T,
                num_hidden_layers=2, num_attention_heads=1,
                max_position_embeddings=PRI_TOK, projection_dim=PRI_T,
                hidden_act="gelu", eos_token_id=49407, bos_token_id=49406)
    torch.manual_seed(0)
    return CLIPTextModelWithProjection(cfg).eval()


def write_components(tmp_path):
    paths = {}
    for name, sd in (
        ("prior", synth_diffusers_prior(depth=2)),
        ("decoder", synth_diffusers_kandinsky_unet()),
        ("movq", synth_diffusers_movq()),
    ):
        p = str(tmp_path / f"{name}.safetensors")
        CK.save_safetensors(p, {k: np.asarray(v) for k, v in sd.items()})
        paths[name] = p
    hf = tiny_hf_text_model()
    tsd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    p = str(tmp_path / "text_encoder.safetensors")
    CK.save_safetensors(p, tsd)
    paths["text_encoder"] = p
    return paths, hf


def tiny_cfgs():
    from cremage_tpu.models.kandinsky import PriorConfig
    from cremage_tpu.models.kandinsky_decoder import KandinskyUNetConfig
    from cremage_tpu.models.vq import MoVQConfig

    return dict(
        prior_cfg=PriorConfig(image_embed_dim=PRI_E, text_embed_dim=PRI_T,
                              hidden=PRI_C, num_layers=2, num_heads=4,
                              text_tokens=PRI_TOK, dtype=jnp.float32),
        decoder_cfg=KandinskyUNetConfig(block_out_channels=(32, 64),
                                        layers_per_block=1,
                                        attention_head_dim=16,
                                        dtype=jnp.float32),
        movq_cfg=MoVQConfig(block_out_channels=(32, 64),
                            layers_per_block=1, dtype=jnp.float32),
    )


def test_load_kandinsky_bundle_end_to_end(tmp_path):
    from cremage_tpu.pipelines.kandinsky import KandinskyPipeline
    from cremage_tpu.pipelines.loader import load_kandinsky_bundle

    paths, _ = write_components(tmp_path)
    bundle = load_kandinsky_bundle(
        paths["prior"], paths["decoder"], paths["text_encoder"],
        movq_ckpt=paths["movq"], policy=F32, **tiny_cfgs())
    assert bundle.decode_latent is not None
    assert bundle.clip_mean is not None and bundle.clip_mean.shape == (PRI_E,)

    pipe = KandinskyPipeline(bundle)
    opts = GenerationOptions(prompt="a cat", negative_prompt="bad",
                             H=32, W=32, sampling_steps=2, n_samples=1,
                             seed=5, scale=4.0, sampler="Euler A",
                             safety_check=False, watermark=False)
    img, meta = pipe.generate(opts)[0]
    # tiny MoVQ has one upsampler: 4x4 latent -> 8x8 image
    assert img.shape == (8, 8, 3)
    assert np.isfinite(img).all()
    assert meta["seed"] == 5


def test_hf_text_tower_matches_transformers(tmp_path):
    """load_hf_clip_text_tower's text_encode == diffusers'
    (last_hidden_state, text_embeds) pair on the same token ids."""
    import torch

    from cremage_tpu.pipelines.loader import load_hf_clip_text_tower
    from cremage_tpu.prompt.tokenizer import default_tokenizer

    paths, hf = write_components(tmp_path)
    _, _, text_encode = load_hf_clip_text_tower(paths["text_encoder"], F32)

    prompt = "a photo of a cat"
    hidden, pooled = text_encode(prompt)
    assert hidden.shape == (PRI_TOK, PRI_T) and pooled.shape == (PRI_T,)

    ids = default_tokenizer().encode_with_specials(prompt, max_len=PRI_TOK)
    with torch.no_grad():
        out = hf(input_ids=torch.tensor([ids]))
    np.testing.assert_allclose(hidden, out.last_hidden_state[0].numpy(),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(pooled, out.text_embeds[0].numpy(),
                               atol=2e-5, rtol=2e-5)


def test_backend_requires_component_paths():
    import queue
    import time

    from cremage_tpu.app.backends import register_default_backends
    from cremage_tpu.app.worker import (
        EngineWorker, MP_MESSAGE_TYPE_INFERENCE,
    )
    from cremage_tpu.core.config import Preferences

    w = EngineWorker()
    register_default_backends(w, Preferences())
    w.start()
    w.submit({"type": MP_MESSAGE_TYPE_INFERENCE,
              "generator_model_type": "Kandinsky 2.2",
              "parameters": {"prompt": "x"}})
    done = None
    end = time.time() + 30
    while time.time() < end:
        try:
            m = w.status_queue.get(timeout=0.5)
        except queue.Empty:
            continue
        if isinstance(m, dict) and "job_done" in m:
            done = m
            break
    w.stop()
    assert done is not None and not done["job_done"]["ok"]
    assert "prior_ckpt" in done["job_done"]["error"]
