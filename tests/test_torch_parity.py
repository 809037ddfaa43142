"""Differential parity vs real torch implementations (transformers is
installed with torch-cpu): random-weight tiny models exported as state
dicts, loaded through our mechanical key mapping, outputs compared.

This is the strongest hermetic evidence that real SD checkpoints load
correctly: the key grammar, tensor transposes and model numerics all
have to line up for these to pass.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from cremage_tpu.models.t5 import T5Config, T5Encoder


def test_clip_text_parity_with_transformers():
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    hf_cfg = HFConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    ours = CLIPTextModel(CLIPTextConfig(
        vocab_size=99, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_positions=16, dtype=jnp.float32,
    ))
    tmpl = jax.eval_shape(
        ours.init, jax.random.key(0), jnp.zeros((1, 8), jnp.int32)
    )["params"]
    clip_sd = CK.clip_text_subdict(sd, prefix="text_model.")
    params, missing, unused = CK.build_flax_params(tmpl, clip_sd, prefix="")
    assert not missing, missing

    ids = np.array([[1, 5, 7, 9, 2, 0, 0, 0]], np.int64)
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids),
                    output_hidden_states=True)
    last, hidden, _ = ours.apply({"params": params},
                                 jnp.asarray(ids, jnp.int32))
    # hidden states (pre-final-LN) and final LN output must match
    np.testing.assert_allclose(
        np.asarray(hidden[2]), hf_out.hidden_states[2].numpy(),
        atol=2e-5, rtol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(last), hf_out.last_hidden_state.numpy(),
        atol=2e-5, rtol=2e-5,
    )


def test_t5_encoder_parity_with_transformers():
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=120, d_model=32, d_kv=8, num_heads=4, d_ff=48,
        num_layers=2, feed_forward_proj="gated-gelu", is_encoder_decoder=False,
        use_cache=False,
    )
    torch.manual_seed(1)
    hf = T5EncoderModel(hf_cfg).eval()
    sd = {}
    for k, v in hf.state_dict().items():
        k2 = k
        if k2.startswith("encoder."):
            k2 = k2[len("encoder."):]
        k2 = k2.replace(
            "block.0.layer.0.SelfAttention.relative_attention_bias.weight",
            "relative_attention_bias")
        k2 = k2.replace("shared.weight", "shared")
        k2 = k2.replace("embed_tokens.weight", "shared")
        sd[k2] = v.numpy()

    ours = T5Encoder(T5Config(
        vocab_size=120, d_model=32, d_kv=8, num_heads=4, d_ff=48,
        num_layers=2, dtype=jnp.float32,
    ))
    ids = np.array([[3, 9, 11, 1, 0, 0]], np.int64)
    tmpl = jax.eval_shape(
        ours.init, jax.random.key(0), jnp.asarray(ids, jnp.int32)
    )["params"]
    params, missing, unused = CK.build_flax_params(tmpl, sd, prefix="",
                                                   strict=False)
    assert not missing, missing

    mask = np.array([[1, 1, 1, 1, 0, 0]], np.float32)
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)).last_hidden_state
    out = ours.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                     jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out)[:, :4], hf_out.numpy()[:, :4], atol=3e-5, rtol=3e-5,
    )


def test_clip_vision_parity_with_transformers():
    """Vision tower differential parity (SVD's image conditioner /
    FaceID's embedding seam): HF CLIPVisionModelWithProjection random
    weights -> hf_clip_vision_subdict mapping -> our open_clip-style
    tower; pooled projected embedding must match."""
    import torch
    from transformers import CLIPVisionConfig as HFVC
    from transformers import CLIPVisionModelWithProjection as HFVM

    from cremage_tpu.models.clip_vision import (
        CLIP_MEAN, CLIP_STD, CLIPVisionConfig, CLIPVisionModel,
    )

    hf_cfg = HFVC(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=16, patch_size=8,
        projection_dim=24, hidden_act="gelu",
    )
    torch.manual_seed(2)
    hf = HFVM(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    mapped = CK.hf_clip_vision_subdict(sd)

    ours = CLIPVisionModel(CLIPVisionConfig(
        image_size=16, patch_size=8, width=32, num_layers=2, num_heads=4,
        output_dim=24, dtype=jnp.float32,
    ))
    tmpl = jax.eval_shape(
        ours.init, jax.random.key(0), jnp.zeros((1, 16, 16, 3))
    )["params"]
    params, missing, unused = CK.build_flax_params(tmpl, mapped, prefix="")
    assert not missing, missing
    assert not unused, unused

    img01 = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32)
    # HF takes pre-normalized NCHW pixel values; our model normalizes
    # [0,1] inputs internally with the same constants
    px = (img01 - CLIP_MEAN) / CLIP_STD
    with torch.no_grad():
        hf_out = hf(pixel_values=torch.tensor(
            px.transpose(0, 3, 1, 2))).image_embeds.numpy()
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(img01)))
    np.testing.assert_allclose(out, hf_out, atol=3e-5, rtol=3e-5)


def test_openclip_text_tower_parity_with_transformers():
    """SDXL secondary tower differential parity: HF
    CLIPTextModelWithProjection random weights (gelu act, like bigG) ->
    hf_clip_text_to_openclip_subdict -> our open_clip tower; final LN
    states and the EOS-pooled projected embedding must match."""
    import torch
    from transformers import CLIPTextConfig as HFTC
    from transformers import CLIPTextModelWithProjection as HFTM

    from cremage_tpu.models.open_clip import (
        OpenCLIPTextConfig, OpenCLIPTextModel,
    )

    hf_cfg = HFTC(
        vocab_size=99, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="gelu", projection_dim=32,
        eos_token_id=2,
    )
    torch.manual_seed(3)
    hf = HFTM(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    mapped = CK.hf_clip_text_to_openclip_subdict(sd)

    ours = OpenCLIPTextModel(OpenCLIPTextConfig(
        vocab_size=99, width=32, num_layers=2, num_heads=4,
        max_positions=16, dtype=jnp.float32,
    ))
    tmpl = jax.eval_shape(
        ours.init, jax.random.key(0), jnp.zeros((1, 8), jnp.int32)
    )["params"]
    params, missing, unused = CK.build_flax_params(tmpl, mapped, prefix="")
    assert not missing, missing
    assert not unused, unused

    # HF's eos_token_id==2 config takes the legacy pooling path (argmax
    # of token ids, assuming EOT is the highest vocab id, as in real
    # CLIP vocabularies) — put the EOT (98) accordingly.
    ids = np.array([[1, 5, 7, 9, 98, 0, 0, 0]], np.int64)
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids))
    hidden, final = ours.apply({"params": params},
                               jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(final), hf_out.last_hidden_state.numpy(),
        atol=3e-5, rtol=3e-5,
    )
    eos_idx = jnp.asarray(ids.argmax(axis=1))
    pooled = ours.apply({"params": params}, final, eos_idx,
                        method=OpenCLIPTextModel.project_pooled)
    np.testing.assert_allclose(
        np.asarray(pooled), hf_out.text_embeds.numpy(),
        atol=3e-5, rtol=3e-5,
    )
