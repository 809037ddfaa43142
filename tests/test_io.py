import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.io import lora as L
from cremage_tpu.io import metadata as M
from cremage_tpu.io import mixer as MX
from cremage_tpu.io import ti as TI
from cremage_tpu.models import unet as U


def tiny_unet():
    cfg = U.UNetConfig(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_heads=4,
        transformer_depth=(1, 1), transformer_depth_middle=1, context_dim=64,
        dtype=jnp.float32,
    )
    model = U.UNetModel(cfg)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 64)),
    )
    return cfg, model, params


def flax_to_torch_sd(params, prefix):
    """Inverse of build_flax_params for round-trip testing: emits dotted
    torch-style keys in torch tensor layouts."""
    out = {}
    for path, leaf in CK._flatten_params(params["params"]):
        key = prefix + ".".join(path).replace("_", ".")
        arr = np.asarray(leaf, np.float32)
        if arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        elif arr.ndim == 2:
            arr = arr.T
        out[key] = arr
    return out


def test_checkpoint_roundtrip_tiny_unet():
    cfg, model, params = tiny_unet()
    sd = flax_to_torch_sd(params, "model.diffusion.model.")
    rebuilt, missing, unused = CK.build_flax_params(
        params["params"], sd, prefix="model.diffusion.model."
    )
    assert not missing and not unused
    for (p1, a), (p2, b) in zip(
        CK._flatten_params(params["params"]), CK._flatten_params(rebuilt)
    ):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # and the rebuilt tree must run
    out = model.apply(
        {"params": rebuilt}, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 64)),
    )
    assert out.shape == (1, 16, 16, 4)


def test_real_sd_key_names_map_to_template():
    """Spot-check that real SD1.5 checkpoint key names normalize onto our
    module paths."""
    cfg, model, params = tiny_unet()
    flat = {"_".join(p) for p, _ in CK._flatten_params(params["params"])}
    real_keys = [
        "input_blocks.0.0.weight",
        "input_blocks.1.0.in_layers.0.weight",
        "input_blocks.1.0.emb_layers.1.bias",
        "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight",
        "input_blocks.1.1.transformer_blocks.0.ff.net.0.proj.weight",
        "input_blocks.1.1.transformer_blocks.0.norm1.weight",
        "middle_block.1.proj_out.weight",
        "output_blocks.0.0.skip_connection.weight",
        "out.0.weight",
        "out.2.bias",
        "time_embed.0.weight",
    ]
    for k in real_keys:
        assert CK.normalize_key(k) in flat, k


def test_convert_tensor_rules():
    # conv OIHW -> HWIO
    t = np.zeros((8, 4, 3, 3))
    out = CK.convert_tensor(t, (3, 3, 4, 8), "x.conv.weight")
    assert out.shape == (3, 3, 4, 8)
    # linear transpose incl. square
    t = np.arange(6).reshape(2, 3).astype(np.float32)
    out = CK.convert_tensor(t, (3, 2), "x.to_q.weight")
    np.testing.assert_allclose(out, t.T)
    sq = np.arange(16).reshape(4, 4).astype(np.float32)
    out = CK.convert_tensor(sq, (4, 4), "attn.q_proj.weight")
    np.testing.assert_allclose(out, sq.T)
    # embeddings not transposed
    emb = np.zeros((77, 768))
    out = CK.convert_tensor(emb, (77, 768), "embeddings.position_embedding.weight")
    assert out.shape == (77, 768)
    sq_emb = np.arange(16).reshape(4, 4).astype(np.float32)
    out = CK.convert_tensor(sq_emb, (4, 4), "model.text_projection")
    np.testing.assert_allclose(out, sq_emb)


def test_overlay_filter():
    base = {"a": 1, "first_stage_model.x": 2}
    extra = {"first_stage_model.x": 5, "b": 6}
    out = CK.overlay(base, extra, key_filter="first_stage_model.")
    assert out["first_stage_model.x"] == 5 and "b" not in out and out["a"] == 1


def test_safetensors_roundtrip(tmp_path):
    p = str(tmp_path / "t.safetensors")
    sd = {"w": np.arange(12, dtype=np.float32).reshape(3, 4)}
    CK.save_safetensors(p, sd)
    back = CK.load_state_dict(p)
    np.testing.assert_allclose(back["w"], sd["w"])


def test_torch_ckpt_loading(tmp_path):
    import torch

    p = str(tmp_path / "m.ckpt")
    torch.save({"state_dict": {"k": torch.ones(2, 2)}}, p)
    sd = CK.load_state_dict(p)
    np.testing.assert_allclose(sd["k"], np.ones((2, 2)))
    # A1111 flat dict
    p2 = str(tmp_path / "flat.ckpt")
    torch.save({"model.diffusion_model.x": torch.zeros(3)}, p2)
    sd2 = CK.load_state_dict(p2)
    assert "model.diffusion_model.x" in sd2


# ----------------------------- LoRA ---------------------------------------

def test_unet_attention_tables_sd15():
    cfg = U.sd15_unet_config()
    down, mid, up = L.unet_attention_tables(cfg)
    assert down[(0, 0)] == "input_blocks_1_1"
    assert down[(0, 1)] == "input_blocks_2_1"
    assert down[(1, 0)] == "input_blocks_4_1"
    assert down[(2, 1)] == "input_blocks_8_1"
    assert (3, 0) not in down  # level 3 has no attention in SD1.5
    assert mid == "middle_block_1"
    assert up[(1, 0)] == "output_blocks_3_1"
    assert up[(1, 2)] == "output_blocks_5_1"
    assert up[(3, 2)] == "output_blocks_11_1"


def test_kohya_module_mapping():
    cfg = U.sd15_unet_config()
    cases = {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q":
            ("unet", ("input_blocks_1_1", "transformer_blocks_0", "attn1", "to_q")),
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_out_0":
            ("unet", ("input_blocks_1_1", "transformer_blocks_0", "attn1", "to_out_0")),
        "lora_unet_mid_block_attentions_0_proj_in":
            ("unet", ("middle_block_1", "proj_in")),
        "lora_unet_up_blocks_1_attentions_2_transformer_blocks_0_ff_net_2":
            ("unet", ("output_blocks_5_1", "transformer_blocks_0", "ff", "net_2")),
        "lora_te_text_model_encoder_layers_8_self_attn_v_proj":
            ("te", ("layers_8", "self_attn", "v_proj")),
        "lora_te_text_model_encoder_layers_9_mlp_fc1":
            ("te", ("layers_9", "mlp_fc1")),
    }
    for module, want in cases.items():
        assert L.kohya_module_to_flax_path(module, cfg) == want


def test_merge_lora_linear_math():
    cfg, model, params = tiny_unet()
    import flax

    tree = flax.core.unfreeze(params)["params"] if hasattr(
        flax.core, "unfreeze") else dict(params["params"])
    target_path = ("input_blocks_1_1", "transformer_blocks_0", "attn1", "to_q")
    node = tree
    for p in target_path:
        node = node[p]
    w_before = np.asarray(node["weight"], np.float32)
    out_dim, in_dim = w_before.shape[1], w_before.shape[0]
    rank = 4
    rng = np.random.RandomState(0)
    down = rng.randn(rank, in_dim).astype(np.float32)
    up = rng.randn(out_dim, rank).astype(np.float32)
    alpha = 2.0
    weight = 0.5
    lora_sd = {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_down.weight": down,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_up.weight": up,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.alpha": np.float32(alpha),
    }
    merged, skipped = L.merge_lora(tree, None, lora_sd, weight, cfg)
    assert merged == 1 and skipped == 0
    node = tree
    for p in target_path:
        node = node[p]
    w_after = np.asarray(node["weight"], np.float32)
    expected = w_before + (weight * alpha / rank) * (up @ down).T
    np.testing.assert_allclose(w_after, expected, rtol=1e-5, atol=1e-6)


def test_parse_lora_option_string():
    pairs = L.parse_lora_option_string("a.safetensors,b.safetensors", "0.5,0.7")
    assert pairs == [("a.safetensors", 0.5), ("b.safetensors", 0.7)]
    assert L.parse_lora_option_string("", "") == []
    assert L.parse_lora_option_string("None", "1.0") == []


# ----------------------------- TI / mixer / metadata ----------------------

def test_ti_loader_formats(tmp_path):
    import torch

    emb = torch.randn(2, 16)
    p1 = str(tmp_path / "a1111.pt")
    torch.save({"string_to_param": {"*": emb}}, p1)
    out = TI.load_embedding(p1)
    assert out.shape == (2, 16)

    p2 = str(tmp_path / "diff.bin")
    torch.save({"myconcept": emb[0]}, p2)
    out2 = TI.load_embedding(p2)
    assert out2.shape == (1, 16)

    p3 = str(tmp_path / "sdxl.pt")
    torch.save({"clip_l": emb, "clip_g": torch.randn(2, 20)}, p3)
    out3 = TI.load_embedding(p3)
    assert set(out3) == {"clip_l", "clip_g"}
    assert out3["clip_l"].shape == (2, 16)


def test_mixer():
    sd1 = {"w": np.ones((2, 2)), "b": np.zeros(2)}
    sd2 = {"w": np.zeros((2, 2)), "b": np.ones(2), "extra": np.ones(1)}
    out = MX.mix_state_dicts([sd1, sd2], [3.0, 1.0])
    np.testing.assert_allclose(out["w"], 0.75 * np.ones((2, 2)))
    assert "extra" not in out


def test_png_metadata_roundtrip(tmp_path):
    arr = np.random.RandomState(0).uniform(-1, 1, (16, 16, 3)).astype(np.float32)
    img = M.image_from_array(arr)
    p = str(tmp_path / "x.png")
    data = {"prompt": "a cat", "seed": 42, "sampler": "Euler A"}
    M.save_png_with_metadata(img, p, data)
    back = M.read_generation_data(p)
    assert back == data
    arr2 = M.array_from_image(M.Image.open(p))
    assert arr2.shape == (16, 16, 3)
    assert np.abs(arr2 - arr).max() < 0.02  # 8-bit quantization only
