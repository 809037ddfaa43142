"""LoRA grammar completeness for SDXL naming variants.

The SD1.5 canonical coverage (all 792 keys / 264 modules of the
reference's sd15_lora_weight_list.py) is now asserted against the
transcribed reference fixture itself in
tests/test_reference_keylists.py::test_lora_grammar_maps_all_792_reference_keys
— this file keeps the SDXL-depth kohya + SD-native naming cases the
reference's lora_non_standard_sdxl_lora_map_test.py exercises."""
import jax
import jax.numpy as jnp

from cremage_tpu.io.lora import kohya_module_to_flax_path
from cremage_tpu.models.unet import UNetModel, sd15_unet_config


def _paths_of(template):
    out = set()

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            out.add(path[:-1])  # module path (drop weight/bias leaf)

    walk(template, ())
    return out


def test_sdxl_kohya_and_native_names_map():
    from cremage_tpu.models.unet import sdxl_base_unet_config

    cfg = sdxl_base_unet_config()
    xl_tmpl = jax.eval_shape(
        UNetModel(cfg).init, jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 77, 2048)), jnp.zeros((1, 2816)),
    )["params"]
    paths = _paths_of(xl_tmpl)

    cases = [
        # kohya/diffusers naming at SDXL depth
        "lora_unet_down_blocks_1_attentions_0_transformer_blocks_1_attn1_to_q",
        "lora_unet_down_blocks_2_attentions_1_transformer_blocks_9_ff_net_2",
        "lora_unet_mid_block_attentions_0_transformer_blocks_3_attn2_to_v",
        # non-standard SD-native naming (reference
        # lora_non_standard_sdxl_lora_map_test.py)
        "lora_unet_input_blocks_4_1_proj_in",
        "lora_unet_input_blocks_5_1_transformer_blocks_0_attn1_to_k",
        "lora_unet_input_blocks_7_1_transformer_blocks_0_attn1_to_k",
        "lora_unet_middle_block_1_proj_out",
        "lora_unet_output_blocks_2_1_transformer_blocks_0_attn2_to_out_0",
    ]
    for module in cases:
        dest = kohya_module_to_flax_path(module, cfg)
        assert dest is not None, module
        which, path = dest
        assert which == "unet"
        assert tuple(path) in paths, (module, path)

    # the equivalence the reference asserts: kohya down_blocks_1_att_0 ==
    # native input_blocks_4_1
    a = kohya_module_to_flax_path(
        "lora_unet_down_blocks_1_attentions_0_proj_in", cfg)
    b = kohya_module_to_flax_path("lora_unet_input_blocks_4_1_proj_in", cfg)
    assert a == b


def test_te1_te2_routing():
    cfg = sd15_unet_config()
    a = kohya_module_to_flax_path(
        "lora_te1_text_model_encoder_layers_0_mlp_fc1", cfg)
    assert a == ("te", ("layers_0", "mlp_fc1"))
    # te2 (SDXL OpenCLIP bigG): kohya's HF-style naming lands on our
    # OpenCLIPTextModel module names
    b = kohya_module_to_flax_path(
        "lora_te2_text_model_encoder_layers_3_self_attn_q_proj", cfg)
    assert b == ("te2", ("transformer_resblocks_3", "attn_q_proj"))
    c = kohya_module_to_flax_path(
        "lora_te2_text_model_encoder_layers_10_mlp_fc2", cfg)
    assert c == ("te2", ("transformer_resblocks_10", "mlp_c_proj"))


def test_te2_modules_map_onto_real_openclip_template():
    """Every te2 module class the kohya grammar emits must exist in the
    real bigG OpenCLIP tower (SDXL's second text encoder)."""
    from cremage_tpu.models.open_clip import (
        OpenCLIPTextModel, openclip_bigg_config,
    )

    cfg = sd15_unet_config()
    tmpl = jax.eval_shape(
        OpenCLIPTextModel(openclip_bigg_config(num_layers=2)).init,
        jax.random.key(0), jnp.zeros((1, 77), jnp.int32))["params"]
    paths = _paths_of(tmpl)
    for i in range(2):
        for proj in ("self_attn_q_proj", "self_attn_k_proj",
                     "self_attn_v_proj", "self_attn_out_proj",
                     "mlp_fc1", "mlp_fc2"):
            mod = f"lora_te2_text_model_encoder_layers_{i}_{proj}"
            which, path = kohya_module_to_flax_path(mod, cfg)
            assert which == "te2"
            assert tuple(path) in paths, (mod, path)


def test_te2_lora_merges_into_openclip_tree():
    """merge_lora with te2_params: a te2 LoRA delta lands in the
    OpenCLIP tree with the exact linear-merge math (W' = W +
    w*(alpha/r)*up@down, torch->flax transpose)."""
    import numpy as np

    from cremage_tpu.io.lora import merge_lora

    cfg = sd15_unet_config()
    rng = np.random.RandomState(0)
    c, r = 16, 4
    w0 = rng.randn(c, c).astype(np.float32)        # flax (in, out)
    te2 = {"transformer_resblocks_0": {"attn_q_proj": {
        "weight": jnp.asarray(w0), "bias": jnp.zeros((c,))}}}
    down = rng.randn(r, c).astype(np.float32)
    up = rng.randn(c, r).astype(np.float32)
    lora_sd = {
        "lora_te2_text_model_encoder_layers_0_self_attn_q_proj"
        ".lora_down.weight": down,
        "lora_te2_text_model_encoder_layers_0_self_attn_q_proj"
        ".lora_up.weight": up,
        "lora_te2_text_model_encoder_layers_0_self_attn_q_proj"
        ".alpha": np.float32(r),
    }
    merged, skipped = merge_lora({}, None, lora_sd, 0.5, cfg,
                                 te2_params=te2)
    assert (merged, skipped) == (1, 0)
    want = w0 + 0.5 * (up @ down).T
    np.testing.assert_allclose(
        np.asarray(te2["transformer_resblocks_0"]["attn_q_proj"]["weight"]),
        want, rtol=1e-6, atol=1e-6)

    # without a te2 tree the module is counted skipped, not crashed
    merged2, skipped2 = merge_lora({}, None, lora_sd, 0.5, cfg)
    assert (merged2, skipped2) == (0, 1)
