"""LoRA grammar completeness: every canonical kohya module name for
SD1.5 (the reference's sd15_lora_weight_list.py enumerates 792 keys =
264 modules x {lora_down, lora_up, alpha}) must map onto an existing
parameter path in the real SD1.5 UNet/CLIP templates."""
import jax
import jax.numpy as jnp

from cremage_tpu.io.lora import kohya_module_to_flax_path
from cremage_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from cremage_tpu.models.unet import UNetModel, sd15_unet_config


def canonical_kohya_modules():
    names = []
    inner = ["attn1_to_q", "attn1_to_k", "attn1_to_v", "attn1_to_out_0",
             "attn2_to_q", "attn2_to_k", "attn2_to_v", "attn2_to_out_0",
             "ff_net_0_proj", "ff_net_2"]
    for blk, att_counts in (("down", {0: 2, 1: 2, 2: 2}),
                            ("up", {1: 3, 2: 3, 3: 3})):
        for b, n_att in att_counts.items():
            for a in range(n_att):
                base = f"lora_unet_{blk}_blocks_{b}_attentions_{a}"
                names.append(base + "_proj_in")
                names.append(base + "_proj_out")
                for t in inner:
                    names.append(base + f"_transformer_blocks_0_{t}")
    base = "lora_unet_mid_block_attentions_0"
    names.append(base + "_proj_in")
    names.append(base + "_proj_out")
    for t in inner:
        names.append(base + f"_transformer_blocks_0_{t}")
    for i in range(12):
        for proj in ("self_attn_q_proj", "self_attn_k_proj",
                     "self_attn_v_proj", "self_attn_out_proj",
                     "mlp_fc1", "mlp_fc2"):
            names.append(f"lora_te_text_model_encoder_layers_{i}_{proj}")
    return names


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


def test_all_264_canonical_modules_map():
    cfg = sd15_unet_config()
    unet_tmpl = jax.eval_shape(
        UNetModel(cfg).init, jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 77, 768)),
    )["params"]
    clip_tmpl = jax.eval_shape(
        CLIPTextModel(CLIPTextConfig()).init, jax.random.key(0),
        jnp.zeros((1, 77), jnp.int32),
    )["params"]
    unet_paths = _paths_of(unet_tmpl)
    clip_paths = _paths_of(clip_tmpl)

    names = canonical_kohya_modules()
    assert len(names) == 264  # matches the reference canonical list
    for module in names:
        dest = kohya_module_to_flax_path(module, cfg)
        assert dest is not None, module
        which, path = dest
        pool = unet_paths if which == "unet" else clip_paths
        assert tuple(path) in pool, (module, path)


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
    b = kohya_module_to_flax_path(
        "lora_te2_text_model_encoder_layers_3_self_attn_q_proj", cfg)
    assert b == ("te2", ("layers_3", "self_attn", "q_proj"))
