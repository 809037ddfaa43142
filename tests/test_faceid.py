import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.io.faceid import (
    FACEID_LORA_RANK, faceid_attention_slots, merge_faceid,
)
from cremage_tpu.models.faceid import FaceIDProjConfig, MLPProjModel
from cremage_tpu.models.unet import UNetConfig, UNetModel, sd15_unet_config


def test_faceid_slot_table_sd15():
    """Mapping must match ml_utils.py:73's documented 32-slot layout."""
    slots = faceid_attention_slots(sd15_unet_config())
    assert len(slots) == 32
    # down blocks: indices 0..11 over input_blocks 1,2,4,5,7,8
    assert slots[0] == (("input_blocks_1_1", "transformer_blocks_0", "attn1"), "attn1")
    assert slots[1][0][2] == "attn2"
    assert slots[10][0][0] == "input_blocks_8_1"
    # up blocks: 12..29 over output_blocks 3..11
    assert slots[12][0][0] == "output_blocks_3_1"
    assert slots[28][0][0] == "output_blocks_11_1"
    # middle: 30,31
    assert slots[30][0][0] == "middle_block_1"
    assert slots[31] == (("middle_block_1", "transformer_blocks_0", "attn2"), "attn2")


def test_mlp_proj_model_shapes():
    proj = MLPProjModel(FaceIDProjConfig())
    params = proj.init(jax.random.key(0), jnp.zeros((1, 512)))
    out = proj.apply(params, jnp.ones((2, 512)))
    assert out.shape == (2, 4, 768)
    n = sum(np.prod(l.shape) for l in jax.tree.leaves(params))
    # 512*1024+1024 + 1024*3072+3072 + 768*2 (norm)
    assert n == 512 * 1024 + 1024 + 1024 * 3072 + 3072 + 768 * 2


def tiny_ipa_cfg():
    return UNetConfig(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=4,
        transformer_depth=(1, 1), transformer_depth_middle=1, context_dim=32,
        ipa_num_tokens=4, ipa_scale=1.0, dtype=jnp.float32,
    )


def test_merge_faceid_tiny():
    cfg = tiny_ipa_cfg()
    model = UNetModel(cfg)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 81, 32)),
    )["params"]
    slots = faceid_attention_slots(cfg)
    n_slots = len(slots)
    inner = 32  # heads*dim_head for this tiny config at ch=32... use slot dims

    rng = np.random.RandomState(0)
    ip_sd = {}
    # synthesize lora + ip weights for slot 0 (attn1) and slot 1 (attn2)
    def node_of(idx):
        node = params
        for p in slots[idx][0]:
            node = node[p]
        return node

    q0 = np.asarray(node_of(0)["to_q"]["weight"])
    in_dim, out_dim = q0.shape
    r = 4
    ip_sd["0.to_q_lora.down.weight"] = rng.randn(r, in_dim).astype(np.float32)
    ip_sd["0.to_q_lora.up.weight"] = rng.randn(out_dim, r).astype(np.float32)
    ctx_dim = np.asarray(node_of(1)["to_k"]["weight"]).shape[0]
    ip_sd["1.to_k_ip.weight"] = rng.randn(out_dim, ctx_dim).astype(np.float32)
    ip_sd["1.to_v_ip.weight"] = rng.randn(out_dim, ctx_dim).astype(np.float32)

    w_before = np.asarray(node_of(0)["to_q"]["weight"], np.float32)
    merged, installed = merge_faceid(params, ip_sd, cfg, weight=0.5)
    assert merged == 1 and installed == 2
    w_after = np.asarray(node_of(0)["to_q"]["weight"], np.float32)
    expected = w_before + 0.5 * (
        ip_sd["0.to_q_lora.up.weight"] @ ip_sd["0.to_q_lora.down.weight"]
    ).T
    np.testing.assert_allclose(w_after, expected, rtol=1e-5)
    # ipa projections installed with flax orientation
    np.testing.assert_allclose(
        np.asarray(node_of(1)["to_k_ipa"]["weight"]),
        ip_sd["1.to_k_ip.weight"].T,
    )
    # the modified tree still runs (81 = 77 text + 4 face tokens)
    model2 = UNetModel(cfg)
    out = model2.apply({"params": params}, jnp.zeros((1, 8, 8, 4)),
                       jnp.zeros((1,)), jnp.ones((1, 81, 32)))
    assert np.isfinite(np.asarray(out)).all()


def test_faceid_pipeline_integration():
    """FaceID tokens change the output; 77+4 context works end-to-end."""
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    bundle = make_bundle()
    # rebuild its unet with ipa branch
    cfg = tiny_ipa_cfg()
    model = UNetModel(cfg)
    unet_params = model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 81, 32)),
    )
    bundle.unet = model
    bundle.unet_params = unet_params
    proj = MLPProjModel(FaceIDProjConfig(cross_attention_dim=32))
    proj_params = proj.init(jax.random.key(1), jnp.zeros((1, 512)))
    bundle.faceid_proj = (proj, proj_params)
    bundle.faceid_num_tokens = 4

    pipe = SD15Pipeline(bundle)
    emb = np.random.RandomState(3).randn(512).astype(np.float32)
    out_face = pipe.generate(base_opts(), face_embedding=emb)[0][0]
    out_face2 = pipe.generate(base_opts(),
                              face_embedding=emb * -1.0)[0][0]
    assert np.isfinite(out_face).all()
    assert np.abs(out_face - out_face2).max() > 1e-5
