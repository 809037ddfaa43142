"""PixArt diffusers-layout conversion: synthesize a tiny diffusers-style
state dict, convert, load into our module, run."""
import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.io.diffusers_keys import pixart_from_diffusers
from cremage_tpu.models.pixart import PixArt, PixArtConfig

T5D = 48
HID = 64


def synth_diffusers_pixart(depth=2):
    rng = np.random.RandomState(0)
    sd = {}

    def lin(name, i, o):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    sd["pos_embed.proj.weight"] = rng.randn(HID, 4, 2, 2).astype(np.float32)
    sd["pos_embed.proj.bias"] = rng.randn(HID).astype(np.float32)
    lin("adaln_single.emb.timestep_embedder.linear_1", 256, HID)
    lin("adaln_single.emb.timestep_embedder.linear_2", HID, HID)
    lin("adaln_single.linear", HID, 6 * HID)
    lin("caption_projection.linear_1", T5D, HID)
    lin("caption_projection.linear_2", HID, HID)
    for i in range(depth):
        b = f"transformer_blocks.{i}"
        sd[b + ".scale_shift_table"] = rng.randn(6, HID).astype(np.float32)
        for p in ("q", "k", "v"):
            lin(f"{b}.attn1.to_{p}", HID, HID)
        lin(f"{b}.attn1.to_out.0", HID, HID)
        lin(f"{b}.attn2.to_q", HID, HID)
        for p in ("k", "v"):
            lin(f"{b}.attn2.to_{p}", HID, HID)
        lin(f"{b}.attn2.to_out.0", HID, HID)
        lin(f"{b}.ff.net.0.proj", HID, 4 * HID)
        lin(f"{b}.ff.net.2", 4 * HID, HID)
    sd["scale_shift_table"] = rng.randn(2, HID).astype(np.float32)
    lin("proj_out", HID, 2 * 2 * 8)
    return sd


def test_pixart_diffusers_conversion_loads_and_runs():
    sd = synth_diffusers_pixart()
    converted = pixart_from_diffusers(sd)
    # fused qkv present with tripled rows
    assert converted["blocks.0.attn.qkv.weight"].shape == (3 * HID, HID)
    assert converted["blocks.0.cross_attn.kv_linear.weight"].shape == (2 * HID, HID)

    cfg = PixArtConfig(hidden_size=HID, depth=2, num_heads=4,
                       context_dim=T5D, dtype=jnp.float32)
    model = PixArt(cfg)
    tmpl = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 6, T5D)),
    )["params"]
    params, missing, unused = CK.build_flax_params(tmpl, converted, prefix="")
    assert not missing, missing
    assert not unused, unused

    out = model.apply({"params": params}, jnp.ones((1, 8, 8, 4)) * 0.1,
                      jnp.full((1,), 500.0), jnp.ones((1, 6, T5D)) * 0.1)
    assert out.shape == (1, 8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()

    # fused-qkv correctness: the q rows of our kernel equal to_q
    qkv = np.asarray(params["blocks_0"]["attn_qkv"]["weight"])  # (in, 3H)
    np.testing.assert_allclose(qkv[:, :HID], sd["transformer_blocks.0.attn1.to_q.weight"].T)
    np.testing.assert_allclose(qkv[:, HID:2 * HID],
                               sd["transformer_blocks.0.attn1.to_k.weight"].T)
