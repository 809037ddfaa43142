"""SD3 / FLUX model + pipeline tests on tiny configs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.core.config import GenerationOptions
from cremage_tpu.models import flux as FX
from cremage_tpu.models import t5 as T5
from cremage_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from cremage_tpu.models.mmdit import MMDiT, MMDiTConfig
from cremage_tpu.models.open_clip import OpenCLIPTextConfig, OpenCLIPTextModel
from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
from cremage_tpu.pipelines.flux import FluxBundle, FluxConditioner, FluxPipeline
from cremage_tpu.pipelines.sd3 import SD3Bundle, SD3Conditioner, SD3Pipeline
from cremage_tpu.prompt.tokenizer import default_tokenizer
from cremage_tpu.samplers import flow as F

L_HID, G_HID, T5_HID = 32, 48, 96  # T5 width must exceed L+G (pad rule)


# ---------------- flow sampler --------------------------------------------

def test_flow_sigmas():
    s = F.flow_sigmas(4)
    assert s[0] == 1.0 and s[-1] == 0.0 and len(s) == 5
    s3 = F.sd3_sigmas(10)
    assert s3[0] == 1.0  # shift(1) == 1
    assert np.all(np.diff(s3) < 0)
    # shift=3 pushes intermediate sigmas up
    plain = F.flow_sigmas(10)
    assert np.all(s3[1:-1] > plain[1:-1])


def test_flow_euler_exact_linear_velocity():
    """With the true velocity v = noise - x0 constant, one Euler pass
    recovers x0 exactly from x1 = noise."""
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (1, 8, 8, 4), jnp.float32)
    noise = jax.random.normal(jax.random.key(1), x0.shape, jnp.float32)
    v_true = noise - x0

    out = F.sample_flow_euler(lambda x, s: v_true, noise, F.flow_sigmas(7))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-5)


def test_cfg_velocity():
    def v_fn(x, sigma, cond):
        return x * 0 + cond[:, None, None, None]

    c = jnp.full((1,), 3.0)
    uc = jnp.full((1,), 1.0)
    fn = F.cfg_velocity(v_fn, c, uc, 2.0)
    out = fn(jnp.zeros((1, 2, 2, 1)), 0.5)
    np.testing.assert_allclose(np.asarray(out), 5.0)


def test_flux_mu_shift():
    s = F.flow_sigmas(4, mu=F.flux_mu(4096))
    assert np.all(np.diff(s) < 0) and s[-1] == 0


# ---------------- T5 --------------------------------------------------------

def test_t5_encoder_tiny():
    cfg = T5.T5Config(vocab_size=100, d_model=T5_HID, d_kv=8, num_heads=4,
                      d_ff=128, num_layers=2, dtype=jnp.float32)
    enc = T5.T5Encoder(cfg)
    ids = jnp.array([[3, 5, 7, 1, 0, 0]], jnp.int32)
    params = enc.init(jax.random.key(0), ids)
    out = enc.apply(params, ids)
    assert out.shape == (1, 6, T5_HID)
    mask = jnp.array([[1, 1, 1, 1, 0, 0]], jnp.float32)
    out_m = enc.apply(params, ids, mask)
    assert np.isfinite(np.asarray(out_m)).all()
    # masked tokens must not influence earlier outputs
    ids2 = ids.at[0, 4].set(9)
    out_m2 = enc.apply(params, ids2, mask)
    np.testing.assert_allclose(np.asarray(out_m[:, :4]),
                               np.asarray(out_m2[:, :4]), atol=1e-5)


def test_t5_relative_buckets():
    b = T5.relative_position_bucket(np.array([[0, 1, 64], [-1, 0, 1]]))
    assert b.shape == (2, 3)
    assert b[0, 0] == 0 and b[0, 1] == 16 + 0 or b[0, 1] > 0


# ---------------- MMDiT / SD3 ----------------------------------------------

def tiny_mmdit():
    cfg = MMDiTConfig(depth=2, hidden_size=64, num_heads=4,
                      context_dim=T5_HID, pooled_dim=L_HID + G_HID,
                      pos_embed_max_size=16, dtype=jnp.float32)
    m = MMDiT(cfg)
    params = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 16)),
                    jnp.zeros((1,)), jnp.zeros((1, 154, T5_HID)),
                    jnp.zeros((1, L_HID + G_HID)))
    return m, params


def test_mmdit_forward_shapes():
    m, params = tiny_mmdit()
    out = m.apply(params, jnp.zeros((2, 8, 8, 16)), jnp.full((2,), 500.0),
                  jnp.zeros((2, 154, T5_HID)), jnp.zeros((2, L_HID + G_HID)))
    assert out.shape == (2, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_mmdit_key_names():
    m, params = tiny_mmdit()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"_".join(str(p.key) for p in path) for path, _ in flat}
    for want in [
        "params_x_embedder_proj_weight",
        "params_pos_embed",
        "params_t_embedder_mlp_0_weight",
        "params_y_embedder_mlp_2_bias",
        "params_context_embedder_weight",
        "params_joint_blocks_0_x_block_attn_qkv_weight",
        "params_joint_blocks_0_context_block_adaLN_modulation_1_weight",
        "params_joint_blocks_1_context_block_adaLN_modulation_1_weight",
        "params_final_layer_linear_weight",
    ]:
        assert want in names, want
    # final block's context stream is pre-only: 2*hidden modulation
    mod_final = [v for path, v in flat
                 if "joint_blocks_1_context_block_adaLN" in
                 "_".join(str(p.key) for p in path) and "weight" in str(path[-1].key)]
    assert mod_final[0].shape == (64, 2 * 64)


def make_sd3_bundle():
    m, mparams = tiny_mmdit()
    clip = CLIPTextModel(CLIPTextConfig(hidden_size=L_HID, num_layers=2,
                                        num_heads=4, intermediate_size=64,
                                        dtype=jnp.float32))
    cp = clip.init(jax.random.key(1), jnp.zeros((1, 77), jnp.int32))
    oc = OpenCLIPTextModel(OpenCLIPTextConfig(width=G_HID, num_layers=2,
                                              num_heads=4, dtype=jnp.float32))
    op = oc.init(jax.random.key(2), jnp.zeros((1, 77), jnp.int32))
    cond = SD3Conditioner((clip, cp), (oc, op), default_tokenizer(),
                          t5=None, t5_len=77, t5_dim=T5_HID)
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                  num_res_blocks=1, z_channels=16,
                                  embed_dim=16, scale_factor=1.5305,
                                  shift_factor=0.0609, dtype=jnp.float32))
    vp = vae.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))
    return SD3Bundle(mmdit=m, mmdit_params=mparams, conditioner=cond,
                     vae=vae, vae_params=vp)


def test_sd3_conditioner_shapes():
    b = make_sd3_bundle()
    c = b.conditioner.encode("a cat")
    assert c["crossattn"].shape == (154, T5_HID)
    assert c["pooled"].shape == (L_HID + G_HID,)
    # T5-absent mode: T5 half of context is zeros
    assert np.all(c["crossattn"][77:] == 0)


def test_sd3_pipeline_end_to_end():
    b = make_sd3_bundle()
    pipe = SD3Pipeline(b)
    opts = GenerationOptions(prompt="a cat", negative_prompt="bad",
                             H=64, W=64, sampling_steps=3, seed=5,
                             scale=4.0, safety_check=False)
    results = pipe.generate(opts)
    img, meta = results[0]
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert meta["seed"] == 5


# ---------------- FLUX ------------------------------------------------------

def tiny_flux_cfg():
    return FX.FluxConfig(
        in_channels=64, hidden_size=64, num_heads=4, head_dim=16,
        depth_double=1, depth_single=2, context_dim=T5_HID, vec_dim=L_HID,
        axes_dim=(4, 6, 6), dtype=jnp.float32,
    )


def test_flux_pack_unpack_roundtrip():
    lat = jax.random.normal(jax.random.key(0), (2, 8, 8, 16), jnp.float32)
    tokens = FX.pack_latents(lat)
    assert tokens.shape == (2, 16, 64)
    back = FX.unpack_latents(tokens, 8, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(lat))


def test_rope_freqs():
    txt_ids, img_ids = FX.make_position_ids(4, 4, 8)
    ids = np.concatenate([txt_ids, img_ids])
    freqs = FX.rope_freqs(ids, (4, 6, 6), 10000.0)
    assert freqs.shape == (24, 8, 2)
    # cos^2 + sin^2 == 1
    np.testing.assert_allclose((freqs**2).sum(-1), 1.0, rtol=1e-6)


def test_flux_model_forward():
    cfg = tiny_flux_cfg()
    m = FX.FluxModel(cfg)
    txt_ids, img_ids = FX.make_position_ids(4, 4, 8)
    img = jnp.zeros((1, 16, 64))
    txt = jnp.zeros((1, 8, T5_HID))
    t = jnp.full((1,), 0.5)
    vec = jnp.zeros((1, L_HID))
    params = m.init(jax.random.key(0), img, txt, t, vec, img_ids, txt_ids)
    out = m.apply(params, img, txt, t, vec, img_ids, txt_ids)
    assert out.shape == (1, 16, 64)
    assert np.isfinite(np.asarray(out)).all()


def make_flux_pipeline():
    """Tiny FluxPipeline on synthetic weights (8 txt + 16 img tokens —
    both divisible by 8, so the SP tests can reuse it)."""
    cfg = tiny_flux_cfg()
    m = FX.FluxModel(cfg)
    txt_ids, img_ids = FX.make_position_ids(4, 4, 8)
    params = m.init(jax.random.key(0), jnp.zeros((1, 16, 64)),
                    jnp.zeros((1, 8, T5_HID)), jnp.zeros((1,)),
                    jnp.zeros((1, L_HID)), img_ids, txt_ids)
    clip = CLIPTextModel(CLIPTextConfig(hidden_size=L_HID, num_layers=2,
                                        num_heads=4, intermediate_size=64,
                                        dtype=jnp.float32))
    cp = clip.init(jax.random.key(1), jnp.zeros((1, 77), jnp.int32))
    cond = FluxConditioner((clip, cp), default_tokenizer(), t5=None, t5_len=8)
    # conditioner t5-absent: txt zeros of width 4096 mismatch tiny cfg;
    # patch t5_dim by providing a fake t5 tuple? simpler: monkeypatch encode
    orig_encode = cond.encode

    def encode(prompt):
        d = orig_encode(prompt)
        d["txt"] = np.zeros((8, T5_HID), np.float32)
        return d

    cond.encode = encode
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                  num_res_blocks=1, z_channels=16,
                                  embed_dim=16, scale_factor=0.3611,
                                  shift_factor=0.1159, dtype=jnp.float32))
    vp = vae.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))
    bundle = FluxBundle(model=m, params=params, conditioner=cond,
                        vae=vae, vae_params=vp)
    return FluxPipeline(bundle)


def test_flux_pipeline_end_to_end():
    pipe = make_flux_pipeline()
    opts = GenerationOptions(prompt="a fox", H=64, W=64, sampling_steps=2,
                             seed=3, safety_check=False)
    results = pipe.generate(opts)
    img, meta = results[0]
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
