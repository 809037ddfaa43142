import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.core.config import GenerationOptions
from cremage_tpu.models.pixart import PixArt, PixArtConfig, sincos_2d
from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
from cremage_tpu.pipelines.pixart import PixArtBundle, PixArtPipeline, pixart_schedule

T5D = 64


def tiny_pixart():
    cfg = PixArtConfig(hidden_size=64, depth=2, num_heads=4, context_dim=T5D,
                       dtype=jnp.float32)
    m = PixArt(cfg)
    params = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
                    jnp.zeros((1,)), jnp.zeros((1, 10, T5D)))
    return m, params


def test_sincos_2d():
    pe = sincos_2d(64, 4, 4)
    assert pe.shape == (16, 64)
    assert np.isfinite(pe).all()


def test_pixart_forward():
    m, params = tiny_pixart()
    out = m.apply(params, jnp.zeros((2, 8, 8, 4)), jnp.full((2,), 500.0),
                  jnp.zeros((2, 10, T5D)))
    assert out.shape == (2, 8, 8, 8)  # eps + learned sigma
    assert np.isfinite(np.asarray(out)).all()


def test_pixart_key_names():
    m, params = tiny_pixart()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"_".join(str(p.key) for p in path) for path, _ in flat}
    for want in [
        "params_x_embedder_proj_weight",
        "params_t_block_1_weight",
        "params_y_embedder_y_proj_fc1_weight",
        "params_blocks_0_scale_shift_table",
        "params_blocks_0_attn_qkv_weight",
        "params_blocks_0_cross_attn_kv_linear_weight",
        "params_final_layer_scale_shift_table",
    ]:
        assert want in names, want


def test_pixart_schedule():
    s = pixart_schedule()
    # true-linear betas: acp endpoints differ from the CompVis sqrt-linear
    assert abs(s.sigmas[0] - np.sqrt(0.0001 / 0.9999)) < 1e-6
    assert s.sigma_max > 100  # plain-linear schedule ends much noisier


def test_pixart_pipeline_end_to_end():
    m, params = tiny_pixart()
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                  num_res_blocks=1, dtype=jnp.float32))
    vp = vae.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))
    bundle = PixArtBundle(dit=m, dit_params=params, t5=None, t5_tokenize=None,
                          t5_len=10, vae=vae, vae_params=vp, t5_dim=T5D)
    pipe = PixArtPipeline(bundle)
    opts = GenerationOptions(prompt="a bird", H=64, W=64, sampling_steps=3,
                             seed=2, sampler="DPM++ 2M", scale=4.5,
                             safety_check=False)
    results = pipe.generate(opts)
    img, meta = results[0]
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
