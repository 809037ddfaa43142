import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.models.unet import UNetConfig
from cremage_tpu.models.video_unet import AlphaBlender, VideoUNet
from cremage_tpu.pipelines.svd import SVDBundle, SVDOptions, SVDPipeline
from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
from cremage_tpu.services import film as FILM

CTX = 32


def tiny_video_cfg():
    return UNetConfig(
        in_channels=8, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=-1,
        num_head_channels=8, transformer_depth=(1, 1),
        transformer_depth_middle=1, context_dim=CTX, adm_in_channels=768,
        use_linear_in_transformer=True, dtype=jnp.float32,
    )


T = 3  # tiny frame count


def tiny_video_unet():
    cfg = tiny_video_cfg()
    m = VideoUNet(cfg, num_frames=T)
    x = jnp.zeros((T, 8, 8, 8))
    t = jnp.zeros((T,))
    ctx = jnp.zeros((T, 1, CTX))
    y = jnp.zeros((T, 768))
    params = m.init(jax.random.key(0), x, t, ctx, y)
    return m, params


def test_alpha_blender_learned_with_images():
    ab = AlphaBlender()
    xs = jnp.ones((1, 2, 4, 4, 3))
    xt = jnp.zeros((1, 2, 4, 4, 3))
    params = ab.init(jax.random.key(0), xs, xt, None)
    out = ab.apply(params, xs, xt, None)
    # sigmoid(0.5) blend
    np.testing.assert_allclose(np.asarray(out),
                               1 / (1 + np.exp(-0.5)), rtol=1e-5)
    img_only = jnp.array([[True, False]])
    out2 = ab.apply(params, xs, xt, img_only)
    np.testing.assert_allclose(np.asarray(out2[:, 0]), 1.0, rtol=1e-6)


@pytest.mark.slow
def test_video_unet_forward():
    m, params = tiny_video_unet()
    out = m.apply(params, jnp.zeros((T, 8, 8, 8)), jnp.zeros((T,)),
                  jnp.zeros((T, 1, CTX)), jnp.zeros((T, 768)))
    assert out.shape == (T, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_video_unet_temporal_mixing_links_frames():
    """Changing frame 0's input must change frame 2's output (temporal
    attention/convs mix across frames)."""
    m, params = tiny_video_unet()
    base = jnp.zeros((T, 8, 8, 8))
    mod = base.at[0].set(1.0)
    ctx = jnp.zeros((T, 1, CTX))
    y = jnp.zeros((T, 768))
    o1 = np.asarray(m.apply(params, base, jnp.zeros((T,)), ctx, y))
    o2 = np.asarray(m.apply(params, mod, jnp.zeros((T,)), ctx, y))
    assert np.abs(o1[2] - o2[2]).max() > 1e-6


def test_video_unet_key_names():
    m, params = tiny_video_unet()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"_".join(str(p.key) for p in path) for path, _ in flat}
    assert any("time_stack" in n for n in names)
    assert any("time_mixer_mix_factor" in n for n in names)
    assert any("time_pos_embed_0" in n for n in names)


def test_svd_pipeline_end_to_end(tmp_path):
    m, params = tiny_video_unet()
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                  num_res_blocks=1, dtype=jnp.float32))
    vp = vae.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))
    pipe = SVDPipeline(SVDBundle(unet=m, unet_params=params, vae=vae,
                                 vae_params=vp))
    img = np.random.RandomState(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    opts = SVDOptions(num_frames=T, num_steps=2, seed=4)
    frames = pipe.sample(img, opts, output_dir=str(tmp_path / "frames"))
    assert frames.shape == (T, 64, 64, 3)
    assert np.isfinite(frames).all()
    assert len(list((tmp_path / "frames").glob("*.png"))) == T


def test_film_interpolation(tmp_path):
    rng = np.random.RandomState(0)
    f0 = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    f1 = np.roll(f0, 4, axis=1)
    mid = FILM.interpolate_pair(f0, f1)
    assert mid.shape == f0.shape and np.isfinite(mid).all()

    out = FILM.interpolate_recursively([f0, f1], passes=2)
    assert len(out) == 5  # 2 frames + 3 inserted

    mp4 = str(tmp_path / "out.mp4")
    frames = FILM.inference_multiple_frames([f0, f1], 1, output_path=mp4)
    assert len(frames) == 3
    import os

    assert os.path.exists(mp4) and os.path.getsize(mp4) > 0


def test_film_net_learned_pair():
    import jax
    import jax.numpy as jnp

    from cremage_tpu.services.film_net import FilmConfig, FilmNet

    cfg = FilmConfig(pyramid_levels=6, fusion_pyramid_levels=5,
                     specialized_levels=3, sub_levels=4, filters=4,
                     flow_convs=(2, 2, 2, 2), flow_filters=(4, 8, 8, 16))
    net = FilmNet(cfg)
    f0 = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    f1 = jnp.roll(f0, 3, axis=2)
    params = net.init(jax.random.key(1), f0, f1)
    mid = net.apply(params, f0, f1)
    assert mid.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(mid)).all()
