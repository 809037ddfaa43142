import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.models.controlnet import ControlNet
from cremage_tpu.models.unet import UNetConfig
from cremage_tpu.services import annotators as A


def tiny_cfg():
    return UNetConfig(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=4,
        transformer_depth=(1, 1), transformer_depth_middle=1, context_dim=32,
        dtype=jnp.float32,
    )


@pytest.mark.slow
def test_controlnet_residual_shapes():
    cfg = tiny_cfg()
    cn = ControlNet(cfg)
    x = jnp.zeros((2, 8, 8, 4))
    hint = jnp.zeros((2, 64, 64, 3))  # 8x latent size
    t = jnp.zeros((2,))
    ctx = jnp.zeros((2, 77, 32))
    params = cn.init(jax.random.key(0), x, hint, t, ctx)
    outs, mid = cn.apply(params, x, hint, t, ctx)
    # input blocks: conv_in + 2 levels x 1 res + 1 downsample = 4 residuals
    assert len(outs) == 4
    assert outs[0].shape == (2, 8, 8, 32)
    assert outs[-1].shape == (2, 4, 4, 64)
    assert mid.shape == (2, 4, 4, 64)


@pytest.mark.slow
def test_controlnet_pipeline_integration():
    """Full txt2img with a ControlNet attached; zero-hint + random zero
    convs must still produce finite output and differ from no-control."""
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    bundle = make_bundle()
    cfg = tiny_cfg()
    cn = ControlNet(cfg)
    cn_params = cn.init(
        jax.random.key(5), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)), jnp.zeros((1, 77, 32)),
    )
    bundle.controlnet = (cn, cn_params)
    pipe = SD15Pipeline(bundle)
    control = np.random.RandomState(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    out_ctl = pipe.generate(base_opts(), control_image=control)[0][0]
    out_plain = pipe.generate(base_opts())[0][0]
    assert np.isfinite(out_ctl).all()
    assert np.abs(out_ctl - out_plain).max() > 1e-5  # residuals had effect


def test_canny_annotator():
    img = np.zeros((64, 64, 3), np.uint8)
    img[16:48, 16:48] = 255
    edges = A.generate_canny(img)
    assert edges.shape == (64, 64, 3)
    assert edges.max() == 255 and (edges > 0).sum() > 0


def test_scribble_annotator():
    img = np.zeros((64, 64, 3), np.uint8)
    img[:, 32:] = 200
    out = A.generate_scribble(img)
    assert set(np.unique(out)) <= {0, 255}
    assert (out[:, 31:34] == 255).any()


def test_weightless_annotators_raise():
    with pytest.raises(A.WeightsUnavailable):
        A.annotate("depth", np.zeros((64, 64, 3), np.uint8))
    with pytest.raises(A.WeightsUnavailable):
        A.annotate("openpose", np.zeros((64, 64, 3), np.uint8))


def test_annotator_registry_names():
    from cremage_tpu.core.registry import ANNOTATORS

    for name in ["canny", "hed", "depth", "normal", "openpose", "scribble",
                 "mlsd", "seg"]:
        assert name in ANNOTATORS
