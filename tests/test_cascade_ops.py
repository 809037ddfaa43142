"""Differential parity for the Stable Cascade structural ops vs torch:
ConvTranspose2d k2s2 (level upscaler), PixelShuffle/PixelUnshuffle
(Stage B patching), and bilinear align_corners=True resize (effnet /
pixels injection). Guards the NHWC einsum/reshape implementations in
models/cascade.py against the exact torch semantics the checkpoints
were trained with."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.models.cascade import (
    ConvTranspose2x2, _pixel_shuffle, _pixel_unshuffle,
    _resize_bilinear_ac,
)


def test_conv_transpose_2x2_matches_torch():
    torch.manual_seed(0)
    tconv = torch.nn.ConvTranspose2d(6, 4, kernel_size=2, stride=2)
    x = torch.randn(2, 6, 5, 7)
    with torch.no_grad():
        want = tconv(x).permute(0, 2, 3, 1).numpy()

    m = ConvTranspose2x2(features=4, dtype=jnp.float32)
    tmpl = jax.eval_shape(m.init, jax.random.key(0),
                          jnp.zeros((2, 5, 7, 6)))["params"]
    sd = {k: v.numpy() for k, v in tconv.state_dict().items()}
    params, missing, unused = CK.build_flax_params(tmpl, sd, prefix="")
    assert not missing and not unused
    got = m.apply({"params": params},
                  jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_pixel_shuffle_roundtrip_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 6, 4)).astype(np.float32)  # NHWC
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want_un = F.pixel_unshuffle(xt, 2).permute(0, 2, 3, 1).numpy()
    got_un = np.asarray(_pixel_unshuffle(jnp.asarray(x), 2))
    np.testing.assert_array_equal(got_un, want_un)

    y = rng.standard_normal((2, 4, 3, 16)).astype(np.float32)
    yt = torch.from_numpy(y).permute(0, 3, 1, 2)
    want_sh = F.pixel_shuffle(yt, 2).permute(0, 2, 3, 1).numpy()
    got_sh = np.asarray(_pixel_shuffle(jnp.asarray(y), 2))
    np.testing.assert_array_equal(got_sh, want_sh)

    # inverses of each other
    np.testing.assert_array_equal(
        np.asarray(_pixel_shuffle(_pixel_unshuffle(jnp.asarray(x), 2), 2)), x)


def test_bilinear_align_corners_matches_torch():
    rng = np.random.default_rng(2)
    for (h, w, oh, ow) in [(4, 4, 8, 8), (3, 5, 7, 9), (8, 8, 3, 3),
                           (6, 6, 6, 6)]:
        x = rng.standard_normal((1, h, w, 3)).astype(np.float32)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = F.interpolate(xt, size=(oh, ow), mode="bilinear",
                             align_corners=True).permute(0, 2, 3, 1).numpy()
        got = np.asarray(_resize_bilinear_ac(jnp.asarray(x), oh, ow))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
