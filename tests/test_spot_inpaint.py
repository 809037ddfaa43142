import numpy as np

from cremage_tpu.app.tools import dilate_mask, erode_mask, invert_mask, spot_inpaint


def test_mask_ops():
    m = np.zeros((16, 16), np.float32)
    m[6:10, 6:10] = 1.0
    d = dilate_mask(m, 2)
    assert d.sum() > m.sum() and d[4, 4] == 1.0
    e = erode_mask(m, 1)
    assert e.sum() < m.sum()
    inv = invert_mask(m)
    assert inv[0, 0] == 1.0 and inv[7, 7] == 0.0


def test_spot_inpaint_crops_and_pastes():
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    bundle = make_bundle(inpaint=True)
    pipe = SD15Pipeline(bundle)
    img = np.random.RandomState(0).uniform(-1, 1, (128, 192, 3)).astype(np.float32)
    mask = np.zeros((128, 192), np.float32)
    mask[40:70, 90:130] = 1.0

    opts = base_opts(sampling_steps=2)
    out = spot_inpaint(pipe, img, mask, opts, max_edge_len=64)
    assert out.shape == img.shape
    # untouched far corner preserved exactly
    np.testing.assert_allclose(out[:10, :10], img[:10, :10])
    # masked region changed
    assert np.abs(out[50:60, 100:120] - img[50:60, 100:120]).max() > 1e-3


def test_spot_inpaint_empty_mask_noop():
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    pipe = SD15Pipeline(make_bundle(inpaint=True))
    img = np.zeros((64, 64, 3), np.float32)
    out = spot_inpaint(pipe, img, np.zeros((64, 64), np.float32),
                       base_opts())
    np.testing.assert_allclose(out, img)
