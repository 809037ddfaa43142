"""Auto-face-fix re-entrancy: generation-inside-generation through the
stateless pipeline (the reference's hardest aux flow, SURVEY §7 hard
part 7)."""
import numpy as np
import pytest

from cremage_tpu.services.facefix import FaceBox, auto_face_fixer


@pytest.mark.slow
def test_auto_face_fixer_reenters_pipeline():
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    bundle = make_bundle()
    pipe = SD15Pipeline(bundle)
    hook = auto_face_fixer(pipe, target_size=64, steps=2)

    # bypass detection (no YuNet weights in CI): patch the fixer to use
    # explicit boxes through the same repair path
    import cremage_tpu.services.facefix as FF

    orig_detect = FF.detect_faces
    FF.detect_faces = lambda img, method="OpenCV", model_path=None: [
        FaceBox(16, 16, 24, 24)
    ]
    try:
        pipe.face_fixer = hook
        img = np.random.RandomState(0).uniform(0.3, 0.7, (64, 64, 3)).astype(
            np.float32)
        opts = base_opts(auto_face_fix=True, auto_face_fix_strength=0.5,
                         auto_face_fix_prompt="a face", sampling_steps=2)
        # run a full generation with the hook active
        out, meta = pipe.generate(opts)[0]
        assert out.shape == (64, 64, 3)
        assert np.isfinite(out).all()
    finally:
        FF.detect_faces = orig_detect


def test_auto_face_fixer_degrades_gracefully_without_weights():
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    pipe = SD15Pipeline(make_bundle())
    hook = auto_face_fixer(pipe, target_size=64, steps=2)
    img = np.zeros((64, 64, 3), np.float32)

    class O:
        auto_face_fix_prompt = ""
        auto_face_fix_strength = 0.3
        seed = 1

    out = hook(img, O())  # YuNet weights missing -> warn + passthrough
    np.testing.assert_allclose(out, img)
