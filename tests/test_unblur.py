import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.services import unblur as U


def test_align_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 1, (300, 400, 3)).astype(np.float32)
    # synthetic landmarks roughly face-shaped in the middle
    lm = (U.CANONICAL_LANDMARKS_256 / 256.0) * 180 + np.array([100, 60])
    aligned, M = U.align_face_256(img, lm)
    assert aligned.shape == (256, 256, 3)
    out = U.paste_back_aligned(img, aligned, M)
    assert out.shape == img.shape
    # pasting back the *unmodified* aligned crop approximately restores
    # the original in the face region
    assert np.abs(out - img).mean() < 0.05


def test_unblur_weight_gate():
    with pytest.raises(RuntimeError):
        U.unblur_face_image(np.zeros((64, 64, 3), np.float32),
                            [(1, 1)] * 5, weights_path=None)


def test_text_safety_bert_gate(tmp_path):
    from cremage_tpu.services.text_safety_bert import load_bert_predictor

    with pytest.raises(FileNotFoundError):
        load_bert_predictor(str(tmp_path / "nope"))
