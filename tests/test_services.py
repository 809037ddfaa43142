import numpy as np
import pytest

from cremage_tpu.services import facefix as FF
from cremage_tpu.services import upscalers as UP
from cremage_tpu.services.safety import ImageSafetyChecker, TextSafetyChecker
from cremage_tpu.services.watermark import (
    DEFAULT_PAYLOAD, decode_watermark, embed_watermark,
)


def test_watermark_roundtrip_uint8():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (128, 128, 3), np.uint8)
    marked = embed_watermark(img, "Cremage")
    assert marked.dtype == np.uint8
    # invisible: small perturbation
    assert np.abs(marked.astype(int) - img.astype(int)).mean() < 8
    out = decode_watermark(marked, len(b"Cremage"))
    assert out == b"Cremage"


def test_watermark_roundtrip_float():
    rng = np.random.RandomState(1)
    img = rng.uniform(0, 1, (160, 160, 3)).astype(np.float32)
    marked = embed_watermark(img, "StableDiffusionV1")
    assert marked.dtype == np.float32
    out = decode_watermark(marked, len(b"StableDiffusionV1"))
    assert out == b"StableDiffusionV1"


def test_watermark_survives_8bit_quantization():
    rng = np.random.RandomState(2)
    img = rng.uniform(0, 1, (128, 128, 3)).astype(np.float32)
    marked = embed_watermark(img, "Cremage")
    quantized = np.round(marked * 255) / 255.0
    assert decode_watermark(quantized.astype(np.float32), 7) == b"Cremage"


def test_image_safety_passthrough_and_flagging():
    imgs = np.random.RandomState(0).uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
    chk = ImageSafetyChecker()
    out, flags = chk.check(imgs)
    assert flags == [False, False]
    np.testing.assert_allclose(out, imgs)

    chk2 = ImageSafetyChecker(classifier=lambda x: np.array([0.9, 0.1]))
    out2, flags2 = chk2.check(imgs)
    assert flags2 == [True, False]
    assert (out2[0] == 0).all() and (out2[1] == imgs[1]).all()


def test_text_safety_denylist_and_threshold():
    chk = TextSafetyChecker(deny_terms=["badword"])
    assert chk.should_block("a BADWORD prompt")
    assert not chk.should_block("a nice prompt")
    chk2 = TextSafetyChecker(predictor=lambda t: 0.85)
    assert chk2.should_block("anything")
    chk3 = TextSafetyChecker(predictor=lambda t: 0.75)
    assert not chk3.should_block("anything")  # p<=0.8 gate (reference)


def test_lanczos_upscale():
    img = np.zeros((32, 32, 3), np.float32)
    img[8:24, 8:24] = 1.0
    up = UP.lanczos_upscale(img, 2.0)
    assert up.shape == (64, 64, 3)
    assert 0.0 <= up.min() and up.max() <= 1.0


def test_rrdbnet_shapes():
    import jax
    import jax.numpy as jnp

    model = UP.RRDBNet(nf=8, nb=1)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    out = model.apply(params, jnp.zeros((1, 16, 16, 3)))
    assert out.shape == (1, 64, 64, 3)  # x4


def test_smart_upscale_fallback():
    img = np.random.RandomState(0).uniform(0, 1, (16, 16, 3)).astype(np.float32)
    out = UP.smart_upscale(img, 2.0, esrgan_weights="/nonexistent.pth")
    assert out.shape == (32, 32, 3)


# ---------------- face fix geometry ----------------------------------------

def test_crop_resize_pad():
    crop = np.ones((40, 20, 3), np.float32)
    padded, (rh, rw), scale = FF.crop_resize_pad(crop, 64)
    assert padded.shape == (64, 64, 3)
    assert rh == 64 and rw == 32
    assert padded[:, 32:].sum() == 0  # padded region empty


def test_expand_box_clamps():
    box = FF.FaceBox(5, 5, 20, 20)
    x0, y0, x1, y1 = FF._expand_box(box, 100, 100, margin=20)
    assert (x0, y0) == (0, 0) and (x1, y1) == (45, 45)


def test_paste_back_seamless():
    rng = np.random.RandomState(0)
    base = rng.uniform(0.4, 0.6, (64, 64, 3)).astype(np.float32)
    # textured patch: Poisson blending preserves gradients, so the pasted
    # region must show the face's structure relative to the base
    face = np.zeros((24, 24, 3), np.float32)
    face[::2] = 1.0
    out = FF.paste_back_seamless(base, face, (20, 20, 44, 44))
    assert out.shape == base.shape
    inner = out[24:40, 24:40]
    assert np.abs(inner - base[24:40, 24:40]).max() > 0.1
    # outside the box untouched (up to the 8-bit round trip)
    np.testing.assert_allclose(out[:10, :10], base[:10, :10], atol=0.01)


def test_face_fixer_with_explicit_boxes():
    calls = []

    def fake_img2img(img, prompt, strength, seed):
        calls.append((img.shape, prompt, strength, seed))
        return np.clip(img + 0.5, 0, 1)

    fixer = FF.FaceFixer(fake_img2img, target_size=64)
    img = np.random.RandomState(5).uniform(0.3, 0.7, (128, 128, 3)).astype(
        np.float32)
    boxes = [FF.FaceBox(30, 30, 30, 30), FF.FaceBox(80, 80, 20, 20)]
    out = fixer.fix(img, prompt="a face", strength=0.3, seed=7, boxes=boxes)
    assert len(calls) == 2
    assert calls[0][0] == (64, 64, 3)
    assert calls[0][3] == 7 and calls[1][3] == 8
    assert np.abs(out[40:50, 40:50] - img[40:50, 40:50]).max() > 0.05


def test_detect_faces_missing_weights(monkeypatch):
    monkeypatch.delenv("YUNET_MODEL_PATH", raising=False)
    with pytest.raises(FF.WeightsUnavailable):
        FF.detect_faces_opencv(np.zeros((64, 64, 3), np.float32),
                               model_path="/nope.onnx")
    with pytest.raises(FF.WeightsUnavailable):
        FF.detect_faces(np.zeros((64, 64, 3), np.float32),
                        method="InsightFace")


def test_detect_faces_yunet_if_available():
    import os

    model = "/root/reference/models/opencv/face_detection_yunet_2023mar.onnx"
    if not os.path.exists(model):
        pytest.skip("YuNet model not present")
    import cv2

    # draw a crude face-like pattern; just assert no crash & list return
    img = np.full((128, 128, 3), 0.8, np.float32)
    faces = FF.detect_faces_opencv(img, model_path=model)
    assert isinstance(faces, list)


def test_both_detection_methods_find_faces():
    """Both UI-menu methods ("OpenCV", "InsightFace") return boxes on a
    real photo (reference face_detector_engine.py:432; the InsightFace
    method is the documented 640-letterbox substitution)."""
    import os

    model = "/root/reference/models/opencv/face_detection_yunet_2023mar.onnx"
    photo = "/root/reference/resources/images/real1.jpg"
    if not (os.path.exists(model) and os.path.exists(photo)):
        pytest.skip("YuNet model / test photo not present")
    from PIL import Image

    img = np.asarray(Image.open(photo).convert("RGB"), np.float32) / 255.0
    cv_faces = FF.detect_faces(img, "OpenCV", model)
    if_faces = FF.detect_faces(img, "InsightFace", model)
    assert len(cv_faces) == 2 and len(if_faces) == 2
    # same faces, methods may disagree by a few pixels
    for a in cv_faces:
        match = min(if_faces,
                    key=lambda b: abs(a.x - b.x) + abs(a.y - b.y))
        assert abs(a.x - match.x) < 20 and abs(a.y - match.y) < 20

    with pytest.raises(ValueError):
        FF.detect_faces(img, "Nope", model)


def test_annotator_weight_resolution_order(monkeypatch, tmp_path):
    """explicit arg -> env var -> cache -> lazy HF download, matching the
    reference's load_file_from_url flow (annotator/*/__init__.py)."""
    from cremage_tpu.services import annotators as A

    # explicit wins
    assert A.resolve_annotator_weights("hed", "/x/y.pth") == "/x/y.pth"
    # env var next
    monkeypatch.setenv("HED_MODEL_PATH", "/env/h.pth")
    assert A.resolve_annotator_weights("hed") == "/env/h.pth"
    monkeypatch.delenv("HED_MODEL_PATH")
    # cache dir next
    cache = tmp_path / "ann"
    cache.mkdir()
    monkeypatch.setenv("CREMAGE_ANNOTATOR_DIR", str(cache))
    (cache / "ControlNetHED.pth").write_bytes(b"x")
    assert A.resolve_annotator_weights("hed") == str(
        cache / "ControlNetHED.pth")
    # gated-off internet surfaces as WeightsUnavailable (conftest sets
    # ENABLE_HF_INTERNET_CONNECTION=0)
    import pytest as _pytest
    with _pytest.raises(A.WeightsUnavailable):
        A.resolve_annotator_weights("openpose")
    # download last: assert repo/filename wiring without network
    calls = {}

    def fake_download(local, repo, fname, revision=None):
        calls["args"] = (repo, fname)
        return local

    import cremage_tpu.io.downloader as DL
    monkeypatch.setattr(DL, "download_model_if_not_exist", fake_download)
    got = A.resolve_annotator_weights("mlsd")
    assert calls["args"] == (
        "lllyasviel/ControlNet", "annotator/ckpts/mlsd_large_512_fp32.pth")
    assert got.endswith("mlsd_large_512_fp32.pth")


def test_gender_classification_with_local_model(tmp_path):
    """Gender hook for face prompts (reference face_detector_engine.py:
    146-149): exercised end-to-end against a tiny local random-weight
    ViT saved in the transformers layout."""
    from transformers import (
        FlaxViTForImageClassification, ViTConfig, ViTImageProcessor,
    )

    cfg = ViTConfig(hidden_size=32, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=64,
                    image_size=32, patch_size=16, num_labels=2,
                    id2label={0: "female", 1: "male"},
                    label2id={"female": 0, "male": 1})
    model = FlaxViTForImageClassification(cfg, seed=0)
    proc = ViTImageProcessor(size={"height": 32, "width": 32})
    d = tmp_path / "gender"
    model.save_pretrained(str(d))
    proc.save_pretrained(str(d))

    face = np.random.RandomState(0).uniform(0, 1, (48, 48, 3)).astype(
        np.float32)
    out = FF.classify_gender(face, model_dir=str(d))
    assert out in ("man", "woman")
    # missing dir -> graceful None (prompt used unmodified)
    assert FF.classify_gender(face, model_dir=str(tmp_path / "nope")) is None
