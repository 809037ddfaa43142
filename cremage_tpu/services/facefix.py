"""Face fix (adetailer-style quality repair) chain.

Behavior contract (reference `modules/face_detection/
face_detector_engine.py` + `face_img2img.py`, SURVEY.md item 30):
detect faces (OpenCV YuNet or InsightFace) -> per face: grow the box by a
20px margin -> crop, resize/pad to the model's native size (512 SD1.5 /
1024 SDXL) -> img2img at low denoising strength with the face prompt ->
unpad/resize back -> cv2.seamlessClone paste-back. Auto mode hooks into
every pipeline's `face_fixer` callable; the manual tool exposes
fix_with_detected_faces for click-to-fix.

Detection backends:
- "OpenCV": cv2.FaceDetectorYN with the YuNet model file (a runtime
  download in the reference as well: models/opencv/
  face_detection_yunet_2023mar.onnx);
- "InsightFace": not available in this environment; raises
  WeightsUnavailable like other weight-gated services.
Callers may also pass explicit face boxes (the manual-tool path).
"""
from __future__ import annotations

import dataclasses
import logging
import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

FACE_MARGIN = 20  # reference face_detector_engine margin


class WeightsUnavailable(RuntimeError):
    pass


@dataclasses.dataclass
class FaceBox:
    x: int
    y: int
    w: int
    h: int
    score: float = 1.0


def detect_faces_opencv(
    image01: np.ndarray,
    model_path: Optional[str] = None,
    score_threshold: float = 0.6,
) -> List[FaceBox]:
    """YuNet detection; image01 float [0,1] HWC RGB."""
    import cv2

    model_path = model_path or os.environ.get("YUNET_MODEL_PATH", "")
    if not model_path or not os.path.exists(model_path):
        raise WeightsUnavailable(
            "YuNet model file not found; set YUNET_MODEL_PATH or download "
            "face_detection_yunet_2023mar.onnx (reference does the same)"
        )
    img = (np.clip(image01, 0, 1) * 255).astype(np.uint8)
    bgr = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    h, w = bgr.shape[:2]
    det = cv2.FaceDetectorYN.create(model_path, "", (w, h), score_threshold)
    det.setInputSize((w, h))
    _, faces = det.detect(bgr)
    out = []
    if faces is not None:
        for f in faces:
            out.append(FaceBox(int(f[0]), int(f[1]), int(f[2]), int(f[3]),
                               float(f[-1])))
    return out


def detect_faces_insightface(image01: np.ndarray,
                             model_path: Optional[str] = None,
                             det_size: int = 640) -> List[FaceBox]:
    """The UI's "InsightFace" detection method (reference
    face_detector_engine.py:432 fix_with_insight_face ->
    face_detector_insight_face.py:151 get_face_bounding_boxes: SCRFD
    buffalo_l at det_size=(640,640)).

    Documented substitution: instead of the SCRFD ONNX net, this runs
    the in-repo landmark detector (the one backing the FaceID identity
    pipeline, models/arcface.py) at the same insightface geometry — an
    aspect-preserving 640x640 letterbox — and maps boxes back, with the
    FaceID 200px-border retry when nothing is found.  Same menu option,
    same box contract; detector net differs."""
    import cv2

    from cremage_tpu.models.arcface import detect_faces_with_landmarks

    img = np.asarray(image01, np.float32)
    h, w = img.shape[:2]
    scale = det_size / max(h, w)
    rh, rw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    boxed = np.zeros((det_size, det_size, 3), np.float32)
    boxed[:rh, :rw] = cv2.resize(img, (rw, rh),
                                 interpolation=cv2.INTER_LINEAR)
    faces = detect_faces_with_landmarks(boxed, model_path)
    offx = offy = 0.0
    if not faces:
        # reference retry (ip_adapter_faceid.py:712): 200px white border
        pad = 200
        padded = cv2.copyMakeBorder(boxed, pad, pad, pad, pad,
                                    borderType=cv2.BORDER_CONSTANT,
                                    value=[1.0, 1.0, 1.0])
        faces = detect_faces_with_landmarks(padded, model_path)
        offx = offy = float(pad)
    out = []
    for box, _lmk, score in faces:
        x = (float(box[0]) - offx) / scale
        y = (float(box[1]) - offy) / scale
        bw = float(box[2]) / scale
        bh = float(box[3]) / scale
        x0 = max(0, int(round(x)))
        y0 = max(0, int(round(y)))
        x1 = min(w, int(round(x + bw)))
        y1 = min(h, int(round(y + bh)))
        if x1 > x0 and y1 > y0:
            out.append(FaceBox(x0, y0, x1 - x0, y1 - y0, score))
    return out


def detect_faces(image01: np.ndarray, method: str = "OpenCV",
                 model_path: Optional[str] = None) -> List[FaceBox]:
    if method == "OpenCV":
        return detect_faces_opencv(image01, model_path)
    if method == "InsightFace":
        return detect_faces_insightface(image01, model_path)
    raise ValueError(f"unknown face detection method {method!r}")


def _expand_box(box: FaceBox, img_h: int, img_w: int,
                margin: int = FACE_MARGIN) -> Tuple[int, int, int, int]:
    x0 = max(0, box.x - margin)
    y0 = max(0, box.y - margin)
    x1 = min(img_w, box.x + box.w + margin)
    y1 = min(img_h, box.y + box.h + margin)
    return x0, y0, x1, y1


def crop_resize_pad(
    crop01: np.ndarray, target: int
) -> Tuple[np.ndarray, Tuple[int, int], float]:
    """Resize keeping aspect so the long edge == target, pad the rest
    (reference face_detector_engine :138-209). Returns (padded, (rh, rw),
    scale) where (rh, rw) is the resized size before padding."""
    import cv2

    h, w = crop01.shape[:2]
    scale = target / max(h, w)
    rh, rw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    resized = cv2.resize(crop01, (rw, rh), interpolation=cv2.INTER_LANCZOS4)
    padded = np.zeros((target, target, 3), np.float32)
    padded[:rh, :rw] = resized
    return padded, (rh, rw), scale


def paste_back_seamless(
    base01: np.ndarray, face01: np.ndarray, box: Tuple[int, int, int, int]
) -> np.ndarray:
    """cv2.seamlessClone composite (reference :280-284)."""
    import cv2

    x0, y0, x1, y1 = box
    h, w = y1 - y0, x1 - x0
    face = (np.clip(face01, 0, 1) * 255).astype(np.uint8)
    base = (np.clip(base01, 0, 1) * 255).astype(np.uint8)
    face = cv2.resize(face, (w, h), interpolation=cv2.INTER_LANCZOS4)
    mask = np.full((h, w), 255, np.uint8)
    center = (x0 + w // 2, y0 + h // 2)
    out = cv2.seamlessClone(
        cv2.cvtColor(face, cv2.COLOR_RGB2BGR),
        cv2.cvtColor(base, cv2.COLOR_RGB2BGR),
        mask, center, cv2.NORMAL_CLONE,
    )
    return cv2.cvtColor(out, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


class FaceFixer:
    """Reusable face-fix engine: plug a pipeline's img2img as the
    repair function. Handles the reference's re-entrancy problem
    (image_generator.py:1161-1200 recursive generation) by owning a
    separate GenerationOptions per repair call."""

    def __init__(
        self,
        img2img_fn: Callable[[np.ndarray, str, float, int], np.ndarray],
        target_size: int = 512,
        detection_method: str = "OpenCV",
        model_path: Optional[str] = None,
    ):
        """img2img_fn(image01 (T,T,3), prompt, strength, seed) -> image01."""
        self.img2img_fn = img2img_fn
        self.target_size = target_size
        self.detection_method = detection_method
        self.model_path = model_path

    def fix(
        self,
        image01: np.ndarray,
        prompt: str = "",
        strength: float = 0.3,
        seed: int = 0,
        boxes: Optional[Sequence[FaceBox]] = None,
    ) -> np.ndarray:
        """Detect (or take) face boxes and repair each via img2img."""
        h, w = image01.shape[:2]
        if boxes is None:
            boxes = detect_faces(image01, self.detection_method,
                                 self.model_path)
        out = image01.astype(np.float32)
        for i, box in enumerate(boxes):
            x0, y0, x1, y1 = _expand_box(box, h, w)
            crop = out[y0:y1, x0:x1]
            padded, (rh, rw), _ = crop_resize_pad(crop, self.target_size)
            fixed = self.img2img_fn(padded, prompt, strength, seed + i)
            fixed = np.asarray(fixed, np.float32)
            unpadded = fixed[:rh, :rw]
            out = paste_back_seamless(out, unpadded, (x0, y0, x1, y1))
        return out


def classify_gender(face01: np.ndarray,
                    model_dir: Optional[str] = None) -> Optional[str]:
    """Gender classification for face prompts (reference
    face_detector_engine.py:146-149 uses the
    rizvandwiki/gender-classification ViT, a runtime download). Returns
    'man'/'woman' when a local transformers image-classification model is
    available, else None (the face prompt is then used unmodified)."""
    import os

    model_dir = model_dir or os.environ.get("GENDER_MODEL_PATH", "")
    if not model_dir or not os.path.isdir(model_dir):
        return None
    try:
        from transformers import (
            AutoImageProcessor, FlaxAutoModelForImageClassification,
        )

        proc = AutoImageProcessor.from_pretrained(model_dir)
        model = FlaxAutoModelForImageClassification.from_pretrained(model_dir)
        inputs = proc(
            images=(np.clip(face01, 0, 1) * 255).astype(np.uint8),
            return_tensors="np")
        logits = model(**inputs).logits
        label = model.config.id2label[int(np.argmax(logits))]
        return "woman" if "female" in label.lower() else "man"
    except Exception as e:  # pragma: no cover - model-dependent
        logger.warning("gender classification failed: %s", e)
        return None


def pipeline_face_fixer(
    pipeline,
    detection_method: str = "OpenCV",
    model_path: Optional[str] = None,
    target_size: int = 512,
    steps: int = 20,
    sampler: str = "Euler A",
) -> "FaceFixer":
    """Build a FaceFixer whose repair function is the given pipeline's
    img2img (used both by the auto hook and by the standalone face-fix
    job mode, reference tools/face_detector.py)."""
    from cremage_tpu.core.config import GenerationOptions, MODE_IMAGE_TO_IMAGE

    def img2img_fn(img01: np.ndarray, prompt: str, strength: float,
                   seed: int) -> np.ndarray:
        opts = GenerationOptions(
            prompt=prompt, mode=MODE_IMAGE_TO_IMAGE, H=target_size,
            W=target_size, sampling_steps=steps, sampler=sampler,
            strength=strength, seed=seed, n_samples=1, n_iter=1,
            safety_check=False, watermark=False, auto_face_fix=False,
        )
        results = pipeline.generate(opts, init_image=img01 * 2.0 - 1.0)
        return results[0][0]

    return FaceFixer(img2img_fn, target_size=target_size,
                     detection_method=detection_method,
                     model_path=model_path)


def auto_face_fixer(
    pipeline,
    detection_method: str = "OpenCV",
    model_path: Optional[str] = None,
    target_size: int = 512,
    steps: int = 20,
    sampler: str = "Euler A",
):
    """Build the `face_fixer(image01, opts)` hook the pipelines call for
    auto face fix. Handles the reference's re-entrancy problem
    (`image_generator.py:1161-1200` generation-inside-generation mutating
    a global model cache) by re-entering the same stateless pipeline with
    a fresh GenerationOptions per face."""
    fixer = pipeline_face_fixer(
        pipeline, detection_method=detection_method, model_path=model_path,
        target_size=target_size, steps=steps, sampler=sampler)

    def hook(image01: np.ndarray, opts) -> np.ndarray:
        try:
            return fixer.fix(
                image01,
                prompt=getattr(opts, "auto_face_fix_prompt", ""),
                strength=getattr(opts, "auto_face_fix_strength", 0.3),
                seed=int(getattr(opts, "seed", 0) or 0),
            )
        except WeightsUnavailable as e:
            logger.warning("auto face fix skipped: %s", e)
            return image01

    return hook
