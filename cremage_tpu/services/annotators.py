"""ControlNet control-image annotators.

Behavior contract: reference `modules/cremage/control_net/
annotator_wrapper.py:68-221` uniform API (generate_canny / generate_hed /
generate_depth_map / generate_normal_map / generate_open_pose /
generate_scribble / generate_mlsd / generate_seg), each mapping an input
RGB image to a control image.

Implementation strategy on TPU/this environment:
- canny: OpenCV (reference `modules/annotator/canny` is also cv2) — full
  parity;
- scribble: reference derives it from HED + threshold; here derived from
  soft edges (cv2) with the same binarize step;
- hed: Flax net (models/hed.py), weights runtime-downloaded;
- depth / normal: Flax MiDaS dpt_hybrid (models/dpt.py) with the
  MidasDetector post-processing (min-max depth, Sobel-gradient normals
  with bg threshold);
- openpose: Flax body_pose_model + PAF limb assembly (models/openpose.py);
- mlsd: Flax MobileV2_MLSD_Large + tpMap decode (models/mlsd.py);
- seg: SegFormer clothes segmenter (documented substitution for the
  vendored Uniformer stack — same control-image role).

Weights resolve per annotator as: explicit argument -> env var ->
local cache -> lazy HF download (the reference downloads the same
files at first use, annotator/*/__init__.py load_file_from_url),
gated by the enable_hf_internet_connection preference.

All functions take/return HWC uint8 RGB numpy arrays (reference
convention) with the input padded to a multiple of 64 by the caller.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np

from cremage_tpu.core.registry import ANNOTATORS


class WeightsUnavailable(RuntimeError):
    def __init__(self, name: str):
        super().__init__(
            f"annotator {name!r} needs model weights; download them into the "
            f"models directory (the reference downloads these lazily too)"
        )


# (env var, HF repo, filename) — the exact files the reference fetches
# (modules/annotator/{hed,mlsd,midas,openpose}/__init__.py; seg is the
# documented SegFormer substitution).
_WEIGHT_SOURCES = {
    "hed": ("HED_MODEL_PATH", "lllyasviel/Annotators", "ControlNetHED.pth"),
    "midas": ("MIDAS_MODEL_PATH", "lllyasviel/ControlNet",
              "annotator/ckpts/dpt_hybrid-midas-501f0c75.pt"),
    "openpose": ("OPENPOSE_MODEL_PATH", "lllyasviel/ControlNet",
                 "annotator/ckpts/body_pose_model.pth"),
    "mlsd": ("MLSD_MODEL_PATH", "lllyasviel/ControlNet",
             "annotator/ckpts/mlsd_large_512_fp32.pth"),
    # ControlNet-role seg: ADE20K label space (what ControlNet-seg
    # checkpoints were trained on; the reference paints ADE palette maps
    # via Uniformer — annotator_wrapper.py:200-221).  SegFormer-b0-ADE
    # is the tpu-native stand-in for the 43k-LoC Uniformer/mmseg stack.
    "seg": ("SEGFORMER_ADE_MODEL_PATH",
            "nvidia/segformer-b0-finetuned-ade-512-512",
            "model.safetensors"),
    # clothes parser: the segmentation-inpainting *tool*'s model
    # (reference tools/image_segmenter.py:32 mattmdjaga clothes labels)
    "seg_clothes": ("SEGFORMER_MODEL_PATH",
                    "mattmdjaga/segformer_b2_clothes",
                    "model.safetensors"),
}


def annotator_cache_dir() -> str:
    return os.environ.get(
        "CREMAGE_ANNOTATOR_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "cremage_tpu",
                     "annotators"))


def resolve_annotator_weights(kind: str,
                              explicit: Optional[str] = None) -> str:
    """explicit arg -> env var -> cache dir -> lazy HF download."""
    if explicit:
        return explicit
    env, repo, fname = _WEIGHT_SOURCES[kind]
    p = os.environ.get(env, "")
    if p:
        return p
    local = os.path.join(annotator_cache_dir(), os.path.basename(fname))
    if os.path.exists(local):
        return local
    from cremage_tpu.io.downloader import download_model_if_not_exist

    try:
        return download_model_if_not_exist(local, repo, fname)
    except Exception as e:
        raise WeightsUnavailable(f"{kind} ({e})") from e


def _to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    return img


@ANNOTATORS.register("canny")
def generate_canny(img: np.ndarray, low_threshold: int = 100,
                   high_threshold: int = 200) -> np.ndarray:
    import cv2

    img = _to_uint8(img)
    edges = cv2.Canny(img, low_threshold, high_threshold)
    return np.stack([edges] * 3, axis=-1)


@ANNOTATORS.register("scribble")
def generate_scribble(img: np.ndarray, threshold: int = 32) -> np.ndarray:
    """Reference pipeline: soft edge map -> binarize (annotator_wrapper
    generate_scribble: hed > threshold -> 255)."""
    import cv2

    img = _to_uint8(img)
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    gx = cv2.Sobel(gray, cv2.CV_32F, 1, 0, ksize=3)
    gy = cv2.Sobel(gray, cv2.CV_32F, 0, 1, ksize=3)
    mag = np.sqrt(gx**2 + gy**2)
    mag = (mag / (mag.max() + 1e-8) * 255).astype(np.uint8)
    out = np.zeros_like(mag)
    out[mag > threshold] = 255
    return np.stack([out] * 3, axis=-1)


@ANNOTATORS.register("hed")
def generate_hed(img: np.ndarray, weights_path: str | None = None) -> np.ndarray:
    """HED soft edges via the Flax net (models/hed.py); weights from
    HED_MODEL_PATH or the explicit argument (runtime download in the
    reference too)."""
    from cremage_tpu.models.hed import hed_annotate

    weights_path = resolve_annotator_weights("hed", weights_path)
    if not os.path.exists(weights_path):
        raise WeightsUnavailable("hed")
    img01 = _to_uint8(img).astype(np.float32) / 255.0
    return hed_annotate(img01, weights_path)


_MIDAS_CACHE: Dict[str, tuple] = {}


def _midas_infer(img: np.ndarray, weights_path: str | None, cfg=None):
    """Shared dpt_hybrid inference for depth + normal (reference
    MidasDetector.__call__, modules/annotator/midas/__init__.py:17):
    x/127.5 - 1 in, raw inverse depth out at input resolution."""
    import jax
    import jax.numpy as jnp

    from cremage_tpu.io import checkpoint as CK
    from cremage_tpu.models.dpt import DPTDepthModel, dpt_hybrid_config

    weights_path = resolve_annotator_weights("midas", weights_path)
    if not os.path.exists(weights_path):
        raise WeightsUnavailable("depth (MiDaS dpt_hybrid)")
    if weights_path not in _MIDAS_CACHE:
        model = DPTDepthModel(cfg or dpt_hybrid_config())
        sd = CK.load_state_dict(weights_path)
        tmpl = jax.eval_shape(model.init, jax.random.key(0),
                              jnp.zeros((1, 64, 64, 3)))["params"]
        params, missing, _ = CK.build_flax_params(tmpl, sd, prefix="",
                                                  strict=False)
        if missing:
            raise KeyError(f"MiDaS ckpt missing {missing[:5]} ...")
        apply = jax.jit(lambda p, x: model.apply({"params": p}, x))
        _MIDAS_CACHE[weights_path] = (apply, params)
    apply, params = _MIDAS_CACHE[weights_path]
    x = _to_uint8(img).astype(np.float32) / 127.5 - 1.0
    # DPT needs H/W multiples of 32; pad reflect and crop back
    h, w = x.shape[:2]
    ph, pw = (-h) % 32, (-w) % 32
    if ph or pw:
        x = np.pad(x, ((0, ph), (0, pw), (0, 0)), mode="reflect")
    depth = np.asarray(apply(params, jnp.asarray(x[None])), np.float32)[0]
    return depth[:h, :w]


@ANNOTATORS.register("depth")
def generate_depth(img: np.ndarray, weights_path: str | None = None,
                   cfg=None) -> np.ndarray:
    """MiDaS depth map: min-max normalized inverse depth as uint8 RGB."""
    depth = _midas_infer(img, weights_path, cfg)
    d = depth - depth.min()
    d = d / max(float(d.max()), 1e-8)
    d8 = (d * 255.0).clip(0, 255).astype(np.uint8)
    return np.stack([d8] * 3, axis=-1)


@ANNOTATORS.register("normal")
def generate_normal(img: np.ndarray, bg_threshold: float = 0.4,
                    a: float = 2.0 * np.pi,
                    weights_path: str | None = None, cfg=None) -> np.ndarray:
    """Normal map from depth gradients (MidasDetector semantics: Sobel
    x/y zeroed where normalized depth < bg_th, z = a, L2-normalized)."""
    import cv2

    depth = _midas_infer(img, weights_path, cfg)
    d = depth - depth.min()
    d = d / max(float(d.max()), 1e-8)
    x = cv2.Sobel(depth, cv2.CV_32F, 1, 0, ksize=3)
    y = cv2.Sobel(depth, cv2.CV_32F, 0, 1, ksize=3)
    z = np.ones_like(x) * a
    x[d < bg_threshold] = 0
    y[d < bg_threshold] = 0
    normal = np.stack([x, y, z], axis=2)
    normal /= np.sum(normal ** 2.0, axis=2, keepdims=True) ** 0.5
    return (normal * 127.5 + 127.5).clip(0, 255).astype(np.uint8)


_OPENPOSE_CACHE: Dict[str, object] = {}


@ANNOTATORS.register("openpose")
def generate_openpose(img: np.ndarray,
                      weights_path: str | None = None) -> np.ndarray:
    """OpenPose body skeleton map (reference OpenposeDetector:
    body_pose_model + PAF limb assembly + stick-figure rendering on a
    black canvas)."""
    import jax
    import jax.numpy as jnp

    from cremage_tpu.io import checkpoint as CK
    from cremage_tpu.models.openpose import BodyConfig, BodyEstimator, \
        BodyPoseModel

    weights_path = resolve_annotator_weights("openpose", weights_path)
    if not os.path.exists(weights_path):
        raise WeightsUnavailable("openpose (body_pose_model)")
    if weights_path not in _OPENPOSE_CACHE:
        sd = CK.load_state_dict(weights_path)
        c0 = int(np.asarray(sd["conv1_1.weight"]).shape[0])
        stages = max(int(k.split("stage")[1].split("_")[0])
                     for k in sd if "stage" in k)
        cfg = BodyConfig(c0=c0, stages=stages)
        model = BodyPoseModel(cfg)
        tmpl = jax.eval_shape(model.init, jax.random.key(0),
                              jnp.zeros((1, 32, 32, 3)))["params"]
        params, missing, _ = CK.build_flax_params(tmpl, sd, prefix="",
                                                  strict=False)
        if missing:
            raise KeyError(f"openpose ckpt missing {missing[:5]} ...")
        _OPENPOSE_CACHE[weights_path] = BodyEstimator(params, cfg)
    return _OPENPOSE_CACHE[weights_path](_to_uint8(img))


_MLSD_CACHE: Dict[str, object] = {}


@ANNOTATORS.register("mlsd")
def generate_mlsd(img: np.ndarray, value_threshold: float = 0.1,
                  distance_threshold: float = 20.0,
                  weights_path: str | None = None, cfg=None,
                  input_size: int = 512) -> np.ndarray:
    """M-LSD line map (reference MLSDdetector: MobileV2_MLSD_Large +
    tpMap line decoding, 1px white lines on black)."""
    import jax
    import jax.numpy as jnp

    from cremage_tpu.io import checkpoint as CK
    from cremage_tpu.models.mlsd import MLSDConfig, MLSDDetector, \
        MobileV2MLSDLarge

    weights_path = resolve_annotator_weights("mlsd", weights_path)
    if not os.path.exists(weights_path):
        raise WeightsUnavailable("mlsd (mlsd_large_512_fp32)")
    if weights_path not in _MLSD_CACHE:
        cfg = cfg or MLSDConfig()
        sd = {k: v for k, v in CK.load_state_dict(weights_path).items()
              if not k.endswith("num_batches_tracked")}
        model = MobileV2MLSDLarge(cfg)
        tmpl = jax.eval_shape(model.init, jax.random.key(0),
                              jnp.zeros((1, 64, 64, 4)))["params"]
        params, missing, _ = CK.build_flax_params(tmpl, sd, prefix="",
                                                  strict=False)
        if missing:
            raise KeyError(f"mlsd ckpt missing {missing[:5]} ...")
        _MLSD_CACHE[weights_path] = MLSDDetector(params, cfg, input_size)
    return _MLSD_CACHE[weights_path](_to_uint8(img), value_threshold,
                                     distance_threshold)


_SEGFORMER_CACHE: Dict[str, object] = {}


def _segformer_for(weights_path: str, cfg=None, role: str = "seg"):
    """Cached SegformerSegmenter for a weights file (HF layout).
    Default config follows the role: ControlNet 'seg' -> 150-class ADE
    b0; 'seg_clothes' -> 18-class clothes b2."""
    import os

    import jax
    import jax.numpy as jnp

    from cremage_tpu.io import checkpoint as CK
    from cremage_tpu.models.segformer import (
        SegformerModel, SegformerSegmenter, segformer_b0_config,
        segformer_b2_clothes_config,
    )

    if not weights_path or not os.path.exists(weights_path):
        raise WeightsUnavailable("seg (Segformer)")
    if weights_path not in _SEGFORMER_CACHE:
        if cfg is None:
            cfg = (segformer_b2_clothes_config() if role == "seg_clothes"
                   else segformer_b0_config(num_classes=150))
        sd = {k: v for k, v in CK.load_state_dict(weights_path).items()
              if not k.endswith("num_batches_tracked")}
        model = SegformerModel(cfg)
        tmpl = jax.eval_shape(model.init, jax.random.key(0),
                              jnp.zeros((1, 64, 64, 3)))["params"]
        params, missing, _ = CK.build_flax_params(tmpl, sd, prefix="",
                                                  strict=False)
        if missing:
            raise KeyError(f"segformer ckpt missing {missing[:5]} ...")
        _SEGFORMER_CACHE[weights_path] = SegformerSegmenter(params, cfg)
    return _SEGFORMER_CACHE[weights_path]


@ANNOTATORS.register("seg")
def generate_seg(img: np.ndarray, weights_path: str | None = None,
                 cfg=None) -> np.ndarray:
    """ADE20K-palette segmentation control map (the label space
    ControlNet-seg checkpoints expect; reference paints mmseg
    `get_palette('ade')` over Uniformer argmax —
    annotator_wrapper.py:200-221, uniformer/__init__.py:15-27).  A
    SegFormer-b0 ADE segmenter replaces the vendored Uniformer stack."""
    weights_path = resolve_annotator_weights("seg", weights_path)
    return _segformer_for(weights_path, cfg, role="seg")(_to_uint8(img))


def annotate(name: str, img: np.ndarray, **kwargs) -> np.ndarray:
    return ANNOTATORS.get(name)(img, **kwargs)
