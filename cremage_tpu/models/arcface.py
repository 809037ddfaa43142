"""ArcFace IResNet face-recognition embedder (Flax) — the
InsightFace-equivalent identity path for IP-Adapter-FaceID.

Behavior contract: reference `modules/ip_adapter/ip_adapter_faceid.py:
680-720` — InsightFace FaceAnalysis("buffalo_l") detects a face and
returns `normed_embedding` (the L2-normalized 512-d ArcFace w600k_r50
output on the 5-point-aligned 112x112 crop); detection is retried with
a 200px white border when nothing is found.

Here: face detection is YuNet (cv2, same detector the face-fix chain
uses — it also yields the 5 landmarks), alignment is the canonical
ArcFace 112x112 template via a Umeyama similarity transform, and the
recognition net is insightface's IResNet-50 in Flax (module names
flatten to the torch iresnet state-dict keys).  A minimal ONNX
initializer reader converts `w600k_r50.onnx` when the torch-format
weights aren't available.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.dpt import PlainConv
from cremage_tpu.models.layers import Dense
from cremage_tpu.models.mlsd import TorchBatchNorm

# canonical ArcFace 5-point template for 112x112 (insightface
# face_align.arcface_dst)
ARCFACE_DST = np.array(
    [[38.2946, 51.6963], [73.5318, 51.5014], [56.0252, 71.7366],
     [41.5493, 92.3655], [70.7299, 92.2041]], np.float32)


@dataclasses.dataclass(frozen=True)
class IResNetConfig:
    layers: Tuple[int, ...] = (3, 4, 14, 3)    # iresnet50
    channels: Tuple[int, ...] = (64, 128, 256, 512)
    num_features: int = 512
    fc_hw: int = 7                              # 112 / 16
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32


def iresnet50_config(**kw) -> IResNetConfig:
    return IResNetConfig(**kw)


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        a = self.param("weight", nn.initializers.constant(0.25), (c,),
                       jnp.float32).astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class BatchNorm1d(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("running_mean", nn.initializers.zeros, (c,),
                          jnp.float32)
        var = self.param("running_var", nn.initializers.ones, (c,),
                         jnp.float32)
        xf = x.astype(jnp.float32)
        return ((xf - mean) / jnp.sqrt(var + self.epsilon) * w + b).astype(
            x.dtype)


class IBasicBlock(nn.Module):
    """insightface iresnet IBasicBlock: bn1 -> conv1 -> bn2 -> prelu ->
    conv2(stride) -> bn3, plus conv+bn downsample shortcut."""

    out_ch: int
    stride: int
    cfg: IResNetConfig

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)
        identity = x
        h = TorchBatchNorm(name="bn1")(x)
        h = PlainConv(self.out_ch, 3, 1, 1, use_bias=False,
                      name="conv1", **dd)(h)
        h = TorchBatchNorm(name="bn2")(h)
        h = PReLU(name="prelu")(h)
        h = PlainConv(self.out_ch, 3, self.stride, 1, use_bias=False,
                      name="conv2", **dd)(h)
        h = TorchBatchNorm(name="bn3")(h)
        if self.stride != 1 or x.shape[-1] != self.out_ch:
            s = PlainConv(self.out_ch, 1, self.stride, 0, use_bias=False,
                          name="downsample_0", **dd)(x)
            identity = TorchBatchNorm(name="downsample_1")(s)
        return h + identity


class IResNet(nn.Module):
    """(B, 112, 112, 3) in [-1, 1] -> (B, 512) (un-normalized)."""

    cfg: IResNetConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        h = PlainConv(cfg.channels[0], 3, 1, 1, use_bias=False,
                      name="conv1", **dd)(x.astype(cfg.dtype))
        h = TorchBatchNorm(name="bn1")(h)
        h = PReLU(name="prelu")(h)
        for si, (n, c) in enumerate(zip(cfg.layers, cfg.channels)):
            for bi in range(n):
                h = IBasicBlock(c, 2 if bi == 0 else 1, cfg,
                                name=f"layer{si + 1}_{bi}")(h)
        h = TorchBatchNorm(name="bn2")(h)
        # torch flattens NCHW: (B, C, H, W) -> (B, C*H*W)
        b = h.shape[0]
        h = h.transpose(0, 3, 1, 2).reshape(b, -1)
        h = Dense(cfg.num_features, name="fc", **dd)(h)
        return BatchNorm1d(name="features")(h)


# ---------------------------------------------------------------------------
# alignment + embedding service
# ---------------------------------------------------------------------------

def umeyama_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform (2x3) src -> dst (Umeyama)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    u, s, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(u) * np.linalg.det(vt))
    D = np.diag([1.0, d])
    R = u @ D @ vt
    var_s = (sc ** 2).sum() / len(src)
    scale = (s * np.diag(D)).sum() / var_s
    t = mu_d - scale * R @ mu_s
    M = np.zeros((2, 3))
    M[:, :2] = scale * R
    M[:, 2] = t
    return M


def align_face_112(rgb01: np.ndarray, landmarks5: np.ndarray,
                   size: int = 112) -> np.ndarray:
    """5-point alignment to the ArcFace template -> (size, size, 3)."""
    import cv2

    dst = ARCFACE_DST * (size / 112.0)
    M = umeyama_similarity(np.asarray(landmarks5, np.float32), dst)
    return cv2.warpAffine(rgb01.astype(np.float32), M, (size, size),
                          borderValue=0.0)


def detect_faces_with_landmarks(rgb01: np.ndarray,
                                model_path: Optional[str] = None,
                                score_threshold: float = 0.6):
    """YuNet detection returning [(box(4), landmarks(5,2), score)]."""
    import os

    import cv2

    from cremage_tpu.services.facefix import WeightsUnavailable

    model_path = model_path or os.environ.get("YUNET_MODEL_PATH", "")
    if not model_path or not os.path.exists(model_path):
        raise WeightsUnavailable(
            "YuNet model file not found; set YUNET_MODEL_PATH")
    img = (np.clip(rgb01, 0, 1) * 255).astype(np.uint8)
    bgr = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    h, w = bgr.shape[:2]
    det = cv2.FaceDetectorYN.create(model_path, "", (w, h), score_threshold)
    det.setInputSize((w, h))
    _, faces = det.detect(bgr)
    out = []
    if faces is not None:
        for f in faces:
            out.append((f[:4].astype(np.float32),
                        f[4:14].reshape(5, 2).astype(np.float32),
                        float(f[-1])))
    return out


class FaceEmbedder:
    """photo -> L2-normalized 512-d identity embedding (the
    `normed_embedding` contract), with the reference's 200px-border
    retry when no face is found."""

    def __init__(self, params, cfg: IResNetConfig = IResNetConfig(),
                 yunet_path: Optional[str] = None):
        model = IResNet(cfg)
        self._apply = jax.jit(lambda p, x: model.apply({"params": p}, x))
        self.params = params
        self.yunet_path = yunet_path

    def embed_aligned(self, aligned01: np.ndarray) -> np.ndarray:
        """(112,112,3) [0,1] RGB, already aligned -> (512,) normalized."""
        x = aligned01[None] * 2.0 - 1.0  # insightface (x-127.5)/127.5
        emb = np.asarray(self._apply(self.params, jnp.asarray(
            x, np.float32)), np.float32)[0]
        return emb / max(float(np.linalg.norm(emb)), 1e-12)

    def __call__(self, rgb01: np.ndarray) -> Optional[np.ndarray]:
        got = self.embed_and_crop(rgb01)
        return None if got is None else got[0]

    def embed_and_crop(self, rgb01: np.ndarray, crop_size: int = 224):
        """photo -> (embedding(512), aligned crop (crop_size^2,3) RGB
        [0,1]) or None.  The crop is insightface
        `face_align.norm_crop(image_size=224)` — what FaceID Plus feeds
        to CLIP (reference ip_adapter_faceid.py:736)."""
        import cv2

        faces = detect_faces_with_landmarks(rgb01, self.yunet_path)
        if not faces:
            # reference retry: 200px white border on all sides
            padded = cv2.copyMakeBorder(
                np.asarray(rgb01, np.float32), 200, 200, 200, 200,
                borderType=cv2.BORDER_CONSTANT, value=[1.0, 1.0, 1.0])
            faces = detect_faces_with_landmarks(padded, self.yunet_path)
            if not faces:
                return None
            rgb01 = padded
        _, landmarks, _ = max(faces, key=lambda f: f[2])
        rgb01 = np.asarray(rgb01, np.float32)
        aligned = align_face_112(rgb01, landmarks)
        crop = align_face_112(rgb01, landmarks, size=crop_size)
        return self.embed_aligned(aligned), crop


def load_face_embedder(weights_path: str,
                       yunet_path: Optional[str] = None,
                       cfg: Optional[IResNetConfig] = None) -> FaceEmbedder:
    """Build a FaceEmbedder from torch-format iresnet weights
    (.pt/.pth/.safetensors) or the insightface `w600k_r50.onnx`."""
    from cremage_tpu.io import checkpoint as CK

    cfg = cfg or IResNetConfig()
    if weights_path.endswith(".onnx"):
        sd = arcface_state_dict_from_onnx(weights_path)
    else:
        sd = {k: v for k, v in CK.load_state_dict(weights_path).items()
              if not k.endswith("num_batches_tracked")}
    model = IResNet(cfg)
    tmpl = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.zeros((1, 112, 112, 3)))["params"]
    params, missing, _ = CK.build_flax_params(tmpl, sd, prefix="",
                                              strict=False)
    if missing:
        raise KeyError(f"arcface ckpt missing {missing[:5]} ...")
    return FaceEmbedder(params, cfg, yunet_path)


# ---------------------------------------------------------------------------
# minimal ONNX initializer reader (no onnx dependency)
# ---------------------------------------------------------------------------

_ONNX_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32,
                7: np.int64, 10: np.float16, 11: np.float64}


def load_onnx_initializers(path: str) -> Dict[str, np.ndarray]:
    """Extract GraphProto.initializer tensors from an .onnx file using
    the shared protobuf wire reader (ModelProto.graph=7,
    GraphProto.initializer=5; TensorProto dims=1, data_type=2,
    raw_data=9, float_data=4, name=8)."""
    from cremage_tpu.prompt.sentencepiece import _iter_fields

    with open(path, "rb") as f:
        data = f.read()
    out: Dict[str, np.ndarray] = {}
    for field, wire, val in _iter_fields(data):
        if field != 7 or wire != 2:   # ModelProto.graph
            continue
        for f2, w2, v2 in _iter_fields(val):
            if f2 != 5 or w2 != 2:    # GraphProto.initializer
                continue
            dims: List[int] = []
            dtype = np.float32
            name = ""
            raw = None
            floats: List[float] = []
            for f3, w3, v3 in _iter_fields(v2):
                if f3 == 1 and w3 == 0:
                    dims.append(v3)
                elif f3 == 2 and w3 == 0:
                    dtype = _ONNX_DTYPES.get(v3, np.float32)
                elif f3 == 8 and w3 == 2:
                    name = v3.decode("utf-8", "replace")
                elif f3 == 9 and w3 == 2:
                    raw = v3
                elif f3 == 4 and w3 == 5:
                    floats.append(float(np.frombuffer(v3, "<f4")[0]))
                elif f3 == 4 and w3 == 2:  # packed repeated float
                    floats.extend(np.frombuffer(v3, "<f4").tolist())
            if raw is not None:
                arr = np.frombuffer(raw, dtype=dtype)
            else:
                arr = np.asarray(floats, dtype)
            out[name] = arr.reshape(dims) if dims else arr
    return out


def arcface_state_dict_from_onnx(path: str) -> Dict[str, np.ndarray]:
    """w600k_r50.onnx -> torch-style iresnet50 state dict.

    insightface's export keeps the torch parameter names in the
    initializer names; when the names are anonymized (pure numbers),
    tensors are assigned by the deterministic export order, which
    follows the module definition order of iresnet.
    """
    init = load_onnx_initializers(path)
    if any(".weight" in k or ".bias" in k for k in init):
        return init
    # order-based fallback: torch state-dict order of iresnet50
    cfg = IResNetConfig()
    order: List[Tuple[str, ...]] = [("conv1.weight",),
                                    ("bn1.weight", "bn1.bias",
                                     "bn1.running_mean", "bn1.running_var"),
                                    ("prelu.weight",)]
    for si, (n, c) in enumerate(zip(cfg.layers, cfg.channels)):
        for bi in range(n):
            p = f"layer{si + 1}.{bi}."
            order.append((p + "bn1.weight", p + "bn1.bias",
                          p + "bn1.running_mean", p + "bn1.running_var"))
            order.append((p + "conv1.weight",))
            order.append((p + "bn2.weight", p + "bn2.bias",
                          p + "bn2.running_mean", p + "bn2.running_var"))
            order.append((p + "prelu.weight",))
            order.append((p + "conv2.weight",))
            order.append((p + "bn3.weight", p + "bn3.bias",
                          p + "bn3.running_mean", p + "bn3.running_var"))
            if bi == 0:
                order.append((p + "downsample.0.weight",))
                order.append((p + "downsample.1.weight",
                              p + "downsample.1.bias",
                              p + "downsample.1.running_mean",
                              p + "downsample.1.running_var"))
    order += [("bn2.weight", "bn2.bias", "bn2.running_mean",
               "bn2.running_var"),
              ("fc.weight", "fc.bias"),
              ("features.weight", "features.bias",
               "features.running_mean", "features.running_var")]
    flat_names = [n for group in order for n in group]
    tensors = list(init.values())
    if len(tensors) < len(flat_names):
        raise ValueError(
            f"onnx file has {len(tensors)} initializers, iresnet50 needs "
            f"{len(flat_names)} — unsupported export layout")
    return dict(zip(flat_names, tensors))
