"""FaceID Plus(-v2) CLIP-vision side: embed the aligned face crop.

Behavior contract: reference `modules/ip_adapter/ip_adapter_faceid.py`
`IPAdapterFaceIDPlus.get_image_embeds` (:432-460) +
`generate_face_embedding_from_image` (:680-745):
- the image encoder is `laion/CLIP-ViT-H-14-laion2B-s32B-b79K`
  (hidden 1280); the conditioning is `hidden_states[-2]`, the tokens
  entering the final transformer block — shape (1, 257, 1280);
- the crop fed to CLIP is insightface `face_align.norm_crop(image,
  kps, image_size=224)` of the *cv2 BGR* image — the published
  pipeline passes the BGR array straight into CLIPImageProcessor, so
  channel order is intentionally swapped for parity (:736);
- the uncond embedding is the tower run on `torch.zeros_like(
  clip_image)` — zeros in *normalized* space, i.e. a constant image at
  the CLIP channel means, not a black image (:444-447).

Weights resolve: explicit arg -> FACEID_CLIP_VISION_PATH env -> cache
dir -> lazy HF download (gated like every other lazy weight).  Both HF
(`vision_model.*`) and open_clip (`visual.*`) key formats load.
"""
from __future__ import annotations

import logging
import os
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

CLIP_VISION_REPO = "laion/CLIP-ViT-H-14-laion2B-s32B-b79K"
CLIP_VISION_FILE = "open_clip_pytorch_model.bin"

_TOWER_CACHE: dict = {}
_TOWER_LOCK = threading.Lock()


def clip_vision_weights_path(explicit: Optional[str] = None) -> str:
    if explicit:
        return explicit
    p = os.environ.get("FACEID_CLIP_VISION_PATH", "")
    if p:
        return p
    cache = os.environ.get(
        "CREMAGE_ANNOTATOR_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "cremage_tpu",
                     "annotators"))
    local = os.path.join(cache, CLIP_VISION_FILE)
    if os.path.exists(local):
        return local
    from cremage_tpu.io.downloader import download_model_if_not_exist

    return download_model_if_not_exist(local, CLIP_VISION_REPO,
                                       CLIP_VISION_FILE)


def load_clip_tower(path: str):
    """ViT-H/14 tower for the FaceID Plus conditioner -> (model, vars).

    Accepts HF CLIPVisionModel(WithProjection) checkpoints
    (vision_model.* keys) or open_clip ones (visual.* keys)."""
    import jax.numpy as jnp

    from cremage_tpu.io import checkpoint as CK
    from cremage_tpu.models.clip_vision import CLIPVisionModel, vit_h14_config

    with _TOWER_LOCK:
        if path in _TOWER_CACHE:
            return _TOWER_CACHE[path]
        sd = CK.load_state_dict(path)
        if any(k.startswith("vision_model.") for k in sd):
            vis_sd = CK.hf_clip_vision_subdict(sd)
        else:
            vis_sd = {}
            for k, v in sd.items():
                if k.startswith("visual."):
                    k2 = k[len("visual."):].replace("conv1.weight",
                                                    "conv1_weight")
                    vis_sd[k2] = np.asarray(v)
        cv = CLIPVisionModel(vit_h14_config(dtype=jnp.bfloat16))
        import jax

        tmpl = jax.eval_shape(
            lambda: cv.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3), jnp.bfloat16))
        )["params"]
        params, missing, _ = CK.build_flax_params(
            tmpl, vis_sd, prefix="", dtype=jnp.float32, strict=False)
        if missing:
            logger.warning("FaceID clip tower: %d missing params "
                           "(first 5: %s)", len(missing), missing[:5])
        _TOWER_CACHE[path] = (cv, {"params": params})
        return _TOWER_CACHE[path]


def clip_face_embeds(
    crop224_rgb01: np.ndarray,
    weights_path: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Aligned 224^2 face crop (RGB [0,1]) -> (clip_embeds,
    uncond_clip_embeds), each (257, 1280) float32."""
    import jax.numpy as jnp

    from cremage_tpu.models.clip_vision import CLIP_MEAN

    cv, cv_vars = load_clip_tower(clip_vision_weights_path(weights_path))
    crop = np.asarray(crop224_rgb01, np.float32)
    if crop.shape[:2] != (224, 224):
        import cv2

        crop = cv2.resize(crop, (224, 224), interpolation=cv2.INTER_CUBIC)
    # BGR for parity with the reference's cv2-array-into-CLIPProcessor
    # flow (ip_adapter_faceid.py:736)
    bgr = crop[..., ::-1]
    # uncond: zeros in normalized space == the channel-mean image
    mean_img = np.broadcast_to(CLIP_MEAN, (224, 224, 3))
    batch = jnp.asarray(np.stack([bgr, mean_img]), jnp.float32)
    from cremage_tpu.core.jitcache import jit_fn

    fwd = jit_fn(cv, lambda: (lambda v, b: cv.apply(
        v, b, penultimate=True)), "faceid_plus_vision")
    embeds = np.asarray(fwd(cv_vars, batch), np.float32)
    return embeds[0], embeds[1]
