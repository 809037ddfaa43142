"""CompVis Stable Diffusion safety checker (Flax).

Behavior contract: reference `modules/safety/safety_filter.py:19-151`
— diffusers StableDiffusionSafetyChecker
(CompVis/stable-diffusion-safety-checker): an HF CLIP ViT-L/14 vision
tower + visual projection, then cosine similarity of the projected
image embedding against 17 concept embeddings and 3 special-care
embeddings with per-concept thresholds; any special-care hit adds a
+0.01 adjustment to the concept scores.  Flagged images are replaced
by the caller (Cremage uses a black placeholder with a message,
`load_replacement` / `sd/image_generator.py:508`).

Checkpoint keys (HF): vision_model.vision_model.embeddings.*,
vision_model.vision_model.encoder.layers.N.*, visual_projection.weight,
concept_embeds(_weights), special_care_embeds(_weights).  Transformer
blocks reuse models/clip.py CLIPLayer (same HF CLIP layer layout).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.clip import CLIPLayer, CLIPTextConfig
from cremage_tpu.models.layers import Dense, LayerNorm

# HF CLIPFeatureExtractor normalization
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class SafetyCheckerConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    n_concepts: int = 17
    n_special: int = 3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32


class HFCLIPVisionTower(nn.Module):
    """HF CLIPVisionModel (vision_model.* keys) -> pooled CLS state."""

    cfg: SafetyCheckerConfig
    name_prefix: str = "vision_model_"

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        P = self.name_prefix
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        kernel = self.param(
            P + "embeddings_patch_embedding_weight",
            nn.initializers.lecun_normal(),
            (cfg.patch_size, cfg.patch_size, 3, cfg.hidden_size),
            cfg.param_dtype)
        x = lax.conv_general_dilated(
            pixel_values.astype(cfg.dtype), kernel.astype(cfg.dtype),
            window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(cfg.dtype)
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, cfg.hidden_size)
        cls = self.param(P + "embeddings_class_embedding",
                         nn.initializers.normal(0.02),
                         (cfg.hidden_size,), cfg.param_dtype)
        pos = self.param(P + "embeddings_position_embedding_weight",
                         nn.initializers.normal(0.02),
                         (gh * gw + 1, cfg.hidden_size), cfg.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype), (b, 1, cfg.hidden_size)),
             x], axis=1)
        x = x + pos.astype(cfg.dtype)
        # HF's (sic) "pre_layrnorm"
        x = LayerNorm(name=P + "pre_layrnorm")(x)
        lcfg = CLIPTextConfig(
            hidden_size=cfg.hidden_size, num_layers=cfg.num_layers,
            num_heads=cfg.num_heads, intermediate_size=cfg.intermediate_size,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        for i in range(cfg.num_layers):
            x = CLIPLayer(lcfg, name=P + f"encoder_layers_{i}")(x, None)
        pooled = x[:, 0]
        return LayerNorm(name=P + "post_layernorm")(pooled)


class StableDiffusionSafetyChecker(nn.Module):
    """pixel_values (B, 224, 224, 3) pre-normalized -> (concept_scores
    (B, 17), special_scores (B, 3)); a score > 0 is a hit."""

    cfg: SafetyCheckerConfig

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.cfg
        pooled = HFCLIPVisionTower(cfg, name="vision_model")(pixel_values)
        emb = Dense(cfg.projection_dim, use_bias=False,
                    name="visual_projection", dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype)(pooled)
        concepts = self.param("concept_embeds", nn.initializers.normal(1.0),
                              (cfg.n_concepts, cfg.projection_dim),
                              cfg.param_dtype)
        special = self.param("special_care_embeds",
                             nn.initializers.normal(1.0),
                             (cfg.n_special, cfg.projection_dim),
                             cfg.param_dtype)
        c_thresh = self.param("concept_embeds_weights",
                              nn.initializers.ones, (cfg.n_concepts,),
                              cfg.param_dtype)
        s_thresh = self.param("special_care_embeds_weights",
                              nn.initializers.ones, (cfg.n_special,),
                              cfg.param_dtype)

        def cos(a, b):
            a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
            b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
            return a @ b.T

        embf = emb.astype(jnp.float32)
        special_cos = cos(embf, special.astype(jnp.float32))
        concept_cos = cos(embf, concepts.astype(jnp.float32))
        # diffusers: adjustment 0.0; any special hit -> +0.01 on concepts
        special_scores = special_cos - s_thresh[None, :]
        special_hit = (special_scores > 0).any(axis=-1, keepdims=True)
        adjustment = jnp.where(special_hit, 0.01, 0.0)
        concept_scores = concept_cos - c_thresh[None, :] + adjustment
        return concept_scores, special_scores


def preprocess_images01(images01: np.ndarray,
                        size: int = 224) -> np.ndarray:
    """HF CLIPFeatureExtractor: shortest-edge bicubic resize to 224,
    center crop, normalize."""
    import cv2

    if images01.ndim == 3:
        images01 = images01[None]
    out = []
    for img in images01:
        h, w = img.shape[:2]
        scale = size / min(h, w)
        nh, nw = round(h * scale), round(w * scale)
        r = cv2.resize(img.astype(np.float32), (nw, nh),
                       interpolation=cv2.INTER_CUBIC)
        top = (nh - size) // 2
        left = (nw - size) // 2
        r = r[top:top + size, left:left + size]
        out.append((r - CLIP_MEAN) / CLIP_STD)
    return np.stack(out)


def load_safety_classifier(weights_path: str, cfg=None):
    """-> classifier(images01 (B,H,W,3)) -> (B,) scores in {0,1} for
    services.safety.ImageSafetyChecker (threshold 0.5)."""
    from cremage_tpu.io import checkpoint as CK

    cfg = cfg or SafetyCheckerConfig()
    model = StableDiffusionSafetyChecker(cfg)
    sd = CK.load_state_dict(weights_path)
    # concept tables are (N, proj) non-square 2D; names must not hit the
    # square-transpose path — shapes differ so mechanical load is safe
    tmpl = jax.eval_shape(
        model.init, jax.random.key(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))["params"]
    params, missing, _ = CK.build_flax_params(tmpl, sd, prefix="",
                                              strict=False)
    if missing:
        raise KeyError(f"safety ckpt missing {missing[:5]} ...")
    apply = jax.jit(lambda p, x: model.apply({"params": p}, x))

    def classifier(images01: np.ndarray) -> np.ndarray:
        x = preprocess_images01(np.asarray(images01), size=cfg.image_size)
        concept_scores, _ = apply(params, jnp.asarray(x))
        return (np.asarray(concept_scores) > 0).any(-1).astype(np.float32)

    return classifier
