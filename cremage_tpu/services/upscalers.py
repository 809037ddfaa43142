"""Image upscalers.

Behavior contract (reference item 35): `tools/image_scaler.py`
(RealESRGAN background + GFPGAN face restore, scale 2/4) and the hires-
fix internal upscalers "Latent" (F.interpolate) / "Lanczos"
(`utils/hires_fix_upscaler_utils.py:8-12`).

Implementations:
- "Lanczos": PIL high-quality resampling (exact parity);
- "Latent": latent-space nearest resize (lives in pipelines, jax.image);
- "RealESRGAN": the RRDBNet x4 architecture in Flax with the standard
  weight layout — weight-gated; without weights `esrgan_upscale` raises
  and `smart_upscale` falls back to Lanczos;
- GFPGAN face restore: follows as a FaceFixer application (the reference
  chains GFPGAN after RealESRGAN; our face-fix service covers the face
  pass).
"""
from __future__ import annotations

import logging
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from cremage_tpu.core.registry import UPSCALERS

logger = logging.getLogger(__name__)


@UPSCALERS.register("Lanczos")
def lanczos_upscale(image01: np.ndarray, scale: float) -> np.ndarray:
    img = Image.fromarray((np.clip(image01, 0, 1) * 255).astype(np.uint8))
    w, h = img.size
    img = img.resize((int(w * scale), int(h * scale)), Image.LANCZOS)
    return np.asarray(img, np.float32) / 255.0


# ---------------- RealESRGAN (RRDBNet) --------------------------------------

class _RDB(nn.Module):
    """Residual dense block (5 convs, growth 32)."""

    nf: int = 64
    gc: int = 32

    @nn.compact
    def __call__(self, x):
        from cremage_tpu.models.layers import Conv

        def conv(name, feats, inp):
            return Conv(feats, name=name, dtype=jnp.float32,
                        param_dtype=jnp.float32)(inp)

        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        x1 = lrelu(conv("conv1", self.gc, x))
        x2 = lrelu(conv("conv2", self.gc, jnp.concatenate([x, x1], -1)))
        x3 = lrelu(conv("conv3", self.gc, jnp.concatenate([x, x1, x2], -1)))
        x4 = lrelu(conv("conv4", self.gc, jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = conv("conv5", self.nf, jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x + 0.2 * x5


class _RRDB(nn.Module):
    nf: int = 64

    @nn.compact
    def __call__(self, x):
        h = _RDB(self.nf, name="rdb1")(x)
        h = _RDB(self.nf, name="rdb2")(h)
        h = _RDB(self.nf, name="rdb3")(h)
        return x + 0.2 * h


class RRDBNet(nn.Module):
    """RealESRGAN x4 generator (23 RRDB blocks)."""

    nf: int = 64
    nb: int = 23

    @nn.compact
    def __call__(self, x):
        from cremage_tpu.models.layers import Conv

        dd = dict(dtype=jnp.float32, param_dtype=jnp.float32)
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        fea = Conv(self.nf, name="conv_first", **dd)(x)
        h = fea
        for i in range(self.nb):
            h = _RRDB(self.nf, name=f"body_{i}")(h)
        h = Conv(self.nf, name="conv_body", **dd)(h)
        fea = fea + h
        # 2x nearest upsample twice
        for name in ("conv_up1", "conv_up2"):
            fea = jnp.repeat(jnp.repeat(fea, 2, 1), 2, 2)
            fea = lrelu(Conv(self.nf, name=name, **dd)(fea))
        fea = lrelu(Conv(self.nf, name="conv_hr", **dd)(fea))
        return Conv(3, name="conv_last", **dd)(fea)


_esrgan_cache = {}


def esrgan_upscale(image01: np.ndarray, weights_path: str,
                   scale: float = 4.0) -> np.ndarray:
    """RealESRGAN x4 + optional downscale to the requested factor."""
    import os

    if not weights_path or not os.path.exists(weights_path):
        raise FileNotFoundError(
            f"RealESRGAN weights not found at {weights_path!r} (runtime "
            f"download in the reference as well)"
        )
    if weights_path not in _esrgan_cache:
        from cremage_tpu.io.checkpoint import build_flax_params, load_state_dict

        sd = load_state_dict(weights_path)
        if "params_ema" in sd:
            sd = sd["params_ema"]
        model = RRDBNet()
        tmpl = jax.eval_shape(model.init, jax.random.key(0),
                              jnp.zeros((1, 32, 32, 3)))["params"]
        # RealESRGAN keys: body.N.rdbM.convK -> ours body_N.rdbM.convK
        sd = {k.replace("body.", "body_", 1) if k.startswith("body.") else k: v
              for k, v in sd.items()}
        params, _, _ = build_flax_params(tmpl, sd, prefix="", strict=False)
        _esrgan_cache[weights_path] = (model, {"params": params})
    model, params = _esrgan_cache[weights_path]
    from cremage_tpu.core.jitcache import jit_apply

    x = jnp.asarray(image01, jnp.float32)[None]
    out = np.asarray(jit_apply(model)(params, x), np.float32)[0]
    out = np.clip(out, 0, 1)
    if scale != 4.0:
        out = lanczos_upscale(out, scale / 4.0)
    return out


UPSCALERS.register("RealESRGAN", esrgan_upscale)


def smart_upscale(image01: np.ndarray, scale: float,
                  esrgan_weights: Optional[str] = None) -> np.ndarray:
    """ESRGAN when weights are available, Lanczos otherwise
    (tools/image_scaler.py behavior envelope)."""
    if esrgan_weights:
        try:
            return esrgan_upscale(image01, esrgan_weights, scale)
        except FileNotFoundError:
            logger.warning("ESRGAN weights missing; falling back to Lanczos")
    return lanczos_upscale(image01, scale)


_GFP_CACHE: dict = {}


def gfp_restore(image01: np.ndarray, weights_path: str | None = None,
                scale: float = 1.0, cfg=None,
                yunet_path: str | None = None) -> np.ndarray:
    """GFPGAN face restoration (+ optional background upscale) — the
    reference's gfp_wrapper (tools/gfpgan_wrapper.py:78): restore the
    detected faces with GFPGANv1Clean, upscale the rest."""
    import os

    weights_path = weights_path or os.environ.get("GFPGAN_MODEL_PATH", "")
    if not weights_path or not os.path.exists(weights_path):
        raise FileNotFoundError(
            "GFPGAN weights unavailable; set GFPGAN_MODEL_PATH "
            "(GFPGANv1.{2,3,4}.pth — a runtime download in the reference)")
    if weights_path not in _GFP_CACHE:
        from cremage_tpu.models.gfpgan import load_gfp_restorer

        _GFP_CACHE[weights_path] = load_gfp_restorer(
            weights_path, cfg, yunet_path=yunet_path)
    out = _GFP_CACHE[weights_path](np.asarray(image01, np.float32))
    if scale != 1.0:
        out = lanczos_upscale(out, scale)
    return out


UPSCALERS.register("GFPGAN", gfp_restore)
