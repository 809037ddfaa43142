"""FILM interpolation network (Flax) — learned replacement for the
optical-flow default in services/film.py.

Architecture family: Google FILM as ported by the reference
(`modules/frame_interpolation_pytorch/interpolator.py`): shared
multi-scale feature pyramid, coarse-to-fine bidirectional residual flow
estimation, warped-feature fusion decoder. This implementation keeps the
same stage structure at reduced width; the torch-weights conversion for
the reference's film_net checkpoint is tracked in COVERAGE.md, and the
net plugs into `film.interpolate_recursively(pair_fn=...)` unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FilmConfig:
    levels: int = 4
    base: int = 16


def _warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp img (B,H,W,C) by flow (B,H,W,2) with bilinear
    sampling (map_coordinates order=1)."""
    b, h, w, c = img.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")

    def warp_one(im, fl):
        ys = gy + fl[..., 1]
        xs = gx + fl[..., 0]
        coords = jnp.stack([ys.ravel(), xs.ravel()])

        def chan(cimg):
            return jax.scipy.ndimage.map_coordinates(
                cimg, coords, order=1, mode="nearest").reshape(h, w)

        return jnp.stack([chan(im[..., i]) for i in range(im.shape[-1])], -1)

    return jax.vmap(warp_one)(img, flow)


class _ConvBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        from cremage_tpu.models.layers import Conv

        h = Conv(self.ch, dtype=jnp.float32, param_dtype=jnp.float32,
                 name="c1")(x)
        h = nn.leaky_relu(h, 0.2)
        h = Conv(self.ch, dtype=jnp.float32, param_dtype=jnp.float32,
                 name="c2")(h)
        return nn.leaky_relu(h, 0.2)


class FilmNet(nn.Module):
    cfg: FilmConfig = FilmConfig()

    @nn.compact
    def __call__(self, f0: jnp.ndarray, f1: jnp.ndarray,
                 t: float = 0.5) -> jnp.ndarray:
        """f0, f1: (B,H,W,3) in [0,1] -> mid frame (B,H,W,3)."""
        from cremage_tpu.models.layers import Conv

        cfg = self.cfg
        # shared feature extractor: one block set, applied to both frames
        blocks = [_ConvBlock(cfg.base * 2**lv, name=f"feat_{lv}")
                  for lv in range(cfg.levels)]

        def pyramid(x):
            feats = []
            h = x
            for lv, blk in enumerate(blocks):
                f = blk(h)
                feats.append(f)
                if lv < cfg.levels - 1:
                    h = nn.avg_pool(f, (2, 2), strides=(2, 2))
            return feats

        p0 = pyramid(f0)
        p1 = pyramid(f1)

        # coarse-to-fine bidirectional residual flow
        b = f0.shape[0]
        flow01 = flow10 = None
        for lv in reversed(range(cfg.levels)):
            a, c = p0[lv], p1[lv]
            hh, ww = a.shape[1:3]
            if flow01 is None:
                flow01 = jnp.zeros((b, hh, ww, 2))
                flow10 = jnp.zeros((b, hh, ww, 2))
            else:
                flow01 = 2.0 * jax.image.resize(flow01, (b, hh, ww, 2),
                                                "bilinear")
                flow10 = 2.0 * jax.image.resize(flow10, (b, hh, ww, 2),
                                                "bilinear")
            w1 = _warp(c, flow01)
            w0 = _warp(a, flow10)
            d01 = Conv(2, dtype=jnp.float32, param_dtype=jnp.float32,
                       name=f"flow01_{lv}")(
                _ConvBlock(cfg.base * 2**lv, name=f"flowfeat01_{lv}")(
                    jnp.concatenate([a, w1, flow01], -1)))
            d10 = Conv(2, dtype=jnp.float32, param_dtype=jnp.float32,
                       name=f"flow10_{lv}")(
                _ConvBlock(cfg.base * 2**lv, name=f"flowfeat10_{lv}")(
                    jnp.concatenate([c, w0, flow10], -1)))
            flow01 = flow01 + d01
            flow10 = flow10 + d10

        # time-scaled warps of the full-res frames + level-0 features
        ft0 = _warp(jnp.concatenate([f0, p0[0]], -1), flow10 * (1 - t))
        ft1 = _warp(jnp.concatenate([f1, p1[0]], -1), flow01 * t)

        fused = _ConvBlock(cfg.base * 2, name="fuse1")(
            jnp.concatenate([ft0, ft1, flow01, flow10], -1))
        out = Conv(3, dtype=jnp.float32, param_dtype=jnp.float32,
                   name="out")(fused)
        blend = (1 - t) * ft0[..., :3] + t * ft1[..., :3]
        return jnp.clip(blend + out, 0.0, 1.0)


_film_cache = {}


def film_pair_fn(weights_path: str):
    """pair_fn for services.film.interpolate_recursively backed by the
    learned net (weights converted from the reference's film_net)."""
    import os

    if not os.path.exists(weights_path):
        raise FileNotFoundError(weights_path)
    if weights_path not in _film_cache:
        from cremage_tpu.io.checkpoint import build_flax_params, load_state_dict

        net = FilmNet()
        tmpl = jax.eval_shape(
            net.init, jax.random.key(0),
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
        )["params"]
        sd = load_state_dict(weights_path)
        params, _, _ = build_flax_params(tmpl, sd, prefix="", strict=False)
        _film_cache[weights_path] = (net, {"params": params})
    net, params = _film_cache[weights_path]

    def pair(a: np.ndarray, bb: np.ndarray, t: float = 0.5) -> np.ndarray:
        out = net.apply(params, jnp.asarray(a[None], jnp.float32),
                        jnp.asarray(bb[None], jnp.float32), t)
        return np.asarray(out[0], np.float32)

    return pair
