"""FILM frame-interpolation network (Flax) — full pyramid architecture.

Behavior contract: reference `modules/frame_interpolation_pytorch/`
(Google FILM torch port, interpolator.py:87):
- feature extraction (feature_extractor.py): one shared SubTree
  extractor (sub_levels conv pairs, channel-doubling, avg-pool between
  levels) run on every image-pyramid level; cascaded features at level
  i concatenate S_{i-j}_{j} for j < sub_levels;
- flow (pyramid_flow_estimator.py): coarse-to-fine bidirectional
  residual flow; one shared FlowEstimator for coarse levels >=
  len(specialized), specialized ones for the finest levels; each
  estimator is num_convs 3x3 LeakyReLU(0.2) convs + filters//2 1x1 +
  2-channel 1x1 (no activation); flow upsampled x2 (bilinear,
  align_corners=False) and doubled between levels; features warped by
  the running flow before the residual prediction;
- fusion (fusion.py): U-Net decoder over the aligned pyramid
  (cat(warped image+features both sides, both flows)), nearest-resize
  + 2x2 conv (pad (0,1,0,1)), concat skip, two 3x3 convs; channel
  widths double per level up to specialized_levels; 1x1 RGB head.

Module names flatten to the torch export's state-dict keys
(extract.extract_sublevels.convs.i.{0,1}.0, predict_flow._predictor /
_predictors.k._convs.i.0, fuse.convs.k.{0,1,2}.0, fuse.output_conv).
Plugs into film.interpolate_recursively(pair_fn=...).
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.dpt import PlainConv


@dataclasses.dataclass(frozen=True)
class FilmConfig:
    pyramid_levels: int = 7
    fusion_pyramid_levels: int = 5
    specialized_levels: int = 3
    sub_levels: int = 4
    filters: int = 64
    flow_convs: Tuple[int, ...] = (3, 3, 3, 3)
    flow_filters: Tuple[int, ...] = (32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32


def film_net_config(**kw) -> FilmConfig:
    return FilmConfig(**kw)


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.2)


class FilmConv(nn.Module):
    """util.py Conv2d: odd k -> same padding; k=2 -> pad (0,1,0,1);
    LeakyReLU(0.2) unless activation is None. Key <name>.0.{weight,bias}."""

    features: int
    size: int = 3
    act: bool = True
    cfg: FilmConfig = None

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)
        if self.size % 2 == 0:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = 0
        else:
            pad = self.size // 2
        y = PlainConv(self.features, self.size, 1, pad, name="0", **dd)(x)
        return _leaky(y) if self.act else y


def avg_pool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def resize_bilinear(x, hw):
    return jax.image.resize(
        x.astype(jnp.float32), (x.shape[0], hw[0], hw[1], x.shape[-1]),
        method="bilinear").astype(x.dtype)


def resize_nearest(x, hw):
    return jax.image.resize(
        x, (x.shape[0], hw[0], hw[1], x.shape[-1]), method="nearest")


def warp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward warp: out[b,y,x] = bilinear(image, y+flow[...,1],
    x+flow[...,0]) with border clamping (util.py warp semantics)."""
    b, h, w, c = image.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ys = jnp.clip(gy[None] + flow[..., 1], 0.0, h - 1.0)
    xs = jnp.clip(gx[None] + flow[..., 0], 0.0, w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    def gather(yy, xx):
        idx = yy * w + xx
        flat = image.reshape(b, h * w, c)
        return jnp.take_along_axis(flat, idx.reshape(b, -1, 1), axis=1
                                   ).reshape(b, h, w, c)

    top = gather(y0, x0) * (1 - wx) + gather(y0, x1) * wx
    bot = gather(y1, x0) * (1 - wx) + gather(y1, x1) * wx
    return top * (1 - wy) + bot * wy


class SubTreeExtractor(nn.Module):
    cfg: FilmConfig

    @nn.compact
    def __call__(self, image, n: int) -> List[jnp.ndarray]:
        cfg = self.cfg
        head = image
        pyramid = []
        in_ch = image.shape[-1]
        for i in range(cfg.sub_levels):
            if i >= n:
                # instantiate the remaining (shared) convs with their
                # true input widths so every call sees one param census
                z = jnp.zeros((1, 2, 2, in_ch), image.dtype)
                z = FilmConv(cfg.filters << i, 3, cfg=cfg,
                             name=f"convs_{i}_0")(z)
                _ = FilmConv(cfg.filters << i, 3, cfg=cfg,
                             name=f"convs_{i}_1")(z)
                in_ch = cfg.filters << i
                continue
            head = FilmConv(cfg.filters << i, 3, cfg=cfg,
                            name=f"convs_{i}_0")(head)
            head = FilmConv(cfg.filters << i, 3, cfg=cfg,
                            name=f"convs_{i}_1")(head)
            in_ch = cfg.filters << i
            pyramid.append(head)
            if i < n - 1:
                head = avg_pool2(head)
        return pyramid


class FlowEstimator(nn.Module):
    num_convs: int
    num_filters: int
    cfg: FilmConfig

    @nn.compact
    def __call__(self, a, b):
        net = jnp.concatenate([a, b], axis=-1)
        for i in range(self.num_convs):
            net = FilmConv(self.num_filters, 3, cfg=self.cfg,
                           name=f"_convs_{i}")(net)
        net = FilmConv(self.num_filters // 2, 1, cfg=self.cfg,
                       name=f"_convs_{self.num_convs}")(net)
        return FilmConv(2, 1, act=False, cfg=self.cfg,
                        name=f"_convs_{self.num_convs + 1}")(net)


class FilmNet(nn.Module):
    """(x0, x1 (B,H,W,3) [0,1], t) -> interpolated (B,H,W,3).

    H, W must be divisible by 2**(pyramid_levels-1) (the reference pads
    inputs to x64, util.py pad_batch)."""

    cfg: FilmConfig

    def setup(self):
        cfg = self.cfg
        self.extract = SubTreeExtractor(cfg, name="extract_extract_sublevels")
        n = len(cfg.flow_convs)
        # torch: _predictor = predictors[-1]; _predictors = first n-1
        # reversed (finest last in build order -> index 0 = level n-2)
        self.shared_predictor = FlowEstimator(
            cfg.flow_convs[-1], cfg.flow_filters[-1], cfg,
            name="predict_flow__predictor")
        self.level_predictors = [
            FlowEstimator(cfg.flow_convs[n - 2 - k],
                          cfg.flow_filters[n - 2 - k], cfg,
                          name=f"predict_flow__predictors_{k}")
            for k in range(n - 1)]
        # fusion convs: built coarse-to-fine (k=0 is the coarsest
        # processed level i = n_layers-1-k)
        spec = cfg.specialized_levels
        self.fuse_convs = [
            (FilmConv((cfg.filters << min(i, spec)), 2, act=False, cfg=cfg,
                      name=f"fuse_convs_{k}_0"),
             FilmConv((cfg.filters << min(i, spec)), 3, cfg=cfg,
                      name=f"fuse_convs_{k}_1"),
             FilmConv((cfg.filters << min(i, spec)), 3, cfg=cfg,
                      name=f"fuse_convs_{k}_2"))
            for k, i in enumerate(reversed(range(cfg.sub_levels)))]
        self.output_conv = PlainConv(3, 1, 1, 0, name="fuse_output_conv",
                                     dtype=cfg.dtype,
                                     param_dtype=cfg.param_dtype)

    def feature_pyramid(self, image_pyramid):
        cfg = self.cfg
        levels = len(image_pyramid)
        subs = [self.extract(image_pyramid[i], min(levels - i,
                                                   cfg.sub_levels))
                for i in range(levels)]
        feats = []
        for i in range(levels):
            f = subs[i][0]
            for j in range(1, cfg.sub_levels):
                if j <= i:
                    f = jnp.concatenate([f, subs[i - j][j]], axis=-1)
            feats.append(f)
        return feats

    def residual_flows(self, fa, fb):
        levels = len(fa)
        n_spec = len(self.level_predictors)
        v = self.shared_predictor(fa[-1], fb[-1])
        residuals = [v]
        for i in range(levels - 2, n_spec - 1, -1):
            v = 2.0 * resize_bilinear(v, fa[i].shape[1:3])
            vr = self.shared_predictor(fa[i], warp(fb[i], v))
            residuals.insert(0, vr)
            v = vr + v
        for k, pred in enumerate(self.level_predictors):
            i = n_spec - 1 - k
            v = 2.0 * resize_bilinear(v, fa[i].shape[1:3])
            vr = pred(fa[i], warp(fb[i], v))
            residuals.insert(0, vr)
            v = vr + v
        return residuals

    def __call__(self, x0, x1, t=0.5):
        cfg = self.cfg
        x0 = x0.astype(cfg.dtype)
        x1 = x1.astype(cfg.dtype)

        def pyramid(img):
            p = [img]
            for _ in range(cfg.pyramid_levels - 1):
                p.append(avg_pool2(p[-1]))
            return p

        p0, p1 = pyramid(x0), pyramid(x1)
        f0, f1 = self.feature_pyramid(p0), self.feature_pyramid(p1)

        def synth(residuals):
            flow = residuals[-1]
            flows = [flow]
            for r in residuals[:-1][::-1]:
                flow = r + 2.0 * resize_bilinear(flow, r.shape[1:3])
                flows.insert(0, flow)
            return flows[: cfg.fusion_pyramid_levels]

        fwd = synth(self.residual_flows(f0, f1))
        bwd = synth(self.residual_flows(f1, f0))
        t = jnp.asarray(t, jnp.float32)
        bwd = [f * t for f in bwd]
        fwd = [f * (1.0 - t) for f in fwd]

        k = cfg.fusion_pyramid_levels
        to_warp0 = [jnp.concatenate([p0[i], f0[i]], -1) for i in range(k)]
        to_warp1 = [jnp.concatenate([p1[i], f1[i]], -1) for i in range(k)]
        fwd_warped = [warp(to_warp0[i], bwd[i]) for i in range(k)]
        bwd_warped = [warp(to_warp1[i], fwd[i]) for i in range(k)]
        aligned = [jnp.concatenate(
            [fwd_warped[i], bwd_warped[i], bwd[i], fwd[i]], -1)
            for i in range(k)]

        net = aligned[-1]
        for kk, (c0, c1, c2) in enumerate(self.fuse_convs):
            i = len(self.fuse_convs) - 1 - kk
            net = resize_nearest(net, aligned[i].shape[1:3])
            net = c0(net)
            net = jnp.concatenate([aligned[i], net], axis=-1)
            net = c2(c1(net))
        return self.output_conv(net)


class FilmPairInterpolator:
    """pair_fn adapter for services.film.interpolate_recursively."""

    def __init__(self, params, cfg: FilmConfig = FilmConfig()):
        model = FilmNet(cfg)
        self.cfg = cfg
        self._apply = jax.jit(
            lambda p, a, b, t: model.apply({"params": p}, a, b, t))
        self.params = params

    def __call__(self, f0: np.ndarray, f1: np.ndarray,
                 t: float = 0.5) -> np.ndarray:
        align = 2 ** (self.cfg.pyramid_levels - 1)
        h, w = f0.shape[:2]
        ph, pw = (-h) % align, (-w) % align
        a = np.pad(f0, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        b = np.pad(f1, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        out = np.asarray(self._apply(
            self.params, jnp.asarray(a[None], jnp.float32),
            jnp.asarray(b[None], jnp.float32), float(t)), np.float32)[0]
        return np.clip(out[:h, :w], 0.0, 1.0)


def load_film_interpolator(weights_path: str,
                           cfg: Optional[FilmConfig] = None
                           ) -> FilmPairInterpolator:
    """torch film_net export (.pt with the interpolator state dict, or
    a {'model': state_dict} container) -> pair interpolator."""
    from cremage_tpu.io import checkpoint as CK

    cfg = cfg or FilmConfig()
    sd = CK.load_state_dict(weights_path)
    if "model" in sd and not any("." in k for k in sd):
        sd = sd["model"]
    model = FilmNet(cfg)
    tmpl = jax.eval_shape(
        model.init, jax.random.key(0),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)), 0.5)["params"]
    params, missing, _ = CK.build_flax_params(tmpl, sd, prefix="",
                                              strict=False)
    if missing:
        raise KeyError(f"film ckpt missing {missing[:5]} ...")
    return FilmPairInterpolator(params, cfg)
