"""Denoiser wrappers: model output parameterization + CFG.

A *denoiser* here is a pure function `denoise(x, sigma) -> denoised` (the
k-diffusion convention; sigma is a scalar or per-batch vector). Model
families differ in what the network predicts:

- eps (SD1.5/SDXL-base): denoised = x - sigma * eps(x * c_in, t)
  with c_in = 1/sqrt(sigma^2 + sigma_data^2)
  (semantics of k_diffusion/external.py DiscreteEpsDDPMDenoiser:86-115).
- v   (SD2.x-style):      denoised = c_skip * x + c_out * v(x * c_in, t)
  (external.py DiscreteVDDPMDenoiser:155-180).

CFG is applied at the denoiser level by doubling the batch [uc, c] and
combining e_uc + scale * (e_c - e_uc) — same math as the reference's
`LDMWrapperForKDiffusion.apply_model`
(modules/ldm/models/diffusion/ldm_wrapper_for_k_diffusion.py:50-100),
but expressed as a single batched model call so XLA sees one big matmul
workload (2B batch) instead of two sequential ones.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from cremage_tpu.samplers.schedules import DiscreteSchedule


def _append_dims(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def _bcast_sigma(sigma, batch: int) -> jnp.ndarray:
    sigma = jnp.asarray(sigma, dtype=jnp.float32)
    if sigma.ndim == 0:
        sigma = jnp.broadcast_to(sigma, (batch,))
    return sigma


def sigma_to_t_jax(schedule: DiscreteSchedule, sigma: jnp.ndarray) -> jnp.ndarray:
    """Traced version of DiscreteSchedule.sigma_to_t (no quantize):
    fractional timestep by interpolation in log-sigma space."""
    log_sigmas = jnp.asarray(schedule.log_sigmas, dtype=jnp.float32)
    log_sigma = jnp.log(sigma)
    dists = log_sigma[None, :] - log_sigmas[:, None]
    low_idx = jnp.clip(
        jnp.argmax(jnp.cumsum((dists >= 0).astype(jnp.int32), axis=0), axis=0),
        0,
        log_sigmas.shape[0] - 2,
    )
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = jnp.clip((low - log_sigma) / (low - high), 0, 1)
    return (1 - w) * low_idx + w * high_idx


class EpsDenoiser:
    """Wrap an eps-prediction model into denoise(x, sigma, cond)."""

    def __init__(
        self,
        eps_model: Callable[..., jnp.ndarray],
        schedule: DiscreteSchedule,
        sigma_data: float = 1.0,
        quantize: bool = False,
    ):
        self.eps_model = eps_model
        self.schedule = schedule
        self.sigma_data = sigma_data
        self.quantize = quantize

    def _t(self, sigma: jnp.ndarray) -> jnp.ndarray:
        if self.quantize:
            log_sigmas = jnp.asarray(self.schedule.log_sigmas, dtype=jnp.float32)
            return jnp.argmin(
                jnp.abs(jnp.log(sigma)[None, :] - log_sigmas[:, None]), axis=0
            ).astype(jnp.float32)
        return sigma_to_t_jax(self.schedule, sigma)

    def __call__(self, x, sigma, cond: Any = None, **model_kwargs):
        sigma = _bcast_sigma(sigma, x.shape[0])
        c_in = 1.0 / jnp.sqrt(sigma**2 + self.sigma_data**2)
        t = self._t(sigma)
        eps = self.eps_model(x * _append_dims(c_in, x.ndim), t, cond, **model_kwargs)
        # A model may return (eps, aux) — e.g. the UNet's deep-cache
        # "capture" mode (samplers/deepcache.py); aux rides along.
        aux = None
        if isinstance(eps, tuple):
            eps, aux = eps
        eps = eps.astype(jnp.float32)
        den = x - eps * _append_dims(sigma, x.ndim)
        return den if aux is None else (den, aux)


class VDenoiser:
    """Wrap a v-prediction model into denoise(x, sigma, cond)."""

    def __init__(
        self,
        v_model: Callable[..., jnp.ndarray],
        schedule: DiscreteSchedule,
        sigma_data: float = 1.0,
    ):
        self.v_model = v_model
        self.schedule = schedule
        self.sigma_data = sigma_data

    def __call__(self, x, sigma, cond: Any = None, **model_kwargs):
        sigma = _bcast_sigma(sigma, x.shape[0])
        sd2 = self.sigma_data**2
        c_skip = sd2 / (sigma**2 + sd2)
        c_out = -sigma * self.sigma_data / jnp.sqrt(sigma**2 + sd2)
        c_in = 1.0 / jnp.sqrt(sigma**2 + sd2)
        t = sigma_to_t_jax(self.schedule, sigma)
        v = self.v_model(x * _append_dims(c_in, x.ndim), t, cond, **model_kwargs)
        # (v, aux) return — deep-cache capture mode; aux rides along.
        aux = None
        if isinstance(v, tuple):
            v, aux = v
        v = v.astype(jnp.float32)
        den = _append_dims(c_skip, x.ndim) * x + _append_dims(c_out, x.ndim) * v
        return den if aux is None else (den, aux)


def cfg_interval_of(opts) -> Optional[Tuple[float, float]]:
    """Read the guidance-interval knob off a GenerationOptions: active
    (returns (lo, hi)) only when cfg_interval_high > cfg_interval_low."""
    lo = float(getattr(opts, "cfg_interval_low", 0.0))
    hi = float(getattr(opts, "cfg_interval_high", 0.0))
    if hi <= lo:
        return None
    if lo < 0:
        raise ValueError(f"cfg_interval_low must be >= 0, got {lo}")
    return (lo, hi)


def cfg_denoiser(
    denoise: Callable,
    cond: Any,
    uncond: Any,
    scale: float,
    interval: Optional[Tuple[float, float]] = None,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Close a conditional denoiser over (cond, uncond, scale).

    Returns `denoise(x, sigma) -> denoised`. Batches [uncond; cond] in one
    model call (uncond first — reference ordering, ldm_wrapper:72-99).

    `interval=(lo, hi)` restricts guidance to noise levels lo <= sigma <= hi
    (Kynkäänniemi et al. 2024, "Applying Guidance in a Limited Interval").
    Outside the interval the wrapper runs the *conditional model alone* on
    the single batch — a `lax.cond` picks per step, so the uncond half of
    the work is genuinely skipped, not masked. This per-call wrapper
    excludes aux-returning deep-cache modes (the capture aux would change
    batch shape across the cond branches); pipelines compose the two
    features through `deepcache.make_dc_denoise_windowed` instead.
    """
    if uncond is None or scale == 1.0:
        def fn_nocfg(x, sigma, **kw):
            return denoise(x, sigma, cond, **kw)
        return fn_nocfg

    def _cat(u, c):
        if u is None:
            return None
        if isinstance(u, dict):
            return {k: _cat(u[k], c[k]) for k in c}
        if isinstance(u, (list, tuple)):
            return type(u)(_cat(ui, ci) for ui, ci in zip(u, c))
        return jnp.concatenate([u, c], axis=0)

    cond_in = _cat(uncond, cond)

    def fn(x, sigma, **kw):
        b = x.shape[0]
        sigma = _bcast_sigma(sigma, b)

        def with_cfg(xx):
            x_in = jnp.concatenate([xx, xx], axis=0)
            sigma_in = jnp.concatenate([sigma, sigma], axis=0)
            d = denoise(x_in, sigma_in, cond_in, **kw)
            # aux (e.g. a deep-cache capture tensor) stays at the doubled
            # [uncond; cond] batch — it is fed back to the model unsplit.
            aux = None
            if isinstance(d, tuple):
                d, aux = d
            d_u, d_c = d[:b], d[b:]
            out = d_u + scale * (d_c - d_u)
            return out if aux is None else (out, aux)

        if interval is None:
            return with_cfg(x)

        def cond_only(xx):
            d = denoise(xx, sigma, cond, **kw)
            if isinstance(d, tuple):
                raise ValueError(
                    "cfg interval does not compose with aux-returning "
                    "model modes (deep_cache)")
            return d

        lo, hi = float(interval[0]), float(interval[1])
        s = jnp.max(sigma)
        pred = jnp.logical_and(s >= lo, s <= hi)
        return jax.lax.cond(pred, with_cfg, cond_only, x)

    return fn


def as_float32(denoise: Callable) -> Callable:
    """Ensure sampler-visible state is fp32 regardless of model dtype."""

    def fn(x, sigma, *a, **kw):
        return denoise(x, sigma, *a, **kw).astype(jnp.float32)

    return fn
