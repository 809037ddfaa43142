"""Rectified-flow (flow matching) sampling for SD3 / FLUX.

x_sigma = (1 - sigma) * x0 + sigma * noise; the model predicts velocity
v = noise - x0; Euler integration x += (sigma_next - sigma) * v.

Schedules:
- SD3: sigmas = shifted linspace with shift=3.0
  (sigma' = shift*s / (1 + (shift-1)*s));
- FLUX-dev: resolution-dependent "mu" time shift
  (sigma' = exp(mu) / (exp(mu) + (1/s - 1)));
- FLUX-schnell: unshifted.

The reference reaches these through diffusers
FlowMatchEulerDiscreteScheduler (`modules/sd3/txt2img.py`,
`modules/flux/txt2img.py`); here they are host-precomputed arrays driving
one lax.scan like every other sampler in samplers/.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.core.registry import SAMPLERS
from cremage_tpu.samplers.kdiffusion import CHUNKABLE_PLANS, _report


def shift_sigmas(sigmas: np.ndarray, shift: float) -> np.ndarray:
    return shift * sigmas / (1 + (shift - 1) * sigmas)


def time_shift_mu(sigmas: np.ndarray, mu: float) -> np.ndarray:
    return math.exp(mu) / (math.exp(mu) + (1 / np.maximum(sigmas, 1e-9) - 1))


def flux_mu(image_seq_len: int, base_len: int = 256, max_len: int = 4096,
            base_shift: float = 0.5, max_shift: float = 1.15) -> float:
    m = (max_shift - base_shift) / (max_len - base_len)
    b = base_shift - m * base_len
    return image_seq_len * m + b


def flow_sigmas(
    steps: int, shift: float = 1.0, mu: Optional[float] = None
) -> np.ndarray:
    """Descending sigmas in (0,1], trailing 0 appended."""
    sigmas = np.linspace(1.0, 1.0 / steps, steps, dtype=np.float64)
    if mu is not None:
        sigmas = time_shift_mu(sigmas, mu)
    elif shift != 1.0:
        sigmas = shift_sigmas(sigmas, shift)
    return np.concatenate([sigmas, [0.0]])


def sd3_sigmas(steps: int, shift: float = 3.0) -> np.ndarray:
    return flow_sigmas(steps, shift=shift)


def plan_flow_euler(sigmas) -> "ScanPlan":
    from cremage_tpu.samplers.chunked import ScanPlan

    sig = np.asarray(sigmas, np.float64)
    n = len(sig) - 1

    def make_xs(key):
        del key  # deterministic sampler
        return (jnp.asarray(sig[:-1], jnp.float32),
                jnp.asarray(np.diff(sig), jnp.float32))

    def body(v_fn, xi, per):
        s_i, dt = per
        v = v_fn(xi, s_i).astype(jnp.float32)
        return xi + dt * v

    return ScanPlan(n_scan=n, init=lambda x: x.astype(jnp.float32),
                    make_xs=make_xs, body=body)


CHUNKABLE_PLANS["FlowEuler"] = plan_flow_euler


@SAMPLERS.register("FlowEuler")
def sample_flow_euler(
    v_fn: Callable,           # v_fn(x, sigma_scalar) -> velocity
    x: jnp.ndarray,
    sigmas,
    *,
    key=None,
    progress_cb=None,
) -> jnp.ndarray:
    from cremage_tpu.samplers.chunked import run_plan

    plan = plan_flow_euler(sigmas)
    return run_plan(plan, v_fn, x, key=key, progress_cb=progress_cb,
                    report=_report)


def cfg_velocity(v_fn: Callable, c, uc, scale: float,
                 interval=None) -> Callable:
    """CFG for velocity models: batched [uc, c] like the eps samplers.

    Extra keyword args pass through to the model; a (v, aux) tuple
    return (e.g. the DiT deep-cache "capture" mode,
    samplers/deepcache.py) keeps aux at the doubled batch — it is fed
    back to the model unsplit.

    `interval=(lo, hi)` restricts guidance to flow-sigma lo <= t <= hi
    (Kynkäänniemi et al. 2024); outside, a lax.cond runs the conditional
    model alone on the single batch. This per-call wrapper excludes
    aux-returning modes; pipelines compose the interval with the Δ-cache
    through `deepcache.make_dc_denoise_windowed`."""
    if uc is None or scale == 1.0:
        def fn_nocfg(x, sigma, **kw):
            sigma_b = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32),
                                       (x.shape[0],))
            return v_fn(x, sigma_b, c, **kw)
        return fn_nocfg

    def _cat(u, cc):
        if isinstance(u, dict):
            return {k: _cat(u[k], cc[k]) for k in cc}
        return jnp.concatenate([u, cc], axis=0)

    cond = _cat(uc, c)

    def fn(x, sigma, **kw):
        b = x.shape[0]

        def with_cfg(xx):
            sigma_b = jnp.broadcast_to(
                jnp.asarray(sigma, jnp.float32), (2 * b,))
            v = v_fn(jnp.concatenate([xx, xx], axis=0), sigma_b, cond, **kw)
            aux = None
            if isinstance(v, tuple):
                v, aux = v
            vu, vc = v[:b], v[b:]
            out = vu + scale * (vc - vu)
            return out if aux is None else (out, aux)

        if interval is None:
            return with_cfg(x)

        def cond_only(xx):
            sigma_b = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (b,))
            v = v_fn(xx, sigma_b, c, **kw)
            if isinstance(v, tuple):
                raise ValueError(
                    "cfg interval does not compose with aux-returning "
                    "model modes (deep_cache)")
            return v

        lo, hi = float(interval[0]), float(interval[1])
        s = jnp.max(jnp.asarray(sigma, jnp.float32))
        pred = jnp.logical_and(s >= lo, s <= hi)
        return jax.lax.cond(pred, with_cfg, cond_only, x)

    return fn
