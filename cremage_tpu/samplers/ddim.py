"""DDIM sampler (Song et al. 2020) as a jit-scanned program.

Schedule semantics match CompVis/the reference
(`modules/ldm/modules/diffusionmodules/util.py:46-77` make_ddim_timesteps
uniform spacing with the +1 offset, make_ddim_sampling_parameters eta
sigmas; `modules/ldm/models/diffusion/ddim.py` p_sample_ddim update,
stochastic_encode :615, decode :657). All schedule arrays are host
numpy float64; the scan body does one CFG'd eps call + fused vector math.

The eps model here is `eps(x, t, cond) -> eps` with integer-valued float
timesteps (DDIM drives the model by t, not sigma).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.core.registry import SAMPLERS
from cremage_tpu.samplers.chunked import ScanPlan, run_plan
from cremage_tpu.samplers.kdiffusion import _report  # shared progress hook


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    timesteps: np.ndarray        # ascending ints, len S (ddpm t values)
    alphas: np.ndarray           # acp[timesteps]
    alphas_prev: np.ndarray      # acp[prev timesteps] (acp[0] first)
    sigmas: np.ndarray           # eta-scaled DDIM sigmas
    alphas_cumprod: np.ndarray   # full 1000-step table (for encode)
    eta: float

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)


def make_ddim_schedule(
    alphas_cumprod: np.ndarray,
    num_steps: int,
    eta: float = 0.0,
    method: str = "uniform",
) -> DDIMSchedule:
    acp = np.asarray(alphas_cumprod, dtype=np.float64)
    num_ddpm = len(acp)
    if method == "uniform":
        c = num_ddpm // num_steps
        ts = np.asarray(list(range(0, num_ddpm, c)))
    elif method == "quad":
        ts = ((np.linspace(0, np.sqrt(num_ddpm * 0.8), num_steps)) ** 2).astype(int)
    else:
        raise NotImplementedError(f"ddim discretization {method!r}")
    ts = ts + 1  # reference +1 offset (util.py:57-58)
    ts = np.clip(ts, 0, num_ddpm - 1)
    alphas = acp[ts]
    alphas_prev = np.asarray([acp[0]] + acp[ts[:-1]].tolist())
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    return DDIMSchedule(ts, alphas, alphas_prev, sigmas, acp, eta)


def _f32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.float32)


def _step_arrays(sched: DDIMSchedule, timesteps: np.ndarray, indices: np.ndarray):
    """Per-scan-step coefficient arrays for p_sample_ddim, newest first."""
    a_t = sched.alphas[indices]
    a_prev = sched.alphas_prev[indices]
    sigma_t = sched.sigmas[indices]
    sqrt_one_minus_at = np.sqrt(1.0 - a_t)
    return (
        _f32(timesteps), _f32(np.sqrt(a_t)), _f32(sqrt_one_minus_at),
        _f32(np.sqrt(a_prev)),
        _f32(np.sqrt(np.maximum(1.0 - a_prev - sigma_t**2, 0.0))),
        _f32(sigma_t),
    )


@SAMPLERS.register("DDIM")
def sample(
    eps_fn: Callable,
    x: jnp.ndarray,
    sched: DDIMSchedule,
    *,
    key: Optional[jax.Array] = None,
    temperature: float = 1.0,
    progress_cb=None,
) -> jnp.ndarray:
    """Full DDIM sampling from pure noise x ~ N(0, I)."""
    return _ddim_loop(eps_fn, x, sched, None, key, temperature, progress_cb)


def plan_ddim(sched: DDIMSchedule, t_start: Optional[int] = None,
              temperature: float = 1.0) -> ScanPlan:
    """ScanPlan over the DDIM step loop (full sampling when t_start is
    None; the img2img `decode` truncation when t_start is given) — the
    chunk-executable form consumed by samplers/chunked.py."""
    if t_start is None:
        time_range = sched.timesteps[::-1].copy()
        indices = np.arange(sched.num_steps)[::-1].copy()
    else:
        timesteps = sched.timesteps[:t_start]
        time_range = timesteps[::-1].copy()
        indices = (len(timesteps) - 1 - np.arange(len(timesteps))).copy()
    n = len(time_range)
    noisy = sched.eta > 0

    def make_xs(key):
        if key is None:
            key = jax.random.key(0)
        keys = jax.random.split(key, n)
        return _step_arrays(sched, time_range, indices) + (keys,)

    def body(eps_fn, xi, per):
        t, sqrt_at, sqrt_1m_at, sqrt_aprev, dir_coef, sigma_t, k = per
        e_t = eps_fn(xi, t).astype(jnp.float32)
        pred_x0 = (xi - sqrt_1m_at * e_t) / sqrt_at
        dir_xt = dir_coef * e_t
        xi = sqrt_aprev * pred_x0 + dir_xt
        if noisy:
            xi = xi + sigma_t * temperature * jax.random.normal(
                k, xi.shape, dtype=jnp.float32
            )
        return xi

    return ScanPlan(n_scan=n, init=lambda x: x.astype(jnp.float32),
                    make_xs=make_xs, body=body)


def _ddim_loop(eps_fn, x, sched, t_start, key, temperature, progress_cb):
    plan = plan_ddim(sched, t_start, temperature)
    return run_plan(plan, eps_fn, x, key=key, progress_cb=progress_cb,
                    report=_report)


def stochastic_encode(
    x0: jnp.ndarray,
    sched: DDIMSchedule,
    t_enc: int,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Forward-diffuse x0 to DDIM step t_enc (img2img encode; reference
    ddim.py:615 with use_original_steps=False => ddim alphas)."""
    sqrt_acp = np.sqrt(sched.alphas)
    sqrt_1m_acp = np.sqrt(1.0 - sched.alphas)
    return (
        float(sqrt_acp[t_enc]) * x0.astype(jnp.float32)
        + float(sqrt_1m_acp[t_enc]) * noise.astype(jnp.float32)
    )


def decode(
    eps_fn: Callable,
    x_latent: jnp.ndarray,
    sched: DDIMSchedule,
    t_start: int,
    *,
    key: Optional[jax.Array] = None,
    temperature: float = 1.0,
    progress_cb=None,
) -> jnp.ndarray:
    """Denoise from DDIM step t_start down to 0 (img2img decode;
    reference ddim.py:657)."""
    return _ddim_loop(eps_fn, x_latent, sched, t_start, key, temperature,
                      progress_cb)
