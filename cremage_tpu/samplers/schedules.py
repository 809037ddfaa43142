"""Sigma schedules / noise discretizations.

All schedule math is float64 on the host (numpy) and returned as float32
jax arrays — sampler trajectories diverge visibly if sigma math runs in
bf16 (SURVEY.md §7 hard part 3). Schedules are tiny (≤1001 elements), so
there is no reason to compute them on-device.

Behavior contract (reference files, studied not copied):
- DDPM "linear" beta schedule = linspace in sqrt(beta) space, squared
  (CompVis convention; `modules/ldm/modules/diffusionmodules/util.py`).
- k-diffusion discrete schedule: sigma_t = sqrt((1-acp_t)/acp_t),
  `get_sigmas(n)` linspace over t then interp in log-sigma, append 0
  (`modules/k_diffusion/external.py:54-84`).
- Karras/exponential/polyexponential/VP schedules
  (`modules/k_diffusion/sampling.py:17-42`).
- SD1.5 defaults give sigma in [0.0316386, 14.5521805]
  (`modules/ldm/models/diffusion/k_diffusion_samplers.py:80-87`).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cremage_tpu.core.registry import SCHEDULES

# SD1.x / SDXL DDPM schedule constants (configs/ldm v1-inference.yaml).
DDPM_NUM_TIMESTEPS = 1000
LINEAR_START = 0.00085
LINEAR_END = 0.0120

# Reference-documented SD sigma bounds (k_diffusion_samplers.py:64-87).
SD_SIGMA_MIN = 0.0316386
SD_SIGMA_MAX = 14.5521805


def make_betas_linear(
    n: int = DDPM_NUM_TIMESTEPS,
    linear_start: float = LINEAR_START,
    linear_end: float = LINEAR_END,
) -> np.ndarray:
    """CompVis 'linear' schedule: linspace in sqrt(beta), squared."""
    return (
        np.linspace(linear_start**0.5, linear_end**0.5, n, dtype=np.float64) ** 2
    )


def make_betas_plain_linear(
    n: int = DDPM_NUM_TIMESTEPS,
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
) -> np.ndarray:
    """True-linear beta schedule (diffusers 'linear'; PixArt/Kandinsky)."""
    return np.linspace(beta_start, beta_end, n, dtype=np.float64)


def make_betas_squaredcos(n: int = DDPM_NUM_TIMESTEPS,
                          max_beta: float = 0.999) -> np.ndarray:
    """squaredcos_cap_v2 (diffusers; Kandinsky decoder)."""
    def abar(t):
        return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

    t1 = np.arange(n, dtype=np.float64) / n
    t2 = (np.arange(n, dtype=np.float64) + 1) / n
    return np.minimum(1 - abar(t2) / abar(t1), max_beta)


def alphas_cumprod_from_betas(betas: np.ndarray) -> np.ndarray:
    return np.cumprod(1.0 - betas, axis=0)


def make_alphas_cumprod(
    n: int = DDPM_NUM_TIMESTEPS,
    linear_start: float = LINEAR_START,
    linear_end: float = LINEAR_END,
) -> np.ndarray:
    return alphas_cumprod_from_betas(make_betas_linear(n, linear_start, linear_end))


def sigmas_from_alphas_cumprod(alphas_cumprod: np.ndarray) -> np.ndarray:
    """k-diffusion discrete sigmas: sqrt((1-acp)/acp), ascending in t."""
    acp = np.asarray(alphas_cumprod, dtype=np.float64)
    return np.sqrt((1.0 - acp) / acp)


def append_zero(x: np.ndarray) -> np.ndarray:
    return np.concatenate([x, np.zeros((1,), dtype=x.dtype)])


class DiscreteSchedule:
    """Discrete DDPM sigma table with t<->sigma interpolation in log-sigma
    (semantics of k_diffusion/external.py DiscreteSchedule)."""

    def __init__(self, sigmas: np.ndarray, quantize: bool = False):
        self.sigmas = np.asarray(sigmas, dtype=np.float64)  # ascending, len T
        self.log_sigmas = np.log(self.sigmas)
        self.quantize = quantize

    @property
    def sigma_min(self) -> float:
        return float(self.sigmas[0])

    @property
    def sigma_max(self) -> float:
        return float(self.sigmas[-1])

    def t_to_sigma(self, t: np.ndarray) -> np.ndarray:
        t = np.asarray(t, dtype=np.float64)
        low_idx = np.floor(t).astype(np.int64)
        high_idx = np.ceil(t).astype(np.int64)
        w = t - low_idx
        log_sigma = (1 - w) * self.log_sigmas[low_idx] + w * self.log_sigmas[high_idx]
        return np.exp(log_sigma)

    def sigma_to_t(self, sigma: np.ndarray, quantize: bool | None = None) -> np.ndarray:
        quantize = self.quantize if quantize is None else quantize
        sigma = np.asarray(sigma, dtype=np.float64)
        log_sigma = np.log(sigma)
        dists = log_sigma[None, ...] - self.log_sigmas[:, None]
        if quantize:
            return np.abs(dists).argmin(axis=0).reshape(sigma.shape)
        low_idx = np.clip(
            (dists >= 0).cumsum(axis=0).argmax(axis=0), 0, len(self.log_sigmas) - 2
        )
        high_idx = low_idx + 1
        low, high = self.log_sigmas[low_idx], self.log_sigmas[high_idx]
        w = np.clip((low - log_sigma) / (low - high), 0, 1)
        t = (1 - w) * low_idx + w * high_idx
        return t.reshape(sigma.shape)

    def get_sigmas(self, n: int | None = None) -> np.ndarray:
        """n sampling sigmas descending, with trailing 0."""
        if n is None:
            return append_zero(self.sigmas[::-1].copy())
        t_max = len(self.sigmas) - 1
        t = np.linspace(t_max, 0, n, dtype=np.float64)
        return append_zero(self.t_to_sigma(t))


@SCHEDULES.register("karras")
def get_sigmas_karras(
    n: int, sigma_min: float = SD_SIGMA_MIN, sigma_max: float = SD_SIGMA_MAX,
    rho: float = 7.0,
) -> np.ndarray:
    ramp = np.linspace(0, 1, n, dtype=np.float64)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return append_zero(sigmas)


@SCHEDULES.register("exponential")
def get_sigmas_exponential(
    n: int, sigma_min: float = SD_SIGMA_MIN, sigma_max: float = SD_SIGMA_MAX
) -> np.ndarray:
    return append_zero(
        np.exp(np.linspace(np.log(sigma_max), np.log(sigma_min), n, dtype=np.float64))
    )


@SCHEDULES.register("polyexponential")
def get_sigmas_polyexponential(
    n: int, sigma_min: float = SD_SIGMA_MIN, sigma_max: float = SD_SIGMA_MAX,
    rho: float = 1.0,
) -> np.ndarray:
    ramp = np.linspace(1, 0, n, dtype=np.float64) ** rho
    sigmas = np.exp(ramp * (np.log(sigma_max) - np.log(sigma_min)) + np.log(sigma_min))
    return append_zero(sigmas)


@SCHEDULES.register("vp")
def get_sigmas_vp(
    n: int, beta_d: float = 19.9, beta_min: float = 0.1, eps_s: float = 1e-3
) -> np.ndarray:
    t = np.linspace(1, eps_s, n, dtype=np.float64)
    sigmas = np.sqrt(np.exp(beta_d * t**2 / 2 + beta_min * t) - 1)
    return append_zero(sigmas)


def default_sd_schedule(quantize: bool = False) -> DiscreteSchedule:
    """The SD1.x/SDXL-base discrete schedule (1000-step linear DDPM)."""
    return DiscreteSchedule(
        sigmas_from_alphas_cumprod(make_alphas_cumprod()), quantize=quantize
    )


def truncate_for_img2img(sigmas: np.ndarray, t_enc: int) -> np.ndarray:
    """Keep the last t_enc+1 sigmas for partial denoising (img2img):
    reference `k_diffusion_samplers.py:187-193`."""
    out = sigmas[-(t_enc + 1):]
    assert out.shape[0] == t_enc + 1
    return out


def to_jax(sigmas: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(sigmas, dtype=jnp.float32)
