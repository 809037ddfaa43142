"""Latent Consistency Model (LCM) sampling — the scheduler side of
LCM-LoRA (Luo et al. 2023, arXiv 2311.05556; a speed feature beyond
reference parity: `/root/reference` has no LCM support).

LCM-LoRA distills a consistency model INTO LoRA weights on a stock
SD1.5/SDXL UNet; this framework already merges arbitrary kohya LoRAs at
load time (io/lora.py), so the only missing piece to run the popular
4-8-step LCM-LoRA checkpoints is the scheduler.  Semantics transcribed
from the published diffusers `LCMScheduler` (the implementation users'
checkpoints were distilled against):

- timestep selection: from the `original_inference_steps=50` DDIM-style
  distillation grid on the 1000-step training table —
  `origin = (arange(1, 51) * 20) - 1`, reversed, every
  `len(origin)//steps`-th entry, first `steps` entries;
- per step at discrete timestep t with eps-prediction `eps`:
  x0 = (x_t - sqrt(1-acp_t) * eps) / sqrt(acp_t), then the consistency
  boundary scaling with `timestep_scaling=10`, `sigma_data=0.5`:
  s = 10*t; c_skip = 0.25/(s^2+0.25); c_out = s/sqrt(s^2+0.25);
  denoised = c_out * x0 + c_skip * x_t;
- ancestral re-noise between steps:
  x_{t_next} = sqrt(acp_next)*denoised + sqrt(1-acp_next)*N(0,1);
  the final step returns `denoised` (here: sigma_next = 0 makes the
  same expression exact, so the scan body stays uniform).

TPU-first: everything schedule-dependent is precomputed on the host in
float64 (make_lcm_schedule) and the whole loop is one `lax.scan` in
k-diffusion sigma space — the sampler state x is x0 + sigma*eps, the
DDPM-space sample is x * c_in with c_in = 1/sqrt(1+sigma^2) =
sqrt(acp), and the denoiser is the shared EpsDenoiser (CFG applied by
the caller, samplers/denoiser.py).  Use guidance scale 1.0-2.0 with
LCM-LoRA weights (the distillation bakes most of the guidance in).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.samplers.kdiffusion import (
    Array, DenoiseFn, _f32, _keys, _noise, _report,
)


@dataclasses.dataclass(frozen=True)
class LCMSchedule:
    sigmas: np.ndarray       # (n,) k-space sigma per step (float64)
    sigma_next: np.ndarray   # (n,) next step's sigma, 0 for the last
    c_skip: np.ndarray       # (n,) boundary-condition skip scale
    c_out: np.ndarray        # (n,) boundary-condition output scale
    c_in: np.ndarray         # (n,) x_k -> x_t (DDPM space) scale
    timesteps: np.ndarray    # (n,) the discrete training timesteps


def make_lcm_schedule(alphas_cumprod, steps: int,
                      original_steps: int = 50,
                      strength: float = 1.0,
                      timestep_scaling: float = 10.0,
                      sigma_data: float = 0.5) -> LCMSchedule:
    """Host-side LCM schedule from the model's alphas_cumprod table
    (diffusers LCMScheduler.set_timesteps semantics).  For img2img,
    strength < 1 truncates the distillation origin grid to its lowest
    int(original_steps*strength) timesteps before selection, exactly
    diffusers' strength handling."""
    acp = np.asarray(alphas_cumprod, np.float64)
    n_train = len(acp)
    if not 1 <= steps <= original_steps:
        raise ValueError(
            f"LCM steps must be in [1, {original_steps}], got {steps}")
    k = n_train // original_steps
    origin = np.arange(1, original_steps + 1, dtype=np.int64) * k - 1
    if strength < 1.0:
        origin = origin[: max(1, int(original_steps * strength))]
    skip = max(1, len(origin) // steps)
    ts = origin[::-1][::skip][:steps]

    acp_t = acp[ts]
    sigmas = np.sqrt((1.0 - acp_t) / acp_t)
    scaled = ts.astype(np.float64) * timestep_scaling
    c_skip = sigma_data**2 / (scaled**2 + sigma_data**2)
    c_out = scaled / np.sqrt(scaled**2 + sigma_data**2)
    c_in = 1.0 / np.sqrt(1.0 + sigmas**2)          # = sqrt(acp_t)
    sigma_next = np.append(sigmas[1:], 0.0)
    return LCMSchedule(sigmas=sigmas, sigma_next=sigma_next,
                       c_skip=c_skip, c_out=c_out, c_in=c_in,
                       timesteps=ts)


def sample_lcm(denoise: DenoiseFn, x: Array, sched: LCMSchedule, *,
               key: Optional[jax.Array] = None,
               progress_cb=None) -> Array:
    """x: initial noise in k-space (N(0,1) * sched.sigmas[0]).
    denoise(x_k, sigma) -> x0 (the shared k-diffusion denoiser
    contract); returns the final consistency output x0."""
    n = len(sched.sigmas)
    keys = _keys(key, n)
    x = x.astype(jnp.float32)

    def body(xi, per):
        sigma, s_next, c_skip, c_out, c_in, k, i = per
        x0 = denoise(xi, sigma).astype(jnp.float32)
        denoised = c_out * x0 + c_skip * (xi * c_in)
        # k-space re-noise: x = x0 + sigma*eps; s_next=0 on the last
        # step makes this the plain consistency output
        xi = denoised + s_next * _noise(k[0], xi)
        _report(progress_cb, i)
        return xi, None

    xs = (_f32(sched.sigmas), _f32(sched.sigma_next), _f32(sched.c_skip),
          _f32(sched.c_out), _f32(sched.c_in), keys, jnp.arange(n))
    x, _ = jax.lax.scan(body, x, xs)
    return x
