"""PLMS and DPM-Solver samplers (the reference ldm engine's two
non-menu samplers) as jit-scanned programs.

The reference vendors both (`modules/ldm/models/diffusion/plms.py`,
`modules/ldm/models/diffusion/dpm_solver/{sampler,dpm_solver}.py`) and
imports them in `modules/sd/image_generator.py:42-43`, but its sampler
menu (`modules/cremage/utils/sampler_utils.py:21-67 instantiate_sampler`)
never instantiates them — they are reachable only programmatically.
We expose them under the same engine contract as DDIM: eps-model-driven
(`eps(x, t) -> eps`, integer-valued float timesteps), txt2img.

Design, like every sampler here: all schedule math is host numpy
float64 precomputed into per-step coefficient arrays; the scan body is
one CFG'd eps call plus fused vector math, so the whole run is a single
XLA program with static shapes.

PLMS (`plms.py:218-239 p_sample_plms`): pseudo linear multistep —
Adams-Bashforth on eps over the DDIM (eta=0) update. Step 0 bootstraps
with pseudo improved Euler (two model calls); steps 1/2/3+ use the
2nd/3rd/4th-order AB combination of the raw (not combined) eps history.
The AB order per step is static, so the coefficient row is just a
per-step (4,) array and the eps history a (3, *x.shape) scan carry.

DPM-Solver (`dpm_solver/sampler.py:81-83`): the reference wrapper's
exact configuration — NoiseScheduleVP('discrete'), predict_x0=True,
thresholding=False, skip_type='time_uniform', method='multistep',
order=2, solver_type='dpm_solver', lower_order_final=True (active for
steps < 15, `dpm_solver.py:1094`). Per-step (A, B, C) with
    x_t = A*x - B*m0 - C*(m0 - m1),   A = sigma_t/sigma_s0,
    B = alpha_t*expm1(-h),            C = B/(2*r0),
m* the x0-predictions at the two previous times, are all host-derived
from the interpolated discrete lambda table (`dpm_solver.py:100-155`),
and the model is driven at t_input = (t - 1/N)*1000
(`dpm_solver.py:278-284`).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.samplers.ddim import DDIMSchedule, make_ddim_schedule
from cremage_tpu.samplers.kdiffusion import _report

__all__ = [
    "sample_plms", "make_dpm_solver_schedule", "sample_dpm_solver",
    "DPMSolverSchedule",
]


# ---------------------------------------------------------------- PLMS

# Adams-Bashforth rows [e_t, old[-1], old[-2], old[-3]] for steps with
# 1, 2, >=3 previous eps values (plms.py:224-232).
_AB_ROWS = np.array([
    [3.0 / 2.0, -1.0 / 2.0, 0.0, 0.0],
    [23.0 / 12.0, -16.0 / 12.0, 5.0 / 12.0, 0.0],
    [55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0],
], dtype=np.float64)


def _plms_coeffs(sched: DDIMSchedule, time_range, indices):
    """Per-step (t, sqrt_at, sqrt_1m_at, sqrt_aprev, dir_coef) arrays,
    newest-timestep first. eta is 0 for PLMS so there is no noise term."""
    a_t = sched.alphas[indices]
    a_prev = sched.alphas_prev[indices]
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    return (f32(time_range), f32(np.sqrt(a_t)), f32(np.sqrt(1.0 - a_t)),
            f32(np.sqrt(a_prev)), f32(np.sqrt(1.0 - a_prev)))


def sample_plms(
    eps_fn: Callable,
    x: jnp.ndarray,
    sched: DDIMSchedule,
    *,
    key: Optional[jax.Array] = None,   # unused: PLMS is deterministic
    t_start: Optional[int] = None,
    progress_cb=None,
) -> jnp.ndarray:
    """PLMS sampling from pure noise (reference plms.py:115-170
    plms_sampling with eta=0, mask=None). With `t_start`, denoises from
    DDIM step t_start down to 0 (img2img decode, like ddim.decode)."""
    del key
    if sched.eta != 0.0:
        raise ValueError("ddim_eta must be 0 for PLMS")
    timesteps = (sched.timesteps if t_start is None
                 else sched.timesteps[:t_start])
    n = len(timesteps)
    time_range = timesteps[::-1].copy()
    indices = np.arange(n)[::-1].copy()
    t, sqrt_at, sqrt_1m_at, sqrt_aprev, dir_coef = _plms_coeffs(
        sched, time_range, indices)

    def update(xi, e, i):
        pred_x0 = (xi - sqrt_1m_at[i] * e) / sqrt_at[i]
        return sqrt_aprev[i] * pred_x0 + dir_coef[i] * e

    x = x.astype(jnp.float32)

    # step 0: pseudo improved Euler (plms.py:220-223) — e_t at t0, a
    # trial DDIM step, e at (x_trial, t1), average. t_next for n==1
    # degenerates to t0 (plms.py:146 min(i+1, len-1)).
    e_t = eps_fn(x, t[0]).astype(jnp.float32)
    x_trial = update(x, e_t, 0)
    e_next = eps_fn(x_trial, t[min(1, n - 1)]).astype(jnp.float32)
    x_new = update(x, (e_t + e_next) / 2.0, 0)
    _report(progress_cb, jnp.asarray(0))
    if n == 1:
        return x_new

    # steps 1..n-1: static AB order per step
    rows = _AB_ROWS[np.minimum(np.arange(1, n), 3) - 1]
    zeros = jnp.zeros_like(x)
    xs = (t[1:], jnp.asarray(rows, jnp.float32), jnp.arange(1, n))

    def body(carry, per):
        xi, b0, b1, b2 = carry
        tt, row, i = per
        e = eps_fn(xi, tt).astype(jnp.float32)
        e_prime = row[0] * e + row[1] * b0 + row[2] * b1 + row[3] * b2
        pred_x0 = (xi - jnp.take(sqrt_1m_at, i) * e_prime) / jnp.take(sqrt_at, i)
        xi = jnp.take(sqrt_aprev, i) * pred_x0 + jnp.take(dir_coef, i) * e_prime
        _report(progress_cb, i)
        return (xi, e, b0, b1), None

    (x_new, _, _, _), _ = jax.lax.scan(body, (x_new, e_t, zeros, zeros), xs)
    return x_new


# ---------------------------------------------------------- DPM-Solver

@dataclasses.dataclass(frozen=True)
class DPMSolverSchedule:
    """Host-precomputed multistep DPM-Solver++(2M-style) program:
    model input times and per-transition update coefficients."""
    t_model: np.ndarray      # (steps+1,) model input times at each ts[i]
    alphas: np.ndarray       # (steps+1,) alpha_t at each ts[i]
    sigmas_vp: np.ndarray    # (steps+1,) sigma_t at each ts[i]
    A: np.ndarray            # (steps,)  sigma_t/sigma_s0 per transition
    B: np.ndarray            # (steps,)  alpha_t*expm1(-h)
    C: np.ndarray            # (steps,)  B/(2*r0); 0 on order-1 steps

    @property
    def num_steps(self) -> int:
        return len(self.A)


def make_dpm_solver_schedule(
    alphas_cumprod: np.ndarray,
    num_steps: int,
    lower_order_final: bool = True,
) -> DPMSolverSchedule:
    if num_steps < 2:
        raise ValueError("DPM-Solver multistep order 2 needs steps >= 2")
    acp = np.asarray(alphas_cumprod, dtype=np.float64)
    big_n = len(acp)
    # discrete NoiseScheduleVP: log-alpha interpolated on
    # t_array = linspace(0,1,N+1)[1:]  (dpm_solver.py:100-108)
    t_array = np.linspace(0.0, 1.0, big_n + 1)[1:]
    log_alpha_array = 0.5 * np.log(acp)
    ts = np.linspace(1.0, 1.0 / big_n, num_steps + 1)  # time_uniform
    log_alpha = np.interp(ts, t_array, log_alpha_array)
    alpha = np.exp(log_alpha)
    sigma = np.sqrt(1.0 - np.exp(2.0 * log_alpha))
    lam = log_alpha - 0.5 * np.log(1.0 - np.exp(2.0 * log_alpha))
    t_model = (ts - 1.0 / big_n) * 1000.0

    h = lam[1:] - lam[:-1]                      # per transition i-1 -> i
    A = sigma[1:] / sigma[:-1]
    B = alpha[1:] * np.expm1(-h)
    C = np.zeros_like(B)
    # order-2 on every transition except the bootstrap first step and —
    # when lower_order_final and steps < 15 (dpm_solver.py:1094) — the
    # final step; r0 = h_{i-1}/h_i
    C[1:] = B[1:] * (h[1:] / h[:-1]) * 0.5
    if lower_order_final and num_steps < 15:
        C[-1] = 0.0
    return DPMSolverSchedule(t_model, alpha, sigma, A, B, C)


def sample_dpm_solver(
    eps_fn: Callable,
    x: jnp.ndarray,
    sched: DPMSolverSchedule,
    *,
    key: Optional[jax.Array] = None,   # unused: deterministic ODE solver
    progress_cb=None,
) -> jnp.ndarray:
    """Multistep order-2 data-prediction DPM-Solver, the reference
    wrapper's configuration (dpm_solver/sampler.py:81-83)."""
    del key
    n = sched.num_steps
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    t_model, alphas, sigmas = (f32(sched.t_model), f32(sched.alphas),
                               f32(sched.sigmas_vp))
    A, B, C = f32(sched.A), f32(sched.B), f32(sched.C)

    def x0_pred(xi, i):
        tt = jnp.broadcast_to(jnp.take(t_model, i), (xi.shape[0],))
        e = eps_fn(xi, tt).astype(jnp.float32)
        return (xi - jnp.take(sigmas, i) * e) / jnp.take(alphas, i)

    x = x.astype(jnp.float32)
    m0 = x0_pred(x, 0)
    m1 = jnp.zeros_like(m0)   # unused on the first (order-1) transition

    def body(carry, i):
        xi, m0, m1 = carry
        xi = A[i] * xi - B[i] * m0 - C[i] * (m0 - m1)
        m_new = x0_pred(xi, i + 1)
        _report(progress_cb, i)
        return (xi, m_new, m0), None

    # transitions 0..n-2 each end with a model eval; the final
    # transition does not need one (dpm_solver.py:1104-1106)
    (x, m0, m1), _ = jax.lax.scan(body, (x, m0, m1), jnp.arange(n - 1))
    x = A[n - 1] * x - B[n - 1] * m0 - C[n - 1] * (m0 - m1)
    _report(progress_cb, jnp.asarray(n - 1))
    return x
