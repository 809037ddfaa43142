"""k-diffusion sampler menu as jit-scannable pure functions.

Algorithm semantics follow crowsonkb k-diffusion as vendored by the
reference (`modules/k_diffusion/sampling.py`; sampler->schedule pairing
from `modules/ldm/models/diffusion/k_diffusion_samplers.py:299-412`):
Euler / Euler A / Heun / LMS run on the model's discrete sigma schedule,
the DPM family runs on Karras sigmas.

TPU-first design decisions (vs the reference's Python step loops):
- every schedule-dependent quantity (sigma_hat, ancestral sigma_up/down,
  log-space midpoints, expm1 coefficients, LMS integrals) is precomputed
  on the host in float64 and fed to `jax.lax.scan` as per-step arrays —
  the compiled program contains only the model call and a few fused
  vector ops per step;
- steps where the reference branches (first/last step special cases)
  are peeled out of the scan instead of using `lax.cond`, so the scan
  body stays uniform;
- ancestral/SDE noise comes from pre-split `jax.random` keys (one per
  step), keeping the trajectory reproducible for a given seed
  independent of device count or dtype.

Every sampler has signature
    sample_x(denoise, x, sigmas, *, key=None, ...) -> x0
where `denoise(x, sigma_scalar) -> denoised` (CFG already applied, see
samplers/denoiser.py), `x` is the initial noise scaled however the
caller wants (k-diffusion convention: x = N(0,1) * sigmas[0]), and
`sigmas` is a host numpy array of length n+1 ending in 0.

Intentional divergence from the reference: its k-diffusion bridge passes
UNSCALED N(0,1) noise into the samplers
(`k_diffusion_samplers.py:168` `self.x = torch.randn(size)` with no
`* sigmas[0]`), deviating from upstream k-diffusion's convention. Our
pipelines scale by sigma[0] (the correct k-diffusion initialization);
matching the quirk would degrade output quality.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import io_callback
from scipy import integrate

from cremage_tpu.core.registry import SAMPLERS
from cremage_tpu.samplers.chunked import ScanPlan, run_plan

Array = jnp.ndarray
DenoiseFn = Callable[[Array, Array], Array]

# sampler name -> plan builder(sigmas, **sampler_kwargs) -> ScanPlan,
# for samplers that support chunked-segment execution (per-step-ish
# progress on backends where in-scan io_callback cannot compile —
# see samplers/chunked.py).  kdiffusion/flow populate this at import.
CHUNKABLE_PLANS: dict = {}


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _check_sigmas(sigmas) -> np.ndarray:
    s = np.asarray(sigmas, dtype=np.float64)
    if s.ndim != 1 or s.shape[0] < 2:
        raise ValueError("sigmas must be a 1-D array of length >= 2")
    return s


def _to_d(x: Array, sigma: Array, denoised: Array) -> Array:
    return (x - denoised) / sigma


def _ancestral_step_np(sigma_from: float, sigma_to: float, eta: float):
    """sigma_down/sigma_up for an ancestral step (host math)."""
    if not eta:
        return sigma_to, 0.0
    sigma_up = min(
        sigma_to,
        eta * (sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2) ** 0.5,
    )
    sigma_down = (sigma_to**2 - sigma_up**2) ** 0.5
    return sigma_down, sigma_up


def _keys(key: Optional[jax.Array], n: int, per_step: int = 1) -> jax.Array:
    if key is None:
        key = jax.random.key(0)
    ks = jax.random.split(key, n * per_step)
    return ks.reshape(n, per_step)


def _noise(key: jax.Array, x: Array) -> Array:
    return jax.random.normal(key, x.shape, dtype=jnp.float32)


_PROGRESS_UNSUPPORTED_BACKENDS = ("axon",)


def progress_callbacks_supported() -> bool:
    """Whether in-scan host progress callbacks can be compiled on the
    active backend.  MEASURED (round 4): a minimal scan+io_callback
    program never finishes compiling through the axon TPU tunnel (>560 s
    on a graph that compiles in seconds elsewhere) and a pipeline
    generate() dies with 'TPU backend setup/compile error (Unavailable)'
    — so per-step progress is disabled there and the worker's coarse
    host-side statuses (encoding/decoding/job_done) remain the progress
    surface.  Override with CREMAGE_PROGRESS_CALLBACKS=0/1."""
    env = os.environ.get("CREMAGE_PROGRESS_CALLBACKS")
    if env is not None:
        return env.lower() not in ("0", "false", "no")
    # the axon plugin registers its devices under the plain "tpu"
    # platform (jax.default_backend() == "tpu"), so the tunnel is
    # detected from the JAX_PLATFORMS selection it requires
    if any(b in os.environ.get("JAX_PLATFORMS", "")
           for b in _PROGRESS_UNSUPPORTED_BACKENDS):
        return False
    try:
        return jax.default_backend() not in _PROGRESS_UNSUPPORTED_BACKENDS
    except Exception:  # pragma: no cover - backend init failure
        return True


def _report(progress_cb, i):
    if progress_cb is not None and progress_callbacks_supported():
        io_callback(progress_cb, None, i, ordered=True)


def _f32(x: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# Euler (Karras Algorithm 2, Euler variant) — uniform scan over all steps
# ---------------------------------------------------------------------------

def plan_euler(
    sigmas,
    *,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
    s_noise: float = 1.0,
) -> ScanPlan:
    sig = _check_sigmas(sigmas)
    n = len(sig) - 1
    gamma = np.where(
        (s_tmin <= sig[:-1]) & (sig[:-1] <= s_tmax),
        min(s_churn / n, 2**0.5 - 1) if s_churn else 0.0,
        0.0,
    )
    sigma_hat = sig[:-1] * (gamma + 1)
    churn_scale = np.sqrt(np.maximum(sigma_hat**2 - sig[:-1] ** 2, 0.0))
    dt = sig[1:] - sigma_hat

    def make_xs(key):
        return (_f32(sigma_hat), _f32(dt), _f32(churn_scale), _keys(key, n))

    def body(denoise, xi, per):
        s_hat, dti, churn, k = per
        xi = xi + _noise(k[0], xi) * s_noise * churn
        den = denoise(xi, s_hat).astype(jnp.float32)
        d = _to_d(xi, s_hat, den)
        return xi + d * dti

    return ScanPlan(n_scan=n, init=lambda x: x.astype(jnp.float32),
                    make_xs=make_xs, body=body)


CHUNKABLE_PLANS["Euler"] = plan_euler


@SAMPLERS.register("Euler")
def sample_euler(
    denoise: DenoiseFn,
    x: Array,
    sigmas,
    *,
    key: Optional[jax.Array] = None,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
    s_noise: float = 1.0,
    progress_cb=None,
) -> Array:
    plan = plan_euler(sigmas, s_churn=s_churn, s_tmin=s_tmin,
                      s_tmax=s_tmax, s_noise=s_noise)
    return run_plan(plan, denoise, x, key=key, progress_cb=progress_cb,
                    report=_report)


# ---------------------------------------------------------------------------
# Euler ancestral — uniform scan
# ---------------------------------------------------------------------------

def plan_euler_ancestral(
    sigmas,
    *,
    eta: float = 1.0,
    s_noise: float = 1.0,
) -> ScanPlan:
    sig = _check_sigmas(sigmas)
    n = len(sig) - 1
    downs, ups = zip(*[_ancestral_step_np(sig[i], sig[i + 1], eta) for i in range(n)])

    def make_xs(key):
        return (_f32(sig[:-1]), _f32(np.array(downs)), _f32(np.array(ups)),
                _keys(key, n))

    def body(denoise, xi, per):
        s_i, s_down, s_up, k = per
        den = denoise(xi, s_i).astype(jnp.float32)
        d = _to_d(xi, s_i, den)
        xi = xi + d * (s_down - s_i)
        return xi + _noise(k[0], xi) * s_noise * s_up

    return ScanPlan(n_scan=n, init=lambda x: x.astype(jnp.float32),
                    make_xs=make_xs, body=body)


CHUNKABLE_PLANS["Euler A"] = plan_euler_ancestral


@SAMPLERS.register("Euler A")
def sample_euler_ancestral(
    denoise: DenoiseFn,
    x: Array,
    sigmas,
    *,
    key: Optional[jax.Array] = None,
    eta: float = 1.0,
    s_noise: float = 1.0,
    progress_cb=None,
) -> Array:
    plan = plan_euler_ancestral(sigmas, eta=eta, s_noise=s_noise)
    return run_plan(plan, denoise, x, key=key, progress_cb=progress_cb,
                    report=_report)


# ---------------------------------------------------------------------------
# Heun — scan over steps 0..n-2, final Euler step peeled
# ---------------------------------------------------------------------------

@SAMPLERS.register("Heun")
def sample_heun(
    denoise: DenoiseFn,
    x: Array,
    sigmas,
    *,
    key: Optional[jax.Array] = None,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
    s_noise: float = 1.0,
    progress_cb=None,
) -> Array:
    sig = _check_sigmas(sigmas)
    n = len(sig) - 1
    gamma = np.where(
        (s_tmin <= sig[:-1]) & (sig[:-1] <= s_tmax),
        min(s_churn / n, 2**0.5 - 1) if s_churn else 0.0,
        0.0,
    )
    sigma_hat = sig[:-1] * (gamma + 1)
    churn_scale = np.sqrt(np.maximum(sigma_hat**2 - sig[:-1] ** 2, 0.0))
    keys = _keys(key, n)
    x = x.astype(jnp.float32)

    def heun_body(xi, per):
        s_hat, s_next, churn, k, i = per
        xi = xi + _noise(k[0], xi) * s_noise * churn
        den = denoise(xi, s_hat).astype(jnp.float32)
        d = _to_d(xi, s_hat, den)
        dt = s_next - s_hat
        x2 = xi + d * dt
        den2 = denoise(x2, s_next).astype(jnp.float32)
        d2 = _to_d(x2, s_next, den2)
        _report(progress_cb, i)
        return xi + (d + d2) / 2 * dt, None

    if n > 1:
        xs = (
            _f32(sigma_hat[:-1]), _f32(sig[1:-1]), _f32(churn_scale[:-1]),
            keys[:-1], jnp.arange(n - 1),
        )
        x, _ = jax.lax.scan(heun_body, x, xs)

    # final step: sigma_next == 0 -> plain Euler
    s_hat = float(sigma_hat[-1])
    x = x + _noise(keys[-1, 0], x) * s_noise * float(churn_scale[-1])
    den = denoise(x, jnp.float32(s_hat)).astype(jnp.float32)
    d = _to_d(x, jnp.float32(s_hat), den)
    _report(progress_cb, n - 1)
    return x + d * (0.0 - s_hat)


# ---------------------------------------------------------------------------
# DPM-2 (DPM-Solver-2 w/ Karras churn) — scan + peeled Euler tail
# ---------------------------------------------------------------------------

@SAMPLERS.register("DPM2")
def sample_dpm_2(
    denoise: DenoiseFn,
    x: Array,
    sigmas,
    *,
    key: Optional[jax.Array] = None,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
    s_noise: float = 1.0,
    progress_cb=None,
) -> Array:
    sig = _check_sigmas(sigmas)
    n = len(sig) - 1
    gamma = np.where(
        (s_tmin <= sig[:-1]) & (sig[:-1] <= s_tmax),
        min(s_churn / n, 2**0.5 - 1) if s_churn else 0.0,
        0.0,
    )
    sigma_hat = sig[:-1] * (gamma + 1)
    churn_scale = np.sqrt(np.maximum(sigma_hat**2 - sig[:-1] ** 2, 0.0))
    keys = _keys(key, n)
    x = x.astype(jnp.float32)

    if n > 1:
        with np.errstate(divide="ignore"):
            sigma_mid = np.exp(
                np.log(sigma_hat[:-1])
                + (np.log(sig[1:-1]) - np.log(sigma_hat[:-1])) * 0.5
            )
        dt_1 = sigma_mid - sigma_hat[:-1]
        dt_2 = sig[1:-1] - sigma_hat[:-1]

        def body(xi, per):
            s_hat, s_mid, d1, d2, churn, k, i = per
            xi = xi + _noise(k[0], xi) * s_noise * churn
            den = denoise(xi, s_hat).astype(jnp.float32)
            d = _to_d(xi, s_hat, den)
            x2 = xi + d * d1
            den2 = denoise(x2, s_mid).astype(jnp.float32)
            d_2 = _to_d(x2, s_mid, den2)
            _report(progress_cb, i)
            return xi + d_2 * d2, None

        xs = (
            _f32(sigma_hat[:-1]), _f32(sigma_mid), _f32(dt_1), _f32(dt_2),
            _f32(churn_scale[:-1]), keys[:-1], jnp.arange(n - 1),
        )
        x, _ = jax.lax.scan(body, x, xs)

    s_hat = float(sigma_hat[-1])
    x = x + _noise(keys[-1, 0], x) * s_noise * float(churn_scale[-1])
    den = denoise(x, jnp.float32(s_hat)).astype(jnp.float32)
    d = _to_d(x, jnp.float32(s_hat), den)
    _report(progress_cb, n - 1)
    return x + d * (0.0 - s_hat)


# ---------------------------------------------------------------------------
# DPM-2 ancestral
# ---------------------------------------------------------------------------

@SAMPLERS.register("DPM2 A")
def sample_dpm_2_ancestral(
    denoise: DenoiseFn,
    x: Array,
    sigmas,
    *,
    key: Optional[jax.Array] = None,
    eta: float = 1.0,
    s_noise: float = 1.0,
    progress_cb=None,
) -> Array:
    sig = _check_sigmas(sigmas)
    n = len(sig) - 1
    downs, ups = zip(*[_ancestral_step_np(sig[i], sig[i + 1], eta) for i in range(n)])
    downs, ups = np.array(downs), np.array(ups)
    keys = _keys(key, n)
    x = x.astype(jnp.float32)

    if n > 1:
        sigma_mid = np.exp(
            np.log(sig[:-2]) + (np.log(downs[:-1]) - np.log(sig[:-2])) * 0.5
        )
        dt_1 = sigma_mid - sig[:-2]
        dt_2 = downs[:-1] - sig[:-2]

        def body(xi, per):
            s_i, s_mid, d1, d2, s_up, k, i = per
            den = denoise(xi, s_i).astype(jnp.float32)
            d = _to_d(xi, s_i, den)
            x2 = xi + d * d1
            den2 = denoise(x2, s_mid).astype(jnp.float32)
            d_2 = _to_d(x2, s_mid, den2)
            xi = xi + d_2 * d2
            xi = xi + _noise(k[0], xi) * s_noise * s_up
            _report(progress_cb, i)
            return xi, None

        xs = (
            _f32(sig[:-2]), _f32(sigma_mid), _f32(dt_1), _f32(dt_2),
            _f32(ups[:-1]), keys[:-1], jnp.arange(n - 1),
        )
        x, _ = jax.lax.scan(body, x, xs)

    # final step (sigma_down == 0): Euler to 0
    s_i = float(sig[-2])
    den = denoise(x, jnp.float32(s_i)).astype(jnp.float32)
    d = _to_d(x, jnp.float32(s_i), den)
    _report(progress_cb, n - 1)
    return x + d * (0.0 - s_i)


# ---------------------------------------------------------------------------
# LMS (linear multistep) — uniform scan with precomputed integral coeffs
# ---------------------------------------------------------------------------

def _lms_coeff(order: int, t: np.ndarray, i: int, j: int) -> float:
    def fn(tau):
        prod = 1.0
        for k in range(order):
            if j == k:
                continue
            prod *= (tau - t[i - k]) / (t[i - j] - t[i - k])
        return prod

    return integrate.quad(fn, t[i], t[i + 1], epsrel=1e-4)[0]


@SAMPLERS.register("LMS")
def sample_lms(
    denoise: DenoiseFn,
    x: Array,
    sigmas,
    *,
    key: Optional[jax.Array] = None,
    order: int = 4,
    progress_cb=None,
) -> Array:
    sig = _check_sigmas(sigmas)
    n = len(sig) - 1
    # Coefficient matrix: row i multiplies [d_i, d_{i-1}, ...] (newest first).
    coeffs = np.zeros((n, order), dtype=np.float64)
    for i in range(n):
        cur_order = min(i + 1, order)
        for j in range(cur_order):
            coeffs[i, j] = _lms_coeff(cur_order, sig, i, j)

    x = x.astype(jnp.float32)
    ds0 = jnp.zeros((order,) + x.shape, dtype=jnp.float32)

    def body(carry, per):
        xi, ds = carry
        s_i, c, i = per
        den = denoise(xi, s_i).astype(jnp.float32)
        d = _to_d(xi, s_i, den)
        ds = jnp.concatenate([d[None], ds[:-1]], axis=0)
        xi = xi + jnp.tensordot(c, ds, axes=(0, 0))
        _report(progress_cb, i)
        return (xi, ds), None

    (x, _), _ = jax.lax.scan(body, (x, ds0), (_f32(sig[:-1]), _f32(coeffs), jnp.arange(n)))
    return x


# ---------------------------------------------------------------------------
# DPM++ 2S ancestral
# ---------------------------------------------------------------------------

@SAMPLERS.register("DPM++ 2S A")
def sample_dpmpp_2s_ancestral(
    denoise: DenoiseFn,
    x: Array,
    sigmas,
    *,
    key: Optional[jax.Array] = None,
    eta: float = 1.0,
    s_noise: float = 1.0,
    progress_cb=None,
) -> Array:
    sig = _check_sigmas(sigmas)
    n = len(sig) - 1
    downs, ups = zip(*[_ancestral_step_np(sig[i], sig[i + 1], eta) for i in range(n)])
    downs, ups = np.array(downs), np.array(ups)
    keys = _keys(key, n)
    x = x.astype(jnp.float32)

    if n > 1:
        # t = -log sigma space; all coefficients host-side.
        t = -np.log(sig[:-2])
        t_next = -np.log(downs[:-1])
        h = t_next - t
        s = t + 0.5 * h
        sigma_s = np.exp(-s)
        a1 = sigma_s / sig[:-2]            # sigma_fn(s)/sigma_fn(t)
        e1 = np.expm1(-h * 0.5)
        a2 = downs[:-1] / sig[:-2]
        e2 = np.expm1(-h)

        def body(xi, per):
            s_i, s_mid, a1i, e1i, a2i, e2i, s_up, k, i = per
            den = denoise(xi, s_i).astype(jnp.float32)
            x2 = a1i * xi - e1i * den
            den2 = denoise(x2, s_mid).astype(jnp.float32)
            xi = a2i * xi - e2i * den2
            xi = xi + _noise(k[0], xi) * s_noise * s_up
            _report(progress_cb, i)
            return xi, None

        xs = (
            _f32(sig[:-2]), _f32(sigma_s), _f32(a1), _f32(e1), _f32(a2), _f32(e2),
            _f32(ups[:-1]), keys[:-1], jnp.arange(n - 1),
        )
        x, _ = jax.lax.scan(body, x, xs)

    # final step: sigma_down == 0 -> Euler
    s_i = float(sig[-2])
    den = denoise(x, jnp.float32(s_i)).astype(jnp.float32)
    d = _to_d(x, jnp.float32(s_i), den)
    _report(progress_cb, n - 1)
    return x + d * (0.0 - s_i)


# ---------------------------------------------------------------------------
# DPM++ SDE — Brownian-bridge-correlated two-stage stochastic solver
# ---------------------------------------------------------------------------

@SAMPLERS.register("DPM++ SDE")
def sample_dpmpp_sde(
    denoise: DenoiseFn,
    x: Array,
    sigmas,
    *,
    key: Optional[jax.Array] = None,
    eta: float = 1.0,
    s_noise: float = 1.0,
    r: float = 1.0 / 2.0,
    progress_cb=None,
) -> Array:
    sig = _check_sigmas(sigmas)
    n = len(sig) - 1
    keys = _keys(key, n, per_step=2)
    x = x.astype(jnp.float32)

    if n > 1:
        t = -np.log(sig[:-2])
        t_next = -np.log(sig[1:-1])
        h = t_next - t
        s = t + h * r
        fac = 1.0 / (2.0 * r)
        sigma_s = np.exp(-s)

        sd1 = np.empty(n - 1); su1 = np.empty(n - 1)
        sd2 = np.empty(n - 1); su2 = np.empty(n - 1)
        for i in range(n - 1):
            sd1[i], su1[i] = _ancestral_step_np(sig[i], sigma_s[i], eta)
            sd2[i], su2[i] = _ancestral_step_np(sig[i], sig[i + 1], eta)
        s_ = -np.log(sd1)
        t_next_ = -np.log(sd2)
        a1 = sd1 / sig[:-2];  e1 = np.expm1(t - s_)
        a2 = sd2 / sig[:-2];  e2 = np.expm1(t - t_next_)
        # Brownian-tree correlation between the two noise draws of a step:
        # the (sigma_i -> sigma_next) increment shares its first leg with
        # the (sigma_i -> sigma_s) increment (k_diffusion BrownianTree
        # noise sampler; sampling.py:63-115).
        d1 = np.abs(sig[:-2] - sigma_s)
        d2 = np.abs(sigma_s - sig[1:-1])
        w1 = np.sqrt(d1 / (d1 + d2))
        w2 = np.sqrt(d2 / (d1 + d2))

        def body(xi, per):
            (s_i, s_mid, a1i, e1i, a2i, e2i, su1i, su2i, w1i, w2i, faci, k, i) = per
            den = denoise(xi, s_i).astype(jnp.float32)
            z1 = _noise(k[0], xi)
            z2 = _noise(k[1], xi)
            # Step 1 (to s, via sigma_down of (t, s))
            x2 = a1i * xi - e1i * den
            x2 = x2 + z1 * s_noise * su1i
            den2 = denoise(x2, s_mid).astype(jnp.float32)
            # Step 2 (to t_next, via sigma_down of (t, t_next))
            den_d = (1 - faci) * den + faci * den2
            xi = a2i * xi - e2i * den_d
            xi = xi + (w1i * z1 + w2i * z2) * s_noise * su2i
            _report(progress_cb, i)
            return xi, None

        xs = (
            _f32(sig[:-2]), _f32(sigma_s), _f32(a1), _f32(e1), _f32(a2), _f32(e2),
            _f32(su1), _f32(su2), _f32(w1), _f32(w2),
            _f32(np.full(n - 1, fac)), keys[:-1], jnp.arange(n - 1),
        )
        x, _ = jax.lax.scan(body, x, xs)

    s_i = float(sig[-2])
    den = denoise(x, jnp.float32(s_i)).astype(jnp.float32)
    d = _to_d(x, jnp.float32(s_i), den)
    _report(progress_cb, n - 1)
    return x + d * (0.0 - s_i)


# ---------------------------------------------------------------------------
# DPM++ 2M — multistep; first step peeled, correction scan, last step peeled
# ---------------------------------------------------------------------------

def plan_dpmpp_2m(sigmas) -> ScanPlan:
    sig = _check_sigmas(sigmas)
    n = len(sig) - 1

    with np.errstate(divide="ignore"):
        t = -np.log(sig)                      # t[n] = +inf at sigma=0
    h = t[1:] - t[:-1]                        # h[i], len n; h[-1] = +inf
    a = sig[1:] / sig[:-1]                    # sigma ratio; a[-1] = 0
    e = np.expm1(-h)                          # e[-1] = -1
    with np.errstate(invalid="ignore"):
        r = np.concatenate([[np.nan], h[:-1] / h[1:]])  # r[i] = h_{i-1}/h_i

    def pre(denoise, x):
        # step 0 (no old_denoised)
        den = denoise(x, jnp.float32(sig[0])).astype(jnp.float32)
        return float(a[0]) * x - float(e[0]) * den, den

    n_scan = max(0, n - 2)
    coef = 1.0 / (2.0 * r[1:-1]) if n > 2 else np.zeros(0)

    def make_xs(key):
        del key  # deterministic sampler
        return (_f32(sig[1:-2]), _f32(a[1:-1]), _f32(e[1:-1]), _f32(coef))

    def body(denoise, carry, per):
        xi, od = carry
        s_i, ai, ei, ci = per
        den = denoise(xi, s_i).astype(jnp.float32)
        den_d = (1 + ci) * den - ci * od
        return ai * xi - ei * den_d, den

    if n > 1:
        def post(denoise, carry):
            # final step: sigma_next == 0 -> no correction, x = denoised
            xi, _ = carry
            den = denoise(xi, jnp.float32(sig[-2])).astype(jnp.float32)
            return float(a[-1]) * xi - float(e[-1]) * den
        post_steps = 1
    else:
        post, post_steps = None, 0

    return ScanPlan(n_scan=n_scan, init=lambda x: x.astype(jnp.float32),
                    make_xs=make_xs, body=body,
                    pre=pre, pre_steps=1,
                    post=post, post_steps=post_steps,
                    out=lambda carry: carry[0])


CHUNKABLE_PLANS["DPM++ 2M"] = plan_dpmpp_2m


@SAMPLERS.register("DPM++ 2M")
def sample_dpmpp_2m(
    denoise: DenoiseFn,
    x: Array,
    sigmas,
    *,
    key: Optional[jax.Array] = None,
    progress_cb=None,
) -> Array:
    plan = plan_dpmpp_2m(sigmas)
    return run_plan(plan, denoise, x, key=key, progress_cb=progress_cb,
                    report=_report)


# ---------------------------------------------------------------------------
# DPM++ 2M SDE — uniform scan with host coefficient arrays
# ---------------------------------------------------------------------------

@SAMPLERS.register("DPM++ 2M SDE")
def sample_dpmpp_2m_sde(
    denoise: DenoiseFn,
    x: Array,
    sigmas,
    *,
    key: Optional[jax.Array] = None,
    eta: float = 1.0,
    s_noise: float = 1.0,
    solver_type: str = "midpoint",
    progress_cb=None,
) -> Array:
    if solver_type not in {"heun", "midpoint"}:
        raise ValueError("solver_type must be 'heun' or 'midpoint'")
    sig = _check_sigmas(sigmas)
    n = len(sig) - 1
    keys = _keys(key, n)
    x = x.astype(jnp.float32)

    with np.errstate(divide="ignore"):
        t = -np.log(sig)
    h = t[1:] - t[:-1]                      # h[-1] = inf on final step
    eta_h = eta * h
    with np.errstate(invalid="ignore", over="ignore"):
        A = sig[1:] / sig[:-1] * np.exp(-eta_h)     # final: 0
        B = -np.expm1(-h - eta_h)                    # final: 1
        noise_scale = sig[1:] * np.sqrt(-np.expm1(-2 * eta_h)) * s_noise if eta \
            else np.zeros(n)
        r_inv = np.zeros(n)
        r_inv[1:] = h[1:] / h[:-1]                   # 1/r = h/h_last
        if solver_type == "midpoint":
            C = 0.5 * B * r_inv
        else:  # heun
            with np.errstate(invalid="ignore"):
                C = (B / (-h - eta_h) + 1.0) * r_inv
    # first step has no old_denoised; final step is x = denoised:
    C[0] = 0.0
    A[-1] = 0.0
    B[-1] = 1.0
    C[-1] = 0.0
    noise_scale[-1] = 0.0
    np.nan_to_num(A, copy=False); np.nan_to_num(B, copy=False)
    np.nan_to_num(C, copy=False); np.nan_to_num(noise_scale, copy=False)

    def body(carry, per):
        xi, od = carry
        s_i, Ai, Bi, Ci, nsi, k, i = per
        den = denoise(xi, s_i).astype(jnp.float32)
        xi = Ai * xi + Bi * den + Ci * (den - od)
        xi = xi + _noise(k[0], xi) * nsi
        _report(progress_cb, i)
        return (xi, den), None

    xs = (
        _f32(sig[:-1]), _f32(A), _f32(B), _f32(C), _f32(noise_scale),
        keys, jnp.arange(n),
    )
    (x, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), xs)
    return x


# ---------------------------------------------------------------------------
# DPM++ 3M SDE — two peeled warmup steps + uniform scan
# ---------------------------------------------------------------------------

@SAMPLERS.register("DPM++ 3M SDE")
def sample_dpmpp_3m_sde(
    denoise: DenoiseFn,
    x: Array,
    sigmas,
    *,
    key: Optional[jax.Array] = None,
    eta: float = 1.0,
    s_noise: float = 1.0,
    progress_cb=None,
) -> Array:
    sig = _check_sigmas(sigmas)
    n = len(sig) - 1
    keys = _keys(key, n)
    x = x.astype(jnp.float32)

    with np.errstate(divide="ignore"):
        t = -np.log(sig)
    h = t[1:] - t[:-1]
    h_eta = h * (eta + 1)
    with np.errstate(over="ignore", invalid="ignore"):
        E = np.exp(-h_eta)                           # final: 0
        B = -np.expm1(-h_eta)                        # final: 1
        phi2 = np.expm1(-h_eta) / h_eta + 1.0
        phi3 = phi2 / h_eta - 0.5
        noise_scale = sig[1:] * np.sqrt(-np.expm1(-2 * h * eta)) * s_noise if eta \
            else np.zeros(n)
        r0 = np.zeros(n); r1 = np.zeros(n)
        r0[1:] = h[:-1] / h[1:]
        r1[2:] = h[:-2] / h[2:]
    E[-1] = 0.0; B[-1] = 1.0
    phi2[-1] = 0.0; phi3[-1] = 0.0; noise_scale[-1] = 0.0
    for arr in (E, B, phi2, phi3, noise_scale, r0, r1):
        np.nan_to_num(arr, copy=False)

    # peel step 0 (no history) and step 1 (first-order correction)
    den0 = denoise(x, jnp.float32(sig[0])).astype(jnp.float32)
    x = float(E[0]) * x + float(B[0]) * den0
    x = x + _noise(keys[0, 0], x) * float(noise_scale[0])
    _report(progress_cb, 0)
    den_1, den_2 = den0, jnp.zeros_like(den0)

    if n > 1:
        den1 = denoise(x, jnp.float32(sig[1])).astype(jnp.float32)
        x = float(E[1]) * x + float(B[1]) * den1
        if phi2[1] != 0.0:  # not the final step
            d = (den1 - den_1) / float(r0[1])
            x = x + float(phi2[1]) * d
        x = x + _noise(keys[1, 0], x) * float(noise_scale[1])
        _report(progress_cb, 1)
        den_2, den_1 = den_1, den1

    if n > 2:
        # fold all 1/r divisions into host coefficients, zeroed at the
        # final step (where phi2=phi3=0) so no inf*0 appears on device
        with np.errstate(divide="ignore", invalid="ignore"):
            u0 = np.where(r0 > 0, 1.0 / r0, 0.0)
            u1 = np.where(r1 > 0, 1.0 / r1, 0.0)
            inv_sum = np.where(r0 + r1 > 0, 1.0 / (r0 + r1), 0.0)
        w_r = r0 * inv_sum

        def body(carry, per):
            xi, d1_, d2_ = carry
            s_i, Ei, Bi, p2, p3, u0i, u1i, wri, invsi, nsi, k, i = per
            den = denoise(xi, s_i).astype(jnp.float32)
            xi = Ei * xi + Bi * den
            d1_0 = (den - d1_) * u0i
            d1_1 = (d1_ - d2_) * u1i
            dd1 = d1_0 + (d1_0 - d1_1) * wri
            dd2 = (d1_0 - d1_1) * invsi
            xi = xi + p2 * dd1 - p3 * dd2
            xi = xi + _noise(k[0], xi) * nsi
            _report(progress_cb, i)
            return (xi, den, d1_), None

        xs = (
            _f32(sig[2:-1]), _f32(E[2:]), _f32(B[2:]), _f32(phi2[2:]),
            _f32(phi3[2:]), _f32(u0[2:]), _f32(u1[2:]), _f32(w_r[2:]),
            _f32(inv_sum[2:]), _f32(noise_scale[2:]),
            keys[2:], jnp.arange(2, n),
        )
        (x, _, _), _ = jax.lax.scan(body, (x, den_1, den_2), xs)

    return x


# UI-name -> (sampler fn, schedule kind) table mirroring the reference
# registry (utils/sampler_utils.py:21-67 + k_diffusion_samplers.py
# compute_sigmas overrides). Schedule "model" = discrete model schedule,
# "karras" = Karras(rho=7) over the model's [sigma_min, sigma_max].
SAMPLER_SCHEDULE = {
    "Euler": "model",
    "Euler A": "model",
    "Heun": "model",
    "DPM2": "karras",
    "DPM2 A": "karras",
    "LMS": "model",
    "DPM++ 2S A": "karras",
    "DPM++ SDE": "karras",
    "DPM++ 2M": "karras",
    "DPM++ 2M SDE": "karras",
    "DPM++ 3M SDE": "karras",
}
