"""sgm-style EDM sampling stack for SDXL/SVD.

Behavior contract (reference `modules/sdxl/sgm/modules/diffusionmodules/`):
- discretizer.py: LegacyDDPMDiscretization (linspace-int timestep subset
  of the 1000-step DDPM table) and EDMDiscretization (Karras rho-ramp);
- denoiser.py DiscreteDenoiser: sigma quantized to the nearest table
  entry, c_noise = table index; denoiser_scaling.py Eps/V/EDM scalings;
- sampling.py: x is scaled by sqrt(1 + sigma0^2) in
  prepare_sampling_loop; sampler menu EulerEDM / HeunEDM /
  EulerAncestral / DPMPP2SAncestral / DPMPP2M / LinearMultistep — these
  share algorithms with k-diffusion, so the scan programs in
  samplers/kdiffusion.py are reused;
- guiders.py: VanillaCFG / IdentityGuider / LinearPredictionGuider /
  TrianglePredictionGuider (per-frame CFG scales for video).

All sgm conditionings are dicts {"crossattn", "vector", "concat"};
guider input-prep concatenates [uc, c] per key along batch.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.core.registry import DISCRETIZATIONS, GUIDERS
from cremage_tpu.samplers import kdiffusion as K
from cremage_tpu.samplers import schedules as S

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# discretizations
# ---------------------------------------------------------------------------

def generate_roughly_equally_spaced_steps(n: int, max_step: int) -> np.ndarray:
    return np.linspace(max_step - 1, 0, n, endpoint=False).astype(int)[::-1]


@DISCRETIZATIONS.register("LegacyDDPMDiscretization")
class LegacyDDPMDiscretization:
    def __init__(self, linear_start: float = 0.00085, linear_end: float = 0.0120,
                 num_timesteps: int = 1000, **_ignored):
        self.num_timesteps = num_timesteps
        self.alphas_cumprod = S.make_alphas_cumprod(
            num_timesteps, linear_start, linear_end
        )

    def get_sigmas(self, n: int) -> np.ndarray:
        """Ascending-in-t table subset, returned descending (flip)."""
        if n < self.num_timesteps:
            ts = generate_roughly_equally_spaced_steps(n, self.num_timesteps)
            acp = self.alphas_cumprod[ts]
        elif n == self.num_timesteps:
            acp = self.alphas_cumprod
        else:
            raise ValueError(f"n={n} > num_timesteps")
        sigmas = np.sqrt((1 - acp) / acp)
        return sigmas[::-1].copy()

    def __call__(self, n: int, do_append_zero: bool = True) -> np.ndarray:
        s = self.get_sigmas(n)
        return S.append_zero(s) if do_append_zero else s


@DISCRETIZATIONS.register("EDMDiscretization")
class EDMDiscretization:
    def __init__(self, sigma_min: float = 0.002, sigma_max: float = 80.0,
                 rho: float = 7.0, **_ignored):
        self.sigma_min, self.sigma_max, self.rho = sigma_min, sigma_max, rho

    def get_sigmas(self, n: int) -> np.ndarray:
        ramp = np.linspace(0, 1, n)
        lo = self.sigma_min ** (1 / self.rho)
        hi = self.sigma_max ** (1 / self.rho)
        return (hi + ramp * (lo - hi)) ** self.rho

    def __call__(self, n: int, do_append_zero: bool = True) -> np.ndarray:
        s = self.get_sigmas(n)
        return S.append_zero(s) if do_append_zero else s


def make_discretization(name: str, **kwargs):
    return DISCRETIZATIONS.get(name)(**kwargs)


# ---------------------------------------------------------------------------
# scalings + discrete denoiser
# ---------------------------------------------------------------------------

def eps_scaling(sigma):
    return (jnp.ones_like(sigma), -sigma,
            1.0 / jnp.sqrt(sigma**2 + 1.0), sigma)


def v_scaling(sigma):
    return (1.0 / (sigma**2 + 1.0), -sigma / jnp.sqrt(sigma**2 + 1.0),
            1.0 / jnp.sqrt(sigma**2 + 1.0), sigma)


def edm_scaling(sigma, sigma_data: float = 0.5):
    return (
        sigma_data**2 / (sigma**2 + sigma_data**2),
        sigma * sigma_data / jnp.sqrt(sigma**2 + sigma_data**2),
        1.0 / jnp.sqrt(sigma**2 + sigma_data**2),
        0.25 * jnp.log(sigma),
    )


SCALINGS = {
    "EpsScaling": eps_scaling,
    "VScaling": v_scaling,
    "EDMScaling": edm_scaling,
}


def _append_dims(x, ndim):
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


class DiscreteDenoiserSGM:
    """sgm DiscreteDenoiser semantics: quantize sigma to the model's
    discrete table, feed the table index as the network timestep."""

    def __init__(
        self,
        network: Callable,   # network(x, t, cond) -> model output
        sigmas: np.ndarray,  # ascending table (flip=True in reference)
        scaling: str = "EpsScaling",
        quantize_c_noise: bool = True,
    ):
        self.network = network
        # reference stores the table flipped: sigmas[0]=sigma_max ... keep
        # ascending here and mirror index math accordingly.
        self.sigmas_desc = jnp.asarray(np.asarray(sigmas)[::-1].copy(),
                                       jnp.float32)
        self.num_idx = len(sigmas)
        self.scaling = SCALINGS[scaling]
        self.quantize_c_noise = quantize_c_noise

    def sigma_to_idx(self, sigma: Array) -> Array:
        dists = sigma[None, :] - self.sigmas_desc[:, None]
        return jnp.argmin(jnp.abs(dists), axis=0)

    def idx_to_sigma(self, idx: Array) -> Array:
        return self.sigmas_desc[idx]

    def __call__(self, x: Array, sigma, cond: Any, **kw) -> Array:
        sigma = jnp.asarray(sigma, jnp.float32)
        if sigma.ndim == 0:
            sigma = jnp.broadcast_to(sigma, (x.shape[0],))
        idx = self.sigma_to_idx(sigma)
        sigma_q = self.idx_to_sigma(idx)
        c_skip, c_out, c_in, c_noise = self.scaling(sigma_q)
        if self.quantize_c_noise:
            # reference maps c_noise back through sigma_to_idx: for
            # EpsScaling c_noise == sigma_q so this is just idx
            c_noise = self.sigma_to_idx(c_noise).astype(jnp.float32)
        out = self.network(x * _append_dims(c_in, x.ndim), c_noise, cond, **kw)
        # network may return (out, aux) — deep-cache capture mode
        aux = None
        if isinstance(out, tuple):
            out, aux = out
        out = out.astype(jnp.float32)
        den = out * _append_dims(c_out, x.ndim) + x * _append_dims(c_skip, x.ndim)
        return den if aux is None else (den, aux)


# ---------------------------------------------------------------------------
# guiders — compose a raw denoiser(x, sigma, cond) into denoise(x, sigma)
# ---------------------------------------------------------------------------

def _cat_conds(uc: Dict, c: Dict) -> Dict:
    out = {}
    for k in c:
        if k in ("vector", "crossattn", "concat"):
            out[k] = jnp.concatenate([uc[k], c[k]], axis=0)
        else:
            out[k] = c[k]
    return out


@GUIDERS.register("VanillaCFG")
def vanilla_cfg(denoiser: Callable, c: Dict, uc: Dict, scale: float,
                interval=None, **_ignored) -> Callable:
    """sgm VanillaCFG (guiders.py:24). `interval=(lo, hi)` restricts
    guidance to lo <= sigma <= hi (Kynkäänniemi et al. 2024); outside, a
    lax.cond runs the conditional model alone on the single batch, so the
    uncond half of the EDM step is genuinely skipped."""
    cond_in = _cat_conds(uc, c)

    def denoise(x, sigma, **kw):
        b = x.shape[0]
        sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (b,))

        def with_cfg(xx):
            d = denoiser(jnp.concatenate([xx, xx], axis=0),
                         jnp.concatenate([sigma, sigma], axis=0),
                         cond_in, **kw)
            aux = None
            if isinstance(d, tuple):  # deep-cache capture aux rides along
                d, aux = d
            d_u, d_c = d[:b], d[b:]
            out = d_u + scale * (d_c - d_u)
            return out if aux is None else (out, aux)

        if interval is None:
            return with_cfg(x)

        def cond_only(xx):
            d = denoiser(xx, sigma, c, **kw)
            if isinstance(d, tuple):
                raise ValueError(
                    "cfg interval does not compose with aux-returning "
                    "model modes (deep_cache)")
            return d

        lo, hi = float(interval[0]), float(interval[1])
        s = jnp.max(sigma)
        pred = jnp.logical_and(s >= lo, s <= hi)
        return jax.lax.cond(pred, with_cfg, cond_only, x)

    return denoise


@GUIDERS.register("IdentityGuider")
def identity_guider(denoiser: Callable, c: Dict, uc: Dict, scale: float = 1.0,
                    **_ignored) -> Callable:
    def denoise(x, sigma, **kw):
        b = x.shape[0]
        sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (b,))
        # kw (e.g. deep-cache mode/deep) passes through; a (den, aux)
        # tuple return passes through unsplit (single batch, no CFG)
        return denoiser(x, sigma, c, **kw)

    return denoise


def _frame_scaled_cfg(denoiser, c, uc, scales_per_frame: np.ndarray,
                      num_frames: int) -> Callable:
    cond_in = _cat_conds(uc, c)
    sc = jnp.asarray(scales_per_frame, jnp.float32)

    def denoise(x, sigma, **kw):
        b = x.shape[0]
        sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (b,))
        d = denoiser(jnp.concatenate([x, x], axis=0),
                     jnp.concatenate([sigma, sigma], axis=0), cond_in, **kw)
        aux = None
        if isinstance(d, tuple):  # deep-cache capture aux rides along
            d, aux = d
        d_u, d_c = d[:b], d[b:]
        nb = b // num_frames
        shp = (nb, num_frames) + d_u.shape[1:]
        du = d_u.reshape(shp)
        dc = d_c.reshape(shp)
        scale = sc.reshape((1, num_frames) + (1,) * (len(shp) - 2))
        out = (du + scale * (dc - du)).reshape(d_u.shape)
        return out if aux is None else (out, aux)

    return denoise


@GUIDERS.register("LinearPredictionGuider")
def linear_prediction_guider(
    denoiser, c, uc, scale: float, num_frames: int = 1,
    min_scale: float = 1.0, max_scale: Optional[float] = None, **_ignored
) -> Callable:
    max_scale = scale if max_scale is None else max_scale
    scales = np.linspace(min_scale, max_scale, num_frames)
    return _frame_scaled_cfg(denoiser, c, uc, scales, num_frames)


@GUIDERS.register("TrianglePredictionGuider")
def triangle_prediction_guider(
    denoiser, c, uc, scale: float, num_frames: int = 1,
    min_scale: float = 1.0, max_scale: Optional[float] = None,
    period: Union[float, List[float]] = 1.0, period_fusing: str = "max",
    **_ignored
) -> Callable:
    max_scale = scale if max_scale is None else max_scale
    values = np.linspace(0, 1, num_frames)
    periods = [period] if isinstance(period, (int, float)) else list(period)
    waves = []
    for p in periods:
        # triangle wave in [0,1] with given period (reference guiders.py
        # TrianglePredictionGuider triangle_wave)
        waves.append(2 * np.abs(values / p - np.floor(values / p + 0.5)))
    w = np.stack(waves)
    if period_fusing == "mean":
        fused = w.mean(0)
    elif period_fusing == "multiply":
        fused = np.prod(w, axis=0)
    else:
        fused = w.max(0)
    scales = fused * (max_scale - min_scale) + min_scale
    return _frame_scaled_cfg(denoiser, c, uc, scales, num_frames)


# ---------------------------------------------------------------------------
# sampler entry points (sgm names); algorithms reuse the kdiffusion scans
# ---------------------------------------------------------------------------

SGM_SAMPLER_FNS = {
    "EulerEDMSampler": K.sample_euler,
    "HeunEDMSampler": K.sample_heun,
    "EulerAncestralSampler": K.sample_euler_ancestral,
    "DPMPP2SAncestralSampler": K.sample_dpmpp_2s_ancestral,
    "DPMPP2MSampler": K.sample_dpmpp_2m,
    "LinearMultistepSampler": K.sample_lms,
}

SGM_SAMPLER_NAMES = list(SGM_SAMPLER_FNS)


def run_sgm_sampler(
    sampler_name: str,
    denoise: Callable,     # guided denoise(x, sigma)
    x: Array,              # N(0,1) latent noise
    sigmas: np.ndarray,    # descending, with trailing 0
    *,
    key: Optional[jax.Array] = None,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
    s_noise: float = 1.0,
    eta: float = 1.0,
    order: int = 4,
    scale_input: bool = True,
    progress_cb=None,
) -> Array:
    """Apply sgm's prepare_sampling_loop input scaling then the sampler.

    sgm scales the unit-normal input by sqrt(1 + sigma0^2)
    (sampling.py prepare_sampling_loop), unlike k-diffusion's x*sigma0.
    For img2img (`do_img2img`), pass the already-noised latent with
    scale_input=False.
    """
    sig = np.asarray(sigmas, np.float64)
    if scale_input:
        x = x.astype(jnp.float32) * float(np.sqrt(1.0 + sig[0] ** 2))
    fn = SGM_SAMPLER_FNS[sampler_name]
    kwargs = {}
    if sampler_name in ("EulerEDMSampler", "HeunEDMSampler"):
        kwargs = dict(s_churn=s_churn, s_tmin=s_tmin, s_tmax=s_tmax,
                      s_noise=s_noise)
    elif sampler_name in ("EulerAncestralSampler", "DPMPP2SAncestralSampler"):
        kwargs = dict(eta=eta, s_noise=s_noise)
    elif sampler_name == "LinearMultistepSampler":
        kwargs = dict(order=order)
    return fn(denoise, x, sig, key=key, progress_cb=progress_cb, **kwargs)
