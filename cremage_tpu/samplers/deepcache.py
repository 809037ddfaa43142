"""DeepCache: reuse deep UNet features across denoising steps.

An opt-in speed feature BEYOND reference parity (the reference
HowToSD/cremage has no equivalent; its perf levers are CPU offload and
fp8 quantization, `modules/flux/txt2img.py:56-70`).  Algorithm after
"DeepCache: Accelerating Diffusion Models for Free" (Ma et al. 2023):
adjacent denoising steps produce highly similar *deep* UNet features, so
every `interval`-th step runs the full UNet and caches the hidden state
at a shallow/deep boundary (`UNetModel(mode="capture")`), while the
steps in between recompute only the shallow levels and splice the cached
deep tensor back in (`mode="shallow"`).

TPU-first shape: the full/shallow choice is a `lax.cond` inside the one
scanned sampler program — both branches are compiled once, exactly one
executes per step, and the cached deep feature is part of the scan
carry, so the whole run stays a single XLA program with static shapes.

Quality: interval=2 (every other step cached) is visually near-lossless
in the paper's measurements; larger intervals trade quality for speed.
Exactness contract: interval=1 is bit-identical to the plain sampler
(tests/test_deepcache.py proves it), and the feature is off by default.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.samplers.kdiffusion import (
    _ancestral_step_np, _check_sigmas, _f32, _keys, _noise, _report, _to_d,
)

Array = jnp.ndarray

# Carry-threading denoise protocol:
#   carry_denoise(x, sigma, cache, step_idx) -> (denoised_f32, cache)


def make_dc_denoise(
    denoise_capture: Callable,   # (x, sigma) -> (denoised, deep)
    denoise_shallow: Callable,   # (x, sigma, deep=...) -> denoised
    interval: int,
) -> Callable:
    """Compose capture/shallow CFG'd denoisers into a carry denoiser.

    Step i runs the full UNet (and refreshes the cache) iff
    i % interval == 0; step 0 therefore never reads the initial cache
    value, which only has to be shape/dtype-correct (zeros).
    """
    assert interval >= 1

    def carry_denoise(x, sigma, cache, i):
        if interval == 1:
            den, deep = denoise_capture(x, sigma)
            return den.astype(jnp.float32), deep

        def full(_):
            den, deep = denoise_capture(x, sigma)
            return den.astype(jnp.float32), deep

        def shallow(_):
            den = denoise_shallow(x, sigma, deep=cache)
            return den.astype(jnp.float32), cache

        return jax.lax.cond(i % interval == 0, full, shallow, None)

    return carry_denoise


def window_flags(sigmas, cfg_window) -> np.ndarray:
    """Per-step guidance-window membership from the HOST sigma schedule
    (Kynkäänniemi et al. 2024 guidance interval): step i applies CFG iff
    lo <= sigmas[i] <= hi.  Static at trace time — sigmas are always
    host-precomputed numpy in this codebase, and they are monotonically
    decreasing, so the in-window steps form one contiguous run."""
    lo, hi = float(cfg_window[0]), float(cfg_window[1])
    sig = np.asarray(sigmas, np.float64)[:-1]
    return (sig >= lo) & (sig <= hi)


def make_dc_denoise_windowed(
    denoise_capture: Callable,   # CFG'd:       (x, sigma) -> (den, deep@2B)
    denoise_shallow: Callable,   # CFG'd:       (x, sigma, deep=) -> den
    cond_capture: Callable,      # cond-only:   (x, sigma) -> (den, deep@B)
    cond_shallow: Callable,      # cond-only:   (x, sigma, deep=) -> den
    interval: int,
    window: np.ndarray,          # bool per step (window_flags)
    batch: int,                  # undoubled batch B
) -> Callable:
    """DeepCache carry denoiser with a guidance interval: in-window
    steps run the CFG'd capture/shallow pair on the doubled [uncond;
    cond] batch; out-of-window steps run the conditional model ALONE on
    the single batch (the Kynkäänniemi guidance-interval skip), reading/
    writing only the cond half of the 2B cache.

    Cache coherence: the carry stays at the doubled batch the whole run
    ([uncond; cond] halves, uncond first — reference ordering).  A
    cond-only capture refreshes the cond half and leaves the uncond half
    stale — safe because it is only ever read by an in-window shallow
    step, and the first in-window step is FORCED to be a capture (the
    host-computed schedule below), which refreshes both halves.  All
    flags are host-precomputed numpy indexed by the step counter, so the
    whole run stays one scanned XLA program; exactly one of the four
    branches executes per step.
    """
    assert interval >= 1
    window = np.asarray(window, bool)
    n = len(window)
    cap_np = np.arange(n) % interval == 0
    # force capture at window entry: the 2B capture refreshes the stale
    # uncond cache half before any in-window shallow step can read it
    prev_in = np.concatenate([[False], window[:-1]])
    cap_np |= window & ~prev_in
    in_w_arr = jnp.asarray(window)
    cap_arr = jnp.asarray(cap_np)

    def carry_denoise(x, sigma, cache, i):
        def cfg_branch(_):
            def full(_):
                den, deep = denoise_capture(x, sigma)
                return den.astype(jnp.float32), deep

            def shallow(_):
                den = denoise_shallow(x, sigma, deep=cache)
                return den.astype(jnp.float32), cache

            return jax.lax.cond(cap_arr[i], full, shallow, None)

        def cond_branch(_):
            def full(_):
                den, deep_c = cond_capture(x, sigma)
                new_cache = jnp.concatenate(
                    [cache[:batch], deep_c.astype(cache.dtype)], axis=0)
                return den.astype(jnp.float32), new_cache

            def shallow(_):
                den = cond_shallow(x, sigma, deep=cache[batch:])
                return den.astype(jnp.float32), cache

            return jax.lax.cond(cap_arr[i], full, shallow, None)

        return jax.lax.cond(in_w_arr[i], cfg_branch, cond_branch, None)

    return carry_denoise


def sample_euler_dc(
    carry_denoise: Callable,
    cache0: Array,
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
    """Euler (Karras Alg. 2) with a deep-feature cache in the scan carry.

    Identical math/keys to kdiffusion.sample_euler — with interval=1 the
    trajectory is bit-identical (differential-tested)."""
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
    keys = _keys(key, n)
    x = x.astype(jnp.float32)

    def body(carry, per):
        xi, cache = carry
        s_hat, dti, churn, k, i = per
        xi = xi + _noise(k[0], xi) * s_noise * churn
        den, cache = carry_denoise(xi, s_hat, cache, i)
        d = _to_d(xi, s_hat, den)
        _report(progress_cb, i)
        return (xi + d * dti, cache), None

    xs = (_f32(sigma_hat), _f32(dt), _f32(churn_scale), keys, jnp.arange(n))
    (x, _), _ = jax.lax.scan(body, (x, cache0), xs)
    return x


def sample_euler_ancestral_dc(
    carry_denoise: Callable,
    cache0: Array,
    x: Array,
    sigmas,
    *,
    key: Optional[jax.Array] = None,
    eta: float = 1.0,
    s_noise: float = 1.0,
    progress_cb=None,
) -> Array:
    """Euler-ancestral with a deep-feature cache in the scan carry."""
    sig = _check_sigmas(sigmas)
    n = len(sig) - 1
    downs, ups = zip(*[_ancestral_step_np(sig[i], sig[i + 1], eta)
                       for i in range(n)])
    keys = _keys(key, n)
    x = x.astype(jnp.float32)

    def body(carry, per):
        xi, cache = carry
        s_i, s_down, s_up, k, i = per
        den, cache = carry_denoise(xi, s_i, cache, i)
        d = _to_d(xi, s_i, den)
        xi = xi + d * (s_down - s_i)
        xi = xi + _noise(k[0], xi) * s_noise * s_up
        _report(progress_cb, i)
        return (xi, cache), None

    xs = (_f32(sig[:-1]), _f32(np.array(downs)), _f32(np.array(ups)), keys,
          jnp.arange(n))
    (x, _), _ = jax.lax.scan(body, (x, cache0), xs)
    return x


def sample_dpmpp_2m_dc(
    carry_denoise: Callable,
    cache0: Array,
    x: Array,
    sigmas,
    *,
    key: Optional[jax.Array] = None,
    progress_cb=None,
) -> Array:
    """DPM++ 2M multistep with a deep-feature cache in the scan carry.

    Same host-precomputed coefficients and three-phase structure as
    kdiffusion.sample_dpmpp_2m (first step and last step outside the
    scan); the cache threads through all three phases, so step 0 is
    always a full (capture) step and the final step follows the
    interval like any other.  interval=1 is bit-identical to the plain
    sampler (differential-tested)."""
    del key  # deterministic sampler; kept for the uniform signature
    sig = _check_sigmas(sigmas)
    n = len(sig) - 1
    x = x.astype(jnp.float32)

    with np.errstate(divide="ignore"):
        t = -np.log(sig)
    h = t[1:] - t[:-1]
    a = sig[1:] / sig[:-1]
    e = np.expm1(-h)
    with np.errstate(invalid="ignore"):
        r = np.concatenate([[np.nan], h[:-1] / h[1:]])

    den, cache = carry_denoise(x, jnp.float32(sig[0]), cache0,
                               jnp.asarray(0))
    x = float(a[0]) * x - float(e[0]) * den
    _report(progress_cb, 0)
    old_den = den

    if n > 2:
        coef = 1.0 / (2.0 * r[1:-1])

        def body(carry, per):
            xi, od, cc = carry
            s_i, ai, ei, ci, i = per
            den, cc = carry_denoise(xi, s_i, cc, i)
            den_d = (1 + ci) * den - ci * od
            xi = ai * xi - ei * den_d
            _report(progress_cb, i)
            return (xi, den, cc), None

        xs = (
            _f32(sig[1:-2]), _f32(a[1:-1]), _f32(e[1:-1]), _f32(coef),
            jnp.arange(1, n - 1),
        )
        (x, old_den, cache), _ = jax.lax.scan(body, (x, old_den, cache), xs)

    if n > 1:
        # final step: sigma_next == 0 -> no correction, x = denoised
        den, cache = carry_denoise(x, jnp.float32(sig[-2]), cache,
                                   jnp.asarray(n - 1))
        x = float(a[-1]) * x - float(e[-1]) * den
        _report(progress_cb, n - 1)
    return x


def sample_flow_euler_dc(
    carry_v: Callable,        # (x, sigma, cache, i) -> (velocity_f32, cache)
    cache0: Array,
    x: Array,
    sigmas,
    *,
    key: Optional[jax.Array] = None,
    progress_cb=None,
) -> Array:
    """Rectified-flow Euler with a deep-feature cache in the scan carry.

    Same host-precomputed (sigma, dt) arrays as flow.sample_flow_euler;
    interval=1 is bit-identical to the plain sampler (differential-
    tested).  Drives the DiT families' Δ-cache (SD3 / FLUX)."""
    del key  # deterministic; kept for the uniform DC sampler signature
    sig = np.asarray(sigmas, np.float64)
    n = len(sig) - 1
    x = x.astype(jnp.float32)

    def body(carry, per):
        xi, cache = carry
        s_i, dt, i = per
        v, cache = carry_v(xi, s_i, cache, i)
        _report(progress_cb, i)
        return (xi + dt * v, cache), None

    xs = (
        jnp.asarray(sig[:-1], jnp.float32),
        jnp.asarray(np.diff(sig), jnp.float32),
        jnp.arange(n),
    )
    (x, _), _ = jax.lax.scan(body, (x, cache0), xs)
    return x


DC_SAMPLERS = {
    "Euler": sample_euler_dc,
    "Euler A": sample_euler_ancestral_dc,
    "DPM++ 2M": sample_dpmpp_2m_dc,
    # sgm names (SDXL menu) map onto the same scans
    "EulerEDMSampler": sample_euler_dc,
    "EulerAncestralSampler": sample_euler_ancestral_dc,
    "DPMPP2MSampler": sample_dpmpp_2m_dc,
}


def max_cache_levels(model) -> int:
    """Deepest legal cache_levels for a UNet-family model, from its
    config's level list (cache_levels must stay below the level count).
    Pipelines clamp the user's deep_cache_branch with this so one knob
    works across architectures with different depths."""
    cfg = getattr(model, "cfg", None)
    for attr in ("c_hidden", "channel_mult", "block_out_channels"):
        levels = getattr(cfg, attr, None)
        if levels is not None:
            return max(1, len(levels) - 1)
    return 1


def deep_cache_shape(unet, params, x, t, context, y=None,
                     cache_levels: int = 1):
    """Static shape/dtype of the deep cache for a given call signature
    (evaluated abstractly — no compute). The cache carries the CFG-
    doubled batch, so pass the doubled x/context the model will see."""
    _, deep = jax.eval_shape(
        lambda p, xx, tt, cc, yy: unet.apply(
            p, xx, tt, cc, yy, mode="capture", cache_levels=cache_levels),
        params, x, t, context, y)
    return deep.shape, deep.dtype
