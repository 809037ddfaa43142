"""Adaptive step caching: data-driven full-model skip across steps.

An opt-in speed feature BEYOND reference parity (HowToSD/cremage has no
equivalent; its perf levers are CPU offload and fp8 quantization,
`modules/flux/txt2img.py:56-70`).  Algorithm in the TeaCache family
("Timestep Embedding Aware Cache", Liu et al. 2024, arXiv:2411.19108):
adjacent denoising steps with a small relative change in the model input
produce nearly identical noise predictions, so the indicator

    rel_i = mean|u_i - u_{i-1}| / mean|u_{i-1}|       (u = model input)

is accumulated across steps, and while the running total stays below a
user threshold the ENTIRE denoiser is skipped — the previous step's
noise prediction (k-space) or velocity (flow) is reused.  When the
accumulator crosses the threshold the full model runs and the
accumulator resets.  Unlike DeepCache (fixed every-`interval` schedule,
shallow levels still run on cached steps) the schedule here is decided
at RUNTIME from the trajectory itself, and a skipped step costs a few
elementwise ops, not a shallow UNet pass.

TPU-first shape: the skip/full choice is a `lax.cond` inside the one
scanned sampler program — the decision is a traced scalar computed
on-device, both branches are compiled once, exactly one executes per
step, and the cached prediction + previous input + accumulator ride the
scan carry as a small pytree (two latent-sized tensors + a scalar; the
carry_denoise protocol of samplers/deepcache.py's DC scans treats the
cache opaquely, so the existing Euler / Euler A / DPM++ 2M / flow-Euler
cache-threading scans drive this feature unchanged).

Differences from the paper, documented: the indicator uses the raw
model input u = c_in(sigma)·x (the paper's ablation baseline) rather
than the first-block timestep-MODULATED input — it needs no fitting
and is exact to compute.  The paper's per-model polynomial rescaling
of the indicator IS supported as an optional calibrated path:
`make_ada_denoise(..., rescale=coeffs)` applies a fitted
input-change -> output-change polynomial (clamped at 0), and
`tools/fit_adacache.py` fits those coefficients from exact
trajectories on a real checkpoint into
`~/.cremage_tpu/adacache_calib.json`, which the pipelines load per
family automatically (identity / bit-identical to uncalibrated when
the file or family entry is absent).  Step 0 and the final step are
always full (the paper's boundary rule).

Exactness contract: threshold=0 never skips and is bit-identical to the
plain sampler (tests/test_adacache.py proves it); the feature is off by
default.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def ada_cache0(x: Array) -> dict:
    """Initial carry cache for make_ada_denoise: cached prediction `d`,
    previous model input `u`, and the accumulated relative change
    `acc`.  Step 0 is always a full step, so the zero init is never
    *read* — it only has to be shape/dtype-correct."""
    z = jnp.zeros(x.shape, jnp.float32)
    return {"d": z, "u": z, "acc": jnp.float32(0.0)}


def load_calibration(family: str, path: str | None = None):
    """Fitted per-family rescale polynomial coefficients (highest power
    first, numpy polyfit order) from the calibration registry JSON that
    tools/fit_adacache.py writes — or None when the family has no
    calibration yet (the identity indicator is used, exactly the
    uncalibrated behavior)."""
    import json
    import os

    p = path or os.environ.get(
        "CREMAGE_ADACACHE_CALIB",
        os.path.join(os.path.expanduser("~"), ".cremage_tpu",
                     "adacache_calib.json"))
    try:
        with open(p) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return None
    coeffs = data.get(family)
    if not coeffs:
        return None
    return tuple(float(c) for c in coeffs)


def make_ada_denoise(
    denoise: Callable,        # CFG'd: (x, sigma) -> den_f32 (or velocity)
    threshold: float,
    n_steps: int,
    *,
    kind: str = "den",        # "den": k-space denoised; "flow": velocity
    sigma_data: float = 1.0,
    rescale: tuple | None = None,   # polyfit coeffs: rel -> est. output change
) -> Callable:
    """Wrap a plain CFG'd denoiser into the carry-denoise protocol
    (x, sigma, cache, i) -> (prediction_f32, cache) with adaptive
    full-model skipping.

    kind="den" (k-diffusion denoised protocol): the cache stores the
    noise-prediction direction d = (x - den)/sigma; a skipped step
    reconstructs den = x - sigma·d — exact eps reuse, so the sampler
    math downstream (`_to_d`, ancestral noise, DPM++ multistep history)
    is untouched.  kind="flow" (rectified-flow velocity protocol): the
    velocity is cached and reused directly.

    The skip decision, indicator, and accumulator are all traced
    scalars; the host contributes only the forced-full mask (step 0 and
    the last step), so the whole run remains one scanned XLA program.
    """
    if kind not in ("den", "flow"):
        raise ValueError(f"kind must be 'den' or 'flow', got {kind!r}")
    if threshold < 0:
        raise ValueError(f"threshold must be >= 0, got {threshold}")
    force_np = np.zeros(max(int(n_steps), 1), bool)
    force_np[0] = True
    force_np[-1] = True
    force = jnp.asarray(force_np)
    thresh = jnp.float32(threshold)

    def carry_denoise(x, sigma, cache, i):
        x = x.astype(jnp.float32)
        sig = jnp.asarray(sigma, jnp.float32)
        if kind == "den":
            c_in = 1.0 / jnp.sqrt(sig**2 + sigma_data**2)
            u = x * c_in
        else:
            u = x  # flow latents are bounded; no input preconditioner
        rel = jnp.sum(jnp.abs(u - cache["u"])) / (
            jnp.sum(jnp.abs(cache["u"])) + 1e-12)
        if rescale is not None:
            # calibrated indicator (TeaCache's polynomial rescale): map
            # the input change to the FITTED estimate of the true output
            # change, so the threshold is in output-change units.
            # Coefficients are host floats (tools/fit_adacache.py);
            # clamp at 0 — a negative estimate would roll the
            # accumulator backwards.
            rel = jnp.maximum(
                jnp.polyval(jnp.asarray(rescale, jnp.float32), rel), 0.0)
        acc2 = cache["acc"] + rel
        # NaN-safe ordering: a NaN acc2 (step 0's zero-divide guard
        # notwithstanding) compares False, selecting the full branch.
        skip = jnp.logical_and(acc2 < thresh, jnp.logical_not(force[i]))

        def full(_):
            den = denoise(x, sig).astype(jnp.float32)
            d = (x - den) / sig if kind == "den" else den
            return den, d, jnp.float32(0.0)

        def skipped(_):
            d = cache["d"]
            den = x - sig * d if kind == "den" else d
            return den, d, acc2

        den, d, acc = jax.lax.cond(skip, skipped, full, None)
        return den, {"d": d, "u": u, "acc": acc}

    return carry_denoise
