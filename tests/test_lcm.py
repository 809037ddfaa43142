"""LCM sampler (samplers/lcm.py) — the scheduler side of LCM-LoRA.

Contracts:
- timestep selection matches an in-test transcription of the published
  diffusers LCMScheduler.set_timesteps (original_inference_steps grid,
  reversal, skipping, strength truncation);
- boundary scalings match get_scalings_for_boundary_condition
  (timestep_scaling=10, sigma_data=0.5);
- the scanned k-space sampler reproduces a numpy DDPM-space oracle of
  LCMScheduler.step over multiple steps with shared per-step noise;
- validation errors; pipeline drives live in test_pipeline_sd15.py.
"""
import jax
import numpy as np
import pytest

from cremage_tpu.samplers import schedules as S
from cremage_tpu.samplers.lcm import make_lcm_schedule, sample_lcm
from cremage_tpu.samplers.kdiffusion import _keys


def _acp():
    sched = S.default_sd_schedule()
    return 1.0 / (1.0 + np.asarray(sched.sigmas, np.float64) ** 2)


def _diffusers_timesteps(n_train, original_steps, steps, strength=1.0):
    """Transcription of diffusers LCMScheduler.set_timesteps."""
    k = n_train // original_steps
    lcm_origin = np.asarray(
        [i * k - 1 for i in range(1, original_steps + 1)], np.int64)
    if strength < 1.0:
        lcm_origin = lcm_origin[: int(original_steps * strength)]
    skipping = len(lcm_origin) // steps
    return lcm_origin[::-1][::skipping][:steps]


@pytest.mark.parametrize("steps", [1, 2, 4, 8])
def test_lcm_timestep_selection(steps):
    sched = make_lcm_schedule(_acp(), steps)
    want = _diffusers_timesteps(1000, 50, steps)
    np.testing.assert_array_equal(sched.timesteps, want)
    assert sched.sigma_next[-1] == 0.0
    # descending timesteps, 4 steps -> [999, 759, 519, 279]
    if steps == 4:
        np.testing.assert_array_equal(sched.timesteps, [999, 759, 519, 279])


def test_lcm_strength_truncation():
    sched = make_lcm_schedule(_acp(), 4, strength=0.5)
    want = _diffusers_timesteps(1000, 50, 4, strength=0.5)
    np.testing.assert_array_equal(sched.timesteps, want)
    assert sched.timesteps[0] <= 499    # truncated to the low half


def test_lcm_boundary_scalings():
    acp = _acp()
    sched = make_lcm_schedule(acp, 4)
    scaled = sched.timesteps.astype(np.float64) * 10.0
    np.testing.assert_allclose(sched.c_skip,
                               0.25 / (scaled**2 + 0.25), rtol=1e-12)
    np.testing.assert_allclose(sched.c_out,
                               scaled / np.sqrt(scaled**2 + 0.25),
                               rtol=1e-12)
    np.testing.assert_allclose(sched.c_in,
                               np.sqrt(acp[sched.timesteps]), rtol=1e-9)


def test_lcm_steps_validated():
    with pytest.raises(ValueError, match="LCM steps"):
        make_lcm_schedule(_acp(), 51)
    with pytest.raises(ValueError, match="LCM steps"):
        make_lcm_schedule(_acp(), 0)


def test_lcm_sampler_matches_ddpm_space_oracle():
    """sample_lcm (k-space scan) vs a numpy transcription of diffusers
    LCMScheduler.step in DDPM space, with identical per-step noise and
    a toy linear eps model."""
    acp = _acp()
    steps = 4
    sched = make_lcm_schedule(acp, steps)
    shape = (2, 4, 4, 3)

    def eps_fn(x_t):                     # toy eps model in DDPM space
        return 0.3 * x_t + 0.1

    # shared noise: the sampler draws _noise(keys[i,0]) per step
    key = jax.random.key(7)
    keys = _keys(key, steps)
    noises = [np.asarray(jax.random.normal(keys[i, 0], shape, np.float32))
              for i in range(steps)]

    # k-space denoiser contract: denoise(x_k, sigma) -> x0 (jnp math:
    # sigma arrives as a traced scalar inside the scan)
    def denoise(x_k, sigma):
        import jax.numpy as jnp

        c_in = 1.0 / jnp.sqrt(1.0 + sigma**2)
        return x_k - sigma * eps_fn(x_k * c_in)

    rng = np.random.RandomState(0)
    z = rng.randn(*shape).astype(np.float32)
    x_k0 = z * sched.sigmas[0]
    got = np.asarray(sample_lcm(denoise, x_k0, sched, key=key))

    # numpy oracle in DDPM space (diffusers LCMScheduler.step)
    x_t = x_k0 * sched.c_in[0]
    for i, t in enumerate(sched.timesteps):
        a_t = acp[t]
        eps = eps_fn(x_t)
        x0 = (x_t - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
        denoised = sched.c_out[i] * x0 + sched.c_skip[i] * x_t
        if i + 1 < steps:
            a_n = acp[sched.timesteps[i + 1]]
            x_t = np.sqrt(a_n) * denoised + np.sqrt(1 - a_n) * noises[i]
        else:
            x_t = denoised
    np.testing.assert_allclose(got, x_t, rtol=0, atol=2e-4)


def test_lcm_single_step_is_pure_x0():
    """steps=1: no re-noise — the output is the boundary-scaled x0."""
    acp = _acp()
    sched = make_lcm_schedule(acp, 1)
    x = np.full((1, 2, 2, 1), 3.0, np.float32)

    def denoise(x_k, sigma):
        return x_k * 0.0 + 1.0                 # constant x0

    out = np.asarray(sample_lcm(denoise, x, sched, key=jax.random.key(0)))
    want = sched.c_out[0] * 1.0 + sched.c_skip[0] * (3.0 * sched.c_in[0])
    np.testing.assert_allclose(out, want, rtol=0, atol=1e-5)
