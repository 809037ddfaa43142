"""PLMS and DPM-Solver differential tests vs numpy oracles that
transcribe the reference loops directly
(`modules/ldm/models/diffusion/plms.py:115-239`,
`modules/ldm/models/diffusion/dpm_solver/dpm_solver.py:504-545,755-790,
1078-1106` with the wrapper config of `dpm_solver/sampler.py:81-83`)."""
import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.samplers import ddim as D
from cremage_tpu.samplers import ldm_extra as LX
from cremage_tpu.samplers import schedules as S


def eps_jax(x, t):
    """Nonlinear eps model depending on x and t; accepts scalar or
    per-batch t like the pipeline's CFG'd eps model."""
    tt = jnp.reshape(jnp.broadcast_to(jnp.asarray(t, jnp.float32),
                                      (x.shape[0],)), (-1, 1, 1, 1))
    return jnp.tanh(x) * (0.5 + tt / 2000.0)


def eps_np(x, t):
    return np.tanh(x) * (0.5 + np.float32(t) / np.float32(2000.0))


# ------------------------------------------------------------------ PLMS

def plms_oracle(eps, x, sched: D.DDIMSchedule, t_start=None):
    """Direct transcription of plms_sampling/p_sample_plms (eta=0)."""
    timesteps = sched.timesteps if t_start is None else sched.timesteps[:t_start]
    n = len(timesteps)
    time_range = timesteps[::-1]
    indices = np.arange(n)[::-1]

    def update(xi, e, idx):
        a_t = sched.alphas[idx]
        a_prev = sched.alphas_prev[idx]
        pred_x0 = (xi - np.sqrt(1.0 - a_t) * e) / np.sqrt(a_t)
        return np.sqrt(a_prev) * pred_x0 + np.sqrt(1.0 - a_prev) * e

    x = np.asarray(x, np.float64)
    old_eps = []
    for i, (step, idx) in enumerate(zip(time_range, indices)):
        e_t = eps(x, step)
        if len(old_eps) == 0:
            t_next = time_range[min(i + 1, n - 1)]
            x_trial = update(x, e_t, idx)
            e_next = eps(x_trial, t_next)
            e_prime = (e_t + e_next) / 2.0
        elif len(old_eps) == 1:
            e_prime = (3.0 * e_t - old_eps[-1]) / 2.0
        elif len(old_eps) == 2:
            e_prime = (23.0 * e_t - 16.0 * old_eps[-1] + 5.0 * old_eps[-2]) / 12.0
        else:
            e_prime = (55.0 * e_t - 59.0 * old_eps[-1] + 37.0 * old_eps[-2]
                       - 9.0 * old_eps[-3]) / 24.0
        x = update(x, e_prime, idx)
        old_eps.append(e_t)
        if len(old_eps) >= 4:
            old_eps.pop(0)
    return x


def test_plms_matches_reference_loop():
    acp = S.make_alphas_cumprod()
    sched = D.make_ddim_schedule(acp, 8, eta=0.0)
    x_T = jax.random.normal(jax.random.key(0), (2, 8, 8, 4), jnp.float32)
    got = np.asarray(LX.sample_plms(eps_jax, x_T, sched))
    want = plms_oracle(eps_np, np.asarray(x_T), sched)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_plms_single_step_degenerates():
    # n==1: t_next degenerates to t0 (plms.py:146) — improved Euler only
    acp = S.make_alphas_cumprod()
    sched = D.make_ddim_schedule(acp, 1, eta=0.0)
    x_T = jax.random.normal(jax.random.key(1), (1, 4, 4, 4), jnp.float32)
    got = np.asarray(LX.sample_plms(eps_jax, x_T, sched))
    want = plms_oracle(eps_np, np.asarray(x_T), sched)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_plms_t_start_truncated_decode():
    acp = S.make_alphas_cumprod()
    sched = D.make_ddim_schedule(acp, 10, eta=0.0)
    x = jax.random.normal(jax.random.key(2), (1, 8, 8, 4), jnp.float32)
    got = np.asarray(LX.sample_plms(eps_jax, x, sched, t_start=4))
    want = plms_oracle(eps_np, np.asarray(x), sched, t_start=4)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_plms_progress_reports_every_step():
    acp = S.make_alphas_cumprod()
    sched = D.make_ddim_schedule(acp, 5, eta=0.0)
    x = jax.random.normal(jax.random.key(3), (1, 4, 4, 4), jnp.float32)
    seen = []
    LX.sample_plms(eps_jax, x, sched, progress_cb=lambda i: seen.append(int(i)))
    assert sorted(seen) == [0, 1, 2, 3, 4]


def test_plms_rejects_nonzero_eta():
    acp = S.make_alphas_cumprod()
    sched = D.make_ddim_schedule(acp, 5, eta=1.0)
    x = jnp.zeros((1, 4, 4, 4))
    try:
        LX.sample_plms(eps_jax, x, sched)
    except ValueError as e:
        assert "eta" in str(e)
    else:
        raise AssertionError("expected ValueError for eta != 0")


# ------------------------------------------------------------ DPM-Solver

def dpm_oracle(eps, x, acp, steps):
    """Transcription of DPM_Solver.sample(method='multistep', order=2,
    predict_x0=True, skip_type='time_uniform', lower_order_final=True,
    solver_type='dpm_solver') over NoiseScheduleVP('discrete')."""
    acp = np.asarray(acp, np.float64)
    big_n = len(acp)
    t_array = np.linspace(0.0, 1.0, big_n + 1)[1:]
    la_arr = 0.5 * np.log(acp)
    ts = np.linspace(1.0, 1.0 / big_n, steps + 1)
    la = np.interp(ts, t_array, la_arr)
    alpha = np.exp(la)
    sigma = np.sqrt(1.0 - np.exp(2.0 * la))
    lam = la - 0.5 * np.log(1.0 - np.exp(2.0 * la))
    t_in = (ts - 1.0 / big_n) * 1000.0

    def m(xi, i):
        return (xi - sigma[i] * eps(xi, t_in[i])) / alpha[i]

    x = np.asarray(x, np.float64)
    mp = [m(x, 0)]
    # init: one first-order update (dpm_solver.py:1086-1090)
    h = lam[1] - lam[0]
    x = (sigma[1] / sigma[0]) * x - alpha[1] * np.expm1(-h) * mp[-1]
    mp.append(m(x, 1))
    for step in range(2, steps + 1):
        if steps < 15:
            order = min(2, steps + 1 - step)   # lower_order_final
        else:
            order = 2
        h = lam[step] - lam[step - 1]
        if order == 1:
            x = (sigma[step] / sigma[step - 1]) * x \
                - alpha[step] * np.expm1(-h) * mp[-1]
        else:
            h0 = lam[step - 1] - lam[step - 2]
            d1 = (mp[-1] - mp[-2]) * (h / h0)
            x = (sigma[step] / sigma[step - 1]) * x \
                - alpha[step] * np.expm1(-h) * mp[-1] \
                - 0.5 * alpha[step] * np.expm1(-h) * d1
        mp[0] = mp[1]
        if step < steps:
            mp[1] = m(x, step)
    return x


def test_dpm_solver_matches_reference_loop_short():
    acp = S.make_alphas_cumprod()
    x_T = jax.random.normal(jax.random.key(4), (2, 8, 8, 4), jnp.float32)
    sched = LX.make_dpm_solver_schedule(acp, 8)
    got = np.asarray(LX.sample_dpm_solver(eps_jax, x_T, sched))
    want = dpm_oracle(eps_np, np.asarray(x_T), acp, 8)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_dpm_solver_matches_reference_loop_long():
    # steps >= 15: lower_order_final is inactive (dpm_solver.py:1094)
    acp = S.make_alphas_cumprod()
    x_T = jax.random.normal(jax.random.key(5), (1, 8, 8, 4), jnp.float32)
    sched = LX.make_dpm_solver_schedule(acp, 16)
    got = np.asarray(LX.sample_dpm_solver(eps_jax, x_T, sched))
    want = dpm_oracle(eps_np, np.asarray(x_T), acp, 16)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_dpm_solver_schedule_endpoints():
    acp = S.make_alphas_cumprod()
    sched = LX.make_dpm_solver_schedule(acp, 10)
    # t in [1/N, 1] maps to model input [0, 999] (dpm_solver.py:278-284)
    np.testing.assert_allclose(sched.t_model[0], 999.0)
    np.testing.assert_allclose(sched.t_model[-1], 0.0, atol=1e-9)
    assert sched.num_steps == 10
    assert sched.C[0] == 0.0 and sched.C[-1] == 0.0  # bootstrap + final


def test_dpm_solver_rejects_single_step():
    acp = S.make_alphas_cumprod()
    try:
        LX.make_dpm_solver_schedule(acp, 1)
    except ValueError as e:
        assert "steps" in str(e)
    else:
        raise AssertionError("expected ValueError for steps < 2")
