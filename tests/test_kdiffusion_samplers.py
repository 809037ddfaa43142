"""Differential tests: each scan-based sampler vs an independent numpy
oracle transcribing the published k-diffusion algorithm, on a nonlinear
toy denoiser, with identical noise sequences. Plus analytic ODE checks
on the exact Gaussian denoiser."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.samplers import kdiffusion as K
from cremage_tpu.samplers import schedules as S

SHAPE = (2, 8, 8, 3)


def toy_denoise_np(x, sigma):
    return np.tanh(x) / (1 + sigma**2)


def toy_denoise_jax(x, sigma):
    return jnp.tanh(x) / (1 + sigma**2)


def make_x0(seed=0):
    return np.asarray(
        jax.random.normal(jax.random.key(seed), SHAPE, dtype=jnp.float32)
    )


def noises(key, n, per_step=1):
    """Replicate the samplers' key-splitting so oracles see identical noise."""
    ks = K._keys(key, n, per_step)
    return [
        [np.asarray(jax.random.normal(ks[i, j], SHAPE, dtype=jnp.float32))
         for j in range(per_step)]
        for i in range(n)
    ]


def sigmas_karras(n=12):
    return S.get_sigmas_karras(n, 0.1, 10.0)


def ancestral_np(sf, st, eta=1.0):
    if not eta:
        return st, 0.0
    up = min(st, eta * (st**2 * (sf**2 - st**2) / sf**2) ** 0.5)
    return (st**2 - up**2) ** 0.5, up


# ---------------- numpy oracles (independent transcriptions) --------------

def np_euler(x, sig, eps, s_churn=0.0, s_tmin=0.0, s_tmax=float("inf"), s_noise=1.0):
    n = len(sig) - 1
    for i in range(n):
        gamma = (
            min(s_churn / n, 2**0.5 - 1)
            if (s_churn and s_tmin <= sig[i] <= s_tmax)
            else 0.0
        )
        sigma_hat = sig[i] * (gamma + 1)
        if gamma > 0:
            x = x + eps[i][0] * s_noise * (sigma_hat**2 - sig[i] ** 2) ** 0.5
        den = toy_denoise_np(x, sigma_hat)
        d = (x - den) / sigma_hat
        x = x + d * (sig[i + 1] - sigma_hat)
    return x


def np_euler_a(x, sig, eps, eta=1.0, s_noise=1.0):
    n = len(sig) - 1
    for i in range(n):
        den = toy_denoise_np(x, sig[i])
        down, up = ancestral_np(sig[i], sig[i + 1], eta)
        d = (x - den) / sig[i]
        x = x + d * (down - sig[i])
        if sig[i + 1] > 0:
            x = x + eps[i][0] * s_noise * up
    return x


def np_heun(x, sig, eps):
    n = len(sig) - 1
    for i in range(n):
        den = toy_denoise_np(x, sig[i])
        d = (x - den) / sig[i]
        dt = sig[i + 1] - sig[i]
        if sig[i + 1] == 0:
            x = x + d * dt
        else:
            x2 = x + d * dt
            den2 = toy_denoise_np(x2, sig[i + 1])
            d2 = (x2 - den2) / sig[i + 1]
            x = x + (d + d2) / 2 * dt
    return x


def np_dpm2(x, sig, eps):
    n = len(sig) - 1
    for i in range(n):
        den = toy_denoise_np(x, sig[i])
        d = (x - den) / sig[i]
        if sig[i + 1] == 0:
            x = x + d * (sig[i + 1] - sig[i])
        else:
            sigma_mid = np.exp(np.log(sig[i]) * 0.5 + np.log(sig[i + 1]) * 0.5)
            dt1 = sigma_mid - sig[i]
            dt2 = sig[i + 1] - sig[i]
            x2 = x + d * dt1
            den2 = toy_denoise_np(x2, sigma_mid)
            d2 = (x2 - den2) / sigma_mid
            x = x + d2 * dt2
    return x


def np_dpm2_a(x, sig, eps, eta=1.0, s_noise=1.0):
    n = len(sig) - 1
    for i in range(n):
        den = toy_denoise_np(x, sig[i])
        down, up = ancestral_np(sig[i], sig[i + 1], eta)
        d = (x - den) / sig[i]
        if down == 0:
            x = x + d * (down - sig[i])
        else:
            sigma_mid = np.exp(np.log(sig[i]) * 0.5 + np.log(down) * 0.5)
            dt1, dt2 = sigma_mid - sig[i], down - sig[i]
            x2 = x + d * dt1
            den2 = toy_denoise_np(x2, sigma_mid)
            d2 = (x2 - den2) / sigma_mid
            x = x + d2 * dt2
            x = x + eps[i][0] * s_noise * up
    return x


def np_lms(x, sig, eps, order=4):
    n = len(sig) - 1
    ds = []
    for i in range(n):
        den = toy_denoise_np(x, sig[i])
        d = (x - den) / sig[i]
        ds.append(d)
        if len(ds) > order:
            ds.pop(0)
        cur = min(i + 1, order)
        coeffs = [K._lms_coeff(cur, sig, i, j) for j in range(cur)]
        x = x + sum(c * dd for c, dd in zip(coeffs, reversed(ds)))
    return x


def np_dpmpp_2s_a(x, sig, eps, eta=1.0, s_noise=1.0):
    n = len(sig) - 1
    for i in range(n):
        den = toy_denoise_np(x, sig[i])
        down, up = ancestral_np(sig[i], sig[i + 1], eta)
        if down == 0:
            d = (x - den) / sig[i]
            x = x + d * (down - sig[i])
        else:
            t, t_next = -np.log(sig[i]), -np.log(down)
            h = t_next - t
            s = t + 0.5 * h
            x2 = np.exp(-s) / sig[i] * x - np.expm1(-h * 0.5) * den
            den2 = toy_denoise_np(x2, np.exp(-s))
            x = down / sig[i] * x - np.expm1(-h) * den2
            x = x + eps[i][0] * s_noise * up
    return x


def np_dpmpp_sde(x, sig, eps, eta=1.0, s_noise=1.0, r=0.5):
    n = len(sig) - 1
    for i in range(n):
        den = toy_denoise_np(x, sig[i])
        if sig[i + 1] == 0:
            d = (x - den) / sig[i]
            x = x + d * (sig[i + 1] - sig[i])
        else:
            t, t_next = -np.log(sig[i]), -np.log(sig[i + 1])
            h = t_next - t
            s = t + h * r
            fac = 1 / (2 * r)
            sig_s = np.exp(-s)
            sd, su = ancestral_np(sig[i], sig_s, eta)
            s_ = -np.log(sd)
            x2 = sd / sig[i] * x - np.expm1(t - s_) * den
            x2 = x2 + eps[i][0] * s_noise * su
            den2 = toy_denoise_np(x2, sig_s)
            sd2, su2 = ancestral_np(sig[i], sig[i + 1], eta)
            t_next_ = -np.log(sd2)
            den_d = (1 - fac) * den + fac * den2
            x = sd2 / sig[i] * x - np.expm1(t - t_next_) * den_d
            d1 = abs(sig[i] - sig_s)
            d2 = abs(sig_s - sig[i + 1])
            w1, w2 = (d1 / (d1 + d2)) ** 0.5, (d2 / (d1 + d2)) ** 0.5
            corr = w1 * eps[i][0] + w2 * eps[i][1]
            x = x + corr * s_noise * su2
    return x


def np_dpmpp_2m(x, sig, eps):
    n = len(sig) - 1
    old = None
    for i in range(n):
        den = toy_denoise_np(x, sig[i])
        with np.errstate(divide="ignore"):
            t, t_next = -np.log(sig[i]), -np.log(sig[i + 1])
        h = t_next - t
        if old is None or sig[i + 1] == 0:
            x = sig[i + 1] / sig[i] * x - np.expm1(-h) * den
        else:
            h_last = t + np.log(sig[i - 1])
            rr = h_last / h
            den_d = (1 + 1 / (2 * rr)) * den - (1 / (2 * rr)) * old
            x = sig[i + 1] / sig[i] * x - np.expm1(-h) * den_d
        old = den
    return x


def np_dpmpp_2m_sde(x, sig, eps, eta=1.0, s_noise=1.0, solver_type="midpoint"):
    n = len(sig) - 1
    old, h_last = None, None
    for i in range(n):
        den = toy_denoise_np(x, sig[i])
        if sig[i + 1] == 0:
            x = den
        else:
            t, s = -np.log(sig[i]), -np.log(sig[i + 1])
            h = s - t
            eta_h = eta * h
            x = sig[i + 1] / sig[i] * np.exp(-eta_h) * x - np.expm1(-h - eta_h) * den
            if old is not None:
                rr = h_last / h
                if solver_type == "heun":
                    x = x + (-np.expm1(-h - eta_h) / (-h - eta_h) + 1) * (1 / rr) * (den - old)
                else:
                    x = x + 0.5 * -np.expm1(-h - eta_h) * (1 / rr) * (den - old)
            if eta:
                x = x + eps[i][0] * sig[i + 1] * (-np.expm1(-2 * eta_h)) ** 0.5 * s_noise
            h_last = h
        old = den
    return x


def np_dpmpp_3m_sde(x, sig, eps, eta=1.0, s_noise=1.0):
    n = len(sig) - 1
    d1_, d2_, h1, h2 = None, None, None, None
    for i in range(n):
        den = toy_denoise_np(x, sig[i])
        if sig[i + 1] == 0:
            x = den
        else:
            t, s = -np.log(sig[i]), -np.log(sig[i + 1])
            h = s - t
            h_eta = h * (eta + 1)
            x = np.exp(-h_eta) * x - np.expm1(-h_eta) * den
            if h2 is not None:
                r0, r1 = h1 / h, h2 / h
                d1_0 = (den - d1_) / r0
                d1_1 = (d1_ - d2_) / r1
                d1 = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
                d2 = (d1_0 - d1_1) / (r0 + r1)
                phi2 = np.expm1(-h_eta) / h_eta + 1
                phi3 = phi2 / h_eta - 0.5
                x = x + phi2 * d1 - phi3 * d2
            elif h1 is not None:
                rr = h1 / h
                d = (den - d1_) / rr
                phi2 = np.expm1(-h_eta) / h_eta + 1
                x = x + phi2 * d
            if eta:
                x = x + eps[i][0] * sig[i + 1] * (-np.expm1(-2 * h * eta)) ** 0.5 * s_noise
            h2, h1 = h1, h
        d2_, d1_ = d1_, den
    return x


# ---------------- differential tests --------------------------------------

KEY = jax.random.key(1234)
ATOL = 3e-4


def run_jax(fn, sig, **kw):
    x0 = jnp.asarray(make_x0()) * float(sig[0])
    return np.asarray(fn(toy_denoise_jax, x0, sig, key=KEY, **kw))


def run_np(fn, sig, per_step=1, **kw):
    x0 = make_x0() * float(sig[0])
    n = len(sig) - 1
    eps = noises(KEY, n, per_step)
    return fn(x0.astype(np.float64), np.asarray(sig, np.float64), eps, **kw)


@pytest.mark.parametrize("n", [2, 3, 12])
def test_euler_matches_oracle(n):
    sig = sigmas_karras(n)
    got = run_jax(K.sample_euler, sig)
    want = run_np(np_euler, sig)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_euler_churn_matches_oracle():
    sig = sigmas_karras(12)
    got = run_jax(K.sample_euler, sig, s_churn=2.0, s_tmin=0.2, s_tmax=8.0)
    want = run_np(np_euler, sig, s_churn=2.0, s_tmin=0.2, s_tmax=8.0)
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize("n", [2, 12])
def test_euler_ancestral_matches_oracle(n):
    sig = sigmas_karras(n)
    got = run_jax(K.sample_euler_ancestral, sig)
    want = run_np(np_euler_a, sig)
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize("n", [2, 12])
def test_heun_matches_oracle(n):
    sig = sigmas_karras(n)
    got = run_jax(K.sample_heun, sig)
    want = run_np(np_heun, sig)
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize("n", [2, 12])
def test_dpm2_matches_oracle(n):
    sig = sigmas_karras(n)
    np.testing.assert_allclose(
        run_jax(K.sample_dpm_2, sig), run_np(np_dpm2, sig), atol=ATOL
    )


def test_dpm2_ancestral_matches_oracle():
    sig = sigmas_karras(12)
    np.testing.assert_allclose(
        run_jax(K.sample_dpm_2_ancestral, sig), run_np(np_dpm2_a, sig), atol=ATOL
    )


@pytest.mark.parametrize("n", [2, 5, 12])
def test_lms_matches_oracle(n):
    sig = sigmas_karras(n)
    np.testing.assert_allclose(
        run_jax(K.sample_lms, sig), run_np(np_lms, sig), atol=ATOL
    )


def test_dpmpp_2s_ancestral_matches_oracle():
    sig = sigmas_karras(12)
    np.testing.assert_allclose(
        run_jax(K.sample_dpmpp_2s_ancestral, sig), run_np(np_dpmpp_2s_a, sig),
        atol=ATOL,
    )


def test_dpmpp_sde_matches_oracle():
    sig = sigmas_karras(12)
    np.testing.assert_allclose(
        run_jax(K.sample_dpmpp_sde, sig),
        run_np(np_dpmpp_sde, sig, per_step=2),
        atol=ATOL,
    )


@pytest.mark.parametrize("n", [2, 3, 12])
def test_dpmpp_2m_matches_oracle(n):
    sig = sigmas_karras(n)
    np.testing.assert_allclose(
        run_jax(K.sample_dpmpp_2m, sig), run_np(np_dpmpp_2m, sig), atol=ATOL
    )


@pytest.mark.parametrize("solver", ["midpoint", "heun"])
def test_dpmpp_2m_sde_matches_oracle(solver):
    sig = sigmas_karras(12)
    np.testing.assert_allclose(
        run_jax(K.sample_dpmpp_2m_sde, sig, solver_type=solver),
        run_np(np_dpmpp_2m_sde, sig, solver_type=solver),
        atol=ATOL,
    )


@pytest.mark.parametrize("n", [2, 3, 12])
def test_dpmpp_3m_sde_matches_oracle(n):
    sig = sigmas_karras(n)
    np.testing.assert_allclose(
        run_jax(K.sample_dpmpp_3m_sde, sig), run_np(np_dpmpp_3m_sde, sig),
        atol=ATOL,
    )


# ---------------- analytic ODE accuracy ------------------------------------

def test_ode_samplers_converge_to_analytic_solution():
    """Gaussian data: denoise(x,s)=x/(1+s^2); the probability-flow ODE has
    closed form x(0) = x(s0)/sqrt(1+s0^2). Higher-order solvers must beat
    Euler."""
    sig = S.get_sigmas_karras(20, 0.05, 10.0)
    gauss = lambda x, s: x / (1 + s**2)
    x0 = jnp.asarray(make_x0()) * float(sig[0])
    exact = np.asarray(x0) / np.sqrt(1 + float(sig[0]) ** 2)

    def err(fn, **kw):
        out = np.asarray(fn(gauss, x0, sig, key=KEY, **kw))
        return np.abs(out - exact).max()

    e_euler = err(K.sample_euler)
    e_heun = err(K.sample_heun)
    e_2m = err(K.sample_dpmpp_2m)
    assert e_euler < 0.5
    assert e_heun < e_euler / 3
    assert e_2m < e_euler / 3


def test_sde_samplers_preserve_gaussian_marginal():
    """Ancestral/SDE chains on the exact Gaussian denoiser must land on a
    ~unit-variance marginal."""
    shape = (4, 32, 32, 4)
    sig = S.get_sigmas_karras(25, 0.02, 14.0)
    gauss = lambda x, s: x / (1 + s**2)
    x0 = jax.random.normal(jax.random.key(9), shape, jnp.float32) * float(sig[0])
    for fn in (K.sample_euler_ancestral, K.sample_dpmpp_2m_sde, K.sample_dpmpp_3m_sde):
        out = np.asarray(fn(gauss, x0, sig, key=jax.random.key(7)))
        var = out.var()
        # euler-ancestral has a known first-order variance-shrink bias at
        # moderate step counts; the differential oracle tests pin exact
        # algorithm parity, this is only a sanity band.
        assert 0.7 < var < 1.3, (fn.__name__, var)


def test_sampler_registry_complete():
    from cremage_tpu.core.registry import SAMPLERS

    for name in ["Euler", "Euler A", "Heun", "DPM2", "DPM2 A", "LMS",
                 "DPM++ 2S A", "DPM++ SDE", "DPM++ 2M", "DPM++ 2M SDE",
                 "DPM++ 3M SDE"]:
        assert name in SAMPLERS
        assert name in K.SAMPLER_SCHEDULE


def test_progress_callback_gate(monkeypatch):
    """CREMAGE_PROGRESS_CALLBACKS=0 compiles the sampler WITHOUT any
    host-callback op (the axon TPU tunnel cannot compile io_callback
    programs — measured round 4) and the callback is never invoked;
    the default on CPU keeps per-step reporting."""
    import jax

    from cremage_tpu.samplers import kdiffusion as K

    sigmas = np.array([10.0, 5.0, 1.0, 0.0])
    x = jnp.zeros((1, 8, 8, 4))
    den = lambda xx, ss: xx * 0.9

    calls = []

    monkeypatch.setenv("CREMAGE_PROGRESS_CALLBACKS", "0")
    assert not K.progress_callbacks_supported()
    jaxpr = jax.make_jaxpr(
        lambda x0: K.sample_euler(den, x0, sigmas, key=jax.random.key(0),
                                  progress_cb=calls.append))(x)
    assert "callback" not in str(jaxpr)
    out = K.sample_euler(den, x, sigmas, key=jax.random.key(0),
                         progress_cb=calls.append)
    assert np.isfinite(np.asarray(out)).all()
    assert calls == []

    monkeypatch.setenv("CREMAGE_PROGRESS_CALLBACKS", "1")
    assert K.progress_callbacks_supported()
    jaxpr2 = jax.make_jaxpr(
        lambda x0: K.sample_euler(den, x0, sigmas, key=jax.random.key(0),
                                  progress_cb=calls.append))(x)
    assert "callback" in str(jaxpr2)

    monkeypatch.delenv("CREMAGE_PROGRESS_CALLBACKS")
    assert K.progress_callbacks_supported()  # cpu backend in tests

    # the axon tunnel registers as plain "tpu"; detection rides the
    # JAX_PLATFORMS selection the plugin requires
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert not K.progress_callbacks_supported()
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert K.progress_callbacks_supported()
