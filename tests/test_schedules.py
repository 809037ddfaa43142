import numpy as np

from cremage_tpu.samplers import schedules as S


def test_ddpm_alphas_cumprod_endpoints():
    acp = S.make_alphas_cumprod()
    assert acp.shape == (1000,)
    # endpoints documented in the reference (k_diffusion_samplers.py:78-87)
    assert abs(acp[0] - 0.99915) < 1e-5
    assert abs(acp[-1] - 0.0047) < 2e-4


def test_sd_sigma_range_matches_reference_constants():
    sched = S.default_sd_schedule()
    # reference-documented bounds: 0.0291675 (computed) .. 14.6146
    assert abs(sched.sigma_max - 14.6146) < 1e-3
    assert 0.02 < sched.sigma_min < 0.04


def test_get_sigmas_descending_with_zero():
    sched = S.default_sd_schedule()
    sig = sched.get_sigmas(20)
    assert sig.shape == (21,)
    assert sig[-1] == 0.0
    assert np.all(np.diff(sig) < 0)
    assert abs(sig[0] - sched.sigma_max) < 1e-6


def test_t_sigma_roundtrip():
    sched = S.default_sd_schedule()
    t = np.array([0.0, 10.5, 500.25, 999.0])
    sig = sched.t_to_sigma(t)
    t2 = sched.sigma_to_t(sig)
    assert np.allclose(t, t2, atol=1e-6)


def test_sigma_to_t_quantize():
    sched = S.default_sd_schedule()
    sig = sched.t_to_sigma(np.array([500.4]))
    t_q = sched.sigma_to_t(sig, quantize=True)
    assert t_q[0] == 500


def test_karras_schedule():
    sig = S.get_sigmas_karras(10, 0.1, 10.0, rho=7.0)
    assert sig.shape == (11,)
    assert abs(sig[0] - 10.0) < 1e-9 and abs(sig[-2] - 0.1) < 1e-9
    assert sig[-1] == 0.0
    # spot value from the closed form
    ramp = 5 / 9
    expected = (10 ** (1 / 7) + ramp * (0.1 ** (1 / 7) - 10 ** (1 / 7))) ** 7
    assert abs(sig[5] - expected) < 1e-12


def test_exponential_and_vp():
    sig = S.get_sigmas_exponential(5, 0.1, 10.0)
    assert abs(sig[0] - 10.0) < 1e-9 and abs(sig[-2] - 0.1) < 1e-9
    vp = S.get_sigmas_vp(5)
    assert vp[-1] == 0 and np.all(np.diff(vp[:-1]) < 0)


def test_truncate_for_img2img():
    sig = S.get_sigmas_karras(20, 0.1, 10.0)
    tr = S.truncate_for_img2img(sig, 7)
    assert tr.shape == (8,)
    assert tr[-1] == 0.0 and np.all(tr == sig[-8:])
