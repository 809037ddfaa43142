"""Chunked-segment sampler execution (samplers/chunked.py): the
host-dispatched K-segment path must be BIT-IDENTICAL to the monolithic
scan (same ScanPlan.body ops either way), and must emit monotonically
increasing progress covering the full step count.

This is the parity proof VERDICT r4 item 3 demands for restoring
per-step progress on the axon TPU backend (where in-scan io_callback
cannot compile: kdiffusion.progress_callbacks_supported)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.samplers import chunked as C
from cremage_tpu.samplers import ddim as DDIM
from cremage_tpu.samplers import flow as F
from cremage_tpu.samplers import kdiffusion as K
from cremage_tpu.samplers import schedules as S

SHAPE = (2, 8, 8, 3)


def toy_denoise(x, sigma):
    return jnp.tanh(x) / (1 + sigma**2)


def make_x0(seed=0):
    return jax.random.normal(jax.random.key(seed), SHAPE, dtype=jnp.float32)


def sigmas_karras(n=12):
    return S.get_sigmas_karras(n, 0.1, 10.0)


class ProgramCache:
    """Stand-in for a pipeline's per-bucket jitted-program cache."""

    def __init__(self):
        self.programs = {}

    def get(self, role, build):
        fn = self.programs.get(role)
        if fn is None:
            fn = jax.jit(build())
            self.programs[role] = fn
        return fn


def run_both(plan, key=None, x=None, segments=4, prologue=None):
    x = make_x0() if x is None else x
    progress = []
    cache = ProgramCache()

    # the pipelines run the monolithic path as ONE jitted program
    # (pipelines/sd15.py jit-structure note) — compare against that,
    # not an eager interpretation
    def mono(xx, kk):
        if prologue is not None:
            xx = prologue(xx, kk)
        return C.run_plan(plan, toy_denoise, xx, key=kk, progress_cb=None)

    x_mono = jax.jit(mono)(x, key if key is not None else jax.random.key(0))
    x_chunk = C.run_chunked(
        plan,
        get_program=cache.get,
        make_denoise=lambda: toy_denoise,
        args=(),
        x=x, key=key, prologue=prologue,
        progress=progress.append, segments=segments)
    return np.asarray(x_mono), np.asarray(x_chunk), progress, cache


def test_segment_length():
    assert C.segment_length(20, 5) == 4
    assert C.segment_length(18, 5) == 3   # ceil(18/5)=4 -> divisor 3
    assert C.segment_length(30, 5) == 6
    assert C.segment_length(13, 5) == 1   # prime -> host-stepped
    assert C.segment_length(4, 5) == 1
    assert C.segment_length(0, 5) == 0


@pytest.mark.parametrize("name,kwargs", [
    ("Euler", {}),
    ("Euler", {"s_churn": 1.5, "s_noise": 0.9}),
    ("Euler A", {}),
    ("DPM++ 2M", {}),
])
def test_chunked_bit_identical_kdiffusion(name, kwargs):
    sig = sigmas_karras(12)
    plan = K.CHUNKABLE_PLANS[name](sig, **kwargs)
    key = jax.random.key(7)
    x_mono, x_chunk, progress, cache = run_both(plan, key=key)
    np.testing.assert_array_equal(x_mono, x_chunk)
    # progress covers the run, strictly increasing, ends at n_report-1
    assert progress == sorted(set(progress))
    assert progress[-1] == plan.n_report - 1
    # one program per distinct role; identity-out plans reuse "mid"
    # for the last segment (no extra compile)
    if plan.post is None:
        assert len(cache.programs) == 2      # first + mid
    else:
        assert len(cache.programs) == 3      # first + mid + last(+post)


def test_chunked_matches_public_sampler_entrypoint():
    """The chunked path equals sample_euler itself (not just run_plan)."""
    sig = sigmas_karras(12)
    key = jax.random.key(3)
    x = make_x0(1)
    want = np.asarray(K.sample_euler(toy_denoise, x, sig, key=key))
    plan = K.plan_euler(sig)
    cache = ProgramCache()
    got = C.run_chunked(plan, get_program=cache.get,
                        make_denoise=lambda: toy_denoise, args=(),
                        x=x, key=key, segments=4)
    np.testing.assert_array_equal(want, np.asarray(got))


def test_chunked_flow_euler():
    sig = F.flow_sigmas(8)
    plan = F.plan_flow_euler(sig)
    x_mono, x_chunk, progress, _ = run_both(plan, segments=4)
    np.testing.assert_array_equal(x_mono, x_chunk)
    assert progress[-1] == plan.n_report - 1


@pytest.mark.parametrize("eta", [0.0, 1.0])
def test_chunked_ddim(eta):
    acp = np.linspace(0.999, 0.01, 1000)
    sched = DDIM.make_ddim_schedule(acp, 12, eta=eta)
    plan = DDIM.plan_ddim(sched)
    key = jax.random.key(5)
    x = make_x0(2)
    want = np.asarray(DDIM.sample(toy_denoise, x, sched, key=key))
    cache = ProgramCache()
    got = C.run_chunked(plan, get_program=cache.get,
                        make_denoise=lambda: toy_denoise, args=(),
                        x=x, key=key, segments=4)
    np.testing.assert_array_equal(want, np.asarray(got))


def test_chunked_ddim_decode_with_prologue():
    """img2img shape: stochastic encode as the first-segment prologue."""
    acp = np.linspace(0.999, 0.01, 1000)
    sched = DDIM.make_ddim_schedule(acp, 10, eta=0.0)
    t_enc = 6
    key = jax.random.key(9)
    x0 = make_x0(3)

    def encode(x, k):
        noise = jax.random.normal(k, x.shape, dtype=jnp.float32)
        return DDIM.stochastic_encode(x, sched, t_enc - 1, noise)

    want = np.asarray(jax.jit(
        lambda x, k: DDIM.decode(toy_denoise, encode(x, k), sched,
                                 t_enc, key=k))(x0, key))
    plan = DDIM.plan_ddim(sched, t_enc)
    cache = ProgramCache()
    got = C.run_chunked(plan, get_program=cache.get,
                        make_denoise=lambda: toy_denoise, args=(),
                        x=x0, key=key, prologue=encode, segments=3)
    np.testing.assert_array_equal(want, np.asarray(got))


def test_chunked_single_segment_and_degenerate():
    """segments=1 (whole scan in the 'first' program) and a 2-step
    DPM++ 2M run (n_scan=0: pre + post only)."""
    sig = sigmas_karras(6)
    plan = K.plan_euler(sig)
    x_mono, x_chunk, progress, cache = run_both(plan, key=jax.random.key(1),
                                                segments=1)
    np.testing.assert_array_equal(x_mono, x_chunk)
    assert len(cache.programs) == 1          # one program runs everything

    sig2 = sigmas_karras(2)
    plan2 = K.plan_dpmpp_2m(sig2)
    assert plan2.n_scan == 0
    x_mono, x_chunk, progress, _ = run_both(plan2, segments=4)
    np.testing.assert_array_equal(x_mono, x_chunk)
    assert progress == [plan2.n_report - 1]


def test_chunked_denoise_args_passed_through():
    """make_denoise receives the args tuple traced (the pipelines pass
    params/c/uc this way so they are jit ARGUMENTS, not constants)."""
    sig = sigmas_karras(8)
    plan = K.plan_euler(sig)
    gain = jnp.asarray(0.7, jnp.float32)

    def make_denoise(g):
        return lambda x, s: toy_denoise(x, s) * g

    want = np.asarray(K.sample_euler(
        lambda x, s: toy_denoise(x, s) * gain, make_x0(4), sig,
        key=jax.random.key(2)))
    cache = ProgramCache()
    got = C.run_chunked(plan, get_program=cache.get,
                        make_denoise=make_denoise, args=(gain,),
                        x=make_x0(4), key=jax.random.key(2), segments=4)
    np.testing.assert_array_equal(want, np.asarray(got))
