"""Sequence-parallel attention (parallel/sequence.py) on the 8-device
CPU mesh: both schedules must match the single-device oracle exactly
(fp32), and the output must keep the token sharding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.core.mesh import make_mesh
from cremage_tpu.parallel.sequence import (
    _reference_attention, sp_attention, token_sharding,
)


def _qkv(b=2, n=64, h=4, d=16, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(0), 3)
    mk = lambda k: jax.random.normal(k, (b, n, h, d), dtype)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(jax.devices()[:8], data=8, model=1)


@pytest.mark.parametrize("schedule", ["ring", "all_gather_kv"])
def test_sp_matches_oracle(mesh8, schedule):
    q, k, v = _qkv()
    want = np.asarray(_reference_attention(q, k, v))
    sh = token_sharding(mesh8)
    qs, ks, vs = (jax.device_put(a, sh) for a in (q, k, v))
    with mesh8:
        got = sp_attention(qs, ks, vs, mesh8, schedule=schedule)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)
    # token axis stays sharded — no silent gather of the output
    assert "data" in str(got.sharding.spec)


@pytest.mark.parametrize("schedule", ["ring", "all_gather_kv"])
def test_sp_under_jit(mesh8, schedule):
    """The schedules must compose with jit (how models would call it)."""
    q, k, v = _qkv(n=32)
    want = np.asarray(_reference_attention(q, k, v))
    sh = token_sharding(mesh8)
    qs, ks, vs = (jax.device_put(a, sh) for a in (q, k, v))
    with mesh8:
        fn = jax.jit(lambda a, b, c: sp_attention(
            a, b, c, mesh8, schedule=schedule))
        got = fn(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def test_sp_bf16_inputs(mesh8):
    """bf16 q/k/v: fp32 softmax statistics inside, bf16 out (the flash
    kernel contract)."""
    q, k, v = _qkv(dtype=jnp.bfloat16)
    want = np.asarray(_reference_attention(q, k, v), np.float32)
    sh = token_sharding(mesh8)
    qs, ks, vs = (jax.device_put(a, sh) for a in (q, k, v))
    with mesh8:
        got = sp_attention(qs, ks, vs, mesh8)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               atol=2e-2, rtol=2e-2)


def test_sp_validates(mesh8):
    q, k, v = _qkv(n=60)  # 60 % 8 != 0
    with pytest.raises(ValueError, match="divide"):
        sp_attention(q, k, v, mesh8)
    q, k, v = _qkv(n=16)
    with pytest.raises(ValueError, match="schedule"):
        sp_attention(q, k, v, mesh8, schedule="nope")
