import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.ops.groupnorm import group_norm_silu


def torch_style_gn(x, w, b, groups, eps, silu):
    xf = np.asarray(x, np.float32)
    bsz, h, wdt, c = xf.shape
    xg = xf.reshape(bsz, -1, groups, c // groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    y = ((xg - mean) / np.sqrt(var + eps)).reshape(bsz, h, wdt, c)
    y = y * w + b
    if silu:
        y = y / (1 + np.exp(-y)) * 1.0 if False else y * (1 / (1 + np.exp(-y)))
    return y


@pytest.mark.parametrize("silu", [False, True])
def test_groupnorm_fallback_matches_reference(silu):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(64).astype(np.float32))
    b = jnp.asarray(rng.randn(64).astype(np.float32))
    out = group_norm_silu(x, w, b, groups=32, silu=silu)
    ref = torch_style_gn(x, np.asarray(w), np.asarray(b), 32, 1e-5, silu)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_groupnorm_pallas_interpret_matches_fallback():
    from cremage_tpu.ops import groupnorm as G

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(128).astype(np.float32))
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    ref = group_norm_silu(x, w, b, groups=32, silu=True)
    # run the pallas kernel in interpret mode via monkeypatched pallas_call
    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        out = G._gn_pallas.__wrapped__(  # bypass jit cache
            x.reshape(2, 64, 128), w, b, 32, 1e-5, True
        ).reshape(x.shape)
    finally:
        pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_groupnorm_module_unchanged_numerics():
    """layers.GroupNorm now routes through ops.groupnorm — numerics and
    param names must be unchanged."""
    from cremage_tpu.models.layers import GroupNorm

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 4, 64).astype(np.float32))
    gn = GroupNorm(num_groups=32)
    params = gn.init(jax.random.key(0), x)
    assert set(params["params"]) == {"weight", "bias"}
    out = gn.apply(params, x)
    ref = torch_style_gn(x, np.ones(64, np.float32), np.zeros(64, np.float32),
                         32, 1e-5, False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)
