"""Flash attention kernel vs XLA einsum reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.ops.attention import dot_product_attention_xla
from cremage_tpu.ops.flash_attention import flash_attention


def rand_qkv(b, nq, nk, h, d, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(ks[0], (b, nq, h, d), dtype)
    k = jax.random.normal(ks[1], (b, nk, h, d), dtype)
    v = jax.random.normal(ks[2], (b, nk, h, d), dtype)
    return q, k, v


@pytest.mark.parametrize("shape", [
    (1, 256, 256, 2, 64),     # aligned
    (1, 300, 300, 2, 64),     # ragged N (pad+mask path)
    (2, 256, 512, 1, 40),     # ragged head dim (SD1.5 d=40)
    (1, 128, 640, 2, 80),     # cross-attention-ish, ragged everything
])
def test_flash_matches_xla(shape):
    b, nq, nk, h, d = shape
    q, k, v = rand_qkv(b, nq, nk, h, d)
    ref = dot_product_attention_xla(q, k, v)
    out = flash_attention(q, k, v, bq=128, bk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_bf16_matches_xla_loosely():
    q, k, v = rand_qkv(1, 256, 256, 2, 64, dtype=jnp.bfloat16)
    ref = dot_product_attention_xla(q, k, v)
    out = flash_attention(q, k, v, bq=128, bk=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.02
    )


def test_flash_custom_scale():
    q, k, v = rand_qkv(1, 128, 128, 1, 64)
    ref = dot_product_attention_xla(q, k, v, scale=0.3)
    out = flash_attention(q, k, v, scale=0.3, bq=128, bk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_extreme_logits_stable():
    """Online softmax must survive large logit magnitudes."""
    q, k, v = rand_qkv(1, 128, 256, 1, 64)
    q = q * 30
    k = k * 30
    ref = dot_product_attention_xla(q, k, v)
    out = flash_attention(q, k, v, bq=128, bk=128, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
