"""Equivalence tests for the transpose-free SVD temporal attention and the
single-kv-token cross-attention shortcut.

Both are pure layout/algebra rewrites of the reference semantics
(`modules/sdxl/sgm/modules/video_attention.py` VideoTransformerBlock,
`modules/ldm/modules/attention.py` CrossAttention), so they must match a
straightforward transpose-based oracle to float tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.models.unet import CrossAttention
from cremage_tpu.models.video_unet import TemporalSelfAttention
from cremage_tpu.ops.attention import dot_product_attention_xla

pytestmark = pytest.mark.smoke


def test_temporal_self_attention_matches_transpose_oracle():
    """out[b,t,s] must equal standard attention over per-pixel frame
    sequences, i.e. the old (B*S, T, C) transpose formulation."""
    b, t, s, c, heads, dh = 2, 5, 7, 32, 4, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b * t, s, c)), jnp.float32)

    mod = TemporalSelfAttention(heads, dh, t, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)

    # oracle: physically transpose to per-pixel frame sequences and run
    # the plain (B, N, H, D) attention path with the same weights
    p = params["params"]
    wq = p["to_q"]["weight"]
    wk = p["to_k"]["weight"]
    wv = p["to_v"]["weight"]
    wo, bo = p["to_out_0"]["weight"], p["to_out_0"]["bias"]
    xr = x.reshape(b, t, s, c).transpose(0, 2, 1, 3).reshape(b * s, t, c)
    q = (xr @ wq).reshape(b * s, t, heads, dh)
    k = (xr @ wk).reshape(b * s, t, heads, dh)
    v = (xr @ wv).reshape(b * s, t, heads, dh)
    o = dot_product_attention_xla(q, k, v).reshape(b * s, t, heads * dh)
    o = o @ wo + bo
    expected = o.reshape(b, s, t, c).transpose(0, 2, 1, 3).reshape(b * t, s, c)

    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_single_token_cross_attention_shortcut_is_exact():
    """ctx with one kv token: softmax over a single logit is 1, so the
    shortcut (to_out(to_v(ctx)) broadcast) must equal full attention."""
    b, n, c, cctx, heads, dh = 3, 11, 32, 48, 4, 8
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 1, cctx)), jnp.float32)

    mod = CrossAttention(heads, dh, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, ctx)
    out = mod.apply(params, x, ctx)

    p = params["params"]
    q = (x @ p["to_q"]["weight"]).reshape(b, n, heads, dh)
    k = (ctx @ p["to_k"]["weight"]).reshape(b, 1, heads, dh)
    v = (ctx @ p["to_v"]["weight"]).reshape(b, 1, heads, dh)
    o = dot_product_attention_xla(q, k, v).reshape(b, n, heads * dh)
    expected = o @ p["to_out_0"]["weight"] + p["to_out_0"]["bias"]

    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-6, atol=1e-6)

    # param tree must be unchanged by the shortcut (checkpoint mapping)
    assert set(p.keys()) == {"to_q", "to_k", "to_v", "to_out_0"}


def test_multi_token_cross_attention_path_unchanged():
    """>1 kv tokens must still take the full attention path."""
    b, n, m, c, heads, dh = 2, 6, 4, 32, 4, 8
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, m, c)), jnp.float32)

    mod = CrossAttention(heads, dh, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, ctx)
    out = mod.apply(params, x, ctx)

    p = params["params"]
    q = (x @ p["to_q"]["weight"]).reshape(b, n, heads, dh)
    k = (ctx @ p["to_k"]["weight"]).reshape(b, m, heads, dh)
    v = (ctx @ p["to_v"]["weight"]).reshape(b, m, heads, dh)
    o = dot_product_attention_xla(q, k, v).reshape(b, n, heads * dh)
    expected = o @ p["to_out_0"]["weight"] + p["to_out_0"]["bias"]

    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)
