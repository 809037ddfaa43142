"""Token merging (ops/tome.py + UNet integration).

Invariants proven here:
1. The jax plan/merge/unmerge match an independent numpy oracle of the
   ToMeSD bipartite-soft-matching algorithm exactly (fp32).
2. merge->unmerge semantics: kept tokens round-trip exactly; each
   merged-away src position receives its dst group's mean.
3. With all tokens identical, a ToMe'd transformer block equals the
   plain block (merging identical tokens is lossless).
4. The UNet runs with tome_ratio > 0 (deterministic, finite, different
   program from baseline) and composes with DeepCache capture/shallow.
5. The SD1.5 pipeline runs end-to-end with tome_ratio, alone and with
   deep_cache=2, and rejects out-of-range ratios.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.ops import tome


# ---------------------------------------------------------------------------
# numpy oracle (independent transcription of ToMeSD bipartite matching)
# ---------------------------------------------------------------------------

def np_tome(metric, h, w, r, offset, sx=2, sy=2):
    b, n, _ = metric.shape
    k = offset % (sx * sy)
    dy, dx = k // sx, k % sx
    ii, jj = np.meshgrid(np.arange(dy, h, sy), np.arange(dx, w, sx),
                         indexing="ij")
    dst = (ii * w + jj).reshape(-1)
    mask = np.ones(n, bool)
    mask[dst] = False
    src = np.nonzero(mask)[0]
    m = metric / (np.linalg.norm(metric, axis=-1, keepdims=True) + 1e-6)
    scores = np.einsum("bsc,bdc->bsd", m[:, src], m[:, dst])
    node_max = scores.max(-1)
    node_tgt = scores.argmax(-1)
    order = np.argsort(-node_max, axis=-1, kind="stable")
    mrg_sel, unm_sel = order[:, :r], order[:, r:]

    def merge(x):
        out = []
        for bi in range(b):
            xs, xd = x[bi, src], x[bi, dst].copy()
            cnt = np.ones(len(dst))
            for j in mrg_sel[bi]:
                t = node_tgt[bi, j]
                xd[t] += xs[j]
                cnt[t] += 1
            xd /= cnt[:, None]
            out.append(np.concatenate([xs[unm_sel[bi]], xd], axis=0))
        return np.stack(out)

    def unmerge(y):
        out = np.zeros((b, n, y.shape[-1]), y.dtype)
        n_unm = len(src) - r
        for bi in range(b):
            out[bi, dst] = y[bi, n_unm:]
            out[bi, src[unm_sel[bi]]] = y[bi, :n_unm]
            for j in mrg_sel[bi]:
                out[bi, src[j]] = y[bi, n_unm + node_tgt[bi, j]]
        return out

    return merge, unmerge


@pytest.mark.parametrize("offset", [0, 1, 2, 3, 7])
def test_matches_numpy_oracle(offset):
    rng = np.random.default_rng(0)
    h, w, c, b, r = 6, 8, 12, 2, 10
    metric = rng.normal(size=(b, h * w, c)).astype(np.float32)
    x = rng.normal(size=(b, h * w, c)).astype(np.float32)

    plan = tome.build_plan(jnp.asarray(metric), h, w, r, offset)
    got_m = np.asarray(tome.merge(plan, jnp.asarray(x)))
    got_u = np.asarray(tome.unmerge(plan, jnp.asarray(got_m)))

    ref_merge, ref_unmerge = np_tome(metric, h, w, r, offset)
    want_m = ref_merge(x)
    np.testing.assert_allclose(got_m, want_m, atol=1e-5)
    np.testing.assert_allclose(got_u, ref_unmerge(want_m), atol=1e-5)


def test_roundtrip_semantics():
    """unmerge(merge(x)): kept positions exact, merged positions = mean
    of their dst group."""
    rng = np.random.default_rng(1)
    h = w = 8
    b, c, r = 1, 4, 20
    x = rng.normal(size=(b, h * w, c)).astype(np.float32)
    plan = tome.build_plan(jnp.asarray(x), h, w, r, 2)
    y = np.asarray(tome.unmerge(plan, tome.merge(plan, jnp.asarray(x))))

    src = np.asarray(plan.src_idx)
    dst = np.asarray(plan.dst_idx)
    unm = np.asarray(plan.unm_sel)[0]
    mrg = np.asarray(plan.mrg_sel)[0]
    tgt = np.asarray(plan.mrg_tgt)[0]
    # kept src positions round-trip exactly
    np.testing.assert_allclose(y[0, src[unm]], x[0, src[unm]], atol=1e-6)
    # each dst slot (and every src merged into it) is the group mean
    for d_row in range(len(dst)):
        group = [x[0, dst[d_row]]] + [x[0, src[j]] for j in mrg[tgt == d_row]]
        np.testing.assert_allclose(y[0, dst[d_row]],
                                   np.mean(group, axis=0), atol=1e-5)
    for j, t in zip(mrg, tgt):
        np.testing.assert_allclose(y[0, src[j]], y[0, dst[t]], atol=1e-6)


def test_jit_and_traced_offset():
    rng = np.random.default_rng(2)
    h = w = 8
    x = jnp.asarray(rng.normal(size=(2, h * w, 8)).astype(np.float32))

    @jax.jit
    def f(x, off):
        plan = tome.build_plan(x, h, w, 16, off)
        return tome.unmerge(plan, tome.merge(plan, x))

    y0 = f(x, jnp.int32(0))
    y1 = f(x, jnp.int32(1))
    assert np.isfinite(np.asarray(y0)).all()
    # a different dst offset changes the merge pattern
    assert np.abs(np.asarray(y0) - np.asarray(y1)).max() > 0


# ---------------------------------------------------------------------------
# block / UNet integration
# ---------------------------------------------------------------------------

def test_identical_tokens_lossless_block():
    from cremage_tpu.models.unet import BasicTransformerBlock

    h = w = 4
    c = 16
    tok = jax.random.normal(jax.random.key(0), (1, 1, c))
    x = jnp.broadcast_to(tok, (1, h * w, c))
    ctx = jax.random.normal(jax.random.key(1), (1, 5, c))
    plain = BasicTransformerBlock(heads=2, dim_head=8, dtype=jnp.float32)
    params = plain.init(jax.random.key(2), x, ctx)
    merged = BasicTransformerBlock(heads=2, dim_head=8, dtype=jnp.float32,
                                   tome_r=8, tome_hw=(h, w), tome_salt=3)
    out_p = plain.apply(params, x, ctx)
    out_m = merged.apply(params, x, ctx, tome_offset=jnp.int32(1))
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_p),
                               atol=1e-5)


def tiny_unet(tome_ratio=0.0):
    from cremage_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig(
        model_channels=32, num_res_blocks=1, attention_resolutions=(1, 2),
        channel_mult=(1, 2, 4), num_heads=4, context_dim=32,
        transformer_depth=(1, 1, 1), transformer_depth_middle=1,
        dtype=jnp.float32, tome_ratio=tome_ratio,
    )
    m = UNetModel(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 4))
    t = jnp.array([3.0, 7.0])
    ctx = jax.random.normal(jax.random.key(1), (2, 77, 32))
    return m, x, t, ctx


def test_unet_runs_with_tome_same_params():
    m0, x, t, ctx = tiny_unet(0.0)
    params = m0.init(jax.random.key(2), x, t, ctx)
    base = m0.apply(params, x, t, ctx)
    m1, *_ = tiny_unet(0.4)
    out = m1.apply(params, x, t, ctx)
    assert out.shape == base.shape
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 0
    # deterministic
    out2 = m1.apply(params, x, t, ctx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # the offset (derived from t) changes the merge grid
    out3 = m1.apply(params, x, t + 1.0, ctx)
    assert np.abs(np.asarray(out3) - np.asarray(out)).max() > 0


def test_unet_tome_composes_with_deepcache_modes():
    m1, x, t, ctx = tiny_unet(0.4)
    params = m1.init(jax.random.key(2), x, t, ctx)
    full = m1.apply(params, x, t, ctx)
    out_cap, deep = m1.apply(params, x, t, ctx, mode="capture",
                             cache_levels=1)
    np.testing.assert_array_equal(np.asarray(out_cap), np.asarray(full))
    out_sh = m1.apply(params, x, t, ctx, mode="shallow", deep=deep,
                      cache_levels=1)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(full),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# pipeline level
# ---------------------------------------------------------------------------

def test_pipeline_tome_end_to_end():
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    pipe = SD15Pipeline(make_bundle())
    res = pipe.generate(base_opts(tome_ratio=0.5))
    (img, meta), = res
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert meta["tome_ratio"] == 0.5
    # composes with DeepCache (sd15 shallow steps are exactly the
    # high-res level ToMe accelerates)
    res2 = pipe.generate(base_opts(tome_ratio=0.5, deep_cache=2,
                                   sampler="Euler"))
    assert np.isfinite(res2[0][0]).all()


def test_pipeline_tome_validation():
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    pipe = SD15Pipeline(make_bundle())
    with pytest.raises(ValueError, match="tome_ratio"):
        pipe.generate(base_opts(tome_ratio=0.75))


# ---------------------------------------------------------------------------
# SVD (VideoUNet spatial attn1 — per-frame token grids)
# ---------------------------------------------------------------------------

def test_video_unet_runs_with_tome_same_params():
    import dataclasses as dc

    from tests.test_svd import CTX, T, tiny_video_cfg
    from cremage_tpu.models.video_unet import VideoUNet

    cfg = tiny_video_cfg()
    m0 = VideoUNet(cfg, num_frames=T)
    x = jax.random.normal(jax.random.key(0), (T, 8, 8, 8))
    t = jnp.full((T,), 0.73)   # fractional c_noise-style timestep
    ctx = jax.random.normal(jax.random.key(1), (T, 1, CTX))
    y = jax.random.normal(jax.random.key(2), (T, 768))
    params = m0.init(jax.random.key(3), x, t, ctx, y)
    base = m0.apply(params, x, t, ctx, y)

    m1 = VideoUNet(dc.replace(cfg, tome_ratio=0.4), num_frames=T)
    out = m1.apply(params, x, t, ctx, y)
    assert out.shape == base.shape
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 0
    # deep-cache capture/shallow compose with ToMe
    out_cap, deep = m1.apply(params, x, t, ctx, y, mode="capture",
                             cache_levels=1)
    np.testing.assert_array_equal(np.asarray(out_cap), np.asarray(out))
    out_sh = m1.apply(params, x, t, ctx, y, mode="shallow", deep=deep,
                      cache_levels=1)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out),
                               atol=1e-5)


def test_svd_pipeline_tome_end_to_end():
    from tests.test_svd import T, tiny_video_unet
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from cremage_tpu.pipelines.svd import SVDBundle, SVDOptions, SVDPipeline

    m, params = tiny_video_unet()
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                  num_res_blocks=1, dtype=jnp.float32))
    vp = vae.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))
    pipe = SVDPipeline(SVDBundle(unet=m, unet_params=params, vae=vae,
                                 vae_params=vp))
    img = np.random.RandomState(0).uniform(
        0, 1, (64, 64, 3)).astype(np.float32)
    frames = pipe.sample(img, SVDOptions(num_frames=T, num_steps=2, seed=4,
                                         tome_ratio=0.5, deep_cache=2))
    assert frames.shape == (T, 64, 64, 3)
    assert np.isfinite(frames).all()
    with pytest.raises(ValueError, match="tome_ratio"):
        pipe.sample(img, SVDOptions(num_frames=T, num_steps=2,
                                    tome_ratio=0.9))
