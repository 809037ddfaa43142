"""8-bit weight storage (io/quantize.py) — parity of the quantized
FLUX forward vs full precision, predicate behavior, scale exactness and
memory accounting.  Reference behavior: modules/flux/txt2img.py:56-68
quantize_and_freeze(qfloat8) over transformer + T5."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.io.quantize import (
    DEFAULT_EXCLUDE, quantize_params_8bit, quantized_zeros,
    should_quantize,
)
from cremage_tpu.models.flux import FluxConfig, FluxModel, make_position_ids


def tiny_cfg(**kw):
    return FluxConfig(hidden_size=128, num_heads=2, head_dim=64,
                      depth_double=1, depth_single=2, context_dim=64,
                      axes_dim=(16, 24, 24), **kw)


def tiny_inputs(cfg):
    key = jax.random.key(0)
    txt_ids, img_ids = make_position_ids(2, 2, 4)
    x = jax.random.normal(key, (1, 4, cfg.in_channels), jnp.float32)
    txt = jax.random.normal(jax.random.key(1), (1, 4, cfg.context_dim),
                            jnp.float32)
    t = jnp.asarray([0.5], jnp.float32)
    vec = jax.random.normal(jax.random.key(2), (1, cfg.vec_dim), jnp.float32)
    return x, txt, t, vec, img_ids, txt_ids


@pytest.mark.smoke
def test_quantized_flux_forward_close():
    cfg = tiny_cfg()
    model = FluxModel(cfg)
    args = tiny_inputs(cfg)
    params = model.init(jax.random.key(3), *args, None)
    ref = np.asarray(model.apply(params, *args, None), np.float32)

    qparams, rep = quantize_params_8bit(params, min_size=1024)
    assert rep["tensors"] > 0
    # fp8 storage + (features,) f32 scales ~= 1/4 of the f32 bytes
    assert rep["bytes_after"] < rep["bytes_before"] * 0.27
    out = np.asarray(model.apply(qparams, *args, None), np.float32)

    # Per-matmul error is ~2% (see test_single_matmul_error_at_
    # rounding_floor) and attention softmax multiplies relative logit
    # error by the logit magnitude, so a few percent end-to-end
    # divergence is the intrinsic floor of ANY weight-only 8-bit
    # scheme (quanto's included), not a quantizer defect.
    denom = np.maximum(np.abs(ref), 1e-2)
    assert np.median(np.abs(out - ref) / denom) < 0.12
    assert np.isfinite(out).all()


def test_single_matmul_error_at_rounding_floor():
    """The quality floor of weight-only 8-bit storage: a matmul against
    per-channel-scaled e4m3 weights lands within ~2% of full precision
    (the per-weight mantissa rounding level — random-sign contractions
    do not average it away, same property as quanto's qfloat8)."""
    key = jax.random.key(0)
    w = jax.random.normal(key, (3072, 256), jnp.float32) * 0.02
    x = jax.random.normal(jax.random.key(1), (8, 3072), jnp.float32)
    q, _ = quantize_params_8bit({"m": {"weight": w}}, min_size=1024)
    deq = q["m"]["weight"].astype(jnp.float32) * q["m"]["weight_scale"]
    ref = np.asarray(x @ w)
    out = np.asarray(x @ deq)
    rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-6)
    assert np.median(rel) < 0.03


def test_dense_weight_scale_is_exact_column_rescale():
    """Dequantization identity: if W factors exactly as W_q * s, Dense
    with (W_q fp8, weight_scale s) must reproduce Dense with W."""
    from cremage_tpu.models.layers import Dense

    d = Dense(64, dtype=jnp.float32)
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 48), jnp.float32)
    # build W from exactly-representable fp8 values times a scale
    wq = jax.random.randint(jax.random.key(1), (48, 64), -8, 9
                            ).astype(jnp.float8_e4m3fn)
    s = jnp.linspace(0.5, 2.0, 64)
    w = wq.astype(jnp.float32) * s
    bias = jnp.zeros((64,))
    ref = d.apply({"params": {"weight": w, "bias": bias}}, x)
    out = d.apply({"params": {"weight": wq, "weight_scale": s,
                              "bias": bias}}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_predicate_selects_matmul_kernels_only():
    cfg = tiny_cfg()
    model = FluxModel(cfg)
    args = tiny_inputs(cfg)
    params = model.init(jax.random.key(0), *args, None)
    qparams, rep = quantize_params_8bit(params, min_size=1024)

    flat = jax.tree_util.tree_flatten_with_path(qparams)[0]
    n_q = n_s = 0
    for path, leaf in flat:
        name = str(getattr(path[-1], "key", path[-1]))
        if leaf.dtype == jnp.float8_e4m3fn:
            assert name == "weight" and leaf.ndim == 2
            n_q += 1
        elif name == "weight_scale":
            assert leaf.ndim == 1 and leaf.dtype == jnp.float32
            n_s += 1
        else:
            # everything not quantized keeps its original dtype
            assert leaf.dtype == jnp.float32
    assert n_q == n_s == rep["tensors"] > 0


def test_excludes_embeddings_and_small_tensors():
    tree = {
        "embed_tokens": {"weight": jnp.ones((256, 64))},
        "proj": {"weight": jnp.ones((256, 64)),
                 "bias": jnp.ones((64,))},
        "tiny": {"weight": jnp.ones((4, 4))},
    }
    q, rep = quantize_params_8bit(tree, min_size=1024)
    assert q["embed_tokens"]["weight"].dtype == jnp.float32
    assert q["proj"]["weight"].dtype == jnp.float8_e4m3fn
    assert q["proj"]["weight_scale"].shape == (64,)
    assert q["proj"]["bias"].dtype == jnp.float32
    assert q["tiny"]["weight"].dtype == jnp.float32
    assert rep["tensors"] == 1


def test_scale_prevents_overflow_and_subnormals():
    # huge weights: per-channel max-abs scaling maps the column max to
    # e4m3's 448 — no inf/nan (e4m3fn overflows to nan on a bare cast)
    big = jnp.full((64, 1024), 1e6, jnp.float32)
    q, _ = quantize_params_8bit({"m": {"weight": big}}, min_size=1024)
    deq = np.asarray(q["m"]["weight"].astype(jnp.float32)) * \
        np.asarray(q["m"]["weight_scale"])
    assert np.isfinite(deq).all()
    np.testing.assert_allclose(deq, 1e6, rtol=0.07)

    # tiny weights: scaling lifts them out of the subnormal zone, so
    # relative error stays at normal-range mantissa precision
    small = jax.random.normal(jax.random.key(0), (64, 1024)) * 1e-5
    q, _ = quantize_params_8bit({"m": {"weight": small}}, min_size=1024)
    deq = np.asarray(q["m"]["weight"].astype(jnp.float32)) * \
        np.asarray(q["m"]["weight_scale"])
    err = np.abs(deq - np.asarray(small)) / np.maximum(
        np.abs(np.asarray(small)), 1e-9)
    assert np.median(err) < 0.04


def test_quantized_zeros_matches_quantize_of_zeros():
    cfg = tiny_cfg()
    model = FluxModel(cfg)
    args = tiny_inputs(cfg)
    # close over the host-numpy position ids (they are consumed with
    # np.asarray inside the model and must not be abstracted) — same
    # pattern as load_flux_bundle's template
    shapes = jax.eval_shape(
        lambda rng: model.init(rng, *args, None), jax.random.key(0))
    z = quantized_zeros(shapes, min_size=1024)
    params = model.init(jax.random.key(0), *args, None)
    q, _ = quantize_params_8bit(params, min_size=1024)
    ds_a = jax.tree.map(lambda a: (str(a.dtype), a.shape), z)
    ds_b = jax.tree.map(lambda a: (str(a.dtype), a.shape), q)
    assert ds_a == ds_b
    # and the model runs on the zeros tree
    out = model.apply(z, *args, None)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_int8_codes_and_reconstruction():
    """int8 storage: codes are round-to-nearest in [-127, 127] and
    W_q * s reconstructs W at the 127-level rounding floor."""
    key = jax.random.key(0)
    w = jax.random.normal(key, (3072, 256), jnp.float32) * 0.02
    q, rep = quantize_params_8bit({"m": {"weight": w}}, dtype="int8",
                                  min_size=1024)
    wq = np.asarray(q["m"]["weight"])
    assert wq.dtype == np.int8 and rep["tensors"] == 1
    assert wq.min() >= -127 and wq.max() == 127  # colmax maps to 127
    s = np.asarray(q["m"]["weight_scale"])
    # exact round-to-nearest against the stored scale
    np.testing.assert_array_equal(
        wq, np.clip(np.round(np.asarray(w) / s), -127, 127))
    err = np.abs(wq * s - np.asarray(w))
    assert (err <= 0.5 * s + 1e-9).all()  # half-ULP of the 127 grid


def test_int8_dense_matches_integer_oracle():
    """The w8a8 Dense path is exact integer arithmetic: s8 x s8 -> s32
    then (row activation scale) x (column weight scale).  Replay the
    same quantization in numpy and demand bit-level agreement of the
    integer accumulator path (fp32 IO, bf16-free)."""
    from cremage_tpu.models.layers import Dense

    key = jax.random.key(0)
    x = jax.random.normal(key, (3, 5, 48), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (48, 64), jnp.float32) * 0.1
    q, _ = quantize_params_8bit({"m": {"weight": w}}, dtype="int8",
                                min_size=1)
    wq, ws = q["m"]["weight"], q["m"]["weight_scale"]

    d = Dense(64, dtype=jnp.float32)
    out = d.apply({"params": {"weight": wq, "weight_scale": ws,
                              "bias": jnp.zeros((64,))}}, x)

    xn = np.asarray(x, np.float64)
    a_scale = np.maximum(np.abs(xn).max(-1, keepdims=True) / 127.0,
                         1e-12)
    # jnp.round is round-half-to-even, same as np.round
    xq = np.round(np.asarray(x, np.float32) / a_scale).astype(np.int8)
    acc = xq.astype(np.int32) @ np.asarray(wq).astype(np.int32)
    ref = acc.astype(np.float32) * a_scale.astype(np.float32) * \
        np.asarray(ws, np.float32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6,
                               atol=1e-6)
    # and the quantized result tracks the full-precision matmul
    full = np.einsum("bsk,ko->bso", np.asarray(x), np.asarray(w))
    rel = np.abs(ref - full) / np.maximum(np.abs(full), 1e-3)
    assert np.median(rel) < 0.03


def test_int8_quantized_flux_forward_close():
    """End-to-end FLUX forward with w8a8 int8 matmuls stays within the
    same few-percent envelope as the fp8 weight-only path."""
    cfg = tiny_cfg()
    model = FluxModel(cfg)
    args = tiny_inputs(cfg)
    params = model.init(jax.random.key(3), *args, None)
    ref = np.asarray(model.apply(params, *args, None), np.float32)

    qparams, rep = quantize_params_8bit(params, dtype="int8",
                                        min_size=1024)
    assert rep["tensors"] > 0
    out = np.asarray(model.apply(qparams, *args, None), np.float32)
    denom = np.maximum(np.abs(ref), 1e-2)
    assert np.median(np.abs(out - ref) / denom) < 0.12
    assert np.isfinite(out).all()


def test_int8_conv_matches_integer_oracle():
    """w8a8 Conv: per-image activation scale (the 3x3 window spans
    neighbor pixels, so one scale must cover every contributing input),
    s8 x s8 -> s32 conv, (image scale) x (channel scale) rescale.
    Replayed exactly in numpy."""
    from cremage_tpu.models.layers import Conv

    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 8, 8, 16), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (3, 3, 16, 32),
                          jnp.float32) * 0.1
    q, rep = quantize_params_8bit({"m": {"weight": w}}, dtype="int8",
                                  min_size=1, include_convs=True)
    wq, ws = q["m"]["weight"], q["m"]["weight_scale"]
    assert wq.dtype == jnp.int8 and ws.shape == (32,)
    assert rep["tensors"] == 1

    c = Conv(32, dtype=jnp.float32)
    out = c.apply({"params": {"weight": wq, "weight_scale": ws,
                              "bias": jnp.zeros((32,))}}, x)

    xn = np.asarray(x, np.float32)
    a_scale = np.maximum(
        np.abs(xn).max(axis=(1, 2, 3), keepdims=True) / 127.0, 1e-12)
    xq = np.round(xn / a_scale).astype(np.int8)
    xp = np.pad(xq.astype(np.int32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    wn = np.asarray(wq, np.int32)
    acc = np.zeros((2, 8, 8, 32), np.int32)
    for dy in range(3):
        for dx in range(3):
            acc += np.einsum("bhwc,co->bhwo",
                             xp[:, dy:dy + 8, dx:dx + 8, :], wn[dy, dx])
    ref = acc.astype(np.float32) * a_scale * np.asarray(ws, np.float32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5,
                               atol=1e-5)
    # and it tracks the full-precision conv
    full = np.zeros((2, 8, 8, 32), np.float64)
    xf = np.pad(xn.astype(np.float64), ((0, 0), (1, 1), (1, 1), (0, 0)))
    for dy in range(3):
        for dx in range(3):
            full += np.einsum("bhwc,co->bhwo",
                              xf[:, dy:dy + 8, dx:dx + 8, :],
                              np.asarray(w, np.float64)[dy, dx])
    rel = np.abs(ref - full) / np.maximum(np.abs(full), 1e-2)
    assert np.median(rel) < 0.03


def test_requantize_is_noop():
    """Quantizing an already-quantized tree must not double-quantize:
    float8 leaves are skipped (itemsize<2 guard), so the stale
    weight_scale can never overwrite a fresh one."""
    w = jax.random.normal(jax.random.key(0), (64, 32), jnp.float32)
    q1, rep1 = quantize_params_8bit({"m": {"weight": w}}, min_size=1)
    assert rep1["tensors"] == 1
    q2, rep2 = quantize_params_8bit(q1, dtype="int8", min_size=1)
    assert rep2["tensors"] == 0
    assert q2["m"]["weight"].dtype == q1["m"]["weight"].dtype
    np.testing.assert_array_equal(np.asarray(q2["m"]["weight_scale"]),
                                  np.asarray(q1["m"]["weight_scale"]))


def test_embedder_kernels_quantize_tables_do_not():
    """The exclude list must not swallow projection kernels whose
    module names merely contain embed-ish words (DiT *_embedder MLPs,
    SVD time_pos_embed Dense) while still protecting gather tables."""
    w = jnp.ones((64, 32), jnp.float32)
    for path in ("/x_embedder_proj/weight", "/t_embedder_mlp_0/weight",
                 "/time_pos_embed_0/weight", "/context_embedder/weight"):
        assert should_quantize("weight", path, w, min_size=1,
                               exclude=DEFAULT_EXCLUDE), path
    for path in ("/token_embedding/weight", "/shared/weight",
                 "/embed_tokens/weight"):
        assert not should_quantize("weight", path, w, min_size=1,
                                   exclude=DEFAULT_EXCLUDE), path
    # flax-style 'kernel' leaves are rejected: layers.py reads the
    # scale as 'weight_scale' only, so a 'kernel_scale' would be
    # silently ignored at apply time
    assert not should_quantize("kernel", "/dense/kernel", w, min_size=1,
                               exclude=DEFAULT_EXCLUDE)


def test_int8_kernel_without_scale_raises():
    """An int8 kernel with no weight_scale sibling must fail with the
    actual cause, not `y * None`."""
    from cremage_tpu.models.layers import Dense

    d = Dense(8, dtype=jnp.float32)
    x = jnp.ones((2, 4), jnp.float32)
    params = {"params": {"weight": jnp.ones((4, 8), jnp.int8),
                         "bias": jnp.zeros((8,))}}
    with pytest.raises(ValueError, match="weight_scale"):
        d.apply(params, x)


def test_int8_contractions_survive_lowering():
    """Regression guard for the w8a8 compute path: the lowered graph
    must contain s8 x s8 -> s32 convolutions and dot_generals — a
    silent upcast (e.g. an optimization 'simplifying' the int8 conv to
    float) would keep outputs correct while destroying the 2x int8 MXU
    rate the mode exists for."""
    import re

    from cremage_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig(in_channels=4, out_channels=4, model_channels=32,
                     num_res_blocks=1, attention_resolutions=(1,),
                     channel_mult=(1, 2), num_heads=2,
                     transformer_depth=(1, 1), context_dim=32,
                     dtype=jnp.float32)
    model = UNetModel(cfg)
    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    ctx = jnp.zeros((1, 7, 32), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.key(0), x, t, ctx)
    params = quantized_zeros(shapes, dtype="int8", min_size=256,
                             include_convs=True)
    txt = jax.jit(model.apply).lower(params, x, t, ctx).as_text()
    n_conv_i8 = len(re.findall(
        r"stablehlo\.convolution.*tensor<[^>]*xi8>.*->.*xi32>", txt))
    n_dot_i8 = len(re.findall(
        r"stablehlo\.dot_general.*xi8>.*->.*xi32>", txt))
    assert n_conv_i8 > 5, n_conv_i8
    assert n_dot_i8 > 5, n_dot_i8


def test_int8_unet_forward_close():
    """Full-UNet sanity for the conv+dense w8a8 path: a tiny SD-style
    UNet quantized end-to-end (convs included) stays within the few-
    percent 8-bit envelope of the fp32 forward."""
    from cremage_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig(in_channels=4, out_channels=4, model_channels=32,
                     num_res_blocks=1, attention_resolutions=(1,),
                     channel_mult=(1, 2), num_heads=2,
                     transformer_depth=(1, 1), context_dim=32,
                     dtype=jnp.float32)
    model = UNetModel(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 4), jnp.float32)
    t = jnp.asarray([3.0], jnp.float32)
    ctx = jax.random.normal(jax.random.key(1), (1, 7, 32), jnp.float32)
    params = model.init(jax.random.key(2), x, t, ctx)
    ref = np.asarray(model.apply(params, x, t, ctx), np.float32)

    qparams, rep = quantize_params_8bit(params, dtype="int8",
                                        min_size=256,
                                        include_convs=True)
    n_conv = sum(1 for leaf in jax.tree.leaves(qparams)
                 if leaf.ndim == 4 and leaf.dtype == jnp.int8)
    assert n_conv > 0 and rep["tensors"] > n_conv  # convs AND matmuls
    out = np.asarray(model.apply(qparams, x, t, ctx), np.float32)
    denom = np.maximum(np.abs(ref), 1e-2)
    assert np.median(np.abs(out - ref) / denom) < 0.12
    assert np.isfinite(out).all()


def test_fullsize_flux_template_builds():
    """Regression for the load_flux_bundle template: eval_shape must
    not abstract the host-numpy position ids (loader closes over them).
    Shapes only — no 12B params are materialized."""
    from cremage_tpu.models.flux import flux_schnell_config

    cfg = flux_schnell_config()
    model = FluxModel(cfg)
    txt_ids, img_ids = make_position_ids(4, 4, 8)
    shapes = jax.eval_shape(
        lambda rng: model.init(
            rng, jnp.zeros((1, 16, 64), jnp.bfloat16),
            jnp.zeros((1, 8, 4096), jnp.bfloat16), jnp.zeros((1,)),
            jnp.zeros((1, 768)), img_ids, txt_ids, None),
        jax.random.key(0))["params"]
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 11e9 < n < 13e9  # the real 12B layout
