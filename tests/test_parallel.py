"""Sharding correctness on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cremage_tpu.core.mesh import data_sharding, make_mesh, replicate_params
from cremage_tpu.models.unet import UNetConfig, UNetModel
from cremage_tpu.parallel.sharding import count_sharded, shard_params_tp, tp_spec_for


def tiny_unet(heads=4, mc=32):
    cfg = UNetConfig(
        in_channels=4, out_channels=4, model_channels=mc, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=heads,
        transformer_depth=(1, 1), transformer_depth_middle=1, context_dim=32,
        dtype=jnp.float32,
    )
    model = UNetModel(cfg)
    # NOTE: random inputs — all-zero activations make GroupNorm normalize
    # near-constant data (var~0), which amplifies fusion-order fp32 noise
    # into O(1) output differences between program variants.
    ks = jax.random.split(jax.random.key(7), 2)
    args = (
        jax.random.normal(ks[0], (8, 8, 8, 4)),
        jnp.full((8,), 500.0),
        jax.random.normal(ks[1], (8, 77, 32)),
    )
    params = model.init(jax.random.key(0), *args)
    return model, params, args


def test_tp_spec_rules():
    w2 = jnp.zeros((32, 128))
    assert tp_spec_for(("x", "to_q", "weight"), w2) == P(None, "model")
    assert tp_spec_for(("x", "to_out_0", "weight"), w2) == P("model", None)
    assert tp_spec_for(("x", "attn_qkv", "weight"), w2) == P(None, "model")
    assert tp_spec_for(("x", "mlp_fc2", "weight"), w2) == P("model", None)
    # conv channel sharding (round-3 extension past attention/MLP)
    assert tp_spec_for(("x", "in_layers_2", "weight"),
                       jnp.zeros((3, 3, 4, 8))) == P(None, None, None, "model")
    assert tp_spec_for(("x", "out_layers_3", "weight"),
                       jnp.zeros((3, 3, 8, 4))) == P(None, None, "model", None)
    assert tp_spec_for(("x", "emb_layers_1", "weight"),
                       jnp.zeros((32, 8))) == P(None, "model")
    # VAE mid-block attention 1x1 convs
    assert tp_spec_for(("decoder", "mid_attn_1", "q", "weight"),
                       jnp.zeros((1, 1, 8, 8))) == P(None, None, None, "model")
    assert tp_spec_for(("decoder", "mid_attn_1", "proj_out", "weight"),
                       jnp.zeros((1, 1, 8, 8))) == P(None, None, "model", None)
    # VAE resnet conv pair
    assert tp_spec_for(("decoder", "up_0_block_0", "conv1", "weight"),
                       jnp.zeros((3, 3, 8, 8))) == P(None, None, None, "model")
    assert tp_spec_for(("decoder", "up_0_block_0", "conv2", "weight"),
                       jnp.zeros((3, 3, 8, 8))) == P(None, None, "model", None)
    assert tp_spec_for(("norm", "weight"), jnp.zeros((32,))) == P()


@pytest.mark.slow
def test_data_parallel_matches_single_device(mesh8):
    model, params, args = tiny_unet()
    ref = np.asarray(model.apply(params, *args), np.float32)
    with mesh8:
        p = replicate_params(mesh8, params)
        x = jax.device_put(args[0], data_sharding(mesh8, 4))
        t = jax.device_put(args[1], NamedSharding(mesh8, P("data")))
        c = jax.device_put(args[2], data_sharding(mesh8, 3))
        out = jax.jit(model.apply)(p, x, t, c)
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=2e-5, rtol=2e-5)
    # batch axis stays sharded over 'data' (trailing Nones normalized away)
    assert out.sharding.spec[0] == "data"


def test_tensor_parallel_matches_replicated(mesh_4x2):
    model, params, args = tiny_unet()
    ref = np.asarray(model.apply(params, *args), np.float32)
    with mesh_4x2:
        p = shard_params_tp(mesh_4x2, params)
        n_sharded, n_total = count_sharded(p, mesh_4x2)
        assert n_sharded > 10  # attention/mlp weights actually sharded
        out = jax.jit(model.apply)(p, *args)
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=2e-4, rtol=2e-4)


def test_tp_non_divisible_falls_back():
    mesh = make_mesh(model=2, data=4)
    # model_channels 32 with inner dims 32/64: divisible; force a weird
    # leaf to check the fallback path
    weird = {"layer": {"to_q": {"weight": jnp.zeros((5, 7))}}}
    placed = shard_params_tp(mesh, weird)
    sh = placed["layer"]["to_q"]["weight"].sharding
    assert sh.spec in (P(), P(None, "model"))  # no crash; replicated ok


def test_unet_tp_with_int8_weights(mesh_4x2):
    """w8a8 UNet under tensor parallelism, convs included: conv kernels
    are channel-sharded (HWIO out axis) while the (out,)-shaped
    weight_scale stays REPLICATED (shard_params_tp rules anchor on
    /weight$; GSPMD reshards the tiny scale around the sharded acc),
    and the per-image activation scale is a global reduce GSPMD handles
    with collectives — TP output matches the single-device int8
    forward."""
    from cremage_tpu.io.quantize import quantize_params_8bit

    model, params, args = tiny_unet()
    qparams, rep = quantize_params_8bit(params, dtype="int8",
                                        min_size=256, include_convs=True)
    n_conv8 = sum(1 for leaf in jax.tree.leaves(qparams)
                  if getattr(leaf, "ndim", 0) == 4
                  and leaf.dtype == jnp.int8)
    assert n_conv8 > 0 and rep["tensors"] > n_conv8
    fp = np.asarray(model.apply(params, *args), np.float32)
    ref = np.asarray(model.apply(qparams, *args), np.float32)
    with mesh_4x2:
        p = shard_params_tp(mesh_4x2, qparams)
        n_sharded, _ = count_sharded(p, mesh_4x2)
        assert n_sharded > 10
        out = jax.jit(model.apply)(p, *args)
        out.block_until_ready()
    out = np.asarray(out, np.float32)
    # Exact TP parity is NOT expected for w8a8: GSPMD's different fp
    # reduction order flips borderline round-to-nearest codes, and
    # GroupNorm spreads each flip (measured: median TP-vs-single diff is
    # ~1e-8 — the bulk bit-matches — but the flip tail reaches a few
    # percent).  The correct invariants: a solid fraction of elements
    # bit-match the single-device int8 forward, and the TP output sits
    # in the SAME quantization envelope of the fp32 forward as the
    # single-device int8 output (no TP-added systematic error).
    assert (out == ref).mean() > 0.2
    den = np.maximum(np.abs(fp), 1e-2)
    med_tp = np.median(np.abs(out - fp) / den)
    med_single = np.median(np.abs(ref - fp) / den)
    assert med_tp < 0.12 and med_tp < 1.5 * max(med_single, 1e-3)


def tiny_flux():
    from cremage_tpu.models.flux import (
        FluxConfig, FluxModel, make_position_ids,
    )

    cfg = FluxConfig(
        hidden_size=64, num_heads=2, head_dim=32, depth_double=1,
        depth_single=1, context_dim=32, vec_dim=32, axes_dim=(8, 12, 12),
        in_channels=16, dtype=jnp.float32,
    )
    model = FluxModel(cfg)
    txt_ids, img_ids = make_position_ids(4, 4, 8)
    ks = jax.random.split(jax.random.key(3), 3)
    args = (
        jax.random.normal(ks[0], (1, 16, 16)),
        jax.random.normal(ks[1], (1, 8, 32)),
        jnp.asarray([0.4]),
        jax.random.normal(ks[2], (1, 32)),
        img_ids, txt_ids, None,
    )
    params = model.init(jax.random.key(0), *args)
    return model, params, args


def test_flux_tensor_parallel_matches_replicated(mesh_4x2):
    """The TP rules cover the FLUX layout (img/txt qkv+mlp column, proj
    row, single-block linear1/linear2) — parity vs single device."""
    model, params, args = tiny_flux()
    ref = np.asarray(model.apply(params, *args), np.float32)
    x, txt, t, vec = args[:4]
    ids = args[4:6]  # host numpy — close over, never trace
    fwd = jax.jit(lambda p, x, txt, t, vec: model.apply(
        p, x, txt, t, vec, *ids, None))
    with mesh_4x2:
        p = shard_params_tp(mesh_4x2, params)
        n_sharded, n_total = count_sharded(p, mesh_4x2)
        assert n_sharded >= 8, (n_sharded, n_total)
        out = fwd(p, x, txt, t, vec)
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=2e-5, rtol=2e-5)


def test_flux_tp_with_fp8_weights(mesh_4x2):
    """Production FLUX serving config: fp8 kernel leaves + per-channel
    weight_scale siblings under tensor parallelism. Scales stay
    replicated (1-D, no /weight$ match); GSPMD reshards around them."""
    from cremage_tpu.io.quantize import quantize_params_8bit

    model, params, args = tiny_flux()
    qparams, rep = quantize_params_8bit(params, min_size=256)
    assert rep["tensors"] > 0
    ref = np.asarray(model.apply(qparams, *args), np.float32)
    x, txt, t, vec = args[:4]
    ids = args[4:6]
    fwd = jax.jit(lambda p, x, txt, t, vec: model.apply(
        p, x, txt, t, vec, *ids, None))
    with mesh_4x2:
        p = shard_params_tp(mesh_4x2, qparams)
        out = fwd(p, x, txt, t, vec)
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=1e-3, rtol=1e-3)


def test_flux_tp_with_int8_weights(mesh_4x2):
    """w8a8 under tensor parallelism: the per-token activation scale is
    computed from the full (replicated) activation row, so sharding the
    int8 kernel column-wise must not change the quantized codes — TP
    output matches the single-device int8 forward exactly up to fp
    reduction order."""
    from cremage_tpu.io.quantize import quantize_params_8bit

    model, params, args = tiny_flux()
    qparams, rep = quantize_params_8bit(params, dtype="int8",
                                        min_size=256)
    assert rep["tensors"] > 0
    ref = np.asarray(model.apply(qparams, *args), np.float32)
    x, txt, t, vec = args[:4]
    ids = args[4:6]
    fwd = jax.jit(lambda p, x, txt, t, vec: model.apply(
        p, x, txt, t, vec, *ids, None))
    with mesh_4x2:
        p = shard_params_tp(mesh_4x2, qparams)
        out = fwd(p, x, txt, t, vec)
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=1e-3, rtol=1e-3)
