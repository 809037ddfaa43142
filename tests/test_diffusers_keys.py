"""PixArt diffusers-layout conversion: synthesize a tiny diffusers-style
state dict, convert, load into our module, run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.io.diffusers_keys import pixart_from_diffusers
from cremage_tpu.models.pixart import PixArt, PixArtConfig

T5D = 48
HID = 64


def synth_diffusers_pixart(depth=2):
    rng = np.random.RandomState(0)
    sd = {}

    def lin(name, i, o):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    sd["pos_embed.proj.weight"] = rng.randn(HID, 4, 2, 2).astype(np.float32)
    sd["pos_embed.proj.bias"] = rng.randn(HID).astype(np.float32)
    lin("adaln_single.emb.timestep_embedder.linear_1", 256, HID)
    lin("adaln_single.emb.timestep_embedder.linear_2", HID, HID)
    lin("adaln_single.linear", HID, 6 * HID)
    lin("caption_projection.linear_1", T5D, HID)
    lin("caption_projection.linear_2", HID, HID)
    for i in range(depth):
        b = f"transformer_blocks.{i}"
        sd[b + ".scale_shift_table"] = rng.randn(6, HID).astype(np.float32)
        for p in ("q", "k", "v"):
            lin(f"{b}.attn1.to_{p}", HID, HID)
        lin(f"{b}.attn1.to_out.0", HID, HID)
        lin(f"{b}.attn2.to_q", HID, HID)
        for p in ("k", "v"):
            lin(f"{b}.attn2.to_{p}", HID, HID)
        lin(f"{b}.attn2.to_out.0", HID, HID)
        lin(f"{b}.ff.net.0.proj", HID, 4 * HID)
        lin(f"{b}.ff.net.2", 4 * HID, HID)
    sd["scale_shift_table"] = rng.randn(2, HID).astype(np.float32)
    lin("proj_out", HID, 2 * 2 * 8)
    return sd


def test_pixart_diffusers_conversion_loads_and_runs():
    sd = synth_diffusers_pixart()
    converted = pixart_from_diffusers(sd)
    # fused qkv present with tripled rows
    assert converted["blocks.0.attn.qkv.weight"].shape == (3 * HID, HID)
    assert converted["blocks.0.cross_attn.kv_linear.weight"].shape == (2 * HID, HID)

    cfg = PixArtConfig(hidden_size=HID, depth=2, num_heads=4,
                       context_dim=T5D, dtype=jnp.float32)
    model = PixArt(cfg)
    tmpl = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 6, T5D)),
    )["params"]
    params, missing, unused = CK.build_flax_params(tmpl, converted, prefix="")
    assert not missing, missing
    assert not unused, unused

    out = model.apply({"params": params}, jnp.ones((1, 8, 8, 4)) * 0.1,
                      jnp.full((1,), 500.0), jnp.ones((1, 6, T5D)) * 0.1)
    assert out.shape == (1, 8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()

    # fused-qkv correctness: the q rows of our kernel equal to_q
    qkv = np.asarray(params["blocks_0"]["attn_qkv"]["weight"])  # (in, 3H)
    np.testing.assert_allclose(qkv[:, :HID], sd["transformer_blocks.0.attn1.to_q.weight"].T)
    np.testing.assert_allclose(qkv[:, HID:2 * HID],
                               sd["transformer_blocks.0.attn1.to_k.weight"].T)


def synth_diffusers_sd_unet(mc=32, levels=(1, 2), nrb=1, ctx=16,
                            attn_levels=None):
    """Tiny diffusers-layout UNet sd matching our tiny UNetConfig."""
    rng = np.random.RandomState(1)
    sd = {}

    def lin(name, i, o):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def conv(name, i, o, k=3):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def gn(name, c):
        sd[name + ".weight"] = rng.randn(c).astype(np.float32)
        sd[name + ".bias"] = rng.randn(c).astype(np.float32)

    def resnet(prefix, cin, cout, temb):
        gn(prefix + ".norm1", cin)
        conv(prefix + ".conv1", cin, cout)
        lin(prefix + ".time_emb_proj", temb, cout)
        gn(prefix + ".norm2", cout)
        conv(prefix + ".conv2", cout, cout)
        if cin != cout:
            conv(prefix + ".conv_shortcut", cin, cout, k=1)

    def attn_block(prefix, c):
        gn(prefix + ".norm", c)
        conv(prefix + ".proj_in", c, c, k=1)
        tb = prefix + ".transformer_blocks.0"
        for nm in ("norm1", "norm2", "norm3"):
            sd[f"{tb}.{nm}.weight"] = rng.randn(c).astype(np.float32)
            sd[f"{tb}.{nm}.bias"] = rng.randn(c).astype(np.float32)
        for a, kdim in (("attn1", c), ("attn2", ctx)):
            sd[f"{tb}.{a}.to_q.weight"] = rng.randn(c, c).astype(np.float32)
            sd[f"{tb}.{a}.to_k.weight"] = rng.randn(c, kdim).astype(np.float32)
            sd[f"{tb}.{a}.to_v.weight"] = rng.randn(c, kdim).astype(np.float32)
            lin(f"{tb}.{a}.to_out.0", c, c)
        lin(f"{tb}.ff.net.0.proj", c, 8 * c)
        lin(f"{tb}.ff.net.2", 4 * c, c)
        conv(prefix + ".proj_out", c, c, k=1)

    temb = mc * 4
    lin("time_embedding.linear_1", mc, temb)
    lin("time_embedding.linear_2", temb, temb)
    conv("conv_in", 4, mc)
    chans = [mc * m for m in levels]
    cin = mc
    if attn_levels is None:
        attn_levels = tuple(range(len(levels)))
    for lv, cout in enumerate(chans):
        for b in range(nrb):
            resnet(f"down_blocks.{lv}.resnets.{b}", cin, cout, temb)
            if lv in attn_levels:
                attn_block(f"down_blocks.{lv}.attentions.{b}", cout)
            cin = cout
        if lv != len(chans) - 1:
            conv(f"down_blocks.{lv}.downsamplers.0.conv", cout, cout)
    resnet("mid_block.resnets.0", chans[-1], chans[-1], temb)
    attn_block("mid_block.attentions.0", chans[-1])
    resnet("mid_block.resnets.1", chans[-1], chans[-1], temb)
    # up blocks: skip concat doubles input channels
    skips = [mc] + [c for c in chans for _ in range(nrb)]
    # build with the same structural walk the model does
    hs = [mc]
    cur = mc
    for lv, cout in enumerate(chans):
        for b in range(nrb):
            hs.append(cout)
            cur = cout
        if lv != len(chans) - 1:
            hs.append(cout)
    cur = chans[-1]
    idx = 0
    for pos, lv in enumerate(reversed(range(len(chans)))):
        cout = chans[lv]
        for b in range(nrb + 1):
            skip = hs.pop()
            resnet(f"up_blocks.{pos}.resnets.{b}", cur + skip, cout, temb)
            if lv in attn_levels:
                attn_block(f"up_blocks.{pos}.attentions.{b}", cout)
            cur = cout
            if lv > 0 and b == nrb:
                conv(f"up_blocks.{pos}.upsamplers.0.conv", cout, cout)
            idx += 1
    gn("conv_norm_out", mc)
    conv("conv_out", mc, 4)
    return sd


def test_sd_unet_from_diffusers_loads_and_runs():
    import jax

    from cremage_tpu.io.diffusers_keys import sd_unet_from_diffusers
    from cremage_tpu.models.unet import UNetConfig, UNetModel

    sd = synth_diffusers_sd_unet()
    converted = sd_unet_from_diffusers(sd, channel_mult=(1, 2),
                                       num_res_blocks=1,
                                       attention_levels=(0, 1))
    cfg = UNetConfig(in_channels=4, out_channels=4, model_channels=32,
                     num_res_blocks=1, attention_resolutions=(1, 2),
                     channel_mult=(1, 2), num_heads=4,
                     transformer_depth=(1, 1), transformer_depth_middle=1,
                     context_dim=16, dtype=jnp.float32)
    model = UNetModel(cfg)
    tmpl = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 7, 16)),
    )["params"]
    params, missing, unused = CK.build_flax_params(tmpl, converted, prefix="")
    assert not missing, missing[:5]
    assert not unused, unused[:5]
    out = model.apply({"params": params}, jnp.ones((1, 8, 8, 4)) * 0.1,
                      jnp.full((1,), 10.0), jnp.ones((1, 7, 16)) * 0.1)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_sd_vae_from_diffusers_loads():
    import jax

    from cremage_tpu.io.diffusers_keys import sd_vae_from_diffusers
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig

    rng = np.random.RandomState(2)
    sd = {}

    def conv(name, i, o, k=3):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def gn(name, c):
        sd[name + ".weight"] = rng.randn(c).astype(np.float32)
        sd[name + ".bias"] = rng.randn(c).astype(np.float32)

    def lin(name, i, o):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def resnet(prefix, cin, cout):
        gn(prefix + ".norm1", cin)
        conv(prefix + ".conv1", cin, cout)
        gn(prefix + ".norm2", cout)
        conv(prefix + ".conv2", cout, cout)
        if cin != cout:
            conv(prefix + ".conv_shortcut", cin, cout, k=1)

    def attn(prefix, c):
        gn(prefix + ".group_norm", c)
        for nm in ("to_q", "to_k", "to_v"):
            sd[f"{prefix}.{nm}.weight"] = rng.randn(c, c).astype(np.float32)
            sd[f"{prefix}.{nm}.bias"] = rng.randn(c).astype(np.float32)
        lin(prefix + ".to_out.0", c, c)

    C = 32
    # encoder: single level for the tiny config ch_mult=(1,)
    conv("encoder.conv_in", 3, C)
    resnet("encoder.down_blocks.0.resnets.0", C, C)
    resnet("encoder.mid_block.resnets.0", C, C)
    attn("encoder.mid_block.attentions.0", C)
    resnet("encoder.mid_block.resnets.1", C, C)
    gn("encoder.conv_norm_out", C)
    conv("encoder.conv_out", C, 8)
    conv("decoder.conv_in", 4, C)
    resnet("decoder.mid_block.resnets.0", C, C)
    attn("decoder.mid_block.attentions.0", C)
    resnet("decoder.mid_block.resnets.1", C, C)
    for b in range(2):
        resnet(f"decoder.up_blocks.0.resnets.{b}", C, C)
    gn("decoder.conv_norm_out", C)
    conv("decoder.conv_out", C, 3)
    conv("quant_conv", 8, 8, k=1)
    conv("post_quant_conv", 4, 4, k=1)

    converted = sd_vae_from_diffusers(sd, num_levels=1, num_res_blocks=1)
    vae = AutoencoderKL(VAEConfig(ch=C, ch_mult=(1,), num_res_blocks=1,
                                  dtype=jnp.float32))
    tmpl = jax.eval_shape(vae.init, jax.random.key(0),
                          jnp.zeros((1, 16, 16, 3)))["params"]
    params, missing, unused = CK.build_flax_params(tmpl, converted, prefix="")
    assert not missing, missing[:5]
    out = vae.apply({"params": params}, jnp.ones((1, 16, 16, 3)) * 0.1)
    assert out.shape == (1, 16, 16, 3)


# ---------------- Kandinsky 2.2 prior ----------------------------------------

PRI_C, PRI_E, PRI_T, PRI_TOK = 32, 24, 16, 7


def synth_diffusers_prior(depth=2):
    rng = np.random.RandomState(3)
    sd = {}

    def lin(name, i, o):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def ln(name, c):
        sd[name + ".weight"] = rng.randn(c).astype(np.float32)
        sd[name + ".bias"] = rng.randn(c).astype(np.float32)

    lin("time_embedding.linear_1", PRI_C, PRI_C)
    lin("time_embedding.linear_2", PRI_C, PRI_C)
    lin("proj_in", PRI_E, PRI_C)
    lin("embedding_proj", PRI_T, PRI_C)
    lin("encoder_hidden_states_proj", PRI_T, PRI_C)
    sd["positional_embedding"] = rng.randn(1, PRI_TOK + 4, PRI_C).astype(np.float32)
    sd["prd_embedding"] = rng.randn(1, 1, PRI_C).astype(np.float32)
    for i in range(depth):
        b = f"transformer_blocks.{i}"
        ln(b + ".norm1", PRI_C)
        for p in ("q", "k", "v"):
            lin(f"{b}.attn1.to_{p}", PRI_C, PRI_C)
        lin(b + ".attn1.to_out.0", PRI_C, PRI_C)
        ln(b + ".norm3", PRI_C)
        lin(b + ".ff.net.0.proj", PRI_C, 4 * PRI_C)
        lin(b + ".ff.net.2", 4 * PRI_C, PRI_C)
    ln("norm_out", PRI_C)
    lin("proj_to_clip_embeddings", PRI_C, PRI_E)
    sd["clip_mean"] = rng.randn(1, PRI_E).astype(np.float32)
    sd["clip_std"] = (1 + rng.rand(1, PRI_E)).astype(np.float32)
    return sd


def test_kandinsky_prior_from_diffusers_loads_and_runs():
    from cremage_tpu.io.diffusers_keys import kandinsky_prior_from_diffusers
    from cremage_tpu.models.kandinsky import DiffusionPrior, PriorConfig

    sd = synth_diffusers_prior()
    converted = kandinsky_prior_from_diffusers(sd)
    clip_mean = converted.pop("clip_mean")
    clip_std = converted.pop("clip_std")
    assert clip_mean.shape == (1, PRI_E) and clip_std.shape == (1, PRI_E)

    cfg = PriorConfig(image_embed_dim=PRI_E, text_embed_dim=PRI_T,
                      hidden=PRI_C, num_layers=2, num_heads=4,
                      text_tokens=PRI_TOK, dtype=jnp.float32)
    model = DiffusionPrior(cfg)
    tmpl = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, PRI_E)),
        jnp.zeros((1,)), jnp.zeros((1, PRI_TOK, PRI_T)),
        jnp.zeros((1, PRI_T)),
    )["params"]
    params, missing, unused = CK.build_flax_params(tmpl, converted, prefix="")
    assert not missing, missing
    assert not unused, unused
    out = model.apply({"params": params}, jnp.ones((1, PRI_E)) * 0.1,
                      jnp.full((1,), 500.0), jnp.ones((1, PRI_TOK, PRI_T)) * 0.1,
                      jnp.ones((1, PRI_T)) * 0.1)
    assert out.shape == (1, PRI_E)
    assert np.isfinite(np.asarray(out)).all()
    # linear transpose fidelity: our out_proj kernel == torch weight^T
    np.testing.assert_allclose(
        np.asarray(params["out_proj"]["weight"]),
        sd["proj_to_clip_embeddings.weight"].T)
    # positional embedding is a table: squeezed, NOT transposed
    np.testing.assert_allclose(
        np.asarray(params["positional_embedding"]),
        sd["positional_embedding"][0])


def test_kandinsky_image_conditioner_from_diffusers():
    from cremage_tpu.io.diffusers_keys import (
        kandinsky_image_conditioner_from_diffusers,
    )
    from cremage_tpu.models.kandinsky import KandinskyImageConditioner

    rng = np.random.RandomState(4)
    E, TE, CD, NT = 24, 40, 16, 3
    sd = {}

    def lin(name, i, o):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    lin("add_embedding.image_proj", E, TE)
    lin("add_embedding.image_norm", TE, TE)  # LN weight/bias are 1-D
    sd["add_embedding.image_norm.weight"] = rng.randn(TE).astype(np.float32)
    sd["add_embedding.image_norm.bias"] = rng.randn(TE).astype(np.float32)
    lin("encoder_hid_proj.image_embeds", E, NT * CD)
    sd["encoder_hid_proj.norm.weight"] = rng.randn(CD).astype(np.float32)
    sd["encoder_hid_proj.norm.bias"] = rng.randn(CD).astype(np.float32)

    converted = kandinsky_image_conditioner_from_diffusers(sd)
    cond = KandinskyImageConditioner(time_embed_dim=TE, cross_dim=CD,
                                     num_tokens=NT, dtype=jnp.float32)
    tmpl = jax.eval_shape(cond.init, jax.random.key(0),
                          jnp.zeros((1, E)))["params"]
    params, missing, unused = CK.build_flax_params(tmpl, converted, prefix="")
    assert not missing, missing
    assert not unused, unused
    tvec, ctx = cond.apply({"params": params}, jnp.ones((2, E)) * 0.1)
    assert tvec.shape == (2, TE) and ctx.shape == (2, NT, CD)
    assert np.isfinite(np.asarray(ctx)).all()


# ---------------- Kandinsky 2.2 decoder UNet body ----------------------------

def synth_diffusers_kandinsky_unet(boc=(32, 64), lpb=1, ctx=16, in_ch=4,
                                   out_ch=8):
    """Tiny diffusers-layout Kandinsky decoder sd (scale-shift resnets,
    resnet samplers, added-KV attention); documents the expected
    checkpoint structure."""
    rng = np.random.RandomState(7)
    sd = {}
    ted = boc[0] * 4

    def lin(name, i, o):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def conv(name, i, o, k=3):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def gn(name, c):
        sd[name + ".weight"] = rng.randn(c).astype(np.float32)
        sd[name + ".bias"] = rng.randn(c).astype(np.float32)

    def resnet(prefix, cin, cout):
        gn(prefix + ".norm1", cin)
        conv(prefix + ".conv1", cin, cout)
        lin(prefix + ".time_emb_proj", ted, 2 * cout)  # scale_shift
        gn(prefix + ".norm2", cout)
        conv(prefix + ".conv2", cout, cout)
        if cin != cout:
            conv(prefix + ".conv_shortcut", cin, cout, k=1)

    def attn(prefix, c):
        gn(prefix + ".group_norm", c)
        for nm in ("to_q", "to_k", "to_v"):
            lin(f"{prefix}.{nm}", c, c)
        lin(prefix + ".add_k_proj", ctx, c)
        lin(prefix + ".add_v_proj", ctx, c)
        lin(prefix + ".to_out.0", c, c)

    lin("time_embedding.linear_1", boc[0], ted)
    lin("time_embedding.linear_2", ted, ted)
    conv("conv_in", in_ch, boc[0])
    hs = [boc[0]]
    cur = boc[0]
    n = len(boc)
    for lv, cout in enumerate(boc):
        for i in range(lpb):
            resnet(f"down_blocks.{lv}.resnets.{i}", cur, cout)
            if lv > 0:  # first down block is plain resnet
                attn(f"down_blocks.{lv}.attentions.{i}", cout)
            cur = cout
            hs.append(cur)
        if lv != n - 1:
            resnet(f"down_blocks.{lv}.downsamplers.0", cout, cout)
            hs.append(cout)
    resnet("mid_block.resnets.0", boc[-1], boc[-1])
    attn("mid_block.attentions.0", boc[-1])
    resnet("mid_block.resnets.1", boc[-1], boc[-1])
    for pos, lv in enumerate(reversed(range(n))):
        cout = boc[lv]
        for i in range(lpb + 1):
            resnet(f"up_blocks.{pos}.resnets.{i}", cur + hs.pop(), cout)
            if lv > 0:
                attn(f"up_blocks.{pos}.attentions.{i}", cout)
            cur = cout
        if lv != 0:
            resnet(f"up_blocks.{pos}.upsamplers.0", cout, cout)
    gn("conv_norm_out", boc[0])
    conv("conv_out", boc[0], out_ch)
    # conditioner heads (split out by the converter)
    lin("add_embedding.image_proj", 24, ted)
    sd["add_embedding.image_norm.weight"] = rng.randn(ted).astype(np.float32)
    sd["add_embedding.image_norm.bias"] = rng.randn(ted).astype(np.float32)
    lin("encoder_hid_proj.image_embeds", 24, 3 * ctx)
    sd["encoder_hid_proj.norm.weight"] = rng.randn(ctx).astype(np.float32)
    sd["encoder_hid_proj.norm.bias"] = rng.randn(ctx).astype(np.float32)
    return sd


def test_kandinsky_decoder_from_diffusers_loads_and_runs():
    from cremage_tpu.io.diffusers_keys import kandinsky_decoder_from_diffusers
    from cremage_tpu.models.kandinsky import KandinskyImageConditioner
    from cremage_tpu.models.kandinsky_decoder import (
        KandinskyUNet, KandinskyUNetConfig, kandinsky_decoder_eps,
    )

    sd = synth_diffusers_kandinsky_unet()
    body, cond_sd = kandinsky_decoder_from_diffusers(sd)
    cfg = KandinskyUNetConfig(block_out_channels=(32, 64),
                              layers_per_block=1, context_dim=16,
                              attention_head_dim=16, dtype=jnp.float32)
    model = KandinskyUNet(cfg)
    tmpl = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 3, 16)),
        jnp.zeros((1, cfg.time_embed_dim)),
    )["params"]
    params, missing, unused = CK.build_flax_params(tmpl, body, prefix="")
    assert not missing, missing[:5]
    assert not unused, unused[:5]

    cond = KandinskyImageConditioner(time_embed_dim=cfg.time_embed_dim,
                                     cross_dim=16, num_tokens=3,
                                     dtype=jnp.float32)
    c_tmpl = jax.eval_shape(cond.init, jax.random.key(1),
                            jnp.zeros((1, 24)))["params"]
    c_params, c_missing, c_unused = CK.build_flax_params(
        c_tmpl, cond_sd, prefix="")
    assert not c_missing and not c_unused, (c_missing, c_unused)

    tvec, ctx = cond.apply({"params": c_params}, jnp.ones((1, 24)) * 0.1)
    out = model.apply({"params": params}, jnp.ones((1, 8, 8, 4)) * 0.1,
                      jnp.full((1,), 500.0), ctx, tvec)
    assert out.shape == (1, 8, 8, 8)
    eps = kandinsky_decoder_eps(out)
    assert eps.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


# ---------------- Hunyuan-DiT ------------------------------------------------

def synth_diffusers_hunyuan(depth=4, c=32, clip=16, mt5=24, pooled=16,
                            tl=5, tl5=6, mlp=2.0, out_ch=8, patch=2):
    rng = np.random.RandomState(11)
    sd = {}

    def lin(name, i, o):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def ln(name, n):
        sd[name + ".weight"] = rng.randn(n).astype(np.float32)
        sd[name + ".bias"] = rng.randn(n).astype(np.float32)

    d_head = c // 4
    sd["pos_embed.proj.weight"] = rng.randn(c, 4, patch, patch).astype(np.float32)
    sd["pos_embed.proj.bias"] = rng.randn(c).astype(np.float32)
    lin("time_extra_emb.timestep_embedder.linear_1", 256, c)
    lin("time_extra_emb.timestep_embedder.linear_2", c, c)
    sd["time_extra_emb.pooler.positional_embedding"] = \
        rng.randn(tl5 + 1, mt5).astype(np.float32)
    for nm in ("q_proj", "k_proj", "v_proj"):
        lin(f"time_extra_emb.pooler.{nm}", mt5, mt5)
    lin("time_extra_emb.pooler.c_proj", mt5, pooled)
    lin("time_extra_emb.extra_embedder.linear_1", pooled, 4 * c)
    lin("time_extra_emb.extra_embedder.linear_2", 4 * c, c)
    lin("text_embedder.linear_1", mt5, 4 * mt5)
    lin("text_embedder.linear_2", 4 * mt5, clip)
    sd["text_embedding_padding"] = rng.randn(tl + tl5, clip).astype(np.float32)
    half = depth // 2
    for i in range(depth):
        b = f"blocks.{i}"
        if i >= half:
            ln(b + ".skip_norm", 2 * c)
            lin(b + ".skip_linear", 2 * c, c)
        ln(b + ".norm1.norm", c)
        lin(b + ".norm1.linear", c, c)
        for p in ("q", "k", "v"):
            lin(f"{b}.attn1.to_{p}", c, c)
        ln(b + ".attn1.norm_q", d_head)
        ln(b + ".attn1.norm_k", d_head)
        lin(b + ".attn1.to_out.0", c, c)
        ln(b + ".norm2", c)
        lin(b + ".attn2.to_q", c, c)
        for p in ("k", "v"):
            lin(f"{b}.attn2.to_{p}", clip, c)
        ln(b + ".attn2.norm_q", d_head)
        ln(b + ".attn2.norm_k", d_head)
        lin(b + ".attn2.to_out.0", c, c)
        ln(b + ".norm3", c)
        lin(b + ".ff.net.0.proj", c, int(c * mlp))
        lin(b + ".ff.net.2", int(c * mlp), c)
    lin("norm_out.linear", c, 2 * c)
    lin("proj_out", c, patch * patch * out_ch)
    return sd


def test_hunyuan_from_diffusers_loads_and_runs():
    from cremage_tpu.io.diffusers_keys import hunyuan_from_diffusers
    from cremage_tpu.models.hunyuan import HunyuanConfig, HunyuanDiT

    sd = synth_diffusers_hunyuan()
    converted = hunyuan_from_diffusers(sd)
    assert converted["blocks.0.attn1_qkv.weight"].shape == (96, 32)
    assert converted["blocks.0.attn2_kv.weight"].shape == (64, 16)

    cfg = HunyuanConfig(hidden_size=32, depth=4, num_heads=4, clip_dim=16,
                        mt5_dim=24, pooled_dim=16, mlp_ratio=2.0,
                        text_len=5, text_len_t5=6, dtype=jnp.float32)
    model = HunyuanDiT(cfg)
    tmpl = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 5, 16)), jnp.zeros((1, 6, 24)),
    )["params"]
    params, missing, unused = CK.build_flax_params(tmpl, converted, prefix="")
    assert not missing, missing[:5]
    assert not unused, unused[:5]
    out = model.apply({"params": params}, jnp.ones((1, 8, 8, 4)) * 0.1,
                      jnp.full((1,), 500.0), jnp.ones((1, 5, 16)) * 0.1,
                      jnp.ones((1, 6, 24)) * 0.1)
    assert out.shape == (1, 8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()
    # fused-qkv fidelity: q rows land first
    qkv = np.asarray(params["blocks_0"]["attn1_qkv"]["weight"])  # (in,3c)
    np.testing.assert_allclose(qkv[:, :32],
                               sd["blocks.0.attn1.to_q.weight"].T)


# ---------------- MoVQ decoder (Kandinsky stage A) ----------------------------

def synth_diffusers_movq(boc=(32, 64), lpb=1, z=4, out_ch=3):
    rng = np.random.RandomState(13)
    sd = {}

    def conv(name, i, o, k=3):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def lin(name, i, o):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def spatial(prefix, c):
        sd[prefix + ".norm_layer.weight"] = rng.randn(c).astype(np.float32)
        sd[prefix + ".norm_layer.bias"] = rng.randn(c).astype(np.float32)
        conv(prefix + ".conv_y", z, c, k=1)
        conv(prefix + ".conv_b", z, c, k=1)

    def resnet(prefix, cin, cout):
        spatial(prefix + ".norm1", cin)
        conv(prefix + ".conv1", cin, cout)
        spatial(prefix + ".norm2", cout)
        conv(prefix + ".conv2", cout, cout)
        if cin != cout:
            conv(prefix + ".conv_shortcut", cin, cout, k=1)

    conv("decoder.conv_in", z, boc[-1])
    resnet("decoder.mid_block.resnets.0", boc[-1], boc[-1])
    spatial("decoder.mid_block.attentions.0.spatial_norm", boc[-1])
    for nm in ("to_q", "to_k", "to_v"):
        lin(f"decoder.mid_block.attentions.0.{nm}", boc[-1], boc[-1])
    lin("decoder.mid_block.attentions.0.to_out.0", boc[-1], boc[-1])
    resnet("decoder.mid_block.resnets.1", boc[-1], boc[-1])
    n = len(boc)
    cur = boc[-1]
    for pos, lv in enumerate(reversed(range(n))):
        for i in range(lpb + 1):
            resnet(f"decoder.up_blocks.{pos}.resnets.{i}", cur, boc[lv])
            cur = boc[lv]
        if lv != 0:
            conv(f"decoder.up_blocks.{pos}.upsamplers.0.conv", cur, cur)
    spatial("decoder.conv_norm_out", boc[0])
    conv("decoder.conv_out", boc[0], out_ch)
    sd["quantize.embedding.weight"] = rng.randn(16, z).astype(np.float32)
    conv("post_quant_conv", z, z, k=1)
    return sd


def test_movq_decoder_from_diffusers_loads_and_runs():
    from cremage_tpu.io.diffusers_keys import movq_decoder_from_diffusers
    from cremage_tpu.models.vq import MoVQConfig, MoVQDecoder

    sd = synth_diffusers_movq()
    converted = movq_decoder_from_diffusers(sd)
    codebook = converted.pop("quantize.embedding")
    assert codebook.shape == (16, 4)
    converted = {k: v for k, v in converted.items()
                 if not k.startswith("post_quant_conv.")}

    cfg = MoVQConfig(block_out_channels=(32, 64), layers_per_block=1,
                     dtype=jnp.float32)
    dec = MoVQDecoder(cfg)
    tmpl = jax.eval_shape(dec.init, jax.random.key(0),
                          jnp.zeros((1, 8, 8, 4)))["params"]
    params, missing, unused = CK.build_flax_params(tmpl, converted, prefix="")
    assert not missing, missing[:5]
    assert not unused, unused[:5]
    out = dec.apply({"params": params}, jnp.ones((1, 8, 8, 4)) * 0.2)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


# ---------------- Stable Cascade (Würstchen) ----------------------------------

def synth_diffusers_cascade_c(ch=(32, 64), c_cond=32, c_r=64, txt=16):
    """Tiny diffusers StableCascadeUNet-layout dict for Stage C: flat
    per-level block lists (res, time, attn), sequential scalers."""
    rng = np.random.RandomState(17)
    sd = {}

    def lin(name, i, o):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def conv(name, i, o, k=1):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def res(prefix, c, skip=0):
        sd[prefix + ".depthwise.weight"] = rng.randn(c, 1, 3, 3).astype(np.float32)
        sd[prefix + ".depthwise.bias"] = rng.randn(c).astype(np.float32)
        lin(prefix + ".channelwise.0", c + skip, 4 * c)
        sd[prefix + ".channelwise.2.gamma"] = rng.randn(1, 1, 1, 4 * c).astype(np.float32)
        sd[prefix + ".channelwise.2.beta"] = rng.randn(1, 1, 1, 4 * c).astype(np.float32)
        lin(prefix + ".channelwise.4", 4 * c, c)

    def tstep(prefix, c):
        for nm in ("mapper", "mapper_sca", "mapper_crp"):
            lin(f"{prefix}.{nm}", c_r, 2 * c)

    def attn(prefix, c):
        lin(prefix + ".kv_mapper.1", c_cond, c)
        for nm in ("to_q", "to_k", "to_v"):
            lin(f"{prefix}.attention.{nm}", c, c)
        lin(prefix + ".attention.to_out.0", c, c)

    conv("embedding.1", 16, ch[0])
    lin("clip_txt_mapper", txt, c_cond)
    lin("clip_txt_pooled_mapper", txt, 4 * c_cond)
    lin("clip_img_mapper", 8, 4 * c_cond)
    for lv, c in enumerate(ch):
        res(f"down_blocks.{lv}.0", c)
        tstep(f"down_blocks.{lv}.1", c)
        attn(f"down_blocks.{lv}.2", c)
    conv("down_downscalers.1.1", ch[0], ch[1], k=2)
    for pos, lv in enumerate(reversed(range(len(ch)))):
        c = ch[lv]
        res(f"up_blocks.{pos}.0", c, skip=c if pos > 0 else 0)
        tstep(f"up_blocks.{pos}.1", c)
        attn(f"up_blocks.{pos}.2", c)
    # upscaler is a ConvTranspose2d k2 s2: torch weight (in, out, 2, 2)
    sd["up_upscalers.0.1.weight"] = rng.randn(ch[1], ch[0], 2, 2).astype(np.float32)
    sd["up_upscalers.0.1.bias"] = rng.randn(ch[0]).astype(np.float32)
    conv("clf.1", ch[0], 16)
    return sd


def test_cascade_unet_from_diffusers_loads_and_runs():
    from cremage_tpu.io.diffusers_keys import cascade_unet_from_diffusers
    from cremage_tpu.models.cascade import StageC, StageCConfig

    sd = synth_diffusers_cascade_c()
    converted = cascade_unet_from_diffusers(sd)
    # block renumbering: flat j=0/1/2 -> group 0 roles
    assert "down_blocks.0.0.res.depthwise.weight" in converted
    assert "down_blocks.0.0.time.mapper.weight" in converted
    assert "down_blocks.0.0.attn.kv_mapper.1.weight" in converted

    cfg = StageCConfig(c_hidden=(32, 64), blocks=(1, 1), num_heads=4,
                       c_cond=32, clip_text_dim=16,
                       clip_text_pooled_dim=16, dtype=jnp.float32)
    model = StageC(cfg)
    tmpl = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 4, 4, 16)),
        jnp.zeros((1,)), jnp.zeros((1, 7, 16)), jnp.zeros((1, 16)),
        jnp.zeros((1, 8)),
    )["params"]
    params, missing, unused = CK.build_flax_params(tmpl, converted, prefix="")
    assert not missing, missing[:5]
    assert not unused, unused[:5]
    out = model.apply({"params": params}, jnp.ones((1, 4, 4, 16)) * 0.1,
                      jnp.full((1,), 0.5), jnp.ones((1, 7, 16)) * 0.1,
                      jnp.ones((1, 16)) * 0.1, jnp.ones((1, 8)) * 0.1)
    assert out.shape == (1, 4, 4, 16)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_cascade_stage_b_from_diffusers_loads_and_runs():
    """Stage B round-trip: narrow levels without attention, effnet
    channel conditioning, single 'sca' extra cond."""
    from cremage_tpu.io.diffusers_keys import cascade_unet_from_diffusers
    from cremage_tpu.models.cascade import StageB, StageBConfig

    rng = np.random.RandomState(19)
    sd = {}
    ch, c_cond, c_r, txt = (16, 32), 32, 64, 16

    def lin(name, i, o):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def conv(name, i, o, k=1):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def res(prefix, c, skip=0):
        sd[prefix + ".depthwise.weight"] = rng.randn(c, 1, 3, 3).astype(np.float32)
        sd[prefix + ".depthwise.bias"] = rng.randn(c).astype(np.float32)
        lin(prefix + ".channelwise.0", c + skip, 4 * c)
        sd[prefix + ".channelwise.2.gamma"] = rng.randn(1, 1, 1, 4 * c).astype(np.float32)
        sd[prefix + ".channelwise.2.beta"] = rng.randn(1, 1, 1, 4 * c).astype(np.float32)
        lin(prefix + ".channelwise.4", 4 * c, c)

    def tstep(prefix, c):
        for nm in ("mapper", "mapper_sca"):
            lin(f"{prefix}.{nm}", c_r, 2 * c)

    def attn(prefix, c):
        lin(prefix + ".kv_mapper.1", c_cond, c)
        for nm in ("to_q", "to_k", "to_v"):
            lin(f"{prefix}.attention.{nm}", c, c)
        lin(prefix + ".attention.to_out.0", c, c)

    conv("embedding.1", 4 * 4, ch[0])   # pixel-unshuffled VQ latent (p=2)
    conv("effnet_mapper.0", 16, 4 * ch[0])
    conv("effnet_mapper.2", 4 * ch[0], ch[0])
    conv("pixels_mapper.0", 3, 4 * ch[0])
    conv("pixels_mapper.2", 4 * ch[0], ch[0])
    lin("clip_txt_pooled_mapper", txt, 4 * c_cond)
    # level 0: res + time only (no attention); level 1: res + time + attn
    res("down_blocks.0.0", ch[0])
    tstep("down_blocks.0.1", ch[0])
    res("down_blocks.1.0", ch[1])
    tstep("down_blocks.1.1", ch[1])
    attn("down_blocks.1.2", ch[1])
    conv("down_downscalers.1.1", ch[0], ch[1], k=2)
    res("up_blocks.0.0", ch[1])
    tstep("up_blocks.0.1", ch[1])
    attn("up_blocks.0.2", ch[1])
    res("up_blocks.1.0", ch[0], skip=ch[0])
    tstep("up_blocks.1.1", ch[0])
    sd["up_upscalers.0.1.weight"] = rng.randn(ch[1], ch[0], 2, 2).astype(np.float32)
    sd["up_upscalers.0.1.bias"] = rng.randn(ch[0]).astype(np.float32)
    conv("up_repeat_mappers.0.0", ch[1], ch[1])  # up_repeats=(2, 1)
    conv("clf.1", ch[0], 4 * 4)                  # PixelShuffle(p=2) head

    converted = cascade_unet_from_diffusers(sd)
    cfg = StageBConfig(c_hidden=ch, blocks=(1, 1), num_heads=4,
                       c_cond=c_cond, clip_text_pooled_dim=txt,
                       attn_levels=(1,), conds=("sca",),
                       down_repeats=(1, 1), up_repeats=(2, 1),
                       dtype=jnp.float32)
    model = StageB(cfg)
    tmpl = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 8, 8, 16)), jnp.zeros((1, txt)),
    )["params"]
    params, missing, unused = CK.build_flax_params(tmpl, converted, prefix="")
    assert not missing, missing[:5]
    assert not unused, unused[:5]
    out = model.apply({"params": params}, jnp.ones((1, 8, 8, 4)) * 0.1,
                      jnp.full((1,), 0.5), jnp.ones((1, 8, 8, 16)) * 0.1,
                      jnp.ones((1, txt)) * 0.1)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
