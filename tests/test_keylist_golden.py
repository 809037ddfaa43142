"""Golden key-list fixtures at PUBLISHED model structure.

VERDICT round-1 item 5: the Kandinsky/Hunyuan/Cascade (and SD/PixArt/
MoVQ) converters were written from documented diffusers layouts but
never checked against real weight files. These tests pin the layouts in
reviewable text form: each fixture file (tests/fixtures/keylists/*.txt)
holds the full checkpoint key list at the PUBLISHED block counts /
depths / attention placement (tensor widths reduced so tests stay
fast — widths do not change key NAMES). Each test asserts:

  1. the synthesized state dict's key set equals the fixture, and
  2. the converter maps every key onto the model template at the same
     published structure with zero missing / zero unused params.

Provenance: transcribed from the published diffusers model layouts
(UNet2DConditionModel, PriorTransformer, HunyuanDiT2DModel,
PixArtTransformer2DModel, VQModel[movq], StableCascadeUNet) and the
original StableCascade stage_b/stage_c module definitions. When real
weight files land, tools/parity_lpips.py + these fixtures localize any
residual naming drift immediately.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.io import checkpoint as CK
from tests.test_diffusers_keys import (
    synth_diffusers_hunyuan, synth_diffusers_kandinsky_unet,
    synth_diffusers_movq, synth_diffusers_pixart, synth_diffusers_prior,
    synth_diffusers_sd_unet,
)

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "keylists")


def check_fixture(name: str, sd: dict):
    # fixtures are PINNED (no regen path): drift is a failure to
    # investigate, and the SD1.5 layout is additionally anchored to the
    # reference's own canonical key list in test_reference_keylists.py
    path = os.path.join(FIXDIR, name + ".txt")
    got = sorted(sd)
    with open(path) as f:
        want = [ln for ln in f.read().splitlines() if ln]
    assert got == want, (
        f"{name}: key list drifted from fixture "
        f"(+{sorted(set(got) - set(want))[:5]} "
        f"-{sorted(set(want) - set(got))[:5]})")


def assert_full_coverage(tmpl, converted, name):
    params, missing, unused = CK.build_flax_params(tmpl, converted,
                                                   prefix="")
    assert not missing, f"{name} missing: {missing[:8]}"
    assert not unused, f"{name} unused: {unused[:8]}"
    return params


# --------------- SD1.5 UNet (diffusers layout) -------------------------------

def test_sd15_unet_published_structure():
    from cremage_tpu.io.diffusers_keys import sd_unet_from_diffusers
    from cremage_tpu.models.unet import UNetConfig, UNetModel

    # published: 4 levels x2 resblocks, attention on levels 0-2
    sd = synth_diffusers_sd_unet(mc=32, levels=(1, 2, 4, 4), nrb=2,
                                 ctx=24, attn_levels=(0, 1, 2))
    check_fixture("sd15_unet_diffusers", sd)
    converted = sd_unet_from_diffusers(sd)
    cfg = UNetConfig(model_channels=32, num_res_blocks=2,
                     attention_resolutions=(4, 2, 1),
                     channel_mult=(1, 2, 4, 4), num_heads=4,
                     transformer_depth=(1, 1, 1, 1),
                     transformer_depth_middle=1, context_dim=24,
                     dtype=jnp.float32)
    tmpl = jax.eval_shape(
        UNetModel(cfg).init, jax.random.key(0), jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 77, 24)))["params"]
    assert_full_coverage(tmpl, converted, "sd15_unet")


# --------------- Kandinsky 2.2 -----------------------------------------------

def test_kandinsky_prior_published_structure():
    from cremage_tpu.io.diffusers_keys import kandinsky_prior_from_diffusers
    from cremage_tpu.models.kandinsky import DiffusionPrior, PriorConfig
    from tests.test_diffusers_keys import PRI_C, PRI_E, PRI_T, PRI_TOK

    sd = synth_diffusers_prior(depth=20)       # published num_layers=20
    check_fixture("kandinsky22_prior", sd)
    converted = kandinsky_prior_from_diffusers(sd)
    converted.pop("clip_mean"), converted.pop("clip_std")
    cfg = PriorConfig(image_embed_dim=PRI_E, text_embed_dim=PRI_T,
                      hidden=PRI_C, num_layers=20, num_heads=4,
                      text_tokens=PRI_TOK, dtype=jnp.float32)
    model = DiffusionPrior(cfg)
    tmpl = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, PRI_E)),
        jnp.zeros((1,)), jnp.zeros((1, PRI_TOK, PRI_T)),
        jnp.zeros((1, PRI_T)))["params"]
    assert_full_coverage(tmpl, converted, "prior")


def test_kandinsky_decoder_published_structure():
    from cremage_tpu.io.diffusers_keys import kandinsky_decoder_from_diffusers
    from cremage_tpu.models.kandinsky import KandinskyImageConditioner
    from cremage_tpu.models.kandinsky_decoder import (
        KandinskyUNet, KandinskyUNetConfig,
    )

    # published: block_out_channels (384,768,1152,1536), 3 layers/block
    sd = synth_diffusers_kandinsky_unet(boc=(32, 64, 96, 128), lpb=3,
                                        ctx=16)
    check_fixture("kandinsky22_decoder_unet", sd)
    body, cond_sd = kandinsky_decoder_from_diffusers(sd)
    cfg = KandinskyUNetConfig(block_out_channels=(32, 64, 96, 128),
                              layers_per_block=3, context_dim=16,
                              attention_head_dim=16, dtype=jnp.float32)
    model = KandinskyUNet(cfg)
    tmpl = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 3, 16)),
        jnp.zeros((1, cfg.time_embed_dim)))["params"]
    assert_full_coverage(tmpl, body, "kandinsky_unet")

    cond = KandinskyImageConditioner(time_embed_dim=cfg.time_embed_dim,
                                     cross_dim=16, num_tokens=3,
                                     dtype=jnp.float32)
    c_tmpl = jax.eval_shape(cond.init, jax.random.key(1),
                            jnp.zeros((1, 24)))["params"]
    assert_full_coverage(c_tmpl, cond_sd, "kandinsky_cond")


def test_movq_published_structure():
    from cremage_tpu.io.diffusers_keys import movq_decoder_from_diffusers
    from cremage_tpu.models.vq import MoVQConfig, MoVQDecoder

    # published: block_out_channels (128,256,256,512), 2 layers/block
    sd = synth_diffusers_movq(boc=(32, 64, 64, 128), lpb=2)
    check_fixture("kandinsky22_movq", sd)
    converted = movq_decoder_from_diffusers(sd)
    converted.pop("quantize.embedding")
    converted = {k: v for k, v in converted.items()
                 if not k.startswith("post_quant_conv.")}
    cfg = MoVQConfig(block_out_channels=(32, 64, 64, 128),
                     layers_per_block=2, dtype=jnp.float32)
    tmpl = jax.eval_shape(MoVQDecoder(cfg).init, jax.random.key(0),
                          jnp.zeros((1, 4, 4, 4)))["params"]
    assert_full_coverage(tmpl, converted, "movq")


# --------------- Hunyuan-DiT / PixArt ----------------------------------------

def test_hunyuan_published_structure():
    from cremage_tpu.io.diffusers_keys import hunyuan_from_diffusers
    from cremage_tpu.models.hunyuan import HunyuanConfig, HunyuanDiT

    sd = synth_diffusers_hunyuan(depth=40)     # published num_layers=40
    check_fixture("hunyuan_dit_v12", sd)
    converted = hunyuan_from_diffusers(sd)
    cfg = HunyuanConfig(hidden_size=32, depth=40, num_heads=4, clip_dim=16,
                        mt5_dim=24, pooled_dim=16, mlp_ratio=2.0,
                        text_len=5, text_len_t5=6, dtype=jnp.float32)
    tmpl = jax.eval_shape(
        HunyuanDiT(cfg).init, jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 5, 16)),
        jnp.zeros((1, 6, 24)))["params"]
    assert_full_coverage(tmpl, converted, "hunyuan")


def test_pixart_published_structure():
    from cremage_tpu.io.diffusers_keys import pixart_from_diffusers
    from cremage_tpu.models.pixart import PixArt, PixArtConfig
    from tests.test_diffusers_keys import HID, T5D

    sd = synth_diffusers_pixart(depth=28)      # published num_layers=28
    check_fixture("pixart_sigma", sd)
    converted = pixart_from_diffusers(sd)
    cfg = PixArtConfig(hidden_size=HID, depth=28, num_heads=4,
                       context_dim=T5D, dtype=jnp.float32)
    tmpl = jax.eval_shape(
        PixArt(cfg).init, jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 6, T5D)))["params"]
    assert_full_coverage(tmpl, converted, "pixart")


# --------------- Stable Cascade ----------------------------------------------

def synth_cascade(ch, blocks, attn_levels, conds, c_cond, txt, c_r=64,
                  up_repeats=None, embed_in=16, out_ch=16, clip_img=None,
                  effnet=None, pixels=None):
    """Generalized StableCascadeUNet state dict: flat per-level lists of
    (Res, Time[, Attn]) module triples, LN+Conv downscalers, LN+
    ConvTranspose upscalers, optional up repeat-mappers."""
    rng = np.random.RandomState(23)
    sd = {}

    def lin(name, i, o):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def conv(name, i, o, k=1):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def res(prefix, c, skip=0):
        sd[prefix + ".depthwise.weight"] = \
            rng.randn(c, 1, 3, 3).astype(np.float32)
        sd[prefix + ".depthwise.bias"] = rng.randn(c).astype(np.float32)
        lin(prefix + ".channelwise.0", c + skip, 4 * c)
        sd[prefix + ".channelwise.2.gamma"] = \
            rng.randn(1, 1, 1, 4 * c).astype(np.float32)
        sd[prefix + ".channelwise.2.beta"] = \
            rng.randn(1, 1, 1, 4 * c).astype(np.float32)
        lin(prefix + ".channelwise.4", 4 * c, c)

    def tstep(prefix, c):
        lin(f"{prefix}.mapper", c_r, 2 * c)
        for cond in conds:
            lin(f"{prefix}.mapper_{cond}", c_r, 2 * c)

    def attn(prefix, c):
        lin(prefix + ".kv_mapper.1", c_cond, c)
        for nm in ("to_q", "to_k", "to_v"):
            lin(f"{prefix}.attention.{nm}", c, c)
        lin(prefix + ".attention.to_out.0", c, c)

    n = len(ch)
    up_repeats = up_repeats or (1,) * n
    conv("embedding.1", embed_in, ch[0])
    if txt:
        lin("clip_txt_mapper", txt, c_cond)
    lin("clip_txt_pooled_mapper", txt or c_cond, 4 * c_cond)
    if clip_img:
        lin("clip_img_mapper", clip_img, 4 * c_cond)
    if effnet:
        conv("effnet_mapper.0", effnet, 4 * ch[0])
        conv("effnet_mapper.2", 4 * ch[0], ch[0])
    if pixels:
        conv("pixels_mapper.0", pixels, 4 * ch[0])
        conv("pixels_mapper.2", 4 * ch[0], ch[0])

    for lv in range(n):
        c = ch[lv]
        if lv > 0:
            conv(f"down_downscalers.{lv}.1", ch[lv - 1], c, k=2)
        j = 0
        for _ in range(blocks[lv]):
            res(f"down_blocks.{lv}.{j}", c); j += 1
            tstep(f"down_blocks.{lv}.{j}", c); j += 1
            if lv in attn_levels:
                attn(f"down_blocks.{lv}.{j}", c); j += 1

    for pos, lv in enumerate(reversed(range(n))):
        c = ch[lv]
        j = 0
        for g in range(blocks[::-1][pos]):
            res(f"up_blocks.{pos}.{j}", c,
                skip=c if (pos > 0 and g == 0) else 0); j += 1
            tstep(f"up_blocks.{pos}.{j}", c); j += 1
            if lv in attn_levels:
                attn(f"up_blocks.{pos}.{j}", c); j += 1
        for r in range(up_repeats[pos] - 1):
            conv(f"up_repeat_mappers.{pos}.{r}", c, c)
        if lv > 0:
            # ConvTranspose2d: torch weight (in, out, 2, 2)
            sd[f"up_upscalers.{pos}.1.weight"] = \
                rng.randn(c, ch[lv - 1], 2, 2).astype(np.float32)
            sd[f"up_upscalers.{pos}.1.bias"] = \
                rng.randn(ch[lv - 1]).astype(np.float32)
    conv("clf.1", ch[0], out_ch)
    return sd


def test_cascade_stage_c_published_structure():
    from cremage_tpu.io.diffusers_keys import cascade_unet_from_diffusers
    from cremage_tpu.models.cascade import StageC, StageCConfig

    # published: c_hidden (2048,2048), blocks (8,24), attn everywhere,
    # conds (sca, crp), clip text+pooled+img mappers
    sd = synth_cascade(ch=(32, 32), blocks=(8, 24), attn_levels=(0, 1),
                       conds=("sca", "crp"), c_cond=32, txt=16,
                       clip_img=8, embed_in=16, out_ch=16)
    check_fixture("cascade_stage_c", sd)
    converted = cascade_unet_from_diffusers(sd)
    cfg = StageCConfig(c_hidden=(32, 32), blocks=(8, 24), num_heads=4,
                       c_cond=32, clip_text_dim=16,
                       clip_text_pooled_dim=16, clip_img_dim=8,
                       dtype=jnp.float32)
    tmpl = jax.eval_shape(
        StageC(cfg).init, jax.random.key(0), jnp.zeros((1, 4, 4, 16)),
        jnp.zeros((1,)), jnp.zeros((1, 7, 16)), jnp.zeros((1, 16)),
        jnp.zeros((1, 8)))["params"]
    assert_full_coverage(tmpl, converted, "stage_c")


def test_cascade_stage_b_published_structure():
    from cremage_tpu.io.diffusers_keys import cascade_unet_from_diffusers
    from cremage_tpu.models.cascade import StageB, StageBConfig

    # published: c_hidden (320,640,1280,1280), blocks (2,6,28,6), attn
    # at levels 2-3, cond (sca), up repeats (3,3,2,2), patch 2,
    # effnet + pixels mappers
    sd = synth_cascade(ch=(16, 24, 32, 32), blocks=(2, 6, 28, 6),
                       attn_levels=(2, 3), conds=("sca",), c_cond=32,
                       txt=0, up_repeats=(3, 3, 2, 2), embed_in=16,
                       out_ch=16, effnet=16, pixels=3)
    check_fixture("cascade_stage_b", sd)
    converted = cascade_unet_from_diffusers(sd)
    cfg = StageBConfig(c_hidden=(16, 24, 32, 32), blocks=(2, 6, 28, 6),
                       num_heads=4, c_cond=32, clip_text_pooled_dim=32,
                       attn_levels=(2, 3), conds=("sca",),
                       down_repeats=(1, 1, 1, 1), up_repeats=(3, 3, 2, 2),
                       dtype=jnp.float32)
    tmpl = jax.eval_shape(
        StageB(cfg).init, jax.random.key(0), jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 4, 4, 16)),
        jnp.zeros((1, 32)))["params"]
    assert_full_coverage(tmpl, converted, "stage_b")
