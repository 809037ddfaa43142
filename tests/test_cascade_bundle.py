"""Stable Cascade full-bundle assembly (pipelines/loader.py
load_cascade_bundle): tiny synthetic diffusers-layout component files
through the REAL conversion path -> Stage C -> Stage B -> Paella VQGAN
Stage A decode, plus torch micro-parity for the new Stage A ops.

Reference stack: modules/stable_cascade/txt2img.py
(StableCascadePriorPipeline + StableCascadeDecoderPipeline)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.core.config import GenerationOptions
from cremage_tpu.core.dtypes import DTypePolicy
from cremage_tpu.io import checkpoint as CK

from tests.test_kandinsky_bundle import tiny_hf_text_model, PRI_T, PRI_TOK
from tests.test_keylist_golden import synth_cascade

F32 = DTypePolicy(compute_dtype=jnp.float32, param_dtype=jnp.float32)


def synth_diffusers_paella_vq(embed_dim=32, levels=2, bottleneck=2,
                              latent=4, out_ch=3, scale=2):
    """Tiny diffusers PaellaVQModel-layout dict (decoder path);
    documents the expected checkpoint structure."""
    rng = np.random.RandomState(29)
    sd = {}

    def conv(name, i, o, k):
        sd[name + ".weight"] = (rng.randn(o, i, k, k) * 0.1).astype(np.float32)
        sd[name + ".bias"] = (rng.randn(o) * 0.1).astype(np.float32)

    def mix(prefix, dim):
        sd[prefix + ".gammas"] = (rng.randn(6) * 0.2).astype(np.float32)
        sd[prefix + ".depthwise.1.weight"] = (
            rng.randn(dim, 1, 3, 3) * 0.1).astype(np.float32)
        sd[prefix + ".depthwise.1.bias"] = (
            rng.randn(dim) * 0.1).astype(np.float32)
        sd[prefix + ".channelwise.0.weight"] = (
            rng.randn(4 * dim, dim) * 0.1).astype(np.float32)
        sd[prefix + ".channelwise.0.bias"] = (
            rng.randn(4 * dim) * 0.1).astype(np.float32)
        sd[prefix + ".channelwise.2.weight"] = (
            rng.randn(dim, 4 * dim) * 0.1).astype(np.float32)
        sd[prefix + ".channelwise.2.bias"] = (
            rng.randn(dim) * 0.1).astype(np.float32)

    c_levels = [embed_dim // (2 ** i) for i in reversed(range(levels))]
    conv("up_blocks.0.0", latent, c_levels[-1], 1)
    idx = 1
    for i in range(levels):
        c = c_levels[levels - 1 - i]
        for _ in range(bottleneck if i == 0 else 1):
            mix(f"up_blocks.{idx}", c)
            idx += 1
        if i < levels - 1:
            # torch ConvTranspose2d weight layout (in, out, 4, 4)
            o = c_levels[levels - 2 - i]
            sd[f"up_blocks.{idx}.weight"] = (
                rng.randn(c, o, 4, 4) * 0.1).astype(np.float32)
            sd[f"up_blocks.{idx}.bias"] = (
                rng.randn(o) * 0.1).astype(np.float32)
            idx += 1
    conv("out_block.0", c_levels[0], out_ch * scale * scale, 1)
    # encoder/vquantizer keys present in the real file; the converter
    # must drop them
    sd["vquantizer.codebook.weight"] = rng.randn(16, latent).astype(np.float32)
    sd["down_blocks.0.weight"] = rng.randn(8, 8).astype(np.float32)
    return sd


def tiny_vq_cfg():
    from cremage_tpu.models.vq import PaellaVQConfig

    return PaellaVQConfig(embed_dim=32, levels=2, bottleneck_blocks=2,
                          latent_channels=4, dtype=jnp.float32)


def write_components(tmp_path):
    sd_c = synth_cascade(ch=(16, 24), blocks=(1, 1), attn_levels=(0, 1),
                         conds=("sca", "crp"), c_cond=16, txt=PRI_T,
                         embed_in=16, out_ch=16)
    sd_b = synth_cascade(ch=(16, 24), blocks=(1, 1), attn_levels=(1,),
                         conds=("sca",), c_cond=16, txt=0,
                         embed_in=16, out_ch=16, effnet=16, pixels=3)
    paths = {}
    for name, sd in (("stage_c", sd_c), ("stage_b", sd_b),
                     ("vqgan", synth_diffusers_paella_vq())):
        p = str(tmp_path / f"{name}.safetensors")
        CK.save_safetensors(p, {k: np.asarray(v) for k, v in sd.items()})
        paths[name] = p
    hf = tiny_hf_text_model()
    tsd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    p = str(tmp_path / "text_encoder.safetensors")
    CK.save_safetensors(p, tsd)
    paths["text_encoder"] = p
    return paths, hf


def tiny_cfgs():
    from cremage_tpu.models.cascade import StageBConfig, StageCConfig

    return dict(
        stage_c_cfg=StageCConfig(
            c_hidden=(16, 24), blocks=(1, 1), num_heads=4, c_cond=16,
            clip_text_dim=PRI_T, clip_text_pooled_dim=PRI_T,
            clip_img_dim=8, in_channels=16, out_channels=16,
            down_repeats=(1, 1), up_repeats=(1, 1), dtype=jnp.float32),
        stage_b_cfg=StageBConfig(
            c_hidden=(16, 24), blocks=(1, 1), num_heads=4, c_cond=16,
            clip_text_pooled_dim=PRI_T, attn_levels=(1,), conds=("sca",),
            down_repeats=(1, 1), up_repeats=(1, 1), dtype=jnp.float32),
        vq_cfg=tiny_vq_cfg(),
    )


def test_paella_decoder_loads_and_upscales(tmp_path):
    """Converter + module shape contract: 4-ch latent -> 4x-upscaled RGB
    through the real conversion path, encoder keys dropped."""
    from cremage_tpu.io.diffusers_keys import paella_vq_decoder_from_diffusers
    from cremage_tpu.models.vq import PaellaVQDecoder

    sd = synth_diffusers_paella_vq()
    conv = paella_vq_decoder_from_diffusers(sd)
    assert not any(k.startswith(("vquantizer.", "down_blocks."))
                   for k in conv)
    dec = PaellaVQDecoder(tiny_vq_cfg())
    tmpl = jax.eval_shape(dec.init, jax.random.key(0),
                          jnp.zeros((1, 8, 8, 4)))["params"]
    params, missing, unused = CK.build_flax_params(
        tmpl, conv, prefix="", dtype=jnp.float32)
    assert not missing and not unused
    out = dec.apply({"params": params}, jnp.ones((1, 8, 8, 4)))
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_load_cascade_bundle_end_to_end(tmp_path):
    from cremage_tpu.pipelines.cascade import CascadePipeline
    from cremage_tpu.pipelines.loader import load_cascade_bundle

    paths, _ = write_components(tmp_path)
    bundle = load_cascade_bundle(
        paths["stage_c"], paths["stage_b"], paths["text_encoder"],
        vqgan_ckpt=paths["vqgan"], policy=F32, **tiny_cfgs())
    assert bundle.decode_latent is not None

    pipe = CascadePipeline(bundle)
    opts = GenerationOptions(prompt="a castle", negative_prompt="bad",
                             H=64, W=64, sampling_steps=2, n_samples=1,
                             seed=3, scale=4.0, sampler="Euler A",
                             safety_check=False, watermark=False)
    img, meta = pipe.generate(opts)[0]
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert meta["seed"] == 3


def test_cascade_text_contract_is_pre_final_ln(tmp_path):
    """Stage C conditions on hidden_states[-1] (diffusers
    StableCascadePriorPipeline), not the final-LN output."""
    import torch

    from cremage_tpu.pipelines.loader import load_hf_clip_text_tower
    from cremage_tpu.prompt.tokenizer import default_tokenizer

    paths, hf = write_components(tmp_path)
    _, _, enc_pre = load_hf_clip_text_tower(paths["text_encoder"], F32,
                                            pre_final_ln=True)
    prompt = "a castle on a hill"
    hidden, pooled = enc_pre(prompt)
    ids = default_tokenizer().encode_with_specials(prompt, max_len=PRI_TOK)
    with torch.no_grad():
        out = hf(input_ids=torch.tensor([ids]), output_hidden_states=True)
    np.testing.assert_allclose(hidden, out.hidden_states[-1][0].numpy(),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(pooled, out.text_embeds[0].numpy(),
                               atol=2e-5, rtol=2e-5)


def test_convtranspose4x4_matches_torch():
    import torch

    from cremage_tpu.models.vq import ConvTranspose4x4s2

    torch.manual_seed(0)
    tconv = torch.nn.ConvTranspose2d(6, 5, 4, stride=2, padding=1)
    x = torch.randn(2, 6, 7, 9)
    ref = tconv(x).detach().numpy()
    w = tconv.weight.detach().numpy()          # (in, out, 4, 4)
    ours = ConvTranspose4x4s2(5, dtype=jnp.float32)
    params = {"params": {
        "weight": jnp.asarray(w.transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    out = np.asarray(ours.apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                               atol=1e-5, rtol=1e-5)


def test_mixing_residual_block_matches_torch():
    import torch

    from cremage_tpu.models.vq import MixingResidualBlock

    class TorchMix(torch.nn.Module):
        """diffusers wuerstchen MixingResidualBlock semantics."""

        def __init__(self, dim, emb):
            super().__init__()
            self.norm1 = torch.nn.LayerNorm(dim, elementwise_affine=False,
                                            eps=1e-6)
            self.depthwise = torch.nn.Sequential(
                torch.nn.ReplicationPad2d(1),
                torch.nn.Conv2d(dim, dim, kernel_size=3, groups=dim))
            self.norm2 = torch.nn.LayerNorm(dim, elementwise_affine=False,
                                            eps=1e-6)
            self.channelwise = torch.nn.Sequential(
                torch.nn.Linear(dim, emb), torch.nn.GELU(),
                torch.nn.Linear(emb, dim))
            self.gammas = torch.nn.Parameter(torch.randn(6) * 0.3)

        def forward(self, x):
            m = self.gammas
            t = self.norm1(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2) \
                * (1 + m[0]) + m[1]
            x = x + self.depthwise(t) * m[2]
            t = self.norm2(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2) \
                * (1 + m[3]) + m[4]
            x = x + self.channelwise(
                t.permute(0, 2, 3, 1)).permute(0, 3, 1, 2) * m[5]
            return x

    torch.manual_seed(1)
    tm = TorchMix(6, 12)
    x = torch.randn(1, 6, 5, 5)
    ref = tm(x).detach().numpy()
    p = {
        "gammas": jnp.asarray(tm.gammas.detach().numpy()),
        "depthwise_1_weight": jnp.asarray(
            tm.depthwise[1].weight.detach().numpy().transpose(2, 3, 1, 0)),
        "depthwise_1_bias": jnp.asarray(
            tm.depthwise[1].bias.detach().numpy()),
        "channelwise_0": {
            "weight": jnp.asarray(tm.channelwise[0].weight.detach().numpy().T),
            "bias": jnp.asarray(tm.channelwise[0].bias.detach().numpy())},
        "channelwise_2": {
            "weight": jnp.asarray(tm.channelwise[2].weight.detach().numpy().T),
            "bias": jnp.asarray(tm.channelwise[2].bias.detach().numpy())},
    }
    blk = MixingResidualBlock(6, 12, dtype=jnp.float32)
    out = np.asarray(blk.apply(
        {"params": p}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                               atol=1e-5, rtol=1e-5)
