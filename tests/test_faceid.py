import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.io.faceid import (
    FACEID_LORA_RANK, build_faceid_proj, faceid_attention_slots,
    faceid_layout, merge_faceid, proj_module_from_params,
)
from cremage_tpu.models.faceid import (
    FaceIDProjConfig, FaceIDProjPlusConfig, MLPProjModel, ProjPlusModel,
)
from cremage_tpu.models.unet import UNetConfig, UNetModel, sd15_unet_config


def test_faceid_slot_table_sd15():
    """Mapping must match ml_utils.py:73's documented 32-slot layout."""
    slots = faceid_attention_slots(sd15_unet_config())
    assert len(slots) == 32
    # down blocks: indices 0..11 over input_blocks 1,2,4,5,7,8
    assert slots[0] == (("input_blocks_1_1", "transformer_blocks_0", "attn1"), "attn1")
    assert slots[1][0][2] == "attn2"
    assert slots[10][0][0] == "input_blocks_8_1"
    # up blocks: 12..29 over output_blocks 3..11
    assert slots[12][0][0] == "output_blocks_3_1"
    assert slots[28][0][0] == "output_blocks_11_1"
    # middle: 30,31
    assert slots[30][0][0] == "middle_block_1"
    assert slots[31] == (("middle_block_1", "transformer_blocks_0", "attn2"), "attn2")


def test_mlp_proj_model_shapes():
    proj = MLPProjModel(FaceIDProjConfig())
    params = proj.init(jax.random.key(0), jnp.zeros((1, 512)))
    out = proj.apply(params, jnp.ones((2, 512)))
    assert out.shape == (2, 4, 768)
    n = sum(np.prod(l.shape) for l in jax.tree.leaves(params))
    # 512*1024+1024 + 1024*3072+3072 + 768*2 (norm)
    assert n == 512 * 1024 + 1024 + 1024 * 3072 + 3072 + 768 * 2


def tiny_ipa_cfg():
    return UNetConfig(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=4,
        transformer_depth=(1, 1), transformer_depth_middle=1, context_dim=32,
        ipa_num_tokens=4, ipa_scale=1.0, dtype=jnp.float32,
    )


def test_merge_faceid_tiny():
    cfg = tiny_ipa_cfg()
    model = UNetModel(cfg)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 81, 32)),
    )["params"]
    slots = faceid_attention_slots(cfg)
    n_slots = len(slots)
    inner = 32  # heads*dim_head for this tiny config at ch=32... use slot dims

    rng = np.random.RandomState(0)
    ip_sd = {}
    # synthesize lora + ip weights for slot 0 (attn1) and slot 1 (attn2)
    def node_of(idx):
        node = params
        for p in slots[idx][0]:
            node = node[p]
        return node

    q0 = np.asarray(node_of(0)["to_q"]["weight"])
    in_dim, out_dim = q0.shape
    r = 4
    ip_sd["0.to_q_lora.down.weight"] = rng.randn(r, in_dim).astype(np.float32)
    ip_sd["0.to_q_lora.up.weight"] = rng.randn(out_dim, r).astype(np.float32)
    ctx_dim = np.asarray(node_of(1)["to_k"]["weight"]).shape[0]
    ip_sd["1.to_k_ip.weight"] = rng.randn(out_dim, ctx_dim).astype(np.float32)
    ip_sd["1.to_v_ip.weight"] = rng.randn(out_dim, ctx_dim).astype(np.float32)

    w_before = np.asarray(node_of(0)["to_q"]["weight"], np.float32)
    merged, installed = merge_faceid(params, ip_sd, cfg, weight=0.5)
    assert merged == 1 and installed == 2
    w_after = np.asarray(node_of(0)["to_q"]["weight"], np.float32)
    expected = w_before + 0.5 * (
        ip_sd["0.to_q_lora.up.weight"] @ ip_sd["0.to_q_lora.down.weight"]
    ).T
    np.testing.assert_allclose(w_after, expected, rtol=1e-5)
    # ipa projections installed with flax orientation
    np.testing.assert_allclose(
        np.asarray(node_of(1)["to_k_ipa"]["weight"]),
        ip_sd["1.to_k_ip.weight"].T,
    )
    # the modified tree still runs (81 = 77 text + 4 face tokens)
    model2 = UNetModel(cfg)
    out = model2.apply({"params": params}, jnp.zeros((1, 8, 8, 4)),
                       jnp.zeros((1,)), jnp.ones((1, 81, 32)))
    assert np.isfinite(np.asarray(out)).all()


def test_faceid_pipeline_integration():
    """FaceID tokens change the output; 77+4 context works end-to-end."""
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    bundle = make_bundle()
    # rebuild its unet with ipa branch
    cfg = tiny_ipa_cfg()
    model = UNetModel(cfg)
    unet_params = model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 81, 32)),
    )
    bundle.unet = model
    bundle.unet_params = unet_params
    proj = MLPProjModel(FaceIDProjConfig(cross_attention_dim=32))
    proj_params = proj.init(jax.random.key(1), jnp.zeros((1, 512)))
    bundle.faceid_proj = (proj, proj_params)
    bundle.faceid_num_tokens = 4

    pipe = SD15Pipeline(bundle)
    emb = np.random.RandomState(3).randn(512).astype(np.float32)
    out_face = pipe.generate(base_opts(), face_embedding=emb)[0][0]
    out_face2 = pipe.generate(base_opts(),
                              face_embedding=emb * -1.0)[0][0]
    assert np.isfinite(out_face).all()
    assert np.abs(out_face - out_face2).max() > 1e-5


# ---------------------------------------------------------------------------
# Plus(-v2) projection: torch-differential + wiring
# ---------------------------------------------------------------------------

def _torch_proj_plus(cross_attention_dim, id_embeddings_dim,
                     clip_embeddings_dim, num_tokens):
    """torch oracle with the reference's exact module tree / key names
    (ip_adapter_faceid.py:54-105,127-180; resampler.py:13-97)."""
    import math

    import torch

    class PerceiverAttention(torch.nn.Module):
        def __init__(self, *, dim, dim_head=64, heads=8):
            super().__init__()
            self.scale = dim_head ** -0.5
            self.dim_head = dim_head
            self.heads = heads
            inner = dim_head * heads
            self.norm1 = torch.nn.LayerNorm(dim)
            self.norm2 = torch.nn.LayerNorm(dim)
            self.to_q = torch.nn.Linear(dim, inner, bias=False)
            self.to_kv = torch.nn.Linear(dim, inner * 2, bias=False)
            self.to_out = torch.nn.Linear(inner, dim, bias=False)

        def forward(self, x, latents):
            x = self.norm1(x)
            latents = self.norm2(latents)
            b, l, _ = latents.shape
            q = self.to_q(latents)
            kv_input = torch.cat((x, latents), dim=-2)
            k, v = self.to_kv(kv_input).chunk(2, dim=-1)

            def rs(t):
                bs, length, _ = t.shape
                return t.view(bs, length, self.heads, -1).transpose(1, 2)

            q, k, v = rs(q), rs(k), rs(v)
            scale = 1 / math.sqrt(math.sqrt(self.dim_head))
            w = (q * scale) @ (k * scale).transpose(-2, -1)
            w = torch.softmax(w.float(), dim=-1).type(w.dtype)
            out = w @ v
            out = out.permute(0, 2, 1, 3).reshape(b, l, -1)
            return self.to_out(out)

    def FeedForward(dim, mult=4):
        inner = int(dim * mult)
        return torch.nn.Sequential(
            torch.nn.LayerNorm(dim),
            torch.nn.Linear(dim, inner, bias=False),
            torch.nn.GELU(),
            torch.nn.Linear(inner, dim, bias=False),
        )

    class FacePerceiverResampler(torch.nn.Module):
        def __init__(self, *, dim, depth, dim_head, heads, embedding_dim,
                     output_dim, ff_mult):
            super().__init__()
            self.proj_in = torch.nn.Linear(embedding_dim, dim)
            self.proj_out = torch.nn.Linear(dim, output_dim)
            self.norm_out = torch.nn.LayerNorm(output_dim)
            self.layers = torch.nn.ModuleList([])
            for _ in range(depth):
                self.layers.append(torch.nn.ModuleList([
                    PerceiverAttention(dim=dim, dim_head=dim_head,
                                       heads=heads),
                    FeedForward(dim=dim, mult=ff_mult),
                ]))

        def forward(self, latents, x):
            x = self.proj_in(x)
            for attn, ff in self.layers:
                latents = attn(x, latents) + latents
                latents = ff(latents) + latents
            latents = self.proj_out(latents)
            return self.norm_out(latents)

    class ProjPlus(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.cross_attention_dim = cross_attention_dim
            self.num_tokens = num_tokens
            self.proj = torch.nn.Sequential(
                torch.nn.Linear(id_embeddings_dim, id_embeddings_dim * 2),
                torch.nn.GELU(),
                torch.nn.Linear(id_embeddings_dim * 2,
                                cross_attention_dim * num_tokens),
            )
            self.norm = torch.nn.LayerNorm(cross_attention_dim)
            self.perceiver_resampler = FacePerceiverResampler(
                dim=cross_attention_dim, depth=4, dim_head=64,
                heads=cross_attention_dim // 64,
                embedding_dim=clip_embeddings_dim,
                output_dim=cross_attention_dim, ff_mult=4)

        def forward(self, id_embeds, clip_embeds, shortcut=False, scale=1.0):
            x = self.proj(id_embeds)
            x = x.reshape(-1, self.num_tokens, self.cross_attention_dim)
            x = self.norm(x)
            out = self.perceiver_resampler(x, clip_embeds)
            if shortcut:
                out = x + scale * out
            return out

    return ProjPlus()


@pytest.mark.parametrize("shortcut,scale", [(True, 1.0), (False, 1.0),
                                            (True, 0.5)])
def test_proj_plus_torch_differential(shortcut, scale):
    import torch

    torch.manual_seed(0)
    dims = dict(cross_attention_dim=128, id_embeddings_dim=32,
                clip_embeddings_dim=48, num_tokens=4)
    oracle = _torch_proj_plus(**dims)
    proj_sd = {k: v.detach().numpy() for k, v in
               oracle.state_dict().items()}
    assert faceid_layout(proj_sd) == "plus"
    proj, proj_vars, kind = build_faceid_proj(proj_sd)
    assert kind == "plus"
    assert isinstance(proj, ProjPlusModel)
    assert proj.cfg.clip_embeddings_dim == 48

    rng = np.random.RandomState(1)
    id_embeds = rng.randn(2, 32).astype(np.float32)
    clip_embeds = rng.randn(2, 17, 48).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(id_embeds),
                      torch.from_numpy(clip_embeds),
                      shortcut=shortcut, scale=scale).numpy()
    got = np.asarray(proj.apply(proj_vars, jnp.asarray(id_embeds),
                                jnp.asarray(clip_embeds),
                                shortcut=shortcut, scale=scale))
    assert got.shape == (2, 4, 128)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_faceid_layout_and_cache_roundtrip():
    proj = MLPProjModel(FaceIDProjConfig())
    sd = {"proj.0.weight": np.zeros((1024, 512), np.float32),
          "proj.0.bias": np.zeros((1024,), np.float32),
          "proj.2.weight": np.zeros((3072, 1024), np.float32),
          "proj.2.bias": np.zeros((3072,), np.float32),
          "norm.weight": np.ones((768,), np.float32),
          "norm.bias": np.zeros((768,), np.float32)}
    assert faceid_layout(sd) == "mlp"
    mod, proj_vars, kind = build_faceid_proj(sd)
    assert kind == "mlp" and isinstance(mod, MLPProjModel)
    # cached-params round trip picks the same module back
    mod2, kind2 = proj_module_from_params(proj_vars["params"])
    assert kind2 == "mlp" and isinstance(mod2, MLPProjModel)

    oracle = _torch_proj_plus(128, 32, 48, 4)
    plus_sd = {k: v.detach().numpy() for k, v in
               oracle.state_dict().items()}
    _, plus_vars, _ = build_faceid_proj(plus_sd)
    mod3, kind3 = proj_module_from_params(plus_vars["params"])
    assert kind3 == "plus" and isinstance(mod3, ProjPlusModel)
    assert mod3.cfg.clip_embeddings_dim == 48


def test_proj_plus_pipeline_integration():
    """Plus conditioning: dict embedding flows through _conditioning and
    the 77+4 UNet; missing dict keys raise the actionable error."""
    from tests.test_pipeline_sd15 import base_opts, make_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    bundle = make_bundle()
    cfg = tiny_ipa_cfg()
    model = UNetModel(cfg)
    unet_params = model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 81, 32)),
    )
    bundle.unet = model
    bundle.unet_params = unet_params
    pcfg = FaceIDProjPlusConfig(cross_attention_dim=128,
                                id_embeddings_dim=32,
                                clip_embeddings_dim=48, num_tokens=4)
    proj = ProjPlusModel(pcfg)
    proj_params = proj.init(jax.random.key(1), jnp.zeros((1, 32)),
                            jnp.zeros((1, 17, 48)))
    # 128-dim tokens don't fit the 32-dim tiny context; use a wrapper
    # projecting down (the shapes are what matters for the wiring)
    pcfg32 = FaceIDProjPlusConfig(cross_attention_dim=64,
                                  id_embeddings_dim=32,
                                  clip_embeddings_dim=48, num_tokens=4)
    del proj, proj_params, pcfg
    proj = ProjPlusModel(pcfg32)
    proj_params = proj.init(jax.random.key(1), jnp.zeros((1, 32)),
                            jnp.zeros((1, 17, 48)))
    bundle.faceid_num_tokens = 4
    bundle.faceid_kind = "plus"

    class _Down:
        """Project 64-d plus tokens to the tiny 32-d context."""

        def __init__(self, inner, params):
            self.inner, self.params = inner, params

        def apply(self, p, ids, ce, shortcut=True, scale=1.0):
            out = self.inner.apply(p, ids, ce, shortcut=shortcut,
                                   scale=scale)
            return out[..., :32]

    bundle.faceid_proj = (_Down(proj, proj_params), proj_params)

    pipe = SD15Pipeline(bundle)
    rng = np.random.RandomState(5)
    fd = {"id": rng.randn(32).astype(np.float32),
          "clip_embeds": rng.randn(17, 48).astype(np.float32),
          "uncond_clip_embeds": rng.randn(17, 48).astype(np.float32)}
    out = pipe.generate(base_opts(), face_embedding=fd)[0][0]
    assert np.isfinite(out).all()
    fd2 = dict(fd, clip_embeds=fd["clip_embeds"] * -1.0)
    out2 = pipe.generate(base_opts(), face_embedding=fd2)[0][0]
    assert np.abs(out - out2).max() > 1e-6

    with pytest.raises(ValueError, match="Plus conditioning"):
        pipe.generate(base_opts(), face_embedding={"id": fd["id"]})


def test_plus_checkpoint_loads_and_generates(tmp_path):
    """Exporter-written SD ckpt + a Plus-layout faceid .bin through
    load_sd15_bundle -> generate: the reference's default plusv2 file
    layout works end-to-end (VERDICT r2 item 1 done-criterion)."""
    import torch

    from cremage_tpu.core.dtypes import FP32_POLICY
    from cremage_tpu.io import export as EX
    from cremage_tpu.models.clip import CLIPTextConfig, CLIPTextModel
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from cremage_tpu.pipelines.loader import load_sd15_bundle
    from cremage_tpu.pipelines.sd15 import SD15Pipeline
    from tests.test_pipeline_sd15 import base_opts

    HID = 64
    unet_cfg = UNetConfig(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=4,
        transformer_depth=(1, 1), transformer_depth_middle=1,
        context_dim=HID, dtype=jnp.float32,
    )
    vae_cfg = VAEConfig(ch=32, ch_mult=(1, 1, 1, 1), num_res_blocks=1,
                        dtype=jnp.float32)
    clip_cfg = CLIPTextConfig(hidden_size=HID, num_layers=2, num_heads=4,
                              intermediate_size=128, dtype=jnp.float32)

    unet_p = UNetModel(unet_cfg).init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, HID)))["params"]
    vae_p = AutoencoderKL(vae_cfg).init(
        jax.random.key(1), jnp.zeros((1, 64, 64, 3)))["params"]
    clip_p = CLIPTextModel(clip_cfg).init(
        jax.random.key(2), jnp.zeros((1, 77), jnp.int32))["params"]
    ckpt = str(tmp_path / "tiny_sd15.safetensors")
    EX.save_sd15_checkpoint(ckpt, unet_p, vae_p, clip_p)

    # Plus-layout faceid checkpoint: image_proj from the torch oracle,
    # ip_adapter with to_k_ip/to_v_ip for every attn2 slot
    oracle = _torch_proj_plus(cross_attention_dim=HID,
                              id_embeddings_dim=512,
                              clip_embeddings_dim=48, num_tokens=4)
    rng = np.random.RandomState(7)
    ipa_cfg = UNetConfig(**{**unet_cfg.__dict__, "ipa_num_tokens": 4,
                            "ipa_scale": 1.0})
    tmpl = UNetModel(unet_cfg).init(
        jax.random.key(3), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, HID)))["params"]
    ip_sd = {}
    for idx, (path, attn) in enumerate(faceid_attention_slots(ipa_cfg)):
        if attn != "attn2":
            continue
        node = tmpl
        try:
            for p in path:
                node = node[p]
        except KeyError:
            continue
        inner = np.asarray(node["to_k"]["weight"]).shape[1]
        for name in ("to_k_ip", "to_v_ip"):
            ip_sd[f"{idx}.{name}.weight"] = torch.from_numpy(
                (rng.randn(inner, HID) * 0.02).astype(np.float32))
    faceid_bin = str(tmp_path / "ip-adapter-faceid-plusv2_tiny.bin")
    torch.save({"image_proj": oracle.state_dict(), "ip_adapter": ip_sd},
               faceid_bin)

    bundle = load_sd15_bundle(
        ckpt, faceid_ckpt=faceid_bin, unet_cfg_override=unet_cfg,
        vae_cfg_override=vae_cfg, clip_cfg_override=clip_cfg,
        use_cache=False, policy=FP32_POLICY)
    assert bundle.faceid_kind == "plus"
    assert isinstance(bundle.faceid_proj[0], ProjPlusModel)

    pipe = SD15Pipeline(bundle)
    fd = {"id": rng.randn(512).astype(np.float32),
          "clip_embeds": rng.randn(17, 48).astype(np.float32),
          "uncond_clip_embeds": rng.randn(17, 48).astype(np.float32)}
    imgs = pipe.generate(base_opts(), face_embedding=fd)[0]
    assert np.isfinite(imgs[0]).all()
