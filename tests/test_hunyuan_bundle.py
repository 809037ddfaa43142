"""Hunyuan-DiT full-bundle assembly (pipelines/loader.py
load_hunyuan_bundle): tiny synthetic diffusers-layout component files
through the REAL conversion path -> BertModel + mT5 conditioning ->
depth-N DiT -> KL VAE decode.

Reference stack: modules/hunyuan_dit/txt2img.py (diffusers
HunyuanDiTPipeline: BertModel text_encoder + mT5 text_encoder_2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cremage_tpu.core.config import GenerationOptions
from cremage_tpu.core.dtypes import DTypePolicy
from cremage_tpu.io import checkpoint as CK

from tests.test_diffusers_keys import synth_diffusers_hunyuan

F32 = DTypePolicy(compute_dtype=jnp.float32, param_dtype=jnp.float32)

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "cat", "photo",
         "of", "the", "##s", "paint", "##ing"]


def tiny_bert_model():
    import torch
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel as HFBertModel

    cfg = HFBertConfig(vocab_size=len(VOCAB) + 8, hidden_size=16,
                       num_hidden_layers=2, num_attention_heads=2,
                       intermediate_size=32, max_position_embeddings=64,
                       type_vocab_size=2)
    torch.manual_seed(0)
    return HFBertModel(cfg).eval()


def tiny_mt5_model():
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    cfg = HFT5Config(vocab_size=64, d_model=24, d_kv=4, num_heads=2,
                     d_ff=32, num_layers=2, feed_forward_proj="gated-gelu",
                     dropout_rate=0.0)
    torch.manual_seed(1)
    return T5EncoderModel(cfg).eval()


def tiny_cfgs():
    from cremage_tpu.models.bert import BertConfig
    from cremage_tpu.models.hunyuan import HunyuanConfig
    from cremage_tpu.models.t5 import T5Config

    return dict(
        dit_cfg=HunyuanConfig(hidden_size=32, depth=4, num_heads=4,
                              clip_dim=16, mt5_dim=24, pooled_dim=16,
                              mlp_ratio=2.0, text_len=5, text_len_t5=6,
                              dtype=jnp.float32),
        clip_cfg=BertConfig(vocab_size=len(VOCAB) + 8, hidden_size=16,
                            num_layers=2, num_heads=2,
                            intermediate_size=32, max_positions=64),
        mt5_cfg=T5Config(vocab_size=64, d_model=24, d_kv=4, num_heads=2,
                         d_ff=32, num_layers=2),
    )


def write_components(tmp_path):
    paths = {}
    p = str(tmp_path / "transformer.safetensors")
    CK.save_safetensors(p, {k: np.asarray(v) for k, v in
                            synth_diffusers_hunyuan().items()})
    paths["dit"] = p

    bert = tiny_bert_model()
    p = str(tmp_path / "clip.safetensors")
    CK.save_safetensors(p, {k: v.detach().numpy()
                            for k, v in bert.state_dict().items()})
    paths["clip"] = p

    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(VOCAB) + "\n")
    paths["vocab"] = str(vp)

    mt5 = tiny_mt5_model()
    p = str(tmp_path / "mt5.safetensors")
    CK.save_safetensors(p, {k: v.detach().numpy()
                            for k, v in mt5.state_dict().items()})
    paths["mt5"] = p
    return paths, bert, mt5


def fake_mt5_tokenize(prompt):
    rng = np.random.RandomState(abs(hash(prompt)) % (2 ** 31))
    return rng.randint(1, 60, size=(4,))


def test_load_hunyuan_bundle_end_to_end(tmp_path):
    from cremage_tpu.pipelines.hunyuan import HunyuanPipeline
    from cremage_tpu.pipelines.loader import load_hunyuan_bundle

    paths, _, _ = write_components(tmp_path)
    bundle = load_hunyuan_bundle(
        paths["dit"], clip_ckpt=paths["clip"], clip_vocab=paths["vocab"],
        mt5_ckpt=paths["mt5"], mt5_tokenize=fake_mt5_tokenize,
        policy=F32, **tiny_cfgs())

    tokens, mt5 = bundle.text_encode("a photo of a cat")
    assert tokens.shape == (5, 16) and np.isfinite(tokens).all()
    assert mt5.shape == (6, 24) and np.isfinite(mt5).all()
    assert np.abs(mt5).sum() > 0       # mT5 branch actually ran

    pipe = HunyuanPipeline(bundle)
    opts = GenerationOptions(prompt="a cat", negative_prompt="bad",
                             H=32, W=32, sampling_steps=2, n_samples=1,
                             seed=11, scale=4.0, sampler="Euler A",
                             safety_check=False, watermark=False)
    img, meta = pipe.generate(opts)[0]
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert meta["seed"] == 11


def test_load_hunyuan_bundle_quantize_dit_int8(tmp_path):
    """quantize_dit: the DiT tree comes back with int8 kernels (+ conv
    patch embed) and the pipeline still renders finite images — the
    uniform 8-bit option added across the SD3/PixArt/Hunyuan loaders
    (same _quantize_tree seam; reference quantizes FLUX this way via
    quanto, flux/txt2img.py:125-135)."""
    from cremage_tpu.pipelines.hunyuan import HunyuanPipeline
    from cremage_tpu.pipelines.loader import load_hunyuan_bundle

    paths, _, _ = write_components(tmp_path)
    bundle = load_hunyuan_bundle(
        paths["dit"], clip_ckpt=paths["clip"], clip_vocab=paths["vocab"],
        mt5_ckpt=paths["mt5"], mt5_tokenize=fake_mt5_tokenize,
        policy=F32, quantize_dit="int8", quantize_min_size=64,
        **tiny_cfgs())
    leaves = jax.tree.leaves(bundle.dit_params)
    n_int8 = sum(1 for leaf in leaves if leaf.dtype == jnp.int8)
    n_conv8 = sum(1 for leaf in leaves
                  if leaf.dtype == jnp.int8 and leaf.ndim == 4)
    # regression: a bare "embed" exclude token used to skip every
    # *_embedder kernel including the x_embedder_proj patch-embed conv
    assert n_int8 > 0 and n_conv8 > 0, (n_int8, n_conv8)

    pipe = HunyuanPipeline(bundle)
    opts = GenerationOptions(prompt="a cat", negative_prompt="bad",
                             H=32, W=32, sampling_steps=2, n_samples=1,
                             seed=3, scale=4.0, sampler="Euler A",
                             safety_check=False, watermark=False)
    img, meta = pipe.generate(opts)[0]
    assert img.shape == (32, 32, 3) and np.isfinite(img).all()


def test_bert_branch_matches_transformers(tmp_path):
    """The BertModel tower loaded from an HF-layout file reproduces
    transformers' last_hidden_state on the same ids+mask."""
    import torch

    from cremage_tpu.pipelines.loader import load_hunyuan_bundle
    from cremage_tpu.prompt.wordpiece import WordPieceTokenizer

    paths, bert, _ = write_components(tmp_path)
    bundle = load_hunyuan_bundle(
        paths["dit"], clip_ckpt=paths["clip"], clip_vocab=paths["vocab"],
        policy=F32, **tiny_cfgs())
    tokens, mt5 = bundle.text_encode("a photo of a cat")
    assert np.abs(mt5).sum() == 0      # no mT5 branch configured

    wp = WordPieceTokenizer(paths["vocab"])
    ids, mask = wp.encode("a photo of a cat", max_length=5)
    with torch.no_grad():
        ref = bert(input_ids=torch.tensor([ids.tolist()]),
                   attention_mask=torch.tensor([mask.tolist()]))
    np.testing.assert_allclose(tokens, ref.last_hidden_state[0].numpy(),
                               atol=2e-5, rtol=2e-5)
