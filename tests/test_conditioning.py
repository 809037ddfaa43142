"""TextEncoder conditioning: chunking x clip_skip x filler-pad."""
import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from cremage_tpu.pipelines.conditioning import TextEncoder, tile_batch
from cremage_tpu.prompt.tokenizer import default_tokenizer

HID = 32


def make_text_encoder():
    cfg = CLIPTextConfig(hidden_size=HID, num_layers=3, num_heads=4,
                         intermediate_size=64, dtype=jnp.float32)
    model = CLIPTextModel(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 77), jnp.int32))
    return TextEncoder(model, params, default_tokenizer())


def test_encode_single_chunk():
    te = make_text_encoder()
    c = te.encode("a cat", clip_skip=1)
    assert c.shape == (77, HID)


def test_encode_long_prompt_multiple_chunks():
    te = make_text_encoder()
    long_prompt = " ".join(["cat"] * 100)
    c = te.encode(long_prompt)
    assert c.shape == (154, HID)  # two 77-token windows


def test_clip_skip_changes_output():
    te = make_text_encoder()
    c1 = te.encode("a cat", clip_skip=1)
    c2 = te.encode("a cat", clip_skip=2)
    assert not np.allclose(c1, c2)


def test_encode_pair_filler_pads_uc():
    te = make_text_encoder()
    c, uc = te.encode_pair(" ".join(["cat"] * 100), "bad", clip_skip=1)
    assert c.shape == uc.shape == (154, HID)
    # the uc filler region equals the empty-prompt chunk
    filler = te.filler(1)
    np.testing.assert_allclose(uc[77:], filler, atol=1e-6)


def test_weighted_words_change_conditioning():
    te = make_text_encoder()
    plain = te.encode("a cat")
    emph = te.encode("a (cat:1.5)")
    assert not np.allclose(plain, emph)


def test_tile_batch():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = tile_batch(x, 5)
    assert out.shape == (5, 3, 4)
    np.testing.assert_allclose(np.asarray(out[4]), x)


def test_text_encoder_memoizes_resolved_prompts():
    """Serving repeats prompts across seeds: the second encode of the
    same (prompt, clip_skip) is a cache hit (identical array returned
    without tower work); TI-tagged prompts are never cached (the
    embedding file can change on disk)."""
    from tests.test_pipeline_sd15 import make_bundle

    text = make_bundle().text
    a = text.encode("a cat", 1)
    calls = {"n": 0}
    orig = text._embed_tokens

    def counting(ids):
        calls["n"] += 1
        return orig(ids)

    text._embed_tokens = counting
    b = text.encode("a cat", 1)
    assert b is a and calls["n"] == 0          # pure cache hit
    c = text.encode("a cat", 2)
    assert c is not a                          # clip_skip keys the cache
    np.testing.assert_array_equal(text.encode("a cat", 1), a)
    # TI-tagged prompt bypasses the cache entirely
    n0 = calls["n"]
    text.encode("<embedding:missing.pt> cat", 1)
    text.encode("<embedding:missing.pt> cat", 1)
    assert calls["n"] > n0
