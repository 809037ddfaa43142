"""BERT tower + WordPiece tokenizer tests.

Oracles: transformers torch BertModel (random weights) for the encoder;
the Rust `tokenizers` BertWordPiece implementation for tokenization.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.models.bert import (
    BertClassifier, BertConfig, BertModel,
)
from cremage_tpu.prompt.wordpiece import WordPieceTokenizer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "quick", "brown", "fox", "jump", "##s", "##ing", "##ed",
         "over", "lazy", "dog", "photo", "##realistic", "a", ",", ".",
         "!", "un", "##believ", "##able", "中", "国", "水", "墨", "画"]


def tiny_cfg(**kw):
    return BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                      num_heads=4, intermediate_size=48, max_positions=32,
                      **kw)


@pytest.mark.slow
def test_bert_parity_with_transformers():
    import torch
    from transformers import BertConfig as HFConfig
    from transformers import BertModel as HFModel

    hf_cfg = HFConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=32, type_vocab_size=2,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    ours = BertModel(tiny_cfg())
    ids = np.array([[2, 5, 6, 8, 3, 0, 0, 0]], np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0, 0]], np.int64)
    tmpl = jax.eval_shape(
        ours.init, jax.random.key(0), jnp.zeros((1, 8), jnp.int32)
    )["params"]
    params, missing, unused = CK.build_flax_params(tmpl, sd, prefix="")
    assert not missing, missing
    assert not unused, unused

    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask))
    last, pooled = ours.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                              jnp.asarray(mask, jnp.int32))
    np.testing.assert_allclose(np.asarray(last),
                               hf_out.last_hidden_state.numpy(),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(pooled),
                               hf_out.pooler_output.numpy(),
                               atol=3e-5, rtol=3e-5)


def test_bert_classifier_parity():
    import torch
    from transformers import BertConfig as HFConfig
    from transformers import BertForSequenceClassification as HFCls

    hf_cfg = HFConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=32, num_labels=2,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        classifier_dropout=0.0,
    )
    torch.manual_seed(1)
    hf = HFCls(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    ours = BertClassifier(tiny_cfg())
    tmpl = jax.eval_shape(
        ours.init, jax.random.key(0), jnp.zeros((1, 8), jnp.int32)
    )["params"]
    params, missing, _ = CK.build_flax_params(tmpl, sd, prefix="")
    assert not missing, missing

    ids = np.array([[2, 9, 14, 3, 0, 0, 0, 0]], np.int64)
    mask = np.array([[1, 1, 1, 1, 0, 0, 0, 0]], np.int64)
    with torch.no_grad():
        hf_logits = hf(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask)).logits.numpy()
    logits = ours.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                        jnp.asarray(mask, jnp.int32))
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               atol=3e-5, rtol=3e-5)


def test_wordpiece_against_rust_tokenizers(tmp_path):
    tokenizers = pytest.importorskip("tokenizers")
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    oracle = tokenizers.BertWordPieceTokenizer(str(vocab_file),
                                               lowercase=True)
    ours = WordPieceTokenizer(str(vocab_file), lowercase=True)
    cases = [
        "The quick brown fox jumps over the lazy dog!",
        "photorealistic, unbelievable.",
        "Fox JUMPED... over  the\tdog",
        "中国水墨画 the fox",          # CJK isolation
        "quörk the dog",              # accents stripped -> quork -> UNK
        "",
    ]
    for text in cases:
        theirs = oracle.encode(text)
        ids, mask = ours.encode(text)
        assert ids.tolist() == theirs.ids, (text, ids.tolist(), theirs.ids)
        assert mask.tolist() == theirs.attention_mask


def test_wordpiece_padding_truncation(tmp_path):
    ours = WordPieceTokenizer({t: i for i, t in enumerate(VOCAB)})
    ids, mask = ours.encode("the quick fox", max_length=16)
    assert ids.shape == (16,)
    n = int(mask.sum())
    assert ids[0] == ours.cls_id and ids[n - 1] == ours.sep_id
    assert (ids[n:] == ours.pad_id).all()
    ids, mask = ours.encode("the quick brown fox " * 10, max_length=8)
    assert mask.sum() == 8 and ids[7] == ours.sep_id


def test_text_safety_predictor_end_to_end(tmp_path):
    """Tiny HF-layout export dir -> native predictor -> matches torch."""
    import torch
    from safetensors.numpy import save_file
    from transformers import BertConfig as HFConfig
    from transformers import BertForSequenceClassification as HFCls

    from cremage_tpu.services.text_safety_bert import load_bert_predictor

    hf_cfg = HFConfig(
        vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=32, num_labels=2,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        classifier_dropout=0.0,
    )
    torch.manual_seed(3)
    hf = HFCls(hf_cfg).eval()
    save_file({k: v.numpy() for k, v in hf.state_dict().items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    hf_cfg.to_json_file(str(tmp_path / "config.json"))

    predict = load_bert_predictor(str(tmp_path))
    p = predict("the quick brown fox")
    tok = WordPieceTokenizer(str(tmp_path / "vocab.txt"))
    ids, mask = tok.encode("the quick brown fox", max_length=32)
    with torch.no_grad():
        logits = hf(input_ids=torch.tensor(ids[None].astype("int64")),
                    attention_mask=torch.tensor(mask[None].astype("int64"))
                    ).logits[0]
        want = torch.softmax(logits, -1)[-1].item()
    assert abs(p - want) < 1e-4


def test_hunyuan_text_encode_native(tmp_path):
    from tests.test_sentencepiece import WORDS, encode_model, t5_like_pieces

    from cremage_tpu.models.t5 import T5Config, T5Encoder
    from cremage_tpu.pipelines.hunyuan import make_hunyuan_text_encode

    cfg = tiny_cfg()
    bert = BertModel(cfg)
    bparams = bert.init(jax.random.key(0), jnp.zeros((1, 8), jnp.int32))

    spm_blob = encode_model(t5_like_pieces(WORDS))
    n_vocab = len(t5_like_pieces(WORDS)) + 100
    t5 = T5Encoder(T5Config(vocab_size=max(512, n_vocab), d_model=16,
                            d_kv=4, num_heads=4, d_ff=32, num_layers=2,
                            dtype=jnp.float32))
    tparams = t5.init(jax.random.key(1), jnp.zeros((1, 8), jnp.int32))

    enc = make_hunyuan_text_encode(
        (bert, bparams), {t: i for i, t in enumerate(VOCAB)},
        mt5_pair=(t5, tparams), mt5_spiece=spm_blob,
        clip_len=16, mt5_len=24, mt5_dim=16)
    clip_tokens, mt5_out = enc("the quick fox")
    assert clip_tokens.shape == (16, cfg.hidden_size)
    assert mt5_out.shape == (24, 16)
    assert np.isfinite(clip_tokens).all() and np.isfinite(mt5_out).all()
    # no mt5: zeros fallback with declared dim
    enc2 = make_hunyuan_text_encode(
        (bert, bparams), {t: i for i, t in enumerate(VOCAB)},
        clip_len=16, mt5_len=8, mt5_dim=12)
    _, z = enc2("the dog")
    assert z.shape == (8, 12) and (z == 0).all()
