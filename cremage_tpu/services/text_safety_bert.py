"""BERT text-prompt safety classifier (native Flax).

Behavior contract: reference `modules/text_prompt_safety_checker/`
(infer_v2.py: google-bert/bert-base-uncased + a binary head, weights
auto-downloaded from the HowToSD/text_prompt_safety_checker HF repo,
block at p>0.8 in generate_handler.py:77-83).

`load_bert_predictor` builds the predictor callable for
services.safety.TextSafetyChecker from a local model directory
containing the usual HF export (vocab.txt + model.safetensors /
pytorch_model.bin) — loaded through our own BertClassifier and
WordPiece tokenizer, no transformers dependency."""
from __future__ import annotations

import logging
import os
from typing import Callable

import numpy as np

logger = logging.getLogger(__name__)


def _find(model_dir: str, names) -> str:
    for n in names:
        p = os.path.join(model_dir, n)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"none of {names} in {model_dir!r}")


def load_bert_predictor(model_dir: str,
                        max_length: int = 512) -> Callable[[str], float]:
    """model_dir must contain vocab.txt and the BERT classifier weights
    (model.safetensors or pytorch_model.bin, HF BertForSequence-
    Classification layout)."""
    if not os.path.isdir(model_dir):
        raise FileNotFoundError(
            f"text-safety model dir {model_dir!r} missing (the reference "
            f"downloads HowToSD/text_prompt_safety_checker at runtime)")
    import jax
    import jax.numpy as jnp

    from cremage_tpu.io import checkpoint as CK
    from cremage_tpu.models.bert import BertClassifier, bert_base_config
    from cremage_tpu.prompt.wordpiece import WordPieceTokenizer

    tok = WordPieceTokenizer(_find(model_dir, ["vocab.txt"]))
    sd = CK.load_state_dict(_find(
        model_dir, ["model.safetensors", "pytorch_model.bin", "model.pt",
                    "model.ckpt"]))
    # model geometry: config.json when present, else inferred from shapes
    kw = {}
    cfg_path = os.path.join(model_dir, "config.json")
    if os.path.exists(cfg_path):
        import json

        with open(cfg_path) as f:
            hf = json.load(f)
        kw = dict(
            vocab_size=hf.get("vocab_size", len(tok.vocab)),
            hidden_size=hf.get("hidden_size", 768),
            num_layers=hf.get("num_hidden_layers", 12),
            num_heads=hf.get("num_attention_heads", 12),
            intermediate_size=hf.get("intermediate_size", 3072),
            max_positions=hf.get("max_position_embeddings", 512),
            type_vocab_size=hf.get("type_vocab_size", 2),
        )
    else:
        emb = np.asarray(sd["bert.embeddings.word_embeddings.weight"])
        inter = np.asarray(sd["bert.encoder.layer.0.intermediate.dense.weight"])
        layers = 1 + max(int(k.split(".")[3]) for k in sd
                         if k.startswith("bert.encoder.layer."))
        kw = dict(vocab_size=emb.shape[0], hidden_size=emb.shape[1],
                  num_layers=layers, num_heads=max(1, emb.shape[1] // 64),
                  intermediate_size=inter.shape[0])
    cfg = bert_base_config(**kw)
    max_length = min(max_length, cfg.max_positions)
    model = BertClassifier(cfg)
    tmpl = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 8), jnp.int32)
    )["params"]
    params, missing, _ = CK.build_flax_params(tmpl, sd, prefix="",
                                              strict=False)
    if missing:
        raise KeyError(f"text-safety ckpt missing {missing[:5]} ...")
    apply = jax.jit(lambda p, ids, mask: model.apply({"params": p}, ids, mask))

    def predict(text: str) -> float:
        ids, _ = tok.encode(text, max_length=None)
        # pad to a 64-token bucket: bounds jit recompiles per prompt length
        n = min(len(ids), max_length)
        bucket = min(-(-n // 64) * 64, max_length)
        ids, mask = tok.encode(text, max_length=bucket)
        logits = np.asarray(
            apply(params, jnp.asarray(ids[None]), jnp.asarray(mask[None])),
            np.float32)[0]
        e = np.exp(logits - logits.max())
        return float((e / e.sum())[-1])

    return predict
