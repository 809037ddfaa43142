"""BERT text-prompt safety classifier (Flax).

Behavior contract: reference `modules/text_prompt_safety_checker/`
(infer_v2.py: google-bert/bert-base-uncased + a binary head, weights
auto-downloaded from the HowToSD/text_prompt_safety_checker HF repo,
block at p>0.8 in generate_handler.py:77-83).

`load_bert_predictor` builds a predictor callable for
services.safety.TextSafetyChecker from a local model directory (the
reference downloads the same files at runtime; this environment has no
egress, so the predictor is weight-gated)."""
from __future__ import annotations

import logging
import os
from typing import Callable

logger = logging.getLogger(__name__)


def load_bert_predictor(model_dir: str) -> Callable[[str], float]:
    """model_dir must contain a transformers BERT (config + weights +
    tokenizer) and a binary classification head."""
    if not os.path.isdir(model_dir):
        raise FileNotFoundError(
            f"text-safety model dir {model_dir!r} missing (the reference "
            f"downloads HowToSD/text_prompt_safety_checker at runtime)")
    import jax.numpy as jnp
    from transformers import AutoTokenizer, FlaxBertForSequenceClassification

    tok = AutoTokenizer.from_pretrained(model_dir)
    model = FlaxBertForSequenceClassification.from_pretrained(model_dir)

    def predict(text: str) -> float:
        inputs = tok(text, return_tensors="np", truncation=True,
                     max_length=512)
        logits = model(**inputs).logits
        probs = jnp.exp(logits) / jnp.exp(logits).sum(-1, keepdims=True)
        return float(probs[0, -1])

    return predict
