"""LLM interactor (image chat / captioning).

Behavior contract: reference `tools/llm_interactor.py` — a
llava-v1.6-mistral-7b chat used to caption or discuss generated images
(runtime HF download in the reference too). This module ports the whole
conversation engine — Mistral `[INST] … [/INST]` prompt assembly, the
NUM_PREV history window, the MAX_PROMPT_LENGTH oldest-first drop loop,
and the reversed-regex `extract_response` parser — with the heavy model
behind `TransformersVLMBackend` (LLaVA-Next via transformers, torch CPU
here / any accelerator in production). The model/processor pair is
injectable, so the engine is fully tested with fakes and the real
weights remain a runtime download exactly like the reference.
"""
from __future__ import annotations

import logging
import re
from typing import Callable, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# reference tools/llm_interactor.py:26-29
LLM_MODEL_ID = "llava-hf/llava-v1.6-mistral-7b-hf"
MAX_PROMPT_LENGTH = 4096
NUM_PREV = 20


class LLMUnavailable(RuntimeError):
    pass


def extract_response(content: str) -> str:
    """Last assistant turn: text after the FINAL [/INST] tag (reference
    extract_response — reversed non-greedy search)."""
    reversed_content = content[::-1]
    match = re.search(r"(.*?)\]TSNI\/\[", reversed_content, re.DOTALL)
    if match:
        return match.group(1)[::-1].strip()
    return ""


def build_prompt(history: List[str], user_prompt: str,
                 with_image: bool) -> Tuple[str, List[str]]:
    """Assemble the full conversation prompt (reference on_send_clicked):
    [INST]-wrap the new turn (with <image> tag when an image rides
    along), join with the last NUM_PREV raw turns, and drop oldest turns
    until the prompt fits MAX_PROMPT_LENGTH. Returns (prompt, trimmed
    history actually used)."""
    if with_image:
        turn = f"[INST] <image>\n{user_prompt}  [/INST]"
    else:
        turn = f"[INST] {user_prompt}  [/INST]"
    hist = list(history[-NUM_PREV:])
    hist.append(turn)
    prompt = "\n\n".join(hist)
    while len(prompt) > MAX_PROMPT_LENGTH and hist:
        dropped = hist.pop(0)
        logger.info("LLM prompt too long; dropping oldest turn (%d chars)",
                    len(dropped))
        prompt = "\n\n".join(hist)
    if not hist:  # single over-long turn: truncate it
        body = user_prompt[:MAX_PROMPT_LENGTH]
        prompt = (f"[INST] <image>\n{body}  [/INST]" if with_image
                  else f"[INST] {body}  [/INST]")
        hist = [prompt]
    return prompt, hist


class TransformersVLMBackend:
    """LLaVA-Next backend (reference generate_caption). Pass a
    (model, processor) pair directly, or use from_pretrained for the
    real runtime-download path."""

    def __init__(self, model, processor, max_new_tokens: int = 4096):
        self.model = model
        self.processor = processor
        self.max_new_tokens = max_new_tokens

    @classmethod
    def from_pretrained(cls, model_id: str = LLM_MODEL_ID,
                        **kwargs) -> "TransformersVLMBackend":
        from cremage_tpu.io.downloader import internet_enabled

        try:
            from transformers import (
                LlavaNextForConditionalGeneration, LlavaNextProcessor,
            )

            local_only = not internet_enabled()
            model = LlavaNextForConditionalGeneration.from_pretrained(
                model_id, local_files_only=local_only, **kwargs)
            processor = LlavaNextProcessor.from_pretrained(
                model_id, local_files_only=local_only)
        except Exception as e:
            raise LLMUnavailable(
                f"could not load {model_id!r}: {e} (the reference downloads "
                f"this at runtime; enable_hf_internet_connection gates it)"
            ) from e
        return cls(model, processor)

    def __call__(self, prompt: str, image01: Optional[np.ndarray]) -> str:
        if image01 is not None:
            from PIL import Image

            pil = Image.fromarray(
                (np.clip(image01, 0, 1) * 255).astype(np.uint8))
            inputs = self.processor(text=prompt, images=[pil],
                                    return_tensors="pt")
        else:
            inputs = self.processor(text=prompt, return_tensors="pt")
        ids = self.model.generate(**inputs,
                                  max_new_tokens=self.max_new_tokens)
        return self.processor.batch_decode(
            ids, skip_special_tokens=True,
            clean_up_tokenization_spaces=False)[0]


class LLMInteractor:
    """Conversation engine over a backend(prompt, image01|None) -> raw
    model text. History entries are the reference's raw
    '[INST] q [/INST] answer' strings."""

    def __init__(self, backend: Optional[Callable] = None):
        self.backend = backend
        self.raw_history: List[str] = []
        self.content: List[dict] = []     # render-ready transcript

    def chat(self, message: str, image01: Optional[np.ndarray] = None) -> str:
        if self.backend is None:
            try:
                self.backend = TransformersVLMBackend.from_pretrained()
            except LLMUnavailable:
                raise
        prompt, used = build_prompt(self.raw_history, message,
                                    image01 is not None)
        raw = self.backend(prompt, image01)
        reply = extract_response(raw) or raw.strip()
        self.raw_history = used[:-1] + [
            f"[INST] {message} [/INST] " + reply]
        self.raw_history = self.raw_history[-NUM_PREV:]
        self.content.append({"speaker": "user", "text": message,
                             **({"image": True} if image01 is not None
                                else {})})
        self.content.append({"speaker": "agent", "text": reply})
        return reply

    def caption(self, image01: np.ndarray) -> str:
        return self.chat("Describe this image for use as a prompt.", image01)

    def reset(self):
        self.raw_history.clear()
        self.content.clear()
