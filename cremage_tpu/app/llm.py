"""LLM interactor (image chat / captioning).

Behavior contract: reference `tools/llm_interactor.py` — a LLaVA-v1.6-
mistral-7b chat window used to caption or discuss generated images; the
model is a runtime HF download in the reference as well.

Here the capability is an interface with a pluggable backend: wire any
local vision-language model (weights directory) or remote endpoint into
`LLMInteractor(backend=...)`; without one, calls raise a clear gate
error rather than failing deep in a pipeline."""
from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np


class LLMUnavailable(RuntimeError):
    pass


class LLMInteractor:
    """backend(messages, image01|None) -> reply string."""

    def __init__(self, backend: Optional[Callable] = None):
        self.backend = backend
        self.history: List[Tuple[str, str]] = []

    def chat(self, message: str, image01: Optional[np.ndarray] = None) -> str:
        if self.backend is None:
            raise LLMUnavailable(
                "no VLM backend configured (the reference downloads "
                "llava-v1.6-mistral-7b at runtime; plug a backend callable "
                "or an endpoint here)")
        reply = self.backend(self.history + [("user", message)], image01)
        self.history.append(("user", message))
        self.history.append(("assistant", reply))
        return reply

    def caption(self, image01: np.ndarray) -> str:
        return self.chat("Describe this image for use as a prompt.", image01)

    def reset(self):
        self.history.clear()
