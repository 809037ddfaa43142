"""Prompt history persistence.

Behavior contract (reference `modules/cremage/utils/prompt_history.py`):
positive and negative prompts are appended to per-kind history files,
most-recent-last, deduplicated (re-submitting an existing prompt moves it
to the end), with a size cap."""
from __future__ import annotations

import json
import os
from typing import List

MAX_HISTORY = 1000


class PromptHistory:
    def __init__(self, path: str, max_entries: int = MAX_HISTORY):
        self.path = path
        self.max_entries = max_entries
        self._entries: List[str] = []
        if os.path.exists(path):
            try:
                with open(path, "r") as f:
                    data = json.load(f)
                if isinstance(data, list):
                    self._entries = [str(e) for e in data]
            except (json.JSONDecodeError, OSError):
                self._entries = []

    def add(self, prompt: str) -> None:
        prompt = prompt.strip()
        if not prompt:
            return
        if prompt in self._entries:
            self._entries.remove(prompt)
        self._entries.append(prompt)
        if len(self._entries) > self.max_entries:
            self._entries = self._entries[-self.max_entries:]
        self._save()

    def entries(self) -> List[str]:
        return list(self._entries)

    def _save(self) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(self._entries, f, indent=0)


def expand_prompt(
    prompt: str,
    pre_expansion: str = "",
    enable_pre: bool = False,
    expansion: str = "",
    enable_post: bool = False,
) -> str:
    """Pre/post prompt expansion (reference generate_handler.py:61-75:
    pre-expansion is prepended, expansion appended)."""
    out = prompt
    if enable_pre and pre_expansion:
        out = pre_expansion + out
    if enable_post and expansion:
        out = out + expansion
    return out
