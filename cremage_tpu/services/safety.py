"""Safety filtering interfaces.

Reference behavior (SURVEY.md items 26-27):
- image safety: CompVis StableDiffusionSafetyChecker; flagged outputs are
  replaced with a placeholder image (`sd/image_generator.py:508,539-551`).
- text safety: BERT binary classifier gating generation at p>0.8
  (`modules/text_prompt_safety_checker/`, `generate_handler.py:77-83`).

This module defines the service seams with safe defaults. The CLIP-based
image checker and BERT text checker plug in behind these interfaces when
their weights are available (weights are runtime downloads in the
reference too); without weights the text gate is a conservative
keyword/deny-list and the image checker passes images through unchanged
while reporting has_nsfw=False.
"""
from __future__ import annotations

import logging
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

TEXT_BLOCK_THRESHOLD = 0.8  # reference generate_handler.py:77-83


class ImageSafetyChecker:
    """Pluggable image safety checker.

    `classifier(images_01: (B,H,W,3) float) -> (B,) float scores` may be
    provided (e.g. a CLIP-based NSFW head); flagged images are replaced
    with `replacement` (reference uses resources/rick.jpeg)."""

    def __init__(
        self,
        classifier: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        replacement: Optional[np.ndarray] = None,
        threshold: float = 0.5,
    ):
        self.classifier = classifier
        self.replacement = replacement
        self.threshold = threshold

    def check(self, images: np.ndarray) -> Tuple[np.ndarray, List[bool]]:
        """images: (B,H,W,3) float [0,1]. Returns (images, nsfw_flags)."""
        if self.classifier is None:
            return images, [False] * len(images)
        scores = np.asarray(self.classifier(images))
        flags = [bool(s > self.threshold) for s in scores]
        out = images.copy()
        for i, f in enumerate(flags):
            if f:
                if self.replacement is not None:
                    rep = self.replacement
                    out[i] = np.resize(rep, out[i].shape)
                else:
                    out[i] = 0.0
        return out, flags


class TextSafetyChecker:
    """Pluggable text safety gate.

    With a model: `predict(text) -> p(unsafe)`, block at p>0.8 like the
    reference. Without one, a deny-list fallback."""

    def __init__(
        self,
        predictor: Optional[Callable[[str], float]] = None,
        deny_terms: Sequence[str] = (),
        threshold: float = TEXT_BLOCK_THRESHOLD,
    ):
        self.predictor = predictor
        self.deny_terms = [t.lower() for t in deny_terms]
        self.threshold = threshold

    def predict(self, text: str) -> float:
        if self.predictor is not None:
            return float(self.predictor(text))
        low = text.lower()
        return 1.0 if any(t and t in low for t in self.deny_terms) else 0.0

    def should_block(self, text: str) -> bool:
        return self.predict(text) > self.threshold


def default_image_safety(weights_path: Optional[str] = None,
                         replacement: Optional[np.ndarray] = None,
                         cfg=None) -> ImageSafetyChecker:
    """ImageSafetyChecker wired to the CompVis safety checker when its
    weights are available (SAFETY_CHECKER_PATH or explicit path); a
    pass-through checker otherwise — matching the reference, which
    downloads CompVis/stable-diffusion-safety-checker at runtime."""
    import os

    weights_path = weights_path or os.environ.get("SAFETY_CHECKER_PATH", "")
    classifier = None
    if weights_path and os.path.exists(weights_path):
        from cremage_tpu.models.safety_checker import load_safety_classifier

        classifier = load_safety_classifier(weights_path, cfg)
    if replacement is None:
        # reference load_replacement: black image (+ overlay message)
        replacement = np.zeros((8, 8, 3), np.float32)
    return ImageSafetyChecker(classifier=classifier, replacement=replacement)
