"""Text conditioning: weighted prompt -> CLIP hidden states.

Pipeline contract (reference call stack SURVEY.md §3.2):
  prompt -> weight grammar -> 77-token weighted chunks (token embeddings
  scaled pre-transformer) -> text transformer per chunk with clip_skip
  tap -> concat along sequence -> filler-pad c/uc to equal length.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from cremage_tpu.io.ti import load_embedding
from cremage_tpu.models.clip import CLIPTextModel, hidden_state_for_clip_skip
from cremage_tpu.prompt.chunking import (
    generate_weighted_chunks, make_ti_fetch, pad_conditioning_to_match,
)
from cremage_tpu.prompt.parser import compute_prompt_score
from cremage_tpu.prompt.tokenizer import CLIPTokenizer


class TextEncoder:
    """Bundles a CLIP text model + params + tokenizer into the
    prompt -> (L, dim) conditioning function."""

    def __init__(
        self,
        model: CLIPTextModel,
        params,
        tokenizer: CLIPTokenizer,
        embedding_dir: Optional[str] = None,
    ):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.embedding_dir = embedding_dir
        self._filler_cache: Optional[np.ndarray] = None

    def _embed_tokens(self, ids) -> np.ndarray:
        emb = self.model.apply(
            self.params,
            jnp.asarray(np.asarray(ids, np.int32)),
            method=CLIPTextModel.embed_tokens,
        )
        return np.asarray(emb, np.float32)

    def encode(self, prompt: str, clip_skip: int = 1) -> np.ndarray:
        """Weighted prompt -> (n*77, hidden) conditioning."""
        pairs = compute_prompt_score(prompt)
        ti = make_ti_fetch(self.embedding_dir, load_embedding)
        chunks, _ = generate_weighted_chunks(
            self.tokenizer, self._embed_tokens, pairs, ti_fetch=ti
        )
        outs = []
        for chunk in chunks:
            _, hidden, _ = self.model.apply(
                self.params, inputs_embeds=jnp.asarray(chunk[None])
            )
            z = hidden_state_for_clip_skip(hidden, clip_skip)
            outs.append(np.asarray(z[0], np.float32))
        return np.concatenate(outs, axis=0)

    def filler(self, clip_skip: int = 1) -> np.ndarray:
        """Empty-prompt 77-token chunk used for c/uc length matching."""
        if self._filler_cache is None:
            self._filler_cache = self.encode("", clip_skip)
        return self._filler_cache

    def encode_pair(
        self, prompt: str, negative_prompt: str, clip_skip: int = 1
    ) -> Tuple[np.ndarray, np.ndarray]:
        c = self.encode(prompt, clip_skip)
        uc = self.encode(negative_prompt, clip_skip)
        c, uc = pad_conditioning_to_match(c, uc, self.filler(clip_skip))
        return c, uc


def tile_batch(x: np.ndarray, batch: int) -> jnp.ndarray:
    """(L, D) conditioning -> (B, L, D)."""
    return jnp.asarray(np.broadcast_to(x[None], (batch,) + x.shape))
