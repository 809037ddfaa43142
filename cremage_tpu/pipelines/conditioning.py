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
        # memoized conditioning per (prompt, clip_skip): serving
        # workloads repeat prompts across seeds/batches, and a text
        # encode costs real host time on the tunneled TPU backend.
        # Keyed on the RESOLVED prompt string (wildcards are expanded
        # before encode), bounded FIFO; dies with the bundle, so a
        # checkpoint/LoRA reload can never serve stale states.
        self._encode_cache: dict = {}

    def _embed_tokens(self, ids) -> np.ndarray:
        # cached jitted program — an eager tower forward is seconds of
        # per-op dispatch on the tunneled TPU backend (core/jitcache.py)
        from cremage_tpu.core.jitcache import jit_apply

        emb = jit_apply(self.model, CLIPTextModel.embed_tokens)(
            self.params, jnp.asarray(np.asarray(ids, np.int32)))
        return np.asarray(emb, np.float32)

    def encode(self, prompt: str, clip_skip: int = 1) -> np.ndarray:
        """Weighted prompt -> (n*77, hidden) conditioning."""
        from cremage_tpu.core.jitcache import jit_apply

        # TI-tagged prompts resolve embedding files at encode time —
        # never cache those (the file can change on disk)
        cacheable = "<" not in prompt
        ck = (prompt, clip_skip)
        hit = self._encode_cache.get(ck) if cacheable else None
        if hit is not None:
            return hit

        pairs = compute_prompt_score(prompt)
        ti = make_ti_fetch(self.embedding_dir, load_embedding)
        chunks, _ = generate_weighted_chunks(
            self.tokenizer, self._embed_tokens, pairs, ti_fetch=ti
        )
        fwd = jit_apply(self.model)
        outs = []
        for chunk in chunks:
            _, hidden, _ = fwd(self.params,
                               inputs_embeds=jnp.asarray(chunk[None]))
            z = hidden_state_for_clip_skip(hidden, clip_skip)
            outs.append(np.asarray(z[0], np.float32))
        out = np.concatenate(outs, axis=0)
        if not cacheable:
            return out
        if len(self._encode_cache) >= 32:
            self._encode_cache.pop(next(iter(self._encode_cache)))
        self._encode_cache[ck] = out
        return out

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
