"""Weighted-token chunking into 77-token CLIP windows.

Behavior contract (reference
`modules/cremage/utils/generate_clip_embeddings_from_tokens.py`):

- each (word, score) pair is tokenized separately; its raw token
  embeddings are multiplied by the score (pre-transformer — NOT the
  A1111 post-hoc scaling);
- ``<embedding:name>`` pairs load textual-inversion vectors from
  embedding_dir (SDXL dict embeddings contribute the tower-specific key);
  missing files/dir are silently skipped;
- chunks hold at most 75 content tokens; a word that would overflow
  starts a new chunk; the literal word ``BREAK`` (when it fits) forces a
  new chunk and is dropped;
- each chunk is laid out [BOS, content..., PAD...(to 75), EOS] — PADs sit
  *before* the final EOS (reference layout, :137-193); PAD == EOS token;
- returns the chunk embeddings plus each chunk's "last EOS index"
  1 + content_len (used by OpenCLIP pooling for SDXL).

The embed function is tower-specific: a raw token-embedding lookup
(CLIP-L 768-d or OpenCLIP-bigG 1280-d).
"""
from __future__ import annotations

import logging
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from cremage_tpu.prompt.tokenizer import BOS, EOS, PAD, CLIPTokenizer
from cremage_tpu.prompt.tokens import embedding_name, is_embedding_tag

logger = logging.getLogger(__name__)

BREAK_MARKER = "BREAK"
CHUNK_CONTENT = 75

EmbedFn = Callable[[Sequence[int]], np.ndarray]
TIFetch = Callable[[str], Optional[np.ndarray]]


def make_ti_fetch(
    embedding_dir: Optional[str],
    load_embedding: Callable[[str], Union[np.ndarray, Dict[str, np.ndarray]]],
    tower_key: str = "clip_l",
) -> TIFetch:
    """File-based TI fetch matching the reference's lookup
    (chunking code :94-106: embedding_dir/name, dict -> tower key)."""

    def fetch(name: str) -> Optional[np.ndarray]:
        if embedding_dir is None:
            return None
        path = os.path.join(embedding_dir, name)
        if not os.path.exists(path):
            logger.warning("Ignoring missing %s", path)
            return None
        emb = load_embedding(path)
        if isinstance(emb, dict):
            emb = emb.get(tower_key)
        return None if emb is None else np.asarray(emb, np.float32)

    return fetch


def generate_weighted_chunks(
    tokenizer: CLIPTokenizer,
    embed_fn: EmbedFn,
    word_score_pairs: Sequence[Tuple[str, float]],
    ti_fetch: Optional[TIFetch] = None,
) -> Tuple[List[np.ndarray], List[int]]:
    """-> (list of (77, dim) fp32 chunks, list of last-EOS indices)."""
    rows: List[List[np.ndarray]] = [[]]
    i = 0
    cur_len = 0

    empty = len(word_score_pairs) == 1 and len(word_score_pairs[0][0]) == 0
    if not empty:
        for word, score in word_score_pairs:
            if is_embedding_tag(word):
                if ti_fetch is None:
                    continue
                emb = ti_fetch(embedding_name(word))
                if emb is None:
                    continue
                length = emb.shape[0]
            else:
                ids = tokenizer.encode(word)[: CHUNK_CONTENT]
                length = len(ids)
                emb = None

            new_len = cur_len + length
            if new_len > CHUNK_CONTENT:
                rows.append([])
                i += 1
                cur_len = length
            elif word == BREAK_MARKER:
                rows.append([])
                i += 1
                cur_len = 0
                continue
            else:
                cur_len = new_len

            if emb is None:
                if not ids:
                    continue
                emb = np.asarray(embed_fn(ids), np.float32)
            rows[i].append(emb * float(score))

    bos = np.asarray(embed_fn([BOS]), np.float32).reshape(1, -1)
    eos = np.asarray(embed_fn([EOS]), np.float32).reshape(1, -1)
    pad = np.asarray(embed_fn([PAD]), np.float32).reshape(1, -1)

    chunks: List[np.ndarray] = []
    eos_indices: List[int] = []
    for row in rows:
        seq_len = sum(e.shape[0] for e in row)
        assert seq_len <= CHUNK_CONTENT
        pads = np.repeat(pad, CHUNK_CONTENT - seq_len, axis=0)
        content = [bos] + row + [pads, eos]
        chunk = np.concatenate(content, axis=0)
        assert chunk.shape[0] == CHUNK_CONTENT + 2
        chunks.append(chunk)
        eos_indices.append(1 + seq_len)
    return chunks, eos_indices


def pad_conditioning_to_match(
    c: np.ndarray, uc: np.ndarray, filler: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Filler-pad the shorter of c/uc to the same multiple-of-77 length
    (reference sd/image_generator.py:794-808: the filler is an empty-
    prompt 77-token chunk appended repeatedly)."""
    assert filler.shape[0] == 77
    while c.shape[0] < uc.shape[0]:
        c = np.concatenate([c, filler], axis=0)
    while uc.shape[0] < c.shape[0]:
        uc = np.concatenate([uc, filler], axis=0)
    return c, uc
