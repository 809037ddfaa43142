"""CLIP BPE tokenizer, implemented from scratch.

The BPE algorithm and the merges file are the public OpenAI CLIP assets
(bpe_simple_vocab_16e6.txt.gz, vendored under prompt/assets/ — a data
asset, not code). Matches HF CLIPTokenizer ids for SD prompts:
byte-level BPE with </w> end-of-word markers, lowercased, whitespace
collapsed, vocab 49408 with <|startoftext|>=49406 and <|endoftext|>=49407.

Replaces the reference's `transformers.CLIPTokenizer` dependency
(`modules/cremage/utils/generate_clip_embeddings_from_tokens.py:36-59
convert_word_to_tokens`) so tokenization works with zero network access.
"""
from __future__ import annotations

import functools
import gzip
import html
import os
import unicodedata
from typing import List

import regex as re

BOS = 49406
EOS = 49407
PAD = 49407
MAX_LEN = 77

_DEFAULT_BPE = os.path.join(
    os.path.dirname(__file__), "assets", "bpe_simple_vocab_16e6.txt.gz"
)


@functools.lru_cache()
def bytes_to_unicode():
    """GPT-2 byte <-> printable-unicode bijection (public algorithm)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return unicodedata.normalize("NFC", text.strip())


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class CLIPTokenizer:
    def __init__(self, bpe_path: str = _DEFAULT_BPE):
        self.byte_encoder = bytes_to_unicode()
        merges = gzip.open(bpe_path, "rt", encoding="utf-8").read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.decoder = {i: v for v, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self._cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
            r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )

    def bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        """Text -> BPE ids, no BOS/EOS."""
        ids: List[int] = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        # decode bytes first, then turn </w> markers into spaces
        parts = text.split("</w>")
        decoded = [
            bytearray(byte_decoder[c] for c in p if c in byte_decoder).decode(
                "utf-8", errors="replace"
            )
            for p in parts
        ]
        return " ".join(decoded).strip()

    def encode_with_specials(self, text: str, max_len: int = MAX_LEN) -> List[int]:
        """BOS + ids(truncated) + EOS, padded with EOS to max_len —
        standard SD conditioning layout."""
        ids = self.encode(text)[: max_len - 2]
        seq = [BOS] + ids + [EOS]
        seq = seq + [PAD] * (max_len - len(seq))
        return seq


@functools.lru_cache()
def default_tokenizer() -> CLIPTokenizer:
    return CLIPTokenizer()
