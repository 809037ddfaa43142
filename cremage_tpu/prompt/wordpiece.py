"""From-scratch BERT WordPiece tokenizer.

The reference consumes BERT tokenization through transformers (the
text-prompt safety checker `modules/text_prompt_safety_checker/
infer_v2.py` and Hunyuan-DiT's Chinese-CLIP text branch
`modules/hunyuan_dit/txt2img.py`); this owns it natively from a plain
`vocab.txt`.

Semantics match transformers' BertTokenizer: BasicTokenizer (unicode
NFC-agnostic cleanup, optional lowercasing + accent stripping, CJK
char isolation, punctuation splitting) followed by greedy
longest-match-first WordPiece with `##` continuation prefixes.
"""
from __future__ import annotations

import unicodedata
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _is_punct(ch: str) -> bool:
    o = ord(ch)
    if (33 <= o <= 47) or (58 <= o <= 64) or (91 <= o <= 96) or \
            (123 <= o <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(o: int) -> bool:
    return (0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF or
            0x20000 <= o <= 0x2A6DF or 0x2A700 <= o <= 0x2B73F or
            0x2B740 <= o <= 0x2B81F or 0x2B820 <= o <= 0x2CEAF or
            0xF900 <= o <= 0xFAFF or 0x2F800 <= o <= 0x2FA1F)


class WordPieceTokenizer:
    def __init__(self, vocab, lowercase: bool = True,
                 unk_token: str = "[UNK]", max_word_chars: int = 100):
        """vocab: path to vocab.txt (one token per line) or a dict/list."""
        if isinstance(vocab, str):
            with open(vocab, encoding="utf-8") as f:
                tokens = [line.rstrip("\n") for line in f]
            self.vocab: Dict[str, int] = {t: i for i, t in enumerate(tokens)}
        elif isinstance(vocab, dict):
            self.vocab = dict(vocab)
        else:
            self.vocab = {t: i for i, t in enumerate(vocab)}
        self.lowercase = lowercase
        self.unk_token = unk_token
        self.max_word_chars = max_word_chars
        self.cls_id = self.vocab.get("[CLS]", 0)
        self.sep_id = self.vocab.get("[SEP]", 0)
        self.pad_id = self.vocab.get("[PAD]", 0)
        self.unk_id = self.vocab.get(unk_token, 0)

    # -- basic tokenizer ---------------------------------------------

    def _clean(self, text: str) -> str:
        out = []
        for ch in text:
            o = ord(ch)
            if o == 0 or o == 0xFFFD or (unicodedata.category(ch) == "Cc"
                                         and ch not in "\t\n\r"):
                continue
            if ch in "\t\n\r" or unicodedata.category(ch) == "Zs":
                out.append(" ")
            elif _is_cjk(o):
                out.append(f" {ch} ")
            else:
                out.append(ch)
        return "".join(out)

    def basic_tokenize(self, text: str) -> List[str]:
        text = self._clean(text)
        words = text.split()
        out: List[str] = []
        for w in words:
            if self.lowercase:
                w = w.lower()
                w = "".join(c for c in unicodedata.normalize("NFD", w)
                            if unicodedata.category(c) != "Mn")
            cur = ""
            for ch in w:
                if _is_punct(ch):
                    if cur:
                        out.append(cur)
                        cur = ""
                    out.append(ch)
                else:
                    cur += ch
            if cur:
                out.append(cur)
        return out

    # -- wordpiece ----------------------------------------------------

    def wordpiece(self, word: str) -> List[str]:
        if len(word) > self.max_word_chars:
            return [self.unk_token]
        pieces: List[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk_token]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for w in self.basic_tokenize(text):
            out.extend(self.wordpiece(w))
        return out

    def encode(self, text: str, max_length: Optional[int] = None,
               padding: bool = True) -> Tuple[np.ndarray, np.ndarray]:
        """[CLS] tokens [SEP] (+ pad) -> (ids, attention_mask)."""
        ids = [self.cls_id] + [self.vocab.get(t, self.unk_id)
                               for t in self.tokenize(text)] + [self.sep_id]
        if max_length is not None:
            if len(ids) > max_length:
                ids = ids[: max_length - 1] + [self.sep_id]
            mask = [1] * len(ids)
            if padding and len(ids) < max_length:
                pad = max_length - len(ids)
                ids += [self.pad_id] * pad
                mask += [0] * pad
        else:
            mask = [1] * len(ids)
        return np.asarray(ids, np.int32), np.asarray(mask, np.int32)
