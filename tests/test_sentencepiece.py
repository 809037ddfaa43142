"""SentencePiece tokenizer tests.

Oracles:
- a protobuf encoder written HERE (independent of the parser under
  test) builds synthetic spiece.model blobs;
- the `tokenizers` Rust Unigram implementation segments the same
  normalized strings — differential check of the Viterbi DP.
"""
import random
import struct

import numpy as np
import pytest

from cremage_tpu.prompt.sentencepiece import (
    BYTE, CONTROL, NORMAL, UNKNOWN, USER_DEFINED, WS,
    ModelProto, Piece, SentencePieceProcessor, T5Tokenizer,
    parse_model_proto,
)


# ---------------------------------------------------------------------------
# protobuf encoder (test-side, independent of the parser)
# ---------------------------------------------------------------------------

def _varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2, _varint(len(payload)) + payload)


def encode_model(pieces, model_type=1, unk_id=2, bos_id=-1, eos_id=1,
                 pad_id=0, add_dummy_prefix=True,
                 remove_extra_whitespaces=True, escape_whitespaces=True,
                 charsmap=b"") -> bytes:
    blob = b""
    for piece, score, typ in pieces:
        msg = _len_field(1, piece.encode("utf-8"))
        msg += _field(2, 5, struct.pack("<f", score))
        msg += _field(3, 0, _varint(typ))
        blob += _len_field(1, msg)
    trainer = (_field(3, 0, _varint(model_type)) +
               _field(40, 0, _varint(unk_id)) +
               _field(41, 0, _varint(bos_id)) +
               _field(42, 0, _varint(eos_id)) +
               _field(43, 0, _varint(pad_id)))
    blob += _len_field(2, trainer)
    norm = (_field(3, 0, _varint(int(add_dummy_prefix))) +
            _field(4, 0, _varint(int(remove_extra_whitespaces))) +
            _field(5, 0, _varint(int(escape_whitespaces))))
    if charsmap:
        norm += _len_field(2, charsmap)
    blob += _len_field(3, norm)
    return blob


def t5_like_pieces(words, seed=0):
    """A tiny T5-flavored vocab: specials + whole words + word pieces +
    every single character, with pseudo-random scores."""
    rng = random.Random(seed)
    pieces = [("<pad>", 0.0, CONTROL), ("</s>", 0.0, CONTROL),
              ("<unk>", 0.0, UNKNOWN)]
    seen = {p for p, _, _ in pieces}
    cand = []
    for w in words:
        cand.append(WS + w)
        cand.append(w)
        for i in range(1, len(w)):
            cand.append(w[:i])
            cand.append(w[i:])
        cand.extend(w)
    cand.append(WS)
    for c in cand:
        if c not in seen:
            seen.add(c)
            pieces.append((c, round(rng.uniform(-12.0, -1.0), 3), NORMAL))
    return pieces


WORDS = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
         "photo", "realistic", "portrait", "lighting", "masterpiece"]


@pytest.fixture(scope="module")
def proc():
    return SentencePieceProcessor(
        parse_model_proto(encode_model(t5_like_pieces(WORDS))))


def test_proto_roundtrip():
    mp = parse_model_proto(encode_model(
        t5_like_pieces(WORDS), model_type=2, unk_id=5, pad_id=-1,
        add_dummy_prefix=False))
    assert mp.model_type == 2
    assert mp.unk_id == 5
    assert mp.pad_id == -1
    assert mp.eos_id == 1
    assert mp.add_dummy_prefix is False
    assert mp.pieces[0].piece == "<pad>"
    assert mp.pieces[2].type == UNKNOWN
    assert mp.pieces[3].piece == WS + "the"
    # scores survive the float32 round-trip
    assert abs(mp.pieces[3].score - t5_like_pieces(WORDS)[3][1]) < 1e-6


def test_normalization(proc):
    assert proc.normalize("the quick") == WS + "the" + WS + "quick"
    # extra whitespace collapsed, tabs/newlines treated as spaces
    assert proc.normalize("  the \t\n quick  ") == WS + "the" + WS + "quick"
    # NFKC: full-width latin folds
    assert proc.normalize("ａ") == WS + "a"
    assert proc.normalize("") == ""


def test_viterbi_against_rust_tokenizers(proc):
    tokenizers = pytest.importorskip("tokenizers")
    vocab = [(p.piece, p.score) for p in proc.model.pieces]
    oracle = tokenizers.Tokenizer(
        tokenizers.models.Unigram(vocab, unk_id=2, byte_fallback=False))
    rng = random.Random(7)
    for _ in range(40):
        sent = " ".join(rng.choices(WORDS, k=rng.randint(1, 8)))
        norm = proc.normalize(sent)
        ours = proc.encode_pieces(sent)
        theirs = [t for t in oracle.encode(norm).tokens]
        assert ours == theirs, (sent, ours, theirs)


def test_unknown_chars_fused(proc):
    # "éé" has no vocab entry: fused into a single unk surface, one unk id
    pieces = proc.encode_pieces("the éé dog")
    assert "éé" in pieces
    ids = proc.encode("the éé dog")
    assert ids.count(2) == 1  # unk_id


def test_byte_fallback():
    pieces = t5_like_pieces(["hi"]) + [
        (f"<0x{b:02X}>", -20.0, BYTE) for b in range(256)]
    proc = SentencePieceProcessor(parse_model_proto(encode_model(pieces)))
    ids = proc.encode("hi é")
    # é = 0xC3 0xA9 byte pieces, not unk
    byte_ids = [proc.byte_pieces[0xC3], proc.byte_pieces[0xA9]]
    assert ids[-2:] == byte_ids
    assert 2 not in ids


def test_user_defined_symbols():
    pieces = t5_like_pieces(["the", "dog"]) + [("<mask>", 0.0, USER_DEFINED)]
    proc = SentencePieceProcessor(parse_model_proto(encode_model(pieces)))
    out = proc.encode_pieces("the <mask> dog")
    assert "<mask>" in out


def test_bpe_mode():
    # BPE: scores are merge priorities; "ab"+"c" wins over "a"+"bc"
    pieces = [("<pad>", 0, CONTROL), ("</s>", 0, CONTROL),
              ("<unk>", 0, UNKNOWN),
              ("a", -1.0, NORMAL), ("b", -1.0, NORMAL), ("c", -1.0, NORMAL),
              ("ab", -2.0, NORMAL), ("bc", -3.0, NORMAL),
              ("abc", -4.0, NORMAL), (WS, -1.0, NORMAL)]
    proc = SentencePieceProcessor(parse_model_proto(
        encode_model(pieces, model_type=2, add_dummy_prefix=False)))
    assert proc.encode_pieces("abc") == ["abc"]  # ab -> abc chain
    pieces2 = [p for p in pieces if p[0] != "abc"]
    proc2 = SentencePieceProcessor(parse_model_proto(
        encode_model(pieces2, model_type=2, add_dummy_prefix=False)))
    assert proc2.encode_pieces("abc") == ["ab", "c"]


def test_t5_tokenizer_conventions():
    blob = encode_model(t5_like_pieces(WORDS))
    tok = T5Tokenizer(blob, extra_ids=100)
    spm_size = tok.spm_size
    # sentinel ids count down from the end (HF convention)
    assert tok.extra_token_id(0) == spm_size + 99
    assert tok.extra_token_id(99) == spm_size
    ids = tok.encode("the quick fox")
    assert ids[-1] == tok.eos_id == 1
    ids2 = tok.encode("the <extra_id_0> fox")
    assert tok.extra_token_id(0) in ids2
    # padded call
    arr, mask = tok("the dog", max_length=16)
    assert arr.shape == (16,) and mask.shape == (16,)
    n = int(mask.sum())
    assert arr[n - 1] == tok.eos_id
    assert (arr[n:] == tok.pad_id).all()
    # truncation keeps EOS at the boundary
    long_text = " ".join(WORDS * 20)
    arr, mask = tok(long_text, max_length=8)
    assert mask.sum() == 8 and arr[7] == tok.eos_id
    # tokenize_fn adapter matches __call__
    fn = tok.tokenize_fn(max_length=16)
    np.testing.assert_array_equal(fn("the dog"), tok("the dog", 16)[0])


def test_as_t5_tokenize_coercion(tmp_path):
    from cremage_tpu.prompt.sentencepiece import as_t5_tokenize

    blob = encode_model(t5_like_pieces(WORDS))
    path = tmp_path / "spiece.model"
    path.write_bytes(blob)
    assert as_t5_tokenize(None) is None
    f = lambda s: np.zeros(3)  # noqa: E731
    assert as_t5_tokenize(f) is f
    for spec in (str(path), blob, T5Tokenizer(blob)):
        fn = as_t5_tokenize(spec, max_length=32)
        ids = fn("the quick fox")
        assert ids.shape == (32,) and ids.dtype == np.int32
