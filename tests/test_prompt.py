"""Prompt engine tests. Grammar goldens ported from the reference's unit
suite (test/cremage/utils/prompt_score_parser_*_test.py)."""
import numpy as np
import pytest

from cremage_tpu.prompt import chunking as CH
from cremage_tpu.prompt import history as H
from cremage_tpu.prompt import wildcards as W
from cremage_tpu.prompt.parser import compute_prompt_score
from cremage_tpu.prompt.tokenizer import BOS, EOS, CLIPTokenizer, default_tokenizer
from cremage_tpu.prompt.tokens import split_token_with_embedding_tags


def r2(x):
    return round(x, 2)


# ---------------- parser goldens (reference unit tests) --------------------

def test_score_plain():
    assert compute_prompt_score("hello") == [("hello", 1.0)]


def test_score_single_paren():
    out = compute_prompt_score("(hello)")
    assert out[0][0] == "hello" and r2(out[0][1]) == 1.1


def test_score_unclosed_paren():
    out = compute_prompt_score("(hello")
    assert out[0][0] == "hello" and r2(out[0][1]) == 1.1


def test_score_mixed():
    out = compute_prompt_score("hello(abc)x")
    assert [(w, r2(s)) for w, s in out] == [
        ("hello", 1.0), ("abc", 1.1), ("x", 1.0)
    ]


def test_score_whitespace():
    out = compute_prompt_score("hello (abc   ) x ")
    assert [(w, r2(s)) for w, s in out] == [
        ("hello", 1.0), ("abc", 1.1), ("x", 1.0)
    ]


def test_score_two_groups():
    out = compute_prompt_score("hello(abc)x(def)")
    assert [(w, r2(s)) for w, s in out] == [
        ("hello", 1.0), ("abc", 1.1), ("x", 1.0), ("def", 1.1)
    ]


def test_score_nested():
    out = compute_prompt_score("hello(abc(def))x")
    assert [(w, r2(s)) for w, s in out] == [
        ("hello", 1.0), ("abc", 1.1), ("def", r2(1.1 * 1.1)), ("x", 1.0)
    ]


def test_score_nested_explicit():
    out = compute_prompt_score("hello(abc(def):1.2)x")
    assert [(w, r2(s)) for w, s in out] == [
        ("hello", 1.0), ("abc", 1.2), ("def", r2(1.2 * 1.1)), ("x", 1.0)
    ]


def test_score_docstring_example():
    out = compute_prompt_score("hello, ((world), everyone:1.2).")
    assert [(w, r2(s)) for w, s in out] == [
        ("hello,", 1.0), ("world", r2(1.32)), (",", 1.2),
        ("everyone", 1.2), (".", 1.0),
    ]


def test_score_empty():
    assert compute_prompt_score("   ") == [("", 1.0)]


def test_score_embedding_tag_not_score():
    out = compute_prompt_score("<embedding:foo.bin>")
    assert out == [("<embedding:foo.bin>", 1.0)]


def test_score_embedding_with_score():
    out = compute_prompt_score("(<embedding:foo.bin>world:1.2)")
    words = [w for w, _ in out]
    assert words == ["<embedding:foo.bin>", "world"]
    assert all(r2(s) == 1.2 for _, s in out)


# ---------------- token splitting ------------------------------------------

def test_split_embedding_tags():
    assert split_token_with_embedding_tags("abc<embedding:hello.bin>xyz") == (
        ["abc", "<embedding:hello.bin>", "xyz"], [False, True, False]
    )


def test_split_no_tag():
    assert split_token_with_embedding_tags("hello") == (["hello"], [False])


def test_split_short_bracket_literal():
    assert split_token_with_embedding_tags("a<b>c") == (["a<b>c"], [False])


def test_split_empty():
    assert split_token_with_embedding_tags("") == ([], [])


# ---------------- tokenizer -------------------------------------------------

def test_tokenizer_known_ids():
    tok = default_tokenizer()
    assert tok.encode("hello world") == [3306, 1002]
    assert tok.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]


def test_tokenizer_case_and_whitespace():
    tok = default_tokenizer()
    assert tok.encode("Hello   WORLD") == tok.encode("hello world")


def test_tokenizer_specials_layout():
    tok = default_tokenizer()
    seq = tok.encode_with_specials("hello")
    assert len(seq) == 77
    assert seq[0] == BOS and seq[1] == 3306 and set(seq[2:]) == {EOS}


def test_tokenizer_decode_roundtrip():
    tok = default_tokenizer()
    assert tok.decode(tok.encode("a photo of a cat")) == "a photo of a cat"


# ---------------- chunking --------------------------------------------------

DIM = 8


def fake_embed(ids):
    """Deterministic fake token-embedding: embedding[i] = [id, id, ...]."""
    ids = np.asarray(ids)
    return np.tile(ids[:, None].astype(np.float32), (1, DIM))


def test_chunking_single():
    tok = default_tokenizer()
    chunks, eos_idx = CH.generate_weighted_chunks(
        tok, fake_embed, [("hello", 1.0), ("world", 2.0)]
    )
    assert len(chunks) == 1
    c = chunks[0]
    assert c.shape == (77, DIM)
    assert c[0, 0] == BOS
    assert c[1, 0] == 3306 * 1.0
    assert c[2, 0] == 1002 * 2.0       # score multiplies the embedding
    assert c[3, 0] == EOS              # pad region
    assert c[76, 0] == EOS
    assert eos_idx == [3]


def test_chunking_empty_prompt():
    tok = default_tokenizer()
    chunks, eos_idx = CH.generate_weighted_chunks(tok, fake_embed, [("", 1.0)])
    assert len(chunks) == 1
    assert chunks[0].shape == (77, DIM)
    assert chunks[0][1, 0] == EOS
    assert eos_idx == [1]


def test_chunking_overflow_starts_new_chunk():
    tok = default_tokenizer()
    words = [("hello", 1.0)] * 76  # 76 single-token words > 75
    chunks, eos_idx = CH.generate_weighted_chunks(tok, fake_embed, words)
    assert len(chunks) == 2
    assert eos_idx == [76, 2]


def test_chunking_break_marker():
    tok = default_tokenizer()
    words = [("hello", 1.0), ("BREAK", 1.0), ("world", 1.0)]
    chunks, eos_idx = CH.generate_weighted_chunks(tok, fake_embed, words)
    assert len(chunks) == 2
    # BREAK is dropped; first chunk has 1 token, second has 1
    assert eos_idx == [2, 2]


def test_chunking_ti_embedding(tmp_path):
    import torch

    from cremage_tpu.io.ti import load_embedding

    emb = np.full((3, DIM), 7.0, np.float32)
    torch.save({"string_to_param": {"*": torch.tensor(emb)}},
               str(tmp_path / "myti.pt"))
    fetch = CH.make_ti_fetch(str(tmp_path), load_embedding)
    tok = default_tokenizer()
    chunks, eos_idx = CH.generate_weighted_chunks(
        tok, fake_embed,
        [("<embedding:myti.pt>", 2.0), ("hello", 1.0)], ti_fetch=fetch,
    )
    c = chunks[0]
    np.testing.assert_allclose(c[1:4], emb * 2.0)
    assert c[4, 0] == 3306
    assert eos_idx == [5]


def test_chunking_missing_ti_skipped(tmp_path):
    from cremage_tpu.io.ti import load_embedding

    fetch = CH.make_ti_fetch(str(tmp_path), load_embedding)
    tok = default_tokenizer()
    chunks, eos_idx = CH.generate_weighted_chunks(
        tok, fake_embed, [("<embedding:nope.pt>", 1.0), ("hello", 1.0)],
        ti_fetch=fetch,
    )
    assert eos_idx == [2]


def test_pad_conditioning_to_match():
    filler = np.zeros((77, DIM), np.float32)
    c = np.ones((154, DIM), np.float32)
    uc = np.ones((77, DIM), np.float32)
    c2, uc2 = CH.pad_conditioning_to_match(c, uc, filler)
    assert c2.shape == uc2.shape == (154, DIM)
    assert (uc2[77:] == 0).all()


# ---------------- wildcards / history ---------------------------------------

def test_wildcards(tmp_path):
    (tmp_path / "animal.txt").write_text("# comment\ncat\n\ndog\n")
    out = W.resolve_wildcards("a __animal__ photo", str(tmp_path), rng=0)
    assert out in ("a cat photo", "a dog photo")
    # reproducible with a fixed seed
    assert out == W.resolve_wildcards("a __animal__ photo", str(tmp_path), rng=0)


def test_wildcards_nested(tmp_path):
    (tmp_path / "a.txt").write_text("x __b__ y")
    (tmp_path / "b.txt").write_text("z")
    assert W.resolve_wildcards("__a__", str(tmp_path), rng=1) == "x z y"


def test_wildcards_missing_file(tmp_path):
    assert W.resolve_wildcards("__nope__ here", str(tmp_path), rng=0) == "__nope__ here"


def test_wildcards_unterminated(tmp_path):
    assert W.resolve_wildcards("text __dangling", str(tmp_path), rng=0) == "text __dangling"


def test_wildcards_cycle_guard(tmp_path):
    (tmp_path / "a.txt").write_text("__b__")
    (tmp_path / "b.txt").write_text("__a__")
    out = W.resolve_wildcards("__a__", str(tmp_path), rng=0)
    assert isinstance(out, str)  # terminates


def test_history(tmp_path):
    p = str(tmp_path / "hist.json")
    h = H.PromptHistory(p, max_entries=3)
    h.add("a")
    h.add("b")
    h.add("a")  # moves to end
    assert h.entries() == ["b", "a"]
    h.add("c")
    h.add("d")
    assert h.entries() == ["a", "c", "d"]  # capped at 3
    h2 = H.PromptHistory(p)
    assert h2.entries() == ["a", "c", "d"]


def test_expand_prompt():
    out = H.expand_prompt("cat", "pre, ", True, ", post", True)
    assert out == "pre, cat, post"
    assert H.expand_prompt("cat", "pre, ", False, ", post", False) == "cat"


def test_score_multiline_word_count():
    """Reference golden (prompt_score_parser_compute_prompt_score_test
    test_compute_prompt_score_9): 12 newline-separated 6-word lines plus
    trailing whitespace flatten to 72 scored words."""
    text = "\n".join(["Cute puppy on the kitchen counter"] * 12) + \
        "\n\n        \n        \n        "
    out = compute_prompt_score(text)
    assert len(out) == 72


def test_split_token_reference_goldens():
    """Exact cases from the reference's token_process_helper_test.py
    (score_1..score_4): double tags, and the missing-'>' fallback."""
    s, b = split_token_with_embedding_tags("helloworld")
    assert (s, b) == (["helloworld"], [False])
    s, b = split_token_with_embedding_tags("hello<embedding:foo.bin>world")
    assert (s, b) == (["hello", "<embedding:foo.bin>", "world"],
                      [False, True, False])
    s, b = split_token_with_embedding_tags("hello<embedding:foo.binworld")
    assert (s, b) == (["hello<embedding:foo.binworld"], [False])
    s, b = split_token_with_embedding_tags(
        "hello<embedding:foo.bin>world<embedding:bar.pt>")
    assert (s, b) == (
        ["hello", "<embedding:foo.bin>", "world", "<embedding:bar.pt>"],
        [False, True, False, True])
