"""Differential parity: gstx tokenizer vs the installed HF BertTokenizer.

The reference's entire data layer sits on HF WordPiece
(/root/reference/dataloader/dataloader_visdial_gen.py:60-63).  These tests
pin gstx's self-contained rebuild (gstx/data/tokenizer.py, Python AND the
C++ ASCII fast path) against ``transformers.BertTokenizer`` (slow — the
exact implementation family the reference uses) and cross-check
``BertTokenizerFast`` on a shared synthetic multi-script vocab:
NFD/NFC accents, CJK incl. compatibility ideographs, Hangul syllables and
jamo, Greek final-sigma, control/format/zero-width chars, all punctuation
classes, >100-char words, mixed-script words, and special tokens embedded
in text.  scripts/tokenizer_fuzz.py is the widened (20k-case) version.
"""

import pytest

transformers = pytest.importorskip("transformers")

from scripts.tokenizer_fuzz import (  # noqa: E402
    build_vocab_lines, random_cases, targeted_cases)

from gstx.data.tokenizer import BertTokenizer as GstxTokenizer  # noqa: E402


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("tok") / "vocab.txt"
    p.write_text("\n".join(build_vocab_lines()) + "\n", encoding="utf-8")
    return str(p)


@pytest.fixture(scope="module")
def hf_slow(vocab_file):
    return transformers.BertTokenizer(vocab_file=vocab_file)


@pytest.fixture(scope="module")
def hf_fast(vocab_file):
    return transformers.BertTokenizerFast(vocab_file=vocab_file)


@pytest.fixture(scope="module")
def gstx_tok(vocab_file):
    return GstxTokenizer(vocab_path=vocab_file, use_native=True)


CORPUS = targeted_cases() + random_cases(2000, seed=99)


def test_tokenize_matches_hf_slow(hf_slow, gstx_tok):
    bad = [(t, hf_slow.tokenize(t), gstx_tok.tokenize(t))
           for t in CORPUS if hf_slow.tokenize(t) != gstx_tok.tokenize(t)]
    assert not bad, bad[:10]


def test_encode_matches_hf_slow(hf_slow, gstx_tok):
    """encode() (no specials added, reference call-site semantics) — this
    exercises the C++ ASCII fast path wherever it accepts the input."""
    bad = []
    for t in CORPUS:
        want = hf_slow.encode(t, add_special_tokens=False)
        got = gstx_tok.encode(t)
        if want != got:
            bad.append((t, want, got))
    assert not bad, bad[:10]


def test_native_path_directly(hf_slow, gstx_tok):
    """Force the C++ path (no Python fallback masking) on the inputs it
    accepts, including its decline contract for non-ASCII and embedded
    special tokens."""
    if gstx_tok._native is None:
        pytest.skip("native library not built")
    n_checked = 0
    for t in CORPUS:
        ids = gstx_tok._native.encode(t)
        if ids is None:
            # decline contract: only for non-ASCII or embedded specials
            assert (not t.isascii()
                    or any(s in t for s in gstx_tok._native._SPECIALS)), t
            continue
        assert ids == hf_slow.encode(t, add_special_tokens=False), t
        n_checked += 1
    assert n_checked > 100  # the ASCII pool must actually hit the C++ path


def test_fast_variant_agrees(hf_slow, hf_fast):
    for t in CORPUS:
        assert hf_fast.tokenize(t) == hf_slow.tokenize(t), t


def test_greek_final_sigma_per_char_lower(hf_slow, gstx_tok):
    # whole-string str.lower() would emit final sigma; HF's per-char
    # regex lowercase does not (tokenization_utils.py:644-653)
    assert gstx_tok.tokenize("ΑΣ") == hf_slow.tokenize("ΑΣ") == ["ασ"]


def test_embedded_specials_never_split(hf_slow, gstx_tok):
    t = "HELLO[SEP]world [MASK] [sep]"
    want = hf_slow.tokenize(t)
    assert gstx_tok.tokenize(t) == want
    assert "[SEP]" in want and "[MASK]" in want
    # lowercase '[sep]' is NOT a special token: punctuation-split
    assert want[-3:] == ["[", "sep", "]"]
