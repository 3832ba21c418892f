"""Differential fuzz: gstx BertTokenizer vs installed HF BertTokenizer.

The reference tokenizes every dataloader input with HF WordPiece
(/root/reference/dataloader/dataloader_visdial_gen.py:60-63).  gstx ships a
self-contained rebuild (gstx/data/tokenizer.py + the C++ ASCII fast path);
this script pins it against the installed ``transformers`` slow tokenizer
(and cross-checks the Fast variant) on a shared synthetic multi-script
vocab over a corpus of targeted edge cases + seeded random fuzz.

All non-ASCII characters are spelled as escapes so the corpus is exactly
what it says it is (no editor/NFC ambiguity).

Usage: python scripts/tokenizer_fuzz.py [-n 20000] [-max_report 30]
Exit code 0 iff zero divergences vs HF-slow.
"""

from __future__ import annotations

import argparse
import random
import sys
import tempfile
import unicodedata

sys.path.insert(0, ".")

from gstx.data.tokenizer import BertTokenizer as GstxTokenizer  # noqa: E402


def build_vocab_lines():
    """Multi-script vocab rich enough that basic-tokenization differences
    change the emitted pieces instead of collapsing to [UNK]."""
    toks = ["[PAD]"]
    toks += [f"[unused{i}]" for i in range(1, 100)]
    toks += ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    # printable ASCII singles + continuation forms
    for cp in range(33, 127):
        ch = chr(cp)
        toks.append(ch)
        toks.append("##" + ch)
    # English words and pieces
    toks += [
        "the", "quick", "brown", "fox", "jump", "hello", "world", "hel",
        "##lo", "##ing", "##ed", "##s", "un", "##aff", "##able", "cat",
        "dog", "is", "on", "mat", "don", "##t", "co", "##op", "sep",
        "cls", "mask", "pad", "unk", "##orld", "wor", "##ld", "ab",
        "##cd", "abc", "##def", "xyz", "##yz", "angstrom", "istanbul",
    ]
    # accented words: stripped forms (reachable) + composed forms
    # (unreachable after strip_accents; present to catch a tokenizer that
    # fails to strip)
    toks += ["cafe", "caf", "##e", "uber", "naive",
             "über", "café"]
    # CJK: common + ext-A + ext-B + compatibility ideographs.
    # U+F900 NFC-normalizes to U+8C48, U+2F800 to U+4E3D — include both
    # the compat chars and their NFC targets.
    toks += ["中", "文", "日", "本", "語", "㐀",
             "\U00020000", "豈", "\U0002f800",
             "##中", "##文", "豈", "丽"]
    # Hangul: composed syllables AND decomposed jamo singles
    toks += ["한", "국", "어", "##국", "##어",
             "ᄒ", "ᅡ", "##ᅡ", "ᆫ"]
    # Greek: final-sigma-sensitive pieces
    toks += ["ασ", "ας", "σ", "ς", "α",
             "##σ", "##ς", "στο"]
    # Cyrillic
    toks += ["привет", "при",
             "##вет", "да"]
    # misc unicode letters: sharp-s, fi-ligature (NFC keeps it)
    toks += ["ß", "stra", "##ße", "ﬁ", "fi", "##sh"]
    # digits runs
    toks += ["12", "##34", "123", "2020", "##02"]
    # unicode punctuation singles (P* categories outside ASCII)
    toks += ["«", "»", "—", "…", "“", "„",
             "。", "，"]
    seen, out = set(), []
    for t in toks:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


ASCII_POOL = "ab c.!?-'\"[]()th e#qu12 "
UNI_POOL = (
    "ab cde ééüßİΣσς"
    "α 中文㐀豈 한한국 "
    "при ​‍﻿  。，— "
    "\t\n\x00\x07\x7f� \U00020000\U0002f800ﬁ\U0001f642 [SEP]"
)


def targeted_cases():
    nfd = lambda s: unicodedata.normalize("NFD", s)  # noqa: E731
    cases = [
        "", " ", "\n\t ", "hello world", "Hello, World!", "don't stop",
        "co-op!!!", "the quick brown fox jumps", "unaffable",
        # accents, composed + decomposed
        "café", nfd("café"), "über", nfd("über"),
        "naïve", nfd("naïve"), "CAFÉ", nfd("CAFÉ"),
        # angstrom sign U+212B / ligature / sharp-s / dotted capital I
        "Ångstrom", "ﬁsh", "straße", "İstanbul",
        # Greek final sigma: whole-string lower() emits varsigma; HF's
        # per-char regex lower() emits sigma
        "ΑΣ", "ΣΣΣ", "ας",
        "στος",
        # CJK incl. compatibility ideographs (NFC-changed) and
        # supplementary-plane chars
        "中文", "abc中文def", "豈", "\U0002f800",
        "\U00020000x", "中 文", "㐀中",
        # Hangul: composed vs decomposed jamo (NFC composes jamo)
        "한국어",
        "한국어",
        "한",
        # control / format / zero-width chars
        "a\x00b", "a\x07b", "a\x7fb", "a​b", "a‍b",
        "a﻿b", "a�b", "a b", "a b",
        "a\x0bb", "a\x0cb",
        # specials embedded in text (case-sensitive never-split)
        "hello[SEP]world", "[CLS]hello", "x[MASK]", "[SEP]", "[SEP][SEP]",
        "[sep]", "[SEP", "SEP]", "a [PAD] b", "[UNK]z", "[MASK]s",
        "he[CLS]llo[SEP]", "[ SEP ]", "[[SEP]]", "[SEP]中",
        "A[SEP]B", "HELLO[SEP]WORLD", "[PAD][unused3]x",
        # long words
        "a" * 99, "a" * 100, "a" * 101, "b" * 250,
        "中" * 101,  # CJK-spaced, so each char is its own word
        ("ab" * 51) + "[SEP]",
        # mixed script inside one "word"
        "abc한def", "abΣcd", "12ab", "ab12cd", "a1!b2",
        "x中y", "приvet",
        # unicode punctuation
        "«hello»", "wait…what", "a—b",
        "“quoted„", "。，", "’s",
        # emoji (So: neither punct nor control -> stays inside the word)
        "ab\U0001f642cd", "\U0001f642", "hi \U0001f642 there",
        # numbers / dates
        "2020-02-02", "12.34", "1,234",
    ]
    return cases


def random_cases(n, seed=1234):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        pool = ASCII_POOL if rng.random() < 0.4 else UNI_POOL
        k = rng.randint(1, 60)
        out.append("".join(rng.choice(pool) for _ in range(k)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=20000)
    ap.add_argument("-max_report", type=int, default=30)
    ap.add_argument("-skip_fast", action="store_true")
    args = ap.parse_args()

    from transformers import BertTokenizer as HFTokenizer
    from transformers import BertTokenizerFast as HFFast

    vocab_lines = build_vocab_lines()
    vf = tempfile.NamedTemporaryFile(
        "w", suffix=".txt", delete=False, encoding="utf-8")
    vf.write("\n".join(vocab_lines) + "\n")
    vf.close()

    hf = HFTokenizer(vocab_file=vf.name)
    hf_fast = None if args.skip_fast else HFFast(vocab_file=vf.name)
    gx = GstxTokenizer(vocab_path=vf.name, use_native=True)
    has_native = gx._native is not None
    print(f"vocab size {len(vocab_lines)}; native fast path: {has_native}")

    corpus = targeted_cases() + random_cases(args.n)
    div_slow, div_fast = [], []
    for text in corpus:
        want = hf.tokenize(text)
        got = gx.tokenize(text)
        if want != got:
            div_slow.append((text, want, got))
            continue
        want_ids = hf.encode(text, add_special_tokens=False)
        got_ids = gx.encode(text)
        if want_ids != got_ids:
            div_slow.append((text, want_ids, got_ids))
        if hf_fast is not None:
            wf = hf_fast.tokenize(text)
            if wf != want:
                div_fast.append((text, want, wf))
    print(f"corpus {len(corpus)} texts")
    print(f"gstx vs HF-slow divergences: {len(div_slow)}")
    for text, want, got in div_slow[: args.max_report]:
        print(f"  text={text!r}\n    hf  ={want}\n    gstx={got}")
    print(f"HF-fast vs HF-slow divergences (informational): {len(div_fast)}")
    for text, want, got in div_fast[: args.max_report]:
        print(f"  text={text!r}\n    slow={want}\n    fast={got}")
    return 1 if div_slow else 0


if __name__ == "__main__":
    sys.exit(main())
