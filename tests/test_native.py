"""Native (C++) fast paths vs. the Python implementations."""

import os

import numpy as np
import pytest

from fixtures import WORDS, make_tokenizer, write_vocab_file
from gstx.data.feature_store import FeatureStoreReader, make_synthetic_store
from gstx.native import load_library
from gstx.native.build import build


@pytest.fixture(scope="module")
def lib():
    built = load_library(build_if_missing=True)
    if built is None:
        pytest.skip("g++ unavailable / native build failed")
    return built


def test_native_feature_store_matches_python(lib, tmp_path):
    from gstx.native import NativeFeatureStore

    path = str(tmp_path / "s.store")
    make_synthetic_store(path, [3, 5, 8], num_boxes=6, feat_dim=16,
                         num_classes=7)
    py = FeatureStoreReader(path, use_native=False)
    cc = NativeFeatureStore(path)
    assert sorted(py.keys()) == sorted(cc.keys())
    assert len(py) == len(cc) == 3
    for image_id in (3, 5, 8):
        f1, n1, l1, lo1, c1 = py[image_id]
        f2, n2, l2, lo2, c2 = cc[image_id]
        assert n1 == n2
        # CLAUDE.md invariant: native outputs equal Python BIT-FOR-BIT
        # (the <IMG> mean row must divide like numpy, not multiply by a
        # reciprocal — 1-ulp double-rounding was caught here)
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(lo1, lo2)
        np.testing.assert_array_equal(c1, c2)
    assert 99 not in cc
    with pytest.raises(KeyError):
        cc[99]
    py.close()
    cc.close()


def test_reader_auto_selects_native(lib, tmp_path):
    from gstx.native import NativeFeatureStore

    path = str(tmp_path / "s2.store")
    make_synthetic_store(path, [1], num_boxes=4, feat_dim=8, num_classes=3)
    r = FeatureStoreReader(path)
    assert isinstance(r, NativeFeatureStore)
    r.close()


def test_native_wordpiece_matches_python(lib, tmp_path):
    from gstx.data.tokenizer import BertTokenizer
    from gstx.native import NativeWordPiece

    vocab_path = write_vocab_file(str(tmp_path / "vocab.txt"))
    py = BertTokenizer(vocab_path=vocab_path, use_native=False)
    cc = NativeWordPiece(vocab_path)

    rng = np.random.RandomState(0)
    for _ in range(200):
        n = rng.randint(1, 12)
        words = [WORDS[i] for i in rng.randint(0, 36, size=n)]
        text = " ".join(words)
        if rng.rand() < 0.5:
            text = text.capitalize() + rng.choice([".", "?", "!", ","])
        got = cc.encode(text)
        want = py.encode(text)
        assert got == want, (text, got, want)

    # subwords + unknown + punctuation fuzz
    for text in ("riders playing", "xyzzy !", "a,b,c", "HELLO?", "  ", "a"):
        assert cc.encode(text) == py.encode(text), text

    # control characters are DELETED (not word boundaries), embedded NUL
    # included — exactly like tokenizer.py::_clean_text; the native path
    # once treated them as separators / a C-string terminator
    for text in ("man\x0bhorse", "man\x00horse", "a\x7fb", "dog\x01cat",
                 "\x00", "tail\x00", "man \x0c horse"):
        assert cc.encode(text) == py.encode(text), repr(text)

    # output longer than the native buffer regrows instead of silently
    # truncating
    from gstx.native import NativeWordPiece as NWP
    small = NWP(vocab_path, max_ids=4)
    long_text = " ".join(WORDS[:12]) * 3
    assert small.encode(long_text) == py.encode(long_text)

    # non-ASCII -> native declines
    assert cc.encode("café") is None


def test_native_wordpiece_thread_safety(lib, tmp_path):
    """The threaded DataLoader encodes on a shared tokenizer while ctypes
    releases the GIL: concurrent encodes must not corrupt each other (the
    binding once shared one output buffer across calls)."""
    from concurrent.futures import ThreadPoolExecutor

    from gstx.data.tokenizer import BertTokenizer
    from gstx.native import NativeWordPiece

    vocab_path = write_vocab_file(str(tmp_path / "vocab.txt"))
    py = BertTokenizer(vocab_path=vocab_path, use_native=False)
    cc = NativeWordPiece(vocab_path)
    rng = np.random.RandomState(7)
    texts = [" ".join(WORDS[i] for i in rng.randint(0, 36, size=30))
             for _ in range(64)]
    want = [py.encode(t) for t in texts]
    with ThreadPoolExecutor(8) as pool:
        for _ in range(5):
            got = list(pool.map(cc.encode, texts))
            assert got == want


def test_native_store_rejects_corrupt_files(lib, tmp_path):
    """A truncated/corrupt GSTF store must fail cleanly at open (the
    Python reader raises; the native reader once read past the mmap and
    could SIGSEGV the dataloader process)."""
    from gstx.native import NativeFeatureStore

    path = str(tmp_path / "c.store")
    make_synthetic_store(path, [1, 2], num_boxes=4, feat_dim=8,
                         num_classes=3)
    data = open(path, "rb").read()
    for name, blob in [
        ("truncated", data[: len(data) // 2]),
        ("tiny", data[:10]),
        ("bad_index_offset", data[:24] + (2**62).to_bytes(8, "little")
         + data[32:]),
    ]:
        bad = str(tmp_path / f"{name}.store")
        open(bad, "wb").write(blob)
        with pytest.raises(IOError):
            NativeFeatureStore(bad)


def test_tokenizer_auto_uses_native(lib, tmp_path):
    from gstx.data.tokenizer import BertTokenizer

    vocab_path = write_vocab_file(str(tmp_path / "vocab.txt"))
    tok = BertTokenizer(vocab_path=vocab_path)
    assert tok._native is not None
    # non-ASCII falls back to python silently
    assert tok.encode("café") == BertTokenizer(
        vocab_path=vocab_path, use_native=False).encode("café")
    assert tok.encode("a man riding") == BertTokenizer(
        vocab_path=vocab_path, use_native=False).encode("a man riding")


def test_native_throughput_sanity(lib, tmp_path):
    """The native paths must not be slower than python (smoke check)."""
    import time

    from gstx.data.tokenizer import BertTokenizer
    from gstx.native import NativeWordPiece

    vocab_path = write_vocab_file(str(tmp_path / "vocab.txt"))
    py = BertTokenizer(vocab_path=vocab_path, use_native=False)
    cc = NativeWordPiece(vocab_path)
    texts = [" ".join(WORDS[:30])] * 300

    t0 = time.time()
    for t in texts:
        py.encode(t)
    py_dt = time.time() - t0
    t0 = time.time()
    for t in texts:
        cc.encode(t)
    cc_dt = time.time() - t0
    assert cc_dt < py_dt, (cc_dt, py_dt)


def test_native_store_throughput_at_scale(lib, tmp_path):
    """Production-shaped reads (36 boxes x 2048 features x 1601 classes):
    the native reader must beat the python one."""
    import time

    from gstx.native import NativeFeatureStore

    path = str(tmp_path / "big.store")
    ids = list(range(200))
    make_synthetic_store(path, ids, num_boxes=36, feat_dim=2048,
                         num_classes=1601)
    py = FeatureStoreReader(path, use_native=False)
    cc = NativeFeatureStore(path)
    # correctness spot check at production shapes (bit-for-bit)
    f1, n1, l1, *_ = py[7]
    f2, n2, l2, *_ = cc[7]
    np.testing.assert_array_equal(f1, f2)
    assert n1 == n2 == 37

    t0 = time.time()
    for i in ids:
        py[i]
    py_dt = time.time() - t0
    t0 = time.time()
    for i in ids:
        cc[i]
    cc_dt = time.time() - t0
    assert cc_dt < py_dt * 1.2, (cc_dt, py_dt)  # at least comparable
    py.close()
    cc.close()
