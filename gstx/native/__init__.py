"""Native (C++) fast paths: GSTF feature-store reader + WordPiece tokenizer.

Build with ``python -m gstx.native.build`` (g++, no external deps); all
callers degrade gracefully to the pure-Python implementations when the
shared object is absent or a fast path declines an input (e.g. non-ASCII
text for the tokenizer).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_SO_NAME = "libgstx_native.so"
_HERE = os.path.dirname(os.path.abspath(__file__))
_lib = None
_lib_checked = False


def so_path() -> str:
    return os.path.join(_HERE, _SO_NAME)


def load_library(build_if_missing: bool = False):
    """Load (optionally build) the native library; None if unavailable."""
    global _lib, _lib_checked
    if _lib is not None:
        return _lib
    if _lib_checked and not build_if_missing:
        return None
    _lib_checked = True
    path = so_path()
    if not os.path.exists(path) and build_if_missing:
        from gstx.native.build import build

        if not build():
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)

    lib.gstf_open.restype = ctypes.c_void_p
    lib.gstf_open.argtypes = [ctypes.c_char_p]
    lib.gstf_close.argtypes = [ctypes.c_void_p]
    lib.gstf_num_items.restype = ctypes.c_long
    lib.gstf_num_items.argtypes = [ctypes.c_void_p]
    lib.gstf_feat_dim.restype = ctypes.c_int
    lib.gstf_feat_dim.argtypes = [ctypes.c_void_p]
    lib.gstf_num_classes.restype = ctypes.c_int
    lib.gstf_num_classes.argtypes = [ctypes.c_void_p]
    lib.gstf_keys.restype = ctypes.c_long
    lib.gstf_keys.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_longlong),
                              ctypes.c_long]
    lib.gstf_num_boxes.restype = ctypes.c_int
    lib.gstf_num_boxes.argtypes = [ctypes.c_void_p, ctypes.c_longlong]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.gstf_read.restype = ctypes.c_int
    lib.gstf_read.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                              f32p, f32p, f32p, f32p]

    lib.wp_load.restype = ctypes.c_void_p
    lib.wp_load.argtypes = [ctypes.c_char_p]
    lib.wp_free.argtypes = [ctypes.c_void_p]
    lib.wp_vocab_size.restype = ctypes.c_int
    lib.wp_vocab_size.argtypes = [ctypes.c_void_p]
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.wp_encode.restype = ctypes.c_int
    lib.wp_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                              ctypes.c_int, i32p, ctypes.c_int]
    _lib = lib
    return lib


class NativeFeatureStore:
    """C++ reader with the same output contract as FeatureStoreReader."""

    def __init__(self, path: str, lib=None):
        self._lib = lib or load_library()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.gstf_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open GSTF store: {path}")
        self.feat_dim = self._lib.gstf_feat_dim(self._h)
        self.num_classes = self._lib.gstf_num_classes(self._h)

    def __len__(self):
        return int(self._lib.gstf_num_items(self._h))

    def keys(self) -> List[int]:
        n = len(self)
        buf = (ctypes.c_longlong * n)()
        got = self._lib.gstf_keys(self._h, buf, n)
        return list(buf[:got])

    def __contains__(self, image_id) -> bool:
        return self._lib.gstf_num_boxes(self._h, int(image_id)) >= 0

    def __getitem__(self, image_id):
        image_id = int(image_id)
        n = self._lib.gstf_num_boxes(self._h, image_id)
        if n < 0:
            raise KeyError(image_id)
        total = n + 1
        feat = np.empty((total, self.feat_dim), np.float32)
        loc = np.empty((total, 5), np.float32)
        loc_ori = np.empty((total, 5), np.float32)
        cls = np.empty((total, self.num_classes), np.float32)
        got = self._lib.gstf_read(self._h, image_id, feat, loc, loc_ori, cls)
        if got != total:
            # a bare assert would vanish under python -O and return the
            # uninitialized np.empty buffers as features
            raise IOError(
                f"native gstf_read({image_id}) returned {got}, "
                f"expected {total}")
        return feat, total, loc, loc_ori, cls

    def close(self):
        if self._h:
            self._lib.gstf_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class NativeWordPiece:
    """C++ ASCII fast path; returns None for non-ASCII (caller falls back)."""

    def __init__(self, vocab_path: str, lib=None, max_ids: int = 4096):
        self._lib = lib or load_library()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.wp_load(vocab_path.encode())
        if not self._h:
            raise IOError(f"cannot load vocab: {vocab_path}")
        self._max_ids = max_ids

    @property
    def _SPECIALS(self):
        # single source of truth with the Python path: the decline test
        # below must track _split_on_specials' never-split list exactly,
        # or the two tokenizations silently diverge (lazy import — the
        # Python tokenizer itself lazily imports this module)
        from gstx.data.tokenizer import _SPECIAL_TOKENS
        return _SPECIAL_TOKENS

    def encode(self, text: str) -> Optional[List[int]]:
        try:
            raw = text.encode("ascii")
        except UnicodeEncodeError:
            return None
        # special tokens embedded in text are never-split (HF semantics,
        # see gstx/data/tokenizer.py::_split_on_specials); the C++ path
        # would punctuation-split them, so decline and let Python handle it
        if "[" in text and any(s in text for s in self._SPECIALS):
            return None
        # per-CALL buffer: ctypes releases the GIL during the C call, and
        # the threaded DataLoader encodes concurrently — a shared buffer
        # races and silently corrupts token ids.  wp_encode takes an
        # explicit length (embedded NULs are deleted like the Python path,
        # not treated as a terminator) and returns the TOTAL id count, so
        # an overflowing text regrows the buffer instead of silently
        # truncating.
        buf = np.empty(self._max_ids, np.int32)
        n = self._lib.wp_encode(self._h, raw, len(raw), buf, len(buf))
        if n < 0:
            return None
        if n > len(buf):
            buf = np.empty(n, np.int32)
            n = self._lib.wp_encode(self._h, raw, len(raw), buf, len(buf))
        return buf[:n].tolist()

    def close(self):
        if self._h:
            self._lib.wp_free(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
