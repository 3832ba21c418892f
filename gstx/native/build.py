"""Build the gstx native library (g++ only, no external deps)."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
SOURCES = ["feature_store.cc", "wordpiece.cc"]


def build(verbose: bool = False) -> bool:
    gxx = shutil.which("g++")
    if gxx is None:
        return False
    out = os.path.join(_HERE, "libgstx_native.so")
    cmd = [gxx, "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-o", out] + [os.path.join(_HERE, s) for s in SOURCES]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True)
    except OSError:
        return False
    if res.returncode != 0:
        if verbose:
            print(res.stderr, file=sys.stderr)
        return False
    return True


if __name__ == "__main__":
    ok = build(verbose=True)
    print("built" if ok else "build FAILED")
    sys.exit(0 if ok else 1)
