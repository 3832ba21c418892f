"""Logging: file+stdout text log (reference ``utils/logger.py:4-35``
semantics) plus a structured JSONL metrics writer."""

from __future__ import annotations

import json
import os
import sys
import time


def process_log_path(path: str) -> str:
    """Per-process log path: process 0 keeps the configured name; other
    jax.distributed processes append ``.procN`` before the extension so
    concurrent hosts never interleave appends into one shared file.
    Identity when JAX is uninitialized or single-process."""
    try:
        import jax

        idx = jax.process_index()
    except Exception:
        idx = 0
    if idx == 0:
        return path
    root, ext = os.path.splitext(path)
    return f"{root}.proc{idx}{ext}"


class Logger:
    """write() goes to both stdout and the log file, flushed immediately.
    Multi-host: non-zero processes transparently log to ``path.procN``
    (see :func:`process_log_path`)."""

    def __init__(self, path: str, write_to_console: bool = True):
        path = process_log_path(path)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._f = open(path, "a")
        self.write_to_console = write_to_console

    def write(self, msg: str) -> None:
        if self.write_to_console:
            print(msg)
            sys.stdout.flush()
        self._f.write(str(msg) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class MetricsWriter:
    """Append-only JSONL metrics stream (step, wall time, values).
    Multi-host: non-zero processes write ``path.procN`` like Logger."""

    def __init__(self, path: str):
        path = process_log_path(path)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def log(self, step: int, **values) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in values.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
