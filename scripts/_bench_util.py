"""Shared tunnel-safe timing helpers for the scripts/ microbenchmarks.

One copy of the CLAUDE.md timing recipe: on the axon tunnel
``block_until_ready`` returns before remote completion, so honest timing
fetches a result to host; per-dispatch latency is ~25-35 ms, so op timings
amortize N iterations inside one jit with a REAL data dependency
(``x + carry * 1e-6`` — a ``* 0`` dep gets constant-folded and hoisted);
the null-dispatch baseline is subtracted by callers.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def fetch1(out):
    """Fetch exactly ONE leaf to host: an honest completion barrier (the
    tunnel returns fetches only after remote execution) that doesn't pay
    one ~30 ms round-trip per output leaf."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0] if leaf.ndim else leaf)


def timed(fn, *args, n=6):
    """min-of-n wall time of fn(*args) incl. one fetch; first call warms."""
    fetch1(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        fetch1(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def null_dispatch():
    """The tunnel's per-dispatch latency floor (subtract from timed())."""
    return timed(jax.jit(lambda x: x + 1), jnp.zeros((8, 8)))


def chain(op, n=50):
    """Jit running ``op(x, *rest)`` n times with a data dep on the previous
    output; divide the timed() result by n for per-op cost."""
    def run(x, *rest):
        def body(carry, _):
            o = op(x + carry * 1e-6, *rest)
            return o.astype(x.dtype), ()
        out, _ = jax.lax.scan(body, jnp.zeros_like(x), None, length=n)
        return out
    return jax.jit(run)
