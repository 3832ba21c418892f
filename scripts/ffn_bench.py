"""Microbenchmark: fused FFN / dense+LN pallas kernels vs the XLA path at
production encoder shapes ([96*256, 768] bf16, F=3072).

`python scripts/ffn_bench.py` on the real chip.  Timing per CLAUDE.md
tunnel rules (amortized chain inside one jit, fetch to host).
"""
import os
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gstx.kernels.ffn import fused_ffn, fused_dense_ln  # noqa: E402
from _bench_util import chain, null_dispatch, timed  # noqa: E402

B, S, D, F = 96, 256, 768, 3072
N = 50


def ln(y, g, b):
    mu = y.mean(-1, keepdims=True)
    var = ((y - mu) ** 2).mean(-1, keepdims=True)
    return (y - mu) * jax.lax.rsqrt(var + 1e-12) * g + b


def main():
    print(f"devices={jax.devices()}")
    tn = null_dispatch()
    print(f"null dispatch {tn*1e3:.1f} ms")

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B * S, D) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(D, F) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(F) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.randn(F, D) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(rng.randn(D) * 0.02, jnp.float32)
    g = jnp.asarray(rng.rand(D) + 0.5, jnp.float32)
    be = jnp.asarray(rng.randn(D) * 0.1, jnp.float32)

    def xla_ffn(x):
        # mirrors FeedForward in bf16: dense -> erf gelu -> dense -> +res -> LN(f32)
        h = (x @ w1 + b1.astype(jnp.bfloat16)).astype(jnp.bfloat16)
        h = jax.nn.gelu(h, approximate=False)
        y = (h @ w2 + b2.astype(jnp.bfloat16)).astype(jnp.bfloat16)
        return ln((y + x).astype(jnp.float32), g, be).astype(jnp.bfloat16)

    flops = 4 * B * S * D * F
    for name, op in {
        "xla ffn": xla_ffn,
        "pallas ffn bm=256": lambda x: fused_ffn(
            x, w1, b1, w2, b2, g, be, block_m=256),
        "pallas ffn bm=128": lambda x: fused_ffn(
            x, w1, b1, w2, b2, g, be, block_m=128),
        "pallas ffn bm=512": lambda x: fused_ffn(
            x, w1, b1, w2, b2, g, be, block_m=512),
    }.items():
        try:
            t = (timed(chain(op, N), x) - tn) / N
            print(f"{name:22s} {t*1e6:8.0f} us  {flops/t/1e12:6.1f} TF/s")
        except Exception as e:
            print(f"{name:22s} FAILED: {type(e).__name__}: {e}")

    w = jnp.asarray(rng.randn(D, D) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.randn(D) * 0.02, jnp.float32)
    r = jnp.asarray(rng.randn(B * S, D) * 0.5, jnp.bfloat16)

    def xla_dln(x, r):
        y = (x @ w + b.astype(jnp.bfloat16)).astype(jnp.bfloat16)
        return ln((y + r).astype(jnp.float32), g, be).astype(jnp.bfloat16)

    flops = 2 * B * S * D * D
    for name, op in {
        "xla dense+ln": xla_dln,
        "pallas dense+ln": lambda x, r: fused_dense_ln(x, w, b, r, g, be),
    }.items():
        try:
            t = (timed(chain(op, N), x, r) - tn) / N
            print(f"{name:22s} {t*1e6:8.0f} us  {flops/t/1e12:6.1f} TF/s")
        except Exception as e:
            print(f"{name:22s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
