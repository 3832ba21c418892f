"""Fused FFN / dense+LN pallas kernels vs. the jnp reference math
(interpret mode on CPU; the same kernels compile for TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from gstx.kernels.ffn import fused_ffn, fused_dense_ln


def _ln(y, g, b, eps=1e-12):
    mu = y.mean(-1, keepdims=True)
    var = ((y - mu) ** 2).mean(-1, keepdims=True)
    return (y - mu) * jax.lax.rsqrt(var + eps) * g + b


def _ffn_ref(x, w1, b1, w2, b2, g, be):
    with jax.default_matmul_precision("float32"):
        h = jax.nn.gelu(x @ w1 + b1, approximate=False)
        return _ln(h @ w2 + b2 + x, g, be)


def test_fused_ffn_matches_reference_math():
    rng = np.random.RandomState(0)
    d, f = 256, 1024
    x = jnp.asarray(rng.randn(2, 35, d) * 0.5, jnp.float32)  # M=70 pads
    w1 = jnp.asarray(rng.randn(d, f) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.randn(f) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.randn(f, d) * 0.02, jnp.float32)
    b2 = jnp.asarray(rng.randn(d) * 0.02, jnp.float32)
    g = jnp.asarray(rng.rand(d) + 0.5, jnp.float32)
    be = jnp.asarray(rng.randn(d) * 0.1, jnp.float32)
    want = np.asarray(_ffn_ref(x, w1, b1, w2, b2, g, be))
    got = np.asarray(fused_ffn(x, w1, b1, w2, b2, g, be,
                               block_m=64, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_ffn_bf16_io():
    rng = np.random.RandomState(1)
    d, f = 256, 512
    x = jnp.asarray(rng.randn(64, d) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(d, f) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(f) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.randn(f, d) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(rng.randn(d) * 0.02, jnp.float32)
    g = jnp.asarray(rng.rand(d) + 0.5, jnp.float32)
    be = jnp.asarray(rng.randn(d) * 0.1, jnp.float32)
    got = fused_ffn(x, w1, b1, w2, b2, g, be, block_m=64, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _ffn_ref(x.astype(jnp.float32), w1.astype(jnp.float32), b1,
                    w2.astype(jnp.float32), b2, g, be)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=3e-2, atol=3e-2)


def test_fused_dense_ln_matches_reference_math():
    rng = np.random.RandomState(2)
    din, d = 192, 256
    x = jnp.asarray(rng.randn(70, din) * 0.5, jnp.float32)
    w = jnp.asarray(rng.randn(din, d) * 0.02, jnp.float32)
    b = jnp.asarray(rng.randn(d) * 0.02, jnp.float32)
    r = jnp.asarray(rng.randn(70, d) * 0.5, jnp.float32)
    g = jnp.asarray(rng.rand(d) + 0.5, jnp.float32)
    be = jnp.asarray(rng.randn(d) * 0.1, jnp.float32)
    with jax.default_matmul_precision("float32"):
        want = np.asarray(_ln(x @ w + b + r, g, be))
    got = np.asarray(fused_dense_ln(x, w, b, r, g, be,
                                    block_m=64, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
