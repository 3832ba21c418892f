"""Pallas fused-attention kernel vs. the jnp reference (interpret mode on
CPU; the same kernel compiles for TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gstx.kernels.attention import fused_attention
from gstx.models.layers import additive_mask, attend, causal_additive_mask


def _compare(b, h, lq, lk, dh, mask=None, dtype=jnp.float32):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, lq, dh), dtype)
    k = jnp.asarray(rng.randn(b, h, lk, dh), dtype)
    v = jnp.asarray(rng.randn(b, h, lk, dh), dtype)
    want = np.asarray(attend(q, k, v, mask, dtype=jnp.float32))
    got = np.asarray(fused_attention(q, k, v, mask, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_attention_text_selfattn_shape():
    # text stream: 256 tokens, 12 heads, dh 64
    m = additive_mask(jnp.asarray(
        np.random.RandomState(1).rand(2, 256) > 0.2).astype(jnp.int32))
    _compare(2, 4, 256, 256, 64, m)


def test_fused_attention_visual_shape():
    # visual stream: 37 regions, 8 heads, dh 128 (unaligned seq)
    m = additive_mask(jnp.ones((2, 37), jnp.int32))
    _compare(2, 2, 37, 37, 128, m)


def test_fused_attention_coattention_shapes():
    # text->visual (256 queries over 37 keys) and visual->text
    m_v = additive_mask(jnp.ones((1, 37), jnp.int32))
    _compare(1, 2, 256, 37, 128, m_v)
    m_t = additive_mask(jnp.asarray(
        np.random.RandomState(2).rand(1, 256) > 0.3).astype(jnp.int32))
    _compare(1, 2, 37, 256, 128, m_t)


def test_fused_attention_causal_mask():
    m = causal_additive_mask(jnp.ones((2, 24), jnp.int32))
    _compare(2, 2, 24, 24, 64, m)


def test_fused_attention_no_mask():
    _compare(1, 2, 16, 16, 32, None)


def test_fused_attention_bf16_io():
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(1, 2, 32, 64), jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 2, 32, 64), jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, 2, 32, 64), jnp.bfloat16)
    got = fused_attention(q, k, v, None, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = attend(q.astype(jnp.float32), k.astype(jnp.float32),
                  v.astype(jnp.float32), None)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2)
