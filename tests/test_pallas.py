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


def test_quant_decode_attention_matches_jnp():
    """Decode-step int8 cross-attention kernel (interpret mode) == the jnp
    scale-folded formula in gstx.models.decoder._quant_cross_attend."""
    import jax
    from gstx.kernels.decode_attn import quant_decode_attention

    rng = np.random.RandomState(3)
    B, H, M, dh = 3, 4, 37, 16
    q = jnp.asarray(rng.randn(B, H, 1, dh), jnp.float32)
    k_i8 = jnp.asarray(rng.randint(-127, 128, (B, H, M, dh)), jnp.int8)
    v_i8 = jnp.asarray(rng.randint(-127, 128, (B, H, M, dh)), jnp.int8)
    binm = (np.arange(M)[None, :] < 30).astype(np.float32)
    mask = jnp.asarray(((1.0 - binm) * -10000.0)[:, None, None, :]
                       * np.ones((B, 1, 1, 1), np.float32))

    got = np.asarray(quant_decode_attention(q, k_i8, v_i8, mask,
                                            interpret=True))

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k_i8.astype(jnp.float32),
                        preferred_element_type=jnp.float32) + mask
    probs = jax.nn.softmax(scores, axis=-1)
    want = jnp.einsum("bhqk,bhkd->bhqd", probs, v_i8.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    # summation-order noise on O(100)-magnitude int8 dots: relative 1e-4
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=5e-3)


def test_quant_decode_attention_no_mask():
    from gstx.kernels.decode_attn import quant_decode_attention

    rng = np.random.RandomState(4)
    B, H, M, dh = 2, 2, 8, 8
    q = jnp.asarray(rng.randn(B, H, 1, dh), jnp.float32)
    k_i8 = jnp.asarray(rng.randint(-127, 128, (B, H, M, dh)), jnp.int8)
    v_i8 = jnp.asarray(rng.randint(-127, 128, (B, H, M, dh)), jnp.int8)
    out = np.asarray(quant_decode_attention(q, k_i8, v_i8, None,
                                            interpret=True))
    assert out.shape == (B, H, 1, dh)
    assert np.isfinite(out).all()


def test_erf_impl_accuracy():
    """All selectable in-kernel erf variants stay sub-bf16-accurate vs the
    true erf over the GELU-relevant range."""
    import math
    from gstx.kernels.ffn import _erf_as7125, _erf_as7126, _erf_poly

    x = jnp.asarray(np.linspace(-6, 6, 4001), jnp.float32)
    want = np.asarray([math.erf(float(v)) for v in np.asarray(x)])
    for fn, bound in ((_erf_as7126, 1e-6), (_erf_as7125, 3e-5),
                      (_erf_poly, 1e-4)):
        err = np.abs(np.asarray(fn(x)) - want).max()
        assert err < bound, (fn.__name__, err)
