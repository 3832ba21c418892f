"""Numerical oracle tests for the transformer building blocks: every block is
checked against an independent NumPy implementation of the reference math
(reference models/vilbert_dialog.py:283-476)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy_free_oracles import (
    np_attention,
    np_gelu,
    np_layer_norm,
    np_softmax,
)

from gstx.models.layers import (
    TransformerLayer,
    additive_mask,
    attend,
    causal_additive_mask,
    gelu,
    split_heads,
)


def test_gelu_matches_erf_formula():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    got = np.asarray(gelu(jnp.asarray(x)))
    np.testing.assert_allclose(got, np_gelu(x), rtol=1e-6, atol=1e-6)


def test_additive_mask_values():
    m = jnp.asarray([[1, 1, 0], [1, 0, 0]])
    am = np.asarray(additive_mask(m))
    assert am.shape == (2, 1, 1, 3)
    np.testing.assert_array_equal(am[0, 0, 0], [0.0, 0.0, -10000.0])
    np.testing.assert_array_equal(am[1, 0, 0], [0.0, -10000.0, -10000.0])


def test_causal_mask_combines_padding():
    m = jnp.asarray([[1, 1, 1, 0]])
    cm = np.asarray(causal_additive_mask(m))[0, 0]
    # row i can see columns j <= i that are not padding
    expected_visible = np.array([
        [1, 0, 0, 0],
        [1, 1, 0, 0],
        [1, 1, 1, 0],
        [1, 1, 1, 0],
    ])
    np.testing.assert_array_equal((cm == 0.0).astype(int), expected_visible)


def test_attend_matches_numpy_reference():
    rng = np.random.RandomState(0)
    b, h, lq, lk, dh = 2, 3, 5, 7, 4
    q = rng.randn(b, h, lq, dh).astype(np.float32)
    k = rng.randn(b, h, lk, dh).astype(np.float32)
    v = rng.randn(b, h, lk, dh).astype(np.float32)
    mask = np.where(rng.rand(b, 1, 1, lk) > 0.3, 0.0, -10000.0).astype(np.float32)
    got = np.asarray(attend(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(mask)))
    want = np_attention(q, k, v, mask)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_transformer_layer_matches_numpy_reference():
    """One full post-LN BERT layer vs. an independent numpy implementation
    assembled from the converted flax parameters."""
    rng = np.random.RandomState(1)
    b, l, d, heads, inter = 2, 6, 16, 4, 32
    layer = TransformerLayer(num_heads=heads, head_dim=d // heads,
                             intermediate_size=inter,
                             attn_dropout=0.0, hidden_dropout=0.0)
    x = rng.randn(b, l, d).astype(np.float32)
    mask_binary = (rng.rand(b, l) > 0.2).astype(np.float32)
    am = np.asarray(additive_mask(jnp.asarray(mask_binary)))
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(am))
    got = np.asarray(layer.apply(params, jnp.asarray(x), jnp.asarray(am)))

    p = jax.tree_util.tree_map(np.asarray, params)["params"]
    qkv_w, qkv_b = p["attention"]["qkv"]["kernel"], p["attention"]["qkv"]["bias"]
    qkv = x @ qkv_w + qkv_b
    q, k, v = np.split(qkv, 3, axis=-1)

    def heads_split(t):
        return t.reshape(b, l, heads, d // heads).transpose(0, 2, 1, 3)

    ctx = np_attention(heads_split(q), heads_split(k), heads_split(v), am)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)
    attn_out = ctx @ p["attention"]["out"]["kernel"] + p["attention"]["out"]["bias"]
    h = np_layer_norm(attn_out + x,
                      p["attention"]["out_ln"]["scale"],
                      p["attention"]["out_ln"]["bias"])
    ffn = np_gelu(h @ p["ffn"]["intermediate"]["kernel"] +
                  p["ffn"]["intermediate"]["bias"])
    ffn = ffn @ p["ffn"]["output"]["kernel"] + p["ffn"]["output"]["bias"]
    want = np_layer_norm(ffn + h,
                         p["ffn"]["output_ln"]["scale"],
                         p["ffn"]["output_ln"]["bias"])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
