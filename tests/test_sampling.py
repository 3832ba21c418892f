"""Sampling ops vs. numpy oracles of the reference algorithms
(utils/decoding_utils.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from scipy_free_oracles import np_ngram_ban, np_top_k_top_p
from gstx.ops.sampling import (
    NEG_INF,
    ngram_block,
    pad_after_eos,
    top_k_top_p_filter,
)


def _filtered_sets_equal(got, want):
    """Compare which tokens survive filtering and their surviving logits."""
    got_kept = got > NEG_INF / 2
    want_kept = np.isfinite(want)
    np.testing.assert_array_equal(got_kept, want_kept)
    np.testing.assert_allclose(
        np.where(got_kept, got, 0.0), np.where(want_kept, want, 0.0),
        rtol=1e-5, atol=1e-6)


def test_top_k():
    rng = np.random.RandomState(0)
    logits = rng.randn(4, 50).astype(np.float32)
    got = np.asarray(top_k_top_p_filter(jnp.asarray(logits), top_k=7))
    want = np_top_k_top_p(logits, top_k=7)
    _filtered_sets_equal(got, want)


def test_top_p():
    rng = np.random.RandomState(1)
    logits = (rng.randn(4, 50) * 3).astype(np.float32)
    got = np.asarray(top_k_top_p_filter(jnp.asarray(logits), top_p=0.9))
    want = np_top_k_top_p(logits, top_p=0.9)
    _filtered_sets_equal(got, want)


def test_top_k_then_top_p():
    rng = np.random.RandomState(2)
    logits = (rng.randn(8, 64) * 2).astype(np.float32)
    got = np.asarray(
        top_k_top_p_filter(jnp.asarray(logits), top_k=10, top_p=0.8))
    want = np_top_k_top_p(logits, top_k=10, top_p=0.8)
    _filtered_sets_equal(got, want)


def test_ngram_block_matches_dict_oracle():
    rng = np.random.RandomState(3)
    vocab, n = 30, 3
    b, s = 5, 40
    # small token alphabet -> plenty of repeated n-grams
    source = rng.randint(0, 12, size=(b, s)).astype(np.int32)
    for cur_len in [1, 2, 3, 5, 9]:
        dec = rng.randint(5, 12, size=(b, 19)).astype(np.int32)
        logits = rng.randn(b, vocab).astype(np.float32)
        got = np.asarray(ngram_block(
            jnp.asarray(logits), jnp.asarray(source), jnp.asarray(dec),
            cur_len, n))
        for i in range(b):
            banned = set(np_ngram_ban(source[i].tolist(),
                                      dec[i, :cur_len].tolist(), n))
            for t in range(vocab):
                if t in banned:
                    assert got[i, t] <= NEG_INF / 2, (i, t, cur_len)
                else:
                    assert got[i, t] == logits[i, t], (i, t, cur_len)


def test_ngram_block_excludes_special_tokens():
    # window containing a special token (0) never bans
    source = jnp.asarray([[7, 8, 0, 7, 8, 9, 1, 1]])
    dec = jnp.zeros((1, 19), jnp.int32).at[0, 0].set(7).at[0, 1].set(8)
    logits = jnp.zeros((1, 16))
    got = np.asarray(ngram_block(logits, source, dec, 2, 3))
    # (7,8,9) is a clean window -> 9 banned; (7,8,0) contains PAD -> 0 not banned
    assert got[0, 9] <= NEG_INF / 2
    assert got[0, 0] == 0.0


def test_pad_after_eos():
    seq = jnp.asarray([
        [5, 6, 102, 7, 102, 8],
        [5, 6, 7, 8, 9, 10],
        [102, 1, 2, 3, 4, 5],
    ])
    got = np.asarray(pad_after_eos(seq, eos_id=102, pad_id=0))
    np.testing.assert_array_equal(got[0], [5, 6, 102, 0, 0, 0])
    np.testing.assert_array_equal(got[1], [5, 6, 7, 8, 9, 10])
    np.testing.assert_array_equal(got[2], [102, 0, 0, 0, 0, 0])


def test_kth_largest_matches_lax_top_k():
    """The iterative kth-largest (fast path for small k on TPU — lax.top_k
    is sort-based and ~10x slower on a 30k vocab) must be EXACT, including
    duplicate values straddling the k-th position."""
    import jax.numpy as jnp
    from gstx.ops.sampling import _kth_largest, top_k_filter, NEG_INF

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(5, 1000).astype(np.float32))
    x = x.at[0, :10].set(3.14)          # duplicates at the top
    x = x.at[1, 500:504].set(x[1].max())
    for k in (1, 2, 7, 16):
        want_kth = jax.lax.top_k(x, k)[0][..., -1, None]
        np.testing.assert_array_equal(np.asarray(_kth_largest(x, k)),
                                      np.asarray(want_kth))
        want = jnp.where(x < want_kth, NEG_INF, x)
        np.testing.assert_array_equal(np.asarray(top_k_filter(x, k)),
                                      np.asarray(want))
    x3 = jnp.asarray(rng.randn(2, 3, 64).astype(np.float32))
    for k in (1, 5):
        want_kth = jax.lax.top_k(x3, k)[0][..., -1, None]
        np.testing.assert_array_equal(np.asarray(_kth_largest(x3, k)),
                                      np.asarray(want_kth))


def test_kth_largest_hier_matches_iterative():
    """The hierarchical kth-largest (1 full pass + per-block rounds) must be
    bit-identical to the iterative argmax version and lax.top_k, including
    duplicate values split across blocks and non-multiple-of-128 vocabs."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from gstx.ops.sampling import _kth_largest, _kth_largest_hier

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(5, 3001), jnp.float32)
    x = x.at[:, 200:207].set(x[:, :7])  # duplicates in another block
    for k in (1, 2, 7, 16):
        a = np.asarray(_kth_largest(x, k))
        b = np.asarray(_kth_largest_hier(x, k))
        c = np.asarray(jax.lax.top_k(x, k)[0][..., -1, None])
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(b, c)


def test_topk_hier_values_and_indices():
    """_topk_hier (the fused sampler's extraction) must return the exact
    lax.top_k values in descending order, with ties at the lowest index —
    including duplicates split across 128-lane blocks and a vocab that is
    not a multiple of the block size."""
    import jax
    import jax.numpy as jnp
    from gstx.ops.sampling import _topk_hier

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(6, 3001), jnp.float32)
    x = x.at[0, :5].set(2.5)            # tied maxima within one block
    x = x.at[1, 200:203].set(x[1].max())  # ties across blocks
    for k in (1, 2, 7, 16):
        vals, idx = _topk_hier(x, k)
        want_vals, want_idx = jax.lax.top_k(x, k)
        np.testing.assert_array_equal(np.asarray(vals),
                                      np.asarray(want_vals))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
        # indices really address the values
        np.testing.assert_array_equal(
            np.take_along_axis(np.asarray(x), np.asarray(idx), axis=-1),
            np.asarray(vals))


def test_sample_token_topk_distribution_equals_unfused():
    """The fused top-k sampler draws from EXACTLY the distribution of the
    unfused filter-then-categorical chain (no kth-value ties case): compare
    the analytic per-token probabilities, then sanity-check empirically."""
    import jax
    import jax.numpy as jnp
    from gstx.ops.sampling import (
        _topk_hier, sample_token_topk, top_k_filter)

    rng = np.random.RandomState(3)
    k, v = 7, 3001
    x = jnp.asarray(rng.randn(4, v), jnp.float32)

    # analytic: scatter softmax(top-k values) back to vocab order ==
    # softmax(filtered full row)
    p_unfused = np.asarray(jax.nn.softmax(top_k_filter(x, k), axis=-1))
    vals, idx = _topk_hier(x, k)
    p_k = np.asarray(jax.nn.softmax(vals, axis=-1))
    p_fused = np.zeros_like(p_unfused)
    np.put_along_axis(p_fused, np.asarray(idx), p_k, axis=-1)
    np.testing.assert_allclose(p_fused, p_unfused, atol=1e-6)

    # empirical: the fused draw only ever emits top-k tokens, with
    # frequencies near the analytic probabilities
    key = jax.random.PRNGKey(0)
    n = 8000
    draws = jax.vmap(lambda s: sample_token_topk(s, x, k))(
        jax.random.split(key, n))
    draws = np.asarray(draws)  # [n, 4]
    topk_sets = [set(np.asarray(idx)[b]) for b in range(4)]
    for b in range(4):
        assert set(draws[:, b]) <= topk_sets[b]
        freq = np.bincount(draws[:, b], minlength=v) / n
        np.testing.assert_allclose(freq, p_unfused[b], atol=0.03)
