"""PDense / PLayerNorm must stay drop-in equivalent to nn.Dense /
nn.LayerNorm: identical param trees, identical init values (same RNG
path derivation), matching outputs.  The checkpoint converter and the
torch parity suite depend on this equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from gstx.models.layers import PDense, PLayerNorm, dense, layer_norm


def test_pdense_matches_nn_dense():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 24), jnp.float32)
    ref = dense(16, jnp.float32, "proj")
    twin = PDense(16, 24, jnp.float32, name="proj")
    pr = ref.init(jax.random.PRNGKey(3), x)
    pt = twin.init(jax.random.PRNGKey(3), x)
    assert jax.tree_util.tree_structure(pr) == jax.tree_util.tree_structure(pt)
    for a, b in zip(jax.tree_util.tree_leaves(pr),
                    jax.tree_util.tree_leaves(pt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(ref.apply(pr, x)), np.asarray(twin.apply(pr, x)),
        rtol=1e-6, atol=1e-6)


def test_playernorm_matches_nn_layernorm():
    x = jnp.asarray(np.random.RandomState(1).randn(4, 24) * 3, jnp.float32)
    ref = layer_norm(eps=1e-12, dtype=jnp.float32, name="ln")
    twin = PLayerNorm(24, eps=1e-12, dtype=jnp.float32, name="ln")
    pr = ref.init(jax.random.PRNGKey(0), x)
    pt = twin.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(pr) == jax.tree_util.tree_structure(pt)
    # non-trivial scale/bias to exercise the affine part
    pr = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(
            np.random.RandomState(2).rand(*a.shape), a.dtype) * 0.3, pr)
    np.testing.assert_allclose(
        np.asarray(ref.apply(pr, x)), np.asarray(twin.apply(pr, x)),
        rtol=1e-5, atol=1e-5)


def test_pdense_bf16_promotion_matches():
    x = jnp.asarray(np.random.RandomState(2).randn(4, 24), jnp.bfloat16)
    ref = dense(16, jnp.bfloat16, "proj")
    twin = PDense(16, 24, jnp.bfloat16, name="proj")
    p = ref.init(jax.random.PRNGKey(5), x.astype(jnp.float32))
    a = np.asarray(ref.apply(p, x), np.float32)
    b = np.asarray(twin.apply(p, x), np.float32)
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
    assert twin.apply(p, x).dtype == jnp.bfloat16
