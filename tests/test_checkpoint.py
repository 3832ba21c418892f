"""Checkpoint conversion tests: torch-name round trip, tying, and a
numerical pin of the fused-QKV concat order against the numpy oracle."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scipy_free_oracles import np_attention, np_layer_norm
from gstx.core.checkpoint import (
    convert_torch_state_dict,
    restore_checkpoint,
    save_checkpoint,
    to_torch_state_dict,
)
from gstx.models.encdec import GSTVisualDialog


@pytest.fixture(scope="module")
def tiny_model(tiny_configs):
    enc_cfg, dec_cfg = tiny_configs
    model = GSTVisualDialog(enc_cfg, dec_cfg)
    b, l, r, t = 2, 10, 5, 6
    batch = dict(
        input_ids=jnp.ones((b, l), jnp.int32),
        image_feat=jnp.ones((b, r, enc_cfg.v_feature_size)),
        image_loc=jnp.ones((b, r, 5)),
        token_type_ids=jnp.zeros((b, l), jnp.int32),
        attention_mask=jnp.ones((b, l), jnp.int32),
        image_attention_mask=jnp.ones((b, r), jnp.int32),
        dec_input_ids=jnp.ones((b, t), jnp.int32),
        dec_attention_mask=jnp.ones((b, t), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), **batch,
                        method=GSTVisualDialog.init_all)
    return model, params, batch, enc_cfg, dec_cfg


def test_torch_roundtrip(tiny_model):
    model, params, batch, enc_cfg, dec_cfg = tiny_model
    sd = to_torch_state_dict(params)
    back = convert_torch_state_dict(
        sd,
        num_text_layers=enc_cfg.num_hidden_layers,
        num_visual_layers=enc_cfg.v_num_hidden_layers,
        num_co_layers=len(enc_cfg.v_biattention_id),
        num_dec_layers=dec_cfg.num_hidden_layers)
    flat_orig = jax.tree_util.tree_leaves_with_path(params["params"])
    flat_back = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    orig = dict(flat_orig)
    assert set(orig.keys()) == set(flat_back.keys()), (
        set(orig) ^ set(flat_back))
    for k, v in orig.items():
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat_back[k]),
                                   err_msg=str(k))


def test_roundtrip_preserves_model_output(tiny_model):
    model, params, batch, enc_cfg, dec_cfg = tiny_model
    sd = to_torch_state_dict(params)
    back = {"params": convert_torch_state_dict(
        sd, enc_cfg.num_hidden_layers, enc_cfg.v_num_hidden_layers,
        len(enc_cfg.v_biattention_id), dec_cfg.num_hidden_layers)}
    a = model.apply(params, **batch, method=GSTVisualDialog.score)
    b = model.apply(back, **batch, method=GSTVisualDialog.score)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-6)


def test_encoder_only_prefix(tiny_model):
    """Encoder-only checkpoints use the 'bert_pretrained.' prefix
    (train_disc.py:203-210 semantics)."""
    model, params, batch, enc_cfg, dec_cfg = tiny_model
    sd = to_torch_state_dict(params, with_decoder=False,
                             enc_prefix="bert_pretrained")
    back = convert_torch_state_dict(
        sd, enc_cfg.num_hidden_layers, enc_cfg.v_num_hidden_layers,
        len(enc_cfg.v_biattention_id), dec_cfg.num_hidden_layers)
    assert "decoder" not in back
    assert "encoder" in back and "cls" in back


def test_qkv_concat_order_numerical():
    """Convert separate torch Q/K/V matrices and verify the fused projection
    reproduces oracle attention with those exact matrices."""
    rng = np.random.RandomState(0)
    d, heads = 8, 2
    x = rng.randn(1, 5, d).astype(np.float32)
    wq, wk, wv = (rng.randn(d, d).astype(np.float32) for _ in range(3))
    bq, bk, bv = (rng.randn(d).astype(np.float32) for _ in range(3))

    from gstx.core.checkpoint import _qkv_kernel
    sd = {"a.query.weight": wq, "a.key.weight": wk, "a.value.weight": wv,
          "a.query.bias": bq, "a.key.bias": bk, "a.value.bias": bv}
    kernel, bias = _qkv_kernel(sd, "a")

    from gstx.models.layers import attend, split_heads, merge_heads
    qkv = x @ kernel + bias
    q, k, v = np.split(qkv, 3, axis=-1)
    got = np.asarray(attend(
        jnp.asarray(split_heads(jnp.asarray(q), heads)),
        jnp.asarray(split_heads(jnp.asarray(k), heads)),
        jnp.asarray(split_heads(jnp.asarray(v), heads)), None))

    def heads_split(t):
        return t.reshape(1, 5, heads, d // heads).transpose(0, 2, 1, 3)

    # torch Linear: y = x @ W^T + b
    want = np_attention(heads_split(x @ wq.T + bq), heads_split(x @ wk.T + bk),
                        heads_split(x @ wv.T + bv), None)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_orbax_save_restore(tiny_model, tmp_path):
    model, params, batch, *_ = tiny_model
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params, step=7)
    restored = restore_checkpoint(path)
    assert int(restored["step"]) == 7
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_save_restore_tensor_parallel_sharded(tiny_model, tmp_path):
    """Checkpoint/resume under Megatron TP: saving a (4 data x 2 model)
    shard_by_path-placed tree (orbax gathers the distributed leaves) and
    restoring must be value-identical to the unsharded tree — resumes
    work across different mesh shapes."""
    from gstx.core.mesh import make_mesh, shard_by_path

    model, params, batch, *_ = tiny_model
    mesh = make_mesh(4, 2)
    sharded = shard_by_path(mesh, params)
    path = str(tmp_path / "ckpt_tp")
    save_checkpoint(path, sharded, step=11)
    restored = restore_checkpoint(path)
    assert int(restored["step"]) == 11
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(restored["params"])):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bare_bert_prefix(tiny_model):
    """A raw BertForMultiModalPreTraining state dict ('bert.*' + top-level
    'cls.*', the third flavor convert_torch_state_dict supports) converts:
    the cls head must resolve to 'cls', not 'bert.cls'."""
    model, params, batch, enc_cfg, dec_cfg = tiny_model
    sd = to_torch_state_dict(params, with_decoder=False,
                             enc_prefix="bert_pretrained")
    bare = {k[len("bert_pretrained."):]: v for k, v in sd.items()}
    assert any(k.startswith("bert.") for k in bare)
    assert any(k.startswith("cls.") for k in bare)
    back = convert_torch_state_dict(
        bare, enc_cfg.num_hidden_layers, enc_cfg.v_num_hidden_layers,
        len(enc_cfg.v_biattention_id), dec_cfg.num_hidden_layers)
    assert "encoder" in back and "cls" in back


def test_interrupted_swap_recovers_previous(tiny_model, tmp_path):
    """A kill inside save_checkpoint's swap never loses the previous
    checkpoint: at every instant `path` or `path.old` is complete, and
    restore_checkpoint falls back to .old."""
    import os
    import shutil

    model, params, batch, enc_cfg, dec_cfg = tiny_model
    path = str(tmp_path / "ck")
    save_checkpoint(path, params, step=1)
    # emulate the widest kill window: old checkpoint moved aside, the new
    # one not yet swapped in (save died right before os.replace(tmp, path))
    os.replace(path, path + ".old")
    restored = restore_checkpoint(path)
    assert int(restored["step"]) == 1
    # the next save cleans up and lands normally
    shutil.rmtree(path + ".old")
    save_checkpoint(path, params, step=2)
    assert not os.path.isdir(path + ".old")
    assert not os.path.isdir(path + ".tmp")
    assert int(restore_checkpoint(path)["step"]) == 2
