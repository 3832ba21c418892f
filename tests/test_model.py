"""Model-level tests: shapes, embedding extension-table semantics, weight
tying, and the KV-cache equivalence that guards the decode path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gstx.core.config import CLS_ID, PAD_ID, SEP_ID
from gstx.decode.sampler import init_cache
from gstx.models.encdec import (
    GSTVisualDialog,
    candidate_log_likelihood,
    derive_labels_and_inputs,
    teacher_forced_loss,
    teacher_forced_nll,
)


@pytest.fixture(scope="module")
def model_and_params(tiny_configs):
    enc_cfg, dec_cfg = tiny_configs
    model = GSTVisualDialog(enc_cfg, dec_cfg)
    rng = jax.random.PRNGKey(0)
    b, l, r, t = 2, 12, 5, 7
    batch = dict(
        input_ids=jnp.ones((b, l), jnp.int32),
        image_feat=jnp.ones((b, r, enc_cfg.v_feature_size)),
        image_loc=jnp.ones((b, r, 5)),
        token_type_ids=jnp.zeros((b, l), jnp.int32),
        attention_mask=jnp.ones((b, l), jnp.int32),
        image_attention_mask=jnp.ones((b, r), jnp.int32),
        dec_input_ids=jnp.ones((b, t), jnp.int32),
        dec_attention_mask=jnp.ones((b, t), jnp.int32),
    )
    params = model.init(rng, **batch, method=GSTVisualDialog.init_all)
    return model, params, batch


def test_score_shapes(model_and_params, tiny_configs):
    enc_cfg, dec_cfg = tiny_configs
    model, params, batch = model_and_params
    logits = model.apply(params, **batch, method=GSTVisualDialog.score)
    b, t = batch["dec_input_ids"].shape
    assert logits.shape == (b, t, dec_cfg.vocab_size)
    assert logits.dtype == jnp.float32


def test_pretrain_scores_shapes(model_and_params, tiny_configs):
    enc_cfg, _ = tiny_configs
    model, params, batch = model_and_params
    pred_t, pred_v, nsp = model.apply(
        params,
        batch["input_ids"], batch["image_feat"], batch["image_loc"],
        batch["token_type_ids"], batch["attention_mask"],
        batch["image_attention_mask"],
        method=GSTVisualDialog.pretrain_scores)
    b, l = batch["input_ids"].shape
    r = batch["image_feat"].shape[1]
    assert pred_t.shape == (b, l, enc_cfg.vocab_size)
    assert pred_v.shape == (b, r, enc_cfg.v_target_size)
    assert nsp.shape == (b, 2)


def test_segment_extension_table(tiny_configs):
    """Segment ids >= type_vocab_size must hit the extension table
    (vilbert_dialog.py:334-347)."""
    enc_cfg, dec_cfg = tiny_configs
    from gstx.models.embeddings import DialogEmbeddings

    emb = DialogEmbeddings(enc_cfg)
    ids = jnp.asarray([[1, 2, 3]])
    params = emb.init(jax.random.PRNGKey(0), ids)
    base = emb.apply(params, ids, token_type_ids=jnp.asarray([[0, 1, 0]]))
    ext = emb.apply(params, ids, token_type_ids=jnp.asarray([[2, 3, 11]]))
    # extension rows differ from base rows
    assert not np.allclose(np.asarray(base), np.asarray(ext))

    # manual check: seg id 2 uses extension row 0
    p = params["params"]
    table_ext = np.asarray(p["token_type_embeddings_extension"]["embedding"])
    word = np.asarray(p["word_embeddings"]["embedding"])
    pose = np.asarray(p["position_embeddings"]["embedding"])
    raw = word[1] + pose[0] + table_ext[0]
    from scipy_free_oracles import np_layer_norm
    want = np_layer_norm(raw, np.asarray(p["ln"]["scale"]),
                         np.asarray(p["ln"]["bias"]))
    np.testing.assert_allclose(np.asarray(ext)[0, 0], want, rtol=2e-5,
                               atol=2e-5)


def test_word_embedding_tying(model_and_params):
    """Encoder word embeddings == decoder INPUT embeddings == MLM-head
    projection: ONE parameter (train_gen.py:293).  The decoder LM head is a
    separate lm_weight by design — see GSTDecoderModel.setup."""
    model, params, _ = model_and_params
    flat = jax.tree_util.tree_leaves_with_path(params)
    word_tables = [p for p, _ in flat if any(
        getattr(k, "key", None) == "word_embeddings" for k in p)]
    assert len(word_tables) == 1


def test_kv_cache_matches_full_forward(model_and_params, tiny_configs):
    """Step-by-step cached decoding must reproduce the cache-less
    teacher-forced logits exactly (the reference decodes cache-less,
    config/..._dec.json:25; our cache must not change the math)."""
    enc_cfg, dec_cfg = tiny_configs
    model, params, batch = model_and_params
    b = batch["input_ids"].shape[0]
    t = 6
    rng = np.random.RandomState(0)
    dec_ids = jnp.asarray(
        np.concatenate([np.full((b, 1), CLS_ID),
                        rng.randint(1, 100, size=(b, t - 1))], axis=1),
        dtype=jnp.int32)

    # full teacher-forced pass (all-ones mask = decode-mode mask,
    # visual_dialog_model.py:89 passes attention_mask=None)
    full_logits = model.apply(
        params, batch["input_ids"], batch["image_feat"], batch["image_loc"],
        batch["token_type_ids"], batch["attention_mask"],
        batch["image_attention_mask"], dec_ids,
        jnp.ones((b, t), jnp.int32),
        method=GSTVisualDialog.score)

    # cached stepping
    mem_kv, mem_mask = model.apply(
        params, batch["input_ids"], batch["image_feat"], batch["image_loc"],
        batch["token_type_ids"], batch["attention_mask"],
        batch["image_attention_mask"],
        method=GSTVisualDialog.decode_prepare)
    caches = init_cache(dec_cfg, b, t)
    step_logits = []
    for pos in range(t):
        logit, caches = model.apply(
            params, dec_ids[:, pos:pos + 1], pos, caches, mem_kv, mem_mask,
            method=GSTVisualDialog.decode_step)
        step_logits.append(np.asarray(logit))
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits),
                               rtol=1e-4, atol=1e-4)


def test_teacher_forced_loss_semantics():
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 4, 9),
                         dtype=jnp.float32)
    labels = jnp.asarray([[3, 5, 0, 0], [1, 0, 0, 0]])
    nll = np.asarray(teacher_forced_nll(logits, labels))
    assert (nll[0, 2:] == 0).all() and (nll[1, 1:] == 0).all()
    loss = float(teacher_forced_loss(logits, labels))
    np.testing.assert_allclose(loss, nll.sum() / 3, rtol=1e-6)


def test_derive_labels_and_inputs():
    dec = jnp.asarray([[CLS_ID, 7, 8, SEP_ID, 0]])
    labels, inputs = derive_labels_and_inputs(dec, SEP_ID, PAD_ID)
    np.testing.assert_array_equal(np.asarray(labels)[0], [7, 8, SEP_ID, 0, 0])
    np.testing.assert_array_equal(np.asarray(inputs)[0], [CLS_ID, 7, 8, 0, 0])


def test_candidate_log_likelihood_ignores_pads():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(1, 4, 9), dtype=jnp.float32)
    dec = jnp.asarray([[CLS_ID % 9, 3, 5, 0]])
    score = float(candidate_log_likelihood(logits, dec)[0])
    logp = np.asarray(jax.nn.log_softmax(logits, -1))[0]
    want = logp[0, 3] + logp[1, 5]
    np.testing.assert_allclose(score, want, rtol=1e-5)


def test_fixed_layer_prefixes_stop_gradients(tiny_configs):
    """fixed_t_layer / fixed_v_layer freeze prefix layers under stop_gradient
    (reference no_grad blocks, vilbert_dialog.py:839-858)."""
    import dataclasses

    enc_cfg, dec_cfg = tiny_configs
    enc_cfg = dataclasses.replace(enc_cfg, fixed_t_layer=2, fixed_v_layer=1)
    model = GSTVisualDialog(enc_cfg, dec_cfg)
    b, l, r, t = 2, 8, 4, 5
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

    def loss(p):
        logits = model.apply(p, **batch, method=GSTVisualDialog.score)
        return jnp.sum(logits ** 2) * 1e-6

    grads = jax.grad(loss)(params)["params"]["encoder"]["encoder"]

    def norm(tree):
        return sum(float(jnp.abs(x).sum())
                   for x in jax.tree_util.tree_leaves(tree))

    # frozen prefixes: zero grads; later layers: nonzero
    assert norm(grads["layer_0"]) == 0.0
    assert norm(grads["layer_1"]) == 0.0
    assert norm(grads["layer_2"]) > 0.0
    assert norm(grads["v_layer_0"]) == 0.0
    assert norm(grads["v_layer_1"]) > 0.0
