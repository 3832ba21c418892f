"""End-to-end evaluation slice (SURVEY.md §7 step 4 milestone): fixture
data -> dataset -> loader -> tiny model -> ranking -> metrics."""

import numpy as np
import jax
import pytest

from fixtures import make_tokenizer, make_visdial_env
from gstx.data.loader import DataLoader
from gstx.data.visdial import VisdialDiscDataset, VisdialGenDataset
from gstx.eval.rank_disc import evaluate_disc
from gstx.eval.rank_gen import evaluate_gen
from gstx.models.encdec import GSTVisualDialog


@pytest.fixture(scope="module")
def env(tmp_path_factory, tiny_configs):
    tmpdir = str(tmp_path_factory.mktemp("e2e"))
    cfg = make_visdial_env(tmpdir)
    tok = make_tokenizer()
    import dataclasses
    enc_cfg, dec_cfg = tiny_configs
    enc_cfg = dataclasses.replace(enc_cfg, vocab_size=256)
    dec_cfg = dataclasses.replace(dec_cfg, vocab_size=256)
    model = GSTVisualDialog(enc_cfg, dec_cfg)
    b, l, r, t = 2, cfg.max_seq_len, cfg.max_regions, cfg.max_utt_len
    import jax.numpy as jnp
    init_batch = dict(
        input_ids=jnp.ones((b, l), jnp.int32),
        image_feat=jnp.ones((b, r, enc_cfg.v_feature_size)),
        image_loc=jnp.ones((b, r, 5)),
        token_type_ids=jnp.zeros((b, l), jnp.int32),
        attention_mask=jnp.ones((b, l), jnp.int32),
        image_attention_mask=jnp.ones((b, r), jnp.int32),
        dec_input_ids=jnp.ones((b, t), jnp.int32),
        dec_attention_mask=jnp.ones((b, t), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), **init_batch,
                        method=GSTVisualDialog.init_all)
    return cfg, tok, model, params


def test_generative_eval_end_to_end(env):
    cfg, tok, model, params = env
    ds = VisdialGenDataset(cfg, tok, mode="vd_eval_val")
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    metrics = evaluate_gen(model, params, dl.epoch(0), mode="vd_eval_val",
                           chunk_size=50)
    for key in ("r@1", "r@5", "r@10", "mean", "mrr", "ndcg"):
        assert key in metrics, metrics
    assert 0.0 <= metrics["mrr"] <= 1.0
    assert 0.0 <= metrics["ndcg"] <= 1.0
    assert 1.0 <= metrics["mean"] <= cfg.num_options


def test_generative_eval_test_mode(env):
    cfg, tok, model, params = env
    import dataclasses
    cfg100 = cfg.replace(num_options=100)
    ds = VisdialGenDataset(cfg100, tok, mode="vd_eval_test")
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1,
                    drop_last=False)
    ranks_json = evaluate_gen(model, params, dl.epoch(0),
                              mode="vd_eval_test", chunk_size=100)
    assert len(ranks_json) == len(ds)
    first = ranks_json[0]
    assert set(first) == {"image_id", "round_id", "ranks"}
    assert sorted(first["ranks"]) == list(range(1, 101))


def test_discriminative_eval_end_to_end(env):
    cfg, tok, model, params = env
    ds = VisdialDiscDataset(cfg, tok, mode="vd_eval_val")
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    metrics = evaluate_disc(model, params, dl.epoch(0), mode="vd_eval_val",
                            chunk_size=50)
    assert "ndcg" in metrics and "mrr" in metrics
    assert 0.0 <= metrics["ndcg"] <= 1.0


def test_generative_eval_sharded_over_mesh(env):
    """DP evaluation: the chunk axis shards over the 8-device CPU mesh and
    produces the same metrics as the single-device path."""
    from gstx.core.mesh import make_mesh

    cfg, tok, model, params = env
    ds = VisdialGenDataset(cfg, tok, mode="vd_eval_val")
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    single = evaluate_gen(model, params, dl.epoch(0), mode="vd_eval_val",
                          chunk_size=40)
    mesh = make_mesh()  # 8 x 1
    sharded = evaluate_gen(model, params, dl.epoch(0), mode="vd_eval_val",
                           chunk_size=40, mesh=mesh)
    for k in single:
        np.testing.assert_allclose(sharded[k], single[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)


def test_disc_eval_sharded_over_mesh(env):
    from gstx.core.mesh import make_mesh

    cfg, tok, model, params = env
    ds = VisdialDiscDataset(cfg, tok, mode="vd_eval_val")
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    single = evaluate_disc(model, params, dl.epoch(0), mode="vd_eval_val",
                           chunk_size=50)
    sharded = evaluate_disc(model, params, dl.epoch(0), mode="vd_eval_val",
                            chunk_size=50, mesh=make_mesh())
    for k in single:
        np.testing.assert_allclose(sharded[k], single[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)


@pytest.mark.slow
def test_generative_eval_tensor_parallel(env):
    """(4 data x 2 model) evaluation == single-device: params place
    Megatron-TP via shard_by_path inside evaluate_gen and the candidate
    chunks shard over 'data' simultaneously."""
    from gstx.core.mesh import make_mesh

    cfg, tok, model, params = env
    ds = VisdialGenDataset(cfg, tok, mode="vd_eval_val")
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    single = evaluate_gen(model, params, dl.epoch(0), mode="vd_eval_val",
                          chunk_size=40)
    tp = evaluate_gen(model, params, dl.epoch(0), mode="vd_eval_val",
                      chunk_size=40, mesh=make_mesh(4, 2))
    for k in single:
        np.testing.assert_allclose(tp[k], single[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)


@pytest.mark.slow
def test_disc_eval_tensor_parallel(env):
    """(4 data x 2 model) NSP-ranking evaluation == single-device."""
    from gstx.core.mesh import make_mesh

    cfg, tok, model, params = env
    ds = VisdialDiscDataset(cfg, tok, mode="vd_eval_val")
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    single = evaluate_disc(model, params, dl.epoch(0), mode="vd_eval_val",
                           chunk_size=50)
    tp = evaluate_disc(model, params, dl.epoch(0), mode="vd_eval_val",
                       chunk_size=50, mesh=make_mesh(4, 2))
    for k in single:
        np.testing.assert_allclose(tp[k], single[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)
