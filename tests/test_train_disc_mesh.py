"""Mesh-sharded discriminative training (reference ``train_disc.py:251``
wraps the encoder in nn.DataParallel; gstx's SPMD equivalent shards the
disc train step over the ('data', 'model') mesh).

Pinned: the (4,1) DP and (2,2) DP x Megatron-TP disc steps produce the
same loss and updated params as the single-device step — the in-jit
random-permutation row sampling (train_disc.py:54-55 semantics) and the
3-loss encoder-only forward stay SPMD-clean.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import make_tokenizer, make_visdial_env
from gstx.core.mesh import batch_sharding, make_mesh, shard_by_path
from gstx.data.loader import DataLoader, collate
from gstx.data.visdial import VisdialDiscDataset
from gstx.models.encdec import GSTVisualDialog
from gstx.train.optim import make_optimizer
from gstx.train.train_disc import make_disc_train_step


@pytest.fixture(scope="module")
def disc_env(tmp_path_factory, tiny_configs):
    tmpdir = str(tmp_path_factory.mktemp("disc_mesh"))
    cfg = make_visdial_env(tmpdir)
    cfg = cfg.replace(batch_size=4, lr=1e-3, image_lr=1e-3, min_lr=1e-6,
                      warmup_steps=1, mask_prob=0.15)
    tok = make_tokenizer()
    enc_cfg, dec_cfg = tiny_configs
    enc_cfg = dataclasses.replace(enc_cfg, vocab_size=256)
    dec_cfg = dataclasses.replace(dec_cfg, vocab_size=256)
    ds = VisdialDiscDataset(cfg, tok, mode="vd_train")
    # leading (image) dim divisible by every tested data axis
    items = [ds.__getitem__(i % len(ds), seed=i) for i in range(8)]
    batch = collate(items)

    model = GSTVisualDialog(enc_cfg, dec_cfg)
    b, l, r, t = 2, cfg.max_seq_len, cfg.max_regions, cfg.max_utt_len
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
    # host copies: the disc step donates params/opt_state buffers
    return cfg, enc_cfg, dec_cfg, batch, jax.device_get(params)


def _run_disc_step(disc_env, data_par, model_par):
    cfg, enc_cfg, dec_cfg, batch, params = disc_env
    n = data_par * model_par
    mesh = make_mesh(data_par, model_par, devices=jax.devices()[:n])
    model = GSTVisualDialog(enc_cfg, dec_cfg, mesh=mesh)
    optimizer = make_optimizer(cfg.lr, cfg.image_lr, cfg.warmup_steps, 1000,
                               cfg.min_lr)
    sh_params = shard_by_path(mesh, params)
    opt_state = shard_by_path(mesh, optimizer.init(sh_params))
    step = make_disc_train_step(model, optimizer, cfg)
    bsh = batch_sharding(mesh)
    dev_batch = {k: jax.device_put(jnp.asarray(v), bsh)
                 for k, v in batch.items()}
    with mesh:
        p, _, metrics = step(sh_params, opt_state, dev_batch,
                             jax.random.PRNGKey(3))
    return {k: float(v) for k, v in metrics.items()}, jax.device_get(p)


@pytest.mark.slow
@pytest.mark.parametrize("dp,mp", [(4, 1), (8, 1), (2, 2)])
def test_disc_step_mesh_matches_single(disc_env, dp, mp):
    metrics_1, params_1 = _run_disc_step(disc_env, 1, 1)
    metrics_m, params_m = _run_disc_step(disc_env, dp, mp)
    for k in ("loss", "lm_loss", "img_loss", "nsp_loss"):
        np.testing.assert_allclose(metrics_m[k], metrics_1[k],
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    flat_1 = jax.tree_util.tree_leaves_with_path(params_1)
    flat_m = {p: l for p, l in
              jax.tree_util.tree_leaves_with_path(params_m)}
    for path, leaf in flat_1:
        np.testing.assert_allclose(
            np.asarray(flat_m[path]), np.asarray(leaf),
            rtol=2e-5, atol=2e-6, err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_cli_train_disc_mesh_steps(tmp_path):
    """The real CLI drives the meshed disc trainer: -data_parallel 2
    -model_parallel 2 over the 8-device backend."""
    from fixtures import make_cli_env
    from gstx.cli.train_disc import main

    args, cfg = make_cli_env(str(tmp_path))
    params, opt_state = main(
        args + ["-mode", "vd_train", "-model", "enc_only_a",
                "-batch_size", "4", "-num_epochs", "1", "-log_every", "1",
                "-data_parallel", "2", "-model_parallel", "2"],
        max_steps=2)
    assert params is not None
    # params ended sharded over the (2,2) mesh
    leaf = params["params"]["encoder"]["embeddings"][
        "word_embeddings"]["embedding"]
    assert len(leaf.sharding.device_set) == 4
