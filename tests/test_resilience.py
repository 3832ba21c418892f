"""Failure recovery / orchestration tests: checkpoint-resume of the train
loop, self-train plan, v0.9 dataset paths."""

import json
import os

import numpy as np
import pytest

from fixtures import make_cli_env, make_visdial_json


@pytest.mark.slow
def test_train_resume_from_checkpoint(tmp_path):
    """Train 2 steps -> checkpoint -> resume with -continue: step counter
    and params restore (train_gen.py:252-279 semantics)."""
    import jax

    from gstx.cli.common import build_model, init_params
    from gstx.core.checkpoint import restore_checkpoint, save_checkpoint
    from gstx.train.train_gen import load_start_checkpoint

    args, cfg = make_cli_env(str(tmp_path))
    model, enc_cfg, dec_cfg = build_model(cfg)
    params = init_params(model, cfg, seed=0)

    from gstx.train.optim import make_optimizer

    optimizer = make_optimizer(cfg.lr, cfg.image_lr, 10, 1000)
    opt_state = optimizer.init(params)
    ckpt = os.path.join(str(tmp_path), "vd_train__3.ckpt")
    save_checkpoint(ckpt, params, opt_state, step=37)

    cfg2 = cfg.replace(start_path=ckpt, continue_training=True,
                       mode="vd_train")
    p2, o2, start_iter, exact = load_start_checkpoint(cfg2, params,
                                                      opt_state)
    assert start_iter == 37
    assert not exact  # epoch-named ckpt: its stored iteration is replayed
    leaves1 = jax.tree_util.tree_leaves(params)
    leaves2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # warm start (no -continue): only encoder/cls subtrees transfer
    cfg3 = cfg.replace(start_path=ckpt, continue_training=False)
    p3, _, start3, _ = load_start_checkpoint(cfg3, params, opt_state)
    assert start3 == 0
    assert "decoder" in p3["params"]


def test_selftrain_plan(tmp_path):
    from gstx.cli.selftrain import main

    plan = main([
        "-iterations", "2", "-chunks", "3",
        "-start_path_q", "q.ckpt", "-start_path_a", "a.ckpt",
        "-cc12m_image_feats", "/feats", "-cc12m_caption_dir", "/caps",
        "-dialog_root", "/dialogs", "-save_path", "/out",
    ], dry_run=True)
    # 2 iterations x (3 generate + 1 student + 1 finetune) stages
    assert len(plan) == 2 * (3 + 2)
    gen_stages = [s for s in plan if s[0] == "gstx.cli.generate"]
    assert len(gen_stages) == 6
    # iteration 2's generate uses iteration 1's finetuned student as teacher
    it2_gen = gen_stages[3]
    a_idx = it2_gen.index("-start_path_a") + 1
    assert it2_gen[a_idx] == "/out/finetune_iter1/final.ckpt"
    train_stages = [s for s in plan if s[0] == "gstx.cli.train_gen"]
    assert any("-select_data" in s for s in train_stages)
    assert any("vd_train" in s for s in train_stages)


def test_v09_dataset_paths(tmp_path):
    """vd_version 0.9 swaps the processed-train/val paths and skips dense
    annotations (dataloader_visdial_gen.py:18-20)."""
    from fixtures import make_tokenizer
    from gstx.data.feature_store import make_synthetic_store
    from gstx.core.config import GSTConfig
    from gstx.data.visdial import VisdialGenDataset

    t09 = str(tmp_path / "train09.json")
    v09 = str(tmp_path / "val09.json")
    store = str(tmp_path / "f.store")
    make_visdial_json(t09, 3, seed=0)
    make_visdial_json(v09, 3, seed=1)
    make_synthetic_store(store, [1000, 1001, 1002], num_boxes=8,
                         feat_dim=16, num_classes=11)
    cfg = GSTConfig(
        vd_version="0.9",
        visdial_processed_train_09=t09,
        visdial_processed_val_09=v09,
        visdial_processed_train="/nonexistent",
        visdial_processed_val="/nonexistent",
        visdial_processed_test="/nonexistent",
        visdial_image_feats=store,
        max_seq_len=96, max_utt_len=12, num_options=10, max_regions=9)
    ds = VisdialGenDataset(cfg, make_tokenizer(), mode="vd_eval_val")
    item = ds.__getitem__(0, seed=0)
    # v0.9: no dense annotations -> no round_id/gt_relevance keys
    assert "gt_relevance" not in item
    assert item["enc_input_ids"].shape == (10, 10, 96)
