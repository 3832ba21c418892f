"""End-to-end mini GST self-training iteration (VERDICT round-1 item #4).

Runs the REAL orchestrator (gstx.cli.selftrain) for 1 iteration x 1 chunk on
tiny fixtures, each stage in its own subprocess exactly as in production:

  generate (questioner + teacher synthesize 10-round dialogs)
    -> student training on the synthetic chunk with ppl selection
    -> VisDial finetune of the student (checkpoint handoff via -continue)

and asserts the artifacts of each stage: a non-empty synthetic dialog JSON
with 10 rounds + answer_ppl per record, a student final.ckpt, and a
finetuned final.ckpt whose parameters differ from the student's (training
actually happened on the handed-off checkpoint).  Reference flow:
README.md:87-128.
"""

import json
import os

import numpy as np
import pytest

from fixtures import make_cc12m_caption_json, make_cli_env
from gstx.cli.common import build_model, init_params
from gstx.core.checkpoint import restore_checkpoint, save_checkpoint
from gstx.data.feature_store import make_synthetic_store


@pytest.mark.slow
def test_selftrain_one_iteration_subprocess(tmp_path, monkeypatch):
    tmpdir = str(tmp_path)
    args, cfg = make_cli_env(tmpdir)

    # seed checkpoints for questioner + teacher
    model, enc_cfg, dec_cfg = build_model(cfg)
    q_ckpt = os.path.join(tmpdir, "q.ckpt")
    a_ckpt = os.path.join(tmpdir, "a.ckpt")
    save_checkpoint(q_ckpt, init_params(model, cfg, seed=0), step=0)
    save_checkpoint(a_ckpt, init_params(model, cfg, seed=1), step=0)

    # CC12M chunk 0: features + captions
    feat_dir = os.path.join(tmpdir, "cc12m_feats")
    cap_dir = os.path.join(tmpdir, "cc12m_caps")
    dialog_root = os.path.join(tmpdir, "dialogs")
    out_dir = os.path.join(tmpdir, "selftrain_out")
    os.makedirs(feat_dir)
    os.makedirs(cap_dir)
    ids = [2000 + i for i in range(4)]
    make_synthetic_store(os.path.join(feat_dir, "cc12m_img_feat_0.store"),
                         ids, num_boxes=12, feat_dim=16, num_classes=11)
    make_cc12m_caption_json(os.path.join(cap_dir, "cc12m_captions_0.json"),
                            num_images=4)

    # subprocess stages must force the hermetic CPU backend (the
    # orchestrator's children are fresh processes; this sandbox's
    # sitecustomize would otherwise grab the TPU tunnel)
    monkeypatch.setenv("GSTX_PLATFORM", "cpu")
    monkeypatch.setenv("GSTX_NUM_CPU_DEVICES", "2")
    # fresh per-run compile cache for the children: the long-lived repo
    # cache accumulates CPU AOT artifacts whose machine-feature fingerprint
    # can mismatch the current host, and loading those intermittently
    # SIGILLs the stage subprocess (the flake documented in CLAUDE.md)
    monkeypatch.setenv("GSTX_COMPILE_CACHE",
                       os.path.join(tmpdir, "jax_cache"))
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.setenv(
        "PYTHONPATH",
        repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""))

    from gstx.cli.selftrain import main

    extra = [a for a in args if True] + [
        "-batch_size", "2", "-num_epochs", "1", "-log_every", "1",
        "-max_seq_len", "160", "-max_dec_len", "4",
        "-num_dialog_rounds", "10",
    ]
    plan = main([
        "-iterations", "1", "-chunks", "1",
        "-start_path_q", q_ckpt, "-start_path_a", a_ckpt,
        "-cc12m_image_feats", feat_dir,
        "-cc12m_caption_dir", cap_dir,
        "-dialog_root", dialog_root,
        "-save_path", out_dir,
        "-extra"] + extra)
    assert len(plan) == 3  # generate, student train, finetune

    # stage 1 artifact: synthetic dialogs with 10 rounds + ppl
    dlg_path = os.path.join(dialog_root, "iter1", "cc12m_dialogs_0.txt")
    assert os.path.exists(dlg_path)
    dialogs = json.load(open(dlg_path))
    assert len(dialogs) >= 1, "all samples abnormal — context budget bug"
    for rec in dialogs:
        assert set(rec) == {"image_id", "url", "caption", "dialog"}
        assert len(rec["dialog"]) == 10
        assert all("answer_ppl" in r for r in rec["dialog"])

    # stage 2 artifact: student checkpoint
    student_ckpt = os.path.join(out_dir, "student_iter1", "final.ckpt")
    assert os.path.isdir(student_ckpt)

    # stage 3 artifact: finetuned checkpoint, parameters moved
    finetune_ckpt = os.path.join(out_dir, "finetune_iter1", "final.ckpt")
    assert os.path.isdir(finetune_ckpt)
    student = restore_checkpoint(student_ckpt)
    finetuned = restore_checkpoint(finetune_ckpt)
    s_leaf = np.asarray(
        student["params"]["params"]["decoder"]["lm_weight"])
    f_leaf = np.asarray(
        finetuned["params"]["params"]["decoder"]["lm_weight"])
    assert s_leaf.shape == f_leaf.shape
    assert not np.allclose(s_leaf, f_leaf), \
        "finetune did not change the handed-off student parameters"


def test_selftrain_stage_retry_on_signal(tmp_path, monkeypatch):
    """A stage killed by a signal (infra kill / stale-cache SIGILL) is
    retried once; a stage failing with a positive exit code fails fast."""
    import subprocess
    import types

    import pytest as _pytest

    from gstx.cli import selftrain

    calls = []

    def fake_run_signal_once(cmd, **kw):
        calls.append(list(cmd))
        rc = -9 if len(calls) == 1 else 0
        return types.SimpleNamespace(returncode=rc)

    assert selftrain  # main() binds subprocess.run at call time
    monkeypatch.setattr(subprocess, "run", fake_run_signal_once)
    base = [
        "-iterations", "1", "-chunks", "1",
        "-start_path_q", "q", "-start_path_a", "a",
        "-cc12m_image_feats", str(tmp_path),
        "-cc12m_caption_dir", str(tmp_path),
        "-dialog_root", str(tmp_path), "-save_path", str(tmp_path)]
    plan = selftrain.main(base)
    # 3 stages + 1 retry of the first = 4 subprocess invocations
    assert len(calls) == len(plan) + 1
    assert calls[0] == calls[1]

    calls.clear()

    def fake_run_error(cmd, **kw):
        calls.append(list(cmd))
        return types.SimpleNamespace(returncode=2)

    monkeypatch.setattr(subprocess, "run", fake_run_error)
    with _pytest.raises(subprocess.CalledProcessError):
        selftrain.main(base)
    assert len(calls) == 1  # no retry for real errors
