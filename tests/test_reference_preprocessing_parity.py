"""Offline-preprocessing differential: gstx's preprocess_visdial vs the
reference's own `preprocessing/pre_process_visdial_v1.0.py`, executed via
runpy on a shared raw fixture sized so every filter actually fires
(train drops, val drops, test round-truncation).

Scope: the train / val / val-dense / test outputs must be EXACTLY equal.
The train-dense outputs are excluded: the reference's legality check
reads a stale `cur_dialog` left over from the train loop
(pre_process_visdial_v1.0.py:125-127 iterates `cur_dialog[rnd]` where
`cur_dialog` is whatever dialog the PREVIOUS while loop ended on, and its
`if rnd != round_id` guard compares a 0-based loop index against the
1-based round_id) — gstx implements the evident intent (the sample's own
dialog, all previous rounds counted), documented in PARITY.md.
"""

import json
import os
import runpy
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fixtures import WORDS, write_vocab_file  # noqa: E402

from gstx.preprocessing import preprocess_visdial  # noqa: E402

REFERENCE_ROOT = "/root/reference"
REF_SCRIPT = os.path.join(REFERENCE_ROOT, "preprocessing",
                          "pre_process_visdial_v1.0.py")
REF_SCRIPT_V09 = os.path.join(REFERENCE_ROOT, "preprocessing",
                              "pre_process_visdial_v0.9.py")


def _make_raw_visdial(path, rng, n_dialogs, n_q=25, n_a=30, long_every=3,
                      with_round_id=False):
    """Raw visdial_1.0-format json; every `long_every`-th dialog gets an
    oversized caption so length filters/truncation engage at
    max_seq_len=64."""
    sample = lambda k: " ".join(WORDS[i] for i in rng.randint(0, 36, size=k))
    questions = [sample(3) for _ in range(n_q)]
    answers = [sample(2) for _ in range(n_a)]
    dialogs = []
    for d in range(n_dialogs):
        cap_len = 40 if d % long_every == 2 else 5
        rounds = []
        for r in range(10):
            options = [int(o) for o in rng.randint(0, n_a, size=100)]
            gt = int(rng.randint(0, 100))
            rounds.append({
                "question": int(rng.randint(0, n_q)),
                "answer": options[gt],
                "answer_options": options,
                "gt_index": gt,
            })
        dlg = {"image_id": 5000 + d, "caption": sample(cap_len),
               "dialog": rounds}
        dialogs.append(dlg)
    data = {"data": {"dialogs": dialogs, "questions": questions,
                     "answers": answers}, "split": "raw", "version": "1.0"}
    with open(path, "w") as f:
        json.dump(data, f)


def _make_raw_dense(path, rng, n_dialogs):
    dense = [{"image_id": 5000 + d, "round_id": int(rng.randint(1, 11)),
              "gt_relevance": [float(x) for x in rng.rand(100)]}
             for d in range(n_dialogs)]
    with open(path, "w") as f:
        json.dump(dense, f)


def test_preprocess_visdial_differential(tmp_path):
    if not os.path.exists(REF_SCRIPT):
        pytest.skip("reference tree not available")
    d = str(tmp_path)
    vocab_path = write_vocab_file(os.path.join(d, "vocab.txt"))
    rng = np.random.RandomState(17)
    raw_train = os.path.join(d, "raw_train.json")
    raw_val = os.path.join(d, "raw_val.json")
    raw_test = os.path.join(d, "raw_test.json")
    _make_raw_visdial(raw_train, rng, 9)
    _make_raw_visdial(raw_val, rng, 9)
    _make_raw_visdial(raw_test, rng, 9)
    train_nd = os.path.join(d, "raw_train_dense.json")
    val_nd = os.path.join(d, "raw_val_dense.json")
    _make_raw_dense(train_nd, rng, 9)
    _make_raw_dense(val_nd, rng, 9)

    # --- reference script, offline: shim its tokenizer import onto the
    # installed HF tokenizer over the SAME fixture vocab ---
    from test_reference_dataset_parity import _load_ref_dataloader

    _load_ref_dataloader(vocab_path)  # registers pytorch_transformers shims
    ref_out = {k: os.path.join(d, f"ref_{k}.json")
               for k in ("train", "val", "test", "val_ndcg", "train_dense",
                         "train_ndcg")}
    argv = ["pre_process_visdial_v1.0.py",
            "-visdial_train", raw_train, "-visdial_val", raw_val,
            "-visdial_test", raw_test, "-visdial_train_ndcg", train_nd,
            "-visdial_val_ndcg", val_nd, "-max_seq_len", "64",
            "-save_path_train", ref_out["train"],
            "-save_path_val", ref_out["val"],
            "-save_path_test", ref_out["test"],
            "-save_path_val_ndcg", ref_out["val_ndcg"],
            "-save_path_train_dense_samples", ref_out["train_dense"],
            "-save_path_train_ndcg", ref_out["train_ndcg"]]
    old_argv = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(REF_SCRIPT, run_name="__main__")
    finally:
        sys.argv = old_argv

    # --- gstx CLI on the same inputs ---
    prefix = os.path.join(d, "gstx")
    preprocess_visdial.main([
        "-visdial_train", raw_train, "-visdial_val", raw_val,
        "-visdial_test", raw_test, "-visdial_train_ndcg", train_nd,
        "-visdial_val_ndcg", val_nd, "-vocab_path", vocab_path,
        "-max_seq_len", "64", "-save_prefix", prefix])

    pairs = [
        (ref_out["train"], prefix + "_train_processed.json"),
        (ref_out["val"], prefix + "_val_processed.json"),
        (ref_out["val_ndcg"], prefix + "_val_dense_annotations_processed"
                                       ".json"),
        (ref_out["test"], prefix + "_test_processed.json"),
    ]
    for ref_path, gstx_path in pairs:
        with open(ref_path) as f:
            want = json.load(f)
        with open(gstx_path) as f:
            got = json.load(f)
        assert got == want, f"{os.path.basename(ref_path)} differs"

    # the filters really fired (the fixture is sized to trip each pass)
    with open(ref_out["train"]) as f:
        assert len(json.load(f)["data"]["dialogs"]) < 9
    with open(ref_out["val"]) as f:
        n_val = len(json.load(f)["data"]["dialogs"])
    assert n_val < 9
    with open(ref_out["val_ndcg"]) as f:
        assert len(json.load(f)) == n_val  # dense dropped in lockstep
    with open(ref_out["test"]) as f:
        test_data = json.load(f)["data"]["dialogs"]
    assert any(len(t["dialog"]) < 10 for t in test_data)  # truncation fired
    assert all(t["round_id"] == 10 for t in test_data)


def test_preprocess_visdial_v09_differential(tmp_path):
    """v0.9 variant (pre_process_visdial_v0.9.py): train + val passes only,
    no dense/test.  gstx's single implementation must match the reference's
    separate v0.9 script byte-for-byte on its two outputs."""
    if not os.path.exists(REF_SCRIPT_V09):
        pytest.skip("reference tree not available")
    d = str(tmp_path)
    vocab_path = write_vocab_file(os.path.join(d, "vocab.txt"))
    rng = np.random.RandomState(29)
    raw_train = os.path.join(d, "raw_train.json")
    raw_val = os.path.join(d, "raw_val.json")
    _make_raw_visdial(raw_train, rng, 9)
    _make_raw_visdial(raw_val, rng, 9)

    from test_reference_dataset_parity import _load_ref_dataloader

    _load_ref_dataloader(vocab_path)  # registers pytorch_transformers shims
    ref_train = os.path.join(d, "ref09_train.json")
    ref_val = os.path.join(d, "ref09_val.json")
    argv = ["pre_process_visdial_v0.9.py",
            "-visdial_train", raw_train, "-visdial_val", raw_val,
            "-max_seq_len", "64",
            "-save_path_train", ref_train, "-save_path_val", ref_val]
    old_argv = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(REF_SCRIPT_V09, run_name="__main__")
    finally:
        sys.argv = old_argv

    prefix = os.path.join(d, "gstx09")
    preprocess_visdial.main([
        "-visdial_train", raw_train, "-visdial_val", raw_val,
        "-vocab_path", vocab_path, "-max_seq_len", "64",
        "-save_prefix", prefix])

    for ref_path, gstx_path, key in (
            (ref_train, prefix + "_train_processed.json", "train"),
            (ref_val, prefix + "_val_processed.json", "val")):
        with open(ref_path) as f:
            want = json.load(f)
        with open(gstx_path) as f:
            got = json.load(f)
        assert got == want, f"v0.9 {key} differs"
        assert len(want["data"]["dialogs"]) < 9  # the filter really fired
