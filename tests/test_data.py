"""Data-layer tests: encoding goldens, tokenizer, feature store round-trip,
dataset item shapes/semantics."""

import os

import numpy as np
import pytest

from fixtures import (
    make_cc12m_caption_json,
    make_cc12m_dialog_json,
    make_tokenizer,
    make_visdial_env,
)
from gstx.core.config import CLS_ID, MASK_ID, PAD_ID, SEP_ID
from gstx.data.encode import encode_image_input, encode_input, sequence_mask
from gstx.data.feature_store import FeatureStoreReader, make_synthetic_store
from gstx.data.loader import DataLoader, collate
from gstx.data.tokenizer import BertTokenizer, make_test_vocab


# ---------------------------------------------------------------------- #
# encode_input / encode_image_input
# ---------------------------------------------------------------------- #


def test_encode_input_golden():
    """[CLS] u1 [SEP] u2 [SEP] with oscillating segments
    (data_utils.py:34-71)."""
    utts = [[11, 12, 13], [21, 22]]
    tok, seg, sep, mlm, att = encode_input(
        utts, start_segment=1, max_seq_len=12, max_sep_len=4, mask_prob=0,
        rng=np.random.RandomState(0))
    np.testing.assert_array_equal(
        tok, [CLS_ID, 11, 12, 13, SEP_ID, 21, 22, SEP_ID, 0, 0, 0, 0])
    np.testing.assert_array_equal(
        seg, [1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(sep, [4, 7, 0, 0])
    assert (mlm == -1).all()  # mask_prob=0 -> nothing masked
    np.testing.assert_array_equal(
        att, [1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0])


def test_encode_input_masking():
    utts = [[11, 12, 13, 14, 15, 16, 17, 18]]
    tok, seg, sep, mlm, att = encode_input(
        utts, 0, max_seq_len=16, mask_prob=1.0,
        rng=np.random.RandomState(0))
    # every utterance token masked; CLS/SEP never masked
    assert tok[0] == CLS_ID and tok[9] == SEP_ID
    np.testing.assert_array_equal(tok[1:9], [MASK_ID] * 8)
    np.testing.assert_array_equal(mlm[1:9], [11, 12, 13, 14, 15, 16, 17, 18])
    assert mlm[0] == -1 and mlm[9] == -1
    # att mask counts MASK tokens as valid
    assert att[:10].sum() == 10


def test_encode_image_input_no_mask():
    rng = np.random.RandomState(0)
    n, fd, nc = 5, 8, 6
    feats = rng.rand(n, fd).astype(np.float32)
    boxes = rng.rand(n, 5).astype(np.float32)
    target = rng.rand(n, nc).astype(np.float32)
    f, s, m, t, l = encode_image_input(feats, n, boxes, target,
                                       max_regions=7, mask_prob=0, rng=rng)
    assert f.shape == (7, fd) and s.shape == (7, 5) and m.shape == (7,)
    np.testing.assert_array_equal(m, [1, 1, 1, 1, 1, 0, 0])
    np.testing.assert_allclose(f[:5], feats)
    assert (f[5:] == 0).all()
    # at least one region labelled even with mask_prob=0; <IMG> row excluded
    assert l[0] == 0
    assert (l == 1).sum() == 1
    assert np.flatnonzero(l == 1)[0] >= 1


def test_encode_image_input_masking_zeroes_features():
    rng = np.random.RandomState(3)
    n, fd, nc = 10, 4, 3
    feats = np.ones((n, fd), dtype=np.float32)
    boxes = np.zeros((n, 5), dtype=np.float32)
    target = np.zeros((n, nc), dtype=np.float32)
    f, s, m, t, l = encode_image_input(feats, n, boxes, target,
                                       max_regions=10, mask_prob=1.0, rng=rng)
    # with mask_prob=1 every region is labelled 1 (except <IMG> forced to 0)
    assert (l[1:] == 1).all() and l[0] == 0
    # ~90% of them zeroed
    assert (f.sum(-1) == 0).sum() >= 5


def test_sequence_mask():
    m = sequence_mask(np.asarray([1, 3]), max_len=4)
    np.testing.assert_array_equal(
        m, [[True, False, False, False], [True, True, True, False]])


# ---------------------------------------------------------------------- #
# tokenizer
# ---------------------------------------------------------------------- #


def test_tokenizer_basic():
    tok = make_tokenizer()
    ids = tok.encode("A man riding")
    assert ids == tok.convert_tokens_to_ids(["a", "man", "riding"])
    assert tok.decode(ids) == "a man riding"


def test_tokenizer_wordpiece_subwords():
    vocab = make_test_vocab(["ride", "##r", "##er", "##s", "play"])
    tok = BertTokenizer(vocab=vocab)
    assert tok.tokenize("riders") == ["ride", "##r", "##s"]
    assert tok.tokenize("players") == ["play", "##er", "##s"]
    assert tok.tokenize("xyz") == ["[UNK]"]


def test_tokenizer_punctuation_and_case():
    vocab = make_test_vocab(["hello", "world", "!", ",", "cafe"])
    tok = BertTokenizer(vocab=vocab)
    assert tok.tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    # accent stripping (lowercase mode)
    assert tok.tokenize("Café") == ["cafe"]


def test_tokenizer_specials_have_bert_ids():
    tok = make_tokenizer()
    assert (tok.PAD, tok.UNK, tok.CLS, tok.SEP, tok.MASK) == \
        (0, 100, 101, 102, 103)


# ---------------------------------------------------------------------- #
# feature store
# ---------------------------------------------------------------------- #


def test_feature_store_roundtrip(tmp_path):
    path = str(tmp_path / "f.store")
    make_synthetic_store(path, [7, 9, 11], num_boxes=6, feat_dim=8,
                         num_classes=4)
    r = FeatureStoreReader(path)
    assert sorted(r.keys()) == [7, 9, 11]
    feats, num_boxes, loc, loc_ori, cls_prob = r[9]
    assert num_boxes == 7  # 6 + <IMG>
    assert feats.shape == (7, 8)
    assert loc.shape == (7, 5) and loc_ori.shape == (7, 5)
    assert cls_prob.shape == (7, 4)
    # <IMG> token: mean feature, loc [0,0,1,1,1], one-hot background
    np.testing.assert_allclose(feats[0], feats[1:].mean(0), rtol=1e-6)
    np.testing.assert_array_equal(loc[0], [0, 0, 1, 1, 1])
    np.testing.assert_array_equal(cls_prob[0], [1, 0, 0, 0])
    # normalized coords within [0, ~1]
    assert loc[1:, :4].max() <= 1.5
    r.close()


# ---------------------------------------------------------------------- #
# datasets
# ---------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def visdial_env(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("visdial"))
    cfg = make_visdial_env(tmpdir)
    return cfg, make_tokenizer()


def test_visdial_train_item(visdial_env):
    from gstx.data.visdial import VisdialGenDataset

    cfg, tok = visdial_env
    ds = VisdialGenDataset(cfg, tok, mode="vd_train")
    item = ds.__getitem__(0, seed=0)
    L, U = cfg.max_seq_len, cfg.max_utt_len
    assert item["enc_input_ids"].shape == (10, 1, L)
    assert item["enc_segments"].shape == (10, 1, L)
    assert item["dec_input_ids"].shape == (10, 1, U)
    assert item["dec_labels"].shape == (10, 1, U)
    assert item["enc_hist_len"].shape == (10, 1)
    assert item["enc_image_feat"].shape == (cfg.max_regions, 16)
    # decoder inputs have SEP scrubbed, labels are shift-left
    dec = item["dec_input_ids"][0, 0]
    lab = item["dec_labels"][0, 0]
    assert SEP_ID not in dec
    assert dec[0] == CLS_ID
    assert SEP_ID in lab
    # context rounds grow monotonically
    lens = (item["enc_input_ids"] != 0).sum(-1)[:, 0]
    assert (np.diff(lens) >= 0).all()


def test_visdial_eval_item(visdial_env):
    from gstx.data.visdial import VisdialGenDataset

    cfg, tok = visdial_env
    ds = VisdialGenDataset(cfg, tok, mode="vd_eval_val")
    item = ds.__getitem__(1, seed=0)
    n_opt = cfg.num_options
    assert item["enc_input_ids"].shape == (10, n_opt, cfg.max_seq_len)
    assert item["dec_input_ids"].shape == (10, n_opt, cfg.max_utt_len)
    assert item["gt_option_inds"].shape == (10,)
    assert (item["gt_option_inds"] == 0).all()
    assert item["gt_relevance"].shape == (n_opt,)
    assert 1 <= int(item["round_id"][0]) <= 10


def test_visdial_gen_val_item(visdial_env):
    from gstx.data.visdial import VisdialGenDataset

    cfg, tok = visdial_env
    ds = VisdialGenDataset(cfg, tok, mode="vd_gen_val")
    item = ds.__getitem__(0, seed=0)
    assert item["enc_input_ids"].shape == (cfg.max_seq_len,)
    assert item["dec_input_ids"].shape == (1,)
    assert item["dec_input_ids"][0] == CLS_ID
    # caption context: [CLS] ... [SEP], segment 1
    assert item["enc_input_ids"][0] == CLS_ID
    n = (item["enc_input_ids"] != 0).sum()
    assert item["enc_input_ids"][n - 1] == SEP_ID
    assert (item["enc_segments"][:n] == 1).all()


def test_visdial_test_item(visdial_env):
    from gstx.data.visdial import VisdialGenDataset

    cfg, tok = visdial_env
    cfg100 = cfg.replace(num_options=100)
    ds = VisdialGenDataset(cfg100, tok, mode="vd_eval_test")
    item = ds.__getitem__(0, seed=0)
    assert item["enc_input_ids"].shape == (1, 100, cfg.max_seq_len)
    assert item["round_id"].shape == (1,)


def test_visdial_disc_train_item(visdial_env):
    from gstx.data.visdial import VisdialDiscDataset

    cfg, tok = visdial_env
    ds = VisdialDiscDataset(cfg, tok, mode="vd_train")
    item = ds.__getitem__(0, seed=0)
    ns = 1 + cfg.num_negative_samples
    assert item["tokens"].shape == (10, ns, cfg.max_seq_len)
    assert item["next_sentence_labels"].shape == (10, ns, 2)
    # positive gets [1,0], negative [0,1]
    np.testing.assert_array_equal(item["next_sentence_labels"][0, 0], [1, 0])
    np.testing.assert_array_equal(item["next_sentence_labels"][0, 1], [0, 1])
    assert item["image_label"].shape == (cfg.max_regions,)


def test_visdial_disc_eval_item(visdial_env):
    from gstx.data.visdial import VisdialDiscDataset

    cfg, tok = visdial_env
    ds = VisdialDiscDataset(cfg, tok, mode="vd_eval_val")
    item = ds.__getitem__(0, seed=0)
    assert item["tokens"].shape == (10, cfg.num_options, cfg.max_seq_len)
    assert item["gt_option_inds"].shape == (10,)


def test_cc12m_datasets(visdial_env, tmp_path):
    from gstx.data.cc12m import CC12mDataset
    from gstx.data.feature_store import make_synthetic_store

    cfg, tok = visdial_env
    cap_path = str(tmp_path / "caps.json")
    dlg_path = str(tmp_path / "dialogs.json")
    store = str(tmp_path / "cc.store")
    make_cc12m_caption_json(cap_path, 4)
    make_cc12m_dialog_json(dlg_path, 4)
    make_synthetic_store(store, [2000 + i for i in range(4)], num_boxes=12,
                         feat_dim=16, num_classes=11)
    cfg2 = cfg.replace(cc12m_caption=cap_path, cc12m_image_feats=store,
                       cc12m_processed_train=dlg_path, select_data=True,
                       threshold=50)
    gen = CC12mDataset(cfg2, tok, mode="cc12m_gen")
    item = gen.__getitem__(0, seed=0)
    assert item["dec_input_ids"][0] == CLS_ID
    assert item["enc_input_ids"].shape == (cfg.max_seq_len,)

    train = CC12mDataset(cfg2, tok, mode="cc12m_train")
    item = train.__getitem__(0, seed=0)
    assert item["dec_labels"].shape == (10, 1, cfg.max_utt_len)
    # ppl-threshold selection: rounds with ppl >= 50 have zero labels
    import json
    dialogs = json.load(open(dlg_path))
    for j, rnd in enumerate(dialogs[0]["dialog"]):
        zeroed = (item["dec_labels"][j, 0] == 0).all()
        assert zeroed == (rnd["answer_ppl"] >= 50)


def test_cc12m_train_loads_multihost_proc_shards(visdial_env, tmp_path):
    """Multi-host cli/generate writes per-process ``name.procN.ext`` output
    shards; the training-side loader must reassemble them (after the exact
    file, in process order) so a sharded generate run feeds the student
    stage unchanged."""
    from gstx.data.cc12m import CC12mDataset, load_dialog_json
    from gstx.data.feature_store import make_synthetic_store

    cfg, tok = visdial_env
    base = make_cc12m_dialog_json(str(tmp_path / "dialogs.json"), 2)
    s0 = make_cc12m_dialog_json(str(tmp_path / "dialogs.proc0.json"), 3,
                                seed=5)
    s1 = make_cc12m_dialog_json(str(tmp_path / "dialogs.proc1.json"), 1,
                                seed=7)
    # exact file + shards in one directory = outputs of TWO different runs
    # (single-host writes only the exact file, multi-host only shards);
    # silently concatenating would double-load every image's dialogs
    with pytest.raises(ValueError, match="ambiguous"):
        load_dialog_json(str(tmp_path / "dialogs.json"))

    # exact file alone wins once the stale shards are removed
    (tmp_path / "dialogs.proc0.json").unlink()
    (tmp_path / "dialogs.proc1.json").unlink()
    assert [d["caption"] for d in load_dialog_json(
        str(tmp_path / "dialogs.json"))] == [d["caption"] for d in base]

    # shards reassemble in process order; a sibling whose wildcard part is
    # not a bare integer is NOT a shard (e.g. a human-made backup) — it
    # must be ignored, not crash int()
    (tmp_path / "dialogs.json").unlink()
    make_cc12m_dialog_json(str(tmp_path / "dialogs.proc0.json"), 3, seed=5)
    make_cc12m_dialog_json(str(tmp_path / "dialogs.proc1.json"), 1, seed=7)
    (tmp_path / "dialogs.proc_backup.json").write_text("not even json")
    again = load_dialog_json(str(tmp_path / "dialogs.json"))
    assert [d["caption"] for d in again] == \
        [d["caption"] for d in s0 + s1]

    # shards-only directory (the usual multi-host layout: no exact file)
    only = tmp_path / "only"
    only.mkdir()
    make_cc12m_dialog_json(str(only / "d.proc0.json"), 2, seed=5)
    make_cc12m_dialog_json(str(only / "d.proc1.json"), 2, seed=7)
    store = str(tmp_path / "cc.store")
    make_synthetic_store(store, [2000 + i for i in range(4)], num_boxes=12,
                         feat_dim=16, num_classes=11)
    cfg2 = cfg.replace(cc12m_image_feats=store,
                       cc12m_processed_train=str(only / "d.json"))
    train = CC12mDataset(cfg2, tok, mode="cc12m_train")
    assert len(train) == 4
    item = train.__getitem__(3, seed=0)
    assert item["dec_labels"].shape == (10, 1, cfg.max_utt_len)

    with pytest.raises(FileNotFoundError):
        load_dialog_json(str(tmp_path / "missing.json"))


def test_loader_determinism(visdial_env):
    from gstx.data.visdial import VisdialGenDataset

    cfg, tok = visdial_env
    ds = VisdialGenDataset(cfg, tok, mode="vd_train")
    dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=7)
    b1 = list(dl.epoch(0))
    b2 = list(dl.epoch(0))
    assert len(b1) == len(b2) == 2
    for x, y in zip(b1, b2):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])
    assert b1[0]["enc_input_ids"].shape[0] == 2


def test_loader_start_batch_matches_full_iteration(visdial_env):
    """epoch(start_batch=k) yields exactly the tail of the full iteration —
    the property generation resume relies on (per-(epoch,index) item seeds
    make batch i independent of whether 0..i-1 were fetched)."""
    from gstx.data.visdial import VisdialGenDataset

    cfg, tok = visdial_env
    ds = VisdialGenDataset(cfg, tok, mode="vd_train")
    dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=7)
    full = list(dl.epoch(0))
    tail = list(dl.epoch(0, start_batch=1))
    assert len(tail) == len(full) - 1
    for x, y in zip(full[1:], tail):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])


def test_disc_train_dense_pseudo_labels(visdial_env, tmp_path):
    """-train_dense swaps negative-sample NSP labels for pseudo scores from
    the dense train file (dataloader_visdial_disc.py:240-246)."""
    import json

    from gstx.data.visdial import VisdialDiscDataset

    cfg, tok = visdial_env
    # dense train file: per dialog, 10 rounds x 100 option scores
    rng = np.random.RandomState(9)
    dense = [{"image_id": 1000 + d,
              "scores": [[float(s) for s in rng.rand(100)]
                         for _ in range(10)]}
             for d in range(4)]
    dense_path = str(tmp_path / "train_dense.json")
    json.dump(dense, open(dense_path, "w"))
    cfg2 = cfg.replace(train_dense=True,
                       visdial_processed_train_dense=dense_path)
    ds = VisdialDiscDataset(cfg2, tok, mode="vd_train")
    item = ds.__getitem__(0, seed=0)
    labels = item["next_sentence_labels"]  # [10, 1+neg, 2]
    # positives stay [1, 0]
    np.testing.assert_array_equal(labels[:, 0], np.tile([1.0, 0.0], (10, 1)))
    # negatives carry [score, 1-score] from the dense file
    for j in range(10):
        s, one_minus = labels[j, 1]
        np.testing.assert_allclose(s + one_minus, 1.0, rtol=1e-6)
    # at least one pseudo score is fractional (not the hard [0, 1] default)
    assert any(0.0 < labels[j, 1, 0] < 1.0 for j in range(10))


def test_loader_even_stripes_equal_batch_counts():
    """Collectively-assembled training batches need every host to see the
    SAME number of batches per epoch; even_stripes truncates the shuffled
    global order to a process_count multiple before striping.  Default
    striping (generation/eval shards) still covers every item."""
    from gstx.data.loader import DataLoader

    class Items:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.asarray([i])}

    ragged, even, seen_even = [], [], []
    for pidx in range(4):
        dl = DataLoader(Items(), batch_size=1, shuffle=True, drop_last=False,
                        num_workers=1, seed=3, process_index=pidx,
                        process_count=4)
        ragged.append(len(dl))
        dle = DataLoader(Items(), batch_size=1, shuffle=True, drop_last=False,
                         num_workers=1, seed=3, process_index=pidx,
                         process_count=4, even_stripes=True)
        even.append(len(dle))
        for b in dle.epoch(0):
            seen_even.append(int(b["x"][0, 0]))
    assert ragged == [3, 3, 2, 2]  # 10 items over 4 hosts is ragged
    assert even == [2, 2, 2, 2]
    # stripes are disjoint and cover exactly the truncated order
    assert len(seen_even) == len(set(seen_even)) == 8

    # default striping still covers the full dataset (per-host shards)
    seen_all = []
    for pidx in range(4):
        dl = DataLoader(Items(), batch_size=1, shuffle=False,
                        drop_last=False, num_workers=1, seed=0,
                        process_index=pidx, process_count=4)
        for b in dl.epoch(0):
            seen_all.append(int(b["x"][0, 0]))
    assert sorted(seen_all) == list(range(10))
