"""VisDial generative DATASET differential against the reference's own
`dataloader/dataloader_visdial_gen.py` run offline on a shared fixture.

The dataset layer is the largest remaining transcription surface (context
assembly, questioner/answerer targets, gt-option reordering, dense-round
relevance, round_id plumbing, option/region padding).  This harness runs
the reference's actual VisdialDataset — with three shims: the
pytorch_transformers tokenizer name routed to the installed HF
BertTokenizer over the SAME fixture vocab gstx uses (their equality is
itself pinned by tests/test_tokenizer_hf_parity.py), dummy lmdb/h5py
modules so `utils.image_features_reader` imports, and the reader class
replaced by gstx's FeatureStoreReader (identical 5-tuple protocol; the
reader itself is fuzz-pinned in tests/test_native.py) — and compares
items key-for-key against gstx's VisdialGenDataset in all four modes.

All item surfaces are deterministic at the reference's hard-coded
mask_prob=0 EXCEPT `enc_image_label`, whose ensure-one-predicted-region
randint (data_utils.py:109) draws from each side's own rng; it is
checked structurally here and exactly (shared-stream) in
tests/test_reference_data_parity.py::test_encode_image_input_differential.
Layout adapters are size-preserving reshapes only (the reference keeps
torch's [1, L] leading dims in places gstx flattens); values must match
element-for-element.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fixtures import make_visdial_env, make_tokenizer, write_vocab_file  # noqa: E402

from gstx.data.feature_store import FeatureStoreReader  # noqa: E402
from gstx.data.visdial import VisdialGenDataset  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def _load_ref_dataloader(vocab_path):
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "dataloader")):
        return None
    hf_tok = transformers.BertTokenizer(vocab_file=vocab_path)

    class _TokShim:
        """pytorch_transformers-era surface on the installed tokenizer:
        `.encode` adds NO special tokens (the dataset adds CLS/SEP itself
        via encode_input)."""

        def __init__(self, hf):
            self._hf = hf

        @classmethod
        def from_pretrained(cls, *a, **k):
            return cls(hf_tok)

        def encode(self, text):
            return self._hf.encode(text, add_special_tokens=False)

        def convert_tokens_to_ids(self, tokens):
            return self._hf.convert_tokens_to_ids(tokens)

        def _convert_id_to_token(self, idx):
            return self._hf._convert_id_to_token(idx)

    tb = types.ModuleType("pytorch_transformers.tokenization_bert")
    tb.BertTokenizer = _TokShim
    pt = sys.modules.get("pytorch_transformers")
    if pt is None:
        pt = types.ModuleType("pytorch_transformers")
        sys.modules["pytorch_transformers"] = pt
    pt.tokenization_bert = tb
    sys.modules["pytorch_transformers.tokenization_bert"] = tb
    for dummy in ("lmdb", "h5py"):
        sys.modules.setdefault(dummy, types.ModuleType(dummy))

    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import dataloader.dataloader_visdial_gen as dvg
    finally:
        sys.path.remove(REFERENCE_ROOT)
    return dvg


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("refds"))
    cfg = make_visdial_env(d)
    # the reference hard-codes 37 regions and its eval loops hard-code 100
    # options (`for k in range(100)`), so the differential runs there
    cfg = cfg.replace(max_regions=37, num_options=100)
    vocab_path = write_vocab_file(os.path.join(d, "vocab.txt"))
    dvg = _load_ref_dataloader(vocab_path)
    if dvg is None:
        pytest.skip("reference tree not available")
    reader = FeatureStoreReader(cfg.visdial_image_feats)
    dvg.ImageFeaturesH5Reader = lambda path: reader

    def ref_params(model):
        return {
            "num_train_samples": 0, "num_val_samples": 0,
            "visdial_image_feats": cfg.visdial_image_feats,
            "visdial_processed_train": cfg.visdial_processed_train,
            "visdial_processed_val": cfg.visdial_processed_val,
            "visdial_processed_test": cfg.visdial_processed_test,
            "visdial_processed_val_dense_annotations":
                cfg.visdial_processed_val_dense_annotations,
            "vd_version": "1.0", "overfit": False, "num_options": 100,
            "max_seq_len": cfg.max_seq_len, "max_utt_len": cfg.max_utt_len,
            "model": model, "attack": None, "mask_prob": 0,
        }

    return cfg, dvg, reader, ref_params


def _compare_item(ref_item, got_item, mode):
    assert set(ref_item) == set(got_item), (
        mode, set(ref_item) ^ set(got_item))
    for key, want in ref_item.items():
        want = want.numpy() if torch.is_tensor(want) else np.asarray(want)
        got = np.asarray(got_item[key])
        if key == "enc_image_label":
            # each side draws its ensure-one-predicted randint from its own
            # rng: check the structure the trainer relies on
            for arr in (want, got):
                assert arr.shape == want.shape
                assert arr[0] == 0
                assert set(np.unique(arr)) <= {-1, 0, 1}
                assert (arr == 1).sum() <= 1
            continue
        if got.shape != want.shape:
            assert got.size == want.size, (mode, key, got.shape, want.shape)
            got = got.reshape(want.shape)
        np.testing.assert_array_equal(
            got, want, err_msg=f"{mode}:{key} differs")


@pytest.mark.parametrize("mode,model", [
    ("vd_train", "enc_dec_a"),
    ("vd_train", "enc_dec_q"),
    ("vd_eval_val", "enc_dec_a"),
    ("vd_gen_val", "enc_dec_a"),
    ("vd_eval_test", "enc_dec_a"),
])
def test_visdial_gen_dataset_differential(env, mode, model):
    cfg, dvg, reader, ref_params = env
    ref_ds = dvg.VisdialDataset(ref_params(model))
    ref_ds.mode = mode
    got_ds = VisdialGenDataset(cfg.replace(model=model), make_tokenizer(),
                               mode=mode, reader=reader)
    assert len(ref_ds) == len(got_ds)
    for idx in range(len(ref_ds)):
        _compare_item(ref_ds[idx], got_ds.__getitem__(idx, seed=idx), mode)


class _SharedPyRandom:
    """gstx rng surface over the global python `random` stream (same
    adapter as tests/test_reference_data_parity.py) — makes the cc12m and
    disc items comparable EXACTLY even with mask_prob > 0 and random
    negative sampling, because both implementations draw in the same
    order AND through the same primitives: `random.choice(seq)` consumes
    one `_randbelow(len(seq))`, exactly like the adapter's one-arg
    `randint(n)` via `randrange(n)`."""

    def random_sample(self):
        import random

        return random.random()

    def randint(self, low, high=None):
        import random

        if high is None:
            return random.randrange(low)
        return random.randint(low, high - 1)


@pytest.fixture(scope="module")
def cc12m_env(tmp_path_factory):
    from fixtures import (make_cc12m_caption_json, make_cc12m_dialog_json,
                          make_synthetic_store)

    d = str(tmp_path_factory.mktemp("refcc"))
    cap = os.path.join(d, "captions.json")
    dia = os.path.join(d, "dialogs.json")
    feats = os.path.join(d, "cc.store")
    n = 4
    make_cc12m_caption_json(cap, num_images=n)
    make_cc12m_dialog_json(dia, num_images=n)
    make_synthetic_store(feats, [2000 + i for i in range(n)], num_boxes=12,
                         feat_dim=16, num_classes=11)
    vocab_path = write_vocab_file(os.path.join(d, "vocab.txt"))
    dcc = _load_ref_cc12m(vocab_path)
    if dcc is None:
        pytest.skip("reference tree not available")
    reader = FeatureStoreReader(feats)

    class _ReaderProxy:
        """The reference's caption-mode sanity assert reads the private
        `_image_ids`; expose it over the (possibly native) gstx reader."""

        _image_ids = list(reader.keys())

        def __getitem__(self, image_id):
            return reader[image_id]

    dcc.ImageFeaturesH5Reader = lambda path: _ReaderProxy()
    return cap, dia, feats, dcc, reader


def _load_ref_cc12m(vocab_path):
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "dataloader")):
        return None
    _load_ref_dataloader(vocab_path)  # installs the tokenizer/lmdb shims
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import dataloader.dataloader_cc12m_gen as dcc
    finally:
        sys.path.remove(REFERENCE_ROOT)
    return dcc


@pytest.mark.parametrize("mode,mask_prob,select_data", [
    ("cc12m_gen", 0.0, False),
    ("cc12m_train", 0.0, True),    # ppl-threshold label zeroing engaged
    ("cc12m_train", 0.15, False),  # stochastic masking, shared rng stream
])
def test_cc12m_dataset_differential(cc12m_env, mode, mask_prob,
                                    select_data):
    """CC12M dataset (the GST self-training data path) vs the reference's
    own CC12mDataset: gen mode, train mode with perplexity-threshold label
    zeroing, and train mode with mask_prob=0.15 where BOTH the context MLM
    masking and the region masking are driven from the same python-random
    stream — items must be exactly equal INCLUDING every random mask."""
    import random

    from gstx.core.config import GSTConfig
    from gstx.data.cc12m import CC12mDataset as GstxCC12m

    cap, dia, feats, dcc, reader = cc12m_env
    params = {
        "cc12m_image_feats": feats,
        "cc12m_caption": cap if mode == "cc12m_gen" else "",
        "cc12m_processed_train": dia if mode == "cc12m_train" else "",
        "max_seq_len": 96, "max_utt_len": 12,
        "mask_prob": mask_prob, "select_data": select_data,
        "threshold": 50.0,
    }
    ref_ds = dcc.CC12mDataset(params)
    ref_ds.mode = mode
    cfg = GSTConfig(cc12m_image_feats=feats, cc12m_caption=cap,
                    cc12m_processed_train=dia, max_seq_len=96,
                    max_utt_len=12, max_regions=37, mask_prob=mask_prob,
                    select_data=select_data, threshold=50.0)
    got_ds = GstxCC12m(cfg, make_tokenizer(), mode=mode, reader=reader)
    assert len(ref_ds) == len(got_ds)
    shared = _SharedPyRandom()
    for idx in range(len(ref_ds)):
        random.seed(9000 + idx)
        want = ref_ds[idx]
        random.seed(9000 + idx)
        if mode == "cc12m_gen":
            got = got_ds._gen_item(idx, shared)
        else:
            got = got_ds._train_item(idx, shared)
        # shared stream -> even enc_image_label (the randint) is exact
        assert set(want) == set(got)
        for key, w in want.items():
            w = w.numpy() if torch.is_tensor(w) else np.asarray(w)
            g = np.asarray(got[key])
            if g.shape != w.shape:
                assert g.size == w.size, (mode, key, g.shape, w.shape)
                g = g.reshape(w.shape)
            np.testing.assert_array_equal(
                g, w, err_msg=f"{mode}:{key} differs (idx {idx})")
        if mode == "cc12m_train" and select_data:
            # the zeroing really fired: fixture ppls straddle threshold 50
            labels = np.asarray(got["dec_labels"])
            zeroed = (labels.reshape(10, -1).sum(-1) == 0)
            assert zeroed.any()


def _load_ref_disc(vocab_path):
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "dataloader")):
        return None
    _load_ref_dataloader(vocab_path)  # installs the tokenizer/lmdb shims
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import dataloader.dataloader_visdial_disc as dvd
    finally:
        sys.path.remove(REFERENCE_ROOT)
    return dvd


@pytest.fixture(scope="module")
def disc_env(env, tmp_path_factory):
    import json

    cfg, _, reader, ref_params_gen = env
    d = str(tmp_path_factory.mktemp("refdisc"))
    vocab_path = write_vocab_file(os.path.join(d, "vocab.txt"))
    dvd = _load_ref_disc(vocab_path)
    if dvd is None:
        pytest.skip("reference tree not available")
    dvd.ImageFeaturesH5Reader = lambda path: reader
    # pseudo-dense training labels: scores[round][option] in [0, 1]
    rs = np.random.RandomState(31)
    train_dense_path = os.path.join(d, "train_dense.json")
    with open(train_dense_path, "w") as f:
        json.dump([{"image_id": 1000 + i,
                    "scores": rs.rand(10, 100).round(3).tolist()}
                   for i in range(4)], f)
    return cfg, dvd, reader, train_dense_path


@pytest.mark.parametrize("mode,mask_prob,train_dense", [
    ("vd_train", 0.15, False),   # shared-stream negatives + MLM masking
    ("vd_train", 0.0, True),     # pseudo-dense NSP label lookup
    ("vd_eval_val", 0.0, False),
    ("vd_eval_test", 0.0, False),
])
def test_visdial_disc_dataset_differential(disc_env, mode, mask_prob,
                                           train_dense):
    """Discriminative dataset vs the reference's own
    dataloader_visdial_disc.py: random negative resampling under the
    max-len constraint (random.choice == the adapter's randrange draw),
    MLM masking, pseudo-dense NSP label lookup by sampled option index,
    round pruning (visdial_tot_rounds=10 prunes the last rounds' history),
    and both eval layouts — items exactly equal under the shared stream,
    including image masking and the ensure-one-predicted randint."""
    import random

    from gstx.data.visdial import VisdialDiscDataset

    cfg, dvd, reader, train_dense_path = disc_env
    params = {
        "num_train_samples": 0, "num_val_samples": 0,
        "visdial_image_feats": cfg.visdial_image_feats,
        "visdial_processed_train": cfg.visdial_processed_train,
        "visdial_processed_val": cfg.visdial_processed_val,
        "visdial_processed_test": cfg.visdial_processed_test,
        "visdial_processed_val_dense_annotations":
            cfg.visdial_processed_val_dense_annotations,
        "visdial_processed_train_dense": train_dense_path,
        "vd_version": "1.0", "overfit": False, "num_options": 100,
        "max_seq_len": cfg.max_seq_len, "max_utt_len": cfg.max_utt_len,
        "model": "enc_only_a", "attack": None, "mask_prob": mask_prob,
        "num_negative_samples": 2, "visdial_tot_rounds": 10,
        "train_dense": train_dense,
    }
    ref_ds = dvd.VisdialDataset(params)
    ref_ds.mode = mode
    gcfg = cfg.replace(mask_prob=mask_prob, num_negative_samples=2,
                       visdial_tot_rounds=10, train_dense=train_dense,
                       visdial_processed_train_dense=train_dense_path)
    got_ds = VisdialDiscDataset(gcfg, make_tokenizer(), mode=mode,
                                reader=reader)
    assert len(ref_ds) == len(got_ds)
    shared = _SharedPyRandom()
    for idx in range(len(ref_ds)):
        random.seed(4000 + idx)
        want = ref_ds[idx]
        random.seed(4000 + idx)
        data = got_ds._data()
        dialog = data["dialogs"][idx]
        q_cache, a_cache = got_ds._caches(data)
        if mode == "vd_train":
            got = got_ds._train_item(idx, dialog, q_cache, a_cache,
                                     dialog["image_id"], shared)
        elif mode == "vd_eval_val":
            got = got_ds._eval_item(idx, dialog, q_cache, a_cache,
                                    dialog["image_id"], shared)
        else:
            got = got_ds._test_item(dialog, q_cache, a_cache,
                                    dialog["image_id"], shared)
        assert set(want) == set(got), (mode, set(want) ^ set(got))
        for key, w in want.items():
            w = w.numpy() if torch.is_tensor(w) else np.asarray(w)
            g = np.asarray(got[key])
            if g.shape != w.shape:
                assert g.size == w.size, (mode, key, g.shape, w.shape)
                g = g.reshape(w.shape)
            np.testing.assert_array_equal(
                g, w, err_msg=f"{mode}:{key} differs (idx {idx})")
