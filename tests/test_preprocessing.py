"""Preprocessing tests: length filtering semantics, TSV conversion,
cos-sim builder, Gaussian OOD scorer."""

import base64
import json
import os

import numpy as np
import pytest

from fixtures import make_tokenizer, make_visdial_json
from gstx.preprocessing.clip_filtering import GaussianOOD, cov_mean, \
    score_images
from gstx.preprocessing.comp_cos_sim_mat import build as build_cos_sim
from gstx.preprocessing.convert_to_store import convert_tsv
from gstx.preprocessing.preprocess_visdial import (
    filter_train,
    filter_val,
    truncate_test,
)


def test_filter_train_drops_overlong(tmp_path):
    data = make_visdial_json(str(tmp_path / "t.json"), num_dialogs=6)
    tok = make_tokenizer()
    n_before = len(data["data"]["dialogs"])
    # tight limit: everything should drop; loose limit: nothing
    d2 = json.loads(json.dumps(data))
    dropped = filter_train(d2, tok, max_seq_len=10)
    assert dropped == n_before and len(d2["data"]["dialogs"]) == 0
    d3 = json.loads(json.dumps(data))
    dropped = filter_train(d3, tok, max_seq_len=100000)
    assert dropped == 0 and len(d3["data"]["dialogs"]) == n_before


def test_filter_train_exact_length_accounting(tmp_path):
    data = make_visdial_json(str(tmp_path / "t.json"), num_dialogs=3)
    tok = make_tokenizer()
    # compute the reference's length formula for dialog 0
    d = data["data"]["dialogs"][0]
    qs, ans = data["data"]["questions"], data["data"]["answers"]
    tot = 22 + len(tok.encode(d["caption"]))
    for rnd in d["dialog"]:
        tot += len(tok.encode(ans[rnd["answer"]]))
        tot += len(tok.encode(qs[rnd["question"]]))
    d2 = json.loads(json.dumps(data))
    filter_train(d2, tok, max_seq_len=tot)  # exactly fits -> kept
    assert any(x["image_id"] == d["image_id"] for x in d2["data"]["dialogs"])
    d3 = json.loads(json.dumps(data))
    filter_train(d3, tok, max_seq_len=tot - 1)  # one less -> dropped
    assert not any(x["image_id"] == d["image_id"]
                   for x in d3["data"]["dialogs"])


def test_filter_val_and_dense_lockstep(tmp_path):
    data = make_visdial_json(str(tmp_path / "v.json"), num_dialogs=4)
    tok = make_tokenizer()
    dense = [{"image_id": d["image_id"], "round_id": 1,
              "gt_relevance": [0.0] * 100}
             for d in data["data"]["dialogs"]]
    filter_val(data, dense, tok, max_seq_len=60)
    assert len(dense) == len(data["data"]["dialogs"])
    kept_ids = {d["image_id"] for d in data["data"]["dialogs"]}
    assert all(a["image_id"] in kept_ids for a in dense)


def test_truncate_test_rounds(tmp_path):
    data = make_visdial_json(str(tmp_path / "te.json"), num_dialogs=4,
                             test_mode=True)
    tok = make_tokenizer()
    orig_rounds = [len(d["dialog"]) for d in data["data"]["dialogs"]]
    truncate_test(data, tok, max_seq_len=40)
    for d, orig in zip(data["data"]["dialogs"], orig_rounds):
        assert d["round_id"] == orig  # round_id records the original count
        assert len(d["dialog"]) >= 1


def test_convert_tsv_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    n, fd, nc = 4, 8, 5
    rows = []
    for img in (11, 22):
        feats = rng.rand(n, fd).astype(np.float32)
        boxes = (rng.rand(n, 4) * 100).astype(np.float32)
        cls = rng.rand(n, nc).astype(np.float32)
        rows.append("\t".join([
            str(img), "640", "480", str(n),
            base64.b64encode(boxes.tobytes()).decode(),
            base64.b64encode(feats.tobytes()).decode(),
            base64.b64encode(cls.tobytes()).decode()]))
    tsv = str(tmp_path / "f.tsv")
    open(tsv, "w").write("\n".join(rows))
    store = str(tmp_path / "f.store")
    count = convert_tsv([tsv], store, feat_dim=fd, num_classes=nc)
    assert count == 2
    from gstx.data.feature_store import FeatureStoreReader

    r = FeatureStoreReader(store)
    feats, num_boxes, loc, loc_ori, cls_prob = r[11]
    assert num_boxes == n + 1
    assert feats.shape == (n + 1, fd)


def test_cos_sim_builder(tmp_path):
    lines = ["cat 1.0 0.0", "dog 0.9 0.1", "car 0.0 1.0"]
    emb = str(tmp_path / "emb.txt")
    open(emb, "w").write("\n".join(lines))
    product, idx2word, word2idx = build_cos_sim(emb, str(tmp_path))
    assert product.shape == (3, 3)
    np.testing.assert_allclose(np.diag(product), 1.0, rtol=1e-5)
    assert product[0, 1] > product[0, 2]  # cat~dog > cat~car
    assert idx2word[0] == "cat" and word2idx["car"] == 2
    assert os.path.exists(str(tmp_path / "cos_sim_counter_fitting.npy"))

    # duplicate lines dedup in LOCKSTEP with the matrix rows: word2idx must
    # keep indexing each word's own similarity row (a kept-in-matrix but
    # skipped-in-vocab duplicate would shift every later word's row)
    dup = str(tmp_path / "dup.txt")
    open(dup, "w").write("\n".join(
        ["cat 1.0 0.0", "cat 0.5 0.5", "dog 0.9 0.1", "car 0.0 1.0"]))
    product2, idx2word2, word2idx2 = build_cos_sim(dup, str(tmp_path))
    assert product2.shape == (3, 3)
    assert [idx2word2[i] for i in range(3)] == ["cat", "dog", "car"]
    np.testing.assert_allclose(product2, product, rtol=1e-6)


def test_gaussian_ood_scorer():
    rng = np.random.RandomState(0)
    in_domain = rng.randn(500, 4) * 0.5 + 1.0
    in_sample = rng.randn(10, 4) * 0.5 + 1.0
    out_sample = rng.randn(10, 4) * 0.5 + 10.0
    scorer = GaussianOOD(in_domain)
    assert scorer.log_prob(in_sample).mean() > scorer.log_prob(
        out_sample).mean()
    scores = score_images(in_domain, np.concatenate([in_sample, out_sample]),
                          range(20))
    assert len(scores) == 20 and "log_prob" in scores[0]


def test_cov_mean_matches_numpy():
    rng = np.random.RandomState(1)
    x = rng.randn(50, 6)
    cov, mean = cov_mean(x)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False), rtol=1e-10)
    np.testing.assert_allclose(mean, x.mean(0), rtol=1e-10)


def test_extract_clip_features_batched(tmp_path):
    """extract_clip_features (VERDICT round-1 item #7): the batched
    extraction loop — preprocess per image, stacked [B,C,H,W] batches,
    visual-tower dtype conversion, [N,D] concat — tested via a stubbed clip
    module (the real ViT-B/32 download is unavailable offline).  Mirrors
    the reference loop clip_in_domain_filtering.py:126-151."""
    import types

    torch = pytest.importorskip("torch")
    PIL_Image = pytest.importorskip("PIL.Image")
    Image = PIL_Image

    from gstx.preprocessing.clip_filtering import extract_clip_features

    # 5 tiny distinct images on disk
    paths = []
    for i in range(5):
        arr = np.full((8, 8, 3), i * 40, np.uint8)
        p = str(tmp_path / f"img{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)

    seen_dtypes = []

    class StubVisual(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(3, 4, 1)
            self.conv1.weight.data = self.conv1.weight.data.half()

        def forward(self, x):  # [B, 3, 8, 8] -> [B, 7] deterministic
            seen_dtypes.append(x.dtype)
            pooled = x.float().mean(dim=(2, 3))          # [B, 3]
            return torch.cat([pooled, pooled.flip(1), pooled[:, :1]], dim=1)

    def preprocess(img):
        a = np.asarray(img, np.float32) / 255.0
        return torch.from_numpy(a).permute(2, 0, 1)

    stub = types.SimpleNamespace(load=lambda name, device=None: (
        types.SimpleNamespace(visual=StubVisual()), preprocess))

    feats = extract_clip_features(paths, batch_size=2, clip_module=stub)
    assert feats.shape == (5, 7)
    assert feats.dtype == np.float32
    # batching must not change results (reference: one forward per batch)
    feats_big = extract_clip_features(paths, batch_size=64, clip_module=stub)
    np.testing.assert_allclose(feats, feats_big, rtol=1e-3)
    # visual tower ran in its weight dtype (model.module.conv1.weight.dtype
    # conversion, reference :145)
    assert all(d == torch.float16 for d in seen_dtypes)
    # distinct images -> distinct features, deterministic values
    assert len({tuple(np.round(f, 4)) for f in feats}) == 5
    np.testing.assert_allclose(feats[1, :3], 40 / 255.0, rtol=1e-2)
