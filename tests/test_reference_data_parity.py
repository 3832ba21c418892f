"""Data-layer + scheduler parity against the reference's OWN utils code.

`gstx/data/encode.py` and the LR schedule were previously pinned by
hand-derived goldens (a transcription could hide a shared misreading).
This harness imports the actual `/root/reference/utils/data_utils.py` and
`utils/optim_utils.py` and differentially fuzzes gstx against them:

  * encode_input: EXACT equality on all five outputs — deterministically
    (mask_prob=0) over random utterance structures incl. truncation, and
    stochastically by driving both sides from the SAME python-random
    stream (both implementations draw in the same order; gstx's rng
    parameter accepts any object with random_sample/randint);
  * encode_image_input: same shared-stream exact differential (incl. the
    randint(1, n) inclusive/exclusive equivalence);
  * sequence_mask: exact;
  * WarmupLinearScheduleNonZero: the reference's own torch scheduler
    trajectory vs gstx's warmup_linear_nonzero at every step, both LR
    groups, through warmup, decay and the min_lr floor.
"""

import os
import random
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gstx.data.encode import (  # noqa: E402
    encode_image_input,
    encode_input,
    sequence_mask,
)
from gstx.train.optim import warmup_linear_nonzero  # noqa: E402

REFERENCE_ROOT = "/root/reference"
CLS, SEP, MASK, PAD = 101, 102, 103, 0


@pytest.fixture(scope="module")
def ref_utils():
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "utils")):
        pytest.skip("reference tree not available")
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import utils.data_utils as du
        import utils.optim_utils as ou
    finally:
        sys.path.remove(REFERENCE_ROOT)
    return du, ou


class _SharedPyRandom:
    """Adapter exposing gstx's expected rng surface on top of the global
    python `random` stream, so reference (which calls random.random /
    random.randint directly) and gstx consume IDENTICAL draws when
    re-seeded identically.  randint maps numpy's exclusive high to
    python's inclusive high."""

    def random_sample(self):
        return random.random()

    def randint(self, low, high):
        return random.randint(low, high - 1)


def _rand_utterances(rs, max_tokens=30, max_utts=12):
    n = rs.randint(1, max_utts + 1)
    return [[int(t) for t in rs.randint(1000, 30000, rs.randint(1, max_tokens + 1))]
            for _ in range(n)]


def test_encode_input_deterministic_differential(ref_utils):
    du, _ = ref_utils
    rs = np.random.RandomState(0)
    for case in range(60):
        # occasionally overflow 256 tokens to exercise truncation
        utts = _rand_utterances(rs, max_tokens=40 if case % 7 == 0 else 20)
        start = int(rs.randint(0, 2))
        want = du.encode_input(utts, start, CLS, SEP, MASK, PAD,
                               max_seq_len=256, max_sep_len=25, mask_prob=0)
        got = encode_input(utts, start, CLS, SEP, MASK, PAD,
                           max_seq_len=256, max_sep_len=25, mask_prob=0)
        for w, g, name in zip(want, got, ("tokens", "segments",
                                          "sep_indices", "mlm", "att")):
            np.testing.assert_array_equal(
                np.asarray(g), w.numpy().squeeze(0), err_msg=f"{name} "
                f"differs (case {case})")


def test_encode_input_masking_differential_shared_stream(ref_utils):
    du, _ = ref_utils
    rs = np.random.RandomState(1)
    for case in range(40):
        utts = _rand_utterances(rs)
        start = int(rs.randint(0, 2))
        random.seed(1000 + case)
        want = du.encode_input(utts, start, CLS, SEP, MASK, PAD,
                               max_seq_len=256, max_sep_len=25,
                               mask_prob=0.25)
        random.seed(1000 + case)
        got = encode_input(utts, start, CLS, SEP, MASK, PAD,
                           max_seq_len=256, max_sep_len=25, mask_prob=0.25,
                           rng=_SharedPyRandom())
        for w, g, name in zip(want, got, ("tokens", "segments",
                                          "sep_indices", "mlm", "att")):
            np.testing.assert_array_equal(
                np.asarray(g), w.numpy().squeeze(0), err_msg=f"{name} "
                f"differs (case {case})")


def test_encode_image_input_differential_shared_stream(ref_utils):
    du, _ = ref_utils
    rs = np.random.RandomState(2)
    for case in range(40):
        n = int(rs.randint(2, 50))
        feats = rs.randn(n, 16).astype(np.float32)
        boxes = rs.rand(n, 5).astype(np.float32)
        target = rs.rand(n, 8).astype(np.float32)
        random.seed(2000 + case)
        want = du.encode_image_input(
            torch.tensor(feats), n, torch.tensor(boxes),
            torch.tensor(target), max_regions=37, mask_prob=0.15)
        random.seed(2000 + case)
        got = encode_image_input(feats, n, boxes, target, max_regions=37,
                                 mask_prob=0.15, rng=_SharedPyRandom())
        names = ("features", "spatials", "image_mask", "image_target",
                 "image_label")
        for w, g, name in zip(want, got, names):
            np.testing.assert_allclose(
                np.asarray(g, np.float32), w.numpy().astype(np.float32),
                rtol=0, atol=0, err_msg=f"{name} differs (case {case})")


def test_sequence_mask_differential(ref_utils):
    du, _ = ref_utils
    rs = np.random.RandomState(3)
    for _ in range(20):
        lens = rs.randint(0, 30, size=rs.randint(1, 9))
        want = du.sequence_mask(torch.tensor(lens), {}, max_len=32)
        got = sequence_mask(lens, max_len=32)
        np.testing.assert_array_equal(np.asarray(got), want.numpy())


@pytest.fixture(scope="module")
def ref_metrics():
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "utils")):
        pytest.skip("reference tree not available")
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import utils.visdial_metrics as vm
    finally:
        sys.path.remove(REFERENCE_ROOT)
    return vm


def test_metrics_differential(ref_metrics):
    """SparseGTMetrics (r@1/5/10, mean, mrr) and NDCG against the
    reference's own utils/visdial_metrics.py classes, across several
    accumulated observe() calls, with tied/zero relevance rows (the NDCG
    top-k path) and continuous scores (rank ties are measure-zero, torch's
    unstable sort would otherwise be unreproducible by design)."""
    from gstx.eval.metrics import NDCG, SparseGTMetrics

    vm = ref_metrics
    rs = np.random.RandomState(7)
    ref_sparse, got_sparse = vm.SparseGTMetrics(), SparseGTMetrics()
    ref_ndcg, got_ndcg = vm.NDCG(), NDCG()

    for _ in range(4):
        B, R, O = int(rs.randint(2, 5)), 10, int(rs.randint(5, 30))
        scores = rs.randn(B, R, O).astype(np.float32)
        gt = rs.randint(0, O, size=(B, R))
        ref_sparse.observe(torch.tensor(scores), torch.tensor(gt))
        got_sparse.observe(scores, gt)

        d_scores = rs.randn(B, O).astype(np.float32)
        rel = rs.choice([0.0, 0.0, 0.5, 0.5, 1.0],
                        size=(B, O)).astype(np.float32)
        rel[:, 0] = 1.0  # ensure k >= 1 per row
        ref_ndcg.observe(torch.tensor(d_scores), torch.tensor(rel))
        got_ndcg.observe(d_scores, rel)

    want = ref_sparse.retrieve(reset=True)
    got = got_sparse.retrieve(reset=True)
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5,
                                   err_msg=f"sparse metric {k}")
    want_n = ref_ndcg.retrieve(reset=True)
    got_n = got_ndcg.retrieve(reset=True)
    np.testing.assert_allclose(got_n["ndcg"], want_n["ndcg"], rtol=1e-5)
    # reset really cleared the accumulators on both sides
    assert ref_sparse.retrieve() == {} and got_sparse.retrieve() == {}
    assert ref_ndcg.retrieve() == {} and got_ndcg.retrieve() == {}


def test_scheduler_differential(ref_utils):
    """gstx's warmup_linear_nonzero(step) must equal the reference's own
    WarmupLinearScheduleNonZero at every last_epoch, for BOTH base LRs,
    through warmup, linear decay and the min_lr floor regions."""
    _, ou = ref_utils
    lang_lr, img_lr = 2e-5, 2e-4
    warmup, t_total = 100, 1000
    p1 = torch.nn.Parameter(torch.zeros(1))
    p2 = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([{"params": [p1], "lr": lang_lr},
                           {"params": [p2], "lr": img_lr}])
    sched = ou.WarmupLinearScheduleNonZero(opt, warmup_steps=warmup,
                                           t_total=t_total)
    lang = warmup_linear_nonzero(lang_lr, warmup, t_total)
    img = warmup_linear_nonzero(img_lr, warmup, t_total)
    for step in range(t_total + 50):
        want = [g["lr"] for g in opt.param_groups]  # get_lr(last_epoch=step)
        np.testing.assert_allclose(float(lang(step)), want[0], rtol=1e-6,
                                   err_msg=f"lang lr at step {step}")
        np.testing.assert_allclose(float(img(step)), want[1], rtol=1e-6,
                                   err_msg=f"img lr at step {step}")
        sched.step()
