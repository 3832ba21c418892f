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
    groups, through warmup, decay and the min_lr floor;
  * the full optimizer trajectory: gstx's make_optimizer vs
    pytorch-transformers 1.2.0 AdamW (the reference's requirements.txt
    pin — transcribed here since the package is not installable offline)
    driven by the reference's OWN scheduler, all four (lr x decay)
    groups plus a frozen grad-None layer, every leaf at every step.
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


class _PTTAdamW(torch.optim.Optimizer):
    """Transcription of the reference's pinned pytorch-transformers 1.2.0
    ``optimization.py::AdamW`` (requirements.txt pins
    pytorch-transformers==1.2.0; train_gen.py:16,247 /
    train_disc.py:14,195 import and use it) — the package itself is not
    installable offline, so its step formula is reproduced verbatim
    modulo the torch-2.x in-place API (``add_(t, alpha=...)`` /
    ``addcmul_(..., value=...)``).  The two signature quirks under test:
    eps joins the UNCORRECTED sqrt(v) with the bias correction folded
    into the step size, and weight decay hits the POST-update params
    scaled by the scheduled group lr."""

    def __init__(self, params, lr, betas=(0.9, 0.999), eps=1e-6,
                 weight_decay=0.0, correct_bias=True):
        defaults = dict(lr=lr, betas=betas, eps=eps,
                        weight_decay=weight_decay, correct_bias=correct_bias)
        super().__init__(params, defaults)

    @torch.no_grad()
    def step(self, closure=None):
        for group in self.param_groups:
            for p in group["params"]:
                if p.grad is None:
                    continue
                grad = p.grad
                state = self.state[p]
                if len(state) == 0:
                    state["step"] = 0
                    state["exp_avg"] = torch.zeros_like(p)
                    state["exp_avg_sq"] = torch.zeros_like(p)
                exp_avg, exp_avg_sq = state["exp_avg"], state["exp_avg_sq"]
                beta1, beta2 = group["betas"]
                state["step"] += 1
                exp_avg.mul_(beta1).add_(grad, alpha=1.0 - beta1)
                exp_avg_sq.mul_(beta2).addcmul_(grad, grad,
                                                value=1.0 - beta2)
                denom = exp_avg_sq.sqrt().add_(group["eps"])
                step_size = group["lr"]
                if group["correct_bias"]:
                    bias_correction1 = 1.0 - beta1 ** state["step"]
                    bias_correction2 = 1.0 - beta2 ** state["step"]
                    step_size = (step_size * (bias_correction2 ** 0.5)
                                 / bias_correction1)
                p.addcdiv_(exp_avg, denom, value=-step_size)
                if group["weight_decay"] > 0.0:
                    p.add_(p, alpha=-group["lr"] * group["weight_decay"])


def test_adamw_hand_computed_literal_steps():
    """Closed-form pin of the two ptt-1.2.0 AdamW signature quirks, with
    every expected value a hand-derived literal (not computed by the code
    under test), so a transcription error in the trajectory oracle above
    (_PTTAdamW is the builder's own transcription — pytorch_transformers
    1.2.0 is not installable offline) cannot self-confirm.

    Derivation (b1=0.9, b2=0.999; exact decimals below from 64-bit math):

    Core quirk (eps joins the UNCORRECTED sqrt(v); eps=1e-3 amplifies it):
      g1=1: m1=0.1, v1=0.001
        u1 = sqrt(1-b2)/(1-b1) * m1/(sqrt(v1)+eps)
           = 0.0316227766.../0.0326227766... = 0.969346569968285
        (the correct-m,v-first formula gives 0.999001 — 3.1% away)
      g2=2: m2=0.29, v2=0.004999
        u2 = sqrt(1-b2^2)/(1-b1^2) * m2/(sqrt(v2)+eps) = 0.9517213078707604

    Full optimizer (eps=1e-6, lr schedule warmup=0/t_total=10 so lr_1=0.1,
    lr_2=0.09; wd=0.5; p0=1; decay hits POST-update params):
      u1 = 0.9999683782233667, u2 = 0.965168374914551
      kernel: p1 = (1 - 0.1*u1)*(1 - 0.1*0.5)  = 0.85500300406878
              p2 = (p1 - 0.09*u2)*(1 - 0.09*0.5) = 0.7335716470617792
      bias (no decay): p1 = 0.9000031621776633, p2 = 0.8131380084353537
      Pre-update decay (optax.adamw-style) would give p1 =
      1 - 0.1*u1 - 0.1*0.5*1 = 0.8500031621776633 (5e-3 away); the
      corrected-eps core would give bias p1 = 0.9000000999999 (3.8e-6
      away, still outside the f32 assertion tolerance)."""
    import jax
    import jax.numpy as jnp
    import optax

    from gstx.train.optim import make_optimizer, scale_by_ptt_adam

    # --- core quirk, amplified eps ---
    core = scale_by_ptt_adam(eps=1e-3)
    cst = core.init({"w": jnp.zeros(1)})
    up, cst = core.update({"w": jnp.array([1.0])}, cst)
    # (the core emits the raw +u step; the chained group-scale stage
    # applies -lr)
    np.testing.assert_allclose(float(up["w"][0]), 0.969346569968285,
                               rtol=5e-5)
    assert abs(float(up["w"][0]) - 0.9990009990009998) > 0.02, \
        "matched the corrected-m,v-first (optax-style) eps formula"
    up, cst = core.update({"w": jnp.array([2.0])}, cst)
    np.testing.assert_allclose(float(up["w"][0]), 0.9517213078707604,
                               rtol=5e-5)

    # --- full optimizer: schedule + post-update decay ---
    opt = make_optimizer(0.1, 0.1, warmup_steps=0, t_total=10,
                         weight_decay=0.5)
    params = {"params": {"decoder": {"layer_0": {"qkv": {
        "kernel": jnp.array([1.0], jnp.float32),
        "bias": jnp.array([1.0], jnp.float32)}}}}}
    st = opt.init(params)
    # step-1 atol 1.5e-6 keeps the corrected-eps variant (3.8e-6 away)
    # outside the band; step 2 accumulates a second step of f32 rounding
    expect = [(0.85500300406878, 0.9000031621776633, 1.5e-6),
              (0.7335716470617792, 0.8131380084353537, 4e-6)]
    for g, (want_k, want_b, atol) in zip((1.0, 2.0), expect):
        grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, g), params)
        up, st = opt.update(grads, st, params)
        params = optax.apply_updates(params, up)
        leaf = params["params"]["decoder"]["layer_0"]["qkv"]
        np.testing.assert_allclose(float(leaf["kernel"][0]), want_k,
                                   atol=atol, rtol=0)
        np.testing.assert_allclose(float(leaf["bias"][0]), want_b,
                                   atol=atol, rtol=0)
    # discrimination margins (step-1 wrong-formula literals)
    k1, b1v = expect[0][0], expect[0][1]
    assert abs(k1 - 0.8500031621776633) > 2.5e-3   # pre-update decay
    assert abs(b1v - 0.9000000999999) > 2.5e-6     # corrected-eps core


def test_adamw_trajectory_differential(ref_utils):
    """gstx make_optimizer (ptt-AdamW core + group lrs + decay rule +
    frozen prefixes) vs the transcribed ptt-1.2.0 AdamW driven by the
    reference's OWN WarmupLinearScheduleNonZero: every leaf equal at
    every one of 25 steps, through warmup (5), decay (t_total 20) and
    past-t_total min_lr-floor regions, with grad scales spanning 1e-4
    to 5 so the eps-before-correction regime is exercised."""
    import jax
    import jax.numpy as jnp
    import optax

    from gstx.train.optim import (
        is_language_param,
        is_no_decay_param,
        make_optimizer,
    )

    _, ou = ref_utils
    lang_lr, img_lr = 2e-5, 2e-4
    warmup, t_total, wd = 5, 20, 0.01
    rs = np.random.RandomState(3)

    # (path tuple, shape, grad scale); layer_0 is frozen via fixed_t_layer=1
    leaves = [
        (("params", "encoder", "embeddings", "word_embeddings",
          "embedding"), (7, 6), 1.0),
        (("params", "encoder", "embeddings", "ln", "scale"), (6,), 1e-4),
        (("params", "encoder", "embeddings", "ln", "bias"), (6,), 5.0),
        (("params", "encoder", "encoder", "layer_0", "ffn", "kernel"),
         (4, 4), 0.0),
        (("params", "encoder", "encoder", "layer_1", "ffn", "kernel"),
         (4, 4), 1.0),
        (("params", "encoder", "encoder", "v_layer_0", "attn", "kernel"),
         (4, 4), 5.0),
        (("params", "decoder", "layer_0", "qkv", "kernel"), (3, 5), 1e-4),
        (("params", "decoder", "layer_0", "qkv", "bias"), (5,), 1.0),
        (("params", "cls", "mlm_bias"), (7,), 1.0),
    ]

    def build_tree(values):
        tree = {}
        for (path, _, _), v in zip(leaves, values):
            node = tree
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = v
        return tree

    inits = [rs.standard_normal(shape).astype(np.float32)
             for _, shape, _ in leaves]
    grad_steps = [[(scale * rs.standard_normal(shape)).astype(np.float32)
                   for _, shape, scale in leaves] for _ in range(25)]

    # --- torch side: transcribed ptt AdamW + the reference's scheduler,
    # four groups mirroring train_gen.py:217-242 (lang/img x decay/none);
    # the frozen layer keeps grad=None so ptt AdamW skips it entirely ---
    class _KeyEntry:  # minimal jax KeyEntry lookalike for the predicates
        def __init__(self, key):
            self.key = key

    t_params = [torch.nn.Parameter(torch.from_numpy(v.copy()))
                for v in inits]
    frozen_idx = {i for i, (p, _, s) in enumerate(leaves) if s == 0.0}
    groups = {}
    for i, (path, _, _) in enumerate(leaves):
        kp = tuple(_KeyEntry(k) for k in path)
        lr = lang_lr if is_language_param(kp) else img_lr
        decay = 0.0 if (is_no_decay_param(kp) or i in frozen_idx) else wd
        groups.setdefault((lr, decay), []).append(t_params[i])
    opt = _PTTAdamW([{"params": ps, "lr": lr, "weight_decay": decay}
                     for (lr, decay), ps in groups.items()],
                    lr=lang_lr, weight_decay=wd)
    sched = ou.WarmupLinearScheduleNonZero(opt, warmup_steps=warmup,
                                           t_total=t_total)

    # --- gstx side ---
    gopt = make_optimizer(lang_lr, img_lr, warmup_steps=warmup,
                          t_total=t_total, weight_decay=wd,
                          fixed_t_layer=1)
    params = build_tree([jnp.asarray(v) for v in inits])
    gstate = gopt.init(params)

    for step, gvals in enumerate(grad_steps):
        for i, p in enumerate(t_params):
            if i in frozen_idx:
                p.grad = None  # stop_gradient'd prefix: reference never
                # registers these in the optimizer
            else:
                p.grad = torch.from_numpy(gvals[i].copy())
        opt.step()
        sched.step()

        grads = build_tree([
            jnp.zeros_like(jnp.asarray(g)) if i in frozen_idx
            else jnp.asarray(g) for i, g in enumerate(gvals)])
        updates, gstate = gopt.update(grads, gstate, params)
        params = optax.apply_updates(params, updates)

        flat = {tuple(getattr(k, "key", str(k)) for k in kp): v
                for kp, v in
                jax.tree_util.tree_flatten_with_path(params)[0]}
        for i, (path, _, _) in enumerate(leaves):
            got = np.asarray(flat[path])
            want = t_params[i].detach().numpy()
            np.testing.assert_allclose(
                got, want, rtol=1e-5, atol=1e-9,
                err_msg=f"step {step} leaf {'/'.join(path)}")

    # the frozen leaf never moved on either side
    for i in frozen_idx:
        np.testing.assert_array_equal(t_params[i].detach().numpy(),
                                      inits[i])
