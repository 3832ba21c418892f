"""End-to-end CLI tests: every entry point of the reference has a gstx CLI
that runs on the fixture data (SURVEY.md §3 call stacks)."""

import json
import os

import numpy as np
import pytest

from fixtures import make_cli_env
from gstx.cli.common import build_model, init_params, parse_config
from gstx.core.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("cli"))
    args, cfg = make_cli_env(tmpdir)
    # build a tiny checkpoint usable as -start_path
    model, enc_cfg, dec_cfg = build_model(cfg)
    params = init_params(model, cfg, seed=0)
    ckpt_path = os.path.join(tmpdir, "model_0.ckpt")
    save_checkpoint(ckpt_path, params, step=0)
    return args, cfg, ckpt_path


@pytest.mark.slow
def test_cli_evaluate_gen(cli_env):
    from gstx.cli.evaluate_gen import main

    args, cfg, ckpt = cli_env
    metrics = main(args + ["-mode", "vd_eval_val", "-start_path", ckpt,
                           "-batch_size", "2"],
                   max_batches=1, chunk_size=50)
    assert "mrr" in metrics and "ndcg" in metrics


@pytest.mark.slow
def test_cli_evaluate_gen_test_mode(cli_env):
    from gstx.cli.evaluate_gen import main

    args, cfg, ckpt = cli_env
    result = main(args + ["-mode", "vd_eval_test", "-start_path", ckpt,
                          "-num_options", "100"],
                  max_batches=1, chunk_size=100)
    pred_path = os.path.join(cfg.save_path, "predictions.txt")
    assert os.path.exists(pred_path)
    ranks = json.load(open(pred_path))
    assert len(ranks) >= 1 and "ranks" in ranks[0]


@pytest.mark.slow
def test_cli_evaluate_disc(cli_env):
    from gstx.cli.evaluate_disc import main

    args, cfg, ckpt = cli_env
    metrics = main(args + ["-mode", "vd_eval_val", "-model", "enc_only_a",
                           "-start_path", ckpt],
                   max_batches=1, chunk_size=50)
    assert "mrr" in metrics


@pytest.mark.slow
def test_cli_generate(cli_env):
    from gstx.cli.generate import main

    args, cfg, ckpt = cli_env
    gen = main(args + ["-mode", "vd_gen_val", "-save_name", "gen.json",
                       "-start_path_q", ckpt, "-start_path_a", ckpt,
                       "-batch_size", "2", "-num_dialog_rounds", "2",
                       "-max_dec_len", "6"],
               max_batches=1)
    out_path = os.path.join(cfg.save_path, "gen.json")
    assert os.path.exists(out_path)
    data = json.load(open(out_path))
    assert data == gen
    for rec in data:
        assert set(rec) == {"image_id", "url", "caption", "dialog"}
        assert len(rec["dialog"]) == 2
        assert "answer_ppl" in rec["dialog"][0]


def test_cli_generate_prefetch_identity(cli_env):
    """-host_prefetch (default, threaded batch prep + upload) is a pure
    host-side reordering: outputs must be byte-identical to the in-line
    -no_host_prefetch path."""
    from gstx.cli.generate import main

    args, cfg, ckpt = cli_env
    base = ["-mode", "vd_gen_val", "-start_path_q", ckpt,
            "-start_path_a", ckpt, "-batch_size", "2",
            "-num_dialog_rounds", "2", "-max_dec_len", "6"]
    pre = main(args + base + ["-save_name", "pre.json"])
    inline = main(args + base + ["-save_name", "inl.json",
                                 "-no_host_prefetch"])
    assert len(pre) > 0
    assert pre == inline


def test_prefetch_worker_unblocks_on_consumer_failure():
    """If the consumer dies while the queue is full, the worker thread must
    terminate (not block in q.put forever holding prepared device batches)
    and the queued items must be released — pytest and selftrain call
    generate main() repeatedly in one process."""
    import threading
    import time

    from gstx.cli.generate import _prefetch

    before = {t.name for t in threading.enumerate()}
    gen = _prefetch(enumerate(range(50)), lambda i, b: (i, b), depth=2)
    assert next(gen) == (0, 0)
    gen.close()  # consumer abandons the iterator mid-stream

    deadline = time.time() + 5.0
    while time.time() < deadline:
        alive = {t.name for t in threading.enumerate()} - before
        if not any(n.startswith("gstx-generate-prefetch") for n in alive):
            break
        time.sleep(0.02)
    else:
        raise AssertionError("prefetch worker still alive after close()")


def test_cli_generate_resume_identical(cli_env):
    """Preemption recovery: a generate run killed mid-chunk resumes from its
    partial sidecar and produces the byte-identical final JSON (per-batch
    fold_in rng + per-(epoch,index) loader item seeds make every batch
    restart-invariant)."""
    from gstx.cli.generate import main

    args, cfg, ckpt = cli_env
    base = ["-mode", "vd_gen_val", "-start_path_q", ckpt,
            "-start_path_a", ckpt, "-batch_size", "2",
            "-num_dialog_rounds", "2", "-max_dec_len", "6",
            "-flush_every", "1"]
    # uninterrupted reference over the full 4-dialog fixture (2 batches)
    ref = main(args + base + ["-save_name", "ref.json"])
    assert len(ref) > 2  # both batches contribute records

    # "preempted" run: batch 0 completes + flushes, then the process dies
    # before the final write (finalize=False is the preemption seam)
    partial = main(args + base + ["-save_name", "res.json"],
                   max_batches=1, finalize=False)
    sidecar = os.path.join(cfg.save_path, "res.json.partial.jsonl")
    assert os.path.exists(sidecar)
    assert 0 < len(partial) < len(ref)
    assert not os.path.exists(os.path.join(cfg.save_path, "res.json"))

    # restart: recovers batch 0 from the sidecar, generates only batch 1
    resumed = main(args + base + ["-save_name", "res.json"])
    assert resumed == ref
    assert json.load(open(os.path.join(cfg.save_path, "res.json"))) == ref
    assert not os.path.exists(sidecar)  # cleaned up on success


def test_cli_generate_resume_torn_tail_and_mismatch(cli_env):
    """The sidecar protocol survives a mid-append kill (torn trailing line
    is dropped, its batch regenerates) and refuses sidecars written by a
    different run (meta mismatch -> fresh start, not silent corruption)."""
    from gstx.cli.generate import main

    args, cfg, ckpt = cli_env
    base = ["-mode", "vd_gen_val", "-start_path_q", ckpt,
            "-start_path_a", ckpt, "-batch_size", "2",
            "-num_dialog_rounds", "1", "-max_dec_len", "4",
            "-flush_every", "1"]
    ref = main(args + base + ["-save_name", "torn_ref.json"])

    main(args + base + ["-save_name", "torn.json"],
         max_batches=1, finalize=False)
    sidecar = os.path.join(cfg.save_path, "torn.json.partial.jsonl")
    with open(sidecar, "a") as f:
        f.write('{"batch": 1, "records": [{"image_id"')  # torn mid-append
    resumed = main(args + base + ["-save_name", "torn.json"])
    assert resumed == ref

    # a sidecar from a different run must not be spliced in: preempt at
    # 1 round/dialog, "resume" at 2 — meta mismatch forces a fresh start,
    # so every record has 2 rounds (a wrong splice would leave 1-round
    # records from the stale sidecar)
    main(args + base + ["-save_name", "mm.json"],
         max_batches=1, finalize=False)
    fresh = main(args + base + ["-save_name", "mm.json",
                                "-num_dialog_rounds", "2"])
    assert len(fresh) >= len(ref)
    assert all(len(rec["dialog"]) == 2 for rec in fresh)


def test_cli_generate_resume_unflushed_tail(cli_env):
    """flush_every > 1: batches completed after the last flush are NOT in
    the sidecar and must regenerate on resume (only the flushed prefix is
    recovered), still converging to the uninterrupted output."""
    from gstx.cli.generate import main

    args, cfg, ckpt = cli_env
    base = ["-mode", "vd_gen_val", "-start_path_q", ckpt,
            "-start_path_a", ckpt, "-batch_size", "1",
            "-num_dialog_rounds", "1", "-max_dec_len", "4",
            "-flush_every", "2"]  # 4 dialogs -> 4 batches, flush per 2
    ref = main(args + base + ["-save_name", "tail_ref.json"])

    # preempt after 3 completed batches: 0-1 flushed, 2 lost in flush_buf
    main(args + base + ["-save_name", "tail.json"],
         max_batches=3, finalize=False)
    sidecar = os.path.join(cfg.save_path, "tail.json.partial.jsonl")
    lines = open(sidecar).read().splitlines()
    assert len(lines) == 3  # meta header + batches 0,1 only

    resumed = main(args + base + ["-save_name", "tail.json"])
    assert resumed == ref
    assert not os.path.exists(sidecar)


def test_sidecar_meta_covers_output_affecting_settings(cli_env):
    """Every setting that changes the generated tokens is part of the
    sidecar identity: a resume under different decode semantics (sampling,
    numerics, kernels, buckets, TP degree) must NOT splice stale batches.
    ``data_parallel`` is exempt (mesh data-sharding is pinned bitwise-
    identical to single-device)."""
    from gstx.cli.generate import _sidecar_meta

    args, cfg, _ = cli_env
    base = parse_config(args + ["-mode", "vd_gen_val"],
                        "sidecar meta test")
    ref = _sidecar_meta(base, 0, 1, 4)
    changed = {
        "seed": 99, "batch_size": 7, "mode": "cc12m_gen", "chunk": 3,
        "num_dialog_rounds": 5, "max_dec_len": 9,
        "start_path_q": "other_q.ckpt", "start_path_a": "other_a.ckpt",
        "temperature": 1.3, "top_k": 1, "top_p": 0.9,
        "ngram_blocking_size": 2,
        "dtype": "bfloat16" if base.dtype == "float32" else "float32",
        "use_pallas": not base.use_pallas, "quantize_memory": True,
        "context_buckets": "64,128", "dynamic_buckets": True,
        "model_parallel": 2,
        # input-data identity: a different dataset file (or a different
        # collation shape) produces a different batch sequence
        "max_seq_len": base.max_seq_len + 64,
        "max_regions": base.max_regions + 1,
        "vocab_path": "other_vocab.txt",
        "visdial_processed_val": "other_val.json",
        "visdial_image_feats": "other.store",
    }
    for field, value in changed.items():
        other = _sidecar_meta(base.replace(**{field: value}), 0, 1, 4)
        assert other != ref, f"{field} change must invalidate the sidecar"
    # cc12m-mode inputs are fingerprinted too
    cc = base.replace(mode="cc12m_gen")
    cc_ref = _sidecar_meta(cc, 0, 1, 4)
    for field in ("cc12m_image_feats", "cc12m_caption",
                  "image_id_to_url", "url_to_cap"):
        other = _sidecar_meta(cc.replace(**{field: "elsewhere.json"}),
                              0, 1, 4)
        assert other != cc_ref, f"{field} must invalidate the sidecar"
    # a REGENERATED same-path input invalidates via its size/mtime
    # fingerprint: resuming across it would splice stale batches
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".json") as tf:
        tf.write("[]")
        tf.flush()
        cc2 = cc.replace(cc12m_caption=tf.name)
        before = _sidecar_meta(cc2, 0, 1, 4)
        os.utime(tf.name, ns=(1, 1))
        assert _sidecar_meta(cc2, 0, 1, 4) != before, \
            "same-path input with a different mtime must invalidate"
    # process identity and item count are part of the meta too
    assert _sidecar_meta(base, 1, 2, 4) != ref
    assert _sidecar_meta(base, 0, 1, 5) != ref
    # an identically-configured run IS resumable
    assert _sidecar_meta(base, 0, 1, 4) == ref
    # data_parallel is deliberately NOT in the identity
    assert _sidecar_meta(base.replace(data_parallel=2), 0, 1, 4) == ref


@pytest.mark.slow
def test_cli_train_gen_steps(cli_env):
    from gstx.cli.train_gen import main

    args, cfg, ckpt = cli_env
    params, opt_state = main(
        args + ["-mode", "vd_train", "-model", "enc_dec_a",
                "-batch_size", "4", "-num_epochs", "1", "-log_every", "1"],
        max_steps=2)
    assert params is not None


def test_cli_train_gen_kill_resume_exact(cli_env, tmp_path_factory):
    """Mid-run preemption recovery (VERDICT r3 #5): -save_every_steps writes
    a rotating step checkpoint; a run killed after it and resumed with
    -continue produces BIT-IDENTICAL params to the uninterrupted run (the
    per-iteration fold_in rng + per-(epoch,index) loader item seeds replay
    the exact sample/dropout stream, incl. across epoch boundaries)."""
    from gstx.cli.train_gen import main

    args, cfg, ckpt = cli_env
    base = ["-mode", "vd_train", "-model", "enc_dec_a", "-batch_size", "4",
            "-num_epochs", "8", "-log_every", "1", "-save_every_steps", "2"]
    dir_a = str(tmp_path_factory.mktemp("uninterrupted"))
    dir_b = str(tmp_path_factory.mktemp("preempted"))

    # strip the fixture save_path and use per-run dirs
    def with_save(path):
        out = list(args)
        i = out.index("-save_path")
        out[i + 1] = path
        return out

    ref_params, _ = main(with_save(dir_a) + base, max_steps=5)

    # "preempted" run: 3 iterations complete (0,1,2) but the step ckpt only
    # captured through iteration 1 (step=2) — iteration 2's work is lost,
    # exactly like a kill between checkpoints
    main(with_save(dir_b) + base, max_steps=3)
    step_ckpt = os.path.join(dir_b, "vd_train_step.ckpt")
    assert os.path.isdir(step_ckpt)

    resumed_params, _ = main(
        with_save(dir_b) + base + ["-start_path", step_ckpt, "-continue"],
        max_steps=3)  # iterations 2,3,4

    import jax
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_params)
    res = dict(jax.tree_util.tree_leaves_with_path(resumed_params))
    assert len(ref_leaves) == len(res)
    for path, leaf in ref_leaves:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(res[path]), err_msg=str(path))


@pytest.mark.slow
def test_cli_train_gen_step_resume_on_epoch_boundary(cli_env,
                                                     tmp_path_factory):
    """A -save_every_steps resume whose stored step lands EXACTLY on an
    epoch boundary processes the boundary iteration exactly once and must
    still write that epoch's named checkpoint: the reference guard
    `iter_id != start_iter_id` (train_gen.py:345) only exists to suppress
    the duplicate save when an EPOCH-ckpt resume replays its stored
    iteration, and must not eat a fresh boundary iteration's save."""
    from gstx.cli.common import build_tokenizer
    from gstx.cli.train_gen import main
    from gstx.core.checkpoint import restore_checkpoint
    from gstx.data.visdial import VisdialGenDataset

    args, cfg, ckpt = cli_env
    ds = VisdialGenDataset(cfg.replace(batch_size=4), build_tokenizer(cfg),
                           mode="vd_train")
    n = max(1, len(ds) // 4)  # num_iter_epoch at batch 4, like the CLI
    base = ["-mode", "vd_train", "-model", "enc_dec_a", "-batch_size", "4",
            "-num_epochs", "4", "-log_every", "1",
            "-save_every_steps", str(n)]
    dir_a = str(tmp_path_factory.mktemp("boundary_uninterrupted"))
    dir_b = str(tmp_path_factory.mktemp("boundary_preempted"))

    def with_save(path):
        out = list(args)
        i = out.index("-save_path")
        out[i + 1] = path
        return out

    epoch1 = "vd_train__1.ckpt"  # written after processing iteration n
    main(with_save(dir_a) + base, max_steps=n + 1)
    assert os.path.isdir(os.path.join(dir_a, epoch1))

    # preempted run: stops after iteration n-1; the step ckpt stores
    # step=n — exactly the epoch boundary
    main(with_save(dir_b) + base, max_steps=n)
    step_ckpt = os.path.join(dir_b, "vd_train_step.ckpt")
    assert os.path.isdir(step_ckpt)
    assert not os.path.isdir(os.path.join(dir_b, epoch1))

    # resume processes iteration n (fresh, exactly once) and must save the
    # epoch-1 checkpoint, bit-identical to the uninterrupted run's
    main(with_save(dir_b) + base + ["-start_path", step_ckpt, "-continue"],
         max_steps=1)
    assert os.path.isdir(os.path.join(dir_b, epoch1))
    pa = restore_checkpoint(os.path.join(dir_a, epoch1))["params"]
    pb = restore_checkpoint(os.path.join(dir_b, epoch1))["params"]
    import jax
    la = jax.tree_util.tree_leaves_with_path(pa)
    lb = dict(jax.tree_util.tree_leaves_with_path(pb))
    assert len(la) == len(lb)
    for path, leaf in la:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(lb[path]), err_msg=str(path))


@pytest.mark.slow
def test_cli_train_disc_kill_resume_exact(cli_env, tmp_path_factory):
    """Same preemption-recovery contract for the discriminative trainer."""
    from gstx.cli.train_disc import main

    args, cfg, ckpt = cli_env
    base = ["-mode", "vd_train", "-model", "enc_only_a", "-batch_size", "4",
            "-num_epochs", "8", "-log_every", "1", "-save_every_steps", "2"]
    dir_a = str(tmp_path_factory.mktemp("disc_uninterrupted"))
    dir_b = str(tmp_path_factory.mktemp("disc_preempted"))

    def with_save(path):
        out = list(args)
        i = out.index("-save_path")
        out[i + 1] = path
        return out

    ref_params, _ = main(with_save(dir_a) + base, max_steps=5)
    main(with_save(dir_b) + base, max_steps=3)
    # '_disc' suffix: must not collide with the gen trainer's step ckpt
    # under a shared save_path (both trainers run -mode vd_train)
    step_ckpt = os.path.join(dir_b, "vd_train_disc_step.ckpt")
    assert os.path.isdir(step_ckpt)
    resumed_params, _ = main(
        with_save(dir_b) + base + ["-start_path", step_ckpt, "-continue"],
        max_steps=3)

    import jax
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_params)
    res = dict(jax.tree_util.tree_leaves_with_path(resumed_params))
    assert len(ref_leaves) == len(res)
    for path, leaf in ref_leaves:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(res[path]), err_msg=str(path))


@pytest.mark.slow
def test_cli_train_disc_steps(cli_env):
    from gstx.cli.train_disc import main

    args, cfg, ckpt = cli_env
    params, opt_state = main(
        args + ["-mode", "vd_train", "-model", "enc_only_a",
                "-batch_size", "4", "-num_epochs", "1", "-log_every", "1"],
        max_steps=2)
    assert params is not None


@pytest.mark.slow
def test_cli_inference_repl(cli_env):
    from gstx.cli.inference import main

    args, cfg, ckpt = cli_env
    transcript = []
    questions = iter(["is there a dog", "what color is it"])

    def fake_input(prompt):
        try:
            return next(questions)
        except StopIteration:
            raise EOFError

    main(args + ["-start_path", ckpt, "-max_dec_len", "6"],
         input_fn=fake_input, output_fn=transcript.append, max_turns=2)
    bot_lines = [l for l in transcript if l.startswith("bot:")]
    assert len(bot_lines) == 2


@pytest.mark.slow
def test_cli_attack_fgsm(cli_env):
    from gstx.cli.evaluate_gen_attack import main

    args, cfg, ckpt = cli_env
    metrics = main(args + ["-mode", "vd_eval_val", "-attack", "fgsm",
                           "-start_path", ckpt],
                   max_batches=1)
    assert "mrr" in metrics and "ndcg" in metrics


@pytest.mark.slow
def test_cli_attack_fgsm_mesh_identity(cli_env):
    """DP-meshed attack eval (reference evaluate_gen_attack.py:410
    DataParallel) == single-device, including the chunk-padding path
    (dp=4 does not divide the 10-candidate chunks)."""
    from gstx.cli.evaluate_gen_attack import main

    args, cfg, ckpt = cli_env
    base = ["-mode", "vd_eval_val", "-attack", "fgsm", "-start_path", ckpt]
    single = main(args + base + ["-data_parallel", "1"], max_batches=2)
    meshed = main(args + base + ["-data_parallel", "4"], max_batches=2)
    assert set(single) == set(meshed)
    for k, v in single.items():
        np.testing.assert_allclose(meshed[k], v, rtol=1e-5, atol=1e-7,
                                   err_msg=k)


@pytest.mark.slow
def test_cli_attack_random_token(cli_env):
    from gstx.cli.evaluate_gen_attack import main

    args, cfg, ckpt = cli_env
    metrics = main(args + ["-mode", "vd_eval_val", "-attack", "random_token",
                           "-start_path", ckpt, "-mask_prob", "0.3"],
                   max_batches=1)
    assert "mrr" in metrics


@pytest.mark.slow
def test_cli_train_gen_cc12m_chunks(cli_env, tmp_path_factory):
    """cc12m_train mode: chunked synthetic-dialog training with ppl
    selection (train_gen.py:160-178 layout)."""
    import numpy as np
    from fixtures import make_cc12m_dialog_json
    from gstx.data.feature_store import make_synthetic_store
    from gstx.cli.train_gen import main

    args, cfg, ckpt = cli_env
    root = str(tmp_path_factory.mktemp("cc12m"))
    feat_dir = os.path.join(root, "feats")
    dlg_dir = os.path.join(root, "dialogs")
    os.makedirs(feat_dir)
    os.makedirs(os.path.join(dlg_dir, "iter1"))
    for c in range(2):
        ids = [3000 + 10 * c + i for i in range(3)]
        make_synthetic_store(
            os.path.join(feat_dir, f"cc12m_img_feat_{c}.store"), ids,
            num_boxes=12, feat_dim=16, num_classes=11)
        data = make_cc12m_dialog_json(
            os.path.join(dlg_dir, "iter1", f"cc12m_dialogs_{c}.txt"), 3,
            seed=c)
        # rewrite image ids to match the per-chunk store
        import json as _json
        for rec, img in zip(data, ids):
            rec["image_id"] = img
        _json.dump(data, open(
            os.path.join(dlg_dir, "iter1", f"cc12m_dialogs_{c}.txt"), "w"))

    params, opt_state = main(
        args + ["-mode", "cc12m_train", "-model", "enc_dec_a",
                "-chunk", "2", "-iter", "1", "-select_data",
                "-cc12m_image_feats", feat_dir + "/",
                "-cc12m_processed_train", dlg_dir + "/",
                "-batch_size", "4", "-num_epochs", "1", "-log_every", "1"],
        max_steps=2)
    assert params is not None


@pytest.mark.slow
def test_cli_attack_coreference(cli_env, tmp_path_factory):
    """Coreference attack CLI with synthetic cos-sim + dependency data."""
    import pickle

    import numpy as np

    from gstx.cli.evaluate_gen_attack import main

    args, cfg, ckpt = cli_env
    root = str(tmp_path_factory.mktemp("coref"))
    # synthetic counter-fitted similarity: 'dog'~'horse'
    idx2word = {0: "dog", 1: "horse", 2: "man"}
    word2idx = {w: i for i, w in idx2word.items()}
    sim = np.asarray([[1.0, 0.8, 0.1], [0.8, 1.0, 0.2], [0.1, 0.2, 1.0]],
                     np.float32)
    cos_npy = os.path.join(root, "cos.npy")
    np.save(cos_npy, sim)
    i2w = os.path.join(root, "i2w.pickle")
    w2i = os.path.join(root, "w2i.pickle")
    pickle.dump(idx2word, open(i2w, "wb"))
    pickle.dump(word2idx, open(w2i, "wb"))
    # dependency file: one record per val dialog, 10 per-round dicts
    dep_path = os.path.join(root, "coref.json")
    deps = [{"image_id": 1000 + d,
             "coreference": [{"1": "dog"} for _ in range(10)]}
            for d in range(4)]
    json.dump(deps, open(dep_path, "w"))

    metrics = main(args + [
        "-mode", "vd_eval_val", "-attack", "coreference",
        "-start_path", ckpt,
        "-cos_sim_counter_fitting", cos_npy,
        "-cos_sim_idx2word", i2w, "-cos_sim_word2idx", w2i,
        "-visdial_processed_val_coref_dependency", dep_path,
    ], max_batches=1)
    assert "mrr" in metrics and "ndcg" in metrics


def test_evaluators_skip_on_secondary_processes(monkeypatch):
    """Under a jax.distributed launch the evaluator CLIs run on process 0
    only (local-device mesh, shared output files) — secondary processes
    return None before touching data or files."""
    import jax

    from gstx.cli import evaluate_disc, evaluate_gen, evaluate_gen_attack

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    args = ["-mode", "vd_eval_val", "-start_path", "unused.ckpt"]
    assert evaluate_gen.main(list(args)) is None
    assert evaluate_disc.main(args + ["-model", "enc_only_a"]) is None
    assert evaluate_gen_attack.main(list(args)) is None


def test_boolean_flag_pairs():
    """Every boolean config field has a working -X / -no_X switch pair, so
    default-True fields (remat, use_pallas) are controllable from any CLI;
    -continue is an explicit alias for -continue_training."""
    assert parse_config([]).use_pallas is True
    assert parse_config([]).remat is True
    cfg = parse_config(["-no_use_pallas", "-no_remat", "-dynamic_buckets"])
    assert cfg.use_pallas is False
    assert cfg.remat is False
    assert cfg.dynamic_buckets is True
    assert parse_config(["-continue"]).continue_training is True
    assert parse_config(["-overfit"]).overfit is True
    assert parse_config(["-no_overfit"]).overfit is False


@pytest.mark.slow
def test_cli_generate_multihost_striping(cli_env, monkeypatch):
    """Multi-host generate: each process reads only its dataset stripe and
    writes a per-process output shard (generate is embarrassingly parallel
    over images — no cross-host collectives, see make_generation_mesh)."""
    from gstx.cli import generate as gen_mod
    from gstx.cli.generate import main

    args, cfg, ckpt = cli_env
    monkeypatch.setattr(gen_mod, "_process_info", lambda: (1, 2))
    gen = main(args + ["-mode", "vd_gen_val", "-save_name", "mh.json",
                       "-start_path_q", ckpt, "-start_path_a", ckpt,
                       "-batch_size", "2", "-num_dialog_rounds", "1",
                       "-max_dec_len", "4"],
               max_batches=1)
    out_path = os.path.join(cfg.save_path, "mh.proc1.json")
    assert os.path.exists(out_path)
    data = json.load(open(out_path))
    assert data == gen
    # the 4-dialog fixture stripes 2 per process; process 1 gets the odd
    # global indices
    assert 0 < len(data) <= 2


def test_bench_retry_transient():
    """bench.py's bounded retry (round 4's driver artifact was lost to ONE
    transient tunnel fault): transient failures re-attempt with linear
    backoff, success stops retrying, and a persistent fault re-raises
    after exactly `attempts` tries."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    sleeps = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("response body closed")
        return 42.0

    assert bench.retry_transient(flaky, attempts=3, base_delay=7.0,
                                 sleep=sleeps.append) == 42.0
    assert calls["n"] == 3
    assert sleeps == [7.0, 14.0]  # linear backoff, none after success

    calls["n"] = 0
    with pytest.raises(RuntimeError):
        bench.retry_transient(
            lambda: (_ for _ in ()).throw(RuntimeError("down")),
            attempts=2, base_delay=0.0, sleep=sleeps.append)

    # zero retries on first-try success
    sleeps.clear()
    assert bench.retry_transient(lambda: "ok", sleep=sleeps.append) == "ok"
    assert sleeps == []


def test_bench_short_answers_bias_preserves_param_tree():
    """Regression: the -short_answers EOS-bias surgery must DEEP-update the
    one lm_bias leaf.  A flax.core.copy with a nested dict merges only the
    top level and silently replaced the whole 'params' subtree (dropping
    the encoder -> ScopeParamNotFoundError at engine time)."""
    import sys

    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from fixtures import init_tiny_params, tiny_enc_dec_configs
    from gstx.core.config import SEP_ID

    enc_cfg, dec_cfg = tiny_enc_dec_configs()
    params = init_tiny_params(enc_cfg, dec_cfg)
    biased = bench.bias_eos_logit(params, SEP_ID, 9.0)
    assert jax.tree_util.tree_structure(biased) == \
        jax.tree_util.tree_structure(params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(biased)[0]):
        assert pa == pb
        a, b = np.asarray(a), np.asarray(b)
        name = str(pa[-1].key if hasattr(pa[-1], "key") else pa[-1])
        if name == "lm_bias":
            np.testing.assert_allclose(b[SEP_ID], a[SEP_ID] + 9.0,
                                       rtol=1e-6)
            mask = np.ones(a.shape, bool)
            mask[SEP_ID] = False
            np.testing.assert_array_equal(a[mask], b[mask])
        else:
            np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_cli_train_gen_overfit_memorizes(tmp_path_factory):
    """Overfit-to-memorization end-to-end (VERDICT r4 #3): train the tiny
    model on the 5-dialog fixture with the reference's ``-overfit`` debug
    semantics (options.py:69, dataloader_visdial_gen.py:24-28) through the
    REAL CLI path until the teacher-forced loss collapses, then restore the
    rotating step CHECKPOINT and greedy KV-cached-decode every training
    round: the generated answers must reproduce the overfit targets
    token-for-token.  This is the offline stand-in for the NDCG north-star:
    the only test that proves the full loop (data -> train -> checkpoint ->
    decode) actually LEARNS, not merely runs."""
    import jax
    import jax.numpy as jnp

    from gstx.cli.common import build_model, build_tokenizer, parse_config
    from gstx.cli.train_gen import main
    from gstx.core.checkpoint import restore_checkpoint
    from gstx.core.config import CLS_ID, PAD_ID, SEP_ID
    from gstx.data.visdial import VisdialGenDataset
    from gstx.decode.sampler import (DecodeSettings, init_cache,
                                     sample_sequence)
    from gstx.models.encdec import GSTVisualDialog, teacher_forced_loss

    tmpdir = str(tmp_path_factory.mktemp("overfit"))
    # 5 dialogs: the overfit dataset pins len() to 5 like the reference's
    # numDataPoints (dataloader_visdial_gen.py:24-28)
    args, cfg0 = make_cli_env(tmpdir, num_dialogs=5)
    # memorization-friendly fixture variants (probed in PERF-round-5
    # sessions): distinct question/answer pools (the default 30/40 pools
    # guarantee cross-dialog question collisions, forcing slow history-
    # based disambiguation — loss plateaus ~0.3 instead of ~0.1) and zero
    # dropout (with 0.1 the train loss floors at ~0.8 and greedy decode
    # stays noisy)
    from fixtures import make_visdial_json

    make_visdial_json(cfg0.visdial_processed_train, 5, num_questions=500,
                      num_answers=500, seed=0)
    for name in ("enc.json", "dec.json"):
        p = os.path.join(tmpdir, name)
        d = json.load(open(p))
        d["hidden_dropout_prob"] = 0.0
        d["attention_probs_dropout_prob"] = 0.0
        json.dump(d, open(p, "w"))
    # batch_size 5 = the dataset size: the loader drops partial batches, so
    # a larger batch would yield ZERO iterations; -batch_multiply 5 makes
    # each optimizer step a 5-micro-batch accumulated gradient (25 row
    # draws over the 50-row grid).  The trainer's reference-exact
    # t_total = num_iter_epoch*100 (train_gen.py:179) turns the -min_lr
    # floor into a two-phase schedule: 3e-3 through ~step 100, then the
    # 1e-3 floor anneals the row-subsampling bounce.
    train_args = args + [
        "-mode", "vd_train", "-model", "enc_dec_a", "-overfit",
        "-batch_size", "5", "-batch_multiply", "5",
        "-num_epochs", "100000", "-log_every", "100",
        "-lr", "3e-3", "-image_lr", "3e-3", "-min_lr", "1e-3",
        "-warmup_steps", "20", "-save_every_steps", "50"]
    steps = int(os.environ.get("GSTX_OVERFIT_STEPS", "500"))
    main(train_args, max_steps=steps)

    # decode from the CHECKPOINT, not the in-memory params: the assertion
    # must cover the save/restore leg of the loop too
    step_ckpt = os.path.join(cfg0.save_path, "vd_train_step.ckpt")
    assert os.path.isdir(step_ckpt)
    params = restore_checkpoint(step_ckpt)["params"]

    cfg = parse_config(train_args)
    model, _, dec_cfg = build_model(cfg)
    ds = VisdialGenDataset(cfg, build_tokenizer(cfg), mode="vd_train")
    assert len(ds) == 5

    # every (dialog, round) context row, exactly as trained (train items
    # are built with mask_prob=0, so decode conditioning == train
    # conditioning)
    cols = {k: [] for k in ("enc_input_ids", "enc_segments", "enc_att_mask",
                            "dec_input_ids", "dec_att_mask", "dec_labels")}
    imgs = {k: [] for k in ("enc_image_feat", "enc_image_loc",
                            "enc_image_mask")}
    for i in range(len(ds)):
        item = ds.__getitem__(i, seed=0)
        rounds = item["enc_input_ids"].shape[0]
        for k in cols:
            cols[k].append(item[k][:, 0])          # [rounds, L]
        for k in imgs:
            imgs[k].append(np.repeat(item[k][None], rounds, axis=0))
    rows = {k: np.concatenate(v) for k, v in
            list(cols.items()) + list(imgs.items())}

    b = rows["enc_input_ids"].shape[0]
    t = rows["dec_labels"].shape[1]

    # teacher-forced loss on the trained rows must have collapsed
    logits = model.apply(
        params, rows["enc_input_ids"], rows["enc_image_feat"],
        rows["enc_image_loc"], rows["enc_segments"], rows["enc_att_mask"],
        rows["enc_image_mask"], rows["dec_input_ids"], rows["dec_att_mask"],
        method=GSTVisualDialog.score)
    loss = float(teacher_forced_loss(jnp.asarray(logits),
                                     jnp.asarray(rows["dec_labels"])))
    assert loss < 0.15, f"teacher-forced loss did not collapse: {loss:.3f}"

    mem_kv, mem_mask = model.apply(
        params, rows["enc_input_ids"], rows["enc_image_feat"],
        rows["enc_image_loc"], rows["enc_segments"], rows["enc_att_mask"],
        rows["enc_image_mask"], method=GSTVisualDialog.decode_prepare)

    def step_fn(tok, pos, caches):
        return model.apply(params, tok, pos, caches, mem_kv, mem_mask,
                           method=GSTVisualDialog.decode_step)

    got = np.asarray(sample_sequence(
        step_fn, jax.random.PRNGKey(0), b, init_cache(dec_cfg, b, t + 1),
        DecodeSettings(max_steps=t, temperature=1.0, top_k=1,
                       ngram_blocking_size=0),
        bos_id=CLS_ID, eos_id=SEP_ID))

    # expected: the labels row up to and including its SEP, PAD after
    mismatched = []
    usable = 0
    for r in range(b):
        labels = rows["dec_labels"][r]
        sep = np.nonzero(labels == SEP_ID)[0]
        if len(sep) == 0:       # truncated target: no full answer to check
            continue
        usable += 1
        want = labels.copy()
        want[sep[0] + 1:] = PAD_ID
        if not np.array_equal(got[r], want):
            mismatched.append(r)
    assert usable >= 40         # 5 dialogs x 10 rounds, minus truncations
    assert not mismatched, (
        f"{len(mismatched)}/{usable} rows not memorized after {steps} "
        f"steps (loss {loss:.4f}); first: row {mismatched[0]}\n"
        f"got  {got[mismatched[0]]}\n"
        f"want {rows['dec_labels'][mismatched[0]]}")
