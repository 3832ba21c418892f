"""CLI: synthetic dialog generation (the GST data engine).
Mirrors reference ``generate.py``: a questioner and a teacher (answerer)
model generate 10-round dialogs for every image in a CC12M chunk (or the
VisDial val captions), with on-device answer perplexity, and dump JSON
records {image_id, url, caption, dialog: [{question, answer, answer_ppl}]}.

Abnormal samples (context overflow) are dropped from the output exactly like
``generate.py:236-237``.
"""

from __future__ import annotations

import json
import os
import pprint
import time

import jax
import jax.numpy as jnp
import numpy as np

from gstx.cli.common import (
    apply_runtime_flags,
    build_model,
    build_tokenizer,
    enable_compile_cache,
    load_params,
    make_generation_mesh,
    pad_batch_rows,
    parse_config,
)
from gstx.data.loader import DataLoader
from gstx.decode.dialog_engine import make_dialog_engine
from gstx.decode.sampler import DecodeSettings


def _process_info():
    """(process_index, process_count) — seam so tests can simulate a
    multi-host run without confusing orbax/multihost_utils."""
    return jax.process_index(), jax.process_count()


def _file_fp(path):
    """Freshness fingerprint of an input file: [size, mtime_ns], or None
    when absent.  Catches a regenerated same-path input (different
    contents => different batches) without hashing terabyte stores."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    return [st.st_size, st.st_mtime_ns]


def _sidecar_meta(config, proc_idx, proc_count, n_items):
    """Identity of a generation run: a partial sidecar is only resumable by
    a run that would produce the identical batch sequence.  Every setting
    that can change the generated tokens is part of the identity — data
    selection (seed/batch/mode/chunk/ckpts), decode semantics (rounds,
    length, sampling, n-gram blocking), numerics (dtype, kernels,
    quantization, bucket schedule, tensor-parallel degree, which drifts
    bf16 reductions), and the INPUT DATA itself (paths + size/mtime
    fingerprints: a regenerated same-path caption/feature/vocab file
    changes the batch sequence without changing any flag, and resuming
    across it would silently splice stale batches into the output).
    ``data_parallel`` is deliberately absent: mesh data-sharding is pinned
    bitwise-identical to single-device by tests/test_dialog_engine_mesh.py,
    so resuming across a different DP degree is safe."""
    if config.mode == "cc12m_gen":
        data_paths = [config.cc12m_image_feats, config.cc12m_caption,
                      config.image_id_to_url, config.url_to_cap]
    else:
        data_paths = [config.visdial_processed_val,
                      config.visdial_image_feats]
    return {
        "seed": config.seed,
        "batch_size": config.batch_size,
        "mode": config.mode,
        "chunk": config.chunk,
        "num_dialog_rounds": config.num_dialog_rounds,
        "max_dec_len": config.max_dec_len,
        "start_path_q": config.start_path_q,
        "start_path_a": config.start_path_a,
        "temperature": config.temperature,
        "top_k": config.top_k,
        "top_p": config.top_p,
        "ngram_blocking_size": config.ngram_blocking_size,
        "fused_sampler": config.fused_sampler,
        "dtype": config.dtype,
        "use_pallas": config.use_pallas,
        "quantize_memory": config.quantize_memory,
        "context_buckets": config.context_buckets,
        "dynamic_buckets": config.dynamic_buckets,
        "model_parallel": config.model_parallel,
        "process": [proc_idx, proc_count],
        "n_items": n_items,
        "max_seq_len": config.max_seq_len,
        "max_regions": config.max_regions,
        "vocab_path": config.vocab_path,
        "inputs": {p: _file_fp(p) for p in [config.vocab_path] + data_paths},
    }


def _load_sidecar(path, meta):
    """(start_batch, per_batch_records) recovered from a partial sidecar:
    the contiguous completed-batch prefix.  Returns (0, []) when the file is
    absent, empty, or written by a different run (meta mismatch).  A torn
    trailing line (preemption mid-append) is ignored."""
    if not os.path.exists(path):
        return 0, []
    lines = open(path).read().splitlines()
    if not lines:
        return 0, []
    try:
        head = json.loads(lines[0])
    except json.JSONDecodeError:
        return 0, []
    if head.get("meta") != meta:
        print(f"[generate] ignoring sidecar {path}: meta mismatch "
              "(written by a different run)")
        return 0, []
    done = {}
    for ln in lines[1:]:
        try:
            row = json.loads(ln)
        except json.JSONDecodeError:
            break  # torn tail from a mid-append preemption
        done[row["batch"]] = row["records"]
    batches = []
    while len(batches) in done:
        batches.append(done[len(batches)])
    return len(batches), batches


def _prefetch(src, prepare, depth):
    """Run ``prepare`` over ``src`` on a daemon thread, ``depth`` items
    ahead of the consumer.  ``prepare`` does the host-side batch work —
    padding, bf16 cast, ``jax.device_put`` — so the feature upload of batch
    i+1 overlaps batch i's device rounds (the host pipeline the reference
    hides in DataLoader workers, train_gen.py:184).  JAX transfers are
    thread-safe; only the MAIN thread ever dispatches the engine.  An
    exception in ``prepare`` re-raises at the consumer."""
    import queue as queue_mod
    import threading

    q = queue_mod.Queue(maxsize=max(1, depth))
    err = []
    stop = threading.Event()  # consumer died: unblock + drain the worker

    def put(item):
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def work():
        try:
            for idx, batch in src:
                if not put(prepare(idx, batch)):
                    return
        except BaseException as e:  # re-raised below, incl. KeyboardInterrupt
            err.append(e)
        finally:
            put(None)

    threading.Thread(target=work, daemon=True,
                     name="gstx-generate-prefetch").start()
    try:
        while True:
            item = q.get()
            if item is None:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # engine failure (or generator close) while the queue is full: the
        # worker would otherwise block in q.put forever, pinning up to
        # `depth` prepared batches of device arrays for the process
        # lifetime (pytest / selftrain call main() repeatedly)
        stop.set()
        while True:
            try:
                q.get_nowait()
            except queue_mod.Empty:
                break


def main(argv=None, max_batches=None, stats_out=None, finalize=True):
    """``finalize=False`` stops after the batch loop without the final JSON
    write or sidecar cleanup — the test seam for simulating a preempted run
    (a real preemption kills the process anywhere; the sidecar protocol
    tolerates that via the torn-tail rule in ``_load_sidecar``)."""
    config = parse_config(argv, "gstx dialog generation")
    pprint.pprint(config)
    assert config.mode in ("vd_gen_val", "cc12m_gen")
    assert config.save_name != "", "-save_name is required"
    assert config.start_path_q and config.start_path_a, \
        "-start_path_q and -start_path_a are required"
    os.makedirs(config.save_path, exist_ok=True)
    enable_compile_cache()
    apply_runtime_flags(config)

    tokenizer = build_tokenizer(config)
    if config.mode == "vd_gen_val":
        from gstx.data.visdial import VisdialGenDataset

        dataset = VisdialGenDataset(config, tokenizer, mode="vd_gen_val")
    else:
        from gstx.data.cc12m import CC12mDataset

        dataset = CC12mDataset(config, tokenizer, mode="cc12m_gen")

    # SPMD generation (reference: DataParallel at generate.py:67,77): batch
    # shards over the local mesh's data axis; multi-host runs stripe the
    # dataset per process instead of communicating (see make_generation_mesh)
    mesh = make_generation_mesh(config)
    dp = mesh.shape["data"] if mesh is not None else 1
    model, enc_cfg, dec_cfg = build_model(config, mesh=mesh)
    q_params = load_params(model, config, config.start_path_q)
    a_params = load_params(model, config, config.start_path_a)

    image_id_to_url = {}
    url_to_cap = {}
    if os.path.exists(config.image_id_to_url):
        image_id_to_url = json.load(open(config.image_id_to_url))
    if os.path.exists(config.url_to_cap):
        url_to_cap = json.load(open(config.url_to_cap))

    engine = make_dialog_engine(
        model, dec_cfg, num_rounds=config.num_dialog_rounds,
        q_settings=DecodeSettings(
            max_steps=config.max_dec_len, temperature=config.temperature,
            top_k=config.top_k, top_p=config.top_p,
            ngram_blocking_size=config.ngram_blocking_size,
            fused_sampler=config.fused_sampler),
        a_settings=DecodeSettings(
            max_steps=config.max_dec_len, temperature=config.temperature,
            top_k=config.top_k, top_p=config.top_p, ngram_blocking_size=0,
            fused_sampler=config.fused_sampler),
        dtype=jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32,
        context_buckets=config.context_bucket_tuple(),
        dynamic_buckets=config.dynamic_buckets,
        quantize_memory=config.quantize_memory,
        mesh=mesh)

    proc_idx, proc_count = _process_info()
    loader = DataLoader(dataset, batch_size=config.batch_size, shuffle=False,
                        drop_last=False, num_workers=config.num_workers,
                        seed=config.seed,
                        process_index=proc_idx, process_count=proc_count)
    # per-batch keys are fold_in(seed, batch_idx) rather than a sequential
    # split chain so a resumed run reproduces the uninterrupted token stream
    base_rng = jax.random.PRNGKey(config.seed)

    save_name = config.save_name
    if proc_count > 1:
        # per-host output shard (hosts stripe the dataset independently);
        # the training-side loader reassembles name.procN shards in
        # process order (gstx.data.cc12m.load_dialog_json)
        root, ext = os.path.splitext(save_name)
        save_name = f"{root}.proc{proc_idx}{ext}"
    out_path = os.path.join(config.save_path, save_name)

    # preemption recovery (SURVEY §5 failure/recovery; the reference loses
    # the whole chunk, generate.py:258): completed batches append to a
    # JSONL sidecar; a restart resumes at the first unfinished batch
    sidecar = out_path + ".partial.jsonl" if config.flush_every > 0 else None
    meta = _sidecar_meta(config, proc_idx, proc_count, len(dataset))
    start_batch, recovered = 0, []
    if sidecar and config.resume_generation:
        start_batch, recovered = _load_sidecar(sidecar, meta)
        if start_batch:
            print(f"[generate] resuming at batch {start_batch} "
                  f"({sum(len(b) for b in recovered)} dialogs recovered)")
    if sidecar:
        # (re)write the sidecar as exactly the recovered prefix: normalizes
        # torn tails and stamps the meta header for fresh runs.  Built in a
        # temp file and renamed into place: a second preemption landing
        # DURING this rewrite must not truncate the very progress it is
        # re-serializing (open('w') on the sidecar itself would).
        tmp = sidecar + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps({"meta": meta}) + "\n")
            for b, recs in enumerate(recovered):
                f.write(json.dumps({"batch": b, "records": recs}) + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, sidecar)
    gen_data = [rec for recs in recovered for rec in recs]
    flush_buf = []

    def flush_sidecar():
        if sidecar is None or not flush_buf:
            return
        with open(sidecar, "a") as f:
            for b, recs in flush_buf:
                f.write(json.dumps({"batch": b, "records": recs}) + "\n")
            f.flush()
            os.fsync(f.fileno())
        flush_buf.clear()

    t0 = time.time()
    roll_state = [t0, 0]  # rolling-window rate (compile amortizes out)

    # double-buffered dispatch: batch i+1's rounds launch while batch i's
    # results transfer/decode on the host (JAX async dispatch)
    pending = []

    bf16_upload = config.dtype == "bfloat16"
    if bf16_upload:
        import ml_dtypes
    if mesh is not None:
        from gstx.core.mesh import batch_sharding

        batch_sh = batch_sharding(mesh)

    def to_device(k, v):
        # bf16 engines cast image features/locations to bf16 on device
        # anyway; casting on the HOST first (same f32->bf16 rounding,
        # bitwise-identical outputs) halves the dominant per-batch
        # transfer ([B,37,2048] f32 region features)
        v = np.asarray(v)
        if bf16_upload and v.dtype == np.float32 \
                and k in ("enc_image_feat", "enc_image_loc"):
            v = v.astype(ml_dtypes.bfloat16)
        if mesh is not None:
            # place host->device with the engine's data-axis sharding in
            # ONE transfer; the engine's own shard_batch then no-ops
            # (without this, jnp.asarray commits the whole batch to the
            # default device and the engine reshards it device-to-device)
            return jax.device_put(v, batch_sh)
        return jnp.asarray(v)

    from gstx.core.profiling import annotate

    def prepare(idx, batch):
        """Host-side batch prep: pad, cast, upload, width decision.  Runs
        on the prefetch thread when -host_prefetch (the default), so batch
        i+1's feature transfer rides along batch i's device rounds."""
        # partial final batches pad to a data-axis multiple; padded rows
        # (repeats of row 0) are sliced away in consume
        batch, n_valid = pad_batch_rows(batch, dp)
        dev = {k: to_device(k, v) for k, v in batch.items()
               if k != "image_id"}
        # the bucketed engine's one-per-batch width decision comes from the
        # host-side lengths, skipping a device round-trip that would stall
        # the double-buffered pipeline behind the previous batch's rounds
        init_max = int(
            (np.asarray(batch["enc_input_ids"]) != 0).sum(-1).max())
        return idx, batch, n_valid, dev, init_max

    def dispatch(idx, batch, n_valid, dev, init_max):
        key = jax.random.fold_in(base_rng, idx)
        with annotate("gstx:dispatch_rounds"):
            out = engine(q_params, a_params, dev, key, init_max=init_max)
        pending.append((idx, batch, n_valid, out))

    def drain():
        idx, batch, n_valid, out = pending.pop(0)
        with annotate("gstx:fetch_results"):
            questions = np.asarray(out.questions)[:, :n_valid]
            answers = np.asarray(out.answers)[:, :n_valid]
            ppls = np.asarray(out.answer_ppl)[:, :n_valid]
            abnormal = np.asarray(out.abnormal)[:n_valid]
        consume(idx, batch, questions, answers, ppls, abnormal)

    def consume(idx, batch, questions, answers, ppls, abnormal):
        image_ids = np.asarray(batch["image_id"])[:len(abnormal), 0]
        _collect(idx, image_ids, questions, answers, ppls, abnormal)

    def _collect(idx, image_ids, questions, answers, ppls, abnormal):
        batch_records = []
        for j in range(len(image_ids)):
            if abnormal[j]:
                continue  # generate.py:236-237
            img_id = int(image_ids[j])
            url = image_id_to_url.get(str(img_id), "")
            cap = url_to_cap.get(url, "")
            batch_records.append({
                "image_id": img_id,
                "url": url,
                "caption": cap,
                "dialog": [
                    {
                        "question": tokenizer.decode(
                            [int(t) for t in questions[r, j]],
                            skip_special_tokens=True),
                        "answer": tokenizer.decode(
                            [int(t) for t in answers[r, j]],
                            skip_special_tokens=True),
                        "answer_ppl": float(ppls[r, j]),
                    }
                    for r in range(config.num_dialog_rounds)
                ],
            })
        gen_data.extend(batch_records)
        if sidecar is not None:
            flush_buf.append((idx, batch_records))
            if len(flush_buf) >= config.flush_every:
                flush_sidecar()
        if idx % 10 == 0:
            now = time.time()
            done = (idx + 1 - start_batch) * config.batch_size
            rate = done / (now - t0)
            roll = ((done - roll_state[1]) / (now - roll_state[0])
                    if idx else rate)
            print(f"[generate] {done} images, {rate:.1f} img/s "
                  f"(last window {roll:.1f})")
            if idx and stats_out is not None:
                stats_out.setdefault("windows", []).append(
                    (done - roll_state[1], now - roll_state[0]))
            roll_state[0], roll_state[1] = now, done

    # -trace_dir: device trace of the generation loop (no-op when unset)
    from gstx.core.profiling import trace

    depth = max(1, config.pipeline)

    def batches():
        for idx, batch in enumerate(loader.epoch(0, start_batch=start_batch),
                                    start=start_batch):
            if max_batches is not None and idx >= max_batches:
                return
            yield idx, batch

    if config.host_prefetch:
        prepared = _prefetch(batches(), prepare, depth)
    else:
        prepared = (prepare(i, b) for i, b in batches())
    # closing(): _prefetch's worker shutdown lives in its finally, which an
    # abandoned generator only reaches on GC — an engine exception whose
    # traceback outlives main() (pytest ExceptionInfo, callers that keep the
    # error) would otherwise pin the worker and `depth` prepared device
    # batches; close() runs it deterministically on ANY exit
    import contextlib

    with trace(config.trace_dir), contextlib.closing(prepared):
        for item in prepared:
            dispatch(*item)
            if len(pending) >= depth:
                drain()
        while pending:
            drain()

    if not finalize:
        return gen_data  # simulated preemption: sidecar holds the progress
    flush_sidecar()
    # write-tmp-then-swap (same pattern as checkpoint saves): a kill during
    # the final dump must not leave a torn JSON for the training loader —
    # the sidecar is only removed once the swap has landed
    with open(out_path + ".tmp", "w") as f:
        json.dump(gen_data, f)
    os.replace(out_path + ".tmp", out_path)
    if sidecar is not None and os.path.exists(sidecar):
        os.remove(sidecar)
    print(f"[generate] wrote {len(gen_data)} dialogs to {out_path}")
    return gen_data


if __name__ == "__main__":
    main()
