"""End-to-end `cli/generate` throughput on the REAL chip (VERDICT r2 #2).

bench.py measures the device-resident engine; the real workload
(/root/reference/generate.py:91-258) also reads region features from the
store, runs WordPiece on captions, pads/collates batches on the host, and
writes the dialog JSON.  This script measures that full path:

  1. builds a synthetic CC12M chunk at production shape (2048-d features x
     37 boxes per image, ~300 KB/image; random 20-word captions over a
     synthetic 30522-entry WordPiece vocab) plus a random-init checkpoint;
  2. runs `gstx.cli.generate.main` once (long) and reports the
     steady-state rate from the CLI's rolling 10-batch windows, skipping
     the first window — per-invocation startup (trace + tunnel compile-
     cache loads) varies by minutes and made a warm/full subtraction
     meaningless (two measured attempts; see PERF.md round 3).

Usage: python scripts/generate_bench.py [-n_batches 41] [-batch_size 96]
"""

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPECIALS = ["[PAD]", "[unused0]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]


def build_vocab(path, size=30522):
    """bert-base-sized synthetic vocab with the specials at their reference
    ids (PAD=0, UNK=100, CLS=101, SEP=102, MASK=103)."""
    words = []
    for i in range(size):
        if i == 0:
            words.append("[PAD]")
        elif i == 100:
            words.append("[UNK]")
        elif i == 101:
            words.append("[CLS]")
        elif i == 102:
            words.append("[SEP]")
        elif i == 103:
            words.append("[MASK]")
        elif i < 100:
            words.append(f"[unused{i}]")
        else:
            words.append(f"tok{i:05d}")
    with open(path, "w") as f:
        f.write("\n".join(words))
    return [w for w in words if w.startswith("tok")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n_batches", type=int, default=41)
    ap.add_argument("-batch_size", type=int, default=96)
    ap.add_argument("-num_dialog_rounds", type=int, default=0,
                    help="override rounds (6 keeps worst-case contexts "
                         "under max_seq_len so dialog JSON really writes)")
    ap.add_argument("-root", type=str, default="/tmp/gstx_gen_bench")
    ap.add_argument("-flush_every", type=int, default=-1,
                    help="forwarded to cli/generate when >=0 (A/B the "
                         "preemption-recovery sidecar's host cost)")
    # unknown flags forward verbatim to cli/generate (e.g.
    # -no_host_prefetch for the round-4 upload-overlap A/B)
    args, passthrough = ap.parse_known_args()

    root = args.root
    os.makedirs(root, exist_ok=True)
    n_images = args.n_batches * args.batch_size

    vocab_path = os.path.join(root, "vocab.txt")
    words = build_vocab(vocab_path)

    store_path = os.path.join(root, "cc12m_feat.store")
    cap_path = os.path.join(root, "captions.json")
    if not (os.path.exists(store_path)
            and os.path.exists(cap_path)
            and len(json.load(open(cap_path))) == n_images):
        from gstx.data.feature_store import make_synthetic_store

        t0 = time.time()
        ids = list(range(1, n_images + 1))
        make_synthetic_store(store_path, ids, num_boxes=37, feat_dim=2048,
                             num_classes=1601)
        rng = np.random.RandomState(0)
        caps = [{"image_id": i,
                 "caption": " ".join(rng.choice(words, size=20))}
                for i in ids]
        json.dump(caps, open(cap_path, "w"))
        print(f"[gen-bench] built {n_images}-image chunk "
              f"({os.path.getsize(store_path) / 1e9:.2f} GB) "
              f"in {time.time() - t0:.0f}s", file=sys.stderr)

    ckpt_path = os.path.join(root, "ckpt")
    if not os.path.isdir(ckpt_path):
        from gstx.cli.common import build_model, init_params, parse_config
        from gstx.core.checkpoint import save_checkpoint

        cfg0 = parse_config(["-vocab_path", vocab_path])
        model, _, _ = build_model(cfg0)
        params = init_params(model, cfg0, seed=0)
        save_checkpoint(ckpt_path, params, step=0)
        print("[gen-bench] checkpoint written", file=sys.stderr)

    from gstx.cli.generate import main as generate_main

    out = os.path.join(root, "out")
    if os.path.isdir(out):
        shutil.rmtree(out)
    argv = [
        "-mode", "cc12m_gen", "-save_name", "gen.json",
        "-save_path", out, "-start_path_q", ckpt_path,
        "-start_path_a", ckpt_path, "-vocab_path", vocab_path,
        "-cc12m_image_feats", store_path, "-cc12m_caption", cap_path,
        "-batch_size", str(args.batch_size), "-num_workers", "8",
        "-context_buckets", "128,192",
    ]
    if args.num_dialog_rounds:
        argv += ["-num_dialog_rounds", str(args.num_dialog_rounds)]
    if args.flush_every >= 0:
        argv += ["-flush_every", str(args.flush_every)]
    argv += passthrough
    stats = {}
    t0 = time.time()
    gen = generate_main(argv, max_batches=args.n_batches, stats_out=stats)
    dt = time.time() - t0
    print(f"[gen-bench] {args.n_batches} batches in {dt:.1f}s "
          f"({len(gen)} dialog records)", file=sys.stderr)
    windows = stats.get("windows", [])[1:]  # drop the startup window
    if not windows:
        raise SystemExit("need >=21 batches for a steady-state window")
    images = sum(w[0] for w in windows)
    steady = sum(w[1] for w in windows)
    img_s = images / steady
    rounds = args.num_dialog_rounds or 10
    # tokens metric comparable to bench.py: 36 generated tokens per round
    print(json.dumps({
        "metric": "end-to-end cli/generate images/sec/chip",
        "value": round(img_s, 2),
        "tokens_per_sec": round(img_s * 36 * rounds, 1),
        "unit": "img/s",
        "steady_images": images,
        "batch_size": args.batch_size,
        "steady_seconds": round(steady, 1),
        "dialog_records_written": len(gen),
    }))


if __name__ == "__main__":
    main()
