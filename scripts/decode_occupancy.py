"""Realistic-regime decode occupancy probe (PERF.md round 5, VERDICT r4 #4).

The early-EOS while_loop (`gstx/decode/sampler.py::sample_sequence`) exits
only when EVERY lane has emitted EOS, so each decode's executed step count
is the per-batch MAX exit step while useful work is the per-lane MEAN.
This script runs the production engine in the short-answer regime
(`bench.py -short_answers`: EOS logit biased so utterances are 3-7 tokens,
emulating a trained checkpoint) and computes, from the generated sequences
themselves (first-SEP position +1; pad_after_eos makes that the lane's
exit step), the per-lane exit-step distribution vs the batch-max exit —
no loop instrumentation needed.

Reported per decode call (2 per round: question + answer):
  mean / p50 / p90 / max exit step, and the idle-lane fraction
  1 - mean/max (the share of executed decode-step work wasted on lanes
  that already finished).  Aggregated over rounds into the headline
  "decode-step waste" number, plus the engine-level bound: decode steps
  are only part of the round (re-encode + cross-KV + ppl), so the
  end-to-end ceiling from any occupancy fix is also printed using the
  round phase split measured in PERF.md round 3.
"""
import argparse
import collections
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import bias_eos_logit
from gstx.core.config import CLS_ID, SEP_ID, DecoderConfig, EncoderConfig
from gstx.decode.dialog_engine import make_dialog_engine
from gstx.decode.sampler import DecodeSettings
from gstx.models.encdec import GSTVisualDialog

parser = argparse.ArgumentParser()
parser.add_argument("-batch_size", type=int, default=96)
parser.add_argument("-rounds", type=int, default=10)
parser.add_argument("-batches", type=int, default=4)
parser.add_argument("-eos_bias", type=float, default=9.0,
                    help="bench.py -short_answers uses 9.0 (3-7 tok answers)")
args = parser.parse_args()

from gstx.kernels import ffn as _pf
_pf.enable(True)

enc_cfg, dec_cfg = EncoderConfig(), DecoderConfig()
dtype = jnp.bfloat16
model = GSTVisualDialog(enc_cfg, dec_cfg, dtype=dtype)
B, S, R, T = args.batch_size, 256, 37, 25
rng_np = np.random.RandomState(0)
print(f"devices={jax.devices()} batch={B} eos_bias={args.eos_bias}",
      flush=True)

init_batch = dict(
    input_ids=jnp.ones((B, S), jnp.int32),
    image_feat=jnp.ones((B, R, enc_cfg.v_feature_size), dtype),
    image_loc=jnp.ones((B, R, 5), dtype),
    token_type_ids=jnp.zeros((B, S), jnp.int32),
    attention_mask=jnp.ones((B, S), jnp.int32),
    image_attention_mask=jnp.ones((B, R), jnp.int32),
    dec_input_ids=jnp.ones((B, T), jnp.int32),
    dec_attention_mask=jnp.ones((B, T), jnp.int32))
t0 = time.time()
params = model.init(jax.random.PRNGKey(0), **init_batch,
                    method=GSTVisualDialog.init_all)
if args.eos_bias:
    params = bias_eos_logit(params, SEP_ID, args.eos_bias)
print(f"init {time.time()-t0:.1f}s", flush=True)

ids = np.zeros((B, S), np.int32)
segs = np.zeros((B, S), np.int32)
cap_len = 20
ids[:, 0] = CLS_ID
ids[:, 1:cap_len - 1] = rng_np.randint(1000, 20000, size=(B, cap_len - 2))
ids[:, cap_len - 1] = SEP_ID
segs[:, :cap_len] = 1
batch = {
    "enc_input_ids": jnp.asarray(ids),
    "enc_segments": jnp.asarray(segs),
    "enc_image_feat": jnp.asarray(
        rng_np.rand(B, R, enc_cfg.v_feature_size), dtype),
    "enc_image_loc": jnp.asarray(rng_np.rand(B, R, 5), dtype),
    "enc_image_mask": jnp.ones((B, R), jnp.float32),
}

MAX_STEPS = 18
engine = make_dialog_engine(
    model, dec_cfg, num_rounds=args.rounds,
    q_settings=DecodeSettings(max_steps=MAX_STEPS, temperature=0.7, top_k=7,
                              top_p=0.0, ngram_blocking_size=4,
                              fused_sampler=True),
    a_settings=DecodeSettings(max_steps=MAX_STEPS, temperature=0.7, top_k=7,
                              top_p=0.0, ngram_blocking_size=0,
                              fused_sampler=True),
    dtype=dtype, context_buckets=(128, 192), dynamic_buckets=True)


def exit_steps(seq):
    """[B, T] sampled tokens (PAD after first SEP) -> per-lane exit step.

    A lane that emitted SEP at position j ran j+1 decode steps; a lane
    with no SEP ran (and needed) all MAX_STEPS."""
    has = (seq == SEP_ID).any(axis=-1)
    first = np.argmax(seq == SEP_ID, axis=-1)
    return np.where(has, first + 1, MAX_STEPS)


per_call = []  # (round, stream, exits[B])
for i in range(args.batches):
    out = engine(params, params, batch, jax.random.PRNGKey(100 + i))
    q = np.asarray(out.questions)  # [B, rounds, T]
    a = np.asarray(out.answers)
    for r in range(args.rounds):
        per_call.append(("q", r, exit_steps(q[:, r])))
        per_call.append(("a", r, exit_steps(a[:, r])))
print(f"collected {len(per_call)} decode calls "
      f"({args.batches} batches x {args.rounds} rounds x 2)", flush=True)

hist = collections.Counter()
tot_exec = tot_useful = 0
rows = []
for stream, r, ex in per_call:
    hist.update(ex.tolist())
    mx = int(ex.max())
    tot_exec += mx * len(ex)
    tot_useful += int(ex.sum())
    rows.append((stream, r, float(ex.mean()), int(np.percentile(ex, 50)),
                 int(np.percentile(ex, 90)), mx))

print("\nper-lane exit-step histogram (all calls):")
for step in sorted(hist):
    n = hist[step]
    print(f"  {step:3d}: {'#' * max(1, n * 60 // max(hist.values()))} {n}")

agg = {}
for stream, r, mean, p50, p90, mx in rows:
    agg.setdefault(stream, []).append((mean, mx))
print("\nstream round-avg: " + "  ".join(
    f"{s}: mean_exit={np.mean([m for m, _ in v]):.2f} "
    f"mean_batchmax={np.mean([x for _, x in v]):.2f}"
    for s, v in agg.items()))

waste = 1 - tot_useful / tot_exec
print(f"\nexecuted lane-steps={tot_exec}  useful={tot_useful}  "
      f"idle-lane fraction={waste*100:.1f}%")
# engine-level ceiling: decode steps are DEC_SHARE of the short-answer
# round wall (rest: re-encode, cross-KV precompute, answer-ppl, buckets);
# perfect occupancy could at most save waste*DEC_SHARE end-to-end
for dec_share in (0.4, 0.6, 0.8):
    print(f"  if decode steps are {dec_share:.0%} of round wall -> "
          f"e2e ceiling from perfect occupancy {waste*dec_share*100:.1f}%")
