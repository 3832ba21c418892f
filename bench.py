"""Benchmark: synthetic-dialog generation throughput (the GST north star).

Runs the production-size questioner+teacher dialog engine (12+6+6-layer
encoder, 12-layer decoder, bfloat16, KV-cached decode) on the available
accelerator and reports generated dialog tokens/sec/chip.

Baseline context (BASELINE.md): the reference publishes no benchmark
numbers; the target derived from its workload is generating 10-round dialogs
for 3.6M CC12M images on a v5e-16 in <24h => 3.6e6 images x 10 rounds x
2 utterances x 18 tokens / 86400 s / 16 chips ~= 937.5 generated
tokens/sec/chip.  ``vs_baseline`` is measured throughput / that target
(>1 means the <24h goal is met with margin).

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import numpy as np


TARGET_TOKENS_PER_SEC_PER_CHIP = 3.6e6 * 10 * 2 * 18 / 86400.0 / 16.0


def retry_transient(fn, attempts=3, base_delay=60.0, sleep=time.sleep):
    """Bounded retry for the TPU tunnel's transient transport faults.

    Round 4's driver run died on a single "response body closed before all
    bytes were read" JaxRuntimeError inside the warmup compile
    (BENCH_r04.json rc=1) while a same-day clean re-run measured 12,356
    tok/s/chip — the failure class is transient, so the measured body gets
    `attempts` tries with linear backoff.  Compiles are persistent-cached,
    making retries cheap.  Logs to stderr only; re-raises the last error."""
    for attempt in range(1, attempts + 1):
        try:
            return fn()
        except Exception as e:  # JaxRuntimeError / transport faults
            print(f"[bench] attempt {attempt}/{attempts} failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
            if attempt == attempts:
                raise
            delay = base_delay * attempt
            print(f"[bench] retrying in {delay:.0f}s", file=sys.stderr)
            sleep(delay)


def bias_eos_logit(params, token_id: int, amount: float):
    """Functional DEEP update of the decoder LM bias at one token id.

    flax.core.copy merges only the TOP level, so a nested add_or_replace
    dict would replace the whole 'params' subtree (dropping the encoder)
    — flatten/unflatten updates the one leaf and keeps everything else."""
    import flax.core
    from flax import traverse_util

    flat = traverse_util.flatten_dict(flax.core.unfreeze(params))
    key = ("params", "decoder", "lm_bias")
    flat[key] = flat[key].at[token_id].add(amount)
    return traverse_util.unflatten_dict(flat)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-batch_size", type=int, default=96)
    parser.add_argument("-rounds", type=int, default=10)
    parser.add_argument("-repeats", type=int, default=2)
    parser.add_argument("-cpu", action="store_true",
                        help="force CPU (debug only)")
    parser.add_argument("-pipeline", type=int, default=2,
                        help="batches in flight (cli/generate's double "
                             "buffering); 1 = fully serial")
    parser.add_argument("-context_buckets", type=str, default="128,192",
                        help="comma-separated context widths for early "
                             "rounds; '' disables")
    parser.add_argument("-pallas", type=int, default=1,
                        help="1 = fused pallas FFN/LN kernels (production "
                             "default), 0 = pure-XLA path")
    parser.add_argument("-short_answers", type=int, default=0,
                        help="1 = bias the LM head toward EOS so utterances "
                             "are a few tokens (the real-checkpoint regime; "
                             "exercises early-EOS exit + dynamic buckets)")
    parser.add_argument("-eos_bias", type=float, default=3.0,
                        help="EOS logit bias applied under -short_answers. "
                             "3.0 is the measured 3-7-token regime (mean "
                             "exit ~3.4, per-lane exit histogram in PERF.md "
                             "round 5); the pre-round-5 value 9.0 was "
                             "degenerate (every lane sampled EOS at step 1, "
                             "so decodes exited after ONE step)")
    parser.add_argument("-dynamic_buckets", type=int, default=0,
                        help="1 = pick context buckets from actual lengths "
                             "per round (one host sync each) instead of the "
                             "static worst-case schedule")
    parser.add_argument("-quant", type=int, default=0,
                        help="1 = int8 cross-attention memory (slower in "
                             "the full engine - see PERF.md), 0 = bf16 "
                             "memory (production default)")
    parser.add_argument("-decode_kernel", type=int, default=0,
                        help="1 = pallas int8 decode-step cross-attention "
                             "(measured -23 pct in-engine, PERF.md r3)")
    parser.add_argument("-erf", type=str, default="as7126",
                        choices=("as7126", "as7125", "poly"),
                        help="in-kernel erf implementation for the fused "
                             "FFN (A/B of the VPU tail - PERF.md)")
    parser.add_argument("-fused_sampler", type=int, default=1,
                        help="0 = unfused filter-then-sample chain; 1 "
                             "(default) = fused top-k extract + k-way "
                             "categorical (B*k gumbels instead of B*V; "
                             "+1.9%%/+0.9%% same-session A/Bs, PERF.md r4)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    if args.pallas:
        from gstx.kernels import ffn as _pf
        _pf.enable(True)
        _pf.set_erf_impl(args.erf)
    if args.decode_kernel:
        from gstx.kernels import decode_attn as _da
        _da.enable_kernel(True)

    from gstx.core.config import (CLS_ID, SEP_ID, DecoderConfig,
                                  EncoderConfig)
    from gstx.decode.dialog_engine import make_dialog_engine
    from gstx.decode.sampler import DecodeSettings
    from gstx.models.encdec import GSTVisualDialog

    enc_cfg = EncoderConfig()
    dec_cfg = DecoderConfig()
    dtype = jnp.bfloat16
    model = GSTVisualDialog(enc_cfg, dec_cfg, dtype=dtype)

    B, S, R, T = args.batch_size, 256, 37, 25
    rng_np = np.random.RandomState(0)
    print(f"[bench] devices={jax.devices()} batch={B}", file=sys.stderr)

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
    q_params = model.init(jax.random.PRNGKey(0), **init_batch,
                          method=GSTVisualDialog.init_all)
    a_params = q_params  # same weights; throughput identical, half the HBM
    if args.short_answers:
        # push SEP's logit up so sampled utterances terminate in a few
        # steps, emulating trained-checkpoint behavior (answers 3-7 tokens
        # at the default -eos_bias 3.0)
        q_params = bias_eos_logit(q_params, SEP_ID, args.eos_bias)
        a_params = q_params
    print(f"[bench] init {time.time()-t0:.1f}s", file=sys.stderr)

    # caption-only contexts (dataloader_cc12m_gen.py:82-92 layout)
    ids = np.zeros((B, S), np.int32)
    segs = np.zeros((B, S), np.int32)
    cap_len = 20
    ids[:, 0] = CLS_ID
    ids[:, 1:cap_len - 1] = rng_np.randint(1000, 20000,
                                           size=(B, cap_len - 2))
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

    engine = make_dialog_engine(
        model, dec_cfg, num_rounds=args.rounds,
        q_settings=DecodeSettings(max_steps=18, temperature=0.7, top_k=7,
                                  top_p=0.0, ngram_blocking_size=4,
                                  fused_sampler=bool(args.fused_sampler)),
        a_settings=DecodeSettings(max_steps=18, temperature=0.7, top_k=7,
                                  top_p=0.0, ngram_blocking_size=0,
                                  fused_sampler=bool(args.fused_sampler)),
        dtype=dtype,
        context_buckets=tuple(int(x) for x in
                              args.context_buckets.split(",") if x),
        quantize_memory=bool(args.quant),
        dynamic_buckets=bool(args.dynamic_buckets))

    from gstx.core.config import PAD_ID

    def run(key):
        """NOTE: on this sandbox's tunnel platform block_until_ready returns
        before remote execution completes; fetching the (small) outputs to
        host is the only honest sync."""
        out = engine(q_params, a_params, batch, key)
        return (np.asarray(out.questions), np.asarray(out.answers),
                np.asarray(out.answer_ppl))

    def fetch(out):
        """Sync one batch to host; returns its ACTUAL generated token count
        (non-PAD = tokens up to and including each utterance's EOS)."""
        q, a = np.asarray(out.questions), np.asarray(out.answers)
        np.asarray(out.answer_ppl)
        return int((q != PAD_ID).sum() + (a != PAD_ID).sum())

    def measure():
        t0 = time.time()
        run(jax.random.PRNGKey(1))
        print(f"[bench] compile+warmup {time.time()-t0:.1f}s",
              file=sys.stderr)

        # steady-state throughput with `pipeline` batches in flight —
        # exactly how cli/generate drives the engine (dispatch batch i+1
        # before fetching batch i); per-round dispatch gaps overlap across
        # batches
        n_batches = max(args.repeats, 3)
        t0 = time.time()
        pending = []
        actual = 0
        for i in range(n_batches):
            out = engine(q_params, a_params, batch,
                         jax.random.PRNGKey(10 + i))
            pending.append(out)
            if len(pending) >= args.pipeline:
                actual += fetch(pending.pop(0))
        while pending:
            actual += fetch(pending.pop(0))
        return (time.time() - t0) / n_batches, actual / n_batches

    # The JSON contract on stdout is unchanged: printed once, on success.
    wall, actual_tokens = retry_transient(measure)

    if args.short_answers:
        # honest accounting for the early-EOS regime: count the tokens the
        # engine actually emitted (pre-round-5 runs counted 18/decode even
        # when every lane exited at step 1 — see PERF.md round 5)
        tokens = actual_tokens
    else:
        # default regime: random weights essentially never sample EOS, all
        # 18 steps run — the reference-comparable fixed accounting
        tokens = args.batch_size * args.rounds * 2 * 18
    n_chips = jax.device_count()
    tps_chip = tokens / wall / n_chips
    print(f"[bench] wall={wall:.2f}s tokens={tokens} chips={n_chips}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "generated dialog tokens/sec/chip",
        "value": round(tps_chip, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tps_chip / TARGET_TOKENS_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
