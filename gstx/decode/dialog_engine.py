"""The GST synthetic-dialog engine: questioner <-> teacher loop.

TPU-native reimplementation of ``generate.py:90-258``: for each image, 10
rounds of (generate question, append to context, generate answer, score
answer perplexity, append answer).  The reference's per-sample Python
in-place appends (``generate.py:148-160,214-228``) become fixed-shape
``scatter``s with length bookkeeping and an abnormal-overflow mask, so the
entire 10-round loop jits into ONE XLA program batched across the chip.

Cost per image: 20 encoder forwards + 360 O(1) cached decode steps + 10
teacher-forced perplexity passes, vs. the reference's ~380 full
encoder+decoder forwards (SURVEY.md §3.2).  The answerer's encoder memory is
reused between answer decoding and perplexity scoring — they see the same
context (generate.py:163-211 recomputes it; the math is identical).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gstx.core.config import CLS_ID, PAD_ID, SEP_ID, DecoderConfig
from gstx.decode.sampler import DecodeSettings, init_cache, sample_sequence
from gstx.models.encdec import (
    GSTVisualDialog,
    derive_labels_and_inputs,
    teacher_forced_nll,
)


class DialogState(NamedTuple):
    enc_input_ids: jnp.ndarray   # [B, S] int32
    enc_segments: jnp.ndarray    # [B, S] int32
    enc_len: jnp.ndarray         # [B] int32 — number of valid tokens
    abnormal: jnp.ndarray        # [B] bool — overflow happened


class DialogOutput(NamedTuple):
    questions: jnp.ndarray       # [R, B, T]
    answers: jnp.ndarray         # [R, B, T]
    answer_ppl: jnp.ndarray      # [R, B]
    abnormal: jnp.ndarray        # [B]
    final_state: DialogState


def append_utterance(
    state: DialogState,
    utt: jnp.ndarray,        # [B, T] tokens, PAD after first EOS
    utt_len: jnp.ndarray,    # [B] number of tokens to append
    segment: int,            # segment id written for appended tokens (answers=1)
    write_segments: bool,
) -> Tuple[DialogState, jnp.ndarray]:
    """Append each sample's utterance at its current context length.

    Overflow handling mirrors generate.py:148-160: if start+len exceeds the
    context, a single SEP is written instead, the utterance length becomes 1
    and the sample is marked abnormal (it is dropped from the output JSON,
    generate.py:236-237).
    Returns (new_state, effective_len).
    """
    b, s = state.enc_input_ids.shape
    t = utt.shape[1]
    start = state.enc_len
    overflow = (start + utt_len) > s

    eff_utt = jnp.where(
        overflow[:, None],
        jnp.zeros_like(utt).at[:, 0].set(SEP_ID),
        utt,
    )
    eff_len = jnp.where(overflow, 1, utt_len)

    offs = jnp.arange(t)[None, :]                      # [1, T]
    pos = start[:, None] + offs                        # [B, T]
    valid = offs < eff_len[:, None]
    # invalid slots scatter out of range -> dropped
    pos = jnp.where(valid, pos, s)
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, t))

    ids = state.enc_input_ids.at[rows, pos].set(
        eff_utt, mode="drop")
    segs = state.enc_segments
    if write_segments:
        segs = segs.at[rows, pos].set(
            jnp.full((b, t), segment, dtype=segs.dtype), mode="drop")
    return DialogState(
        enc_input_ids=ids,
        enc_segments=segs,
        enc_len=start + eff_len,
        abnormal=jnp.logical_or(state.abnormal, overflow),
    ), eff_len


def make_dialog_engine(
    model: GSTVisualDialog,
    dec_config: DecoderConfig,
    num_rounds: int = 10,
    q_settings: DecodeSettings = DecodeSettings(ngram_blocking_size=4),
    a_settings: DecodeSettings = DecodeSettings(ngram_blocking_size=0),
    dtype=jnp.float32,
    context_buckets: Tuple[int, ...] = (),
    quantize_memory: bool = False,
    dynamic_buckets: bool = False,
    mesh=None,
):
    """Build the jittable dialog-generation function.

    Returns ``engine(q_params, a_params, batch, rng) -> DialogOutput`` where
    ``batch`` is a dict with enc_input_ids, enc_segments, image features /
    locations / mask (the cc12m_gen / vd_gen_val batch layout,
    dataloader_cc12m_gen.py:55-102).

    ``mesh``: optional ``jax.sharding.Mesh`` — the SPMD replacement for the
    reference's DataParallel-wrapped generation (generate.py:67,77,
    inference.py:64).  Batch inputs shard over the 'data' axis and params
    place via ``shard_by_path`` (replicated, or vocab-dim tensor-parallel
    when the mesh has a >1 'model' axis); the jitted round program then
    partitions by sharding propagation, so outputs are bitwise identical to
    the single-device engine (same rng counters, same math — only the
    partitioning differs).  The batch size must divide the data axis.

    ``context_buckets``: optional ascending context widths (e.g. (128, 192))
    smaller than the full buffer.  Early rounds whose worst-case context
    fits a bucket run a round program compiled at that width — identical
    math (fully-masked tail positions contribute exactly 0 after softmax
    underflow) at a fraction of the encoder cost.  Each bucket adds one
    compiled round variant.

    ``dynamic_buckets``: pick each round's bucket from the batch's ACTUAL
    maximum context length (one scalar device->host sync per round, which
    serializes rounds within a batch — cli/generate's cross-batch double
    buffering hides the stall) instead of the default static worst-case
    schedule (+max_steps x 2 per round, synced once up front).  On real
    checkpoints answers are 3-7 tokens, so contexts grow far slower than
    the worst case and most rounds stay in the smallest bucket; on
    worst-case data (every utterance runs the full 18 steps) the two
    schedules coincide.  Outputs are identical either way (bucket width
    never changes the math, only the compile shape).
    """
    # pallas kernels are opaque to GSPMD: with Megatron-sharded weights
    # they would force all-gathers; the jnp path partitions.  Set (or
    # clear) the gate at construction from this engine's mesh.
    from gstx.kernels.ffn import set_tensor_parallel_from_mesh

    set_tensor_parallel_from_mesh(mesh)

    def decode_utterance(params, state, image, rng, settings, ngram_source):
        batch = state.enc_input_ids.shape[0]
        att = (state.enc_input_ids != PAD_ID).astype(jnp.int32)
        mem_kv, mem_mask = model.apply(
            params,
            state.enc_input_ids, image["feat"], image["loc"],
            state.enc_segments, att, image["mask"],
            method=GSTVisualDialog.decode_prepare)
        if quantize_memory and dtype == jnp.bfloat16:
            # int8 cross-attention memory (OFF by default): halves the
            # decode loop's ~1 GB/step static K/V reads and wins +24% on an
            # isolated scan-driven decode, but measured -5% inside the full
            # engine round program (A/B in PERF.md) — the while_loop decode
            # apparently loses the dequant-into-dot fusion there.  Kept as
            # an option; bf16-path only, f32 engines (tests, CPU) exact.
            from gstx.models.decoder import quantize_memory_kv

            mem_kv = quantize_memory_kv(mem_kv, mem_mask, dtype)

        def step_fn(tok, pos, caches):
            return model.apply(
                params, tok, pos, caches, mem_kv, mem_mask,
                method=GSTVisualDialog.decode_step)

        caches = init_cache(dec_config, batch, settings.max_steps + 1, dtype)
        seq = sample_sequence(
            step_fn, rng, batch, caches, settings,
            ngram_source=ngram_source, bos_id=CLS_ID, eos_id=SEP_ID)
        return seq, (mem_kv, mem_mask)

    def answer_ppl(params, ans_ids, mem_kv, mem_mask):
        """exp(mean NLL / answer length) — generate.py:183-211.

        The attention mask is computed BEFORE the EOS->PAD rewrite (so the
        EOS slot stays attendable), and the normalising length AFTER it (so
        EOS is excluded), matching the reference's in-place mutation order.
        """
        att_mask = (ans_ids != PAD_ID).astype(jnp.int32)
        labels, inputs = derive_labels_and_inputs(ans_ids, SEP_ID, PAD_ID)
        logits = model.apply(
            params, inputs, att_mask, mem_kv, mem_mask,
            method=GSTVisualDialog.decode_logits_cached)
        nll = teacher_forced_nll(logits, labels, PAD_ID)  # [B, T]
        ans_len = (inputs != PAD_ID).sum(-1)
        ppl = jnp.exp(nll.sum(-1) / jnp.maximum(ans_len, 1))
        return ppl, inputs, ans_len

    def one_round(q_params, a_params, state, image, rng):
        """One dialog round: Q-decode, append, A-decode, ppl, append.
        Shape-invariant across rounds, so it compiles ONCE and is reused."""
        rq, ra = jax.random.split(rng)

        # n-gram blocking source: previously generated questions, i.e.
        # tokens whose segment id is 0 (visual_dialog_model.py:96-100)
        hist_ques = state.enc_input_ids * (state.enc_segments == 0)
        ques, _ = decode_utterance(
            q_params, state, image, rq, q_settings, hist_ques)
        # includes EOS (generate.py:145).  Deliberate reference-parity
        # quirk: if the sampler draws PAD mid-utterance before EOS, the
        # count undershoots and the copy keeps the PAD hole but drops the
        # tail incl. SEP — exactly what the reference's
        # ques_ids[:ques_len] copy does (generate.py:145-153).  Measure-
        # zero with trained checkpoints (PAD is never high-probability).
        ques_len = (ques != PAD_ID).sum(-1)
        state, _ = append_utterance(state, ques, ques_len,
                                    segment=0, write_segments=False)

        answ, (mem_kv, mem_mask) = decode_utterance(
            a_params, state, image, ra, a_settings, None)
        ppl, ans_wo_eos, ans_len = answer_ppl(
            a_params, answ, mem_kv, mem_mask)
        # the reference appends the EOS->PAD-rewritten answer and its
        # EOS-less length, with segment id 1 (generate.py:205,214-228)
        state, _ = append_utterance(state, ans_wo_eos, ans_len,
                                    segment=1, write_segments=True)
        return state, ques, answ, ppl

    jitted_round = jax.jit(one_round)
    # context growth bound per round: Q (incl. EOS) + A tokens
    growth = q_settings.max_steps + a_settings.max_steps

    def _precast_params(params):
        """One-time f32->bf16 weight cast for the bf16 engine.

        Every matmul on the bf16 path casts its f32 weights to bf16 at use;
        inside the 36-per-round decode steps XLA does not fully hoist those
        converts out of the while_loop (measured ~0.25 ms/step,
        scripts/profile_decode.py).  For matmul weights the early cast is
        numerically identical (same rounding, done once); the embedding
        tables differ at the last ulp (word+position+segment now sum in
        bf16 instead of summing in f32 then rounding) — the same magnitude
        of rounding the bf16 path applies everywhere else.  LayerNorm
        affine params and the LM bias stay f32 — they are consumed in f32.
        """
        def path_names(path):
            return tuple(str(getattr(k, "key", getattr(k, "name", k)))
                         for k in path)

        # A LayerNorm module is identified structurally: its subtree holds a
        # 'scale' leaf.  Its sibling 'bias' must stay f32 (consumed in f32)
        # regardless of what the parent module happens to be named.
        leaves = jax.tree_util.tree_flatten_with_path(params)[0]
        ln_parents = {path_names(p)[:-1] for p, _ in leaves
                      if path_names(p)[-1] == "scale"}

        def cast(path, leaf):
            if leaf.dtype != jnp.float32:
                return leaf
            names = path_names(path)
            if names[-1] in ("scale", "lm_bias"):
                return leaf
            if names[-1] == "bias" and names[:-1] in ln_parents:
                return leaf
            return leaf.astype(jnp.bfloat16)
        return jax.tree_util.tree_map_with_path(cast, params)

    jitted_precast = jax.jit(_precast_params)
    # engine() runs once per BATCH with the same param trees every time:
    # memoize param placement (shard_by_path under a mesh) + the f32->bf16
    # cast by INCOMING tree identity, so the full-tree passes (reading and
    # rewriting the whole model) happen once per run instead of per batch.
    # The memo keeps a strong ref to each key tree, so its id() cannot be
    # recycled while an entry lives.
    _prepare_memo = {}

    def prepare_params(params):
        # validated by the identity of every LEAF, not just the root: an
        # in-place update of a nested entry (params['params'][..] = new)
        # keeps the root id but must invalidate the memo — otherwise the
        # engine silently decodes with the stale prepared tree.  The memo
        # stores the leaf list itself (strong refs), so a replaced leaf
        # can never be GC'd and id-recycled into a false hit.
        leaves = jax.tree_util.tree_leaves(params)
        hit = _prepare_memo.get(id(params))
        if hit is not None and hit[0] is params \
                and len(hit[2]) == len(leaves) \
                and all(a is b for a, b in zip(hit[2], leaves)):
            return hit[1]
        prepared = params
        if mesh is not None:
            from gstx.core.mesh import shard_by_path

            prepared = shard_by_path(mesh, prepared)
        if dtype == jnp.bfloat16:
            prepared = jitted_precast(prepared)
        while len(_prepare_memo) >= 2:  # questioner + answerer
            _prepare_memo.pop(next(iter(_prepare_memo)))
        _prepare_memo[id(params)] = (params, prepared, leaves)
        return prepared

    def _widen(state: DialogState, pad: int) -> DialogState:
        return state._replace(
            enc_input_ids=jnp.pad(state.enc_input_ids, ((0, 0), (0, pad))),
            enc_segments=jnp.pad(state.enc_segments, ((0, 0), (0, pad))),
        )

    def engine(q_params, a_params, batch, rng,
               round_fn=None, init_max=None) -> DialogOutput:
        """``init_max``: optional host-known maximum initial context length.
        The bucketed engine needs it once per batch; callers that still
        hold the numpy batch (cli/generate) can pass it and skip the
        device round-trip sync that otherwise stalls the dispatch
        pipeline behind the previous batch's rounds."""
        # the kernel TP gate is module-global and read at TRACE time (first
        # call of each jitted program); re-assert THIS engine's setting per
        # call so interleaved construction of TP and non-TP programs cannot
        # bake the wrong gate (ffn.py's documented footgun)
        set_tensor_parallel_from_mesh(mesh)
        round_fn = round_fn or jitted_round
        same = a_params is q_params
        q_params = prepare_params(q_params)
        a_params = q_params if same else prepare_params(a_params)
        if mesh is not None:
            from gstx.core.mesh import shard_batch

            batch = shard_batch(mesh, batch)
        image = {
            "feat": batch["enc_image_feat"],
            "loc": batch["enc_image_loc"],
            "mask": batch["enc_image_mask"],
        }
        full_s = batch["enc_input_ids"].shape[1]
        buckets = sorted(b for b in set(context_buckets) if b < full_s)
        buckets.append(full_s)

        state = DialogState(
            enc_input_ids=batch["enc_input_ids"].astype(jnp.int32),
            enc_segments=batch["enc_segments"].astype(jnp.int32),
            enc_len=(batch["enc_input_ids"] != PAD_ID).sum(-1).astype(jnp.int32),
            abnormal=jnp.zeros(batch["enc_input_ids"].shape[0], dtype=bool),
        )
        if len(buckets) <= 1:
            init_max = 0
        elif init_max is None:
            # ONE host sync up front; afterwards the bucket schedule is
            # static (worst-case growth per round) so round dispatches
            # pipeline without device->host round-trips.  Identical math:
            # the valid prefix is unchanged, masked tail softmaxes to
            # exactly 0.
            init_max = int(jnp.max(state.enc_len))
        if len(buckets) > 1:
            start = next((b for b in buckets
                          if b >= min(init_max + growth, full_s)), full_s)
            state = state._replace(
                enc_input_ids=state.enc_input_ids[:, :start],
                enc_segments=state.enc_segments[:, :start])

        qs, ans, ppls = [], [], []
        for rnd_idx in range(num_rounds):
            if len(buckets) > 1:
                cur_w = state.enc_input_ids.shape[1]
                if dynamic_buckets:
                    # host sync on the previous round's actual lengths
                    worst = min(int(jnp.max(state.enc_len)) + growth, full_s)
                else:
                    worst = init_max + (rnd_idx + 1) * growth
                target = next((b for b in buckets if b >= worst), full_s)
                target = max(target, cur_w)
                if target > cur_w:
                    state = _widen(state, target - cur_w)
            rng, rnd_rng = jax.random.split(rng)
            state, ques, answ, ppl = round_fn(q_params, a_params, state,
                                              image, rnd_rng)
            qs.append(ques)
            ans.append(answ)
            ppls.append(ppl)

        if state.enc_input_ids.shape[1] < full_s:
            state = _widen(state, full_s - state.enc_input_ids.shape[1])
        return DialogOutput(
            questions=jnp.stack(qs),
            answers=jnp.stack(ans),
            answer_ppl=jnp.stack(ppls),
            abnormal=state.abnormal,
            final_state=state,
        )

    engine.one_round = one_round
    # exposed for the torch-oracle parity test (the ppl trick's semantics —
    # CLS-less conditioning, mask-before/length-after the EOS->PAD rewrite —
    # are exactly what the VERDICT-r3 in-loop fold would have broken)
    engine.answer_ppl = answer_ppl
    return engine
