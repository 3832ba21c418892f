"""Jitted KV-cached beam search.

The reference decodes only by top-k/nucleus sampling (its ``_reorder_cache``
hook for HF beam search is never exercised, visual_dialog_decoder.py:29-31).
gstx provides a real TPU beam search: beams fold into the batch dimension,
caches reorder by gather at each step, everything is fixed-shape under one
``lax.scan``.

Semantics: standard length-unnormalized log-prob beam search (optional GNMT
length penalty via ``alpha``), EOS-terminated; finished beams are frozen and
propagate a single PAD continuation with unchanged score.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gstx.core.config import CLS_ID, PAD_ID, SEP_ID

NEG_INF = -1e9


class BeamState(NamedTuple):
    tokens: jnp.ndarray     # [B, K, T+1]
    scores: jnp.ndarray     # [B, K] cumulative logprob
    finished: jnp.ndarray   # [B, K] bool
    caches: object          # pytree with leading dim B*K


def _gather_beams(tree, parents, batch, beams):
    """Reorder cache leaves [B*K, ...] by per-batch parent indices [B, K]."""
    flat_idx = (jnp.arange(batch)[:, None] * beams + parents).reshape(-1)

    def gather(x):
        return x[flat_idx]

    return jax.tree_util.tree_map(gather, tree)


def beam_search(
    step_fn,
    init_caches,
    batch: int,
    num_beams: int,
    max_steps: int,
    bos_id: int = CLS_ID,
    eos_id: int = SEP_ID,
    pad_id: int = PAD_ID,
    alpha: float = 0.0,
):
    """Run beam search.

    ``step_fn(tokens [B*K, 1], pos, caches) -> (logits [B*K, V], caches)``
    — the same cached decode step the sampler uses, with memory K/V already
    tiled to B*K.  ``init_caches`` must have leading dim B*K.

    Returns (best_tokens [B, max_steps], best_scores [B]).
    """
    t_max = max_steps + 1
    tokens = jnp.zeros((batch, num_beams, t_max), jnp.int32)
    tokens = tokens.at[:, :, 0].set(bos_id)
    # only beam 0 is live initially (identical prefixes would duplicate)
    scores = jnp.full((batch, num_beams), NEG_INF, jnp.float32)
    scores = scores.at[:, 0].set(0.0)
    finished = jnp.zeros((batch, num_beams), bool)
    state = BeamState(tokens, scores, finished, init_caches)

    def body(state, step):
        tokens, scores, finished, caches = state
        cur = jax.lax.dynamic_slice_in_dim(
            tokens.reshape(batch * num_beams, t_max), step, 1, axis=1)
        logits, caches = step_fn(cur, step, caches)
        vocab = logits.shape[-1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(batch, num_beams, vocab)

        # finished beams: only PAD continuation, score unchanged
        pad_only = jnp.full((vocab,), NEG_INF).at[pad_id].set(0.0)
        logp = jnp.where(finished[:, :, None], pad_only[None, None, :], logp)

        total = scores[:, :, None] + logp                 # [B, K, V]
        flat = total.reshape(batch, num_beams * vocab)
        top_scores, top_idx = jax.lax.top_k(flat, num_beams)
        parents = top_idx // vocab                        # [B, K]
        next_tok = (top_idx % vocab).astype(jnp.int32)

        tokens = jnp.take_along_axis(tokens, parents[:, :, None], axis=1)
        finished = jnp.take_along_axis(finished, parents, axis=1)
        caches = _gather_beams(caches, parents, batch, num_beams)
        tokens = jax.lax.dynamic_update_slice(
            tokens, next_tok[:, :, None], (0, 0, step + 1))
        finished = jnp.logical_or(finished, next_tok == eos_id)
        return BeamState(tokens, top_scores, finished, caches), None

    state, _ = jax.lax.scan(body, state, jnp.arange(max_steps))
    tokens, scores, finished, _ = state

    if alpha > 0.0:
        # GNMT length penalty over generated (non-pad) length
        lengths = (tokens[:, :, 1:] != pad_id).sum(-1).astype(jnp.float32)
        penalty = ((5.0 + lengths) / 6.0) ** alpha
        ranked = scores / penalty
    else:
        ranked = scores
    best = jnp.argmax(ranked, axis=1)
    best_tokens = jnp.take_along_axis(
        tokens[:, :, 1:], best[:, None, None], axis=1)[:, 0]
    best_scores = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    # scrub everything after the first EOS to PAD
    from gstx.ops.sampling import pad_after_eos

    seq = pad_after_eos(best_tokens, eos_id, pad_id)
    return seq, best_scores


def tile_for_beams(tree, num_beams: int):
    """Repeat batch-leading leaves K times: [B, ...] -> [B*K, ...]."""

    def tile(x):
        return jnp.repeat(x, num_beams, axis=0)

    return jax.tree_util.tree_map(tile, tree)
