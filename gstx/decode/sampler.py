"""Jitted KV-cached autoregressive sampler.

Replaces the reference's cache-less decode loop
(``models/visual_dialog_model.py:74-120``: 18 FULL decoder re-forwards per
utterance) with a `lax.scan` over fixed-shape decode steps: the encoder's
fused memory K/V are computed once, self-attention K/V accumulate in a
[B, H, 19, Dh] cache, and each step is a handful of [B, 768] matmuls.

Sampling semantics match the reference exactly: temperature, n-gram blocking
against the encoder's question history, top-k / nucleus filtering, then
multinomial sampling; PAD fill after the first EOS.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gstx.core.config import CLS_ID, PAD_ID, SEP_ID
from gstx.ops.sampling import (
    ngram_block,
    pad_after_eos,
    sample_token,
    sample_token_topk,
    top_k_top_p_filter,
)


class DecodeSettings(NamedTuple):
    """Static sampling configuration (generate.py:138-141,177-180)."""

    max_steps: int = 18
    temperature: float = 0.7
    top_k: int = 7
    top_p: float = 0.0
    ngram_blocking_size: int = 4
    fused_sampler: bool = False  # single-pass top-k extract + categorical
    # over the k candidates (B*k gumbels instead of B*V); distribution-
    # identical to filter-then-sample but consumes rng differently (tokens
    # differ run-to-run) — see ops/sampling.py::sample_token_topk


def init_cache(dec_config, batch: int, max_len: int, dtype=jnp.float32):
    """Fixed-shape per-layer KV caches (free function; no params needed)."""
    h = dec_config.num_attention_heads
    dh = dec_config.hidden_size // h
    z = jnp.zeros((batch, h, max_len, dh), dtype=dtype)
    return [{"k": z, "v": z} for _ in range(dec_config.num_hidden_layers)]


def sample_sequence(
    step_fn,
    rng: jax.Array,
    batch: int,
    caches,
    settings: DecodeSettings,
    ngram_source: Optional[jnp.ndarray] = None,
    bos_id: int = CLS_ID,
    eos_id: int = SEP_ID,
) -> jnp.ndarray:
    """Run ``settings.max_steps`` cached decode steps.

    ``step_fn(token_ids [B,1], pos, caches) -> (logits [B,V], caches)`` is the
    model-specific decode step (already closed over memory K/V and params).
    ``ngram_source`` [B, S] is the sequence whose n-grams are banned (the
    reference's question history, visual_dialog_model.py:96-100).

    Returns the sampled sequence [B, max_steps] with PAD after the first EOS.
    """
    t_max = settings.max_steps + 1
    tokens = jnp.zeros((batch, t_max), dtype=jnp.int32)
    tokens = tokens.at[:, 0].set(bos_id)

    def body(carry):
        tokens, caches, rng, step, done = carry
        cur = jax.lax.dynamic_slice_in_dim(tokens, step, 1, axis=1)  # [B,1]
        logits, caches = step_fn(cur, step, caches)
        logits = logits / settings.temperature
        if settings.ngram_blocking_size > 0 and ngram_source is not None:
            logits = ngram_block(
                logits, ngram_source, tokens, step + 1,
                settings.ngram_blocking_size)
        rng, sub = jax.random.split(rng)
        # the fused path unrolls top_k sequential extract rounds at trace
        # time — sound only in top_k_filter's hierarchical regime (k <= 16);
        # a larger -top_k falls through to the unfused lax.top_k chain
        if settings.fused_sampler and 0 < settings.top_k <= 16 \
                and settings.top_p <= 0.0:
            nxt = sample_token_topk(sub, logits, settings.top_k)
        else:
            logits = top_k_top_p_filter(logits, settings.top_k,
                                        settings.top_p)
            nxt = sample_token(sub, logits).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice(
            tokens, nxt[:, None], (0, step + 1))
        done = jnp.logical_or(done, nxt == eos_id)
        return tokens, caches, rng, step + 1, done

    def cond(carry):
        _, _, _, step, done = carry
        # early-EOS exit: once EVERY row has emitted EOS, the remaining
        # steps only produce tokens that pad_after_eos discards — skipping
        # them is output-identical (executed steps consume the same rng
        # splits as the fixed-length loop).
        return jnp.logical_and(step < settings.max_steps,
                               jnp.logical_not(jnp.all(done)))

    tokens, _, _, _, _ = jax.lax.while_loop(
        cond, body,
        (tokens, caches, rng, jnp.asarray(0, jnp.int32),
         jnp.zeros((batch,), dtype=bool)))
    seq = tokens[:, 1:]
    return pad_after_eos(seq, eos_id, PAD_ID)
