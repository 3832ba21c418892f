"""Decoding / sampling ops, jit-compatible.

Reimplements the reference's host-side sampling utilities as fixed-shape
device ops:

  * :func:`top_k_top_p_filter` — batched top-k / nucleus filtering
    (reference ``utils/decoding_utils.py:4-35``);
  * :func:`ngram_block` — n-gram repetition blocking against the encoder
    input sequence (reference ``utils/decoding_utils.py:38-78``), redesigned
    from per-sample Python dicts to a vectorised windowed match + scatter;
  * :func:`sample_token` — temperature + multinomial sampling
    (``models/visual_dialog_model.py:94-107``);
  * :func:`pad_after_eos` — post-hoc PAD fill after the first EOS
    (``models/visual_dialog_model.py:113-119``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gstx.core.config import SPECIAL_TOKEN_IDS

NEG_INF = -1e9  # stands in for float('-inf'); never survives a softmax


def _kth_largest(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact k-th largest value per row (duplicate-aware), via k-1 rounds of
    argmax + mask-one-occurrence.  On TPU this is ~10x faster than
    ``lax.top_k`` for small k over a 30k vocab (top_k is sort-based: measured
    2.24 ms vs ~0.2 ms per [96, 30522] call on v5e), and the dialog engine
    calls it every decode step."""
    x = logits
    batch_shape = logits.shape[:-1]
    rows = jnp.indices(batch_shape, sparse=True)
    for _ in range(k - 1):
        idx = jnp.argmax(x, axis=-1)
        x = x.at[rows + (idx,)].set(-jnp.inf)
    return jnp.max(x, axis=-1, keepdims=True)


def _hier_extract(logits: jnp.ndarray, k: int, block: int, record: bool):
    """Shared blocked extract-and-mask core of :func:`_kth_largest_hier`
    and :func:`_topk_hier`.

    One full pass builds per-``block``-lane maxima; each round then gathers
    only the single block holding the current global maximum, masks one
    occurrence there, and refreshes that block's maximum (argmax breaks
    ties at the lowest index, whether reached directly or through the
    first block whose maximum ties).  ``record=False`` runs k-1 rounds and
    returns the remaining global max (the k-th largest, [.., 1]) without
    the recording gathers, so the kth-largest program is unchanged by the
    sharing; ``record=True`` runs k rounds collecting each round's (value,
    global index)."""
    batch_shape = logits.shape[:-1]
    v = logits.shape[-1]
    b = 1
    for d in batch_shape:
        b *= d
    nb = -(-v // block)
    x = logits.reshape(b, v)
    if nb * block != v:
        x = jnp.pad(x, ((0, 0), (0, nb * block - v)),
                    constant_values=-jnp.inf)
    x = x.reshape(b, nb, block)
    bmax = jnp.max(x, axis=-1)                      # [B, nb] — full pass
    rows = jnp.arange(b)
    vals, idxs = [], []
    for _ in range(k if record else k - 1):
        bi = jnp.argmax(bmax, axis=-1)              # [B]
        blk = x[rows, bi]                           # [B, block]
        pos = jnp.argmax(blk, axis=-1)
        if record:
            vals.append(blk[rows, pos])
            idxs.append(bi * block + pos)
        blk = blk.at[rows, pos].set(-jnp.inf)
        x = x.at[rows, bi].set(blk)
        bmax = bmax.at[rows, bi].set(jnp.max(blk, axis=-1))
    if not record:
        return jnp.max(bmax, axis=-1, keepdims=True).reshape(*batch_shape, 1)
    vals = jnp.stack(vals, axis=-1).reshape(*batch_shape, k)
    idxs = jnp.stack(idxs, axis=-1).reshape(*batch_shape, k)
    return vals, idxs.astype(jnp.int32)


def _kth_largest_hier(logits: jnp.ndarray, k: int,
                      block: int = 128) -> jnp.ndarray:
    """Exact k-th largest (duplicate-aware) in ~2 full passes instead of k.
    Identical semantics to :func:`_kth_largest`."""
    return _hier_extract(logits, k, block, record=False)


def _topk_hier(logits: jnp.ndarray, k: int,
               block: int = 128) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k (values, indices) in ~2 full passes, descending, ties
    broken at the lowest index (same extraction as :func:`_kth_largest_hier`
    with the per-round (block, position) recorded as a global index)."""
    return _hier_extract(logits, k, block, record=True)


def sample_token_topk(rng, logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Fused top-k filter + multinomial sample: extract the top-k candidate
    (value, index) pairs in ~2 passes and sample categorically over the k
    values, instead of masking the full vocab row and drawing [B, V] gumbel
    noise (``sample_token(rng, top_k_filter(logits, k))`` draws ~3M uniforms
    per [96, 30522] step; this draws B*k).

    Distribution-identical to the unfused chain except (a) exact ties at the
    k-th value are truncated to exactly k candidates where the reference's
    ``logits < kth`` mask keeps every tied token, and (b) the rng stream is
    consumed differently, so sampled TOKENS differ run-to-run from the
    unfused path (both remain faithful multinomial draws).  Selectable via
    ``-fused_sampler`` (sidecar meta key: token streams change)."""
    vals, idx = _topk_hier(logits, min(k, logits.shape[-1]))
    choice = jax.random.categorical(rng, vals.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(
        idx, choice[..., None], axis=-1)[..., 0].astype(jnp.int32)


def top_k_filter(logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Keep only the k highest logits per row (ties at the k-th value kept,
    matching the reference's ``logits < kth -> -inf``)."""
    if top_k <= 0:
        return logits
    k = min(top_k, logits.shape[-1])
    if k <= 16 and logits.shape[-1] >= 2048:
        kth = _kth_largest_hier(logits, k)
    elif k <= 16:
        kth = _kth_largest(logits, k)
    else:
        kth = jax.lax.top_k(logits, k)[0][..., -1, None]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filtering.  Sort descending, drop tokens once cumulative
    probability exceeds top_p — shifted right so the first token crossing the
    threshold is kept (decoding_utils.py:23-34)."""
    if top_p <= 0.0:
        return logits
    sorted_idx = jnp.argsort(logits, axis=-1)[..., ::-1]
    sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove = cum > top_p
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
    # scatter `remove` back to vocabulary order
    inv = jnp.argsort(sorted_idx, axis=-1)
    remove_vocab = jnp.take_along_axis(remove, inv, axis=-1)
    return jnp.where(remove_vocab, NEG_INF, logits)


def top_k_top_p_filter(logits: jnp.ndarray, top_k: int = 0,
                       top_p: float = 0.0) -> jnp.ndarray:
    return top_p_filter(top_k_filter(logits, top_k), top_p)


def ngram_block(
    logits: jnp.ndarray,          # [B, V]
    source_ids: jnp.ndarray,      # [B, S] sequence whose n-grams are banned
    dec_input_ids: jnp.ndarray,   # [B, T] generated prefix (incl. BOS)
    cur_len: int,                 # number of valid tokens in dec_input_ids
    ngram_size: int,
    special_token_ids: Tuple[int, ...] = SPECIAL_TOKEN_IDS,
) -> jnp.ndarray:
    """Ban token x if the n-gram (last n-1 generated tokens, x) occurs in
    ``source_ids`` with no special token inside the n-gram window.

    Vectorised equivalent of decoding_utils.py:38-78: for every window start
    p in the source, the window source[p:p+n] is a candidate ban if its first
    n-1 tokens equal the generated tail; then logits[source[p+n-1]] = -inf.

    The reference's dict lookup only ever matches once the generated prefix
    has >= n-1 tokens (shorter tails produce shorter tuples that cannot equal
    an (n-1)-tuple key), so blocking is a no-op while cur_len < n-1.
    """
    if ngram_size <= 0:
        return logits
    b, s = source_ids.shape
    n = ngram_size
    if s < n:
        return logits

    # windows[p, j] = source[p + j], j in [0, n)
    starts = s - n + 1
    windows = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(source_ids, j, starts, axis=1)
         for j in range(n)], axis=-1)  # [B, starts, n]

    specials = jnp.asarray(special_token_ids)
    has_special = jnp.any(
        windows[..., :, None] == specials[None, None, None, :], axis=(-1, -2))

    # generated tail: last n-1 valid tokens of dec_input_ids (buffer padded
    # on the right so the slice is valid even for short prefixes, which the
    # cur_len >= n-1 gate below nulls anyway)
    if dec_input_ids.shape[1] < n - 1:
        dec_input_ids = jnp.pad(
            dec_input_ids, ((0, 0), (0, n - 1 - dec_input_ids.shape[1])))
    tail = jax.lax.dynamic_slice_in_dim(
        dec_input_ids, jnp.clip(cur_len - (n - 1), 0,
                                dec_input_ids.shape[1] - (n - 1)),
        n - 1, axis=1)
    match = jnp.all(windows[..., : n - 1] == tail[:, None, :], axis=-1)
    active = jnp.logical_and(match, jnp.logical_not(has_special))
    active = jnp.logical_and(active, cur_len >= (n - 1))

    banned_next = windows[..., n - 1]  # [B, starts]
    ban_mask = jnp.zeros(logits.shape, dtype=bool)
    ban_mask = jax.vmap(
        lambda m, idx, act: m.at[idx].max(act)
    )(ban_mask, banned_next, active)
    return jnp.where(ban_mask, NEG_INF, logits)


def sample_token(rng, logits: jnp.ndarray) -> jnp.ndarray:
    """Multinomial sample from softmax(logits) — torch.multinomial equivalent
    (visual_dialog_model.py:106-107).  Returns [B] int32."""
    return jax.random.categorical(rng, logits.astype(jnp.float32), axis=-1)


def pad_after_eos(sequence: jnp.ndarray, eos_id: int,
                  pad_id: int = 0) -> jnp.ndarray:
    """Replace everything strictly after the first EOS with PAD
    (visual_dialog_model.py:113-119 replaces after EVERY eos; the effect is
    identical: positions after the first EOS become PAD)."""
    is_eos = sequence == eos_id
    after = jnp.cumsum(is_eos.astype(jnp.int32), axis=-1) - is_eos.astype(jnp.int32)
    return jnp.where(after > 0, pad_id, sequence)
