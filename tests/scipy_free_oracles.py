"""Independent NumPy oracles implementing the reference's math, used to
verify the JAX model blocks.  Written from the reference's equations
(models/vilbert_dialog.py:283-296 LayerNorm, :116-122 gelu, :380-407
attention), NOT from the gstx implementation."""

import math

import numpy as np


def np_gelu(x):
    # vilbert_dialog.py:116-122 — exact erf gelu
    return x * 0.5 * (1.0 + _erf(x / math.sqrt(2.0)))


def _erf(x):
    # vectorised erf via numpy (math.erf elementwise)
    from numpy import vectorize

    return vectorize(math.erf)(x).astype(x.dtype)


def np_layer_norm(x, weight, bias, eps=1e-12):
    # TF-style: eps inside the sqrt (vilbert_dialog.py:292-296)
    u = x.mean(-1, keepdims=True)
    s = ((x - u) ** 2).mean(-1, keepdims=True)
    return weight * ((x - u) / np.sqrt(s + eps)) + bias


def np_softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def np_attention(q, k, v, additive_mask=None):
    # scores/sqrt(dh) + mask -> softmax -> weighted values
    # (vilbert_dialog.py:389-402)
    dh = q.shape[-1]
    scores = q @ np.swapaxes(k, -1, -2) / math.sqrt(dh)
    if additive_mask is not None:
        scores = scores + additive_mask
    return np_softmax(scores, -1) @ v


def np_top_k_top_p(logits, top_k=0, top_p=0.0):
    """Reference decoding_utils.py:4-35 re-expressed in numpy."""
    logits = logits.copy().astype(np.float64)
    filter_value = -np.inf
    if top_k > 0:
        top_k = min(top_k, logits.shape[-1])
        kth = np.sort(logits, axis=-1)[..., -top_k][..., None]
        logits[logits < kth] = filter_value
    if top_p > 0.0:
        sorted_idx = np.argsort(-logits, axis=-1, kind="stable")
        sorted_logits = np.take_along_axis(logits, sorted_idx, axis=-1)
        cum = np.cumsum(np_softmax(sorted_logits, -1), axis=-1)
        remove = cum > top_p
        remove[..., 1:] = remove[..., :-1].copy()
        remove[..., 0] = False
        mask = np.zeros_like(remove)
        np.put_along_axis(mask, sorted_idx, remove, axis=-1)
        logits[mask] = filter_value
    return logits


def np_ngram_ban(source_row, dec_row, ngram_size,
                 special=(0, 100, 101, 102, 103)):
    """Reference decoding_utils.py:38-78 dict algorithm for ONE sample.
    Returns the list of banned next-token ids."""
    grams = {}
    toks = list(source_row)
    for ngram in zip(*[toks[i:] for i in range(ngram_size)]):
        if set(ngram) & set(special):
            continue
        grams.setdefault(tuple(ngram[:-1]), []).append(ngram[-1])
    cur_len = len(dec_row)
    start = cur_len + 1 - ngram_size
    if start < 0:
        # torch slicing clamps negative starts; shorter tuples never match
        tail = tuple(dec_row[max(cur_len - 1, 0):cur_len])
        if len(tail) != ngram_size - 1:
            return []
    tail = tuple(dec_row[start:cur_len])
    return grams.get(tail, [])
