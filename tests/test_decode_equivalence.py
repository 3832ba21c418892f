"""Decode-loop equivalence under greedy settings (SURVEY.md §4): the jitted
KV-cached sampler must produce exactly the sequence that the reference's
cache-less loop (full decoder re-forward per token,
visual_dialog_model.py:86-111) produces when top_k=1 makes sampling
deterministic."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gstx.core.config import CLS_ID, PAD_ID, SEP_ID
from gstx.decode.sampler import DecodeSettings, init_cache, sample_sequence
from gstx.models.encdec import GSTVisualDialog
from gstx.ops.sampling import ngram_block, pad_after_eos, top_k_top_p_filter


@pytest.fixture(scope="module")
def setup(tiny_configs):
    enc_cfg, dec_cfg = tiny_configs
    model = GSTVisualDialog(enc_cfg, dec_cfg)
    rng = np.random.RandomState(0)
    b, l, r = 3, 24, 5
    batch = dict(
        input_ids=jnp.asarray(rng.randint(1, 100, (b, l)), jnp.int32),
        image_feat=jnp.asarray(rng.rand(b, r, enc_cfg.v_feature_size),
                               jnp.float32),
        image_loc=jnp.asarray(rng.rand(b, r, 5), jnp.float32),
        token_type_ids=jnp.zeros((b, l), jnp.int32),
        attention_mask=jnp.ones((b, l), jnp.int32),
        image_attention_mask=jnp.ones((b, r), jnp.int32),
        dec_input_ids=jnp.ones((b, 6), jnp.int32),
        dec_attention_mask=jnp.ones((b, 6), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), **batch,
                        method=GSTVisualDialog.init_all)
    return model, params, batch, dec_cfg


def reference_style_decode(model, params, batch, max_steps, ngram_size,
                           ngram_source):
    """Cache-less loop: grow dec_input_ids, FULL decoder forward per step,
    temperature + ngram + top-k filter, take the argmax (== multinomial with
    a single surviving candidate)."""
    b = batch["input_ids"].shape[0]
    hidden_t, hidden_v, _, _ = model.apply(
        params, batch["input_ids"], batch["image_feat"], batch["image_loc"],
        batch["token_type_ids"], batch["attention_mask"],
        batch["image_attention_mask"], method=GSTVisualDialog.encode)
    memory, memory_mask = model.apply(
        params, hidden_t, hidden_v, batch["attention_mask"],
        batch["image_attention_mask"], method=GSTVisualDialog.fuse)

    dec = np.full((b, 1), CLS_ID, np.int32)
    seq = []
    for i in range(max_steps):
        logits = model.apply(
            params, jnp.asarray(dec), jnp.ones_like(jnp.asarray(dec)),
            memory, memory_mask, method=GSTVisualDialog.decode_logits)
        step_logits = np.asarray(logits[:, -1, :], np.float64) / 0.7
        filtered = ngram_block(jnp.asarray(step_logits), ngram_source,
                               jnp.asarray(dec), dec.shape[1], ngram_size)
        filtered = top_k_top_p_filter(filtered, top_k=1)
        nxt = np.asarray(jnp.argmax(filtered, -1), np.int32)
        dec = np.concatenate([dec, nxt[:, None]], axis=1)
        seq.append(nxt)
    seq = np.stack(seq, 1)
    return np.asarray(pad_after_eos(jnp.asarray(seq), SEP_ID, PAD_ID))


def test_greedy_cached_equals_cacheless(setup):
    model, params, batch, dec_cfg = setup
    b = batch["input_ids"].shape[0]
    max_steps = 8
    ngram_source = batch["input_ids"] * (batch["token_type_ids"] == 0)

    want = reference_style_decode(model, params, batch, max_steps, 3,
                                  ngram_source)

    mem_kv, mem_mask = model.apply(
        params, batch["input_ids"], batch["image_feat"], batch["image_loc"],
        batch["token_type_ids"], batch["attention_mask"],
        batch["image_attention_mask"],
        method=GSTVisualDialog.decode_prepare)

    def step_fn(tok, pos, caches):
        return model.apply(params, tok, pos, caches, mem_kv, mem_mask,
                           method=GSTVisualDialog.decode_step)

    caches = init_cache(dec_cfg, b, max_steps + 1)
    got = np.asarray(sample_sequence(
        step_fn, jax.random.PRNGKey(7), b, caches,
        DecodeSettings(max_steps=max_steps, temperature=0.7, top_k=1,
                       ngram_blocking_size=3),
        ngram_source=ngram_source, bos_id=CLS_ID, eos_id=SEP_ID))

    np.testing.assert_array_equal(got, want)


def test_greedy_equivalence_without_ngram(setup):
    model, params, batch, dec_cfg = setup
    b = batch["input_ids"].shape[0]
    max_steps = 8
    want = reference_style_decode(model, params, batch, max_steps, 0, None)

    mem_kv, mem_mask = model.apply(
        params, batch["input_ids"], batch["image_feat"], batch["image_loc"],
        batch["token_type_ids"], batch["attention_mask"],
        batch["image_attention_mask"],
        method=GSTVisualDialog.decode_prepare)

    def step_fn(tok, pos, caches):
        return model.apply(params, tok, pos, caches, mem_kv, mem_mask,
                           method=GSTVisualDialog.decode_step)

    caches = init_cache(dec_cfg, b, max_steps + 1)
    got = np.asarray(sample_sequence(
        step_fn, jax.random.PRNGKey(3), b, caches,
        DecodeSettings(max_steps=max_steps, temperature=0.7, top_k=1,
                       ngram_blocking_size=0),
        bos_id=CLS_ID, eos_id=SEP_ID))
    np.testing.assert_array_equal(got, want)


def test_early_eos_exit_matches_fixed_length_loop():
    """The while_loop early-EOS exit (PERF round 2) must be output-identical
    to the fixed max_steps loop: executed steps consume the same rng splits
    and post-EOS tokens are discarded by pad_after_eos either way.

    Uses a model-free step_fn whose rows emit EOS at staggered steps, so
    the early exit actually triggers (after the slowest row finishes)."""
    import jax
    from gstx.core.config import CLS_ID, PAD_ID, SEP_ID
    from gstx.decode.sampler import DecodeSettings, sample_sequence
    from gstx.ops.sampling import (pad_after_eos, sample_token,
                                   top_k_top_p_filter)

    batch, vocab, max_steps = 5, 128, 12
    settings = DecodeSettings(max_steps=max_steps, temperature=0.9, top_k=3,
                              top_p=0.0, ngram_blocking_size=0)

    def step_fn(tok, pos, caches):
        # row i prefers EOS from step i+1 on; before that a pos-dependent
        # token band -- stochastic (top_k 3) so rng alignment is exercised
        base = jnp.zeros((batch, vocab))
        band = (10 + pos * 3) % 80  # stays clear of SEP_ID=102
        cols = jnp.arange(vocab)[None, :]
        base = jnp.where((cols >= band) & (cols < band + 3), 4.0, base)
        rows = jnp.arange(batch)
        eos_bias = jnp.where(pos >= rows + 1, 50.0, -50.0)
        base = base.at[:, SEP_ID].set(eos_bias)
        return base, caches

    rng = jax.random.PRNGKey(123)
    got = sample_sequence(step_fn, rng, batch, caches=0, settings=settings,
                          bos_id=CLS_ID, eos_id=SEP_ID)

    # fixed-length reference: the same sampling pipeline, no early exit
    tokens = jnp.zeros((batch, max_steps + 1), jnp.int32).at[:, 0].set(CLS_ID)
    r = rng
    for step in range(max_steps):
        logits, _ = step_fn(tokens[:, step:step + 1], step, 0)
        logits = logits / settings.temperature
        logits = top_k_top_p_filter(logits, settings.top_k, settings.top_p)
        r, sub = jax.random.split(r)
        nxt = sample_token(sub, logits).astype(jnp.int32)
        tokens = tokens.at[:, step + 1].set(nxt)
    want = pad_after_eos(tokens[:, 1:], SEP_ID, PAD_ID)

    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # sanity: staggered EOS really happened (row i ends after ~i+1 tokens)
    lens = (np.asarray(got) != PAD_ID).sum(-1)
    assert lens[0] < lens[-1] <= max_steps


def test_fused_sampler_large_k_falls_back_to_unfused():
    """The fused sampler unrolls top_k sequential extract rounds at trace
    time, so its gate is bounded at k <= 16 (top_k_filter's hierarchical
    regime): with -top_k 32 a fused-enabled run must take the unfused
    lax.top_k chain — token streams with fused on/off are IDENTICAL (the
    fused path would consume the rng differently, so equality pins the
    fallback, not luck)."""
    import jax
    from gstx.core.config import CLS_ID, SEP_ID
    from gstx.decode.sampler import DecodeSettings, sample_sequence

    batch, vocab = 4, 512

    def step_fn(tok, pos, caches):
        key = jax.random.fold_in(jax.random.PRNGKey(5), pos)
        return jax.random.normal(key, (batch, vocab)) * 3.0, caches

    rng = jax.random.PRNGKey(11)
    outs = {}
    for fused in (False, True):
        settings = DecodeSettings(max_steps=8, temperature=0.9, top_k=32,
                                  top_p=0.0, ngram_blocking_size=0,
                                  fused_sampler=fused)
        outs[fused] = np.asarray(sample_sequence(
            step_fn, rng, batch, caches=0, settings=settings,
            bos_id=CLS_ID, eos_id=SEP_ID))
    np.testing.assert_array_equal(outs[True], outs[False])
