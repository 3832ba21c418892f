"""Beam search vs. an independent cache-less python reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gstx.core.config import CLS_ID, PAD_ID, SEP_ID
from gstx.decode.beam import beam_search, tile_for_beams
from gstx.decode.sampler import DecodeSettings, init_cache, sample_sequence
from gstx.models.encdec import GSTVisualDialog


@pytest.fixture(scope="module")
def setup(tiny_configs):
    enc_cfg, dec_cfg = tiny_configs
    model = GSTVisualDialog(enc_cfg, dec_cfg)
    rng = np.random.RandomState(0)
    b, l, r = 2, 20, 5
    batch = dict(
        input_ids=jnp.asarray(rng.randint(1, 100, (b, l)), jnp.int32),
        image_feat=jnp.asarray(rng.rand(b, r, enc_cfg.v_feature_size),
                               jnp.float32),
        image_loc=jnp.asarray(rng.rand(b, r, 5), jnp.float32),
        token_type_ids=jnp.zeros((b, l), jnp.int32),
        attention_mask=jnp.ones((b, l), jnp.int32),
        image_attention_mask=jnp.ones((b, r), jnp.int32),
        dec_input_ids=jnp.ones((b, 5), jnp.int32),
        dec_attention_mask=jnp.ones((b, 5), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), **batch,
                        method=GSTVisualDialog.init_all)
    mem_kv, mem_mask = model.apply(
        params, batch["input_ids"], batch["image_feat"], batch["image_loc"],
        batch["token_type_ids"], batch["attention_mask"],
        batch["image_attention_mask"],
        method=GSTVisualDialog.decode_prepare)
    return model, params, batch, dec_cfg, mem_kv, mem_mask


def reference_beam_search(model, params, memory, memory_mask, batch, beams,
                          steps, vocab):
    """Cache-less python beam search: full decode_logits re-forward per
    candidate prefix (independent of the jitted implementation)."""
    import itertools

    b = memory.shape[0]
    results = []
    for i in range(b):
        cands = [([CLS_ID], 0.0, False)]
        for step in range(steps):
            nxt = []
            for seq, score, done in cands:
                if done:
                    nxt.append((seq + [PAD_ID], score, True))
                    continue
                dec = jnp.asarray(seq)[None, :]
                logits = model.apply(
                    params, dec, jnp.ones_like(dec), memory[i:i + 1],
                    memory_mask[i:i + 1],
                    method=GSTVisualDialog.decode_logits)
                logp = np.asarray(jax.nn.log_softmax(
                    logits[0, -1].astype(jnp.float32)))
                for t in range(vocab):
                    nxt.append((seq + [t], score + logp[t], t == SEP_ID))
            nxt.sort(key=lambda x: -x[1])
            cands = nxt[:beams]
        best = max(cands, key=lambda x: x[1])
        seq = best[0][1:]
        # pad after first eos
        out = []
        seen = False
        for t in seq:
            out.append(PAD_ID if seen else t)
            if t == SEP_ID:
                seen = True
        results.append((out, best[1]))
    return results


def test_beam_search_matches_reference(setup):
    model, params, batch, dec_cfg, mem_kv, mem_mask = setup
    beams, steps = 3, 4
    b = batch["input_ids"].shape[0]

    hidden_t, hidden_v, _, _ = model.apply(
        params, batch["input_ids"], batch["image_feat"], batch["image_loc"],
        batch["token_type_ids"], batch["attention_mask"],
        batch["image_attention_mask"], method=GSTVisualDialog.encode)
    memory, memory_mask = model.apply(
        params, hidden_t, hidden_v, batch["attention_mask"],
        batch["image_attention_mask"], method=GSTVisualDialog.fuse)
    want = reference_beam_search(model, params, memory, memory_mask, batch,
                                 beams, steps, dec_cfg.vocab_size)

    tiled_kv = tile_for_beams(mem_kv, beams)
    tiled_mask = tile_for_beams(mem_mask, beams)

    def step_fn(tok, pos, caches):
        return model.apply(params, tok, pos, caches, tiled_kv, tiled_mask,
                           method=GSTVisualDialog.decode_step)

    caches = init_cache(dec_cfg, b * beams, steps + 1)
    seq, scores = beam_search(step_fn, caches, b, beams, steps)
    seq = np.asarray(seq)
    scores = np.asarray(scores)
    for i in range(b):
        assert seq[i].tolist() == want[i][0], (i, seq[i], want[i])
        np.testing.assert_allclose(scores[i], want[i][1], rtol=1e-4,
                                   atol=1e-4)


def test_beam1_equals_greedy(setup):
    model, params, batch, dec_cfg, mem_kv, mem_mask = setup
    b = batch["input_ids"].shape[0]
    steps = 6

    def step_fn(tok, pos, caches):
        return model.apply(params, tok, pos, caches, mem_kv, mem_mask,
                           method=GSTVisualDialog.decode_step)

    caches = init_cache(dec_cfg, b, steps + 1)
    seq_beam, _ = beam_search(step_fn, caches, b, 1, steps)

    caches = init_cache(dec_cfg, b, steps + 1)
    seq_greedy = sample_sequence(
        step_fn, jax.random.PRNGKey(0), b, caches,
        DecodeSettings(max_steps=steps, temperature=1.0, top_k=1,
                       ngram_blocking_size=0))
    np.testing.assert_array_equal(np.asarray(seq_beam),
                                  np.asarray(seq_greedy))
