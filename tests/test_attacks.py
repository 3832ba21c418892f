"""Unit tests for the attack primitives (text_attack.py semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fixtures import make_tokenizer
from gstx.core.config import CLS_ID, MASK_ID, PAD_ID, SEP_ID
from gstx.eval.attacks import TextAttack


def _ctx(tok, rounds):
    """[CLS] r1 [SEP] r2 [SEP] ... padded to 64."""
    ids = [CLS_ID]
    for r in rounds:
        ids.extend(tok.encode(r))
        ids.append(SEP_ID)
    out = np.zeros((1, 64), np.int64)
    out[0, : len(ids)] = ids
    return out


def test_pick_most_similar_words():
    idx2word = {0: "cat", 1: "dog", 2: "car", 3: "kitten"}
    sim = np.asarray([
        [1.0, 0.6, 0.1, 0.9],
        [0.6, 1.0, 0.2, 0.5],
        [0.1, 0.2, 1.0, 0.1],
        [0.9, 0.5, 0.1, 1.0],
    ])
    words, vals = TextAttack.pick_most_similar_words_batch(
        [0], sim, idx2word, ret_count=3, threshold=0.5)
    assert words[0] == ["kitten", "dog"]  # sorted by similarity, >= 0.5
    np.testing.assert_allclose(vals[0], [0.9, 0.6])


def test_coreference_attack_substitutes_rounds():
    tok = make_tokenizer()
    idx2word = {0: "dog", 1: "horse", 2: "man"}
    # dog's closest (excluding itself) is horse at 0.8
    sim = np.asarray([
        [1.0, 0.8, 0.1],
        [0.8, 1.0, 0.2],
        [0.1, 0.2, 1.0],
    ])
    word2idx = {w: i for i, w in idx2word.items()}
    atk = TextAttack(tok, sim, idx2word, word2idx, max_seq_len=64)

    rounds = ["a man riding", "is there a dog", "yes it is", "what color"]
    ids = _ctx(tok, rounds)
    sep_indices = np.zeros((1, 8), np.int64)
    # target_round=1 -> segments 2*1-1=1 and 2*1=2 get 'dog'->'horse'
    out = atk.coreference_attack(ids, sep_indices, {"1": "dog"})
    decoded = tok.decode([int(t) for t in out[0]], skip_special_tokens=False)
    segs = [s.strip() for s in decoded.replace("[CLS]", "").split("[SEP]")]
    assert "dog" not in segs[1]
    assert "horse" in segs[1]
    assert segs[0] == "a man riding"  # round 0 untouched


def test_coreference_attack_unknown_word_noop():
    tok = make_tokenizer()
    atk = TextAttack(tok, np.eye(2), {0: "x", 1: "y"}, {"x": 0, "y": 1},
                     max_seq_len=64)
    ids = _ctx(tok, ["a man riding"])
    out = atk.coreference_attack(ids, None, {"0": "zebra"})
    np.testing.assert_array_equal(out, ids)


def test_random_token_attack_refills_masks():
    tok = make_tokenizer()
    vocab_size = 256

    def fake_mlm(input_ids, token_type_ids, attention_mask, image):
        # always predicts token 7
        logits = np.zeros(input_ids.shape + (vocab_size,), np.float32)
        logits[..., 7] = 1.0
        return logits

    atk = TextAttack(tok, mlm_fill=fake_mlm, max_seq_len=64)
    ids = _ctx(tok, ["a man riding"])
    ids[0, 2] = MASK_ID
    out = atk.random_token_attack(
        np.repeat(ids, 5, 0), np.zeros((5, 64), np.int64),
        np.ones((5, 64), np.float32))
    assert out.shape == (5, 64)
    assert (out[:, 2] == 7).all()       # mask refilled for every row
    assert (out[0] == out[4]).all()     # broadcast from row 0
    assert out[0, 0] == CLS_ID          # untouched elsewhere


def test_random_token_attack_no_masks_noop():
    tok = make_tokenizer()

    def fake_mlm(input_ids, token_type_ids, attention_mask, image):
        return np.zeros(input_ids.shape + (16,), np.float32)

    atk = TextAttack(tok, mlm_fill=fake_mlm)
    ids = _ctx(tok, ["a man riding"])
    out = atk.random_token_attack(ids, np.zeros_like(ids),
                                  np.ones(ids.shape, np.float32))
    np.testing.assert_array_equal(out, ids)
