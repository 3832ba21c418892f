"""Dialog-engine tests: context-append semantics, overflow handling, and the
full jitted questioner/teacher loop over fixture data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fixtures import make_tokenizer, make_visdial_env
from gstx.core.config import CLS_ID, PAD_ID, SEP_ID
from gstx.data.loader import DataLoader
from gstx.data.visdial import VisdialGenDataset
from gstx.decode.dialog_engine import (
    DialogState,
    append_utterance,
    make_dialog_engine,
)
from gstx.decode.sampler import DecodeSettings
from gstx.models.encdec import GSTVisualDialog


def _state(ids, segs=None):
    ids = jnp.asarray(ids, jnp.int32)
    if segs is None:
        segs = jnp.zeros_like(ids)
    return DialogState(
        enc_input_ids=ids,
        enc_segments=jnp.asarray(segs, jnp.int32),
        enc_len=(ids != 0).sum(-1).astype(jnp.int32),
        abnormal=jnp.zeros(ids.shape[0], dtype=bool),
    )


def test_append_utterance_basic():
    state = _state([[101, 5, 6, 0, 0, 0, 0, 0]])
    utt = jnp.asarray([[7, 8, 102, 0]], jnp.int32)
    new, eff = append_utterance(state, utt, jnp.asarray([3]), segment=1,
                                write_segments=True)
    np.testing.assert_array_equal(
        np.asarray(new.enc_input_ids)[0], [101, 5, 6, 7, 8, 102, 0, 0])
    np.testing.assert_array_equal(
        np.asarray(new.enc_segments)[0], [0, 0, 0, 1, 1, 1, 0, 0])
    assert int(new.enc_len[0]) == 6
    assert not bool(new.abnormal[0])


def test_append_utterance_overflow_writes_sep():
    """generate.py:148-160: overflow writes one SEP and marks abnormal."""
    state = _state([[101, 5, 6, 7, 8, 9]])  # full up to len 6, cap 6
    utt = jnp.asarray([[11, 12, 13, 0]], jnp.int32)
    # start=6, len=3 -> 9 > 6 overflow; SEP would go at position 6 (dropped
    # because out of range) but length bookkeeping continues
    new, eff = append_utterance(state, utt, jnp.asarray([3]), segment=0,
                                write_segments=False)
    assert bool(new.abnormal[0])
    assert int(eff[0]) == 1
    np.testing.assert_array_equal(
        np.asarray(new.enc_input_ids)[0], [101, 5, 6, 7, 8, 9])


def test_append_utterance_partial_room():
    state = _state([[101, 5, 0, 0]])
    utt = jnp.asarray([[7, 8, 9, 0]], jnp.int32)
    new, eff = append_utterance(state, utt, jnp.asarray([3]), segment=0,
                                write_segments=False)
    # start=2, 2+3=5 > 4 -> overflow -> single SEP at position 2
    assert bool(new.abnormal[0])
    np.testing.assert_array_equal(
        np.asarray(new.enc_input_ids)[0], [101, 5, SEP_ID, 0])
    assert int(new.enc_len[0]) == 3


@pytest.mark.slow
def test_dialog_engine_full_loop(tmp_path, tiny_configs):
    import dataclasses

    cfg = make_visdial_env(str(tmp_path))
    tok = make_tokenizer()
    enc_cfg, dec_cfg = tiny_configs
    enc_cfg = dataclasses.replace(enc_cfg, vocab_size=256)
    dec_cfg = dataclasses.replace(dec_cfg, vocab_size=256)
    model = GSTVisualDialog(enc_cfg, dec_cfg)

    ds = VisdialGenDataset(cfg, tok, mode="vd_gen_val")
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    batch = next(dl.epoch(0))

    b, l, r = 2, cfg.max_seq_len, cfg.max_regions
    init_batch = dict(
        input_ids=jnp.ones((b, l), jnp.int32),
        image_feat=jnp.ones((b, r, enc_cfg.v_feature_size)),
        image_loc=jnp.ones((b, r, 5)),
        token_type_ids=jnp.zeros((b, l), jnp.int32),
        attention_mask=jnp.ones((b, l), jnp.int32),
        image_attention_mask=jnp.ones((b, r), jnp.int32),
        dec_input_ids=jnp.ones((b, 4), jnp.int32),
        dec_attention_mask=jnp.ones((b, 4), jnp.int32))
    q_params = model.init(jax.random.PRNGKey(0), **init_batch,
                          method=GSTVisualDialog.init_all)
    a_params = model.init(jax.random.PRNGKey(1), **init_batch,
                          method=GSTVisualDialog.init_all)

    engine = jax.jit(make_dialog_engine(
        model, dec_cfg, num_rounds=2,
        q_settings=DecodeSettings(max_steps=5, ngram_blocking_size=4),
        a_settings=DecodeSettings(max_steps=5, ngram_blocking_size=0)))
    out = engine(q_params, a_params,
                 {k: jnp.asarray(v) for k, v in batch.items()
                  if k != "image_id"},
                 jax.random.PRNGKey(3))

    assert out.questions.shape == (2, 2, 5)
    assert out.answers.shape == (2, 2, 5)
    assert out.answer_ppl.shape == (2, 2)
    assert np.isfinite(np.asarray(out.answer_ppl)).all()
    assert (np.asarray(out.answer_ppl) > 0).all()

    # context grew by the appended utterances and alternates segments
    final_ids = np.asarray(out.final_state.enc_input_ids)
    final_len = np.asarray(out.final_state.enc_len)
    init_len = (batch["enc_input_ids"] != 0).sum(-1)
    assert (final_len > init_len).all()
    # tokens in [init_len, final_len) are the appended dialog
    for i in range(2):
        appended = final_ids[i, init_len[i]:final_len[i]]
        assert (appended != 0).any()

    # -fused_sampler variant: same program shape, valid utterances (token
    # streams legitimately differ — it consumes rng differently; the
    # distribution identity is pinned analytically in test_sampling.py)
    fused = jax.jit(make_dialog_engine(
        model, dec_cfg, num_rounds=2,
        q_settings=DecodeSettings(max_steps=5, ngram_blocking_size=4,
                                  fused_sampler=True),
        a_settings=DecodeSettings(max_steps=5, ngram_blocking_size=0,
                                  fused_sampler=True)))
    fout = fused(q_params, a_params,
                 {k: jnp.asarray(v) for k, v in batch.items()
                  if k != "image_id"},
                 jax.random.PRNGKey(3))
    fq = np.asarray(fout.questions)
    assert fq.shape == (2, 2, 5)
    assert (fq >= 0).all() and (fq < dec_cfg.vocab_size).all()
    assert np.isfinite(np.asarray(fout.answer_ppl)).all()


def test_engine_sees_in_place_param_update(tmp_path, tiny_configs):
    """The per-run param-preparation memo must invalidate when a caller
    replaces a nested leaf IN PLACE (root dict id unchanged — exactly the
    pattern bench.py's EOS-bias surgery once used): a stale hit would
    silently decode every later batch with the old weights."""
    import dataclasses

    cfg = make_visdial_env(str(tmp_path))
    tok = make_tokenizer()
    enc_cfg, dec_cfg = tiny_configs
    enc_cfg = dataclasses.replace(enc_cfg, vocab_size=256)
    dec_cfg = dataclasses.replace(dec_cfg, vocab_size=256)
    model = GSTVisualDialog(enc_cfg, dec_cfg, dtype=jnp.bfloat16)

    ds = VisdialGenDataset(cfg, tok, mode="vd_gen_val")
    batch = next(DataLoader(ds, batch_size=2, shuffle=False,
                            num_workers=1).epoch(0))
    dev = {k: jnp.asarray(v) for k, v in batch.items() if k != "image_id"}

    b, l, r = 2, cfg.max_seq_len, cfg.max_regions
    init_batch = dict(
        input_ids=jnp.ones((b, l), jnp.int32),
        image_feat=jnp.ones((b, r, enc_cfg.v_feature_size)),
        image_loc=jnp.ones((b, r, 5)),
        token_type_ids=jnp.zeros((b, l), jnp.int32),
        attention_mask=jnp.ones((b, l), jnp.int32),
        image_attention_mask=jnp.ones((b, r), jnp.int32),
        dec_input_ids=jnp.ones((b, 4), jnp.int32),
        dec_attention_mask=jnp.ones((b, 4), jnp.int32))
    q_params = model.init(jax.random.PRNGKey(0), **init_batch,
                          method=GSTVisualDialog.init_all)
    a_params = model.init(jax.random.PRNGKey(1), **init_batch,
                          method=GSTVisualDialog.init_all)

    engine = make_dialog_engine(
        model, dec_cfg, num_rounds=1,
        q_settings=DecodeSettings(max_steps=3, top_k=1,
                                  ngram_blocking_size=0),
        a_settings=DecodeSettings(max_steps=3, top_k=1,
                                  ngram_blocking_size=0),
        dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(3)
    before = np.asarray(engine(q_params, a_params, dev, rng).questions)

    # in-place nested update: root id(q_params) is unchanged
    bias = np.zeros(dec_cfg.vocab_size, np.float32)
    bias[7] = 1e4  # force greedy argmax to token 7 everywhere
    q_params["params"]["decoder"]["lm_bias"] = jnp.asarray(bias)
    after = np.asarray(engine(q_params, a_params, dev, rng).questions)

    assert not np.array_equal(before, after), \
        "stale prepared-param memo: in-place leaf update was ignored"
    assert (after == 7).all()


@pytest.mark.slow
def test_context_buckets_equal_full_width(tmp_path, tiny_configs):
    """Bucketed engine must produce the identical dialog (greedy) as the
    full-width engine — masked tail positions are exact zeros."""
    import dataclasses

    cfg = make_visdial_env(str(tmp_path))
    tok = make_tokenizer()
    enc_cfg, dec_cfg = tiny_configs
    enc_cfg = dataclasses.replace(enc_cfg, vocab_size=256)
    dec_cfg = dataclasses.replace(dec_cfg, vocab_size=256)
    model = GSTVisualDialog(enc_cfg, dec_cfg)

    ds = VisdialGenDataset(cfg, tok, mode="vd_gen_val")
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    batch = {k: jnp.asarray(v) for k, v in next(dl.epoch(0)).items()
             if k != "image_id"}

    b, l, r = 2, cfg.max_seq_len, cfg.max_regions
    init_batch = dict(
        input_ids=jnp.ones((b, l), jnp.int32),
        image_feat=jnp.ones((b, r, enc_cfg.v_feature_size)),
        image_loc=jnp.ones((b, r, 5)),
        token_type_ids=jnp.zeros((b, l), jnp.int32),
        attention_mask=jnp.ones((b, l), jnp.int32),
        image_attention_mask=jnp.ones((b, r), jnp.int32),
        dec_input_ids=jnp.ones((b, 4), jnp.int32),
        dec_attention_mask=jnp.ones((b, 4), jnp.int32))
    q_params = model.init(jax.random.PRNGKey(0), **init_batch,
                          method=GSTVisualDialog.init_all)
    a_params = model.init(jax.random.PRNGKey(1), **init_batch,
                          method=GSTVisualDialog.init_all)

    greedy_q = DecodeSettings(max_steps=5, top_k=1, ngram_blocking_size=4)
    greedy_a = DecodeSettings(max_steps=5, top_k=1, ngram_blocking_size=0)
    full = make_dialog_engine(model, dec_cfg, num_rounds=3,
                              q_settings=greedy_q, a_settings=greedy_a)
    bucketed = make_dialog_engine(model, dec_cfg, num_rounds=3,
                                  q_settings=greedy_q, a_settings=greedy_a,
                                  context_buckets=(48, 72))

    rng = jax.random.PRNGKey(11)
    out_full = full(q_params, a_params, batch, rng)
    out_buck = bucketed(q_params, a_params, batch, rng)
    np.testing.assert_array_equal(np.asarray(out_full.questions),
                                  np.asarray(out_buck.questions))
    np.testing.assert_array_equal(np.asarray(out_full.answers),
                                  np.asarray(out_buck.answers))
    np.testing.assert_allclose(np.asarray(out_full.answer_ppl),
                               np.asarray(out_buck.answer_ppl),
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_full.abnormal),
                                  np.asarray(out_buck.abnormal))
    assert out_buck.final_state.enc_input_ids.shape == \
        out_full.final_state.enc_input_ids.shape


def test_dynamic_buckets_identical_and_narrower(tmp_path, tiny_configs):
    """dynamic_buckets=True must produce the identical dialog as the
    full-width engine, while actually choosing narrower round widths than
    the static worst-case schedule when utterances are short."""
    import dataclasses

    cfg = make_visdial_env(str(tmp_path))
    tok = make_tokenizer()
    enc_cfg, dec_cfg = tiny_configs
    enc_cfg = dataclasses.replace(enc_cfg, vocab_size=256)
    dec_cfg = dataclasses.replace(dec_cfg, vocab_size=256)
    model = GSTVisualDialog(enc_cfg, dec_cfg)

    ds = VisdialGenDataset(cfg, tok, mode="vd_gen_val")
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    batch = {k: jnp.asarray(v) for k, v in next(dl.epoch(0)).items()
             if k != "image_id"}

    b, l, r = 2, cfg.max_seq_len, cfg.max_regions
    init_batch = dict(
        input_ids=jnp.ones((b, l), jnp.int32),
        image_feat=jnp.ones((b, r, enc_cfg.v_feature_size)),
        image_loc=jnp.ones((b, r, 5)),
        token_type_ids=jnp.zeros((b, l), jnp.int32),
        attention_mask=jnp.ones((b, l), jnp.int32),
        image_attention_mask=jnp.ones((b, r), jnp.int32),
        dec_input_ids=jnp.ones((b, 4), jnp.int32),
        dec_attention_mask=jnp.ones((b, 4), jnp.int32))
    q_params = model.init(jax.random.PRNGKey(0), **init_batch,
                          method=GSTVisualDialog.init_all)
    # bias the LM head hard toward EOS => 1-2 token utterances, the
    # regime where the dynamic schedule stays in the smallest bucket
    q_params["params"]["decoder"]["lm_bias"] = (
        q_params["params"]["decoder"]["lm_bias"].at[SEP_ID].add(50.0))
    a_params = q_params

    greedy_q = DecodeSettings(max_steps=5, top_k=1, ngram_blocking_size=4)
    greedy_a = DecodeSettings(max_steps=5, top_k=1, ngram_blocking_size=0)
    n_rounds = 6
    full = make_dialog_engine(model, dec_cfg, num_rounds=n_rounds,
                              q_settings=greedy_q, a_settings=greedy_a)
    dyn = make_dialog_engine(model, dec_cfg, num_rounds=n_rounds,
                             q_settings=greedy_q, a_settings=greedy_a,
                             context_buckets=(48, 72),
                             dynamic_buckets=True)
    static = make_dialog_engine(model, dec_cfg, num_rounds=n_rounds,
                                q_settings=greedy_q, a_settings=greedy_a,
                                context_buckets=(48, 72))

    dyn_widths, static_widths = [], []

    def rec(acc, one_round):
        def f(*args):
            acc.append(args[2].enc_input_ids.shape[1])
            return one_round(*args)
        return f

    rng = jax.random.PRNGKey(11)
    out_full = full(q_params, a_params, batch, rng)
    out_dyn = dyn(q_params, a_params, batch, rng,
                  round_fn=rec(dyn_widths, dyn.one_round))
    static(q_params, a_params, batch, rng,
           round_fn=rec(static_widths, static.one_round))
    np.testing.assert_array_equal(np.asarray(out_full.questions),
                                  np.asarray(out_dyn.questions))
    np.testing.assert_array_equal(np.asarray(out_full.answers),
                                  np.asarray(out_dyn.answers))
    np.testing.assert_allclose(np.asarray(out_full.answer_ppl),
                               np.asarray(out_dyn.answer_ppl), rtol=1e-4)
    # 1-2 token utterances: every dynamic round fits the smallest bucket,
    # while the static worst-case schedule (+10/round) must widen
    assert dyn_widths == [48] * n_rounds, dyn_widths
    assert static_widths[-1] > 48, static_widths
    assert max(dyn_widths) < max(static_widths)
