"""Synthetic data fixtures: tiny VisDial/CC12M JSONs + a synthetic region
feature store + a small WordPiece vocab (SURVEY.md §4 test strategy)."""

import json
import os

import numpy as np

from gstx.data.feature_store import make_synthetic_store
from gstx.data.tokenizer import BertTokenizer, make_test_vocab

WORDS = [
    "a", "man", "riding", "horse", "on", "the", "beach", "is", "there",
    "dog", "in", "picture", "yes", "no", "what", "color", "brown", "black",
    "how", "many", "people", "one", "two", "three", "it", "sunny", "day",
    "water", "visible", "i", "think", "so", "can", "you", "see", "sand",
    "white", "red", "blue", "wearing", "hat", "shirt", "##ing", "##s",
]


def make_tokenizer():
    return BertTokenizer(vocab=make_test_vocab(WORDS))


def make_visdial_json(path, num_dialogs=4, num_questions=30, num_answers=40,
                      seed=0, with_gt=True, test_mode=False):
    rng = np.random.RandomState(seed)
    sample = lambda k: " ".join(
        WORDS[i] for i in rng.randint(0, 36, size=k))
    questions = [sample(4) for _ in range(num_questions)]
    answers = [sample(3) for _ in range(num_answers)]
    dialogs = []
    for d in range(num_dialogs):
        rounds = []
        n_rounds = 10 if not test_mode else rng.randint(2, 11)
        for r in range(n_rounds):
            opts = rng.permutation(num_answers)[:100 % num_answers or 1]
            # answer_options indexes must cover 100 entries for eval modes
            options = list(rng.randint(0, num_answers, size=100))
            gt = int(rng.randint(0, 100))
            ans = options[gt]
            rnd = {
                "question": int(rng.randint(0, num_questions)),
                "answer_options": [int(o) for o in options],
                "gt_index": gt,
            }
            if not (test_mode and r == n_rounds - 1):
                rnd["answer"] = int(ans)
            else:
                rnd["answer"] = int(ans)  # kept for simplicity
            rounds.append(rnd)
        dialog = {
            "image_id": 1000 + d,
            "caption": sample(6),
            "dialog": rounds,
        }
        if test_mode:
            dialog["round_id"] = n_rounds
        dialogs.append(dialog)
    data = {"data": {"dialogs": dialogs, "questions": questions,
                     "answers": answers}}
    with open(path, "w") as f:
        json.dump(data, f)
    return data


def make_dense_json(path, num_dialogs=4, seed=1):
    rng = np.random.RandomState(seed)
    dense = []
    for d in range(num_dialogs):
        dense.append({
            "image_id": 1000 + d,
            "round_id": int(rng.randint(1, 11)),
            "gt_relevance": [float(x) for x in
                             rng.rand(100) * (rng.rand(100) > 0.7)],
        })
    with open(path, "w") as f:
        json.dump(dense, f)
    return dense


def make_cc12m_caption_json(path, num_images=4, seed=2):
    rng = np.random.RandomState(seed)
    sample = lambda k: " ".join(WORDS[i] for i in rng.randint(0, 36, size=k))
    caps = [{"image_id": 2000 + i, "caption": sample(8)}
            for i in range(num_images)]
    with open(path, "w") as f:
        json.dump(caps, f)
    return caps


def make_cc12m_dialog_json(path, num_images=4, seed=3):
    rng = np.random.RandomState(seed)
    sample = lambda k: " ".join(WORDS[i] for i in rng.randint(0, 36, size=k))
    data = []
    for i in range(num_images):
        data.append({
            "image_id": 2000 + i,
            "url": f"http://example/{i}",
            "caption": sample(8),
            "dialog": [{
                "question": sample(4),
                "answer": sample(3),
                "answer_ppl": float(rng.rand() * 100),
            } for _ in range(10)],
        })
    with open(path, "w") as f:
        json.dump(data, f)
    return data


def make_visdial_env(tmpdir, num_dialogs=4):
    """Create the full fixture environment; returns a GSTConfig pointing at
    it."""
    from gstx.core.config import GSTConfig

    paths = {
        "visdial_processed_train": os.path.join(tmpdir, "train.json"),
        "visdial_processed_val": os.path.join(tmpdir, "val.json"),
        "visdial_processed_test": os.path.join(tmpdir, "test.json"),
        "visdial_processed_val_dense_annotations":
            os.path.join(tmpdir, "dense.json"),
        "visdial_image_feats": os.path.join(tmpdir, "feats.store"),
    }
    make_visdial_json(paths["visdial_processed_train"], num_dialogs, seed=0)
    make_visdial_json(paths["visdial_processed_val"], num_dialogs, seed=5)
    make_visdial_json(paths["visdial_processed_test"], num_dialogs, seed=6,
                      test_mode=True)
    make_dense_json(paths["visdial_processed_val_dense_annotations"],
                    num_dialogs)
    make_synthetic_store(paths["visdial_image_feats"],
                         [1000 + i for i in range(num_dialogs)],
                         num_boxes=12, feat_dim=16, num_classes=11)
    return GSTConfig(max_seq_len=96, max_utt_len=12, num_options=10,
                     max_regions=13, **paths)


def tiny_enc_dec_configs():
    """Tiny EncoderConfig/DecoderConfig (same topology as conftest's
    tiny_configs fixture) importable from subprocess driver scripts."""
    from gstx.core.config import DecoderConfig, EncoderConfig

    enc = EncoderConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=64,
        v_feature_size=16, v_target_size=11, v_hidden_size=24,
        v_num_hidden_layers=2, v_num_attention_heads=4,
        v_intermediate_size=24, bi_hidden_size=24, bi_num_attention_heads=4,
        bi_intermediate_size=24, v_biattention_id=(0, 1),
        t_biattention_id=(2, 3), hidden_dropout_prob=0.0,
        v_hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        v_attention_probs_dropout_prob=0.0)
    dec = DecoderConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    return enc, dec


def make_train_rows_batch(enc_cfg, b=4, rounds=3, seq_len=24, regions=7,
                          utt_len=10, seed=0):
    """Deterministic [B, rounds, 1, ...] train batch (the train_gen step's
    input layout) shared by the TP / multi-host tests and their subprocess
    drivers."""
    rng = np.random.RandomState(seed)
    return {
        "enc_input_ids": rng.randint(
            1, enc_cfg.vocab_size,
            size=(b, rounds, 1, seq_len)).astype(np.int32),
        "enc_segments": np.zeros((b, rounds, 1, seq_len), np.int32),
        "enc_sep_indices": np.zeros((b, rounds, 1, 8), np.int32),
        "enc_mlm_labels": np.full((b, rounds, 1, seq_len), -1, np.int32),
        "enc_att_mask": np.ones((b, rounds, 1, seq_len), np.float32),
        "dec_input_ids": rng.randint(
            1, enc_cfg.vocab_size,
            size=(b, rounds, 1, utt_len)).astype(np.int32),
        "dec_att_mask": np.ones((b, rounds, 1, utt_len), np.float32),
        "dec_labels": rng.randint(
            0, enc_cfg.vocab_size,
            size=(b, rounds, 1, utt_len)).astype(np.int32),
        "enc_image_feat": rng.rand(
            b, regions, enc_cfg.v_feature_size).astype(np.float32),
        "enc_image_loc": rng.rand(b, regions, 5).astype(np.float32),
        "enc_image_mask": np.ones((b, regions), np.float32),
    }


def make_gen_batch(enc_cfg, b=4, seq_len=48, regions=7, cap_len=14, seed=3):
    """Deterministic caption-context batch in the dialog-engine layout
    (dataloader_cc12m_gen.py:82-92), shared by multi-host generate tests
    and their subprocess drivers."""
    rng = np.random.RandomState(seed)
    ids = np.zeros((b, seq_len), np.int32)
    segs = np.zeros((b, seq_len), np.int32)
    ids[:, 0] = 101
    ids[:, 1:cap_len - 1] = rng.randint(105, enc_cfg.vocab_size,
                                        size=(b, cap_len - 2))
    ids[:, cap_len - 1] = 102
    segs[:, :cap_len] = 1
    return {
        "enc_input_ids": ids,
        "enc_segments": segs,
        "enc_image_feat": rng.rand(
            b, regions, enc_cfg.v_feature_size).astype(np.float32),
        "enc_image_loc": rng.rand(b, regions, 5).astype(np.float32),
        "enc_image_mask": np.ones((b, regions), np.float32),
    }


def init_tiny_params(enc_cfg, dec_cfg, seq_len=24, regions=7, utt_len=10,
                     seed=0):
    """Deterministic tiny-model params for subprocess-shared tests."""
    import jax
    import jax.numpy as jnp

    from gstx.models.encdec import GSTVisualDialog

    init_batch = dict(
        input_ids=jnp.ones((2, seq_len), jnp.int32),
        image_feat=jnp.ones((2, regions, enc_cfg.v_feature_size)),
        image_loc=jnp.ones((2, regions, 5)),
        token_type_ids=jnp.zeros((2, seq_len), jnp.int32),
        attention_mask=jnp.ones((2, seq_len), jnp.int32),
        image_attention_mask=jnp.ones((2, regions), jnp.int32),
        dec_input_ids=jnp.ones((2, utt_len), jnp.int32),
        dec_attention_mask=jnp.ones((2, utt_len), jnp.int32))
    model = GSTVisualDialog(enc_cfg, dec_cfg)
    return model.init(jax.random.PRNGKey(seed), **init_batch,
                      method=GSTVisualDialog.init_all)


def write_vocab_file(path):
    """vocab.txt where line number == token id (gaps filled with [unusedN])."""
    vocab = make_test_vocab(WORDS)
    max_id = max(vocab.values())
    lines = [f"[unused{i}]" for i in range(max_id + 1)]
    for tok, idx in vocab.items():
        lines[idx] = tok
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def make_cli_env(tmpdir, num_dialogs=4):
    """Full CLI fixture: data + vocab file + tiny model config JSONs.
    Returns (config_args: list[str], GSTConfig)."""
    import json as _json
    import os as _os

    cfg = make_visdial_env(tmpdir, num_dialogs)
    vocab_path = _os.path.join(tmpdir, "vocab.txt")
    write_vocab_file(vocab_path)

    enc_json = {
        "vocab_size": 256, "hidden_size": 32, "num_hidden_layers": 4,
        "num_attention_heads": 4, "intermediate_size": 64,
        "hidden_dropout_prob": 0.1, "attention_probs_dropout_prob": 0.1,
        "v_feature_size": 16, "v_target_size": 11, "v_hidden_size": 24,
        "v_num_hidden_layers": 2, "v_num_attention_heads": 4,
        "v_intermediate_size": 24, "bi_hidden_size": 24,
        "bi_num_attention_heads": 4, "bi_intermediate_size": 24,
        "v_biattention_id": [0, 1], "t_biattention_id": [2, 3],
    }
    dec_json = {
        "vocab_size": 256, "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 64,
        "hidden_dropout_prob": 0.1, "attention_probs_dropout_prob": 0.1,
    }
    enc_path = _os.path.join(tmpdir, "enc.json")
    dec_path = _os.path.join(tmpdir, "dec.json")
    _json.dump(enc_json, open(enc_path, "w"))
    _json.dump(dec_json, open(dec_path, "w"))

    cfg = cfg.replace(vocab_path=vocab_path, model_enc_config=enc_path,
                      model_dec_config=dec_path, dtype="float32",
                      num_workers=1, save_path=_os.path.join(tmpdir, "out"))
    args = []
    for field in ("visdial_processed_train", "visdial_processed_val",
                  "visdial_processed_test",
                  "visdial_processed_val_dense_annotations",
                  "visdial_image_feats", "vocab_path", "model_enc_config",
                  "model_dec_config", "save_path"):
        args.extend(["-" + field, getattr(cfg, field)])
    args.extend(["-max_seq_len", str(cfg.max_seq_len),
                 "-max_utt_len", str(cfg.max_utt_len),
                 "-num_options", str(cfg.num_options),
                 "-max_regions", str(cfg.max_regions),
                 "-dtype", "float32", "-num_workers", "1"])
    return args, cfg
