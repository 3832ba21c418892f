"""Composed parity at PRODUCTION dimensions (VERDICT r3 missing #2).

The tiny-config harnesses (tests/test_reference_model_parity.py,
tests/test_torch_parity_full.py) run at hidden 32 / head_dim 8 / 2
connection layers; this file assembles the reference's OWN torch modules
at the real released topology — 12 text + 6 visual layers, 6 connection
layers at v_biattention_id=[0..5]/t_biattention_id=[6..11], hidden
768/1024/1024, head_dim 64, vocab 30522
(/root/reference/config/bert_base_6layer_6conect_enc.json:5-29,
models/vilbert_dialog.py:806-912) — converts the full production-named
state dict through gstx's converter BOTH ways, and pins end-to-end
teacher-forced logits plus the 3 pretraining losses.

One composed CPU forward at ~600M params: slow-marked, ~minutes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")
from torch import nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from gstx.core.checkpoint import (  # noqa: E402
    convert_torch_state_dict, to_torch_state_dict)
from gstx.core.config import DecoderConfig, EncoderConfig  # noqa: E402
from gstx.models.encdec import (  # noqa: E402
    GSTVisualDialog, derive_labels_and_inputs, teacher_forced_loss)
from gstx.models.heads import (  # noqa: E402
    masked_img_loss, masked_lm_loss, soft_nsp_loss)
from test_reference_model_parity import (  # noqa: E402
    _ref_dec_config, _ref_enc_config, load_reference_modules)

EOS_ID, PAD_ID = 102, 0
ENC_JSON = "/root/reference/config/bert_base_6layer_6conect_enc.json"
DEC_JSON = "/root/reference/config/bert_base_6layer_6conect_dec.json"

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def prod_configs():
    import os

    if not os.path.exists(ENC_JSON):
        pytest.skip("reference config JSONs not available")
    enc = EncoderConfig.from_json(ENC_JSON)
    dec = DecoderConfig.from_json(DEC_JSON)
    # parity forwards are deterministic: zero the dropouts on the gstx side
    # (the torch side runs under .eval())
    import dataclasses
    enc = dataclasses.replace(
        enc, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0)
    dec = dataclasses.replace(
        dec, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    return enc, dec


@pytest.fixture(scope="module")
def prod_assembly(prod_configs):
    mods = load_reference_modules()
    if mods is None:
        pytest.skip("reference tree not available")
    vd, vdd, vdm = mods
    enc_cfg, dec_cfg = prod_configs
    assert enc_cfg.hidden_size == 768 and enc_cfg.vocab_size == 30522
    assert len(enc_cfg.v_biattention_id) == 6
    assert dec_cfg.num_hidden_layers == 12

    torch.manual_seed(20)
    cfg = _ref_enc_config(vd, enc_cfg, mode="vd_eval_val",
                          model_arch="enc_dec_a")
    encoder = vd.BertForMultiModalPreTraining(cfg).eval()
    vlfusion = vdm.VLFusion(cfg).eval()
    dcfg = _ref_dec_config(vdd, dec_cfg)
    decoder = vdd.BertForSequenceGeneration(dcfg).eval()
    # reference tying topology (train_gen.py:293): decoder INPUT embeddings
    # become the encoder's shared DialogEmbeddings; lm head stays orphaned
    decoder.bert.embeddings = encoder.bert.embeddings

    sd = {}
    for k, v in encoder.state_dict().items():
        sd[f"encoder.bert_pretrained.{k}"] = v.detach().numpy()
    for k, v in decoder.state_dict().items():
        sd[f"decoder.decoder.{k}"] = v.detach().numpy()
    for k, v in vlfusion.state_dict().items():
        sd[f"vlfusion.{k}"] = v.detach().numpy()
    tree = convert_torch_state_dict(
        sd, num_text_layers=enc_cfg.num_hidden_layers,
        num_visual_layers=enc_cfg.v_num_hidden_layers,
        num_co_layers=len(enc_cfg.v_biattention_id),
        num_dec_layers=dec_cfg.num_hidden_layers)
    fl = GSTVisualDialog(enc_cfg, dec_cfg)

    B, L, R, T = 2, 256, 37, 18
    g = torch.Generator().manual_seed(21)
    batch = {
        "input_ids": torch.randint(1, enc_cfg.vocab_size, (B, L),
                                   generator=g),
        "image_feat": torch.randn(B, R, enc_cfg.v_feature_size, generator=g),
        "image_loc": torch.rand(B, R, 5, generator=g),
        # exercise both the base segment table AND the 10-slot extension
        "token_type_ids": torch.randint(0, 4, (B, L), generator=g),
        "attention_mask": (torch.rand(B, L, generator=g) > 0.2).long(),
        "image_attention_mask": (torch.rand(B, R, generator=g) > 0.2).long(),
    }
    batch["attention_mask"][:, 0] = 1
    batch["image_attention_mask"][:, 0] = 1
    dec_ids = torch.randint(1, dec_cfg.vocab_size, (B, T), generator=g)
    dec_ids[:, 0] = 101
    dec_ids[:, -2] = EOS_ID
    dec_ids[:, -1] = PAD_ID
    return (vd, cfg, encoder, vlfusion, decoder, fl, {"params": tree},
            sd, batch, dec_ids)


def _jx(t):
    return jnp.asarray(t.numpy())


def test_production_converter_roundtrip(prod_assembly, prod_configs):
    """gstx tree -> reference-named state dict reproduces every production
    key bit-for-bit (the 'both ways' requirement at the real name surface:
    24 transformer layers, 6 connection layers, tied duplicates)."""
    (_, _, _, _, _, _, params, sd, _, _) = prod_assembly
    back = to_torch_state_dict(params)
    missing = set(sd) - set(back)
    assert not missing, sorted(missing)[:20]
    for k, v in sd.items():
        if ".biOutput.q_dense" in k:
            # documented dead params: the reference constructs
            # q_dense1/q_dense2 but never uses them in forward
            # (vilbert_dialog.py:722-731 vs :733-744); the converter drops
            # them and the exporter zero-fills so strict loads accept it
            if k.endswith(".weight"):
                assert not np.any(back[k]), k
            continue
        np.testing.assert_array_equal(back[k], v, err_msg=k)


def test_production_teacher_forced_logits_and_loss(prod_assembly):
    """encode -> VLFusion (293-token memory) -> teacher-forced decode at
    production dimensions, logits pinned <=1e-4 vs the reference's own
    forward."""
    (_, _, encoder, vlfusion, decoder, fl, params, _, batch,
     dec_ids) = prod_assembly
    dec_mask = (dec_ids != PAD_ID).long()
    t_labels = torch.zeros_like(dec_ids)
    t_labels[:, :-1] = dec_ids[:, 1:]
    t_inputs = dec_ids.masked_fill(dec_ids == EOS_ID, PAD_ID)

    with torch.no_grad():
        hidden_t, hidden_v = encoder(
            batch["input_ids"], batch["image_feat"], batch["image_loc"],
            token_type_ids=batch["token_type_ids"],
            attention_mask=batch["attention_mask"],
            image_attention_mask=batch["image_attention_mask"])
        memory, mem_mask = vlfusion(hidden_t, hidden_v,
                                    batch["attention_mask"],
                                    batch["image_attention_mask"])
        assert memory.shape[1] == 293  # 37 regions + 256 text tokens
        dout = decoder(decoder_input_ids=t_inputs, attention_mask=dec_mask,
                       encoder_hidden_states=memory,
                       encoder_attention_mask=mem_mask)
        want_logits = dout.logits
        want_loss = nn.CrossEntropyLoss(ignore_index=PAD_ID)(
            want_logits.reshape(-1, want_logits.shape[-1]),
            t_labels.reshape(-1))

    labels, inputs = derive_labels_and_inputs(_jx(dec_ids), EOS_ID, PAD_ID)
    np.testing.assert_array_equal(np.asarray(labels), t_labels.numpy())
    got_logits = fl.apply(
        params, _jx(batch["input_ids"]), _jx(batch["image_feat"]),
        _jx(batch["image_loc"]), _jx(batch["token_type_ids"]),
        _jx(batch["attention_mask"]), _jx(batch["image_attention_mask"]),
        inputs, _jx(dec_mask), method=GSTVisualDialog.score)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               rtol=1e-4, atol=1e-4)
    got_loss = teacher_forced_loss(got_logits, labels, PAD_ID)
    np.testing.assert_allclose(float(got_loss), float(want_loss),
                               rtol=1e-5, atol=1e-6)


def test_production_pretraining_losses(prod_assembly, prod_configs):
    """enc_only train branch at production dims: MLM (30522-way), masked
    image KLDiv (1601 classes), soft NSP — all three losses <=1e-4."""
    (vd, _, encoder, _, _, fl, params, _, batch, _) = prod_assembly
    enc_cfg, _ = prod_configs
    cfg2 = _ref_enc_config(vd, enc_cfg, mode="vd_train",
                           model_arch="enc_only_a")
    enc_only = vd.BertForMultiModalPreTraining(cfg2).eval()
    enc_only.load_state_dict(encoder.state_dict(), strict=True)

    B, L = batch["input_ids"].shape
    R = batch["image_feat"].shape[1]
    g = torch.Generator().manual_seed(23)
    mlm_labels = torch.where(
        torch.rand(B, L, generator=g) < 0.15,
        torch.randint(0, enc_cfg.vocab_size, (B, L), generator=g),
        torch.full((B, L), -1))
    image_target = torch.softmax(
        torch.randn(B, R, enc_cfg.v_target_size, generator=g), -1)
    image_label = torch.where(
        torch.rand(B, R, generator=g) < 0.2,
        torch.ones(B, R, dtype=torch.long),
        torch.full((B, R), -1, dtype=torch.long))
    image_label[:, 1] = 1
    nsp_labels = torch.softmax(torch.randn(B, 2, generator=g), -1)

    with torch.no_grad():
        want_lm, want_img, want_nsp, _, _, _ = enc_only(
            batch["input_ids"], batch["image_feat"], batch["image_loc"],
            token_type_ids=batch["token_type_ids"],
            attention_mask=batch["attention_mask"],
            image_attention_mask=batch["image_attention_mask"],
            masked_lm_labels=mlm_labels, image_label=image_label,
            image_target=image_target, next_sentence_label=nsp_labels)

    got_t, got_v, got_nsp = fl.apply(
        params, _jx(batch["input_ids"]), _jx(batch["image_feat"]),
        _jx(batch["image_loc"]), _jx(batch["token_type_ids"]),
        _jx(batch["attention_mask"]), _jx(batch["image_attention_mask"]),
        method=GSTVisualDialog.pretrain_scores)
    got = (masked_lm_loss(got_t, _jx(mlm_labels)),
           masked_img_loss(got_v, _jx(image_target), _jx(image_label)),
           soft_nsp_loss(got_nsp, _jx(nsp_labels)))
    for g_, w_ in zip(got, (want_lm, want_img, want_nsp)):
        np.testing.assert_allclose(float(g_), float(w_), rtol=1e-4,
                                   atol=1e-5)
