"""Compatibility with the reference's shipped config JSONs (read from the
read-only reference checkout when present; skipped elsewhere)."""

import os

import pytest

REF = "/root/reference/config"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_encoder_config_loads_reference_json():
    from gstx.core.config import EncoderConfig

    cfg = EncoderConfig.from_json(
        os.path.join(REF, "bert_base_6layer_6conect_enc.json"))
    assert cfg.hidden_size == 768
    assert cfg.v_hidden_size == 1024
    assert cfg.v_num_hidden_layers == 6
    assert cfg.bi_num_attention_heads == 8
    assert cfg.v_biattention_id == (0, 1, 2, 3, 4, 5)
    assert cfg.t_biattention_id == (6, 7, 8, 9, 10, 11)
    assert cfg.hidden_dropout_prob == 0.3
    # defaults the JSON doesn't override
    assert cfg.fusion_method == "mul"
    assert cfg.with_coattention and cfg.fixed_t_layer == 0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_decoder_config_loads_reference_json():
    from gstx.core.config import DecoderConfig

    cfg = DecoderConfig.from_json(
        os.path.join(REF, "bert_base_6layer_6conect_dec.json"))
    assert cfg.num_hidden_layers == 12
    assert cfg.add_cross_attention and cfg.is_decoder
    assert cfg.bos_token_id == 101 and cfg.eos_token_id == 102
    assert cfg.pad_token_id == 0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_dataclass_defaults_match_reference_jsons():
    """Our dataclass defaults ARE the production config — loading the
    reference JSONs must be a no-op versus the defaults."""
    import dataclasses

    from gstx.core.config import DecoderConfig, EncoderConfig

    enc = EncoderConfig.from_json(
        os.path.join(REF, "bert_base_6layer_6conect_enc.json"))
    assert enc == EncoderConfig()
    dec = DecoderConfig.from_json(
        os.path.join(REF, "bert_base_6layer_6conect_dec.json"))
    assert dec == DecoderConfig()
