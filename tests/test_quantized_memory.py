"""int8 cross-attention memory quantization (generation engine, bf16 path).

Pins: (1) dequantization error bound per channel, (2) decoder logits with
quantized memory stay close to exact bf16 logits, (3) bucket-width
independence of the scales (padded positions are zeroed before abs-max),
(4) the f32 engine path never quantizes (exactness of eval/test paths).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gstx.models.decoder import dequantize_kv, quantize_memory_kv
from gstx.models.layers import additive_mask


def _mem(rng, b, h, m, dh, valid_m):
    k = jnp.asarray(rng.randn(b, h, m, dh), jnp.float32)
    binm = (np.arange(m)[None, :] < valid_m).astype(np.int32)
    mask = additive_mask(jnp.asarray(np.broadcast_to(binm, (b, m))))
    return k, mask, binm


def test_decode_kernel_gated_off_under_tensor_parallelism(monkeypatch):
    """pallas_call is GSPMD-opaque: under Megatron TP the decode-step
    kernel would all-gather the 'model'-sharded K/V every step, so
    maybe_quant_decode_attention must fall back (return None) exactly like
    the fused-FFN kernels do."""
    from gstx.kernels import decode_attn, ffn

    monkeypatch.setattr(decode_attn, "_KERNEL_ENABLED", True)
    monkeypatch.setattr(ffn, "_on_tpu", lambda: True)
    q = jnp.zeros((2, 4, 1, 8), jnp.bfloat16)
    k = v = jnp.zeros((2, 4, 16, 8), jnp.int8)
    mask = jnp.zeros((2, 1, 1, 16), jnp.float32)
    ffn.set_tensor_parallel(True)
    try:
        assert decode_attn.maybe_quant_decode_attention(q, k, v, mask) is None
    finally:
        ffn.set_tensor_parallel(False)


def test_quantization_error_bound():
    rng = np.random.RandomState(0)
    k, mask, binm = _mem(rng, 2, 3, 64, 16, valid_m=50)
    v = jnp.asarray(rng.randn(2, 3, 64, 16) * 3, jnp.float32)
    (kq, vq, ks, vs), = quantize_memory_kv([(k, v)], mask, jnp.float32)
    kd, vd = dequantize_kv((kq, vq, ks, vs))
    # per-channel error <= scale/2 (+ tiny dtype slack) on valid positions
    for orig, deq, sc in ((k, kd, ks), (v, vd, vs)):
        err = np.abs(np.asarray(orig - deq))[:, :, :50, :]
        bound = np.asarray(sc)[:, :, :1, :] * 0.51
        assert (err <= bound).all()


def test_quantized_scales_independent_of_padding_width():
    rng = np.random.RandomState(1)
    k, mask_w, _ = _mem(rng, 2, 3, 64, 16, valid_m=40)
    v = jnp.asarray(rng.randn(2, 3, 64, 16), jnp.float32)
    # same valid prefix embedded in a narrower buffer
    k_n, mask_n, _ = _mem(rng, 2, 3, 48, 16, valid_m=40)
    k_n = k[:, :, :48, :]
    v_n = v[:, :, :48, :]
    (kq_w, vq_w, ks_w, vs_w), = quantize_memory_kv([(k, v)], mask_w,
                                                   jnp.float32)
    (kq_n, vq_n, ks_n, vs_n), = quantize_memory_kv([(k_n, v_n)], mask_n,
                                                   jnp.float32)
    np.testing.assert_array_equal(np.asarray(ks_w), np.asarray(ks_n))
    np.testing.assert_array_equal(np.asarray(vs_w), np.asarray(vs_n))
    np.testing.assert_array_equal(np.asarray(kq_w)[:, :, :40],
                                  np.asarray(kq_n)[:, :, :40])


def test_decode_step_with_quantized_memory_close(tiny_configs):
    enc_cfg, dec_cfg = tiny_configs
    from gstx.models.encdec import GSTVisualDialog
    from gstx.decode.sampler import init_cache

    model = GSTVisualDialog(enc_cfg, dec_cfg, dtype=jnp.float32)
    B, S, R = 2, 32, 5
    rng = np.random.RandomState(2)
    init_batch = dict(
        input_ids=jnp.ones((B, S), jnp.int32),
        image_feat=jnp.ones((B, R, enc_cfg.v_feature_size), jnp.float32),
        image_loc=jnp.ones((B, R, 5), jnp.float32),
        token_type_ids=jnp.zeros((B, S), jnp.int32),
        attention_mask=jnp.ones((B, S), jnp.int32),
        image_attention_mask=jnp.ones((B, R), jnp.int32),
        dec_input_ids=jnp.ones((B, 8), jnp.int32),
        dec_attention_mask=jnp.ones((B, 8), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), **init_batch,
                        method=GSTVisualDialog.init_all)
    ids = jnp.asarray(rng.randint(1, enc_cfg.vocab_size, (B, S)), jnp.int32)
    mem_kv, mem_mask = model.apply(
        params, ids, init_batch["image_feat"], init_batch["image_loc"],
        jnp.zeros((B, S), jnp.int32), jnp.ones((B, S), jnp.int32),
        jnp.ones((B, R), jnp.float32), method=GSTVisualDialog.decode_prepare)
    mem_q = quantize_memory_kv(mem_kv, mem_mask, jnp.float32)

    caches = init_cache(dec_cfg, B, 4, jnp.float32)
    tok = jnp.full((B, 1), 3, jnp.int32)
    exact, _ = model.apply(params, tok, 0, caches, mem_kv, mem_mask,
                           method=GSTVisualDialog.decode_step)
    quant, _ = model.apply(params, tok, 0, caches, mem_q, mem_mask,
                           method=GSTVisualDialog.decode_step)
    exact, quant = np.asarray(exact), np.asarray(quant)
    denom = np.abs(exact).max()
    assert np.abs(exact - quant).max() / denom < 0.05
    # ranking of the top token is stable at this tolerance on random logits
    assert (np.argmax(exact, -1) == np.argmax(quant, -1)).mean() >= 0.5


def test_f32_engine_never_quantizes(tiny_configs, monkeypatch):
    """The eval/CPU (f32) engine path must not touch quantization."""
    enc_cfg, dec_cfg = tiny_configs
    from gstx.models.encdec import GSTVisualDialog
    from gstx.decode.dialog_engine import make_dialog_engine
    from gstx.decode.sampler import DecodeSettings
    import gstx.models.decoder as dec_mod

    called = []
    orig = dec_mod.quantize_memory_kv
    monkeypatch.setattr(dec_mod, "quantize_memory_kv",
                        lambda *a, **k: called.append(1) or orig(*a, **k))
    model = GSTVisualDialog(enc_cfg, dec_cfg, dtype=jnp.float32)
    B, S, R = 2, 32, 5
    init_batch = dict(
        input_ids=jnp.ones((B, S), jnp.int32),
        image_feat=jnp.ones((B, R, enc_cfg.v_feature_size), jnp.float32),
        image_loc=jnp.ones((B, R, 5), jnp.float32),
        token_type_ids=jnp.zeros((B, S), jnp.int32),
        attention_mask=jnp.ones((B, S), jnp.int32),
        image_attention_mask=jnp.ones((B, R), jnp.int32),
        dec_input_ids=jnp.ones((B, 8), jnp.int32),
        dec_attention_mask=jnp.ones((B, 8), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), **init_batch,
                        method=GSTVisualDialog.init_all)
    engine = make_dialog_engine(
        model, dec_cfg, num_rounds=1,
        q_settings=DecodeSettings(max_steps=3),
        a_settings=DecodeSettings(max_steps=3, ngram_blocking_size=0),
        dtype=jnp.float32)
    ids = np.zeros((B, S), np.int32); ids[:, 0] = 101; ids[:, 5] = 102
    batch = {
        "enc_input_ids": jnp.asarray(ids),
        "enc_segments": jnp.zeros((B, S), jnp.int32),
        "enc_image_feat": init_batch["image_feat"],
        "enc_image_loc": init_batch["image_loc"],
        "enc_image_mask": jnp.ones((B, R), jnp.float32),
    }
    engine(params, params, batch, jax.random.PRNGKey(0))
    assert not called


def test_quantized_memory_rejects_dropout_mode(tiny_configs):
    """The int8 cross-attention path has no attention-dropout branch; a
    deterministic=False call must fail loudly instead of silently skipping
    dropout on the cross block (train/eval divergence)."""
    import pytest

    from gstx.core.config import CLS_ID
    from gstx.decode.sampler import init_cache
    from gstx.models.encdec import GSTVisualDialog

    enc_cfg, dec_cfg = tiny_configs
    model = GSTVisualDialog(enc_cfg, dec_cfg)
    B, S, R, T = 2, 8, 5, 4
    rng = np.random.RandomState(0)
    batch = dict(
        input_ids=jnp.full((B, S), CLS_ID, jnp.int32),
        image_feat=jnp.asarray(rng.randn(B, R, enc_cfg.v_feature_size),
                               jnp.float32),
        image_loc=jnp.asarray(rng.randn(B, R, 5), jnp.float32),
        token_type_ids=jnp.zeros((B, S), jnp.int32),
        attention_mask=jnp.ones((B, S), jnp.int32),
        image_attention_mask=jnp.ones((B, R), jnp.int32),
        dec_input_ids=jnp.full((B, T), 3, jnp.int32),
        dec_attention_mask=jnp.ones((B, T), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), **batch,
                        method=GSTVisualDialog.init_all)
    mem_kv, mem_mask = model.apply(
        params, batch["input_ids"], batch["image_feat"], batch["image_loc"],
        batch["token_type_ids"], batch["attention_mask"],
        batch["image_attention_mask"], method=GSTVisualDialog.decode_prepare)
    mem_q = quantize_memory_kv(mem_kv, mem_mask, jnp.float32)

    def run(mem, deterministic):
        hidden = jnp.asarray(rng.randn(B, T, dec_cfg.hidden_size), jnp.float32)
        self_mask = additive_mask(jnp.ones((B, T), jnp.float32))
        return model.apply(
            params, hidden, self_mask, mem, mem_mask, deterministic,
            rngs={"dropout": jax.random.PRNGKey(1)},
            method=lambda m, *a: m.decoder.layers[0].forward_with_memory_kv(
                *a))

    run(mem_q[0], True)  # deterministic int8 path works
    with pytest.raises(ValueError, match="deterministic=True"):
        run(mem_q[0], False)
