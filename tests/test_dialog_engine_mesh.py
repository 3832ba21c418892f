"""Multi-chip dialog engine: the SPMD replacement for the reference's
DataParallel-wrapped generation (generate.py:67,77).

The engine's round program contains exactly the constructs that surprise
under SPMD — fixed-shape scatter appends, a while_loop decode, dynamic
bucket widening with host syncs — so these tests pin that the 8-device
mesh engine is OUTPUT-IDENTICAL to the single-device engine (same rng
counters, same math; only the partitioning differs), including the
abnormal-overflow mask, across the {buckets} x {quantize} option matrix.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstx.core.config import CLS_ID, PAD_ID, SEP_ID
from gstx.core.mesh import make_mesh
from gstx.decode.dialog_engine import make_dialog_engine
from gstx.decode.sampler import DecodeSettings
from gstx.models.encdec import GSTVisualDialog


B, S, R = 8, 64, 13


def _make_model(tiny_configs, dtype):
    enc_cfg, dec_cfg = tiny_configs
    enc_cfg = dataclasses.replace(enc_cfg, vocab_size=256)
    dec_cfg = dataclasses.replace(dec_cfg, vocab_size=256)
    model = GSTVisualDialog(enc_cfg, dec_cfg, dtype=dtype)
    return model, enc_cfg, dec_cfg


def _synthetic_batch(enc_cfg, seed=0):
    """Caption contexts of very different lengths: rows 6-7 are nearly full,
    so appended rounds overflow them deterministically (abnormal mask on a
    strict subset of rows)."""
    rng = np.random.RandomState(seed)
    ids = np.zeros((B, S), np.int32)
    segs = np.zeros((B, S), np.int32)
    lens = [12, 16, 20, 24, 12, 16, S - 4, S - 2]
    for i, ln in enumerate(lens):
        ids[i, 0] = CLS_ID
        ids[i, 1:ln - 1] = rng.randint(105, 250, size=ln - 2)
        ids[i, ln - 1] = SEP_ID
        segs[i, :ln] = 1
    return {
        "enc_input_ids": jnp.asarray(ids),
        "enc_segments": jnp.asarray(segs),
        "enc_image_feat": jnp.asarray(
            rng.rand(B, R, enc_cfg.v_feature_size), jnp.float32),
        "enc_image_loc": jnp.asarray(rng.rand(B, R, 5), jnp.float32),
        "enc_image_mask": jnp.asarray(np.ones((B, R)), jnp.float32),
    }


def _init_params(model, enc_cfg, seed):
    init_batch = dict(
        input_ids=jnp.ones((2, S), jnp.int32),
        image_feat=jnp.ones((2, R, enc_cfg.v_feature_size)),
        image_loc=jnp.ones((2, R, 5)),
        token_type_ids=jnp.zeros((2, S), jnp.int32),
        attention_mask=jnp.ones((2, S), jnp.int32),
        image_attention_mask=jnp.ones((2, R), jnp.int32),
        dec_input_ids=jnp.ones((2, 4), jnp.int32),
        dec_attention_mask=jnp.ones((2, 4), jnp.int32))
    return model.init(jax.random.PRNGKey(seed), **init_batch,
                      method=GSTVisualDialog.init_all)


def _run_pair(tiny_configs, dtype, mesh_shape=(8, 1), **engine_kw):
    """Run the same batch through the single-device and the mesh engine;
    return both outputs."""
    model, enc_cfg, dec_cfg = _make_model(tiny_configs, dtype)
    batch = _synthetic_batch(enc_cfg)
    q_params = _init_params(model, enc_cfg, seed=0)
    a_params = _init_params(model, enc_cfg, seed=1)

    greedy_q = DecodeSettings(max_steps=5, top_k=1, ngram_blocking_size=4)
    greedy_a = DecodeSettings(max_steps=5, top_k=1, ngram_blocking_size=0)
    kw = dict(num_rounds=3, q_settings=greedy_q, a_settings=greedy_a,
              dtype=dtype, **engine_kw)
    single = make_dialog_engine(model, dec_cfg, **kw)
    mesh = make_mesh(*mesh_shape)
    meshed = make_dialog_engine(model, dec_cfg, mesh=mesh, **kw)

    rng = jax.random.PRNGKey(7)
    out_1 = single(q_params, a_params, batch, rng)
    out_m = meshed(q_params, a_params, batch, rng)
    return out_1, out_m


def _assert_identical(out_1, out_m):
    np.testing.assert_array_equal(np.asarray(out_1.questions),
                                  np.asarray(out_m.questions))
    np.testing.assert_array_equal(np.asarray(out_1.answers),
                                  np.asarray(out_m.answers))
    np.testing.assert_allclose(np.asarray(out_1.answer_ppl),
                               np.asarray(out_m.answer_ppl), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_1.abnormal),
                                  np.asarray(out_m.abnormal))
    np.testing.assert_array_equal(np.asarray(out_1.final_state.enc_input_ids),
                                  np.asarray(out_m.final_state.enc_input_ids))


def test_engine_mesh_identity_with_abnormal(tiny_configs):
    """8-way DP engine == single device, incl. overflowed (abnormal) rows."""
    out_1, out_m = _run_pair(tiny_configs, jnp.float32)
    _assert_identical(out_1, out_m)
    abnormal = np.asarray(out_m.abnormal)
    # rows 6-7 start nearly full -> must overflow; rows 0-5 must not
    assert abnormal[6] and abnormal[7], abnormal
    assert not abnormal[:6].any(), abnormal
    # sharding reality check: the mesh output really lives on 8 devices
    assert len(out_m.questions.sharding.device_set) == 8


@pytest.mark.slow
@pytest.mark.parametrize("buckets,dynamic,quant", [
    ((), False, False),
    ((48,), False, False),
    ((48,), True, False),
    ((), False, True),
    ((48,), True, True),
])
def test_engine_mesh_option_matrix(tiny_configs, buckets, dynamic, quant):
    """{context buckets} x {dynamic} x {int8 memory} all stay SPMD-clean:
    mesh outputs identical to single-device under every option combination.
    Quantized combos run the bf16 path (the int8 memory is bf16-only)."""
    dtype = jnp.bfloat16 if quant else jnp.float32
    out_1, out_m = _run_pair(
        tiny_configs, dtype, context_buckets=buckets,
        dynamic_buckets=dynamic, quantize_memory=quant)
    _assert_identical(out_1, out_m)


@pytest.mark.slow
def test_engine_mesh_tensor_parallel_identity(tiny_configs):
    """(4 data x 2 model) engine == single device: the round-3 Megatron
    sharding (per-head QKV/out, FFN, co-attention, cross-attention weights
    over the 'model' axis — gstx.core.mesh.param_partition_spec) stays
    semantics-preserving through the full round program, encoder forwards
    and KV-cached while_loop decode included."""
    out_1, out_m = _run_pair(tiny_configs, jnp.float32, mesh_shape=(4, 2))
    _assert_identical(out_1, out_m)
    assert len(out_m.questions.sharding.device_set) == 8


@pytest.mark.slow
def test_engine_mesh_tp_with_options(tiny_configs):
    """TP composed with the engine options: (4 data x 2 model) + dynamic
    context buckets == single device — option combinations cannot
    silently break the Megatron sharding.

    f32 only: int8 memory (bf16-only) is excluded because TP partitions
    every contraction (partial sums + all-reduce), so bf16 reduction
    order differs from single-device and greedy near-ties flip — the
    same ~bf16-ulp autoregressive amplification the verify skill
    documents for bf16-pair comparisons (measured 6.7% token drift
    here).  At f32/HIGHEST the drift stays below the argmax-flip
    threshold and bitwise identity is a valid pin."""
    out_1, out_m = _run_pair(
        tiny_configs, jnp.float32, mesh_shape=(4, 2),
        context_buckets=(48,), dynamic_buckets=True)
    _assert_identical(out_1, out_m)


def test_engine_init_max_hint_identity(tiny_configs):
    """Passing the host-known init_max (cli/generate's pipeline-stall
    avoidance) must be identical to the engine's own device sync."""
    model, enc_cfg, dec_cfg = _make_model(tiny_configs, jnp.float32)
    batch = _synthetic_batch(enc_cfg)
    q_params = _init_params(model, enc_cfg, seed=0)
    a_params = _init_params(model, enc_cfg, seed=1)
    greedy_q = DecodeSettings(max_steps=4, top_k=1, ngram_blocking_size=4)
    greedy_a = DecodeSettings(max_steps=4, top_k=1, ngram_blocking_size=0)
    eng = make_dialog_engine(model, dec_cfg, num_rounds=2,
                             q_settings=greedy_q, a_settings=greedy_a,
                             context_buckets=(48,))
    rng = jax.random.PRNGKey(7)
    o_sync = eng(q_params, a_params, batch, rng)
    hint = int((np.asarray(batch["enc_input_ids"]) != 0).sum(-1).max())
    o_hint = eng(q_params, a_params, batch, rng, init_max=hint)
    _assert_identical(o_sync, o_hint)
