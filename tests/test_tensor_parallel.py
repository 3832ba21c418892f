"""Real tensor parallelism over the 'model' mesh axis (VERDICT round-1
item #3).

The reference's scope is DP-only (SURVEY.md §2.6); gstx's reserved 'model'
axis must be REAL: vocab-dimension parameters (word-embedding table,
decoder LM head, vocab biases) shard over 'model'
(gstx.core.mesh.shard_by_path) and the model's logits constraints
(GSTVisualDialog._shard_logits) keep the vocab matmuls partitioned.

Pinned here:
  * TP=2 produces IDENTICAL loss and train-step results to DP-only on the
    8-virtual-CPU mesh;
  * the compiled (post-SPMD-partitioning) HLO of the train step actually
    receives the LM-head weight at its LOCAL [V/tp, d] shape — i.e. XLA
    partitioned the matmul instead of all-gathering the weight.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gstx.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    param_partition_spec,
    shard_by_path,
)
from gstx.models.encdec import GSTVisualDialog, teacher_forced_loss
from gstx.train.optim import make_optimizer
from gstx.train.train_gen import make_train_step


@pytest.fixture(scope="module")
def tp_setup(tiny_configs):
    from fixtures import init_tiny_params, make_train_rows_batch

    enc_cfg, dec_cfg = tiny_configs
    batch = make_train_rows_batch(enc_cfg, b=4)
    # host copies: the train step DONATES its params/opt_state buffers, so
    # each run must device_put from an undeletable host tree
    params = jax.device_get(init_tiny_params(enc_cfg, dec_cfg))
    return enc_cfg, dec_cfg, params, batch


def _run_one_step(enc_cfg, dec_cfg, params, batch, data_par, model_par):
    mesh = make_mesh(data_par, model_par,
                     devices=jax.devices()[: data_par * model_par])
    model = GSTVisualDialog(enc_cfg, dec_cfg, mesh=mesh)
    optimizer = make_optimizer(1e-4, 1e-4, 10, 1000)
    params = shard_by_path(mesh, params)
    opt_state = shard_by_path(mesh, optimizer.init(params))
    step_fn = make_train_step(model, optimizer, batch_size=4)
    bsh = NamedSharding(mesh, P(DATA_AXIS))
    dev_batch = {k: jax.device_put(jnp.asarray(v), bsh)
                 for k, v in batch.items()}
    with mesh:
        new_params, _, metrics = step_fn(params, opt_state, dev_batch,
                                         jax.random.PRNGKey(7))
        loss = float(metrics["lm_loss"])
    return loss, jax.device_get(new_params), mesh, model, optimizer, \
        params, opt_state, dev_batch


def test_tp_matches_dp_loss_and_updates(tp_setup):
    """One full train step under (4,1) DP-only and (2,2) DP x TP must
    produce the same loss and the same updated parameters."""
    enc_cfg, dec_cfg, params, batch = tp_setup
    loss_dp, params_dp, *_ = _run_one_step(enc_cfg, dec_cfg, params, batch,
                                           4, 1)
    loss_tp, params_tp, *_ = _run_one_step(enc_cfg, dec_cfg, params, batch,
                                           2, 2)
    np.testing.assert_allclose(loss_tp, loss_dp, rtol=1e-5, atol=1e-6)
    flat_dp = jax.tree_util.tree_leaves_with_path(params_dp)
    flat_tp = {p: l for p, l in jax.tree_util.tree_leaves_with_path(params_tp)}
    for path, leaf_dp in flat_dp:
        np.testing.assert_allclose(
            np.asarray(flat_tp[path]), np.asarray(leaf_dp),
            rtol=2e-5, atol=2e-6,
            err_msg=jax.tree_util.keystr(path))


def test_lm_head_matmul_is_partitioned(tp_setup):
    """Compiled post-SPMD HLO of the TP=2 train step must consume the
    LM-head weight at its LOCAL [V/2, d] shape — proof the vocab matmul is
    tensor-parallel rather than all-gathered."""
    enc_cfg, dec_cfg, params, batch = tp_setup
    (loss, _, mesh, model, optimizer, _, _,
     dev_batch) = _run_one_step(enc_cfg, dec_cfg, params, batch, 2, 2)
    # re-shard from host copies: the run above donated its buffers
    sh_params = shard_by_path(mesh, params)
    opt_state = shard_by_path(mesh, optimizer.init(sh_params))
    step_fn = make_train_step(model, optimizer, batch_size=4)
    with mesh:
        lowered = step_fn.lower(sh_params, opt_state, dev_batch,
                                jax.random.PRNGKey(7))
        compiled = lowered.compile()
    txt = compiled.as_text()
    v, d = enc_cfg.vocab_size, dec_cfg.hidden_size
    local = f"f32[{v // 2},{d}]"
    full = f"f32[{v},{d}]"
    assert local in txt, "LM-head weight not present at local sharded shape"
    # the forward dot must produce vocab-sharded logits somewhere:
    assert f"{v // 2}]" in txt
    # the FULL-shape weight must not be rematerialized by an all-gather
    assert f"all-gather" not in txt.lower() or full not in txt, \
        "LM-head weight appears to be all-gathered back to full shape"


def test_param_partition_spec_paths():
    # vocab-dimension tensors (round 2)
    assert param_partition_spec(
        "encoder/embeddings/word_embeddings/embedding") == P(MODEL_AXIS, None)
    assert param_partition_spec("decoder/lm_weight") == P(MODEL_AXIS, None)
    assert param_partition_spec("cls/mlm_bias") == P(MODEL_AXIS)
    assert param_partition_spec("decoder/lm_bias") == P(MODEL_AXIS)
    # Megatron-style transformer sharding (round 3): column-parallel
    # projections shard their OUTPUT features (+ biases) ...
    col = P(None, MODEL_AXIS)
    assert param_partition_spec(
        "encoder/encoder/layer_0/attention/qkv/kernel") == col
    assert param_partition_spec(
        "encoder/encoder/layer_0/attention/qkv/bias") == P(MODEL_AXIS)
    assert param_partition_spec("decoder/layer_1/qkv/kernel") == col
    assert param_partition_spec("decoder/layer_1/cross_q/kernel") == col
    assert param_partition_spec("decoder/layer_1/cross_kv/kernel") == col
    assert param_partition_spec(
        "encoder/encoder/c_layer_0/biattention/qkv1/kernel") == col
    assert param_partition_spec(
        "encoder/encoder/c_layer_0/biattention/qkv2/kernel") == col
    assert param_partition_spec(
        "encoder/encoder/layer_0/ffn/intermediate/kernel") == col
    assert param_partition_spec(
        "encoder/encoder/layer_0/ffn/intermediate/bias") == P(MODEL_AXIS)
    # ... row-parallel projections shard their INPUT features, biases
    # replicate (added after the GSPMD-inserted all-reduce)
    row = P(MODEL_AXIS, None)
    assert param_partition_spec(
        "encoder/encoder/layer_0/attention/out/kernel") == row
    assert param_partition_spec(
        "encoder/encoder/layer_0/attention/out/bias") == P()
    assert param_partition_spec("decoder/layer_0/self_out/kernel") == row
    assert param_partition_spec("decoder/layer_0/cross_out/kernel") == row
    assert param_partition_spec(
        "encoder/encoder/layer_0/ffn/output/kernel") == row
    assert param_partition_spec(
        "encoder/encoder/layer_0/ffn/output/bias") == P()
    assert param_partition_spec(
        "encoder/encoder/c_layer_0/v_dense/kernel") == row
    assert param_partition_spec(
        "encoder/encoder/c_layer_0/t_dense/kernel") == row
    # everything else replicates
    assert param_partition_spec(
        "encoder/encoder/layer_0/attention/out_ln/scale") == P()
    assert param_partition_spec("encoder/t_pooler/dense/kernel") == P()
    assert param_partition_spec("fusion_fc_l/kernel") == P()


def test_ffn_and_qkv_matmuls_are_partitioned(tp_setup):
    """Compiled TP=2 train-step HLO must consume the per-layer transformer
    weights at their LOCAL shapes — proof the Megatron sharding survives
    GSPMD propagation instead of being all-gathered back."""
    enc_cfg, dec_cfg, params, batch = tp_setup
    (loss, _, mesh, model, optimizer, _, _,
     dev_batch) = _run_one_step(enc_cfg, dec_cfg, params, batch, 2, 2)
    sh_params = shard_by_path(mesh, params)
    opt_state = shard_by_path(mesh, optimizer.init(sh_params))
    step_fn = make_train_step(model, optimizer, batch_size=4)
    with mesh:
        compiled = step_fn.lower(sh_params, opt_state, dev_batch,
                                 jax.random.PRNGKey(7)).compile()
    txt = compiled.as_text()
    d = enc_cfg.hidden_size
    f = enc_cfg.intermediate_size
    # FFN d1 column-parallel [D, F/2]; d2 row-parallel [F/2, D]
    assert f"[{d},{f // 2}]" in txt, "FFN d1 not at local column shape"
    assert f"[{f // 2},{d}]" in txt, "FFN d2 not at local row shape"
    # fused QKV column-parallel [D, 3D/2]
    assert f"[{d},{3 * d // 2}]" in txt, "QKV not at local column shape"
    # the full-shape FFN weight must not be rematerialized anywhere
    assert f"[{d},{f}]" not in txt, "full-shape FFN d1 present in HLO"


def test_decode_prepare_cross_kv_is_partitioned(tp_setup):
    """The DECODE path partitions too: compiled TP=2 decode_prepare (the
    engine's per-utterance encoder + cross-attention K/V precompute) must
    consume the fused cross_kv projection at its LOCAL column shape and
    never rematerialize the full weight."""
    enc_cfg, dec_cfg, params, batch = tp_setup
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    model = GSTVisualDialog(enc_cfg, dec_cfg, mesh=mesh)
    sh_params = shard_by_path(mesh, params)
    b, l = 4, 24
    r = batch["enc_image_feat"].shape[1]
    args = (jnp.ones((b, l), jnp.int32),
            jnp.asarray(batch["enc_image_feat"][:b]),
            jnp.asarray(batch["enc_image_loc"][:b]),
            jnp.zeros((b, l), jnp.int32),
            jnp.ones((b, l), jnp.int32),
            jnp.ones((b, r), jnp.int32))

    @jax.jit
    def prepare(p, *a):
        return model.apply(p, *a, method=GSTVisualDialog.decode_prepare)

    with mesh:
        txt = prepare.lower(sh_params, *args).compile().as_text()
    d = dec_cfg.hidden_size
    # fused cross-K/V [D, 2D] column-parallel -> local [D, D]
    assert f"[{d},{2 * d // 2}]" in txt, "cross_kv not at local column shape"
    assert f"[{d},{2 * d}]" not in txt, "full-shape cross_kv present in HLO"


def test_shard_by_path_non_divisible_dim_replicates(capsys):
    """A leaf whose sharded dimension does not divide the model axis must
    fall back to replication (with a warning) instead of crashing — e.g.
    the 30522-row vocab tensors at model_parallel=4."""
    mesh = make_mesh(2, 4)
    tree = {"decoder": {"lm_weight": jnp.ones((126, 8)),   # 126 % 4 != 0
                        "lm_bias": jnp.ones((126,))},
            "layer_0": {"ffn": {"intermediate":
                                {"kernel": jnp.ones((8, 16))}}}}
    placed = shard_by_path(mesh, tree)
    assert placed["decoder"]["lm_weight"].sharding.is_fully_replicated
    assert placed["decoder"]["lm_bias"].sharding.is_fully_replicated
    # the divisible column-parallel leaf still shards
    spec = placed["layer_0"]["ffn"]["intermediate"]["kernel"].sharding.spec
    assert spec == P(None, MODEL_AXIS)
    assert "not divisible" in capsys.readouterr().out


def test_tp_gate_follows_builders(tiny_configs):
    """The pallas TP gate is set at program-build time from each builder's
    mesh — a TP build disables the kernels, a later TP=1 build restores
    them (the round-3 review's sticky-flag fix)."""
    from gstx.kernels.ffn import tensor_parallel_active
    from gstx.train.optim import make_optimizer
    from gstx.train.train_gen import make_train_step

    enc_cfg, dec_cfg = tiny_configs
    optimizer = make_optimizer(1e-4, 1e-4, 10, 1000)
    tp_model = GSTVisualDialog(enc_cfg, dec_cfg, mesh=make_mesh(4, 2))
    make_train_step(tp_model, optimizer, batch_size=4)
    assert tensor_parallel_active()
    dp_model = GSTVisualDialog(enc_cfg, dec_cfg, mesh=make_mesh(8, 1))
    make_train_step(dp_model, optimizer, batch_size=4)
    assert not tensor_parallel_active()


def test_tp_gate_reasserted_per_call():
    """The gate is read at TRACE time (first call of each jitted program),
    so interleaving the CONSTRUCTION of a TP and a non-TP program must not
    bake the last builder's setting into both — every program entry
    re-asserts its own gate at call time (ffn.tp_gated / the inline sets
    in make_dialog_engine and the train steps)."""
    from gstx.kernels.ffn import (
        set_tensor_parallel,
        tensor_parallel_active,
        tp_gated,
    )

    observed = []
    tp_prog = tp_gated(make_mesh(4, 2), lambda: observed.append(
        tensor_parallel_active()))
    dp_prog = tp_gated(make_mesh(8, 1), lambda: observed.append(
        tensor_parallel_active()))
    nomesh_prog = tp_gated(None, lambda: observed.append(
        tensor_parallel_active()))
    # simulate the footgun: some later builder flipped the global before
    # either program first runs (traces)
    set_tensor_parallel(True)
    dp_prog()
    tp_prog()
    nomesh_prog()
    set_tensor_parallel(False)
    tp_prog()
    assert observed == [False, True, False, True]
    set_tensor_parallel(False)  # leave the global clean for other tests


def test_validate_model_parallel():
    from gstx.core.mesh import validate_model_parallel

    from gstx.core.config import DecoderConfig, EncoderConfig

    enc = EncoderConfig(num_attention_heads=12, v_num_attention_heads=8,
                        bi_num_attention_heads=8, intermediate_size=3072,
                        v_intermediate_size=4096)
    dec = DecoderConfig(num_attention_heads=12, intermediate_size=3072)
    validate_model_parallel(enc, dec, 1)
    validate_model_parallel(enc, dec, 2)
    validate_model_parallel(enc, dec, 4)
    with pytest.raises(ValueError, match="v_num_attention_heads"):
        validate_model_parallel(enc, dec, 3)  # 8 visual heads % 3 != 0
