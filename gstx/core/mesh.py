"""Device-mesh and sharding utilities.

The reference's only parallelism is single-node ``nn.DataParallel``
(reference ``train_gen.py:295`` et al.).  The TPU-native equivalent is SPMD
over a ``jax.sharding.Mesh``: batch-axis data parallelism with gradient
all-reduce over ICI, and a ``model`` axis carrying full Megatron-style
tensor parallelism — vocab-dim tensors plus every transformer matmul
(column-parallel QKV/FFN-d1/co-attention, row-parallel
attention-out/FFN-d2) shard per :func:`param_partition_spec`.

All entry points go through :func:`make_mesh` so multi-chip behaviour is
centralised and testable on a virtual CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=N``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# XLA's CPU backend enforces a hard rendezvous deadline on cross-device
# collectives (warn at 20 s, LogFatal-abort the whole process at 40 s,
# xla/.../rendezvous.cc).  On an oversubscribed host a virtual multi-device
# CPU mesh can miss that deadline just from scheduling starvation — observed:
# a 2-device all-gather in a subprocess test stage aborting at 40 s while the
# machine (1 core) ran a full test suite.  These are liveness watchdogs, not
# correctness guards; raise them far beyond any plausible scheduling delay.
_CPU_COLLECTIVE_FLAGS = (
    "--xla_cpu_collective_call_warn_stuck_timeout_seconds=300",
    "--xla_cpu_collective_call_terminate_timeout_seconds=1200",
)


def relax_cpu_collective_timeouts() -> None:
    """Append relaxed CPU-collective rendezvous deadlines to ``XLA_FLAGS``.

    Must run BEFORE the first backend use (XLA parses the env var once at
    backend initialization).  Flags already present in ``XLA_FLAGS`` are
    left alone so an explicit caller override wins.  Harmless on TPU runs —
    the flags only affect the CPU backend's in-process communicator.
    """
    import os

    current = os.environ.get("XLA_FLAGS", "")
    extra = [f for f in _CPU_COLLECTIVE_FLAGS
             if f.split("=")[0] not in current]
    if extra:
        os.environ["XLA_FLAGS"] = " ".join([current] + extra).strip()


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host initialization over DCN (SURVEY.md §2.6: the TPU answer to
    the reference's absent distributed backend).  No-op when single-process
    or when jax.distributed is already initialized; on Cloud TPU pods the
    arguments are auto-detected from the environment."""
    import jax.distributed

    # MUST run before any other JAX call (backend initialization makes
    # jax.distributed.initialize raise) — callers invoke this first thing.
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except ValueError:
        # single-process environment: coordinator auto-detection failed
        return
    except RuntimeError as e:
        if "already" in str(e).lower():
            return
        raise  # backends already initialized: a real ordering bug

    if jax.process_count() > 1:
        # Establish the cross-process collective context NOW, while every
        # process is aligned at initialization.  The runtime's FIRST
        # collective execution creates the context under a hard ~30 s
        # deadline (Gloo: "GetKeyValue() timed out"); if hosts reach their
        # first real collective at different times — e.g. the train-step
        # compile is cache-warm on one host and cold on another — that
        # deadline trips.  A trivial barrier here compiles in milliseconds
        # on every host, so the skew cannot exceed the deadline, and all
        # later collectives reuse the context.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("gstx:init_distributed")


def process_shard(n_items: int, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> np.ndarray:
    """Deterministic per-host slice of dataset indices (multi-host data
    loading: each host reads only its stripe; batch dims then assemble into
    a global array via make_global_batch)."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    return np.arange(process_index, n_items, process_count)


def make_global_batch(mesh: Mesh, local_tree):
    """Assemble per-host local batches into globally-sharded arrays
    (jax.make_array_from_process_local_data over the data axis)."""
    sh = batch_sharding(mesh)

    def assemble(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree_util.tree_map(assemble, local_tree)


def make_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ('data', 'model') mesh over the available devices.

    data_parallel == -1 means "all remaining devices".
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model_parallel <= 0:
        model_parallel = 1
    if data_parallel == -1:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} != {n} devices available"
        )
    dev_array = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def auto_data_parallel(batch_size: int, n_devices: Optional[int] = None) -> int:
    """Largest divisor of batch_size that is <= the device count, so the
    batch axis always shards evenly."""
    if n_devices is None:
        n_devices = len(jax.devices())
    for d in range(min(batch_size, n_devices), 0, -1):
        if batch_size % d == 0:
            return d
    return 1


def local_batch_size(batch_size: int, n_proc: Optional[int] = None) -> int:
    """Per-host slice of the global batch for multi-host training.  The
    global batch must split evenly: a silent floor division would shrink
    the real global batch away from the one num_iter_epoch / the LR
    schedule / auto_data_parallel were computed for."""
    if n_proc is None:
        n_proc = jax.process_count()
    if n_proc <= 1:
        return batch_size
    if batch_size % n_proc != 0:
        raise ValueError(
            f"-batch_size {batch_size} must be divisible by the process "
            f"count {n_proc} (each host contributes batch_size/process_count "
            "rows to the global batch)")
    return batch_size // n_proc


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


# Parameter-tree path suffixes of the vocab-dimension tensors that tensor-
# parallelise over the 'model' axis.  The same suffixes appear inside
# optimizer-state trees (adam mu/nu mirror the param tree), so
# :func:`shard_by_path` applies to both.
_VOCAB_ROW_SUFFIXES = (
    "embeddings/word_embeddings/embedding",   # [V, d] tied table
    "decoder/lm_weight",                      # [V, d] independent LM head
)
_VOCAB_VEC_SUFFIXES = (
    "cls/mlm_bias",                           # [V]
    "decoder/lm_bias",                        # [V]
)

# Megatron-style model parallelism of every transformer matmul (round 3;
# the round-2 'model' axis covered only the vocab-dim tensors above).
# Column-parallel: the OUTPUT features shard — QKV / cross-KV projections
# (per-head slices) and the first FFN matmul (per-intermediate slices);
# their biases shard with them.  Row-parallel: the INPUT features shard —
# attention output projections, co-attention BertBiOutput projections and
# the second FFN matmul consume head-/intermediate-sharded activations and
# partial-sum over 'model' (GSPMD inserts the all-reduce); their biases
# stay replicated (added after the reduction).
_COL_KERNEL_SUFFIXES = (
    "qkv/kernel",                  # enc self-attn (fused) + dec self-attn
    "biattention/qkv1/kernel",     # co-attention visual stream
    "biattention/qkv2/kernel",     # co-attention text stream
    "cross_q/kernel",              # dec cross-attn query
    "cross_kv/kernel",             # dec cross-attn fused K/V
    "intermediate/kernel",         # FFN d1 (enc text/visual, co-attn, dec)
)
_COL_BIAS_SUFFIXES = tuple(
    s.replace("/kernel", "/bias") for s in _COL_KERNEL_SUFFIXES)
_ROW_KERNEL_SUFFIXES = (
    "attention/out/kernel",        # enc self-attn output proj
    "self_out/kernel",             # dec self-attn output proj
    "cross_out/kernel",            # dec cross-attn output proj
    "output/kernel",               # FFN d2 (enc + dec; '/out/kernel' differs)
    "v_dense/kernel",              # BertBiOutput visual proj (bi_hidden in)
    "t_dense/kernel",              # BertBiOutput text proj (bi_hidden in)
)


def param_partition_spec(path: str) -> P:
    """PartitionSpec for one param-tree path ('a/b/c' joined keys)."""
    if any(path.endswith(s) for s in _VOCAB_ROW_SUFFIXES):
        return P(MODEL_AXIS, None)
    if any(path.endswith(s) for s in _VOCAB_VEC_SUFFIXES):
        return P(MODEL_AXIS)
    if any(path.endswith(s) for s in _COL_KERNEL_SUFFIXES):
        return P(None, MODEL_AXIS)
    if any(path.endswith(s) for s in _COL_BIAS_SUFFIXES):
        return P(MODEL_AXIS)
    if any(path.endswith(s) for s in _ROW_KERNEL_SUFFIXES):
        return P(MODEL_AXIS, None)
    return P()


def validate_model_parallel(enc_cfg, dec_cfg, model_parallel: int) -> None:
    """Raise early (with the offending dimension named) when a model-parallel
    degree cannot shard the transformer cleanly: every attention head count
    and FFN intermediate size must divide by ``model_parallel`` so the
    column-parallel projections split on head/feature boundaries."""
    if model_parallel <= 1:
        return
    dims = {
        "num_attention_heads": enc_cfg.num_attention_heads,
        "v_num_attention_heads": enc_cfg.v_num_attention_heads,
        "bi_num_attention_heads": enc_cfg.bi_num_attention_heads,
        "intermediate_size": enc_cfg.intermediate_size,
        "v_intermediate_size": enc_cfg.v_intermediate_size,
    }
    if dec_cfg is not None:
        dims["decoder num_attention_heads"] = dec_cfg.num_attention_heads
        dims["decoder intermediate_size"] = dec_cfg.intermediate_size
    for name, value in dims.items():
        if value % model_parallel != 0:
            raise ValueError(
                f"model_parallel={model_parallel} does not divide {name}="
                f"{value}; pick a degree dividing every head count and "
                f"intermediate size")


def training_mesh(enc_cfg, dec_cfg, data_parallel: int, model_parallel: int,
                  batch_size: int) -> Mesh:
    """Resolve and validate a trainer's ('data','model') mesh — the one
    shared recipe for train_gen / train_disc: dp == -1 picks the largest
    divisor of ``batch_size`` fitting the devices left after the model
    axis; ``validate_model_parallel`` rejects unsplittable degrees early.
    Pass ``dec_cfg=None`` for encoder-only trainers."""
    mp = max(1, model_parallel)
    n_dev = len(jax.devices())
    dp = data_parallel
    if dp == -1:
        dp = auto_data_parallel(batch_size, n_dev // mp)
    validate_model_parallel(enc_cfg, dec_cfg, mp)
    return make_mesh(dp, mp, devices=jax.devices()[: dp * mp])


def shard_by_path(mesh: Mesh, tree):
    """device_put a params or optimizer-state pytree Megatron-tensor-
    parallel over the 'model' axis: vocab-dimension tensors plus every
    transformer matmul shard per :func:`param_partition_spec`; everything
    else replicates.  With a model axis of size 1 this is plain
    replication.

    A leaf whose sharded dimension does not divide by the model-axis size
    falls back to replication (with a one-time warning) instead of
    crashing — e.g. the 30522-row vocab tensors at model_parallel=4 stay
    replicated while the head/FFN matmuls still shard
    (``validate_model_parallel`` guarantees those divide).  The model's
    logits constraints apply the matching guard (encdec._shard_logits)."""
    warned = set()

    def place(path, x):
        keys = "/".join(getattr(k, "key", getattr(k, "name", str(k)))
                        for k in path)
        spec = param_partition_spec(keys)
        if MODEL_AXIS in mesh.shape and mesh.shape[MODEL_AXIS] > 1 \
                and spec != P():
            mp = mesh.shape[MODEL_AXIS]
            divisible = all(
                x.shape[dim] % mp == 0
                for dim, axis in enumerate(spec) if axis == MODEL_AXIS)
            if divisible:
                return jax.device_put(x, NamedSharding(mesh, spec))
            tail = "/".join(keys.split("/")[-2:])
            if tail not in warned:
                warned.add(tail)
                print(f"[gstx.mesh] {keys}: dimension not divisible by "
                      f"model_parallel={mp}; leaf replicated", flush=True)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, tree)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device_put a pytree of host arrays with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_batch_rows(batch, multiple: int):
    """Pad a numpy batch dict's leading axis up to a multiple (DP meshes
    need the batch divisible by the data axis).  Padded rows repeat row 0
    and are dropped by the caller via the returned valid count."""
    n = next(iter(batch.values())).shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch, n
    batch = {k: np.concatenate([np.asarray(v),
                                np.repeat(np.asarray(v)[:1], pad, axis=0)])
             for k, v in batch.items()}
    return batch, n


