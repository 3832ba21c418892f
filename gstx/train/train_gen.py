"""Generative training (teacher / questioner / student).

Equivalent of reference ``train_gen.py``: per-dialog batches carry
[B, 10 rounds, 1 sample] sequences; the step flattens them, multinomial-
samples exactly ``batch_size`` rows with non-empty labels (the static-shape
trick of ``train_gen.py:63-68``), runs the enc-dec teacher-forced forward and
takes one AdamW step under the warmup-linear-nonzero schedule.

TPU-native: the whole step (including row sampling and the image-feature
broadcast, ``train_gen.py:301-321``) is ONE jitted SPMD program over the
``data`` mesh axis; gradients all-reduce over ICI automatically.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gstx.core.config import GSTConfig
from gstx.core import checkpoint as ckpt_lib
from gstx.core.logging import Logger, MetricsWriter
from gstx.core.mesh import batch_sharding
from gstx.models.encdec import GSTVisualDialog, teacher_forced_loss
from gstx.train.optim import current_lrs, make_optimizer


def select_rows(batch: Dict[str, jnp.ndarray],
                sample_indices: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Flatten [B, rounds, samples, ...] -> rows and gather the sampled ones
    (train_gen.py:45-103).  Image features broadcast across rounds/samples
    instead of materializing the [B,10,1,37,2048] expansion."""
    b, rounds, samples = batch["enc_input_ids"].shape[:3]
    out = {}
    for key in ("enc_input_ids", "enc_segments", "enc_sep_indices",
                "enc_mlm_labels", "enc_att_mask", "dec_input_ids",
                "dec_att_mask", "dec_labels"):
        if key not in batch:
            continue
        x = batch[key].reshape(b * rounds * samples, batch[key].shape[-1])
        out[key] = x[sample_indices]
    # per-image tensors: row -> image index is row // (rounds*samples)
    img_idx = sample_indices // (rounds * samples)
    for key in ("enc_image_feat", "enc_image_loc", "enc_image_mask",
                "enc_image_target", "enc_image_label"):
        if key in batch:
            out[key] = batch[key][img_idx]
    return out


def make_train_step(model: GSTVisualDialog, optimizer, batch_size: int,
                    batch_multiply: int = 1):
    """Jitted SPMD train step: (params, opt_state, batch, rng) ->
    (params, opt_state, metrics).

    ``batch_multiply`` > 1 is gradient accumulation: the step runs that
    many independently-sampled ``batch_size``-row micro-batches through a
    ``lax.scan`` (one live activation set at a time — effective batch
    grows without growing the HBM watermark) and applies ONE optimizer
    update on the averaged gradients.  The reference declares the flag but
    never implements it (options.py:64); gstx makes it functional."""
    from gstx.kernels.ffn import set_tensor_parallel_from_mesh

    # pallas kernels are opaque to GSPMD; under Megatron TP the modules
    # must take the jnp path (and a later TP=1 build restores the kernels)
    set_tensor_parallel_from_mesh(model.mesh)

    def loss_fn(params, rows, rng):
        logits = model.apply(
            params,
            rows["enc_input_ids"], rows["enc_image_feat"],
            rows["enc_image_loc"], rows["enc_segments"],
            rows["enc_att_mask"], rows["enc_image_mask"],
            rows["dec_input_ids"], rows["dec_att_mask"],
            deterministic=False,
            rngs={"dropout": rng},
            method=GSTVisualDialog.score)
        return teacher_forced_loss(logits, rows["dec_labels"])

    def micro_grads(params, batch, logw, rng):
        rng_sample, rng_dropout = jax.random.split(rng)
        # multinomial with replacement over candidate rows
        # (train_gen.py:67-68)
        sample_indices = jax.random.categorical(
            rng_sample, logw[None, :], shape=(batch_size,))
        rows = select_rows(batch, sample_indices)
        return jax.value_and_grad(loss_fn)(params, rows, rng_dropout)

    # donate params/opt_state: each step consumes them, halving the
    # HBM watermark and letting async-dispatched step chains reuse
    # buffers instead of accumulating live copies
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _step(params, opt_state, batch, rng):
        dec_labels = batch["dec_labels"]
        flat_labels = dec_labels.reshape(-1, dec_labels.shape[-1])
        cand = (flat_labels.sum(-1) != 0).astype(jnp.float32)
        logw = jnp.log(jnp.maximum(cand, 1e-9))
        if batch_multiply <= 1:
            loss, grads = micro_grads(params, batch, logw, rng)
        else:
            def body(acc, micro_rng):
                mloss, mgrads = micro_grads(params, batch, logw, micro_rng)
                acc = jax.tree_util.tree_map(jnp.add, acc, mgrads)
                return acc, mloss

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            grads, losses = jax.lax.scan(
                body, zeros, jax.random.split(rng, batch_multiply))
            grads = jax.tree_util.tree_map(
                lambda g: g / batch_multiply, grads)
            loss = losses.mean()
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"lm_loss": loss}

    # gate is read at TRACE time (first call / .lower): tp_gated re-asserts
    # this program's setting per call so interleaved TP / non-TP program
    # construction cannot bake the wrong gate into it
    from gstx.kernels.ffn import tp_gated

    return tp_gated(model.mesh, _step)


def init_model_and_state(config: GSTConfig, rng, t_total: int):
    """Build model, params (fresh or from checkpoints) and optimizer."""
    enc_cfg = config.encoder_config()
    dec_cfg = config.decoder_config()
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    model = GSTVisualDialog(enc_cfg, dec_cfg, dtype=dtype,
                            remat=config.remat,
                            remat_policy=config.remat_policy)

    b = 2
    l, r, t = config.max_seq_len, config.max_regions, config.max_utt_len
    init_batch = dict(
        input_ids=jnp.ones((b, l), jnp.int32),
        image_feat=jnp.ones((b, r, enc_cfg.v_feature_size)),
        image_loc=jnp.ones((b, r, enc_cfg.v_loc_size)),
        token_type_ids=jnp.zeros((b, l), jnp.int32),
        attention_mask=jnp.ones((b, l), jnp.int32),
        image_attention_mask=jnp.ones((b, r), jnp.int32),
        dec_input_ids=jnp.ones((b, t), jnp.int32),
        dec_attention_mask=jnp.ones((b, t), jnp.int32))
    params = model.init(rng, **init_batch, method=GSTVisualDialog.init_all)

    optimizer = make_optimizer(config.lr, config.image_lr,
                               config.warmup_steps, t_total, config.min_lr,
                               fixed_t_layer=enc_cfg.fixed_t_layer,
                               fixed_v_layer=enc_cfg.fixed_v_layer)
    opt_state = optimizer.init(params)
    return model, params, optimizer, opt_state


def train_gen(config: GSTConfig, dataset, num_iter_epoch: int,
              logger: Optional[Logger] = None,
              max_steps: Optional[int] = None):
    """Full training loop (reference train_gen.py:139-358)."""
    from gstx.data.loader import DataLoader, batch_iter

    if logger is None:
        os.makedirs(config.save_path, exist_ok=True)
        logger = Logger(os.path.join(config.save_path,
                                     f"log_{config.mode}.txt"))
    metrics_writer = MetricsWriter(
        os.path.join(config.save_path, "metrics.jsonl"))
    t_total = num_iter_epoch * 100  # train_gen.py:179
    rng = jax.random.PRNGKey(config.seed)
    rng, init_rng = jax.random.split(rng)
    model, params, optimizer, opt_state = init_model_and_state(
        config, init_rng, t_total)

    start_iter_id = 0
    start_exact = False
    if config.start_path:
        params, opt_state, start_iter_id, start_exact = \
            load_start_checkpoint(config, params, opt_state)

    from gstx.core.mesh import shard_by_path, training_mesh

    mesh = training_mesh(config.encoder_config(), config.decoder_config(),
                         config.data_parallel, config.model_parallel,
                         config.batch_size)

    # Megatron-style tensor parallelism over the 'model' axis — vocab-dim
    # tensors, per-head QKV/out projections and FFN matmuls shard via
    # param_partition_spec (identity when model_parallel == 1); optimizer
    # state mirrors the param layout
    params = shard_by_path(mesh, params)
    opt_state = shard_by_path(mesh, opt_state)
    bsh = batch_sharding(mesh)

    model = model.clone(mesh=mesh)
    step_fn = make_train_step(model, optimizer, config.batch_size,
                              config.batch_multiply)
    # multi-host: each host loads its stripe of the identically-shuffled
    # global order; local stripes assemble into globally-sharded arrays
    from gstx.core.mesh import local_batch_size

    n_proc = jax.process_count()
    local_bs = local_batch_size(config.batch_size, n_proc)
    loader = DataLoader(dataset, batch_size=local_bs, shuffle=True,
                        num_workers=config.num_workers, seed=config.seed,
                        process_index=jax.process_index(),
                        process_count=n_proc,
                        # batches assemble COLLECTIVELY across hosts: every
                        # host must see the same batch count per epoch
                        even_stripes=True)

    start_t = time.time()
    start_epoch, start_idx = divmod(start_iter_id, max(1, num_iter_epoch))
    iter_id = start_iter_id  # final-ckpt save must work on zero-batch runs
    # -trace_dir: device trace of the training loop (no-op when unset)
    from gstx.core.profiling import trace

    with trace(config.trace_dir):
        for epoch_id, idx, batch in batch_iter(loader, config.num_epochs,
                                               start_epoch, start_idx):
            iter_id = idx + epoch_id * num_iter_epoch
            from gstx.core.mesh import make_global_batch

            dev_batch = make_global_batch(mesh, batch)
            # per-ITERATION rng (not a sequentially split stream): a resumed
            # run replays the identical dropout/row-sampling randomness for
            # iteration i regardless of where the previous process died —
            # the training-side analogue of the generate sidecar's
            # fold_in(seed, batch_idx)
            step_rng = jax.random.fold_in(rng, iter_id)
            params, opt_state, metrics = step_fn(params, opt_state,
                                                 dev_batch, step_rng)
            if iter_id % config.log_every == 0:
                loss = float(metrics["lm_loss"])
                lr_lang, _ = current_lrs(opt_state, config.lr,
                                         config.image_lr,
                                         config.warmup_steps, t_total,
                                         config.min_lr)
                now = time.time()
                logger.write(
                    "[%s][LR: %.7f][Ep: %.2f][Iter: %d][Time: %5.2fs]"
                    "[LM Loss: %.4g]" % (
                        time.strftime("%a %d %b %y %X", time.gmtime()),
                        lr_lang, iter_id / max(1, num_iter_epoch), iter_id,
                        now - start_t, loss))
                metrics_writer.log(iter_id, lm_loss=loss, lr=lr_lang)
                start_t = now
            # reference guard (train_gen.py:345): `iter_id != start_iter_id`
            # suppresses the duplicate save when an EPOCH-ckpt resume replays
            # its stored iteration.  A -save_every_steps resume stores the
            # COMPLETED count (replays nothing), so when it lands exactly on
            # an epoch boundary the boundary iteration is fresh and its epoch
            # checkpoint must still be written (start_exact).
            if iter_id % num_iter_epoch == 0 and (
                    start_exact or iter_id != start_iter_id):
                ckpt_lib.save_checkpoint(
                    os.path.join(
                        config.save_path,
                        f"{config.mode}_{config.chunk}_{epoch_id}.ckpt"),
                    params, opt_state, iter_id)
                logger.write(f"\n{epoch_id} epoch ended.")
            if config.save_every_steps > 0 and \
                    (iter_id + 1) % config.save_every_steps == 0:
                # rotating mid-epoch checkpoint (crash-safe 3-step swap in
                # save_checkpoint); step = COMPLETED iterations, so resume
                # replays nothing: divmod(step) points at the next batch
                ckpt_lib.save_checkpoint(
                    os.path.join(config.save_path,
                                 f"{config.mode}_step.ckpt"),
                    params, opt_state, iter_id + 1)
            if max_steps is not None and \
                    iter_id - start_iter_id + 1 >= max_steps:
                break
    ckpt_lib.save_checkpoint(os.path.join(config.save_path, "final.ckpt"),
                             params, opt_state, iter_id)
    return params, opt_state


def load_start_checkpoint(config: GSTConfig, params, opt_state):
    """Resume / warm-start semantics (train_gen.py:252-290): '-continue'
    restores params+optimizer (+step when mode matches the ckpt name);
    otherwise only encoder weights are warm-started.

    Returns ``(params, opt_state, start_iter_id, start_exact)``:
    ``start_exact`` is True for a ``-save_every_steps`` rotating-checkpoint
    resume, whose stored step counts COMPLETED iterations (nothing is
    replayed) — unlike the reference-faithful epoch/final checkpoints whose
    stored ``iter_id`` is processed again on resume."""
    start_iter_id = 0
    start_exact = False
    path = config.start_path
    if path.endswith(".ckpt") and os.path.isdir(path):
        # restore against a live template so optax NamedTuple states keep
        # their structure (a template-less orbax restore returns plain
        # dicts/lists and the first optimizer.update crashes)
        template = {"params": params, "opt_state": opt_state,
                    "step": np.asarray(0)}
        try:
            restored = ckpt_lib.restore_checkpoint(path, template=template)
        except Exception as e:
            # checkpoint without opt_state (e.g. converted / eval-only) —
            # WARN loudly: the run continues as params-only warm start with
            # the LR schedule restarting from step 0
            print(f"[train_gen] WARNING: full resume failed ({e!r}); "
                  "falling back to params-only restore — optimizer state "
                  "and step counter reset", flush=True)
            restored = ckpt_lib.restore_checkpoint(
                path, template={"params": params, "step": np.asarray(0)})
        new_params = restored["params"]
        if config.continue_training:
            params = new_params
            if "opt_state" in restored and config.mode in path:
                opt_state = restored["opt_state"]
                start_iter_id = int(restored["step"])
                start_exact = (os.path.basename(path.rstrip("/"))
                               .endswith("_step.ckpt"))
        else:
            params = _merge_encoder_only(params, new_params)
    else:
        # torch checkpoint
        sd = ckpt_lib.load_torch_checkpoint(path)
        enc_cfg = config.encoder_config()
        dec_cfg = config.decoder_config()
        tree = ckpt_lib.convert_torch_state_dict(
            sd, enc_cfg.num_hidden_layers, enc_cfg.v_num_hidden_layers,
            len(enc_cfg.v_biattention_id), dec_cfg.num_hidden_layers)
        if config.continue_training:
            params = _merge_trees(params, {"params": tree})
        else:
            params = _merge_encoder_only(params, {"params": tree})
    return params, opt_state, start_iter_id, start_exact


def _merge_trees(template, new):
    def merge(a, b):
        if isinstance(a, dict):
            return {k: merge(a[k], b[k]) if k in b else a[k] for k in a}
        return jnp.asarray(b, dtype=a.dtype) if b is not None else a
    return merge(template, new)


def _merge_encoder_only(template, new):
    """Warm start: only encoder+heads subtrees transfer
    (train_gen.py:280-289).  When the source has no decoder, the LM-head
    projection is seeded from the loaded word-embedding table — matching the
    reference, where lm_head.decoder.weight starts as the pretrained
    embedding table before diverging (visual_dialog_decoder.py:124)."""
    out = dict(template["params"]) if "params" in template else dict(template)
    src = new["params"] if "params" in new else new
    merged = dict(out)
    for key in ("encoder", "cls"):
        if key in src:
            merged[key] = _merge_trees({key: out[key]}, {key: src[key]})[key]
    if "decoder" not in src and "decoder" in merged:
        word = merged["encoder"]["embeddings"]["word_embeddings"]["embedding"]
        dec = dict(merged["decoder"])
        if dec.get("lm_weight") is not None and                 dec["lm_weight"].shape == word.shape:
            dec["lm_weight"] = jnp.asarray(word)
            merged["decoder"] = dec
    return {"params": merged}
