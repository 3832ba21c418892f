"""CLI: discriminative training (reference ``train_disc.py``).

enc_only model, 3-loss objective (masked LM + masked region + soft NSP),
warmup 10000 steps, random-permutation row sampling; supports dense
pseudo-label finetuning via -train_dense and encoder extraction from enc-dec
checkpoints (the reference's 'start'-path special case,
train_disc.py:203-210, is handled by the converter's prefix detection).
"""

from __future__ import annotations

import os
import pprint
import time

import jax

from gstx.cli.common import (
    apply_runtime_flags,
    build_model,
    build_tokenizer,
    enable_compile_cache,
    init_params,
    load_params,
    parse_config,
)
from gstx.core import checkpoint as ckpt_lib
from gstx.core.logging import Logger, MetricsWriter
from gstx.data.loader import DataLoader, batch_iter
from gstx.data.visdial import VisdialDiscDataset
from gstx.train.optim import current_lrs, make_optimizer
from gstx.train.train_disc import make_disc_train_step

DISC_WARMUP_STEPS = 10000  # train_disc.py:146


def main(argv=None, max_steps=None):
    config = parse_config(argv, "gstx discriminative training")
    pprint.pprint(config)
    assert config.mode == "vd_train"
    assert config.model == "enc_only_a"
    os.makedirs(config.save_path, exist_ok=True)
    enable_compile_cache()
    apply_runtime_flags(config)

    logger = Logger(os.path.join(config.save_path, "log_disc.txt"))
    metrics_writer = MetricsWriter(
        os.path.join(config.save_path, "metrics.jsonl"))
    tokenizer = build_tokenizer(config)
    dataset = VisdialDiscDataset(config, tokenizer, mode="vd_train")
    num_iter_epoch = max(1, len(dataset) // config.batch_size)
    t_total = num_iter_epoch * config.num_epochs

    model, enc_cfg, dec_cfg = build_model(config, use_decoder=False,
                                      remat=config.remat)
    resume_ckpt = (config.continue_training and config.start_path
                   and config.start_path.endswith(".ckpt")
                   and os.path.isdir(config.start_path))
    if config.start_path and not resume_ckpt:
        params = load_params(model, config, config.start_path)
    else:
        params = init_params(model, config, config.seed)

    # SPMD mesh: the reference wraps the disc encoder in nn.DataParallel
    # (train_disc.py:251); gstx shards batch over 'data' and, with
    # -model_parallel > 1, the transformer matmuls Megatron-style over
    # 'model' (gstx.core.mesh.param_partition_spec).  dec_cfg=None:
    # encoder-only, the decoder dims are irrelevant to validation.
    from gstx.core.mesh import (make_global_batch, shard_by_path,
                                training_mesh)

    mesh = training_mesh(config.encoder_config(), None,
                         config.data_parallel, config.model_parallel,
                         config.batch_size)
    model = model.clone(mesh=mesh)

    optimizer = make_optimizer(config.lr, config.image_lr,
                               DISC_WARMUP_STEPS, t_total, config.min_lr,
                               fixed_t_layer=enc_cfg.fixed_t_layer,
                               fixed_v_layer=enc_cfg.fixed_v_layer)
    start_iter_id = 0
    start_exact = False
    opt_state = optimizer.init(params)
    if resume_ckpt:
        # exact preemption resume (params + optimizer + step), the same
        # mechanism as the generative trainer's -save_every_steps path
        from gstx.train.train_gen import load_start_checkpoint

        params, opt_state, start_iter_id, start_exact = \
            load_start_checkpoint(config, params, opt_state)
    params = shard_by_path(mesh, params)
    opt_state = shard_by_path(mesh, opt_state)
    step_fn = make_disc_train_step(model, optimizer, config)

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
    rng = jax.random.PRNGKey(config.seed)
    start_t = time.time()
    start_epoch, start_idx = divmod(start_iter_id, num_iter_epoch)
    # -trace_dir: device trace of the training loop (no-op when unset)
    from gstx.core.profiling import trace

    with trace(config.trace_dir):
        for epoch_id, idx, batch in batch_iter(loader, config.num_epochs,
                                               start_epoch, start_idx):
            iter_id = idx + epoch_id * num_iter_epoch
            # per-iteration fold_in (not a split chain): exact replay on
            # preemption resume — see train_gen.py
            key = jax.random.fold_in(rng, iter_id)
            dev_batch = make_global_batch(mesh, batch)
            params, opt_state, metrics = step_fn(params, opt_state,
                                                 dev_batch, key)
            if iter_id % config.log_every == 0:
                vals = {k: float(v) for k, v in metrics.items()}
                lr, _ = current_lrs(opt_state, config.lr, config.image_lr,
                                    DISC_WARMUP_STEPS, t_total,
                                    config.min_lr)
                now = time.time()
                logger.write(
                    "[%s][LR: %.7f][Ep: %.2f][Iter: %d][Time: %5.2fs]"
                    "[Loss: %.4g][LM: %.4g][NSP: %.4g][IMG: %.4g]" % (
                        time.strftime("%a %d %b %y %X", time.gmtime()), lr,
                        iter_id / num_iter_epoch, iter_id, now - start_t,
                        vals["loss"], vals["lm_loss"], vals["nsp_loss"],
                        vals["img_loss"]))
                metrics_writer.log(iter_id, **vals)
                start_t = now
            # see train_gen.py: a step-ckpt resume replays nothing, so an
            # epoch boundary that coincides with start_iter_id still saves
            if iter_id % num_iter_epoch == 0 and iter_id != 0 \
                    and (start_exact or iter_id != start_iter_id):
                ckpt_lib.save_checkpoint(
                    os.path.join(config.save_path,
                                 f"vd_train_disc_{epoch_id}.ckpt"),
                    params, opt_state, iter_id)
                logger.write(f"\n{epoch_id} epoch ended.")
            if config.save_every_steps > 0 and \
                    (iter_id + 1) % config.save_every_steps == 0:
                # '_disc' suffix (like the epoch ckpts above): both trainers
                # run -mode vd_train, so a shared save_path must not let the
                # two rotating step checkpoints clobber each other
                ckpt_lib.save_checkpoint(
                    os.path.join(config.save_path,
                                 f"{config.mode}_disc_step.ckpt"),
                    params, opt_state, iter_id + 1)
            if max_steps is not None and \
                    iter_id - start_iter_id + 1 >= max_steps:
                break
    return params, opt_state


if __name__ == "__main__":
    main()
