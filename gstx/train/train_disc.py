"""Discriminative training: masked-LM + masked-region + soft-NSP losses on
the encoder-only model.

Equivalent of reference ``train_disc.py``: [B, 10 rounds, 1+negatives]
sequences are flattened, ``batch_size`` rows sampled by random permutation
(``train_disc.py:54-55``), the NSP/LM attention mask built from
sep_indices + hist_len (``:97-99``), and the loss is the coefficient-weighted
sum of the three pretraining losses (``:116-123``)."""

from __future__ import annotations


import functools

import jax
import jax.numpy as jnp
import optax

from gstx.core.config import GSTConfig
from gstx.models.encdec import GSTVisualDialog
from gstx.models.heads import masked_img_loss, masked_lm_loss, soft_nsp_loss


def nsp_attention_mask(sep_indices: jnp.ndarray, hist_len: jnp.ndarray,
                       max_len: int) -> jnp.ndarray:
    """sequence length = sep_indices[hist_len] + 1 -> boolean mask
    (train_disc.py:97-99).  jit-side twin of
    gstx.data.encode.nsp_attention_mask — tests pin the two equal."""
    seq_len = jnp.take_along_axis(sep_indices, hist_len[:, None], axis=1)[:, 0] + 1
    return (jnp.arange(max_len)[None, :] < seq_len[:, None]).astype(jnp.float32)


def make_disc_train_step(model: GSTVisualDialog, optimizer,
                         config: GSTConfig):
    from gstx.kernels.ffn import set_tensor_parallel_from_mesh

    # pallas kernels are opaque to GSPMD; under Megatron TP the modules
    # must take the jnp path (and a later TP=1 build restores the kernels)
    set_tensor_parallel_from_mesh(model.mesh)
    predict_feature = config.encoder_config().predict_feature

    def loss_fn(params, rows, rng):
        pred_t, pred_v, nsp = model.apply(
            params,
            rows["tokens"], rows["image_feat"], rows["image_loc"],
            rows["segments"], rows["att_mask"], rows["image_mask"],
            deterministic=False, rngs={"dropout": rng},
            method=GSTVisualDialog.pretrain_scores)
        lm = masked_lm_loss(pred_t, rows["mask"])
        img = masked_img_loss(pred_v, rows["image_target"],
                              rows["image_label"], predict_feature)
        nsp_l = soft_nsp_loss(nsp, rows["next_sentence_labels"])
        loss = (config.lm_loss_coeff * lm + config.nsp_loss_coeff * nsp_l
                + config.img_loss_coeff * img)
        return loss, {"lm_loss": lm, "img_loss": img, "nsp_loss": nsp_l}

    # donate params/opt_state: each step consumes them, halving the
    # HBM watermark and letting async-dispatched step chains reuse
    # buffers instead of accumulating live copies
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _step(params, opt_state, batch, rng):
        rng_sample, rng_dropout = jax.random.split(rng)
        b, rounds, samples = batch["tokens"].shape[:3]
        total = b * rounds * samples
        perm = jax.random.permutation(rng_sample, total)
        sample_indices = perm[: config.batch_size]

        rows = {}
        for key in ("tokens", "segments", "sep_indices", "mask"):
            x = batch[key].reshape(total, batch[key].shape[-1])
            rows[key] = x[sample_indices]
        nsl = batch["next_sentence_labels"].reshape(total, 2)
        rows["next_sentence_labels"] = nsl[sample_indices]
        hist = batch["hist_len"].reshape(total)[sample_indices]
        rows["att_mask"] = nsp_attention_mask(
            rows["sep_indices"], hist, batch["tokens"].shape[-1])
        img_idx = sample_indices // (rounds * samples)
        for key in ("image_feat", "image_loc", "image_mask", "image_target",
                    "image_label"):
            rows[key] = batch[key][img_idx]

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, rows, rng_dropout)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["loss"] = loss
        return params, opt_state, metrics

    # gate is read at TRACE time (first call / .lower): tp_gated re-asserts
    # this program's setting per call so interleaved TP / non-TP program
    # construction cannot bake the wrong gate into it
    from gstx.kernels.ffn import tp_gated

    return tp_gated(model.mesh, _step)
