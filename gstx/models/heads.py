"""Pretraining heads and losses.

Mirrors reference ``BertPreTrainingHeads`` (vilbert_dialog.py:1017-1041):
  * MLM head: transform (dense + gelu + LN) then projection onto the tied
    word-embedding table + free bias (``BertLMPredictionHead``, :979-997);
  * NSP head on the fused (mul/sum) pooled outputs (``bi_seq_relationship``,
    :1021,1030-1038);
  * image-region classification head to v_target_size=1601 classes
    (``BertImagePredictionHead``, :1043-1055).

Loss functions mirror ``BertForMultiModalPreTraining.forward``
(vilbert_dialog.py:1489-1514): masked-LM CE with ignore_index=-1, masked
region KLDiv vs. detector class probabilities (or MSE in predict_feature
mode), and the soft NSP loss ``-(label * logprob).sum() / batch``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gstx.core.config import EncoderConfig
from gstx.models.layers import ACT2FN, dense, layer_norm


class PredictionTransform(nn.Module):
    """dense + act + LayerNorm (BertPredictionHeadTransform,
    vilbert_dialog.py:943-959)."""

    size: int
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = dense(self.size, self.dtype, "dense")(x)
        x = ACT2FN[self.activation](x)
        return layer_norm(dtype=self.dtype, name="ln")(x)


class PreTrainingHeads(nn.Module):
    """All three heads; the MLM projection weight is tied to the word
    embedding table, which the caller passes via ``embed_attend`` (a function
    hidden -> vocab logits)."""

    config: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.transform = PredictionTransform(
            cfg.hidden_size, cfg.hidden_act, dtype=self.dtype, name="transform")
        self.mlm_bias = self.param(
            "mlm_bias", nn.initializers.zeros, (cfg.vocab_size,), jnp.float32)
        self.bi_seq_relationship = dense(2, self.dtype,
                                         "bi_seq_relationship")
        self.img_transform = PredictionTransform(
            cfg.v_hidden_size, cfg.hidden_act, dtype=self.dtype,
            name="img_transform")
        self.img_decoder = dense(cfg.v_target_size, self.dtype,
                                 "img_decoder")
        self.dropout = nn.Dropout(0.1)  # vilbert_dialog.py:1024

    def __call__(
        self,
        sequence_t: jnp.ndarray,
        sequence_v: jnp.ndarray,
        pooled_t: jnp.ndarray,
        pooled_v: jnp.ndarray,
        embed_attend,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        if cfg.fusion_method == "sum":
            pooled = pooled_t + pooled_v
        elif cfg.fusion_method == "mul":
            pooled = pooled_t * pooled_v
        else:
            raise ValueError(cfg.fusion_method)
        pooled = self.dropout(pooled, deterministic=deterministic)

        h = self.transform(sequence_t)
        prediction_t = embed_attend(h) + self.mlm_bias  # [B, L, vocab] f32
        seq_relationship = self.bi_seq_relationship(pooled)
        prediction_v = self.img_decoder(self.img_transform(sequence_v))
        return prediction_t, prediction_v, seq_relationship


def masked_lm_loss(prediction_t: jnp.ndarray, mlm_labels: jnp.ndarray) -> jnp.ndarray:
    """CE with ignore_index=-1, mean over non-ignored positions
    (vilbert_dialog.py:1444,1504-1507)."""
    vocab = prediction_t.shape[-1]
    logits = prediction_t.reshape(-1, vocab).astype(jnp.float32)
    labels = mlm_labels.reshape(-1)
    valid = labels != -1
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(valid.sum(), 1)
    return nll.sum() / denom


def masked_img_loss(
    prediction_v: jnp.ndarray,
    image_target: jnp.ndarray,
    image_label: jnp.ndarray,
    predict_feature: bool = False,
) -> jnp.ndarray:
    """Masked-region loss (vilbert_dialog.py:1489-1501).

    KL path: elementwise KLDiv(log_softmax(pred), target) summed over masked
    regions, normalised by the COUNT of masked regions (not elements).
    MSE path (predict_feature): normalised by masked ELEMENT count, matching
    the reference's expand_as denominator.
    """
    mask = (image_label == 1)[..., None].astype(jnp.float32)
    if predict_feature:
        per = (prediction_v.astype(jnp.float32) - image_target) ** 2
        denom = jnp.maximum((mask * jnp.ones_like(per)).sum(), 1.0)
    else:
        logp = jax.nn.log_softmax(prediction_v.astype(jnp.float32), axis=-1)
        t = image_target
        # torch KLDivLoss(reduction='none'): t * (log t - logp), 0 where t==0
        per = jnp.where(t > 0, t * (jnp.log(jnp.where(t > 0, t, 1.0)) - logp),
                        -t * logp)
        denom = jnp.maximum((image_label == 1).sum(), 1)
    return (per * mask).sum() / denom


def soft_nsp_loss(seq_relationship: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Soft next-sentence loss: -(label * logprob).sum() / batch
    (vilbert_dialog.py:1509-1510).  ``labels`` is [B, 2] soft targets."""
    logp = jax.nn.log_softmax(
        seq_relationship.reshape(-1, 2).astype(jnp.float32), axis=-1)
    return -(labels.reshape(-1, 2) * logp).sum() / labels.shape[0]
