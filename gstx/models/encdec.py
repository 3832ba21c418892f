"""Top-level GST visual-dialog model: two-stream encoder + V+L fusion +
cross-attention decoder, with the reference's exact weight-sharing topology.

Equivalent of the reference's ``EncoderDecoderModel`` + ``VLFusion``
(``models/visual_dialog_model.py:8-135``) and the embedding sharing set up in
``train_gen.py:293`` (decoder INPUT embeddings = encoder embeddings).

Tying topology (matches trained reference checkpoints):
  * encoder word embeddings == decoder input embeddings == encoder MLM-head
    projection (one DialogEmbeddings submodule, used functionally by the
    decoder path and the MLM head);
  * the decoder LM head has its OWN projection weight: the reference's
    module swap at train_gen.py:293 happens AFTER the lm_head captured the
    original decoder embedding Parameter (visual_dialog_decoder.py:124),
    so that tensor trains independently and diverges from the shared table.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gstx.core.config import DecoderConfig, EncoderConfig
from gstx.models.decoder import GSTDecoderModel
from gstx.models.encoder import GSTEncoderModel
from gstx.models.heads import PreTrainingHeads
from gstx.models.layers import additive_mask, dense


class GSTVisualDialog(nn.Module):
    enc_config: EncoderConfig
    dec_config: DecoderConfig
    use_decoder: bool = True
    dtype: jnp.dtype = jnp.float32
    # Optional device mesh enabling REAL tensor parallelism of the vocab-dim
    # matmuls: with mesh.shape['model'] > 1 the LM-head / MLM projections are
    # constrained to keep the vocab axis partitioned over the 'model' axis
    # (the weights themselves are sharded by gstx.core.mesh.shard_by_path),
    # so each chip computes a [.., V/tp] logits shard and only the softmax
    # reductions cross chips.
    mesh: Optional[jax.sharding.Mesh] = None
    # per-layer jax.checkpoint (training memory; reference batch 72 needs
    # ~2.7 GB of f32 attention scores per text stream without it)
    remat: bool = False
    remat_policy: str = "full"  # layers.checkpoint_policy: 'full' | 'dots' | 'small'

    def _shard_logits(self, x):
        """Keep the trailing vocab axis of logits partitioned over the
        'model' mesh axis (no-op without a >1 model axis, or when the
        vocab does not divide by it — shard_by_path then replicates the
        vocab-dim weights too, so constraining would be inconsistent)."""
        from gstx.core.mesh import MODEL_AXIS

        if self.mesh is None or self.mesh.shape.get(MODEL_AXIS, 1) <= 1:
            return x
        if x.shape[-1] % self.mesh.shape[MODEL_AXIS] != 0:
            return x
        P = jax.sharding.PartitionSpec
        # leading dims unconstrained (XLA keeps the propagated 'data'
        # sharding; init-time mini-batches stay valid), vocab partitioned
        spec = P(*([P.UNCONSTRAINED] * (x.ndim - 1)), MODEL_AXIS)
        return jax.lax.with_sharding_constraint(
            x, jax.sharding.NamedSharding(self.mesh, spec))

    def setup(self):
        self.encoder = GSTEncoderModel(self.enc_config, dtype=self.dtype,
                                       remat=self.remat,
                                       remat_policy=self.remat_policy,
                                       name="encoder")
        self.cls = PreTrainingHeads(self.enc_config, dtype=self.dtype,
                                    name="cls")
        if self.use_decoder:
            self.decoder = GSTDecoderModel(self.dec_config, dtype=self.dtype,
                                           remat=self.remat,
                                           remat_policy=self.remat_policy,
                                           name="decoder")
            # VLFusion (visual_dialog_model.py:123-135)
            self.fusion_fc_l = dense(
                self.enc_config.hidden_size, self.dtype, "fusion_fc_l")
            self.fusion_fc_v = dense(
                self.enc_config.hidden_size, self.dtype, "fusion_fc_v")
            self.fusion_dropout = nn.Dropout(0.1)

    def init_all(self, input_ids, image_feat, image_loc, token_type_ids,
                 attention_mask, image_attention_mask, dec_input_ids,
                 dec_attention_mask):
        """Touches every parameter (encoder, heads, fusion, decoder) so a
        single ``model.init(..., method=GSTVisualDialog.init_all)`` creates
        the full tree regardless of which path is used afterwards."""
        hidden_t, hidden_v, pooled_t, pooled_v = self.encode(
            input_ids, image_feat, image_loc, token_type_ids,
            attention_mask, image_attention_mask, True)
        heads = self.cls(hidden_t, hidden_v, pooled_t, pooled_v,
                         self.encoder.embed_attend, deterministic=True)
        if not self.use_decoder:
            return heads
        memory, memory_mask = self.fuse(
            hidden_t, hidden_v, attention_mask, image_attention_mask, True)
        return self.decode_logits(dec_input_ids, dec_attention_mask, memory,
                                  memory_mask, True)

    # ------------------------------------------------------------------ #
    # encoder paths
    # ------------------------------------------------------------------ #

    def encode(self, input_ids, image_feat, image_loc, token_type_ids=None,
               attention_mask=None, image_attention_mask=None,
               deterministic: bool = True):
        return self.encoder(
            input_ids, image_feat, image_loc,
            token_type_ids=token_type_ids,
            attention_mask=attention_mask,
            image_attention_mask=image_attention_mask,
            deterministic=deterministic)

    def pretrain_scores(self, input_ids, image_feat, image_loc,
                        token_type_ids=None, attention_mask=None,
                        image_attention_mask=None, deterministic: bool = True):
        """enc_only path: returns (prediction_t [B,L,vocab],
        prediction_v [B,R,1601], seq_relationship [B,2]).  Mirrors
        BertForMultiModalPreTraining's head application
        (vilbert_dialog.py:1482-1484)."""
        hidden_t, hidden_v, pooled_t, pooled_v = self.encode(
            input_ids, image_feat, image_loc, token_type_ids,
            attention_mask, image_attention_mask, deterministic)
        pred_t, pred_v, nsp = self.cls(
            hidden_t, hidden_v, pooled_t, pooled_v,
            self.encoder.embed_attend, deterministic=deterministic)
        return self._shard_logits(pred_t), pred_v, nsp

    # ------------------------------------------------------------------ #
    # fusion + decoder paths
    # ------------------------------------------------------------------ #

    def fuse(self, hidden_t, hidden_v, attention_mask, image_attention_mask,
             deterministic: bool = True):
        """VLFusion (visual_dialog_model.py:131-135): project both streams to
        768 and concatenate [visual(37); text(256)] -> 293-token memory."""
        memory = jnp.concatenate(
            [self.fusion_fc_v(hidden_v), self.fusion_fc_l(hidden_t)], axis=1)
        memory = self.fusion_dropout(memory, deterministic=deterministic)
        memory_mask = jnp.concatenate(
            [image_attention_mask.astype(jnp.float32),
             attention_mask.astype(jnp.float32)], axis=1)
        return memory, memory_mask

    def _embed_dec(self, dec_input_ids, positions=None, deterministic=True):
        # decoder reuses DialogEmbeddings with token_type 0
        # (visual_dialog_decoder.py:296-298: embeddings(input_ids) only)
        return self.encoder.embeddings(
            dec_input_ids, token_type_ids=jnp.zeros_like(dec_input_ids),
            position_ids=positions, deterministic=deterministic)

    def _lm_logits(self, hidden):
        # independent LM projection (NOT the tied word-embedding table) —
        # matches trained reference checkpoints, see GSTDecoderModel.setup
        return self._shard_logits(self.decoder.lm_logits(hidden))

    def decode_logits(self, dec_input_ids, dec_attention_mask, memory,
                      memory_mask, deterministic: bool = True):
        """Teacher-forced decoder pass -> [B, L, vocab] float32 logits."""
        x = self._embed_dec(dec_input_ids, deterministic=deterministic)
        mem_add = additive_mask(memory_mask, dtype=self.dtype)
        h = self.decoder(x, dec_attention_mask, memory, mem_add,
                         deterministic=deterministic)
        return self._lm_logits(h)

    def decode_logits_cached(self, dec_input_ids, dec_attention_mask,
                             memory_kv, memory_add_mask,
                             deterministic: bool = True):
        """Teacher-forced decoder pass over precomputed memory K/V."""
        x = self._embed_dec(dec_input_ids, deterministic=deterministic)
        h = self.decoder.forward_cached(x, dec_attention_mask, memory_kv,
                                        memory_add_mask,
                                        deterministic=deterministic)
        return self._lm_logits(h)

    def score(self, input_ids, image_feat, image_loc, token_type_ids,
              attention_mask, image_attention_mask, dec_input_ids,
              dec_attention_mask, deterministic: bool = True):
        """encode -> fuse -> teacher-forced decode.  The train/eval forward of
        the reference EncoderDecoderModel (visual_dialog_model.py:44-72)."""
        hidden_t, hidden_v, _, _ = self.encode(
            input_ids, image_feat, image_loc, token_type_ids,
            attention_mask, image_attention_mask, deterministic)
        memory, memory_mask = self.fuse(
            hidden_t, hidden_v, attention_mask, image_attention_mask,
            deterministic)
        return self.decode_logits(dec_input_ids, dec_attention_mask, memory,
                                  memory_mask, deterministic)

    # ------------------------------------------------------------------ #
    # KV-cached decode
    # ------------------------------------------------------------------ #

    def decode_prepare(self, input_ids, image_feat, image_loc, token_type_ids,
                       attention_mask, image_attention_mask):
        """Run the encoder once and precompute the decoder's cross-attention
        K/V over the fused memory.  Returns (memory_kv, memory_add_mask)."""
        hidden_t, hidden_v, _, _ = self.encode(
            input_ids, image_feat, image_loc, token_type_ids,
            attention_mask, image_attention_mask, True)
        memory, memory_mask = self.fuse(
            hidden_t, hidden_v, attention_mask, image_attention_mask, True)
        mem_kv = self.decoder.precompute_memory(memory)
        return mem_kv, additive_mask(memory_mask, dtype=self.dtype)

    def decode_step(self, token_ids, pos, caches, memory_kv, memory_add_mask):
        """One decode step: token_ids [B, 1] at absolute position ``pos``.
        Returns ([B, vocab] float32 logits, updated caches)."""
        positions = jnp.full_like(token_ids, pos)
        x = self._embed_dec(token_ids, positions=positions, deterministic=True)
        h, caches = self.decoder.step(x, pos, caches, memory_kv,
                                      memory_add_mask)
        return self._lm_logits(h)[:, 0, :], caches


# ---------------------------------------------------------------------- #
# loss helpers (free functions — jit-friendly)
# ---------------------------------------------------------------------- #


def derive_labels_and_inputs(dec_input_ids: jnp.ndarray, eos_id: int,
                             pad_id: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """When labels are not supplied the reference shifts inputs left to form
    labels and maps EOS->PAD in the inputs (visual_dialog_decoder.py:53-57)."""
    labels = jnp.zeros_like(dec_input_ids)
    labels = labels.at[:, :-1].set(dec_input_ids[:, 1:])
    inputs = jnp.where(dec_input_ids == eos_id, pad_id, dec_input_ids)
    return labels, inputs


def teacher_forced_nll(logits: jnp.ndarray, labels: jnp.ndarray,
                       pad_id: int = 0) -> jnp.ndarray:
    """Per-position CE with ignore_index=pad (visual_dialog_decoder.py:73-77).
    Returns [B, L] float32 (0 at ignored positions)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.where(labels == pad_id, 0.0, nll)


def teacher_forced_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                        pad_id: int = 0) -> jnp.ndarray:
    """Mean CE over non-pad label positions (torch CrossEntropyLoss with
    ignore_index=pad, reduction='mean')."""
    nll = teacher_forced_nll(logits, labels, pad_id)
    denom = jnp.maximum((labels != pad_id).sum(), 1)
    return nll.sum() / denom


def candidate_log_likelihood(logits: jnp.ndarray, dec_input_ids: jnp.ndarray,
                             pad_id: int = 0) -> jnp.ndarray:
    """Sum log-likelihood of each candidate answer under teacher forcing —
    the generative ranking score (evaluate_gen.py:94-107).  Targets are the
    left-shifted decoder inputs; pad positions excluded."""
    targets = jnp.zeros_like(dec_input_ids)
    targets = targets.at[:, :-1].set(dec_input_ids[:, 1:])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    tok = jnp.where(targets == pad_id, 0.0, tok)
    return tok.sum(-1)
