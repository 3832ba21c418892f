"""Dialog text embeddings and image-region embeddings.

DialogEmbeddings mirrors reference ``BertEmbeddingsDialog``
(``models/vilbert_dialog.py:298-352``): word + learned position + segment
embeddings where segment ids >= type_vocab_size index a 10-slot extension
table.  The checkpoint-present but forward-unused ``sep_embeddings`` table and
sinusoidal ``pe`` buffer are kept as parameters so converted PyTorch
checkpoints round-trip (``vilbert_dialog.py:305-317``).

ImageEmbeddings mirrors ``BertImageEmbeddings``
(``vilbert_dialog.py:1409-1427``): 2048-d region features and 5-d normalized
box geometry each linearly projected to v_hidden and summed under LayerNorm.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from gstx.core.config import EncoderConfig
from gstx.models.layers import dense, layer_norm, prec_for


class DialogEmbeddings(nn.Module):
    config: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(cfg.initializer_range)
        self.word_embeddings = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, embedding_init=init,
            param_dtype=jnp.float32, name="word_embeddings")
        self.position_embeddings = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, embedding_init=init,
            param_dtype=jnp.float32, name="position_embeddings")
        self.token_type_embeddings = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, embedding_init=init,
            param_dtype=jnp.float32, name="token_type_embeddings")
        self.token_type_embeddings_extension = nn.Embed(
            cfg.type_vocab_extension, cfg.hidden_size, embedding_init=init,
            param_dtype=jnp.float32, name="token_type_embeddings_extension")
        # ckpt-present, unused in forward (vilbert_dialog.py:317); a direct
        # param so it materializes at init despite never being applied
        self.sep_embeddings = self.param(
            "sep_embeddings", init, (cfg.sep_vocab_size, cfg.hidden_size),
            jnp.float32)
        self.ln = layer_norm(eps=cfg.layer_norm_eps, dtype=self.dtype, name="ln")
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        token_type_ids: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                jnp.arange(input_ids.shape[-1])[None, :], input_ids.shape
            )
        words = self.word_embeddings(input_ids)
        pos = self.position_embeddings(position_ids)

        # segment ids < type_vocab_size use the base table, >= use the
        # extension table shifted by type_vocab_size (vilbert_dialog.py:334-347)
        tv = self.config.type_vocab_size
        is_ext = token_type_ids >= tv
        base_ids = jnp.where(is_ext, 0, token_type_ids)
        ext_ids = jnp.where(is_ext, token_type_ids - tv, 0)
        seg = jnp.where(
            is_ext[..., None],
            self.token_type_embeddings_extension(ext_ids),
            self.token_type_embeddings(base_ids),
        )

        emb = (words + pos + seg).astype(self.dtype)
        emb = self.ln(emb)
        return self.dropout(emb, deterministic=deterministic)

    def attend(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """Project hidden states onto the (tied) word-embedding table:
        logits = hidden @ E^T.  Used by the MLM head and the decoder LM head
        (vilbert_dialog.py:986-992; visual_dialog_decoder.py:326-339)."""
        table = self.word_embeddings.embedding
        return jnp.einsum("...d,vd->...v", hidden.astype(jnp.float32), table,
                          precision=prec_for(jnp.float32))


class ImageEmbeddings(nn.Module):
    config: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,  # [B, R, v_feature_size]
        locations: jnp.ndarray,  # [B, R, 5]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        img = dense(cfg.v_hidden_size, self.dtype, "image_embeddings")(
            features.astype(self.dtype))
        loc = dense(cfg.v_hidden_size, self.dtype,
                    "image_location_embeddings")(locations.astype(self.dtype))
        emb = layer_norm(eps=cfg.layer_norm_eps, dtype=self.dtype, name="ln")(
            img + loc)
        return nn.Dropout(cfg.hidden_dropout_prob)(
            emb, deterministic=deterministic)
