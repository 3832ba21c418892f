"""The full two-stream visual-dialog encoder.

Equivalent of reference ``BertModel`` + ``BertForMultiModalPreTraining``
(``models/vilbert_dialog.py:1265-1519``) and the ``VisualDialogEncoder``
wrapper (``models/visual_dialog_encoder.py:7-77``): embeds text and regions,
runs the interleaved two-stream encoder, pools, and (for the discriminative
path) applies the pretraining heads.

Exposed as methods on :class:`GSTEncoderModel` so different entry points jit
only the slice they need.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from gstx.core.config import EncoderConfig
from gstx.models.embeddings import DialogEmbeddings, ImageEmbeddings
from gstx.models.layers import additive_mask
from gstx.models.two_stream import Pooler, TwoStreamEncoder


class GSTEncoderModel(nn.Module):
    config: EncoderConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # per-layer jax.checkpoint for the training path
    remat_policy: str = "full"  # layers.checkpoint_policy: 'full' | 'dots' | 'small'

    def setup(self):
        cfg = self.config
        self.embeddings = DialogEmbeddings(cfg, dtype=self.dtype,
                                           name="embeddings")
        self.v_embeddings = ImageEmbeddings(cfg, dtype=self.dtype,
                                            name="v_embeddings")
        self.encoder = TwoStreamEncoder(cfg, dtype=self.dtype,
                                        remat=self.remat,
                                        remat_policy=self.remat_policy,
                                        name="encoder")
        self.t_pooler = Pooler(cfg.bi_hidden_size, dtype=self.dtype,
                               name="t_pooler")
        self.v_pooler = Pooler(cfg.bi_hidden_size, dtype=self.dtype,
                               name="v_pooler")

    def __call__(
        self,
        input_ids: jnp.ndarray,        # [B, L] int32
        image_feat: jnp.ndarray,       # [B, R, 2048]
        image_loc: jnp.ndarray,        # [B, R, 5]
        token_type_ids: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,   # [B, L] {0,1}
        image_attention_mask: Optional[jnp.ndarray] = None,  # [B, R] {0,1}
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (hidden_t [B,L,768], hidden_v [B,R,1024],
        pooled_t [B,1024], pooled_v [B,1024]).

        Mask handling mirrors BertModel.forward (vilbert_dialog.py:1338-1370).
        """
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if image_attention_mask is None:
            image_attention_mask = jnp.ones(image_feat.shape[:2],
                                            dtype=input_ids.dtype)
        t_mask = additive_mask(attention_mask, dtype=self.dtype)
        v_mask = additive_mask(image_attention_mask, dtype=self.dtype)

        t_emb = self.embeddings(input_ids, token_type_ids=token_type_ids,
                                deterministic=deterministic)
        v_emb = self.v_embeddings(image_feat, image_loc,
                                  deterministic=deterministic)
        hidden_t, hidden_v = self.encoder(
            t_emb, v_emb, t_mask, v_mask, deterministic=deterministic)
        pooled_t = self.t_pooler(hidden_t)
        pooled_v = self.v_pooler(hidden_v)
        return hidden_t, hidden_v, pooled_t, pooled_v

    def embed_attend(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """Tied word-embedding projection (for MLM / LM heads)."""
        return self.embeddings.attend(hidden)
