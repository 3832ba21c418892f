"""Two-stream ViLBERT encoder with co-attention connection layers.

Reimplements, TPU-first, the reference's signature architecture
(``models/vilbert_dialog.py:606-912``):

  * text stream: 12 BERT layers (768-d, 12 heads)
  * visual stream: 6 BERT layers over 37 region tokens (1024-d, 8 heads)
  * 6 co-attention "connection" layers: ONE bi-directional cross-attention
    block where text queries attend image K/V and image queries attend text
    K/V, then per-stream FFNs (``BertConnectionLayer``,
    ``vilbert_dialog.py:746-773``)
  * interleaving schedule driven by (v_biattention_id, t_biattention_id)
    exactly as ``BertEncoder.forward`` (``vilbert_dialog.py:806-912``).

The schedule is static configuration, so the interleaved loop unrolls at
trace time into one straight-line XLA program — no dynamic control flow.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gstx.core.config import EncoderConfig
from gstx.models.layers import (
    FeedForward,
    PDense,
    PLayerNorm,
    TransformerLayer,
    attend,
    checkpoint_policy,
    ckpt_tag,
    dense,
    layer_norm,
    merge_heads,
    split_heads,
)


class BiAttention(nn.Module):
    """Bi-directional cross attention (reference ``BertBiAttention``,
    vilbert_dialog.py:606-712).

    Stream 1 = visual [B, R, v_hidden], stream 2 = text [B, L, hidden].
    Text queries attend visual K/V (-> ctx for the text stream) and visual
    queries attend text K/V (-> ctx for the visual stream); both run at
    bi_hidden width.  Both directions are computed from one fused QKV
    projection per stream.
    """

    config: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        v_input: jnp.ndarray,
        v_mask: Optional[jnp.ndarray],
        t_input: jnp.ndarray,
        t_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        heads = cfg.bi_num_attention_heads
        inner = cfg.bi_hidden_size

        qkv1 = ckpt_tag(dense(3 * inner, self.dtype, "qkv1")(v_input),
                        "gstx_proj", not deterministic)  # visual stream
        qkv2 = ckpt_tag(dense(3 * inner, self.dtype, "qkv2")(t_input),
                        "gstx_proj", not deterministic)  # text stream
        q1, k1, v1 = (split_heads(t, heads) for t in jnp.split(qkv1, 3, -1))
        q2, k2, v2 = (split_heads(t, heads) for t in jnp.split(qkv2, 3, -1))

        rng1 = rng2 = None
        if not deterministic:
            rng1 = self.make_rng("dropout")
            rng2 = self.make_rng("dropout")

        # text queries -> visual keys/values (vilbert_dialog.py:670-688)
        ctx_for_text = attend(
            q2, k1, v1, v_mask,
            dropout_rate=cfg.v_attention_probs_dropout_prob,
            deterministic=deterministic, dropout_rng=rng1, dtype=self.dtype)
        # visual queries -> text keys/values (vilbert_dialog.py:690-710)
        ctx_for_visual = attend(
            q1, k2, v2, t_mask,
            dropout_rate=cfg.attention_probs_dropout_prob,
            deterministic=deterministic, dropout_rng=rng2, dtype=self.dtype)

        return merge_heads(ctx_for_visual), merge_heads(ctx_for_text)


class CoAttentionLayer(nn.Module):
    """Reference ``BertConnectionLayer`` (vilbert_dialog.py:746-773):
    bi-attention, per-stream output projection + residual LayerNorm
    (``BertBiOutput``, :714-744), then per-stream FFN.

    Routing (reference vilbert_dialog.py:765): the visual stream residual
    receives the context computed from visual queries attending TEXT K/V,
    and the text stream residual receives the context from text queries
    attending VISUAL K/V — genuine bi-directional cross-attention.
    """

    config: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        v_input: jnp.ndarray,
        v_mask: Optional[jnp.ndarray],
        t_input: jnp.ndarray,
        t_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        ctx_for_visual, ctx_for_text = BiAttention(
            cfg, dtype=self.dtype, name="biattention")(
            v_input, v_mask, t_input, t_mask, deterministic=deterministic)

        # BertBiOutput (vilbert_dialog.py:732-744): visual residual gets the
        # visual-query-over-text context; text residual gets the
        # text-query-over-visual context.  Projection + residual LayerNorm
        # fuse into one pallas kernel on the TPU bf16 path.
        from gstx.kernels import ffn as _pf

        v_proj = PDense(cfg.v_hidden_size, cfg.bi_hidden_size, self.dtype,
                        name="v_dense")
        v_lnm = PLayerNorm(cfg.v_hidden_size, eps=cfg.layer_norm_eps,
                           dtype=self.dtype, name="v_ln")
        t_proj = PDense(cfg.hidden_size, cfg.bi_hidden_size, self.dtype,
                        name="t_dense")
        t_lnm = PLayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps,
                           dtype=self.dtype, name="t_ln")

        v_state = _pf.maybe_fused_dense_ln(
            ctx_for_visual, v_proj.kernel, v_proj.bias, v_input,
            v_lnm.scale, v_lnm.bias, eps=cfg.layer_norm_eps,
            dropout_rate=cfg.v_hidden_dropout_prob,
            deterministic=deterministic, dtype=self.dtype)
        if v_state is None:
            v_ctx = v_proj(ctx_for_visual)
            v_ctx = nn.Dropout(cfg.v_hidden_dropout_prob)(
                v_ctx, deterministic=deterministic)
            v_state = v_lnm(v_ctx + v_input)
        v_state = ckpt_tag(v_state, "gstx_block", not deterministic)
        t_state = _pf.maybe_fused_dense_ln(
            ctx_for_text, t_proj.kernel, t_proj.bias, t_input,
            t_lnm.scale, t_lnm.bias, eps=cfg.layer_norm_eps,
            dropout_rate=cfg.hidden_dropout_prob,
            deterministic=deterministic, dtype=self.dtype)
        if t_state is None:
            t_ctx = t_proj(ctx_for_text)
            t_ctx = nn.Dropout(cfg.hidden_dropout_prob)(
                t_ctx, deterministic=deterministic)
            t_state = t_lnm(t_ctx + t_input)
        t_state = ckpt_tag(t_state, "gstx_block", not deterministic)

        v_state = FeedForward(
            intermediate_size=cfg.v_intermediate_size,
            activation=cfg.v_hidden_act,
            hidden_dropout=cfg.v_hidden_dropout_prob,
            dtype=self.dtype, name="v_ffn")(v_state, deterministic=deterministic)
        t_state = FeedForward(
            intermediate_size=cfg.intermediate_size,
            activation=cfg.hidden_act,
            hidden_dropout=cfg.hidden_dropout_prob,
            dtype=self.dtype, name="t_ffn")(t_state, deterministic=deterministic)
        return v_state, t_state


class TwoStreamEncoder(nn.Module):
    """Interleaved text/visual/co-attention stack
    (reference ``BertEncoder.forward``, vilbert_dialog.py:806-912).

    With the production schedule v_biattention_id=[0..5],
    t_biattention_id=[6..11] the unrolled order is:
      t0..t5, c0, v0, t6, c1, v1, t7, c2, ..., v4, t10, c5, v5, t11.
    """

    config: EncoderConfig
    dtype: jnp.dtype = jnp.float32
    # rematerialize each layer in the backward pass (jax.checkpoint): the
    # f32 attention scores of 12 x [B,12,256,256] dominate training HBM at
    # the reference batch 72 and do not fit a 16 GB chip without remat.
    # Forward-only paths (decode/eval) leave this False — checkpoint is a
    # semantic no-op without grad but changes the compiled program.
    remat: bool = False
    remat_policy: str = "full"  # layers.checkpoint_policy: 'full' | 'dots' | 'small'

    def setup(self):
        cfg = self.config
        self.t_layers = [
            TransformerLayer(
                num_heads=cfg.num_attention_heads,
                head_dim=cfg.head_dim,
                intermediate_size=cfg.intermediate_size,
                activation=cfg.hidden_act,
                attn_dropout=cfg.attention_probs_dropout_prob,
                hidden_dropout=cfg.hidden_dropout_prob,
                dtype=self.dtype,
                name=f"layer_{i}",
            )
            for i in range(cfg.num_hidden_layers)
        ]
        self.v_layers = [
            TransformerLayer(
                num_heads=cfg.v_num_attention_heads,
                head_dim=cfg.v_head_dim,
                intermediate_size=cfg.v_intermediate_size,
                activation=cfg.v_hidden_act,
                attn_dropout=cfg.v_attention_probs_dropout_prob,
                hidden_dropout=cfg.v_hidden_dropout_prob,
                dtype=self.dtype,
                name=f"v_layer_{i}",
            )
            for i in range(cfg.v_num_hidden_layers)
        ]
        self.c_layers = [
            CoAttentionLayer(cfg, dtype=self.dtype, name=f"c_layer_{i}")
            for i in range(len(cfg.v_biattention_id))
        ]

    def __call__(
        self,
        t_emb: jnp.ndarray,
        v_emb: jnp.ndarray,
        t_mask: Optional[jnp.ndarray],
        v_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        if self.remat:
            policy = checkpoint_policy(self.remat_policy)
            stream = nn.remat(
                lambda layer, x, m, det: layer(x, m, deterministic=det),
                static_argnums=(3,), policy=policy)
            co = nn.remat(
                lambda layer, xv, mv, xt, mt, det: layer(
                    xv, mv, xt, mt, deterministic=det),
                static_argnums=(5,), policy=policy)
        else:
            stream = lambda layer, x, m, det: layer(x, m, deterministic=det)
            co = lambda layer, xv, mv, xt, mt, det: layer(
                xv, mv, xt, mt, deterministic=det)
        # fixed_t/v_layer (frozen prefixes under no_grad,
        # vilbert_dialog.py:839-858) are realised with stop_gradient.
        v_start, t_start = 0, 0
        for count, (v_end, t_end) in enumerate(
            zip(cfg.v_biattention_id, cfg.t_biattention_id)
        ):
            for idx in range(v_start, min(cfg.fixed_v_layer, v_end)):
                v_emb = jax.lax.stop_gradient(
                    stream(self.v_layers[idx], v_emb, v_mask, deterministic))
                v_start = cfg.fixed_v_layer
            for idx in range(v_start, v_end):
                v_emb = stream(self.v_layers[idx], v_emb, v_mask,
                               deterministic)
            for idx in range(t_start, min(cfg.fixed_t_layer, t_end)):
                t_emb = jax.lax.stop_gradient(
                    stream(self.t_layers[idx], t_emb, t_mask, deterministic))
                t_start = cfg.fixed_t_layer
            for idx in range(t_start, t_end):
                t_emb = stream(self.t_layers[idx], t_emb, t_mask,
                               deterministic)
            if cfg.with_coattention:
                v_emb, t_emb = co(self.c_layers[count], v_emb, v_mask,
                                  t_emb, t_mask, deterministic)
            v_start, t_start = v_end, t_end

        for idx in range(v_start, cfg.v_num_hidden_layers):
            v_emb = stream(self.v_layers[idx], v_emb, v_mask, deterministic)
        for idx in range(t_start, cfg.num_hidden_layers):
            t_emb = stream(self.t_layers[idx], t_emb, t_mask, deterministic)
        return t_emb, v_emb


class Pooler(nn.Module):
    """CLS pooler to bi_hidden with ReLU (reference BertTextPooler /
    BertImagePooler, vilbert_dialog.py:915-941)."""

    out_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray) -> jnp.ndarray:
        first = hidden[:, 0]
        return jax.nn.relu(dense(self.out_size, self.dtype, "dense")(first))
