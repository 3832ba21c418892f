"""Causal BERT decoder with cross-attention and a real KV cache.

Reimplements the semantics of the reference decoder
(``models/visual_dialog_decoder.py:116-344``: HF BertGeneration layers with
``is_decoder=True``, ``add_cross_attention=True``) with a TPU-native design:

  * teacher-forced training path: full-sequence causal self-attention and
    cross-attention over the fused 293-token memory;
  * decode path: the reference re-runs the FULL decoder per generated token
    (``use_cache:false``, config/..._dec.json:25 — 18 full forwards per
    utterance).  Here the memory's cross-attention K/V are computed ONCE and
    self-attention K/V accumulate in a fixed-shape cache, so each decode step
    is O(1) matmuls — the core of the >10x dialog-engine speedup
    (SURVEY.md §6 north-star).

The decoder shares the word/position/segment embedding module with the
encoder (reference weight tying, ``train_gen.py:293``) — the caller passes
embedded inputs and a tied ``embed_attend`` projection.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gstx.core.config import DecoderConfig
from gstx.models.layers import (
    attend,
    causal_additive_mask,
    checkpoint_policy,
    dense as layers_dense,
    layer_norm,
    merge_heads,
    split_heads,
)

Cache = Dict[str, jnp.ndarray]


def quantize_memory_kv(memory_kv, memory_add_mask, dtype=jnp.bfloat16):
    """Symmetric per-(batch, head, channel) int8 quantization of the
    precomputed cross-attention K/V.

    The fused memory is STATIC for the whole utterance while the decode
    loop re-reads all 12 layers' K/V every step (~1 GB/step at batch 96,
    the decode bandwidth floor — PERF.md); int8 halves that traffic.
    Padded memory positions are zeroed before taking the per-channel
    abs-max (their attention weights are -10000-masked, so their values
    are free), which also makes the scales independent of the context
    bucket width.

    Returns per-layer 4-tuples (k_int8, v_int8, k_scale, v_scale);
    :func:`dequantize_kv` restores ``dtype`` values at the attention input
    (fused into the dot's operand read by XLA).
    """
    valid = (memory_add_mask[:, 0, 0, :] > -5000.0)[:, None, :, None]

    def q(t):
        # written as two fusable single passes over t (abs+mask+max-reduce,
        # then scale+round+cast): the earlier f32 `where` materialized 2x
        # f32 copies of the 1 GB memory and cost 6.5 ms per utterance —
        # more than the decode savings it was buying (measured, PERF.md)
        a = jnp.where(valid, jnp.abs(t), 0).astype(jnp.float32)
        scale = jnp.maximum(
            jnp.max(a, axis=2, keepdims=True) / 127.0, 1e-8)
        inv = 1.0 / scale
        ti = jnp.round(t.astype(jnp.float32) * inv).astype(jnp.int8)
        ti = jnp.where(valid, ti, 0)
        return ti, scale.astype(dtype)

    out = []
    for (k, v) in memory_kv:
        kq, ks = q(k)
        vq, vs = q(v)
        out.append((kq, vq, ks, vs))
    return out


def dequantize_kv(mem):
    """(k, v) passthrough; (k_int8, v_int8, k_scale, v_scale) -> scaled."""
    if len(mem) == 2:
        return mem
    kq, vq, ks, vs = mem
    return kq.astype(ks.dtype) * ks, vq.astype(vs.dtype) * vs


class DecoderLayer(nn.Module):
    """Self-attention (causal) + cross-attention + FFN, post-LN residuals —
    the HF BertLayer with crossattention (transformers
    modeling_bert.BertLayer as instantiated by the reference decoder)."""

    config: DecoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        d = cfg.hidden_size
        dense = lambda feats, name: layers_dense(feats, self.dtype, name)
        self.qkv = dense(3 * d, "qkv")
        self.self_out = dense(d, "self_out")
        self.self_ln = layer_norm(cfg.layer_norm_eps, self.dtype, "self_ln")
        self.cross_q = dense(d, "cross_q")
        self.cross_kv = dense(2 * d, "cross_kv")
        self.cross_out = dense(d, "cross_out")
        self.cross_ln = layer_norm(cfg.layer_norm_eps, self.dtype, "cross_ln")
        self.intermediate = dense(cfg.intermediate_size, "intermediate")
        self.output = dense(d, "output")
        self.output_ln = layer_norm(cfg.layer_norm_eps, self.dtype, "output_ln")
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)
        self.attn_dropout_rate = cfg.attention_probs_dropout_prob

    def memory_kv(self, memory: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Precompute cross-attention K/V for a fixed encoder memory."""
        h = self.config.num_attention_heads
        kv = self.cross_kv(memory)
        k, v = jnp.split(kv, 2, axis=-1)
        return split_heads(k, h), split_heads(v, h)

    def _self_block(self, x, q, k, v, mask, deterministic):
        rng = None if deterministic else self.make_rng("dropout")
        ctx = attend(q, k, v, mask, dropout_rate=self.attn_dropout_rate,
                     deterministic=deterministic, dropout_rng=rng,
                     dtype=self.dtype)
        out = self.self_out(merge_heads(ctx))
        out = self.dropout(out, deterministic=deterministic)
        return self.self_ln(out + x)

    def _cross_block(self, x, mem, mem_mask, deterministic):
        """Cross-attention over the static encoder memory.  ``mem`` is a
        per-layer (k, v) pair or an int8 4-tuple (k_i8, v_i8, k_scale,
        v_scale) from :func:`quantize_memory_kv`."""
        h = self.config.num_attention_heads
        q = split_heads(self.cross_q(x), h)
        if len(mem) == 4:
            if not deterministic:
                # the int8 path has no attention-dropout branch; failing
                # loudly beats silently diverging from the (k, v) path's
                # train-mode semantics
                raise ValueError(
                    "quantized cross-attention memory supports only "
                    "deterministic=True (no attention-dropout path); "
                    "pass unquantized (k, v) memory for training")
            ctx = self._quant_cross_attend(q, mem, mem_mask)
        else:
            mem_k, mem_v = mem
            rng = None if deterministic else self.make_rng("dropout")
            ctx = attend(q, mem_k, mem_v, mem_mask,
                         dropout_rate=self.attn_dropout_rate,
                         deterministic=deterministic, dropout_rng=rng,
                         dtype=self.dtype)
        out = self.cross_out(merge_heads(ctx))
        out = self.dropout(out, deterministic=deterministic)
        return self.cross_ln(out + x)

    def _quant_cross_attend(self, q, mem, mem_mask):
        """Scale-folded int8 cross-attention: K/V stay int8 all the way to
        the dots' operand reads.

        The per-(batch, head, channel) K scale (and the 1/sqrt(dh) logits
        scale) folds into q BEFORE the QK^T dot, and the V scale folds into
        the context AFTER the PV dot — so no dequantized copy of the ~1 GB
        decode memory is ever materialized; the only per-element work on the
        big operands is a unary int8->dtype convert, which XLA fuses into
        the dot's read (the round-2 `dequantize_kv` multiply was a binary op
        with a broadcast operand and lost that fusion inside the engine's
        round program — PERF.md opt 7)."""
        kq, vq, ks, vs = mem
        dh = q.shape[-1]
        q = (q.astype(jnp.float32) * ks.astype(jnp.float32)
             * (1.0 / float(dh) ** 0.5)).astype(self.dtype)
        # single-token decode steps on TPU use the pallas kernel, which
        # guarantees K/V stream from HBM at int8 width inside the decode
        # while_loop (XLA hoists the loop-invariant int8->bf16 convert out
        # of the loop, re-materializing bf16 K/V — gstx/kernels/decode_attn)
        from gstx.kernels.decode_attn import maybe_quant_decode_attention

        ctx = maybe_quant_decode_attention(q, kq, vq, mem_mask)
        if ctx is None:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, kq.astype(self.dtype),
                                preferred_element_type=jnp.float32)
            if mem_mask is not None:
                scores = scores + mem_mask.astype(jnp.float32)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, vq.astype(self.dtype),
                             preferred_element_type=jnp.float32)
        return (ctx * vs.astype(jnp.float32)).astype(self.dtype)

    def _ffn_block(self, x, deterministic):
        h = jax.nn.gelu(self.intermediate(x), approximate=False)
        h = self.output(h)
        h = self.dropout(h, deterministic=deterministic)
        return self.output_ln(h + x)

    def __call__(
        self,
        x: jnp.ndarray,               # [B, L, D]
        self_mask: jnp.ndarray,       # [B, 1, L, L] additive causal mask
        memory: jnp.ndarray,          # [B, M, D]
        mem_mask: Optional[jnp.ndarray],  # [B, 1, 1, M] additive
        deterministic: bool = True,
    ) -> jnp.ndarray:
        return self.forward_with_memory_kv(
            x, self_mask, self.memory_kv(memory), mem_mask, deterministic)

    def forward_with_memory_kv(
        self, x, self_mask, mem, mem_mask, deterministic: bool = True
    ) -> jnp.ndarray:
        """Full-sequence forward with precomputed cross-attention K/V (used
        when the encoder memory is reused, e.g. perplexity scoring right
        after answer decoding in the dialog engine).  ``mem`` may be a
        (k, v) pair or an int8 4-tuple."""
        h = self.config.num_attention_heads
        q, k, v = (split_heads(t, h) for t in jnp.split(self.qkv(x), 3, -1))
        x = self._self_block(x, q, k, v, self_mask, deterministic)
        x = self._cross_block(x, mem, mem_mask, deterministic)
        return self._ffn_block(x, deterministic)

    def step(
        self,
        x: jnp.ndarray,               # [B, 1, D] current token's hidden
        pos: jnp.ndarray,             # scalar int32 — write position
        cache: Cache,
        mem,                          # (k, v) or int8 4-tuple
        mem_mask: Optional[jnp.ndarray],
    ) -> Tuple[jnp.ndarray, Cache]:
        """One KV-cached decode step (always deterministic)."""
        h = self.config.num_attention_heads
        q, k, v = (split_heads(t, h) for t in jnp.split(self.qkv(x), 3, -1))
        ck = jax.lax.dynamic_update_slice(cache["k"], k, (0, 0, pos, 0))
        cv = jax.lax.dynamic_update_slice(cache["v"], v, (0, 0, pos, 0))
        # valid cache slots are [0, pos]; mask the rest
        max_len = ck.shape[2]
        slot = jnp.arange(max_len)
        smask = jnp.where(slot[None, None, None, :] <= pos, 0.0, -10000.0)
        x = self._self_block(x, q, ck, cv, smask.astype(self.dtype), True)
        x = self._cross_block(x, mem, mem_mask, True)
        x = self._ffn_block(x, True)
        return x, {"k": ck, "v": cv}


class GSTDecoderModel(nn.Module):
    """Decoder stack.  Embedding and LM projection are tied to the encoder's
    DialogEmbeddings and injected functionally by the owning model."""

    config: DecoderConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # per-layer jax.checkpoint on the teacher-forced path
    remat_policy: str = "full"  # layers.checkpoint_policy: 'full' | 'dots' | 'small'

    def setup(self):
        self.layers = [
            DecoderLayer(self.config, dtype=self.dtype, name=f"layer_{i}")
            for i in range(self.config.num_hidden_layers)
        ]
        # LM head: its OWN projection weight + free bias.  The reference's
        # three-way tying does not survive training: train_gen.py:293
        # replaces the decoder's embeddings MODULE after the lm_head was
        # constructed from the ORIGINAL decoder embedding Parameter
        # (visual_dialog_decoder.py:124,326-335), so in trained reference
        # checkpoints lm_head.decoder.weight is a separate tensor that has
        # diverged from the shared input-embedding table.  gstx reproduces
        # that: decoder INPUT embeddings are tied to the encoder table, the
        # LM projection is independent.
        self.lm_weight = self.param(
            "lm_weight", nn.initializers.normal(self.config.initializer_range),
            (self.config.vocab_size, self.config.hidden_size), jnp.float32)
        self.lm_bias = self.param(
            "lm_bias", nn.initializers.zeros, (self.config.vocab_size,),
            jnp.float32)

    def lm_logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """hidden @ lm_weight^T + bias (BertGenerationOnlyLMHead,
        visual_dialog_decoder.py:326-339); logits accumulate in float32.

        On the f32 path the multiply itself is exact f32 (HIGHEST).  On the
        bf16 path the multiply is the MXU's native bf16 (consistent with
        every other matmul on that path; hidden is already bf16-accurate)
        — this halves the [30522, 768] weight read and avoids the 3-pass
        f32-emulation matmul in the per-token decode loop."""
        from gstx.models.layers import prec_for

        if self.dtype == jnp.bfloat16:
            logits = jnp.einsum(
                "...d,vd->...v", hidden.astype(jnp.bfloat16),
                self.lm_weight.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        else:
            logits = jnp.einsum(
                "...d,vd->...v", hidden.astype(jnp.float32),
                self.lm_weight.astype(jnp.float32),
                precision=prec_for(jnp.float32))
        return logits + self.lm_bias.astype(jnp.float32)

    def __call__(
        self,
        x: jnp.ndarray,                  # [B, L, D] embedded decoder inputs
        attention_mask: Optional[jnp.ndarray],  # [B, L] {0,1} padding mask
        memory: jnp.ndarray,             # [B, M, D]
        memory_mask: Optional[jnp.ndarray],     # [B, 1, 1, M] additive
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if attention_mask is None:
            attention_mask = jnp.ones(x.shape[:2], dtype=jnp.int32)
        self_mask = causal_additive_mask(attention_mask, dtype=self.dtype)
        if self.remat:
            call = nn.remat(
                lambda layer, h, sm, mem, mm, det: layer(
                    h, sm, mem, mm, deterministic=det),
                static_argnums=(5,),
                policy=checkpoint_policy(self.remat_policy))
        else:
            call = lambda layer, h, sm, mem, mm, det: layer(
                h, sm, mem, mm, deterministic=det)
        for layer in self.layers:
            x = call(layer, x, self_mask, memory, memory_mask, deterministic)
        return x

    def forward_cached(
        self,
        x: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray],
        memory_kv,                       # list of (k, v) or quantized 4-tuples
        memory_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if attention_mask is None:
            attention_mask = jnp.ones(x.shape[:2], dtype=jnp.int32)
        self_mask = causal_additive_mask(attention_mask, dtype=self.dtype)
        for layer, mem in zip(self.layers, memory_kv):
            x = layer.forward_with_memory_kv(
                x, self_mask, mem, memory_mask, deterministic)
        return x

    # ---- KV-cached decoding ----
    # (cache layout is owned by gstx.decode.sampler.init_cache — the single
    # implementation every decode entry point allocates through)

    def precompute_memory(self, memory: jnp.ndarray):
        """Per-layer cross K/V for a fixed memory — computed once per
        utterance instead of once per decode step."""
        return [l.memory_kv(memory) for l in self.layers]

    def step(
        self,
        x: jnp.ndarray,                  # [B, 1, D]
        pos: jnp.ndarray,                # scalar int32
        caches: List[Cache],
        memory_kv,                       # list of (k, v) or quantized 4-tuples
        memory_mask: Optional[jnp.ndarray],
    ) -> Tuple[jnp.ndarray, List[Cache]]:
        new_caches = []
        for layer, cache, mem in zip(self.layers, caches, memory_kv):
            x, cache = layer.step(x, pos, cache, mem, memory_mask)
            new_caches.append(cache)
        return x, new_caches
