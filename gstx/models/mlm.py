"""Standalone text-only BERT masked-LM — the attacker model of the
random_token attack.

The reference loads an INDEPENDENT huggingface ``BertForMaskedLM``
('bert-base-uncased') as the attacker (``utils/text_attack.py:19-27``) so
the attacker does NOT share weights with the victim dialog model.  This is
the gstx rebuild of that model (SURVEY.md §2.7 "BertForMaskedLM rebuild"):
standard BERT embeddings + self-attention stack + the tied MLM head, plus a
converter for huggingface ``bert.* / cls.predictions.*`` state dicts.

Loaded via ``-mlm_path`` (torch ``pytorch_model.bin``-style state dict or a
converted orbax dir); when the flag is empty the attack falls back to the
dialog model's own MLM head (self-contained mode, the round-1 behavior).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gstx.core.config import EncoderConfig
from gstx.models.embeddings import DialogEmbeddings
from gstx.models.heads import PredictionTransform
from gstx.models.layers import TransformerLayer, additive_mask


def mlm_config(vocab_size: int = 30522, hidden_size: int = 768,
               num_hidden_layers: int = 12, num_attention_heads: int = 12,
               intermediate_size: int = 3072,
               max_position_embeddings: int = 512) -> EncoderConfig:
    """bert-base-uncased shape by default; the unused visual fields keep
    EncoderConfig reusable for the text-only model."""
    return EncoderConfig(
        vocab_size=vocab_size, hidden_size=hidden_size,
        num_hidden_layers=num_hidden_layers,
        num_attention_heads=num_attention_heads,
        intermediate_size=intermediate_size,
        max_position_embeddings=max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


class BertMLM(nn.Module):
    """BERT encoder + MLM head (huggingface BertForMaskedLM semantics)."""

    config: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.embeddings = DialogEmbeddings(cfg, dtype=self.dtype,
                                           name="embeddings")
        self.layers = [
            TransformerLayer(
                num_heads=cfg.num_attention_heads,
                head_dim=cfg.hidden_size // cfg.num_attention_heads,
                intermediate_size=cfg.intermediate_size,
                activation=cfg.hidden_act,
                attn_dropout=cfg.attention_probs_dropout_prob,
                hidden_dropout=cfg.hidden_dropout_prob,
                dtype=self.dtype, name=f"layer_{i}")
            for i in range(cfg.num_hidden_layers)
        ]
        self.transform = PredictionTransform(
            cfg.hidden_size, cfg.hidden_act, dtype=self.dtype,
            name="transform")
        self.mlm_bias = self.param("mlm_bias", nn.initializers.zeros,
                                   (cfg.vocab_size,), jnp.float32)

    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 deterministic: bool = True):
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        mask = additive_mask(attention_mask, dtype=self.dtype)
        x = self.embeddings(input_ids, token_type_ids=token_type_ids,
                            deterministic=deterministic)
        for layer in self.layers:
            x = layer(x, mask, deterministic=deterministic)
        h = self.transform(x)
        return self.embeddings.attend(h) + self.mlm_bias  # [B, L, V] f32


def convert_hf_bert_mlm_state_dict(sd: Dict[str, np.ndarray],
                                   num_layers: int) -> dict:
    """huggingface BertForMaskedLM state dict -> BertMLM param tree.  The
    tied ``cls.predictions.decoder.weight`` duplicate and the
    ``position_ids`` buffer are dropped; q/k/v fuse into the QKV kernel."""
    from gstx.core.checkpoint import _dense, _ln, _qkv_kernel, _set, \
        _strip_prefixes

    sd = _strip_prefixes(sd)
    tree: dict = {}
    emb = "bert.embeddings"
    for name in ("word_embeddings", "position_embeddings",
                 "token_type_embeddings"):
        _set(tree, ("embeddings", name, "embedding"),
             sd[f"{emb}.{name}.weight"])
    hidden = sd[f"{emb}.word_embeddings.weight"].shape[1]
    # DialogEmbeddings' dialog-only tables, absent from plain BERT ckpts and
    # unreachable with token_type ids < 2: zero-filled for a complete tree
    _set(tree, ("embeddings", "token_type_embeddings_extension", "embedding"),
         np.zeros((10, hidden), np.float32))
    _set(tree, ("embeddings", "sep_embeddings"),
         np.zeros((50, hidden), np.float32))
    _set(tree, ("embeddings", "ln"), _ln(sd, f"{emb}.LayerNorm"))
    for i in range(num_layers):
        src = f"bert.encoder.layer.{i}"
        dst = (f"layer_{i}",)
        k, b = _qkv_kernel(sd, f"{src}.attention.self")
        _set(tree, dst + ("attention", "qkv"), {"kernel": k, "bias": b})
        _set(tree, dst + ("attention", "out"),
             _dense(sd, f"{src}.attention.output.dense"))
        _set(tree, dst + ("attention", "out_ln"),
             _ln(sd, f"{src}.attention.output.LayerNorm"))
        _set(tree, dst + ("ffn", "intermediate"),
             _dense(sd, f"{src}.intermediate.dense"))
        _set(tree, dst + ("ffn", "output"), _dense(sd, f"{src}.output.dense"))
        _set(tree, dst + ("ffn", "output_ln"),
             _ln(sd, f"{src}.output.LayerNorm"))
    _set(tree, ("transform", "dense"),
         _dense(sd, "cls.predictions.transform.dense"))
    _set(tree, ("transform", "ln"),
         _ln(sd, "cls.predictions.transform.LayerNorm"))
    _set(tree, ("mlm_bias",), sd["cls.predictions.bias"])
    return tree


def _infer_heads(hidden_size: int) -> int:
    """num_attention_heads under the bert-base dh=64 convention; the head
    count is not recoverable from checkpoint shapes, so refuse to guess
    when the convention cannot hold."""
    if hidden_size % 64 != 0:
        raise ValueError(
            f"cannot infer num_attention_heads: hidden_size "
            f"{hidden_size} is not a multiple of head_dim 64 — "
            "pass an explicit config to load_mlm_attacker")
    return max(1, hidden_size // 64)


def load_mlm_attacker(path: str, config: Optional[EncoderConfig] = None):
    """Load the standalone attacker from ``-mlm_path``: a torch state dict
    (.bin/.pt/.ckpt file) or an orbax checkpoint dir holding a BertMLM tree.
    Returns (model, params)."""
    import os

    from gstx.core import checkpoint as ckpt_lib

    if os.path.isdir(path):
        restored = ckpt_lib.restore_checkpoint(path)
        params = restored["params"] if "params" in restored else restored
        inner = params["params"] if "params" in params else params
        word = np.asarray(inner["embeddings"]["word_embeddings"]["embedding"])
        n_layers = len([k for k in inner if k.startswith("layer_")])
        if config is None:
            # infer every shape-determined field from the restored tree
            # (mirrors the torch branch below); num_attention_heads is not
            # recoverable from the fused-QKV shapes, so use the bert-base
            # dh=64 convention the reference attacker follows
            inter = np.asarray(
                inner["layer_0"]["ffn"]["intermediate"]["kernel"]).shape[1]
            max_pos = np.asarray(
                inner["embeddings"]["position_embeddings"]["embedding"]
            ).shape[0]
            config = mlm_config(
                vocab_size=word.shape[0], hidden_size=word.shape[1],
                num_hidden_layers=n_layers,
                num_attention_heads=_infer_heads(word.shape[1]),
                intermediate_size=inter, max_position_embeddings=max_pos)
        return BertMLM(config), {"params": inner}
    sd = ckpt_lib.load_torch_checkpoint(path)
    word = sd["bert.embeddings.word_embeddings.weight"]
    n_layers = len({k.split(".")[3] for k in sd
                    if k.startswith("bert.encoder.layer.")})
    if config is None:
        inter = sd["bert.encoder.layer.0.intermediate.dense.weight"].shape[0]
        max_pos = sd["bert.embeddings.position_embeddings.weight"].shape[0]
        config = mlm_config(
            vocab_size=word.shape[0], hidden_size=word.shape[1],
            num_hidden_layers=n_layers,
            num_attention_heads=_infer_heads(word.shape[1]),
            intermediate_size=inter, max_position_embeddings=max_pos)
    tree = convert_hf_bert_mlm_state_dict(sd, config.num_hidden_layers)
    return BertMLM(config), {"params": tree}


def make_standalone_mlm_fill(mlm_model: BertMLM, mlm_params):
    """MLM refill callable backed by an INDEPENDENT BertForMaskedLM-style
    attacker (reference text_attack.py:30-56 — it sees only the text)."""

    @jax.jit
    def _predict(input_ids, token_type_ids, attention_mask):
        return mlm_model.apply(mlm_params, input_ids, token_type_ids,
                               attention_mask)

    def fill(input_ids, token_type_ids, attention_mask, image=None):
        return _predict(jnp.asarray(input_ids), jnp.asarray(token_type_ids),
                        jnp.asarray(attention_mask))

    return fill
