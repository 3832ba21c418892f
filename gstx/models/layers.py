"""Shared transformer building blocks.

Semantics mirror the reference BERT blocks (reference
``models/vilbert_dialog.py:354-603``): post-LayerNorm residual transformer
layers, exact-erf GELU (``vilbert_dialog.py:116-122``), TF-style LayerNorm
with eps=1e-12 inside the sqrt (``vilbert_dialog.py:283-296``), additive
-10000 attention masks (``vilbert_dialog.py:1364``).

TPU-first choices (not translations):
  * fused QKV projection — one [D, 3D] matmul feeds the MXU instead of three
    [D, D] matmuls;
  * attention logits and softmax accumulate in float32 regardless of the
    activation dtype (bfloat16 on TPU);
  * everything is shape-static so XLA can tile onto the 128x128 MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

MASK_VALUE = -10000.0  # reference vilbert_dialog.py:1364


def prec_for(dtype) -> Optional[jax.lax.Precision]:
    """Matmul precision policy: float32 activations get exact f32 matmuls
    (this JAX build otherwise truncates f32 matmuls to bf16); bfloat16
    activations use the MXU's native bf16 multiply."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def dense(features: int, dtype, name: str, use_bias: bool = True) -> nn.Dense:
    return nn.Dense(
        features, dtype=dtype, param_dtype=jnp.float32,
        precision=prec_for(dtype), use_bias=use_bias, name=name)


def gelu(x):
    """Exact (erf) GELU, matching reference vilbert_dialog.py:116-122."""
    return jax.nn.gelu(x, approximate=False)


def checkpoint_policy(name: str):
    """Map the ``-remat_policy`` flag to a ``jax.checkpoint`` policy.

    ``full`` (policy None): save only each layer's inputs and recompute the
    whole layer in the backward pass — minimum live memory, one extra
    forward of FLOPs.  ``dots``:
    ``jax.checkpoint_policies.dots_with_no_batch_dims_saveable`` — save the
    outputs of the weight matmuls (QKV / attention-output / FFN projections,
    whose dot_general carries no batch dims) and recompute only the cheap
    elementwise work plus the batched attention dots, so the [B,H,S,S]
    score tensors still never live across the forward while the MXU matmuls
    are not re-executed.  Numerics are identical either way — the policy
    only chooses saved-vs-recomputed."""
    if name in (None, "", "full"):
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name == "small":
        # Save ONLY the tagged small activations (QKV projections, attention
        # contexts, residual-stream block outputs — see ckpt_tag call sites)
        # and recompute everything else in the backward: the [B,H,S,S]
        # attention scores/probs and the [B,S,4H] FFN hidden never live
        # across the forward, yet the backward re-runs only the score
        # einsum + softmax + FFN first matmul instead of the WHOLE layer
        # ('full' recomputes ~14 matmul-units/layer, 'small' ~5).  Tags are
        # only emitted on the dropout-active (training) path, so decode /
        # eval programs are byte-identical to before.
        return jax.checkpoint_policies.save_only_these_names(
            "gstx_proj", "gstx_ctx", "gstx_block")
    raise ValueError(
        f"unknown remat policy {name!r} (use 'full', 'dots' or 'small')")


def ckpt_tag(x, tag: str, active: bool):
    """``jax.ad_checkpoint.checkpoint_name`` gated to the training path.

    Under the 'small' remat policy the named values are the ONLY saved
    residuals.  ``active`` is ``not deterministic`` at every call site:
    inference programs never see the name primitive, keeping the decode
    engine's compiled programs unchanged (PERF rule: decode-path changes
    need a same-session bench A/B — this avoids one)."""
    if not active:
        return x
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, tag)


ACT2FN = {"gelu": gelu, "relu": jax.nn.relu, "swish": jax.nn.silu}


def layer_norm(eps: float = 1e-12, dtype=jnp.float32, name: Optional[str] = None):
    # param_dtype float32 for stable statistics; cast back to activation dtype.
    return nn.LayerNorm(epsilon=eps, dtype=dtype, param_dtype=jnp.float32, name=name)


class PDense(nn.Module):
    """``nn.Dense`` twin with setup-declared params.

    Identical param tree ({name: {kernel, bias}}), shapes, initializers and
    dtype-promotion rules as :func:`dense`, but the parameters are created in
    ``setup`` so a parent module can read ``.kernel`` / ``.bias`` and hand
    them to a fused pallas kernel without invoking the matmul.
    """

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32)
        if self.use_bias:
            self.bias = self.param(
                "bias", nn.initializers.zeros,
                (self.features,), jnp.float32)

    def __call__(self, x):
        y = jax.lax.dot_general(
            x.astype(self.dtype), self.kernel.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            precision=prec_for(self.dtype))
        if self.use_bias:
            y = y + self.bias.astype(self.dtype)
        return y


class PLayerNorm(nn.Module):
    """``nn.LayerNorm`` twin with setup-declared params (scale/bias), f32
    statistics, TF-style eps inside the sqrt."""

    dim: int
    eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.dim,), jnp.float32)
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.dim,), jnp.float32)

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = jnp.square(xf - mean).mean(axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * self.scale + self.bias).astype(self.dtype)


def additive_mask(binary_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, L] {0,1} -> [B, 1, 1, L] additive mask with -10000 at masked slots.

    Mirrors reference vilbert_dialog.py:1352-1364.
    """
    m = binary_mask[:, None, None, :].astype(jnp.float32)
    return ((1.0 - m) * MASK_VALUE).astype(dtype)


def causal_additive_mask(
    binary_mask: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    """[B, L] padding mask -> [B, 1, L, L] causal+padding additive mask.

    Mirrors HF get_extended_attention_mask for decoders (used by the
    reference's BertGenerationEncoder, ``models/visual_dialog_decoder.py:274``).
    """
    b, l = binary_mask.shape
    seq = jnp.arange(l)
    causal = (seq[None, :] <= seq[:, None]).astype(jnp.float32)  # [L, L]
    m = causal[None, :, :] * binary_mask[:, None, :].astype(jnp.float32)
    return ((1.0 - m) * MASK_VALUE)[:, None, :, :].astype(dtype)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, L, H*Dh] -> [B, H, L, Dh]."""
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, L, Dh] -> [B, L, H*Dh]."""
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


def attend(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    *,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng=None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Scaled dot-product attention over [B, H, L, Dh] tensors.

    Logits and softmax run in float32 (TPU numerics), output is cast back
    to ``dtype``.  ``mask`` is an additive mask broadcastable to
    [B, H, Lq, Lk].
    """
    from gstx.kernels import attention as _pk

    fused = _pk.maybe_fused_attention(
        q, k, v, mask, dropout_rate=dropout_rate,
        deterministic=deterministic, dtype=dtype)
    if fused is not None:
        return fused

    dh = q.shape[-1]
    prec = prec_for(dtype)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k,
        preferred_element_type=jnp.float32, precision=prec,
    )
    scores = scores * (1.0 / jnp.sqrt(dh).astype(jnp.float32))
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(dtype),
                     preferred_element_type=jnp.float32,
                     precision=prec).astype(dtype)
    # under remat_policy='small' the context is saved while scores/probs
    # above are recomputed in the backward
    return ckpt_tag(out, "gstx_ctx", not deterministic)


class SelfAttention(nn.Module):
    """Fused-QKV self-attention + output projection + residual LayerNorm.

    Equivalent to reference BertAttention (vilbert_dialog.py:422-431):
    ``LayerNorm(dense(attn(x)) + x)``.
    """

    num_heads: int
    head_dim: int
    attn_dropout: float = 0.1
    hidden_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        from gstx.kernels import ffn as _pf

        d_model = x.shape[-1]
        inner = self.num_heads * self.head_dim
        qkv = ckpt_tag(dense(3 * inner, self.dtype, "qkv")(x),
                       "gstx_proj", not deterministic)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = split_heads(q, self.num_heads)
        k = split_heads(k, self.num_heads)
        v = split_heads(v, self.num_heads)
        rng = None if deterministic else self.make_rng("dropout")
        ctx = attend(
            q, k, v, mask,
            dropout_rate=self.attn_dropout,
            deterministic=deterministic,
            dropout_rng=rng,
            dtype=self.dtype,
        )
        ctx = merge_heads(ctx)
        proj = PDense(d_model, inner, self.dtype, name="out")
        ln = PLayerNorm(d_model, dtype=self.dtype, name="out_ln")
        fused = _pf.maybe_fused_dense_ln(
            ctx, proj.kernel, proj.bias, x, ln.scale, ln.bias,
            eps=ln.eps, dropout_rate=self.hidden_dropout,
            deterministic=deterministic, dtype=self.dtype)
        if fused is not None:
            return fused
        out = proj(ctx)
        out = nn.Dropout(self.hidden_dropout)(out, deterministic=deterministic)
        return ckpt_tag(ln(out + x), "gstx_block", not deterministic)


class FeedForward(nn.Module):
    """BertIntermediate + BertOutput (vilbert_dialog.py:434-462):
    ``LayerNorm(dense2(act(dense1(x))) + x)``."""

    intermediate_size: int
    activation: str = "gelu"
    hidden_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from gstx.kernels import ffn as _pf

        d_model = x.shape[-1]
        d1 = PDense(self.intermediate_size, d_model, self.dtype,
                    name="intermediate")
        d2 = PDense(d_model, self.intermediate_size, self.dtype,
                    name="output")
        ln = PLayerNorm(d_model, dtype=self.dtype, name="output_ln")
        if self.activation == "gelu":
            fused = _pf.maybe_fused_ffn(
                x, d1.kernel, d1.bias, d2.kernel, d2.bias,
                ln.scale, ln.bias, eps=ln.eps,
                dropout_rate=self.hidden_dropout,
                deterministic=deterministic, dtype=self.dtype)
            if fused is not None:
                return fused
        # d1's output and the activation (the [B,S,4H] FFN hidden) carry NO
        # tag: under 'small' they are recomputed in the backward
        h = ACT2FN[self.activation](d1(x))
        h = d2(h)
        h = nn.Dropout(self.hidden_dropout)(h, deterministic=deterministic)
        return ckpt_tag(ln(h + x), "gstx_block", not deterministic)


class TransformerLayer(nn.Module):
    """One post-LN BERT layer (text or visual stream),
    reference vilbert_dialog.py:465-476 / :592-603."""

    num_heads: int
    head_dim: int
    intermediate_size: int
    activation: str = "gelu"
    attn_dropout: float = 0.1
    hidden_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        x = SelfAttention(
            num_heads=self.num_heads,
            head_dim=self.head_dim,
            attn_dropout=self.attn_dropout,
            hidden_dropout=self.hidden_dropout,
            dtype=self.dtype,
            name="attention",
        )(x, mask, deterministic=deterministic)
        x = FeedForward(
            intermediate_size=self.intermediate_size,
            activation=self.activation,
            hidden_dropout=self.hidden_dropout,
            dtype=self.dtype,
            name="ffn",
        )(x, deterministic=deterministic)
        return x
