"""Pallas TPU fused attention kernels.

The GST encoder's sequences are short (256 text / 37 regions / 293 fused
memory), so a whole (seq_q, seq_k) attention block fits comfortably in VMEM.
XLA's default lowering materializes the [B, H, Lq, Lk] probability tensor in
HBM (~100 MB per text layer at batch 32); these kernels keep scores and
probabilities entirely in VMEM: one grid step per (batch, head), load
Q/K/V tiles, compute f32 scores + softmax + PV on the MXU, write only the
[Lq, dh] output.

Used for the deterministic (eval/generation) paths; training falls back to
the jnp path when attention dropout is active.  Enable with
:func:`enable` or the ``use_pallas`` config flag; everything degrades
gracefully to jnp off-TPU.

Measured on TPU v5e (batch 32, 12 heads, 256 tokens, dh=64, bf16, amortized
inside one jit): XLA's fused lowering runs this op at 0.37 ms; this kernel
at 0.72 ms — the 2x is exactly the dh 64->128 lane-padding FLOP waste, and
XLA's own fusion already avoids the HBM round-trip at these sizes.  The
kernel therefore ships DISABLED by default: it is correct (tested against
the jnp path in interpret mode and on TPU).

Round-2 follow-up (scripts/attn_bench.py, batch 96): upstream
jax.experimental.pallas.ops.tpu.flash_attention with segment-id padding
masks ties XLA at S=256 (1.10 vs 1.05 ms), loses 9x at S=128 (636 vs 71 us
— XLA fully fuses the small case), and cannot tile S=192.  Isolated
single-op attention is therefore left to XLA at these sequence lengths; the
profitable pallas targets at GST shapes are the matmul+epilogue fusions in
gstx/kernels/ffn.py (measured 1.7x on the FFN block).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_ENABLED = False


def enable(flag: bool = True):
    global _ENABLED
    _ENABLED = flag


def is_enabled() -> bool:
    return _ENABLED


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q, k, v, mask=None, interpret: bool = False):
    """softmax(q k^T / sqrt(dh) + mask) v with f32 accumulation in VMEM.

    q: [B, H, Lq, dh], k/v: [B, H, Lk, dh],
    mask: additive, broadcastable to [B, 1 or H, 1 or Lq, Lk] (or None).
    Returns [B, H, Lq, dh] in q.dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, lq, dh = q.shape
    lk = k.shape[2]
    out_dtype = q.dtype

    # pad sequence dims to the f32 tile (8, 128)
    lq_p = _round_up(lq, 8)
    lk_p = _round_up(lk, 128)
    dh_p = _round_up(dh, 128)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_p - lq), (0, dh_p - dh)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_p - lk), (0, dh_p - dh)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_p - lk), (0, dh_p - dh)))

    # normalize mask to [B, H, Lq_p, Lk_p] index semantics with padding
    # keys masked out
    if mask is None:
        mask_full = jnp.zeros((b, 1, 1, lk), jnp.float32)
    else:
        mask_full = mask.astype(jnp.float32)
    mb, mh, mq, mk = mask_full.shape
    assert mb == b, "mask must carry the batch dimension"
    mask_full = jnp.pad(mask_full, ((0, 0), (0, 0), (0, 0),
                                    (0, lk_p - mk)),
                        constant_values=-1e9)
    if mq != 1:
        mask_full = jnp.pad(mask_full, ((0, 0), (0, 0), (0, lq_p - mq),
                                        (0, 0)))
    scale = 1.0 / (dh ** 0.5)

    def kernel(q_ref, k_ref, v_ref, m_ref, o_ref):
        qb = q_ref[0, 0].astype(jnp.float32)       # [Lq_p, dh_p]
        kb = k_ref[0, 0].astype(jnp.float32)       # [Lk_p, dh_p]
        vb = v_ref[0, 0].astype(jnp.float32)
        scores = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = scores + m_ref[0, 0]              # [Lq_p or 1, Lk_p] bcast
        probs = jax.nn.softmax(scores, axis=-1)
        out = jax.lax.dot_general(
            probs, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, 0] = out.astype(o_ref.dtype)

    grid = (b, h)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, lq_p, dh_p), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk_p, dh_p), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk_p, dh_p), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, mask_full.shape[2], lk_p),
                lambda i, j: (i, j if mh != 1 else 0, 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, lq_p, dh_p),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, lq_p, dh_p), out_dtype),
        interpret=interpret,
    )(qp, kp, vp, mask_full)
    return out[:, :, :lq, :dh]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention_batch(q, k, v, mask=None, interpret: bool = False):
    """softmax(q k^T / sqrt(dh) + mask) v, grid over BATCH only.

    The round-1 kernel's (batch, head) grid ran 1152 tiny steps at batch 96
    and re-loaded the mask every step; this variant processes all H heads
    per grid step (static unrolled loop — Mosaic pipelines the per-head
    QK^T / softmax / PV chains) and loads each row's mask once.  Scores and
    probabilities stay in VMEM; f32 softmax (reference numerics).

    q: [B, H, Lq, dh], k/v: [B, H, Lk, dh];
    mask: additive, [B, 1, 1, Lk] or [B, 1, Lq, Lk] (or None).
    Returns [B, H, Lq, dh] in q.dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, lq, dh = q.shape
    lk = k.shape[2]
    out_dtype = q.dtype

    lq_p = _round_up(lq, 8)
    lk_p = _round_up(lk, 128)
    dh_p = _round_up(dh, 128)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_p - lq), (0, dh_p - dh)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_p - lk), (0, dh_p - dh)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_p - lk), (0, dh_p - dh)))

    if mask is None:
        mask_full = jnp.zeros((b, 1, 1, lk), jnp.float32)
    else:
        mask_full = mask.astype(jnp.float32)
    mb, mh, mq, mk = mask_full.shape
    assert mb == b and mh == 1, "mask must be [B, 1, 1 or Lq, Lk]"
    mask_full = jnp.pad(mask_full, ((0, 0), (0, 0), (0, 0), (0, lk_p - mk)),
                        constant_values=-1e9)
    if mq != 1:
        mask_full = jnp.pad(mask_full, ((0, 0), (0, 0), (0, lq_p - mq),
                                        (0, 0)))
    scale = 1.0 / (dh ** 0.5)

    def kernel(q_ref, k_ref, v_ref, m_ref, o_ref):
        m = m_ref[0, 0]                          # [1 or Lq_p, Lk_p] f32
        for i in range(h):
            qb = q_ref[0, i]                     # [Lq_p, dh_p] in q.dtype
            kb = k_ref[0, i]
            vb = v_ref[0, i]
            scores = jax.lax.dot_general(
                qb, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            scores = scores + m
            probs = jax.nn.softmax(scores, axis=-1)
            out = jax.lax.dot_general(
                probs.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, i] = out.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, lq_p, dh_p), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, lk_p, dh_p), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, lk_p, dh_p), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mask_full.shape[2], lk_p),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, lq_p, dh_p), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, lq_p, dh_p), out_dtype),
        interpret=interpret,
    )(qp, kp, vp, mask_full)
    return out[:, :, :lq, :dh]


def maybe_fused_attention(q, k, v, mask, *, dropout_rate: float,
                          deterministic: bool, dtype) -> Optional[jnp.ndarray]:
    """Return the pallas result when eligible, else None (caller falls back
    to the jnp path)."""
    if not _ENABLED:
        return None
    if not deterministic and dropout_rate > 0.0:
        return None
    if not _on_tpu():
        return None
    if q.shape[2] < 8:  # decode steps: too small to benefit
        return None
    if mask is not None and mask.shape[0] != q.shape[0]:
        return None
    return fused_attention(q, k, v, mask).astype(dtype)
