"""Pallas TPU decode-step cross-attention over int8 memory.

The decode loop's cost floor is re-reading the static cross-attention K/V
every step (12 layers x [96, 12, 293, 64] x 2 ~= 1.04 GB bf16 ~= 1.3 ms at
the v5e's HBM roof — PERF.md).  int8 quantization halves those bytes, but
in the engine's while_loop round program XLA HOISTS the loop-invariant
int8->bf16 convert out of the loop, materializing a bf16 copy once per
utterance — decode steps then read bf16 again and the quantization buys
nothing (measured: round-2 dequant -5%, round-3 scale-folded ~0%).

This kernel forces the intended behavior: K/V stream HBM->VMEM at int8
width EVERY step and are widened in-register only.  The grid is blocked
over BATCH ROWS (grid (B/nb,), nb rows per step — a (B,) grid of tiny
blocks measured 0.97 ms/layer, dominated by per-step overhead); the
decode query length is 1, so QK^T and PV are per-row matvecs computed as
VPU multiply-reduce over the streamed block (the MXU has nothing to chew
on at M=1).  Scores/softmax in f32.  Scales are already folded outside
(K scale into q, V scale applied to the output), so the kernel sees plain
int8 operands.

Used by gstx.models.decoder.DecoderLayer._quant_cross_attend for
single-token decode steps on the TPU bf16 path; the jnp path remains the
fallback and the numerical reference (tests run it in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, heads: int):
    mask = m_ref[:, 0, 0, :]                          # [nb, M] additive f32
    for h in range(heads):
        qh = q_ref[:, h, 0, :].astype(jnp.float32)    # [nb, dh]
        kh = k_ref[:, h].astype(jnp.float32)          # [nb, M, dh]
        s = jnp.sum(qh[:, None, :] * kh, axis=-1)     # [nb, M]
        s = s + mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        vh = v_ref[:, h].astype(jnp.float32)          # [nb, M, dh]
        ctx = jnp.sum(p[:, :, None] * vh, axis=1)     # [nb, dh]
        o_ref[:, h, 0, :] = ctx.astype(o_ref.dtype)


def _pick_block(b: int) -> int:
    # scoped VMEM is 16 MB: nb=16 blew it at M=165 (19.5 MB) and nb=8 at
    # M=293 (17.2 MB) — int8 tile padding (dh 64->128 lanes) plus the
    # per-head f32 product intermediates; nb=4 fits every bucket width
    for nb in (4, 3, 2, 1):
        if b % nb == 0:
            return nb
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_decode_attention(q, k_i8, v_i8, mask, *, interpret: bool = False):
    """softmax((q . K^T) + mask) . V with int8 K/V read at int8 width.

    q: [B, H, 1, dh] (K-scale and 1/sqrt(dh) already folded in, bf16/f32)
    k_i8/v_i8: [B, H, M, dh] int8
    mask: [B, 1, 1, M] additive f32 (or None)
    Returns [B, H, 1, dh] f32 (caller applies the V scale).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, _, dh = q.shape
    m = k_i8.shape[2]
    if mask is None:
        mask = jnp.zeros((b, 1, 1, m), jnp.float32)
    mask = jnp.broadcast_to(mask.astype(jnp.float32), (b, 1, 1, m))
    nb = _pick_block(b)

    row = lambda i: (i, 0, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_kernel, heads=h),
        grid=(b // nb,),
        in_specs=[
            pl.BlockSpec((nb, h, 1, dh), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, h, m, dh), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, h, m, dh), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, 1, m), row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, h, 1, dh), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, dh), jnp.float32),
        interpret=interpret,
    )(q, k_i8, v_i8, mask)
    return out


# OFF by default: the kernel does force int8-width HBM reads, but at GST's
# decode shapes (M<=293 matvecs, dh=64) Mosaic's int8 relayout + VPU
# reduce cost far exceeds the bandwidth saving — full-engine A/B measured
# 9,367 vs 12,233 tok/s/chip (-23%; PERF.md round 3).  Kept for future
# hardware/Mosaic generations with native int8 batched-matvec support.
_KERNEL_ENABLED = False


def enable_kernel(flag: bool = True):
    global _KERNEL_ENABLED
    _KERNEL_ENABLED = flag


def maybe_quant_decode_attention(q, k_i8, v_i8, mask):
    """Kernel when eligible (enabled + TPU + single-token query), else
    None (callers fall back to the scale-folded XLA path)."""
    from gstx.kernels import ffn as _ffn

    # tensor_parallel_active(): pallas_call is GSPMD-opaque — under tensor
    # parallelism the 'model'-sharded K/V heads would be all-gathered every
    # decode step, so fall back to the partitionable jnp path (same gate as
    # the fused-FFN kernels, ffn.py::maybe_fused_ffn)
    if not _KERNEL_ENABLED or not _ffn.is_enabled() or not _ffn._on_tpu() \
            or _ffn.tensor_parallel_active():
        return None
    if q.shape[2] != 1:
        return None
    return quant_decode_attention(q, k_i8, v_i8, mask)
