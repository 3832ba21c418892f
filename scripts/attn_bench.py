"""Microbenchmark: attention variants at the production encoder shapes.

Compares, at [B=96, H=12, S, dh=64] bf16 with a padding mask:
  * the model's jnp path (f32 scores + softmax, reference numerics)
  * gstx.kernels.attention.fused_attention (whole-block pallas)
  * upstream jax.experimental.pallas.ops.tpu.flash_attention (segment-id mask)

Timing follows CLAUDE.md tunnel rules: amortize N iterations inside one jit
with a real data dependency, fetch the result to host, subtract the null
dispatch.  Run on the real chip: `python scripts/attn_bench.py`.
"""
import os
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gstx.models.layers import attend, additive_mask  # noqa: E402
from gstx.kernels.attention import fused_attention, fused_attention_batch  # noqa: E402
from jax.experimental.pallas.ops.tpu import flash_attention as fa  # noqa: E402
from _bench_util import chain, null_dispatch, timed  # noqa: E402

B, H, DH = 96, 12, 64
N = 50  # amortized iterations inside one jit


def main():
    print(f"devices={jax.devices()}")
    tn = null_dispatch()
    print(f"null dispatch {tn*1e3:.1f} ms")

    rng = np.random.RandomState(0)
    for S in (256, 192, 128):
        q = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16)
        # padding mask: row i keeps S - (i % 32) tokens
        lens = np.full((B,), S) - (np.arange(B) % 32)
        binm = (np.arange(S)[None, :] < lens[:, None]).astype(np.int32)
        amask = additive_mask(jnp.asarray(binm), jnp.float32)
        segs = jnp.asarray(1 - binm, jnp.int32)  # pad positions get seg 1
        seg_ids = fa.SegmentIds(q=segs, kv=segs)

        variants = {
            "jnp attend": lambda q, k, v: attend(
                q, k, v, amask, dtype=jnp.bfloat16),
            "pallas whole-block": lambda q, k, v: fused_attention(
                q, k, v, amask),
            "pallas batch-grid": lambda q, k, v: fused_attention_batch(
                q, k, v, amask),
            "flash (segids)": lambda q, k, v: fa.flash_attention(
                q, k, v, segment_ids=seg_ids, sm_scale=1.0 / DH ** 0.5,
                block_sizes=fa.BlockSizes(
                    block_q=min(S, 256), block_k_major=min(S, 256),
                    block_k=min(S, 256), block_b=1)),
        }
        for name, op in variants.items():
            try:
                f = chain(op, N)
                t = (timed(f, q, k, v) - tn) / N
                flops = 4 * B * H * S * S * DH
                print(f"S={S} {name:20s} {t*1e6:8.0f} us  "
                      f"{flops/t/1e12:6.1f} TF/s")
            except Exception as e:
                print(f"S={S} {name:20s} FAILED: {type(e).__name__}: {e}")

    # correctness spot-check at S=256 (valid rows only)
    S = 256
    q = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, DH), jnp.bfloat16)
    lens = np.full((B,), S) - (np.arange(B) % 32)
    binm = (np.arange(S)[None, :] < lens[:, None]).astype(np.int32)
    amask = additive_mask(jnp.asarray(binm), jnp.float32)
    segs = jnp.asarray(1 - binm, jnp.int32)
    ref = np.asarray(attend(q, k, v, amask, dtype=jnp.bfloat16), np.float32)
    fl = np.asarray(fa.flash_attention(
        q, k, v, segment_ids=fa.SegmentIds(q=segs, kv=segs),
        sm_scale=1.0 / DH ** 0.5), np.float32)
    valid = binm[:, None, :, None].astype(bool)
    valid = np.broadcast_to(valid, ref.shape)
    err = np.abs(ref - fl)[valid].max()
    print(f"flash vs jnp max abs err (valid rows): {err:.4f}")


if __name__ == "__main__":
    main()
