"""Probe: does int8 dot_general actually run ~2x bf16 on this v5e chip at
the encoder's FFN shape?  Decides whether an opt-in int8-encoder variant
has any physical headroom before engineering it.  Timing per CLAUDE.md:
amortize inside one jit via lax.scan with a real data dependency, fetch
results (tunnel block_until_ready returns early)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

M, K, N = 24576, 768, 3072   # text-stream FFN d1 at batch 96 x seq 256
ITERS = 50

rng = np.random.RandomState(0)
a_bf = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
w_bf = jnp.asarray(rng.randn(K, N), jnp.bfloat16)
a_i8 = jnp.asarray(rng.randint(-127, 127, (M, K)), jnp.int8)
w_i8 = jnp.asarray(rng.randint(-127, 127, (K, N)), jnp.int8)


@jax.jit
def run_bf16(a, w):
    def body(acc, _):
        y = a @ w
        return acc + y[0, 0].astype(jnp.float32) * 1e-6, None
    return jax.lax.scan(body, jnp.float32(0), None, length=ITERS)[0]


@jax.jit
def run_int8(a, w):
    def body(acc, _):
        y = jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return acc + y[0, 0].astype(jnp.float32) * 1e-6, None
    return jax.lax.scan(body, jnp.float32(0), None, length=ITERS)[0]


def timeit(f, *args):
    np.asarray(f(*args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(f(*args))
    dt = (time.perf_counter() - t0) / ITERS
    tf = 2 * M * K * N / dt / 1e12
    return dt * 1e3, tf


print("devices:", jax.devices())
ms, tf = timeit(run_bf16, a_bf, w_bf)
print(f"bf16  : {ms:.3f} ms/matmul  {tf:.0f} TF/s")
ms8, tf8 = timeit(run_int8, a_i8, w_i8)
print(f"int8  : {ms8:.3f} ms/matmul  {tf8:.0f} TOP/s")
print(f"ratio : {ms / ms8:.2f}x")
