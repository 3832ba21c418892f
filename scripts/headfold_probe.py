"""Probe VERDICT r2 #5b: fold split/merge-head reshapes into the QKV / out
projections (einsum emits [B,h,L,dh] directly) vs the current
dense+split/merge path.  Same compute layout for attention either way."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

B, L, D, H = 96, 256, 768, 12
dh = D // H
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, L, D) * 0.5, jnp.bfloat16)
wqkv = jnp.asarray(rng.randn(D, 3 * D) * 0.02, jnp.bfloat16)
bqkv = jnp.asarray(rng.randn(3 * D) * 0.02, jnp.bfloat16)
wo = jnp.asarray(rng.randn(D, D) * 0.02, jnp.bfloat16)
bo = jnp.asarray(rng.randn(D) * 0.02, jnp.bfloat16)
mask = jnp.zeros((B, 1, 1, L), jnp.float32)

def attend(q, k, v):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * (1.0 / np.sqrt(dh)) + mask
    p = jax.nn.softmax(s, -1).astype(jnp.bfloat16)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

def split(t):
    b, l, d = t.shape
    return t.reshape(b, l, H, dh).transpose(0, 2, 1, 3)

def block_current(x):
    qkv = x @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, -1)
    ctx = attend(split(q), split(k), split(v))
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, D)
    return ctx @ wo + bo

wqkv_f = wqkv.reshape(D, 3, H, dh)
bqkv_f = bqkv.reshape(3, 1, H, 1, dh)
wo_f = wo.reshape(H, dh, D)

def block_folded(x):
    qkv = jnp.einsum("bld,dthk->tbhlk", x, wqkv_f) + bqkv_f
    ctx = attend(qkv[0], qkv[1], qkv[2])
    return jnp.einsum("bhlk,hkd->bld", ctx, wo_f) + bo

def chain(f):
    def run(x):
        acc = x
        for i in range(30):
            o = f(acc)
            acc = (x + o * 1e-6).astype(jnp.bfloat16)
        return acc
    return jax.jit(run)

print("devices", jax.devices())
for name, f in (("current", block_current), ("folded", block_folded)):
    cj = chain(f)
    r = np.asarray(cj(x))
    t0 = time.time(); r = np.asarray(cj(x)); dt = (time.time() - t0) / 30
    print(f"{name}: {dt*1e3:.2f} ms/block")
# numerics check
a = np.asarray(block_current(x).astype(jnp.float32))
b = np.asarray(block_folded(x).astype(jnp.float32))
print("max abs diff", np.abs(a - b).max())
