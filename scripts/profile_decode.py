"""Dissect the ~3.3 ms/step decode cost (scripts/profile_round.py) into:
decoder-stack step, LM head, top-k/p + sampling, ngram blocking, and loop
mechanics (while_loop vs scan).  `python scripts/profile_decode.py`."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gstx.core.config import DecoderConfig, EncoderConfig
from gstx.models.encdec import GSTVisualDialog
from gstx.decode.sampler import DecodeSettings, init_cache, sample_sequence
from gstx.ops.sampling import ngram_block, sample_token, top_k_top_p_filter

enc_cfg, dec_cfg = EncoderConfig(), DecoderConfig()
model = GSTVisualDialog(enc_cfg, dec_cfg, dtype=jnp.bfloat16)
B, S, R, V = 96, 256, 37, 30522
rng_np = np.random.RandomState(0)
init_batch = dict(
    input_ids=jnp.ones((B,S),jnp.int32), image_feat=jnp.ones((B,R,2048),jnp.bfloat16),
    image_loc=jnp.ones((B,R,5),jnp.bfloat16), token_type_ids=jnp.zeros((B,S),jnp.int32),
    attention_mask=jnp.ones((B,S),jnp.int32), image_attention_mask=jnp.ones((B,R),jnp.int32),
    dec_input_ids=jnp.ones((B,25),jnp.int32), dec_attention_mask=jnp.ones((B,25),jnp.int32))
params = model.init(jax.random.PRNGKey(0), **init_batch, method=GSTVisualDialog.init_all)
ids = jnp.asarray(rng_np.randint(1,20000,size=(B,S)), jnp.int32)
prep = jax.jit(lambda p, i: model.apply(
    p, i, jnp.asarray(rng_np.rand(B,R,2048), jnp.bfloat16),
    jnp.asarray(rng_np.rand(B,R,5), jnp.bfloat16),
    jnp.zeros((B,S),jnp.int32), jnp.ones((B,S),jnp.int32),
    jnp.ones((B,R),jnp.float32), method=GSTVisualDialog.decode_prepare))
mem_kv, mem_mask = prep(params, ids)
logits0 = jnp.asarray(rng_np.randn(B, V), jnp.float32)

def fetch1(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0] if leaf.ndim else leaf)

def t(fn, *a, n=6):
    fetch1(fn(*a))
    ts = []
    for _ in range(n):
        t0=time.time(); fetch1(fn(*a)); ts.append(time.time()-t0)
    return min(ts)*1000

null = jax.jit(lambda x: x + 1)
tn = t(null, jnp.zeros((8,8)))
print(f"null {tn:.1f} ms", flush=True)
N = 18  # steps per chain, comparable to one decode

@jax.jit
def dec_steps_only(p, mem_kv, mem_mask, key):
    caches = init_cache(dec_cfg, B, 19, jnp.bfloat16)
    def body(carry, step):
        tok, caches = carry
        logits, caches = model.apply(p, tok, step, caches, mem_kv, mem_mask,
                                     method=GSTVisualDialog.decode_step)
        tok = jnp.argmax(logits[:, :128], -1).astype(jnp.int32)[:, None]
        return (tok, caches), ()
    (tok, _), _ = jax.lax.scan(body, (jnp.ones((B,1),jnp.int32), caches),
                               jnp.arange(N))
    return tok
print(f"scan {N}x [dec step + argmax]: {t(dec_steps_only, params, mem_kv, mem_mask, jax.random.PRNGKey(0))-tn:.1f} ms", flush=True)

@jax.jit
def sampling_only(key, logits0):
    def body(carry, _):
        key, lg = carry
        lg2 = top_k_top_p_filter(lg / 0.7, 7, 0.0)
        key, sub = jax.random.split(key)
        tok = sample_token(sub, lg2).astype(jnp.int32)
        return (key, logits0 + tok[:, None] * 1e-6), ()
    (key, lg), _ = jax.lax.scan(body, (key, logits0), None, length=N)
    return lg
print(f"scan {N}x [topk7 filter + categorical]: {t(sampling_only, jax.random.PRNGKey(0), logits0)-tn:.1f} ms", flush=True)

@jax.jit
def ngram_only(logits0):
    toks = jnp.ones((B, 19), jnp.int32)
    def body(carry, step):
        lg = ngram_block(carry, ids, toks, step + 1, 4)
        return logits0 + lg[:, :1] * 1e-6, ()
    out, _ = jax.lax.scan(body, logits0, jnp.arange(N))
    return out
print(f"scan {N}x [ngram_block 4]: {t(ngram_only, logits0)-tn:.1f} ms", flush=True)

# full sampler: while_loop (production) vs no-early-exit scan equivalence
def mk_full():
    @jax.jit
    def f(p, mem_kv, mem_mask, key):
        def step_fn(tok, pos, caches):
            return model.apply(p, tok, pos, caches, mem_kv, mem_mask,
                               method=GSTVisualDialog.decode_step)
        caches = init_cache(dec_cfg, B, 19, jnp.bfloat16)
        return sample_sequence(step_fn, key, B, caches,
                               DecodeSettings(ngram_blocking_size=4),
                               ngram_source=ids)
    return f
print(f"full sampler (while_loop, ngram4): {t(mk_full(), params, mem_kv, mem_mask, jax.random.PRNGKey(0))-tn:.1f} ms", flush=True)

# --- experiment: params pre-cast to bf16 (is the in-loop f32->bf16 weight
# cast hoisted by XLA?)  LN params in bf16 shift numerics slightly; this is
# a timing probe only.
params_bf16 = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params)
print(f"scan {N}x [dec step + argmax] PRE-CAST params: "
      f"{t(dec_steps_only, params_bf16, mem_kv, mem_mask, jax.random.PRNGKey(0))-tn:.1f} ms", flush=True)

# --- prep sub-phases
enc_only = jax.jit(lambda p, i: model.apply(
    p, i, jnp.asarray(rng_np.rand(B,R,2048), jnp.bfloat16),
    jnp.asarray(rng_np.rand(B,R,5), jnp.bfloat16),
    jnp.zeros((B,S),jnp.int32), jnp.ones((B,S),jnp.int32),
    jnp.ones((B,R),jnp.float32), True, method=GSTVisualDialog.encode))
print(f"encode only: {t(enc_only, params, ids)-tn:.1f} ms", flush=True)
print(f"encode only PRE-CAST params: {t(enc_only, params_bf16, ids)-tn:.1f} ms", flush=True)
print(f"decode_prepare: {t(prep, params, ids)-tn:.1f} ms", flush=True)
print(f"decode_prepare PRE-CAST params: {t(prep, params_bf16, ids)-tn:.1f} ms", flush=True)
