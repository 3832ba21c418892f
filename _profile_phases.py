import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from gstx.core.config import DecoderConfig, EncoderConfig
from gstx.models.encdec import GSTVisualDialog
from gstx.decode.sampler import DecodeSettings, init_cache, sample_sequence

enc_cfg, dec_cfg = EncoderConfig(), DecoderConfig()
model = GSTVisualDialog(enc_cfg, dec_cfg, dtype=jnp.bfloat16)
B,S,R = 32,256,37
rng_np = np.random.RandomState(0)
init_batch = dict(
    input_ids=jnp.ones((B,S),jnp.int32), image_feat=jnp.ones((B,R,2048),jnp.bfloat16),
    image_loc=jnp.ones((B,R,5),jnp.bfloat16), token_type_ids=jnp.zeros((B,S),jnp.int32),
    attention_mask=jnp.ones((B,S),jnp.int32), image_attention_mask=jnp.ones((B,R),jnp.int32),
    dec_input_ids=jnp.ones((B,25),jnp.int32), dec_attention_mask=jnp.ones((B,25),jnp.int32))
params = model.init(jax.random.PRNGKey(0), **init_batch, method=GSTVisualDialog.init_all)
ids = jnp.asarray(rng_np.randint(1,20000,size=(B,S)), jnp.int32)
att = jnp.ones((B,S),jnp.int32); segs = jnp.zeros((B,S),jnp.int32)
feat = jnp.asarray(rng_np.rand(B,R,2048), jnp.bfloat16)
loc = jnp.asarray(rng_np.rand(B,R,5), jnp.bfloat16)
imask = jnp.ones((B,R), jnp.float32)

def tiny_fetch(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, 'shape'):
            np.asarray(leaf.ravel()[0] if leaf.ndim else leaf)

def t(fn, *args, n=8):
    tiny_fetch(fn(*args))
    ts=[]
    for _ in range(n):
        t0=time.time(); tiny_fetch(fn(*args)); ts.append(time.time()-t0)
    return min(ts)*1000

null = jax.jit(lambda x: x + 1)
print(f"null dispatch: {t(null, jnp.zeros((8,8))):.1f} ms", flush=True)

prep = jax.jit(lambda ids: model.apply(params, ids, feat, loc, segs, att, imask, method=GSTVisualDialog.decode_prepare))
print(f"decode_prepare: {t(prep, ids):.1f} ms", flush=True)

mem_kv, mem_mask = prep(ids)
@jax.jit
def decode18(key):
    def step_fn(tok, pos, caches):
        return model.apply(params, tok, pos, caches, mem_kv, mem_mask, method=GSTVisualDialog.decode_step)
    caches = init_cache(dec_cfg, B, 19, jnp.bfloat16)
    return sample_sequence(step_fn, key, B, caches, DecodeSettings(), ngram_source=ids)
print(f"decode 18 steps (ngram on): {t(decode18, jax.random.PRNGKey(0)):.1f} ms", flush=True)

@jax.jit
def decode18n(key):
    def step_fn(tok, pos, caches):
        return model.apply(params, tok, pos, caches, mem_kv, mem_mask, method=GSTVisualDialog.decode_step)
    caches = init_cache(dec_cfg, B, 19, jnp.bfloat16)
    return sample_sequence(step_fn, key, B, caches, DecodeSettings(ngram_blocking_size=0))
print(f"decode 18 steps (ngram off): {t(decode18n, jax.random.PRNGKey(0)):.1f} ms", flush=True)

ppl = jax.jit(lambda ans: model.apply(params, ans, jnp.ones((B,18),jnp.int32), mem_kv, mem_mask, method=GSTVisualDialog.decode_logits_cached))
print(f"ppl pass: {t(ppl, jnp.ones((B,18),jnp.int32)):.1f} ms", flush=True)
