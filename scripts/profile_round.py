"""Phase profile of one dialog round at production batch (default 96).

Phases: decode_prepare (two-stream encoder + fusion + cross-KV precompute),
18-step decode (with/without ngram blocking), teacher-forced ppl pass.
Kernels on/off via -pallas.  `python scripts/profile_round.py [-batch 96]`.
"""
import argparse, os, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

ap = argparse.ArgumentParser()
ap.add_argument("-batch", type=int, default=96)
ap.add_argument("-seq", type=int, default=256)
ap.add_argument("-pallas", type=int, default=1)
args = ap.parse_args()

from gstx.kernels import ffn as pf
pf.enable(bool(args.pallas))
from gstx.core.config import DecoderConfig, EncoderConfig
from gstx.models.encdec import GSTVisualDialog
from gstx.decode.sampler import DecodeSettings, init_cache, sample_sequence

enc_cfg, dec_cfg = EncoderConfig(), DecoderConfig()
model = GSTVisualDialog(enc_cfg, dec_cfg, dtype=jnp.bfloat16)
B, S, R = args.batch, args.seq, 37
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
    # fetch exactly ONE leaf: each host fetch costs a full ~30 ms tunnel
    # round-trip, so fetching every leaf would swamp the measurement; one
    # fetch is an honest completion barrier (results return post-execution)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0] if leaf.ndim else leaf)

def t(fn, *a, n=8):
    tiny_fetch(fn(*a))
    ts=[]
    for _ in range(n):
        t0=time.time(); tiny_fetch(fn(*a)); ts.append(time.time()-t0)
    return min(ts)*1000

null = jax.jit(lambda x: x + 1)
tn = t(null, jnp.zeros((8,8)))
print(f"batch={B} seq={S} pallas={bool(args.pallas)}  null dispatch {tn:.1f} ms", flush=True)

# params/memory passed as ARGUMENTS (closure capture would embed them as
# compile-time constants and blow up compile times through the tunnel)
prep = jax.jit(lambda p, ids: model.apply(p, ids, feat, loc, segs, att, imask,
                                          method=GSTVisualDialog.decode_prepare))
print(f"decode_prepare (enc+fusion+crossKV): {t(prep, params, ids)-tn:.1f} ms", flush=True)

mem_kv, mem_mask = prep(params, ids)
def mk_decode(block):
    @jax.jit
    def f(p, mem_kv, mem_mask, key):
        def step_fn(tok, pos, caches):
            return model.apply(p, tok, pos, caches, mem_kv, mem_mask,
                               method=GSTVisualDialog.decode_step)
        caches = init_cache(dec_cfg, B, 19, jnp.bfloat16)
        st = DecodeSettings(ngram_blocking_size=block)
        src = {} if block == 0 else {"ngram_source": ids}
        return sample_sequence(step_fn, key, B, caches, st, **src)
    return f
print(f"decode 18 steps (ngram 4): {t(mk_decode(4), params, mem_kv, mem_mask, jax.random.PRNGKey(0))-tn:.1f} ms", flush=True)
print(f"decode 18 steps (ngram 0): {t(mk_decode(0), params, mem_kv, mem_mask, jax.random.PRNGKey(0))-tn:.1f} ms", flush=True)

ppl = jax.jit(lambda p, mem_kv, mem_mask, ans: model.apply(
    p, ans, jnp.ones((B,18),jnp.int32), mem_kv, mem_mask,
    method=GSTVisualDialog.decode_logits_cached))
print(f"ppl pass: {t(ppl, params, mem_kv, mem_mask, jnp.ones((B,18),jnp.int32))-tn:.1f} ms", flush=True)
