"""Train-step throughput benchmark (PERF.md): examples/s at the reference
batch size 72, production model, bf16, per-layer remat — the full jitted
SPMD step (row sampling + forward + backward + AdamW).  Honest timing:
chain N steps through the params dependency, fetch the final loss."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gstx.core.config import DecoderConfig, EncoderConfig
from gstx.models.encdec import GSTVisualDialog
from gstx.train.optim import make_optimizer
from gstx.train.train_gen import make_train_step

BATCH = 72           # options.py:60
B_IMG, ROUNDS = 8, 10
S, R, T = 256, 37, 25
REMAT_POLICY = sys.argv[1] if len(sys.argv) > 1 else "full"  # 'full' | 'dots'
enc_cfg, dec_cfg = EncoderConfig(), DecoderConfig()
model = GSTVisualDialog(enc_cfg, dec_cfg, dtype=jnp.bfloat16, remat=True,
                        remat_policy=REMAT_POLICY)
print(f"remat_policy={REMAT_POLICY}", flush=True)
rng_np = np.random.RandomState(0)
init_batch = dict(
    input_ids=jnp.ones((2, S), jnp.int32),
    image_feat=jnp.ones((2, R, 2048)),
    image_loc=jnp.ones((2, R, 5)),
    token_type_ids=jnp.zeros((2, S), jnp.int32),
    attention_mask=jnp.ones((2, S), jnp.int32),
    image_attention_mask=jnp.ones((2, R), jnp.int32),
    dec_input_ids=jnp.ones((2, T), jnp.int32),
    dec_attention_mask=jnp.ones((2, T), jnp.int32))
t0 = time.time()
params = model.init(jax.random.PRNGKey(0), **init_batch,
                    method=GSTVisualDialog.init_all)
print(f"init {time.time()-t0:.1f}s", flush=True)
optimizer = make_optimizer(2e-5, 2e-5, 1500, 100000)
opt_state = optimizer.init(params)
step_fn = make_train_step(model, optimizer, batch_size=BATCH)

batch = {
    "enc_input_ids": jnp.asarray(rng_np.randint(
        1, 20000, size=(B_IMG, ROUNDS, 1, S)), jnp.int32),
    "enc_segments": jnp.zeros((B_IMG, ROUNDS, 1, S), jnp.int32),
    "enc_sep_indices": jnp.zeros((B_IMG, ROUNDS, 1, 25), jnp.int32),
    "enc_mlm_labels": jnp.full((B_IMG, ROUNDS, 1, S), -1, jnp.int32),
    "enc_att_mask": jnp.ones((B_IMG, ROUNDS, 1, S), jnp.float32),
    "dec_input_ids": jnp.asarray(rng_np.randint(
        1, 20000, size=(B_IMG, ROUNDS, 1, T)), jnp.int32),
    "dec_att_mask": jnp.ones((B_IMG, ROUNDS, 1, T), jnp.float32),
    "dec_labels": jnp.asarray(rng_np.randint(
        0, 20000, size=(B_IMG, ROUNDS, 1, T)), jnp.int32),
    "enc_image_feat": jnp.asarray(rng_np.rand(B_IMG, R, 2048), jnp.bfloat16),
    "enc_image_loc": jnp.asarray(rng_np.rand(B_IMG, R, 5), jnp.bfloat16),
    "enc_image_mask": jnp.ones((B_IMG, R), jnp.float32),
}

key = jax.random.PRNGKey(1)
t0 = time.time()
params2, opt2, m = step_fn(params, opt_state, batch, key)
print(f"loss={float(m['lm_loss']):.4f} compile+first step "
      f"{time.time()-t0:.1f}s", flush=True)

N = 20
t0 = time.time()
p, o = params2, opt2
for i in range(N):
    key, sk = jax.random.split(key)
    p, o, m = step_fn(p, o, batch, sk)
loss = float(m["lm_loss"])  # forces the whole chain
wall = time.time() - t0
print(f"steady: {wall/N*1000:.1f} ms/step  "
      f"{BATCH*N/wall:.1f} examples/s  {N/wall:.2f} steps/s  "
      f"loss={loss:.4f}", flush=True)
