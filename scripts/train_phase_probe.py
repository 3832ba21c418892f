"""Training-step roofline probe (PERF.md round 5, VERDICT r4 #2).

Phase-breaks the production train step (batch 72, bf16, per-layer remat)
into measurable sub-programs on the real chip and computes MFU:

  fwd        — teacher-forced loss forward on pre-sampled rows (remat on;
               remat does not change forward cost, only what is saved)
  grad       — value_and_grad of the same (fwd + remat recompute + bwd)
  step_rows  — grad + AdamW update on pre-sampled rows
  step_full  — the shipping make_train_step (adds in-jit row sampling)

Derived: optimizer = step_rows - grad; row sampling = step_full -
step_rows; bwd+recompute = grad - fwd.  With per-layer 'full' remat the
backward re-runs each layer forward once, so recompute ~= fwd and
bwd-proper ~= grad - 2*fwd (analytic split, stated as such in PERF.md).

MFU: model FLOPs = 3x the forward's compiled flop count (XLA
cost_analysis on the fwd-only program — no remat recompute in it), over
the measured full-step time and the v5e-1 peak (197 TF/s bf16).

Honest tunnel timing: each phase chains N calls through a data
dependency and fetches the final scalar (block_until_ready returns
before remote completion here).
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import optax

from gstx.core.config import DecoderConfig, EncoderConfig
from gstx.models.encdec import GSTVisualDialog, teacher_forced_loss
from gstx.train.optim import make_optimizer
from gstx.train.train_gen import make_train_step, select_rows

BATCH = 72
B_IMG, ROUNDS = 8, 10
S, R, T = 256, 37, 25
PEAK_TFLOPS = 197.0  # v5e bf16

REMAT = os.environ.get("PROBE_REMAT", "1") == "1"
enc_cfg, dec_cfg = EncoderConfig(), DecoderConfig()
model = GSTVisualDialog(enc_cfg, dec_cfg, dtype=jnp.bfloat16, remat=REMAT)
print(f"devices={jax.devices()} remat={REMAT}", flush=True)

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
rows = select_rows(batch, jnp.asarray(
    rng_np.randint(0, B_IMG * ROUNDS, size=(BATCH,)), jnp.int32))


def loss_fn(params, rows, rng):
    logits = model.apply(
        params,
        rows["enc_input_ids"], rows["enc_image_feat"],
        rows["enc_image_loc"], rows["enc_segments"],
        rows["enc_att_mask"], rows["enc_image_mask"],
        rows["dec_input_ids"], rows["dec_att_mask"],
        deterministic=False, rngs={"dropout": rng},
        method=GSTVisualDialog.score)
    return teacher_forced_loss(logits, rows["dec_labels"])


@jax.jit
def fwd(params, rows, rng, salt):
    # data dep through salt so chained calls cannot overlap-degenerate
    rng = jax.random.fold_in(rng, (salt * 1e6).astype(jnp.int32))
    return loss_fn(params, rows, rng)


@jax.jit
def grad(params, rows, rng, salt):
    rng = jax.random.fold_in(rng, (salt * 1e6).astype(jnp.int32))
    loss, g = jax.value_and_grad(loss_fn)(params, rows, rng)
    # collapse grads to a scalar dep so the chain forces the whole bwd
    # (*1e-20, NOT *0 — a zero multiply constant-folds and DCEs the bwd)
    return loss + sum(jnp.sum(x).astype(jnp.float32) * 1e-20
                      for x in jax.tree_util.tree_leaves(g))


@functools.partial(jax.jit, donate_argnums=(0, 1))
def step_rows(params, opt_state, rows, rng, salt):
    # donated like the shipping step, so step_full - step_rows isolates the
    # in-jit row sampling (a non-donated variant measured 471 ms vs the
    # donated shipping step's 435 — donation is worth ~36 ms by itself)
    rng = jax.random.fold_in(rng, (salt * 1e6).astype(jnp.int32))
    loss, g = jax.value_and_grad(loss_fn)(params, rows, rng)
    updates, opt_state = optimizer.update(g, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


step_full = make_train_step(model, optimizer, batch_size=BATCH)


def timeit(name, run_once, n=12):
    # run_once(salt) -> scalar-ish fetchable carrying the program's output
    t0 = time.time()
    out = run_once(jnp.float32(0.0))
    np.asarray(out)
    print(f"  {name}: compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    salt = jnp.float32(0.0)
    for _ in range(n):
        salt = run_once(salt)
    val = float(np.asarray(salt))
    wall = time.time() - t0
    print(f"  {name}: {wall/n*1000:7.1f} ms  (n={n}, carry={val:.4f})",
          flush=True)
    return wall / n


key = jax.random.PRNGKey(1)
res = {}
res["fwd"] = timeit("fwd", lambda s: fwd(params, rows, key, s) * 1e-6)

res["grad"] = timeit("grad", lambda s: grad(params, rows, key, s) * 1e-6)

# fresh copies: step_rows donates its inputs, and the originals are still
# needed by cost_analysis and step_full below
state = {"p": jax.tree_util.tree_map(jnp.copy, params),
         "o": jax.tree_util.tree_map(jnp.copy, opt_state)}


def run_step_rows(salt):
    p, o, loss = step_rows(state["p"], state["o"], rows, key, salt)
    state["p"], state["o"] = p, o
    return loss * 1e-6


res["step_rows"] = timeit("step_rows(grad+adamw)", run_step_rows)

# ---- compiled FLOP counts BEFORE step_full donates the params buffer ----
model_tf = None
try:
    ca = jax.jit(fwd).lower(
        params, rows, key, jnp.float32(0.0)).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    model_tf = ca["flops"] / 1e12
    print(f"fwd compiled flops: {model_tf:.2f} TF", flush=True)
except Exception as e:  # cost_analysis can be backend-dependent
    print(f"cost_analysis unavailable: {e!r}", flush=True)

state2 = {"p": params, "o": opt_state, "k": jax.random.PRNGKey(2)}


def run_step_full(salt):
    state2["k"], sk = jax.random.split(state2["k"])
    p, o, m = step_full(state2["p"], state2["o"], batch, sk)
    state2["p"], state2["o"] = p, o
    return m["lm_loss"] * 1e-6 + salt * 0


res["step_full"] = timeit("step_full(shipping)", run_step_full)

print("\n--- phase breakdown (batch 72) ---", flush=True)
f, g, sr, sf = (res["fwd"], res["grad"], res["step_rows"], res["step_full"])
print(f"fwd                {f*1e3:7.1f} ms")
print(f"bwd+recompute      {(g-f)*1e3:7.1f} ms   "
      f"(analytic: recompute~={f*1e3:.0f}, bwd-proper~={(g-2*f)*1e3:.0f})")
print(f"adamw update       {(sr-g)*1e3:7.1f} ms")
print(f"in-jit row sample  {(sf-sr)*1e3:7.1f} ms")
print(f"full step          {sf*1e3:7.1f} ms")
if model_tf:
    mfu = 3 * model_tf / sf / PEAK_TFLOPS
    hw = 4 * model_tf / sf / PEAK_TFLOPS
    print(f"MFU (model 3x-fwd basis) {mfu*100:.1f}%   "
          f"(hardware ~4x-fwd basis {hw*100:.1f}%)")
