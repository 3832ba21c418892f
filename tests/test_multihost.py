"""Two-process jax.distributed test of the multi-host path (VERDICT
round-1 item #5).

Spawns TWO subprocesses with a local coordinator (gloo CPU collectives,
2 local devices each -> 4 global).  Each process runs the REAL multi-host
code in gstx.core.mesh: init_distributed -> process_shard (its stripe of
the global batch) -> make_global_batch (jax.make_array_from_process_local_
data over the data axis) -> ONE full train_gen step.  Both processes must
report the SAME loss, and it must equal the single-process value on the
identically-assembled global batch — the classic
make_array_from_process_local_data shape/order bugs all fail this.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_ROOT = os.path.dirname(TESTS_DIR)

# The child driver: runs the real gstx multi-host path in a fresh process.
CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_compilation_cache_dir", {cache!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gstx.core.mesh import (init_distributed, make_mesh, make_global_batch,
                            process_shard, shard_by_path)
init_distributed(coordinator_address={coord!r}, num_processes=2,
                 process_id=int(sys.argv[1]))
assert jax.process_count() == 2
assert jax.device_count() == 4

import numpy as np
from fixtures import (init_tiny_params, make_train_rows_batch,
                      tiny_enc_dec_configs)
from gstx.models.encdec import GSTVisualDialog
from gstx.train.optim import make_optimizer
from gstx.train.train_gen import make_train_step

enc_cfg, dec_cfg = tiny_enc_dec_configs()
global_batch = make_train_rows_batch(enc_cfg, b=4)
stripe = process_shard(4)            # this host's rows of the global batch
local = {{k: v[stripe] for k, v in global_batch.items()}}

mesh = make_mesh({dp}, {mp})
model = GSTVisualDialog(enc_cfg, dec_cfg, mesh=mesh)
params = shard_by_path(mesh, init_tiny_params(enc_cfg, dec_cfg))
optimizer = make_optimizer(1e-4, 1e-4, 10, 1000)
opt_state = shard_by_path(mesh, optimizer.init(params))
step_fn = make_train_step(model, optimizer, batch_size=4)
dev_batch = make_global_batch(mesh, local)
with mesh:
    _, _, metrics = step_fn(params, opt_state, dev_batch,
                            jax.random.PRNGKey(42))
    loss = float(metrics["lm_loss"])
print(f"MULTIHOST_LOSS {{loss:.10f}}", flush=True)
"""


# Child for the multi-host checkpoint round-trip: both processes call
# save_checkpoint on the SAME shared-filesystem path (orbax writes each
# process's shards collectively; the tmp-swap runs on process 0 only behind
# barriers), then both restore and compare against the deterministic init.
CHILD_CKPT = r"""
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_compilation_cache_dir", {cache!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gstx.core.mesh import init_distributed, make_mesh, shard_by_path
init_distributed(coordinator_address={coord!r}, num_processes=2,
                 process_id=int(sys.argv[1]))
assert jax.process_count() == 2

import numpy as np
from fixtures import init_tiny_params, tiny_enc_dec_configs
from gstx.core.checkpoint import restore_checkpoint, save_checkpoint

enc_cfg, dec_cfg = tiny_enc_dec_configs()
mesh = make_mesh(2, 2)
# TP-sharded leaves span only host-local devices, but data-axis
# replication makes every leaf span BOTH processes -> the collective
# orbax path is genuinely exercised
params = shard_by_path(mesh, init_tiny_params(enc_cfg, dec_cfg))
save_checkpoint({ckpt!r}, params, step=7)
restored = restore_checkpoint({ckpt!r})
assert int(restored["step"]) == 7
import jax.tree_util as jtu
ref_leaves = jtu.tree_leaves(init_tiny_params(enc_cfg, dec_cfg))
got_leaves = jtu.tree_leaves(restored["params"])
assert len(ref_leaves) == len(got_leaves)
for a, b in zip(ref_leaves, got_leaves):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
print("CKPT_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_checkpoint_save_restore(tmp_path):
    """Both processes of a jax.distributed run save ONE checkpoint of
    (2 data x 2 model)-sharded params to a shared path and restore it
    bit-exact — the every-process tmp-swap race this replaces corrupted
    exactly this flow."""
    coord = f"localhost:{_free_port()}"
    ckpt = str(tmp_path / "shared" / "model_7.ckpt")
    os.makedirs(os.path.dirname(ckpt))
    script = tmp_path / "child_ckpt.py"
    script.write_text(CHILD_CKPT.format(
        repo=REPO_ROOT, tests=TESTS_DIR, coord=coord,
        cache=str(tmp_path / "jax_cache"), ckpt=ckpt))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("GLOO_SOCKET_IFNAME", "lo")
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "CKPT_OK" in out, out[-2000:]
    assert os.path.isdir(ckpt)
    assert not os.path.isdir(ckpt + ".tmp")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
@pytest.mark.parametrize("dp,mp", [(4, 1), (2, 2)],
                         ids=["dp4", "dp2xtp2"])
def test_two_process_distributed_train_step(tmp_path, dp, mp):
    """(4,1): pure cross-host DP.  (2,2): Megatron TP pairs WITHIN each
    host (the global device order [p0d0,p0d1,p1d0,p1d1] reshapes so the
    'model' axis stays host-local — ICI-analogue — while 'data' crosses
    hosts), proving the round-3 transformer sharding survives
    jax.distributed."""
    coord = f"localhost:{_free_port()}"
    script = tmp_path / "child.py"
    # fresh per-run compile cache: the shared repo cache can hold AOT
    # artifacts compiled on a different machine type; scanning/rejecting
    # them skews one process >30s past the other, tripping the Gloo
    # context-init rendezvous deadline (observed)
    script.write_text(CHILD.format(
        repo=REPO_ROOT, tests=TESTS_DIR, coord=coord,
        cache=str(tmp_path / "jax_cache"), dp=dp, mp=mp))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    # multi-NIC sandboxes: let Gloo rendezvous over loopback, not whatever
    # interface the hostname resolves to
    env.setdefault("GLOO_SOCKET_IFNAME", "lo")
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_LOSS")]
        assert lines, out[-2000:]
        losses.append(float(lines[0].split()[1]))
    assert losses[0] == losses[1]

    # single-process reference on the identically-assembled global batch:
    # make_array_from_process_local_data lays out process 0's rows on its
    # devices first, so the effective global order is the process-stripe
    # permutation [rows of p0; rows of p1] = [0, 2, 1, 3].
    import jax

    from fixtures import (init_tiny_params, make_train_rows_batch,
                          tiny_enc_dec_configs)
    from gstx.core.mesh import (make_mesh, make_global_batch, process_shard,
                                shard_by_path)
    from gstx.models.encdec import GSTVisualDialog
    from gstx.train.optim import make_optimizer
    from gstx.train.train_gen import make_train_step

    enc_cfg, dec_cfg = tiny_enc_dec_configs()
    global_batch = make_train_rows_batch(enc_cfg, b=4)
    perm = np.concatenate([process_shard(4, i, 2) for i in range(2)])
    permuted = {k: v[perm] for k, v in global_batch.items()}

    mesh = make_mesh(dp, mp, devices=jax.devices()[:4])
    model = GSTVisualDialog(enc_cfg, dec_cfg, mesh=mesh)
    params = shard_by_path(mesh, init_tiny_params(enc_cfg, dec_cfg))
    optimizer = make_optimizer(1e-4, 1e-4, 10, 1000)
    opt_state = shard_by_path(mesh, optimizer.init(params))
    step_fn = make_train_step(model, optimizer, batch_size=4)
    dev_batch = make_global_batch(mesh, permuted)
    with mesh:
        _, _, metrics = step_fn(params, opt_state, dev_batch,
                                jax.random.PRNGKey(42))
        single_loss = float(metrics["lm_loss"])
    np.testing.assert_allclose(losses[0], single_loss, rtol=1e-5, atol=1e-7)


def test_process_log_path(monkeypatch):
    """Non-zero processes log to a .procN-suffixed file so multi-host
    appends never interleave; process 0 / single-process keeps the name."""
    import jax

    from gstx.core.logging import process_log_path

    assert process_log_path("/x/log.txt") == "/x/log.txt"
    monkeypatch.setattr(jax, "process_index", lambda: 3)
    assert process_log_path("/x/log.txt") == "/x/log.proc3.txt"
    assert process_log_path("/x/log") == "/x/log.proc3"


def test_process_shard_striping():
    """Deterministic, disjoint, covering stripes."""
    from gstx.core.mesh import process_shard

    a = process_shard(10, 0, 3)
    b = process_shard(10, 1, 3)
    c = process_shard(10, 2, 3)
    got = np.sort(np.concatenate([a, b, c]))
    np.testing.assert_array_equal(got, np.arange(10))
    assert not set(a) & set(b) and not set(b) & set(c)


def test_relax_cpu_collective_timeouts(monkeypatch):
    """The rendezvous-watchdog flags are appended to XLA_FLAGS exactly once,
    existing flags are preserved, and an explicit caller value wins."""
    import os

    from gstx.core.mesh import relax_cpu_collective_timeouts

    monkeypatch.setenv("XLA_FLAGS",
                       "--xla_force_host_platform_device_count=8")
    relax_cpu_collective_timeouts()
    flags = os.environ["XLA_FLAGS"]
    assert "--xla_force_host_platform_device_count=8" in flags
    assert "--xla_cpu_collective_call_terminate_timeout_seconds=" in flags
    assert "--xla_cpu_collective_call_warn_stuck_timeout_seconds=" in flags

    # idempotent: a second call appends nothing
    relax_cpu_collective_timeouts()
    assert os.environ["XLA_FLAGS"] == flags

    # an existing caller-set value is left alone
    monkeypatch.setenv(
        "XLA_FLAGS",
        "--xla_cpu_collective_call_terminate_timeout_seconds=77")
    relax_cpu_collective_timeouts()
    flags = os.environ["XLA_FLAGS"]
    assert "terminate_timeout_seconds=77" in flags
    assert "terminate_timeout_seconds=1200" not in flags
