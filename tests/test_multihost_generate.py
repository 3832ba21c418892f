"""Two-process jax.distributed test of MULTI-HOST GENERATION (VERDICT
round-2 #1: the reference DataParallel-wraps the dialog generator,
generate.py:67,77 — the gstx multi-host story is per-process dataset
striping + a LOCAL device mesh per host, no cross-host collectives).

Each child process: init_distributed (gloo, 2 local CPU devices -> 4
global), build a mesh over its LOCAL devices only (the make_generation_mesh
recipe), take its process_shard stripe of a deterministic 4-row batch, and
run a greedy 2-round dialog engine.  The parent then runs the identical
engine single-process on the full batch and checks every child's rows are
token-identical — greedy decoding makes per-row outputs independent of
batch composition, so any divergence is a real multi-process bug (device
placement, mesh addressability, rng misuse).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_ROOT = os.path.dirname(TESTS_DIR)

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

from gstx.core.mesh import init_distributed, make_mesh, process_shard
init_distributed(coordinator_address={coord!r}, num_processes=2,
                 process_id=int(sys.argv[1]))
assert jax.process_count() == 2

import numpy as np
from fixtures import init_tiny_params, make_gen_batch, tiny_enc_dec_configs
from gstx.decode.dialog_engine import make_dialog_engine
from gstx.decode.sampler import DecodeSettings
from gstx.models.encdec import GSTVisualDialog

enc_cfg, dec_cfg = tiny_enc_dec_configs()
batch = make_gen_batch(enc_cfg, b=4)
stripe = process_shard(4)
local = {{k: v[stripe] for k, v in batch.items()}}

# generation meshes over LOCAL devices only (no cross-host collectives)
mesh = make_mesh(len(jax.local_devices()), 1, devices=jax.local_devices())
model = GSTVisualDialog(enc_cfg, dec_cfg)
params = init_tiny_params(enc_cfg, dec_cfg)
engine = make_dialog_engine(
    model, dec_cfg, num_rounds=2,
    q_settings=DecodeSettings(max_steps=4, top_k=1, ngram_blocking_size=4),
    a_settings=DecodeSettings(max_steps=4, top_k=1), mesh=mesh)
out = engine(params, params, local, jax.random.PRNGKey(5))
toks = np.concatenate([np.asarray(out.questions).ravel(),
                       np.asarray(out.answers).ravel()])
print("MHGEN", int(sys.argv[1]), " ".join(str(int(t)) for t in toks),
      flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_generation(tmp_path):
    coord = f"localhost:{_free_port()}"
    script = tmp_path / "child.py"
    script.write_text(CHILD.format(
        repo=REPO_ROOT, tests=TESTS_DIR, coord=coord,
        cache=str(tmp_path / "jax_cache")))

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
    child_toks = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MHGEN"):
                _, pid, rest = line.split(" ", 2)
                child_toks[int(pid)] = np.asarray(
                    [int(t) for t in rest.split()])
    assert set(child_toks) == {0, 1}

    # single-process greedy reference on the full batch
    import jax

    from fixtures import init_tiny_params, make_gen_batch, \
        tiny_enc_dec_configs
    from gstx.core.mesh import process_shard
    from gstx.decode.dialog_engine import make_dialog_engine
    from gstx.decode.sampler import DecodeSettings
    from gstx.models.encdec import GSTVisualDialog

    enc_cfg, dec_cfg = tiny_enc_dec_configs()
    batch = make_gen_batch(enc_cfg, b=4)
    model = GSTVisualDialog(enc_cfg, dec_cfg)
    params = init_tiny_params(enc_cfg, dec_cfg)
    engine = make_dialog_engine(
        model, dec_cfg, num_rounds=2,
        q_settings=DecodeSettings(max_steps=4, top_k=1,
                                  ngram_blocking_size=4),
        a_settings=DecodeSettings(max_steps=4, top_k=1))
    out = engine(params, params,
                 {k: v for k, v in batch.items()}, jax.random.PRNGKey(5))
    ques = np.asarray(out.questions)
    answ = np.asarray(out.answers)
    for pid in (0, 1):
        stripe = process_shard(4, pid, 2)
        want = np.concatenate([ques[:, stripe].ravel(),
                               answ[:, stripe].ravel()])
        np.testing.assert_array_equal(child_toks[pid], want)
