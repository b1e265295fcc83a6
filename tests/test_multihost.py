"""Two-REAL-process jax.distributed test of the multi-host backend
(SURVEY.md §5 distributed communication backend; BASELINE config 5).

Each subprocess enrolls via lins_tpu.parallel.multihost.initialize with a
real coordinator/num_processes=2 on the CPU backend (2 virtual devices per
process -> a 4-device global mesh), assembles a globally-sharded batch with
make_global_batch, and runs one shard_map psum across all hosts.  This is
the full enrollment + data-feeding path the `run_slam.py --multihost`
recipe uses — executed, not just wired.
"""
import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
from jax.extend.backend import clear_backends
clear_backends()
import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

sys.path.insert(0, {repo!r})
from lins_tpu.parallel import multihost

pid = int(sys.argv[1])
ok = multihost.initialize(coordinator_address={coord!r},
                          num_processes=2, process_id=pid)
assert ok, "initialize() fell back to single-process"
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid

mesh = multihost.global_mesh()
n_dev = len(mesh.devices.flat)
assert n_dev == 4, n_dev

# this process's 2 rows of the 4-row global batch
sl = multihost.local_batch_slice(mesh, 4)
assert sl == slice(2 * pid, 2 * pid + 2), sl
local = np.arange(4 * 3, dtype=np.float32).reshape(4, 3)[sl]
batch = multihost.make_global_batch(mesh, {{"x": local}})["x"]
assert batch.shape == (4, 3)

@jax.jit
def total(b):
    def f(x):
        return jax.lax.psum(jnp.sum(x), "seq")
    return shard_map(f, mesh=mesh, in_specs=P("seq"), out_specs=P())(b)

got = float(total(batch))
exp = float(np.arange(4 * 3, dtype=np.float32).sum())
assert got == exp, (got, exp)
print(f"MULTIHOST_OK {{pid}} {{got}}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_enrollment_and_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo, coord=coord))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out))
    for i, (rc, out) in enumerate(outs):
        assert rc == 0, f"worker {i} failed:\n{out}"
        assert f"MULTIHOST_OK {i}" in out, out
