"""Multi-host distributed backend (SURVEY.md §5 / C27; BASELINE config 5).

The single-process mesh in `replay.py` / `dist_graph.py` scales to every
device the process can see (one TPU board).  Past that — pod slices, or
CPU fleets — JAX needs one process per host, all enrolled through
`jax.distributed.initialize`; afterwards `jax.devices()` spans every host
and the SAME `shard_map`/`NamedSharding` code runs globally, with XLA
routing collectives over ICI inside a slice and DCN between slices.  No
NCCL/MPI plumbing: the engine's P3/P4 code paths are unchanged, only the
mesh constructor differs.

Launch recipe (one command per host):

    JAX_COORDINATOR=host0:8476 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$i \
        python run_slam.py --multihost ...

or programmatically:

    from lins_tpu.parallel import multihost
    multihost.initialize()                  # no-op when single-process
    mesh = multihost.global_mesh()          # ("seq",) over ALL hosts' devices
    # feed each host its own sequence shard:
    batch = multihost.local_batch_slice(mesh, total_batch)

Every host must execute the same jitted computations in the same order
(standard JAX SPMD contract).  Host-local input loading + `local_batch_
slice` give each process its slice of the global batch; outputs are
replicated or fetched per-shard with `jax.experimental.multihost_utils`.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


_INITIALIZED = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Enroll this process in a multi-host JAX cluster.

    Arguments fall back to JAX_COORDINATOR / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env vars (and to jax's own auto-detection on cloud TPU
    pods, where initialize() needs no arguments).  Returns True if a
    multi-process cluster was initialized, False for the single-process
    fallback (no env configured) — in which case everything below still
    works on the process-local devices.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR")
    num_processes = num_processes or _env_int("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _env_int(
        "JAX_PROCESS_ID")
    if coordinator_address is None:
        return False            # single-process fallback
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    _INITIALIZED = True
    return True


def _env_int(name: str):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def global_mesh(axis: str = "seq") -> Mesh:
    """1-D mesh over every device of every enrolled process.

    With `initialize()` done this spans the whole cluster; without it, the
    process-local devices (identical to replay.make_mesh then)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def local_batch_slice(mesh: Mesh, total_batch: int) -> slice:
    """The [start, stop) rows of a batch-sharded global array this process
    should materialize locally (jax.make_array_from_single_device_arrays
    feeding).  Requires total_batch % process_count == 0."""
    n_proc = jax.process_count()
    if total_batch % n_proc:
        raise ValueError(f"total_batch {total_batch} not divisible by "
                         f"process count {n_proc}")
    per = total_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def make_global_batch(mesh: Mesh, host_local_arrays, axis: str = "seq"):
    """Assemble a globally-sharded array from each host's local rows.

    host_local_arrays: np arrays holding ONLY this process's batch slice
    (local_batch_slice rows).  Returns jax.Arrays sharded along `axis`
    across all hosts — the input side of the multi-host P4 replay."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        x = np.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        local_devs = [d for d in mesh.devices.flat
                      if d.process_index == jax.process_index()]
        per_dev = np.split(x, len(local_devs))
        buffers = [jax.device_put(s, d)
                   for s, d in zip(per_dev, local_devs)]
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, buffers)

    return jax.tree_util.tree_map(put, host_local_arrays)
