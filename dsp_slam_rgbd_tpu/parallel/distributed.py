"""Multi-process (multi-host) distribution — the DCN axis.

The reference is strictly single-process (pthreads + one GPU; SURVEY §2.4).
The TPU-native scaling story adds a second tier: `jax.distributed` joins N
processes (one per host, each owning its local chips) into ONE device
collective; every sharded program in `parallel/` then spans all hosts —
GSPMD inserts the cross-host collectives (gloo on CPU, ICI/DCN on TPU pods)
exactly as it does across local chips.

Usage (per process)::

    from dsp_slam_rgbd_tpu.parallel import distributed as dist
    dist.initialize("host0:9999", num_processes=2, process_id=RANK)
    mesh = dist.global_mesh()          # spans every process's devices
    # ... sharded_recon / sharded_ba over `mesh` as usual

Tested end-to-end by `tests/test_distributed_2proc.py`: two CPU processes
x 4 virtual devices each run the sharded reconstruction and sharded BA and
bit-match the single-process result.
"""
from __future__ import annotations

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, local_device_count: int | None = None):
    """Join the process collective (idempotent per process).

    On CPU test rigs pass `local_device_count` to split each process into
    virtual devices (sets --xla_force_host_platform_device_count; must run
    BEFORE first jax import in the process — the worker entrypoints do)."""
    import os

    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{local_device_count}").strip()
    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax


def global_mesh(axis: str = "obj"):
    """1-D mesh over EVERY device in the collective (all processes)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def shard_global(x: np.ndarray, mesh, axis: str = "obj"):
    """Place a host array (identical on every process) sharded over the
    mesh's first axis.  Each process materializes only its local shards."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(axis, *([None] * (np.ndim(x) - 1)))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(np.shape(x), sharding,
                                        lambda idx: np.asarray(x)[idx])


def replicate(x, mesh):
    """Fully replicate a host value across the collective."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_callback(
            np.shape(a), sharding, lambda idx: np.asarray(a)[idx]), x)


def fetch(x) -> np.ndarray:
    """Gather a (possibly non-addressable) global array to every process."""
    try:
        return np.asarray(x)  # fully-addressable (replicated / single-proc)
    except Exception:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
