"""Device-mesh helpers.

The reference is single-process/single-GPU with pthreads (SURVEY.md §2.4);
the TPU-native scaling axes are:

  * `obj`  — data parallelism over objects / sequences (each GN problem is
    independent; gradients of shared state, e.g. codebooks, psum);
  * `ray`  — model/sequence parallelism inside one GN problem: ray samples
    and surface points shard over devices, normal equations reduce with psum
    (the Schur-boundary-exchange analog for BA lives in mapping/ba.py).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401


def make_mesh(n_obj: int | None = None, n_ray: int = 1,
              devices=None) -> Mesh:
    """Build an (obj, ray) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_obj is None:
        n_obj = n // n_ray
    assert n_obj * n_ray <= n, f"mesh {n_obj}x{n_ray} > {n} devices"
    dev = np.asarray(devices[: n_obj * n_ray]).reshape(n_obj, n_ray)
    return Mesh(dev, axis_names=("obj", "ray"))
