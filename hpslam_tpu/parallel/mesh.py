"""Device-mesh helpers for multi-chip scaling.

The reference has no distributed backend at all (SURVEY.md §2 parallelism
table): its concurrency is two host processes on one GPU.  Scaling here is
TPU-native: a ``jax.sharding.Mesh`` with

* ``dp`` — rays/pixels sharded across chips (the dominant axis: every hot
  loop is embarrassingly parallel over rays), gradients for the replicated
  scene state combined by an XLA-inserted psum over ICI;
* ``tp`` — the point cloud sharded by capacity slots for neighbour search
  over clouds too large for one chip's HBM (see knn_tp).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              tp: int = 1) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def cloud_sharding(mesh: Mesh) -> NamedSharding:
    """Point buffers sharded along capacity for tensor-parallel kNN."""
    return NamedSharding(mesh, P("tp"))
