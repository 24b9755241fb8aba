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


def shard_batch(mesh: Mesh | None, *arrays, axis: str = "dp"):
    """Constrain each array's leading axis onto the mesh's ``dp`` axis.

    This is the whole production-engine SPMD story: the hot programs
    (track_frame, map_scan, the cache builders) are embarrassingly parallel
    over rays/queries, so pinning the per-ray batch axis with
    ``with_sharding_constraint`` lets GSPMD partition every downstream
    per-ray op across chips and insert the gradient/loss psum over ICI
    automatically.  No-op when ``mesh`` is None (single-chip path —
    programs stay byte-identical).
    """
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    out = []
    for x in arrays:
        if x is None:
            out.append(None)
            continue
        spec = P(axis, *([None] * (x.ndim - 1)))
        out.append(jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec)))
    return tuple(out) if len(out) > 1 else out[0]


def parse_mesh_spec(spec) -> Mesh | None:
    """Build a mesh from a config/CLI spec.

    Accepts ``None``/''/'none' (single-chip), an int-like ('8') for pure
    dp, or 'dp4,tp2' / 'dp4' style axis lists.  The product must not
    exceed ``jax.device_count()``.
    """
    if spec in (None, "", "none", "None", 0, "0"):
        return None
    dp = tp = None
    if isinstance(spec, int) or (isinstance(spec, str) and spec.isdigit()):
        dp, tp = int(spec), 1
    else:
        for part in str(spec).split(","):
            part = part.strip()
            if part.startswith("dp"):
                dp = int(part[2:])
            elif part.startswith("tp"):
                tp = int(part[2:])
            else:
                raise ValueError(f"bad mesh axis {part!r} in {spec!r}")
        tp = tp or 1
        if dp is None:
            dp = jax.device_count() // tp
    n = dp * tp
    if n > jax.device_count():
        raise ValueError(
            f"mesh {spec!r} needs {n} devices, have {jax.device_count()}")
    return make_mesh(n, dp=dp, tp=tp)
