"""Tensor-parallel kNN: point cloud sharded across chips, queries replicated.

Each device computes an exact local top-k over its capacity shard with the
single-chip kernel, then the per-shard candidates are all-gathered over ICI
and merged — k*n_dev candidates per query instead of N_cap, so the collective
payload is tiny (Q x k x n_dev) regardless of cloud size.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import knn as K


def make_tp_knn(mesh: Mesh, k: int = 8, axis: str = "tp"):
    """Returns knn_fn(query (Q,3), points (N_cap,3) sharded on axis,
    counts_per_shard (n_shards,)) -> (D (Q,k), I (Q,k) global indices)."""
    n_shards = mesh.shape[axis]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_rep=False)
    def tp_knn(query, pts_shard, count):
        """count: global active count (replicated scalar)."""
        sid = jax.lax.axis_index(axis)
        shard_size = pts_shard.shape[0]
        local_count = jnp.clip(count - sid * shard_size, 0, shard_size)
        D, I = K.knn(query, pts_shard, local_count, k=k)
        I = I + sid * shard_size
        # gather all shards' candidates: (n_shards, Q, k)
        Dg = jax.lax.all_gather(D, axis)
        Ig = jax.lax.all_gather(I, axis)
        Q = D.shape[0]
        Dg = jnp.moveaxis(Dg, 0, 1).reshape(Q, n_shards * k)
        Ig = jnp.moveaxis(Ig, 0, 1).reshape(Q, n_shards * k)
        negD, sel = jax.lax.top_k(-Dg, k)
        return -negD, jnp.take_along_axis(Ig, sel, axis=1)

    return tp_knn
