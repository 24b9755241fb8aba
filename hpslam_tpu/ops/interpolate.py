"""Inverse-distance feature interpolation at sample positions.

Shared by the geometry and colour decoders (reference
src/conv_onet/models/decoder.py:195-272 and 491-559 — both copies implement
the same weighting; here it is one op evaluated **once per stage** and shared,
instead of once per decoder as the reference does).

Gradient structure matches the reference exactly:
* mapper mode: weights are a function of the *search* distances (detached
  positions) — gradients flow only into the gathered features;
* tracker mode (``diff_pos=True``): distances are re-derived from gathered
  cloud positions vs the (pose-dependent) query positions, so pose gradients
  flow through the weights (decoder.py:209-218);
* the out-of-radius zeroing mask is always on stopped gradients
  (decoder.py:235-239 ``with torch.no_grad()``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def interp_weights(D, I, p, cloud_pos, r_query, min_nn_num: int,
                   weighting: str = "distance", diff_pos: bool = False,
                   neighbor_pos=None):
    """Compute normalised neighbour weights.

    Args:
      D: (Q, k) squared search distances (from ops.knn).
      I: (Q, k) neighbour indices.
      p: (Q, 3) query positions (pose-differentiable in tracker mode).
      cloud_pos: (N_cap, 3) point positions.
      r_query: per-query radius, scalar or (Q,).
      min_nn_num: minimum neighbours for a valid sample (cfg pointcloud.min_nn_num).
      weighting: 'distance' (1/d^2) or 'expo' (exp(-20*d)).
      diff_pos: tracker mode — re-derive D differentiably.
      neighbor_pos: optional (Q, k, 3) PRE-GATHERED neighbour positions —
        skips the per-call ``cloud_pos[I]`` row gather (the tracker's
        neighbour sets are frozen per sub-stage, so the gather is hoisted
        out of its optimization scan; invalid slots must carry a far
        sentinel position so they get zero weight).

    Returns:
      weights: (Q, k, 1) L1-normalised, zero outside radius.
      has_neighbors: (Q,) bool — >= min_nn_num within radius.
    """
    r = jnp.asarray(r_query)
    if r.ndim == 1:
        r = r[:, None]
    r2 = r * r

    nn_num = jnp.sum(D < r2, axis=-1)
    has_neighbors = nn_num > (min_nn_num - 1)

    if diff_pos:
        if neighbor_pos is None:
            neighbor_pos = cloud_pos[I]  # (Q, k, 3)
        Dd = jnp.sum(jnp.square(neighbor_pos - p[:, None, :]), axis=-1)
        out = Dd > r2
        Dd = jnp.where(out, 1e4 if weighting == "distance" else 50.0, Dd)
    else:
        Dd = D

    if weighting == "distance":
        w = 1.0 / (Dd + 1e-10)
    else:
        w = jnp.exp(-20.0 * jnp.sqrt(Dd))
    # zero out-of-radius on stopped gradients (torch.no_grad semantics)
    w = jnp.where(jax.lax.stop_gradient(Dd) > r2, 0.0, w)
    # F.normalize(p=1): divide by max(||w||_1, 1e-12)
    norm = jnp.maximum(jnp.sum(jnp.abs(w), axis=-1, keepdims=True), 1e-12)
    w = w / norm
    return w[..., None], has_neighbors


# TPU scatter-add runs ~6x slower once the target table exceeds ~40 MB
# (327680 x 32 f32) — the lowering falls off its fast (VMEM-resident) path.
# Splitting one scatter into per-destination-range partial scatters keeps
# every partial target under the cliff: measured 16 ms vs 56 ms for 400k
# row-updates into a 2^19 x 32 table.
_SCATTER_FAST_ROWS = 327_680
_SCATTER_PART_ROWS = 262_144


def _split_scatter_add(rows: int, cols: int, idx, upd):
    """Zeros (rows, cols) table += upd at idx, via range-split scatters."""
    if rows <= _SCATTER_FAST_ROWS:
        return jnp.zeros((rows, cols), upd.dtype).at[idx].add(upd)
    parts = -(-rows // _SCATTER_PART_ROWS)
    outs = []
    for pi in range(parts):
        lo = pi * _SCATTER_PART_ROWS
        size = min(_SCATTER_PART_ROWS, rows - lo)
        inr = (idx >= lo) & (idx < lo + size)
        ii = jnp.where(inr, idx - lo, size)  # out-of-range -> dropped
        outs.append(jnp.zeros((size, cols), upd.dtype).at[ii].add(
            jnp.where(inr[:, None], upd, 0.0), mode="drop"))
    return jnp.concatenate(outs, axis=0)


@jax.custom_vjp
def _interp_gather(feats, I, weights):
    """sum_k w_k * feats[I_k] with a split-scatter backward (see above)."""
    return jnp.sum(weights * feats[I], axis=1)


def _interp_gather_fwd(feats, I, weights):
    gathered = feats[I]  # (Q, k, C) — saved so bwd needn't re-gather
    return jnp.sum(weights * gathered, axis=1), (I, weights, gathered,
                                                 feats.shape[0])


def _interp_gather_bwd(res, dc):
    I, weights, gathered, rows = res
    upd = (weights * dc[:, None, :]).reshape(-1, dc.shape[-1])
    dfeats = _split_scatter_add(rows, dc.shape[-1], I.reshape(-1), upd)
    dw = jnp.sum(gathered * dc[:, None, :], axis=-1, keepdims=True)
    # bf16 feature tables (tracker read-only mode): cotangent must match
    # the primal dtype; it is DCE'd by XLA when features aren't optimized
    return (dfeats.astype(gathered.dtype), None,
            dw.astype(weights.dtype))


_interp_gather.defvjp(_interp_gather_fwd, _interp_gather_bwd)


@jax.custom_vjp
def union_gather(feats, uids, Wm):
    """Per-ray union interpolation: out[n, s] = sum_u Wm[n, s, u] *
    feats[uids[n, u]].

    The S samples of one ray share most of their k neighbours; gathering
    the per-ray UNION once and mixing with a (S, u) weight matrix turns
    S*k row-gathers into u (u ~ 2k) and makes the weighted sum a batched
    matmul (MXU) instead of a broadcast-reduce.  Backward scatters only
    n*u rows via the split-scatter fast path.
    """
    return jnp.einsum("nsu,nuc->nsc", Wm, feats[uids])


def _union_gather_fwd(feats, uids, Wm):
    gathered = feats[uids]  # (n, u, C)
    return jnp.einsum("nsu,nuc->nsc", Wm, gathered), (uids, Wm, gathered,
                                                      feats.shape[0])


def _union_gather_bwd(res, dC):
    uids, Wm, gathered, rows = res
    dRows = jnp.einsum("nsu,nsc->nuc", Wm, dC)
    C = dC.shape[-1]
    dfeats = _split_scatter_add(rows, C, uids.reshape(-1),
                                dRows.reshape(-1, C))
    dWm = jnp.einsum("nuc,nsc->nsu", gathered, dC)
    return dfeats, None, dWm


union_gather.defvjp(_union_gather_fwd, _union_gather_bwd)


def union_slots(ids_sk, w_sk, u_max: int, sentinel):
    """Per-ray neighbour-union slot assignment (vmap over rays).

    ids_sk: (S*k,) global neighbour ids of one ray's samples;
    w_sk:   (S*k,) ranking weights (|w|; only the ORDER matters);
    Returns (uids (u_max,) global ids of the kept union, sentinel-padded;
    L (S*k,) int32 slot of each original neighbour in the union, u_max
    where dropped).  Same ranking rule as the mapper's union cache
    (top-u_max by total weight, ABLATIONS.md union8/union40: ATE-neutral).
    """
    SK = ids_sk.shape[0]
    order = jnp.argsort(ids_sk)
    sid = ids_sk[order]
    newgrp = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    slot = jnp.cumsum(newgrp) - 1
    tw = jax.ops.segment_sum(jnp.abs(w_sk)[order], slot, num_segments=SK)
    uid_slot = jnp.zeros((SK,), ids_sk.dtype).at[slot].max(sid)
    twk, sel = jax.lax.top_k(tw, u_max)
    pos = jnp.full((SK,), u_max, jnp.int32).at[sel].set(
        jnp.arange(u_max, dtype=jnp.int32))
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(SK, dtype=order.dtype))
    L = pos[slot[inv]]
    uids = jnp.where(twk > 0, uid_slot[sel], sentinel)
    return uids.astype(jnp.int32), L


def weighted_gather(feats, I, weights, has_neighbors, fill=None):
    """c = sum_k w_k * feats[I_k]; rows without neighbours get ``fill``
    (zeros by default — the reference uses N(0, 0.01) noise, decoder.py:262-263,
    but those rows are force-masked to occupancy -100 downstream so the value
    is immaterial; zeros keep the pipeline deterministic).
    """
    c = _interp_gather(feats, I, weights)
    if fill is None:
        fill = jnp.zeros_like(c)
    return jnp.where(has_neighbors[:, None], c, fill)


def weighted_dense(gathered, weights, has_neighbors):
    """c = sum_k w_k * gathered_k over PRE-GATHERED (Q, k, C) neighbour
    features (tracker dense-cache path: features are frozen during pose
    optimization, so the row gather runs once per sub-stage and every scan
    iteration is a pure broadcast-reduce — no HBM gathers, no scatter in
    the backward).  Invalid rows zeroed like weighted_gather."""
    c = jnp.sum(weights * gathered.astype(weights.dtype), axis=1)
    return jnp.where(has_neighbors[:, None], c, jnp.zeros_like(c))
