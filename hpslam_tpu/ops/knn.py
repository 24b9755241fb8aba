"""Radius-bounded k-nearest-neighbour search over the neural point cloud.

First-party TPU replacement for the reference's faiss-gpu IVF-Flat index
(reference src/neural_point.py:65-67, 211-214, 366-417 — SURVEY.md N1).

Design:
* The point cloud lives in a fixed-capacity HBM array ``points [N_cap, 3]``
  with an active ``count``; slots >= count are masked to +BIG distance.
* Exact, tiled brute force: squared distances via one skinny matmul per
  (query-tile x point-tile) block and a running top-k merge carried through a
  ``lax.scan`` over point tiles.  Exact search strictly dominates the
  reference's *approximate* IVF (nlist=400, nprobe=4) in recall, and avoids
  the reference's O(N) index retrain on every insertion
  (neural_point.py:325).
* Distances returned are **squared** L2, ascending — the faiss convention the
  rest of the reference pipeline assumes (decoder weighting 1/(D+eps)).

The returned indices feed differentiable gathers downstream; the search
itself is on detached positions, matching the reference
(decoder.py:201 ``p.clone().detach()``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 1e10

# knn_tiles chunk-loop unroll bound: above this many chunks the HLO-size
# cost of unrolling outweighs the pipelining win and lax.map is used
# (ADVICE r03: the mapper's 200k-query cache builds hit ~49 copies).
_UNROLL_MAX_CHUNKS = 8


@functools.partial(jax.jit, static_argnames=("k", "q_chunk", "n_tile"))
def knn(query: jnp.ndarray, points: jnp.ndarray, count: jnp.ndarray,
        k: int = 8, q_chunk: int = 4096, n_tile: int = 8192):
    """Exact masked kNN.

    Args:
      query:  (Q, 3) query positions (any Q; padded internally).
      points: (N_cap, 3) point buffer; only the first ``count`` are valid.
      count:  scalar int32 number of active points.
      k:      neighbours to return.
      q_chunk, n_tile: tiling parameters (bound peak memory to
        q_chunk*n_tile floats).

    Returns:
      D: (Q, k) squared distances, ascending; BIG where fewer than k valid.
      I: (Q, k) int32 indices into ``points`` (0 where invalid — check D).
    """
    Q = query.shape[0]
    N_cap = points.shape[0]
    n_tile = min(n_tile, N_cap)
    num_tiles = -(-N_cap // n_tile)
    pad_n = num_tiles * n_tile - N_cap
    if pad_n:
        points = jnp.concatenate(
            [points, jnp.zeros((pad_n, 3), points.dtype)], axis=0)

    q_chunk = min(q_chunk, max(Q, 1))
    num_q = -(-Q // q_chunk)
    pad_q = num_q * q_chunk - Q
    if pad_q:
        query = jnp.concatenate([query, jnp.zeros((pad_q, 3), query.dtype)], 0)

    pts_sq = jnp.sum(points * points, axis=-1)  # (N_pad,)
    slot = jnp.arange(points.shape[0], dtype=jnp.int32)
    invalid = slot >= count  # (N_pad,)

    def one_chunk(q):  # q: (q_chunk, 3)
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)  # (qc, 1)

        def tile_step(carry, t):
            bestD, bestI = carry
            p = jax.lax.dynamic_slice(points, (t * n_tile, jnp.zeros((), t.dtype)), (n_tile, 3))
            psq = jax.lax.dynamic_slice(pts_sq, (t * n_tile,), (n_tile,))
            inv = jax.lax.dynamic_slice(invalid, (t * n_tile,), (n_tile,))
            # (qc, n_tile) squared distances via matmul (MXU)
            # HIGHEST precision: default bf16 matmul passes would corrupt
            # squared distances at the 4e-4 radius^2 scales used here.
            d2 = q_sq - 2.0 * jnp.dot(q, p.T,
                                      precision=jax.lax.Precision.HIGHEST) \
                + psq[None, :]
            d2 = jnp.maximum(d2, 0.0)
            d2 = jnp.where(inv[None, :], BIG, d2)
            idx = t * n_tile + jax.lax.broadcasted_iota(
                jnp.int32, (q.shape[0], n_tile), 1)
            # merge with running best
            allD = jnp.concatenate([bestD, d2], axis=1)
            allI = jnp.concatenate([bestI, idx], axis=1)
            negD, sel = jax.lax.top_k(-allD, k)
            return (-negD, jnp.take_along_axis(allI, sel, axis=1)), None

        init = (jnp.full((q.shape[0], k), BIG, query.dtype),
                jnp.zeros((q.shape[0], k), jnp.int32))
        (D, I), _ = jax.lax.scan(tile_step, init,
                                 jnp.arange(num_tiles, dtype=jnp.int32))
        return D, I

    qs = query.reshape(num_q, q_chunk, 3)
    D, I = jax.lax.map(one_chunk, qs)
    D = D.reshape(-1, k)[:Q]
    I = I.reshape(-1, k)[:Q]
    I = jnp.where(D >= BIG, 0, I)
    return D, jnp.asarray(I, jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "q_chunk", "n_tile", "m"))
def knn_segmin(query: jnp.ndarray, points: jnp.ndarray, count: jnp.ndarray,
               k: int = 8, q_chunk: int = 2500, n_tile: int | None = None,
               m: int = 2):
    """Segment-top-m kNN: the m smallest distances per ``n_tile``-point
    segment, then an exact top-k over all segment candidates.

    This is the TPU-shaped analogue of the reference's faiss IVF
    approximation (nlist=400, nprobe=4, neural_point.py:211-214).  Exactness
    fails only when more than m of the true k neighbours fall in one
    segment; insertion de-interleaves the N_add ray siblings across the
    array (state.add_points) so structural collisions are rare and m=2
    suffices.  Distances are exact f32 (elementwise VPU, no
    bf16 matmul passes, no QxN materialisation); selection is m argmin
    passes per segment instead of a sort — ~10x faster than the exact path
    at 500k-point scale.
    """
    Q = query.shape[0]
    N_cap = points.shape[0]
    if n_tile is None:
        # keep >= ~128 segments so k neighbours rarely collide per segment
        n_tile = max(256, min(2048, N_cap // 128))
    n_tile = min(n_tile, N_cap)
    num_tiles = -(-N_cap // n_tile)
    pad_n = num_tiles * n_tile - N_cap
    if pad_n:
        points = jnp.concatenate(
            [points, jnp.zeros((pad_n, 3), points.dtype)], axis=0)
    q_chunk = min(q_chunk, max(Q, 1))
    num_q = -(-Q // q_chunk)
    pad_q = num_q * q_chunk - Q
    if pad_q:
        query = jnp.concatenate([query, jnp.zeros((pad_q, 3), query.dtype)], 0)
    slot = jnp.arange(points.shape[0], dtype=jnp.int32)
    invalid = slot >= count

    def one_chunk(qc):
        def tile_topm(t):
            p = jax.lax.dynamic_slice(
                points, (t * n_tile, jnp.zeros((), t.dtype)), (n_tile, 3))
            inv = jax.lax.dynamic_slice(invalid, (t * n_tile,), (n_tile,))
            d2 = sum(jnp.square(qc[:, c:c + 1] - p[:, c][None, :])
                     for c in range(3))
            d2 = jnp.where(inv[None, :], BIG, d2)
            Ds, Is = [], []
            for _ in range(m):
                am = jnp.argmin(d2, axis=1)
                dmin = jnp.take_along_axis(d2, am[:, None], 1)
                Ds.append(dmin[:, 0])
                Is.append(t * n_tile + am.astype(jnp.int32))
                # mask out the extracted minimum
                onehot = (jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
                          == am[:, None])
                d2 = jnp.where(onehot, BIG, d2)
            return jnp.stack(Ds, -1), jnp.stack(Is, -1)  # (qc, m)

        D, I = jax.lax.map(tile_topm, jnp.arange(num_tiles, dtype=jnp.int32))
        D = jnp.moveaxis(D, 0, 1).reshape(qc.shape[0], num_tiles * m)
        I = jnp.moveaxis(I, 0, 1).reshape(qc.shape[0], num_tiles * m)
        kk = min(k, num_tiles * m)
        negD, sel = jax.lax.top_k(-D, kk)
        Dk = -negD
        Ik = jnp.take_along_axis(I, sel, axis=1)
        if kk < k:  # degenerate tiny clouds
            padk = k - kk
            Dk = jnp.concatenate([Dk, jnp.full((Dk.shape[0], padk), BIG)], 1)
            Ik = jnp.concatenate([Ik, jnp.zeros((Ik.shape[0], padk),
                                                jnp.int32)], 1)
        return Dk, Ik

    qs = query.reshape(num_q, q_chunk, 3)
    D, I = jax.lax.map(one_chunk, qs)
    D = D.reshape(-1, k)[:Q]
    I = I.reshape(-1, k)[:Q]
    I = jnp.where(D >= BIG, 0, I)
    return D, jnp.asarray(I, jnp.int32)


# ---------------------------------------------------------------------------
# Tile index ("sorted cell slabs"): the TPU analogue of faiss IVF
# (reference src/neural_point.py:65-67 — IndexIVFFlat nlist=400 nprobe=4).
# The cloud is Morton-sorted so fixed-size contiguous tiles are spatially
# compact; each query prunes tiles by a bounding-sphere distance lower bound
# and runs exact distances only on the best ``probe`` tiles.  Unlike faiss's
# O(N) per-insertion retrain (neural_point.py:325), rebuilding is one
# device-side sort, and the search is recall-tunable via ``probe``.

def topk_extract(d2: jnp.ndarray, k: int):
    """Exact ascending top-k by k argmin passes (VPU) instead of a sort.

    jax.lax.approx_min_k(aggregate_to_topk=True) lowers to a FULL-row sort
    on TPU — measured 2.3 ms per (4096, 2048) chunk, the dominant cost of
    knn_tiles at k=8.  k argmin+mask passes are ~20x cheaper at small k.
    Rows are (q, C); returns (D (q, k) ascending, I (q, k) int32 column
    ids)."""
    Ds, Is = [], []
    for _ in range(k):
        am = jnp.argmin(d2, axis=1)
        Ds.append(jnp.take_along_axis(d2, am[:, None], 1)[:, 0])
        Is.append(am.astype(jnp.int32))
        onehot = (jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
                  == am[:, None])
        d2 = jnp.where(onehot, BIG, d2)
    return jnp.stack(Ds, -1), jnp.stack(Is, -1)


# ---------------------------------------------------------------------------
# Pallas exact row-top-k (round 5).  The per-phase budget
# (tools_profile_budget.py, QUALITY.md) showed the search stages are
# op-LATENCY-bound, not bandwidth-bound: topk_extract's k argmin passes +
# _select_tiles' PartialReduce/narrow cost ~100 small sequential XLA ops
# per 4096-query chunk (~3 ms of launch latency at ~30 us/op), while the
# data fits VMEM.  One Pallas kernel runs all k passes on a VMEM-resident
# block: identical first-occurrence-argmin semantics, ~2 device ops per
# chunk instead of ~100.  TPU-only: off-TPU the XLA paths below are used
# (same semantics; the interpret-mode kernel is unit-pinned against them
# in tests/test_knn.py).


def _on_tpu() -> bool:
    d = jax.devices()[0]
    return "tpu" in (d.platform + " " + d.device_kind).lower()


def _topk_rows_kernel(k: int, with_payload: bool, *refs):
    """Exact ascending top-k per row over a VMEM block.

    refs: (x_ref[, v_ref], od_ref, oi_ref).  x (bn, C) distances;
    v (bn, C) f32 payload carried through selection (pack_ids-encoded
    candidate ids); without a payload the selected COLUMN indices are
    returned (f32 values — exact below 2^24, the _select_tiles case).
    Tie rule = first occurrence, matching jnp.argmin (topk_extract)."""
    if with_payload:
        x_ref, v_ref, od_ref, oi_ref = refs
        v = v_ref[...]
    else:
        x_ref, od_ref, oi_ref = refs
        v = None
    x = x_ref[...]
    C = x.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    iota_f = iota.astype(jnp.float32)
    Ds, Is = [], []
    for _ in range(k):
        m = jnp.min(x, axis=1, keepdims=True)
        first = jnp.min(jnp.where(x <= m, iota, C), axis=1, keepdims=True)
        onehot = iota == first
        Ds.append(m[:, 0])
        sel_v = iota_f if v is None else v
        Is.append(jnp.sum(jnp.where(onehot, sel_v, 0.0), axis=1))
        x = jnp.where(onehot, BIG, x)
    od_ref[...] = jnp.stack(Ds, axis=1)
    oi_ref[...] = jnp.stack(Is, axis=1)


def _pick_topk_bn(n: int, C: int, k: int) -> int:
    """Row block for the top-k kernel, scaled by BOTH the row width and
    the pass count: Mosaic does not fully reuse VMEM buffers across the
    k unrolled selection passes, so the scoped-VMEM stack grows roughly
    like (k/2 + 4) live (bn, C) f32 buffers — the k=32 insertion search
    OOM'd at bn=512, C=512 (17.17 M vs the 16 M scoped limit) while the
    k=8 tracker case fit at bn=256, C=1536 (~12.6 M)."""
    budget = 13_000_000 // (4 * max(C, 1) * (k // 2 + 4))
    bn = 8
    while bn * 2 <= min(budget, n, 512):
        bn *= 2
    return bn


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _pl_topk(d2, payload, k: int, interpret: bool = False):
    """pallas_call wrapper: (n, C) [+ payload (n, C) f32] -> (Dk (n, k)
    ascending, sel (n, k) f32 — payload values, or column indices)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, C = d2.shape
    bn = _pick_topk_bn(n, C, k)
    n_pad = -(-n // bn) * bn
    if n_pad != n:
        pad = jnp.full((n_pad - n, C), BIG, d2.dtype)
        d2 = jnp.concatenate([d2, pad], 0)
        if payload is not None:
            payload = jnp.concatenate(
                [payload, jnp.zeros((n_pad - n, C), jnp.float32)], 0)
    grid = (n_pad // bn,)
    row = pl.BlockSpec((bn, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.BlockSpec((bn, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(_topk_rows_kernel, k, payload is not None)
    args = (d2,) if payload is None else (d2, payload)
    Dk, sel = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[row] * len(args),
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, k), jnp.float32)],
        interpret=interpret,
    )(*args)
    return Dk[:n], sel[:n]


# NOTE: a fully-fused candidate kernel (in-kernel d2 from the gathered
# packed rows + top-k, avoiding the HBM d2/id planes) was built and
# MEASURED NEGATIVE in r05: Mosaic cannot broadcast 1-D -> 3-D vectors,
# so the probe axis became a static slab loop (~576 sequenced small VPU
# ops per block) and bench regressed 661 -> 772 ms/frame (track 379,
# map 1964; 2026-08-21 A/B).  The XLA d2 + flat _pl_topk below wins.

def topk_candidates(d2: jnp.ndarray, k: int, ids_f=None):
    """Final candidate top-k.

    On TPU: the Pallas row-top-k kernel, with the f32-encoded candidate
    ids carried as the selection payload when given (saves the
    take_along re-gather).  Off-TPU: argmin passes (identical
    semantics).  Historical note: a two-stage PartialReduce form was
    MEASURED NEGATIVE here (48.4-50.9 vs 43.0-43.3 ms standalone AND
    recall 0.994 -> 0.980, tools_profile_knn3) — though r05's budget
    showed standalone search timings on the tunnelled runtime are
    dispatch-latency-dominated, so treat those absolutes with care."""
    if _on_tpu():
        Dk, sel = _pl_topk(d2, ids_f, k)
        if ids_f is not None:
            return Dk, sel          # payload = encoded ids
        return Dk, jnp.round(sel).astype(jnp.int32)
    Dk, Ik = topk_extract(d2, k)
    if ids_f is not None:
        return Dk, jnp.take_along_axis(ids_f, Ik, axis=1)
    return Dk, Ik


def _select_tiles(lb2: jnp.ndarray, probe: int) -> jnp.ndarray:
    """Top-``probe`` tile ids by lower bound, (q, T) -> (q, probe) int32.

    TPU at T >= 512: the raw PartialReduce (aggregate_to_topk=False,
    ~16x row narrowing at recall_target=0.95 — measured tile recall
    0.9978 on the 300k wall cloud, r03) followed by ONE Pallas row-top-k
    over the narrowed bins with the bin->tile ids as the selection
    payload.  An exact full-width kernel (no PartialReduce) was tried
    first in r05 and is compute-bound: probe passes x ~6 VPU ops over
    the full (q, T) block cost ~1.2 ms/chunk at T=4096 vs ~0.15 for the
    narrowed form; the PartialReduce buys the 16x back at negligible
    recall cost.  Off-TPU keeps the argmin-pass narrow (same
    two-stage semantics); small T keeps the one-shot approx_min_k."""
    if lb2.shape[1] >= 512:
        v, ti = jax.lax.approx_min_k(lb2, probe, recall_target=0.95,
                                     aggregate_to_topk=False)
        if _on_tpu() and v.shape[1] % 128 == 0 and v.shape[1] >= probe:
            _, sel_f = _pl_topk(v, pack_ids(ti.astype(jnp.int32)), probe)
            return unpack_ids(sel_f)
        _, sel = topk_extract(v, probe)
        return jnp.take_along_axis(ti.astype(jnp.int32), sel, axis=1)
    _, tsel = jax.lax.approx_min_k(lb2, probe, recall_target=0.99)
    return tsel.astype(jnp.int32)


def pack_ids(ids: jnp.ndarray) -> jnp.ndarray:
    """Encode int32 row ids into f32 storage EXACTLY (ids < 2^24).

    Integer VALUES, not a bitcast: small ints bitcast to f32 are denormal
    bit patterns, and any op that flushes denormals (TPU VPU ops do; XLA's
    SPMD partitioner inserts such ops when resharding on every backend)
    silently zeroes every id.  Measured: the dp2+ union-cache path lost
    ALL neighbour ids through ``bitcast_convert_type`` (round-4 root cause
    of test_production_map_scan_union_mesh_equivalence's 0.5% loss
    divergence).  f32 holds integers <= 2^24 exactly, far above any point
    capacity here (2^22 max), so value-encoding is lossless and immune.
    """
    assert ids.dtype in (jnp.int32, jnp.uint32)
    return ids.astype(jnp.float32)


def unpack_ids(x: jnp.ndarray) -> jnp.ndarray:
    """Decode ids stored by pack_ids (round guards resharding epsilon)."""
    return jnp.round(x).astype(jnp.int32)


def _spread_bits(x):
    """Interleave-ready 10-bit spread (classic Morton bit twiddling)."""
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


@functools.partial(jax.jit, static_argnames=("tile",))
def build_tiles(points: jnp.ndarray, count: jnp.ndarray, tile: int = 128):
    """Build the tile index.

    Returns a 3-tuple consumed positionally by knn_tiles:
      packed   (T, 4*tile) f32 — per tile row: [x*tile | y*tile | z*tile |
               pack_ids(original row ids)].  ONE row gather per probed tile
               feeds the exact-distance stage (coordinate-split tables cost
               4 row gathers per tile — gathers price per ROW on TPU, the
               dominant cost of the candidate stage).
      tile_lo, tile_hi (3, T) — per-tile AABBs (tight lower bounds even
               for elongated Morton tiles; bounding spheres lose ~4%
               recall on wall-like clouds).  Coordinate-major so the hot
               (Q, T) elementwise ops stay well-lane-tiled.

    A two-level (super-tile) prune was built and MEASURED SLOWER on v5e
    despite ~6x less bound arithmetic: its extra narrow select (12 argmin
    passes over (Q, 128)) and bound gather cost ~3.5 ms/chunk of
    sequential small-op latency, vs ~1 ms for the dense (Q, 4096) bound
    pass they replaced — the one-level prune is bandwidth-cheap and
    latency-lean.  (The 27 ms/chunk that motivated the hierarchy was
    tunnelled-dispatch latency polluting the standalone microbench, not
    device work.)

    N_cap must be a multiple of ``tile`` (capacities are powers of two);
    invalid rows are pushed to the end and set to a far sentinel.
    """
    N_cap = points.shape[0]
    assert N_cap % tile == 0, "capacity must be a multiple of tile"
    slot = jnp.arange(N_cap, dtype=jnp.int32)
    valid = slot < count
    lo = jnp.min(jnp.where(valid[:, None], points, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], points, -jnp.inf), axis=0)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    hi = jnp.where(jnp.isfinite(hi), hi, 1.0)
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((points - lo) * scale, 0.0, 1023.0).astype(jnp.uint32)
    key = (_spread_bits(q[:, 0]) | (_spread_bits(q[:, 1]) << 1)
           | (_spread_bits(q[:, 2]) << 2))
    key = jnp.where(valid, key, jnp.uint32(0xFFFFFFFF))
    perm = jnp.argsort(key).astype(jnp.int32)
    sorted_pos = points[perm]
    sorted_valid = perm < count
    sorted_pos = jnp.where(sorted_valid[:, None], sorted_pos, 1e6)

    T = N_cap // tile
    tp = sorted_pos.reshape(T, tile, 3)
    tv = sorted_valid.reshape(T, tile)
    tlo = jnp.min(jnp.where(tv[..., None], tp, 1e6), axis=1)   # (T, 3)
    thi = jnp.max(jnp.where(tv[..., None], tp, -1e6), axis=1)  # (T, 3)
    assert N_cap < (1 << 24), "pack_ids requires capacity < 2^24"
    packed = jnp.concatenate(
        [jnp.moveaxis(tp, -1, 1).reshape(T, 3 * tile),
         pack_ids(perm.reshape(T, tile))],
        axis=1)
    return packed, tlo.T, thi.T


@functools.partial(jax.jit,
                   static_argnames=("k", "tile", "probe", "q_chunk"))
def knn_tiles(query: jnp.ndarray, packed: jnp.ndarray,
              tile_lo: jnp.ndarray, tile_hi: jnp.ndarray,
              k: int = 8, tile: int = 128, probe: int = 16,
              q_chunk: int = 4096):
    """kNN via the tile index: prune to the ``probe`` tiles with the
    smallest AABB lower bound, exact squared distances on their candidates,
    top-k merge.  Recall vs exact is ~0.994/0.998 at probe=12/16 on
    wall-like clouds (tests/test_knn.py, KDTree oracle).

    ``tile`` is derived from the index shapes — whatever tile size
    build_tiles used wins (the state.NeuralPointCloud index caps the tile
    COUNT at 4096 so the bound pass does not grow as the cloud grows; at a
    fixed candidate budget, bigger tiles measured much LOWER recall —
    tile=512/probe=3 0.70 vs tile=128/probe=12 0.994 on the 300k wall —
    so the cap trades bound-pass width only when forced by scale).
    """
    tile = packed.shape[1] // 4
    Q = query.shape[0]
    q_chunk = min(q_chunk, max(Q, 1))
    num_q = -(-Q // q_chunk)
    pad_q = num_q * q_chunk - Q
    if pad_q:
        query = jnp.concatenate([query, jnp.zeros((pad_q, 3), query.dtype)], 0)

    T = tile_lo.shape[1]
    probe = min(probe, T)

    def one_chunk(q):  # (qc, 3)
        qc = q.shape[0]
        # squared AABB lower bound per tile — exact f32, per-coordinate on
        # (qc, T) shapes (a centroid matmul here hits catastrophic bf16
        # cancellation: the |q|^2 terms dwarf the cm-scale differences
        # that order the tiles)
        lb2 = 0.0
        for c in range(3):
            d = jnp.maximum(jnp.maximum(tile_lo[c][None] - q[:, c:c + 1],
                                        q[:, c:c + 1] - tile_hi[c][None]),
                            0.0)
            lb2 = lb2 + d * d
        tsel = _select_tiles(lb2, probe)
        # ONE packed whole-tile row gather per probed tile (coords + ids);
        # per-point row gathers are the difference between ~50 and ~500 ms,
        # and a packed row costs the same as a coordinate row
        crow = packed[tsel]                              # (qc, probe, 4*tile)
        d2 = 0.0
        for c in range(3):
            cpos = crow[:, :, c * tile:(c + 1) * tile].reshape(
                qc, probe * tile)
            d2 = d2 + jnp.square(q[:, c:c + 1] - cpos)
        # the f32-encoded id plane rides through the top-k as the
        # selection payload (one unpack of (qc, k) instead of a
        # take_along re-gather over (qc, probe*tile))
        cidx_f = crow[:, :, 3 * tile:].reshape(qc, probe * tile)
        Dk, If = topk_candidates(d2, k, ids_f=cidx_f)
        Ik = unpack_ids(If)
        return Dk, Ik

    if num_q == 1:
        # single-chunk fast path: no chunk-loop wrapper, so a dp-sharded
        # query batch keeps its sharding through the whole search (the
        # sequential chunk loop exists only to bound single-chip memory)
        D, I = one_chunk(query)
    elif num_q <= _UNROLL_MAX_CHUNKS:
        # UNROLLED chunk loop, not lax.map: XLA overlaps/pipelines the
        # independent chunk programs where lax.map forces a sequential
        # while-loop with per-step dynamic slicing — measured 14.7 vs
        # 18.2 ms per 25k-query tracking search on v5e
        # (tools_profile_knn3 A/B).  Compile cost grows by num_q copies
        # of the chunk body, so the unroll is CAPPED: the tracker's
        # 25k-query searches unroll (<= 7 copies), while the mapper's
        # big cache builds (200k+ queries at default q_chunk -> ~49
        # copies, an HLO/compile blowup) take the lax.map path below.
        qs_ = query.reshape(num_q, q_chunk, 3)
        outs = [one_chunk(qs_[c]) for c in range(num_q)]
        D = jnp.concatenate([o[0] for o in outs])
        I = jnp.concatenate([o[1] for o in outs])
    else:
        qs_ = query.reshape(num_q, q_chunk, 3)
        D, I = jax.lax.map(one_chunk, qs_)
    D = D.reshape(-1, k)[:Q]
    I = I.reshape(-1, k)[:Q]
    # far-sentinel rows (invalid points) surface as huge distances
    inval = D >= BIG
    return jnp.where(inval, BIG, D), jnp.where(inval, 0, I).astype(jnp.int32)


# NOTE: a per-RAY segment search (knn_ray: one tile probe + candidate
# gather per ray, per-sample top-k over the shared candidates) was built,
# validated (recall parity with knn_tiles at probe=32), MEASURED NEGATIVE
# (89 vs 63 ms per 25k-sample tracking search on v5e — the recall-parity
# probe width erases the S-fold gather saving), and REMOVED round 5
# (VERDICT r04 weak #6 dead-knob prune).  Code in git history at fd5c2e5.

# threshold below which the exact path is cheap enough to prefer
_EXACT_MAX_N = 1 << 15


def knn_auto(query, points, count, k: int = 8):
    """Dispatch: exact for small clouds, segment-min at scale.

    Only NON-hot call sites land here (mesher / eval_points full renders
    that pass no tile index; the tracker/mapper always search via
    knn_tiles).  The segment-min fallback misses a true neighbour only
    when > m of the k nearest fall in one segment, which DOES happen on
    real insertion orders: points insert in per-frame pixel-raster order,
    so a query's neighbourhood is partially contiguous in the array
    (measured recall@8 on a frame-raster wall cloud: m=2 0.85, m=4 0.96,
    m=8 0.999 — even on a fully spatially-sorted adversarial ordering
    m=8 holds 0.999).  This dispatcher therefore runs m=8: ~4x the
    selection passes of the m=2 hot-path default, on a path that is a
    few percent of offline meshing cost
    (tests/test_knn.py::test_knn_auto_fallback_recall).
    """
    if points.shape[0] <= _EXACT_MAX_N:
        return knn(query, points, count, k=k)
    return knn_segmin(query, points, count, k=k, m=8)


def neighbor_counts(D: jnp.ndarray, radius) -> jnp.ndarray:
    """Number of returned neighbours within (per-query) radius.

    Reference: neural_point.py:410-415 — ``(D < radius**2).sum(-1)`` with
    dynamic per-query radii.  radius: scalar or (Q,).
    """
    r = jnp.asarray(radius)
    if r.ndim == 1:
        r = r[:, None]
    return jnp.sum(D < r * r, axis=-1).astype(jnp.int32)


def find_neighbors(query, points, count, radius, k: int = 8,
                   q_chunk: int = 4096, n_tile: int = 8192):
    """faiss-compatible query: returns (D, I, neighbor_num).

    Mirrors ``NeuralPointCloud.find_neighbors_faiss`` (neural_point.py:366-417)
    with exact search.
    """
    D, I = knn(query, points, count, k=k, q_chunk=q_chunk, n_tile=n_tile)
    return D, I, neighbor_counts(D, radius)
