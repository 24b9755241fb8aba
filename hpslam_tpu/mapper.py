"""Mapper — keyframe-window scene optimization as one jitted scan.

Reference: src/Mapper.py (1371 LoC; 600 torch optimizer steps per mapping
frame, each with host-side pixel sampling over up to 20 keyframes, Manager
RPC faiss calls and per-iter LR reprogramming of 5 Adam param groups,
Mapper.py:613-874).

TPU re-design (SURVEY.md §7 deltas 4/5):

* The whole 4-stage schedule (geometry_mid -> color_mid -> geometry_fine ->
  color_fine, Mapper.py:633-640) runs as ONE ``lax.scan``: the per-iteration
  stage id and the 5-group learning-rate vector are precomputed host-side
  (exactly the reference's boundaries incl. the first-frame geo_iter_first
  variant) and scanned as inputs; the step body dispatches the stage with
  ``lax.switch``.
* Keyframe windows are padded to a fixed stack ``[F_max, H, W, ...]`` and
  every ray carries a frame id — so one compiled program serves any window
  size and the iteration count only varies over a small bucket set.
* Feature optimization runs over the full fixed-capacity feature arrays:
  rays touch only in-frustum points, so gradients (and hence Adam updates)
  outside the frustum are exactly zero — numerically equivalent to the
  reference's frustum-masked sub-array optimization (Mapper.py:500-556) with
  its per-frame fresh optimizer, without the gather/scatter bookkeeping.
* Point insertion (non-overlap + overlap batches, Mapper.py:391-462) uses
  the device-side zero-neighbour scatter insert from state.py.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models import decoder as Dec
from .ops import geometry as G
from .ops import knn as Knn_ids
from .ops import image as IM
from .ops import optim as Opt
from .ops import sampling as S
from .renderer import RenderConfig, render_rays


# ---------------------------------------------------------------------------
# device helpers

@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "H", "W"))
def reprojection_visible(pts, prev_w2c, fx: float, fy: float, cx: float,
                         cy: float, H: int, W: int):
    """True where a world point projects inside the previous frame
    (filter_point_before_add, Mapper.py:166-192; edge=0, no z test)."""
    uv, z = G.project_points(pts, prev_w2c, fx, fy, cx, cy)
    return (uv[:, 0] < W) & (uv[:, 0] > 0) & (uv[:, 1] < H) & (uv[:, 1] > 0)


def keyframe_selection_overlap(rng: np.random.Generator, depth: np.ndarray,
                               c2w: np.ndarray, keyframe_poses: List[np.ndarray],
                               k: int, fx, fy, cx, cy,
                               n_samples: int = 8, pixels: int = 200):
    """Rank keyframes by frustum overlap with the current view
    (Mapper.py:253-316).  Host-side numpy: projects ``pixels`` rays x
    ``n_samples`` depth samples into each candidate keyframe and scores the
    inside fraction; returns a random permutation of positively-overlapping
    ids truncated to k.
    """
    H, W = depth.shape
    valid = np.flatnonzero(depth.ravel() > 0)
    if valid.size == 0 or len(keyframe_poses) == 0:
        return []
    sel = valid[rng.integers(0, valid.size, size=min(pixels, valid.size))]
    jj, ii = np.unravel_index(sel, (H, W))
    d = depth[jj, ii]
    dirs = np.stack([(ii - cx) / fx, -(jj - cy) / fy, -np.ones_like(ii, np.float64)], -1)
    rd = dirs @ c2w[:3, :3].T
    ro = c2w[:3, 3]
    t = np.linspace(0.0, 1.0, n_samples)
    near = (d * 0.8)[:, None]
    far = (d + 0.5)[:, None]
    z = near * (1 - t) + far * t
    pts = ro[None, None, :] + rd[:, None, :] * z[..., None]
    pts = pts.reshape(-1, 3)

    scores = []
    for kid, kf_c2w in enumerate(keyframe_poses):
        w2c = np.linalg.inv(kf_c2w)
        cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
        # NOTE: the reference's overlap test does NOT apply the x flip
        # (Mapper.py:296 is commented out) and requires z < 0.
        zc = cam[:, 2:3] + 1e-5
        u = (fx * cam[:, 0] + cx * zc[:, 0]) / zc[:, 0]
        v = (fy * cam[:, 1] + cy * zc[:, 0]) / zc[:, 0]
        edge = 20
        m = (u < W - edge) & (u > edge) & (v < H - edge) & (v > edge) & (cam[:, 2] < 0)
        scores.append((kid, float(m.mean())))
    overlapping = [kid for kid, s in sorted(scores, key=lambda x: -x[1]) if s > 0.0]
    return list(rng.permutation(np.array(overlapping, np.int64))[:k])


# ---------------------------------------------------------------------------
# the jitted mapping scan

@functools.partial(jax.jit, static_argnames=("P", "S", "k", "H", "W",
                                              "fx", "fy", "cx", "cy",
                                              "near_surface", "far_surface",
                                              "mesh"))
def build_pixel_knn_cache(key, depths, c2ws, pools, pool_lens, tile_index,
                          P: int, S: int, k: int, H: int, W: int,
                          fx: float, fy: float, cx: float, cy: float,
                          near_surface: float, far_surface: float,
                          mesh=None):
    """Per-mapped-frame neighbour cache: for each window frame, P cached
    pixels x S depth-guided samples get one kNN against the level's cloud.

    The reference performs the faiss search inside every one of its 600
    optimizer iterations (SURVEY.md call stack 3.3); point positions are
    fixed during feature optimization, so the searches differ only by which
    pixels were sampled.  Restricting each iteration's sampling to this
    cached subset turns ~600 searches into one, at the cost of pixel
    diversity (P per window frame instead of the whole image; P defaults to
    several times the per-frame ray budget).

    Returns (cache_pix (F, P) flat pixel ids, D (F, P, S, k), I (F, P, S, k)).
    """
    F = depths.shape[0]
    keys = jax.random.split(key, F)

    def frame_queries(f):
        r = jax.random.randint(keys[f], (P,), 0, jnp.iinfo(jnp.int32).max)
        idx = pools[f, r % pool_lens[f]]
        i = (idx % W).astype(jnp.float32)
        j = (idx // W).astype(jnp.float32)
        d = depths[f, idx // W, idx % W]
        dirs = jnp.stack([(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)],
                         -1)
        R = c2ws[f, :3, :3]
        rays_d = jnp.matmul(dirs, R.T, precision=jax.lax.Precision.HIGHEST)
        rays_o = c2ws[f, :3, 3]
        t = jnp.linspace(0.0, 1.0, S)
        safe = jnp.where(d > 0, d, 1.0)
        z = near_surface * safe[:, None] * (1 - t) \
            + far_surface * safe[:, None] * t
        p = rays_o[None, None, :] + rays_d[:, None, :] * z[..., None]
        return idx, p.reshape(-1, 3)

    pix, queries = jax.lax.map(frame_queries, jnp.arange(F))
    from .ops import knn as Knn
    from .parallel.mesh import shard_batch
    q = queries.reshape(-1, 3)
    if mesh is None:
        D, I = Knn.knn_tiles(q, *tile_index, k=k)
    else:
        # dp-sharded phase search (see tracker.stage_knn)
        q = shard_batch(mesh, q)
        D, I = Knn.knn_tiles(q, *tile_index, k=k, q_chunk=q.shape[0])
    return pix, D.reshape(F, P, S, k), I.reshape(F, P, S, k)


@functools.partial(jax.jit, static_argnames=(
    "P", "S", "k", "u_max", "H", "W", "fx", "fy", "cx", "cy",
    "near_surface", "far_surface", "min_nn", "weighting", "fix_interval",
    "knn_probe", "mesh"))
def build_pixel_union_cache(key, depths, c2ws, pools, pool_lens, rq_stack,
                            tile_index, capacity,
                            P: int, S: int, k: int, u_max: int,
                            H: int, W: int,
                            fx: float, fy: float, cx: float, cy: float,
                            near_surface: float, far_surface: float,
                            min_nn: int, weighting: str,
                            colors=None, fix_interval: bool = False,
                            knn_probe: int = 16, mesh=None):
    """Union-dedup variant of the pixel cache (non-BA fast path).

    The S depth-guided samples of one ray share most of their k neighbours,
    and with fixed poses + fixed radii the interpolation WEIGHTS are
    constants of the phase too (the reference recomputes them every
    iteration only because faiss runs per iteration).  So per cached pixel
    we precompute:
      * uids (u_max,) — the union of its S*k neighbour rows, top-u_max by
        total interpolation weight (padding/sentinel = capacity),
      * Wm (S, u_max) — per-sample L1-renormalised weights over the union,
      * pmask (S,) — sample-has-neighbours mask (occupancy -100 forcing).
    Each optimizer iteration then gathers u_max rows per ray instead of
    S*k and mixes them with one (S, u_max) x (u_max, C) batched matmul.

    With fixed poses, EVERYTHING the optimizer scan reads per pixel is a
    phase-constant: z values, sample positions, ray directions, GT
    depth/colour.  These are precomputed into compact (F*P, ...) tables
    (``const``) so each iteration gathers small contiguous rows instead of
    scattering reads over the full [F, H, W] window stacks — random pixel
    gathers from the 100 MB stacks were a measured per-iteration cost.

    Returns (cache_pix (F, P), uids (F, P, u_max), Wm (F, P, S, u_max),
    pmask (F, P, S), const dict of flat (F*P, ...) tables).
    """
    from .ops import interpolate as IT
    from .ops import knn as Knn

    F = depths.shape[0]
    keys = jax.random.split(key, F)

    def frame_queries(f):
        r = jax.random.randint(keys[f], (P,), 0, jnp.iinfo(jnp.int32).max)
        idx = pools[f, r % pool_lens[f]]
        i = (idx % W).astype(jnp.float32)
        j = (idx // W).astype(jnp.float32)
        d = depths[f, idx // W, idx % W]
        rq = rq_stack[f, idx // W, idx % W]
        c_gt = (colors[f, idx // W, idx % W] if colors is not None
                else jnp.zeros((P, 3)))
        dirs = jnp.stack([(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)],
                         -1)
        R = c2ws[f, :3, :3]
        rays_d = jnp.matmul(dirs, R.T, precision=jax.lax.Precision.HIGHEST)
        rays_o = c2ws[f, :3, 3]
        safe = jnp.where(d > 0, d, 1.0)
        from .ops import sampling as Samp
        z = Samp.surface_z_vals(safe, S, near_surface, far_surface,
                                fix_interval)
        p = rays_o[None, None, :] + rays_d[:, None, :] * z[..., None]
        return idx, rq, p.reshape(-1, 3), z, rays_d, d, c_gt

    (pix, rqs, queries, z_all, rd_all, d_all, c_all) = jax.lax.map(
        frame_queries, jnp.arange(F))
    const = {
        "z": z_all.reshape(F * P, S),
        "pts": queries.reshape(F * P, S, 3),
        "rays_d": rd_all.reshape(F * P, 3),
        "d_gt": d_all.reshape(F * P),
        "c_gt": c_all.reshape(F * P, 3),
    }
    from .parallel.mesh import shard_batch
    qf = queries.reshape(-1, 3)
    if mesh is None:
        D, I = Knn.knn_tiles(qf, *tile_index, k=k, probe=knn_probe)
    else:
        # dp-sharded phase search + weight build (see tracker.stage_knn)
        qf = shard_batch(mesh, qf)
        D, I = Knn.knn_tiles(qf, *tile_index, k=k, probe=knn_probe,
                             q_chunk=qf.shape[0])
    rq_rep = jnp.repeat(rqs.reshape(-1), S, axis=0)
    w, has = IT.interp_weights(D, I, qf, None, rq_rep,
                               min_nn, weighting, diff_pos=False)
    w = w[..., 0]  # (F*P*S, k)

    SK = S * k

    def unionize_dense(ids, w_r):
        """Per-pixel top-u union + per-sample weight remix, SCATTER-FREE.

        The original form (argsort + segment_sum + 4 vmapped .at[]
        scatters per row) measured ~116 ms device time for the 40000-row
        build — batched TPU scatters serialize — vs ~2 ms for this dense
        O(SK^2) comparison-matrix form (SK = S*k = 40: a (R, 40, 40)
        mask is ~64 MB of VPU work).  Same math: per pixel, the union of
        its S*k neighbour ids ranked by total |w|, top-u kept (ties by
        FIRST OCCURRENCE in sample-major order), zero-total slots padded
        with ``capacity``, and Wm[s, j] = sum of sample s's weights on
        union id j, L1-renormalised over the union."""
        R = ids.shape[0]
        wf = w_r.reshape(R, SK)
        iota = jax.lax.broadcasted_iota(jnp.int32, (R, SK), 1)
        eq = ids[:, :, None] == ids[:, None, :]              # (R, SK, SK)
        # total |w| of each position's id; only its FIRST occurrence
        # carries the score (others set to -1 so top_k never picks a
        # duplicate)
        tw = jnp.sum(jnp.where(eq, jnp.abs(wf)[:, None, :], 0.0), axis=2)
        first = jnp.min(jnp.where(eq, iota[:, None, :], SK), axis=2)
        score = jnp.where(first == iota, tw, -1.0)
        twk, sel = jax.lax.top_k(score, u_max)               # (R, u)
        uids_raw = jnp.take_along_axis(ids, sel, axis=1)
        uids = jnp.where(twk > 0, uids_raw, capacity)
        # Wm[s, j] = sum_t w[s, t] [ids[s*k+t] == union id j]; matching
        # against uids_raw (not the padded value) keeps zero-weight
        # slots exactly zero after the where() above
        match = (ids[:, None, :] == uids_raw[:, :, None]) \
            & (twk > 0)[..., None]                           # (R, u, SK)
        Wm = match.astype(w_r.dtype) * wf[:, None, :]        # (R, u, SK)
        Wm = jnp.sum(Wm.reshape(R, u_max, S, k), axis=3)     # (R, u, S)
        Wm = jnp.moveaxis(Wm, 1, 2)                          # (R, S, u)
        rs = jnp.sum(jnp.abs(Wm), axis=2, keepdims=True)
        Wm = jnp.where(rs > 1e-12, Wm / jnp.maximum(rs, 1e-12), 0.0)
        return uids.astype(jnp.int32), Wm

    ids, w_r = shard_batch(mesh, I.reshape(F * P, SK),
                           w.reshape(F * P, S, k))
    uids, Wm = unionize_dense(ids, w_r)
    return (pix,
            uids.reshape(F, P, u_max),
            Wm.reshape(F, P, S, u_max),
            has.reshape(F, P, S),
            const)


@jax.jit
def pack_union_cache(const, Wm, pmask, uids):
    """Pack every per-pixel phase-constant of the union cache into ONE
    flat f32 row: [z S | pts 3S | rays_d 3 | d_gt 1 | c_gt 3 | pmask S |
    Wm S*u | uids u (int32 bitcast)].

    One row-gather per ray then feeds the whole optimizer iteration —
    the eight separate table gathers it replaces were pure per-op launch
    latency (the iteration is op-count bound, see ops/fused_mlp.py).
    Call AFTER compact_scene so the packed uids are compact-table rows.
    ids are VALUE-encoded into f32 (ops/knn.pack_ids), never bitcast —
    bitcast ids are denormal patterns that SPMD resharding flushes to 0.
    """
    FP, S = const["z"].shape
    u = uids.shape[-1]
    return jnp.concatenate([
        const["z"],
        const["pts"].reshape(FP, S * 3),
        const["rays_d"],
        const["d_gt"][:, None],
        const["c_gt"],
        pmask.reshape(FP, S).astype(jnp.float32),
        Wm.reshape(FP, S * u),
        Knn_ids.pack_ids(uids.reshape(FP, u)),
    ], axis=1)


@jax.jit
def count_unique(cacheI):
    s = jnp.sort(cacheI.reshape(-1))
    return 1 + jnp.sum(s[1:] != s[:-1])


@functools.partial(jax.jit, static_argnames=("U",))
def compact_scene(cacheI, pos, geo, col, U: int):
    """Compact the scene to the feature rows the phase will touch.

    With the per-frame kNN cache, the whole phase scan can only ever gather
    rows listed in ``cacheI`` — so the dense Adam / gradient traffic over
    the full fixed-capacity arrays (the mapping wall-clock killer on TPU:
    the reference's frustum masking, Mapper.py:500-556, served the same
    purpose on CUDA) is replaced by a one-off gather into a U-row compact
    table, the scan over compact arrays, and a scatter back.

    Returns (uniq (U,) original row ids, padding == capacity;
             cacheI_c remapped cache; pos/geo/col compact (U, ...) tables).
    """
    cap = pos.shape[0]
    flat = cacheI.reshape(-1)
    uniq = jnp.unique(flat, size=U, fill_value=cap)
    remap = jnp.searchsorted(uniq, flat).astype(jnp.int32).reshape(cacheI.shape)
    safe = jnp.minimum(uniq, cap - 1)
    return uniq, remap, pos[safe], geo[safe], col[safe]


def unique_bucket(n: int, cap: int) -> int:
    """Compact-table size bucket: coarse ladder (few XLA program shapes as
    the cloud grows) with an explicit 262144 step — the largest table that
    still takes the fast scatter path (see ops/interpolate)."""
    for u in (8192, 32768, 131072, 262144):
        if n <= u:
            return min(u, cap)
    u = 524288
    while u < n:
        u <<= 1
    return min(u, cap)


def _scan_unroll(n: int) -> int:
    """Unroll factor for the per-stage optimizer scans: 2 when it divides
    the length (halves the while-loop bookkeeping of the op-count-bound
    iteration and lets XLA overlap adjacent iterations' independent ops),
    1 otherwise (a non-dividing unroll adds a remainder epilogue
    program)."""
    u = int(os.environ.get("HPSLAM_SCAN_UNROLL", "2"))
    return u if u > 1 and n % u == 0 else 1


@functools.partial(
    jax.jit,
    static_argnames=("mcfg", "rcfg", "level", "n_rays", "F_max", "H", "W",
                     "fx", "fy", "cx", "cy", "n_iters", "use_exposure",
                     "opt_color_dec", "opt_geo_dec", "w_color", "use_ba",
                     "use_union", "geo_iters", "mesh", "pool_thresh"),
    donate_argnames=("opt_params", "opt_state"))
def map_scan(params, mcfg: Dec.ModelConfig, rcfg: RenderConfig,
             opt_params, opt_state, key,
             colors, depths, c2ws, rq_map, cache_pix, cacheD, cacheI,
             expo_stack,
             pos, count,
             stage_ids, lr_table,
             F_actual,
             level: str,
             n_rays: int, F_max: int, H: int, W: int,
             fx: float, fy: float, cx: float, cy: float,
             n_iters: int, use_exposure: bool, opt_color_dec: bool,
             opt_geo_dec: bool, w_color: float, use_ba: bool = False,
             cam_trainable=None, use_union: bool = False,
             cache_packed=None, geo_iters: int = -1, mesh=None,
             pool_thresh: bool = True):
    """Run one LEVEL PHASE of the mapping schedule (mid stages or fine
    stages).

    The reference runs one 600-iteration loop over four stages with one
    shared Adam (Mapper.py:613-655).  Each stage only touches its own
    level's feature arrays, so the other level's gradients are exactly
    zero — splitting the schedule at the mid->fine boundary into two scans
    that each carry only the active level's features halves the dense Adam /
    zero-gradient memory traffic (the mapping bottleneck on TPU), and
    matches the reference up to the inactive level's decaying zero-gradient
    momentum tail (0.9^n) at the phase boundary.  The exposure-latent Adam
    state and step count are threaded through both phases (``opt_state``
    in/out), preserving the shared-optimizer semantics.

    opt_params: union path: {'feat' (U, 2C) packed [geo | col] table};
                 other paths: {'geo', 'col' (this level's feature arrays)};
                 plus optional 'dec', optional 'expo_feat',
                 optional 'cams' (F_max, 7) when use_ba
    stage_ids: (n_iters,) int32 in {0: geometry, 1: color}
    lr_table:  (n_iters, 4) per-group LRs [decoders, geo, col, BA_cam]
    cam_trainable: (F_max,) bool — BA optimizes all window poses except the
    oldest keyframe and padding (Mapper.py:574-576)
    cache_packed: union path only — ONE flat (F_max*P, D) table of every
    per-pixel phase-constant incl. the (compact-remapped) union ids
    (see pack_union_cache); cacheI is still passed for its static u_max
    geo_iters: host-known count of leading geometry iterations; >= 0
    selects the per-stage static scans (no per-iteration lax.switch)
    mesh: optional jax.sharding.Mesh — PRODUCTION multi-chip path: the
    per-iteration ray batch (cache-row gathers and everything downstream)
    is pinned to the mesh's ``dp`` axis; GSPMD partitions the per-ray
    render work and psums the feature/decoder gradients over ICI.  The
    compact feature table, decoders, and Adam state stay replicated.

    Returns (opt_params, opt_state, losses (n_iters, 2) [geo, color]).
    """
    from .parallel.mesh import shard_batch

    # the optimizable decoder sub-tree is carried FLAT (one vector) when
    # the caller passes 'dec_flat': per-leaf Adam over the ~22 small
    # decoder arrays costs ~200 extra HLO ops per iteration (the loop is
    # op-count bound, ops/fused_mlp.py); one flat vector runs Adam as one
    # fused elementwise chain and is unravelled only where the forward
    # needs the matrices
    def dec_structure():
        t = {}
        if opt_color_dec:
            t[f"col_{level}"] = params[f"col_{level}"]
        if opt_geo_dec:
            t[f"geo_{level}"] = params[f"geo_{level}"]
        return t

    if opt_color_dec or opt_geo_dec:
        from jax.flatten_util import ravel_pytree
        _, dec_unravel = ravel_pytree(dec_structure())

    def dec_tree_of(op):
        if "dec_flat" in op:
            return dec_unravel(op["dec_flat"])
        return op["dec"]

    def merged_params(op):
        pr = dict(params)
        if opt_color_dec or opt_geo_dec:
            dec = dec_tree_of(op)
            if opt_color_dec:
                pr[f"col_{level}"] = dec[f"col_{level}"]
            if opt_geo_dec:
                pr[f"geo_{level}"] = dec[f"geo_{level}"]
        return pr

    def window_poses(op):
        """(F_max, 3, 4) camera matrices — from the optimizable BA camera
        tensors when enabled, else the fixed window poses."""
        if not use_ba:
            return c2ws[:, :3, :]
        cams = jnp.where(cam_trainable[:, None], op["cams"],
                         jax.lax.stop_gradient(op["cams"]))
        return G.get_camera_from_tensor(cams)

    P = cache_pix.shape[1]
    if use_union:
        u_sz = cacheI.shape[-1]
        S_c = rcfg.N_surface

    def sample_rays(k, op):
        """n_rays spread over the F_actual active frames, drawn from the
        per-frame cached pixel subsets (see build_pixel_knn_cache).

        Union path: every per-ray quantity is a phase-constant precomputed
        by build_pixel_union_cache — one flat-row gather per table replaces
        ray generation, z sampling and the scattered window-stack reads.
        """
        fid = (jax.lax.broadcasted_iota(jnp.int32, (n_rays, 1), 0)[:, 0]
               % F_actual)
        slot = jax.random.randint(k, (n_rays,), 0, P)
        fid, slot = shard_batch(mesh, fid, slot)
        if use_union:
            # ONE packed-row gather feeds the whole iteration (see
            # pack_union_cache); slicing a gathered row is sequential reads
            row = shard_batch(mesh, cache_packed[fid * P + slot])  # (n, D)
            S_, u = S_c, u_sz
            o = 0
            z = row[:, o:o + S_]; o += S_
            pts = row[:, o:o + 3 * S_].reshape(-1, S_, 3); o += 3 * S_
            rays_d = row[:, o:o + 3]; o += 3
            d_gt = row[:, o]; o += 1
            c_gt = row[:, o:o + 3]; o += 3
            pm = row[:, o:o + S_] > 0.5; o += S_
            Wm = row[:, o:o + S_ * u].reshape(-1, S_, u); o += S_ * u
            uids = Knn_ids.unpack_ids(row[:, o:o + u])
            return fid, rays_d, d_gt, c_gt, z, pts, (uids, Wm, pm), row
        idx = cache_pix[fid, slot]
        i = (idx % W).astype(jnp.float32)
        j = (idx // W).astype(jnp.float32)
        jj, ii = idx // W, idx % W
        poses = window_poses(op)
        # per-frame rays (HIGHEST-precision small matmuls)
        dirs = jnp.stack([(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], -1)
        R = poses[fid, :3, :3]
        rays_d = jnp.einsum("nd,nkd->nk", dirs, R,
                            precision=jax.lax.Precision.HIGHEST)
        rays_o = poses[fid, :3, 3]
        d_gt = depths[fid, jj, ii]
        c_gt = colors[fid, jj, ii]
        rq = rq_map[fid, jj, ii]
        kk = cacheD.shape[-1]
        kcache = (cacheD[fid, slot].reshape(-1, kk),
                  cacheI[fid, slot].reshape(-1, kk))
        rays_o, rays_d, d_gt, c_gt, rq = shard_batch(
            mesh, rays_o, rays_d, d_gt, c_gt, rq)
        kcache = shard_batch(mesh, *kcache)
        return fid, rays_o, rays_d, d_gt, c_gt, rq, kcache

    def render_union(pr, stage, rays_d, z, pts3, feat_c, kcache):
        """Fused union-cache render (see build_pixel_union_cache): ONE
        u_max-row gather per ray from the packed [geo | col] feature table
        + (S, u) x (u, 2C) batched matmuls replace the per-sample k-row
        gathers of render_rays.  TPU gathers/scatters at these widths cost
        per ROW, not per byte — one 2C-wide row costs the same as a C-wide
        one, so packing halves the dominant per-iteration gather+scatter
        work of colour stages.  Weights, z values and sample positions are
        phase-constants, so only valid when poses are fixed (not BA)."""
        from .ops import composite as Co
        from .ops import interpolate as IT

        uids, Wm, pm = kcache
        n = rays_d.shape[0]
        S_pts = rcfg.N_surface
        C = mcfg.c_dim
        pts = pts3.reshape(-1, 3)
        pmf = pm.reshape(-1)
        c_all = IT.union_gather(feat_c, uids, Wm).reshape(
            -1, feat_c.shape[-1])
        c_all = jnp.where(pmf[:, None], c_all, 0.0)
        c_geo = c_all[:, :C]
        vmask = Dec.valid_ray_mask(pmf, S_pts, rcfg.N_surface)
        if mcfg.fused_composite and Dec.fused_usable(mcfg):
            # trunks + occupancy compositor in one kernel pair
            # (ops/fused_mlp.nicer_fused_composite); exposure still
            # applies to the composited colour outside, as below
            from .ops import fused_mlp as FM
            gd = pr[f"geo_{level}"]
            cd = pr[f"col_{level}"]
            depth, unc, color = FM.nicer_fused_composite(
                c_geo, c_all[:, C:], pts, z, pm.astype(jnp.float32),
                tuple(FM.flatten_core(gd["core"])),
                tuple(FM.flatten_core(cd["core"])),
                (gd["B"], cd["B"]), mcfg.n_blocks, mcfg.skip,
                stage.startswith("color"), S_pts,
                float(rcfg.sigmoid_coef), True,
                not mcfg.encode_exposure)
            return depth, unc, color, vmask
        if stage.startswith("color"):
            c_col = c_all[:, C:]
            if Dec.fused_usable(mcfg):
                # one Pallas kernel for both trunks (exposure deferred);
                # pts are phase constants -> skip the dp backward
                occ, rgb = Dec.fused_color_pair(
                    pr[f"geo_{level}"], pr[f"col_{level}"], mcfg, pts,
                    c_geo, c_col, exposure_feat=None, need_dp=False)
            else:
                occ = Dec.apply_geo(pr[f"geo_{level}"], mcfg, pts, c_geo)
                views_d = (jnp.repeat(rays_d, S_pts, axis=0)
                           if mcfg.use_view_direction else None)
                rgb = Dec.apply_color(pr[f"col_{level}"], mcfg, pts, c_col,
                                      views_d=views_d, exposure_feat=None)
        else:
            occ = (Dec.fused_geo(pr[f"geo_{level}"], mcfg, pts, c_geo,
                                 need_dp=False)
                   if Dec.fused_usable(mcfg)
                   else Dec.apply_geo(pr[f"geo_{level}"], mcfg, pts, c_geo))
            rgb = jnp.zeros((pts.shape[0], 3))
        occ = jnp.where(pmf, occ, -100.0)
        raw = jnp.concatenate([rgb, occ[:, None]], -1).reshape(n, S_pts, 4)
        depth, unc, color, _ = Co.raw2outputs(
            raw, z, rays_d, occupancy=rcfg.occupancy, coef=rcfg.sigmoid_coef)
        return depth, unc, color, vmask

    # 'inside' depth-outlier threshold (reference Mapper.py's per-batch
    # median/max filter): each iteration's batch is a uniform draw from the
    # cached pixel pool, so the pool statistics equal the batch statistics
    # up to O(1/sqrt(n_rays)) sampling noise — compute the threshold ONCE
    # per phase instead of sorting 10k depths inside every scan iteration
    # (the loop is op-count bound, ops/fused_mlp.py).  Uses the lower
    # median; ABLATIONS.md ref_semantics bounds the combined drift.
    if pool_thresh:
        pj, pi = cache_pix // W, cache_pix % W
        d_pool = depths[jnp.arange(F_max)[:, None], pj, pi]
        validf = jnp.arange(F_max)[:, None] < F_actual
        sd = jnp.sort(jnp.where(validf, d_pool, jnp.inf).reshape(-1))
        n_val = F_actual * cache_pix.shape[1]
        med = sd[jnp.maximum((n_val - 1) // 2, 0)]
        mx = sd[jnp.maximum(n_val - 1, 0)]
        inside_thresh = jnp.minimum(10.0 * med, 1.2 * mx)

    # whole-iteration fused objective (ops/fused_mlp.nicer_fused_maploss):
    # trunks + compositor + exposure + masked L1 losses + union-mix
    # backward in ONE kernel pair — per-iteration XLA shrinks to the two
    # row gathers, the feature scatter-add, the affine table and Adam
    # (mesh: GSPMD cannot partition the Pallas custom-call — the sharded
    # path keeps the XLA iteration, whose ops GSPMD splits over dp)
    use_fused_loss = (use_union and mcfg.fused_composite
                      and Dec.fused_usable(mcfg) and mesh is None)

    def exposure_sel(op, fid, dtype=jnp.float32):
        """Per-ray exposure affine rows via one-hot matmul (see below)."""
        dec = merged_params(op)[f"col_{level}"]
        ef = jax.lax.stop_gradient(expo_stack)
        if "expo_feat" in op:
            ef = ef.at[F_actual - 1].set(op["expo_feat"])
        rots, transs = jax.vmap(
            lambda e: Dec.exposure_affine(dec, e))(ef)
        oh = (fid[:, None] == jnp.arange(F_max)[None, :]).astype(dtype)
        aff = jnp.concatenate([rots.reshape(F_max, 9), transs], axis=1)
        return jnp.matmul(oh, aff)                           # (n, 12)

    def stage_loss(op, k, stage):
        # geometry iterations never read the colour decoder (the fused
        # kernel zeroes rgb when with_color=False, and the XLA geo stage
        # calls only apply_geo), and the geo decoder is frozen unless
        # opt_geo_dec — so with only the colour decoder optimizable the
        # merged_params unravel (22 slice ops forward + their concat
        # backward, per iteration) is dead weight on geometry stages.
        # dec_flat still rides through Adam with exactly-zero grads,
        # preserving the reference's shared-optimizer momentum decay.
        geo_stage = stage.startswith("geometry")
        pr = (params if (geo_stage and not opt_geo_dec)
              else merged_params(op))
        if use_union:
            (fid, rays_d, d_gt, c_gt, z_c, pts_c, kcache,
             row) = sample_rays(k, op)
        else:
            fid, rays_o, rays_d, d_gt, c_gt, rq, kcache = sample_rays(k, op)
        inside = (d_gt <= inside_thresh if pool_thresh
                  else d_gt <= jnp.minimum(10.0 * jnp.median(d_gt),
                                           1.2 * jnp.max(d_gt)))
        if use_fused_loss:
            from .ops import fused_mlp as FM
            uids = kcache[0]
            n = row.shape[0]
            u_sz_ = uids.shape[-1]
            with_color = stage.startswith("color")
            Cd_ = mcfg.c_dim
            # geometry stages gather/scatter only the geo half of the
            # feature rows — the colour columns have zero cotangent there
            # and the row gather + duf scatter-add dominate the
            # per-iteration XLA cost
            feat_v = op["feat"] if with_color else op["feat"][:, :Cd_]
            uf = feat_v[uids].reshape(n, -1)
            okf = ((d_gt > 0) & inside).astype(jnp.float32)[:, None]
            use_aff = bool(use_exposure) and with_color
            aff = (exposure_sel(op, fid) if use_aff
                   else jnp.zeros((n, 12), jnp.float32))
            gd = pr[f"geo_{level}"]
            cd = pr[f"col_{level}"]
            gl, cl = FM.nicer_fused_maploss(
                uf, aff, tuple(FM.flatten_core(cd["core"])), row, okf,
                tuple(FM.flatten_core(gd["core"])), (gd["B"], cd["B"]),
                mcfg.n_blocks, mcfg.skip, with_color, rcfg.N_surface,
                u_sz_, mcfg.c_dim, float(rcfg.sigmoid_coef),
                not mcfg.encode_exposure, use_aff, float(w_color),
                need_wgrads=opt_color_dec)
            if with_color:
                return gl + w_color * cl, gl, cl
            return gl, gl, jnp.zeros(())

        def run_stage(stage):
            if use_union:
                depth, unc, color, vmask = render_union(
                    pr, stage, rays_d, z_c, pts_c, op["feat"], kcache)
            else:
                depth, unc, color, vmask = render_rays(
                    pr, mcfg, rcfg, stage, rays_o, rays_d, d_gt,
                    pos, count, op["geo"], op["col"], rq, is_tracker=use_ba,
                    exposure_feat=None, knn_cache=kcache)
            mask = (d_gt > 0) & vmask & jnp.isfinite(depth) & inside
            geo_loss = jnp.sum(jnp.where(mask, jnp.abs(d_gt - depth), 0.0))
            if stage.startswith("geometry"):
                return geo_loss, geo_loss, jnp.zeros(())
            if use_exposure:
                # per-frame colour affine on raw decoder output, then
                # sigmoid (Mapper.py:802-856); current frame's latent is
                # optimizable, keyframes' are frozen.  Per-ray affines are
                # selected by ONE-HOT MATMUL, not rots[fid] row gather —
                # the gather's backward is a 10k-row scatter-add (~1 ms
                # at the ScanNet budget); the (n, F) x (F, 12) matmul and
                # its transpose run on the MXU for ~free.
                dec = pr[f"col_{level}"]
                ef = jax.lax.stop_gradient(expo_stack)
                if "expo_feat" in op:
                    ef = ef.at[F_actual - 1].set(op["expo_feat"])
                rots, transs = jax.vmap(
                    lambda e: Dec.exposure_affine(dec, e))(ef)
                n = color.shape[0]
                oh = (fid[:, None] == jnp.arange(F_max)[None, :]
                      ).astype(color.dtype)                      # (n, F)
                aff = jnp.concatenate(
                    [rots.reshape(F_max, 9), transs], axis=1)    # (F, 12)
                sel = jnp.matmul(oh, aff)                        # (n, 12)
                rot = sel[:, :9].reshape(n, 3, 3)
                tr = sel[:, 9:]
                color = jnp.einsum("nc,ncd->nd", color, rot,
                                   precision=jax.lax.Precision.HIGHEST) + tr
                color = jax.nn.sigmoid(color)
            col_loss = jnp.sum(
                jnp.where(mask[:, None], jnp.abs(c_gt - color), 0.0))
            return geo_loss + w_color * col_loss, geo_loss, col_loss

        return run_stage(stage)

    def lr_tree_for(lrs):
        if use_union:
            # packed [geo | col] feature table: per-column-group LRs
            C = mcfg.c_dim
            tree = {"feat": jnp.concatenate(
                [jnp.full((C,), lrs[1]), jnp.full((C,), lrs[2])])}
        else:
            tree = {"geo": lrs[1], "col": lrs[2]}
        if "dec_flat" in opt_params:
            tree["dec_flat"] = lrs[0]
        elif opt_color_dec or opt_geo_dec:
            tree["dec"] = jax.tree.map(lambda _: lrs[0], opt_params["dec"])
        if use_exposure and "expo_feat" in opt_params:
            tree["expo_feat"] = jnp.asarray(0.001)
        if use_ba:
            tree["cams"] = lrs[3]
        return tree

    def step_for(stage):
        def step(carry, xs):
            op, ostate = carry
            k, lrs = xs

            def scalar_loss(o):
                total, geo_l, col_l = stage_loss(o, k, stage)
                return total, (geo_l, col_l)

            (loss, (geo_l, col_l)), grads = jax.value_and_grad(
                scalar_loss, has_aux=True)(op)
            op, ostate = Opt.update(grads, ostate, op, lr_tree_for(lrs))
            return (op, ostate), jnp.stack([geo_l, col_l])
        return step

    keys = jax.random.split(key, n_iters)
    if geo_iters >= 0:
        # the schedule is contiguous (geometry then colour,
        # build_schedule) and geo_iters is host-known — run one scan per
        # stage with the stage STATIC instead of a per-iteration lax.cond
        # (the conditional wrapper measured ~0.5 ms/iter of pure overhead
        # at the ScanNet operating point)
        g = min(geo_iters, n_iters)
        carry = (opt_params, opt_state)
        parts = []
        if g > 0:
            carry, lg = jax.lax.scan(
                step_for(f"geometry_{level}"), carry,
                (keys[:g], lr_table[:g]),
                unroll=_scan_unroll(g))
            parts.append(lg)
        if n_iters - g > 0:
            carry, lc = jax.lax.scan(
                step_for(f"color_{level}"), carry,
                (keys[g:], lr_table[g:]),
                unroll=_scan_unroll(n_iters - g))
            parts.append(lc)
        (opt_params, opt_state) = carry
        losses = (jnp.concatenate(parts) if parts
                  else jnp.zeros((0, 2), jnp.float32))
        return opt_params, opt_state, losses

    # legacy path: dynamic per-iteration stage dispatch
    def step_dyn(carry, xs):
        op, ostate = carry
        k, stage_id, lrs = xs

        def scalar_loss(o):
            total, geo_l, col_l = jax.lax.switch(stage_id, [
                lambda: stage_loss(o, k, f"geometry_{level}"),
                lambda: stage_loss(o, k, f"color_{level}"),
            ])
            return total, (geo_l, col_l)

        (loss, (geo_l, col_l)), grads = jax.value_and_grad(
            scalar_loss, has_aux=True)(op)
        op, ostate = Opt.update(grads, ostate, op, lr_tree_for(lrs))
        return (op, ostate), jnp.stack([geo_l, col_l])

    (opt_params, opt_state), losses = jax.lax.scan(
        step_dyn, (opt_params, opt_state), (keys, stage_ids, lr_table))
    return opt_params, opt_state, losses


# ---------------------------------------------------------------------------
# host-side schedule construction

def build_schedule(n_joint: int, mid_ratio: float, geo_ratio: float,
                   init: bool, geo_iter_first: int, lr_cfg: dict,
                   ba_cam_lr: float = 0.0, color_refine: bool = False):
    """Per-phase (mid, fine) stage ids + 4-group LR tables.

    Reproduces Mapper.py:633-666 exactly: over the joint iteration counter,
    stage boundaries are at geo_iter_first (init) / num_mid*geo_ratio,
    num_mid, and num_mid + num_fine*geo_ratio; here the first num_mid+1
    iterations form the mid phase and the rest the fine phase.  BA camera
    LR is enabled only inside the two sub-windows
    [geo_ratio+0.2, geo_ratio+0.3] of each phase (Mapper.py:657-666).
    ``color_refine`` applies the end-of-sequence LR overrides
    (Mapper.py:647-652: geometry feature LRs zero, colour LR / 10).

    Returns {"mid": (stage_ids, lr_table), "fine": (stage_ids, lr_table)}
    with stage id 0 = geometry, 1 = color and LR columns
    [decoders, geometry_level, color_level, BA_cam].
    """
    num_mid = int(n_joint * mid_ratio)
    num_fine = int(n_joint * (1 - mid_ratio))
    A = geo_iter_first if init else int(num_mid * geo_ratio)
    B = num_mid
    C = int(num_mid + num_fine * geo_ratio)
    block = lr_cfg["init"] if init else lr_cfg["stage"]
    out = {}
    for level, rng_ in (("mid", range(0, min(B, n_joint - 1) + 1)),
                        ("fine", range(min(B, n_joint - 1) + 1, n_joint))):
        names = {0: f"geometry_{level}", 1: f"color_{level}"}
        ids, lrs = [], []
        for j in rng_:
            if level == "mid":
                s = 0 if j <= A else 1
                ba_on = (num_mid * (geo_ratio + 0.2) <= j
                         <= num_mid * (geo_ratio + 0.3))
            else:
                s = 0 if j <= C else 1
                ba_on = (num_mid + num_fine * (geo_ratio + 0.2) <= j
                         <= num_mid + num_fine * (geo_ratio + 0.3))
            g = block[names[s]]
            ids.append(s)
            if color_refine:
                # end-of-sequence refinement freezes the colour decoder too
                # (src/Mapper.py:1066 sets fix_color_decoder = True): only
                # the colour features move, at color_lr / 10.
                cf = block[f"color_{level}"]
                lrs.append([0.0, 0.0, cf["color_lr"] / 10.0, 0.0])
            else:
                lrs.append([g["decoders_lr"], g[f"geometry_{level}_lr"],
                            g["color_lr"], ba_cam_lr if ba_on else 0.0])
        out[level] = (np.asarray(ids, np.int32),
                      np.asarray(lrs, np.float32).reshape(-1, 4))
    return out


def bucket_iters(n: int, base: int) -> int:
    """Snap the more-iters-when-adding count to a small bucket set to bound
    XLA recompiles (the reference recreates its Python loop freely,
    Mapper.py:605-608; we trade <=12%% iteration-count deviation for a
    fixed set of compiled programs)."""
    buckets = sorted({max(1, int(base * f))
                      for f in (0.95, 1.0, 1.25, 1.5, 2.0)})
    return min(buckets, key=lambda b: abs(b - n))


class Mapper:
    """Host-side driver: point adding, keyframe window assembly, schedule
    construction, and the jitted map_scan call."""

    def __init__(self, cfg: dict, slam):
        self.cfg = cfg
        self.slam = slam
        m = cfg["mapping"]
        self.every_frame = m["every_frame"]
        self.iters = m["iters"]
        self.iters_first = m["iters_first"]
        self.geo_iter_first = m["geo_iter_first"]
        self.geo_iter_ratio = m["geo_iter_ratio"]
        self.mid_iter_ratio = m["mid_iter_ratio"]
        self.mapping_pixels = m["pixels"]
        self.pixels_adding = m["pixels_adding"]
        self.pixels_color_grad = m.get("pixels_based_on_color_grad", 0)
        self.window_size = m["mapping_window_size"]
        self.keyframe_every = m["keyframe_every"]
        self.w_color = m["w_color_loss"]
        self.more_iters_when_adding = m["more_iters_when_adding"]
        self.min_iter_ratio = m["min_iter_ratio"]
        self.filter_before_add = m["filter_before_add_points"]
        self.kf_selection_method = m["keyframe_selection_method"]
        self.fix_color_decoder = m["fix_color_decoder"]
        self.fix_geo_mid = m["fix_geo_decoder_mid"]
        self.fix_geo_fine = m["fix_geo_decoder_fine"]
        self.lr_cfg = {"init": m["init"], "stage": m["stage"]}
        self.use_exposure = cfg["model"]["encode_exposure"]
        self.radius_hierarchy = cfg["pointcloud"]["radius_hierarchy"]
        self.radius_query_ratio = cfg["pointcloud"]["radius_query_ratio"]
        self.color_grad_threshold = cfg["pointcloud"]["color_grad_threshold"]
        self.rcfg = RenderConfig.from_cfg(cfg, "sigmoid_coef_mapper")
        self.rng = np.random.default_rng(cfg.get("seed", 1219))
        self.prev_c2w: Optional[np.ndarray] = None
        self.keyframe_list: List[int] = []
        self.keyframe_dict: List[dict] = []
        self.selected_keyframes: Dict[int, list] = {}

    def _zero_slot(self, H: int, W: int):
        """Cached device-resident zero frame for window padding slots."""
        if getattr(self, "_zeros_hw", None) != (H, W):
            self._zeros_hw = (H, W)
            self._zeros = {"c": jnp.zeros((H, W, 3), jnp.float32),
                           "d": jnp.zeros((H, W), jnp.float32),
                           "p": jnp.zeros((H * W,), jnp.int32)}
        return self._zeros

    # -- point adding -------------------------------------------------------
    def _sample_valid(self, depth: np.ndarray, n: int):
        pool = IM.valid_pixel_pool(depth, 0, depth.shape[0], 0, depth.shape[1])
        sel = pool[self.rng.integers(0, pool.shape[0], size=n)]
        jj, ii = np.unravel_index(sel, depth.shape)
        return ii, jj

    def add_points_for_frame(self, idx, frame, c2w, npc, r_add,
                             r_query=None) -> int:
        """Non-overlap + overlap insertion batches (Mapper.py:391-462),
        plus optional colour-gradient-targeted additions
        (Mapper.py:464-482, pixels_based_on_color_grad)."""
        slam = self.slam
        H, W = frame.depth.shape
        if idx == 0:
            med = float(np.median(frame.depth[frame.depth > 0])) if \
                (frame.depth > 0).any() else 2.5
            n_add = int(np.clip(self.pixels_adding * (med / 2.5) ** 2,
                                self.pixels_adding, self.pixels_adding * 3))
        else:
            n_add = self.pixels_adding

        ii, jj = self._sample_valid(frame.depth, n_add)
        dirs = np.stack([(ii - slam.cx) / slam.fx, -(jj - slam.cy) / slam.fy,
                         -np.ones_like(ii, np.float64)], -1).astype(np.float32)
        rays_d = (dirs @ c2w[:3, :3].T).astype(np.float32)
        rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape).astype(np.float32)
        depth_s = frame.depth[jj, ii]
        color_s = frame.color[jj, ii]

        total_fine = 0
        if self.filter_before_add and idx != 0:
            prev_w2c = jnp.asarray(np.linalg.inv(self.prev_c2w))
            pts = jnp.asarray(rays_o + rays_d * depth_s[:, None])
            visible = np.asarray(reprojection_visible(
                pts, prev_w2c, slam.fx, slam.fy, slam.cx, slam.cy, H, W))
            mask_add = ~visible  # new territory
            for level in ("fine", "mid"):
                n = npc.add_neural_points(
                    rays_o, rays_d, depth_s, color_s, level,
                    dynamic_radius=r_add[level][jj, ii], valid=mask_add,
                    record_input=(level == "fine"))
                if level == "fine":
                    total_fine += n
            # overlap batch: 1000 extra pixels restricted to seen territory
            ii2, jj2 = self._sample_valid(frame.depth, 1000)
            dirs2 = np.stack([(ii2 - slam.cx) / slam.fx,
                              -(jj2 - slam.cy) / slam.fy,
                              -np.ones_like(ii2, np.float64)], -1).astype(np.float32)
            rays_d2 = (dirs2 @ c2w[:3, :3].T).astype(np.float32)
            rays_o2 = np.broadcast_to(c2w[:3, 3], rays_d2.shape).astype(np.float32)
            depth2 = frame.depth[jj2, ii2]
            color2 = frame.color[jj2, ii2]
            pts2 = jnp.asarray(rays_o2 + rays_d2 * depth2[:, None])
            visible2 = np.asarray(reprojection_visible(
                pts2, prev_w2c, slam.fx, slam.fy, slam.cx, slam.cy, H, W))
            for level in ("fine", "mid"):
                n = npc.add_neural_points(
                    rays_o2, rays_d2, depth2, color2, level,
                    dynamic_radius=r_add[level][jj2, ii2], valid=visible2,
                    record_input=(level == "fine"))
                if level == "fine":
                    total_fine += n
        else:
            for level in ("fine", "mid"):
                n = npc.add_neural_points(
                    rays_o, rays_d, depth_s, color_s, level,
                    dynamic_radius=r_add[level][jj, ii],
                    record_input=(level == "fine"))
                if level == "fine":
                    total_fine += n

        if self.pixels_color_grad > 0:
            # top colour-gradient locations, added with the smaller
            # is_pts_grad radius semantics (Mapper.py:464-482)
            pool = IM.top_grad_index_pool(
                frame.color, self.pixels_color_grad, 0, H, 0, W, ratio=5,
                gt_depth=frame.depth)
            if pool.size > 0:
                sel = self.rng.choice(
                    pool, size=min(self.pixels_color_grad, pool.size),
                    replace=False)
                jj2, ii2 = np.unravel_index(sel, (H, W))
                dirs2 = np.stack(
                    [(ii2 - slam.cx) / slam.fx, -(jj2 - slam.cy) / slam.fy,
                     -np.ones_like(ii2, np.float64)], -1).astype(np.float32)
                rays_d2 = (dirs2 @ c2w[:3, :3].T).astype(np.float32)
                rays_o2 = np.broadcast_to(c2w[:3, 3],
                                          rays_d2.shape).astype(np.float32)
                for level in ("fine", "mid"):
                    n = npc.add_neural_points(
                        rays_o2, rays_d2, frame.depth[jj2, ii2],
                        frame.color[jj2, ii2], level,
                        dynamic_radius=r_add[level][jj2, ii2],
                        is_pts_grad=True, record_input=(level == "fine"))
                    if level == "fine":
                        total_fine += n
        return int(total_fine)

    # -- window assembly ----------------------------------------------------
    def select_window(self, idx, frame, c2w, method: Optional[str] = None):
        """Keyframe ids to optimize, ending with [last_kf, current]
        (Mapper.py:346-363)."""
        slam = self.slam
        method = method or self.kf_selection_method
        win = getattr(self, "_effective_window", self.window_size)
        if len(self.keyframe_dict) == 0:
            frames = []
        elif method == "global":
            num = win - 2
            frames = list(range(max(0, len(self.keyframe_dict) - 1 - num),
                                len(self.keyframe_dict) - 1))
        else:
            frames = keyframe_selection_overlap(
                self.rng, frame.depth, c2w,
                [kf["est_c2w"] for kf in self.keyframe_dict[:-1]],
                win - 2, slam.fx, slam.fy, slam.cx, slam.cy)
        if len(self.keyframe_list) > 0:
            frames = frames + [len(self.keyframe_list) - 1]
        frames = frames + [-1]
        return frames

    # -- main ---------------------------------------------------------------
    def map(self, idx: int, frame, npc, params, exposure_feat, key, c2w,
            F_max: Optional[int] = None, color_refine: bool = False):
        """Map one frame.  Returns (params, exposure_feat, info).

        color_refine: end-of-sequence colour-only refinement pass
        (Mapper.py:1061-1068: doubled window, global keyframe selection,
        no point adding, colour LR / 10).
        """
        slam = self.slam
        H, W = frame.depth.shape
        init = idx == 0

        # long sequences use a doubled window (Mapper.py:1058-1059)
        base_window = self.window_size * (2 if slam.n_img > 4000 else 1)
        self._effective_window = base_window * (2 if color_refine else 1)
        kf_method = "global" if color_refine else self.kf_selection_method

        r_add, r_query = IM.dynamic_radii(
            frame.color, self.radius_hierarchy, self.radius_query_ratio,
            self.color_grad_threshold)

        window = self.select_window(idx, frame, c2w, kf_method)
        if self.cfg["mapping"].get("save_selected_keyframes_info", True):
            info_list = []
            for f in window:
                fi = self.keyframe_list[f] if f != -1 else idx
                info_list.append({"idx": int(fi)})
            self.selected_keyframes[idx] = info_list

        if color_refine:
            frame_pts_add = 0
        else:
            frame_pts_add = self.add_points_for_frame(idx, frame, c2w, npc,
                                                      r_add, r_query)

        # BA starts once enough keyframes exist (Mapper.py:1152-1153)
        use_ba = (not color_refine and len(self.keyframe_list) > 4
                  and self.cfg["mapping"]["BA"])

        # iteration budget (Mapper.py:605-608) with bucketing
        n_joint = self.iters_first if init else self.iters
        if color_refine:
            n_joint = self.iters * 2  # iters*10 over 5 outer passes
        elif self.more_iters_when_adding and idx > 0:
            n = int(np.clip(n_joint * frame_pts_add / 300,
                            int(self.min_iter_ratio * n_joint), 2 * n_joint))
            # exact_iter_counts: reference-semantics ablation knob — use
            # the exact count (unbounded XLA program variants) instead of
            # the <=12%-deviation bucket ladder
            n_joint = (n if self.cfg["mapping"].get("exact_iter_counts")
                       else bucket_iters(n, self.iters))
        schedules = build_schedule(
            n_joint, self.mid_iter_ratio,
            0.0 if color_refine else self.geo_iter_ratio, init,
            self.geo_iter_first, self.lr_cfg,
            ba_cam_lr=self.cfg["mapping"]["BA_cam_lr"] if use_ba else 0.0,
            color_refine=color_refine)

        # window stacks, padded to F_max — assembled ON DEVICE from the
        # device-resident keyframe twins (uploading ~90 MB of window stacks
        # per mapped frame dominated mapping wall-clock before)
        F_actual = len(window)
        if F_max is None:
            F_max = max(getattr(self, "_effective_window", self.window_size)
                        + 2, F_actual)
        z = self._zero_slot(H, W)
        cols_l, deps_l, rqm_l, rqf_l, pools_l = [], [], [], [], []
        c2ws = np.tile(np.eye(4, dtype=np.float32), (F_max, 1, 1))
        pool_lens = np.ones((F_max,), np.int32)
        expo = np.zeros((F_max, self.cfg["model"]["exposure_dim"]), np.float32)

        for slot, f in enumerate(window):
            if f == -1:
                cols_l.append(frame.color_j)
                deps_l.append(frame.depth_j)
                rqm_l.append(jnp.asarray(r_query["mid"]))
                rqf_l.append(jnp.asarray(r_query["fine"]))
                pool = IM.valid_pixel_pool(frame.depth, 0, H, 0, W)
                pj = np.zeros((H * W,), np.int32)
                pj[: pool.size] = pool
                pools_l.append(jnp.asarray(pj))
                pool_lens[slot] = max(pool.size, 1)
                c2ws[slot] = c2w
                expo[slot] = np.asarray(exposure_feat)
            else:
                kf = self.keyframe_dict[f]
                cols_l.append(kf["color_j"])
                deps_l.append(kf["depth_j"])
                rqm_l.append(kf["rqm_j"])
                rqf_l.append(kf["rqf_j"])
                pools_l.append(kf["pool_j"])
                pool_lens[slot] = kf["pool_len"]
                c2ws[slot] = kf["est_c2w"]
                expo[slot] = kf.get(
                    "exposure_feat",
                    np.zeros_like(np.asarray(exposure_feat)))
        pad_n = F_max - F_actual
        colors = jnp.stack(cols_l + [z["c"]] * pad_n)
        depths_dev = jnp.stack(deps_l + [z["d"]] * pad_n)
        rqm = jnp.stack(rqm_l + [z["d"]] * pad_n)
        rqf = jnp.stack(rqf_l + [z["d"]] * pad_n)
        pools = jnp.stack(pools_l + [z["p"]] * pad_n)

        # optimizable pytrees, one phase per level (see map_scan docstring)
        opt_color_dec = not self.fix_color_decoder
        opt_geo_dec = not (self.fix_geo_mid and self.fix_geo_fine)
        # Pallas-fused trunks return zero cotangents for the geometry core
        # (frozen in the reference default) — fall back when unfreezing it
        mcfg_run = (dataclasses.replace(slam.mcfg, fused_mlp=False)
                    if opt_geo_dec else slam.mcfg)
        n_rays = self.mapping_pixels
        new_params = dict(params)
        new_expo = exposure_feat
        losses_all = []
        shared_ostate = None  # threads decoder/exposure Adam moments

        depths_j = depths_dev
        c2ws_j = jnp.asarray(c2ws)
        pools_j = pools
        pool_lens_j = jnp.asarray(pool_lens)
        # cached-pixel pool size per window frame (see build_pixel_knn_cache):
        # several times the per-frame ray budget so each scan iteration still
        # sees a fresh subset.
        P = int(self.cfg["mapping"].get(
            "pixels_knn_cache",
            max(2000, 4 * (n_rays // max(1, F_actual)))))
        common = dict(
            colors=colors, depths=depths_j,
            c2ws=c2ws_j, expo_stack=jnp.asarray(expo))

        # BA camera tensors: window poses as 7-vectors; the oldest keyframe
        # and padding slots stay frozen (Mapper.py:574-576)
        cam_tensors = np.zeros((F_max, 7), np.float32)
        cam_trainable = np.zeros((F_max,), bool)
        if use_ba:
            kf_ids = [self.keyframe_list[f] if f != -1 else idx
                      for f in window]
            oldest_slot = int(np.argmin(kf_ids))
            for slot in range(F_actual):
                cam_tensors[slot] = G.get_tensor_from_camera_np(c2ws[slot])
                cam_trainable[slot] = slot != oldest_slot
        cam_tensors_j = jnp.asarray(cam_tensors)

        # union-dedup fast path: valid when interpolation weights are
        # phase-constants — poses fixed (no BA) and no per-pair rel-pos
        # encoding (ScanNet headline config qualifies)
        use_union = (not use_ba
                     and not slam.mcfg.encode_rel_pos_in_col
                     and not slam.mcfg.encode_rel_pos_in_geo)
        # union truncation: 8 is ATE-neutral vs exact u=S*k (ABLATIONS.md
        # union8) and halves the per-iteration gather/scatter row count —
        # the measured mapping bottleneck
        u_max = int(self.cfg["mapping"].get("union_size", 8))

        keys = jax.random.split(key, 4)

        # ---- pass 1: build BOTH levels' caches and PREFETCH the unique
        # counts.  The count is the one scalar the host must read before
        # it can pick the compact-table bucket, and a scalar fetch through
        # the tunnelled runtime costs ~62 ms (QUALITY.md per-phase
        # budget); enqueueing both builds first and arming
        # copy_to_host_async lets the mid count transfer while the fine
        # cache build executes, making both int() reads ~free.  Safe to
        # hoist: cache builds depend only on the frozen window poses
        # (c2ws_j — never updated inside this loop, even under BA) and
        # the level's positions/index, which the scans do not touch.
        built = {}
        for phase_i, level in enumerate(("mid", "fine")):
            stage_ids, lr_table = schedules[level]
            if stage_ids.size == 0:
                continue
            lv = npc.levels[level]
            cacheD = cacheWm = cachePmask = cache_const = None
            if use_union:
                cache_pix, cacheI, cacheWm, cachePmask, cache_const = \
                    build_pixel_union_cache(
                        keys[2 + phase_i], depths_j, c2ws_j, pools_j,
                        pool_lens_j,
                        rqm if level == "mid" else rqf,
                        npc.index(level), jnp.int32(lv.capacity),
                        P=P, S=self.rcfg.N_surface, k=self.rcfg.nn_num,
                        u_max=u_max, H=H, W=W,
                        fx=slam.fx, fy=slam.fy, cx=slam.cx, cy=slam.cy,
                        near_surface=self.rcfg.near_end_surface,
                        far_surface=self.rcfg.far_end_surface,
                        min_nn=slam.mcfg.min_nn_num,
                        weighting=slam.mcfg.weighting,
                        colors=colors, fix_interval=self.rcfg.fix_interval,
                        knn_probe=int(self.cfg["mapping"].get("knn_probe",
                                                              12)),
                        mesh=getattr(slam, "mesh", None))
            else:
                cache_pix, cacheD, cacheI = build_pixel_knn_cache(
                    keys[2 + phase_i], depths_j, c2ws_j, pools_j,
                    pool_lens_j,
                    npc.index(level), P=P, S=self.rcfg.N_surface,
                    k=self.rcfg.nn_num, H=H, W=W,
                    fx=slam.fx, fy=slam.fy, cx=slam.cx, cy=slam.cy,
                    near_surface=self.rcfg.near_end_surface,
                    far_surface=self.rcfg.far_end_surface,
                    mesh=getattr(slam, "mesh", None))
            cnt = count_unique(cacheI)
            try:
                cnt.copy_to_host_async()
            except Exception:  # noqa: BLE001 — prefetch is best-effort
                pass
            built[level] = (phase_i, stage_ids, lr_table, lv, cache_pix,
                            cacheI, cacheD, cacheWm, cachePmask,
                            cache_const, cnt)

        # ---- pass 2: compact + optimize per level
        for level in ("mid", "fine"):
            if level not in built:
                continue
            (phase_i, stage_ids, lr_table, lv, cache_pix, cacheI, cacheD,
             cacheWm, cachePmask, cache_const, cnt) = built[level]
            # map_scan's static geo/color split requires a contiguous
            # geometry-then-colour schedule (build_schedule guarantees it;
            # assert here so an interleaved schedule can't silently run
            # iterations under the wrong stage)
            n_geo = int(np.sum(stage_ids == 0))
            assert (stage_ids[:n_geo] == 0).all() and \
                (stage_ids[n_geo:] == 1).all(), \
                "map_scan static split needs contiguous geometry prefix"
            # compact the scene to the rows this phase can touch (see
            # compact_scene) — the scan's Adam then runs over U rows
            # instead of the full capacity
            U = unique_bucket(int(cnt), lv.capacity)
            uniq, cacheI, pos_c, geo_c, col_c = compact_scene(
                cacheI, lv.pos, lv.geo, lv.col, U)
            cache_packed = None
            if use_union:
                cache_packed = pack_union_cache(cache_const, cacheWm,
                                                cachePmask, cacheI)
                opt_params = {"feat": jnp.concatenate([geo_c, col_c], 1)}
            else:
                opt_params = {"geo": geo_c, "col": col_c}
            if opt_color_dec or opt_geo_dec:
                from jax.flatten_util import ravel_pytree
                dec_tree = {}
                if opt_color_dec:
                    dec_tree[f"col_{level}"] = new_params[f"col_{level}"]
                if opt_geo_dec:
                    dec_tree[f"geo_{level}"] = new_params[f"geo_{level}"]
                # flat decoder vector: one Adam leaf (see map_scan)
                dec_flat, self._dec_unravel = ravel_pytree(dec_tree)
                opt_params["dec_flat"] = dec_flat
            if self.use_exposure:
                opt_params["expo_feat"] = jnp.asarray(new_expo)
            if use_ba:
                opt_params["cams"] = cam_tensors_j

            opt_state = Opt.init(opt_params)
            if shared_ostate is not None:
                # Carry the shared-parameter Adam state across the phase
                # boundary (one shared optimizer in the reference,
                # Mapper.py:603).  Only the exposure latent appears in both
                # phases; each level's decoders/features receive zero
                # gradients during the other phase, so their moments enter
                # the fine phase at (almost) zero either way — the reference
                # additionally has a decaying 0.9^n momentum tail on the
                # mid-level params during early fine iterations, which this
                # split drops.
                if "expo_feat" in opt_state["m"]:
                    opt_state["m"]["expo_feat"] = shared_ostate["m_expo"]
                    opt_state["v"]["expo_feat"] = shared_ostate["v_expo"]
                opt_state["t"] = shared_ostate["t"]

            opt_params, opt_state, losses = map_scan(
                params, mcfg_run, self.rcfg, opt_params, opt_state,
                keys[phase_i],
                rq_map=rqm if level == "mid" else rqf,
                cache_pix=cache_pix, cacheD=cacheD, cacheI=cacheI,
                pos=pos_c, count=jnp.int32(U),
                stage_ids=jnp.asarray(stage_ids),
                geo_iters=n_geo,
                lr_table=jnp.asarray(lr_table),
                F_actual=jnp.int32(F_actual), level=level,
                n_rays=n_rays, F_max=F_max, H=H, W=W,
                fx=slam.fx, fy=slam.fy, cx=slam.cx, cy=slam.cy,
                n_iters=int(stage_ids.size), use_exposure=self.use_exposure,
                opt_color_dec=opt_color_dec, opt_geo_dec=opt_geo_dec,
                w_color=self.w_color, use_ba=use_ba,
                cam_trainable=(jnp.asarray(cam_trainable) if use_ba
                               else None),
                use_union=use_union, cache_packed=cache_packed,
                mesh=getattr(slam, "mesh", None),
                pool_thresh=bool(self.cfg["mapping"].get(
                    "pool_inside_thresh", True)), **common)

            if use_union:
                Cd = slam.mcfg.c_dim
                npc.scatter_feats(uniq, opt_params["feat"][:, :Cd],
                                  opt_params["feat"][:, Cd:], level)
            else:
                npc.scatter_feats(uniq, opt_params["geo"],
                                  opt_params["col"], level)
            if opt_color_dec or opt_geo_dec:
                dec_tree = self._dec_unravel(opt_params["dec_flat"])
                if opt_color_dec:
                    new_params[f"col_{level}"] = dec_tree[f"col_{level}"]
                if opt_geo_dec:
                    new_params[f"geo_{level}"] = dec_tree[f"geo_{level}"]
            if self.use_exposure:
                new_expo = np.asarray(opt_params["expo_feat"])
            if use_ba:
                cam_tensors_j = opt_params["cams"]
            shared_ostate = {"t": opt_state["t"]}
            if "expo_feat" in opt_state["m"]:
                shared_ostate["m_expo"] = opt_state["m"]["expo_feat"]
                shared_ostate["v_expo"] = opt_state["v"]["expo_feat"]
            losses_all.append(np.asarray(losses))

        updated_c2w = None
        if use_ba:
            # put updated poses back (Mapper.py:942-957)
            cams_np = np.asarray(cam_tensors_j)
            for slot, f in enumerate(window):
                if not cam_trainable[slot]:
                    continue
                pose = np.eye(4, dtype=np.float32)
                pose[:3, :] = G.get_camera_from_tensor_np(cams_np[slot])
                if f == -1:
                    updated_c2w = pose
                else:
                    self.keyframe_dict[f]["est_c2w"] = pose

        self.prev_c2w = updated_c2w if updated_c2w is not None else c2w
        loss_np = (np.concatenate(losses_all, axis=0) if losses_all
                   else np.zeros((1, 2)))
        step = max(1, loss_np.shape[0] // 120)
        info = {
            "frame_pts_add": frame_pts_add,
            "n_joint_iters": int(n_joint),
            "geo_loss_last": float(loss_np[-1, 0]),
            "color_loss_last": float(loss_np[-1, 1]),
            # per-iteration curves (wandb-role observability,
            # Mapper.py:877-897 logs these per iteration)
            "geo_loss_curve": loss_np[::step, 0].round(3).tolist(),
            "color_loss_curve": loss_np[::step, 1].round(3).tolist(),
            "window": window,
            "r_query": r_query,
            "updated_c2w": updated_c2w,
        }
        return new_params, new_expo, info

    # -- keyframe registration (Mapper.py:1161-1174) ------------------------
    def maybe_register_keyframe(self, idx, frame, c2w, gt_c2w, r_query,
                                exposure_feat, n_img):
        is_kf = (idx % self.keyframe_every == 0 or idx == n_img - 2)
        if not is_kf or idx in self.keyframe_list:
            return False
        if not np.isfinite(gt_c2w).all():
            return False
        self.keyframe_list.append(idx)
        H, W = frame.depth.shape
        pool = IM.valid_pixel_pool(frame.depth, 0, H, 0, W)
        pj = np.zeros((H * W,), np.int32)
        pj[: pool.size] = pool
        # keys ending in "_j" are device twins (window stacks are assembled
        # on device); the Logger strips them from checkpoints.
        self.keyframe_dict.append({
            "idx": idx,
            "color": frame.color.copy(),
            "depth": frame.depth.copy(),
            "gt_c2w": gt_c2w.copy(),
            "est_c2w": c2w.copy(),
            "r_query_mid": r_query["mid"].copy(),
            "r_query_fine": r_query["fine"].copy(),
            "exposure_feat": np.asarray(exposure_feat).copy(),
            "color_j": frame.color_j,
            "depth_j": frame.depth_j,
            "rqm_j": jnp.asarray(r_query["mid"]),
            "rqf_j": jnp.asarray(r_query["fine"]),
            "pool_j": jnp.asarray(pj),
            "pool_len": int(max(pool.size, 1)),
        })
        return True
