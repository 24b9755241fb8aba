"""Hierarchical neural point cloud — fixed-capacity HBM-resident arrays.

TPU-native replacement for the reference's ``NeuralPointCloud``
(src/neural_point.py:14-495): Python lists + a faiss index behind a
multiprocessing Manager become per-level fixed-capacity device arrays with an
active count, grown by power-of-two re-allocation on the host (SURVEY.md §7
design delta 2).  All mutation is via pure functions returning new pytrees;
the host wrapper owns capacity management and the (host-side) raw input
cloud used for exports and end-correction.

Insertion semantics mirror ``add_neural_points`` (neural_point.py:193-334):
depth-filtered rays are back-projected, rays whose surface point already has
a neighbour within the per-pixel add radius are dropped (zero-neighbour test,
line 262-268), and ``N_add`` points are spread along the ray in
``[near_end_surface*d, far_end_surface*d]`` with N(0, 0.1) feature init.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .ops import knn as K


class PointLevel(struct.PyTreeNode):
    """One hierarchy level ('mid' or 'fine') of the point cloud."""
    pos: jnp.ndarray      # (N_cap, 3) float32
    normal: jnp.ndarray   # (N_cap, 2) float32 spherical normal angles
    geo: jnp.ndarray      # (N_cap, c_dim) float32 geometry features
    col: jnp.ndarray      # (N_cap, c_dim) float32 colour features
    count: jnp.ndarray    # () int32 active points

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]


def make_level(capacity: int, c_dim: int) -> PointLevel:
    return PointLevel(
        pos=jnp.zeros((capacity, 3), jnp.float32),
        normal=jnp.zeros((capacity, 2), jnp.float32),
        geo=jnp.zeros((capacity, c_dim), jnp.float32),
        col=jnp.zeros((capacity, c_dim), jnp.float32),
        count=jnp.zeros((), jnp.int32),
    )


def grow_level(level: PointLevel, new_capacity: int) -> PointLevel:
    """Host-side capacity bump (recompiles shape-keyed jits downstream)."""
    pad = new_capacity - level.capacity
    assert pad > 0
    z = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
    return level.replace(pos=z(level.pos), normal=z(level.normal),
                         geo=z(level.geo), col=z(level.col))


@functools.partial(jax.jit, static_argnames=("n_add", "nn_num"),
                   donate_argnames=("level",))
def add_points(level: PointLevel, tile_index, key, rays_o, rays_d, gt_depth,
               valid, r_add, near_surface: float, far_surface: float,
               n_add: int = 3, normals: Optional[jnp.ndarray] = None,
               nn_num: int = 8):
    """Masked insertion of up to B ray locations x n_add points.

    Args:
      level:   target PointLevel (donated; updated functionally).
      key:     PRNG key for feature init noise.
      rays_o, rays_d: (B, 3).
      gt_depth: (B,) sensor depth (>0 where valid).
      valid:   (B,) bool — candidate mask (depth filter and friends).
      r_add:   (B,) per-ray add radius (dynamic radius, level-specific).
      near_surface, far_surface: z-span factors (cfg pointcloud.near/far_end_surface).
      n_add:   points per accepted location (cfg pointcloud.N_add).
      normals: optional (B, 2) spherical normals to copy onto new points.

    Returns: (new_level, n_locations_added)
    """
    B = rays_o.shape[0]
    pts_gt = rays_o + rays_d * gt_depth[:, None]

    # zero-neighbour test within per-ray dynamic radius
    # (neural_point.py:262-268).  Only the 1-NN matters for a == 0 count;
    # a missed 1-NN silently inserts a near-duplicate, so this search runs
    # at probe=32 (1-NN recall 1.000 at 2^19 and >=0.9995 at 2^21 on the
    # adversarial wall cloud, tests/test_knn.py::test_recall_at_scale) —
    # it fires once per mapped frame on ~7k queries, so the wider probe
    # costs noise next to the optimizer scans.
    D1, _ = K.knn_tiles(pts_gt, *tile_index, k=1, probe=32)
    keep = valid & (D1[:, 0] >= jnp.square(r_add))

    # spread n_add points along the ray around the depth reading
    t = jnp.linspace(0.0, 1.0, n_add)
    z_vals = near_surface * gt_depth[:, None] * (1 - t) \
        + far_surface * gt_depth[:, None] * t            # (B, n_add)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]

    # compact destination slots, DE-INTERLEAVED: the n_add siblings of one
    # accepted location go to slots count + s*n_locs + rank instead of
    # consecutive rows.  Consecutive siblings would always share a segment
    # of the segment-top-m kNN (ops/knn.knn_segmin) and cap its recall;
    # striding them n_locs apart spreads them across segments.
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1            # (B,)
    n_locs = jnp.sum(keep.astype(jnp.int32))
    dest = (level.count + rank[:, None]
            + n_locs * jnp.arange(n_add)[None, :])           # (B, n_add)
    cap = level.capacity
    # rejected rows -> index cap (out of range, dropped by scatter mode)
    dest = jnp.where(keep[:, None], dest, cap)
    dest = dest.reshape(-1)

    kg, kc = jax.random.split(key)
    geo_new = 0.1 * jax.random.normal(kg, (B * n_add, level.geo.shape[1]))
    col_new = 0.1 * jax.random.normal(kc, (B * n_add, level.col.shape[1]))

    mode = "drop"  # out-of-range (== cap) indices are dropped
    new_pos = level.pos.at[dest].set(pts.reshape(-1, 3), mode=mode)
    new_geo = level.geo.at[dest].set(geo_new, mode=mode)
    new_col = level.col.at[dest].set(col_new, mode=mode)
    if normals is not None:
        nrm = jnp.repeat(normals, n_add, axis=0)
    else:
        nrm = jnp.zeros((B * n_add, 2))
    new_normal = level.normal.at[dest].set(nrm, mode=mode)

    new_count = level.count + n_locs * n_add
    return level.replace(pos=new_pos, geo=new_geo, col=new_col,
                         normal=new_normal, count=new_count), n_locs


class NeuralPointCloud:
    """Host-side owner of the two-level point store.

    Public surface mirrors the reference ``NeuralPointCloud`` where that
    surface is load-bearing (add_neural_points / find_neighbors / feature
    get-update / cloud_pos / keyframe dict / input cloud), minus the Manager
    RPC — everything is in-process and device-resident.
    """

    GROWTH_HEADROOM = 32768  # enough for one mapping frame's worth of adds

    def __init__(self, cfg: dict, initial_capacity: int = 1 << 16):
        pc = cfg["pointcloud"]
        initial_capacity = int(pc.get("initial_capacity", initial_capacity))
        self.cfg = cfg
        self.c_dim = cfg["model"]["c_dim"]
        self.nn_num = pc["nn_num"]
        self.N_add = pc["N_add"]
        self.near_end_surface = pc["near_end_surface"]
        self.far_end_surface = pc["far_end_surface"]
        self.radius_add = pc["radius_add"]
        self.radius_min = pc["radius_min"]
        self.radius_query = pc["radius_query"]
        self.levels: Dict[str, PointLevel] = {
            lvl: make_level(initial_capacity, self.c_dim)
            for lvl in pc["radius_hierarchy"].keys()
        }
        # raw RGB-D input cloud (host): every depth-valid sampled pixel each
        # mapping frame (neural_point.py:233-234); exported to
        # final_point_cloud.ply and consumed by end-correction.
        self._input_pos: list = []
        self._input_rgb: list = []
        self._input_normal: list = []
        self._input_normal_cartesian: list = []
        self.keyframe_dict: list = []
        self._seed = cfg.get("seed", 1219)
        self._key_counter = 0
        # per-level Morton tile index (ops/knn.build_tiles) — the faiss-IVF
        # replacement.  Rebuilt lazily after insertions/growth (one device
        # sort, ~9 ms at 524k points, vs the reference's full faiss retrain
        # per insertion, neural_point.py:325).
        self._tile_index: Dict[str, tuple] = {}
        self._index_dirty: Dict[str, bool] = {}

    # -- bookkeeping -------------------------------------------------------
    def _next_key(self):
        # typed keys only — see slam._next_key for the raw-key trap
        self._key_counter += 1
        if not hasattr(self, "_base_key"):
            self._base_key = jax.random.PRNGKey(self._seed + 1)
        return jax.random.fold_in(self._base_key, self._key_counter)

    def ensure_capacity(self, level: str, incoming: int):
        lv = self.levels[level]
        need = int(lv.count) + incoming
        if need > lv.capacity:
            new_cap = max(lv.capacity * 2, 1 << (need - 1).bit_length())
            self.levels[level] = grow_level(lv, new_cap)
            self._index_dirty[level] = True

    # tile-count cap: the tile size grows with capacity beyond 4096*128 =
    # 2^19 points so the probed fraction of the cloud — and therefore
    # search recall — is invariant as the scene grows (measured at 2^21 on
    # an adversarial 3-layer wall: capped tile=512/probe=16 1-NN recall
    # 0.9995 vs uncapped tile=128 0.9888, AND faster — candidates are
    # contiguous whole-tile rows).  tests/test_knn.py::test_recall_at_scale.
    TILE_COUNT_CAP = 4096

    def index(self, level: str):
        """Tile index for the level's current cloud (lazy rebuild)."""
        if self._index_dirty.get(level, True) or level not in self._tile_index:
            lv = self.levels[level]
            tile = max(128, lv.capacity // self.TILE_COUNT_CAP)
            self._tile_index[level] = K.build_tiles(lv.pos, lv.count,
                                                    tile=tile)
            self._index_dirty[level] = False
        return self._tile_index[level]

    def restore_level(self, level: str, pos, normal, geo, col):
        """Load a checkpointed level (utils/logger.py) into the fixed-
        capacity store: capacity = next power of two with growth headroom,
        rows [0:n] set, index marked dirty."""
        n = int(pos.shape[0])
        cap = max(self.levels[level].capacity,
                  1 << max(1, (n + self.GROWTH_HEADROOM - 1)).bit_length())
        lv = make_level(cap, self.c_dim)
        self.levels[level] = lv.replace(
            pos=lv.pos.at[:n].set(jnp.asarray(pos)),
            normal=lv.normal.at[:n].set(jnp.asarray(normal)),
            geo=lv.geo.at[:n].set(jnp.asarray(geo)),
            col=lv.col.at[:n].set(jnp.asarray(col)),
            count=jnp.asarray(n, jnp.int32))
        self._index_dirty[level] = True

    def restore_input(self, pos, rgb, normal):
        """Load the checkpointed raw input cloud (host lists)."""
        self._input_pos = np.asarray(pos).tolist()
        self._input_rgb = np.asarray(rgb).tolist()
        self._input_normal = np.asarray(normal).tolist()

    def pts_num(self) -> Dict[str, int]:
        return {k: int(v.count) for k, v in self.levels.items()}

    def index_ntotal(self, level: str) -> int:
        return int(self.levels[level].count)

    def cloud_pos(self, level: str):
        return self.levels[level].pos

    def cloud_normal(self, level: str):
        return self.levels[level].normal

    def get_geo_feats(self, level: str):
        return self.levels[level].geo

    def get_col_feats(self, level: str):
        return self.levels[level].col

    def update_geo_feats(self, feats, level: str):
        self.levels[level] = self.levels[level].replace(
            geo=jnp.asarray(feats))

    def update_col_feats(self, feats, level: str):
        self.levels[level] = self.levels[level].replace(
            col=jnp.asarray(feats))

    def scatter_feats(self, idx, geo, col, level: str):
        """Write back a compacted row subset (mapper fast path).  ``idx``
        entries equal to the capacity (compaction padding) are dropped."""
        lv = self.levels[level]
        self.levels[level] = lv.replace(
            geo=lv.geo.at[idx].set(geo, mode="drop"),
            col=lv.col.at[idx].set(col, mode="drop"))

    def get_keyframe_dict(self):
        return list(self.keyframe_dict)

    def set_keyframe_dict(self, value):
        self.keyframe_dict = value

    def input_pos(self):
        return self._input_pos

    def input_rgb(self):
        return self._input_rgb

    def input_normal(self):
        return self._input_normal

    def input_normal_cartesian(self):
        return self._input_normal_cartesian

    # -- queries -----------------------------------------------------------
    def find_neighbors(self, pos, level: str, radius):
        """(D, I, neighbor_num) — faiss-query equivalent
        (neural_point.py:366-417)."""
        lv = self.levels[level]
        return K.find_neighbors(jnp.asarray(pos), lv.pos, lv.count, radius,
                                k=self.nn_num)

    # -- insertion ---------------------------------------------------------
    def add_neural_points(self, rays_o, rays_d, gt_depth, gt_color,
                          level: str, dynamic_radius=None, normals=None,
                          is_pts_grad: bool = False, valid=None,
                          record_input: bool = True) -> int:
        """Insert points for one batch of rays; returns #locations added.

        dynamic_radius: per-ray add radii; falls back to the static
        radius_add / radius_min (is_pts_grad) like neural_point.py:400-406.
        """
        rays_o = jnp.asarray(rays_o, jnp.float32)
        rays_d = jnp.asarray(rays_d, jnp.float32)
        gt_depth = jnp.asarray(gt_depth, jnp.float32)
        B = rays_o.shape[0]
        if B == 0:
            return 0
        if valid is None:
            valid = gt_depth > 0
        else:
            valid = jnp.asarray(valid) & (gt_depth > 0)
        if dynamic_radius is None:
            r = self.radius_min if is_pts_grad else self.radius_add
            r_add = jnp.full((B,), r, jnp.float32)
        else:
            r_add = jnp.asarray(dynamic_radius, jnp.float32)

        if record_input:
            pts_gt = np.asarray(rays_o + rays_d * gt_depth[:, None])
            vm = np.asarray(valid)
            self._input_pos.extend(pts_gt[vm].tolist())
            col = np.asarray(gt_color)
            self._input_rgb.extend((col[vm] * 255.0).tolist())
            if normals is not None:
                from .ops.geometry import cart2sph
                sph = np.asarray(cart2sph(jnp.asarray(normals)))
                self._input_normal.extend(sph[vm].tolist())
                self._input_normal_cartesian.extend(
                    np.asarray(normals)[vm].tolist())

        self.ensure_capacity(level, B * self.N_add)
        sph_normals = None
        if normals is not None:
            from .ops.geometry import cart2sph
            sph_normals = cart2sph(jnp.asarray(normals))
        new_level, n_locs = add_points(
            self.levels[level], self.index(level), self._next_key(),
            rays_o, rays_d, gt_depth,
            valid, r_add, self.near_end_surface, self.far_end_surface,
            n_add=self.N_add, normals=sph_normals, nn_num=self.nn_num)
        self.levels[level] = new_level
        self._index_dirty[level] = True
        return int(n_locs)
