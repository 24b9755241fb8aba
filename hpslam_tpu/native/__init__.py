"""ctypes bindings for the first-party C++ runtime (native/hpslam_native.cpp).

Builds the shared library on first use (``make -C native``) — the toolchain
ships g++/make; no pip deps.  Public API: TSDFVolume, KDTree,
estimate_normals, icp_point_to_plane.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhpslam_native.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "hpslam_native.cpp")
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)

    lib.tsdf_create.restype = ctypes.c_int64
    lib.tsdf_create.argtypes = [ctypes.c_float, ctypes.c_float]
    lib.tsdf_destroy.argtypes = [ctypes.c_int64]
    lib.tsdf_integrate.argtypes = [
        ctypes.c_int64, f32p, f32p, ctypes.c_int, ctypes.c_int, f32p, f32p,
        ctypes.c_float]
    lib.tsdf_extract.restype = ctypes.c_int64
    lib.tsdf_extract.argtypes = [ctypes.c_int64, ctypes.c_float]
    lib.mesh_counts.argtypes = [ctypes.c_int64, i64p, i64p]
    lib.mesh_copy.argtypes = [ctypes.c_int64, f32p, f32p, i32p]
    lib.mesh_destroy.argtypes = [ctypes.c_int64]
    lib.kdtree_build.restype = ctypes.c_int64
    lib.kdtree_build.argtypes = [f32p, ctypes.c_int64]
    lib.kdtree_destroy.argtypes = [ctypes.c_int64]
    lib.kdtree_nearest.argtypes = [ctypes.c_int64, f32p, ctypes.c_int64,
                                   i32p, f32p]
    lib.kdtree_knn.argtypes = [ctypes.c_int64, f32p, ctypes.c_int64,
                               ctypes.c_int, i32p, f32p]
    lib.estimate_normals.argtypes = [f32p, ctypes.c_int64, ctypes.c_int,
                                     f32p, f32p]
    lib.icp_point_to_plane.restype = ctypes.c_float
    lib.icp_point_to_plane.argtypes = [
        f32p, ctypes.c_int64, f32p, f32p, ctypes.c_int64, ctypes.c_float,
        ctypes.c_int, f32p, f32p, f32p]
    lib.fpfh_ransac_register.restype = ctypes.c_float
    lib.fpfh_ransac_register.argtypes = [
        f32p, ctypes.c_int64, f32p, f32p, ctypes.c_int64, f32p,
        ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_uint64, f32p]
    lib.bvh_build.restype = ctypes.c_int64
    lib.bvh_build.argtypes = [f32p, ctypes.c_int64, i32p, ctypes.c_int64]
    lib.bvh_destroy.argtypes = [ctypes.c_int64]
    lib.bvh_raycast.argtypes = [ctypes.c_int64, f32p, f32p, ctypes.c_int64,
                                f32p]
    _lib = lib
    return lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _f32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


class TSDFVolume:
    """Block-sparse TSDF fusion + marching-tetrahedra extraction
    (ScalableTSDFVolume replacement)."""

    def __init__(self, voxel_size: float, sdf_trunc: float):
        self.lib = _load()
        self.h = self.lib.tsdf_create(ctypes.c_float(voxel_size),
                                      ctypes.c_float(sdf_trunc))

    def integrate(self, depth: np.ndarray, color: Optional[np.ndarray],
                  intrinsics, w2c_cv: np.ndarray, depth_trunc: float = 4.5):
        """depth (H,W) metres; color (H,W,3) in [0,1] or None; intrinsics
        (fx, fy, cx, cy); w2c_cv: 4x4 world->camera in the CV convention
        (+z forward, +x right, +y down)."""
        depth = _f32(depth)
        H, W = depth.shape
        cptr = _fp(_f32(color)) if color is not None else \
            ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
        intr = _f32(np.asarray(intrinsics))
        w2c = _f32(w2c_cv)
        self.lib.tsdf_integrate(self.h, _fp(depth), cptr, H, W, _fp(intr),
                                _fp(w2c), ctypes.c_float(depth_trunc))

    def extract_mesh(self, weight_thresh: float = 0.0
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        mh = self.lib.tsdf_extract(self.h, ctypes.c_float(weight_thresh))
        nv = ctypes.c_int64()
        nf = ctypes.c_int64()
        self.lib.mesh_counts(mh, ctypes.byref(nv), ctypes.byref(nf))
        verts = np.empty((nv.value, 3), np.float32)
        cols = np.empty((nv.value, 3), np.float32)
        faces = np.empty((nf.value, 3), np.int32)
        if nv.value:
            self.lib.mesh_copy(
                mh, _fp(verts), _fp(cols),
                faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        self.lib.mesh_destroy(mh)
        return verts, cols, faces

    def __del__(self):
        try:
            self.lib.tsdf_destroy(self.h)
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass


class KDTree:
    """Nearest-neighbour queries over a static cloud (KDTreeFlann
    replacement)."""

    def __init__(self, points: np.ndarray):
        self.lib = _load()
        self._pts = _f32(points)
        self.h = self.lib.kdtree_build(_fp(self._pts), self._pts.shape[0])

    def nearest(self, queries: np.ndarray):
        q = _f32(queries)
        n = q.shape[0]
        idx = np.empty((n,), np.int32)
        d2 = np.empty((n,), np.float32)
        self.lib.kdtree_nearest(
            self.h, _fp(q), n,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), _fp(d2))
        return idx, d2

    def knn(self, queries: np.ndarray, k: int):
        q = _f32(queries)
        n = q.shape[0]
        idx = np.empty((n, k), np.int32)
        d2 = np.empty((n, k), np.float32)
        self.lib.kdtree_knn(
            self.h, _fp(q), n, k,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), _fp(d2))
        return idx, d2

    def __del__(self):
        try:
            self.lib.kdtree_destroy(self.h)
        except Exception:  # noqa: BLE001
            pass


def estimate_normals(points: np.ndarray, k: int = 30,
                     viewpoint: Optional[np.ndarray] = None) -> np.ndarray:
    lib = _load()
    pts = _f32(points)
    out = np.empty_like(pts)
    vp = _fp(_f32(viewpoint)) if viewpoint is not None else \
        ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    lib.estimate_normals(_fp(pts), pts.shape[0], k, vp, _fp(out))
    return out


class MeshRaycaster:
    """BVH ray-triangle intersection (replaces Open3D offscreen depth
    rendering in eval_recon's virtual-view metric)."""

    def __init__(self, verts: np.ndarray, faces: np.ndarray):
        self.lib = _load()
        self._v = _f32(verts)
        self._f = np.ascontiguousarray(faces, dtype=np.int32)
        self.h = self.lib.bvh_build(
            _fp(self._v), self._v.shape[0],
            self._f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._f.shape[0])

    def cast(self, rays_o: np.ndarray, rays_d: np.ndarray) -> np.ndarray:
        """Returns t along each ray (>0) or -1 for a miss."""
        ro = _f32(rays_o)
        rd = _f32(rays_d)
        out = np.empty((ro.shape[0],), np.float32)
        self.lib.bvh_raycast(self.h, _fp(ro), _fp(rd), ro.shape[0], _fp(out))
        return out

    def __del__(self):
        try:
            self.lib.bvh_destroy(self.h)
        except Exception:  # noqa: BLE001
            pass


def icp_point_to_plane(src: np.ndarray, tgt: np.ndarray,
                       tgt_normals: np.ndarray, max_corr_dist: float,
                       max_iter: int = 500,
                       init: Optional[np.ndarray] = None):
    """Returns (T 4x4, fitness, inlier_rmse)."""
    lib = _load()
    src = _f32(src)
    tgt = _f32(tgt)
    nrm = _f32(tgt_normals)
    T0 = _f32(init if init is not None else np.eye(4))
    Tout = np.empty((4, 4), np.float32)
    rmse = ctypes.c_float()
    fit = lib.icp_point_to_plane(
        _fp(src), src.shape[0], _fp(tgt), _fp(nrm), tgt.shape[0],
        ctypes.c_float(max_corr_dist), max_iter, _fp(T0), _fp(Tout),
        ctypes.byref(rmse))
    return Tout, float(fit), float(rmse.value)


def fpfh_ransac_register(src: np.ndarray, src_normals: np.ndarray,
                         tgt: np.ndarray, tgt_normals: np.ndarray,
                         feature_radius: float, max_corr_dist: float,
                         max_iter: int = 100_000, seed: int = 1219):
    """FPFH + RANSAC global registration (Open3D
    registration_ransac_based_on_feature_matching role, reference
    src/common.py:558-577).  Returns (T 4x4, fitness)."""
    lib = _load()
    src = _f32(src)
    tgt = _f32(tgt)
    sn = _f32(src_normals)
    tn = _f32(tgt_normals)
    Tout = np.empty((4, 4), np.float32)
    fit = lib.fpfh_ransac_register(
        _fp(src), src.shape[0], _fp(sn), _fp(tgt), tgt.shape[0], _fp(tn),
        ctypes.c_float(feature_radius), ctypes.c_float(max_corr_dist),
        max_iter, ctypes.c_uint64(seed), _fp(Tout))
    return Tout, float(fit)
