"""End-of-trajectory drift correction (reference Mapper.py:1080-1148).

The reference registers the trajectory-tail input cloud against the earlier
map with Open3D FPFH+RANSAC global registration followed by point-to-plane
ICP (common.py:534-593), then applies an exponentially decayed translation
correction to the last 800 poses.  Same two-stage flow here on the
first-party native library: FPFH + RANSAC (native fpfh_ransac_register)
provides the global initialisation — covering the large-drift case this
tool exists for — and point-to-plane ICP refines it, with the same
acceptance gate (fitness > 0.5) and the same decay schedule.
"""
from __future__ import annotations

import numpy as np


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    keys = np.floor(points / voxel).astype(np.int64)
    _, idx = np.unique(keys, axis=0, return_index=True)
    return points[np.sort(idx)]


def register_tail(cloud: np.ndarray, cam_pos: np.ndarray,
                  voxel_size: float = 0.04):
    """Align the trajectory-tail cloud onto the earlier map.

    Returns (T 4x4, fitness) or (None, 0).
    """
    from ..native import (estimate_normals, fpfh_ransac_register,
                          icp_point_to_plane)

    n = cloud.shape[0]
    if n <= 50_000:
        return None, 0.0
    target = voxel_downsample(cloud[: int(n * 0.6)], voxel_size)
    normals = estimate_normals(target, k=30, viewpoint=cam_pos.astype(np.float32))

    best_T, best_fit, best_rmse = None, 0.0, np.inf
    for coef in (0.8, 0.9, 0.95):
        source = voxel_downsample(cloud[int(n * coef):], voxel_size)
        if source.shape[0] < 100:
            continue
        # global stage: FPFH + RANSAC (common.py:558-577; o3d recipe uses
        # feature radius 5*voxel and RANSAC distance 1.5*voxel)
        src_normals = estimate_normals(source, k=30,
                                       viewpoint=cam_pos.astype(np.float32))
        T_global, fit_global = fpfh_ransac_register(
            source, src_normals, target, normals,
            feature_radius=5.0 * voxel_size,
            max_corr_dist=1.5 * voxel_size)
        inits = [np.eye(4, dtype=np.float32)]
        if fit_global > 0.3:
            inits.insert(0, T_global)
        for T0 in inits:
            T, fit, rmse = icp_point_to_plane(
                source, target, normals, max_corr_dist=voxel_size,
                max_iter=500, init=np.asarray(T0, np.float32))
            if fit > best_fit or (fit == best_fit and rmse < best_rmse):
                best_T, best_fit, best_rmse = T, fit, rmse
    return best_T, best_fit


def apply_end_correction(slam) -> bool:
    """Mutates slam.estimate_c2w_list in place; returns True if applied."""
    cloud = np.asarray(slam.npc.input_pos(), np.float32)
    idx = slam.n_img - 1
    cur_c2w = slam.estimate_c2w_list[idx].copy()
    if cloud.shape[0] <= 50_000:
        print(f"npc_pts_num: {cloud.shape[0]}; end correction rejected.")
        return False
    T, fitness = register_tail(cloud, cur_c2w[:3, 3])
    if T is None or fitness <= 0.5:
        print(f"result_fitness: {fitness}; end correction rejected.")
        return False
    print("correction transformation:\n", T)
    new_c2w = T @ cur_c2w
    translation = new_c2w[:3, 3] - cur_c2w[:3, 3]
    print("end translation correction:", translation)
    slam.estimate_c2w_list[idx] = new_c2w
    index_interval = 1000.0
    for i in range(idx):
        if i >= idx - 800:
            decay = np.exp(-abs(i - idx) / index_interval)
            slam.estimate_c2w_list[i][:3, 3] += translation * decay
    return True
