import numpy as np
import pytest

try:
    from hpslam_tpu.native import (TSDFVolume, KDTree, estimate_normals,
                                   icp_point_to_plane)
    NATIVE_OK = True
except Exception:  # pragma: no cover — toolchain missing
    NATIVE_OK = False

pytestmark = pytest.mark.skipif(not NATIVE_OK, reason="native build failed")


def test_kdtree_matches_scipy(rng):
    from scipy.spatial import cKDTree
    pts = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
    q = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    t = KDTree(pts)
    idx, d2 = t.nearest(q)
    dref, iref = cKDTree(pts).query(q)
    np.testing.assert_allclose(np.sqrt(d2), dref, atol=1e-4)
    idxk, d2k = t.knn(q, 5)
    drefk, _ = cKDTree(pts).query(q, k=5)
    np.testing.assert_allclose(np.sqrt(d2k), drefk, atol=1e-4)


def _sphere_depth(H, W, fx, fy, cx, cy, cam_pos, Rw, center, radius):
    jj, ii = np.mgrid[0:H, 0:W]
    dirs = np.stack([(ii - cx) / fx, (jj - cy) / fy,
                     np.ones_like(ii, float)], -1)
    rd = dirs @ Rw.T
    oc = cam_pos - center
    a = np.einsum("hwc,hwc->hw", rd, rd)
    b = np.einsum("hwc,c->hw", rd, oc)
    c = oc @ oc - radius ** 2
    disc = b * b - a * c
    t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / a, 0)
    return np.maximum(t, 0).astype(np.float32)


def test_tsdf_sphere_reconstruction():
    vol = TSDFVolume(voxel_size=0.02, sdf_trunc=0.08)
    H, W = 100, 120
    fx = fy = 100.0
    cx, cy = 59.5, 49.5
    center = np.array([0, 0, 1.0])
    for ang in [0.0, 0.7, -0.7, 2.2]:
        cs, sn = np.cos(ang), np.sin(ang)
        Rw = np.array([[cs, 0, sn], [0, 1, 0], [-sn, 0, cs]])
        cam_pos = center - Rw @ np.array([0, 0, 1.0])
        w2c = np.eye(4)
        w2c[:3, :3] = Rw.T
        w2c[:3, 3] = -Rw.T @ cam_pos
        depth = _sphere_depth(H, W, fx, fy, cx, cy, cam_pos, Rw, center, 0.4)
        vol.integrate(depth, np.full((H, W, 3), 0.5, np.float32),
                      (fx, fy, cx, cy), w2c.astype(np.float32), 5.0)
    verts, cols, faces = vol.extract_mesh()
    assert verts.shape[0] > 500 and faces.shape[0] > 500
    r = np.linalg.norm(verts - center, axis=1)
    assert abs(r.mean() - 0.4) < 0.01
    assert r.std() < 0.01
    assert np.allclose(cols.mean(), 0.5, atol=0.05)


def test_icp_recovers_transform(rng):
    tgt = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
    tgt[:, 2] = 0.1 * np.sin(3 * tgt[:, 0]) + 0.05 * tgt[:, 1]
    nrm = estimate_normals(tgt, k=20, viewpoint=np.array([0, 0, 10], np.float32))
    ang = 0.02
    Rz = np.array([[np.cos(ang), -np.sin(ang), 0],
                   [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    T_true = np.eye(4)
    T_true[:3, :3] = Rz
    T_true[:3, 3] = [0.04, -0.02, 0.01]
    src = ((tgt - T_true[:3, 3]) @ Rz).astype(np.float32)  # inverse transform
    T, fit, rmse = icp_point_to_plane(src, tgt, nrm, max_corr_dist=0.3,
                                      max_iter=200)
    assert fit > 0.95
    # applying T to src should land on tgt
    aligned = src @ T[:3, :3].T + T[:3, 3]
    d = np.linalg.norm(aligned - tgt, axis=1)
    assert np.median(d) < 5e-3


def test_fpfh_ransac_global_registration(rng):
    """Large-offset registration the local ICP basin cannot reach — the
    case end-correction's global stage exists for (common.py:558-577)."""
    from hpslam_tpu.native import (estimate_normals, fpfh_ransac_register,
                                   icp_point_to_plane)
    # structured scene: three walls of a room with bumps (FPFH needs
    # geometry variation)
    n = 4000
    t = rng.uniform(-1.5, 1.5, (n, 2)).astype(np.float32)
    w = rng.integers(0, 3, n)
    pts = np.zeros((n, 3), np.float32)
    bump = 0.15 * np.sin(3.0 * t[:, 0]) * np.cos(2.0 * t[:, 1])
    pts[w == 0] = np.stack([t[w == 0, 0], t[w == 0, 1],
                            -1.5 + bump[w == 0]], -1)
    pts[w == 1] = np.stack([t[w == 1, 0], -1.5 + bump[w == 1],
                            t[w == 1, 1]], -1)
    pts[w == 2] = np.stack([-1.5 + bump[w == 2], t[w == 2, 0],
                            t[w == 2, 1]], -1)

    # ground-truth offset: 40 cm translation + 10 deg yaw (far beyond the
    # ICP basin at 4 cm correspondence distance)
    ang = np.deg2rad(10.0)
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t_gt = np.array([0.4, -0.25, 0.1], np.float32)
    src = (pts @ R.T + t_gt + rng.normal(0, 0.004, (n, 3))).astype(np.float32)

    vp = np.array([0.0, 0.0, 0.0], np.float32)
    tgt_n = estimate_normals(pts, k=20, viewpoint=vp)
    src_n = estimate_normals(src, k=20, viewpoint=vp)
    T, fit = fpfh_ransac_register(src, src_n, pts, tgt_n,
                                  feature_radius=0.25, max_corr_dist=0.07,
                                  max_iter=60_000)
    assert fit > 0.5, f"global registration failed (fitness {fit})"
    T2, fit2, rmse = icp_point_to_plane(src, pts, tgt_n, max_corr_dist=0.05,
                                        max_iter=100, init=T)
    # recovered transform must invert the ground-truth offset
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t_gt
    err = T2 @ T_gt
    assert np.abs(err[:3, 3]).max() < 0.03, f"translation error {err[:3, 3]}"
    assert np.abs(err[:3, :3] - np.eye(3)).max() < 0.03
