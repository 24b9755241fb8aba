import numpy as np
import pytest

from hpslam_tpu.tools.eval_ate import evaluate_trajectory, horn_align


def make_traj(n, rng):
    t = np.linspace(0, 4 * np.pi, n)
    xyz = np.stack([np.cos(t), np.sin(t), 0.1 * t], -1)
    poses = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    poses[:, :3, 3] = xyz
    return poses


def test_ate_zero_for_identical(rng):
    gt = make_traj(50, rng)
    r = evaluate_trajectory(gt, gt.copy(), 49)
    assert r["absolute_translational_error.rmse"] < 1e-9
    assert r["compared_pose_pairs"] == 50


def test_ate_invariant_to_rigid_transform(rng):
    gt = make_traj(60, rng)
    # rigidly transform the estimate: alignment should recover zero error
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = [1.0, -2.0, 0.5]
    est = np.einsum("ij,njk->nik", T, gt)
    r = evaluate_trajectory(gt, est, 59, use_alignment=True)
    assert r["absolute_translational_error.rmse"] < 1e-6
    r2 = evaluate_trajectory(gt, est, 59, use_alignment=False)
    assert r2["absolute_translational_error.rmse"] > 0.5


def test_ate_masks_invalid_gt(rng):
    gt = make_traj(40, rng)
    est = gt.copy()
    gt[7] = np.nan
    gt[13, 0, 0] = np.inf
    r = evaluate_trajectory(gt, est, 39)
    assert r["compared_pose_pairs"] == 38
    assert np.isfinite(r["absolute_translational_error.rmse"])


def test_known_offset_rmse(rng):
    gt = make_traj(30, rng)
    est = gt.copy()
    est[:, :3, 3] += rng.normal(0, 0.01, (30, 3))
    r = evaluate_trajectory(gt, est, 29, use_alignment=False)
    assert 0.005 < r["absolute_translational_error.rmse"] < 0.05


def test_cull_mesh(rng):
    from hpslam_tpu.tools.cull_mesh import cull
    # two triangles: one in front of the camera (visible), one behind
    verts = np.array([[0, 0, -2], [0.1, 0, -2], [0, 0.1, -2],
                      [0, 0, 2], [0.1, 0, 2], [0, 0.1, 2]], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    pose = np.eye(4)
    kept = cull(verts, faces, [pose], H=100, W=100, fx=50, fy=50,
                cx=50, cy=50)
    assert kept.shape[0] == 1 and list(kept[0]) == [0, 1, 2]


def test_ply_roundtrip(tmp_path, rng):
    from hpslam_tpu.utils.ply import write_ply_mesh, write_ply_points, read_ply
    v = rng.normal(size=(10, 3)).astype(np.float32)
    c = rng.uniform(size=(10, 3)).astype(np.float32)
    f = rng.integers(0, 10, size=(5, 3)).astype(np.int32)
    p = str(tmp_path / "m.ply")
    write_ply_mesh(p, v, f, c)
    v2, c2, f2 = read_ply(p)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)
    np.testing.assert_allclose(c2, c, atol=1 / 255.0)
    p2 = str(tmp_path / "p.ply")
    write_ply_points(p2, v, c)
    v3, c3, f3 = read_ply(p2)
    np.testing.assert_allclose(v3, v, atol=1e-6)
    assert f3 is None


def test_end_correction_decay(rng):
    from hpslam_tpu.tools.end_correction import voxel_downsample
    pts = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
    ds = voxel_downsample(pts, 0.2)
    assert ds.shape[0] <= 6 ** 3
    assert ds.shape[0] > 50


def test_apply_end_correction_recovers_rigid_tail_drift(rng):
    """A rigidly displaced trajectory tail must be registered back onto the
    earlier map and the decayed translation applied to the pose list
    (reference Mapper.py:1080-1148; gates overridden to fixture scale)."""
    from hpslam_tpu.tools.end_correction import apply_end_correction

    # box-room walls: enough corner/edge structure for registration
    pts = []
    for axis in range(3):
        for side in (0.0, 1.0):
            p = rng.uniform(0, 1, (3000, 3))
            p[:, axis] = side
            pts.append(p)
    cloud = (np.concatenate(pts) * np.array([4.0, 3.0, 4.0])).astype(
        np.float32)
    rng.shuffle(cloud)
    n = cloud.shape[0]
    drift = np.array([0.15, -0.4, 0.1], np.float32)
    drifted = cloud.copy()
    drifted[int(n * 0.78):] += drift  # tail inserted at drifted positions

    n_img = 60
    est = [np.eye(4, dtype=np.float32) for _ in range(n_img)]
    for c2w in est:
        c2w[:3, 3] = [2.0, 1.5, 2.0]
    est[-1][:3, 3] += drift
    before_tail = est[-1][:3, 3].copy()
    before_head = est[0][:3, 3].copy()

    class _NPC:
        def input_pos(self):
            return drifted

    class _Slam:
        cfg = {"mapping": {"end_corr_min_pts": 1000,
                           "end_corr_min_fitness": 0.3}}
        npc = _NPC()
        estimate_c2w_list = est

    s = _Slam()
    s.n_img = n_img
    assert apply_end_correction(s)
    corr = est[-1][:3, 3] - before_tail
    # registration undoes most of the injected tail drift
    assert np.linalg.norm(corr + drift) < 0.25 * np.linalg.norm(drift)
    # decay: full correction at the tail, none outside the 0.4*n window
    np.testing.assert_allclose(est[0][:3, 3], before_head, atol=1e-7)
    mid = n_img - 1 - int(0.2 * n_img)
    mid_corr = est[mid][:3, 3] - before_head
    assert 0.1 < np.linalg.norm(mid_corr) / np.linalg.norm(corr) < 0.95


def test_convert_pretrained_roundtrip(tmp_path):
    """Fake ConvONet 'coarse' checkpoint -> npz -> slam.load_pretrain keys.

    Mirrors the reference's mapping of the ckpt's coarse decoder into BOTH
    geometry decoders (Point_SLAM.py:237-260)."""
    import numpy as np
    import torch
    from hpslam_tpu.tools.convert_pretrained import convert

    g = torch.Generator().manual_seed(0)
    state = {}
    dims = [(110, 32)] + [(32, 32)] * 4  # embed 110 -> 5 x 32 trunk
    for i, (din, dout) in enumerate(dims):
        state[f"model.decoder.coarse.pts_linears.{i}.weight"] = torch.randn(
            (dout, din), generator=g)
        state[f"model.decoder.coarse.pts_linears.{i}.bias"] = torch.randn(
            (dout,), generator=g)
        state[f"model.decoder.coarse.fc_c.{i}.weight"] = torch.randn(
            (dout, 32), generator=g)
        state[f"model.decoder.coarse.fc_c.{i}.bias"] = torch.randn(
            (dout,), generator=g)
    state["model.decoder.coarse.output_linear.weight"] = torch.randn(
        (1, 32), generator=g)
    state["model.decoder.coarse.output_linear.bias"] = torch.randn(
        (1,), generator=g)
    state["model.decoder.fine.pts_linears.0.weight"] = torch.zeros((2, 2))
    pt = str(tmp_path / "middle_fine.pt")
    torch.save({"model": state}, pt)

    out = convert(pt, str(tmp_path / "out.npz"))
    # transposed Linear weights, both w and b present, fine keys excluded
    assert out["pts_linears.0.w"].shape == (110, 32)
    assert out["output_linear.w"].shape == (32, 1)
    assert "fc_c.3.b" in out
    assert not any("fine" in k for k in out)
    data = np.load(str(tmp_path / "out.npz"))
    np.testing.assert_allclose(
        data["pts_linears.2.w"],
        state["model.decoder.coarse.pts_linears.2.weight"].numpy().T)
