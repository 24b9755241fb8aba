"""Dataset-reader round-trip tests (VERDICT r1 item 7).

Writes tiny synthetic Replica/ScanNet/Azure/CoFusion/TUM trees to tmp_path
and checks each reader reproduces the colour/depth/pose it wrote, including
the conventions the reference encodes (BGR->RGB, png_depth_scale, y/z pose
column flips, TUM timestamp association + first-pose rebase, CoFusion EXR
depth).  Reference: src/utils/datasets.py.
"""
import os

import cv2
import numpy as np
import pytest

from hpslam_tpu.utils import datasets as D
from hpslam_tpu.utils.exr import read_exr, read_exr_depth, write_exr

H, W = 16, 20


def _cfg(name, folder, depth_scale=1000.0, crop_edge=0):
    return {
        "dataset": name,
        "data": {"input_folder": str(folder)},
        "cam": {"H": H, "W": W, "fx": 10.0, "fy": 10.0, "cx": W / 2,
                "cy": H / 2, "png_depth_scale": depth_scale,
                "crop_edge": crop_edge},
    }


def _rand_rgbd(rng):
    color = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    depth_mm = rng.integers(100, 5000, (H, W), dtype=np.uint16)
    return color, depth_mm


def _rand_pose(rng):
    # a rotation about y + translation; orthonormal by construction
    a = float(rng.uniform(-1, 1))
    c, s = np.cos(a), np.sin(a)
    m = np.eye(4)
    m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    m[:3, 3] = rng.uniform(-1, 1, 3)
    return m


def _check_frame(fr, color_u8, depth_mm, c2w, depth_scale=1000.0):
    # files store BGR; readers return RGB in [0,1]
    np.testing.assert_allclose(
        fr.color, color_u8[..., ::-1].astype(np.float32) / 255.0, atol=1e-6)
    np.testing.assert_allclose(
        fr.depth, depth_mm.astype(np.float32) / depth_scale, atol=1e-6)
    np.testing.assert_allclose(fr.c2w, D._flip_yz(c2w), atol=1e-5)


# ---------------------------------------------------------------- EXR codec

def test_exr_roundtrip_compressions(tmp_path, rng):
    img = rng.random((H, W)).astype(np.float32)
    other = rng.random((H, W)).astype(np.float32)
    for comp in ("none", "zips", "zip"):
        p = str(tmp_path / f"d_{comp}.exr")
        write_exr(p, {"Y": img, "A": other}, compression=comp)
        out = read_exr(p)
        assert set(out) == {"Y", "A"}
        np.testing.assert_array_equal(out["Y"], img)
        np.testing.assert_array_equal(out["A"], other)
        # depth helper picks the Y channel (reference readEXR_onlydepth)
        np.testing.assert_array_equal(read_exr_depth(p), img)


def test_exr_tall_image_multi_block(tmp_path, rng):
    # ZIP blocks hold 16 scanlines; 37 rows exercises a partial last block
    img = rng.random((37, 11)).astype(np.float32)
    p = str(tmp_path / "tall.exr")
    write_exr(p, {"Z": img}, compression="zip")
    np.testing.assert_array_equal(read_exr_depth(p), img)


def test_exr_rejects_non_exr(tmp_path):
    p = str(tmp_path / "bad.exr")
    with open(p, "wb") as f:
        f.write(b"not an exr file at all")
    with pytest.raises(ValueError, match="not an EXR"):
        read_exr(p)


# ------------------------------------------------------------------ readers

def test_replica_reader(tmp_path, rng):
    root = tmp_path / "replica"
    (root / "results").mkdir(parents=True)
    frames = []
    lines = []
    # smooth gradients survive jpg encoding; random noise would not
    jj, ii = np.mgrid[0:H, 0:W].astype(np.float32)
    for i in range(3):
        color = np.stack([jj / H * 200 + 20, ii / W * 180 + 30,
                          np.full_like(jj, 40.0 + 10 * i)], -1
                         ).astype(np.uint8)
        _, depth = _rand_rgbd(rng)
        pose = _rand_pose(rng)
        cv2.imwrite(str(root / "results" / f"frame{i:06d}.jpg"), color,
                    [cv2.IMWRITE_JPEG_QUALITY, 100])
        cv2.imwrite(str(root / "results" / f"depth{i:06d}.png"), depth)
        lines.append(" ".join(f"{v:.17g}" for v in pose.reshape(-1)))
        frames.append((color, depth, pose))
    (root / "traj.txt").write_text("\n".join(lines) + "\n")

    ds = D.get_dataset(_cfg("replica", root))
    assert len(ds) == 3
    for i, (color, depth, pose) in enumerate(frames):
        fr = ds[i]
        # jpg is lossy: compare loosely on colour, exactly on depth/pose
        assert np.mean(np.abs(
            fr.color - color[..., ::-1].astype(np.float32) / 255.0)) < 0.05
        np.testing.assert_allclose(fr.depth, depth / 1000.0, atol=1e-6)
        np.testing.assert_allclose(fr.c2w, D._flip_yz(pose), atol=1e-5)


def test_scannet_reader_numeric_sort_and_crop(tmp_path, rng):
    root = tmp_path / "scannet"
    for sub in ("color", "depth", "pose"):
        (root / sub).mkdir(parents=True)
    frames = []
    # indices 0..11 exercise numeric (not lexicographic) ordering: "10" > "9"
    for i in range(12):
        color, depth = _rand_rgbd(rng)
        pose = _rand_pose(rng)
        cv2.imwrite(str(root / "color" / f"{i}.jpg"), color,
                    [cv2.IMWRITE_JPEG_QUALITY, 100])
        cv2.imwrite(str(root / "depth" / f"{i}.png"), depth)
        (root / "pose" / f"{i}.txt").write_text(
            "\n".join(" ".join(f"{v:.17g}" for v in row) for row in pose))
        frames.append((color, depth, pose))

    ds = D.get_dataset(_cfg("scannet", root, crop_edge=2))
    assert len(ds) == 12
    for i in (0, 9, 10, 11):
        color, depth, pose = frames[i]
        fr = ds[i]
        assert fr.depth.shape == (H - 4, W - 4)
        np.testing.assert_allclose(
            fr.depth, depth[2:-2, 2:-2] / 1000.0, atol=1e-6)
        np.testing.assert_allclose(fr.c2w, D._flip_yz(pose), atol=1e-5)


def test_azure_reader_trajectory_log(tmp_path, rng):
    root = tmp_path / "azure"
    for sub in ("color", "depth", "scene"):
        (root / sub).mkdir(parents=True)
    frames = []
    log = []
    for i in range(2):
        color, depth = _rand_rgbd(rng)
        pose = _rand_pose(rng)
        cv2.imwrite(str(root / "color" / f"{i:05d}.jpg"), color,
                    [cv2.IMWRITE_JPEG_QUALITY, 100])
        cv2.imwrite(str(root / "depth" / f"{i:05d}.png"), depth)
        log.append(f"{i} {i} {i + 1}")
        log.extend(" ".join(f"{v:.17g}" for v in row) for row in pose)
        frames.append((color, depth, pose))
    (root / "scene" / "trajectory.log").write_text("\n".join(log) + "\n")

    ds = D.get_dataset(_cfg("azure", root))
    assert len(ds) == 2
    for i, (color, depth, pose) in enumerate(frames):
        fr = ds[i]
        np.testing.assert_allclose(fr.depth, depth / 1000.0, atol=1e-6)
        np.testing.assert_allclose(fr.c2w, D._flip_yz(pose), atol=1e-5)


def test_cofusion_reader_exr_depth(tmp_path, rng):
    root = tmp_path / "cofusion"
    (root / "colour").mkdir(parents=True)
    (root / "depth_noise").mkdir(parents=True)
    frames = []
    for i in range(2):
        color, _ = _rand_rgbd(rng)
        depth_m = rng.uniform(0.5, 4.0, (H, W)).astype(np.float32)
        cv2.imwrite(str(root / "colour" / f"Color{i:04d}.png"), color)
        write_exr(str(root / "depth_noise" / f"Depth{i:04d}.exr"),
                  {"Y": depth_m})
        frames.append((color, depth_m))

    # CoFusion depth is metric: png_depth_scale 1 (reference cofusion.yaml)
    ds = D.get_dataset(_cfg("cofusion", root, depth_scale=1.0))
    assert len(ds) == 2
    for i, (color, depth_m) in enumerate(frames):
        fr = ds[i]
        np.testing.assert_allclose(
            fr.color, color[..., ::-1].astype(np.float32) / 255.0, atol=1e-6)
        np.testing.assert_allclose(fr.depth, depth_m, atol=1e-6)
        np.testing.assert_allclose(fr.c2w, np.eye(4), atol=1e-6)  # proxy pose


def test_tum_reader_association_and_rebase(tmp_path, rng):
    from scipy.spatial.transform import Rotation
    root = tmp_path / "tum"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir(parents=True)
    rgb_lines, dep_lines, gt_lines = [], [], []
    frames = []
    poses = []
    for i in range(4):
        t = 100.0 + i  # 1 s apart -> all pass the frame_rate filter
        color, depth = _rand_rgbd(rng)
        pose = _rand_pose(rng)
        cv2.imwrite(str(root / "rgb" / f"{t:.6f}.png"), color)
        cv2.imwrite(str(root / "depth" / f"{t:.6f}.png"), depth)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        # depth timestamps offset by 30 ms: association must still pair them
        dep_lines.append(f"{t + 0.03:.6f} depth/{t:.6f}.png")
        q = Rotation.from_matrix(pose[:3, :3]).as_quat()
        tx, ty, tz = pose[:3, 3]
        gt_lines.append(f"{t:.6f} {tx:.17g} {ty:.17g} {tz:.17g} "
                        f"{q[0]:.17g} {q[1]:.17g} {q[2]:.17g} {q[3]:.17g}")
        frames.append((color, depth))
        poses.append(pose)
    (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("\n".join(dep_lines) + "\n")
    (root / "groundtruth.txt").write_text(
        "# ts tx ty tz qx qy qz qw\n" + "\n".join(gt_lines) + "\n")

    ds = D.get_dataset(_cfg("tumrgbd", root))
    assert len(ds) == 4
    inv0 = np.linalg.inv(poses[0])
    for i, (color, depth) in enumerate(frames):
        fr = ds[i]
        np.testing.assert_allclose(
            fr.color, color[..., ::-1].astype(np.float32) / 255.0, atol=1e-6)
        np.testing.assert_allclose(fr.depth, depth / 1000.0, atol=1e-6)
        expect = np.eye(4) if i == 0 else inv0 @ poses[i]
        np.testing.assert_allclose(fr.c2w, D._flip_yz(expect), atol=1e-4)


def test_decode_depth_raises_on_missing(tmp_path):
    ds = D.BaseReader(_cfg("scannet", tmp_path))
    with pytest.raises(ValueError, match="failed to decode"):
        ds._decode_depth(str(tmp_path / "nope.png"))


def _syn_cfg(**syn):
    return {
        "dataset": "synthetic",
        "data": {"input_folder": "/tmp/x"},
        "seed": 7,
        "synthetic": {"n_frames": 8, "radius": 1.2, **syn},
        "cam": {"H": 40, "W": 52, "fx": 30.0, "fy": 30.0, "cx": 25.5,
                "cy": 19.5, "png_depth_scale": 1000.0, "crop_edge": 0},
    }


def test_synthetic_sensor_model():
    clean = D.get_dataset(_syn_cfg())
    noisy = D.get_dataset(_syn_cfg(depth_noise_std=0.01, depth_quant=0.004,
                                   depth_hole_frac=0.05,
                                   exposure_drift=0.2, texture_poor=0.3))
    fc, fn = clean[2], noisy[2]
    # holes: ~5% of pixels dropped to zero (clustered blobs)
    hole = np.mean(fn.depth == 0)
    assert 0.02 < hole < 0.10
    # multiplicative noise + quantisation on the valid pixels
    m = fn.depth > 0
    rel = np.abs(fn.depth[m] - fc.depth[m]) / fc.depth[m]
    assert 0.004 < rel.mean() < 0.02
    q = fn.depth[m] / 0.004
    np.testing.assert_allclose(q, np.round(q), atol=1e-3)
    # determinism: same frame re-read is identical
    fn2 = noisy[2]
    np.testing.assert_array_equal(fn.depth, fn2.depth)
    np.testing.assert_array_equal(fn.color, fn2.color)
    # exposure drift: global gain differs across frames
    g2 = np.mean(noisy[2].color) / np.mean(clean[2].color)
    g6 = np.mean(noisy[6].color) / np.mean(clean[6].color)
    assert abs(g2 - g6) > 0.02
    # texture-poor region: colour gradient collapses where x > bound
    gx = np.abs(np.diff(fn.color, axis=1)).sum(-1)
    gx_clean = np.abs(np.diff(fc.color, axis=1)).sum(-1)
    assert gx.mean() < gx_clean.mean() * 0.95


def test_synthetic_channel_and_gamma_drift():
    """exposure_chan_drift / gamma_drift: per-channel gains with distinct
    phases (no scalar gain explains them) + nonlinear gamma wander — the
    strengthened exposure fixture (VERDICT r02 item 5)."""
    clean = D.get_dataset(_syn_cfg())
    drift = D.get_dataset(_syn_cfg(exposure_drift=0.25,
                                   exposure_chan_drift=0.12,
                                   gamma_drift=0.10))
    rel = np.stack([
        drift[i].color.reshape(-1, 3).mean(0)
        / clean[i].color.reshape(-1, 3).mean(0)
        for i in range(8)])
    # each channel's gain wanders substantially across the sequence
    assert (rel.max(0) - rel.min(0)).min() > 0.05
    # and NOT in lockstep: some frame has a large cross-channel spread
    assert (rel.max(1) - rel.min(1)).max() > 0.05
    # deterministic, bounded
    f = drift[3]
    assert f.color.min() >= 0.0 and f.color.max() <= 1.0
    np.testing.assert_array_equal(f.color, drift[3].color)


def test_synthetic_loop_trajectory_closes():
    loop = D.get_dataset(_syn_cfg(trajectory="loop", n_frames=40))
    p0 = loop.poses[0][:3, 3]
    plast = loop.poses[39][:3, 3]
    pmid = loop.poses[20][:3, 3]
    assert np.linalg.norm(plast - p0) < 0.4   # returns near the start
    assert np.linalg.norm(pmid - p0) > 1.0    # after going far away
