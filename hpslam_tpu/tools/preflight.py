#!/usr/bin/env python
"""Scene-tree preflight: validate a downloaded dataset against its config
BEFORE burning hours of SLAM runtime on it.

No real ScanNet/Replica data exists in the build environment, so the first
real-data run happens unsupervised elsewhere (VERDICT r02 item 6 /
QUALITY.md).  This tool de-risks it: it checks the scene tree the config
points at (file counts, pose finiteness, intrinsics sanity, depth scale)
and prints a runtime estimate, exiting non-zero on any hard failure.

Checks (hard failures marked [F], warnings [W]):
  [F] color/depth/pose file counts exist and match
  [F] all poses parse as 4x4, finite (NaN/Inf GT poses are masked by
      eval_ate, reference src/tools/eval_ate.py:250-267, but an all-bad
      pose file means a download/extraction problem)
  [F] first depth frame decodes, is non-empty, and lands in a plausible
      metric range after cam.png_depth_scale (0.1-20 m indoor)
  [F] first color frame decodes; resolution vs cam.H/W (pre-crop)
  [W] pose translation span vs mapping.bound (scene escaping the
      configured bound breaks meshing, not tracking)
  [W] intrinsics principal point near image center (cx/cy transposed or
      unscaled intrinsics are the classic transcription failure)
  Runtime estimate from the config budgets and the BENCH-measured
  per-frame wall-clock on one TPU v5e chip.

Usage:
  python -m hpslam_tpu.tools.preflight configs/ScanNet/scene0059.yaml \
      [--input_folder PATH] [--frames N]
"""
import argparse
import sys

import numpy as np

# driver-recorded per-frame wall-clock at the ScanNet operating point —
# read from the newest BENCH_r*.json at the repo root so the estimate
# tracks the measured headline instead of rotting (VERDICT r03 weak #7);
# the fallback constants are BENCH_r04-era.
BENCH_TRACK_MS = 320.0
BENCH_MAP_MS = 2140.0


def _load_bench_constants():
    global BENCH_TRACK_MS, BENCH_MAP_MS
    import glob
    import json
    import os
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    paths = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    for p in reversed(paths):
        try:
            with open(p) as f:
                d = json.load(f).get("parsed", {}).get("detail", {})
            if "track_ms" in d and "map_ms" in d:
                BENCH_TRACK_MS = float(d["track_ms"])
                BENCH_MAP_MS = float(d["map_ms"])
                return
        except Exception:
            continue


_load_bench_constants()


def fail(msgs, msg):
    msgs.append(("FAIL", msg))


def warn(msgs, msg):
    msgs.append(("warn", msg))


def ok(msgs, msg):
    msgs.append(("ok", msg))


def preflight(cfg: dict, input_folder=None, n_check: int = 3) -> list:
    """Run all checks; returns [(level, message)] — 'FAIL' entries are
    hard failures."""
    from ..utils.datasets import get_dataset

    msgs = []
    try:
        ds = get_dataset(cfg, input_folder=input_folder)
    except Exception as e:  # noqa: BLE001 — any reader/tree error is the finding
        fail(msgs, f"dataset constructor failed: {type(e).__name__}: {e}")
        return msgs

    n = ds.n_img
    if n == 0:
        fail(msgs, f"no frames found under {ds.input_folder!r} "
                   f"(dataset {cfg['dataset']!r} glob patterns)")
        return msgs
    ok(msgs, f"{n} color frames under {ds.input_folder}")

    if ds.color_paths or ds.depth_paths:  # file-backed dataset
        nc, nd = len(ds.color_paths), len(ds.depth_paths)
        if nd != nc:
            fail(msgs, f"color/depth count mismatch: {nc} color vs "
                       f"{nd} depth")
    else:
        ok(msgs, "virtual dataset (no files) — skipping count checks")
    npo = len(ds.poses)
    if npo != n:
        fail(msgs, f"color/pose count mismatch: {n} color vs {npo} poses")

    # pose sanity
    poses = np.asarray(ds.poses, np.float64) if npo else np.zeros((0, 4, 4))
    finite = np.isfinite(poses).all(axis=(1, 2))
    n_bad = int((~finite).sum())
    if npo and n_bad == npo:
        fail(msgs, "ALL poses are non-finite — wrong/corrupt pose files")
    elif n_bad:
        warn(msgs, f"{n_bad}/{npo} poses non-finite (eval_ate masks them; "
                   "ScanNet scenes do ship some)")
    else:
        ok(msgs, "all poses finite")
    if npo and finite.any():
        fp = poses[finite]
        # bottom row must be [0,0,0,1]
        br = np.abs(fp[:, 3, :] - np.array([0, 0, 0, 1.0])).max()
        if br > 1e-3:
            fail(msgs, f"pose bottom row not [0,0,0,1] (max err {br:.2g}) — "
                       "row-major/column-major mixup?")
        # rotation orthonormality on a sample
        R = fp[0, :3, :3]
        ortho = np.abs(R @ R.T - np.eye(3)).max()
        if ortho > 1e-2:
            fail(msgs, f"first pose rotation not orthonormal (err {ortho:.2g})")
        span = fp[:, :3, 3].max(0) - fp[:, :3, 3].min(0)
        ok(msgs, "trajectory span (m): "
                 + np.array2string(span, precision=2))
        bound = cfg.get("mapping", {}).get("bound")
        if bound is not None:
            b = np.asarray(bound, np.float64)
            lo, hi = fp[:, :3, 3].min(0), fp[:, :3, 3].max(0)
            if (lo < b[:, 0]).any() or (hi > b[:, 1]).any():
                warn(msgs, f"trajectory [{lo.round(2)}..{hi.round(2)}] "
                           f"escapes mapping.bound {bound}")
            else:
                ok(msgs, "trajectory inside mapping.bound")

    # frame decode checks on a few frames spread over the sequence
    cam = cfg["cam"]
    H_cfg, W_cfg = int(cam["H"]), int(cam["W"])
    for idx in sorted({0, n // 2, n - 1})[:max(1, n_check)]:
        try:
            fr = ds[idx]
        except Exception as e:  # noqa: BLE001
            fail(msgs, f"frame {idx} failed to decode: "
                       f"{type(e).__name__}: {e}")
            continue
        d = fr.depth
        valid = d[d > 0]
        if valid.size == 0:
            fail(msgs, f"frame {idx}: depth image all-zero")
            continue
        med = float(np.median(valid))
        if not (0.1 <= med <= 20.0):
            fail(msgs, f"frame {idx}: median depth {med:.3g} m implausible "
                       f"— wrong cam.png_depth_scale "
                       f"({cam['png_depth_scale']})?")
        else:
            ok(msgs, f"frame {idx}: median depth {med:.2f} m, "
                     f"{100 * valid.size / d.size:.0f}% valid")
        e = int(cam.get("crop_edge", 0) or 0)
        exp = (H_cfg - 2 * e, W_cfg - 2 * e)
        if cam.get("crop_size"):
            h, w = cam["crop_size"]
            exp = (h - 2 * e, w - 2 * e)
        if fr.depth.shape != exp:
            fail(msgs, f"frame {idx}: post-crop shape {fr.depth.shape} != "
                       f"expected {exp} from cam.H/W/crop")

    # intrinsics sanity (pre-crop/resize values)
    cx, cy = float(cam["cx"]), float(cam["cy"])
    if not (0.3 * W_cfg < cx < 0.7 * W_cfg) or \
       not (0.3 * H_cfg < cy < 0.7 * H_cfg):
        warn(msgs, f"principal point ({cx:.0f},{cy:.0f}) far from image "
                   f"center ({W_cfg / 2:.0f},{H_cfg / 2:.0f}) — "
                   "transposed or unscaled intrinsics?")
    fx, fy = float(cam["fx"]), float(cam["fy"])
    if not (0.5 < fx / fy < 2.0):
        warn(msgs, f"fx/fy aspect {fx / fy:.2f} unusual")

    # cross-frame depth-reprojection consistency (VERDICT r04 item 9):
    # back-project a sparse grid of frame-0 depth through pose 0, project
    # into a nearby frame, and compare against that frame's depth.  This
    # catches the classic transcription failures GEOMETRICALLY: a missed
    # ScanNet axis flip (reference src/utils/datasets.py:214-215 —
    # c2w[:3,1]*=-1; c2w[:3,2]*=-1 is applied by our reader too), a wrong
    # png_depth_scale, or w2c-vs-c2w confusion all blow the reprojected
    # depths far outside the tolerance, while a correct tree lands within
    # a few percent (occlusion + motion account for a small tail).
    if n >= 3 and npo == n and finite[: min(3, n)].all():
        try:
            # partner frame: enough RELATIVE ROTATION to expose a flip (a
            # consistent axis-flip error conjugates the relative pose and
            # cancels to first order at tiny baselines — frame 0 vs 2 of
            # a 30 Hz stream would pass even with flipped axes), but not
            # so much that overlap vanishes.  Pick the latest frame with
            # 5-25 deg relative rotation; fall back to frame 2.
            Ta = poses[0].astype(np.float64)
            bi = min(2, n - 1)
            for j in range(1, n):
                if not finite[j]:
                    continue
                Rrel = Ta[:3, :3].T @ poses[j][:3, :3]
                ang = np.degrees(np.arccos(
                    np.clip((np.trace(Rrel) - 1) / 2, -1, 1)))
                if 5.0 <= ang <= 25.0:
                    bi = j
                elif ang > 25.0:
                    break
            fa, fb = ds[0], ds[bi]
            Tb_inv = np.linalg.inv(poses[bi].astype(np.float64))
            Hc, Wc = fa.depth.shape
            e = int(cam.get("crop_edge", 0) or 0)
            # post-crop intrinsics (update_cam semantics)
            fx_c, fy_c = fx, fy
            cx_c, cy_c = cx - e, cy - e
            jj, ii = np.mgrid[8:Hc - 8:12, 8:Wc - 8:12]
            jj, ii = jj.ravel(), ii.ravel()
            d = fa.depth[jj, ii]
            ok_d = d > 0
            jj, ii, d = jj[ok_d], ii[ok_d], d[ok_d]
            dirs = np.stack([(ii - cx_c) / fx_c, -(jj - cy_c) / fy_c,
                             -np.ones_like(d)], -1)
            pw = (Ta[:3, :3] @ (dirs * d[:, None]).T).T + Ta[:3, 3]
            pc = (Tb_inv[:3, :3] @ pw.T).T + Tb_inv[:3, 3]
            zb = -pc[:, 2]
            infront = zb > 1e-3
            ib = cx_c + fx_c * pc[:, 0] / np.maximum(zb, 1e-6)
            jb = cy_c - fy_c * pc[:, 1] / np.maximum(zb, 1e-6)
            inside = infront & (ib >= 0) & (ib < Wc - 1) & \
                (jb >= 0) & (jb < Hc - 1)
            if inside.sum() >= 50:
                db = fb.depth[jb[inside].astype(int), ib[inside].astype(int)]
                valid = db > 0
                if valid.sum() >= 50:
                    rel = np.abs(db[valid] - zb[inside][valid]) \
                        / np.maximum(db[valid], 1e-6)
                    med_rel = float(np.median(rel))
                    if med_rel > 0.15:
                        warn(msgs, f"cross-frame depth reprojection median "
                                   f"error {100 * med_rel:.0f}% — axis "
                                   "flip / depth scale / pose convention "
                                   "mismatch likely")
                    else:
                        ok(msgs, f"cross-frame depth reprojection "
                                 f"consistent (median {100 * med_rel:.1f}% "
                                 f"over {int(valid.sum())} px)")
                else:
                    warn(msgs, "reprojection check: too few valid target "
                               "depths (low overlap?)")
            else:
                warn(msgs, "reprojection check: frames 0/2 barely overlap "
                           "— skipped")
        except Exception as ex:  # noqa: BLE001 — diagnostic only
            warn(msgs, f"reprojection check errored: "
                       f"{type(ex).__name__}: {ex}")

    # runtime estimate from config budgets scaled vs the BENCH point
    t = cfg["tracking"]
    m = cfg["mapping"]
    tr_scale = (t["iters"] * t["pixels"]) / (100 * 5000)
    mp_scale = (m["iters"] * m["pixels"]) / (600 * 10000)
    per_frame_ms = (BENCH_TRACK_MS * tr_scale
                    + BENCH_MAP_MS * mp_scale / max(1, m["every_frame"]))
    est_min = n * per_frame_ms / 1e3 / 60
    ok(msgs, f"estimated runtime: ~{per_frame_ms:.0f} ms/frame x {n} frames"
             f" ≈ {est_min:.0f} min on one TPU v5e "
             f"(BENCH-scaled; + meshing/eval)")
    return msgs


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("config")
    ap.add_argument("--input_folder", default=None)
    ap.add_argument("--frames", type=int, default=3,
                    help="frames to decode-check")
    args = ap.parse_args(argv)

    from ..config import load_config
    import os
    here = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    cfg = load_config(args.config, os.path.join(here,
                                                "configs/point_slam.yaml"))
    msgs = preflight(cfg, input_folder=args.input_folder,
                     n_check=args.frames)
    n_fail = 0
    for level, msg in msgs:
        print(f"[{level:4s}] {msg}")
        n_fail += level == "FAIL"
    print(f"preflight: {'FAIL' if n_fail else 'OK'} "
          f"({n_fail} hard failure(s))")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
