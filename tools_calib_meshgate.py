#!/usr/bin/env python
"""Calibration for the e2e quality gates (ATE + mesh): run the noisy tiny
fixture — sensor model loaded from configs/Synthetic/synth_noisy.yaml, the
SAME file CI's gate test reads (tests/test_e2e.py) — across seeds, fuse the
mesh, and print per-seed ATE + recon metrics under several eval choices so
the gate thresholds are set from measurement, not guesses.

Usage: python tools_calib_meshgate.py [--seeds 1219,0,1] [--no-mesh]
"""
import copy
import os
import sys

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def noisy_tiny_cfg(seed=None):
    """The gate fixture: synth_noisy.yaml sensor model at the tiny CPU
    budget (mirrors tests/test_e2e.py tiny_cfg + noisy overlay)."""
    from hpslam_tpu import config as C
    here = os.path.dirname(os.path.abspath(__file__))
    cfg = C.load_config(
        os.path.join(here, "configs/Synthetic/synth_noisy.yaml"),
        os.path.join(here, "configs/point_slam.yaml"))
    cfg = copy.deepcopy(cfg)
    cfg["cam"].update(H=48, W=64, fx=40.0, fy=40.0, cx=31.5, cy=23.5)
    cfg["tracking"].update(pixels=200, iters=6, vis_freq=999,
                           vis_inside_freq=999)
    cfg["mapping"].update(pixels=400, pixels_adding=600, iters=10,
                          iters_first=12, geo_iter_first=5,
                          mapping_window_size=4, vis_freq=999,
                          vis_inside_freq=999, color_refine=False,
                          no_vis_on_first_frame=True, ckpt_freq=2000,
                          pixels_knn_cache=512)
    cfg["pointcloud"]["initial_capacity"] = 8192
    cfg["verbose"] = False
    if seed is not None:
        cfg["seed"] = seed
    cfg["data"]["output"] = f"output/calib_meshgate/s{seed}"
    return cfg


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hpslam_tpu.slam import PointSLAM
    from hpslam_tpu.tools.cull_mesh import cull
    from hpslam_tpu.tools.eval_recon import recon_metrics, sample_surface
    from hpslam_tpu.tools.get_mesh_tsdf_fusion import fuse_trajectory
    from hpslam_tpu.tools.make_synth_gt_mesh import box_mesh
    from hpslam_tpu.utils.ply import write_ply_mesh

    args = sys.argv[1:]
    seeds = [1219]
    if "--seeds" in args:
        i = args.index("--seeds")
        seeds = [int(s) for s in args[i + 1].split(",")]
    do_mesh = "--no-mesh" not in args

    ates = []
    for seed in seeds:
        cfg = noisy_tiny_cfg(seed)
        slam = PointSLAM(cfg)
        results, _ = slam.run()
        ate = results["absolute_translational_error.rmse"]
        ates.append(ate)
        print(f"seed={seed} ate={ate:.4f}", flush=True)

        if not do_mesh:
            continue
        for vox, trunc in ((0.05, 0.2),):
            verts, _cols, faces = fuse_trajectory(
                slam, slam.params, slam.npc, slam.frame_reader,
                slam.estimate_c2w_list, slam.n_img, render_every=5,
                voxel_size=vox, sdf_trunc=trunc, verbose=False)
            print(f"  vox={vox}: {len(verts)} verts {len(faces)} faces",
                  flush=True)
            write_ply_mesh(
                f"output/calib_meshgate/s{seed}/mesh_v{vox}.ply",
                verts, faces)
            gt_v, gt_f = box_mesh(res=40)
            gt_f_cull = cull(gt_v, gt_f, slam.estimate_c2w_list,
                             slam.H, slam.W, slam.fx, slam.fy,
                             slam.cx, slam.cy)
            rng = np.random.default_rng(0)
            rec = sample_surface(verts, faces, 20000, rng)
            gt_c = sample_surface(gt_v, gt_f_cull, 20000, rng)
            m = recon_metrics(rec, gt_c, fscore_thresh=0.05)
            print(f"  seed={seed} acc={m['accuracy_cm']:.1f}cm "
                  f"comp={m['completion_cm']:.1f}cm "
                  f"f@5cm={m['fscore']:.3f}", flush=True)
    print(f"ATE band over seeds {seeds}: min={min(ates):.4f} "
          f"max={max(ates):.4f} mean={np.mean(ates):.4f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
