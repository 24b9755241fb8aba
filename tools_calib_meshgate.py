#!/usr/bin/env python
"""One-off calibration for the e2e mesh gate: run the noisy tiny fixture,
fuse the mesh, and print recon metrics under several eval choices so the
gate thresholds are set from measurement, not guesses."""
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


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hpslam_tpu import config as C
    from hpslam_tpu.slam import PointSLAM
    from hpslam_tpu.tools.cull_mesh import cull
    from hpslam_tpu.tools.eval_recon import recon_metrics, sample_surface
    from hpslam_tpu.tools.get_mesh_tsdf_fusion import fuse_trajectory
    from hpslam_tpu.tools.make_synth_gt_mesh import box_mesh
    from hpslam_tpu.utils.ply import write_ply_mesh

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = C.load_config(
        os.path.join(here, "configs/Synthetic/synth_quick.yaml"),
        os.path.join(here, "configs/point_slam.yaml"))
    cfg = copy.deepcopy(cfg)
    cfg["synthetic"]["n_frames"] = 7
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
    cfg["data"]["output"] = "output/calib_meshgate"
    cfg["verbose"] = False
    cfg["synthetic"].update(n_frames=30, depth_noise_std=0.01,
                            depth_quant=0.004, depth_hole_frac=0.03,
                            exposure_drift=0.15, texture_poor=0.25)
    cfg["model"]["encode_exposure"] = True
    slam = PointSLAM(cfg)
    results, _ = slam.run()
    print("ate:", results["absolute_translational_error.rmse"])

    for vox, trunc in ((0.05, 0.2), (0.03, 0.12)):
        verts, _cols, faces = fuse_trajectory(
            slam, slam.params, slam.npc, slam.frame_reader,
            slam.estimate_c2w_list, slam.n_img, render_every=5,
            voxel_size=vox, sdf_trunc=trunc, verbose=False)
        print(f"vox={vox}: {len(verts)} verts {len(faces)} faces")
        write_ply_mesh(f"output/calib_meshgate/mesh_v{vox}.ply",
                       verts, faces)
        gt_v, gt_f = box_mesh(res=40)
        gt_f_cull = cull(gt_v, gt_f, slam.estimate_c2w_list,
                         slam.H, slam.W, slam.fx, slam.fy, slam.cx, slam.cy)
        rec_f_cull = cull(verts, faces, slam.estimate_c2w_list,
                          slam.H, slam.W, slam.fx, slam.fy,
                          slam.cx, slam.cy)
        rng = np.random.default_rng(0)
        rec = sample_surface(verts, faces, 20000, rng)
        rec_c = (sample_surface(verts, rec_f_cull, 20000, rng)
                 if len(rec_f_cull) else rec)
        gt_full = sample_surface(gt_v, gt_f, 20000, rng)
        gt_c = sample_surface(gt_v, gt_f_cull, 20000, rng)
        for tag, r, g in (("rec/gtcull", rec, gt_c),
                          ("rec/gtfull", rec, gt_full),
                          ("reccull/gtcull", rec_c, gt_c),
                          ("reccull/gtfull", rec_c, gt_full)):
            m = recon_metrics(r, g, fscore_thresh=0.05)
            print(f"  {tag:16s} acc={m['accuracy_cm']:.1f}cm "
                  f"comp={m['completion_cm']:.1f}cm "
                  f"f@5cm={m['fscore']:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
