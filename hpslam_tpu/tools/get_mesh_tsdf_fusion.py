"""Offline meshing: re-render the estimated trajectory and TSDF-fuse it.

Reference: src/tools/get_mesh_tsdf_fusion.py (Open3D ScalableTSDFVolume +
marching cubes).  Here: the fused render_rays program re-renders every
``render_every``-th frame along the estimated trajectory, and the native
block-sparse TSDF + marching-tetrahedra extractor produces the mesh
(voxel 5/512 m, sdf_trunc 0.04 — same constants,
get_mesh_tsdf_fusion.py:231-266).

Unlike the reference (which reloads per-frame dynamic-radius tensors from
disk), the query-radius maps are recomputed from each frame's colour image —
they are a deterministic function of it (Tracker.py:297-325).

Deliberate parity delta: the reference integrates a constant "compensate
vector" (+0.0 / +0.01165 / +0.0125 m on x/y/z) into every camera centre
before fusing (get_mesh_tsdf_fusion.py:269-280) — an empirical patch for a
fixed translation bias Open3D's ScalableTSDFVolume introduced against their
culled GT meshes.  The first-party TSDF volume has no such bias (its
world->voxel mapping is exact; see native/hpslam_native.cpp TSDF tests), so
the compensation is intentionally omitted rather than ported.
"""
from __future__ import annotations

import os
import sys

import numpy as np


def fuse_trajectory(slam_like, params, npc, reader, estimate_c2w_list,
                    n_img: int, render_every: int = 5,
                    voxel_size: float = 5.0 / 512, sdf_trunc: float = 0.04,
                    depth_trunc: float = 8.0, level: str = "fine",
                    use_gt_depth: bool = False, verbose: bool = True):
    """Integrate rendered (or GT) depth/colour maps into a TSDF mesh."""
    from ..native import TSDFVolume
    from ..ops.image import dynamic_radii
    from ..renderer import RenderConfig
    from ..utils.visualizer import render_img

    s = slam_like
    vol = TSDFVolume(voxel_size, sdf_trunc)
    intr = (s.fx, s.fy, s.cx, s.cy)
    flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    rcfg = RenderConfig.from_cfg(s.cfg, "sigmoid_coef_mapper")
    lv = npc.levels[level]

    for idx in range(0, n_img, render_every):
        frame = reader[idx]
        c2w = estimate_c2w_list[idx]
        if not np.isfinite(c2w).all():
            continue
        if use_gt_depth:
            depth, color = frame.depth, frame.color
        else:
            _, r_query = dynamic_radii(
                frame.color, s.cfg["pointcloud"]["radius_hierarchy"],
                s.cfg["pointcloud"]["radius_query_ratio"],
                s.cfg["pointcloud"]["color_grad_threshold"])
            depth, _unc, color = render_img(
                params, s.mcfg, rcfg, c2w, s.H, s.W, s.fx, s.fy, s.cx, s.cy,
                (lv.pos, lv.count, lv.geo, lv.col), r_query[level],
                gt_depth=frame.depth, stage=f"color_{level}")
            color = np.clip(color, 0.0, 1.0)
        # -z-forward -> CV convention for the TSDF integrator
        c2w_cv = c2w @ flip
        w2c_cv = np.linalg.inv(c2w_cv)
        vol.integrate(np.asarray(depth, np.float32),
                      np.asarray(color, np.float32), intr,
                      w2c_cv.astype(np.float32), depth_trunc)
        if verbose and idx % (render_every * 20) == 0:
            print(f"fused frame {idx}/{n_img}")

    return vol.extract_mesh()


def main(argv=None):
    sys.path.insert(0, os.getcwd())
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from hpslam_tpu import config as C
    from hpslam_tpu.slam import PointSLAM
    from hpslam_tpu.utils.logger import latest_checkpoint, load_checkpoint
    from hpslam_tpu.utils.ply import write_ply_mesh

    # same flag surface as run.py so meshing sees the identical cfg
    # (reference duplicates the full flag set, get_mesh_tsdf_fusion.py:130-169)
    p = C.build_arg_parser(description="TSDF-fusion meshing.")
    p.add_argument("--name", type=str, default=None,
                   help="suffix for the output mesh filename")
    p.add_argument("--no_render", action="store_true",
                   help="integrate GT depth instead of re-rendered depth")
    p.add_argument("--no_eval", action="store_true")
    p.add_argument("-s", "--silent", action="store_true")
    p.add_argument("--mid_mesh", action="store_true",
                   help="also extract a mesh from the mid level")
    p.add_argument("--render_every", type=int, default=5)
    p.add_argument("--voxel_size", type=float, default=5.0 / 512)
    args = p.parse_args(argv)

    cfg = C.load_config(args.config, "configs/point_slam.yaml")
    cfg = C.apply_args(cfg, args)
    output = cfg["data"]["output"]

    ck = latest_checkpoint(output)
    if ck is None:
        print("no checkpoint under", output)
        return 1
    state = load_checkpoint(ck)

    slam = PointSLAM(cfg)
    # restore decoder params + point cloud from the checkpoint
    import jax
    slam.params = jax.tree.map(lambda x: jax.numpy.asarray(x),
                               state["decoder_params"])
    for lvl, data in state["levels"].items():
        npc_lvl = slam.npc.levels[lvl]
        n = data["count"]
        slam.npc.ensure_capacity(lvl, n + 1)
        npc_lvl = slam.npc.levels[lvl]
        slam.npc.levels[lvl] = npc_lvl.replace(
            pos=npc_lvl.pos.at[:n].set(data["pos"]),
            geo=npc_lvl.geo.at[:n].set(data["geo"]),
            col=npc_lvl.col.at[:n].set(data["col"]),
            normal=npc_lvl.normal.at[:n].set(data["normal"]),
            count=jax.numpy.asarray(n, jax.numpy.int32))

    estimate = state["estimate_c2w_list"]
    n_img = int(state["idx"]) + 1
    verbose = not args.silent
    verts, cols, faces = fuse_trajectory(
        slam, slam.params, slam.npc, slam.frame_reader, estimate, n_img,
        render_every=args.render_every, voxel_size=args.voxel_size,
        use_gt_depth=args.no_render, verbose=verbose)
    os.makedirs(os.path.join(output, "mesh"), exist_ok=True)
    suffix = f"_{args.name}" if args.name else ""
    mesh_path = os.path.join(output, "mesh", f"final_mesh{suffix}.ply")
    write_ply_mesh(mesh_path, verts, faces, cols)
    if verbose:
        print(f"wrote {mesh_path}: {verts.shape[0]} verts, "
              f"{faces.shape[0]} faces")
    if args.mid_mesh:
        v2, c2, f2 = fuse_trajectory(
            slam, slam.params, slam.npc, slam.frame_reader, estimate, n_img,
            render_every=args.render_every, voxel_size=args.voxel_size,
            use_gt_depth=args.no_render, level="mid", verbose=verbose)
        mid_path = os.path.join(output, "mesh", f"mid_mesh{suffix}.ply")
        write_ply_mesh(mid_path, v2, f2, c2)
        if verbose:
            print(f"wrote {mid_path}: {v2.shape[0]} verts")

    if not args.no_eval:
        gt_mesh = cfg.get("meshing", {}).get("gt_mesh_path")
        if gt_mesh and os.path.exists(gt_mesh):
            from .eval_recon import eval_recon_3d
            res = eval_recon_3d(mesh_path, gt_mesh)
            print(res)
        else:
            print("no gt mesh configured (meshing.gt_mesh_path); "
                  "skipping reconstruction eval")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
