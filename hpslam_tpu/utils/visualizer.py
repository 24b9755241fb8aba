"""Rendered-vs-GT visualization panels (reference src/utils/Visualizer.py).

Produces the same artefact: per-level 2x3 matplotlib panels (GT / rendered /
residual x depth / colour) saved as jpg under tracking_vis / mapping_vis,
plus ``vis_value_only`` returning raw rendered maps for offline meshing
(Visualizer.py:32-62).  Full-frame rendering goes through the fused
render_rays program in fixed-size ray batches.
"""
from __future__ import annotations

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..ops import geometry as G
from ..renderer import RenderConfig, render_rays, sample_near_pcl_z
from ..ops import sampling as S


def render_img(params, mcfg, rcfg: RenderConfig, c2w, H, W, fx, fy, cx, cy,
               level_arrays, r_query_map, gt_depth=None,
               exposure_feat=None, stage: str = "color_fine",
               ray_batch_size: int = 3000, npc=None):
    """Full-frame depth/uncertainty/colour render (Renderer.render_img,
    Renderer.py:256-337)."""
    rays_o, rays_d = G.get_rays(H, W, fx, fy, cx, cy, jnp.asarray(c2w))
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    rq = jnp.asarray(r_query_map).reshape(-1)
    depth_flat = (jnp.asarray(gt_depth).reshape(-1) if gt_depth is not None
                  else jnp.zeros(H * W))
    pos, count, geo, col = level_arrays
    from ..ops import knn as K
    tile_index = K.build_tiles(pos, count)

    n = rays_o.shape[0]
    pad = (-n) % ray_batch_size
    if pad:
        rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3))])
        rays_d = jnp.concatenate(
            [rays_d, jnp.tile(jnp.array([[0.0, 0, -1]]), (pad, 1))])
        rq = jnp.concatenate([rq, jnp.full((pad,), rq[0])])
        depth_flat = jnp.concatenate([depth_flat, jnp.zeros((pad,))])

    far = float(S.far_bound_from_depth(depth_flat)) if gt_depth is not None else 10.0
    outs_d, outs_u, outs_c = [], [], []
    for s in range(0, rays_o.shape[0], ray_batch_size):
        sl = slice(s, s + ray_batch_size)
        ro, rd, dg, rqb = rays_o[sl], rays_d[sl], depth_flat[sl], rq[sl]
        zd = None
        if rcfg.sample_near_pcl and bool((dg <= 0).any()):
            zd, _ = sample_near_pcl_z(ro, rd, rcfg.near_end, far,
                                      rcfg.N_surface, pos, count, rqb,
                                      rcfg.nn_num, tile_index=tile_index)
        d, u, c, _ = render_rays(params, mcfg, rcfg, stage, ro, rd, dg,
                                 pos, count, geo, col, rqb,
                                 exposure_feat=exposure_feat,
                                 far_fallback=far, zero_depth_z_vals=zd,
                                 tile_index=tile_index)
        outs_d.append(np.asarray(d))
        outs_u.append(np.asarray(u))
        outs_c.append(np.asarray(c))
    depth = np.concatenate(outs_d)[:n].reshape(H, W)
    unc = np.concatenate(outs_u)[:n].reshape(H, W)
    color = np.concatenate(outs_c)[:n].reshape(H, W, 3)
    return depth, unc, color


class Visualizer:
    def __init__(self, freq: int, inside_freq: int, vis_dir: str, slam,
                 rcfg: RenderConfig, verbose: bool = True,
                 vis_inside: bool = False):
        self.freq = freq
        self.inside_freq = inside_freq
        self.vis_dir = vis_dir
        self.slam = slam
        self.rcfg = rcfg
        self.verbose = verbose
        self.vis_inside = vis_inside
        os.makedirs(vis_dir, exist_ok=True)

    def vis_value_only(self, c2w, gt_depth, npc, params, r_query_map,
                       level: str = "fine", exposure_feat=None):
        """Raw rendered maps for offline meshing (Visualizer.py:32-62)."""
        s = self.slam
        lv = npc.levels[level]
        return render_img(
            params, s.mcfg, self.rcfg, c2w, s.H, s.W, s.fx, s.fy, s.cx, s.cy,
            (lv.pos, lv.count, lv.geo, lv.col), r_query_map,
            gt_depth=gt_depth, exposure_feat=exposure_feat,
            stage=f"color_{level}")

    def vis(self, idx: int, it: int, gt_depth, gt_color, c2w, npc, params,
            r_query: Dict[str, np.ndarray], exposure_feat=None,
            freq_override: bool = False, save_rendered_image: bool = False):
        """Per-level 2x3 residual panels every ``freq`` frames
        (Visualizer.py:64-251)."""
        if not (freq_override or (idx % self.freq == 0)):
            return
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        s = self.slam
        for level in npc.levels.keys():
            lv = npc.levels[level]
            depth, unc, color = render_img(
                params, s.mcfg, self.rcfg, c2w, s.H, s.W, s.fx, s.fy,
                s.cx, s.cy, (lv.pos, lv.count, lv.geo, lv.col),
                r_query[level], gt_depth=gt_depth,
                exposure_feat=exposure_feat, stage=f"color_{level}")

            gt_d = np.asarray(gt_depth)
            gt_c = np.asarray(gt_color)
            res_d = np.abs(gt_d - depth)
            res_d[gt_d == 0] = 0
            res_c = np.abs(gt_c - np.clip(color, 0, 1))
            res_c[gt_d == 0] = 0
            dmax = float(np.max(gt_d)) if gt_d.max() > 0 else 1.0

            fig, axs = plt.subplots(2, 3, figsize=(12, 6))
            for ax in axs.ravel():
                ax.set_xticks([])
                ax.set_yticks([])
            axs[0, 0].imshow(gt_d, cmap="plasma", vmin=0, vmax=dmax)
            axs[0, 0].set_title("Input Depth")
            axs[0, 1].imshow(depth, cmap="plasma", vmin=0, vmax=dmax)
            axs[0, 1].set_title("Generated Depth")
            axs[0, 2].imshow(res_d, cmap="plasma", vmin=0, vmax=dmax)
            axs[0, 2].set_title("Depth Residual")
            axs[1, 0].imshow(np.clip(gt_c, 0, 1))
            axs[1, 0].set_title("Input RGB")
            axs[1, 1].imshow(np.clip(color, 0, 1))
            axs[1, 1].set_title("Generated RGB")
            axs[1, 2].imshow(np.clip(res_c, 0, 1))
            axs[1, 2].set_title("RGB Residual")
            plt.subplots_adjust(wspace=0, hspace=0.1)
            out = os.path.join(self.vis_dir, f"{idx:05d}_{it:04d}_{level}.jpg")
            fig.savefig(out, bbox_inches="tight", pad_inches=0.2, dpi=150)
            plt.close(fig)
            if save_rendered_image and level == "fine":
                import cv2
                img_dir = os.path.join(os.path.dirname(self.vis_dir),
                                       "rendered_image")
                os.makedirs(img_dir, exist_ok=True)
                cv2.imwrite(os.path.join(img_dir, f"frame_{idx:05d}.png"),
                            cv2.cvtColor((np.clip(color, 0, 1) * 255)
                                         .astype(np.uint8),
                                         cv2.COLOR_RGB2BGR))
            if self.verbose:
                print(f"Saved rendering visualization {out}")
