"""Multi-chip training steps: rays sharded over ``dp``, scene replicated.

The hot loops (mapping feature optimization, tracking pose optimization) are
embarrassingly parallel over rays; sharding the ray batch and letting XLA
insert the gradient all-reduce over ICI is the whole scaling story — no
NCCL-style plumbing (the reference has none to port; SURVEY.md §2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import decoder as Dec
from ..ops import optim as Opt
from ..renderer import RenderConfig, render_rays
from ..ops import geometry as G


def make_dp_map_step(mesh: Mesh, mcfg: Dec.ModelConfig, rcfg: RenderConfig,
                     stage: str, lr: float = 0.03, w_color: float = 0.1):
    """One data-parallel mapping iteration: ray batch sharded on dp, feature
    arrays + decoder params replicated; grads are combined by XLA's
    automatic all-reduce; Adam runs replicated.

    step(params, feats{geo,col}, opt_state, rays_o, rays_d, gt_depth,
         gt_color, cloud_pos, count, r_query) -> (feats, opt_state, loss)
    """
    repl = NamedSharding(mesh, P())
    rays = NamedSharding(mesh, P("dp"))

    def loss_fn(feats, params, rays_o, rays_d, gt_depth, gt_color,
                cloud_pos, count, r_query):
        depth, unc, color, vmask = render_rays(
            params, mcfg, rcfg, stage, rays_o, rays_d, gt_depth,
            cloud_pos, count, feats["geo"], feats["col"], r_query)
        mask = (gt_depth > 0) & vmask & jnp.isfinite(depth)
        loss = jnp.sum(jnp.where(mask, jnp.abs(gt_depth - depth), 0.0))
        if stage.startswith("color"):
            loss = loss + w_color * jnp.sum(
                jnp.where(mask[:, None], jnp.abs(gt_color - color), 0.0))
        return loss

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, repl, rays, rays, rays, rays, repl, repl,
                      rays),
        out_shardings=(repl, repl, repl))
    def step(params, feats, opt_state, rays_o, rays_d, gt_depth, gt_color,
             cloud_pos, count, r_query):
        loss, grads = jax.value_and_grad(loss_fn)(
            feats, params, rays_o, rays_d, gt_depth, gt_color, cloud_pos,
            count, r_query)
        feats, opt_state = Opt.update(grads, opt_state, feats, lr)
        return feats, opt_state, loss

    return step


def make_dp_track_step(mesh: Mesh, mcfg: Dec.ModelConfig, rcfg: RenderConfig,
                       stage: str, cam_lr: float = 0.002,
                       w_color: float = 0.5):
    """One data-parallel tracking iteration (pose gradient over sharded
    rays).  step(params, cam(7,), opt_state, i, j, gt_depth, gt_color,
    cloud_pos, count, geo, col, r_query, intr(4,)) -> (cam, opt_state, loss)
    """
    repl = NamedSharding(mesh, P())
    rays = NamedSharding(mesh, P("dp"))

    def loss_fn(cam, params, i, j, gt_depth, gt_color, cloud_pos, count,
                geo, col, r_query, intr):
        c2w = G.get_camera_from_tensor(cam)
        rays_o, rays_d = G.get_rays_from_uv(i, j, c2w, intr[0], intr[1],
                                            intr[2], intr[3])
        depth, unc, color, _ = render_rays(
            params, mcfg, rcfg, stage, rays_o, rays_d, gt_depth,
            cloud_pos, count, geo, col, r_query, is_tracker=True)
        unc = jax.lax.stop_gradient(unc)
        mask = (gt_depth > 0) & jnp.isfinite(depth)
        tmp = jnp.abs(gt_depth - depth) / jnp.sqrt(unc + 1e-10)
        loss = jnp.sum(jnp.where(mask, jnp.clip(tmp, 0, 1e3), 0.0))
        loss = loss + w_color * jnp.sum(
            jnp.where(mask[:, None], jnp.abs(gt_color - color), 0.0))
        return loss

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, repl, rays, rays, rays, rays, repl, repl,
                      repl, repl, rays, repl),
        out_shardings=(repl, repl, repl))
    def step(params, cam, opt_state, i, j, gt_depth, gt_color, cloud_pos,
             count, geo, col, r_query, intr):
        loss, g = jax.value_and_grad(loss_fn)(
            cam, params, i, j, gt_depth, gt_color, cloud_pos, count, geo,
            col, r_query, intr)
        cam, opt_state = Opt.update(g, opt_state, cam, cam_lr)
        return cam, opt_state, loss

    return step
