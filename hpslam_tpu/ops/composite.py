"""Volume compositor (reference src/common.py:385-428, occupancy mode).

The reference always runs with ``occupancy=True`` and N_surface-only samples
(configs/point_slam.yaml:157-167), so the density branch exists only for
completeness.  Weight-normalised expected depth/colour and the depth-variance
uncertainty match eq.(7) of the Point-SLAM paper.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def raw2outputs(raw, z_vals, rays_d, occupancy: bool = True, coef: float = 0.1):
    """Composite per-sample predictions into per-ray depth / colour.

    Args:
      raw:    (N_rays, N_samples, 4) -- RGB + occupancy logit (or density).
      z_vals: (N_rays, N_samples) sample depths along each ray.
      rays_d: (N_rays, 3) ray directions (scales the inter-sample distances).
      occupancy: sigmoid-occupancy mode (always true in practice).
      coef:   sigmoid temperature (sigmoid_coef_tracker/mapper = 0.1).

    Returns:
      depth (N_rays,), depth_var (N_rays,), rgb (N_rays, 3),
      weights (N_rays, N_samples).
    """
    rgb = raw[..., :3]
    if occupancy:
        alpha = jax.nn.sigmoid(coef * raw[..., -1])
    else:
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = jnp.concatenate(
            [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
        ) * jnp.linalg.norm(rays_d[..., None, :], axis=-1)
        alpha = 1.0 - jnp.exp(-jax.nn.relu(raw[..., -1]) * dists)

    # transmittance weights: alpha_i * prod_{j<i} (1 - alpha_j + 1e-10)
    ones = jnp.ones_like(alpha[..., :1])
    trans = jnp.cumprod(jnp.concatenate([ones, 1.0 - alpha + 1e-10], -1), -1)[..., :-1]
    weights = alpha * trans

    weights_sum = jnp.sum(weights, axis=-1) + 1e-10
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2) / weights_sum[..., None]
    depth_map = jnp.sum(weights * z_vals, axis=-1) / weights_sum
    tmp = z_vals - depth_map[..., None]
    depth_var = jnp.sum(weights * tmp * tmp, axis=-1)
    return depth_map, depth_var, rgb_map, weights
